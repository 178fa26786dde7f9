from .framework import Node, Pipe, Registry, Param

__all__ = ["Node", "Pipe", "Registry", "Param"]
