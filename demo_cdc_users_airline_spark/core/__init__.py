from .session import get_spark
from .clock import Clock

__all__ = ["get_spark", "Clock"]
