"""Pipe / node query framework.

The reference's query layer is "pipes": ordered ``NODE`` blocks of SQL
where each node can reference previous nodes, other pipes, and
datasources by name (kits/airport/mysql/pipes/passenger_activity.pipe —
4 chained nodes; active_vs_missed_flights.pipe joins two other *pipes*).
Endpoints are the terminal node, published with typed template
parameters (flights_missed_pct_minute.pipe:31-32:
``{% if defined(start) %}{{DateTime(start)}}{% else %}subtractHours(now(),1)``).

Spark-first re-expression: a node is a Python function
``fn(ctx) -> DataFrame``; references are ``ctx.ref(name)`` resolving
node → pipe → datasource through a registry, memoized per request.
Catalyst sees one composed logical plan, so cross-node/pipe reuse is
inlined and optimized globally — exactly what ClickHouse does by
inlining subqueries, but with Spark's optimizer.

Parameters keep the reference's semantics: every param is optional,
typed, and defaulted (``defined(p)``); the clock is injectable so
``now()``-relative queries are deterministic under test.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from ..core.clock import Clock

_COERCERS: dict[str, Callable[[Any], Any]] = {
    # Tinybird template types used by the reference (DateTime(start), …)
    "DateTime": lambda v: v if isinstance(v, _dt.datetime)
    else _dt.datetime.fromisoformat(str(v)),
    "Int32": int,
    "Float64": float,
    "String": str,
}


@dataclass
class Param:
    """A typed endpoint parameter with an optional default factory.

    ``default`` may be a callable taking the resolved Clock (for
    now()-relative defaults like ``subtractHours(now(), 1)``).
    """

    name: str
    type: str = "String"
    default: Any = None

    def resolve(self, supplied: dict[str, Any], clock: Clock) -> Any:
        if self.name in supplied and supplied[self.name] is not None:
            return _COERCERS[self.type](supplied[self.name])
        if callable(self.default):
            return self.default(clock)
        return self.default


@dataclass
class Node:
    name: str
    fn: Callable[["Context"], DataFrame]


@dataclass
class Pipe:
    name: str
    nodes: list[Node]
    params: list[Param] = field(default_factory=list)

    @property
    def endpoint(self) -> Node:
        return self.nodes[-1]


class Registry:
    """Name → datasource/pipe resolution, shared by all pipes."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._datasources: dict[str, Callable[[], DataFrame]] = {}
        self._pipes: dict[str, Pipe] = {}

    def add_datasource(self, name: str, df_or_fn: DataFrame | Callable[[], DataFrame]):
        if isinstance(df_or_fn, DataFrame):
            self._datasources[name] = lambda df=df_or_fn: df
        else:
            self._datasources[name] = df_or_fn

    def add_pipe(self, pipe: Pipe):
        self._pipes[pipe.name] = pipe

    def endpoint(self, name: str, clock: Clock | None = None, **params) -> DataFrame:
        """Run a pipe to its terminal node (the published API query)."""
        pipe = self._pipes[name]
        ctx = Context(self, pipe, clock or Clock.system(), params)
        return ctx.ref(pipe.endpoint.name)


class Context:
    """Per-request resolution scope: memoizes node/pipe DataFrames."""

    def __init__(self, registry: Registry, pipe: Pipe, clock: Clock,
                 supplied: dict[str, Any]):
        self.registry = registry
        self.pipe = pipe
        self.clock = clock
        self.spark = registry.spark
        self._cache: dict[str, DataFrame] = {}
        self._scalars: dict[str, Any] = {}
        self.params = {p.name: p.resolve(supplied, clock) for p in pipe.params}

    def param(self, name: str) -> Any:
        return self.params[name]

    def scalar(self, name: str, fn) -> Any:
        """Per-request scalar memo: a watermark/anchor collected once
        per evaluation, shared by every node that re-reads it (r14 —
        _last_batch_ts ran its 3-stage collect chain once per
        consuming node)."""
        if name not in self._scalars:
            self._scalars[name] = fn()
        return self._scalars[name]

    def ref(self, name: str) -> DataFrame:
        if name in self._cache:
            return self._cache[name]
        node = next((n for n in self.pipe.nodes if n.name == name), None)
        if node is not None:
            df = node.fn(self)
        elif name in self.registry._pipes:
            # cross-pipe reference runs the other pipe's endpoint with the
            # same clock (and no extra params) — reference behavior when a
            # pipe selects FROM another pipe (active_vs_missed_flights.pipe).
            other = self.registry._pipes[name]
            df = Context(self.registry, other, self.clock, {}).ref(other.endpoint.name)
        elif name in self.registry._datasources:
            df = self.registry._datasources[name]()
        else:
            raise KeyError(f"unknown relation: {name}")
        self._cache[name] = df
        return df
