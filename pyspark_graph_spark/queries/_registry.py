"""Query/oracle registry primitives.

``QUERIES``/``ORACLES`` preserve REGISTRATION order (the driver's gate
window is the first 50 entries after the GATE_PRIORITY reorder in
``__init__``); domain modules register via the ``@query`` decorator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
