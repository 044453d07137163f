"""Query catalog: every implemented operator exposed as a named query with a
DuckDB oracle (the driver contract in ``__spark_entry__.py``).

Registration pattern: ``@register("name", oracle="SELECT ...")``. Oracle-less
entries get the driver's weaker rows-only check (used for genuinely
non-SQL-expressible ops like the recursive chunker internals — those get
property tests in tests/ instead).

Parity rules (SURVEY §7 hard spots):
  * every computed column aliased identically on both sides;
  * float aggregates: exact DECIMAL accumulation cast back to DOUBLE (so the
    Spark/DuckDB results are bit-identical), or round(…, 6) for scores;
  * top-k queries carry a full deterministic tie-break;
  * counts cast to BIGINT on both sides (DuckDB sums are HUGEINT by default).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple = ()):  # decorator
    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:  # silent shadowing once hid a duplicate Q16
            raise ValueError(f"duplicate catalog query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return wrap


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


_loaded = False


def _load_all() -> None:
    """Import all query modules (side-effect: registration)."""
    global _loaded
    if _loaded:
        return
    from frappe_data_pipelines_spark.plans import (  # noqa: F401
        pipelinequeries,
        qualityqueries,
        relational,
        scalarqueries,
        servicequeries,
        sketchqueries,
        textqueries,
        tpch_extra,
        vectorqueries,
        webqueries,
    )

    _loaded = True
