"""Extended join operators (SURVEY §2.C note: the reference has no join
executor; as-of/range joins are the Spark-native extended surface).

``asof_backward`` uses the union + window formulation instead of
join-then-aggregate: interleave both sides on the time axis per key, carry
the latest right-side value forward with a running ``last(ignorenulls)``,
keep left rows. One shuffle on the key, one per-key sort — the matched-pairs
blow-up of the naive equi-join + range filter (every left row × every earlier
right row) never materializes. This is the standard scale formulation for
point-in-time correctness joins (feature stores, trade/quote alignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_col: str = "ts",
    out_col: str = "asof_value",
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, the latest right-side ``value_col`` with
    ``right_ts <= left_ts`` (or strict ``<`` when ``inclusive=False``) per
    key. Left rows with no prior right row get NULL (filter for inner
    semantics)."""
    l = left.withColumn("_evt_ts", F.col(left_ts)).withColumn("_side", F.lit(0)).withColumn(
        "_val", F.lit(None).cast(right.schema[value_col].dataType)
    )
    r = (
        right.select(*key_cols, F.col(right_ts).alias("_evt_ts"), F.col(value_col).alias("_val"))
        .withColumn("_side", F.lit(1))
    )
    both = l.unionByName(r, allowMissingColumns=True)
    # at equal timestamps the right row must be visible to the left row when
    # inclusive: order right (side=1) before left (side=0) — and after when
    # strict
    side_order = F.col("_side").desc() if inclusive else F.col("_side").asc()
    # full tie-break: several right rows at the SAME timestamp must resolve
    # deterministically (max value wins) or the picked asof_value would vary
    # run to run (SURVEY hard spot (c))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_evt_ts").asc(), side_order, F.col("_val").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn(
        out_col, F.last(F.when(F.col("_side") == 1, F.col("_val")), ignorenulls=True).over(w)
    )
    return matched.filter(F.col("_side") == 0).drop("_evt_ts", "_side", "_val")
