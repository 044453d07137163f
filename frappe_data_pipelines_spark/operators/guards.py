"""Driver-side collect guards.

Several operators collect a DataFrame that is small BY CONTRACT (rerank
candidates, Misra-Gries summaries, BPE pretoken histograms, batched ANN
query sets). On a 1000-executor cluster a miscalled operator — e.g.
``rerank`` handed the whole corpus instead of an overfetched top-k —
would OOM the driver long before any error surfaced. ``collect_bounded``
makes misuse fail loudly and cheaply: it collects at most ``cap + 1``
rows (the extra row is the tripwire), so the driver never materializes
more than the contract regardless of the input's true size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Contract caps for the known small-by-contract collects. Deliberately
# generous — they exist to catch "collected the corpus", not to tune.
MAX_RERANK_CANDIDATES = 10_000
MAX_SKETCH_SUMMARY_ROWS = 1_000_000
MAX_BATCH_QUERIES = 100_000
# broadcast-GEMM build side (embedding_neardup_pairs): 1M rows x 1k dims of
# float64 is already ~8 GB of broadcast — anything bigger is not "the small
# side"; the scale path is ann.lsh_similarity_join
MAX_GEMM_BUILD_ROWS = 1_000_000


def collect_bounded(df: DataFrame, cap: int, what: str) -> list:
    """Collect ``df``, raising if it holds more than ``cap`` rows.

    Ships ``limit(cap + 1)`` to the cluster so the violation is detected
    after transferring at most one row past the cap — never the full
    oversized result. Row order of the first ``cap`` rows is preserved
    (an ``orderBy`` upstream of ``limit`` stays a TakeOrdered plan).
    """
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"{what}: driver-side collect exceeded its small-by-contract cap "
            f"({cap} rows) — the input is not the small side this operator "
            f"requires; at scale this collect would OOM the driver"
        )
    return rows


def bounded_window_key(col_name: str):
    """A constant-0 window partition key that SURVIVES constant folding:
    ``coalesce(pmod(col, 1), 0)`` — same value (0) for every row, null
    ids included, but anchored to a real attribute so Catalyst cannot
    fold it out of the window spec.

    Use on windows whose input is bounded BY CONSTRUCTION (post-``limit``
    candidate pools, one-row-per-shuffle-partition offset tables): an
    empty partition spec makes WindowExec log its single-partition
    warning and — more importantly — makes the plan indistinguishable
    from a genuine unbounded global window, which the plan audit bans
    (operators/planlint.py). Keying on this expression both states the
    boundedness in the physical plan and keeps the audit rule strict."""
    from pyspark.sql import functions as F

    return F.coalesce(F.pmod(F.hash(F.col(col_name)), F.lit(1)), F.lit(0))
