"""Generic physical-plan linter — the scale guardrails of
``tools/plan_audit.py`` as a user-facing API.

The audit tool asserts query-specific plan shapes for the shipped catalog;
this module lints ANY DataFrame's executed/analyzed plan for the smells
that break 100 TB jobs, so pipeline authors can gate their own plans the
same way the engine gates its headline queries (reference has no
equivalent — its engine is a service layer over Qdrant/Frappe with no
plan surface; this guards the Spark-first re-expression):

* ``cartesian``      — CartesianProduct / BroadcastNestedLoopJoin: O(n*m)
                       row explosion. Error severity; the only sanctioned
                       shape is a deliberate scalar broadcast (flag it
                       with ``allow_cartesian=True``).
* ``python_udf``     — BatchEvalPython: row-at-a-time Python UDFs
                       serialize row by row; Arrow-batched pandas UDFs
                       (ArrowEvalPython / mapInPandas) are the fast path.
* ``global_sort``    — a global Sort range-partitions the whole dataset;
                       at 100 TB that is usually an accident (the
                       orderBy+limit top-k pattern compiles to
                       TakeOrderedAndProject with no Sort node and passes).
                       Codegen coverage is NOT linted: adaptive plans only
                       assign codegen spans at execution, so it cannot be
                       assessed from a pre-execution plan.
* ``unpushed_filter``— a Filter sitting directly on a parquet scan whose
                       PushedFilters list is empty: the predicate is
                       evaluated post-scan instead of skipping row groups.
* ``many_shuffles``  — Exchange count above a threshold: each shuffle is a
                       full write+read of the stream; chained groupBys and
                       repartitions often collapse with better keys.

``lint_plan`` returns findings (never raises); ``assert_scale_safe``
raises ``PlanLintError`` on error-severity findings — the form CI uses.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


class PlanLintError(AssertionError):
    pass


@dataclass
class Finding:
    check: str
    severity: str  # "error" | "warn" | "info"
    detail: str


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def find_unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partition spec in ``df``'s optimized
    logical plan — each one serializes its entire input through ONE task
    (Spark's own WindowExec warning), the single-partition failure mode
    that killed rrf fusion and perplexity bucketing at scale.

    Walks the plan tree via py4j instead of regexing plan text (window
    expression strings contain nested brackets that defeat text parsing).
    Windows over inputs that are bounded BY CONSTRUCTION (post-``limit``
    pools, one-row-per-shuffle-partition offset tables) must say so by
    keying on ``operators/guards.bounded_window_key`` — which makes the
    spec non-empty and this rule strict: there is NO allowlist, an empty
    spec is always a finding. Returns one description per offending node.
    """
    root = df._jdf.queryExecution().optimizedPlan()
    found: list[str] = []
    stack = [root]
    seen = set()
    while stack:
        node = stack.pop()
        if id(node) in seen:
            continue
        seen.add(id(node))
        name = node.getClass().getSimpleName()
        if name == "Window":
            try:
                if node.partitionSpec().isEmpty():
                    found.append(node.simpleString(120))
            except Exception:  # noqa: BLE001 — node API drift: flag loudly
                found.append(f"{name} (partitionSpec unreadable)")
        for seq_getter in ("children", "innerChildren", "subqueries"):
            try:
                seq = getattr(node, seq_getter)()
            except Exception:  # noqa: BLE001
                continue
            try:
                for i in range(seq.size()):
                    stack.append(seq.apply(i))
            except Exception:  # noqa: BLE001
                continue
    return found


def lint_plan(
    df: DataFrame,
    allow_cartesian: bool = False,
    max_shuffles: int = 6,
) -> list[Finding]:
    """Lint ``df``'s physical plan. Pure plan-text analysis — does NOT
    execute the query (AQE runtime re-plans can only improve on what is
    flagged here, never introduce new smells)."""
    p = _plan_text(df)
    findings: list[Finding] = []

    if not allow_cartesian and (
        "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p
    ):
        findings.append(Finding(
            "cartesian", "error",
            "plan contains a cartesian/nested-loop join — O(n*m) rows at "
            "scale; add an equi-join key, broadcast() the scalar side "
            "deliberately, or pass allow_cartesian=True if this is the "
            "sanctioned scalar-vector pattern",
        ))
    if "BatchEvalPython" in p:
        findings.append(Finding(
            "python_udf", "error",
            "row-at-a-time Python UDF (BatchEvalPython) in the plan — "
            "rewrite as built-in Column expressions or an Arrow-batched "
            "pandas_udf / mapInPandas",
        ))
    for w in find_unpartitioned_windows(df):
        findings.append(Finding(
            "global_window", "error",
            "unpartitioned Window — the entire input serializes through "
            "one task at scale; partition the window, bound its input "
            "with orderBy().limit() and key it on guards."
            f"bounded_window_key, or rewrite as a range-partitioned "
            f"global rank (suffix.py/_global_ntile pattern): {w}",
        ))
    # global Sort nodes. orderBy(...).limit(k) compiles to
    # TakeOrderedAndProject with NO Sort node at all, so ANY Sort block
    # whose Arguments carry the global=true flag is a real full-dataset
    # range partition; SortMergeJoin / window sorts are per-partition
    # ("false") and pass. Checked per node block — a top-k on one branch
    # does not exempt a global sort on another.
    for block in re.split(r"\n(?=\(\d+\) )", p):
        if re.match(r"\(\d+\) Sort\b", block) and re.search(
            r"Arguments: \[[^\n]*\], true,", block
        ):
            findings.append(Finding(
                "global_sort", "warn",
                "global Sort — range-partitions the full dataset; for "
                "top-k use orderBy(...).limit(k) (TakeOrderedAndProject), "
                "for writes prefer sortWithinPartitions",
            ))
            break
    # unpushed filters: a Filter whose CONDITION references columns that a
    # parquet scan produced, while that scan carries no PushedFilters list
    # (formatted mode omits the line entirely when nothing pushed).
    # Post-aggregation/HAVING filters reference derived columns, not scan
    # outputs, and pass.
    unpushed_cols: set[str] = set()
    for block in re.split(r"\n(?=\(\d+\) )", p):
        # "no pushed predicates" = the line is absent or an empty list;
        # a residual Filter over a scan that DID push (partial pushdown)
        # is normal Spark behavior and not flagged
        if re.match(r"\(\d+\) Scan parquet\b", block) and not re.search(
            r"PushedFilters: \[(?!\])", block
        ):
            out_line = re.search(r"Output \[\d+\]: \[([^\n]*)\]", block)
            if out_line:
                unpushed_cols.update(re.findall(r"\w+#\d+", out_line.group(1)))
    if unpushed_cols:
        for block in re.split(r"\n(?=\(\d+\) )", p):
            if not re.match(r"\(\d+\) Filter\b", block):
                continue
            cond = re.search(r"Condition : ([^\n]*)", block)
            if cond and unpushed_cols & set(re.findall(r"\w+#\d+", cond.group(1))):
                findings.append(Finding(
                    "unpushed_filter", "warn",
                    "a Filter references columns of a parquet scan that "
                    "carries no pushed predicates — check the predicate is "
                    "deterministic, non-UDF, and directly on scan columns "
                    "so row groups can be skipped",
                ))
                break
    # count shuffle NODES exactly: formatted plans print "(n) Exchange" once
    # per node block; BroadcastExchange / ReusedExchange are not shuffles
    n_exchange = len(re.findall(r"\(\d+\) Exchange\b", p))
    if n_exchange > max_shuffles:
        findings.append(Finding(
            "many_shuffles", "info",
            f"{n_exchange} Exchange nodes — each is a full shuffle; "
            "co-partition on shared keys or pre-bucket the storage to "
            "collapse adjacent shuffles",
        ))
    return findings


def assert_scale_safe(df: DataFrame, **kwargs) -> list[Finding]:
    """Raise ``PlanLintError`` listing every error-severity finding;
    returns the full findings list (incl. warns) when safe."""
    findings = lint_plan(df, **kwargs)
    errors = [f for f in findings if f.severity == "error"]
    if errors:
        raise PlanLintError(
            "; ".join(f"{f.check}: {f.detail}" for f in errors)
        )
    return findings
