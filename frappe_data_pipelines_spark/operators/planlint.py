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
* ``global_sort``    — a global Sort that is NOT the TakeOrderedAndProject
                       top-k pattern range-partitions the whole dataset;
                       at 100 TB that is usually an accident.
* ``unpushed_filter``— a Filter sitting directly on a parquet scan whose
                       PushedFilters list is empty: the predicate is
                       evaluated post-scan instead of skipping row groups.
* ``no_codegen``     — relational operators outside WholeStageCodegen
                       spans (only flagged when the plan has codegen-able
                       operators but no span at all).
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
    # global Sort that is not the top-k TakeOrderedAndProject pattern.
    # Formatted plans print one block per node: "(3) Sort" followed by an
    # "Arguments: [keys], true, 0" line whose boolean is the GLOBAL flag —
    # SortMergeJoin / window sorts are per-partition ("false") and pass.
    if "TakeOrderedAndProject" not in p:
        for block in re.split(r"\n(?=\(\d+\) )", p):
            if re.match(r"\(\d+\) Sort\b", block) and re.search(
                r"Arguments: \[[^\n]*\], true,", block
            ):
                findings.append(Finding(
                    "global_sort", "warn",
                    "global Sort without a following limit — "
                    "range-partitions the full dataset; for top-k use "
                    "orderBy(...).limit(k) (TakeOrderedAndProject), for "
                    "writes prefer sortWithinPartitions",
                ))
                break
    # unpushed filters: the plan filters rows over a parquet scan, yet NO
    # scan carries a PushedFilters list (formatted mode omits the line
    # entirely when nothing pushed). Heuristic: a plan mixing pushed and
    # unpushed scans passes — the per-query audit tool covers those.
    if (
        "Scan parquet" in p
        and re.search(r"\(\d+\) Filter\b", p)
        and "PushedFilters: [" not in p
    ):
        findings.append(Finding(
            "unpushed_filter", "warn",
            "the plan filters rows over a parquet scan but no scan carries "
            "pushed filters — check the predicate is deterministic, "
            "non-UDF, and on scan columns so row groups can be skipped",
        ))
    # codegen spans are only assigned once AQE finalizes the plan, so the
    # check is meaningful only for non-adaptive (or executed) plans —
    # adaptive pre-execution plans print neither marker and must not be
    # flagged
    relational = any(op in p for op in ("HashAggregate", "Project", "Filter"))
    if (
        relational
        and "AdaptiveSparkPlan" not in p
        and "codegen id" not in p
        and "WholeStageCodegen" not in p
    ):
        findings.append(Finding(
            "no_codegen", "warn",
            "no WholeStageCodegen span in a relational plan — UDFs or "
            "unsupported expressions are forcing interpreted evaluation",
        ))
    n_exchange = p.count("Exchange")
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
