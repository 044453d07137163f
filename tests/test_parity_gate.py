"""The driver's correctness gate inside pytest: every oracle query must hash-
match DuckDB at sf0.001. Keeps `pytest` alone sufficient to catch oracle
drift between driver rounds."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_full_catalog_parity(spark, sf_dir):
    from parity import run_parity

    n_pass, n_fail, n_rows_only, failures = run_parity(
        sf_dir, spark=spark, echo=lambda *_: None
    )
    assert n_fail == 0, f"parity failures: {failures}"
    assert n_pass >= 80


def test_parity_artifact_freshness():
    """VERDICT r9 task 8: the newest PARITY_r*.json at the repo root must
    have been exported from the CURRENT catalog — its catalog_hash and
    query count must match a fresh fingerprint, and it must record zero
    failures over the full (non-partial) catalog. A stale artifact (the
    catalog changed after export) fails here, forcing a re-export:
    `python tools/parity.py --json PARITY_r<N>_final.json /root/testdata/sf0.01`.
    Skips only when no artifact carries hash fields yet (pre-round-10)."""
    import glob
    import json
    import re

    import pytest
    from parity import catalog_fingerprint

    root = Path(__file__).resolve().parents[1]
    arts = sorted(
        glob.glob(str(root / "PARITY_r*.json")),
        key=lambda p: int(re.search(r"PARITY_r0*(\d+)", p).group(1)),
    )
    assert arts, "no PARITY artifact at the repo root"
    with open(arts[-1]) as f:
        art = json.load(f)
    if "catalog_hash" not in art:
        pytest.skip("latest PARITY artifact predates hash stamping")
    n_queries, cat_hash = catalog_fingerprint()
    assert not art.get("partial"), "latest PARITY artifact is a subset run"
    assert art["catalog_hash"] == cat_hash, (
        "stale PARITY artifact: the catalog changed after it was exported — "
        "re-run tools/parity.py --json"
    )
    assert art["n_queries"] == n_queries
    assert art["n_fail"] == 0
    assert art["n_pass"] + art["n_fail"] + art["n_rows_only"] == n_queries
