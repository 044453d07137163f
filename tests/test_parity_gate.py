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
