"""Local self-check mirroring the driver's correctness gate: run every
catalog query on Spark AND its DuckDB oracle, compare row count, column
names, and order-insensitive values.

Usage: python tools/parity.py [--json OUT.json] [sf_dir] [query ...]

``--json`` writes the FULL per-query result (status, rows, seconds,
failure detail) as one JSON object — the per-round artifact that closes
the driver-sample coverage hole (VERDICT r3 #4: the driver hashes a
50-query sample; this file records all ~141 oracled queries every round).
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def df_to_rows(cols, rows):
    out = [tuple(norm_cell(r[c]) for c in cols) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def catalog_fingerprint() -> tuple[int, str]:
    """(query count, stable sha256) over the registered catalog — query
    names plus their oracle SQL. Stamped into every --json PARITY export
    and asserted by tests/test_parity_gate.py, so an artifact exported
    before the catalog changed reads as STALE instead of as evidence
    (VERDICT r9 task 8)."""
    import hashlib

    from frappe_data_pipelines_spark.plans.catalog import REGISTRY, queries

    queries()  # trigger registration
    h = hashlib.sha256()
    for name in sorted(REGISTRY):
        h.update(name.encode())
        h.update(b"\x00")
        h.update((REGISTRY[name].oracle or "").encode())
        h.update(b"\x01")
    return len(REGISTRY), h.hexdigest()


def run_parity(sf_dir: str, only=None, spark=None, echo=print, results=None):
    """Run the gate; returns (n_pass, n_fail, n_rows_only, failures list).
    Importable so the pytest suite carries the same check as the driver.
    Pass a dict as ``results`` to receive a per-query record."""
    only = set(only or ())

    from frappe_data_pipelines_spark.plans.catalog import REGISTRY, queries

    queries()  # trigger registration
    if spark is None:
        from frappe_data_pipelines_spark.session import get_spark

        spark = get_spark()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            echo(f"FAIL  {name}: spark error: {e}"); failures.append(name)
            n_fail += 1
            if results is not None:
                results[name] = {"status": "fail", "err": f"spark: {e}"[:500]}
            continue
        if spec.oracle is None:
            secs = round(time.time() - t0, 2)
            echo(f"rows  {name}: {len(srows)} rows ({secs:.1f}s) [rows-only]")
            n_rows_only += 1
            if results is not None:
                results[name] = {"status": "rows_only", "rows": len(srows), "secs": secs}
            continue
        try:
            ddf = con.sql(spec.oracle)
            dcols = [c for c in ddf.columns]
            drows = ddf.fetchall()
        except Exception as e:  # noqa: BLE001
            echo(f"FAIL  {name}: duckdb error: {e}"); failures.append(name)
            n_fail += 1
            if results is not None:
                results[name] = {"status": "fail", "err": f"duckdb: {e}"[:500]}
            continue
        ok = True
        msgs = []
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"row count spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={scols} duck={dcols}")
        if ok:
            s_sorted = df_to_rows(sorted(scols), [r.asDict() for r in srows])
            d_sorted = df_to_rows(
                sorted(dcols), [dict(zip(dcols, r)) for r in drows]
            )
            if s_sorted != d_sorted:
                ok = False
                diffs = [
                    (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
                ][:3]
                msgs.append(f"values differ; first diffs: {diffs}")
        secs = round(time.time() - t0, 2)
        if ok:
            echo(f"PASS  {name}: {len(srows)} rows ({secs:.1f}s)")
            n_pass += 1
            if results is not None:
                results[name] = {"status": "pass", "rows": len(srows), "secs": secs}
        else:
            echo(f"FAIL  {name}: {'; '.join(msgs)}"); failures.append(name)
            n_fail += 1
            if results is not None:
                results[name] = {"status": "fail", "err": "; ".join(msgs)[:500]}
    echo(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return n_pass, n_fail, n_rows_only, failures


def trend_vs_prior(results: dict, prior_path: str) -> list[dict]:
    """Wall-time movers of this export vs a prior PARITY artifact — the
    correctness-gate-side early warning VERDICT r10 task 7 asked for: the
    gate records per-query ``secs`` anyway, and a >1.5x (and >0.5s
    absolute, prior >=0.2s — sub-noise rows excluded) move shows up here
    without depending on the bench host's mood. Informational: the gate's
    pass/fail is untouched."""
    import json

    with open(prior_path) as f:
        prior = json.load(f)
    pq = prior.get("queries", {})
    movers = []
    for name, rec in results.items():
        s, p = rec.get("secs"), (pq.get(name) or {}).get("secs")
        if s and p and p >= 0.2 and s / p > 1.5 and s - p > 0.5:
            movers.append(
                {"query": name, "prior_secs": p, "secs": s,
                 "ratio": round(s / p, 2)}
            )
    return sorted(movers, key=lambda m: -m["ratio"])


def main() -> int:
    import glob
    import json
    import os
    import re

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    results: dict = {}
    n_pass, n_fail, n_rows_only, _ = run_parity(
        sf_dir, only=argv[1:], results=results
    )
    if json_out:
        n_queries, cat_hash = catalog_fingerprint()
        payload = {
            "sf_dir": sf_dir,
            "n_pass": n_pass,
            "n_fail": n_fail,
            "n_rows_only": n_rows_only,
            "n_queries": n_queries,
            "catalog_hash": cat_hash,
            "partial": bool(argv[1:]),  # a subset run is never the artifact
            "queries": results,
        }
        # wall-time trend vs the newest prior artifact at the SAME sf_dir
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        priors = sorted(
            (p for p in glob.glob(os.path.join(root, "PARITY_r*.json"))
             if os.path.abspath(p) != os.path.abspath(json_out)),
            key=lambda p: (int(re.search(r"PARITY_r0*(\d+)", p).group(1)), p),
        )
        for p in reversed(priors):
            with open(p) as f:
                prior = json.load(f)
            if prior.get("sf_dir") == sf_dir and not prior.get("partial"):
                movers = trend_vs_prior(results, p)
                payload["secs_trend"] = {
                    "prior_source": os.path.basename(p),
                    "movers_gt_1_5x": movers,
                }
                if movers:
                    print(f"secs trend vs {os.path.basename(p)}: "
                          + ", ".join(f"{m['query']} {m['prior_secs']}→"
                                      f"{m['secs']}s ({m['ratio']}x)"
                                      for m in movers))
                else:
                    print(f"secs trend vs {os.path.basename(p)}: "
                          "no >1.5x movers")
                break
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
