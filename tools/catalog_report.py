"""Print the query catalog: name, oracle status, tags — the navigable index
of SURVEY §2 coverage. Usage: python tools/catalog_report.py"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> None:
    from frappe_data_pipelines_spark.plans.catalog import REGISTRY, queries

    queries()
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    print(f"{len(REGISTRY)} queries, {n_oracle} oracle-checked, "
          f"{len(REGISTRY) - n_oracle} rows-only\n")
    for name, spec in sorted(REGISTRY.items()):
        kind = "oracle" if spec.oracle else "rows  "
        print(f"{kind}  {name:36s}  {','.join(spec.tags)}")


if __name__ == "__main__":
    main()
