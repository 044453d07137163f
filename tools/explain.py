"""Print the executed physical plan of a named catalog query.

Usage: python tools/explain.py <query_name> [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    from frappe_data_pipelines_spark.plans.catalog import queries
    from frappe_data_pipelines_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    df = queries()[name](spark, sf_dir)
    df.collect()  # finalize AQE
    print(df._jdf.queryExecution().executedPlan().toString())


if __name__ == "__main__":
    main()
