from frappe_data_pipelines_spark.plans.catalog import REGISTRY, QuerySpec, oracle_sql, queries  # noqa: F401
