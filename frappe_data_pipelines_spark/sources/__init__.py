from frappe_data_pipelines_spark.sources.tables import TABLE_NAMES, load_table, load_tables  # noqa: F401
