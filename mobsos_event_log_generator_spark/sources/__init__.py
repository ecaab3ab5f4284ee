from mobsos_event_log_generator_spark.sources.parquet import load_table, load_tables  # noqa: F401
