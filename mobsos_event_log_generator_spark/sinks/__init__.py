from mobsos_event_log_generator_spark.sinks.xes import write_xes, read_xes  # noqa: F401
