"""mobsos_event_log_generator_spark — a PySpark-native event-log analytics engine.

A from-scratch engine with the query and data-processing capabilities of the
reference ``rwth-acis/mobsos-event-log-generator`` (a pandas/MySQL/Flask XES
event-log generator, see SURVEY.md), re-expressed as idiomatic Spark:

* ``sources``   — parquet/JDBC/REST readers (reference: event_reader.py:71-85, app.py:251)
* ``operators`` — composable DataFrame transforms for the reference's filter /
  recode / normalize / flatten semantics plus LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal columns)
* ``plans``     — parameterized logical-plan builders (the reference's query API)
* ``sinks``     — pm4py-compatible XES writer (reference: app.py:216-217)
* ``streaming`` — Structured Streaming incremental ingest + sessionized traces
* ``cache``     — param-hash artifact cache with TTL eviction (app.py:220-230, tasks.py)

Everything is DataFrame-first: predicates are Column expressions (Catalyst pushes
them down), JSON flattening is ``from_json`` (never row-wise Python), trace
assembly is ``groupBy(case).agg(sort_array(collect_list(...)))``, and Python
only appears as Arrow-batched pandas UDFs where the built-ins genuinely cannot
express the semantics.
"""

__version__ = "0.1.0"

from mobsos_event_log_generator_spark.session import get_spark  # noqa: F401
