"""Canonical schemas for the engine.

The reference's event table is ``LAS2PEERMON.EVENTLOG`` with an 8-column SELECT
list (reference: event_log_generator/event_reader.py:59); its types are surveyed
in SURVEY.md §1.2. We pin an explicit StructType instead of inferring, and keep
the semi-structured ``REMARKS`` JSON payload both raw (lossless) and as a parsed
``map<string,string>`` (dynamic keys; reference flattens row-wise at
event_reader.py:119-126 — here it is ``from_json``, never per-row Python).
"""

from __future__ import annotations

from pyspark.sql import types as T

# XES standard attribute names (the process-mining column convention the
# reference normalizes to; event_reader.py:74-75).
XES_CASE = "case:concept:name"
XES_ACTIVITY = "concept:name"
XES_TIMESTAMP = "time:timestamp"
XES_LIFECYCLE = "lifecycle:transition"

# Rename map: EVENTLOG physical columns -> XES attributes (event_reader.py:74-75).
EVENTLOG_TO_XES = {
    "CASE_ID": XES_CASE,
    "ACTIVITY_NAME": XES_ACTIVITY,
    "TIME_STAMP": XES_TIMESTAMP,
    "LIFECYCLE_PHASE": XES_LIFECYCLE,
}

# EVENT_TYPE recode map (event_reader.py:11-16).
EVENT_TYPE_RECODE = {
    "SERVICE_CUSTOM_MESSAGE_1": "USER_MESSAGE",
    "SERVICE_CUSTOM_MESSAGE_2": "BOT_MESSAGE",
    "SERVICE_CUSTOM_MESSAGE_3": "SERVICE_REQUEST",
}

# Recoded event types kept when bot messages are excluded (event_reader.py:18-20).
KEPT_EVENT_TYPES_NO_BOT = ("SERVICE_REQUEST", "USER_MESSAGE")

# The raw (pre-recode) code excluded in SQL when bot messages are off
# (event_reader.py:60-61).
BOT_RAW_EVENT_TYPE = "SERVICE_CUSTOM_MESSAGE_2"

EVENTLOG_SCHEMA = T.StructType(
    [
        T.StructField("EVENT_TYPE", T.StringType()),
        T.StructField("CASE_ID", T.StringType()),
        T.StructField("ACTIVITY_NAME", T.StringType()),
        T.StructField("TIME_STAMP", T.TimestampType()),
        T.StructField("LIFECYCLE_PHASE", T.StringType()),
        T.StructField("RESOURCE", T.StringType()),
        T.StructField("RESOURCE_TYPE", T.StringType()),
        T.StructField("REMARKS", T.StringType()),  # JSON payload, dynamic keys
    ]
)

# Known REMARKS keys observed in the reference's data (SURVEY.md §1.1) with
# their fill defaults (event_reader.py:34-43).
REMARKS_KNOWN_KEYS: dict[str, str | bool] = {
    "serviceEndpoint": "",
    "user": "",
    "in-service-context": False,
}

# Driver fixture: events.parquet (TESTDATA.md / FIXTURES.md §5).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)
