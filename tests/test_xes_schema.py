"""XES schema validation against the vendored IEEE 1849-2016 XSD.

The defining consumer of the XES sinks is pm4py (`/root/reference/
app.py:216-217` → example.ipynb cell 3), which is not installed here — so
pm4py compatibility is proven structurally: every sink output must validate
against the vendored public XES schema (r10 verdict item #1), via the
stdlib schema interpreter in ``sinks/xsd_validate.py``. The pm4py parse
test in test_xes.py stays importorskip'd and auto-upgrades if the wheel
ever appears. Negative tests prove the validator actually rejects
violations (a validator that passes everything proves nothing).
"""

from __future__ import annotations

import glob
import os
from datetime import datetime

import pytest

from mobsos_event_log_generator_spark.plans.eventlog import EventLogParams, build_eventlog
from mobsos_event_log_generator_spark.schema import EVENTLOG_SCHEMA
from mobsos_event_log_generator_spark.sinks.xes import write_xes
from mobsos_event_log_generator_spark.sinks.xsd_validate import (
    XesValidationError,
    xes_schema,
)

ROWS = [
    ("SERVICE_CUSTOM_MESSAGE_1", "c1", 'ask <&> "q"', datetime(2024, 1, 1, 10, 0, 0), "complete", "r1", "bot", '{"user": "u1"}'),
    ("SERVICE_CUSTOM_MESSAGE_3", "c1", "getMenu", datetime(2024, 1, 1, 10, 0, 5), "complete", "r1", "bot", None),
    ("SERVICE_CUSTOM_MESSAGE_1", "c2", "orderFood", datetime(2024, 1, 2, 12, 0, 0), "complete", "r2", "service", '{"user": "u2"}'),
]


@pytest.fixture(scope="module")
def schema():
    return xes_schema()


@pytest.fixture(scope="module")
def normalized(spark):
    df = spark.createDataFrame(ROWS, EVENTLOG_SCHEMA)
    return build_eventlog(df, EventLogParams()).cache()


@pytest.fixture(scope="module")
def valid_doc(normalized, tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("xes") / "log.xes")
    write_xes(normalized, path, single_file=True)
    with open(path) as f:
        return f.read()


def test_schema_loads_and_declares_log(schema):
    assert schema.top_elements == {"log": "LogType"}
    assert schema.target_ns == "http://www.xes-standard.org/"


def test_single_file_sink_is_schema_valid(schema, valid_doc):
    schema.validate(valid_doc)  # raises on any violation


def test_extension_headers_declared_before_content(valid_doc):
    """concept/time/lifecycle extension declarations with their canonical
    URIs must open the log (the headers pm4py emits and expects)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(valid_doc)
    kids = [(c.tag.rsplit("}", 1)[-1], c.attrib) for c in root]
    exts = [a for t, a in kids if t == "extension"]
    assert {(e["name"], e["prefix"], e["uri"]) for e in exts} == {
        ("Concept", "concept", "http://www.xes-standard.org/concept.xesext"),
        ("Time", "time", "http://www.xes-standard.org/time.xesext"),
        ("Lifecycle", "lifecycle", "http://www.xes-standard.org/lifecycle.xesext"),
    }
    # declarations strictly precede every trace
    first_trace = next(i for i, (t, _) in enumerate(kids) if t == "trace")
    assert all(t == "extension" for t, _ in kids[:first_trace][:3])


def test_sharded_sink_every_shard_schema_valid(schema, normalized, tmp_path):
    out = str(tmp_path / "shards")
    write_xes(normalized, out, single_file=False, num_shards=4)
    files = [os.path.join(out, f) for f in os.listdir(out) if f.endswith(".xes")]
    assert files
    for f in files:
        schema.validate(f)


def test_streaming_sink_every_shard_schema_valid(schema, spark, tmp_path):
    from mobsos_event_log_generator_spark.streaming.ingest import stream_events
    from mobsos_event_log_generator_spark.streaming.sessionize import (
        sessionized_traces,
        stream_xes_sink,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    traces = sessionized_traces(stream_events(spark, src))
    q = stream_xes_sink(
        traces, out_dir=str(tmp_path / "xes"), checkpoint_dir=str(tmp_path / "ck")
    )
    q.awaitTermination()
    files = glob.glob(str(tmp_path / "xes" / "batch=*" / "*.xes"))
    assert files
    for f in files:
        schema.validate(f)


def test_typed_attributes_schema_valid(schema, spark, tmp_path):
    """int/float/boolean/date event attributes (the standard's full type
    set, beyond the reference's string/date) validate as their XSD types."""
    df = spark.createDataFrame(
        [("c1", "a1", datetime(2024, 1, 1, 9, 0, 0), 7, 1.5, True)],
        "`case:concept:name` string, `concept:name` string, "
        "`time:timestamp` timestamp, n_items long, score double, ok boolean",
    )
    path = str(tmp_path / "typed.xes")
    write_xes(df, path, single_file=True)
    schema.validate(path)
    with open(path) as f:
        doc = f.read()
    assert '<int key="n_items" value="7"/>' in doc
    assert '<float key="score" value="1.5"/>' in doc
    assert '<boolean key="ok" value="true"/>' in doc


@pytest.mark.parametrize(
    "mutate, why",
    [
        (lambda d: d.replace('key="concept:name" value="getMenu"', 'value="getMenu"', 1),
         "missing required key attribute"),
        (lambda d: d.replace('<date key="time:timestamp" value="2024-01-01T10:00:00',
                             '<date key="time:timestamp" value="not-a-date', 1),
         "type-invalid xs:dateTime"),
        (lambda d: d.replace('<string key="EVENT_TYPE"', '<int key="EVENT_TYPE"', 1),
         "non-integer value on an int attribute"),
        (lambda d: d.replace("</log>", '<extension name="X" prefix="x" '
                             'uri="http://x/"/></log>', 1),
         "extension declared after traces (sequence order)"),
        (lambda d: d.replace("\t\t</event>", '\t\t<banana key="k" value="v"/></event>', 1),
         "undeclared element"),
        (lambda d: d.replace('xes.version="1849-2016"', "", 1),
         "missing required xes.version"),
        (lambda d: d.replace('<log xes.version', '<log bogus="1" xes.version', 1),
         "undeclared attribute on log"),
        (lambda d: d.replace('xmlns="http://www.xes-standard.org/"',
                             'xmlns="http://example.org/"', 1),
         "wrong namespace"),
    ],
)
def test_validator_rejects_violations(schema, valid_doc, mutate, why):
    broken = mutate(valid_doc)
    assert broken != valid_doc, f"mutation not applied: {why}"
    with pytest.raises(XesValidationError):
        schema.validate(broken)
