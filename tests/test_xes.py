"""XES sink round-trip tests (SURVEY.md §5): write → parse XML → re-derive
structure → equality modulo trace order. pm4py parse runs when available."""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from datetime import datetime

import pytest

from mobsos_event_log_generator_spark.plans.eventlog import EventLogParams, build_eventlog
from mobsos_event_log_generator_spark.schema import EVENTLOG_SCHEMA, XES_CASE
from mobsos_event_log_generator_spark.sinks.xes import read_xes, write_xes

ROWS = [
    ("SERVICE_CUSTOM_MESSAGE_1", "c1", "ask <&> \"q\"", datetime(2024, 1, 1, 10, 0, 0), "complete", "r1", "bot", '{"user": "u1"}'),
    ("SERVICE_CUSTOM_MESSAGE_3", "c1", "getMenu", datetime(2024, 1, 1, 10, 0, 5), "complete", "r1", "bot", None),
    ("SERVICE_CUSTOM_MESSAGE_1", "c2", "orderFood", datetime(2024, 1, 2, 12, 0, 0), "complete", "r2", "service", '{"user": "u2"}'),
]


@pytest.fixture(scope="module")
def normalized(spark):
    df = spark.createDataFrame(ROWS, EVENTLOG_SCHEMA)
    return build_eventlog(df, EventLogParams()).cache()


def test_single_file_roundtrip(normalized, tmp_path):
    path = str(tmp_path / "log.xes")
    write_xes(normalized, path, single_file=True)
    # Well-formed XML with XES structure
    root = ET.parse(path).getroot()
    assert root.tag.endswith("log")
    traces = read_xes(path)
    assert {t["attrs"]["concept:name"] for t in traces} == {"c1", "c2"}
    c1 = next(t for t in traces if t["attrs"]["concept:name"] == "c1")
    assert [e["concept:name"] for e in c1["events"]] == ['ask <&> "q"', "getMenu"]
    ev = c1["events"][0]
    assert ev["time:timestamp"].startswith("2024-01-01T10:00:00")
    assert ev["lifecycle:transition"] == "complete"
    assert ev["EVENT_TYPE"] == "USER_MESSAGE"
    # NULL REMARKS attribute omitted, present on the other event
    assert "REMARKS" not in c1["events"][1]
    assert c1["events"][0]["REMARKS"] == '{"user": "u1"}'


def test_sharded_write_each_file_valid(normalized, tmp_path):
    out = str(tmp_path / "shards")
    write_xes(normalized, out, single_file=False, num_shards=4)
    files = [f for f in os.listdir(out) if f.endswith(".xes")]
    assert files, "no shards written"
    all_cases = set()
    for f in files:
        traces = read_xes(os.path.join(out, f))  # each shard independently parseable
        all_cases |= {t["attrs"]["concept:name"] for t in traces}
    assert all_cases == {"c1", "c2"}


def test_xml_stays_jvm_side(normalized):
    """The trace→XML expression must compile to JVM ops (no BatchEvalPython)."""
    from mobsos_event_log_generator_spark.sinks.xes import traces_to_xml

    plan = traces_to_xml(normalized)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_pm4py_parse_if_available(normalized, tmp_path):
    pm4py = pytest.importorskip("pm4py")
    path = str(tmp_path / "log.xes")
    write_xes(normalized, path, single_file=True)
    log = pm4py.read_xes(path)
    assert len(log[XES_CASE].unique()) == 2


def test_distributed_xes_reader_roundtrip(spark, normalized, tmp_path):
    """Sharded write → distributed read-back: every event survives with its
    trace identity (the XES source pair of the sink)."""
    from mobsos_event_log_generator_spark.sinks.xes import read_xes_distributed

    out = str(tmp_path / "shards")
    write_xes(normalized, out, single_file=False, num_shards=4)
    back = read_xes_distributed(spark, out)
    rows = back.collect()
    assert len(rows) == normalized.count()
    assert {r["trace"] for r in rows} == {"c1", "c2"}
    c1_events = sorted((r["ts"], r["activity"]) for r in rows if r["trace"] == "c1")
    assert [a for _, a in c1_events] == ['ask <&> "q"', "getMenu"]
    assert all(r["attrs"]["lifecycle:transition"] == "complete" for r in rows)


def test_typed_attributes_roundtrip(spark, tmp_path):
    """int/float/boolean attr columns serialize as typed XES elements and
    round-trip to native Python values via read_xes(typed=True)."""
    rows = [
        ("c1", "a1", datetime(2024, 1, 1, 10, 0, 0), 3, 1.5, True),
        ("c1", "a2", datetime(2024, 1, 1, 10, 0, 5), -7, 0.25, False),
        ("c2", "a3", datetime(2024, 1, 2, 12, 0, 0), 0, 2.0, True),
    ]
    df = spark.createDataFrame(
        rows,
        "`case:concept:name` string, `concept:name` string, `time:timestamp` timestamp, "
        "n_items long, score double, is_bot boolean",
    )
    path = str(tmp_path / "typed.xes")
    write_xes(df, path, single_file=True)
    xml = open(path).read()
    assert '<int key="n_items" value="3"/>' in xml
    assert '<float key="score" value="1.5"/>' in xml
    assert '<boolean key="is_bot" value="true"/>' in xml
    assert '<boolean key="is_bot" value="false"/>' in xml

    traces = read_xes(path, typed=True)
    c1 = next(t for t in traces if t["attrs"]["concept:name"] == "c1")
    ev = c1["events"][0]
    assert ev["n_items"] == 3 and isinstance(ev["n_items"], int)
    assert ev["score"] == 1.5 and isinstance(ev["score"], float)
    assert ev["is_bot"] is True
    # untyped read keeps the historical all-strings contract
    ev_s = read_xes(path)[0]["events"][0]
    assert ev_s["n_items"] == "3" and ev_s["is_bot"] == "true"


def test_distributed_reader_exposes_attr_types(spark, tmp_path):
    """The distributed reader's attr_types map carries each key's XES tag so
    callers can re-type columns losslessly."""
    from mobsos_event_log_generator_spark.sinks.xes import read_xes_distributed

    rows = [("c1", "a1", datetime(2024, 1, 1, 10, 0, 0), 3, True)]
    df = spark.createDataFrame(
        rows,
        "`case:concept:name` string, `concept:name` string, `time:timestamp` timestamp, "
        "n_items long, is_bot boolean",
    )
    out = str(tmp_path / "typed_shards")
    write_xes(df, out, single_file=False, num_shards=2)
    back = read_xes_distributed(spark, out).collect()
    assert len(back) == 1
    tags = back[0]["attr_types"]
    assert tags["n_items"] == "int" and tags["is_bot"] == "boolean"
    assert tags["concept:name"] == "string" and tags["time:timestamp"] == "date"


def test_xes_datasource_matches_distributed_reader(spark, tmp_path):
    """The Python DataSource ('xes' format) and the binaryFile+mapInPandas
    reader must produce identical rows over the same sharded log."""
    from mobsos_event_log_generator_spark.plans.queries import _normalized_eventlog
    from mobsos_event_log_generator_spark.sinks.xes import read_xes_distributed, write_xes
    from mobsos_event_log_generator_spark.sources.xes_source import register_xes_source

    df = _normalized_eventlog(spark, "/root/testdata/sf0.001").select(
        "case:concept:name", "concept:name", "time:timestamp", "lifecycle:transition"
    )
    out = str(tmp_path / "shards")
    write_xes(df, out, single_file=False, num_shards=4)

    register_xes_source(spark)
    via_source = spark.read.format("xes").load(out)
    via_mapinpandas = read_xes_distributed(spark, out)

    a = sorted((r["trace"], r["activity"], r["ts"]) for r in via_source.collect())
    b = sorted((r["trace"], r["activity"], r["ts"]) for r in via_mapinpandas.collect())
    assert a == b and len(a) == df.count()
    # one input partition per shard
    assert via_source.rdd.getNumPartitions() == 4


GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "golden_eventlog.xes")
GOLDEN_ROWS = [
    ("SERVICE_CUSTOM_MESSAGE_1", "c1", 'ask <&> "q"', datetime(2024, 1, 1, 10, 0, 0), "complete", "r1", "bot", '{"user": "u1"}'),
    ("SERVICE_CUSTOM_MESSAGE_3", "c1", "getMenu", datetime(2024, 1, 1, 10, 0, 5, 250000), "complete", "r1", "bot", None),
    ("SERVICE_CUSTOM_MESSAGE_1", "c2", "orderFood\nwith newline\ttab", datetime(2024, 1, 2, 12, 0, 0), "complete", "r2", "service", '{"user": "u2"}'),
]


def _split_xes(text: str) -> tuple[str, list[str], str]:
    """(header, sorted trace blocks, footer) — trace order is the one
    degree of freedom the sink does not promise (hash-partitioned writes)."""
    body_start = text.index("\t<trace>")
    body_end = text.rindex("</trace>\n") + len("</trace>\n")
    header, body, footer = text[:body_start], text[body_start:body_end], text[body_end:]
    blocks = ["\t<trace>" + b for b in body.split("\t<trace>") if b]
    return header, sorted(blocks), footer


def test_golden_xes_bytes(spark, tmp_path):
    """Durable serialization contract (r6 verdict #6): the committed golden
    fixture pins the exact bytes the sink must keep producing — extension
    headers, attribute typing/order, XML escaping (incl. &#10;/&#9; refs),
    ISO-8601 microsecond timestamps with UTC 'Z' — i.e. the pm4py-2.7.7
    importer conventions the reference relies on (app.py:216-217). pm4py is
    absent from this env, so the fixture was generated by this sink and
    hand-audited against IEEE 1849-2016 + pm4py's importer expectations;
    test_pm4py_parse_if_available re-proves parseability wherever pm4py
    exists. Comparison is byte-exact modulo trace order."""
    df = spark.createDataFrame(GOLDEN_ROWS, EVENTLOG_SCHEMA)
    log = build_eventlog(df, EventLogParams())
    path = str(tmp_path / "golden_check.xes")
    write_xes(log, path, single_file=True)
    with open(path, encoding="utf-8") as fh:
        got = fh.read()
    with open(GOLDEN, encoding="utf-8") as fh:
        want = fh.read()
    assert _split_xes(got) == _split_xes(want)


def test_golden_xes_fixture_invariants():
    """The fixture itself stays well-formed and pm4py-convention-shaped even
    if regenerated: standard extension URIs, typed date attrs, escaped text."""
    import re

    with open(GOLDEN, encoding="utf-8") as fh:
        text = fh.read()
    root = ET.fromstring(text)
    assert root.tag == "{http://www.xes-standard.org/}log"
    assert root.get("xes.version") == "1849-2016"
    uris = {e.get("uri") for e in root if e.tag.endswith("extension")}
    assert {
        "http://www.xes-standard.org/concept.xesext",
        "http://www.xes-standard.org/time.xesext",
        "http://www.xes-standard.org/lifecycle.xesext",
    } <= uris
    # every timestamp is ISO-8601 with microseconds, UTC
    stamps = re.findall(r'<date key="time:timestamp" value="([^"]+)"', text)
    assert stamps and all(
        re.fullmatch(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{6}(Z|[+-]\d{2}:\d{2})", s)
        for s in stamps
    )
    # raw control/markup characters never appear inside attribute values
    # (the newline/tab in the fixture's activity ride as character refs)
    assert "&#10;" in text and "&#9;" in text
    values = re.findall(r'value="([^"]*)"', text)
    assert values and all(ch not in v for v in values for ch in "\n\t<>\"")
