"""Property-based XES round-trip (SURVEY.md §5): for arbitrary small event
logs, write → parse XML → re-derive structure → equality modulo trace order.

Hypothesis drives case ids / activities / attribute payloads over a nasty
alphabet (XML metacharacters, quotes, unicode, control chars, whitespace);
timestamps over a wide range. One Spark round-trip per generated log is slow,
so examples are capped — the alphabet breadth does the work.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mobsos_event_log_generator_spark.schema import (
    XES_ACTIVITY,
    XES_CASE,
    XES_TIMESTAMP,
)
from mobsos_event_log_generator_spark.sinks.xes import read_xes, write_xes

# XML-hostile but representable content: metachars, quotes, unicode,
# forbidden control chars (stripped by the writer), tabs/newlines (escaped
# as character references).
NASTY = st.text(
    alphabet=st.sampled_from(list("abc<>&\"'é世 \t\n\x01\x1f]]>")),
    min_size=0,
    max_size=12,
)

EVENTS = st.lists(
    st.tuples(
        st.sampled_from(["c1", "c2", "c<3>", 'c"4"']),  # case ids incl. metachars
        NASTY,  # activity
        st.integers(min_value=0, max_value=10_000_000),  # seconds offset
        NASTY,  # extra attribute
    ),
    min_size=1,
    max_size=8,
)

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)

_FORBIDDEN = re.compile("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]")


def expected_value(raw: str) -> str:
    """What the writer preserves: forbidden control chars stripped."""
    return _FORBIDDEN.sub("", raw)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(EVENTS)
def test_xes_roundtrip_property(spark_global, tmp_path_factory, events):
    spark = spark_global
    rows = [
        (case, act or "a", BASE.replace(tzinfo=None) + timedelta(seconds=off), attr)
        for case, act, off, attr in events
    ]
    df = spark.createDataFrame(
        rows, f"`{XES_CASE}` string, `{XES_ACTIVITY}` string, `{XES_TIMESTAMP}` timestamp, extra string"
    )
    path = str(tmp_path_factory.mktemp("xes") / "log.xes")
    write_xes(df, path, single_file=True)

    traces = read_xes(path)  # must parse — well-formedness is the first property
    got = {
        (t["attrs"]["concept:name"], e["concept:name"], e.get("extra"))
        for t in traces
        for e in t["events"]
    }
    want = {
        (expected_value(case), expected_value(act or "a"), expected_value(attr))
        for case, act, off, attr in events
    }
    assert got == want
    # every trace's events are timestamp-ordered
    for t in traces:
        stamps = [e["time:timestamp"] for e in t["events"]]
        assert stamps == sorted(stamps)


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
