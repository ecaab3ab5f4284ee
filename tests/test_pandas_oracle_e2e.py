"""End-to-end flag-matrix test (SURVEY.md §5): every 2x2x2 combination of
(include_bot_messages x include_life_cycle_start x deserialize_remarks) run
through the Spark pipeline and diffed against an INDEPENDENT pandas
implementation of the intended generate_eventlog semantics (reference:
event_log_generator/event_reader.py:7-45) over an EVENTLOG-shaped fixture."""

from __future__ import annotations

import itertools
import json
from datetime import datetime

import pandas as pd
import pytest

from mobsos_event_log_generator_spark.plans.eventlog import EventLogParams, build_eventlog
from mobsos_event_log_generator_spark.schema import (
    EVENTLOG_SCHEMA,
    XES_CASE,
    XES_LIFECYCLE,
    XES_TIMESTAMP,
)

ROWS = [
    # EVENT_TYPE, CASE_ID, ACTIVITY, TIME_STAMP, LIFECYCLE, RESOURCE, RESOURCE_TYPE, REMARKS
    ("SERVICE_CUSTOM_MESSAGE_1", "c1", "ask", datetime(2024, 1, 1, 10, 0, 0), "complete", "r1", "bot", '{"user": "u1"}'),
    ("SERVICE_CUSTOM_MESSAGE_2", "c1", "reply", datetime(2024, 1, 1, 10, 0, 5), "complete", "r1", "bot", '{"user": "u1", "intent": "m"}'),
    ("SERVICE_CUSTOM_MESSAGE_3", "c1", "svc", datetime(2024, 1, 1, 10, 0, 9), "start", "r1", "bot", '{"serviceEndpoint": "/m"}'),
    ("SERVICE_CUSTOM_MESSAGE_3", "c1", "svc", datetime(2024, 1, 1, 10, 0, 10), None, "r1", "bot", '{"in-service-context": true}'),
    ("SERVICE_MESSAGE", "c2", "other", datetime(2024, 1, 2, 9, 0, 0), "complete", "r2", "service", "not-json"),
    ("SERVICE_CUSTOM_MESSAGE_1", None, "ask", datetime(2024, 1, 2, 9, 30, 0), "complete", "r2", "service", "{}"),
    ("SERVICE_CUSTOM_MESSAGE_1", "c3", "order", datetime(2024, 1, 3, 12, 0, 0), "start", "r2", "service", '{"user": "u2"}'),
    ("SERVICE_CUSTOM_MESSAGE_2", "c3", "reply2", datetime(2024, 1, 3, 12, 0, 2), None, "r3", "bot", "{}"),
]

RECODE = {
    "SERVICE_CUSTOM_MESSAGE_1": "USER_MESSAGE",
    "SERVICE_CUSTOM_MESSAGE_2": "BOT_MESSAGE",
    "SERVICE_CUSTOM_MESSAGE_3": "SERVICE_REQUEST",
}
REMARKS_KEYS = ["user", "intent", "serviceEndpoint", "in-service-context"]


def pandas_generate_eventlog(
    rows,
    include_bot_messages: bool,
    include_life_cycle_start: bool,
    deserialize_remarks: bool,
) -> pd.DataFrame:
    """Independent reimplementation of the intended reference semantics."""
    df = pd.DataFrame(
        rows,
        columns=["EVENT_TYPE", "CASE_ID", "ACTIVITY_NAME", "TIME_STAMP", "LIFECYCLE_PHASE", "RESOURCE", "RESOURCE_TYPE", "REMARKS"],
    )
    df = df[df["CASE_ID"].notna()]  # F1
    if not include_bot_messages:  # F3 (pre-recode, SQL)
        df = df[df["EVENT_TYPE"] != "SERVICE_CUSTOM_MESSAGE_2"]
    if not include_life_cycle_start:  # F4 (SQL 3VL: NULL dropped)
        df = df[df["LIFECYCLE_PHASE"].notna() & (df["LIFECYCLE_PHASE"] != "start")]
    df["EVENT_TYPE"] = df["EVENT_TYPE"].replace(RECODE)  # P2
    if not include_bot_messages:  # F6
        df = df[df["EVENT_TYPE"].isin(["SERVICE_REQUEST", "USER_MESSAGE"])]
    df = df.rename(
        columns={
            "CASE_ID": "case:concept:name",
            "ACTIVITY_NAME": "concept:name",
            "TIME_STAMP": "time:timestamp",
            "LIFECYCLE_PHASE": "lifecycle:transition",
        }
    )  # P1
    if not include_life_cycle_start:  # F7 (re-applied post-rename, pre-fillna)
        df = df[df["lifecycle:transition"] == "complete"]
    if deserialize_remarks:  # P5

        def parse(raw):
            try:
                d = json.loads(raw)
                return d if isinstance(d, dict) else {}
            except (ValueError, TypeError):
                return {}

        parsed = df["REMARKS"].map(parse)
        for k in REMARKS_KEYS:
            # engine contract: get_json_object -> string values
            df[k] = parsed.map(
                lambda d, k=k: (json.dumps(d[k]) if isinstance(d.get(k), (dict, list, bool, int, float)) else d.get(k))
                if k in d
                else None
            )
    # P4 fillna
    df["lifecycle:transition"] = df["lifecycle:transition"].fillna("complete")
    if deserialize_remarks:
        for k, default in (("serviceEndpoint", ""), ("user", "")):
            if k in df.columns:
                df[k] = df[k].fillna(default)
    return df.reset_index(drop=True)


@pytest.mark.parametrize(
    "bot,start,remarks", list(itertools.product([False, True], repeat=3)),
    ids=lambda v: str(v),
)
def test_flag_matrix_matches_pandas_oracle(spark, bot, start, remarks):
    params = EventLogParams(
        include_bot_messages=bot,
        include_life_cycle_start=start,
        deserialize_remarks=remarks,
        remarks_keys=REMARKS_KEYS if remarks else [],
    )
    got = build_eventlog(spark.createDataFrame(ROWS, EVENTLOG_SCHEMA), params).toPandas()
    want = pandas_generate_eventlog(ROWS, bot, start, remarks)

    cols = [XES_CASE, "concept:name", XES_TIMESTAMP, XES_LIFECYCLE, "EVENT_TYPE", "RESOURCE"]
    if remarks:
        cols += ["user", "serviceEndpoint"]
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
