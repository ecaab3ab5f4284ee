"""Single-node pandas baseline: the reference's execution model (eager pandas,
one thread — event_reader.py:7-45) applied to the same queries, at the same
scale factor, for the matches-or-beats comparison in BASELINE.md.

Implements the E1 pipeline + trace grouping + sessionization + text stats the
way the reference would (vectorized pandas where it can, row-wise apply where
the reference is row-wise), and times them.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd


def eventlog_normalize_pandas(events: pd.DataFrame) -> pd.DataFrame:
    df = events.copy()
    df["CASE_ID"] = df["user_id"].astype(str).where(df["event_id"] % 97 != 0, None)
    df["LIFECYCLE_PHASE"] = "complete"
    df.loc[df["event_id"] % 7 == 0, "LIFECYCLE_PHASE"] = "start"
    df.loc[df["event_id"] % 11 == 0, "LIFECYCLE_PHASE"] = None
    df = df[df["CASE_ID"].notna()]
    df = df[df["event_type"] != "view"]
    df = df[df["LIFECYCLE_PHASE"] == "complete"]
    df["EVENT_TYPE"] = df["event_type"].replace(
        {"click": "USER_MESSAGE", "view": "BOT_MESSAGE", "purchase": "SERVICE_REQUEST"}
    )
    df = df[df["EVENT_TYPE"].isin(["SERVICE_REQUEST", "USER_MESSAGE"])]
    out = df.rename(
        columns={"CASE_ID": "case:concept:name", "event_type": "concept:name", "ts": "time:timestamp"}
    )
    return out


def traces_pandas(norm: pd.DataFrame) -> pd.DataFrame:
    g = norm.sort_values(["time:timestamp", "concept:name"]).groupby("case:concept:name")
    return g.agg(
        num_events=("concept:name", "size"),
        trace_start=("time:timestamp", "min"),
        trace_end=("time:timestamp", "max"),
        activity_path=("concept:name", ",".join),
    ).reset_index()


def sessionize_pandas(events: pd.DataFrame, gap_s: int = 1800) -> pd.DataFrame:
    df = events.sort_values(["user_id", "ts", "event_id"]).copy()
    prev = df.groupby("user_id")["ts"].shift()
    new_sess = (df["ts"] - prev).dt.total_seconds().ge(gap_s) | prev.isna()
    df["sid"] = new_sess.groupby(df["user_id"]).cumsum()
    return df.groupby(["user_id", "sid"]).agg(
        n_events=("event_id", "size"), start=("ts", "min"), end=("ts", "max")
    ).reset_index()


def text_stats_pandas(docs: pd.DataFrame) -> pd.DataFrame:
    # The reference's row-wise style (df.apply, event_reader.py:33)
    import re

    stop = {"the", "a", "and", "of", "to", "is", "in"}

    def stats(text: str) -> pd.Series:
        words = [w for w in re.split(r"\s+", text) if w]
        n = len(words)
        sw = sum(1 for w in words if w in stop)
        return pd.Series({"n_tokens": n, "stopword_ratio": sw / n if n else 0.0})

    return docs["text"].apply(stats)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    events = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))

    timings = {}
    t0 = time.perf_counter()
    norm = eventlog_normalize_pandas(events)
    timings["eventlog_normalize"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    traces_pandas(norm)
    timings["eventlog_traces"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    sessionize_pandas(events)
    timings["events_sessionization"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    text_stats_pandas(docs)
    timings["text_stats_docs"] = round(time.perf_counter() - t0, 3)

    print(json.dumps({"metric": "pandas_single_node_baseline", "queries": timings, "sf": sf_dir}))


if __name__ == "__main__":
    main()
