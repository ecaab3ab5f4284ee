"""Units for the verification/bench meta-tools themselves (sweep_all,
bench trend math) — the gates the whole round process leans on."""

from __future__ import annotations

import json
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from sweep_all import check_one, driver_verified  # noqa: E402


def test_driver_verified_reads_green_rows_only():
    """Only rows with all three matches and no err count as verified."""
    verified = driver_verified()
    # r1-r6 artifacts are committed: the set is non-empty and contains a
    # known r1 green row but never a name that was still backlog after r6.
    assert "eventlog_normalize" in verified
    assert "parts_price_dispersion" not in verified  # r7 window, no row yet
    assert len(verified) == 200


def test_check_one_pass_and_mismatch(spark):
    con = duckdb.connect()
    fn = lambda s: s.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    assert check_one(spark, con, "t", fn, "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) t(id, v)") is None
    # row-count mismatch
    r = check_one(spark, con, "t", fn, "SELECT 1 AS id, 'a' AS v")
    assert r is not None and "row count" in r
    # column-name mismatch
    r = check_one(spark, con, "t", fn, "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) t(id, w)")
    assert r is not None and "columns" in r
    # value mismatch
    r = check_one(spark, con, "t", fn, "SELECT * FROM (VALUES (1, 'a'), (2, 'X')) t(id, v)")
    assert r is not None and "value mismatch" in r
    # rows-only entry: spark execution is the gate
    assert check_one(spark, con, "t", fn, None) is None
    # spark error surfaces, doesn't raise
    boom = lambda s: (_ for _ in ()).throw(RuntimeError("boom"))
    r = check_one(spark, con, "t", boom, "SELECT 1")
    assert r is not None and "spark error" in r


def test_bench_warm_delta_flags(monkeypatch):
    import bench

    monkeypatch.setattr(
        bench, "_prev_bench",
        lambda: ("BENCH_rX.json", {"queries": {"q": 1.0}, "queries_warm": {"q": 1.0, "r": 2.0}}),
    )
    deltas, regs = bench._deltas_vs_prev({"q": 1.2}, {"q": 1.5, "r": 2.1})
    assert deltas["q"] == {"cold_pct": 20.0, "warm_pct": 50.0}
    assert regs == ["q: warm 1.0s -> 1.5s (+50.0%)"]  # r's +5% stays unflagged


def test_bench_record_line_is_parseable_and_compact():
    """The driver keeps only the output tail: the final record with both
    lanes for the full 39-query headline set must stay well under the
    budget that held r6's ~3.4 kB tail."""
    import bench

    fake = {n: 9.999 for n in bench.HEADLINE}
    record = {
        "metric": "headline_queries_total_runtime",
        "value": 999.9,
        "unit": "sec",
        "queries": fake,
        "sf": 0.1,
        "value_warm": 999.9,
        "queries_warm": {n: round(t, 2) for n, t in fake.items()},
    }
    line = json.dumps(record)
    assert json.loads(line)["queries_warm"] == record["queries_warm"]
    assert len(line) < 3000


def test_sweep_record_schema():
    """Committed sweep artifacts keep the fields COVERAGE.md cites."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for fn in ("SWEEP.json", "SWEEP_FULL.json", "SWEEP_PLAIN.json"):
        path = os.path.join(repo, fn)
        if not os.path.exists(path):
            continue
        rec = json.load(open(path))
        assert rec["cells_passed"] == rec["cells_checked"] and not rec["failures"]
        assert rec["started"] and rec["sf_dirs"]
