"""Standing pre-driver gate: exact-cell parity for EVERY registry query at
BOTH scale factors (sf0.01 and sf0.1), failing loudly on any mismatch.

Round-5/6 proved twice that the dies-at-scale class (decimal overflow,
float-rounding drift) is invisible at sf0.01 — so the gate runs both SFs by
default. This wraps tools/check_parity.py's comparator (columns sorted by
name, rows sorted by stringified tuple — strictly stronger than the driver's
order-insensitive value hash) in one command and records the sweep in
SWEEP.json so COVERAGE.md can cite a timestamped artifact.

Usage:
    python tools/sweep_all.py                 # all registry names, both SFs
    python tools/sweep_all.py --backlog       # only names without a green
                                              # driver CORRECTNESS row yet
    python tools/sweep_all.py --sf /root/testdata/sf0.01  # one SF only
    python tools/sweep_all.py name1 name2     # explicit subset, both SFs

Exit status is non-zero if ANY (query, sf) cell fails. Iron rule: run this
(at minimum over the backlog) before every driver round.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_parity import canon, duck_connection  # noqa: E402

DEFAULT_SF_DIRS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def driver_verified() -> set:
    """Names with a fully-green driver row in any CORRECTNESS_r*.json."""
    verified = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("err") is None
                and row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
            ):
                verified.add(name)
    return verified


def check_one(spark, con, name, fn, oracle_sql):
    """Return None on pass, else a short failure reason."""
    try:
        sdf = fn(spark).toPandas()
    except Exception as ex:  # noqa: BLE001 — report, don't crash the sweep
        return f"spark error: {str(ex)[:300]}"
    if oracle_sql is None:
        return None  # rows-only entry: Spark execution itself is the gate
    try:
        odf = con.execute(oracle_sql).df()
    except Exception as ex:  # noqa: BLE001
        return f"oracle error: {str(ex)[:300]}"
    if len(sdf) != len(odf):
        return f"row count spark={len(sdf)} oracle={len(odf)}"
    if sorted(map(str, sdf.columns)) != sorted(map(str, odf.columns)):
        return f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    cs, co = canon(sdf), canon(odf)
    if not cs.equals(co):
        neq = (cs != co).any(axis=1)
        return f"value mismatch on {int(neq.sum())}/{len(cs)} rows; first spark row: {cs[neq].head(1).to_dict('records')} vs oracle: {co[neq].head(1).to_dict('records')}"
    return None


def default_record_name(plain: bool, subset: bool, backlog: bool) -> str:
    """Default sweep-record filename — one artifact per (session, scope).

    Precedence: explicit-subset sweeps always land in SWEEP_SUBSET.json
    (a narrow record must never clobber ANY standing artifact, plain or
    tuned); otherwise --plain wins over backlog/full — a vanilla-session
    record must never replace the tuned-session artifact of the same
    scope. That exact overwrite happened in round 8: the r7-ADVICE fix
    keyed the default on scope only, and a full-registry --plain run
    clobbered the tuned SWEEP_FULL.json written 40 minutes earlier
    (restored from the run log; gated by test_sweep_record_schema's
    session check since)."""
    if subset:
        return "SWEEP_SUBSET.json"
    if plain:
        return "SWEEP_PLAIN.json"
    if backlog:
        return "SWEEP.json"
    return "SWEEP_FULL.json"


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*", help="restrict to these query names")
    ap.add_argument("--backlog", action="store_true",
                    help="only names without a green driver CORRECTNESS row")
    ap.add_argument("--sf", action="append", dest="sf_dirs",
                    help="sf dir (repeatable); default both sf0.01 and sf0.1")
    ap.add_argument("--plain", action="store_true",
                    help="use a vanilla SparkSession (no session.py conf) — "
                         "exactly how the external driver runs the queries "
                         "(CLAUDE.md iron rule 3); catches conf dependencies "
                         "that only exist in the tuned session")
    ap.add_argument("--record", default=None,
                    help="where to write the sweep record; defaults per scope "
                         "(--backlog -> SWEEP.json, full -> SWEEP_FULL.json, "
                         "explicit names -> SWEEP_SUBSET.json, any --plain "
                         "sweep -> SWEEP_PLAIN.json) so a narrow or "
                         "plain-session sweep can never overwrite the "
                         "standing full-gate artifact that COVERAGE.md cites")
    args = ap.parse_args()
    if args.record is None:
        args.record = os.path.join(
            REPO, default_record_name(args.plain, bool(args.names), args.backlog)
        )

    import __spark_entry__ as e
    from mobsos_event_log_generator_spark.session import get_spark

    qs, oracles = e.queries(), e.oracle_sql()
    names = list(qs)
    if args.backlog:
        verified = driver_verified()
        names = [n for n in names if n not in verified]
    if args.names:
        want = set(args.names)
        unknown = want - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
            return 2
        names = [n for n in names if n in want]

    sf_dirs = tuple(args.sf_dirs) if args.sf_dirs else DEFAULT_SF_DIRS
    if args.plain:
        from pyspark.sql import SparkSession

        # SQL semantics stay vanilla (that is what --plain verifies — the
        # driver-session mirror); driver MEMORY is harness capacity, not a
        # query conf: a 710-cell marathon accumulates localCheckpoint
        # blocks faster than the ContextCleaner drops them and OOM'd the
        # 1g default heap mid-sf0.1 in r12 (every failing query passes
        # standalone on a 1g vanilla session — the driver never runs
        # marathons this long in one process).
        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_SWEEP_PLAIN_MEM", "4g"))
            .getOrCreate()
        )
    else:
        spark = get_spark("sweep-all")
    spark.sparkContext.setLogLevel("ERROR")

    started = time.strftime("%Y-%m-%dT%H:%M:%S%z")
    t0 = time.perf_counter()
    import gc

    failures: dict[str, dict[str, str]] = {}
    passed = 0
    total = 0
    for sf_dir in sf_dirs:
        con = duck_connection(sf_dir)
        for name in names:
            total += 1
            if total % 25 == 0:
                # Release dropped DataFrames promptly so the ContextCleaner
                # can evict their localCheckpoint blocks — marathon heap
                # hygiene (see the --plain memory note above).
                gc.collect()
            tq = time.perf_counter()
            reason = check_one(
                spark, con, name,
                lambda s, _n=name, _d=sf_dir: qs[_n](s, _d),
                oracles.get(name),
            )
            dt = time.perf_counter() - tq
            if reason is None:
                passed += 1
                tag = "ok  " if name in oracles else "rows"
                print(f"{tag} {name} @ {os.path.basename(sf_dir)} ({dt:.1f}s)")
            else:
                failures.setdefault(name, {})[sf_dir] = reason
                print(f"FAIL {name} @ {os.path.basename(sf_dir)}: {reason}")
            sys.stdout.flush()
        con.close()

    elapsed = round(time.perf_counter() - t0, 1)
    record = {
        "started": started,
        "elapsed_sec": elapsed,
        "sf_dirs": list(sf_dirs),
        "scope": "backlog" if args.backlog else ("subset" if args.names else "all"),
        "session": "plain" if args.plain else "tuned",
        "names_swept": len(names),
        "cells_checked": total,
        "cells_passed": passed,
        "failures": failures,
    }
    with open(args.record, "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"\n{passed}/{total} (query, sf) cells pass over {len(names)} queries "
          f"in {elapsed}s; record -> {args.record}")
    if failures:
        print(f"FAILING QUERIES: {sorted(failures)}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
