"""Snapshot-versioned lake tables (sources/snapshots.py): manifest isolation,
time travel, atomic commit arbitration, orphan vacuum."""

from __future__ import annotations

import json
import os

import pytest

from mobsos_event_log_generator_spark.sources.snapshots import (
    SnapshotConflict,
    _commit,
    latest_version,
    read_manifest,
    read_snapshot,
    snapshot_append,
    snapshot_overwrite,
    vacuum_orphans,
)


def test_append_versions_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v1 = snapshot_append(spark.range(10).selectExpr("id", "id * 2 AS x"), root)
    v2 = snapshot_append(spark.range(10, 15).selectExpr("id", "id * 2 AS x"), root)
    assert (v1, v2) == (1, 2)
    assert read_snapshot(spark, root).count() == 15          # latest
    assert read_snapshot(spark, root, 1).count() == 10       # time travel
    assert {r["id"] for r in read_snapshot(spark, root, 1).collect()} == set(range(10))


def test_overwrite_keeps_history_readable(spark, tmp_path):
    root = str(tmp_path / "tbl")
    snapshot_append(spark.range(10), root)
    v2 = snapshot_overwrite(spark.range(100, 103), root)
    assert v2 == 2
    assert read_snapshot(spark, root).count() == 3
    assert read_snapshot(spark, root, 1).count() == 10  # history intact
    assert read_manifest(root, 2)["operation"] == "overwrite"


def test_uncommitted_data_invisible_and_vacuumable(spark, tmp_path):
    root = str(tmp_path / "tbl")
    snapshot_append(spark.range(10), root)
    # simulate a crashed writer: data landed, no manifest commit
    crash_dir = os.path.join(root, "data", "batch-deadbeef0000")
    spark.range(99).write.parquet(crash_dir)
    assert read_snapshot(spark, root).count() == 10  # reader unaffected
    removed = vacuum_orphans(root)
    assert removed and all("batch-deadbeef0000" in f for f in removed)
    assert not os.path.exists(crash_dir)
    assert read_snapshot(spark, root).count() == 10  # live snapshot survives


def test_concurrent_commit_conflict_raises(spark, tmp_path):
    root = str(tmp_path / "tbl")
    snapshot_append(spark.range(5), root)
    # two writers race the SAME next version: the filesystem lets exactly
    # one create v2; the loser must get SnapshotConflict, not a silent
    # overwrite of the winner's manifest
    winner = {"version": 2, "parent": 1, "files": [], "n_rows": 0, "operation": "append"}
    _commit(root, winner)
    loser = {"version": 2, "parent": 1, "files": ["data/x/y.parquet"], "n_rows": 1,
             "operation": "append"}
    with pytest.raises(SnapshotConflict):
        _commit(root, loser)
    assert latest_version(root) == 2
    assert read_manifest(root, 2)["files"] == []  # winner's manifest intact
    # a full append called AFTER the lost race simply rebases onto v2
    assert snapshot_append(spark.range(2), root) == 3


def test_empty_table_read_is_an_error(spark, tmp_path):
    root = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root)


def test_manifest_is_deterministic_json(spark, tmp_path):
    root = str(tmp_path / "tbl")
    snapshot_append(spark.range(3), root)
    m = json.load(open(os.path.join(root, "_manifests", "v1.json")))
    assert m["version"] == 1 and m["n_rows"] == 3 and m["files"]
    assert all(f.startswith("data/batch-") for f in m["files"])


def test_snapshot_diff_cdc(spark, tmp_path):
    from mobsos_event_log_generator_spark.sources.snapshots import snapshot_diff

    root = str(tmp_path / "tbl")
    snapshot_append(spark.range(5), root)                      # v1
    snapshot_append(spark.range(100, 103), root)               # v2
    ins = snapshot_diff(spark, root, 1, 2)
    assert {r["id"] for r in ins.collect()} == {100, 101, 102}
    assert {r["_change_type"] for r in ins.collect()} == {"insert"}
    snapshot_overwrite(spark.range(200, 202), root)            # v3: rewrite
    d = snapshot_diff(spark, root, 2, 3)
    by_type = {}
    for r in d.collect():
        by_type.setdefault(r["_change_type"], set()).add(r["id"])
    assert by_type["insert"] == {200, 201}
    assert by_type["delete"] == {0, 1, 2, 3, 4, 100, 101, 102}
    with pytest.raises(ValueError):
        snapshot_diff(spark, root, 3, 3)


def test_streaming_snapshot_sink_exactly_once(spark, tmp_path):
    from mobsos_event_log_generator_spark.sources.snapshots import (
        read_snapshot,
        snapshot_append_stream,
        vacuum_orphans,
    )

    root = str(tmp_path / "tbl")
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    for i in range(3):  # three single-file micro-batches
        spark.range(i * 10, i * 10 + 10).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(snapshot_append_stream(root))
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert read_snapshot(spark, root).count() == 30
    n_versions = latest_version(root)
    assert n_versions == 3
    # replayed micro-batch (crash between manifest commit and checkpoint
    # commit): re-invoking with an already-committed batch id is a no-op
    process = snapshot_append_stream(root)
    process(spark.range(5), batch_id=n_versions - 1)
    assert latest_version(root) == 3
    assert read_snapshot(spark, root).count() == 30
    assert vacuum_orphans(root) == []  # every landed file is referenced


def test_apply_cdc_to_agg_matches_recompute(spark):
    from pyspark.sql import functions as F

    from mobsos_event_log_generator_spark.operators.incremental import apply_cdc_to_agg

    base = spark.range(100).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS k", "CAST(id * 3 AS DECIMAL(18,4)) AS val"
    )
    view = base.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
    # delete every id % 3 == 0 row, insert 10 new rows into two keys
    deletes = base.filter("id % 3 = 0").withColumn("_change_type", F.lit("delete"))
    inserts = spark.range(1000, 1010).selectExpr(
        "id", "CAST(id % 2 AS STRING) AS k", "CAST(id * 3 AS DECIMAL(18,4)) AS val"
    ).withColumn("_change_type", F.lit("insert"))
    cdc = deletes.unionByName(inserts)
    got = {
        r["k"]: (r["n"], r["s"])
        for r in apply_cdc_to_agg(view, cdc, ["k"], {"val": "s"}).collect()
    }
    truth_df = (
        base.filter("id % 3 != 0").unionByName(inserts.drop("_change_type"))
        .groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
    )
    truth = {r["k"]: (r["n"], r["s"]) for r in truth_df.collect()}
    assert got == truth


def test_apply_cdc_drops_fully_retracted_keys(spark):
    from pyspark.sql import functions as F

    from mobsos_event_log_generator_spark.operators.incremental import apply_cdc_to_agg

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, k string, val long"
    )
    view = base.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
    cdc = base.filter("k = 'a'").withColumn("_change_type", F.lit("delete"))
    out = {r["k"] for r in apply_cdc_to_agg(view, cdc, ["k"], {"val": "s"}).collect()}
    assert out == {"b"}  # key 'a' fully retracted -> gone, like a recompute


def test_snapshot_compact_preserves_content_and_history(spark, tmp_path):
    import glob

    from mobsos_event_log_generator_spark.sources.snapshots import (
        read_snapshot,
        snapshot_compact,
    )

    root = str(tmp_path / "tbl")
    for i in range(4):  # four appends -> many small files
        snapshot_append(spark.range(i * 10, i * 10 + 10).repartition(3), root)
    before = set(r["id"] for r in read_snapshot(spark, root).collect())
    n_files_before = len(read_manifest(root)["files"])
    v = snapshot_compact(spark, root, target_files=1)
    assert v == 5
    m = read_manifest(root)
    assert m["operation"] == "compact" and len(m["files"]) < n_files_before
    assert set(r["id"] for r in read_snapshot(spark, root).collect()) == before
    # pre-compaction versions still readable (time travel unaffected)
    assert read_snapshot(spark, root, 4).count() == 40


def test_snapshot_merge_prunes_untouched_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from mobsos_event_log_generator_spark.sources.snapshots import (
        read_snapshot,
        snapshot_merge,
    )

    root = str(tmp_path / "tbl")
    # key-clustered layout: 4 files covering disjoint id ranges
    base = spark.range(400).selectExpr("id", "id * 10 AS val")
    clustered = base.repartitionByRange(4, F.col("id")).sortWithinPartitions("id")
    snapshot_append(clustered, root)
    n_files = len(read_manifest(root)["files"])
    assert n_files >= 3

    updates = spark.createDataFrame(
        [(5, -1), (7, -2), (450, -3)], "id long, val long"
    )  # two hits in the first range + one brand-new key
    v, rewritten = snapshot_merge(spark, updates, root, "id")
    assert v == 2
    assert rewritten < n_files  # pruning: only the intersecting file(s) rewrote
    out = {r["id"]: r["val"] for r in read_snapshot(spark, root).collect()}
    assert len(out) == 401  # 400 originals (2 replaced) + 1 insert
    assert out[5] == -1 and out[7] == -2 and out[450] == -3
    assert out[6] == 60  # neighbor in the rewritten file survived
    assert out[399] == 3990  # untouched file intact
    # history: v1 still shows the pre-merge values
    old = {r["id"]: r["val"] for r in read_snapshot(spark, root, 1).collect()}
    assert old[5] == 50 and 450 not in old


def test_snapshot_merge_into_empty_table_is_append(spark, tmp_path):
    from mobsos_event_log_generator_spark.sources.snapshots import read_snapshot, snapshot_merge

    root = str(tmp_path / "tbl")
    v, rewritten = snapshot_merge(spark, spark.range(5).selectExpr("id", "id AS val"), root, "id")
    assert (v, rewritten) == (1, 0)
    assert read_snapshot(spark, root).count() == 5


def test_snapshot_delete_keys_prunes_and_erases(spark, tmp_path):
    from pyspark.sql import functions as F

    from mobsos_event_log_generator_spark.sources.snapshots import (
        read_snapshot,
        snapshot_delete_keys,
        snapshot_diff,
    )

    root = str(tmp_path / "tbl")
    base = spark.range(400).selectExpr("id", "id * 10 AS val")
    snapshot_append(base.repartitionByRange(4, F.col("id")).sortWithinPartitions("id"), root)
    n_files = len(read_manifest(root)["files"])
    doomed = spark.createDataFrame([(5,), (7,)], "id long")
    v, rewritten = snapshot_delete_keys(spark, doomed, root, "id")
    assert v == 2 and rewritten < n_files
    out = {r["id"] for r in read_snapshot(spark, root).collect()}
    assert len(out) == 398 and 5 not in out and 7 not in out and 6 in out
    # the change feed shows the erased rows as deletes (plus the rewrite churn)
    d = snapshot_diff(spark, root, 1, 2)
    deleted = {r["id"] for r in d.filter("_change_type = 'delete'").collect()}
    assert {5, 7} <= deleted


def test_schema_evolution_add_column(spark, tmp_path):
    import pytest

    from mobsos_event_log_generator_spark.sources.snapshots import (
        SchemaEvolutionError,
        snapshot_append,
        read_snapshot,
    )

    root = str(tmp_path / "tbl")
    snapshot_append(spark.createDataFrame([(1, "a")], "id long, name string"), root)
    # evolve: add a column; old file back-fills NULL on read
    snapshot_append(
        spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double"), root
    )
    out = {r["id"]: r for r in read_snapshot(spark, root).collect()}
    assert set(out) == {1, 2}
    assert out[1]["score"] is None and out[2]["score"] == 9.5
    assert read_snapshot(spark, root).columns == ["id", "name", "score"]
    # narrower append (missing column) is fine too: column stays in schema
    snapshot_append(spark.createDataFrame([(3, "c")], "id long, name string"), root)
    out3 = {r["id"]: r for r in read_snapshot(spark, root).collect()}
    assert out3[3]["score"] is None and len(out3) == 3
    # type change on an existing column is rejected BEFORE any file lands
    with pytest.raises(SchemaEvolutionError):
        snapshot_append(spark.createDataFrame([("x", "d")], "id string, name string"), root)
    assert len(read_snapshot(spark, root).collect()) == 3


def test_schema_evolution_time_travel_keeps_old_schema(spark, tmp_path):
    from mobsos_event_log_generator_spark.sources.snapshots import (
        snapshot_append,
        read_snapshot,
    )

    root = str(tmp_path / "tbl")
    v1 = snapshot_append(spark.createDataFrame([(1,)], "id long"), root)
    snapshot_append(spark.createDataFrame([(2, "b")], "id long, name string"), root)
    # v1's manifest predates the evolution: time travel sees the old shape
    assert read_snapshot(spark, root, version=v1).columns == ["id"]
    assert read_snapshot(spark, root).columns == ["id", "name"]


def test_snapshot_optimize_zorder_and_history(spark, tmp_path):
    from pyspark.sql import functions as F

    from mobsos_event_log_generator_spark.sources.snapshots import (
        read_manifest,
        read_snapshot,
        snapshot_append,
        snapshot_optimize,
    )

    root = str(tmp_path / "tbl")
    rows = [(i, (i * 37) % 100, (i * 61) % 100) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    # land as many small files
    v1 = snapshot_append(df.repartition(16), root)
    v2 = snapshot_optimize(spark, root, zorder_cols=("x", "y"), target_files=4)
    m = read_manifest(root, v2)
    assert m["operation"] == "optimize" and len(m["files"]) == 4
    # content identical, prior version still readable with its own files
    assert sorted(r["id"] for r in read_snapshot(spark, root, v2).collect()) == list(range(2000))
    assert len(read_manifest(root, v1)["files"]) == 16
    assert read_snapshot(spark, root, v1).count() == 2000
    # clustered layout: per-file x ranges must be tighter than the full span
    import os

    data_files = [os.path.join(root, f) for f in m["files"]]
    spans = []
    for fp in data_files:
        pdf = spark.read.parquet(fp).agg(F.min("x"), F.max("x")).first()
        spans.append(int(pdf[1]) - int(pdf[0]))
    assert min(spans) < 99  # at least one file covers a strict sub-range


def test_snapshot_optimize_vacuum_keeps_history(spark, tmp_path):
    from mobsos_event_log_generator_spark.sources.snapshots import (
        read_snapshot,
        snapshot_append,
        snapshot_optimize,
        snapshot_overwrite,
    )

    root = str(tmp_path / "tbl")
    v1 = snapshot_append(spark.range(100).selectExpr("id", "id AS x", "id AS y"), root)
    snapshot_overwrite(spark.range(50).selectExpr("id", "id AS x", "id AS y"), root)
    v3 = snapshot_optimize(spark, root, zorder_cols=("x", "y"), target_files=2, vacuum=True)
    # vacuum removed nothing that a live manifest references
    assert read_snapshot(spark, root, v1).count() == 100
    assert read_snapshot(spark, root, v3).count() == 50


def test_snapshot_optimize_concurrent_append_conflicts(spark, tmp_path, monkeypatch):
    """Lost-update guard: an append landing between optimize's rewrite and
    its commit must make the optimize commit raise SnapshotConflict — the
    pre-fix read-latest-after-rewrite order instead adopted the append as
    parent while omitting its rows from the rewritten file list, silently
    erasing them from the optimized version."""
    import pytest

    from mobsos_event_log_generator_spark.sources import snapshots as S

    root = str(tmp_path / "tbl")
    S.snapshot_append(spark.range(100).selectExpr("id", "id AS x", "id AS y"), root)

    real_write = S._write_data_files
    state = {"raced": False}

    def racing_write(df, r):
        files, n = real_write(df, r)
        if not state["raced"]:
            # fire exactly once, from inside optimize's rewrite: a concurrent
            # writer appends and commits before optimize reaches its commit
            state["raced"] = True
            S.snapshot_append(
                spark.range(100, 150).selectExpr("id", "id AS x", "id AS y"), root
            )
        return files, n

    monkeypatch.setattr(S, "_write_data_files", racing_write)
    with pytest.raises(S.SnapshotConflict):
        S.snapshot_optimize(spark, root, zorder_cols=("x", "y"), target_files=2)
    # the concurrently appended rows survive in the latest snapshot
    assert S.read_snapshot(spark, root).count() == 150
