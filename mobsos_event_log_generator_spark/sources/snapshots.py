"""Snapshot-versioned lake tables: manifest-based reads, atomic commits,
time travel — the Iceberg/Delta core contract in ~150 lines, without the
table-format dependency.

Why this exists at 100 TB: directory-listing tables (sources/lake.py) give
readers whatever files exist RIGHT NOW — a reader racing a writer sees half
a batch, and there is no way to re-run yesterday's job against yesterday's
table. The fix every modern table format shares is indirection through a
manifest: immutable data files + a versioned file list + an atomic pointer
swing. This module implements exactly that:

* data files are immutable, written under ``data/`` with unique names;
* a manifest ``_manifests/v{N}.json`` lists the files of snapshot N
  (plus row count and schema fingerprint for sanity checks);
* commit = create-exclusive of the next manifest version (``O_EXCL`` — the
  filesystem arbitrates concurrent writers: exactly one wins, the loser
  gets ``SnapshotConflict`` and retries on top of the new latest);
* readers resolve a version (default: latest) and read ONLY its files —
  uncommitted data is invisible, every snapshot is forever re-readable.

Crash safety: data lands before the manifest commit, so a dying writer
leaves only orphan files no manifest references — readers never see them,
and ``vacuum_orphans`` reclaims the space (only files outside EVERY live
manifest are removed, so time travel keeps working).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"


class SnapshotConflict(RuntimeError):
    """Another writer committed this version first — re-read latest, retry."""


class SchemaEvolutionError(ValueError):
    """Append schema conflicts with the table schema (same column, new type)."""


def _merge_schemas(parent_schema_json: dict | None, new_schema) -> dict:
    """Additive schema evolution with enforcement: appends may ADD columns
    (back-filled as NULL on read for pre-evolution files) but may not change
    an existing column's type — the silent-corruption class every table
    format rejects. Returns the merged schema as JSON (parent column order
    first, additions after, everything nullable so old files read clean)."""
    from pyspark.sql.types import StructField, StructType

    if not parent_schema_json or not parent_schema_json.get("fields"):
        return new_schema.jsonValue()
    parent = StructType.fromJson(parent_schema_json)
    by_name = {f.name: f for f in parent.fields}
    merged = [StructField(f.name, f.dataType, True) for f in parent.fields]
    for f in new_schema.fields:
        old = by_name.get(f.name)
        if old is None:
            merged.append(StructField(f.name, f.dataType, True))
        elif old.dataType != f.dataType:
            raise SchemaEvolutionError(
                f"column {f.name!r}: table has {old.dataType.simpleString()}, "
                f"append has {f.dataType.simpleString()} — type changes need an "
                "explicit overwrite, not an append"
            )
    return StructType(merged).jsonValue()


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, MANIFEST_DIR, f"v{version}.json")


def latest_version(root: str) -> int:
    """Highest committed snapshot version, or 0 if the table is empty."""
    mdir = os.path.join(root, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return 0
    versions = [
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json") and f[1:-5].isdigit()
    ]
    return max(versions, default=0)


def read_manifest(root: str, version: int | None = None) -> dict:
    """Manifest of ``version`` (default: latest). Raises FileNotFoundError
    for a never-committed version — missing history is an error, not an
    empty table."""
    v = latest_version(root) if version is None else version
    if v == 0:
        return {"version": 0, "files": [], "n_rows": 0, "parent": None}
    with open(_manifest_path(root, v)) as f:
        return json.load(f)


def _write_data_files(df: DataFrame, root: str) -> tuple[list[str], int]:
    """Land ``df`` as immutable files under ``data/batch-<uuid>/`` and return
    (relative file paths, row count). The batch dir is unique per write, so
    concurrent writers never collide on data files."""
    batch = f"batch-{uuid.uuid4().hex[:12]}"
    out_dir = os.path.join(root, DATA_DIR, batch)
    df.write.mode("error").parquet(out_dir)
    files = sorted(
        os.path.join(DATA_DIR, batch, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    spark = df.sparkSession
    n = spark.read.parquet(out_dir).count()
    return files, n


def _commit(root: str, manifest: dict) -> int:
    """Atomically publish ``manifest`` as the next version via O_EXCL create.
    Two racing writers target the same version file; the filesystem lets
    exactly one create it — the other raises SnapshotConflict."""
    version = manifest["version"]
    os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
    path = _manifest_path(root, version)
    payload = json.dumps(manifest, sort_keys=True)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as ex:
        raise SnapshotConflict(
            f"snapshot v{version} already committed by another writer"
        ) from ex
    with os.fdopen(fd, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    return version


def snapshot_append(df: DataFrame, root: str) -> int:
    """Append ``df`` as a new snapshot: new files + parent's files. Returns
    the committed version. On SnapshotConflict the data files are already
    safe and unreferenced — callers retry the COMMIT by calling again with
    an empty frame, or simply re-run (orphans are vacuumable)."""
    parent = read_manifest(root)
    merged_schema = _merge_schemas(parent.get("schema"), df.schema)
    files, n = _write_data_files(df, root)
    manifest = {
        "version": parent["version"] + 1,
        "parent": parent["version"] or None,
        "files": parent["files"] + files,
        "n_rows": parent["n_rows"] + n,
        "schema": merged_schema,
        "operation": "append",
    }
    return _commit(root, manifest)


def snapshot_overwrite(df: DataFrame, root: str) -> int:
    """Replace the table contents in a new snapshot (prior versions remain
    readable — this rewrites the FILE LIST, not history)."""
    files, n = _write_data_files(df, root)
    parent = read_manifest(root)
    manifest = {
        "version": parent["version"] + 1,
        "parent": parent["version"] or None,
        "files": files,
        "n_rows": n,
        "schema": df.schema.jsonValue(),
        "operation": "overwrite",
    }
    return _commit(root, manifest)


def read_snapshot(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Time-travel read: the table AS OF ``version`` (default latest).
    Reads exactly the manifest's files — concurrent appends, staged batches
    and orphans are invisible. An empty table yields an empty, schema-less
    error rather than a guess; pin a version for reproducible re-runs
    (the training-data use case: a model's corpus snapshot is re-readable
    forever)."""
    m = read_manifest(root, version)
    if not m["files"]:
        raise FileNotFoundError(f"snapshot v{m['version']} of {root} has no files")
    paths = [os.path.join(root, f) for f in m["files"]]
    reader = spark.read
    if m.get("schema"):
        # Impose the manifest's (evolution-merged) schema: files written
        # before a column was added resolve it to NULL by name; without this
        # a plain parquet read takes one file's schema and silently drops
        # columns the other files carry.
        from pyspark.sql.types import StructType

        reader = reader.schema(StructType.fromJson(m["schema"]))
    return reader.parquet(*paths)


def vacuum_orphans(root: str) -> list[str]:
    """Delete data files referenced by NO committed manifest (crashed or
    conflicted writes). Every live snapshot's files survive, so time travel
    is unaffected. Returns the deleted relative paths."""
    live: set[str] = set()
    for v in range(1, latest_version(root) + 1):
        try:
            live.update(read_manifest(root, v)["files"])
        except FileNotFoundError:
            continue
    data_root = os.path.join(root, DATA_DIR)
    removed: list[str] = []
    if not os.path.isdir(data_root):
        return removed
    for batch in sorted(os.listdir(data_root)):
        bdir = os.path.join(data_root, batch)
        for f in sorted(os.listdir(bdir)):
            rel = os.path.join(DATA_DIR, batch, f)
            if f.endswith(".parquet") and rel not in live:
                os.remove(os.path.join(bdir, f))
                removed.append(rel)
        if not any(f.endswith(".parquet") for f in os.listdir(bdir)):
            import shutil

            shutil.rmtree(bdir)
    return removed


def snapshot_diff(
    spark: SparkSession, root: str, v_from: int, v_to: int | None = None
) -> DataFrame:
    """Change-data-capture between two snapshots, Delta-CDF style: one frame
    with a ``_change_type`` column ('insert' rows live in files added after
    ``v_from``, 'delete' rows in files dropped by an overwrite).

    The diff is computed on the FILE LISTS, not the data: for append-only
    history this reads only the new files — CDC cost proportional to the
    change, not the table (the property that makes incremental downstream
    jobs viable on a 100 TB table). Content is never compared; a rewritten
    row appears as delete + insert, exactly like Delta/Iceberg CDF."""
    from pyspark.sql import functions as F

    m_from = read_manifest(root, v_from)
    m_to = read_manifest(root, v_to)
    added = [f for f in m_to["files"] if f not in set(m_from["files"])]
    removed = [f for f in m_from["files"] if f not in set(m_to["files"])]
    parts = []
    if added:
        parts.append(
            spark.read.parquet(*[os.path.join(root, f) for f in added]).withColumn(
                "_change_type", F.lit("insert")
            )
        )
    if removed:
        parts.append(
            spark.read.parquet(*[os.path.join(root, f) for f in removed]).withColumn(
                "_change_type", F.lit("delete")
            )
        )
    if not parts:
        raise ValueError(f"no changes between v{v_from} and v{m_to['version']} of {root}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def snapshot_append_stream(root: str):
    """foreachBatch sink committing each micro-batch as a snapshot, EXACTLY
    ONCE under checkpoint replay: the manifest records the stream batch id,
    and a replayed batch (crash after commit, before the checkpoint's own
    commit) is detected by ``stream_batch_id >= batch_id`` and skipped — no
    double-append. A crash BEFORE the manifest commit leaves only invisible
    orphan data files (vacuumable), and the replay lands the batch fresh.
    Usage: ``df.writeStream.foreachBatch(snapshot_append_stream(root))``."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        latest = read_manifest(root)
        committed = latest.get("stream_batch_id")
        if committed is not None and committed >= batch_id:
            return  # replayed batch: already in the table
        files, n = _write_data_files(batch_df, root)
        manifest = {
            "version": latest["version"] + 1,
            "parent": latest["version"] or None,
            "files": latest["files"] + files,
            "n_rows": latest["n_rows"] + n,
            "schema": batch_df.schema.jsonValue(),
            "operation": "streaming-append",
            "stream_batch_id": batch_id,
        }
        _commit(root, manifest)

    return process


def snapshot_compact(spark: SparkSession, root: str, target_files: int = 1) -> int:
    """Rewrite the latest snapshot's (possibly many small) files into
    ``target_files`` — the maintenance job a streaming-landed snapshot
    table needs, exactly like ``lake.compact_partition`` but transactional:
    the compacted file list commits as a NEW version (operation 'compact'),
    readers of prior versions are untouched, and a crash mid-compaction
    leaves only orphans. Content is byte-identical by construction."""
    df = read_snapshot(spark, root).coalesce(target_files)
    files, n = _write_data_files(df, root)
    parent = read_manifest(root)
    manifest = {
        "version": parent["version"] + 1,
        "parent": parent["version"] or None,
        "files": files,
        "n_rows": n,
        "schema": df.schema.jsonValue(),
        "operation": "compact",
    }
    return _commit(root, manifest)


def _file_key_ranges(root: str, files: list[str], key_col: str) -> dict[str, tuple]:
    """(min, max) of ``key_col`` per data file from the parquet FOOTERS —
    planning-time metadata only, no row reads. Files written clustered on
    the key (range partition / Z-order) get tight ranges, which is what
    makes the merge prune well."""
    import pyarrow.parquet as pq

    out: dict[str, tuple] = {}
    for rel in files:
        md = pq.read_metadata(os.path.join(root, rel))
        lo = hi = None
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for c in range(rg.num_columns):
                col = rg.column(c)
                if col.path_in_schema == key_col and col.statistics is not None:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out[rel] = (lo, hi)
    return out


def snapshot_merge(
    spark: SparkSession, updates: DataFrame, root: str, key_col: str
) -> tuple[int, int]:
    """Copy-on-write MERGE (upsert by key) with FILE-LEVEL PRUNING — the
    Iceberg/Delta rewrite strategy: only data files whose footer
    [min, max] range of ``key_col`` intersects the updates' key range are
    rewritten (matched rows replaced via anti-join + union); every other
    file carries over into the new manifest UNTOUCHED. Returns
    (committed_version, n_files_rewritten).

    Scale shape: the pruning decision is pure footer metadata (no row
    reads); rewrite I/O is proportional to the files actually hit, which
    on a key-clustered layout (``zorder_layout`` / range partition) is a
    tiny slice of the table. Unmatched update keys are inserts. Commit is
    the same O_EXCL snapshot point — readers of prior versions see
    nothing until the swing."""
    from pyspark.sql import functions as F

    m = read_manifest(root)
    if not m["files"]:
        v = snapshot_append(updates, root)
        return v, 0
    # Pruning predicate: a file is hit iff SOME update key falls inside its
    # footer [min, max]. The update key set is collected bounded (a merge's
    # update side is the small side by definition; past the cap we fall
    # back to the conservative global-range intersect).
    key_cap = 100_000
    key_rows = updates.select(key_col).distinct().limit(key_cap + 1).collect()
    ranges = _file_key_ranges(root, m["files"], key_col)
    if len(key_rows) > key_cap:
        lo, hi = updates.agg(F.min(key_col), F.max(key_col)).first()
        hit = [
            f
            for f in m["files"]
            if ranges[f][0] is None or not (ranges[f][1] < lo or ranges[f][0] > hi)
        ]
    else:
        import bisect

        keys = sorted(r[0] for r in key_rows)

        def file_hit(rng: tuple) -> bool:
            flo, fhi = rng
            if flo is None:
                return True  # no stats: conservative rewrite
            i = bisect.bisect_left(keys, flo)
            return i < len(keys) and keys[i] <= fhi

        hit = [f for f in m["files"] if file_hit(ranges[f])]
    keep = [f for f in m["files"] if f not in set(hit)]
    if hit:
        touched = spark.read.parquet(*[os.path.join(root, f) for f in hit])
        survivors = touched.join(updates.select(key_col), key_col, "left_anti")
        rewritten = survivors.unionByName(updates)
    else:
        rewritten = updates
    new_files, n_new = _write_data_files(rewritten, root)
    n_keep = 0
    if keep:
        n_keep = spark.read.parquet(*[os.path.join(root, f) for f in keep]).count()
    manifest = {
        "version": m["version"] + 1,
        "parent": m["version"] or None,
        "files": keep + new_files,
        "n_rows": n_keep + n_new,
        "schema": updates.schema.jsonValue(),
        "operation": "merge",
    }
    return _commit(root, manifest), len(hit)


def snapshot_delete_keys(
    spark: SparkSession, keys: DataFrame, root: str, key_col: str
) -> tuple[int, int]:
    """Row-level DELETE by key with the same file-level pruning as
    ``snapshot_merge``: only files whose footer range contains a doomed key
    are rewritten (minus the matching rows); everything else carries over.
    The GDPR-erasure / retraction primitive — downstream aggregates follow
    via ``snapshot_diff`` + ``apply_cdc_to_agg``. Returns
    (committed_version, n_files_rewritten)."""
    from pyspark.sql import functions as F  # noqa: F401  (parity with merge)

    m = read_manifest(root)
    if not m["files"]:
        raise FileNotFoundError(f"cannot delete from empty table {root}")
    key_rows = keys.select(key_col).distinct().limit(100_001).collect()
    ranges = _file_key_ranges(root, m["files"], key_col)
    import bisect

    ks = sorted(r[0] for r in key_rows)

    def file_hit(rng: tuple) -> bool:
        flo, fhi = rng
        if flo is None:
            return True
        i = bisect.bisect_left(ks, flo)
        return i < len(ks) and ks[i] <= fhi

    hit = [f for f in m["files"] if file_hit(ranges[f])]
    keep = [f for f in m["files"] if f not in set(hit)]
    new_files: list[str] = []
    n_new = 0
    if hit:
        touched = spark.read.parquet(*[os.path.join(root, f) for f in hit])
        survivors = touched.join(keys.select(key_col), key_col, "left_anti")
        new_files, n_new = _write_data_files(survivors, root)
    n_keep = 0
    if keep:
        n_keep = spark.read.parquet(*[os.path.join(root, f) for f in keep]).count()
    manifest = {
        "version": m["version"] + 1,
        "parent": m["version"] or None,
        "files": keep + new_files,
        "n_rows": n_keep + n_new,
        "schema": m.get("schema"),
        "operation": "delete",
    }
    return _commit(root, manifest), len(hit)


def snapshot_optimize(
    spark: SparkSession,
    root: str,
    zorder_cols: tuple[str, str] | None = None,
    target_files: int = 4,
    bits: int = 16,
    vacuum: bool = False,
) -> int:
    """OPTIMIZE-style maintenance in one transactional commit: rewrite the
    latest snapshot range-partitioned + sorted on a Morton (Z-order) key
    over ``zorder_cols`` (falls back to plain compaction when None), so
    per-file min/max stats skip effectively on BOTH clustered dimensions.
    Prior versions stay time-travelable; ``vacuum=True`` additionally
    reclaims orphaned files afterwards (never files a live manifest
    references, so history is unaffected — vacuum trims dead weight, not
    time travel). Returns the committed version.

    Scale shape: one full-table pass; the range partitioner samples z-value
    boundaries, so there is no single-partition global sort — the same
    layout contract as lake.zorder_layout, made transactional.

    Concurrency: the manifest version is PINNED before the rewrite starts
    and the commit targets pinned+1 — optimize rewrites exactly the
    snapshot it read, so a concurrent append that lands meanwhile claims
    pinned+1 first and this commit raises ``SnapshotConflict`` (retry on
    the new latest) instead of silently dropping the appended rows. The
    old read-latest-after-rewrite order was a lost-update race: the
    append became the parent while its rows were absent from the
    rewritten file list.
    """
    from pyspark.sql import functions as F

    from mobsos_event_log_generator_spark.sources.lake import interleave_bits

    parent = read_manifest(root)
    df = read_snapshot(spark, root, version=parent["version"] or None)
    if zorder_cols is not None:
        cx, cy = zorder_cols
        span = (1 << bits) - 1
        b = df.agg(
            F.min(F.col(cx).cast("long")).alias("xlo"),
            F.max(F.col(cx).cast("long")).alias("xhi"),
            F.min(F.col(cy).cast("long")).alias("ylo"),
            F.max(F.col(cy).cast("long")).alias("yhi"),
        ).first()
        xspan = max(int(b["xhi"]) - int(b["xlo"]), 1)
        yspan = max(int(b["yhi"]) - int(b["ylo"]), 1)
        zx = ((F.col(cx).cast("long") - int(b["xlo"])) * span / xspan).cast("long")
        zy = ((F.col(cy).cast("long") - int(b["ylo"])) * span / yspan).cast("long")
        clustered = (
            df.withColumn("__z", interleave_bits(zx, zy, bits))
            .repartitionByRange(target_files, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    else:
        clustered = df.coalesce(target_files)
    files, n = _write_data_files(clustered, root)
    manifest = {
        "version": parent["version"] + 1,
        "parent": parent["version"] or None,
        "files": files,
        "n_rows": n,
        "schema": parent.get("schema") or clustered.schema.jsonValue(),
        "operation": "optimize",
    }
    version = _commit(root, manifest)
    if vacuum:
        vacuum_orphans(root)
    return version
