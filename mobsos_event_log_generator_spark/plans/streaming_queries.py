"""Streaming queries for the driver gate.

``streaming_sessionize_events`` runs the real Structured Streaming pipeline
(file source → watermark → session_window → memory sink, Trigger.AvailableNow)
and returns the emitted result as a batch DataFrame. The DuckDB oracle
replicates BOTH the session semantics (new session when the gap ≥ 30 min —
session windows are half-open) AND the append-mode emission rule (a session is
emitted only once the watermark passes its window end: window_end ≤ max(ts) -
1 h delay), so the gate checks the actual streaming behavior, not a batch
approximation.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobsos_event_log_generator_spark.plans.queries import TS_FMT_DUCK, TS_FMT_SPARK, register
from mobsos_event_log_generator_spark.workdirs import scratch_dir

#: State-store parallelism for the finite test streams. A stateful streaming
#: operator creates one state-store instance PER SHUFFLE PARTITION per
#: micro-batch; on a plain driver session (shuffle.partitions=200) that is
#: 200 stores × checkpoint dirs × commit files per stateful op — measured
#: 116 s for the stream-stream interval join at sf0.01, vs ~5 s at 8. On a
#: real cluster the production value comes from the session / cluster conf;
#: this is a test-stream sizing, set only for the duration of the run.
STREAM_SHUFFLE_PARTITIONS = "8"


def _write_id_slices(df: DataFrame, id_col: str, src: str, work_root: str, n_slices: int = 4) -> None:
    """Write ``df`` as ``n_slices`` single-file parquet slices with ascending
    mtimes, sliced on the ACTUAL [min, max] id range so non-contiguous ids
    cannot silently drop rows (every id lands in exactly one slice); the file
    source then delivers them as ordered micro-batches."""
    import os
    import shutil

    os.makedirs(src, exist_ok=True)
    mn, mx = df.agg(F.min(id_col), F.max(id_col)).first()
    span = int(mx) + 1 - int(mn)
    for i in range(n_slices):
        lo = int(mn) + span * i // n_slices
        hi = int(mn) + span * (i + 1) // n_slices
        part = df.filter((F.col(id_col) >= lo) & (F.col(id_col) < hi)).coalesce(1)
        tmp_part = os.path.join(work_root, f"part_{i}")
        part.write.mode("overwrite").parquet(tmp_part)
        pq = [f for f in os.listdir(tmp_part) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"slice_{i}.parquet")
        shutil.copyfile(os.path.join(tmp_part, pq), dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))


def _run_to_memory(spark: SparkSession, sink_df: DataFrame, prefix: str, output_mode: str) -> DataFrame:
    """Start ``sink_df`` as a memory-sink streaming query (fresh checkpoint,
    Trigger.AvailableNow), await completion, and return the emitted table.

    Pins ``spark.sql.shuffle.partitions`` to the test-stream state-store
    sizing for the duration of the run and RESTORES the caller's value —
    the stream's partition count is baked into its (fresh) checkpoint at
    start, so this never leaks conf into the driver's batch queries."""
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    ck = scratch_dir(f"ck_{name}_")
    old = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)
    try:
        q = (
            sink_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if old is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(name)

_STREAM_SESSION_ORACLE = f"""
WITH gaps AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_type,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
  FROM gaps
),
sess AS (
  SELECT user_id AS "case", sid,
         CAST(count(*) AS BIGINT) AS n_events,
         strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
         strftime(max(ts), '{TS_FMT_DUCK}') AS session_end,
         max(ts) + INTERVAL 30 MINUTE AS wend,
         string_agg(event_type, ',' ORDER BY ts, event_type) AS activity_path
  FROM s
  GROUP BY 1, 2
),
m AS (SELECT max(ts) AS mx FROM events)
SELECT "case", n_events, session_start, session_end,
       strftime(wend, '{TS_FMT_DUCK}') AS window_end, activity_path
FROM sess, m
WHERE wend <= mx - INTERVAL 1 HOUR
"""


@register("streaming_sessionize_events", _STREAM_SESSION_ORACLE)
def streaming_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked session-window trace assembly as a REAL streaming query
    (Trigger.AvailableNow, append mode, checkpointed) — the Spark-native
    replacement for the reference's batch pull-per-request (SURVEY.md §7.5)."""
    from mobsos_event_log_generator_spark.streaming.ingest import stream_events
    from mobsos_event_log_generator_spark.streaming.sessionize import sessionized_traces

    events = stream_events(spark, f"{sf_dir}/events.parquet")
    traces = sessionized_traces(events, gap="30 minutes", watermark_delay="1 hour")
    out = _run_to_memory(spark, traces, "sessions", "append")
    return out.select(
        "case",
        "n_events",
        F.date_format("session_start", TS_FMT_SPARK).alias("session_start"),
        F.date_format("session_end", TS_FMT_SPARK).alias("session_end"),
        F.date_format("window_end", TS_FMT_SPARK).alias("window_end"),
        "activity_path",
    )


_CAPPED_SESSION_ORACLE = f"""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS gid
  FROM gaps
),
r AS (
  SELECT user_id, ts, gid,
         (row_number() OVER (PARTITION BY user_id, gid ORDER BY ts) - 1) // 5 AS sub
  FROM s
),
sess AS (
  SELECT user_id AS "case", gid, sub,
         min(ts) AS t0, max(ts) AS t1, CAST(count(*) AS BIGINT) AS n_events
  FROM r GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY "case" ORDER BY gid DESC, sub DESC) AS rdesc
  FROM sess
),
m AS (SELECT max(ts) AS mx FROM events)
SELECT "case",
       strftime(t0, '{TS_FMT_DUCK}') AS session_start,
       strftime(t1, '{TS_FMT_DUCK}') AS session_end,
       n_events,
       CASE WHEN n_events = 5 THEN 'cap' ELSE 'timeout' END AS closed_by
FROM ranked, m
WHERE rdesc > 1 OR n_events = 5 OR t1 + INTERVAL 30 MINUTE < mx - INTERVAL 1 HOUR
"""


@register("streaming_capped_sessions", _CAPPED_SESSION_ORACLE)
def streaming_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom applyInPandasWithState sessionizer: gap sessions that ALSO close
    early at a max event count (runaway-case guard). The oracle replays the
    full stateful semantics in batch SQL — gap-split (strict > 30 min), then
    fixed-size sub-split at 5 events ('cap' close exactly at the cap,
    'timeout' otherwise) — plus the append-mode emission rule: with the whole
    file in one micro-batch, every close except a case's LAST is triggered
    in-batch by a successor event, while the trailing session needs the
    event-time timeout (watermark = max(ts) - 1 h must pass session_end +
    gap). Tests additionally prove equivalence with session_window when the
    cap is inert."""
    from mobsos_event_log_generator_spark.streaming.ingest import stream_events
    from mobsos_event_log_generator_spark.streaming.stateful import capped_sessions

    events = stream_events(spark, f"{sf_dir}/events.parquet")
    sess = capped_sessions(events, gap_seconds=1800, max_events=5, watermark_delay="1 hour")
    out = _run_to_memory(spark, sess, "capped", "append")
    return out.select(
        "case",
        F.date_format("session_start", TS_FMT_SPARK).alias("session_start"),
        F.date_format("session_end", TS_FMT_SPARK).alias("session_end"),
        "n_events",
        "closed_by",
    )


@register(
    "streaming_interval_join_attribution",
    f"""
WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts FROM events WHERE event_type = 'purchase')
SELECT c.click_id, p.purchase_id, c.user_id,
       strftime(c.click_ts, '{TS_FMT_DUCK}') AS click_ts,
       strftime(p.purchase_ts, '{TS_FMT_DUCK}') AS purchase_ts
FROM c JOIN p ON c.user_id = p.user_id
 AND p.purchase_ts >= c.click_ts
 AND p.purchase_ts <= c.click_ts + INTERVAL 3600 SECONDS
""",
)
def streaming_interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click→purchase attribution within 1 h):
    both sides watermarked so join state stays bounded; over the finite input
    the emitted pairs equal the batch range join, so the oracle is exact."""
    from pyspark.sql import functions as F

    from mobsos_event_log_generator_spark.streaming.ingest import stream_events
    from mobsos_event_log_generator_spark.streaming.joins import interval_join

    clicks = (
        stream_events(spark, f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
    )
    purchases = (
        stream_events(spark, f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    joined = interval_join(clicks, purchases, key="user_id", window_seconds=3600)
    out = _run_to_memory(spark, joined, "ssj", "append")
    return out.select(
        F.col("event_id").alias("click_id"),
        F.col("r_event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("click_ts"),
        F.date_format("r_ts", TS_FMT_SPARK).alias("purchase_ts"),
    )


@register(
    "streaming_dedup_events",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time streaming dedup (``dropDuplicatesWithinWatermark``): state
    is bounded by the 1 h watermark horizon instead of growing forever. Over
    this finite input the file source forms ONE AvailableNow micro-batch
    (state never expires mid-batch), so the emitted first-occurrences project
    exactly to DISTINCT keys — which is what the oracle checks. Output is
    projected to the key columns because WHICH duplicate survives (its other
    columns) is partition-order dependent."""
    from mobsos_event_log_generator_spark.streaming.dedup_stream import dedup_exact_stream
    from mobsos_event_log_generator_spark.streaming.ingest import stream_events

    events = stream_events(spark, f"{sf_dir}/events.parquet")
    deduped = dedup_exact_stream(events, key_cols=["user_id", "event_type"], watermark_delay="1 hour")
    return _run_to_memory(spark, deduped, "sdedup", "append").select("user_id", "event_type")


_SLIDING_ORACLE = f"""
WITH e AS (
  SELECT event_type, ts, time_bucket(INTERVAL 15 MINUTE, ts) AS b FROM events
),
x AS (
  SELECT event_type, ts, b AS wstart FROM e
  UNION ALL
  SELECT event_type, ts, b - INTERVAL 15 MINUTE AS wstart FROM e
),
agg AS (
  SELECT wstart, event_type, CAST(count(*) AS BIGINT) AS n_events
  FROM x GROUP BY 1, 2
),
m AS (SELECT max(ts) AS mx FROM events)
SELECT strftime(wstart, '{TS_FMT_DUCK}') AS window_start,
       strftime(wstart + INTERVAL 30 MINUTE, '{TS_FMT_DUCK}') AS window_end,
       event_type, n_events
FROM agg, m
WHERE wstart + INTERVAL 30 MINUTE <= mx - INTERVAL 1 HOUR
"""


@register("streaming_sliding_counts", _SLIDING_ORACLE)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (30 min window / 15 min hop) event counts as a real
    watermarked streaming aggregation. The oracle expands each event into its
    two containing epoch-aligned windows (time_bucket matches Spark's window
    alignment) and applies the append-mode emission cutoff (window_end ≤
    max(ts) − 1 h delay) — checking both the window algebra and the
    streaming emission rule."""
    from mobsos_event_log_generator_spark.streaming.ingest import stream_events
    from mobsos_event_log_generator_spark.streaming.sessionize import sliding_window_counts

    events = stream_events(spark, f"{sf_dir}/events.parquet")
    counts = sliding_window_counts(
        events, window="30 minutes", slide="15 minutes", watermark_delay="1 hour"
    )
    out = _run_to_memory(spark, counts, "slide", "append")
    return out.select(
        F.date_format("window_start", TS_FMT_SPARK).alias("window_start"),
        F.date_format("window_end", TS_FMT_SPARK).alias("window_end"),
        "event_type",
        "n_events",
    )


@register(
    "streaming_totals_complete_mode",
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1",
)
def streaming_totals_complete_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-key totals in COMPLETE output mode — the third output
    mode (append and update are covered elsewhere): every trigger re-emits
    the full aggregate state, no watermark required. Over the finite
    AvailableNow input the final emission equals the batch GROUP BY, which
    is what the oracle checks."""
    from mobsos_event_log_generator_spark.streaming.ingest import stream_events

    events = stream_events(spark, f"{sf_dir}/events.parquet")
    totals = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    return _run_to_memory(spark, totals, "totals", "complete").select("event_type", "n_events")


@register(
    "streaming_static_enrichment",
    f"""
SELECT e.event_id, e.user_id,
       strftime(e.ts, '{TS_FMT_DUCK}') AS ts,
       e.event_type, c.c_mktsegment AS segment, c.c_nationkey AS nationkey
FROM events e JOIN customer c ON c.c_custkey = e.user_id
""",
)
def streaming_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the standard production pattern the
    other streaming queries don't cover: each micro-batch joins against a
    static dimension (broadcast; re-resolvable per batch, so a slowly
    changing dim picks up updates between triggers). Stateless, so append
    mode needs no watermark and the finite-input emission equals the batch
    join, which the oracle checks."""
    from mobsos_event_log_generator_spark.sources.parquet import load_table
    from mobsos_event_log_generator_spark.streaming.ingest import stream_events

    events = stream_events(spark, f"{sf_dir}/events.parquet")
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    enriched = events.join(dim, events.user_id == dim.c_custkey).select(
        "event_id", "user_id", "ts", "event_type",
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    )
    return _run_to_memory(spark, enriched, "enrich", "append").select(
        "event_id", "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts"),
        "event_type", "segment", "nationkey",
    )


@register(
    "streaming_incremental_dedup",
    """
WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS words
           FROM documents)
SELECT md5(array_to_string(words[1:10], ' ')) AS digest,
       CAST(min(doc_id) AS BIGINT) AS doc_id
FROM w
GROUP BY 1
""",
)
def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup-INDEX maintenance (foreachBatch): documents arrive in
    four doc_id-ordered micro-batches; each batch dedups internally by the
    10-word-prefix digest (min doc_id wins), anti-joins the persisted digest
    index, appends its survivors to the index, and emits the accepted rows —
    the continuous-ingest form of ``dedup_against_corpus``. Batches are four
    files with ascending mtimes so the file source processes them in doc_id
    order, making the cross-batch arrival-order winner equal the global
    min(doc_id) the oracle computes; replays are idempotent because every
    batch overwrites its own batch=<id> partition."""
    import os

    from mobsos_event_log_generator_spark.sources.parquet import load_table
    from mobsos_event_log_generator_spark.streaming.index_maintenance import (
        accepted,
        run_incremental_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    root = scratch_dir("sincdedup_")
    src = os.path.join(root, "src")
    _write_id_slices(docs, "doc_id", src, root)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from mobsos_event_log_generator_spark.operators import text as X

    digest = F.md5(F.array_join(F.slice(X.tokens("text"), 1, 10), " "))
    old = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)
    try:
        run_incremental_dedup(
            spark,
            stream,
            index_dir=os.path.join(root, "index"),
            out_dir=os.path.join(root, "out"),
            checkpoint_dir=os.path.join(root, "ck"),
            digest=digest,
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    return accepted(spark, os.path.join(root, "out"))


@register(
    "streaming_daily_rollup",
    """
SELECT strftime(ts, '%Y-%m-%d') AS event_date,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS value_sum
FROM events
GROUP BY 1
""",
)
def streaming_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained daily rollup (materialized-view maintenance):
    events arrive in four micro-batches; each writes its PARTIAL day
    aggregate to an idempotent batch=<id> partition, and the queryable view
    folds the partials (count/sum are monoids, so batch boundaries and
    checkpoint replays are invisible). The oracle aggregates the raw table
    directly — the maintained view must equal it exactly. Values sum as
    DECIMAL(18,6) in both engines so the partial-then-fold regrouping can
    never drift from DuckDB's sequential sum (decimal addition is
    associative; double addition is not)."""
    import os

    from mobsos_event_log_generator_spark.sources.parquet import load_table
    from mobsos_event_log_generator_spark.streaming.rollup import (
        daily_rollup_view,
        run_daily_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    root = scratch_dir("sroll_")
    src = os.path.join(root, "src")
    _write_id_slices(ev, "event_id", src, root)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    stream = stream.withColumn("value", F.col("value").cast("decimal(18,6)"))
    old = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)
    try:
        run_daily_rollup(
            spark,
            stream,
            out_dir=os.path.join(root, "out"),
            checkpoint_dir=os.path.join(root, "ck"),
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    view = daily_rollup_view(spark, os.path.join(root, "out"))
    return view.select(
        "event_date",
        "n_events",
        F.round(F.col("value_sum").cast("double"), 2).alias("value_sum"),
    )


def _register_streaming_ann() -> None:
    # The oracle SQL (SQL_IVF_STREAM) lives next to the batch IVF oracle in
    # plans/llm.py, which wires it into ORACLES at ITS module end — reading
    # it here would break when plans.llm is the process's first plans
    # import (llm -> queries -> this module runs while llm is still
    # partially initialized; the old direct import died exactly there).
    @register("streaming_ann_index_maintenance")
    def streaming_ann_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Streaming ANN index maintenance (foreachBatch IVF refresh):
        embeddings arrive in four vec_id-ordered micro-batches; the first
        batch trains the deterministic IVF quantizer (md5 seeds + one Lloyd
        step), every batch assigns its vectors to the persisted centroids and
        appends them to the cell-partitioned lists under its own idempotent
        batch=<id> dir. The returned result queries the MAINTAINED index
        (probe 2 cells per query, exact cosine top-5 inside them); the
        oracle replays the identical quantizer trained on the batch-0 slice
        and assigns the full corpus — so the gate proves that after 4
        micro-batches the maintained index is indistinguishable from a batch
        build under the same quantizer (streaming/ann_index.py)."""
        import os

        from mobsos_event_log_generator_spark.sources.parquet import load_table
        from mobsos_event_log_generator_spark.streaming.ann_index import (
            query_index,
            run_ivf_index_maintenance,
        )

        # Deferred import (module-load-time llm imports break here — see the
        # registration comment above); the cap keeps |Q| fixed at any corpus
        # size, mirroring SQL_IVF_STREAM's capped probe CTE.
        from mobsos_event_log_generator_spark.plans.llm import DEMO_QUERY_CAP

        emb = load_table(spark, sf_dir, "embeddings")
        root = scratch_dir("sann_")
        src = os.path.join(root, "src")
        _write_id_slices(emb, "vec_id", src, root)

        stream = (
            spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        old = spark.conf.get("spark.sql.shuffle.partitions", None)
        spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)
        try:
            run_ivf_index_maintenance(
                spark,
                stream,
                index_dir=os.path.join(root, "index"),
                checkpoint_dir=os.path.join(root, "ck"),
                num_centroids=8,
                iters=1,
            )
        finally:
            if old is None:
                spark.conf.unset("spark.sql.shuffle.partitions")
            else:
                spark.conf.set("spark.sql.shuffle.partitions", old)
        queries = emb.filter(
            (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < DEMO_QUERY_CAP)
        )
        return query_index(spark, os.path.join(root, "index"), queries, k=5, nprobe=2)


_register_streaming_ann()


@register(
    "streaming_left_outer_attribution",
    f"""
WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts FROM events WHERE event_type = 'purchase'),
wm AS (
  SELECT least((SELECT max(click_ts) FROM c), (SELECT max(purchase_ts) FROM p))
         - INTERVAL 1 HOUR AS w
),
j AS (
  SELECT c.click_id, p.purchase_id, c.user_id, c.click_ts, p.purchase_ts
  FROM c LEFT JOIN p ON c.user_id = p.user_id
   AND p.purchase_ts >= c.click_ts
   AND p.purchase_ts <= c.click_ts + INTERVAL 3600 SECONDS
)
SELECT click_id, purchase_id, user_id,
       strftime(click_ts, '{TS_FMT_DUCK}') AS click_ts,
       strftime(purchase_ts, '{TS_FMT_DUCK}') AS purchase_ts
FROM j, wm
WHERE purchase_id IS NOT NULL
   OR click_ts + INTERVAL 3600 SECONDS < wm.w
""",
)
def streaming_left_outer_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — unconverted-click reporting:
    matched pairs emit in-batch, while a NULL row for an unmatched click is
    emitted only once the watermark PROVES no purchase can still arrive
    (click_ts + window < watermark). The oracle models the real emission
    rule, including the subtlety that the two sides carry INDEPENDENT
    watermarks computed on the FILTERED streams — the global watermark is
    min(max click ts, max purchase ts) − delay, not max(ts) overall − delay
    (verified empirically: 204/204 NULL rows at sf0.001). Clicks closer than
    window+delay to the effective stream head stay in state, unemitted —
    exactly what a resumed stream would later flush."""
    from mobsos_event_log_generator_spark.streaming.ingest import stream_events
    from mobsos_event_log_generator_spark.streaming.joins import interval_join

    clicks = (
        stream_events(spark, f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
    )
    purchases = (
        stream_events(spark, f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    joined = interval_join(clicks, purchases, key="user_id", window_seconds=3600, how="left_outer")
    out = _run_to_memory(spark, joined, "ssjlo", "append")
    return out.select(
        F.col("event_id").alias("click_id"),
        F.col("r_event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("click_ts"),
        F.date_format("r_ts", TS_FMT_SPARK).alias("purchase_ts"),
    )


@register(
    "streaming_full_outer_attribution",
    f"""
WITH c AS (SELECT event_id AS click_id, user_id AS c_user, ts AS click_ts FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id AS p_user, ts AS purchase_ts FROM events WHERE event_type = 'purchase'),
wm AS (
  SELECT least((SELECT max(click_ts) FROM c), (SELECT max(purchase_ts) FROM p))
         - INTERVAL 1 HOUR AS w
),
j AS (
  SELECT c.click_id, p.purchase_id,
         COALESCE(c.c_user, p.p_user) AS user_id,
         c.click_ts, p.purchase_ts
  FROM c FULL JOIN p ON c.c_user = p.p_user
   AND p.purchase_ts >= c.click_ts
   AND p.purchase_ts <= c.click_ts + INTERVAL 3600 SECONDS
)
SELECT click_id, purchase_id, user_id,
       strftime(click_ts, '{TS_FMT_DUCK}') AS click_ts,
       strftime(purchase_ts, '{TS_FMT_DUCK}') AS purchase_ts
FROM j, wm
WHERE (click_id IS NOT NULL AND purchase_id IS NOT NULL)
   OR (purchase_id IS NULL AND click_ts + INTERVAL 3600 SECONDS < wm.w)
   OR (click_id IS NULL AND purchase_ts < wm.w)
""",
)
def streaming_full_outer_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — the join mode with TWO
    watermark-gated NULL lanes: an unconverted click emits once no
    purchase can arrive for it (click_ts + window < W) and an unattributed
    purchase once no click can still precede it (its candidate clicks lie
    in [purchase_ts − window, purchase_ts], all provably seen once
    purchase_ts < W). W is the min of the two FILTERED streams' maxima
    minus the delay (pitfall 10); both eviction rules verified empirically
    (204 + 195 NULL rows at sf0.001, model-distinguishing at sf0.01).
    State stays bounded on both sides — each retains window+delay of
    data."""
    from mobsos_event_log_generator_spark.streaming.ingest import stream_events
    from mobsos_event_log_generator_spark.streaming.joins import interval_join

    clicks = (
        stream_events(spark, f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
    )
    purchases = (
        stream_events(spark, f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    joined = interval_join(clicks, purchases, key="user_id", window_seconds=3600, how="full_outer")
    out = _run_to_memory(spark, joined, "ssjfo", "append")
    return out.select(
        F.col("event_id").alias("click_id"),
        F.col("r_event_id").alias("purchase_id"),
        F.coalesce(F.col("user_id"), F.col("r_user_id")).alias("user_id"),
        F.date_format("ts", TS_FMT_SPARK).alias("click_ts"),
        F.date_format("r_ts", TS_FMT_SPARK).alias("purchase_ts"),
    )


@register(
    "streaming_drift_monitor",
    """
WITH b AS (SELECT min(event_id) AS mn, max(event_id) AS mx FROM events),
slices AS (
  SELECT i,
         mn + (mx + 1 - mn) * i // 4 AS lo,
         mn + (mx + 1 - mn) * (i + 1) // 4 AS hi
  FROM range(0, 4) t(i), b
),
tagged AS (
  SELECT s.i, CAST(floor(e.value / 10) AS BIGINT) AS band
  FROM events e JOIN slices s ON e.event_id >= s.lo AND e.event_id < s.hi
),
bands AS (SELECT i, band, CAST(count(*) AS BIGINT) AS n FROM tagged GROUP BY 1, 2),
allbands AS (SELECT DISTINCT band FROM bands),
ks AS (SELECT i FROM range(1, 4) t(i)),
mat AS (
  SELECT k.i AS batch_id, ab.band,
         COALESCE((SELECT n FROM bands WHERE i = k.i AND band = ab.band), 0) AS n_cur,
         COALESCE((SELECT CAST(sum(n) AS BIGINT) FROM bands WHERE i < k.i AND band = ab.band), 0) AS n_prev
  FROM ks k, allbands ab
),
tots AS (
  SELECT batch_id, CAST(sum(n_cur) AS BIGINT) AS t_cur, CAST(sum(n_prev) AS BIGINT) AS t_prev
  FROM mat GROUP BY 1
)
SELECT m.batch_id, t_cur, t_prev,
       CAST(sum(abs(n_cur * t_prev - n_prev * t_cur)) AS BIGINT) AS l1_num,
       CAST(t_cur * t_prev AS BIGINT) AS denom,
       CAST((sum(abs(n_cur * t_prev - n_prev * t_cur)) * 1000000) // (t_cur * t_prev) AS BIGINT) AS drift_ppm
FROM mat m JOIN tots USING (batch_id)
GROUP BY 1, 2, 3
""",
)
def streaming_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous distribution-drift monitoring: events arrive in four
    event_id-ordered micro-batches; each batch's banded value histogram is
    compared against the CUMULATIVE history via the exact integer L1 form
    (Σ|n_b·T_prev − h_b·T_cur|, ppm by integer division — no float
    frequencies), then appended to a persisted, batch-partitioned band
    index (crash-replay idempotent: reads exclude the writer's own
    partition). The oracle replays the same slice arithmetic and cumulative
    comparisons in SQL."""
    import os

    from mobsos_event_log_generator_spark.sources.parquet import load_table
    from mobsos_event_log_generator_spark.streaming.drift import drift_rows, run_drift_monitor

    ev = load_table(spark, sf_dir, "events")
    root = scratch_dir("sdrift_")
    src = os.path.join(root, "src")
    _write_id_slices(ev, "event_id", src, root)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    old = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)
    try:
        run_drift_monitor(
            spark,
            stream,
            band=F.floor(F.col("value") / 10).cast("long"),
            index_dir=os.path.join(root, "index"),
            out_dir=os.path.join(root, "out"),
            checkpoint_dir=os.path.join(root, "ck"),
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    return drift_rows(spark, os.path.join(root, "out"))


@register(
    "streaming_cms_maintenance",
    # Same sketch algebra as cms_user_frequencies (plans/analytics.py) — the
    # gate proves the per-batch partials SUM to the one-pass batch sketch.
    """
WITH rows_ AS (SELECT unnest([0, 1, 2, 3]) AS row),
cells AS (
  SELECT r.row,
         ('0x' || substr(md5('c' || r.row || '|' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 64 AS col
  FROM events, rows_ r
),
cms AS (SELECT row, col, CAST(count(*) AS BIGINT) AS cnt FROM cells GROUP BY 1, 2),
keys AS (SELECT DISTINCT user_id FROM events),
probes AS (
  SELECT user_id, r.row,
         ('0x' || substr(md5('c' || r.row || '|' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 64 AS col
  FROM keys, rows_ r
),
est AS (
  SELECT user_id, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est
  FROM probes LEFT JOIN cms USING (row, col) GROUP BY 1
),
exact AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt FROM events GROUP BY 1)
SELECT e.user_id, est.est, e.exact_cnt
FROM exact e JOIN est USING (user_id)
""",
)
def streaming_cms_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy-hitter sketch maintenance: events arrive in four
    event_id-ordered micro-batches; each batch writes its PARTIAL count-min
    grid to its own ``batch=<id>`` partition of a persisted cell index
    (crash-replay overwrites, never double-counts), and the merged sketch is
    the cell-wise sum. CMS merge is associative, so the final merged sketch
    must equal the one-pass batch sketch over the full input — the oracle
    replays that batch sketch counter-for-counter, proving the merge
    algebra. Output: per-user estimate from the MERGED sketch vs exact
    count. The sketch is O(depth × width) forever — the streaming state
    that never grows."""
    import os

    from mobsos_event_log_generator_spark.operators.cms import estimate_counts
    from mobsos_event_log_generator_spark.sources.parquet import load_table
    from mobsos_event_log_generator_spark.streaming.cms_maintain import (
        read_merged_cms,
        run_cms_maintenance,
    )

    ev = load_table(spark, sf_dir, "events")
    root = scratch_dir("scms_")
    src = os.path.join(root, "src")
    _write_id_slices(ev, "event_id", src, root)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    old = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)
    try:
        run_cms_maintenance(
            spark,
            stream,
            "user_id",
            index_dir=os.path.join(root, "index"),
            checkpoint_dir=os.path.join(root, "ck"),
            depth=4,
            width=64,
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    cms = read_merged_cms(spark, os.path.join(root, "index"))
    keys = ev.select("user_id").distinct()
    est = estimate_counts(keys, cms, "user_id", depth=4, width=64)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return exact.join(est, "user_id").select("user_id", "est", "exact_cnt")


@register(
    "streaming_semi_attribution",
    f"""
SELECT c.event_id AS click_id, c.user_id,
       strftime(c.ts, '{TS_FMT_DUCK}') AS click_ts
FROM events c
WHERE c.event_type = 'click'
  AND EXISTS (
    SELECT 1 FROM events p
    WHERE p.event_type = 'purchase'
      AND p.user_id = c.user_id
      AND p.ts >= c.ts
      AND p.ts <= c.ts + INTERVAL 3600 SECONDS
  )
""",
)
def streaming_semi_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT SEMI interval join — "which clicks converted",
    emitting each converting click exactly ONCE no matter how many
    purchases land in its window (the dedup the inner join can't give
    without a downstream distinct and its extra shuffle). Matched left
    rows emit in-batch; with a finite AvailableNow stream every match is
    observed, so the oracle is a plain EXISTS with no watermark clause —
    unlike the outer variants, absence never needs proving."""
    from mobsos_event_log_generator_spark.streaming.ingest import stream_events
    from mobsos_event_log_generator_spark.streaming.joins import interval_join

    clicks = (
        stream_events(spark, f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
    )
    purchases = (
        stream_events(spark, f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    joined = interval_join(clicks, purchases, key="user_id", window_seconds=3600, how="left_semi")
    out = _run_to_memory(spark, joined, "ssjsemi", "append")
    return out.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("click_ts"),
    )


_MG_K = 8


def _mg_oracle_sql(k: int, n_batches: int = 4) -> str:
    parts = [
        "WITH bounds AS (SELECT min(event_id) AS mn, max(event_id) + 1 AS mx FROM events)"
    ]
    for i in range(n_batches):
        parts.append(
            f""",
b{i} AS (
  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt
  FROM events, bounds
  WHERE event_id >= mn + ((mx - mn) * {i}) // {n_batches}
    AND event_id <  mn + ((mx - mn) * {i + 1}) // {n_batches}
  GROUP BY 1
)"""
        )
    for j in range(1, n_batches + 1):
        if j == 1:
            parts.append(",\ns1 AS (SELECT key, cnt FROM b0)")
        else:
            parts.append(
                f""",
s{j} AS (
  SELECT key, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM (SELECT key, cnt FROM m{j - 1} UNION ALL SELECT key, cnt FROM b{j - 1})
  GROUP BY 1
)"""
            )
        parts.append(
            f""",
t{j} AS (SELECT cnt AS c FROM s{j} ORDER BY cnt DESC, key LIMIT {k + 1}),
thr{j} AS (SELECT CASE WHEN count(*) = {k + 1} THEN min(c) ELSE 0 END AS t FROM t{j}),
m{j} AS (
  SELECT key, cnt - (SELECT t FROM thr{j}) AS cnt
  FROM s{j} WHERE cnt - (SELECT t FROM thr{j}) > 0
)"""
        )
    parts.append(
        f""",
exact AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS exact_cnt FROM events GROUP BY 1)
SELECT m.key AS user_id, CAST(m.cnt AS BIGINT) AS mg_cnt, e.exact_cnt
FROM m{n_batches} m JOIN exact e ON e.key = m.key
"""
    )
    return "".join(parts)


@register("streaming_mg_topk_maintenance", _mg_oracle_sql(_MG_K))
def streaming_mg_topk_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Misra-Gries heavy-hitter maintenance: events arrive in four
    event_id-ordered micro-batches; each batch merges its exact counts into
    the <= k-counter state inherited from the previous batch and applies the
    deterministic MG reduction (subtract the (k+1)-th largest under
    (count DESC, key), drop non-positives). Unlike the CMS gate's
    order-free cell sums, this proves a SEQUENTIAL state recurrence — the
    oracle replays the identical four merge+reduce stages as unrolled CTEs,
    so a wrong threshold tiebreak, a double-subtraction on replay, or a
    state read off the wrong batch all break the hash. Output: surviving
    counters vs exact counts (undercount bounded by the summed
    thresholds). State is O(k) forever; the top-(k+1) probe is a
    distributed TakeOrderedAndProject, never a global sort."""
    import os

    from mobsos_event_log_generator_spark.sources.parquet import load_table
    from mobsos_event_log_generator_spark.streaming.mg_maintain import (
        read_final_mg,
        run_mg_maintenance,
    )

    ev = load_table(spark, sf_dir, "events")
    root = scratch_dir("smg_")
    src = os.path.join(root, "src")
    _write_id_slices(ev, "event_id", src, root)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    old = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", STREAM_SHUFFLE_PARTITIONS)
    try:
        run_mg_maintenance(
            spark,
            stream,
            "user_id",
            state_dir=os.path.join(root, "state"),
            checkpoint_dir=os.path.join(root, "ck"),
            k=_MG_K,
        )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    mg = read_final_mg(spark, os.path.join(root, "state"))
    exact = ev.groupBy(F.col("user_id").cast("long").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    )
    return mg.join(exact, "key").select(
        F.col("key").alias("user_id"),
        F.col("cnt").cast("long").alias("mg_cnt"),
        "exact_cnt",
    )


def _write_hash_slices(df: DataFrame, id_col: str, src: str, work_root: str, n_slices: int = 4) -> None:
    """Write ``df`` as ``n_slices`` single-file parquet slices keyed by md5
    HASH bucket of the id (ascending mtimes) — unlike ``_write_id_slices``
    (contiguous id ranges ≈ event-time order in these fixtures), every hash
    slice spans the WHOLE event-time range, so batches 2..n genuinely carry
    events older than the watermark established by earlier batches: the
    deterministic late-data generator."""
    import os
    import shutil

    os.makedirs(src, exist_ok=True)
    bucket = F.expr(
        f"conv(substr(md5(CAST({id_col} AS STRING)), 1, 8), 16, 10) % {n_slices}"
    )
    for i in range(n_slices):
        part = df.filter(bucket == i).coalesce(1)
        tmp_part = os.path.join(work_root, f"hpart_{i}")
        part.write.mode("overwrite").parquet(tmp_part)
        pq = [f for f in os.listdir(tmp_part) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"slice_{i}.parquet")
        shutil.copyfile(os.path.join(tmp_part, pq), dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))


@register(
    "streaming_late_data_audit",
    f"""
WITH b AS (
  SELECT event_type, ts,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 4 AS bkt
  FROM events
),
bmax AS (
  SELECT bkt, epoch_us(max(ts)) // 1000 * 1000 AS mts_ms_us FROM b GROUP BY 1
),
wm AS (
  SELECT i.bkt,
         (SELECT max(mts_ms_us) FROM bmax p WHERE p.bkt <= i.bkt - 2) - 1800000000 AS w_us
  FROM bmax i
),
acc AS (
  SELECT b.event_type,
         date_trunc('hour', b.ts) AS ws,
         date_trunc('hour', b.ts) + INTERVAL 1 HOUR AS we
  FROM b JOIN wm ON wm.bkt = b.bkt
  WHERE wm.w_us IS NULL OR epoch_us(date_trunc('hour', b.ts) + INTERVAL 1 HOUR) > wm.w_us
),
gmax AS (
  SELECT (SELECT max(mts_ms_us) FROM bmax) - 1800000000 AS final_w_us
)
SELECT strftime(ws, '{TS_FMT_DUCK}') AS window_start,
       strftime(we, '{TS_FMT_DUCK}') AS window_end,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events
FROM acc, gmax
WHERE epoch_us(we) <= final_w_us
GROUP BY 1, 2, 3
""",
)
def streaming_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics, driven for real and replayed exactly:
    events arrive in four md5-hash micro-batches (each spanning the whole
    event-time range, so later batches carry genuinely late rows), flow
    through withWatermark(30 min) into a tumbling 1-hour per-type count in
    append mode, and the emitted windows are compared against a DuckDB
    replay of Spark's full watermark protocol — measured empirically and
    pinned by this gate: the late-row filter of micro-batch i runs with
    the watermark in effect at batch START, which is computed from data
    through batch i-2 (the watermark advanced by batch i-1's stats takes
    effect one batch later; progress logs confirm batch 1 drops nothing),
    watermarks are millisecond-FLOORED max event time minus the delay
    (Spark tracks them in ms; the oracle floors epoch_us // 1000), rows
    drop when window_end <= that watermark, and append emission happens
    once the final watermark passes window_end. What this gate pins down
    is exactly the part of streaming correctness batch oracles usually
    skip: WHICH rows are dropped, and WHEN windows close. At scale the
    aggregation state is bounded by (watermark horizon x type alphabet),
    the canonical bounded-state shape. Reference analog: none
    (beyond-reference streaming op)."""
    import os

    from mobsos_event_log_generator_spark.sources.parquet import load_table

    ev = load_table(spark, sf_dir, "events")
    root = scratch_dir("slate_")
    src = os.path.join(root, "src")
    _write_hash_slices(ev, "event_id", src, root)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    out = _run_to_memory(spark, agg, "lateaudit", "append")
    return out.select(
        F.date_format(F.col("window.start"), TS_FMT_SPARK).alias("window_start"),
        F.date_format(F.col("window.end"), TS_FMT_SPARK).alias("window_end"),
        "event_type",
        "n_events",
    )
