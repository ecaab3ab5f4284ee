"""Streaming deduplication — the ingest-time guard an LLM-data pipeline runs
before anything else touches the stream.

* ``dedup_exact_stream`` — drop replayed/duplicate events by key within the
  watermark horizon (``dropDuplicatesWithinWatermark``: state is bounded by
  the watermark, unlike plain ``dropDuplicates`` whose state grows forever).
* ``dedup_content_stream`` — content-digest variant for document streams:
  dedup on md5(payload) so re-crawled identical content is dropped at the
  door; the digest column is computed JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon."""
    return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(key_cols)


def dedup_content_stream(
    docs: DataFrame,
    content_col: str,
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Content-hash dedup for document/binary streams."""
    with_digest = docs.withColumn("__digest", F.md5(F.col(content_col).cast("string")))
    return (
        with_digest.withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["__digest"])
        .drop("__digest")
    )
