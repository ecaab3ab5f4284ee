"""Error-tolerant JSONL corpus ingestion.

Web-scale document corpora ship as JSON-lines (Common Crawl derivatives,
RedPajama/FineWeb dumps, internal crawl exports), and at 100 TB some lines
are ALWAYS broken — truncated records, stray bytes, schema drift. A reader
that dies on the first bad line cannot ingest a crawl; one that silently
drops lines corrupts provenance. This reader does the standard production
thing:

* explicit schema (never schema-inference over 100 TB of text);
* PERMISSIVE mode with a ``_corrupt_record`` column: malformed lines come
  through as one NULL-typed row carrying the raw line, so the caller can
  count, quarantine, or route them without losing the scan;
* quarantine split helper returning (clean, corrupt) frames.

The scan stays a plain distributed text/JSON read — predicate pushdown on
the parsed columns works as usual, and the corrupt channel adds no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

#: documents-table shape for JSONL dumps (mirrors the parquet fixture).
DOCS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_jsonl_docs(spark: SparkSession, path: str, schema: T.StructType = DOCS_JSONL_SCHEMA) -> DataFrame:
    """Read a JSONL corpus with malformed-line capture. ``schema`` must
    include the ``_corrupt_record`` string field — Spark routes unparseable
    lines there (PERMISSIVE is the default mode, pinned explicitly)."""
    if CORRUPT_COL not in schema.fieldNames():
        raise ValueError(f"schema must include a {CORRUPT_COL} string field")
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt): clean rows lose the corrupt column; corrupt rows are
    the raw offending lines (for re-parse attempts or provenance logs).

    Spark refuses to query ONLY the corrupt column of a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the pruned
    re-parse couldn't know what failed), so the split materializes the
    parsed frame once via localCheckpoint; both branches then read the
    materialized rows instead of re-parsing the files."""
    df = df.localCheckpoint(eager=True)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, corrupt
