"""Python UDTF surface (Spark 4 table functions) — the row-expanding escape
hatch, demonstrated on document chunking.

The JVM path (``text.chunk_documents``) is the hot-path implementation; this
UDTF computes the identical expansion in Python and is unit-tested equal to
it — the pattern for kernels that genuinely need imperative per-row fan-out
(parser explosions, tokenizer-library chunking) where Column algebra runs
out. Arrow-optimized UDTFs batch rows across the Python boundary; still, at
100 TB prefer the Column form whenever the semantics allow.

NOTE: no ``from __future__ import annotations`` here — cloudpickled UDF/UDTF
classes must not carry stringified annotations (CLAUDE.md iron rule 4).
"""

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

# Java's \s (the JVM tokenizer contract) is ASCII-only: [ \t\n\x0B\f\r].
# Python's str.split() splits on ALL Unicode whitespace (NBSP, U+2028, ...),
# which would diverge from text.tokens() on scraped web text.
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")


@udtf(returnType="chunk_id bigint, start_token bigint, n_chunk_tokens bigint, chunk_text string")
class ChunkDocUdtf:
    """Overlapping word-window chunker; semantics in lock-step with
    ``text.chunk_documents`` (whitespace tokens, stride starts, slice)."""

    def eval(self, text, chunk_tokens, stride):
        words = [w for w in _JAVA_WS.split(text or "") if w]
        n = len(words)
        for start in range(0, n, stride):
            piece = words[start : start + chunk_tokens]
            yield start // stride, start, len(piece), " ".join(piece)


def chunk_documents_udtf(
    spark: SparkSession,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 32,
) -> DataFrame:
    """LATERAL-join the UDTF against each document row."""
    spark.udtf.register("chunk_doc_udtf", ChunkDocUdtf)
    view = "__docs_to_chunk_udtf"
    df.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT d.`{id_col}` AS {id_col}, c.chunk_id, c.start_token, c.n_chunk_tokens, c.chunk_text "
        f"FROM {view} AS d, LATERAL chunk_doc_udtf(d.`{text_col}`, {int(chunk_tokens)}, {int(stride)}) AS c"
    )
