"""Pandas-UDF aggregate (UDAF) surface.

NOTE: deliberately NO ``from __future__ import annotations`` here —
``pandas_udf`` infers the eval type from the function's type hints, and the
future-import turns them into unresolvable strings.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def total_tokens_udaf(n: pd.Series) -> int:
    """GROUPED_AGG pandas UDF: exact integer sum of a token-count column.
    (Arrow-batched; used via ``groupBy().agg(total_tokens_udaf(col))``.)"""
    return int(n.sum())
