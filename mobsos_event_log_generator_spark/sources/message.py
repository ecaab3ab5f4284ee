"""MESSAGE-table bot resolver (S3/P6/F8, SURVEY.md §2.1/§2.2).

Reference behavior (event_reader.py:93-116): when no resource ids are given,
resolve them from ``LAS2PEERMON.MESSAGE`` by scanning rows whose JSON
``REMARKS`` carries the bot's name and collecting their ``agentId`` values:

    SELECT REMARKS->>"$.agentId" FROM MESSAGE WHERE REMARKS->>"$.botName" = %s

Here: ``get_json_object`` projections (JVM JSON-path), null-drop (F8,
event_reader.py:116), distinct, and a driver collect of the (tiny) id list —
or, at scale, keep it distributed and hand back a DataFrame for a broadcast
semi-join instead of an IN-list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bot_resource_ids_df(messages: DataFrame, bot_name: str, remarks_col: str = "REMARKS") -> DataFrame:
    """Distinct agent ids for a bot, as a DataFrame (broadcast-join shape)."""
    return (
        messages.select(
            F.get_json_object(F.col(remarks_col), "$.botName").alias("botName"),
            F.get_json_object(F.col(remarks_col), "$.agentId").alias("agentId"),
        )
        .filter(F.col("botName") == bot_name)
        .filter(F.col("agentId").isNotNull())  # F8
        .select("agentId")
        .distinct()
    )


def resolve_bot_resources_from_messages(messages: DataFrame, bot_name: str) -> list[str]:
    """The reference's collected-list form (event_reader.py:113-116)."""
    return [r["agentId"] for r in bot_resource_ids_df(messages, bot_name).collect()]
