"""Conversation assembly: transcripts → one row per conversation.

The stable-turn-ordering invariant (SURVEY §1.4.5, the analog of the
reference's deterministic sorted CSR edge order at
``/root/reference/src/utils.cuh:185``): turns are ordered by ``turn_idx``
*under the aggregation itself* — ``sort_array`` over collected
``struct(turn_idx, text)`` — never by a pre-shuffle ``orderBy`` that a
later exchange could destroy. This makes assembled text, and therefore
shingles, signatures, pairs and clusters, deterministic at any
parallelism level (required by the two-cluster-size scaling check).

One shuffle (groupBy conv_id); at 10^12 turns this is the pipeline's
first and largest exchange — the input table should be bucketed or
partitioned by conv_id on disk so the shuffle degenerates to a local
sort (Iceberg: ``bucket(N, conv_id)`` partition transform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_conversations(
    transcripts: DataFrame,
    text_separator: str = "\n",
) -> DataFrame:
    """(conv_id, turn_idx, role, text, ...) → (conv_id, n_turns, turns, text).

    ``turns`` is the ordered array of per-turn texts (for the per-turn
    equality invariant); ``text`` is the full assembled conversation.
    Duplicate (conv_id, turn_idx) rows keep the lexicographically first
    text — deterministic under retries / at-least-once ingestion:
    ``array_sort`` orders duplicates (turn_idx asc, text asc), then the
    filter keeps each turn_idx's first occurrence only. The inner
    ``when`` guards the 1-based ``element_at`` so index 0 is never
    touched (ANSI mode rejects it).
    """
    sorted_turns = F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
    prev_differs = lambda x, i: F.when(  # noqa: E731
        i == F.lit(0), F.lit(True)
    ).otherwise(
        x["turn_idx"] != F.element_at(F.col("_all"), i)["turn_idx"]
    )
    return (
        transcripts
        .groupBy("conv_id")
        .agg(sorted_turns.alias("_all"))
        .select("conv_id", F.filter("_all", prev_differs).alias("_sorted"))
        .select(
            "conv_id",
            F.size("_sorted").alias("n_turns"),
            F.col("_sorted.text").alias("turns"),
            F.array_join(F.col("_sorted.text"), text_separator).alias("text"),
        )
    )
