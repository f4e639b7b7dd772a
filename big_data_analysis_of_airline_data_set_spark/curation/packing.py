"""Sequence packing: assign documents to fixed-token-budget packs.

Semantics = concat-and-chunk (the common LLM pretraining packing): per
domain, documents are laid out in id order as one virtual token stream
and the stream is cut every ``budget`` tokens; a document's pack is the
chunk its FIRST token lands in. This is exactly expressible as a
window cumulative sum — true greedy first-fit packing needs a running
reset (sequential state), which neither scales nor is SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Add ``pack_id`` (chunk index within the domain) and
    ``pack_offset`` (token offset of the document inside its chunk).

    One shuffle on ``group_col``; the cumulative sum is a single window
    pass. Docs longer than ``budget`` straddle chunks — they belong to
    the chunk their first token lands in, matching the stream-cut
    semantics (training samples are cut mid-document anyway).
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(tokens_col).cast("long")
    start = (F.sum(toks).over(w) - toks).alias("_start")
    return (
        df.select(group_col, id_col, toks.alias("n_tokens"), start)
        .select(
            group_col,
            id_col,
            "n_tokens",
            F.floor(F.col("_start") / budget).alias("pack_id"),
            (F.col("_start") % budget).alias("pack_offset"),
        )
    )
