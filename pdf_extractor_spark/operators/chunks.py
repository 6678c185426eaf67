"""M3 — multi-response continuation reassembly (SURVEY.md §2.2).

The reference loops <=5 continuation calls and concatenates the pieces
(reference src/extractor.py:185-246, loop :226-243). The relational form:
one logical document split into (doc_key, chunk_id, chunk_text) rows is
reassembled with a single groupBy — order restored by sorting the collected
(chunk_id, text) structs, which is deterministic regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CONTINUE_MARKER = "[CONTINUE]"


def strip_continuation_marker(col):
    """Remove the trailing continuation marker from a chunk (reference
    src/extractor.py:231-236 strips it before concatenating)."""
    return F.regexp_replace(col, r"\s*\[CONTINUE\]\s*$", "")


def reassemble_chunks(
    df: DataFrame,
    key_col: str = "url",
    chunk_col: str = "chunk_id",
    text_col: str = "chunk_text",
) -> DataFrame:
    """(key, chunk_id, text) rows -> (key, text, n_chunks)."""
    pair = F.struct(F.col(chunk_col).alias("i"), F.col(text_col).alias("t"))
    return df.groupBy(key_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(pair)), lambda p: p.getField("t")
            ),
            "",
        ).alias("text"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
