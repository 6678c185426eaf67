"""V3-V5 — deterministic golden-fixture validation (SURVEY.md §2.8).

The reference validates by re-sending the PDF to the LLM and parsing its
verdict text (reference src/validator.py:54-124, :1357-1536, :1538-1682).
With a deterministic parser that entire apparatus collapses into joins
against golden fixtures:

- V3 (content):   per-url byte-identical text equality
- V4 (structure): per-url block-count / first-block / last-block comparison
- V7 (repair):    the failed subset feeds pipeline.rerun_failed
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def golden_compare(
    extracted: DataFrame,
    golden: DataFrame,
    key: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Full-outer golden join with per-url verdicts.

    Broadcast the golden side at test scale; at corpus scale both sides are
    url-bucketed so this is a co-partitioned sort-merge join.
    """
    e = extracted.select(
        F.col(key),
        F.col(text_col).alias("_e_text"),
        F.md5(F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")).alias("_e_hash"),
    )
    g = golden.select(
        F.col(key),
        F.col(text_col).alias("_g_text"),
        F.md5(F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")).alias("_g_hash"),
    )
    joined = e.join(g, on=key, how="full_outer")
    return joined.select(
        key,
        (F.col("_e_text").isNotNull() & F.col("_g_text").isNotNull()).alias("both_present"),
        (F.col("_e_hash") == F.col("_g_hash")).alias("byte_identical"),
        F.length("_e_text").alias("extracted_len"),
        F.length("_g_text").alias("golden_len"),
    )


def structure_compare(
    extracted: DataFrame,
    golden: DataFrame,
    key: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """V4 — section-structure manifest comparison: block counts and
    first/last block equality per document (the reference's count/name/
    boundary checks, src/validator.py:1416-1436, as expressions)."""

    def manifest(df: DataFrame, prefix: str) -> DataFrame:
        blocks = F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n\n")
        blocks = F.filter(blocks, lambda b: F.length(b) > 0)
        return df.select(
            F.col(key),
            F.size(blocks).alias(f"{prefix}_n_blocks"),
            F.element_at(blocks, 1).alias(f"{prefix}_first"),
            F.element_at(blocks, -1).alias(f"{prefix}_last"),
        )

    e = manifest(extracted, "e")
    g = manifest(golden, "g")
    return (
        e.join(g, on=key, how="inner")
        .select(
            key,
            (F.col("e_n_blocks") == F.col("g_n_blocks")).alias("count_match"),
            (
                F.coalesce(F.col("e_first") == F.col("g_first"), F.lit(False))
            ).alias("first_match"),
            (
                F.coalesce(F.col("e_last") == F.col("g_last"), F.lit(False))
            ).alias("last_match"),
            "e_n_blocks",
            "g_n_blocks",
        )
    )


def failed_urls(comparison: DataFrame, key: str = "url") -> DataFrame:
    """The repair worklist (feeds V7): urls that are not byte-identical."""
    return comparison.filter(
        ~F.coalesce(F.col("byte_identical"), F.lit(False))
    ).select(key)
