"""Join/merge/window operators re-expressing the reference's driver-side
dict merges and loops (SURVEY.md §2.4-2.6) as relational plans."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pdf_extractor_spark.functions.normalize import dotted_sort_key, normalize_note_ref


def last_wins_merge(df: DataFrame, key_cols: list[str], priority_col: str) -> DataFrame:
    """J1/J2/W3 — union-by-key, highest priority wins
    (reference main.py:339-343, :715-725 dict-update merges)."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(priority_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def first_seen_dedupe(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """A3 — order-preserving dedupe: keep the first occurrence per key
    (reference main.py:92-100 seen-set loop)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def retry_remaining(requested: DataFrame, completed: DataFrame, key: str) -> DataFrame:
    """A4 — remaining = requested minus completed (anti-join); the driver's
    bounded while-loop re-submits this shrinking frontier
    (reference main.py:321-337)."""
    return requested.join(completed.select(key).distinct(), on=key, how="left_anti")


def collect_note_refs(
    df: DataFrame, ref_col: str = "notes_reference", doc_col: str = "url"
) -> DataFrame:
    """A1+A2 — explode nested refs, normalize 'Note 7.1'->'7.1', distinct,
    numeric-dotted sort (reference src/notes_extractor.py:29-68)."""
    exploded = df.select(
        F.col(doc_col), F.explode(F.col(ref_col)).alias("raw_ref")
    )
    normalized = exploded.select(
        F.col(doc_col), normalize_note_ref(F.col("raw_ref")).alias("note_id")
    ).filter(F.length("note_id") > 0)
    return (
        normalized.distinct()
        .withColumn("_k", dotted_sort_key(F.col("note_id")))
        .orderBy(doc_col, "_k")
        .drop("_k")
    )


def apply_corrections(
    items: DataFrame, corrections: DataFrame, key: str = "url"
) -> DataFrame:
    """V6 — correction applier (reference src/validator.py:1881-2007):
    match by (doc, normalized label), point-update the values map at the
    corrected period key. Broadcast the (small) corrections side; the map
    rewrite is a pure expression — a MERGE INTO in spirit.

    ``corrections``: (key, label, period_key, new_value).
    """
    items_n = items.withColumn("_lbl", F.lower(F.trim(F.col("label"))))
    corr_n = corrections.select(
        F.col(key),
        F.lower(F.trim(F.col("label"))).alias("_clbl"),
        F.col("period_key"),
        F.col("new_value"),
    )
    joined = items_n.join(
        F.broadcast(corr_n),
        on=[
            items_n[key] == corr_n[key],
            items_n["_lbl"] == corr_n["_clbl"],
        ],
        how="left",
    ).drop(corr_n[key])
    patched = F.when(
        F.col("period_key").isNotNull()
        & F.map_contains_key(F.col("values"), F.col("period_key")),
        F.map_from_entries(
            F.transform(
                F.map_entries(F.col("values")),
                lambda e: F.struct(
                    e.getField("key").alias("key"),
                    F.when(
                        e.getField("key") == F.col("period_key"),
                        F.col("new_value"),
                    )
                    .otherwise(e.getField("value"))
                    .alias("value"),
                ),
            )
        ),
    ).otherwise(F.col("values"))
    return joined.withColumn("values", patched).drop(
        "_lbl", "_clbl", "period_key", "new_value"
    )


def fuzzy_label_correction_join(
    items: DataFrame, corrections: DataFrame
) -> DataFrame:
    """J4 — the reference fuzzy-matches corrections by label substring
    (reference src/validator.py:1970-2007). Normalized equi-join first
    (broadcast the small corrections side), substring theta-join fallback
    for the stragglers."""
    items_n = items.withColumn("_lbl", F.lower(F.trim(F.col("label"))))
    corr_n = corrections.withColumn("_clbl", F.lower(F.trim(F.col("label"))))
    exact = items_n.join(
        F.broadcast(corr_n.select("_clbl", F.col("new_value"))),
        items_n["_lbl"] == corr_n["_clbl"],
        "left",
    )
    return exact.withColumn(
        "value", F.coalesce(F.col("new_value"), F.col("value"))
    ).drop("_lbl", "_clbl", "new_value")
