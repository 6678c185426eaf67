"""Round-trip table reconstruction (SURVEY.md §3.3; reference
reconstruct_table.py:29-112, 176-257).

Renders a STATEMENT struct back into printed balance-sheet-style lines:
indent by level, uppercase totals, one formatted cell per declared period
(values un-scaled by units_multiplier with thousands separators and
parenthesized negatives). Pure column expressions — used as the golden
round-trip proof that the structured model is information-complete, exactly
like the reference's reconstructor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pdf_extractor_spark.functions.normalize import unscale_units


def render_statement(df: DataFrame, stmt_col: str = "statement") -> DataFrame:
    """One output row per line item, in document order:
    (url, section_name, line_number, rendered) where ``rendered`` is
    'INDENT + LABEL + cell per period' joined by ' | '."""
    stmt = F.col(stmt_col)
    meta = stmt.getField("metadata")
    mult = meta.getField("units_multiplier")
    period_dates = F.transform(
        meta.getField("periods"), lambda p: p.getField("iso_date")
    )

    sec = df.select(
        "url",
        meta.alias("_meta"),
        period_dates.alias("_dates"),
        mult.alias("_mult"),
        F.posexplode(stmt.getField("sections")).alias("_spos", "_section"),
    )
    items = sec.select(
        "url",
        "_dates",
        "_mult",
        "_spos",
        F.col("_section").getField("section_name").alias("section_name"),
        F.posexplode(F.col("_section").getField("items")).alias("_ipos", "_item"),
    )

    item = F.col("_item")
    label = item.getField("label")
    shown_label = F.when(
        F.coalesce(item.getField("is_total"), F.lit(False)), F.upper(label)
    ).otherwise(label)
    indent = F.repeat(F.lit("  "), F.coalesce(item.getField("level"), F.lit(0)))

    cells = F.transform(
        F.col("_dates"),
        lambda d: F.coalesce(
            unscale_units(F.element_at(item.getField("values"), d), F.col("_mult")),
            F.lit("-"),
        ),
    )
    rendered = F.concat_ws(
        " | ", F.concat(indent, shown_label), F.array_join(cells, " | ")
    )
    return (
        items.select(
            "url",
            "_spos",
            "section_name",
            (F.col("_ipos") + 1).alias("line_number"),
            rendered.alias("rendered"),
        )
        .orderBy("url", "_spos", "line_number")
        .drop("_spos")
    )


def statement_statistics(df: DataFrame, stmt_col: str = "statement") -> DataFrame:
    """Reference reconstruct_table.py:215-236 — per-section item counts and
    document totals."""
    stmt = F.col(stmt_col)
    sec = df.select(
        "url", F.explode(stmt.getField("sections")).alias("_s")
    )
    return sec.groupBy(
        "url", F.col("_s").getField("section_name").alias("section_name")
    ).agg(
        F.sum(F.size(F.col("_s").getField("items"))).alias("n_items"),
    )
