"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship main-content extraction over sf0.001 — pages are
  synthesized deterministically from `documents.text`, boilerplate-wrapped,
  then stripped back out by the vectorized extraction UDF.
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator from
  SURVEY.md §2 (see pdf_extractor_spark/queries/ for the catalog).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pdf_extractor_spark.queries import all_queries

    return all_queries()["x_extract_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pdf_extractor_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each queries() entry (keys without an
    oracle are non-SQL-expressible and get the driver's rows-only check)."""
    from pdf_extractor_spark.queries import all_oracles

    return all_oracles()
