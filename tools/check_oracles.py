"""Local stand-in for the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare row
count + column names + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip repr at 10 sig digits to absorb float formatting jitter
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v)
    if v is None:
        return "NULL"
    return str(v)


def result_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(normalize_cell(r[i]) for i in order) for r in rows
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from pdf_extractor_spark.queries import all_oracles, all_queries
    from pdf_extractor_spark.session import build_session

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # Default mirrors the driver-ish local[8]; the env overrides exist so the
    # sweep can be repeated at ADVERSARIAL parallelism (e.g. local[5] with 7
    # shuffle partitions) — a query whose VALUES depend on partitioning is
    # exactly the local-green/driver-red class, and only an off-nominal run
    # exposes it.
    import os
    master = os.environ.get("ORACLE_CHECK_MASTER", "local[8]")
    shuffle = os.environ.get("ORACLE_CHECK_SHUFFLE", "8")
    spark = build_session(app_name="oracle-check", master=master,
                         extra_conf={"spark.sql.shuffle.partitions": shuffle})
    queries = all_queries()
    oracles = all_oracles()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"FAIL {name}: spark error: {str(exc)[:300]}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as exc:
            failures.append((name, f"DUCKDB ERROR: {exc}"))
            print(f"FAIL {name}: duckdb error: {str(exc)[:300]}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"columns {sorted(scols)} vs {sorted(dcols)}"))
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            continue
        sm = result_multiset(scols, srows)
        dm = result_multiset(dcols, drows)
        if sm != dm:
            diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
            failures.append((name, f"value mismatch, e.g. {diff}"))
            print(f"FAIL {name}: values differ; first diffs: {diff}")
            continue
        print(f"OK   {name}: {len(srows)} rows")
    spark.stop()
    print(f"\n{len(failures)} failures of {len(queries)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
