"""Snapshot catalog seam: Iceberg-style atomic commits over plain Parquet.

The north rule asks for Iceberg tables with resume-from-last-committed-
snapshot. No Iceberg runtime jar exists in this sandbox (verified: offline,
/opt/spark/jars has none — SURVEY.md §7), so this module emulates the part of
Iceberg the engine depends on, behind a seam a real catalog can replace:

- a table is a directory of snapshot subdirs ``snap_<n>/`` (Parquet);
- a snapshot is VISIBLE only once its marker file ``_committed_<n>`` exists —
  the marker is written last, making the commit atomic: a killed job leaves
  an orphan snapshot dir that readers never see (reference analog: the upload
  cache that makes re-runs skip completed work, src/pdf_uploader.py:25,51-54);
- ``read_committed`` unions all visible snapshots;
- ``remaining`` is the resume anti-join: input rows whose key is absent from
  every committed snapshot (SURVEY.md §2.1 S3).

On a real cluster, swap these four functions for Iceberg
``writeTo(...).append()`` / ``spark.read.format("iceberg")`` / ``MERGE INTO``.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

_SNAP_RE = re.compile(r"^snap_(\d+)$")
_MARKER = "_committed_{n}"
_LIVE = "_live"


def _marker_ids(table_path: str) -> list[int]:
    if not os.path.isdir(table_path):
        return []
    names = set(os.listdir(table_path))
    out = []
    for name in names:
        m = _SNAP_RE.match(name)
        if m and _MARKER.format(n=m.group(1)) in names:
            out.append(int(m.group(1)))
    return sorted(out)


def _write_live(table_path: str, ids: list[int]) -> None:
    """Atomically swap the live-snapshot manifest (write temp + rename):
    the SINGLE mutation that changes what readers see, so delete/compact
    cannot leave a window where old and new snapshots are both visible
    (N marker deletions are not atomic; one pointer swap is)."""
    tmp = os.path.join(table_path, "_live.tmp")
    with open(tmp, "w") as fh:
        fh.write(",".join(str(i) for i in sorted(set(ids))))
    os.replace(tmp, os.path.join(table_path, _LIVE))


def _committed_ids(table_path: str) -> list[int]:
    """Visible snapshots: the _live manifest when present (intersected
    with marker'd dirs as defense), else all marker'd dirs (legacy tables
    committed before the manifest existed)."""
    markers = _marker_ids(table_path)
    live_path = os.path.join(table_path, _LIVE)
    if os.path.exists(live_path):
        with open(live_path) as fh:
            txt = fh.read().strip()
        live = {int(x) for x in txt.split(",") if x}
        return sorted(live & set(markers))
    return markers


def next_snapshot_id(table_path: str) -> int:
    existing = [
        int(m.group(1))
        for m in (
            _SNAP_RE.match(n) for n in (os.listdir(table_path) if os.path.isdir(table_path) else [])
        )
        if m
    ]
    return (max(existing) + 1) if existing else 1


def commit_snapshot(
    df: DataFrame,
    table_path: str,
    snapshot_id: int | None = None,
    *,
    preserve_snapshot: bool = False,
    replace_live: bool = False,
) -> int:
    """Write ``df`` as a new snapshot; the commit marker is written, then
    the _live manifest is swapped — visibility flips on that single atomic
    rename (a crash in between leaves the new snapshot invisible and the
    old state intact).

    Every committed row carries a ``_snapshot`` column written at commit
    time (the Iceberg snapshot-id analog) so last-wins merge ordering is a
    table property, not a directory-name convention.
    ``preserve_snapshot`` keeps each row's EXISTING ``_snapshot`` value
    (compaction/delete rewrite history files but must not flatten the
    last-wins order — re-stamping made read_latest return repaired-over
    rows again). ``replace_live`` makes this snapshot the ONLY live one
    (the delete/compact swap)."""
    os.makedirs(table_path, exist_ok=True)
    prior = _committed_ids(table_path)
    n = next_snapshot_id(table_path) if snapshot_id is None else snapshot_id
    snap_dir = os.path.join(table_path, f"snap_{n}")
    if preserve_snapshot and "_snapshot" in df.columns:
        df = df.withColumn(
            "_snapshot", F.coalesce(F.col("_snapshot"), F.lit(n))
        )
    else:
        df = df.drop("_snapshot").withColumn("_snapshot", F.lit(n))
    df.write.mode("overwrite").parquet(snap_dir)
    with open(os.path.join(table_path, _MARKER.format(n=n)), "w") as fh:
        fh.write(str(n))
    _write_live(table_path, [n] if replace_live else prior + [n])
    return n


def read_committed(spark: SparkSession, table_path: str) -> DataFrame | None:
    """Union of all committed snapshots; None when the table is empty.

    Reads with ``mergeSchema`` and backfills ``_snapshot`` from the
    ``snap_<n>`` directory name: snapshots committed before the column
    existed (legacy tables being resumed/repaired) would otherwise drop the
    column from the inferred schema — or surface nulls that break
    ``read_latest``'s last-wins ordering."""
    ids = _committed_ids(table_path)
    if not ids:
        return None
    paths = [os.path.join(table_path, f"snap_{n}") for n in ids]
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    from_dir = F.regexp_extract(
        F.input_file_name(), r"/snap_(\d+)/", 1
    ).try_cast("int")
    if "_snapshot" in df.columns:
        backfilled = F.coalesce(F.col("_snapshot"), from_dir)
    else:
        backfilled = from_dir
    return df.withColumn("_snapshot", backfilled)


def list_snapshots(spark: SparkSession, table_path: str) -> DataFrame:
    """S4 — catalog listing (reference src/pdf_uploader.py:120-140
    list_uploaded_files; Iceberg's ``tbl.snapshots`` metadata table analog):
    one row per committed snapshot with file count and total bytes."""
    import glob as _glob

    rows = []
    for n in _committed_ids(table_path):
        snap_dir = os.path.join(table_path, f"snap_{n}")
        files = _glob.glob(os.path.join(snap_dir, "*.parquet")) + _glob.glob(
            os.path.join(snap_dir, "part-*")
        )
        files = sorted(set(files))
        rows.append(
            (n, snap_dir, len(files), sum(os.path.getsize(f) for f in files))
        )
    return spark.createDataFrame(
        rows, "snapshot_id int, path string, n_files int, total_bytes long"
    )


def delete_where(
    spark: SparkSession, table_path: str, keys: DataFrame, key: str = "url"
) -> int:
    """S5 — delete rows by key (reference src/pdf_uploader.py:100-118
    delete_file; Iceberg ``DELETE FROM`` analog): rewrite the table as one
    consolidated snapshot minus the keys, commit it, then drop the old
    snapshots' markers (old data dirs become invisible orphans, mirroring
    Iceberg's snapshot expiry)."""
    current = read_committed(spark, table_path)
    if current is None:
        return 0
    old_ids = _committed_ids(table_path)
    kept = current.join(keys.select(key).distinct(), on=key, how="left_anti")
    # preserve per-row _snapshot (last-wins history) and swap the _live
    # manifest in one rename; marker removal below is mere housekeeping
    n = commit_snapshot(
        kept, table_path, preserve_snapshot=True, replace_live=True
    )
    for old in old_ids:
        marker = os.path.join(table_path, _MARKER.format(n=old))
        if os.path.exists(marker):
            os.remove(marker)
    return n


def compact(spark: SparkSession, table_path: str) -> int:
    """Consolidate all committed snapshots into one (snapshot-expiry
    housekeeping; keeps the resume anti-join cheap as commits accumulate)."""
    current = read_committed(spark, table_path)
    if current is None:
        return 0
    old_ids = _committed_ids(table_path)
    n = commit_snapshot(
        current, table_path, preserve_snapshot=True, replace_live=True
    )
    for old in old_ids:
        marker = os.path.join(table_path, _MARKER.format(n=old))
        if os.path.exists(marker):
            os.remove(marker)
    return n


def remaining(
    spark: SparkSession, input_df: DataFrame, table_path: str, key: str = "url"
) -> DataFrame:
    """Resume frontier: input rows not present in any committed snapshot.

    ``left_anti`` on the key — at 100 TB the committed side is read with only
    the key column (column-pruned scan) and the join is a shuffle-free
    broadcast when the done-set is small, else a standard shuffled anti-join.
    """
    done = read_committed(spark, table_path)
    if done is None:
        return input_df
    return input_df.join(done.select(key).distinct(), on=key, how="left_anti")
