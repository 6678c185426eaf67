"""A7 — bisect-on-failure batch isolation (reference main.py:292-305:
``_extract_notes_batched`` splits a failing notes batch in half and
retries the halves, isolating the poison note instead of losing the
batch).

In this engine per-ROW Python failures are already captured as error rows
(M2, extract/udfs.py) — the reference's common case vanishes. What row
capture CANNOT absorb is whole-task death: a segfaulting codec, a
pathological-regex hang, an OOM from one adversarial document kills the
Spark TASK, and after ``spark.task.maxFailures`` the JOB. The recovery
unit is then the batch of inputs the job ran over, and the reference's
bisection is exactly the right driver-side control flow: run batches, and
when one raises, split it and requeue the halves — O(|poison| * log
batch_size) extra job launches isolate every poison input while every
healthy input is committed exactly once.

The operator is deliberately generic over "batch descriptors" (input file
lists, key ranges, doc-id lists) because that is what a retry driver has:
at 100 TB you bisect over the ~100k input FILES of the failed job, never
over collected row keys.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import TypeVar

T = TypeVar("T")


def bisect_failed_batches(
    items: Sequence[T],
    run_batch: Callable[[list[T]], None],
    batch_size: int = 5,
) -> list[tuple[T, str]]:
    """Run ``run_batch`` over ``items`` in batches; on failure, split the
    batch in half and requeue both halves (reference main.py:292-305,
    including ``mid = max(1, len//2)``). Returns the quarantine list:
    ``(item, error)`` for each singleton whose batch still raised.

    Every non-poison item is processed by exactly one SUCCESSFUL
    ``run_batch`` call; poison items end in the quarantine and are never
    silently dropped. Deterministic: FIFO queue, left half first — the
    reference's order.
    """
    batch_size = max(1, int(batch_size))
    queue: list[list[T]] = [
        list(items[i : i + batch_size]) for i in range(0, len(items), batch_size)
    ]
    quarantine: list[tuple[T, str]] = []
    while queue:
        batch = queue.pop(0)
        try:
            run_batch(batch)
        except Exception as exc:  # noqa: BLE001 — the whole point is recovery
            if len(batch) > 1:
                mid = max(1, len(batch) // 2)
                queue.insert(0, batch[mid:])
                queue.insert(0, batch[:mid])
            else:
                quarantine.append((batch[0], str(exc)))
    return quarantine


def extract_files_with_bisect(
    spark,
    paths: Sequence[str],
    run_files: Callable[[list[str]], None],
    batch_size: int = 8,
) -> list[tuple[str, str]]:
    """File-granular poison isolation: drive ``run_files`` (a callable
    that launches the extraction job over a list of input files and
    raises if the JOB dies) through the bisection queue. The returned
    quarantine names the unreadable/poison FILES; healthy files are each
    extracted exactly once. ``spark`` is accepted for signature symmetry
    with the other job drivers (the callable closes over it)."""
    return bisect_failed_batches(paths, run_files, batch_size=batch_size)
