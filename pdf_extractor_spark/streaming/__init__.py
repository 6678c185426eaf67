"""Incremental processing.

The reference has NO streaming surface (SURVEY.md §2.9 — its
``extract_streaming`` is an explicit placeholder, reference
src/extractor.py:138-159). The engine therefore stays batch-first: the
input's ``warc_ts`` supports time-partitioned incremental batches, and
``incremental.py`` provides the micro-batch driver loop (anti-join resume
per batch) that covers the reference's incremental behavior. A Structured
Streaming ``readStream``-based surface can layer on the same
``extract_documents`` transformation unchanged (it is a pure DataFrame
transform), but is intentionally not the default path.
"""
