"""BM25 lexical retrieval (operators/retrieval.py): scoring correctness vs
an independent pure-Python reference, tie/boundary semantics, and the
plan-shape contract the module docstring promises (no explode, no
(doc, term) shuffle, per-query TakeOrderedAndProject limbs)."""

from __future__ import annotations

import math
import re

import pytest

from pdf_extractor_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    BM25_K1P1,
    BM25_ONE_MINUS_B,
    bm25_topk,
)


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]


def _ref_bm25(docs, queries, k):
    """Independent reference: plain-Python BM25 with the same rational idf
    surrogate and the same fixed left-to-right term-sum order."""
    toks = {d: _tokens(t) for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for qid, terms in queries:
        df_t = {t: sum(1 for v in toks.values() if t in v) for t in terms}
        scored = []
        for doc_id, tv in toks.items():
            score = 0.0
            hit = 0
            for t in terms:
                tf = tv.count(t)
                hit += tf
                idf = (n - df_t[t] + 0.5) / (df_t[t] + 0.5)
                norm = BM25_K1 * (
                    BM25_ONE_MINUS_B + BM25_B * len(tv) / avgdl
                )
                score += idf * (tf * BM25_K1P1) / (tf + norm)
            if hit > 0:
                scored.append((round(score, 6), doc_id))
        scored.sort(key=lambda p: (-p[0], p[1]))
        out[qid] = scored[:k]
    return out


CORPUS = [
    (1, "the customer placed an order and the join completed"),
    (2, "order order order customer"),
    (3, "vector scan with a filter pushed to the scan"),
    (4, "window functions aggregate over a spark window"),
    (5, "customer"),
    (6, "entirely unrelated text about pelicans"),
    (7, "join join join join join"),
    (8, "scan"),
]
QUERIES = [
    ("q_a", ("customer", "order", "join")),
    ("q_b", ("vector", "scan", "filter")),
    ("q_c", ("spark", "window", "missingterm")),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bm25_matches_pure_python_reference(spark, corpus_df):
    got = bm25_topk(corpus_df, QUERIES, k=3)
    rows = {}
    for r in got.collect():
        rows.setdefault(r.query_id, []).append((r.score, r.doc_id))
    # bm25_topk's limbs are each internally ordered; normalize for compare
    for v in rows.values():
        v.sort(key=lambda p: (-p[0], p[1]))
    want = _ref_bm25(CORPUS, QUERIES, 3)
    want = {q: v for q, v in want.items() if v}
    assert rows == want


def test_bm25_excludes_zero_hit_docs_and_respects_k(spark, corpus_df):
    got = bm25_topk(corpus_df, QUERIES, k=2)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.query_id, set()).add(r.doc_id)
    assert all(len(v) <= 2 for v in by_q.values())
    # doc 6 matches nothing anywhere; doc 8 only q_b
    assert all(6 not in v for v in by_q.values())
    assert 8 not in by_q.get("q_a", set())


def test_bm25_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_topk(empty, QUERIES, k=3).count() == 0


def test_bm25_idf_is_rational_surrogate():
    """The idf must be the +,*,/-only Robertson surrogate (IEEE-exact on
    both engines), not ln() — monotone-decreasing in df."""
    n = 100
    vals = [(n - df + 0.5) / (df + 0.5) for df in range(1, 10)]
    assert vals == sorted(vals, reverse=True)
    # same ordering as the log form
    logs = [math.log((n - df + 0.5) / (df + 0.5)) for df in range(1, 10)]
    assert logs == sorted(logs, reverse=True)


def test_bm25_plan_shape(spark, corpus_df):
    """Docstring contract: no token explode (Generate), no (doc, term)
    shuffle beyond the single staging repartition, each query limb a
    TakeOrderedAndProject over the checkpointed tf table."""
    got = bm25_topk(corpus_df, QUERIES, k=3, n_partitions=4)
    plan = _explain(got)
    assert "Generate" not in plan
    assert plan.count("TakeOrderedAndProject") >= len(QUERIES)
    # the only exchanges are the limbs' top-k single-partition merges
    # (orderBy+limit plans no full sort); no hash-partition shuffle of a
    # (doc, term) exploded table exists anywhere
    assert "hashpartitioning(term" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
