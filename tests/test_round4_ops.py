"""Property tests for the round-4 fifth/sixth-pass contract queries.

Oracle parity fixes cross-engine semantics; these pin the SEMANTIC
properties a refactor could silently break while staying self-consistent
on both sides (both engines drifting together would pass the oracle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q(name):
    from pdf_extractor_spark.queries import all_queries

    return all_queries()[name]


def test_shard_manifest_partitions_corpus(spark):
    """Buckets partition the corpus exactly: doc counts and byte masses
    sum to the table totals, and the additive checksum equals the sum of
    per-doc contributions computed independently (order-invariance)."""
    man = _q("a_shard_manifest")(spark, SF).collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    tot = d.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("b")
    ).first()
    assert sum(r["doc_count"] for r in man) == tot["n"]
    assert sum(r["bytes_in"] for r in man) == tot["b"]
    chk = d.select(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ck:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("c")
    ).agg(F.sum("c")).first()[0]
    assert sum(r["chk_sum"] for r in man) == chk


def test_redirect_resolve_matches_iterative(spark):
    """Pointer doubling must equal naive hop-at-a-time resolution."""
    rows = _q("u_redirect_resolve")(spark, SF).collect()
    ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    }

    def nxt(i):
        # off-corpus targets are terminal (the operator's left-join rule)
        return i + 1 if i % 8 in (0, 1, 2, 3) and i in ids else i

    for r in rows:
        u, hops = r["src"], 0
        while nxt(u) != u:
            u, hops = nxt(u), hops + 1
        assert r["final_dst"] == u, r
        assert r["n_hops"] == hops, r
        assert r["is_terminal"] == (hops == 0), r
    assert {r["src"] for r in rows} == ids


def test_quantile_histogram_brackets_exact(spark):
    """Histogram estimates must bracket the exact quantile within one
    bin width (the sketch's stated error bound)."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    vals = sorted(r["n_chars"] for r in d.select("n_chars").collect())
    lo, hi, n = vals[0], vals[-1], len(vals)
    width = (hi - lo + 1) / 256
    for r in _q("a_quantile_histogram")(spark, SF).collect():
        target = -(-r["pct"] * n // 100)  # ceil
        exact = vals[target - 1]
        assert r["target_rank"] == target
        assert r["est_value"] >= exact - 1, (r, exact)
        assert r["est_value"] - exact <= width + 1, (r, exact, width)
        assert r["cum_count"] >= target


def test_sentence_split_substrings(spark):
    """Every sentence is a contiguous substring of its document (the
    splitter removes only inter-sentence whitespace), non-empty, and
    sentinel-free."""
    d = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    out = _q("t_sentence_split")(spark, SF).collect()
    assert out
    for r in out[:2000]:
        s = r["sentence"]
        assert s.strip() != ""
        assert chr(1) not in s
        assert s in d[r["doc_id"]], (r["doc_id"], s[:60])


def test_packing_efficiency_conserves_tokens(spark):
    """Per-language token mass in the efficiency rollup must equal the
    packed table's, and sequence counts must match distinct seq_ids."""
    packed = _q("m_pack_sequences")(spark, SF)
    want = {
        r["lang"]: (r["t"], r["s"])
        for r in packed.groupBy("lang")
        .agg(
            F.sum("n_tokens").alias("t"),
            F.countDistinct("seq_id").alias("s"),
        )
        .collect()
    }
    for r in _q("m_packing_efficiency")(spark, SF).collect():
        t, s = want[r["lang"]]
        assert r["total_tokens"] == t
        assert r["n_seqs"] == s
        assert r["overflow_tokens"] >= 0


def test_lsh_recall_counts_consistent(spark):
    """Hits can never exceed either side; ppm fields follow the counts."""
    r = _q("d_lsh_recall")(spark, SF).first()
    assert r["n_sample"] == 150
    assert r["n_hit"] <= r["n_truth"]
    assert r["n_hit"] <= r["n_cand"]
    if r["n_truth"]:
        assert r["recall_ppm"] == r["n_hit"] * 1000000 // r["n_truth"]
    if r["n_cand"]:
        assert r["precision_ppm"] == r["n_hit"] * 1000000 // r["n_cand"]


def test_dataset_card_shares_sum(spark):
    """Token shares are ppm of one corpus: they sum to ~1e6 (floor slack
    < |langs|) and dup counts never exceed doc counts."""
    rows = _q("m_dataset_card_stats")(spark, SF).collect()
    share = sum(r["token_share_ppm"] for r in rows)
    assert 1000000 - len(rows) < share <= 1000000
    for r in rows:
        assert 0 <= r["exact_dup_docs"] <= r["n_docs"]


def test_kmeans_cohesion_bounds(spark):
    """Cohesion is a cosine in micro-units; members sum to the corpus."""
    rows = _q("e_kmeans_cohesion")(spark, SF).collect()
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n_members"] for r in rows) == n
    for r in rows:
        assert -1000000 <= r["min_cohesion_ppm"] <= 1000000
        assert r["min_cohesion_ppm"] <= r["mean_cohesion_ppm"] <= 1000000
