"""Link-graph analysis for crawl prioritization (beyond-reference web op).

Web pipelines rank hosts by link structure — crawl scheduling, seed
selection, and link-spam screening all start from PageRank-family scores
over the host graph (Page et al. 1999; Common Crawl publishes exactly such
host-level rank files). This module implements it Spark-first with INTEGER
arithmetic throughout:

``pagerank_integer`` works in fixed-point "rank units" (``scale`` total
mass). Every step — per-edge contribution ``rank DIV out_degree``,
dangling-mass redistribution ``D DIV n``, damping ``85·x DIV 100`` — is
integer division, so the result is bit-identical across engines,
partitionings, and summation orders (the repo's oracle rule: no float
accumulation in checked outputs). Floating-point PageRank converges to the
same ordering; the fixed-point variant just makes the fixpoint itself
reproducible.

Scale shape per iteration: one equi-join of the edge list with the rank
table on ``src`` (both shuffle on the same key — the exchange is reused
across iterations), one groupBy(dst) sum with map-side partial agg, one
left join back onto the node list for sources with no in-links. The rank
and degree tables are |V| rows (hosts — millions, not documents), the edge
list |E|; nothing collects to the driver except the one-row dangling sum,
which is the same legitimate scalar the k-means loop holds between rounds.
``localCheckpoint`` per iteration truncates lineage exactly like the
connected-components rounds (dedup.connected_components_star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_integer(
    edges: DataFrame,
    n_iter: int = 3,
    scale: int = 1_000_000_000,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-point PageRank -> (node, rank) with sum(rank) ~= ``scale``.

    rank_0(v)   = scale DIV n
    contrib(u→v) = rank_i(u) DIV outdeg(u)
    rank_{i+1}(v) = (100-d)·(scale DIV n) DIV 100
                    + d·(Σ contrib(·→v) + dangling DIV n) DIV 100

    where ``dangling`` is the total rank of nodes with no out-edges.
    Self-loops and duplicate edges are dropped first (standard for host
    graphs); every node appearing as src or dst gets a row.
    """
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    # degree table rides every iteration — materialize it once
    deg = (
        nodes.join(outdeg, nodes["node"] == outdeg["src"], "left")
        .select("node", F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdeg"))
        .localCheckpoint()
    )
    init = scale // n
    base = (100 - damping_pct) * init // 100
    ranks = deg.select("node", F.lit(init).cast("long").alias("rank"), "outdeg")
    for _ in range(n_iter):
        dangling = (
            ranks.filter(F.col("outdeg") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("d"))
            .first()["d"]
        )
        contrib = (
            e.join(ranks.select(F.col("node").alias("src"), "rank", "outdeg"), "src")
            .select("dst", F.expr("rank DIV outdeg").cast("long").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("in_sum"))
        )
        share = int(dangling) // n
        ranks = (
            deg.join(contrib, deg["node"] == contrib["dst"], "left")
            .select(
                "node",
                "outdeg",
                F.coalesce("in_sum", F.lit(0)).cast("long").alias("in_sum"),
            )
            .select(
                "node",
                "outdeg",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"(CAST({damping_pct} AS BIGINT) * "
                        f"(in_sum + CAST({share} AS BIGINT))) DIV 100"
                    )
                ).cast("long").alias("rank"),
            )
            .select("node", "rank", "outdeg")
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", "rank")
