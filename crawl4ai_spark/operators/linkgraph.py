"""Link-graph authority: fixed-point PageRank over the crawl's host graph.

The reference's DomainAuthorityScorer scores frontier URLs from a STATIC
hand-maintained domain→weight dict (`deep_crawling/scorers.py:344-402`);
at web scale the authority signal is computed, not configured — PageRank
over the host-level link graph the crawl itself discovers (Page et al.
1999; Cho/Garcia-Molina/Page 1998 use exactly this to order crawl
frontiers).  This module computes it as iterative DataFrame joins and
feeds it back into the K5 scorer surface.

Determinism at any parallelism (the property every oracle here relies on):
all arithmetic is 64-bit INTEGER micro-units — rank starts at SCALE
(1e6) per node, each out-edge carries ``rank DIV outdeg``, and the damped
update is ``(SCALE - d) + (d * in_mass) DIV SCALE`` with d = 850_000.
Integer addition is exactly associative/commutative, so shuffle order,
partition count and AQE re-plans can never flip a value (float PageRank
cannot make that promise).  Dangling-node mass is dropped, matching the
simple formulation (documented; the redistribute variant adds one global
agg per iteration).

Scale shape: edges are hash-partitioned by ``src`` ONCE and persisted;
each iteration is one co-partitioned join (ranks are re-keyed by src on
the same partitioner) plus one groupBy(dst) shuffle with map-side partial
sums; ranks are eagerly localCheckpointed per iteration so the lineage
stays flat over any iteration count.  In-mass bound: SCALE * n_nodes must
stay < 2**63 / 850_000 (comfortable to ~10^10 hosts at SCALE=1e6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000
DAMPING_MICRO = 850_000  # 0.85 in micro-units


def pagerank(edges: DataFrame, n_iter: int = 8, src: str = "src",
             dst: str = "dst", nodes: DataFrame | None = None,
             damping_micro: int = DAMPING_MICRO) -> DataFrame:
    """Fixed-point PageRank over ``edges(src, dst)``.

    Returns ``(node, rank_micro long, rank double)`` — rank_micro is the
    exact integer fixed-point value (deterministic on any engine/cluster),
    rank its /SCALE float rendering.  ``nodes`` defaults to the distinct
    union of both endpoints.  Duplicate edges count once (distinct'ed up
    front, like a host-graph adjacency).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    if nodes is None:
        nodes_df = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node"))).distinct()
        )
    else:
        nodes_df = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
    nodes_df = nodes_df.localCheckpoint(eager=False)

    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # one partitioner for the whole loop: edges+outdeg hashed by src
    adj = (
        e.join(outdeg, "src")
        .repartition("src")
        .localCheckpoint(eager=True)
    )

    base = SCALE - damping_micro
    ranks = nodes_df.withColumn("rank_micro", F.lit(SCALE).cast("long"))
    for _ in range(n_iter):
        in_mass = (
            adj.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("rank_micro DIV outdeg").alias("contrib"))
            .groupBy("dst").agg(F.sum("contrib").alias("in_mass"))
        )
        ranks = (
            nodes_df.join(in_mass.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (F.lit(base) + F.expr(
                    f"({damping_micro} * coalesce(in_mass, 0)) DIV {SCALE}"
                )).cast("long").alias("rank_micro"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.withColumn(
        "rank", F.round(F.col("rank_micro") / F.lit(float(SCALE)), 6)
    )


def host_authority(links: DataFrame, page_col: str = "url",
                   href_col: str = "href", n_iter: int = 8) -> DataFrame:
    """Host-level authority from a page→link table: collapse (page, href)
    to the distinct host→host graph (self-loops dropped), run fixed-point
    PageRank, return ``(host, rank_micro, rank)`` ready to broadcast into
    ``functions.scorers.domain_authority_score`` (K5) in place of the
    reference's static dict."""
    from crawl4ai_spark.functions.urlparts import host_of

    edges = links.select(
        host_of(F.col(page_col)).alias("src"),
        host_of(F.col(href_col)).alias("dst"),
    ).where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
        & (F.col("src") != F.col("dst"))
    )
    return pagerank(edges, n_iter=n_iter).withColumnRenamed("node", "host")
