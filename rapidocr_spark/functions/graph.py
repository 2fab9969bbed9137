"""Link-graph analysis over the document corpus.

Web-scale training pipelines score crawled pages by link importance
(PageRank / harmonic centrality over the crawl graph — the CommonCrawl
ranking shape) to prioritise fetching and weight quality.  The synthetic
corpus carries no organic hyperlinks, so the graph is ENRICHED
deterministically from doc_id arithmetic (the doc_pii_scrub /
doc_url_normalize precedent: pure functions of the table's own columns,
no external data), then the REAL operator runs over it.

Determinism discipline: ranks are integer-scaled bigints end to end
(rank mass S = 10^12; every division is integer `div`), so the damped
power iteration is bit-identical between Spark and the DuckDB oracle —
the same rule as the Lloyd centroid means (CLAUDE.md: no order-dependent
float reductions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .caching import track_persist

PR_SCALE = 1_000_000_000_000  # rank mass carried as bigints (10^12)
PR_ITERS = 3                  # fixed power iterations (oracle = 3 chained CTEs)
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85 as exact integer arithmetic
PR_FANOUT = 3                 # synthetic out-links per document


def _doc_graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(nodes, edges): a deterministic pseudo-random crawl graph —
    doc i links to ((i² mod N)·7 + 31·i + k) mod N for k = 1..PR_FANOUT,
    with every edge where (i + k) ≡ 0 (mod 4) dropped and self-loops
    removed.  The quadratic term makes the map non-bijective (colliding
    targets become high-in-degree hubs, some pages get zero in-links)
    and the drop rule varies out-degree — a skewed web-like graph, so
    the PageRank fixpoint is genuinely non-uniform (a pure affine map
    i → 31·i + k is a bijection per k: perfectly regular graph, uniform
    rank, and a vacuous gate).  i² is reduced mod N BEFORE the ·7 so the
    arithmetic stays inside int64 for any doc_id < 3·10⁹ (the overflow-
    safe-hash rule).  Every edge lands on an existing node because
    doc_id is contiguous 0..N-1; the oracle builds the identical edge
    list in SQL."""
    # plain read on purpose (round-8 A/B): pagerank's cost is the
    # iterative joins, not the id scan, and a spread exchange on the
    # node frame regressed the query 1.2 → 4.2 s at sf1.0
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    nodes = track_persist(docs)
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    did = F.col("doc_id")
    edges = (
        nodes.crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(*[
                    F.struct(
                        (
                            (((did * did) % F.col("n_nodes")) * 7 + did * 31 + F.lit(k))
                            % F.col("n_nodes")
                        ).alias("dst"),
                        F.lit(k).alias("k"),
                    )
                    for k in range(1, PR_FANOUT + 1)
                ])
            ).alias("e"),
        )
        .where(((F.col("src") + F.col("e.k")) % 4 != 0) & (F.col("src") != F.col("e.dst")))
        .select("src", F.col("e.dst").alias("dst"))
    )
    return nodes, track_persist(edges)


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank over the document link graph, PR_ITERS fixed power
    iterations from a uniform start — the crawl-prioritisation /
    quality-weighting signal of a web-scale corpus pipeline.

    r_{t+1}(v) = (1-d)·S/N  +  d · Σ_{u→v} r_t(u) div outdeg(u)

    with every term an exact bigint (S = 10^12 total mass; integer `div`
    mirrors DuckDB `//` — all values non-negative so floor == trunc).

    Spark-first plan: the edge list is built once and persisted; each
    iteration is one equi-join (edges ⋈ ranks on src) plus one
    groupBy(dst) partial-aggregated sum — the textbook distributed
    PageRank round, O(|E|) per iteration with no driver-side state.  At
    100 TB the edge frame would be bucketed by src so the per-iteration
    join co-locates without reshuffling; PR_ITERS is a small constant so
    lineage stays shallow (no checkpointing needed).  Dangling mass: the
    graph has outdeg ≥ 1 everywhere by construction (the PR_FANOUT dsts
    of a node are pairwise distinct mod N, so at most one self-loop, and
    the (i+k) mod 4 rule drops at most one more edge), so no
    dangling-node redistribution term is needed (documented contract,
    visible in the out_degree column)."""
    nodes, edges = _doc_graph(spark, sf_dir)
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    base = nodes.crossJoin(F.broadcast(n)).select(
        "doc_id", F.expr(f"{PR_SCALE} div n_nodes").alias("base")
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg) is loop-invariant: join it ONCE and persist, so
    # each iteration is one equi-join + one groupBy instead of two joins
    # (measured ~2× off the fixture-scale constant; at 100 TB this is
    # also the frame one would bucket by src)
    edges_deg = track_persist(edges.join(outdeg, "src"))
    ranks = base.select("doc_id", F.col("base").alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            edges_deg.join(ranks.select(F.col("doc_id").alias("src"), "r"), "src")
            .select("dst", F.expr("r div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("agg_in"))
        )
        ranks = (
            base.join(contrib, base.doc_id == contrib.dst, "left")
            .select(
                "doc_id",
                (
                    F.expr(
                        f"({PR_DAMP_DEN - PR_DAMP_NUM} * base) div {PR_DAMP_DEN}"
                    )
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(agg_in, 0L)) div {PR_DAMP_DEN}"
                    )
                ).alias("r"),
            )
        )
    inlinks = edges.groupBy(F.col("dst").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_inlinks")
    )
    return (
        ranks.join(inlinks, "doc_id", "left")
        .join(outdeg.select(F.col("src").alias("doc_id"), "outdeg"), "doc_id", "left")
        .select(
            "doc_id",
            F.col("r").cast("bigint").alias("pr_scaled"),
            F.coalesce("n_inlinks", F.lit(0)).cast("bigint").alias("n_inlinks"),
            F.coalesce("outdeg", F.lit(0)).cast("bigint").alias("out_degree"),
        )
    )
