"""Graph layer — SURVEY.md §2.10 (G1-G3) and §7.4.

The reference projects deliveries into a Neo4j property graph
(neo4j_loader.py) and runs Cypher + GDS PageRank
(cypher_queries.cypher:28-34). Spark-native form: a graph IS two
DataFrames — ``vertices(id, ...)`` and ``edges(src, dst, ...)`` —
and every Cypher query shape is a join/aggregation on them.

PageRank (G2) is the one algorithm with real iterative content:
each iteration is one join + one groupBy (one shuffle), with
``localCheckpoint`` every few iterations to truncate lineage —
without it the plan tree doubles per iteration and the driver
OOMs long before 100 TB is the problem. Only O(1) scalars ever
reach the driver (the dangling-mass total — computed inside the
contrib shuffle via rollup, fetched as one row — and an optional
convergence delta); ranks themselves stay distributed.

Generic testdata binding: the customer↔supplier trade graph
(who bought from whom, via lineitem×orders) — a natural bipartite
graph whose PageRank surfaces high-flow trading hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from cricket_analytics_nosql_spark.operators.spec import QuerySpec
from cricket_analytics_nosql_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# G1 — graph projection with parallel-edge pre-aggregation
# (cypher_queries.cypher:28; gds.graph.project collapses parallel edges the
#  same way when given an aggregation)
# ---------------------------------------------------------------------------

def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge DataFrame of the customer→supplier trade graph.

    lineitem ⋈ orders gives (customer, supplier) pairs per line item;
    parallel edges collapse to one weighted edge (G1 pre-aggregation,
    SURVEY §2.10) *before* any further graph work — at 100 TB the
    collapsed edge list is orders of magnitude smaller than the raw
    pair stream, so every downstream join touches the small form.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def graph_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 as a driver-checkable query: the collapsed weighted edge
    list, heaviest trading pairs first."""
    return (
        trade_edges(spark, sf_dir)
        .orderBy(F.desc("weight"), F.asc("src"), F.asc("dst"))
        .limit(50)
    )


ORACLE_GRAPH_PROJECT = """
SELECT o_custkey AS src, l_suppkey AS dst, COUNT(*) AS weight
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_custkey, l_suppkey
ORDER BY weight DESC, src ASC, dst ASC
LIMIT 50
"""


# ---------------------------------------------------------------------------
# G3 — degree-style stats over edges grouped by endpoint
# (cypher_queries.cypher:5-16 duel stats = groupBy on edge endpoints)
# ---------------------------------------------------------------------------

def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-degree / weighted-degree per source vertex — the Cypher
    duel-stat shape (A7/G3): top customers by distinct suppliers."""
    return (
        trade_edges(spark, sf_dir)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("out_degree"),
            F.sum("weight").alias("total_weight"),
        )
        .orderBy(F.desc("out_degree"), F.desc("total_weight"), F.asc("src"))
        .limit(25)
    )


ORACLE_GRAPH_DEGREE = """
WITH edges AS (
  SELECT o_custkey AS src, l_suppkey AS dst, COUNT(*) AS weight
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey, l_suppkey
)
SELECT src, COUNT(*) AS out_degree, SUM(weight) AS total_weight
FROM edges
GROUP BY src
ORDER BY out_degree DESC, total_weight DESC, src ASC
LIMIT 25
"""


# ---------------------------------------------------------------------------
# G2 — PageRank as an iterative DataFrame loop
# (cypher_queries.cypher:31-34: gds.pageRank.stream, top-20 by score)
# ---------------------------------------------------------------------------

def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 15,
    tol: float | None = 1e-6,
    check_every: int = 4,
    broadcast_max_vertices: int = 1_000_000,
) -> DataFrame:
    """Standard-formulation PageRank over an ``edges(src, dst)``
    DataFrame; returns ``(id, pagerank)`` with scores summing to the
    vertex count (the gds.pageRank normalization).

    Per-iteration dataflow — ONE shuffle, of vertex-sized data:
      contribs(dst) = Σ rank(src)/out_deg(src)   (links ⋈ ranks)
      rank'(v)     = (1-d) + d·(contribs(v) + dm/N)

    Dangling mass needs no pass of its own: PageRank conserves total
    mass at N, and Σ contribs is exactly the mass sitting on
    non-dangling vertices, so dm = N − Σ contribs. The total is
    measured by an ``Observation`` (``CollectMetrics``) attached to
    the pre-aggregation rows of the SAME job that materializes
    contribs — the metric piggybacks on task completion, so the loop
    runs exactly ONE job per iteration and only O(1) bytes (the
    observed sum, plus an optional convergence delta) ever reach the
    driver. Measured at sf0.1/12 iterations this removes a
    ~0.1 s/iteration scalar-aggregate round-trip; on a real cluster
    each avoided round-trip is a full job launch.

    Alternatives measured and rejected (Spark 4.1, local):
    ``rollup(dst)`` folding the total into the shuffle costs more
    than it saves (Expand doubles map-side agg input), and
    re-injecting dm as ``crossJoin(broadcast(1-row frame))``
    triggers pathological re-execution — iteration wall time doubles
    every round past ~14 even though the analyzed plan stays a flat
    LogicalRDD scan.

    Lineage discipline (SURVEY §7.8 risk 1): contribs is
    ``localCheckpoint``-ed every iteration — it is small (one row per
    in-linked vertex) and every downstream consumer then reads
    materialized data. Leaving it lazy is not an optimization: an
    unmaterialized chain re-executes earlier iterations on every
    reference. The big edge list is pre-shuffled onto the join key
    once and never moves again.
    """
    spark = edges.sparkSession
    # Materialize the edge list ONCE before anything else: it feeds
    # three consumers (vertex universe, out-degrees, link table) and
    # is typically the output of an expensive upstream join — left
    # lazy, that upstream would re-execute once per consumer.
    edges = edges.localCheckpoint()
    # vertex universe = src ∪ dst; materialized — reused every
    # iteration. N is observed on the materialization job itself.
    n_obs = Observation()
    vertices = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .observe(n_obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    n = int(n_obs.get["n"])
    if n == 0:
        return spark.createDataFrame([], "id long, pagerank double")

    # Rank/contrib frames are VERTEX-sized — usually orders of
    # magnitude smaller than the edge list. Below the threshold,
    # broadcast them into every join: the edge list then never
    # shuffles at all and each iteration's only exchange is the
    # vertex-sized partial-agg of contribs. Above it (billion-vertex
    # graphs), fall back to pre-partitioning the edge list on the
    # join key once so the per-iteration shuffle is rank-sized.
    small = n <= broadcast_max_vertices
    maybe_bcast = F.broadcast if small else (lambda df: df)

    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    links = edges.join(maybe_bcast(out_deg), "src").select(
        F.col("src").alias("id"), "dst", "out_deg"
    )
    if not small:
        links = links.repartition(F.col("id"))
    links = links.localCheckpoint()

    # rank(v) as an expression over a left-joined contrib column and
    # the dm scalar (dangling mass; see docstring).
    def rank_col(dm: float) -> F.Column:
        return F.lit(1.0 - damping) + F.lit(damping) * (
            F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dm / float(n))
        )

    def agg_contribs(rows: DataFrame) -> tuple[DataFrame, float]:
        """rows(dst, c) → (checkpointed per-dst sums, dangling mass).
        The mass total is observed on the rows flowing INTO the
        aggregation (Σc is invariant under the groupBy), so the
        eager checkpoint both materializes contribs and completes
        the metric — no second job. ``observe`` inserts a
        CollectMetrics barrier, which is why it sits on the cheap
        pre-agg projection, not across the join."""
        obs = Observation()
        ck = (
            rows.observe(obs, F.sum("c").alias("mass"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
            .localCheckpoint()
        )
        return ck, float(n) - float(obs.get["mass"] or 0.0)

    # Iteration 1 directly from the uniform rank=1 start: no join —
    # contrib(dst) = Σ 1/out_deg over in-edges.
    contribs, dm = agg_contribs(
        links.select("dst", (F.lit(1.0) / F.col("out_deg")).alias("c"))
    )
    for i in range(1, max_iter):
        # ranks never materialize as a vertex frame mid-loop: the
        # rank formula is inlined into the links⋈contribs join (left,
        # because vertices with no in-links still hold base rank)
        prev = contribs
        next_contribs, dm = agg_contribs(
            links.join(maybe_bcast(prev.withColumnRenamed("dst", "id")), "id", "left")
            .select("dst", (rank_col(dm) / F.col("out_deg")).alias("c"))
        )
        # convergence: ranks are an affine map of contribs, so the
        # L1 delta of consecutive contribs bounds the rank delta
        if tol is not None and (i + 1) % check_every == 0:
            delta = (
                next_contribs.join(
                    prev.withColumnRenamed("contrib", "prev"), "dst"
                )
                .agg(F.sum(F.abs(F.col("contrib") - F.col("prev"))))
                .first()[0]
            )
            if delta is not None and delta < tol * n:
                contribs = next_contribs
                break
        contribs = next_contribs
    # vertex universe joined ONCE, at the end
    return (
        vertices.join(
            maybe_bcast(contribs.withColumnRenamed("dst", "cdst")),
            vertices.id == F.col("cdst"),
            "left",
        )
        .select("id", rank_col(dm).alias("pagerank"))
    )


def pagerank_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2+T6: PageRank over the trade graph, top-20 by score
    (cypher_queries.cypher:31-34). Deterministic (fixed iterations /
    convergence on deterministic data) but not SQL-expressible —
    rows-only oracle path. Scores rounded so float noise across
    partition merge orders can't flap the ranking.

    Fixed iteration count, no tol probe: on this graph the L1 delta
    decays ~d² per round and sits above tol·N until past 12, so the
    probes are pure overhead (measured ~0.8 s/probe — a join job per
    check); 12 rounds is already 6-decimal-converged here."""
    edges = trade_edges(spark, sf_dir)
    pr = pagerank(edges, max_iter=12, tol=None)
    return (
        pr.select("id", F.round("pagerank", 6).alias("pagerank"))
        .orderBy(F.desc("pagerank"), F.asc("id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Cricket binding — the reference's actual graph (player duel graph)
# ---------------------------------------------------------------------------

def player_vertices(deliveries: DataFrame) -> DataFrame:
    """A9: MERGE (p:Player {name}) — every batter/non-striker/bowler
    exactly once (neo4j_loader.py:58-62, constraint :28)."""
    return (
        deliveries.select(F.col("batter").alias("name"))
        .union(deliveries.select(F.col("nonStriker").alias("name")))
        .union(deliveries.select(F.col("bowler").alias("name")))
        .filter(F.col("name").isNotNull())
        .distinct()
    )


def faced_edges(deliveries: DataFrame) -> DataFrame:
    """A9 last-writer-wins: MERGE (bat)-[f:FACED {matchId, innings,
    over, ball}]->(bow) SET f.runs/isWicket/team (neo4j_loader.py:
    58-68) — edge keyed by composite identity, payload from the last
    write. Reference defaults: ball→-1, runs→0 (neo4j_loader.py:
    113-116, P12)."""
    keyed = (
        deliveries.na.drop(subset=["batter", "bowler", "matchId", "over"])
        .select(
            F.col("batter").alias("src"),
            F.col("bowler").alias("dst"),
            "matchId",
            "innings",
            "over",
            F.coalesce(F.col("ball"), F.lit(-1)).alias("ball"),
            F.coalesce(F.col("runs_total"), F.lit(0)).alias("runs"),
            F.when(F.size(F.coalesce(F.col("wickets"), F.array())) > 0, 1)
            .otherwise(0)
            .alias("isWicket"),
            F.col("battingTeam").alias("team"),
        )
    )
    return keyed.dropDuplicates(["matchId", "innings", "over", "ball", "src"])


def player_pagerank(deliveries: DataFrame, **kw) -> DataFrame:
    """The reference's GDS call end-to-end: project the duel graph
    (G1), run PageRank (G2), rank (T6)."""
    edges = faced_edges(deliveries).groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("weight")
    )
    return (
        pagerank(edges, **kw)
        .orderBy(F.desc("pagerank"), F.asc("id"))
        .limit(20)
    )


QUERIES: dict[str, QuerySpec] = {
    "graph_project": QuerySpec(
        graph_project, ORACLE_GRAPH_PROJECT, ["G1", "J1", "A8"]
    ),
    "graph_degree": QuerySpec(
        graph_degree, ORACLE_GRAPH_DEGREE, ["G3", "A7", "T4"]
    ),
    "pagerank_top": QuerySpec(pagerank_top, None, ["G2", "T6"], bench=True),
}
