package graft.jobs

import graft.QueryDef
import graft.util.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank over a host-link graph — the canonical consumer of the
  * edge tables the reference's pipeline produces (wat_extract_links →
  * hostlinks_to_graph feed exactly this kind of webgraph analysis;
  * rank is also the standard crawl-prioritization / quality-weighting
  * signal in a training-data pipeline).
  *
  * Pure DataFrame iteration: per round, one join of ranks to edges on
  * the source key and one aggregation on the target key — both shuffles
  * are keyed on node ids, so the plan scales with edge count. Dangling
  * mass (sinks) is redistributed uniformly each round, keeping total
  * rank ≈ 1.
  */
object HostRank {

  /** edges: (s, t) of any node type. Returns (node, rank). */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("s"), col("t")).dropDuplicates().cache()
    val nodes = e.select(col("s").as("node"))
      .union(e.select(col("t").as("node"))).distinct().cache()
    val n = nodes.count().toDouble
    val outDeg = e.groupBy(col("s").as("node")).agg(count(lit(1)).as("deg")).cache()

    // per-round materialization breaks the two-branch (dangling +
    // contribs) recompute fanout; the every-few-rounds reliable
    // checkpoint bounds lineage and survives executor loss without
    // paying a full ranks disk-write per round
    val ckpt = new graft.util.Checkpoints.IterationCheckpointer(
      interval = spark.conf.getOption("spark.graft.checkpointInterval").map(_.toInt).getOrElse(1))
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val withDeg = ranks.join(outDeg, Seq("node"), "left")
      // dangling nodes (no out-edges) spread their rank uniformly. The
      // dangling mass stays IN the plan as a broadcast 1-row aggregate
      // (no driver .head() round-trip), so each iteration is a single
      // materializing action.
      val danglingMass = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
      val contribs = withDeg.filter(col("deg").isNotNull)
        .join(e, col("node") === col("s"))
        .select(col("t").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_rank"))
      ranks = ckpt.next(
        nodes.join(contribs, Seq("node"), "left")
          .crossJoin(broadcast(danglingMass))
          .select(col("node"),
            (lit((1.0 - damping) / n) + lit(damping / n) * col("dm") +
              lit(damping) * coalesce(col("in_rank"), lit(0.0))).as("rank")))
    }
    // final ranks are materialized by the checkpointer — release the
    // per-call graph caches so repeated invocations in one session
    // (bench runs, notebooks) don't accumulate storage-memory leaks
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    outDeg.unpersist(blocking = false)
    ranks
  }

  /** Registered query: rank the customer→supplier order graph (a stand-in
    * host graph derived from the test tables), top 20.
    */
  val hostRank: QueryDef = QueryDef(
    "graph_pagerank",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      // long node ids shuffle far cheaper than string keys; prefix only
      // for display (customers < 1e6 <= suppliers)
      val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("s"), (col("l_suppkey") + 1000000L).as("t"))
      pageRank(edges, iters = 3)
        .orderBy(col("rank").desc, col("node"))
        .limit(20)
        .select(
          when(col("node") < 1000000L, concat(lit("c"), col("node")))
            .otherwise(concat(lit("s"), col("node") - 1000000L)).as("node"),
          round(col("rank"), 6).as("rank"))
    },
    // DuckDB mirrors the iteration as a recursive CTE: the recursive term
    // sees exactly the previous iteration's working table, which IS the
    // per-round DataFrame semantics above (uniform init, dangling mass
    // redistributed, 3 updates). Hash-matching at 6dp across engines
    // despite different summation orders — rank magnitudes (~1e-2) leave
    // ulp-level differences far below the rounding quantum.
    Some("""WITH RECURSIVE
      edges AS (SELECT DISTINCT o_custkey AS s, l_suppkey + 1000000 AS t
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      nodes AS (SELECT DISTINCT node FROM
        (SELECT s AS node FROM edges UNION ALL SELECT t AS node FROM edges)),
      deg AS (SELECT s AS node, COUNT(*) AS deg FROM edges GROUP BY s),
      params AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
      pr(iter, node, rank) AS (
        SELECT 0, node, 1.0 / (SELECT n FROM params) FROM nodes
        UNION ALL
        SELECT p.iter + 1, p.node,
          0.15 / (SELECT n FROM params)
          + 0.85 / (SELECT n FROM params) *
            (SELECT coalesce(SUM(c.rank), 0) FROM pr c
             WHERE NOT EXISTS (SELECT 1 FROM deg d WHERE d.node = c.node))
          + 0.85 * coalesce((SELECT SUM(c2.rank / d2.deg)
              FROM pr c2 JOIN deg d2 ON c2.node = d2.node
              JOIN edges e ON e.s = c2.node
              WHERE e.t = p.node), 0)
        FROM pr p WHERE p.iter < 3
      ),
      final AS (SELECT node, rank FROM pr WHERE iter = 3
                ORDER BY rank DESC, node LIMIT 20)
      SELECT CASE WHEN node < 1000000 THEN 'c' || CAST(node AS VARCHAR)
                  ELSE 's' || CAST(node - 1000000 AS VARCHAR) END AS node,
             round(rank, 6) AS rank
      FROM final"""))
}
