package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: each module contributes `Seq[QueryDef]`; SQL-expressible
  * queries carry a DuckDB oracle, LSH/ANN pipelines get the rows-only check
  * plus ScalaTest coverage.
  */
object SparkEntry {

  /** Every oracled query is registered through [[QueryDef.ordered]]: a
    * terminal all-columns sort on the Spark side and the matching
    * `ORDER BY ALL` on the DuckDB side, so the row order the driver
    * hashes is a pure function of the data (CORRECTNESS_r06's one red
    * row was an output-order/rounding hazard of exactly this kind).
    */
  val allDefs: Seq[QueryDef] = rawDefs.map {
    case d if d.oracle.isDefined || d.oracleGen.isDefined => QueryDef.ordered(d)
    case d => d
  }

  private def rawDefs: Seq[QueryDef] =
    operators.Relational.all ++
      operators.AsOfJoinOps.all ++
      operators.SeriesOps.all ++
      operators.LayoutOps.all ++
      operators.DataQuality.all ++
      operators.TextOps.all ++
      operators.HeavyHitters.all ++
      operators.Decontam.all ++
      operators.Curation.all ++
      operators.TextClassifier.all ++
      operators.NgramLm.all ++
      operators.Dsir.all ++
      operators.SeqPack.all ++
      operators.Pipeline.all ++
      text.InvertedIndex.all ++
      dedup.Dedup.all ++
      dedup.BloomDedup.all ++
      dedup.EditDedup.all ++
      vector.VectorOps.all ++
      vector.PqOps.all ++
      vector.QuantOps.all ++
      vector.HybridOps.all ++
      vector.FeatureEmbed.all ++
      vector.OpqOps.all ++
      vector.SemDedup.all ++
      vector.KMeansOps.all ++
      vector.PcaOps.all ++
      media.MediaOps.all ++
      media.ImageDedup.all ++
      ops.WarcFixtureQueries.all ++
      streaming.StreamQueries.all ++
      Seq(jobs.HostRank.hostRank, jobs.HostRank.graphHits,
        jobs.HostRank.hostRankPersonalized, jobs.HostRank.hostRankWeighted)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql), _) => n -> sql }.toMap

  /** The full oracle map for a concrete (session, sf dir): the static
    * SQL plus every data-dependent oracle the generators can produce
    * (trained artifacts embedded as literals — see QueryDef.oracleGen).
    * A generator failure downgrades that query to the rows-only check
    * instead of failing the dump.
    */
  def oracleSqlFor(spark: SparkSession, sfDir: String,
                   only: Option[Set[String]] = None): Map[String, String] =
    oracleSql ++ allDefs.flatMap {
      case QueryDef(n, _, _, Some(gen)) if only.forall(_.contains(n)) =>
        try Some(n -> gen(spark, sfDir))
        catch {
          case e: Throwable =>
            System.err.println(s"[verify] oracle gen for $n failed: ${e.getMessage}")
            None
        }
      case _ => None
    }.toMap
}
