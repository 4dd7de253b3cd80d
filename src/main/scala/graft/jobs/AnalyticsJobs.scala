package graft.jobs

import graft.ops.{Extractors, SurtHost, WatLinks}
import graft.warc.{Predicates, WarcRecord, WarcSource}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The concrete analytics jobs of the reference (SURVEY §0.3), as thin
  * compositions over the ops library.
  */

/** server_count.py — count distinct Server HTTP headers. */
object ServerCountJob extends CCJob[String]()(org.apache.spark.sql.Encoders.STRING) {
  val name = "server_count"
  def extract(path: String, rec: WarcRecord, c: JobCounters): Iterator[(String, Long)] =
    Extractors.serverNames(rec)
}

/** html_tag_count.py — histogram of HTML tag names. */
object HtmlTagCountJob extends CCJob[String]()(org.apache.spark.sql.Encoders.STRING) {
  val name = "html_tag_count"
  def extract(path: String, rec: WarcRecord, c: JobCounters): Iterator[(String, Long)] = {
    // the reference skips non-response records silently and counts only
    // HTML-less *responses* (html_tag_count.py's records-non-HTML) —
    // request/metadata records must not inflate the counter
    if (Predicates.isResponse(rec) && !Predicates.isHtml(rec)) c.recordsNonHtml.add(1)
    Extractors.htmlTagCounts(rec)
  }
}

/** server_ip_address.py — (host, ip) pair counts. */
object ServerIpJob extends CCJob[(String, String)]()(
    org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.STRING)) {
  val name = "server_ip_address"
  def extract(path: String, rec: WarcRecord, c: JobCounters): Iterator[((String, String), Long)] =
    Extractors.hostIpPairs(rec)
}

/** word_count.py — word → (tf, df) over WET text records. */
object WordCountJob {
  val name = "word_count"

  def aggregate(spark: SparkSession, records: Dataset[(String, WarcRecord)]): DataFrame = {
    import spark.implicits._
    records.flatMap { case (_, r) => Extractors.wordCounts(r) }
      .map { case (w, (tf, df)) => (w, tf, df) }
      .toDF("word", "tf", "df")
      .groupBy("word")
      .agg(struct(sum("tf").as("tf"), sum("df").as("df")).as("val"))
  }
}

/** Anchor-text corpus: link text aggregated per TARGET — the free
  * query/description training signal web graphs carry (anchor text
  * describes the page it points to; the ORCAS-style recipe). One
  * flatMap over the archive, one keyed aggregation; the per-target
  * SURT host rides along so host-level rollups need no re-parse.
  */
object AnchorTextJob {
  val name = "anchor_text_corpus"

  def aggregate(spark: SparkSession, records: Dataset[(String, WarcRecord)]): DataFrame = {
    import spark.implicits._
    records.flatMap { case (_, r) =>
      Extractors.anchorTexts(r).flatMap { case (target, text) =>
        SurtHost.surtHostFromUrl(target).map(h => (target, h, text))
      }
    }.toDF("target_url", "target_host", "anchor")
      .groupBy("target_url", "target_host", "anchor")
      .agg(count(lit(1)).as("n"))
  }
}

/** sitemaps_from_robotstxt.py — sitemap URL → announcing hosts. */
object SitemapsJob {
  val name = "sitemaps_from_robotstxt"

  def aggregate(spark: SparkSession, records: Dataset[(String, WarcRecord)]): DataFrame = {
    import spark.implicits._
    records.flatMap { case (_, r) => Extractors.sitemapUrls(r) }
      .toDF("sitemap_url", "host")
      .groupBy("sitemap_url")
      .agg(collect_list("host").as("hosts"))
  }
}

/** wat_extract_links.py — host-level link edges (WAT + redirects + robots). */
object ExtractHostLinksJob {
  val name = "wat_extract_links"

  /** S12: optionally persist the raw extraction to an intermediate table
    * and continue from it — job recovery (wat_extract_links.py:298-312).
    */
  def edgesWithCheckpoint(spark: SparkSession, records: Dataset[(String, WarcRecord)],
                          checkpointPath: String): DataFrame = {
    val raw = edges(spark, records)
    raw.write.mode("overwrite").parquet(checkpointPath)
    spark.read.parquet(checkpointPath)
  }

  def edges(spark: SparkSession, records: Dataset[(String, WarcRecord)],
            counters: Option[JobCounters] = None): DataFrame = {
    import spark.implicits._
    // per-source-type record counts + non-unique link pairs, the
    // reference's ExtractLinksJob accumulator set
    // (wat_extract_links.py:257-268)
    def counted(it: Iterator[(String, String)]): Iterator[(String, String)] =
      counters match {
        case Some(c) => it.map { e => c.linkCount.add(1); e }
        case None => it
      }
    records.flatMap { case (path, r) =>
      if (Predicates.isRobotsTxtArchive(path)) {
        counters.foreach(_.responseRobotsTxt.add(1))
        counted(Extractors.sitemapHostEdges(r))
      } else if (Predicates.isWatJson(r)) {
        counters.foreach(_.responseWat.add(1))
        counted(WatLinks.hostEdges(r))
      } else {
        if (Predicates.isResponse(r)) counters.foreach { c =>
          c.recordsResponse.add(1)
          if (Predicates.isRedirect(r)) c.responseRedirect.add(1)
          else if (!Predicates.isHtml(r)) c.recordsNonHtml.add(1)
        }
        // plain WARC responses: redirect Location edges + raw-HTML links
        counted((Extractors.redirectLinks(r) ++ Extractors.htmlLinks(r))
          .flatMap { case (f, t) =>
            for {
              sh <- graft.ops.SurtHost.surtHostFromUrl(f)
              th <- graft.ops.SurtHost.surtHostFromUrl(t)
            } yield (sh, th)
          })
      }
    }.toDF("s", "t")
      .dropDuplicates()
      .sortWithinPartitions("s", "t")
  }
}

/** hostlinks_to_graph.py — edge list → integer-ID vertex/edge tables.
  *
  * Two ID-assignment modes, mirroring the reference exactly
  * (hostlinks_to_graph.py:96-111):
  *  - single-partition: coalesce(1) + monotonically_increasing_id
  *    (contiguous 0..n-1 only because of the single partition);
  *  - scalable: sortBy + zipWithIndex over N partitions (contiguous long
  *    IDs without a single-node bottleneck) — the 100 TB path.
  */
object HostGraphBuilder {

  final case class Graph(vertices: DataFrame, edges: DataFrame)

  /** Full build surface of the reference (hostlinks_to_graph.py:19-44):
    * extra edge tables merged before ID assignment (`--add_input`),
    * separate normalize / validate passes, and ID-table reuse
    * (`--vertex_ids`) so an incremental graph build keeps vertex ids
    * STABLE across crawls — edges joined against a reused mapping drop
    * hosts unseen in it, exactly the reference's inner-join semantics.
    */
  def build(spark: SparkSession, edges0: DataFrame,
            vertexPartitions: Int = 1,
            validateHosts: Boolean = false,
            normalizeHosts: Boolean = false,
            existingIds: Option[DataFrame] = None,
            addInputs: Seq[DataFrame] = Nil): Graph = {
    import spark.implicits._
    val normalize = udf((h: String) =>
      graft.ops.SurtHost.reverseHostNormalize(h).orNull)
    val isValid = udf((h: String) => graft.ops.SurtHost.reverseHostIsValid(h))

    val edges =
      if (addInputs.isEmpty) edges0
      else addInputs.foldLeft(edges0)(_ union _)
        .dropDuplicates().sortWithinPartitions("s", "t")

    val ids: DataFrame = existingIds.getOrElse {
      var names = edges.select(col("s").as("name"))
        .union(edges.select(col("t").as("name")))
        .distinct()
      // the pre-existing `validateHosts` convenience implies normalize
      // (normalization must run first or IDN hosts always fail validation)
      if (normalizeHosts || validateHosts)
        names = names.withColumn("name", normalize(col("name")))
          .na.drop().distinct()
      if (validateHosts)
        names = names.filter(isValid(col("name")))

      if (vertexPartitions == 1)
        names.coalesce(1).sort("name")
          .withColumn("id", monotonically_increasing_id())
      else {
        val rdd = names.as[String].rdd
          .sortBy(identity, ascending = true, numPartitions = vertexPartitions)
          .zipWithIndex()
        spark.createDataFrame(rdd).toDF("name", "id")
      }
    }

    buildFromIds(edges, ids)
  }

  private def buildFromIds(edges: DataFrame, ids: DataFrame): Graph = {
    val idsS = ids.select(col("name").as("s"), col("id").as("s_id"))
    val idsT = ids.select(col("name").as("t"), col("id").as("t_id"))
    val edgeIds = edges.join(idsS, "s").join(idsT, "t")
      .select(col("s_id").as("s"), col("t_id").as("t"))
      .filter(col("s") =!= col("t")) // self-loops dropped post-ID (O7)
      .dropDuplicates()
      .sortWithinPartitions("s", "t")
    Graph(ids.select("id", "name"), edgeIds)
  }

  /** Adjacency-list text dump: one line per source vertex,
    * `s \t t1 t2 t3…` with targets ascending — the format the
    * reference left as a TODO (hostlinks_to_graph.py:165 "save as
    * adjacency list"; it is what webgraph compression toolchains
    * ingest). One shuffle on s; target lists sort inside the
    * aggregation buffer, never globally.
    */
  def writeAdjacencyList(g: Graph, outDir: String, partitions: Int = 2): Unit = {
    g.edges.groupBy(col("s"))
      .agg(array_sort(collect_list(col("t"))).as("ts"))
      .select(concat_ws("\t", col("s"), concat_ws("\t", col("ts"))))
      .coalesce(partitions)
      .write.mode("overwrite").option("compression", "gzip")
      .text(s"$outDir/adjacency_txt")
  }

  /** S10: tab-separated gzip text dumps of the vertex/edge tables
    * (hostlinks_to_graph.py:115-118, 162-165) — the webgraph-tools
    * interchange format.
    */
  def writeTextDumps(g: Graph, outDir: String, partitions: Int = 2): Unit = {
    g.vertices.select(concat_ws("\t", col("id"), col("name")))
      .coalesce(partitions)
      .write.mode("overwrite").option("compression", "gzip")
      .text(s"$outDir/vertices_txt")
    g.edges.select(concat_ws("\t", col("s"), col("t")))
      .coalesce(partitions)
      .write.mode("overwrite").option("compression", "gzip")
      .text(s"$outDir/edges_txt")
  }
}

/** linkmap2parquet.py — import tab-separated edge dumps (P14/S10 inverse). */
object LinkmapImport {
  def fromText(spark: SparkSession, path: String): DataFrame = {
    spark.read.text(path)
      .select(split(col("value"), "\t").as("parts"))
      .select(col("parts").getItem(0).as("s"), col("parts").getItem(1).as("t"))
      .na.drop()
      .dropDuplicates()
      .sortWithinPartitions("s", "t")
  }
}
