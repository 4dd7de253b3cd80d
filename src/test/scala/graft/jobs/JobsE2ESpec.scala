package graft.jobs

import graft.warc.{Fixtures, WarcSource, WarcWriter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum}
import org.scalatest.funsuite.AnyFunSuite

/** Pattern B of the reference test suite: full pipelines through a local
  * Spark session (test_sitemaps_from_robotstxt.py:231-362).
  */
class JobsE2ESpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  lazy val (warcPath, offsets) = {
    val tmp = java.nio.file.Files.createTempFile("e2e", ".warc.gz").toString
    val off = WarcWriter.writeFile(tmp, Fixtures.all)
    (tmp, off)
  }

  lazy val manifest: String = {
    val m = java.nio.file.Files.createTempFile("manifest", ".txt")
    java.nio.file.Files.writeString(m, warcPath + "\n")
    m.toString
  }

  test("ServerCount end-to-end (SURVEY §7.2 minimum slice)") {
    val counters = JobCounters(spark)
    val records = WarcSource.fromManifest(spark, manifest, 2, Some(counters.recordsFailed))
    val df = ServerCountJob.aggregate(spark, records, counters)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("Apache/2.4") == 1L)
    assert(got("nginx") == 1L)
    // responseNoServer + responseRedirect + robotsTxt (no Server header)
    assert(got(graft.ops.Extractors.NoServer) == 3L)
    assert(counters.recordsProcessed.value == Fixtures.all.length)
    assert(counters.recordsFailed.value == 0)
  }

  test("anchor_text_corpus aggregates link text per target") {
    val dir = java.nio.file.Files.createTempDirectory("anchor").toString
    JobRunner.run(spark, JobCli("anchor_text_corpus", manifest, s"$dir/out", outParts = 1))
    val rows = spark.read.parquet(s"$dir/out").collect()
    // Fixtures.responseHtml carries <a href="/page2">link</a>
    val hit = rows.find(_.getAs[String]("target_url") == "https://www.example.com/page2")
    assert(hit.isDefined, s"missing anchor row in ${rows.mkString(";")}")
    assert(hit.get.getAs[String]("anchor") == "link")
    assert(hit.get.getAs[String]("target_host") == "com.example")
    assert(hit.get.getAs[Long]("n") == 1L)
  }

  test("WordCount aggregation: tf summed, df counts docs") {
    val records = WarcSource.fromPaths(spark, Seq(warcPath), 2)
    val df = WordCountJob.aggregate(spark, records)
    val got = df.collect().map(r => r.getString(0) ->
      (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1))).toMap
    assert(got("hello") == ((3L, 1L)))
  }

  test("ranged fetch: coordinates → single records with charset forwarding") {
    import spark.implicits._
    val coords = offsets.zip(Fixtures.all).map { case ((off, len), r) =>
      WarcSource.RecordCoord(r.targetUri.getOrElse(""), warcPath, off, len,
        Some("utf-8"))
    }
    val ds = spark.createDataset(coords)
    val fetched = WarcSource.fetchRecords(spark, ds).collect()
    assert(fetched.length == Fixtures.all.length)
    val byUrl = fetched.toMap
    assert(byUrl.keySet == Fixtures.all.flatMap(_.targetUri).toSet)
    assert(fetched.forall(_._2.headers.contains("WARC-Identified-Content-Charset")))
  }

  test("host graph: both ID modes give contiguous ids and drop self-loops") {
    import spark.implicits._
    val edges = Seq(
      ("com.a", "com.b"), ("com.a", "com.b"), // dup
      ("com.b", "com.c"), ("com.c", "com.c"), // self-loop
      ("com.isolated", "com.isolated")        // isolated via self-loop only
    ).toDF("s", "t")

    for (parts <- Seq(1, 3)) {
      val g = HostGraphBuilder.build(spark, edges, vertexPartitions = parts)
      val verts = g.vertices.collect().map(r => r.getString(1) -> r.getLong(0)).toMap
      assert(verts.keySet == Set("com.a", "com.b", "com.c", "com.isolated"))
      // contiguous 0..n-1, sorted by name
      assert(verts.values.toSeq.sorted == Seq(0L, 1L, 2L, 3L))
      assert(verts("com.a") < verts("com.b"))
      val e = g.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(e == Set((verts("com.a"), verts("com.b")), (verts("com.b"), verts("com.c"))))
    }
  }

  test("host graph: vertex-id reuse keeps ids stable; add_input merges graphs") {
    import spark.implicits._
    val e1 = Seq(("com.a", "com.b"), ("com.b", "com.c")).toDF("s", "t")
    val g1 = HostGraphBuilder.build(spark, e1, vertexPartitions = 2)
    val ids1 = g1.vertices.collect().map(r => r.getString(1) -> r.getLong(0)).toMap

    // a later crawl adds an edge; reusing the id table keeps old ids
    // stable and (reference inner-join semantics) drops unseen hosts
    val e2 = Seq(("com.a", "com.c"), ("com.a", "com.new")).toDF("s", "t")
    val g2 = HostGraphBuilder.build(spark, e2, existingIds = Some(g1.vertices))
    val edges2 = g2.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges2 == Set((ids1("com.a"), ids1("com.c")))) // com.new dropped
    assert(g2.vertices.collect().map(r => r.getString(1) -> r.getLong(0)).toMap == ids1)

    // --add_input merges edge tables before id assignment
    val g3 = HostGraphBuilder.build(spark, e1, addInputs = Seq(e2))
    val names3 = g3.vertices.collect().map(_.getString(1)).toSet
    assert(names3 == Set("com.a", "com.b", "com.c", "com.new"))
    assert(g3.edges.count() == 4)
  }

  test("adjacency-list dump: one sorted line per source vertex") {
    import spark.implicits._
    val e = Seq(("com.a", "com.c"), ("com.a", "com.b"), ("com.b", "com.c"))
      .toDF("s", "t")
    val g = HostGraphBuilder.build(spark, e)
    val dir = java.nio.file.Files.createTempDirectory("adj").toString
    HostGraphBuilder.writeAdjacencyList(g, dir, 1)
    val ids = g.vertices.collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    val lines = spark.read.text(s"$dir/adjacency_txt")
      .collect().map(_.getString(0)).toSet
    assert(lines.contains(s"${ids("com.a")}\t${ids("com.b")}\t${ids("com.c")}"))
    assert(lines.contains(s"${ids("com.b")}\t${ids("com.c")}"))
  }

  test("host graph validation drops invalid TLDs and normalizes IDN") {
    import spark.implicits._
    val edges = Seq(
      ("com.good", "invalidtld.bad"),
      ("de.müller", "com.good")).toDF("s", "t")
    val g = HostGraphBuilder.build(spark, edges, vertexPartitions = 1, validateHosts = true)
    val names = g.vertices.collect().map(_.getString(1)).toSet
    assert(names == Set("com.good", "de.xn--mller-kva"))
  }

  test("ExtractHostLinksJob combines WAT, redirect, and robots sources") {
    val counters = JobCounters(spark)
    val records = WarcSource.fromPaths(spark, Seq(warcPath), 2)
    val df = ExtractHostLinksJob.edges(spark, records, Some(counters))
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.contains(("com.example", "net.example.cdn"))) // WAT link
    assert(got.contains(("org.example.old", "org.example.old"))) // redirect self-host
    // per-job accumulators (wat_extract_links.py:257-288 parity)
    assert(counters.responseWat.value == 1)      // watJson fixture
    assert(counters.responseRedirect.value == 1) // responseRedirect fixture
    assert(counters.recordsResponse.value == 4)  // all response-typed fixtures
    assert(counters.linkCount.value >= got.size)
    assert(counters.summary.contains("response records WAT = 1"))
  }

  test("HtmlTagCountJob counts non-HTML among response records only") {
    val counters = JobCounters(spark)
    val records = WarcSource.fromPaths(spark, Seq(warcPath), 2)
    HtmlTagCountJob.aggregate(spark, records, counters).collect()
    // reference semantics (html_tag_count.py): non-response records
    // (wetText conversion, watJson metadata) are skipped silently;
    // robotsTxt is the one response record that is not HTML
    assert(counters.recordsNonHtml.value == 1)
  }

  test("jobs chain by table name: index_export CTAS feeds index_word_count") {
    val dir = java.nio.file.Files.createTempDirectory("chain").toString
    CCIndexWarcJob.buildIndex(spark, Seq(warcPath), s"$dir/indexed", s"$dir/ccindex")

    // idempotence across JVMs: a prior run's managed-table location is
    // orphaned once the in-memory catalog dies — clear both
    spark.sql("DROP TABLE IF EXISTS coords_e2e")
    val orphan = new java.io.File(
      java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir") + "/coords_e2e").getPath)
    if (orphan.exists())
      org.apache.commons.io.FileUtils.deleteDirectory(orphan)

    // job 1: SQL over the index → managed table (saveAsTable, the
    // reference's default output mode, sparkcc.py:219-225)
    JobRunner.run(spark, JobCli("index_export", s"$dir/ccindex", "coords_e2e",
      outParts = 1, query = Some(
        """SELECT url, warc_filename, warc_record_offset, warc_record_length
          FROM ccindex WHERE warc_type = 'response'""")))
    assert(spark.catalog.tableExists("coords_e2e"))
    assert(spark.table("coords_e2e").count() > 0)

    // job 2: the CTAS output feeds the fetch via --input_table_format
    // (the reference's chained workflow, sparkcc.py:569-607)
    val location = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("coords_e2e"))
      .location.toString
    JobRunner.run(spark, JobCli("index_word_count", location, s"$dir/wc",
      inParts = 2, inputTableFormat = Some("parquet")))
    val wc = spark.read.parquet(s"$dir/wc")
    val words = wc.collect().map(r => r.getString(0)).toSet
    assert(words.contains("hello"))
  }

  test("index_word_count honors --query and --table_schema JSON") {
    val dir = java.nio.file.Files.createTempDirectory("qschema").toString
    CCIndexWarcJob.buildIndex(spark, Seq(warcPath), s"$dir/indexed", s"$dir/ccindex")
    // user-supplied schema file (narrowed to the coordinate columns +
    // warc_type so the filter still resolves — sparkcc.py:489-497)
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("warc_filename", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("warc_record_offset", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("warc_record_length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("warc_type", org.apache.spark.sql.types.StringType)
    )).json
    val schemaFile = s"$dir/schema.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(schemaFile), schemaJson)
    JobRunner.run(spark, JobCli("index_word_count", s"$dir/ccindex", s"$dir/wc",
      inParts = 2,
      query = Some("""SELECT url, warc_filename, warc_record_offset, warc_record_length
        FROM ccindex WHERE warc_type = 'response' AND url LIKE '%example.com%'"""),
      tableSchema = Some(schemaFile)))
    val words = spark.read.parquet(s"$dir/wc").collect().map(_.getString(0)).toSet
    assert(words.contains("hello"))
  }

  test("CLI parsing: flags, repeated options, orc compression fixup") {
    val cli = JobCli.parse(Array("server_count", "in.txt", "out_tbl",
      "--num_input_partitions", "16", "--output_format", "orc",
      "--output_option", "a=1", "--output_option", "b=x=y",
      "--input_table_option", "header=true"))
    assert(cli.inParts == 16 && cli.outputFormat == "orc")
    assert(cli.outputOptions == Map("a" -> "1", "b" -> "x=y"))
    assert(cli.inputTableOptions == Map("header" -> "true"))
    val conv = JobCli.parse(Array("md5sum", "in.txt", "/out",
      "--local_temp_dir", "/scratch", "--log_level", "WARN", "--spark_profiler"))
    assert(conv.localTempDir.contains("/scratch"))
    assert(conv.logLevel.contains("WARN") && conv.sparkProfiler)
    // positional back-compat
    val pos = JobCli.parse(Array("server_count", "in.txt", "/out", "4", "2"))
    assert(pos.inParts == 4 && pos.outParts == 2)
    assert(JobConfig.effectiveCompression("orc", "gzip") == "zlib")
    assert(JobConfig.effectiveCompression("parquet", "gzip") == "gzip")
    assert(JobConfig.isPathOutput("/out") && JobConfig.isPathOutput("s3a://b/p"))
    assert(!JobConfig.isPathOutput("out_tbl"))
  }

  test("stream_windows durable sink: restart resumes from checkpoint, no reprocess") {
    val dir = java.nio.file.Files.createTempDirectory("streamjob").toString
    val input = s"$dir/events"
    def addEvents(offset: Int): Unit =
      spark.range(100).selectExpr(s"id + $offset AS event_id",
        s"(id + $offset) * 1000000000 AS ts", "id % 5 AS user_id",
        "'click' AS event_type", "1.0 AS value", "'{}' AS props")
        .coalesce(1).write.mode("append").parquet(input)
    def offsetBatches: Int = {
      val l = new java.io.File(s"$dir/out/_checkpoint/offsets").list()
      if (l == null) 0 else l.count(!_.startsWith("."))
    }

    addEvents(0)
    JobRunner.run(spark, JobCli("stream_windows", input, s"$dir/out", outParts = 1))
    assert(spark.read.parquet(s"$dir/out/data").count() > 0)
    val b1 = offsetBatches

    // restart with no new input: offsets untouched — nothing reprocessed
    JobRunner.run(spark, JobCli("stream_windows", input, s"$dir/out", outParts = 1))
    assert(offsetBatches == b1, "restart without new data must not add a batch")

    // new input file: exactly ONE incremental batch; counts accumulate
    // through the recovered state store (100 + 100 events total)
    addEvents(100)
    JobRunner.run(spark, JobCli("stream_windows", input, s"$dir/out", outParts = 1))
    assert(offsetBatches == b1 + 1, "resumed run should process only the new file")
    val total = spark.read.parquet(s"$dir/out/data")
      .agg(sum(col("n"))).head().getLong(0)
    assert(total == 200, s"state must accumulate across restarts, got $total")
  }

  test("curate job writes the kept corpus plus accounting that reconciles") {
    val sf = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(sf.isDefined)
    val out = java.nio.file.Files.createTempDirectory("curate").toString
    JobRunner.run(spark, JobCli("curate", s"${sf.get}/documents.parquet", out, outParts = 2))
    val kept = spark.read.parquet(s"$out/kept")
    val acc = spark.read.parquet(s"$out/accounting")
    // the written corpus is full document rows, one per kept doc
    assert(kept.columns.toSet == Set("doc_id", "text", "lang", "source", "n_chars"))
    val keptTotal = acc.agg(sum(col("n_kept"))).head().getLong(0)
    assert(kept.count() == keptTotal, "kept corpus must reconcile with accounting")
    assert(keptTotal > 0)
    // the accounting table matches the registered oracle query exactly
    val fromQuery = graft.SparkEntry.queries("pipeline_curation")(spark, sf.get)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val fromJob = acc.collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(fromJob == fromQuery)
  }

  test("bm25 index build + probe CLI reproduces the registered query") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).exists())
    val base = java.nio.file.Files.createTempDirectory("bm25cli").toString
    JobRunner.run(spark, JobCli("bm25_index_build", s"$sf/documents.parquet", s"$base/idx"))
    JobRunner.run(spark, JobCli("bm25_index_probe", s"$base/idx", s"$base/out",
      outParts = 1, query = Some("join,vector,filter,dup")))
    val viaCli = spark.read.parquet(s"$base/out/topk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val direct = graft.SparkEntry.queries("text_bm25")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaCli == direct)
    assert(viaCli.nonEmpty)
  }

  test("crawl_diff CLI diffs two real snapshot dirs") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("cdiff").toString
    Seq(
      (1L, "alpha text", "en", "sA", 10L),
      (2L, "beta text", "en", "sA", 9L),
      (3L, "gone text", "en", "sB", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$base/a")
    Seq(
      (1L, "alpha text", "en", "sA", 10L),   // unchanged
      (2L, "beta text v2", "en", "sA", 12L), // changed
      (4L, "new text", "en", "sB", 8L))      // added; doc 3 removed
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$base/b")
    JobRunner.run(spark, JobCli("crawl_diff", s"$base/a", s"$base/out",
      outParts = 1, addInputs = Seq(s"$base/b")))
    val status = spark.read.parquet(s"$base/out/status")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(status == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    val summary = spark.read.parquet(s"$base/out/summary")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(summary(("sA", "changed")) == 1L && summary(("sB", "added")) == 1L)
  }

  test("curate --badwords and --min_entropy filter the kept corpus") {
    val sf = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(sf.isDefined)
    val base = java.nio.file.Files.createTempDirectory("curateF").toString
    JobRunner.run(spark, JobCli("curate", s"${sf.get}/documents.parquet",
      s"$base/plain", outParts = 1))
    val plain = spark.read.parquet(s"$base/plain/kept")
    val nPlain = plain.count()
    // pick a word present in some kept doc so the filter has bite
    val word = plain
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.GraftFunctions.tokens(col("text"))).as("w"))
      .groupBy(col("w")).count().orderBy(col("count")).head().getString(0)
    JobRunner.run(spark, JobCli("curate", s"${sf.get}/documents.parquet",
      s"$base/filtered", outParts = 1,
      badwords = Seq(word, "nonexistentzzz"), minEntropy = Some(1.0)))
    val filtered = spark.read.parquet(s"$base/filtered/kept")
    val nFiltered = filtered.count()
    assert(nFiltered < nPlain, s"badwords '$word' should drop at least one doc")
    // no surviving doc contains the blocked word or scores below the gate
    assert(filtered.filter(
      org.apache.spark.sql.functions.arrays_overlap(
        graft.functions.GraftFunctions.tokens(col("text")),
        org.apache.spark.sql.functions.lit(Array(word)))).count() == 0)
    assert(graft.operators.TextOps.docEntropy(filtered)
      .filter(col("entropy") < 1.0).count() == 0)
  }

  test("warc_to_documents bridges archives into the curation suite") {
    val dir = java.nio.file.Files.createTempDirectory("w2d").toString
    JobRunner.run(spark, JobCli("warc_to_documents", manifest, s"$dir/docs", outParts = 1))
    val docs = spark.read.parquet(s"$dir/docs")
    // exact documents-table shape (TESTDATA.md) so downstream operators apply as-is
    assert(docs.columns.toSet == Set("doc_id", "text", "lang", "source", "n_chars"))
    val rows = docs.collect()
    // fixture set has exactly the HTML response records as extractable docs
    assert(rows.length == Fixtures.all.count(r =>
      graft.ops.Extractors.htmlToText(r).exists(_.trim.nonEmpty)))
    rows.foreach { r =>
      assert(r.getAs[String]("text").nonEmpty)
      assert(r.getAs[Long]("n_chars") == r.getAs[String]("text").length.toLong)
    }
    // --main_content applies the boilerplate-removal extractor: still the
    // documents-table shape, never MORE text than the full extraction
    // (HtmlTextSpec covers the block-classification semantics)
    JobRunner.run(spark, JobCli("warc_to_documents", manifest, s"$dir/docs_main",
      outParts = 1, mainContent = true))
    val mainDocs = spark.read.parquet(s"$dir/docs_main")
    assert(mainDocs.columns.toSet == Set("doc_id", "text", "lang", "source", "n_chars"))
    assert(mainDocs.count() <= rows.length)
    // doc_id is deterministic across re-runs (stable dedup decisions)
    JobRunner.run(spark, JobCli("warc_to_documents", manifest, s"$dir/docs2", outParts = 1))
    val ids1 = rows.map(_.getAs[Long]("doc_id")).sorted.toSeq
    val ids2 = spark.read.parquet(s"$dir/docs2")
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(ids1 == ids2)
    // and the output chains directly into the curate job, with
    // --output_shards laying the kept corpus down as mixed shards
    JobRunner.run(spark, JobCli("curate", s"$dir/docs", s"$dir/curated", outParts = 1,
      outputShards = Some(4)))
    assert(spark.read.parquet(s"$dir/curated/accounting").count() > 0)
    val kept = spark.read.parquet(s"$dir/curated/kept").count()
    // the tiny WARC fixtures may keep nothing (quality gate); the shard
    // write must still have run (dir committed). ShardShuffleSpec covers
    // the populated-shards contract on the sf corpus.
    assert(new java.io.File(s"$dir/curated/shards").exists())
    if (kept > 0) {
      val shards = spark.read.parquet(s"$dir/curated/shards")
      assert(shards.count() == kept, "sharding must be a permutation of kept")
      assert(shards.select("shard").distinct().count() <= 4)
    }
  }

  test("curate --max_dup_frac drops span-duplicated docs, keeps short ones") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("curateD").toString
    // fixtures must clear the curate quality gate (≥20 tokens, ≥1 stop
    // word): docs 1 and 2 share a 60-token span → ~100% covered by
    // shared 50-gram windows; doc 3 is unique long text; doc 4 clears
    // quality but is too short for any 50-gram window (must be KEPT,
    // not judged)
    val shared = (1 to 20).flatMap(i => Seq("the", s"tok$i", "and")).mkString(" ")
    val unique = (1 to 30).flatMap(i => Seq("of", s"only$i", s"uniq$i")).mkString(" ")
    val tiny = "the tiny doc has just a few and simple words to keep " +
      "the quality gate happy with enough tokens overall here"
    Seq(
      (1L, shared, "en", "sA", 400L),
      (2L, shared + " tail2", "en", "sA", 410L),
      (3L, unique, "en", "sB", 800L),
      (4L, tiny, "en", "sB", 110L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$base/docs")
    JobRunner.run(spark, JobCli("curate", s"$base/docs", s"$base/out",
      outParts = 1, maxDupFrac = Some(0.5)))
    val kept = spark.read.parquet(s"$base/out/kept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L) && !kept.contains(2L),
      s"span-duplicated docs must drop, kept=$kept")
    assert(kept.contains(3L), "unique long doc must survive")
    assert(kept.contains(4L), "sub-window doc must be kept, not judged")
  }

  test("dedup_index_build → dedup_index_probe: cross-crawl incremental dedup") {
    import org.apache.spark.sql.functions.col
    val sfDir = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(sfDir.isDefined)
    val dir = java.nio.file.Files.createTempDirectory("dedupidx").toString
    val docs = spark.read.parquet(s"${sfDir.get}/documents.parquet")
    docs.filter(col("doc_id") % 10 < 7).write.parquet(s"$dir/crawl1")
    docs.filter(col("doc_id") % 10 >= 7).write.parquet(s"$dir/crawl2")
    JobRunner.run(spark, JobCli("dedup_index_build", s"$dir/crawl1", s"$dir/idx"))
    JobRunner.run(spark, JobCli("dedup_index_probe", s"$dir/crawl2", s"$dir/report",
      addInputs = Seq(s"$dir/idx")))
    // the fixture corpus has cross-split duplicated chunks (BloomDedupSpec
    // establishes this); the CLI chain must surface them
    val exact = spark.read.parquet(s"$dir/report/exact")
    assert(exact.columns.toSet == Set("doc_id", "source", "h"))
    assert(exact.count() > 0)
    // near-dup probe output has the signature-agreement schema; row count
    // depends on whether ≥0.5-Jaccard pairs straddle the split
    val near = spark.read.parquet(s"$dir/report/near")
    assert(near.columns.toSet == Set("new_id", "idx_id", "est_jaccard"))
  }

  test("decontam CLI: exact + near reports off one tokenize pass, clean kept/") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("decontam").toString
    val benchText = "the quick brown fox jumps over the lazy dog " +
      "while seven wizards brew hot tea at dawn near the old stone bridge"
    Seq(
      (1L, benchText, "en", "sA", 100L),                    // verbatim eval copy
      (2L, benchText + " plus an extra trailing clause appended here", // superset: near hit
        "en", "sA", 120L),
      (3L, "completely unrelated words about spacecraft navigation systems " +
        "and orbital mechanics calculations for deep space missions yes", "en", "sB", 110L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/train")
    Seq((100L, benchText, "en", "eval", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/eval")
    JobRunner.run(spark, JobCli("decontam", s"$dir/train", s"$dir/out",
      outParts = 1, addInputs = Seq(s"$dir/eval")))
    val exact = spark.read.parquet(s"$dir/out/exact")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(exact == Map(1L -> true, 2L -> true, 3L -> false))
    val near = spark.read.parquet(s"$dir/out/near")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(near(1L) && near(2L) && !near(3L))
    val kept = spark.read.parquet(s"$dir/out/kept").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
  }

  test("ann_index_build → ann_index_probe: persisted IVF index chain") {
    import org.apache.spark.sql.functions.col
    val sfDir = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(sfDir.isDefined)
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    val emb = s"${sfDir.get}/embeddings.parquet"
    JobRunner.run(spark, JobCli("ann_index_build", emb, s"$dir/idx"))
    // sqrt-N cells: 500 vectors → 22 centroids, cell-partitioned lists.
    // The CLI default protocol is manifest now — read protocol-aware,
    // and find the cell-partitioned base through the manifest
    val k = graft.vector.VectorOps.loadIvfIndex(spark, s"$dir/idx")
      .centroids.count()
    assert(k == math.round(math.sqrt(
      spark.read.parquet(emb).count().toDouble)))
    val mIdx = graft.util.ManifestCommit.current(
      spark.sessionState.newHadoopConf(), s"$dir/idx")
    val vectorsDir = mIdx.table("vectors").head
    assert(new java.io.File(s"$dir/idx/$vectorsDir").listFiles()
      .exists(_.getName.startsWith("cell=")))
    spark.read.parquet(emb).filter(col("vec_id") < 3)
      .write.parquet(s"$dir/queries")
    JobRunner.run(spark, JobCli("ann_index_probe", s"$dir/queries", s"$dir/out",
      addInputs = Seq(s"$dir/idx")))
    val topk = spark.read.parquet(s"$dir/out/topk").collect()
    assert(topk.map(_.getLong(0)).toSet == Set(0L, 1L, 2L))
    // each query gets a full ranked top-10 that excludes itself
    topk.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.length == 10)
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to 10))
      assert(rs.forall(r => r.getLong(1) != r.getLong(0)))
    }
  }

  test("ann_index_update appends a new batch into existing cells without retrain") {
    import org.apache.spark.sql.functions.col
    val sfDir = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .find(d => new java.io.File(d).exists())
    assume(sfDir.isDefined)
    val dir = java.nio.file.Files.createTempDirectory("annupd").toString
    val emb = spark.read.parquet(s"${sfDir.get}/embeddings.parquet")
    emb.filter(col("vec_id") % 2 === 0).write.parquet(s"$dir/batch1")
    emb.filter(col("vec_id") % 2 =!= 0).write.parquet(s"$dir/batch2")
    JobRunner.run(spark, JobCli("ann_index_build", s"$dir/batch1", s"$dir/idx"))
    val centroidsBefore = graft.vector.VectorOps
      .loadIvfIndex(spark, s"$dir/idx").centroids
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    JobRunner.run(spark, JobCli("ann_index_update", s"$dir/batch2", s"$dir/upd",
      addInputs = Seq(s"$dir/idx")))
    // centroids and codebooks untouched; stores now hold both batches
    val centroidsAfter = graft.vector.VectorOps
      .loadIvfIndex(spark, s"$dir/idx").centroids
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(centroidsAfter == centroidsBefore)
    // counts through the tiered read (base ∪ runs ∪ tail) — the batch
    // lands in the flat tails, the base cell files stay untouched
    val pq = graft.vector.PqOps.loadPqIndex(spark, s"$dir/idx")
    assert(pq.vectors.count() == emb.count())
    assert(pq.codes.count() == emb.count())
    // a RE-RUN of the same update command is a no-op: the CLI derives
    // the batch id from the input path, so the crashed-and-retried
    // ingest can never double-append (the r12 bug this closes)
    JobRunner.run(spark, JobCli("ann_index_update", s"$dir/batch2", s"$dir/upd2",
      addInputs = Seq(s"$dir/idx")))
    val pq2 = graft.vector.PqOps.loadPqIndex(spark, s"$dir/idx")
    assert(pq2.vectors.count() == emb.count(), "re-run update double-appended")
    assert(pq2.codes.count() == emb.count())
    // a probe now surfaces odd (new-batch) neighbors too
    emb.filter(col("vec_id") < 3).write.parquet(s"$dir/queries")
    JobRunner.run(spark, JobCli("ann_index_probe", s"$dir/queries", s"$dir/out",
      addInputs = Seq(s"$dir/idx")))
    val topk = spark.read.parquet(s"$dir/out/topk").collect()
    assert(topk.groupBy(_.getLong(0)).values.forall(_.length == 10))
    assert(topk.exists(_.getLong(1) % 2 != 0),
      "no new-batch vector ever surfaced in any top-10")
    // the compact arm folds the update tail; the probe is unchanged
    JobRunner.run(spark, JobCli("ann_index_compact", s"$dir/idx", s"$dir/cmp"))
    JobRunner.run(spark, JobCli("ann_index_probe", s"$dir/queries", s"$dir/out2",
      addInputs = Seq(s"$dir/idx")))
    val topk2 = spark.read.parquet(s"$dir/out2/topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(topk2 == topk.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet,
      "compaction changed CLI probe results")
    // --as_of_generation: probe the index AS IT STOOD at the build
    // (before the update batch and the compaction) through the CLI —
    // no odd (new-batch) vector may surface, and the result must be
    // identical to the API's AS-OF read of the same generation
    val conf = spark.sessionState.newHadoopConf()
    val buildGen = graft.util.ManifestCommit
      .atGeneration(conf, s"$dir/idx", 1L).gen // build publishes gen 1
    JobRunner.run(spark, JobCli("ann_index_probe", s"$dir/queries", s"$dir/asof",
      addInputs = Seq(s"$dir/idx"), asOfGeneration = Some(buildGen)))
    val topkAsOf = spark.read.parquet(s"$dir/asof/topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(topkAsOf.forall(_._2 % 2 == 0),
      "AS-OF probe of the pre-update generation surfaced a new-batch vector")
    val apiAsOf = graft.vector.PqOps.annPqIndexed(
      emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      graft.vector.PqOps.loadPqIndex(spark, s"$dir/idx",
        asOfGen = Some(buildGen))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(topkAsOf == apiAsOf, "CLI AS-OF probe diverged from the API read")
  }

  test("dq job profiles any parquet input, including awkward column names") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dq_e2e").toString
    Seq((1L, "x", Some(2.0)), (2L, "x", None), (3L, null, Some(4.0)))
      .toDF("id", "first-name", "the value")
      .write.parquet(s"$dir/in")
    JobRunner.run(spark, JobCli("dq", s"$dir/in", s"$dir/out", outParts = 1))
    val prof = spark.read.parquet(s"$dir/out")
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(prof("id") == ((3L, 3L)))
    assert(prof("first-name") == ((2L, 1L)))
    assert(prof("the value") == ((2L, 2L)))
  }

  test("compact --output_option zorder rewrites z-clustered; bad spec is a usage error") {
    val dir = java.nio.file.Files.createTempDirectory("zc_e2e").toString
    val src = "/root/testdata/sf0.001/lineitem.parquet"
    val in = spark.read.parquet(src)
    JobRunner.run(spark, JobCli("compact", src, s"$dir/out",
      outputOptions = Map("target_mb" -> "1", "zorder" -> "l_partkey,l_suppkey")))
    assert(spark.read.parquet(s"$dir/out").count() == in.count())
    val bad = intercept[RuntimeException] {
      JobRunner.run(spark, JobCli("compact", src, s"$dir/out2",
        outputOptions = Map("zorder" -> "l_partkey")))
    }
    assert(bad.getMessage.contains("exactly two columns"))
  }

  test("sitemaps job: list concat across hosts for one sitemap URL") {
    import spark.implicits._
    val r1 = Fixtures.robots("https://a.example.com/robots.txt",
      "Sitemap: https://shared.example.com/s.xml\n".getBytes("UTF-8"))
    val r2 = Fixtures.robots("https://b.example.com/robots.txt",
      "Sitemap: https://shared.example.com/s.xml\n".getBytes("UTF-8"))
    val tmp = java.nio.file.Files.createTempFile("sm", ".warc.gz").toString
    WarcWriter.writeFile(tmp, Seq(r1, r2))
    val records = WarcSource.fromPaths(spark, Seq(tmp), 1)
    val df = SitemapsJob.aggregate(spark, records)
    val row = df.collect().find(_.getString(0) == "https://shared.example.com/s.xml").get
    assert(row.getSeq[String](1).sorted == Seq("a.example.com", "b.example.com"))
  }

  test("bm25_index_merge CLI folds a delta; merged probe equals from-scratch") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).exists())
    val base = java.nio.file.Files.createTempDirectory("bm25merge").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.filter(col("doc_id") % 5 =!= 0)
      .write.parquet(s"$base/base_docs")
    docs.filter(col("doc_id") % 5 === 0)
      .write.parquet(s"$base/delta_docs")
    JobRunner.run(spark, JobCli("bm25_index_build", s"$base/base_docs", s"$base/idx"))
    JobRunner.run(spark, JobCli("bm25_index_merge", s"$base/delta_docs", s"$base/stats",
      addInputs = Seq(s"$base/idx")))
    JobRunner.run(spark, JobCli("bm25_index_probe", s"$base/idx", s"$base/out",
      outParts = 1, query = Some("join,vector,filter,dup")))
    val viaCli = spark.read.parquet(s"$base/out/topk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val direct = graft.SparkEntry.queries("text_bm25")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaCli == direct)
    assert(viaCli.nonEmpty)
  }

  test("scd2_build and asof CLI arms reproduce their registered queries") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).exists())
    val base = java.nio.file.Files.createTempDirectory("asofcli").toString
    JobRunner.run(spark, JobCli("scd2_build", s"$sf/events.parquet", s"$base/dim",
      outParts = 1))
    val dim = spark.read.parquet(s"$base/dim").collect().map(_.toSeq).toSet
    val dimDirect = graft.SparkEntry.queries("scd2_build")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(dim === dimDirect)
    JobRunner.run(spark, JobCli("asof", s"$sf/events.parquet", s"$base/enriched",
      outParts = 1))
    val enriched = spark.read.parquet(s"$base/enriched").collect().map(_.toSeq).toSet
    val enrichedDirect = graft.SparkEntry.queries("j6_asof_custom")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(enriched === enrichedDirect)
    assert(enriched.nonEmpty)
  }

  test("scd2_merge CLI folds a delta; merged dimension equals full rebuild") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).exists())
    val base = java.nio.file.Files.createTempDirectory("scd2m").toString
    val events = spark.read.parquet(s"$sf/events.parquet")
    events.filter(col("event_id") % 5 =!= 0).write.parquet(s"$base/base_ev")
    events.filter(col("event_id") % 5 === 0).write.parquet(s"$base/delta_ev")
    JobRunner.run(spark, JobCli("scd2_build", s"$base/base_ev", s"$base/dim", outParts = 1))
    JobRunner.run(spark, JobCli("scd2_merge", s"$base/delta_ev", s"$base/dim2",
      outParts = 1, addInputs = Seq(s"$base/dim")))
    val merged = spark.read.parquet(s"$base/dim2").collect().map(_.toSeq).toSet
    val full = graft.SparkEntry.queries("scd2_build")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(merged === full)
    assert(merged.nonEmpty)
  }

  test("vacuum CLI deletes superseded versions of a scd2-maintained dimension") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).exists())
    val base = java.nio.file.Files.createTempDirectory("scd2vac").toString
    val events = spark.read.parquet(s"$sf/events.parquet")
    // three maintenance generations of the same dimension root
    events.filter(col("event_id") % 3 === 0).write.parquet(s"$base/dim/v1")
    events.filter(col("event_id") % 3 <= 1).write.parquet(s"$base/dim/v2")
    events.write.parquet(s"$base/dim/v3")
    JobRunner.run(spark, JobCli("vacuum", s"$base/dim", s"$base/report",
      outParts = 1, outputOptions = Map("keep" -> "1")))
    assert(!new java.io.File(s"$base/dim/v1").exists)
    assert(!new java.io.File(s"$base/dim/v2").exists)
    assert(new java.io.File(s"$base/dim/v3").exists)
    val rep = spark.read.parquet(s"$base/report")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rep === Map(3L -> "kept", 2L -> "deleted", 1L -> "deleted"))
  }

  test("sample CLI reproduces the registered priority sample") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).exists())
    val out = java.nio.file.Files.createTempDirectory("psample").toString + "/out"
    JobRunner.run(spark, JobCli("sample", s"$sf/documents.parquet", out,
      outParts = 1, outputOptions = Map(
        "id" -> "doc_id", "weight" -> "n_chars", "group" -> "lang", "k" -> "50")))
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getString(r.fieldIndex("grp")),
        r.getLong(r.fieldIndex("doc_id")))).toSet
    val want = graft.SparkEntry.queries("curation_priority_sample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("image_dedup CLI reproduces the registered phash pipeline") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).exists())
    // Build the same content-keyed PNG corpus the registered query
    // hashes, as a generic (media_id, payload) parquet — the CLI's
    // input contract — plus one undecodable payload that must drop.
    val dir = java.nio.file.Files.createTempDirectory("imgdedup").toString
    import spark.implicits._
    val media = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("text").isNotNull && org.apache.spark.sql.functions
        .length(col("text")) > 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, t) =>
          (id, graft.media.MediaOps.syntheticPng(0, t))
        }
      }.toDF("media_id", "payload")
      .union(Seq((999999L, Array[Byte](1, 2, 3))).toDF("media_id", "payload"))
    media.write.parquet(s"$dir/media")
    JobRunner.run(spark,
      JobCli("image_dedup", s"$dir/media", s"$dir/out", outParts = 1))
    val gotPairs = spark.read.parquet(s"$dir/out/pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val wantPairs = graft.SparkEntry.queries("image_dedup_phash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotPairs === wantPairs)
    assert(gotPairs.nonEmpty)
    val wantSummary = graft.SparkEntry.queries("image_dedup_clusters")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val gotSummary = spark.read.parquet(s"$dir/out/summary")
      .collect().map(_.toSeq).toSeq
    assert(gotSummary === wantSummary)
  }

  test("warc_stream CLI resumes across invocations without reprocessing") {
    val land = java.nio.file.Files.createTempDirectory("warcland").toString
    val out = java.nio.file.Files.createTempDirectory("warcbronze").toString
    graft.warc.WarcWriter.writeFile(s"$land/a.warc.gz", graft.warc.Fixtures.all)
    JobRunner.run(spark, JobCli("warc_stream", land, out))
    val n1 = spark.read.parquet(s"$out/data").count()
    assert(n1 === graft.warc.Fixtures.all.length.toLong)
    // a new archive lands; a FRESH invocation (same output/checkpoint)
    // must ingest only it
    graft.warc.WarcWriter.writeFile(s"$land/b.warc.gz",
      Seq(graft.warc.Fixtures.responseHtml))
    JobRunner.run(spark, JobCli("warc_stream", land, out))
    val rows = spark.read.parquet(s"$out/data")
    assert(rows.count() === graft.warc.Fixtures.all.length.toLong + 1)
    val perFile = rows.groupBy("path").count().collect()
      .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
    assert(perFile === Map("a.warc.gz" -> graft.warc.Fixtures.all.length.toLong,
      "b.warc.gz" -> 1L))
  }

  test("warc_stream --table documents equals the batch warc_to_documents bridge") {
    val land = java.nio.file.Files.createTempDirectory("warcland2").toString
    val out = java.nio.file.Files.createTempDirectory("warcdocs").toString
    // html response archives (Fixtures.responseHtml carries real html)
    graft.warc.WarcWriter.writeFile(s"$land/a.warc.gz", graft.warc.Fixtures.all)
    JobRunner.run(spark, JobCli("warc_stream", land, out, table = "documents"))
    val streamed = spark.read.parquet(s"$out/data")
      .collect().map(_.toSeq).toSet
    // batch bridge over the same archives
    val manifest = java.nio.file.Files.createTempDirectory("warcman").toString + "/m.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(manifest),
      s"$land/a.warc.gz".getBytes("UTF-8"))
    val batchOut = java.nio.file.Files.createTempDirectory("warcdocs_b").toString
    JobRunner.run(spark, JobCli("warc_to_documents", manifest, batchOut, outParts = 1))
    val batch = spark.read.parquet(batchOut).collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
