package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: Morton-code correctness (magic-number spread vs a
  * per-bit reference) and the actual data-skipping claim — point
  * predicates on the SECOND key must prune most z-order buckets,
  * which a single-key sort layout structurally cannot do.
  */
class LayoutOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** Per-bit reference interleave — the independent algorithm. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("magic-number interleave matches the per-bit reference on 10k pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(10000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L), (1L, 2L))
    val df = pairs.toDF("x", "y")
      .select(col("x"), col("y"), LayoutOps.zorder2(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1)),
        s"interleave mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-order buckets prune point predicates on BOTH keys; a single-key sort cannot") {
    val sf = "/root/testdata/sf0.01"
    val z = LayoutOps.zorderLayout.fn(spark, sf).collect()
      .map(r => (r.getLong(r.fieldIndex("min_supp")), r.getLong(r.fieldIndex("max_supp")),
        r.getLong(r.fieldIndex("min_part")), r.getLong(r.fieldIndex("max_part"))))
    assert(z.length >= 64, s"expected a multi-bucket layout, got ${z.length}")

    // the comparison layout: same bucket count, files cut by a
    // partkey-only sort (what a naive ORDER BY layout produces)
    val li = graft.util.Tables(spark, sf, "lineitem")
    val w = Window.orderBy(col("l_partkey"), col("l_orderkey"), col("l_linenumber"))
    val linear = li.select(col("l_partkey"), col("l_suppkey"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("bucket", ntile(z.length).over(w))
      .groupBy("bucket")
      .agg(min("l_suppkey").as("mins"), max("l_suppkey").as("maxs"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))

    val suppKeys = 0L until 100L by 7L
    def hitFraction(buckets: Seq[(Long, Long)]): Double =
      suppKeys.map(k => buckets.count(b => b._1 <= k && k <= b._2).toDouble / buckets.size)
        .sum / suppKeys.size

    val zHit = hitFraction(z.map(b => (b._1, b._2)).toSeq)
    val linHit = hitFraction(linear.toSeq)
    assert(zHit < 0.15, s"z-order layout should prune >85% of buckets, hit=$zHit")
    assert(linHit > 0.9, s"partkey-sorted layout should be unprunable on suppkey, hit=$linHit")

    // and the z-layout still prunes the FIRST key like the sort does
    val partKeys = 0L until 2000L by 131L
    val pHit = partKeys.map(k =>
      z.count(b => b._3 <= k && k <= b._4).toDouble / z.length).sum / partKeys.size
    assert(pHit < 0.15, s"z-order layout should also prune partkey points, hit=$pHit")
  }

  test("zorderRewrite survives 64-bit-hash key domains without overflow") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // keys spanning nearly the full long range (hash-id shape), plus
    // the exact extremes so the wrapped-difference branch is hit
    val wide = (Seq.fill(500)((rnd.nextLong(), rnd.nextLong().abs % 1000L)) ++
      Seq((Long.MinValue, 0L), (Long.MaxValue, 999L))).toDF("id", "sz")
    val out = LayoutOps.zorderRewrite(wide, "id", "sz", 4)
    assert(out.count() == 502)
    // scaled z-values must still separate the data: 4 range partitions
    // over a degenerate constant zval would collapse to 1 file
    val parts = out.rdd.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(parts.count(_ > 0) >= 2, s"z-values degenerate: partitions=${parts.toSeq}")
  }

  test("zorderRewrite writes files whose footer-visible rectangles prune both keys") {
    val sf = "/root/testdata/sf0.01"
    val li = graft.util.Tables(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey", "l_orderkey")
    val out = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    LayoutOps.zorderRewrite(li, "l_partkey", "l_suppkey", 16)
      .write.mode("overwrite").parquet(out)

    // contents preserved exactly
    assert(spark.read.parquet(out).count() == li.count())

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 12 && files.length <= 16,
      s"expected ~16 z-clustered files, got ${files.length}")
    // per-file rectangles (what parquet footer min/max would expose):
    // each file must span a bounded slice of BOTH keys, not just one
    val rects = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val avgPartSpan = rects.map(r => r._2 - r._1).sum.toDouble / rects.length
    val avgSuppSpan = rects.map(r => r._4 - r._3).sum.toDouble / rects.length
    assert(avgPartSpan < 2000 * 0.6, s"partkey span per file too wide: $avgPartSpan")
    assert(avgSuppSpan < 100 * 0.6, s"suppkey span per file too wide: $avgSuppSpan")
  }

  test("vacuum retains the newest K versions, ignores non-version dirs, never drops current") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vacuum").toString
    Seq(1L, 2L, 10L).foreach { v =>
      Seq((v, "x")).toDF("ver", "payload").write.parquet(s"$root/v$v")
    }
    // non-version sibling must survive any vacuum
    Seq((0L, "side")).toDF("ver", "payload").write.parquet(s"$root/data")

    val rep = LayoutOps.vacuumVersions(spark, root, keep = 2)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rep == Map(10L -> "kept", 2L -> "kept", 1L -> "deleted"), s"got $rep")
    assert(!new java.io.File(s"$root/v1").exists)
    assert(new java.io.File(s"$root/v2").exists && new java.io.File(s"$root/v10").exists)
    assert(new java.io.File(s"$root/data").exists)
    // v10 > v2 numerically (a lexicographic sort would rank v2 above v10)
    assert(spark.read.parquet(s"$root/v10").as[(Long, String)].collect().head._1 == 10L)

    // keep=0 clamps to 1: the current version is never deletable
    val rep2 = LayoutOps.vacuumVersions(spark, root, keep = 0)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rep2 == Map(10L -> "kept", 2L -> "deleted"), s"got $rep2")
    assert(new java.io.File(s"$root/v10").exists)

    // idempotent on an already-clean root
    val rep3 = LayoutOps.vacuumVersions(spark, root, keep = 2)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rep3 == Map(10L -> "kept"), s"got $rep3")
  }
}
