package graft.operators

import graft.QueryDef
import graft.util.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * data skipping — a scale feature with no reference counterpart
  * (cc-pyspark's only layout control is `--num_output_partitions`
  * coalesce, sparkcc.py:219-226). On a 100 TB table queried by BOTH
  * `l_partkey` and `l_suppkey`, sorting files by either key alone
  * leaves the other key's per-file min/max spanning the whole domain,
  * so point predicates on it prune nothing. Interleaving the two keys'
  * bits gives every file a bounded rectangle in (partkey, suppkey)
  * space, so min/max footer stats prune on BOTH dimensions.
  *
  * The interleave is the classic magic-number bit spread — 4
  * shift/mask rounds per operand instead of a 16-iteration loop, a
  * short chain of codegen'd integer ops that stays inside
  * whole-stage codegen (no UDF). The write path is
  * `df.repartitionByRange(nFiles, zval)` + per-file footer stats;
  * the oracle-checked query below reads the layout back as fixed
  * radix buckets (zval >> shift), which is the zero-shuffle,
  * zero-sort form of the same clustering: bucket membership is a
  * pure function of the row, so at any scale the stats aggregate is
  * one partial+final hash agg — no global sort anywhere.
  */
object LayoutOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Spread the low 16 bits of `x` to even bit positions (Morton
    * part1by1): 0b1111 → 0b01010101.
    */
  private[operators] def part1by1(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z-value of two 16-bit keys: x in even bits, y in odd. */
  def zorder2(x: Column, y: Column): Column =
    part1by1(x).bitwiseOR(shiftleft(part1by1(y), 1))

  /** SQL bigint literal; Long.MinValue has no direct literal form (the
    * parser sees unary minus on an out-of-range positive).
    */
  private def lit64(v: Long): String =
    if (v == Long.MinValue) "(-9223372036854775807L - 1L)" else s"${v}L"

  /** Scale a key to the full 16-bit Morton domain via min/max range
    * normalization — without it the narrower key's high bits are all
    * zero and radix buckets degenerate to a single-key sort (a
    * 100-supplier key next to a 20 000-part key contributes nothing
    * to the top interleaved bits). Delta/Iceberg z-ordering does the
    * same normalization with range-partition ranks; min/max linear
    * scaling is the sort-free form.
    *
    * Three forms by domain width, all exact int64 (no float rounding
    * to disagree across engines):
    *   - small span: multiply-then-divide uses every one of the 16
    *     bits even on narrow domains (the form the zorder_layout
    *     oracle mirrors) — safe while span*65535 fits in int64
    *   - wide span (e.g. 64-bit hash ids): fixed-step divide; the
    *     multiply would overflow, and with span ≥ 2^16 the step form
    *     already reaches all 16 bits
    *   - span itself overflows int64 (keys straddle the full long
    *     range): offset-binary top bits, pure bit ops
    */
  private def scale16(rawName: String, lo: Long, hi: Long): Column = {
    // CLI-supplied column names can need quoting (dashes, reserved
    // words like `div`); backtick for the expr branches
    val name = "`" + rawName.replace("`", "``") + "`"
    val span = math.max(hi - lo, 1L)
    if (hi - lo < 0L)
      // keys straddle so much of the long range that even the span
      // overflows: take the top 16 bits of the offset-binary form
      // (x XOR MinValue maps signed order onto unsigned order) — pure
      // bit ops, monotone, and ANSI-safe where wrapped subtraction
      // is not
      shiftrightunsigned(
        col(name).cast("long").bitwiseXOR(lit(Long.MinValue)), 48)
    else if (span <= Long.MaxValue / 65535L)
      expr(s"((CAST($name AS BIGINT) - ${lit64(lo)}) * 65535L) div ${lit64(span)}")
    else
      expr(s"(CAST($name AS BIGINT) - ${lit64(lo)}) div ${lit64(span / 65535L + 1L)}")
  }

  /** Per-radix-bucket clustering stats of the Z-ordered lineitem
    * layout: each bucket (zval >> 24, i.e. the top 4 bits of each
    * scaled key — one "file" of a 256-file layout) reports its
    * bounding rectangle over both keys: ~1/16 of EACH domain, so a
    * point predicate on either key prunes ~15/16 of the files. The
    * min/max scan that anchors the scaling is a 4-value scalar
    * aggregate (bounded driver-side collect, same class as the ANN
    * centroid sets). The oracle recomputes the Morton code
    * independently with DuckDB list-comprehension bit math — a
    * different algorithm (per-bit loop) agreeing with the
    * magic-number spread bit for bit. LayoutOpsSpec grades the
    * layout itself: point predicates on the second dimension must
    * prune most buckets, which a single-key sort layout cannot do.
    */
  val zorderLayout: QueryDef = QueryDef(
    "zorder_layout",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val Array(mm) = li.agg(
        min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey"))).collect()
      // zero-row input: min/max are NULL; any anchors produce the
      // same (empty) output, so use the degenerate [0, 1] domain
      def lg(i: Int): Long = if (mm.isNullAt(i)) i.toLong % 2 else mm.getLong(i)
      val (pmin, pmax, smin, smax) = (lg(0), lg(1), lg(2), lg(3))
      li.select(
          zorder2(scale16("l_partkey", pmin, pmax),
            scale16("l_suppkey", smin, smax)).as("zval"),
          col("l_partkey"), col("l_suppkey"))
        .groupBy(shiftright(col("zval"), 24).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
          min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
    },
    Some("""WITH mm AS (SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
        MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax FROM lineitem),
      z AS (SELECT l_partkey, l_suppkey,
        CAST(list_sum([
          (((((l_partkey - pmin) * 65535) // (GREATEST(pmax - pmin, 1))) >> i) & 1)
            * (CAST(1 AS BIGINT) << (2*i))
        + (((((l_suppkey - smin) * 65535) // (GREATEST(smax - smin, 1))) >> i) & 1)
            * (CAST(1 AS BIGINT) << (2*i+1))
          for i in range(16)]) AS BIGINT) AS zval
        FROM lineitem, mm)
      SELECT zval >> 24 AS bucket, COUNT(*) AS n,
        MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
        MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
      FROM z GROUP BY bucket"""))

  /** Rewrite `df` into `nFiles` z-clustered files on the Morton
    * interleave of two numeric key columns — the write path behind
    * `JobRunner compact --output_option zorder=a,b` (Delta OPTIMIZE
    * ZORDER BY, Spark-native). One pass for the two min/max anchors
    * (4-value driver collect), one range-shuffle on zval (the range
    * partitioner's sample sets file CUT POINTS only — contents and
    * per-file min/max stats are data-determined), plus an in-partition
    * sort so row groups inside a file are also z-contiguous. The zval
    * column is dropped before the write: the layout lives in the file
    * boundaries and footer stats, not the schema.
    */
  def zorderRewrite(df: DataFrame, keyA: String, keyB: String, nFiles: Int): DataFrame = {
    val Array(mm) = df.agg(
      min(col(keyA).cast("long")), max(col(keyA).cast("long")),
      min(col(keyB).cast("long")), max(col(keyB).cast("long"))).collect()
    def lg(i: Int): Long = if (mm.isNullAt(i)) i.toLong % 2 else mm.getLong(i)
    val z = zorder2(
      scale16(keyA, lg(0), lg(1)),
      scale16(keyB, lg(2), lg(3)))
    df.withColumn("__zval", z)
      .repartitionByRange(math.max(nFiles, 1), col("__zval"))
      .sortWithinPartitions(col("__zval"))
      .drop("__zval")
  }

  /** Retention vacuum for versioned table roots — the `root/vN` layout
    * that scd2_merge / stream_scd2_maintenance publish into and that
    * any copy-on-write maintenance accumulates: delete every version
    * below the newest `keep`. Only direct children named `v<int>` are
    * version candidates; anything else under the root is untouched,
    * and the current version (highest N) is never deletable (`keep`
    * clamps to ≥1). Driver-side filesystem metadata work through the
    * Hadoop FS API — no Spark job runs. Safe against concurrent
    * readers of RETAINED versions because writers publish whole new
    * `vN` dirs (a version is atomically present or absent under the
    * swap protocol the versioned writers use); readers pinned to a
    * vacuumed version fail like any expired-snapshot read — `keep`
    * is the retention window, size it to the longest running read.
    */
  def vacuumVersions(spark: SparkSession, root: String, keep: Int): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    val vName = "^v(\\d+)$".r
    val versions = fs.listStatus(rootPath).toSeq
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case vName(n) => Some((n.toLong, st.getPath))
        case _ => None
      })
      .sortBy(-_._1)
    require(versions.nonEmpty, s"vacuum: no v<N> version dirs under $root")
    val (kept, dropped) = versions.splitAt(math.max(keep, 1))
    val report = (kept.map { case (v, p) =>
      (v, p.toString, "kept", fs.getContentSummary(p).getLength)
    } ++ dropped.map { case (v, p) =>
      val bytes = fs.getContentSummary(p).getLength
      fs.delete(p, true)
      (v, p.toString, "deleted", bytes)
    }).sortBy(-_._1)
    import spark.implicits._
    report.toDF("version", "path", "action", "bytes")
  }

  val all: Seq[QueryDef] = Seq(zorderLayout)
}
