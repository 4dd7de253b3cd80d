package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-7 fused kernels exist to shrink generated-method size
  * (CodegenAuditSpec); each MUST stay bit-identical to the composable
  * expression form it replaced — especially minhash_band_buckets, whose
  * values live in PERSISTED MinHash indexes that newer builds must still
  * probe. Each test evaluates both forms over real corpus text plus
  * planted edge rows and asserts exact equality.
  */
class FusedKernelsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2, 2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def textDf = {
    import spark.implicits._
    (Seq("", "  ", "Hello, World! 123", "ALL-CAPS and   runs\t\tof WS",
      "ünïcode déjà vu ŁÓDŹ", "a", "1a2b3c", "x" * 300) ++
      Seq.tabulate(50)(i => s"doc $i the quick brown fox ${"w" * (i % 7)} jumps $i"))
      .toDF("text")
  }

  test("ascii_token_hashes == transform(ascii_tokens, xxhash64)") {
    val got = textDf.select(
      AsciiWordTokens.tokenHashesCol(col("text")).as("fused"),
      transform(AsciiWordTokens.asciiTokens(col("text")),
        t => xxhash64(t)).as("composed"))
    assert(got.filter(col("fused") =!= col("composed")).count() == 0)
  }

  test("norm_char_ngram_hashes == char_ngram_hashes(trim(regexp_replace(lower)))") {
    val got = textDf.select(
      ShingleHashes.normCharNgramHashes(col("text"), 5).as("fused"),
      ShingleHashes.charNgramHashes(
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), 5).as("composed"))
    assert(got.filter(col("fused") =!= col("composed")).count() == 0)
  }

  test("minhash_band_buckets == variadic xxhash64 over signature slices") {
    import spark.implicits._
    val sigs = Seq.tabulate(40)(d =>
      (d.toLong, Seq.tabulate(64)(i => (d * 31L + i * 7L) * 2654435761L)))
      .toDF("doc_id", "sig")
    val composed = (0 until 16).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until 4).map(r => element_at(col("sig"), b * 4 + r + 1)): _*)
          .as("bucket"))
    }
    val a = sigs.select(col("doc_id"),
        posexplode(MinHashSig.bandBucketsCol(col("sig"), 64, 4)).as(Seq("band", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = sigs.select(col("doc_id"), explode(array(composed: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("lsh_sigs == per-plane CASE-sum form") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val planes = Array.fill(64, 64)(rnd.nextGaussian())
    val vecs = Seq.tabulate(30)(d =>
      (d.toLong, Seq.tabulate(64)(i => (math.sin(d * 31 + i) * 2).toFloat)))
      .toDF("vec_id", "embedding")
    def composedAt(np: Int, offset: Int) =
      planes.slice(offset, offset + np).zipWithIndex.map { case (p, i) =>
        when(DotProductConst.dotConst(col("embedding"), p) > 0, lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    val got = vecs.select(
      LshSigs.lshSigs(col("embedding"), planes, 8, 0, 8).as("fused"),
      array((0 until 8).map(t => composedAt(8, t * 8)): _*).as("composed"))
    assert(got.filter(col("fused") =!= col("composed")).count() == 0)
  }
}
