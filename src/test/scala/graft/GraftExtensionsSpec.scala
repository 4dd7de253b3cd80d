package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions integration path: a session configured with
  * graft.GraftExtensions can call every native expression from SQL.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // another suite's shared session (without the extension) would win a
    // plain getOrCreate — clear the defaults so this builder constructs a
    // fresh session. withExtensions (not the spark.sql.extensions conf)
    // because the conf is STATIC: with a live SparkContext from an
    // earlier suite it is read from the context conf and ignored here;
    // both paths run the same GraftExtensions.apply.
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    SparkSession.builder()
      .master("local[2, 2]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("all graft functions resolve and evaluate from plain SQL") {
    val row = spark.sql(
      """SELECT
        |  cosine_sim(array(cast(1.0 as float), cast(0.0 as float)),
        |             array(cast(1.0 as float), cast(0.0 as float))) AS cos,
        |  ascii_tokens('Hello, World 42!') AS toks,
        |  size(char_ngram_hashes('abcdef', 3)) AS ngrams,
        |  size(long_window_hashes(array(1L, 2L, 3L), 2)) AS winds,
        |  size(minhash_sig(array(10L, 74L, -3L), 16)) AS sig_len,
        |  simhash_sig(array('a', 'b', 'a')) AS sh,
        |  nfc_normalize('cafe\u0301') AS nfc
        |""".stripMargin).head()
    assert(row.getDouble(0) == 1.0)
    assert(row.getSeq[String](1) == Seq("hello", "world", "42"))
    assert(row.getInt(2) == 4)  // windows at 0..3, all distinct
    assert(row.getInt(3) == 2)
    assert(row.getInt(4) == 16)
    assert(row.getLong(5) != 0L)
    assert(row.getString(6) == "caf\u00e9")
  }

  test("round-6 kernels resolve from SQL: windows-all, winnow, adc, bounded collect") {
    val row = spark.sql(
      """SELECT
        |  long_window_hashes_all(array(1L, 2L, 1L, 2L), 2) AS wall,
        |  size(winnow_fingerprints('abcdefghij', 3, 4)) AS fps,
        |  adc_score(array(array(1.0D, 2.0D), array(10.0D, 20.0D)), array(1, 0)) AS adc
        |""".stripMargin).head()
    // windows (1,2),(2,1),(1,2) in position order — repeats kept
    val wall = row.getSeq[Long](0)
    assert(wall.length == 3 && wall(0) == wall(2) && wall(0) != wall(1))
    assert(row.getInt(1) >= 1)
    assert(row.getDouble(2) == 12.0)
    val agg = spark.sql(
      """SELECT k, bounded_long_collect(v, 2) AS ids
        |FROM VALUES (1, 10L), (1, 5L), (2, 1L), (2, 2L), (2, 3L) AS t(k, v)
        |GROUP BY k ORDER BY k""".stripMargin).collect()
    assert(agg(0).getSeq[Long](1) == Seq(5L, 10L))   // sorted
    assert(agg(1).isNullAt(1))                        // 3 > cap 2 → NULL
  }

  test("optimizer rewrites the canonical regex tokenizer to ascii_tokens") {
    val df = spark.sql(
      """SELECT size(regexp_extract_all(lower(concat('Hello World ', id)), '[a-z0-9]+', 0)) AS n
        |FROM range(1)""".stripMargin)
    assert(df.queryExecution.optimizedPlan.toString.contains("ascii_tokens"),
      s"rewrite missing in:\n${df.queryExecution.optimizedPlan}")
    assert(df.head().getInt(0) == 3) // "hello", "world", "0"
    // a different pattern must NOT be rewritten
    val other = spark.sql(
      """SELECT regexp_extract_all(lower(concat('a-b', id)), '[a-z]+-[a-z]+', 0) AS m
        |FROM range(1)""".stripMargin)
    assert(!other.queryExecution.optimizedPlan.toString.contains("ascii_tokens"))
  }

  test("tokenize rewrite is opt-out via spark.graft.tokenizeRewrite.enabled") {
    val sql =
      """SELECT regexp_extract_all(lower(concat('Hello ', id)), '[a-z0-9]+', 0) AS t
        |FROM range(1)""".stripMargin
    spark.conf.set(graft.plans.TokenizeRewrite.EnabledKey, "false")
    try {
      val off = spark.sql(sql)
      assert(!off.queryExecution.optimizedPlan.toString.contains("ascii_tokens"),
        s"rewrite ran while disabled:\n${off.queryExecution.optimizedPlan}")
      // exact built-in semantics preserved while disabled: U+212A KELVIN
      // SIGN case-folds to 'k' under lower(), so the regex keeps it as a
      // token character — the documented divergence the gate exists for
      val kelvin = spark.sql(
        "SELECT regexp_extract_all(lower('aKb'), '[a-z0-9]+', 0) AS t")
      assert(kelvin.head().getSeq[String](0) == Seq("akb"))
    } finally spark.conf.set(graft.plans.TokenizeRewrite.EnabledKey, "true")
    assert(spark.sql(sql).queryExecution.optimizedPlan.toString.contains("ascii_tokens"))
  }

  test("literal-arg validation rejects a non-literal perms") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array(1L), cast(rand() * 4 as int))").head()
    }
    assert(e.getMessage.contains("literal int"))
  }
}
