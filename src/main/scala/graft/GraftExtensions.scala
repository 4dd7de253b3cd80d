package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session-extensions entry point: registers every graft native
  * expression as a SQL function, so any session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) can call them from plain
  * SQL — the canonical way a Spark library ships custom Catalyst
  * expressions (vs the per-session temp-function `register` helpers,
  * which remain for programmatic use).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(array<float>, array<float>) - cosine similarity"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))

    ext.injectFunction((FunctionIdentifier("ascii_tokens"),
      info("ascii_tokens", "ascii_tokens(string) - lowercase [a-z0-9]+ tokens"),
      (exprs: Seq[Expression]) => AsciiWordTokens(exprs.head)))

    ext.injectFunction((FunctionIdentifier("char_ngram_hashes"),
      info("char_ngram_hashes", "char_ngram_hashes(string, n) - distinct xxh64 of n-byte windows"),
      (exprs: Seq[Expression]) =>
        CharNgramHashes(exprs(0), intArg(exprs(1), "char_ngram_hashes"))))

    ext.injectFunction((FunctionIdentifier("long_window_hashes"),
      info("long_window_hashes", "long_window_hashes(array<bigint>, w) - distinct xxh64 of w-element windows"),
      (exprs: Seq[Expression]) =>
        LongWindowHashes(exprs(0), intArg(exprs(1), "long_window_hashes"))))

    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(array<bigint>, perms) - OPH MinHash signature, rotation-densified"),
      (exprs: Seq[Expression]) =>
        MinHashSig(exprs(0), intArg(exprs(1), "minhash_sig"))))

    ext.injectFunction((FunctionIdentifier("simhash_sig"),
      info("simhash_sig", "simhash_sig(array<string>) - 64-bit Charikar SimHash"),
      (exprs: Seq[Expression]) => SimHashSig(exprs.head)))

    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(string) - Unicode NFC canonical composition"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))

    ext.injectFunction((FunctionIdentifier("long_window_hashes_all"),
      info("long_window_hashes_all",
        "long_window_hashes_all(array<bigint>, w) - xxh64 of every w-window in position order"),
      (exprs: Seq[Expression]) =>
        LongWindowHashesAll(exprs(0), intArg(exprs(1), "long_window_hashes_all"))))

    ext.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(string, k, w) - winnowing fingerprints (per-window min k-gram hash)"),
      (exprs: Seq[Expression]) =>
        WinnowFingerprints(exprs(0), intArg(exprs(1), "winnow_fingerprints"),
          intArg(exprs(2), "winnow_fingerprints"))))

    ext.injectFunction((FunctionIdentifier("adc_score"),
      info("adc_score",
        "adc_score(array<array<double>>, array<int>) - PQ asymmetric-distance score Σ lut[m][code[m]]"),
      (exprs: Seq[Expression]) => AdcScore(exprs(0), exprs(1))))

    ext.injectFunction((FunctionIdentifier("bounded_long_collect"),
      info("bounded_long_collect",
        "bounded_long_collect(bigint, limit) - sorted collect of ≤limit values, NULL past the cap"),
      (exprs: Seq[Expression]) =>
        BoundedLongCollect(exprs(0), intArg(exprs(1), "bounded_long_collect"))))

    ext.injectFunction((FunctionIdentifier("ascii_token_hashes"),
      info("ascii_token_hashes",
        "ascii_token_hashes(string) - xxh64 of each lowercase [a-z0-9]+ token (fused tokenize+hash)"),
      (exprs: Seq[Expression]) => AsciiTokenHashes(exprs.head)))

    ext.injectFunction((FunctionIdentifier("norm_char_ngram_hashes"),
      info("norm_char_ngram_hashes",
        "norm_char_ngram_hashes(string, n) - distinct xxh64 n-grams of the lowercased/collapsed/trimmed text"),
      (exprs: Seq[Expression]) =>
        NormCharNgramHashes(exprs(0), intArg(exprs(1), "norm_char_ngram_hashes"))))

    ext.injectFunction((FunctionIdentifier("minhash_band_buckets"),
      info("minhash_band_buckets",
        "minhash_band_buckets(array<bigint>, perms, rowsPerBand) - LSH band bucket hashes of a MinHash signature"),
      (exprs: Seq[Expression]) =>
        MinHashBandBuckets(exprs(0), intArg(exprs(1), "minhash_band_buckets"),
          intArg(exprs(2), "minhash_band_buckets"))))

    // optimizer leg: the canonical regex tokenizer pattern silently
    // becomes the native byte-scan kernel (graft.plans.TokenizeRewrite)
    ext.injectOptimizerRule(_ => graft.plans.TokenizeRewrite)
    // aggregate navigation onto a declared summary table (conf-gated,
    // inert without spark.graft.summary.* keys)
    ext.injectOptimizerRule(_ => graft.plans.SummaryAggRewrite)
    // whole-operator leg: plans the custom AsOfJoin logical node
    // (AsOfJoinOps also self-installs this per-session for sessions
    // not started with the extensions conf)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
