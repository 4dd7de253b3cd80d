package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Column-expression helpers shared across the query library.
  *
  * Everything here is built from `org.apache.spark.sql.functions` so the
  * expressions stay inside whole-stage codegen; no Scala UDFs.
  *
  * Determinism note: floating-point SUM is order-dependent, and at scale
  * partial aggregation order is nondeterministic. For any aggregate whose
  * value must be bit-reproducible (the DuckDB-oracle hash compare, and any
  * downstream sort keyed on the aggregate), we accumulate in exact decimal
  * and cast the final value to double — `dsum`/`davg`. The decimal
  * accumulation is also what a 1000-executor run needs: the result no
  * longer depends on shuffle arrival order.
  */
object GraftFunctions {
  private val Dec = DecimalType(25, 6)

  /** Order-independent (exact decimal) sum of a double column, as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Order-independent mean: exact decimal sum, one double division. */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType) / count(lit(1))

  /** Exact-decimal running sum over a window, as double. */
  def drunning(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(Dec)).over(w).cast(DoubleType)

  /** ASCII word tokens of lowercased text (cc-pyspark word_count.py:25
    * uses `\w+`; we standardize on [a-z0-9]+ so the DuckDB RE2 oracle and
    * Java regex agree on every input). Implemented as the native
    * AsciiWordTokens byte scanner — same semantics as
    * `regexp_extract_all(lower(c), '[a-z0-9]+', 0)`, ~regex-free.
    */
  def tokens(c: Column): Column = AsciiWordTokens.asciiTokens(c)

  /** Whitespace/punct-normalized document fingerprint (rolling-hash
    * analogue; md5 of the canonical token stream).
    */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), "[^a-z0-9]+", " ")).cast("binary"))

  /** Dot product of two float-array columns (codegen'd, no UDF). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm of a float-array column. */
  def l2Norm(c: Column): Column =
    sqrt(aggregate(c, lit(0.0), (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))

  /** Cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))
}
