package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide output-shape audit: the driver's pandas comparator
  * hashes rows after a `sort_values` over every column, and pandas
  * cannot factorize array/map/struct cells (`TypeError: unhashable
  * type: 'numpy.ndarray'` — CORRECTNESS_r10's one red row,
  * text_feature_embed). The comparator is an external contract we do
  * not control, so it is enforced here the same way the
  * no-cartesian (PlanAuditSpec) and terminal-sort
  * (DeterminismAuditSpec) contracts are: every oracled query's final
  * projection must be scalar columns only. A query that genuinely
  * needs a nested output goes on the allow-list with a justification
  * — and accepts the weaker rows-only check at the driver gate.
  */
class OutputShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Queries allowed to emit nested top-level columns. Empty by design:
    * adding a name here downgrades it to the driver's rows-only check.
    */
  private val allowNested: Set[String] = Set.empty

  private def nestedCols(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq

  test("no oracled query emits a top-level array/map/struct column") {
    assume(new java.io.File(sf).exists())
    // Streaming queries execute their full (bounded) stream on
    // construction; that cost is accepted — their rows are driver-hashed
    // like everyone else's, so they are under the same shape contract.
    val offenders = SparkEntry.allDefs
      .filter(d => d.oracle.isDefined || d.oracleGen.isDefined)
      .filterNot(d => allowNested.contains(d.name))
      .flatMap { d =>
        val bad = nestedCols(d.fn(spark, sf).schema)
        if (bad.isEmpty) None
        else Some(s"${d.name}: ${bad.mkString(", ")}")
      }
    assert(offenders.isEmpty,
      s"oracled queries with driver-unhashable nested output columns " +
        s"(posexplode to scalar rows or add to allowNested):\n${offenders.mkString("\n")}")
  }

  test("the audit catches a planted array-output query") {
    import org.apache.spark.sql.functions._
    val planted = graft.util.Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tokens"))
    assert(nestedCols(planted.schema).nonEmpty)
  }
}
