package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the PCA moment accumulation: the shipped mapPartitions
  * syrk-style kernel vs the explode→groupBy formulation it replaced.
  * Both compute the identical exact-integer upper triangle; the explode
  * form fans every vector into 2 080 generated rows before the partial
  * agg collapses them. Usage: PcaAB [nVectors] (default 200000) —
  * synthesizes nVectors 64-dim vectors so the gap is visible at a scale
  * the 5 000-row bench table can't show.
  */
object PcaAB {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic embeddings, float-typed like the real table
    val emb = spark.range(n.toLong).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63),
        i -> CAST(sin(CAST(id * 64 + i AS DOUBLE)) AS FLOAT))""").as("embedding"))
      .cache()
    emb.count()

    def explodeForm() = emb
      .select(expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))").as("qv"))
      .select(col("qv"), posexplode(col("qv")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("qv")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("xi") * col("xj")).as("s_ij"), count(lit(1)).as("n"))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pca-ab] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm both paths once, then measure
    val kRows = time("kernel-warm") { graft.vector.PcaOps.momentsOf(emb).collect() }
    val eRows = time("explode-warm") { explodeForm().collect() }
    val k = time("kernel") { graft.vector.PcaOps.momentsOf(emb).collect() }
    val e = time("explode") { explodeForm().collect() }
    val km = k.map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val em = e.map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    println(s"[pca-ab] identical=${km == em} pairs=${km.size} n=$n " +
      s"(warm rows ${kRows.length}/${eRows.length})")
    spark.stop()
  }
}
