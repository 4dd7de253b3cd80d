package graft.tools
import graft.util.{Sessions, Tables}
import org.apache.spark.sql.functions._
object SemProf {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32", "semprof")
    val dir = "/root/testdata/sf0.1"
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val c = Tables(spark, dir, "embeddings")
    time("warm")(c.count())
    for (i <- 1 to 2) {
      val (assign, cent) = time(s"buildIvf-$i")(graft.vector.VectorOps.buildIvf(c, 32, 2))
      time(s"assign.count-$i")(assign.count())
      val pairs = graft.vector.SemDedup.semanticDupPairs(c, 32, 0.95)
      time(s"pairs.count-$i")(pairs.count())  // includes its own buildIvf
      time(s"full-agg-$i")(graft.vector.SemDedup.dedupSemantic.fn(spark, dir).count())
    }
    spark.stop()
  }
}
