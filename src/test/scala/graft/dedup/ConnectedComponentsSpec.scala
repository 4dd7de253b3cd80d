package graft.dedup

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("chains, cliques, and separate components resolve to min labels") {
    // chain 1-2-3-4 (diameter 3), pair 10-11, triangle 20-21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id1", "id2")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L).forall(labels(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(labels(_) == 20L))
  }

  test("registered dedup_clusters query: clusters consistent with pairs") {
    val df = Dedup.dedupClusters.fn(spark, "/root/testdata/sf0.001")
    val row = df.head()
    val (nClusters, nDocs, nDrop, largest) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(nClusters > 0)
    assert(nDocs == nClusters + nDrop)
    assert(largest >= 2) // any cluster has at least a pair
  }
}
