package graft.media

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MediaOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("media table: binary payload with typed metadata") {
    val media = MediaOps.mediaFromDocuments(spark, sf)
    val row = media.head()
    assert(row.payload.nonEmpty)
    assert(Set("image", "audio", "video").contains(row.kind))
    assert(media.count() == 500)
  }

  test("feature extraction is deterministic and batch-safe") {
    val media = MediaOps.mediaFromDocuments(spark, sf)
    val a = MediaOps.extractFeatures(media, batchSize = 7).collect()
      .sortBy(_.media_id)
    val b = MediaOps.extractFeatures(media, batchSize = 64).collect()
      .sortBy(_.media_id)
    assert(a.toSeq == b.toSeq) // batch shape must not change results
    assert(a.forall(f => f.n_bytes > 0 && f.entropy > 0))
    assert(a.forall(f => f.width >= 64 && f.height >= 64))
  }

  test("registered query aggregates per source and kind") {
    val df = MediaOps.multimodalFeatures.fn(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) > 0))
  }
}
