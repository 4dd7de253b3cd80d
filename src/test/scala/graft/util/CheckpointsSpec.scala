package graft.util

import org.scalatest.funsuite.AnyFunSuite

class CheckpointsSpec extends AnyFunSuite {

  test("non-local master without a configured dir fails fast") {
    val e = intercept[IllegalArgumentException] {
      Checkpoints.resolveDir(isLocal = false, master = "spark://host:7077",
        configured = None)
    }
    assert(e.getMessage.contains("spark.graft.checkpointDir"))
  }

  test("configured dir wins on any master; local falls back to a temp dir") {
    assert(Checkpoints.resolveDir(isLocal = false, master = "yarn",
      configured = Some("hdfs:///ckpt")) == "hdfs:///ckpt")
    val tmp = Checkpoints.resolveDir(isLocal = true, master = "local[4]",
      configured = None)
    assert(new java.io.File(tmp).isDirectory)
  }
}
