package graft.tools

import graft.util.Sessions

/** Steady-state timing for the streaming queries (dev tool). */
object StreamAB {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "stream-ab")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[ab] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (i <- 1 to 3)
      time(s"stream_windows-$i")(
        graft.SparkEntry.queries("stream_windows")(spark, dir).count())
    spark.stop()
  }
}
