package graft.jobs

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class HostRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("cache fill runs OUTSIDE the map lock: same-bin keys fill concurrently, a same-key race keeps one winner, reentrancy is legal") {
    import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
    import java.util.concurrent.atomic.AtomicInteger
    // 1) non-serialization: "Aa" and "BB" share a hashCode (same CHM
    //    bin) — under the old computeIfAbsent the second fill blocked
    //    on the bin lock for the whole seconds-long Spark build, so the
    //    latch below could never open. Both fills must be IN-FLIGHT at
    //    once.
    val m = new ConcurrentHashMap[String, String]()
    val inFlight = new CountDownLatch(2)
    val serialized = new AtomicInteger(0)
    def fill(key: String): String =
      graft.util.Caches.fill(m, key) {
        inFlight.countDown()
        if (!inFlight.await(10, TimeUnit.SECONDS)) serialized.incrementAndGet()
        s"v-$key"
      }
    val th = Seq("Aa", "BB").map { k =>
      val t = new Thread(() => { fill(k); () }); t.start(); t
    }
    th.foreach(_.join(30000))
    assert(serialized.get() == 0,
      "same-bin first invocations serialized — the build is running under the bin lock")
    assert(m.get("Aa") == "v-Aa" && m.get("BB") == "v-BB")
    // 2) same-key race: both threads compute, exactly one instance
    //    wins, the loser's value is RELEASED, both callers see the
    //    winner
    val m2 = new ConcurrentHashMap[String, Object]()
    val gate = new CountDownLatch(2)
    val released = new AtomicInteger(0)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Object]()
    val th2 = (1 to 2).map { _ =>
      val t = new Thread(() => {
        val v = graft.util.Caches.fill(m2, "k",
          (_: Object) => { released.incrementAndGet(); () }) {
          gate.countDown(); gate.await(10, TimeUnit.SECONDS)
          new Object()
        }
        results.add(v); ()
      }); t.start(); t
    }
    th2.foreach(_.join(30000))
    assert(released.get() == 1, "exactly the losing racer's build must be released")
    import scala.jdk.CollectionConverters._
    assert(results.asScala.toSet.size == 1 &&
      results.asScala.forall(_ eq m2.get("k")),
      "both racers must observe the single winning instance")
    // 3) reentrancy: a fill whose build fills ANOTHER key on the same
    //    thread (a graph query whose prep consults a second cache) —
    //    computeIfAbsent throws 'Recursive update' here
    val m3 = new ConcurrentHashMap[String, String]()
    val outer = graft.util.Caches.fill(m3, "outer") {
      graft.util.Caches.fill(m3, "inner")("i") + "-o"
    }
    assert(outer == "i-o" && m3.get("inner") == "i")
  }

  test("pagerank: hub accumulates rank, total mass conserved") {
    // star: a,b,c all link to hub; hub links to a (cycle keeps mass moving)
    val edges = Seq(("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"))
      .toDF("s", "t")
    // the hub↔a cycle oscillates with period 2; run enough rounds to damp
    val ranks = HostRank.pageRank(edges, iters = 21).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks("hub") > ranks("a"))
    assert(ranks("a") > ranks("b")) // a receives from hub; b,c only teleport
    assert(math.abs(ranks("b") - ranks("c")) < 1e-12) // symmetric
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6)   // mass conserved
  }

  test("dangling nodes redistribute mass instead of losing it") {
    val edges = Seq(("a", "sink"), ("b", "sink")).toDF("s", "t") // sink dangles
    val ranks = HostRank.pageRank(edges, iters = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6)
    assert(ranks("sink") > ranks("a"))
  }

  test("registered query returns ranked rows") {
    val df = HostRank.hostRank.fn(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 20)
    // suppliers receive all link mass from customers
    assert(rows.head.getString(0).startsWith("s"))
    assert(rows.map(_.getDouble(1)).toSeq == rows.map(_.getDouble(1)).toSeq.sorted.reverse)
  }

  test("personalized pagerank: mass concentrates on seeds and their reach, conserved") {
    import spark.implicits._
    // star-of-two: seed a -> {x, y}; b -> {x, z}; seeding ONLY a must
    // rank y (reachable from a alone) above z (reachable from b alone)
    val edges = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "z"))
      .toDF("s", "t")
    val ranks = HostRank.personalizedPageRank(
        edges, Seq("a").toDF("node"), iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // teleport + dangling both return to the seed: total mass conserved
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6)
    assert(ranks("y") > ranks("z"), s"seed-reachable y must outrank z: $ranks")
    // b has no in-edges and no teleport mass: exactly zero
    assert(ranks("b") == 0.0)

    // the registered query: non-seed customers carry exactly zero rank,
    // so the top-20 is seeds + reachable suppliers only
    val rows = HostRank.hostRankPersonalized.fn(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 20)
    // mass concentrates: the head rows carry seed-derived mass, and once
    // ranks hit exactly 0 (nodes unreachable from the 3 sf0.001 seeds —
    // fewer than 20 positive nodes exist at this SF) they stay 0
    assert(rows.head.getDouble(1) > 0.0)
    val rs = rows.map(_.getDouble(1)).toSeq
    assert(rs == rs.sorted.reverse)
    assert(rs.count(_ > 0.0) >= 3, s"at least the 3 seeds carry mass: $rs")
  }
}
