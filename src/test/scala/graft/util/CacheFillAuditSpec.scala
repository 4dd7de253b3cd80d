package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Source audit: main-tree code never fills a ConcurrentHashMap via
  * `computeIfAbsent` — its factory runs under the key's BIN lock, so
  * seconds of Spark work serialize unrelated same-bin fills and a
  * reentrant fill throws. [[Caches.fill]] (compute outside the lock,
  * publish with putIfAbsent, release the losing racer) is the one
  * sanctioned pattern; HostRankSpec proves its concurrency semantics.
  */
class CacheFillAuditSpec extends AnyFunSuite {

  test("no computeIfAbsent anywhere in src/main") {
    val root = java.nio.file.Paths.get("src/main/scala")
    assume(java.nio.file.Files.isDirectory(root))
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val st = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .foreach { p =>
          val text = new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)
          if (text.contains(".computeIfAbsent(")) offenders += p.toString
        }
    } finally st.close()
    assert(offenders.isEmpty,
      s"Spark work under a CHM bin lock — route through Caches.fill: " +
        s"${offenders.mkString(", ")}")
  }
}
