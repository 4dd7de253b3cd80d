package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical audit of the rename-protocol retirement (the r15
  * verdict's #1 directive): the rename maintenance bodies are GONE
  * from production code, not just unreachable — no module references
  * the deleted IndexCommit, the only rename-READING path is the
  * zero-copy adoption (ManifestTiered.adoptRenameTiered), and the only
  * place production code even names the retired protocol value is the
  * CLI's parse (which exists so `--commit_protocol rename` fails with
  * the retirement pointer instead of an unknown-flag error) plus the
  * sealed-trait declaration itself. The CacheFillAuditSpec pattern:
  * grep the sources so a future edit cannot quietly grow a second
  * implementation back.
  */
class RenameRetirementAuditSpec extends AnyFunSuite {

  private def mainSources: Seq[java.nio.file.Path] = {
    val root = java.nio.file.Paths.get("src/main/scala")
    val st = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.filter(_.toString.endsWith(".scala")).toVector
    } finally st.close()
  }

  private def codeLines(p: java.nio.file.Path): Seq[(Int, String)] =
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .split("\n", -1).toSeq.zipWithIndex
      .map { case (l, i) => (i + 1, l) }
      .filterNot { case (_, l) =>
        val t = l.trim
        t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
      }

  test("IndexCommit is deleted and unreferenced by any production code") {
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get("src/main/scala/graft/util/IndexCommit.scala")),
      "the rename commit module must stay deleted")
    val refs = for {
      p <- mainSources
      (n, l) <- codeLines(p) if l.contains("IndexCommit")
    } yield s"$p:$n: ${l.trim}"
    assert(refs.isEmpty,
      s"production code must not reference the retired IndexCommit:\n${refs.mkString("\n")}")
  }

  test("the retired protocol value appears only at its declaration and the CLI parse") {
    val allowed = Set(
      "src/main/scala/graft/util/ManifestTiered.scala", // sealed-trait decl + forBuild refusal
      "src/main/scala/graft/jobs/JobRunner.scala")      // CLI parse → forBuild's loud refusal
    val refs = for {
      p <- mainSources if !allowed.contains(p.toString)
      (n, l) <- codeLines(p)
      if l.contains("CommitProtocol.Rename") || l.matches(""".*\bcase Rename\b.*""")
    } yield s"$p:$n: ${l.trim}"
    assert(refs.isEmpty,
      s"no production path may dispatch on the retired protocol:\n${refs.mkString("\n")}")
  }

  test("the legacy rename tree has exactly one production reader: adoption") {
    // the physical legacy dir names (`<t>_l1`, `<t>_tail`, `committed`)
    // may appear in code only inside ManifestTiered (adoptRenameTiered +
    // clearRenameLayout — the adopter and the post-rebuild GC)
    val refs = for {
      p <- mainSources
      if p.toString != "src/main/scala/graft/util/ManifestTiered.scala" &&
        // ManifestCommit's "committed" is the manifest LINE-FORMAT key
        // (committed batch-id state), not the legacy committed/ dir
        p.toString != "src/main/scala/graft/util/ManifestCommit.scala"
      (n, l) <- codeLines(p)
      if l.contains("\"committed\"") ||
        l.matches(""".*s?"[^"]*_(l1|tail|delta)(/[^"]*)?".*""")
    } yield s"$p:$n: ${l.trim}"
    assert(refs.isEmpty,
      s"legacy rename-layout paths must only be read by adoption:\n${refs.mkString("\n")}")
  }
}
