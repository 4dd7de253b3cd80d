package graft.tools

/** Prints the query registry: every registered name and whether it carries
  * a DuckDB oracle. Diagnostic only (driver-independent).
  */
object Registry {
  def main(args: Array[String]): Unit = {
    val defs = graft.SparkEntry.allDefs
    println(s"N=${defs.size} oracled=${defs.count(_.oracle.isDefined)}")
    defs.sortBy(_.name).foreach { d =>
      println((if (d.oracle.isDefined) "ORACLE   " else "NOORACLE ") + d.name)
    }
  }
}
