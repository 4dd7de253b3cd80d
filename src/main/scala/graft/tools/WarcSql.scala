package graft.tools

import graft.util.Sessions

/** Ad-hoc SQL over WARC archives via the DSv2 source:
  *   runMain graft.tools.WarcSql <pathOrDir> <sql...>
  * The archives are exposed as temp view `warc` with schema
  * (path, warc_type, target_uri, warc_date, content_type, headers, payload).
  */
object WarcSql {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: WarcSql <pathOrDir> <sql>")
    val spark = Sessions.local(appName = "warc-sql")
    graft.functions.CosineSimilarity.register(spark)
    spark.read.format("warc").load(args(0)).createOrReplaceTempView("warc")
    val sql = args.drop(1).mkString(" ")
    spark.sql(sql).show(50, truncate = false)
    spark.stop()
  }
}
