package graft

import graft.queries.Registry

object DebugExplain {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("explain", "16")
    val sf = "/root/testdata/sf0.1"
    for (name <- args) {
      println(s"===== $name =====")
      Registry.byName(name).build(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
