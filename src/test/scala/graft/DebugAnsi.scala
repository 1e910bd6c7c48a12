package graft

object DebugAnsi {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("ansi-check", "2")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    println("GRAFT_ANSI=" + spark.conf.get("spark.sql.ansi.enabled"))
    try {
      val r = Seq(Long.MaxValue / 2).toDF("id")
        .select(shiftrightunsigned(col("id") * lit(2654435761L), 33)).collect()
      println("GRAFT_OVERFLOW_OK " + r(0))
    } catch { case e: Throwable =>
      println("GRAFT_OVERFLOW_THROWS " + e.getMessage.take(120)) }
    spark.stop()
  }
}
