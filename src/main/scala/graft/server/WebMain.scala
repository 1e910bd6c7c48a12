package graft.server

/** Standalone web entrypoint: fixture views + HTTP API + browser UI on a
  * fixed port (reference runs its UI the same way — one process serving
  * the api routes and the single-file console). Port from arg 0 (default 8765);
  * if SPARK_GRAFT_SF_DIR is set, the driver parquet tables are registered
  * alongside the SAP fixtures so dev-mode SQL can query both.
  */
object WebMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8765)
    val spark = graft.Tables.session("graft-web",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("ERROR")
    graft.data.SapFixtures.register(spark)
    sys.env.get("SPARK_GRAFT_SF_DIR").foreach(graft.Tables.register(spark, _))
    val server = ApiServer.start(spark, port)
    println(s"graft web console on http://localhost:${server.getAddress.getPort}/")
    Thread.currentThread.join()
  }
}
