package graft.perf

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.Tables
import graft.queries.Registry

/** Empirical per-stage breakdown of a registry query (optimization guide
  * §1.1): run the query through the bench's no-op sink with a stage listener
  * and print, per completed stage, wall time, task count, input /
  * shuffle-read / shuffle-write volume. Run it on a warmed JVM: one throwaway
  * execution first, then the measured one, so JIT noise doesn't swamp the
  * stage attribution.
  *
  * Usage: runMain graft.perf.StageProbe <name> [name...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as Bench.
  */
object StageProbe {

  private case class StageRow(id: Int, name: String, tasks: Int,
      runtimeMs: Long, wallMs: Long, inputMB: Double, srMB: Double,
      swMB: Double, rows: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.register(spark, sfDir)
    val byName = Registry.byName
    val rows = mutable.ArrayBuffer.empty[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for (s <- si.submissionTime; c <- si.completionTime)
          yield c - s).getOrElse(-1L)
        rows.synchronized {
          rows += StageRow(si.stageId, si.name.takeWhile(_ != '\n'),
            si.numTasks, m.executorRunTime, wall,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.remoteBytesRead / 1e6 +
              m.shuffleReadMetrics.localBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.inputMetrics.recordsRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    args.foreach { n =>
      def run(): Unit = byName(n).build(spark, sfDir)
        .foreachPartition((it: Iterator[org.apache.spark.sql.Row]) =>
          { var x = 0L; while (it.hasNext) { it.next(); x += 1 } })
      run() // warm-up execution (JIT + page cache + any in-query cache)
      rows.synchronized(rows.clear())
      spark.sparkContext.setJobDescription(s"probe:$n")
      val t0 = System.nanoTime()
      run()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      println(f"[probe] $n%s total=$sec%.3f s")
      rows.synchronized {
        rows.sortBy(-_.wallMs).foreach { r =>
          println(f"[probe]   stage ${r.id}%4d wall=${r.wallMs}%6d ms " +
            f"cpu=${r.runtimeMs}%6d ms tasks=${r.tasks}%3d " +
            f"in=${r.inputMB}%8.2f MB sr=${r.srMB}%8.2f MB " +
            f"sw=${r.swMB}%8.2f MB rows=${r.rows}%9d  ${r.name}%s")
        }
      }
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
