package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Scale guard over unpartitioned windows (round-5 verdict task 7): a
  * `WindowExec` with an empty partition spec moves ALL rows to one
  * partition — at 100 TB that is a single-executor bottleneck unless the
  * windowed relation is provably bounded (a fixed domain, a pre-aggregated
  * rollup, or a top-k already cut to k rows). Every registered query that
  * plans one must appear below with the bound that keeps it safe; anything
  * unlisted fails the build. This turns the "trace each WindowExec warning
  * to a bounded domain" audit from a per-round manual step into CI.
  */
class WindowGuardSpec extends AnyFunSuite {
  import SharedSpark._

  /** Queries allowed an unpartitioned window, with the bound that makes the
    * single partition safe (rows reaching the window, not corpus rows). */
  private val unpartitionedAllowed: Map[String, String] = Map(
    "q_window_lag" -> "month-grain aggregate: rows = calendar months in the corpus date range",
    "q_vocab_topk" -> "rank over the term-frequency AGGREGATE: vocabulary-bounded (sublinear in corpus, Heaps' law), and the operator's contract is a global top-100 cut",
    "q_zipf_slope" -> "rank over the term-frequency aggregate: vocabulary-bounded (Heaps' law); the Zipf regression needs global ranks by definition",
    "q_corpus_shuffle" -> "globalRunningSum offsets branch: rows = shuffle partition count (32), the data-sized branch windows WITHIN partitions",
    "q_corpus_pack" -> "same globalRunningSum offsets branch as q_corpus_shuffle (<= 32 rows)",
    "q_vocab_growth" -> "globalRunningSumAuto offsets branch (<= 32 rows); the corpus/50-row bucket curve itself is range-partitioned since the round-6 audit",
    "q_split_drift" -> "rows = split-bucket x length-bucket grid (<= 64 by construction)",
    "q_weighted_median_len" -> "cumulative over the distinct-length aggregate: rows bounded by max document token count",
    "q_ks_test" -> "cumulative over the $1000 price-bin grid: rows = price range / 1000",
    "q_survival_km" -> "cumulative over the distinct-duration aggregate: rows bounded by the observation window in days",
    "q_orders_backlog" -> "day-grain net-change aggregate: rows = distinct days in the corpus date range")

  private def unpartitionedWindows(plan: SparkPlan): Seq[WindowExec] = {
    def walk(p: SparkPlan): Seq[WindowExec] = {
      val here = p match {
        case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
        case _ => Seq.empty
      }
      val sub = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ => Seq.empty
      }
      here ++ sub ++ p.children.flatMap(walk) ++
        p.subqueries.flatMap(walk)
    }
    walk(plan)
  }

  test("unpartitioned windows appear only over provably bounded domains") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    for (q <- Registry.all) {
      val wins = unpartitionedWindows(
        q.build(spark, sf).queryExecution.executedPlan)
      if (wins.nonEmpty && !unpartitionedAllowed.contains(q.name))
        offenders += q.name
    }
    assert(offenders.isEmpty,
      s"unlisted unpartitioned windows in: ${offenders.mkString(", ")}")
  }
}
