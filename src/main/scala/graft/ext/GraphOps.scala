package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation over a weighted edge list — the
  * Pregel-by-joins shape: each superstep is one (src-keyed) join of the
  * edge table against the current rank table plus one dst-keyed
  * aggregation. No driver-side graph state; at cluster scale the edge
  * table stays partitioned by src across supersteps and only the
  * (|nodes|-sized) rank table moves.
  *
  * All arithmetic is scaled 64-bit integer (ranks at 1e12, transition
  * probabilities at 1e6), so results are bit-identical across engines,
  * partitionings, and runs — floating-point PageRank is order-dependent
  * under parallel summation, which would break the cross-engine oracle.
  * Floor division on non-negative operands behaves identically in Spark
  * (`div`) and ANSI SQL (`//`).
  */
object GraphOps {

  /** Rank scale: ranks are longs in units of 1e-12 (they sum to ~1e12). */
  val RankScale = 1000000000000L

  /** Probability scale for per-edge transition weights. */
  val ProbScale = 1000000L

  /** PageRank over `edges` (columns `src`, `dst`, `w` — long weights),
    * with damping `dampPct`/100 and `iters` synchronous supersteps.
    *
    * Returns (node, r) with r at [[RankScale]]. Dangling mass is not
    * redistributed (the teleport term keeps every node alive); nodes are
    * the union of both endpoint sets. The node count participates as a
    * ONE-ROW aggregate broadcast-crossed into the rank table, keeping the
    * whole computation in-plan (no eager driver count).
    */
  def pageRankScaled(edges: DataFrame, iters: Int = 10, dampPct: Int = 85): DataFrame = {
    require(iters >= 0 && dampPct >= 0 && dampPct <= 100)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
    val nRow = nodes.agg(count(lit(1)).as("n"))
    // loop-invariant tables are cached: every superstep references them,
    // and without materialization the plan re-derives the edge subtree
    // once per iteration (10× the scan work, 10× the tree)
    val withN = nodes.crossJoin(broadcast(nRow)).cache()

    // per-edge transition probability at 1e6: floor((w * 1e6) / out_w)
    val out = edges.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val p6 = edges.join(out, "src")
      .select(col("src"), col("dst"),
        expr(s"(w * $ProbScale) div out_w").as("p6"))
      .cache()

    var rank = withN.select(col("node"), col("n"),
      expr(s"${RankScale}L div n").as("r"))
    for (_ <- 1 to iters) {
      // incoming mass per node at scale 1e18 (p6 * r12), folded back to 1e12
      val contrib = p6
        .join(broadcast(rank.select(col("node").as("src"), col("r"))), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("p6") * col("r")).as("s18"))
      rank = withN
        .join(broadcast(contrib), Seq("node"), "left")
        .select(col("node"), col("n"),
          expr(s"(${RankScale}L * ${100 - dampPct}) div (100 * n)" +
            s" + ((coalesce(s18, 0L) div $ProbScale) * $dampPct) div 100").as("r"))
    }
    rank.select(col("node"), col("r"))
  }

  /** Breadth-first hop distance from a seed set, `maxHops` synchronous
    * supersteps — the bounded-depth stand-in for a recursive CTE (which
    * Spark lacks). Each superstep expands ONLY the previous frontier (one
    * src-keyed join) and anti-joins the visited set, so total work is
    * O(edges touched), not O(edges × hops); with integer hop labels the
    * result is engine- and partitioning-independent.
    *
    * At cluster scale the edge table stays hash-partitioned by `src`
    * across supersteps (a bucketed edge table never reshuffles) and only
    * frontier/visited tables — bounded by |nodes| — move. The loop count
    * is a plan-depth constant, the same contract as [[pageRankScaled]].
    *
    * @param edges directed (src, dst) pairs; symmetrize before calling for
    *              an undirected graph
    * @param seeds one column `node`
    * @return (node, hops) for every node within `maxHops` of a seed;
    *         seeds themselves at hops = 0
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val e = edges.select(col("src"), col("dst")).cache()
    // cache each level: later levels and the final union re-read it, and an
    // uncached frontier would re-derive the whole lineage per superstep
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      var visited = seeds.select(col("node")).distinct()
        .withColumn("hops", lit(0L)).cache()
      cached += visited
      var frontier = visited
      for (h <- 1 to maxHops) {
        val next = frontier
          .join(e, frontier("node") === e("src"))
          .select(col("dst").as("node")).distinct()
          .join(visited.select("node"), Seq("node"), "left_anti")
          .withColumn("hops", lit(h.toLong))
          .cache()
        visited = visited.union(next).cache()
        cached += next
        cached += visited
        frontier = next
      }
      // materialize, then release the loop's cache — repeated calls on a
      // long-lived session must not strand storage memory (the
      // connectedComponents contract); checkpointing also truncates the
      // per-level nested lineage
      visited.localCheckpoint(true)
    } finally {
      cached.foreach(_.unpersist())
      e.unpersist()
    }
  }
}
