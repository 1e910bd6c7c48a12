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

  /** EXACT triangle count of an undirected graph (columns `u`, `v`, one row
    * per unordered edge u < v), scale-shaped in three moves:
    *
    *  1. DEGREE-ORDERED ORIENTATION: each edge points from its
    *     (degree, id)-smaller endpoint, so every triangle is an out-wedge
    *     of its lowest-degree node — per-node fan-out is Σ outdeg² with
    *     outdeg ≤ O(√m) even on celebrity hubs.
    *  2. ADJACENCY-ARRAY WEDGE ENUMERATION (round-10 rework): out-neighbors
    *     are grouped per node into ONE sorted array (sorted by (deg, id),
    *     so pairs i<j are already in orientation order and each {b, c} is
    *     enumerated once as b→c). The wedge stream — the inherent Σ
    *     outdeg(outdeg−1)/2 cost, 41M at sf0.1 / ~4.1B at sf10 — is walked
    *     as index pairs in a tight per-partition loop and NEVER materializes
    *     as rows: the round-9 row-stream form spent most of its 432 s at
    *     sf10 manufacturing 4.1B Tungsten rows that the bloom immediately
    *     dropped.
    *  3. BLOOM-PREFILTERED CLOSING EDGE: a bloom over xxhash64 of the
    *     oriented edges (bits ∝ m — broadcastable at cluster scale where a
    *     per-executor exact edge set is not) is probed INSIDE the pair loop;
    *     only survivors ≈ triangles + fpp·wedges become rows and reach the
    *     exact closing-edge semi-join. No false negatives by construction;
    *     the semi-join keeps the count exact regardless of fpp.
    *
    * The pair loop replicates the plan-side hash exactly:
    * xxhash64(struct(s, t)) = XXH64.hashLong(t, XXH64.hashLong(s, 42)) —
    * Spark's HashExpression folds struct fields left-to-right with the
    * running hash as seed (pinned in GraphOpsSpec so a Spark-internal
    * change fails loudly, not as silent candidate loss).
    *
    * mapPartitions is deliberate (the "last resort" that is genuinely
    * fastest here): the enumeration is per-partition imperative iteration
    * over generated index pairs — declaring it as a self-join forces one
    * row per wedge through the whole operator pipeline.
    *
    * Runs eagerly (localCheckpoint, the [[bfsHops]] contract) so the
    * orientation cache never strands storage on a long-lived session.
    * Returns one row (n_triangles). */
  def triangleCount(edges: DataFrame, fpp: Double = 0.01): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"))
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val uLow = col("du") <= col("dv") // e has u < v: ties keep u→v
    val eo = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(when(uLow, col("u")).otherwise(col("v")).as("s"),
        when(uLow, col("v")).otherwise(col("u")).as("t"),
        when(uLow, col("dv")).otherwise(col("du")).as("dt"))
      .cache()
    try {
      val m = eo.count() // materializes the cache; sizes the bloom filter
      // zero edges → zero triangles; the bloom aggregate returns a null
      // buffer over zero rows, so short-circuit rather than NPE
      if (m == 0)
        return spark.range(1).select(lit(0L).as("n_triangles"))
      triangleCountFrom(eo, m, fpp)
    } finally eo.unpersist()
  }

  /** The triangle kernel over an already-oriented (s, t, dt) relation with
    * known edge count `m` — split out (private[graft]) so the perf
    * rehearsal can feed it a STORED s-bucketed orientation, which removes
    * the adjacency groupBy(s) Exchange and the closing-edge semi-join's
    * eo-side shuffle (graft.perf.TriangleSweep measures whether that pays
    * at sf10). Same exactness contract as [[triangleCount]]. */
  private[graft] def triangleCountFrom(eo: DataFrame, m: Long,
      fpp: Double): DataFrame = {
    val spark = eo.sparkSession
    locally {
      // [[Bloom.build]] raises the runtime-filter size clamps (4M items /
      // 64M bits — a SATURATED bloom past them passes everything: correct,
      // invisible to oracles, pure perf cliff, caught by the sf10 sweep)
      val bloom = Bloom.build(eo, struct(col("s"), col("t")),
        expectedItems = m, fpp = fpp)
      val bcBloom = spark.sparkContext.broadcast(bloom)
      try {
      // one row per source node: out-neighbors sorted by (deg, id) — the
      // groupBy reuses nothing downstream, and array payload totals m ids
      val adj = eo.groupBy(col("s"))
        .agg(sort_array(collect_list(struct(col("dt").as("d"),
          col("t").as("t")))).as("ns"))
        .select(col("ns.t").as("ns"))
      // typed Dataset path, NOT createDataFrame(RDD[Row]): the external-Row
      // route pays a GenericRow allocation + CatalystTypeConverters pass per
      // candidate (hundreds of millions of rows); the Array[Long] and
      // specialized (Long, Long) encoders stay on primitive codegen'd
      // serialization both ways
      import spark.implicits._
      val candidates = adj.as[Array[Long]]
        .mapPartitions { arrays =>
          val bf = bcBloom.value
          arrays.flatMap { arr =>
            val n = arr.length
            if (n < 2) Iterator.empty
            else new scala.collection.AbstractIterator[(Long, Long)] {
              import org.apache.spark.sql.catalyst.expressions.XXH64
              private var i = 0
              private var j = 1
              private var done = false
              private var b = 0L
              private var c = 0L
              private def advance(): Unit = {
                done = true
                while (done && i < n - 1) {
                  val h = XXH64.hashLong(arr(j), XXH64.hashLong(arr(i), 42L))
                  if (bf.mightContainLong(h)) { b = arr(i); c = arr(j); done = false }
                  j += 1
                  if (j == n) { i += 1; j = i + 1 }
                }
              }
              advance()
              def hasNext: Boolean = !done
              def next(): (Long, Long) = {
                val r = (b, c); advance(); r
              }
            }
          }
        }
        .toDF("b", "c")
      candidates
        .join(eo.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"),
          "left_semi")
        .agg(count(lit(1)).as("n_triangles"))
        .localCheckpoint(true)
      // the eager localCheckpoint above materialized the count, so no
      // executor needs the bloom again — release its tens of MB (bits ∝ m)
      // now rather than waiting for GC-driven ContextCleaner cleanup
      } finally bcBloom.destroy()
    }
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
