package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Scale design (100 TB): brute force is the exact baseline — a broadcast of
  * the (small) query set against a partitioned corpus, no shuffle at all on
  * the corpus side. The LSH variant buckets the corpus once (narrow map) and
  * turns top-k search into a bucket-key equi-join — the corpus is never
  * crossed with itself. The cosine kernel is a higher-order-function
  * expression (zip_with/aggregate), evaluated per-partition with no UDF
  * serialization boundary.
  */
object Similarity {

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Dot product of two array<float|double> columns as double, summed in
    * array order (deterministic). Native codegen'd kernel
    * ([[graft.functions.VecDot]]) — value-identical to the former
    * aggregate(zip_with(...)) fold (same order, same 0.0 init, same null
    * semantics) but one tight JVM loop per row instead of an interpreted
    * lambda per element: this is the innermost op of every KNN/ANN/SemDeDup
    * scoring join. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(graft.functions.VecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Integer dot over array<bigint> (the int8-quantized kernels) — native,
    * exact, order-independent. */
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(graft.functions.VecDotLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm via the native dot: sqrt(Σ xᵢ², same fold the HOF form used). */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with every degenerate input mapped to 0.0: try_divide
    * absorbs the zero-norm division (which plain `/` RAISES under ANSI —
    * Spark 4's default), nanvl the NaN a 0/0 can yield, coalesce the null.
    * The ONE expression every probe-ORDER consumer shares —
    * [[ivfProbes]] (the order search actually probes) and
    * [[AnnIndex.profileProbes]]/[[AnnIndex.fitProfile]] (the order the
    * profiler ranks and the fit journal scores) — so "profiled rank ≤
    * nprobe ≡ searchIvf probes that cell" holds for EVERY input by
    * construction, not just for well-formed vectors (round-16 advice: the
    * two paths previously used different degenerate-input forms, so
    * zero-norm queries profiled one order and probed another). */
  def cosineSimOrZero(a: Column, b: Column): Column =
    coalesce(nanvl(try_divide(dot(a, b), l2norm(a) * l2norm(b)),
      lit(0.0)), lit(0.0))

  /** Shared ranking tail for every KNN kernel: per-`qid` top-k by
    * (score DESC, `cid` ASC) — semantics of `row_number() OVER
    * (PARTITION BY qid ORDER BY score DESC, cid) <= k`, but computed with
    * the BOUNDED aggregate ([[graft.functions.TopKStructAgg]] via
    * `Skew.topKPerKey`, round 11): the window form sorts a corpus-sized
    * partition per query in one task (the per-query candidate set IS the
    * corpus for exact KNN), while the aggregate reduces each query to k
    * rows per map partition before any shuffle. Row-identical (the
    * q_embed_knn* oracles pin it). The `cid` tie-break (negated inside the
    * order struct), the `.cast("long")` on rk, and the column order are
    * oracle-parity-critical — keep exactly one copy. */
  private def topKByScore(scored: DataFrame, scoreCol: String, k: Int): DataFrame =
    graft.perf.Skew.topKPerKey(
      scored.select(col("qid"), col("cid"), col(scoreCol)), Seq("qid"),
      struct(col(scoreCol), (-col("cid")).as("__nc")), k)
      .select(col("qid"), (-col("__nc")).as("cid"), col(scoreCol),
        col("rk").cast("long").as("rk"))

  /** Ascending-distance twin of [[topKByScore]]: per-`qid` top-k by
    * (`distCol` ASC, `cid` ASC) — both axes negated inside the order
    * struct so the bounded keep-largest aggregate keeps the SMALLEST
    * distances. Double negation round-trips IEEE doubles exactly (sign
    * flip), and a +0.0 distance maps to -0.0 and back to +0.0. */
  private def topKByDistance(scored: DataFrame, distCol: String, k: Int): DataFrame =
    graft.perf.Skew.topKPerKey(
      scored.select(col("qid"), col("cid"), col(distCol)), Seq("qid"),
      struct(negate(col(distCol)).as("__nd"), (-col("cid")).as("__nc")), k)
      .select(col("qid"), (-col("__nc")).as("cid"),
        negate(col("__nd")).as(distCol), col("rk").cast("long").as("rk"))

  /** Exact top-k cosine neighbors of each query vector over the corpus.
    * `queries` is expected to be small (broadcast side). */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (round(dot(col("qe"), col("ce")) / (l2norm(col("qe")) * l2norm(col("ce"))), 6)
          + lit(0.0)).as("cos")) // + 0.0 folds IEEE -0.0 to 0.0 (oracle parity)
    topKByScore(scored, "cos", k)
  }

  /** Hard-negative mining for contrastive training: for each query vector,
    * the top-k most cosine-similar CROSS-LABEL vectors — near the anchor in
    * embedding space but of a different class, the negatives that carry
    * training signal. Same broadcast shape as [[cosineTopK]] (small query
    * side broadcast, corpus never shuffled); the label inequality rides the
    * join condition, so same-label candidates are dropped before scoring. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
      col("label").as("qlabel"))
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("label").as("clabel"))
    val scored = c.join(broadcast(q),
        col("qid") =!= col("cid") && col("qlabel") =!= col("clabel"))
      .select(col("qid"), col("qlabel"), col("cid"),
        (round(dot(col("qe"), col("ce")) / (l2norm(col("qe")) * l2norm(col("ce"))), 6)
          + lit(0.0)).as("cos")) // + 0.0 folds IEEE -0.0 to 0.0 (oracle parity)
    // same bounded-aggregate tail as topKByScore, with the query label
    // riding as a second (functionally dependent) group key
    graft.perf.Skew.topKPerKey(
      scored.select(col("qid"), col("qlabel"), col("cid"), col("cos")),
      Seq("qid", "qlabel"),
      struct(col("cos"), (-col("cid")).as("__nc")), k)
      .select(col("qid"), col("qlabel"), (-col("__nc")).as("cid"),
        col("cos"), col("rk").cast("long").as("rk"))
  }

  /** Johnson–Lindenstrauss random projection to `outDims` dimensions with a
    * DETERMINISTIC ±1 sign matrix (Achlioptas 2003 database-friendly form):
    * sign(i,j) = parity of a Lehmer-then-square hash of the flattened cell
    * index — the squaring step makes the hash NONLINEAR in the index, which
    * matters: any affine scheme (LCG bits, multiplicative-hash bits) makes
    * sign columns affine shifts of each other, and for unlucky offsets two
    * output dimensions collapse to near-duplicates (measured Gram
    * off-diagonals up to 56/64 before this form; ≤ 18/64 after). Pure
    * int64-safe integer arithmetic — the same matrix materializes on any
    * engine with no RNG and no stored state. y_j =
    * Σᵢ s(i,j)·xᵢ / √outDims; per-term products are cast to DECIMAL once
    * (deterministic rounding) and decimal-summed, so the projection is
    * partitioning-independent. Returns LONG format (vec_id, j, y) — the
    * fan-out is |vec|·outDims, a narrow map + one (vec_id, j) aggregation;
    * at 100 TB this is the sketch that makes downstream pair work run on
    * 16 dims instead of 64. */
  def randomProjectLong(emb: DataFrame, outDims: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ex = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "x")))
      // 1-based dim index: the oracle's UNNEST(generate_series) is 1-based,
      // and the sign depends on the index value
      .select(col("vec_id"), (col("p") + 1).cast("long").as("i"),
        col("x").cast("double").as("x"))
    val fan = ex.select(col("vec_id"), col("i"), col("x"),
      explode(expr(s"sequence(1L, ${outDims}L)")).as("j"))
    // k = flattened cell index; h1 = Lehmer step (MINSTD), h2 = h1² mod p —
    // the nonlinear mix; sign = parity of h2
    val sign = s"""cast(1 - 2 * (
      ((((((i - 1) * $outDims + j) * 48271) % 2147483647)
        * ((((i - 1) * $outDims + j) * 48271) % 2147483647)) % 2147483647) % 2
      ) as double)"""
    fan
      .select(col("vec_id"), col("j"),
        (col("x") * expr(sign)).cast(DecimalType(28, 10)).as("term"))
      .groupBy("vec_id", "j")
      .agg(round((sum(col("term")).cast("double") / lit(math.sqrt(outDims.toDouble))), 6)
        .as("y"))
  }

  /** Symmetric per-vector int8 quantization: scale = max |x_i|, each element
    * maps to round-half-up(x / scale · 127) ∈ [-127, 127] (the storage form
    * that shrinks an embedding corpus 4× and feeds int8 SIMD distance
    * kernels). Half-up is spelled floor(v + 0.5) — pure IEEE double ops, so
    * the result is bit-identical on any engine (a library `round` may be
    * half-even). Narrow map, no shuffle; an all-zero vector quantizes to
    * zeros. Keeps (id, xd double view, scale, q array<bigint>); compose with
    * [[dequantizeInt8]] for the reconstruction. */
  def quantizeInt8(emb: DataFrame, idCol: String, embCol: String): DataFrame =
    emb
      .select(col(idCol).as("vec_id"),
        expr(s"transform($embCol, x -> cast(x as double))").as("xd"))
      .withColumn("scale", expr("array_max(transform(xd, x -> abs(x)))"))
      .withColumn("q", expr(
        """CASE WHEN scale = 0.0D THEN transform(xd, x -> 0L)
          |ELSE transform(xd, x -> cast(floor(x / scale * 127.0D + 0.5D) as bigint))
          |END""".stripMargin))

  /** Reconstruction of a quantized vector: q_i · scale / 127 as
    * array<double>. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale / lit(127.0))

  /** Exact top-k cosine neighbors over int8-QUANTIZED vectors — the search
    * kernel quantization exists for: the integer dot runs 4× smaller data
    * (int8 SIMD on a real cluster), and the per-vector scales cancel in the
    * cosine (cos(ŝa·qa, ŝb·qb) = Σqa·qb / (|qa||qb|)), so scoring is pure
    * integer sums → one sqrt — deterministic on any engine. Same broadcast
    * shape as [[cosineTopK]]: small query side broadcast, corpus never
    * shuffled. A zero vector scores 0 against everything. */
  def cosineTopKInt8(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    def quantized(df: DataFrame, idAs: String, qAs: String) =
      // empty vectors are excluded, matching the per-element-expansion oracle
      // (UNNEST emits no rows for them, so they never reach nsq/dots there)
      quantizeInt8(df.filter(size(col("embedding")) > 0), "vec_id", "embedding")
        .select(col("vec_id").as(idAs), col("q").as(qAs),
          dotLong(col("q"), col("q")).as(s"${qAs}_nsq"))
    val c = quantized(corpus, "cid", "cq")
    val q = quantized(queries, "qid", "qq")
    val qdot = dotLong(col("qq"), col("cq"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (round(when(col("qq_nsq") === 0 || col("cq_nsq") === 0, lit(0.0))
          .otherwise(qdot.cast("double") /
            (sqrt(col("qq_nsq").cast("double")) * sqrt(col("cq_nsq").cast("double")))), 6)
          + lit(0.0)).as("cos_q")) // + 0.0 folds IEEE -0.0 (oracle parity)
    topKByScore(scored, "cos_q", k)
  }

  /** Deterministic random-hyperplane signs for `planes` hyperplanes in
    * `dims` dimensions (public sign-LSH construction, Charikar 2002).
    * `seed` varies per hash table. */
  private def planeLiterals(planes: Int, dims: Int, seed: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(7 + seed)
    Seq.fill(planes)(Seq.fill(dims)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** The hyperplane sign patterns as '+'/'-' strings (one per plane, one char
    * per dimension) — lets an external engine (the DuckDB oracle) reproduce
    * [[lshBucket]] exactly from compact SQL literals. */
  def planePatterns(planes: Int, dims: Int, seed: Int): Seq[String] =
    planeLiterals(planes, dims, seed)
      .map(_.map(x => if (x > 0) "+" else "-").mkString)

  /** Sign-LSH bucket id (one int, `planes` bits) for each vector. A narrow
    * map — the bucketing itself never shuffles. */
  def lshBucket(emb: Column, planes: Int, dims: Int, seed: Int = 0): Column = {
    val ps = planeLiterals(planes, dims, seed)
    ps.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(emb, planeCol) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** All (table, bucket) keys for multi-table sign-LSH: L independent hash
    * tables of `planes` bits each. Recall for neighbors at angle θ is
    * 1-(1-(1-θ/π)^planes)^tables — tune (planes, tables) to the corpus. */
  def lshKeys(emb: Column, planes: Int, dims: Int, tables: Int): Column =
    array((0 until tables).map(t =>
      struct(lit(t).as("tbl"), lshBucket(emb, planes, dims, t).as("bucket"))): _*)

  /** Approximate top-k cosine neighbors: candidates = any shared (table,
    * bucket) key, then exact cosine on candidates only. The corpus is
    * bucketed in one narrow map and joined on the bucket key — never crossed
    * with itself (this is the 100 TB path; brute force is the oracle). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 6, dims: Int = 64, tables: Int = 8): DataFrame = {
    val keys = corpus
      .select(col("vec_id"),
        explode(lshKeys(col("embedding"), planes, dims, tables)).as("key"))
      .select(col("vec_id"), col("key.tbl").as("tbl"),
        col("key.bucket").as("bucket"))
    lshSearch(keys, corpus.select(col("vec_id"), col("embedding")),
      queries, k, planes, dims, tables)
  }

  /** LSH SEARCH half over a prebuilt bucket index (`keys` = (vec_id, tbl,
    * bucket), `vectors` = (vec_id, embedding)): query keys join the stored
    * buckets, candidate (qid, cid) pairs are deduped as SKINNY id pairs
    * (the round-8 change — the previous shape carried both embeddings
    * through the distinct), then exact cosine on candidates only. Shared
    * verbatim by [[lshTopK]] (in-memory keying) and [[AnnIndex]]
    * (parquet-persisted buckets). */
  def lshSearch(keys: DataFrame, vectors: DataFrame, queries: DataFrame,
      k: Int, planes: Int, dims: Int, tables: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(lshKeys(col("embedding"), planes, dims, tables)).as("key"))
      .select(col("qid"), col("qe"), col("key.tbl").as("tbl"),
        col("key.bucket").as("bucket"))
    val cands = keys.join(broadcast(q.select(col("qid"), col("tbl"), col("bucket"))),
        Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid")).distinct()
    val scored = cands
      .join(vectors.select(col("vec_id").as("cid"), col("embedding").as("ce")),
        Seq("cid"))
      .join(broadcast(queries.select(col("vec_id").as("qid"),
        col("embedding").as("qe"))), Seq("qid"))
      .select(col("qid"), col("cid"),
        (round(dot(col("qe"), col("ce")) / (l2norm(col("qe")) * l2norm(col("ce"))), 6)
          + lit(0.0)).as("cos"))
    topKByScore(scored, "cos", k)
  }

  /** Exact top-k neighbors by squared L2 distance (the baseline PQ/ADC
    * approximates — PQ quantizes L2 space, not the angular metric). Same
    * broadcast shape as [[cosineTopK]]: small query side broadcast, corpus
    * never shuffled. Ranked ascending by distance, tie → cid. */
  def l2TopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        aggregate(zip_with(col("qe"), col("ce"), (x, y) => {
          val d = x.cast("double") - y.cast("double")
          d * d
        }), lit(0.0), (acc, v) => acc + v).as("d2"))
    topKByDistance(scored, "d2", k)
  }

  /** recall@k of an approximate KNN result against an exact baseline:
    * per qid, |approx ∩ exact| / |exact| over the (qid, cid) hit sets. Two
    * qid-keyed joins over k·|queries| rows — evaluation-sized, not
    * corpus-sized. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("qid"), col("cid"))
    val e = exact.select(col("qid"), col("cid"))
    val tot = e.groupBy("qid").agg(count(lit(1)).as("n_exact"))
    val hits = a.join(e, Seq("qid", "cid"))
      .groupBy("qid").agg(count(lit(1)).as("__h"))
    tot.join(hits, Seq("qid"), "left")
      .select(col("qid"), col("n_exact"),
        round(coalesce(col("__h"), lit(0L)).cast("double") /
          col("n_exact").cast("double"), 6).as("recall_at_k"))
  }

  /** Hit rate of an approximate top-k within a WIDER exact top-R (R ≥ k):
    * per qid, |approx ∩ exactTopR| / |approx| — the relaxed ANN quality
    * metric for corpora where the exact top-k margins are thin (an
    * approximate neighbor landing anywhere in the true top-R is a hit).
    * Same evaluation-sized join shape as [[recallAtK]]. */
  def hitRateAtK(approx: DataFrame, exactTopR: DataFrame): DataFrame = {
    val a = approx.select(col("qid"), col("cid"))
    val e = exactTopR.select(col("qid"), col("cid"))
    val tot = a.groupBy("qid").agg(count(lit(1)).as("n_approx"))
    val hits = a.join(e, Seq("qid", "cid"))
      .groupBy("qid").agg(count(lit(1)).as("__h"))
    tot.join(hits, Seq("qid"), "left")
      .select(col("qid"), col("n_approx"),
        round(coalesce(col("__h"), lit(0L)).cast("double") /
          col("n_approx").cast("double"), 6).as("hit_rate"))
  }

  /** Per-label centroids: element-wise mean via posexplode + one shuffle on
    * (label, dim). The per-element values are summed as DECIMAL(28,10)
    * (each float cast once — deterministic rounding on both engines), not as
    * raw doubles: float addition is order-dependent and a 32-partition
    * shuffle does not sum in the oracle's order, which flips rounding at
    * half-way cases (seen at sf0.001: -0.00005 → '-0.0001' vs '-0.0'). */
  def labelCentroids(emb: DataFrame): DataFrame = {
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg((round(
        sum(col("x").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
          .cast("double") / count(lit(1)), 4) + lit(0.0)).as("centroid"))
  }

  // ── IVF (inverted-file) ANN: the second scale path next to sign-LSH ──────

  /** Deterministic coarse centroids: the k corpus vectors with the smallest
    * xxhash64(vec_id) — a uniform pseudo-random draw over the WHOLE corpus
    * with no RNG and no stored state (the round-5 first-k-by-id bootstrap
    * drew every seed from one corner of id space, which makes skewed cells:
    * hot cells straggle and recall suffers). Distributed top-k
    * (TakeOrderedAndProject), never a global window; the k-row result gets
    * its cell ids from a window over k rows only. A Lloyd pass
    * ([[ivfRefine]], on by default in the query paths) then sharpens the
    * draw. */
  def ivfCentroids(corpus: DataFrame, k: Int): DataFrame =
    corpus.select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(k)
      .withColumn("cell",
        row_number().over(Window.orderBy(col("vec_id"))).cast("long"))
      .select(col("cell"), col("embedding").as("centroid"))

  /** Ceiling on the number of double literals the inlined-index paths
    * ([[ivfAssign]], [[pqEncode]]) will embed in the expression tree.
    * Above it the generated code / constant pool risks the JVM's 64 KB
    * method and constant-pool limits (silent interpreted fallback or
    * codegen failure), so both switch to a broadcast-join shape with
    * identical semantics — one extra shuffle-free broadcast, still never a
    * corpus shuffle. 32768 doubles covers nCells×dims up to 256×128. */
  private val InlineLiteralCeiling = 32768L

  /** Assign each corpus vector to its nearest centroid cell. The k
    * centroids are a BOUNDED index artifact (k ≤ a few hundred rows), so
    * they are collected once and inlined as a literal array: assignment is
    * then a pure NARROW MAP over the corpus — no join fan-out (the old
    * shape materialized corpus×k rows and shuffled them through a window),
    * no shuffle at all. Argmax cosine per row via an in-row fold; ties keep
    * the lowest cell (the fold visits cells in ascending order and only a
    * strictly greater sim replaces the accumulator — same tie rule as the
    * previous window's (sim DESC, cell ASC)).
    *
    * Degenerate rows are assigned DETERMINISTICALLY, never dropped: a
    * zero-norm or empty embedding has undefined cosine (NaN) against every
    * centroid — NaN never beats the accumulator, so the fold ends at its
    * -1 sentinel and the row is mapped to the LOWEST cell id (the same cell
    * an all-ties row gets). An empty centroid set fails fast with a clear
    * message instead of an analysis error. Above [[InlineLiteralCeiling]]
    * literal doubles (nCells×dims) the inline tree would overflow JVM
    * codegen limits, so assignment falls back to a broadcast join +
    * per-vector argmax with the same sim/tie/NaN semantics. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
      inlineCeiling: Long = InlineLiteralCeiling): DataFrame = {
    val cents = centroids
      .select(col("cell"),
        expr("transform(centroid, x -> cast(x as double))").as("centroid"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(cents.nonEmpty,
      "Similarity.ivfAssign: empty centroid set — train with ivfCentroids first")
    val dims = cents.head._2.length
    val fallbackCell = cents.head._1
    if (cents.length.toLong * dims > inlineCeiling) {
      // broadcast-join shape: k×dims too large to inline as literals.
      // nanvl maps undefined cosines to -inf so min(struct(-sim, cell))
      // reproduces the fold's argmax + lowest-cell tie/NaN rule exactly.
      val centsDf = centroids.select(col("cell"),
        expr("transform(centroid, x -> cast(x as double))").as("__centroid"))
      // try_divide: a zero-norm row divides by zero, which ANSI mode would
      // raise on; null/NaN both collapse to -inf so no cell ever wins and
      // the min-struct falls through to the lowest cell
      val sim = coalesce(nanvl(try_divide(dot(col("embedding"), col("__centroid")),
        l2norm(col("embedding")) * l2norm(col("__centroid"))),
        lit(Double.NegativeInfinity)), lit(Double.NegativeInfinity))
      corpus.select(col("vec_id"), col("embedding"))
        .join(broadcast(centsDf))
        .select(col("vec_id"), col("embedding"),
          struct(negate(sim).as("nsim"), col("cell")).as("__sc"))
        .groupBy("vec_id")
        .agg(first(col("embedding")).as("embedding"), min(col("__sc")).as("__best"))
        .select(col("vec_id"), col("embedding"), col("__best.cell").as("cell"))
    } else {
      val centArr = array(cents.map { case (cell, c) =>
        struct(lit(cell).as("cell"), array(c.map(lit): _*).as("centroid"))
      }: _*)
      corpus.select(col("vec_id"), col("embedding"),
        aggregate(centArr,
          struct(lit(Double.NegativeInfinity).as("sim"), lit(-1L).as("cell")),
          (acc, e) => {
            // try_divide: a zero-norm row would raise under ANSI; the null
            // it yields (like NaN) never satisfies `>`, so acc survives and
            // the finish lambda maps the -1 sentinel to the lowest cell
            val sim = try_divide(dot(col("embedding"), e.getField("centroid")),
              l2norm(col("embedding")) * l2norm(e.getField("centroid")))
            when(sim > acc.getField("sim"),
              struct(sim.as("sim"), e.getField("cell").as("cell")))
              .otherwise(acc)
          },
          acc => when(acc.getField("cell") === -1L, lit(fallbackCell))
            .otherwise(acc.getField("cell"))).as("cell"))
    }
  }

  /** One Lloyd (k-means) refinement pass: assign every vector to its
    * nearest current centroid, then re-center each cell on the member mean
    * (posexplode + one (cell, dim) shuffle, array rebuilt via sorted
    * collect). Sharpens the deterministic-by-id bootstrap cells; empty cells
    * keep their previous centroid. Deterministic — no RNG. */
  def ivfRefine(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    // decimal sum then divide (the labelCentroids pattern): float addition
    // order varies across partitionings, so avg(double) would make centroids
    // — and cell assignments near boundaries — run-to-run unstable
    val means = ivfAssign(corpus, centroids)
      .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("cell", "dim")
      .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
        .cast("double") / count(lit(1))).as("cx"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("dim"), col("cx")))).as("pairs"))
      .select(col("cell"), expr("transform(pairs, p -> p.cx)").as("refined"))
    centroids.join(means, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("refined"),
        expr("transform(centroid, x -> cast(x as double))")).as("centroid"))
  }

  /** Deterministic bounded training sample: the `cap` corpus vectors with
    * the smallest xxhash64(vec_id) — the same total order every bootstrap
    * draw uses, so the k-seed draw from the sample is bit-identical to the
    * draw from the full corpus (the smallest-k set is a prefix of the
    * smallest-cap set). Caps Lloyd/k-means TRAINING cost at a constant as
    * the corpus grows (the FAISS practice: train on a sample, encode
    * everything); below the cap the sample IS the corpus, so dev-scale
    * results are unchanged. Distributed top-cap — no full sort. The
    * re-partition after the limit is load-bearing: `limit` collapses its
    * result to ONE partition, which would serialize every downstream Lloyd
    * pass on a single core; hashing back out by vec_id keeps training
    * parallel and placement deterministic. */
  def trainingSample(corpus: DataFrame, cap: Int): DataFrame =
    corpus.select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(cap)
      .repartition(col("vec_id"))

  /** IVF top-k: probe the `nprobe` nearest cells per query, exact cosine
    * only within those cells. Search cost ~ corpus/k × nprobe instead of
    * corpus. `refineIters` Lloyd passes (default 1) sharpen the bootstrap
    * centroids before indexing; training runs on a [[trainingSample]] of at
    * most `maxTrain` vectors so index-build cost stays
    * corpus-size-independent. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nprobe: Int = 4, refineIters: Int = 1,
      maxTrain: Int = 4096): DataFrame = {
    val train = trainingSample(corpus, maxTrain).cache()
    val boot = ivfCentroids(train, nCells)
    val cents = (0 until refineIters)
      .foldLeft(boot)((c, _) => ivfRefine(train, c)).cache()
    val indexed = ivfAssign(corpus, cents)
    ivfSearch(cents, indexed, queries, k, nprobe)
  }

  /** The `nprobe` highest-cosine cells per query: (qid, qe, cell). Shared
    * probe step of [[ivfSearch]] and [[ivfpqSearch]]; [[AnnIndex]] also
    * collects its distinct cells (bounded ≤ nCells) to prune stored-index
    * partitions with a literal filter. */
  def ivfProbes(cents: DataFrame, queries: DataFrame, nprobe: Int): DataFrame = {
    // cosineSimOrZero, not plain division: a zero-norm/degenerate query
    // raises under ANSI with `/`, and any divergence from the profiler's
    // expression would break the "profiled order IS the probed order"
    // invariant the probe profile rests on
    val qScored = queries.join(broadcast(cents))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("cell"),
        cosineSimOrZero(col("embedding"), col("centroid")).as("sim"))
    // bounded top-nprobe per query (candidates per query = nCells ≈ √n —
    // grows with the corpus, so the window form's per-query sort does too);
    // qe rides the order struct as a never-compared trailing field
    // ((sim, cell) is unique per qid)
    graft.perf.Skew.topKPerKey(
      qScored.select(col("qid"), col("sim"), col("cell"), col("qe")),
      Seq("qid"),
      struct(col("sim"), (-col("cell")).as("__ncell"), col("qe")), nprobe)
      .select(col("qid"), col("qe"), (-col("__ncell")).as("cell"))
  }

  /** IVF SEARCH half, over a prebuilt index (trained `cents` + cell-assigned
    * `indexed` (vec_id, embedding, cell)): probe the `nprobe`
    * highest-cosine cells per query, exact cosine only within them. Shared
    * verbatim by [[ivfTopK]] (in-memory build) and
    * [[AnnIndex]] (parquet-persisted build) — one copy of the probe/score/
    * rank tail is what makes persisted-index search bit-identical to the
    * in-memory path by construction. */
  def ivfSearch(cents: DataFrame, indexed: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val probes = ivfProbes(cents, queries, nprobe)
    val scored = probes.join(indexed, Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"),
        (round(dot(col("qe"), col("embedding")) /
          (l2norm(col("qe")) * l2norm(col("embedding"))), 6) + lit(0.0)).as("cos"))
    topKByScore(scored, "cos", k)
  }

  // ── PQ (product quantization) ANN: the third scale path. Jégou et al.
  //    2011 ("Product quantization for nearest neighbor search"): split
  //    each vector into m subvectors, quantize each against its own
  //    k-entry codebook, and approximate L2 distance as the sum of
  //    per-subquantizer table lookups (ADC). The index stores m small
  //    codes per vector (m bytes at k≤256) instead of the vector — the
  //    memory-bound regime where 100 TB of raw vectors won't fit. ─────────

  /** Squared L2 distance between two float arrays, scaled to an exact
    * integer (1e-6 resolution) so downstream sums are order-independent.
    * Native codegen'd kernel — value-identical to the former
    * round(aggregate(zip_with(...)) * 1e6).cast(long), including the
    * BigDecimal half-up rounding Spark's round applies to doubles. */
  private def l2sqScaled(a: Column, b: Column): Column =
    ColumnBridge.column(graft.functions.VecL2SqScaled(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** The m subvector slices of an embedding, as (sub, sv) structs. */
  private def subvectors(emb: Column, m: Int, dims: Int): Column = {
    val sub = dims / m
    array((0 until m).map(j =>
      struct(lit(j).as("sub"), slice(emb, j * sub + 1, sub).as("sv"))): _*)
  }

  /** Deterministic PQ codebooks: the `k` corpus vectors with the smallest
    * xxhash64(vec_id) donate their j-th subvector to sub-quantizer j's
    * codebook (same uniform hash-draw bootstrap as [[ivfCentroids]] —
    * reproducible, no RNG, seeds spread over the whole corpus instead of
    * one id-space corner; a k-means pass per sub-quantizer would sharpen
    * further). m·k rows of (sub, code, centroid). */
  def pqCodebooks(corpus: DataFrame, m: Int = 8, k: Int = 16,
      dims: Int = 64): DataFrame =
    corpus.select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(k)
      .withColumn("code",
        row_number().over(Window.orderBy(col("vec_id"))).cast("long"))
      .select(col("code"),
        explode(subvectors(col("embedding"), m, dims)).as("e"))
      .select(col("e.sub").as("sub"), col("code"), col("e.sv").as("centroid"))

  /** One Lloyd refinement pass per sub-quantizer: assign every corpus
    * subvector to its nearest current code (the same scaled-integer L2 the
    * encoder uses), then re-center each (sub, code) cell on the member mean
    * — k-means over each 8-dim sub-space, the standard PQ codebook
    * training step. Decimal per-dim sums keep centroids partitioning-
    * independent; empty codes keep their previous centroid. One
    * (sub, code, dim) shuffle per pass. */
  def pqRefineCodebooks(corpus: DataFrame, codebooks: DataFrame, m: Int = 8,
      dims: Int = 64): DataFrame = {
    val exploded = corpus
      .select(col("vec_id"), explode(subvectors(col("embedding"), m, dims)).as("e"))
      .select(col("vec_id"), col("e.sub").as("sub"), col("e.sv").as("sv"))
    val assigned = exploded.join(broadcast(codebooks), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("sv"), col("code"),
        l2sqScaled(col("sv"), col("centroid")).as("d2"))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("d2"), col("code"))).as("best"),
        first(col("sv")).as("sv"))
      .select(col("sub"), col("best.code").as("code"), col("sv"))
    val means = assigned
      .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("dim", "x")))
      .groupBy("sub", "code", "dim")
      .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
        .cast("double") / count(lit(1))).as("cx"))
      .groupBy("sub", "code")
      .agg(array_sort(collect_list(struct(col("dim"), col("cx")))).as("pairs"))
      .select(col("sub"), col("code"),
        expr("transform(pairs, p -> p.cx)").as("refined"))
    codebooks.join(means, Seq("sub", "code"), "left")
      .select(col("sub"), col("code"), coalesce(col("refined"),
        expr("transform(centroid, x -> cast(x as double))")).as("centroid"))
  }

  /** Encode every corpus vector as m codes: per (vector, sub-quantizer),
    * the nearest codebook entry by scaled-integer L2 (tie → lowest code).
    * The trained codebook is a BOUNDED index artifact (m·k rows, ~4 KB at
    * the defaults), collected once and inlined as a literal array — so the
    * encode is a single NARROW MAP over the corpus: no m-way explode, no
    * corpus×k join materialization, no shuffles (the old shape pushed
    * |corpus|·m·k rows through two aggregations). At 100 TB this is the
    * difference between re-shuffling the corpus to build the index and
    * streaming it through once. Ties keep the lowest code: the in-row fold
    * visits codes in ascending order and only a strictly smaller d2
    * replaces the accumulator — same rule as min(struct(d2, code)). Above
    * [[InlineLiteralCeiling]] literal doubles (m×kCodes×subdims = total
    * codebook doubles) the inline tree would overflow JVM codegen limits,
    * so encoding falls back to the explode + broadcast-join shape with the
    * identical integer-d2 / lowest-code tie rule. */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, m: Int = 8,
      dims: Int = 64, inlineCeiling: Long = InlineLiteralCeiling): DataFrame = {
    val entries = codebooks
      .select(col("sub"), col("code"),
        expr("transform(centroid, x -> cast(x as double))").as("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      .groupBy(_._1)
    require(entries.nonEmpty,
      "Similarity.pqEncode: empty codebooks — train with pqCodebooks first")
    val totalDoubles = entries.valuesIterator
      .map(_.iterator.map(_._3.length.toLong).sum).sum
    if (totalDoubles > inlineCeiling) {
      // explode + broadcast-join shape: the codebook is too large to inline.
      // min(struct(d2, code)) is the fold's exact tie rule; d2 is an exact
      // scaled integer, so no NaN path exists here.
      val exploded = corpus
        .select(col("vec_id"),
          explode(subvectors(col("embedding"), m, dims)).as("e"))
        .select(col("vec_id"), col("e.sub").as("sub"), col("e.sv").as("sv"))
      exploded.join(broadcast(codebooks), Seq("sub"))
        .select(col("vec_id"), col("sub"),
          struct(l2sqScaled(col("sv"), col("centroid")).as("d2"),
            col("code")).as("__dc"))
        .groupBy("vec_id", "sub")
        .agg(min(col("__dc")).as("__best"))
        .groupBy("vec_id")
        .agg(array_sort(collect_list(struct(col("sub"),
          col("__best.code").as("code")))).as("__pairs"))
        .select(col("vec_id"), expr("transform(__pairs, p -> p.code)").as("codes"))
    } else {
      val cbArr = array((0 until m).map { j =>
        array(entries.getOrElse(j, Array.empty).sortBy(_._2).map {
          case (_, code, cent) =>
            struct(lit(code).as("code"), array(cent.map(lit): _*).as("centroid"))
        }.toSeq: _*)
      }: _*)
      corpus.select(col("vec_id"),
        transform(subvectors(col("embedding"), m, dims), s =>
          aggregate(
            element_at(cbArr, s.getField("sub") + 1),
            struct(lit(Long.MaxValue).as("d2"), lit(-1L).as("code")),
            (acc, e) => {
              val d2 = l2sqScaled(s.getField("sv"), e.getField("centroid"))
              when(d2 < acc.getField("d2"),
                struct(d2.as("d2"), e.getField("code").as("code")))
                .otherwise(acc)
            },
            acc => acc.getField("code"))).as("codes"))
    }
  }

  /** ADC top-k: each query precomputes its m×k distance table against the
    * codebooks (tiny, broadcast); each corpus vector's approximate distance
    * is the INTEGER sum of its m table lookups — a (sub, code) equi-join
    * plus one (qid, cid) shuffle over |corpus|·m rows. The raw embeddings
    * never move after encoding; ranked ascending by distance, tie → cid. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 8,
      kCodes: Int = 16, dims: Int = 64, refineIters: Int = 1,
      maxTrain: Int = 4096): DataFrame = {
    val train = trainingSample(corpus, maxTrain).cache()
    val books = (0 until refineIters)
      .foldLeft(pqCodebooks(train, m, kCodes, dims))(
        (b, _) => pqRefineCodebooks(train, b, m, dims))
      .cache()
    val codes = pqEncode(corpus, books, m, dims)
    pqSearch(books, codes, queries, k, m, dims)
  }

  /** PQ/ADC SEARCH half over a prebuilt index (trained `books` + encoded
    * `codes` (vec_id, codes)): each query precomputes its m×k distance
    * table against the codebooks (tiny, broadcast); each corpus vector's
    * approximate distance is the INTEGER sum of its m table lookups. Shared
    * verbatim by [[pqTopK]] and [[AnnIndex]] — the raw embeddings never
    * move at query time. */
  def pqSearch(books: DataFrame, codes: DataFrame, queries: DataFrame,
      k: Int, m: Int, dims: Int): DataFrame = {
    val dtab = queries
      .select(col("vec_id").as("qid"),
        explode(subvectors(col("embedding"), m, dims)).as("e"))
      .select(col("qid"), col("e.sub").as("sub"), col("e.sv").as("qsv"))
      .join(broadcast(books), Seq("sub"))
      .select(col("qid"), col("sub"), col("code"),
        l2sqScaled(col("qsv"), col("centroid")).as("d2q"))
    val cexp = codes.select(col("vec_id").as("cid"),
      posexplode(col("codes")).as(Seq("sub", "code")))
    val scored = cexp.join(broadcast(dtab), Seq("sub", "code"))
      .filter(col("qid") =!= col("cid"))
      .groupBy("qid", "cid").agg(sum(col("d2q")).as("di"))
      .select(col("qid"), col("cid"),
        round(col("di").cast("double") / 1e6, 6).as("adist"))
    topKByDistance(scored, "adist", k)
  }

  /** IVF+PQ hybrid (the FAISS IVFPQ shape): coarse IVF cells bound the
    * candidate set — each query probes its `nprobe` nearest cells — and PQ
    * codes score ONLY those candidates via ADC table lookups. Search cost
    * ~ (corpus/nCells)·nprobe code-sum lookups per query, and the scoring
    * side never touches raw embeddings: at 100 TB the raw vectors are read
    * once at index build, never at query time. */
  def ivfpqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nprobe: Int = 4, m: Int = 8, kCodes: Int = 16,
      dims: Int = 64, refineIters: Int = 1, maxTrain: Int = 4096): DataFrame = {
    // one bounded training sample feeds BOTH the coarse quantizer and the
    // PQ codebooks — the raw corpus is read once for training, once for
    // encoding, regardless of refineIters
    val train = trainingSample(corpus, maxTrain).cache()
    val cents = (0 until refineIters)
      .foldLeft(ivfCentroids(train, nCells))((c, _) => ivfRefine(train, c))
      .cache()
    val cells = ivfAssign(corpus, cents).select(col("vec_id"), col("cell"))
    val books = (0 until refineIters)
      .foldLeft(pqCodebooks(train, m, kCodes, dims))(
        (b, _) => pqRefineCodebooks(train, b, m, dims))
      .cache()
    val codes = pqEncode(corpus, books, m, dims).join(cells, Seq("vec_id"))
    ivfpqSearch(cents, books, codes, queries, k, nprobe, m, dims)
  }

  /** IVF+PQ SEARCH half over a prebuilt hybrid index (trained `cents` +
    * `books` + encoded `codes` (vec_id, codes, cell)): probed cells bound
    * the candidates, PQ codes score them via ADC table lookups — query
    * time never touches raw corpus embeddings. Shared verbatim by
    * [[ivfpqTopK]] and [[AnnIndex]]. */
  def ivfpqSearch(cents: DataFrame, books: DataFrame, codes: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int, m: Int, dims: Int): DataFrame = {
    val probes = ivfProbes(cents, queries, nprobe)
    val dtab = queries.select(col("vec_id").as("qid"),
        explode(subvectors(col("embedding"), m, dims)).as("e"))
      .select(col("qid"), col("e.sub").as("sub"), col("e.sv").as("qsv"))
      .join(broadcast(books), Seq("sub"))
      .select(col("qid"), col("sub"), col("code"),
        l2sqScaled(col("qsv"), col("centroid")).as("d2q"))
    val cand = probes.select(col("qid"), col("cell"))
      .join(codes, Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"),
        posexplode(col("codes")).as(Seq("sub", "code")))
    val scored = cand.join(broadcast(dtab), Seq("qid", "sub", "code"))
      .groupBy("qid", "cid").agg(sum(col("d2q")).as("di"))
      .select(col("qid"), col("cid"),
        round(col("di").cast("double") / 1e6, 6).as("adist"))
    topKByDistance(scored, "adist", k)
  }
}
