package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, ShingleIndex}

/** The stored shingle index as a production storage mode (round-11 task 1):
  * stored ≡ derived (the routing can never change answers), marker
  * reattach is free, bucket-count changes force a rewrite, appends are
  * O(delta) and keep the relation exact, and the bucketed layout actually
  * removes the corpus-wide shingle shuffle (CI-pinned Exchange count). */
class ShingleIndexSpec extends AnyFunSuite {
  import SharedSpark._

  private def finalPlan(df: DataFrame): String = {
    df.queryExecution.toRdd.foreach(_ => ())
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
  }
  private def shuffles(df: DataFrame): Int =
    "Exchange (hash|range|Single)".r.findAllIn(finalPlan(df)).length

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select(col("doc_id"), col("shingle")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def wipe(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${ShingleIndex.tableName}")
    graft.perf.Measure.deleteRecursively(java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      ShingleIndex.tableName).toString)
  }

  test("stored ≡ derived, reattach is free, appends stay exact, df shuffle gone") {
    wipe()
    try {
      val derived = rows(ShingleIndex.derive(spark, sf))
      assert(derived.nonEmpty)

      // unregistered → shinglesFor is the plain derivation (no stored files)
      assert(ShingleIndex.shinglesFor(spark, sf).inputFiles
        .forall(!_.contains(ShingleIndex.tableName)))

      // first registration writes; contents match the derivation exactly
      val w1 = ShingleIndex.register(spark, sf, buckets = 4)
      assert(w1 > 0.0, "first registration must write")
      assert(rows(ShingleIndex.table(spark)) == derived)

      // routing: a registered, unappended index serves dir queries
      val routed = ShingleIndex.shinglesFor(spark, sf)
      assert(routed.inputFiles.exists(_.contains(ShingleIndex.tableName)))

      // the routed faces cannot diverge: same containment pairs either way
      val viaStored = Dedup.containmentPairs(routed, 4, 5, minShingles = 10)
        .orderBy(col("id_a"), col("id_b")).collect()
      val viaDerived = Dedup.containmentPairs(
        ShingleIndex.derive(spark, sf), 4, 5, minShingles = 10)
        .orderBy(col("id_a"), col("id_b")).collect()
      assert(viaStored.sameElements(viaDerived))

      // the layout's point: the corpus-wide document-frequency aggregate
      // runs bucket-local on the stored relation (zero shuffle Exchanges;
      // the derived relation must shuffle the whole corpus by shingle)
      val dfAggStored = ShingleIndex.table(spark)
        .groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
      assert(shuffles(dfAggStored) == 0,
        s"bucketed df aggregate must be shuffle-free:\n${finalPlan(dfAggStored)}")
      assert(shuffles(ShingleIndex.derive(spark, sf)
        .groupBy(col("shingle")).agg(count(lit(1)).as("__df"))) >= 1)

      // reattach: drop only the catalog entry; the marker + files remain
      spark.sql(s"DROP TABLE ${ShingleIndex.tableName}")
      val w2 = ShingleIndex.register(spark, sf, buckets = 4)
      assert(w2 == 0.0, s"marker reattach must not rewrite (spent $w2 s)")
      assert(rows(ShingleIndex.table(spark)) == derived)
      assert(shuffles(ShingleIndex.table(spark)
        .groupBy(col("shingle")).agg(count(lit(1)).as("__df"))) == 0,
        "reattached index lost its bucket spec")

      // bucket-count change must rewrite, never silently reattach
      val w3 = ShingleIndex.register(spark, sf, buckets = 2)
      assert(w3 > 0.0, "changed bucket count must force a rewrite")

      // O(delta) append: new docs' shingles land in the bucketed store and
      // the relation equals base ∪ delta derivations exactly
      val delta = Tables(spark, sf, "documents").limit(5)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(lit("appended variant "), col("text")).as("text"))
      val deltaRows = rows(Dedup.hashedShingles(delta, "doc_id", "text", 3)
        .withColumnRenamed("sh", "shingle"))
      assert(deltaRows.nonEmpty)
      ShingleIndex.append(spark, delta)
      assert(rows(ShingleIndex.table(spark)) ==
        rows(ShingleIndex.derive(spark, sf)) ++ deltaRows)
      // appended files carry bucket ids: the df aggregate stays co-located
      assert(shuffles(ShingleIndex.table(spark)
        .groupBy(col("shingle")).agg(count(lit(1)).as("__df"))) == 0,
        "append broke the bucket layout")

      // an appended index describes dir ∪ delta, not dir — dir-derived
      // queries must fall back to the plain derivation
      assert(ShingleIndex.shinglesFor(spark, sf).inputFiles
        .forall(!_.contains(ShingleIndex.tableName)))

      // width mismatch is refused (an n=4 append into an n=3 index would
      // silently mix incompatible shingle spaces)
      intercept[IllegalArgumentException] {
        ShingleIndex.append(spark, delta, n = 4)
      }
    } finally wipe()
  }
}
