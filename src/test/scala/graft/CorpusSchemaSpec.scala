package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{CorpusCompact, CorpusStore}

/** Corpus schema evolution (round 14): a corpus's enrichment set evolves,
  * and a plain parquet read over mixed-schema files resolves from ONE
  * footer — silently dropping whichever columns that file lacks. The
  * union-schema marker makes evolution safe: appends widen it FIRST, reads
  * pass it explicitly (absent columns null-fill by name), type conflicts
  * refuse loudly, and compaction heals mixed footers to homogeneity. */
class CorpusSchemaSpec extends AnyFunSuite {
  import SharedSpark._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def df2(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }
  private def df3(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("widening append: marker grows, old rows null-fill, subset appends still land") {
    val dir = tmp("graft-schema-widen")
    CorpusStore.append(spark, dir, df2(Seq((1L, "a"), (2L, "b"))))
    assert(CorpusStore.declaredSchema(dir).get.fieldNames.toSeq ==
      Seq("doc_id", "text"))

    // widen: a later batch carries a NEW enrichment column
    CorpusStore.append(spark, dir, df3(Seq((3L, "c", "en"))))
    assert(CorpusStore.declaredSchema(dir).get.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang"),
      "the marker must union in first-seen order")
    val all = CorpusStore.read(spark, dir)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(all == Map(1L -> None, 2L -> None, 3L -> Some("en")),
      "pre-widening rows must null-fill the new column")

    // subset: a batch MISSING a declared column still lands, null-filled
    CorpusStore.append(spark, dir, df2(Seq((4L, "d"))))
    assert(CorpusStore.read(spark, dir).filter(col("doc_id") === 4)
      .select("lang").head().isNullAt(0))
    assert(CorpusStore.read(spark, dir).count() == 4L)

    // type conflict refuses loudly, naming the column
    import spark.implicits._
    val conflict = Seq(("5", "e")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      CorpusStore.append(spark, dir, conflict) }
    assert(e.getMessage.contains("doc_id"))
  }

  test("legacy adoption: first schema-aware append unions the EXISTING files via one mergeSchema read") {
    val dir = tmp("graft-schema-adopt")
    // a legacy corpus someone already evolved by hand: two plain writes
    // with different schemas and NO marker
    df2(Seq((1L, "a"))).write.mode("append").parquet(dir)
    df3(Seq((2L, "b", "de"))).write.mode("append").parquet(dir)
    assert(CorpusStore.declaredSchema(dir).isEmpty)
    CorpusStore.append(spark, dir, df2(Seq((3L, "c"))))
    // adoption must absorb the legacy union (lang!), not one footer's pick
    assert(CorpusStore.declaredSchema(dir).get.fieldNames.toSet ==
      Set("doc_id", "text", "lang"))
    val langs = CorpusStore.read(spark, dir).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(langs == Map(1L -> None, 2L -> Some("de"), 3L -> None))
  }

  test("kill window: a marker widened with no data behind it is harmless and heals forward") {
    val dir = tmp("graft-schema-kill")
    CorpusStore.append(spark, dir, df2(Seq((1L, "a"))))
    // crash between the marker write and the data write: the marker
    // declares a column NO file carries (the safe order — the reverse
    // would leave data columns a reader silently drops)
    CorpusStore.writeSchemaMarker(dir, StructType(
      CorpusStore.declaredSchema(dir).get.fields :+
        StructField("lang", StringType)))
    assert(CorpusStore.read(spark, dir).select("lang").head().isNullAt(0),
      "a declared-but-unwritten column must read as null, not fail")
    // the replayed append lands against the already-widened marker
    CorpusStore.append(spark, dir, df3(Seq((2L, "b", "fr"))))
    assert(CorpusStore.read(spark, dir).count() == 2L)
  }

  test("flat compaction heals mixed footers to the declared schema") {
    val dir = tmp("graft-schema-compact")
    CorpusStore.append(spark, dir, df2(Seq((1L, "a"), (2L, "b"))))
    CorpusStore.append(spark, dir, df3(Seq((3L, "c", "en"))))
    val before = CorpusStore.read(spark, dir)
      .select("doc_id", "text", "lang").collect().map(_.toString).toSet
    CorpusCompact.compact(spark, dir, targetFiles = 1)
    // homogeneous now: even a NAIVE one-footer read sees the full union
    assert(spark.read.parquet(dir).columns.toSet ==
      Set("doc_id", "text", "lang"),
      "compaction must rewrite every file at the declared schema")
    assert(CorpusStore.read(spark, dir)
      .select("doc_id", "text", "lang").collect().map(_.toString).toSet
      == before, "compaction changed the row multiset")
  }

  test("snapshot mode: evolution rides the generations; compaction heals there too") {
    val dir = tmp("graft-schema-snap")
    CorpusStore.init(dir)
    CorpusStore.append(spark, dir, df2(Seq((1L, "a"))))
    CorpusStore.append(spark, dir, df3(Seq((2L, "b", "it"))))
    val before = CorpusStore.read(spark, dir)
      .select("doc_id", "text", "lang").collect().map(_.toString).toSet
    CorpusStore.compactSnapshot(spark, dir, targetFiles = 1)
    assert(spark.read.parquet(CorpusStore.resolve(dir)).columns.toSet ==
      Set("doc_id", "text", "lang"))
    assert(CorpusStore.read(spark, dir)
      .select("doc_id", "text", "lang").collect().map(_.toString).toSet
      == before)
  }

  test("snapshot migration of a mixed-schema corpus loses no column") {
    // the migration copies then DELETES the originals — a one-footer read
    // there would make evolved-column loss PERMANENT
    val dir = tmp("graft-schema-migrate")
    CorpusStore.append(spark, dir, df2(Seq((1L, "a"))))
    CorpusStore.append(spark, dir, df3(Seq((2L, "b", "es"))))
    CorpusStore.migrate(spark, dir)
    assert(CorpusStore.isSnapshotMode(dir))
    val langs = CorpusStore.read(spark, dir).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(langs == Map(1L -> None, 2L -> Some("es")),
      "migration must carry every declared column into generation 1")
    // a mixed MARKER-LESS legacy corpus migrates through mergeSchema
    val dir2 = tmp("graft-schema-migrate-legacy")
    df2(Seq((1L, "a"))).write.mode("append").parquet(dir2)
    df3(Seq((2L, "b", "pt"))).write.mode("append").parquet(dir2)
    CorpusStore.migrate(spark, dir2)
    assert(spark.read.parquet(CorpusStore.resolve(dir2)).columns.toSet ==
      Set("doc_id", "text", "lang"),
      "marker-less migration must union footers, not pick one")
  }

  test("partitioned compaction heals every leaf at the root-declared schema") {
    val dir = tmp("graft-schema-part")
    // two date leaves, each schema-mixed; marker at the LAYOUT ROOT
    for (leaf <- Seq("dt=2024-01-01", "dt=2024-01-02")) {
      df2(Seq((1L, "a"))).write.mode("append").parquet(s"$dir/$leaf")
      df3(Seq((2L, "b", "en"))).write.mode("append").parquet(s"$dir/$leaf")
    }
    CorpusStore.writeSchemaMarker(dir, StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType))))
    CorpusCompact.compactPartitioned(spark, dir, targetFilesPerPartition = 1)
    for (leaf <- Seq("dt=2024-01-01", "dt=2024-01-02")) {
      assert(spark.read.parquet(s"$dir/$leaf").columns.toSet ==
        Set("doc_id", "text", "lang"),
        s"$leaf must be homogeneous at the root schema after the pass")
      val langs = spark.read.parquet(s"$dir/$leaf").select("doc_id", "lang")
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(langs == Map(1L -> None, 2L -> Some("en")))
    }
  }

  test("ingest integration: the streaming corpus is schema-tracked from its first batch") {
    import spark.implicits._
    val corpus = tmp("graft-schema-ingest")
    val batch = Seq((1L, "plenty of words to pass the enrichment stage"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    graft.streaming.DocsStream.ingestStep(corpus, 0.8)(batch, 0L)
    val declared = CorpusStore.declaredSchema(corpus)
    assert(declared.isDefined, "ingest must append through the schema marker")
    assert(declared.get.fieldNames.contains("content_hash"))
    assert(CorpusStore.read(spark, corpus).count() == 1L)
  }

  test("case-variant column names resolve as ONE column under default resolution") {
    import spark.implicits._
    // Spark resolves names case-insensitively by default, so a batch
    // carrying `Lang` against a declared `lang` is the same column — the
    // marker must NOT grow a duplicate field (which would make every later
    // explicit-schema read fail on ambiguity). Declared spelling wins.
    val dir = tmp("graft-schema-case")
    CorpusStore.append(spark, dir, df3(Seq((1L, "a", "en"))))
    val variant = Seq((2L, "b", "de")).toDF("doc_id", "text", "Lang")
    CorpusStore.append(spark, dir, variant)
    assert(CorpusStore.declaredSchema(dir).get.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang"),
      "a case-variant of a declared column must not duplicate the field")
    val langs = CorpusStore.read(spark, dir).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs == Map(1L -> "en", 2L -> "de"),
      "the variant batch's values must land in the declared column")
    // a case-variant carrying a DIFFERENT type is still a loud conflict
    val conflict = Seq((3L, "c", 7L)).toDF("doc_id", "text", "LANG")
    intercept[IllegalStateException] {
      CorpusStore.append(spark, dir, conflict) }
  }

  test("append heals a pending flat swap before writing (its file survives the resume)") {
    val dir = tmp("graft-schema-appendheal")
    CorpusStore.append(spark, dir, df2(Seq((1L, "a"), (2L, "b"))))
    // craft kill-window B of the flat swap: staged copy complete, marker
    // written, visible files deleted, nothing moved — the state where an
    // unhealed append's part file would be deleted by the next resume
    // (it lacks the compacted-token prefix)
    val staging = java.nio.file.Paths.get(dir, ".compact-tmp")
    spark.read.parquet(dir).coalesce(1).write.mode("overwrite")
      .parquet(staging.toString)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_graft_corpus_swap"), "healtok")
    Option(new java.io.File(dir).listFiles()).get
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.delete(f.toPath))
    CorpusStore.append(spark, dir, df2(Seq((3L, "c"))))
    // the append healed first, so a later resume has nothing to do and
    // the appended row is permanent
    assert(!CorpusCompact.resumeIfNeeded(dir),
      "append must have completed the pending swap itself")
    assert(CorpusStore.read(spark, dir).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L),
      "the appended row must survive — it landed after the heal")
  }
}
