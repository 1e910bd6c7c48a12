package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Scan-level scale hygiene: filters reach the parquet scan as pushed
  * predicates and projections prune the read schema — at 100 TB the
  * difference between reading 2 columns and 16 is the job. */
class ScanPruningSpec extends AnyFunSuite {
  import SharedSpark._

  private def planOf(name: String): String =
    Registry.byName(name).build(spark, sf).queryExecution.executedPlan.toString

  test("filters are pushed down to the parquet scan") {
    // q_filter_range filters on o_orderstatus + o_orderdate
    val p = planOf("q_filter_range")
    assert(p.contains("PushedFilters: [") && p.contains("o_orderstatus"),
      p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("projection prunes the lineitem read schema to needed columns") {
    // q_agg_having touches only l_suppkey + l_extendedprice of 16 columns
    val p = planOf("q_agg_having")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_suppkey") && readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipdate"),
      readSchema)
  }

  test("partitioned write prunes non-matching directories at read time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val docs = Tables(spark, sf, "documents")
    graft.perf.Bucketing.writePartitioned(docs, dir, Seq("source", "lang"))
    val read = spark.read.parquet(dir).filter(
      org.apache.spark.sql.functions.col("source") === "web")
    val plan = read.queryExecution.executedPlan.toString
    // assert inside the PartitionFilters bracket specifically — 'source'
    // appearing only in DataFilters on the same line would mean pruning is
    // NOT happening
    assert("PartitionFilters: \\[[^\\]]*source".r.findFirstIn(plan).isDefined,
      plan.linesIterator.filter(_.contains("Filters")).mkString("\n"))
    // row parity with the unpartitioned filter
    assert(read.count() == docs.filter(
      org.apache.spark.sql.functions.col("source") === "web").count())
  }

  test("dynamic partition overwrite is idempotent and only touches written partitions") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-dynpart").toString
    val docs = Tables(spark, sf, "documents")
    graft.perf.Bucketing.overwritePartitions(docs, dir, Seq("source"))
    val n1 = spark.read.parquet(dir).count()
    // re-running the SAME batch must converge, not append
    graft.perf.Bucketing.overwritePartitions(docs, dir, Seq("source"))
    assert(spark.read.parquet(dir).count() == n1)
    // rewriting ONE partition leaves the others untouched
    val one = docs.filter(col("source") === "web").limit(5)
    graft.perf.Bucketing.overwritePartitions(one, dir, Seq("source"))
    val after = spark.read.parquet(dir)
    assert(after.filter(col("source") === "web").count() == one.count())
    assert(after.filter(col("source") =!= "web").count() ==
      docs.filter(col("source") =!= "web").count())
  }

  test("every registry query prunes lineitem scans below the full schema") {
    // any query reading lineitem must not scan all 16 columns
    for (q <- Registry.all) {
      val plan = q.build(spark, sf).queryExecution.executedPlan.toString
      val schemas = plan.linesIterator.filter(l =>
        l.contains("ReadSchema") && l.contains("l_orderkey")).toSeq
      schemas.foreach { rs =>
        val nCols = "l_[a-z]+".r.findAllIn(rs).toSeq.distinct.size
        assert(nCols < 16, s"${q.name} reads $nCols lineitem columns: $rs")
      }
    }
  }
}
