package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

object SharedSpark {
  lazy val spark: SparkSession = Tables.session("graft-test", "4")
  val sf = "/root/testdata/sf0.001"
}

/** Smoke: every registered query executes on sf0.001 and returns a sane
  * schema. Row-level correctness is covered by the DuckDB oracle harness
  * (graft.Verify + tools/check.py) at sf0.01.
  */
class QueriesSpec extends AnyFunSuite {
  import SharedSpark._

  for (q <- Registry.all) {
    test(s"${q.name} executes") {
      val df = q.build(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
