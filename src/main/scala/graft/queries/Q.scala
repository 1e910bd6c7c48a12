package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query capability from SURVEY.md §2 (or an extension operator).
  *
  * @param name    stable key — appears in SparkEntry.queries / oracleSql
  * @param build   Spark-side implementation (DataFrame/Dataset API first)
  * @param oracle  equivalent ANSI SQL for the DuckDB oracle on the same
  *                parquet tables; None → the op is not SQL-expressible and
  *                the driver records a weaker rows-only check
  * @param bench   include in the per-round Bench headline run
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Registry {
  def all: Seq[Q] =
    Relational.queries ++ Analytics.queries ++ Extensions.queries ++
      EventsAnalytics.queries ++ CorpusAnalytics.queries ++
      SearchAnalytics.queries ++ CurationAnalytics.queries ++
      BehaviorAnalytics.queries ++ TemplateAnalogs.queries ++
      AnnFaces.queries ++ NlFaces.queries

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
