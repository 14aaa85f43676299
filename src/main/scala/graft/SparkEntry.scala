package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the reference's committed default path (eval + re-fusion,
    * run_llm_ours.py:53-55) on the committed fixture; driver smoke-checks
    * rows>0. */
  def entry(spark: SparkSession): DataFrame =
    rel.DataQueries.q40RagEvalPipeline(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rel.Queries.all ++ rel.DataQueries.all ++ rel.MoreQueries.all ++
      rel.ExtraQueries.all ++ rel.CurationQueries.all ++ rel.PipelineQueries.all ++
      rel.TrainPrepQueries.all ++ rel.HygieneQueries.all ++ rel.AnalyticsQueries.all ++
      rel.WebCurationQueries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    rel.Queries.oracles ++ rel.DataQueries.oracles ++ rel.MoreQueries.oracles ++
      rel.ExtraQueries.oracles ++ rel.CurationQueries.oracles ++
      rel.PipelineQueries.oracles ++ rel.TrainPrepQueries.oracles ++
      rel.HygieneQueries.oracles ++ rel.AnalyticsQueries.oracles ++
      rel.WebCurationQueries.oracles
}
