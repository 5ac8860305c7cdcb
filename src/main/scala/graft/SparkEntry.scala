package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2): one entry per
  * implemented operator, each with a DuckDB-equivalent oracle in
  * `oracleSql` (omitted only for non-SQL-expressible ops, which the driver
  * then checks rows-only).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_basic")(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.CoreOps.queries, operators.CoreOps.oracles),
      (operators.PipelineOps.queries, operators.PipelineOps.oracles),
      (operators.LogQLOps.queries, operators.LogQLOps.oracles),
      (operators.PromQLOps.queries, operators.PromQLOps.oracles),
      (operators.IROps.queries, operators.IROps.oracles),
      (operators.TraceOps.queries, operators.TraceOps.oracles),
      (operators.ProfileOps.queries, operators.ProfileOps.oracles),
      (operators.MultimodalOps.queries, operators.MultimodalOps.oracles),
      (operators.DiscoveryOps.queries, operators.DiscoveryOps.oracles),
      (operators.HistogramOps.queries, operators.HistogramOps.oracles),
      (operators.InteropOps.queries, operators.InteropOps.oracles)
    )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
