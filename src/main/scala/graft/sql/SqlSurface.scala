package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Raw SQL surface (reference: src/querier/src/flight.rs:2059-2101 — raw
  * SQL delegates to the engine wholesale, with a tenant-pinned default
  * catalog/schema, flight.rs:1196).
  *
  * In Spark this is free: register the signal/driver tables as temp views
  * scoped to a (tenant, dataset) prefix and hand the string to
  * `spark.sql`. Catalyst provides joins, grouping sets, subqueries — more
  * than the reference's own surfaces expose.
  */
object SqlSurface {

  /** server-side row cap on raw SQL results (reference `max_sql_rows`,
    * docs/users/querying-sql.md:95-99 — default 1,000,000; the querier
    * truncates rather than streaming unbounded selects). Applied as a
    * plan-level limit so Catalyst can push it into TakeOrderedAndProject
    * / CollectLimit instead of post-hoc truncation. */
  val DefaultMaxRows = 1000000

  /** register the driver testdata under `<prefix>_<table>` names (the
    * tenant-pinned default schema analog) and return a runner. */
  def session(spark: SparkSession, dir: String, prefix: String = "",
      maxRows: Int = DefaultMaxRows): String => DataFrame = {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (n <- names)
      Tables.load(spark, dir, n).createOrReplaceTempView(s"$prefix$n")
    (q: String) => spark.sql(q).limit(maxRows)
  }

  /** runner whose EXECUTION is wall-clock bounded (reference
    * flight.rs:2106-2112 wraps every ticket in a timeout): the returned
    * function materializes the capped result under QueryGuard, so a
    * runaway scan is cancelled cluster-wide at the deadline instead of
    * occupying executors indefinitely. */
  def guardedSession(spark: SparkSession, dir: String, prefix: String = "",
      maxRows: Int = DefaultMaxRows,
      timeoutMs: Long = 30000): String => Array[org.apache.spark.sql.Row] = {
    val run = session(spark, dir, prefix, maxRows)
    (q: String) => QueryGuard.withTimeout(spark, timeoutMs, q)(run(q).collect())
  }

  /** additionally register the SIGNAL views — the same surfaces the
    * language frontends lower to — so a SQL user joins logs against
    * metrics against traces directly (the reference's raw-SQL surface
    * exposes its signal tables the same way, flight.rs:1196). */
  def signalSession(spark: SparkSession, dir: String,
      prefix: String = "", maxRows: Int = DefaultMaxRows): String => DataFrame = {
    graft.SignalViews.logsDf(spark, dir).createOrReplaceTempView(s"${prefix}logs")
    graft.SignalViews.metricsDf(spark, dir).createOrReplaceTempView(s"${prefix}metrics")
    graft.SignalViews.logsGen2Df(spark, dir).createOrReplaceTempView(s"${prefix}logs_gen2")
    graft.SignalViews.tracesGen2Df(spark, dir).createOrReplaceTempView(s"${prefix}traces")
    session(spark, dir, prefix, maxRows)
  }
}
