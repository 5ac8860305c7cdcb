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

  /** register the driver testdata under `<prefix>_<table>` names (the
    * tenant-pinned default schema analog) and return a runner. */
  def session(spark: SparkSession, dir: String, prefix: String = ""): String => DataFrame = {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (n <- names)
      Tables.load(spark, dir, n).createOrReplaceTempView(s"$prefix$n")
    (q: String) => spark.sql(q)
  }
}
