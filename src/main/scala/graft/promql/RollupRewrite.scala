package graft.promql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import Ast._

/** Aggregation pushdown to PRE-AGGREGATES: route an eligible PromQL
  * range query to the stored hourly rollup (`SignalTables.storedRollup`,
  * the compactor's downsampling job) instead of the raw samples — the
  * classic materialized-view rewrite every OLAP store ships (the
  * reference's compactor materializes the same rollup cells for exactly
  * this read path).
  *
  * Eligibility is *algebraic*, not heuristic: the reducer must be
  * losslessly re-aggregable from the cells — min of mins, max of maxes,
  * sum of decimal sums, count as the SUM of cell counts — and the query
  * grid must be a multiple of the cell granularity so every output
  * bucket is a whole number of cells. Anything else (rate over raw
  * deltas, sub-cell steps, offsets/@ off the cell grid, label matchers
  * the rollup didn't group by) returns None and the caller falls back
  * to the raw-sample eval — a wrong-but-fast answer is never produced.
  * At 100 TB this is the difference between scanning 3.6 B raw points
  * and 1 M cells for a month-long dashboard panel.
  */
object RollupRewrite {

  private val CellSec = 3600L

  private val reAggregable = Set(
    "min_over_time", "max_over_time", "sum_over_time", "count_over_time")

  /** answer `e` on `tr`'s grid from the hourly rollup, or None when the
    * rewrite would change semantics. */
  def route(s: SparkSession, dir: String, e: Expr,
      tr: Eval.TimeRange): Option[DataFrame] = e match {
    case Call(f, Seq(Selector(Some(metric), Seq(), Some(range), 0, None)))
        if reAggregable(f)
          && tr.stepSec % CellSec == 0 && range == tr.stepSec * 1000000000L
          && tr.startSec % CellSec == 0 && tr.lookbackSec == 0 =>
      val cells = graft.SignalTables.storedRollup(s, dir)
        .filter(col("metric_name") === metric)
        .filter(col("bucket_start") >= tr.startSec &&
          col("bucket_start") < tr.endSec)
      val reKey = (col("bucket_start") / tr.stepSec).cast("long") * tr.stepSec
      val keys = reKey.as("bucket_start") +: Seq(col("service_name"))
      val agg = f match {
        case "min_over_time"   => min(col("vmin")).as("value")
        case "max_over_time"   => max(col("vmax")).as("value")
        case "sum_over_time"   => sum(col("vsum")).cast(DoubleType).as("value")
        case "count_over_time" => sum(col("n")).cast(DoubleType).as("value")
      }
      Some(cells.groupBy(keys: _*).agg(agg))
    case _ => None
  }

  /** route-or-fallback: the serving entry point — rollup when algebraic
    * equivalence holds, raw-sample eval otherwise. */
  def evalWithRollup(s: SparkSession, dir: String, e: Expr,
      t: Eval.MetricsTable, tr: Eval.TimeRange): DataFrame =
    route(s, dir, e, tr).getOrElse(Eval.evalVector(e, t, tr).df)
}
