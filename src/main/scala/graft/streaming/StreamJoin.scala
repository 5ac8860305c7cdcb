package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream interval join (the streaming twin of the as-of/range
  * joins, q128/q129): each click joins the purchases of the same user
  * that land within `gapSec` seconds AFTER it. Watermarks on BOTH sides
  * plus the two-sided time bound in the join condition are what let Spark
  * prove state eviction: a click's row can be dropped once the purchase
  * watermark passes c_ts + gap, a purchase's row once the click watermark
  * passes p_ts — so state is O(in-flight window), not O(stream history).
  * That bounded-state proof is the 100 TB requirement; an unbounded
  * stream-stream join OOMs by construction.
  */
object StreamJoin {

  /** clicks: (c_ts timestamp, user string, c_id long);
    * purchases: (p_ts timestamp, p_user string, p_id long). */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
      gapSec: Long, watermark: String): DataFrame = {
    val c = clicks.withWatermark("c_ts", watermark)
    val p = purchases.withWatermark("p_ts", watermark)
    c.join(p, expr(
      s"""user = p_user AND
         |p_ts >= c_ts AND
         |p_ts <= c_ts + interval $gapSec seconds""".stripMargin))
      .select("user", "c_id", "p_id", "c_ts", "p_ts")
  }

  /** LEFT OUTER variant — the funnel question "which clicks did NOT
    * convert?" needs the unmatched side, and in streaming that answer
    * only EXISTS once the watermark proves no matching purchase can
    * still arrive: Spark emits the null-padded row when the purchase
    * watermark passes c_ts + gap, i.e. when the click's join state
    * expires. Same bounded-state proof as the inner form — the outer
    * row is a byproduct of eviction, not extra state. */
  def clickAttributionOuter(clicks: DataFrame, purchases: DataFrame,
      gapSec: Long, watermark: String): DataFrame = {
    val c = clicks.withWatermark("c_ts", watermark)
    val p = purchases.withWatermark("p_ts", watermark)
    c.join(p, expr(
      s"""user = p_user AND
         |p_ts >= c_ts AND
         |p_ts <= c_ts + interval $gapSec seconds""".stripMargin),
      "leftOuter")
      .select("user", "c_id", "p_id", "c_ts", "p_ts")
  }
}
