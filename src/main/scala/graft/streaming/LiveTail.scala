package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.logql.{Lowering, Parser}
import graft.logql.Ast._

/** Live tail (`/loki/api/v1/tail`) — the reference returns 501
  * (docs/users/logql-reference.md:44); Structured Streaming makes it a
  * natural extension: the SAME LogQL lowering that serves batch line
  * queries runs over a streaming logs source, and matching lines land in
  * an in-memory sink table the API layer polls.
  *
  * Scale shape: everything the tail applies is a narrow per-row
  * filter/projection (matchers, line filters, parser stages, label
  * filters) — no shuffle, no state, so it runs at ingest rate. Stages
  * that need a global order (`| distinct`) are rejected up front instead
  * of failing inside the stream.
  */
object LiveTail {

  /** start tailing `query` over a STREAMING logs-shaped frame; results
    * are appended to the in-memory table `name` (poll with
    * `spark.table(name)`). */
  def start(table: Lowering.LogsTable, query: String, name: String,
      projection: Seq[String] = Seq("timestamp", "service_name", "severity_text", "body"),
      triggerMs: Long = 500): StreamingQuery = {
    require(table.df.isStreaming, "live tail needs a streaming source")
    val lq = Parser.parse(query) match {
      case LineQuery(q) => q
      case _            => throw Unsupported("live tail takes a line query")
    }
    if (lq.stages.exists(_.isInstanceOf[Stage.Distinct]))
      throw Unsupported("| distinct needs a global order — not available in a tail")
    val filtered = Lowering.lowerFilter(table, lq)
      .select(projection.map(org.apache.spark.sql.functions.col): _*)
    filtered.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()
  }
}
