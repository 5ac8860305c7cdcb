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

  /** a BOUNDED, evicting driver-side tail buffer: foreachBatch offers
    * each matched row; the serving loop DRAINS delivered rows — so
    * per-poll work is O(rows since the last poll) and resident driver
    * state is capped at `capacity` rows no matter how long the tail
    * session runs (the memory-sink poll this replaces re-collected the
    * whole append log every frame — O(window²) over a session). On
    * overflow the OLDEST undelivered rows drop (a tail shows the live
    * edge; a client too slow for the ingest rate loses history, counted
    * in `dropped`, never blocks the stream). */
  final class TailBuffer(val capacity: Int) {
    private val q = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    private val n = new java.util.concurrent.atomic.AtomicInteger(0)
    private val drops = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile private[LiveTail] var schemaOpt: Option[org.apache.spark.sql.types.StructType] = None
    def schema: org.apache.spark.sql.types.StructType = schemaOpt.getOrElse(
      throw new IllegalStateException("buffer not attached to a tail"))
    def offer(r: org.apache.spark.sql.Row): Unit = {
      q.add(r)
      if (n.incrementAndGet() > capacity && q.poll() != null) {
        n.decrementAndGet(); drops.incrementAndGet()
      }
    }
    /** remove and return everything buffered since the last drain. */
    def drain(): Seq[org.apache.spark.sql.Row] = {
      val b = Vector.newBuilder[org.apache.spark.sql.Row]
      var r = q.poll()
      while (r != null) { b += r; n.decrementAndGet(); r = q.poll() }
      b.result()
    }
    def size: Int = n.get
    def dropped: Long = drops.get
  }

  /** start tailing into a [[TailBuffer]] — the serving shape: each
    * micro-batch collects ONLY its own (narrow-filtered) rows into the
    * bounded buffer; nothing re-reads delivered history. */
  def startBuffered(table: Lowering.LogsTable, query: String, buf: TailBuffer,
      projection: Seq[String] = Seq("timestamp", "service_name", "severity_text", "body"),
      triggerMs: Long = 500): StreamingQuery = {
    val filtered = lowered(table, query, projection)
    buf.schemaOpt = Some(filtered.schema)
    filtered.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // tail(capacity), not collect(): a pathological batch (a bulk
        // backfill matching the tail) materializes at most the buffer
        // cap on the driver — and a tail wants the LIVE EDGE, so the
        // clipped rows are exactly the ones eviction would drop anyway
        batch.tail(buf.capacity).foreach(buf.offer)
      }
      .start()
  }

  private def lowered(table: Lowering.LogsTable, query: String,
      projection: Seq[String]): DataFrame = {
    require(table.df.isStreaming, "live tail needs a streaming source")
    val lq = Parser.parse(query) match {
      case LineQuery(q) => q
      case _            => throw Unsupported("live tail takes a line query")
    }
    if (lq.stages.exists(_.isInstanceOf[Stage.Distinct]))
      throw Unsupported("| distinct needs a global order — not available in a tail")
    Lowering.lowerFilter(table, lq)
      .select(projection.map(org.apache.spark.sql.functions.col): _*)
  }

  /** start tailing `query` over a STREAMING logs-shaped frame; results
    * are appended to the in-memory table `name` (poll with
    * `spark.table(name)`). */
  def start(table: Lowering.LogsTable, query: String, name: String,
      projection: Seq[String] = Seq("timestamp", "service_name", "severity_text", "body"),
      triggerMs: Long = 500): StreamingQuery = {
    val filtered = lowered(table, query, projection)
    filtered.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()
  }
}
