package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Prometheus remote_write → typed metric tables (reference:
  * src/acceptor/src/handler/prometheus_handler.rs protocol shell;
  * src/common/src/flight/conversion/conversion_prometheus/to_otel.rs —
  * resource grouping by job/instance :138-163, __name__ classification
  * :303-475, histogram reassembly from _bucket/_count/_sum :477-610).
  *
  * Both halves are real: [[decodeWriteRequest]] decodes the
  * snappy+protobuf transport (public wire format, hand-rolled walk),
  * and the row conversion turns remote_write-shaped rows
  * `(labels Map[String,String], timestamp_ms Long, value Double)` into
  * the per-kind stored tables from graft.schema.Schemas. All transforms
  * are per-row narrow ops except histogram reassembly, which is one hash
  * aggregate per (series, timestamp) — no shuffle beyond it, scales
  * linearly at ingest.
  *
  * Mapping (OpenTelemetry Prometheus-compat spec, as the reference):
  *  - `job` → service_name, `instance` → resource_attributes; both leave
  *    the attribute set
  *  - `__name__` ending `_total` → metrics_sum (monotonic, cumulative),
  *    suffix stripped
  *  - `__name__` ending `_bucket` with an `le` label → reassembled into
  *    metrics_histogram rows (bucket_counts + explicit_bounds JSON, count
  *    from the +Inf bucket, sum joined from the `_sum` series)
  *  - everything else → metrics_gauge
  */
object PromRemoteWrite {

  private val reserved = Seq("__name__", "job", "instance")

  /** the common column set from a remote_write row (labels → typed cols). */
  private def common(df: DataFrame, name: org.apache.spark.sql.Column): DataFrame =
    df.select(
      (col("timestamp_ms") * 1000000L).as("timestamp"),
      (col("timestamp_ms") * 1000000L).as("start_timestamp"),
      coalesce(element_at(col("labels"), "job"), lit("")).as("service_name"),
      name.as("metric_name"),
      lit("").as("metric_description"),
      lit("").as("metric_unit"),
      map_filter(
        map(lit("service.instance.id"), element_at(col("labels"), "instance")),
        (_, v) => v.isNotNull).as("resource_attributes"),
      typedLit(Map.empty[String, String]).as("scope_attributes"),
      map_filter(col("labels"),
        (k, _) => !k.isin(reserved.map(lit(_)): _*)).as("attributes"),
      lit(0).as("flags"),
      lit("[]").as("exemplars"),
      col("value"))

  private def nameCol = element_at(col("labels"), "__name__")

  /** gauge rows: neither a counter nor a histogram component. */
  def toGauge(df: DataFrame): DataFrame =
    common(
      df.filter(!nameCol.endsWith("_total") && !nameCol.endsWith("_bucket") &&
        !nameCol.endsWith("_count") && !nameCol.endsWith("_sum")),
      nameCol)

  /** monotonic counters: `_total` stripped, cumulative temporality. */
  def toSum(df: DataFrame): DataFrame =
    common(
      df.filter(nameCol.endsWith("_total")),
      regexp_replace(nameCol, "_total$", ""))
      .withColumn("aggregation_temporality", lit(2).cast(IntegerType))
      .withColumn("is_monotonic", lit(true))

  /** histogram series reassembly: one OTEL histogram row per
    * (series-attrs, timestamp) from the `_bucket`/`_count`/`_sum` triplet
    * (reference to_otel.rs:477-610). The `le` label orders the buckets;
    * counts stay CUMULATIVE in prometheus, so bucket_counts here are the
    * de-accumulated per-bucket values. */
  def toHistogram(df: DataFrame): DataFrame = {
    val base = regexp_replace(nameCol, "_(bucket|count|sum)$", "")
    val attrsNoLe = map_filter(col("labels"),
      (k, _) => !k.isin((reserved :+ "le").map(lit(_)): _*))
    val tagged = df
      .filter(nameCol.rlike("_(bucket|count|sum)$"))
      .select(
        base.as("_base"),
        coalesce(element_at(col("labels"), "job"), lit("")).as("service_name"),
        element_at(col("labels"), "instance").as("_instance"),
        attrsNoLe.as("attributes"),
        col("timestamp_ms"),
        when(nameCol.endsWith("_bucket"), element_at(col("labels"), "le")).as("_le"),
        when(nameCol.endsWith("_bucket"), col("value")).as("_bucket_v"),
        when(nameCol.endsWith("_count"), col("value")).as("_count_v"),
        when(nameCol.endsWith("_sum"), col("value")).as("_sum_v"))
    val leNum = when(col("_le") === "+Inf", lit(Double.PositiveInfinity))
      .otherwise(col("_le").cast(DoubleType))
    val g = tagged
      .withColumn("_le_n", leNum)
      .groupBy(col("_base"), col("service_name"), col("_instance"),
        col("attributes"), col("timestamp_ms"))
      .agg(
        sort_array(collect_list(when(col("_le").isNotNull,
          struct(col("_le_n"), col("_bucket_v"))))).as("_buckets"),
        max(col("_count_v")).as("_count"),
        max(col("_sum_v")).as("_sum"))
    // cumulative → per-bucket: c[i] - c[i-1]; bounds exclude +Inf
    val perBucket = expr(
      """transform(_buckets, (b, i) ->
        |  CAST(round(b._bucket_v - CASE WHEN i = 0 THEN 0.0
        |    ELSE _buckets[i-1]._bucket_v END) AS BIGINT))""".stripMargin)
    val bounds = expr(
      "transform(filter(_buckets, b -> b._le_n != cast('Infinity' as double)), b -> b._le_n)")
    g.select(
      (col("timestamp_ms") * 1000000L).as("timestamp"),
      (col("timestamp_ms") * 1000000L).as("start_timestamp"),
      col("service_name"),
      col("_base").as("metric_name"),
      lit("").as("metric_description"),
      lit("").as("metric_unit"),
      map_filter(map(lit("service.instance.id"), col("_instance")),
        (_, v) => v.isNotNull).as("resource_attributes"),
      typedLit(Map.empty[String, String]).as("scope_attributes"),
      col("attributes"),
      lit(0).as("flags"),
      lit("[]").as("exemplars"),
      round(coalesce(col("_count"),
        element_at(col("_buckets"), -1)("_bucket_v"))).cast(LongType).as("count"),
      coalesce(col("_sum"), lit(0.0)).as("sum"),
      lit(null).cast(DoubleType).as("min"),
      lit(null).cast(DoubleType).as("max"),
      to_json(perBucket).as("bucket_counts"),
      to_json(bounds).as("explicit_bounds"),
      lit(2).cast(IntegerType).as("aggregation_temporality"))
  }

  /** full conversion: one remote_write batch → the per-kind tables. */
  def convert(df: DataFrame): Map[String, DataFrame] = Map(
    "metrics_gauge" -> toGauge(df),
    "metrics_sum" -> toSum(df),
    "metrics_histogram" -> toHistogram(df))

  // ---- wire decode --------------------------------------------------------

  /** one decoded remote_write sample (the row shape `convert` expects). */
  final case class WriteRow(labels: Map[String, String], timestamp_ms: Long,
      value: Double)

  /** The remote_write TRANSPORT, now in scope: snappy block decompression
    * (org.xerial.snappy ships with Spark) + a hand-rolled walk of the
    * public `prometheus.WriteRequest` wire format — `timeseries=1 {
    * labels=1 {name=1,value=2}, samples=2 {value=1(double),
    * timestamp=2(varint ms)} }` — the same decoder discipline as
    * [[Otlp]]. Unknown fields are skipped, so exemplars/histogram
    * protos from newer senders pass through harmlessly. */
  def decodeWriteRequest(compressed: Array[Byte]): Seq[WriteRow] = {
    val raw = org.xerial.snappy.Snappy.uncompress(compressed)
    val req = Otlp.reader(raw)
    val out = Seq.newBuilder[WriteRow]
    while (req.hasNext) {
      val (f, w) = req.readTag()
      if (f == 1 && w == 2) {
        val ts = req.readSlice()
        val labels = Map.newBuilder[String, String]
        val samples = Seq.newBuilder[(Long, Double)]
        while (ts.hasNext) {
          val (tf, tw) = ts.readTag()
          if (tf == 1 && tw == 2) {
            val l = ts.readSlice()
            var name = ""; var value = ""
            while (l.hasNext) {
              val (lf, lw) = l.readTag()
              if (lf == 1 && lw == 2) name = l.readString()
              else if (lf == 2 && lw == 2) value = l.readString()
              else l.skip(lw)
            }
            if (name.nonEmpty) labels += name -> value
          } else if (tf == 2 && tw == 2) {
            val s = ts.readSlice()
            var v = 0.0; var t = 0L
            while (s.hasNext) {
              val (sf, sw) = s.readTag()
              if (sf == 1 && sw == 1)
                v = java.lang.Double.longBitsToDouble(s.readFixed64())
              else if (sf == 2 && sw == 0) t = s.readVarint()
              else s.skip(sw)
            }
            samples += ((t, v))
          } else ts.skip(tw)
        }
        val lm = labels.result()
        samples.result().foreach { case (t, v) => out += WriteRow(lm, t, v) }
      } else req.skip(w)
    }
    out.result()
  }

  /** payloads (binary `payload` column, one snappy+proto request per
    * row) → remote_write rows; the same narrow executor-side flatMap as
    * the OTLP acceptors. */
  def rows(payloads: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[WriteRow]
    payloads.select(col("payload")).as(Encoders.BINARY)
      .flatMap(decodeWriteRequest _)
      .toDF()
  }

  // ---- remote_write 2.0 ---------------------------------------------------

  /** Prometheus remote-write 2.0 (`io.prometheus.write.v2.Request`,
    * PROM-39 / Prometheus 3.x; negotiated via
    * `Content-Type: application/x-protobuf;proto=io.prometheus.write.v2.Request`):
    * label strings live ONCE in a request-level SYMBOL TABLE
    * (`symbols = 4`) and every series carries packed uint32 REF PAIRS
    * (`labels_refs = 1`, alternating name-ref/value-ref) instead of
    * repeated strings — the interning that makes high-series-count
    * writes cheap on the wire. Decoded to the SAME `WriteRow` rows as
    * 1.0, so both protocol versions share the classification/
    * reassembly pipeline downstream. Histograms/exemplars/metadata
    * fields are skipped (same policy as the 1.0 walk). Two passes over
    * the buffer: symbols first (proto field order is not guaranteed),
    * then timeseries. */
  def decodeWriteRequestV2(compressed: Array[Byte]): Seq[WriteRow] = {
    val raw = org.xerial.snappy.Snappy.uncompress(compressed)
    // pass 1: the symbol table
    val syms = scala.collection.mutable.ArrayBuffer.empty[String]
    val p1 = Otlp.reader(raw)
    while (p1.hasNext) {
      val (f, w) = p1.readTag()
      if (f == 4 && w == 2) syms += p1.readString() else p1.skip(w)
    }
    def sym(i: Long): String = {
      require(i >= 0 && i < syms.length, s"prw2: symbol ref $i out of range")
      syms(i.toInt)
    }
    // pass 2: timeseries with ref pairs
    val out = Seq.newBuilder[WriteRow]
    val p2 = Otlp.reader(raw)
    while (p2.hasNext) {
      val (f, w) = p2.readTag()
      if (f == 5 && w == 2) {
        val ts = p2.readSlice()
        val refs = Seq.newBuilder[Long]
        val samples = Seq.newBuilder[(Long, Double)]
        while (ts.hasNext) {
          val (tf, tw) = ts.readTag()
          if (tf == 1 && tw == 2) { // packed labels_refs
            val r = ts.readSlice()
            while (r.hasNext) refs += r.readVarint()
          } else if (tf == 1 && tw == 0) { // unpacked ref (legal encoding)
            refs += ts.readVarint()
          } else if (tf == 2 && tw == 2) { // Sample
            val s = ts.readSlice()
            var v = 0.0; var t = 0L
            while (s.hasNext) {
              val (sf, sw) = s.readTag()
              if (sf == 1 && sw == 1)
                v = java.lang.Double.longBitsToDouble(s.readFixed64())
              else if (sf == 2 && sw == 0) t = s.readVarint()
              else s.skip(sw)
            }
            samples += ((t, v))
          } else ts.skip(tw)
        }
        val refSeq = refs.result()
        require(refSeq.length % 2 == 0, "prw2: odd labels_refs length")
        val labels = refSeq.grouped(2).map { case Seq(k, v) =>
          sym(k) -> sym(v)
        }.filter(_._1.nonEmpty).toMap
        samples.result().foreach { case (t, v) =>
          out += WriteRow(labels, t, v)
        }
      } else p2.skip(w)
    }
    out.result()
  }

  /** v2 payloads → remote_write rows (same shape as [[rows]]). */
  def rowsV2(payloads: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[WriteRow]
    payloads.select(col("payload")).as(Encoders.BINARY)
      .flatMap(decodeWriteRequestV2 _)
      .toDF()
  }

  /** fixture encoder for 2.0: builds the symbol table (index 0 = ""
    * per spec), emits packed ref pairs — independently constructed so
    * decode is proven against the public wire format. */
  def encodeWriteRequestV2(
      series: Seq[(Map[String, String], Seq[(Long, Double)])]): Array[Byte] = {
    val symbols = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    symbols.put("", 0)
    def ref(s: String): Int = symbols.getOrElseUpdate(s, symbols.size)
    // intern first so the table is complete before serialization
    val interned = series.map { case (labels, samples) =>
      (labels.toSeq.sortBy(_._1).flatMap { case (k, v) =>
        Seq(ref(k), ref(v)) }, samples)
    }
    val req = new Pb
    symbols.keys.foreach(s => req.str(4, s))
    interned.foreach { case (refs, samples) =>
      req.msg(5) { ts =>
        ts.msg(1) { packed => refs.foreach(r => packed.varint(r.toLong)) }
        samples.foreach { case (t, v) =>
          ts.msg(2) { s => s.double(1, v); s.vint(2, t) }
        }
      }
    }
    org.xerial.snappy.Snappy.compress(req.result)
  }

  /** fixture encoder (tests + oracles): series → snappy-compressed
    * WriteRequest bytes, independently constructed so decode is proven
    * against the public wire format, not against itself. */
  def encodeWriteRequest(
      series: Seq[(Map[String, String], Seq[(Long, Double)])]): Array[Byte] = {
    val req = new Pb
    series.foreach { case (labels, samples) =>
      req.msg(1) { ts =>
        labels.toSeq.sortBy(_._1).foreach { case (k, v) =>
          ts.msg(1) { l => l.str(1, k); l.str(2, v) }
        }
        samples.foreach { case (t, v) =>
          ts.msg(2) { s => s.double(1, v); s.vint(2, t) }
        }
      }
    }
    org.xerial.snappy.Snappy.compress(req.result)
  }
}
