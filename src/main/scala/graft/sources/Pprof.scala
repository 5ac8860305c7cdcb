package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions.col

/** pprof wire-format ingest for the Pyroscope surface (reference:
  * `src/pyroscope-api/` + `src/acceptor/src/handler/` accept pprof-gzip
  * uploads alongside OTLP profiles; both feed one profiles table).
  *
  * Decodes google/pprof `profile.proto` (public spec) with the same
  * hand-rolled proto reader as `Otlp`, RESOLVING the pprof id-addressed
  * tables into the `Otlp.ProfDict` shape so the stacktrace/sample JSON
  * comes from the exact same serializer the OTLP path uses — one
  * downstream schema, one flamegraph fold, regardless of wire format.
  *
  * Field pins (profile.proto, github.com/google/pprof):
  *   Profile{sample_type=1, sample=2, mapping=3, location=4, function=5,
  *     string_table=6, time_nanos=9, duration_nanos=10, period_type=11,
  *     period=12, default_sample_type=14}
  *   ValueType{type=1, unit=2}         (string-table indices)
  *   Sample{location_id=1 (LEAF FIRST), value=2, label=3}
  *   Label{key=1, str=2, num=3, num_unit=4}
  *   Mapping{id=1, filename=5}
  *   Location{id=1, mapping_id=2, address=3, line=4}
  *   Line{function_id=1, line=2, column=3}
  *   Function{id=1, name=2, system_name=3, filename=4}
  *
  * pprof ids are arbitrary (1-based by convention, 0 = "no reference"),
  * so each table is re-indexed by id into position-addressed arrays with
  * index 0 as the null entry — matching the OTLP dictionary convention
  * the shared serializer expects.
  *
  * A profile with several sample types (`samples/count,cpu/nanoseconds`)
  * emits ONE ROW PER TYPE, each sample contributing its value column —
  * the per-type series Pyroscope renders. */
object Pprof {

  import Otlp.{ProfDict, ProfileRow, Reader}

  /** gunzip when the gzip magic leads (pprof uploads are usually
    * compressed); raw proto bytes pass through. */
  def inflate(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    } else bytes

  private final case class RawSample(locIds: Seq[Long], values: Seq[Long],
      labels: Seq[(Long, Long, Long)]) // (key, str, num)

  /** one pprof upload (optionally gzipped) → profile rows, one per
    * sample type. `serviceName` comes from the upload's application name
    * (the Pyroscope `name=` query param); pprof itself carries none. */
  def decode(bytes: Array[Byte], serviceName: String): Seq[ProfileRow] = {
    val r = Otlp.reader(inflate(bytes))

    val strings = IndexedSeq.newBuilder[String]
    val sampleTypes = Seq.newBuilder[(Long, Long)]
    val samples = Seq.newBuilder[RawSample]
    // id-addressed builders
    val mappingsById = scala.collection.mutable.LongMap.empty[Long] // id → filename stridx
    val locationsById = scala.collection.mutable.LongMap.empty[(Long, Long, Seq[(Long, Long, Long)])]
    val functionsById = scala.collection.mutable.LongMap.empty[(Long, Long, Long)]
    var timeNs = 0L; var durNs = 0L; var period = 0L
    var periodType = (0L, 0L)

    def valueType(vt: Reader): (Long, Long) = {
      var t = 0L; var u = 0L
      while (vt.hasNext) {
        val (f, w) = vt.readTag()
        (f, w) match {
          case (1, 0) => t = vt.readVarint()
          case (2, 0) => u = vt.readVarint()
          case _      => vt.skip(w)
        }
      }
      (t, u)
    }

    while (r.hasNext) {
      val (f, w) = r.readTag()
      (f, w) match {
        case (1, 2) => sampleTypes += valueType(r.readSlice())
        case (2, 2) =>
          val s = r.readSlice()
          var locs = Seq.empty[Long]; var vals = Seq.empty[Long]
          var labels = Seq.empty[(Long, Long, Long)]
          while (s.hasNext) {
            val (sf, sw) = s.readTag()
            (sf, sw) match {
              case (1, _) => locs = locs ++ Otlp.packedInts(s, sw)
              case (2, _) => vals = vals ++ Otlp.packedInts(s, sw)
              case (3, 2) =>
                val lb = s.readSlice()
                var k = 0L; var sv = 0L; var nv = 0L
                while (lb.hasNext) {
                  val (lf, lw) = lb.readTag()
                  (lf, lw) match {
                    case (1, 0) => k = lb.readVarint()
                    case (2, 0) => sv = lb.readVarint()
                    case (3, 0) => nv = lb.readVarint()
                    case _      => lb.skip(lw)
                  }
                }
                labels = labels :+ ((k, sv, nv))
              case _ => s.skip(sw)
            }
          }
          samples += RawSample(locs, vals, labels)
        case (3, 2) =>
          val m = r.readSlice()
          var id = 0L; var fn = 0L
          while (m.hasNext) {
            val (mf, mw) = m.readTag()
            (mf, mw) match {
              case (1, 0) => id = m.readVarint()
              case (5, 0) => fn = m.readVarint()
              case _      => m.skip(mw)
            }
          }
          mappingsById(id) = fn
        case (4, 2) =>
          val l = r.readSlice()
          var id = 0L; var mid = 0L; var addr = 0L
          val lines = Seq.newBuilder[(Long, Long, Long)]
          while (l.hasNext) {
            val (lf, lw) = l.readTag()
            (lf, lw) match {
              case (1, 0) => id = l.readVarint()
              case (2, 0) => mid = l.readVarint()
              case (3, 0) => addr = l.readVarint()
              case (4, 2) =>
                val ln = l.readSlice()
                var fi = 0L; var line = 0L; var colNo = 0L
                while (ln.hasNext) {
                  val (nf, nw) = ln.readTag()
                  (nf, nw) match {
                    case (1, 0) => fi = ln.readVarint()
                    case (2, 0) => line = ln.readVarint()
                    case (3, 0) => colNo = ln.readVarint()
                    case _      => ln.skip(nw)
                  }
                }
                lines += ((fi, line, colNo))
              case _ => l.skip(lw)
            }
          }
          locationsById(id) = (mid, addr, lines.result())
        case (5, 2) =>
          val fn = r.readSlice()
          var id = 0L; var n = 0L; var sn = 0L; var file = 0L
          while (fn.hasNext) {
            val (ff, fw) = fn.readTag()
            (ff, fw) match {
              case (1, 0) => id = fn.readVarint()
              case (2, 0) => n = fn.readVarint()
              case (3, 0) => sn = fn.readVarint()
              case (4, 0) => file = fn.readVarint()
              case _      => fn.skip(fw)
            }
          }
          functionsById(id) = (n, sn, file)
        case (6, 2)  => strings += r.readString()
        case (9, 0)  => timeNs = r.readVarint()
        case (10, 0) => durNs = r.readVarint()
        case (11, 2) => periodType = valueType(r.readSlice())
        case (12, 0) => period = r.readVarint()
        case _       => r.skip(w)
      }
    }

    val strs = strings.result()
    def str(i: Long): String =
      if (i >= 0 && i < strs.length) strs(i.toInt) else ""

    // ---- re-index id-addressed tables into position arrays (0 = null)
    def reindex[T](byId: scala.collection.mutable.LongMap[T], empty: T): (IndexedSeq[T], Long => Int) = {
      val order = byId.keys.toSeq.sorted
      val pos = order.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      (empty +: order.map(byId).toIndexedSeq, (id: Long) => pos.getOrElse(id, 0))
    }
    val (mapArr, mapPos) = reindex(mappingsById, 0L)
    val (fnArr, fnPos) = reindex(functionsById, (0L, 0L, 0L))
    val (locArrRaw, locPos) = reindex(locationsById, (0L, 0L, Seq.empty[(Long, Long, Long)]))
    val locArr = locArrRaw.map { case (mid, addr, lines) =>
      (mapPos(mid), addr, lines.map { case (fi, ln, c) => (fnPos(fi), ln, c) })
    }

    // ---- sample labels → attribute table (index 0 = null)
    val attrIndex = scala.collection.mutable.LinkedHashMap.empty[(String, String), Int]
    def attrIdx(k: String, v: String): Int =
      attrIndex.getOrElseUpdate((k, v), attrIndex.size + 1)
    val rawSamples = samples.result()
    val sampleAttrIdxs: Seq[Seq[Long]] = rawSamples.map(_.labels.flatMap {
      case (k, sv, nv) =>
        val key = str(k)
        if (key.isEmpty) None
        else Some(attrIdx(key, if (sv != 0) str(sv) else nv.toString).toLong)
    })

    // ---- stacks: dedup location-id lists (leaf first, like OTLP stacks)
    val stackIndex = scala.collection.mutable.LinkedHashMap.empty[Seq[Long], Int]
    val sampleStackIdx = rawSamples.map(s =>
      stackIndex.getOrElseUpdate(s.locIds, stackIndex.size))

    val dict = ProfDict(
      strings = strs,
      mappingFilenameIdx = mapArr.map(_.toInt),
      locations = locArr.map { case (mi, addr, lines) =>
        (mi, addr, lines.map { case (fi, ln, c) => (fi, ln, c) }) },
      functions = fnArr.map { case (n, sn, file) => (n.toInt, sn.toInt, file.toInt) },
      links = IndexedSeq.empty,
      attrs = ("", "") +: attrIndex.keys.toIndexedSeq,
      stacks = stackIndex.keys.map(_.map(id => locPos(id))).toIndexedSeq)

    val stacktracesJson = dict.stacks.indices
      .map(si => Otlp.stacktraceJson(dict, si.toLong)).mkString("[", ",", "]")

    val types = sampleTypes.result()
    val effTypes = if (types.isEmpty) Seq((0L, 0L)) else types
    effTypes.zipWithIndex.map { case ((tIdx, uIdx), k) =>
      val sampleJsons = rawSamples.zipWithIndex.map { case (s, i) =>
        val v = if (k < s.values.length) s.values(k) else 0L
        val attrsJson = Otlp.sampleAttrsJson(dict, sampleAttrIdxs(i))
        (Seq(
          Some(s""""stacktrace_index":${sampleStackIdx(i)}"""),
          Some(s""""values":[$v]""")) ++
          Seq(attrsJson.map(a => s""""attributes":$a""")).flatten.map(Some(_)))
          .flatten.mkString("{", ",", "}")
      }
      ProfileRow(
        profile_id = "",
        timestamp = timeNs,
        duration_nano = durNs,
        sample_type = str(tIdx),
        sample_unit = str(uIdx),
        period_type = str(periodType._1),
        period_unit = str(periodType._2),
        period = period,
        service_name = serviceName,
        stacktraces_json = stacktracesJson,
        samples_json = sampleJsons.mkString("[", ",", "]"),
        resource_attributes = Map("service.name" -> serviceName),
        attributes = Map.empty,
        trace_id = "",
        span_id = "")
    }
  }

  /** Deterministic pprof upload for the oracle surface (q288): service
    * `svc`, upload number `up`, four samples over stacks
    * [leaf_j, mid, root] (leaf first) with value (svc+1)*10 + j + up —
    * a DuckDB range-CTE can state the same totals independently, so the
    * whole decode→flamegraph path is oracle-checked, not just
    * spec-checked. Encoded with the shared hand-rolled writer; gzipped
    * like a real Pyroscope upload. */
  def fixtureUpload(svc: Int, up: Int): Array[Byte] = {
    val p = new Pb
    // strings: 0:"" 1:cpu 2:nanoseconds 3:root 4:mid 5..8:leaf_0..3
    p.msg(1) { vt => vt.vint(1, 1); vt.vint(2, 2) }
    for (j <- 0 until 4)
      p.msg(2) { s =>
        val tmp = new Pb
        Seq(10L + j, 2L, 1L).foreach(tmp.varint) // leaf_j, mid, root
        s.bytes(1, tmp.result)
        s.vint(2, (svc + 1) * 10L + j + up)
      }
    p.msg(4)(l => { l.vint(1, 1); l.msg(4)(_.vint(1, 1)) })  // root
    p.msg(4)(l => { l.vint(1, 2); l.msg(4)(_.vint(1, 2)) })  // mid
    for (j <- 0 until 4)
      p.msg(4)(l => { l.vint(1, 10L + j); l.msg(4)(_.vint(1, 10L + j)) })
    p.msg(5) { f => f.vint(1, 1); f.vint(2, 3) }             // root
    p.msg(5) { f => f.vint(1, 2); f.vint(2, 4) }             // mid
    for (j <- 0 until 4)
      p.msg(5) { f => f.vint(1, 10L + j); f.vint(2, 5L + j) }
    (Seq("", "cpu", "nanoseconds", "root", "mid") ++
      (0 until 4).map(j => s"leaf_$j")).foreach(p.str(6, _))
    p.vint(9, 1704067200L * 1000000000L)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(p.result); gz.close()
    bos.toByteArray
  }

  /** payloads (binary `payload` + string `service_name` columns, one
    * pprof upload per row) → profile rows; the same narrow per-payload
    * flatMap as the OTLP acceptors — no shuffle, no driver decode. */
  def profiles(payloads: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[ProfileRow]
    payloads.select(col("payload"), col("service_name"))
      .as(Encoders.tuple(Encoders.BINARY, Encoders.STRING))
      .flatMap { case (bytes, svc) => decode(bytes, svc) }
      .toDF()
  }
}
