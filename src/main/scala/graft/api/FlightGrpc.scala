package graft.api

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import scala.util.control.NonFatal

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelFuture, ChannelHandlerContext,
  ChannelInboundHandlerAdapter, ChannelInitializer}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame,
  DefaultHttp2Headers, DefaultHttp2HeadersFrame, Http2DataFrame,
  Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler}
import org.apache.spark.sql.SparkSession

/** Arrow Flight over REAL gRPC — an HTTP/2 (h2c, prior-knowledge)
  * server speaking the gRPC wire protocol for the Flight service the
  * reference serves natively (`src/querier/src/flight.rs`: DoGet over
  * tonic/gRPC). Round 7 served the Flight DATA PLANE (ticket grammar +
  * IPC bytes) over HTTP/1.1; this closes the remaining transport gap:
  * a stock gRPC Flight client connecting with h2c prior knowledge gets
  * `GetFlightInfo`/`GetSchema`/`DoGet`/`ListFlights`/`Handshake` with
  * standard framing — HEADERS, length-prefixed gRPC messages in DATA
  * frames, `grpc-status` trailers.
  *
  * Transport is Netty's HTTP/2 codec (on the Spark classpath);
  * the gRPC layer (5-byte message framing, status trailers) and the
  * Flight protobufs ([[FlightProto]]) are hand-rolled against the
  * public wire formats, the same way the OTLP/remote_write acceptors
  * decode their protobuf payloads.
  *
  * Scale shape: query execution runs on a worker pool (never on a
  * Netty event loop); record batches are encoded ON THE EXECUTORS
  * (ArrowConverters via [[ArrowResult]]) and DoGet STREAMS them — the
  * driver pulls one partition of encoded batches at a time
  * (`toLocalIterator`) and writes each gRPC message as its own DATA
  * sequence, awaiting write completion (HTTP/2 flow control) before
  * pulling the next, so driver memory is bounded by one partition's
  * batches plus one in-flight message, never the whole result. SQL
  * tickets additionally carry the reference's `max_sql_rows` plan-level
  * clamp ([[Endpoints.arrowTicketDf]]). Inbound request messages are
  * capped at [[FlightGrpc.MaxInboundBytes]] (the stock gRPC server
  * default) — RESOURCE_EXHAUSTED beyond it.
  *
  * `onServed(method, grpcStatus, durMs)` fires once per RPC after the
  * response is fully written — the hook [[HttpShell.startFlight]] uses
  * to record semconv `rpc.server` self-monitoring rows, mirroring the
  * reference's flight telemetry (src/querier/src/flight.rs:3150).
  */
final class FlightGrpc(spark: SparkSession, dir: String,
    resolve: Option[String => Option[TenantCatalog.Principal]] = None,
    maxSqlRows: Int = graft.sql.SqlSurface.DefaultMaxRows,
    onServed: (String, Int, Double) => Unit = (_, _, _) => ()) {

  import FlightGrpc._

  private var bossGroup: NioEventLoopGroup = _
  private var workGroup: NioEventLoopGroup = _
  private var serverCh: Channel = _
  private var pool: java.util.concurrent.ExecutorService = _

  /** bind 127.0.0.1:`port` (0 = ephemeral); returns the bound port. */
  def start(port: Int = 0): Int = {
    bossGroup = new NioEventLoopGroup(1)
    workGroup = new NioEventLoopGroup(2)
    // streaming responses HOLD a worker for their duration (each write
    // awaits flow control), so the pool is sized above the expected
    // concurrent-stream count or a pair of slow readers would starve
    // Handshake/GetSchema
    pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val b = new ServerBootstrap()
      .group(bossGroup, workGroup)
      .channel(classOf[NioServerSocketChannel])
      .childHandler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit = {
          ch.pipeline().addLast(
            Http2FrameCodecBuilder.forServer().build(),
            new Http2MultiplexHandler(new ChannelInitializer[Channel] {
              override def initChannel(sc: Channel): Unit =
                sc.pipeline().addLast(new StreamHandler)
            }))
        }
      })
    serverCh = b.bind("127.0.0.1", port).syncUninterruptibly().channel()
    serverCh.localAddress().asInstanceOf[java.net.InetSocketAddress].getPort
  }

  def stop(): Unit = {
    if (serverCh != null) { serverCh.close().syncUninterruptibly(); serverCh = null }
    if (bossGroup != null) { bossGroup.shutdownGracefully(0, 100,
      java.util.concurrent.TimeUnit.MILLISECONDS); bossGroup = null }
    if (workGroup != null) { workGroup.shutdownGracefully(0, 100,
      java.util.concurrent.TimeUnit.MILLISECONDS); workGroup = null }
    if (pool != null) { pool.shutdownNow(); pool = null }
  }

  // ---- per-stream gRPC handling ----

  private final class StreamHandler extends ChannelInboundHandlerAdapter {
    private var path = ""
    private var headers: Map[String, String] = Map.empty
    private val body = new ByteArrayOutputStream()
    private var done = false // dispatched (bidi streams dispatch early)

    override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
      msg match {
        case h: Http2HeadersFrame =>
          path = Option(h.headers().path()).map(_.toString).getOrElse("")
          val it = h.headers().iterator()
          val m = Map.newBuilder[String, String]
          while (it.hasNext) {
            val e = it.next()
            m += (e.getKey.toString.toLowerCase -> e.getValue.toString)
          }
          headers = m.result()
          if (h.isEndStream) dispatch(ctx)
        case d: Http2DataFrame =>
          try {
            if (!done) { // a rejected stream stops accumulating
              val buf = d.content()
              val arr = new Array[Byte](buf.readableBytes())
              buf.readBytes(arr)
              body.write(arr)
            }
          } finally d.release()
          // inbound message-size cap, the stock gRPC server default
          // (4 MiB): a client cannot grow driver memory by streaming an
          // unbounded request body before auth ever runs
          if (!done && body.size() > MaxInboundBytes) {
            done = true
            trailersOnly(ctx.channel(), StatusResourceExhausted,
              s"gRPC message exceeds the $MaxInboundBytes-byte limit")
          }
          // Handshake is bidirectional: the client waits for our reply
          // BEFORE half-closing, so dispatch on the first complete
          // message rather than on end-of-stream
          else if (d.isEndStream ||
              (path.endsWith("/Handshake") && firstFrame(body.toByteArray).isDefined))
            dispatch(ctx)
        case other =>
          io.netty.util.ReferenceCountUtil.release(other)
      }

    private def dispatch(ctx: ChannelHandlerContext): Unit = {
      if (done) return
      done = true
      val ch = ctx.channel()
      val reqPath = path
      val reqHeaders = headers
      val reqBody = body.toByteArray
      pool.execute { () =>
        val t0 = System.nanoTime()
        val status =
          try route(ch, reqPath, reqHeaders, reqBody)
          catch {
            case e: Endpoints.HttpError =>
              trailersOnly(ch, grpcStatusOf(e.status), e.message)
            case NonFatal(e) =>
              trailersOnly(ch, StatusInternal,
                Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
          }
        try onServed(reqPath.stripPrefix(ServicePrefix), status,
          (System.nanoTime() - t0) / 1e6)
        catch { case NonFatal(_) => () } // monitoring must never fail a serve
      }
    }
  }

  /** service dispatch; returns the grpc-status the response carried.
    * Every RPC here is unary-in (the request is one message);
    * DoGet/ListFlights/ListActions are stream-out. */
  private def route(ch: Channel, path: String,
      headers: Map[String, String], body: Array[Byte]): Int = {
    if (!path.startsWith(ServicePrefix))
      return trailersOnly(ch, StatusUnimplemented, s"unknown service: $path")
    val method = path.stripPrefix(ServicePrefix)
    // auth first, exactly the HTTP shell's band for /api/v1/arrow: with
    // a catalog wired in, a credential is REQUIRED, and a SCOPED key is
    // rejected outright — Flight serves cross-signal SQL, which no
    // single `<signal>:read` covers (write scopes never read)
    resolve match {
      case Some(r) =>
        val auth = headers.get("authorization")
        if (auth.isEmpty)
          return trailersOnly(ch, StatusUnauthenticated,
            "missing authorization metadata")
        if (!auth.get.startsWith("Bearer "))
          return trailersOnly(ch, StatusUnauthenticated,
            "authorization must use Bearer scheme")
        r(auth.get.stripPrefix("Bearer ")) match {
          case None =>
            return trailersOnly(ch, StatusUnauthenticated, "invalid API key")
          case Some(p) if !p.isAdmin && p.scopes.isDefined =>
            return trailersOnly(ch, StatusPermissionDenied,
              "Flight requires an unscoped administrative credential")
          case Some(p) =>
            val tenant = headers.get("x-tenant-id")
            if (!p.isAdmin && tenant.exists(t => !p.tenant.contains(t)))
              return trailersOnly(ch, StatusPermissionDenied,
                s"API key does not belong to tenant '${tenant.get}'")
        }
      case None =>
    }
    firstFrame(body) match {
      case None if method != "ListActions" && method != "ListFlights" =>
        // zero-byte protos (Empty, empty Criteria) still arrive as a
        // framed zero-length message; nothing at all = malformed
        trailersOnly(ch, StatusInvalidArgument, "missing gRPC message")
      case Some((compressed, _)) if compressed =>
        trailersOnly(ch, StatusUnimplemented, "compressed gRPC messages not supported")
      case frame =>
        val msg = frame.map(_._2).getOrElse(Array.emptyByteArray)
        method match {
          case "DoGet" => doGet(ch, FlightProto.decodeTicket(msg))
          case "GetFlightInfo" => getFlightInfo(ch, msg)
          case "GetSchema" => getSchema(ch, msg)
          case "ListFlights" => listFlights(ch)
          case "ListActions" => respond(ch, Seq.empty) // no custom actions
          case "Handshake" =>
            val (ver, payload) = FlightProto.decodeHandshake(msg)
            respond(ch, Seq(FlightProto.encodeHandshake(ver, payload)))
          case m =>
            trailersOnly(ch, StatusUnimplemented, s"method not implemented: $m")
        }
    }
  }

  private def ticketOf(d: FlightProto.Descriptor): String =
    if (d.dtype == 2 && d.cmd.nonEmpty) d.cmd
    else if (d.dtype == 1 && d.path.length == 1 &&
      SignalTablesServed.contains(d.path.head))
      s"SELECT * FROM ${d.path.head}"
    else throw Endpoints.HttpError(400,
      "descriptor must be CMD (a ticket string) or PATH (one signal table)")

  /** DoGet STREAMS: each encapsulated IPC message (schema, then one per
    * record batch pulled a partition at a time) becomes one FlightData
    * gRPC frame, written before the next batch is pulled — the whole
    * result is never resident on the driver. */
  private def doGet(ch: Channel, ticket: String): Int = {
    val df = Endpoints.arrowTicketDf(spark, dir, ticket, maxSqlRows)
    val msgs = ArrowResult.ipcMessages(df).map { m =>
      val im = FlightProto.splitIpcStream(m).head // one message per element
      FlightProto.encodeData(FlightProto.Data(None, im.header, im.body))
    }
    respondStream(ch, msgs)
  }

  private def getFlightInfo(ch: Channel, msg: Array[Byte]): Int = {
    val d = FlightProto.decodeDescriptor(msg)
    val ticket = ticketOf(d)
    val df = Endpoints.arrowTicketDf(spark, dir, ticket, maxSqlRows)
    respond(ch, Seq(FlightProto.encodeInfo(FlightProto.Info(
      schema = schemaMessage(df), descriptor = d, tickets = Seq(ticket)))))
  }

  private def getSchema(ch: Channel, msg: Array[Byte]): Int = {
    val d = FlightProto.decodeDescriptor(msg)
    val df = Endpoints.arrowTicketDf(spark, dir, ticketOf(d), maxSqlRows)
    respond(ch, Seq(FlightProto.encodeSchemaResult(schemaMessage(df))))
  }

  private def listFlights(ch: Channel): Int =
    respond(ch, SignalTablesServed.map { t =>
      val df = Endpoints.arrowTicketDf(spark, dir, s"SELECT * FROM $t",
        maxSqlRows)
      FlightProto.encodeInfo(FlightProto.Info(
        schema = schemaMessage(df),
        descriptor = FlightProto.Descriptor(1, Seq(t), ""),
        tickets = Seq(s"SELECT * FROM $t")))
    })

  /** the IPC-encapsulated schema message for a plan — schema only, no
    * execution (flight.proto: FlightInfo.schema/SchemaResult.schema are
    * the encapsulated flatbuffer bytes, 8-byte prefix included). */
  private def schemaMessage(df: org.apache.spark.sql.DataFrame): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    org.apache.spark.sql.GraftArrowShim.writeIpcStream(
      out, df.schema, Iterator.empty, tz)
    val bytes = out.toByteArray
    bytes.dropRight(8) // strip the end-of-stream marker
  }

  // ---- gRPC response plumbing ----

  /** unary/small stream-out responses: delegate to the streaming writer
    * — one code path, no wholesale concatenation anywhere. */
  private def respond(ch: Channel, messages: Seq[Array[Byte]]): Int =
    respondStream(ch, messages.iterator)

  /** STREAMING response writer, run on the worker pool (never a Netty
    * event loop): headers, then each message as its own length-prefixed
    * gRPC frame in chunked DATA writes, AWAITING each write's
    * completion before the next chunk — HTTP/2 flow control completes
    * the write only once the window admits it, so a slow client
    * backpressures the iterator (and, through it, `toLocalIterator`'s
    * partition fetches) instead of growing driver buffers. At most ONE
    * message is resident at a time. Returns the grpc-status written
    * (0, or INTERNAL if the client went away mid-stream). */
  private def respondStream(ch: Channel, messages: Iterator[Array[Byte]]): Int = {
    val h = new DefaultHttp2Headers()
    h.status("200")
    h.set("content-type", "application/grpc+proto")
    h.set("grpc-encoding", "identity")
    ch.write(new DefaultHttp2HeadersFrame(h))
    val ChunkSize = 64 * 1024
    try {
      while (messages.hasNext) {
        val m = messages.next()
        val framed = new Array[Byte](5 + m.length)
        framed(0) = 0 // uncompressed
        framed(1) = ((m.length >>> 24) & 0xFF).toByte
        framed(2) = ((m.length >>> 16) & 0xFF).toByte
        framed(3) = ((m.length >>> 8) & 0xFF).toByte
        framed(4) = (m.length & 0xFF).toByte
        System.arraycopy(m, 0, framed, 5, m.length)
        var off = 0
        while (off < framed.length) {
          val n = math.min(ChunkSize, framed.length - off)
          val f: ChannelFuture = ch.writeAndFlush(new DefaultHttp2DataFrame(
            Unpooled.wrappedBuffer(framed, off, n)))
          f.awaitUninterruptibly()
          if (!f.isSuccess) { ch.close(); return StatusInternal }
          off += n
        }
      }
    } catch {
      // response HEADERS are already on the wire, so a lazy-iterator
      // failure (a partition erroring mid-stream) must surface as error
      // TRAILERS — grpc-status in a trailing HEADERS frame with NO
      // pseudo-headers — not a second response
      case NonFatal(e) =>
        val status = e match {
          case he: Endpoints.HttpError => grpcStatusOf(he.status)
          case _ => StatusInternal
        }
        val t = new DefaultHttp2Headers()
        t.set("grpc-status", status.toString)
        t.set("grpc-message", percentEncode(
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
        ch.writeAndFlush(new DefaultHttp2HeadersFrame(t, true))
        return status
    }
    val t = new DefaultHttp2Headers()
    t.set("grpc-status", "0")
    ch.writeAndFlush(new DefaultHttp2HeadersFrame(t, true))
    StatusOk
  }

  /** trailers-only error response (legal gRPC: HEADERS with :status 200
    * carrying grpc-status, endStream); returns the status written. */
  private def trailersOnly(ch: Channel, status: Int, message: String): Int = {
    val h = new DefaultHttp2Headers()
    h.status("200")
    h.set("content-type", "application/grpc+proto")
    h.set("grpc-status", status.toString)
    if (message.nonEmpty) h.set("grpc-message", percentEncode(message))
    ch.writeAndFlush(new DefaultHttp2HeadersFrame(h, true))
    status
  }
}

object FlightGrpc {
  val ServicePrefix = "/arrow.flight.protocol.FlightService/"

  /** inbound gRPC request-message cap — the stock gRPC server default
    * (`grpc.max_receive_message_length`, 4 MiB). */
  val MaxInboundBytes: Int = 4 * 1024 * 1024

  /** the four signal views the SQL ticket surface exposes. */
  val SignalTablesServed: Seq[String] =
    Seq("logs", "traces", "metrics_gauge", "metrics_sum")

  // gRPC status codes (public grpc spec)
  val StatusOk = 0
  val StatusInvalidArgument = 3
  val StatusNotFound = 5
  val StatusResourceExhausted = 8
  val StatusPermissionDenied = 7
  val StatusUnimplemented = 12
  val StatusInternal = 13
  val StatusUnauthenticated = 16

  def grpcStatusOf(http: Int): Int = http match {
    case 400 => StatusInvalidArgument
    case 401 => StatusUnauthenticated
    case 403 => StatusPermissionDenied
    case 404 => StatusNotFound
    case 429 => StatusResourceExhausted
    case _ => StatusInternal
  }

  /** gRPC `grpc-message` percent-encoding (spec: percent-encode anything
    * outside printable ASCII minus '%'). */
  def percentEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { b =>
      val c = b & 0xFF
      if (c >= 0x20 && c <= 0x7E && c != '%')
        sb.append(c.toChar)
      else sb.append(f"%%$c%02X")
    }
    sb.toString
  }

  /** parse the FIRST complete gRPC frame: (compressedFlag, message).
    * None while the 5-byte prefix + payload have not fully arrived. */
  def firstFrame(b: Array[Byte]): Option[(Boolean, Array[Byte])] = {
    if (b.length < 5) return None
    val len = ((b(1) & 0xFF) << 24) | ((b(2) & 0xFF) << 16) |
      ((b(3) & 0xFF) << 8) | (b(4) & 0xFF)
    if (b.length < 5 + len) None
    else Some((b(0) != 0, java.util.Arrays.copyOfRange(b, 5, 5 + len)))
  }

  /** split a full gRPC response body into its framed messages. */
  def allFrames(b: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    while (i + 5 <= b.length) {
      val len = ((b(i + 1) & 0xFF) << 24) | ((b(i + 2) & 0xFF) << 16) |
        ((b(i + 3) & 0xFF) << 8) | (b(i + 4) & 0xFF)
      out += java.util.Arrays.copyOfRange(b, i + 5, i + 5 + len)
      i += 5 + len
    }
    out.result()
  }
}
