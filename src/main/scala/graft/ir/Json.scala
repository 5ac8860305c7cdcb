package graft.ir

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

import Ir._

/** JSON document parser for the Query IR (reference document grammar:
  * src/common/src/query_ir/document.rs:38-66 — literal forms include
  * RFC3339 timestamps and relative anchors `now-1h`).
  */
object Json {

  private val mapper = new ObjectMapper()

  def parseDocument(json: String, nowNs: Long): Document =
    parseDocumentNode(mapper.readTree(json), nowNs)

  private def parseDocumentNode(root: JsonNode, nowNs: Long): Document = {
    val ver = opt(root, "irVersion").map(_.asInt).getOrElse(1)
    val from = req(root, "from").asText
    val range = parseRange(req(root, "range"), nowNs)
    val pipeline = opt(root, "pipeline").map(_.elements.asScala.toSeq.map(parseStage(_, nowNs)))
      .getOrElse(Seq.empty)
    val fields = opt(root, "fields").map(_.elements.asScala.toSeq.map(_.asText))
    Document(ver, from, range, pipeline, fields)
  }

  private def req(n: JsonNode, k: String): JsonNode = {
    val v = n.get(k)
    if (v == null) throw IrError(s"missing '$k'")
    v
  }
  private def opt(n: JsonNode, k: String): Option[JsonNode] = Option(n.get(k))

  /** `now-1h` / `now` / RFC3339 / integer nanos (number OR numeric
    * string — the reference's HTTP contract keeps time bounds as
    * strings, query.rs QueryRange) → epoch nanos. */
  def parseTime(n: JsonNode, nowNs: Long): Long = {
    if (n.isNumber) n.asLong
    else {
      val s = n.asText
      if (s == "now") nowNs
      else if (s.startsWith("now-")) nowNs - parseDurNs(s.substring(4))
      else if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
      else java.time.Instant.parse(s).toEpochMilli * 1000000L +
        (java.time.Instant.parse(s).getNano % 1000000L)
    }
  }

  private def parseDurNs(s: String): Long = {
    val m = "^(\\d+)(ms|s|m|h|d|w)$".r.findFirstMatchIn(s)
      .getOrElse(throw IrError(s"bad duration '$s'"))
    val v = m.group(1).toLong
    m.group(2) match {
      case "ms" => v * 1000000L
      case "s"  => v * 1000000000L
      case "m"  => v * 60L * 1000000000L
      case "h"  => v * 3600L * 1000000000L
      case "d"  => v * 86400L * 1000000000L
      case "w"  => v * 604800L * 1000000000L
    }
  }

  private def parseRange(n: JsonNode, nowNs: Long): TimeRange =
    TimeRange(parseTime(req(n, "start"), nowNs), parseTime(req(n, "end"), nowNs))

  def parseValue(n: JsonNode): Value =
    if (n.isTextual) Value.Str(n.asText)
    else if (n.isIntegralNumber) Value.I64(n.asLong)
    else if (n.isFloatingPointNumber) Value.F64(n.asDouble)
    else if (n.isBoolean) Value.Bool(n.asBoolean)
    else throw IrError(s"unsupported literal $n")

  def parsePredicate(n: JsonNode): Predicate = {
    val op = req(n, "op").asText
    op match {
      case "and" => Predicate.And(req(n, "args").elements.asScala.toSeq.map(parsePredicate))
      case "or"  => Predicate.Or(req(n, "args").elements.asScala.toSeq.map(parsePredicate))
      case "not" => Predicate.Not(parsePredicate(req(n, "arg")))
      case "eq" | "ne" | "gt" | "gte" | "lt" | "lte" =>
        Predicate.Cmp(req(n, "field").asText, op, parseValue(req(n, "value")))
      case "in" =>
        Predicate.In(req(n, "field").asText,
          req(n, "values").elements.asScala.toSeq.map(parseValue))
      case "between" =>
        Predicate.Between(req(n, "field").asText,
          parseValue(req(n, "lo")), parseValue(req(n, "hi")))
      case "contains" =>
        Predicate.Contains(req(n, "field").asText, req(n, "value").asText)
      case "regex" =>
        Predicate.Regex(req(n, "field").asText, req(n, "value").asText)
      case "exists" => Predicate.Exists(req(n, "field").asText)
      case other    => throw IrError(s"unknown predicate op '$other'")
    }
  }

  private def parseStage(n: JsonNode, nowNs: Long): Stage = {
    val t = req(n, "stage").asText
    t match {
      case "filter" => Stage.Filter(parsePredicate(req(n, "predicate")))
      case "aggregate" =>
        val by = opt(n, "by").map(_.elements.asScala.toSeq.map(_.asText)).getOrElse(Seq.empty)
        val step = opt(n, "step").map(_.asText).map(s => parseDurNs(s) / 1000000000L)
        val aggs = req(n, "aggs").fields.asScala.toSeq.map { e =>
          val spec = e.getValue
          AggSpec(e.getKey, req(spec, "op").asText,
            opt(spec, "field").map(_.asText), opt(spec, "p").map(_.asDouble))
        }
        Stage.Aggregate(by, step, aggs)
      case "order" =>
        Stage.Order(req(n, "keys").elements.asScala.toSeq.map { k =>
          OrderKey(req(k, "field").asText,
            opt(k, "dir").exists(_.asText == "desc"),
            opt(k, "nulls").forall(_.asText == "last"))
        })
      case "limit" => Stage.Limit(req(n, "n").asInt)
      case "topk" =>
        Stage.TopK(req(n, "field").asText, req(n, "k").asInt,
          opt(n, "bottom").exists(_.asBoolean))
      case "extract" =>
        Stage.Extract(req(n, "source").asText, req(n, "parser").asText,
          req(n, "key").asText, req(n, "as").asText,
          opt(n, "cast").map(_.asText).getOrElse("string"))
      case "select" =>
        Stage.Select(req(n, "fields").elements.asScala.toSeq.map(_.asText))
      case "correlate" =>
        Stage.Correlate(
          parseDocumentNode(req(n, "query"), nowNs),
          req(n, "on").elements.asScala.toSeq.map(_.asText),
          opt(n, "kind").map(_.asText).getOrElse("semi"))
      case other => throw IrError(s"unknown stage '$other'")
    }
  }
}
