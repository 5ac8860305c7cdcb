package graft.ir

import Ir._

/** Denotational reference evaluator — the IR's meaning, independent of the
  * engine (reference: src/common/src/query_ir/predicate.rs:183-262 and
  * mod.rs:10-16: "the plan is correct iff it evaluates to this
  * denotation"). Used as the oracle in ScalaTest specs: the DataFrame
  * lowering must agree with this on any row set.
  *
  * Three-valued Kleene truth: a comparison against an absent field is
  * Absent (None); a row matches a filter only when the predicate is
  * definitely true; only `exists` observes absence.
  */
object Evaluator {

  type Row = Map[String, Any]

  /** mirror of Lowering.resolve: direct key, else json-extract from the
    * attr source column (promotion-invariant field resolution). */
  def fieldOf(row: Row, f: String, attrSource: Option[String]): Option[Any] =
    row.get(f).orElse(attrSource.flatMap(src =>
      row.get(src).flatMap(x => extract(String.valueOf(x), "json", f))))

  /** Kleene: Some(true/false) known, None = Absent. */
  def evalPredicate(p: Predicate, row: Row, attrSource: Option[String] = None): Option[Boolean] = {
    def get(f: String): Option[Any] = fieldOf(row, f, attrSource)
    p match {
    case Predicate.And(ps) =>
      val vs = ps.map(evalPredicate(_, row, attrSource))
      if (vs.contains(Some(false))) Some(false)
      else if (vs.contains(None)) None
      else Some(true)
    case Predicate.Or(ps) =>
      val vs = ps.map(evalPredicate(_, row, attrSource))
      if (vs.contains(Some(true))) Some(true)
      else if (vs.contains(None)) None
      else Some(false)
    case Predicate.Not(inner) => evalPredicate(inner, row, attrSource).map(!_)
    case Predicate.Cmp(f, op, v) =>
      compare(get(f), v).map { c =>
        op match {
          case "eq"  => c == 0
          case "ne"  => c != 0
          case "gt"  => c > 0
          case "gte" => c >= 0
          case "lt"  => c < 0
          case "lte" => c <= 0
        }
      }
    case Predicate.In(f, vs) =>
      get(f) match {
        case None => None
        case some => Some(vs.exists(v => compare(some, v).contains(0)))
      }
    case Predicate.Between(f, lo, hi) =>
      for (a <- compare(get(f), lo); b <- compare(get(f), hi))
        yield a >= 0 && b <= 0
    case Predicate.Contains(f, needle) =>
      get(f).map(x => String.valueOf(x).contains(needle))
    case Predicate.Regex(f, re) =>
      get(f).map(x => re.r.findFirstIn(String.valueOf(x)).isDefined)
    case Predicate.Exists(f) => Some(get(f).exists(_ != null))
  }
  }

  /** numeric coercion mirror of the lowering (ir_planner.rs:740-776):
    * numbers compare as doubles, strings lexically; string field vs
    * numeric literal coerces the field to double (None if not parseable). */
  private def compare(fieldVal: Option[Any], lit: Value): Option[Int] =
    fieldVal match {
      case None | Some(null) => None
      case Some(x) =>
        lit match {
          case Value.Str(s) => Some(String.valueOf(x).compareTo(s))
          case Value.Bool(b) => x match {
            case xb: Boolean => Some(xb.compareTo(b))
            case _           => None
          }
          case num =>
            val target = num match {
              case Value.I64(v)  => v.toDouble
              case Value.F64(v)  => v
              case Value.TsNs(v) => v.toDouble
              case _             => return None
            }
            toDouble(x).map(d => java.lang.Double.compare(d, target))
        }
    }

  private def toDouble(x: Any): Option[Double] = x match {
    case d: Double => Some(d)
    case f: Float  => Some(f.toDouble)
    case l: Long   => Some(l.toDouble)
    case i: Int    => Some(i.toDouble)
    case s: String => s.toDoubleOption
    case _         => None
  }

  /** Evaluate a full pipeline over in-memory rows; `timeField` holds epoch
    * nanos for the range filter and step buckets. */
  def evalPipeline(doc: Document, rows: Seq[Row], timeField: String = "ts",
      attrSource: Option[String] = None): Seq[Row] = {
    var cur = rows.filter { r =>
      toDouble(r.getOrElse(timeField, return Seq.empty)).exists(t =>
        t >= doc.range.startNs && t < doc.range.endNs)
    }
    for (st <- doc.pipeline) st match {
      case Stage.Filter(p) =>
        cur = cur.filter(r => evalPredicate(p, r, attrSource).contains(true))
      case Stage.Aggregate(by, step, aggs) =>
        cur = aggregate(cur, by, step, aggs, timeField)
      case Stage.Order(keys) =>
        cur = cur.sortWith { (a, b) =>
          keys.iterator.map(k => cmpRows(a, b, k)).find(_ != 0).getOrElse(0) < 0
        }
      case Stage.Limit(n) => cur = cur.take(n)
      case Stage.TopK(f, k, bottom) =>
        val key = OrderKey(f, desc = !bottom, nullsLast = true)
        cur = cur.sortWith((a, b) => cmpRows(a, b, key) < 0).take(k)
      case Stage.Extract(src, parser, key, as, castTo) =>
        cur = cur.map { r =>
          val extracted = r.get(src).flatMap(x => extract(String.valueOf(x), parser, key))
            .flatMap(castVal(_, castTo))
          extracted match {
            case Some(v) => r + (as -> v)
            case None    => r - as
          }
        }
      case Stage.Select(fs) =>
        cur = cur.map(r => fs.flatMap(f => r.get(f).map(f -> _)).toMap)
    }
    doc.fields match {
      case Some(fs) if !doc.pipeline.exists(_.isInstanceOf[Stage.Aggregate]) =>
        cur.map(r => fs.flatMap(f => r.get(f).map(f -> _)).toMap)
      case _ => cur
    }
  }

  private def cmpRows(a: Row, b: Row, k: OrderKey): Int = {
    val (av, bv) = (a.get(k.field), b.get(k.field))
    val c = (av, bv) match {
      case (None, None) => 0
      case (None, _)    => if (k.nullsLast) 1 else -1
      case (_, None)    => if (k.nullsLast) -1 else 1
      case (Some(x), Some(y)) =>
        (toDouble(x), toDouble(y)) match {
          case (Some(dx), Some(dy)) => java.lang.Double.compare(dx, dy)
          case _ => String.valueOf(x).compareTo(String.valueOf(y))
        }
    }
    if (k.desc) -c else c
  }

  private def aggregate(rows: Seq[Row], by: Seq[String], stepSec: Option[Long],
      aggs: Seq[AggSpec], timeField: String): Seq[Row] = {
    def key(r: Row): Seq[Any] = {
      val bucket = stepSec.map { s =>
        val ns = toDouble(r(timeField)).get.toLong
        ns / 1000000000L / s * s
      }
      bucket.toSeq ++ by.map(f => r.getOrElse(f, null))
    }
    rows.groupBy(key).toSeq.map { case (k, group) =>
      val keyCols: Row =
        (stepSec.map(_ => "bucket_start" -> k.head).toSeq ++
          by.zip(if (stepSec.isDefined) k.tail else k)).toMap
      val aggCols = aggs.map { spec =>
        val nums = spec.field.map(f =>
          group.flatMap(r => r.get(f).flatMap(toDouble))).getOrElse(Seq.empty)
        // SQL semantics: aggregates over an empty (all-NULL) input are
        // NULL — except count (caught by the oracle spec vs Spark)
        val v: Any = spec.op match {
          case "count"               => group.size.toLong
          case _ if nums.isEmpty     => null
          case "sum"                 => nums.sum
          case "avg"                 => nums.sum / nums.size
          case "min"                 => nums.min
          case "max"                 => nums.max
          case "quantile" =>
            val sorted = nums.sorted
            val rank = spec.p.get * (sorted.size - 1)
            val lo = sorted(rank.toInt)
            val hi = sorted(math.min(rank.toInt + 1, sorted.size - 1))
            lo + (hi - lo) * (rank - rank.toInt)
        }
        spec.name -> v
      }.filterNot(_._2 == null)
      keyCols ++ aggCols
    }
  }

  private def extract(src: String, parser: String, key: String): Option[String] =
    parser match {
      case "json" =>
        try {
          val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(src)
          Option(node.get(key)).filterNot(_.isNull)
            .map(n => if (n.isTextual) n.asText else n.toString)
        } catch { case _: Exception => None }
      case "logfmt" =>
        s"(?:^|\\s)${java.util.regex.Pattern.quote(key)}=(\"[^\"]*\"|\\S+)".r
          .findFirstMatchIn(src).map(m => m.group(1).stripPrefix("\"").stripSuffix("\""))
      case other => throw IrError(s"unknown parser '$other'")
    }

  private def castVal(s: String, castTo: String): Option[Any] = castTo match {
    case "string"  => Some(s)
    case "int64"   => s.toLongOption
    case "float64" => s.toDoubleOption
    case "bool"    => s.toBooleanOption
    case other     => throw IrError(s"unknown cast '$other'")
  }
}
