package graft.ir

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import Ir._

/** Query IR → DataFrame lowering (reference:
  * src/querier/src/query/ir_planner.rs — time window :391-412, predicate
  * tree :631-738, numeric coercion :740-776, aggregate :522-598, order/
  * topk/limit :455-520, ir_extract :847-1073, curated projection :797-834).
  *
  * Kleene parity with the denotational Evaluator comes free from Spark's
  * NULL semantics: WHERE keeps only TRUE, NOT(NULL)=NULL, and `exists`
  * lowers to isNotNull (SURVEY §1.4).
  */
object Lowering {

  /** field resolution à la SchemaResolver (ir_planner.rs:152-225): promoted
    * physical columns win; everything else extracts from `attrSource`
    * (a JSON string column) — promotion-invariant semantics. */
  final case class IrTable(
      df: DataFrame,
      timeField: String,
      promoted: Map[String, String],
      attrSource: Option[String])

  private def resolve(t: IrTable, cols: Set[String], field: String): Column =
    if (cols.contains(field)) col(field)
    else t.promoted.get(field) match {
      case Some(phys) => col(phys)
      case None =>
        t.attrSource match {
          case Some(src) => get_json_object(col(src), s"$$.$field")
          case None      => throw IrError(s"unresolvable field '$field'")
        }
    }

  private def litOf(v: Value): Column = v match {
    case Value.Str(s)  => lit(s)
    case Value.I64(x)  => lit(x)
    case Value.F64(x)  => lit(x)
    case Value.Bool(b) => lit(b)
    case Value.TsNs(n) => lit(n)
  }

  private def isNumeric(v: Value): Boolean = v match {
    case _: Value.I64 | _: Value.F64 | _: Value.TsNs => true
    case _                                           => false
  }

  /** numeric comparisons coerce the field to double so promoted and
    * unpromoted attrs compare identically (ir_planner.rs:740-776).
    * try_cast, not cast: a non-numeric string under a numeric
    * comparison is ABSENT in the denotational semantics (Evaluator
    * toDouble → None → Kleene unknown → row excluded), so the engine
    * must yield NULL there too — under ANSI mode a plain cast would
    * instead fail the whole query at runtime (found by
    * PredicateLawSpec's randomized law). */
  private def operand(t: IrTable, cols: Set[String], field: String, v: Value): (Column, Column) = {
    val c = resolve(t, cols, field)
    v match {
      case _ if isNumeric(v) => (c.try_cast(DoubleType), litOf(v).cast(DoubleType))
      // string literals compare LEXICALLY against the stringified field
      // (Evaluator.compare Value.Str branch) — without the explicit
      // cast, ANSI would instead coerce the literal to the numeric
      // column's type and fail at runtime on 'error' (PredicateLawSpec)
      case _: Value.Str => (c.cast(org.apache.spark.sql.types.StringType), litOf(v))
      case _ => (c, litOf(v))
    }
  }

  def predCol(t: IrTable, cols: Set[String], p: Predicate): Column = p match {
    case Predicate.And(ps) => ps.map(predCol(t, cols, _)).reduce(_ && _)
    case Predicate.Or(ps)  => ps.map(predCol(t, cols, _)).reduce(_ || _)
    case Predicate.Not(i)  => !predCol(t, cols, i)
    case Predicate.Cmp(f, op, v) =>
      val (c, l) = operand(t, cols, f, v)
      op match {
        case "eq"  => c === l
        case "ne"  => c =!= l
        case "gt"  => c > l
        case "gte" => c >= l
        case "lt"  => c < l
        case "lte" => c <= l
      }
    case Predicate.In(f, vs) =>
      val numeric = vs.forall(isNumeric)
      val c = resolve(t, cols, f)
      if (numeric) {
        // Evaluator.In: an ABSENT field is Absent, but a PRESENT value
        // that fails numeric coercion contributes false — In is an
        // `exists` over compares, so one unparseable value is simply
        // "no hit", unlike Cmp where the whole comparison is unknown
        val hits = c.try_cast(DoubleType)
          .isin(vs.map(v => litOf(v).cast(DoubleType)): _*)
        when(c.isNull, lit(null).cast(org.apache.spark.sql.types.BooleanType))
          .otherwise(coalesce(hits, lit(false)))
      } else c.cast(org.apache.spark.sql.types.StringType).isin(vs.map {
        case Value.Str(s) => s: Any
        case other        => throw IrError(s"mixed-type in() literal $other")
      }: _*)
    case Predicate.Between(f, lo, hi) =>
      val (c1, l1) = operand(t, cols, f, lo)
      val (_, l2) = operand(t, cols, f, hi)
      c1 >= l1 && c1 <= l2
    case Predicate.Contains(f, needle) =>
      resolve(t, cols, f).contains(needle)
    case Predicate.Regex(f, re) =>
      resolve(t, cols, f).rlike(re) // unanchored search, like the evaluator
    case Predicate.Exists(f) =>
      resolve(t, cols, f).isNotNull
  }

  def lower(doc: Document, t: IrTable,
      tables: Map[String, IrTable] = Map.empty): DataFrame = {
    // boundary validation: relation-type inference + stage legality — a
    // malformed pipeline fails here, not deep inside Spark analysis
    // (reference validate.rs; see graft.ir.Validate)
    Validate.validate(doc, t)
    var df = t.df.filter(
      col(t.timeField) >= lit(doc.range.startNs) &&
        col(t.timeField) < lit(doc.range.endNs))
    var cols = df.columns.toSet
    var aggregated = false

    for (st <- doc.pipeline) st match {
      case Stage.Filter(p) =>
        df = df.filter(predCol(t, cols, p))

      case Stage.Aggregate(by, stepSec, aggs) =>
        val keys =
          stepSec.map(s =>
            expr(s"(${t.timeField} div 1000000000) div $s * $s").as("bucket_start")).toSeq ++
            by.map(f => resolve(t, cols, f).as(f))
        val aggCols = aggs.map { spec =>
          def f = resolve(t, cols, spec.field.getOrElse(
            throw IrError(s"${spec.op} needs a field"))).try_cast(DoubleType)
          (spec.op match {
            case "count"    => count(lit(1))
            case "sum"      => sum(f)
            case "avg"      => avg(f)
            case "min"      => min(f)
            case "max"      => max(f)
            case "quantile" => percentile(f, lit(spec.p.getOrElse(
              throw IrError("quantile needs p"))))
            case other => throw IrError(s"unknown agg '$other'")
          }).as(spec.name)
        }
        df = df.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*)
        cols = df.columns.toSet
        aggregated = true

      case Stage.Order(keys) =>
        df = df.orderBy(keys.map { k =>
          val c = resolve(t, cols, k.field)
          (k.desc, k.nullsLast) match {
            case (false, true)  => c.asc_nulls_last
            case (false, false) => c.asc_nulls_first
            case (true, true)   => c.desc_nulls_last
            case (true, false)  => c.desc_nulls_first
          }
        }: _*)

      case Stage.Limit(n) => df = df.limit(n)

      case Stage.TopK(f, k, bottom) =>
        val c = resolve(t, cols, f)
        df = df.orderBy(if (bottom) c.asc_nulls_last else c.desc_nulls_last).limit(k)

      case Stage.Extract(src, parser, key, as, castTo) =>
        val raw = parser match {
          case "json" => get_json_object(resolve(t, cols, src), s"$$.$key")
          case "logfmt" =>
            // single-pass native tokenizer (graft.functions.LogfmtMap):
            // N extract stages share ONE parse via codegen subexpression
            // elimination; absent key → NULL, quotes stripped
            val e = element_at(
              graft.functions.LogfmtMap.logfmtMap(resolve(t, cols, src)), key)
            regexp_replace(e, "^\"|\"$", "")
          case other => throw IrError(s"unknown parser '$other'")
        }
        val cast = castTo match {
          case "string"  => raw
          case "int64"   => raw.cast(LongType)
          case "float64" => raw.cast(DoubleType)
          case "bool"    => raw.cast("boolean")
          case other     => throw IrError(s"unknown cast '$other'")
        }
        df = df.withColumn(as, cast)
        cols += as

      case Stage.Select(fs) =>
        df = df.select(fs.map(f => resolve(t, cols, f).as(f)): _*)
        cols = fs.toSet

      case Stage.Correlate(right, on, kind) =>
        // cross-signal DAG join (reference roadmap, querying-ir.md:213-222):
        // the sub-pipeline lowers recursively against its own table, keys
        // materialize on both sides, then one equi join — semi/anti stay
        // projection-free, inner/left prefix the right payload `right_`
        val rt = tables.getOrElse(right.from,
          throw IrError(s"correlate: unknown source '${right.from}'"))
        val rightDf = lower(right, rt, tables)
        val rcols = rightDf.columns.toSet
        for (k <- on) if (!rcols.contains(k))
          throw IrError(s"correlate: key '$k' not present on '${right.from}'")
        df = on.foldLeft(df)((d, k) => d.withColumn(k, resolve(t, cols, k)))
        kind match {
          case "semi" => df = df.join(rightDf.select(on.map(col): _*), on, "left_semi")
          case "anti" => df = df.join(rightDf.select(on.map(col): _*), on, "left_anti")
          case "inner" | "left" =>
            val renamed = rightDf.columns.foldLeft(rightDf)((d, c) =>
              if (on.contains(c)) d else d.withColumnRenamed(c, s"right_$c"))
            df = df.join(renamed, on, if (kind == "left") "left" else "inner")
            cols = cols ++ renamed.columns.toSet
          case other => throw IrError(s"correlate: unknown kind '$other'")
        }
    }

    doc.fields match {
      case Some(fs) if !aggregated =>
        df.select(fs.map(f => resolve(t, cols, f).as(f)): _*)
      case _ => df
    }
  }
}
