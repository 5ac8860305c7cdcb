package graft.ir

import Ir._

/** IR document validator: relation-type inference + stage-legality checks
  * at the query boundary (reference: src/common/src/query_ir/validate.rs —
  * RowSet/Series relation calculus, require_rowset gates :187-197, extract
  * collision rules :299-336, aggregate rules :338-465, rank/order guards
  * :467-490, fields-on-series rejection :91).
  *
  * A malformed pipeline fails HERE with a reference-shaped message, not
  * three stages deep inside a Spark analysis exception.
  *
  * Divergence (documented): the reference's Series carries exactly one
  * value column, so a step aggregate there must emit a single agg; our
  * lowering supports multi-valued series rows, so Series tracks a value
  * NAME SET instead and multi-agg step pipelines are legal.
  */
object Validate {

  /** inferred relation flowing between stages. */
  sealed trait Relation {
    def describe: String
  }

  /** row relation; `open` = unresolved names may still resolve from the
    * attribute source (promotion-invariant attr access), closes after the
    * first aggregate. */
  final case class RowSet(fields: Set[String], open: Boolean, aggregated: Boolean)
      extends Relation {
    def describe: String = s"rowset(${fields.toSeq.sorted.mkString(",")})"
  }

  /** step-bucketed series: bucket_start + labels + value columns. */
  final case class Series(labels: Seq[String], values: Seq[String], stepSec: Long)
      extends Relation {
    def describe: String = s"series(labels=${labels.mkString(",")})"
    def fields: Set[String] = (("bucket_start" +: labels) ++ values).toSet
  }

  final case class Validated(terminal: Relation)

  private def fail(msg: String): Nothing = throw IrError(msg)

  private def illegal(stage: String, reason: String): Nothing =
    fail(s"stage '$stage' is not legal here: $reason")

  /** names must be logical: no expression strings, no physical/storage
    * addressing (validate.rs guard_logical_name / ExpressionString). */
  private def guardName(name: String): Unit = {
    if (name.isEmpty) fail("empty field name")
    if (name.exists(c => c == '(' || c == ')' || c == ' '))
      fail(s"operand '$name' must be a structured value, not an expression string")
    if (name.startsWith("_"))
      fail(s"field '$name' names a physical column or storage detail; use a logical name")
  }

  private val predOps = Set("eq", "ne", "gt", "gte", "lt", "lte")
  private val aggOps = Set("count", "sum", "avg", "min", "max", "quantile")
  private val parsers = Set("json", "logfmt")
  private val casts = Set("string", "int64", "float64", "bool")

  def validate(doc: Document, t: Lowering.IrTable): Validated = {
    if (doc.irVersion != 1)
      fail(s"unsupported irVersion ${doc.irVersion}; supported range is 1..=1")
    if (doc.range.startNs >= doc.range.endNs)
      fail(s"invalid query: empty time range [${doc.range.startNs}, ${doc.range.endNs})")

    val baseFields = t.df.columns.toSet ++ t.promoted.keySet
    var rel: Relation = RowSet(baseFields, open = t.attrSource.isDefined, aggregated = false)
    var introduced = Set.empty[String]

    def requireRowSet(stage: String): RowSet = rel match {
      case rs: RowSet => rs
      case _: Series =>
        illegal(stage, "expects a row-set input but the pipeline is a series")
    }

    /** a referenced name must resolve in the CURRENT relation. */
    def checkRef(field: String): Unit = {
      guardName(field)
      rel match {
        case rs: RowSet =>
          if (!rs.fields.contains(field) && !rs.open)
            fail(s"reference to unknown name '$field'")
        case s: Series =>
          if (!s.fields.contains(field))
            fail(s"reference to unknown name '$field'")
      }
    }

    def checkPred(p: Predicate): Unit = p match {
      case Predicate.And(ps) =>
        if (ps.isEmpty) fail("invalid query: empty 'and'")
        ps.foreach(checkPred)
      case Predicate.Or(ps) =>
        if (ps.isEmpty) fail("invalid query: empty 'or'")
        ps.foreach(checkPred)
      case Predicate.Not(i)         => checkPred(i)
      case Predicate.Cmp(f, op, _) =>
        checkRef(f)
        if (!predOps.contains(op)) fail(s"invalid query: unknown predicate op '$op'")
      case Predicate.In(f, vs) =>
        checkRef(f)
        if (vs.isEmpty) fail("invalid query: `in` requires a non-empty array value")
      case Predicate.Between(f, _, _) => checkRef(f)
      case Predicate.Contains(f, _)   => checkRef(f)
      case Predicate.Regex(f, re) =>
        checkRef(f)
        if (re.length > 1024) fail("invalid query: regex exceeds the size bound")
        try java.util.regex.Pattern.compile(re)
        catch {
          case e: java.util.regex.PatternSyntaxException =>
            fail(s"invalid query: bad regex for '$f': ${e.getDescription}")
        }
      case Predicate.Exists(f) => checkRef(f)
    }

    for (st <- doc.pipeline) st match {
      case Stage.Filter(p) =>
        // a filter is legal on either relation shape, but every referenced
        // name must resolve (on a series: bucket/labels/values only)
        checkPred(p)

      case Stage.Aggregate(by, stepSec, aggs) =>
        val rs = requireRowSet("aggregate")
        if (rs.aggregated)
          illegal("aggregate", "cannot aggregate an already-aggregated relation")
        if (aggs.isEmpty)
          fail("invalid query: aggregate requires at least one aggregate output")
        by.foreach(checkRef)
        stepSec.foreach(s =>
          if (s <= 0) fail("invalid query: aggregate `step` must be > 0"))
        var outNames = Set.empty[String]
        for (a <- aggs) {
          guardName(a.name)
          if (outNames.contains(a.name) || by.contains(a.name) ||
              introduced.contains(a.name) || baseFields.contains(a.name))
            fail(s"duplicate output name '${a.name}'")
          outNames += a.name
          if (!aggOps.contains(a.op)) fail(s"invalid query: unknown agg '${a.op}'")
          (a.op, a.field) match {
            case ("count", Some(_)) =>
              fail("invalid query: aggregate 'count' takes no field")
            case ("count", None) => ()
            case (op, None)      => fail(s"invalid query: aggregate '$op' requires a field")
            case (_, Some(f))    => checkRef(f)
          }
          if (a.op == "quantile") {
            val p = a.p.getOrElse(fail("invalid query: quantile needs p"))
            if (p < 0.0 || p > 1.0)
              fail("invalid query: quantile `arg` must be within [0, 1]")
          } else if (a.p.nonEmpty)
            fail(s"invalid query: aggregate '${a.op}' takes no arg")
        }
        introduced ++= outNames
        rel = stepSec match {
          case Some(s) => Series(by, aggs.map(_.name), s)
          case None    => RowSet((by ++ aggs.map(_.name)).toSet, open = false, aggregated = true)
        }

      case Stage.Order(keys) =>
        if (keys.isEmpty) fail("invalid query: order requires at least one key")
        keys.foreach(k => checkRef(k.field))

      case Stage.Limit(n) =>
        if (n <= 0) fail(s"topk/bottomk/limit `n` must be an integer > 0, got $n")

      case Stage.TopK(f, k, _) =>
        requireRowSet("topk")
        if (k <= 0) fail(s"topk/bottomk `n` must be an integer > 0, got $k")
        checkRef(f)

      case Stage.Extract(source, parser, _, as, castTo) =>
        if (t.attrSource.isEmpty)
          illegal("extract", s"source '${doc.from}' does not support extract (log-only)")
        val rs = requireRowSet("extract")
        if (rs.aggregated)
          illegal("extract", "cannot extract from an aggregated relation")
        checkRef(source)
        guardName(as)
        // no silent shadowing: an existing column, a promoted field, or an
        // earlier derived name may not be redefined (validate.rs:299-336)
        if (rs.fields.contains(as) || introduced.contains(as))
          fail(s"derived field '$as' collides with an existing field; extract may not shadow it")
        if (!parsers.contains(parser)) fail(s"invalid query: unknown parser '$parser'")
        if (!casts.contains(castTo)) fail(s"invalid query: unknown cast '$castTo'")
        introduced += as
        rel = rs.copy(fields = rs.fields + as)

      case Stage.Select(fs) =>
        requireRowSet("select")
        if (fs.isEmpty) fail("invalid query: select requires at least one field")
        fs.foreach(checkRef)
        rel = RowSet(fs.toSet, open = false,
          aggregated = rel.asInstanceOf[RowSet].aggregated)

      case Stage.Correlate(_, on, kind) =>
        // left-side legality only — the sub-document validates against
        // its own table when it lowers (the right `from` is resolved
        // there). Keys must resolve here; the joined relation opens for
        // inner/left (right payload columns arrive prefixed).
        val rs = requireRowSet("correlate")
        if (on.isEmpty) fail("invalid query: correlate requires at least one key")
        if (!Set("inner", "left", "semi", "anti")(kind))
          fail(s"invalid query: unknown correlate kind '$kind'")
        on.foreach(checkRef)
        if (kind == "inner" || kind == "left")
          rel = rs.copy(fields = rs.fields ++ on, open = true)
    }

    doc.fields.foreach { fs =>
      rel match {
        case _: Series =>
          fail("`fields` projection is only valid for rows/table results, not series")
        case rs: RowSet =>
          for (f <- fs) {
            guardName(f)
            if (!rs.fields.contains(f) && !rs.open)
              fail(s"`fields` entry '$f' is not present in the terminal relation")
          }
      }
    }

    Validated(rel)
  }
}
