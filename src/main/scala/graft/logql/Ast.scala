package graft.logql

/** LogQL AST — the subset the reference supports (reference:
  * src/logql/src/ast.rs:184-228, docs/users/logql-reference.md).
  * Out-of-subset constructs parse into explicit errors, never silently
  * unfiltered results (reference: src/querier/src/query/search_filter.rs:6-9).
  */
object Ast {

  sealed trait MatchOp
  object MatchOp {
    case object Eq extends MatchOp  // =
    case object Neq extends MatchOp // !=
    case object Re extends MatchOp  // =~  (fully anchored, like Loki)
    case object Nre extends MatchOp // !~
  }

  /** `{label op "value"}` */
  final case class LabelMatcher(label: String, op: MatchOp, value: String)

  final case class Selector(matchers: Seq[LabelMatcher])

  /** Pipeline stages after the selector. */
  sealed trait Stage
  object Stage {
    /** `|= "s"` / `!= "s"` / `|~ "re"` / `!~ "re"` on body. */
    final case class LineFilter(op: LineOp, needle: String) extends Stage
    /** `| json` — subsequent labels resolve from the body JSON. */
    case object Json extends Stage
    /** `| logfmt` — subsequent labels resolve from logfmt pairs in body. */
    case object Logfmt extends Stage
    /** `| <pred>` label-filter expression. */
    final case class LabelFilter(pred: LabelPredicate) extends Stage
    /** `| unwrap lbl` / `| unwrap duration(lbl)` / `| unwrap bytes(lbl)` —
      * sample value for the metric family, optionally converted
      * (reference ast.rs:85,169-175). */
    final case class Unwrap(label: String, conversion: Option[String] = None) extends Stage
    /** `| line_format "tmpl"` — rewrite body from a {{.label}} template. */
    final case class LineFormat(template: String) extends Stage
    /** `| label_format dst=src` or `dst="tmpl"` — rename / templated label. */
    final case class LabelFormat(assignments: Seq[(String, Either[String, String])]) extends Stage
    /** `| pattern "<p>"` — positional capture extraction from body
      * (reference ast.rs:65 `Pattern`). */
    final case class Pattern(pattern: String) extends Stage
    /** `| json lbl="path.to[0].field", other` — targeted JSON extraction:
      * ONLY the listed labels are extracted (Loki semantics; reference
      * ast.rs:59 `Json(Vec<LabelExtraction>)`). A bare item extracts the
      * path equal to its own name. */
    final case class JsonPath(extractions: Seq[(String, String)]) extends Stage
    /** `| logfmt lbl="src", other` — targeted logfmt extraction
      * (reference ast.rs:62 `Logfmt(LogfmtStage)`). */
    final case class LogfmtExtract(extractions: Seq[(String, String)]) extends Stage
    /** `| regexp "(?P<name>re)"` — named-capture extraction from body
      * (reference ast.rs:64 `Regexp`). */
    final case class Regexp(pattern: String) extends Stage
    /** `| unpack` — the line is a packed JSON object: `_entry` is the real
      * line, every other key is a label (reference ast.rs:68). */
    case object Unpack extends Stage
    /** `| decolorize` — strip ANSI color escapes from body
      * (reference ast.rs:70). */
    case object Decolorize extends Stage
    /** `| drop a, method="GET"` — remove labels, optionally only where the
      * matcher holds (reference ast.rs:79). */
    final case class DropLabels(items: Seq[(String, Option[(MatchOp, String)])]) extends Stage
    /** `| keep a, method="GET"` — keep ONLY these labels (reference
      * ast.rs:81). */
    final case class KeepLabels(items: Seq[(String, Option[(MatchOp, String)])]) extends Stage
    /** `| distinct a, b` — first line per distinct combination of the
      * label values (reference ast.rs:84). */
    final case class Distinct(labels: Seq[String]) extends Stage
    /** `|= ip("...")` / `!= ip("...")` — keep/drop lines containing an
      * IPv4 in the exact/range/CIDR pattern. IMPLEMENTED beyond the
      * reference, which parses ip() but rejects it at execution
      * (logql.rs:674). Label filters also accept IPv6 (hex-string
      * normalization); IPv6 LINE filters stay unsupported. */
    final case class LineIpFilter(contains: Boolean, pattern: String) extends Stage
  }

  sealed trait LineOp
  object LineOp {
    case object Contains extends LineOp    // |=
    case object NotContains extends LineOp // !=
    case object Regex extends LineOp       // |~  (unanchored search)
    case object NotRegex extends LineOp    // !~
    case object Pattern extends LineOp     // |>  (whole-line pattern match)
    case object NotPattern extends LineOp  // !>
  }

  /** Label-filter predicate tree (`and`/`or`/`,` over comparisons). */
  sealed trait LabelPredicate
  object LabelPredicate {
    final case class And(l: LabelPredicate, r: LabelPredicate) extends LabelPredicate
    final case class Or(l: LabelPredicate, r: LabelPredicate) extends LabelPredicate
    /** String comparison: = != =~ !~ (regex anchored). */
    final case class StrCmp(label: String, op: MatchOp, value: String) extends LabelPredicate
    /** Numeric comparison: == != > >= < <= with numeric coercion
      * (reference: src/querier/src/query/ir_planner.rs:740-776). */
    final case class NumCmp(label: String, op: CmpOp, value: Double) extends LabelPredicate
    /** `lbl = ip("...")` / `lbl != ip("...")` — IPv4 exact/range/CIDR
      * membership. IMPLEMENTED beyond the reference (rejected at
      * execution there, logql.rs:674). Both forms require the value to
      * parse as an IPv4: `!=` means "is an IPv4 outside the pattern",
      * not "is not an IPv4 in the pattern". */
    final case class IpCmp(label: String, eq: Boolean, pattern: String) extends LabelPredicate
  }

  sealed trait CmpOp
  object CmpOp {
    case object Eq extends CmpOp
    case object Neq extends CmpOp
    case object Gt extends CmpOp
    case object Gte extends CmpOp
    case object Lt extends CmpOp
    case object Lte extends CmpOp
  }

  /** `{...} stages...` — a log (line) query. */
  final case class LogQuery(selector: Selector, stages: Seq[Stage]) {
    def unwrapLabel: Option[String] =
      stages.collectFirst { case Stage.Unwrap(l, _) => l }
  }

  /** Range aggregation `func(inner[range]) [offset d]`; `param` for
    * quantile_over_time; trailing offset per reference parser.rs:898. */
  final case class RangeAgg(
      func: String,
      inner: LogQuery,
      rangeSec: Long,
      param: Option[Double],
      offsetSec: Long = 0)

  /** Outer vector aggregation `func[(k,)](range_agg) by/without (...)`. */
  final case class VectorAgg(
      func: String,
      param: Option[Double],
      inner: RangeAgg,
      by: Seq[String],
      without: Seq[String])

  sealed trait Query
  final case class LineQuery(q: LogQuery) extends Query
  final case class MetricQuery(expr: MetricExpr) extends Query

  sealed trait MetricExpr
  final case class RangeExpr(agg: RangeAgg) extends MetricExpr
  final case class VectorExpr(agg: VectorAgg) extends MetricExpr

  /** binary op between LogQL metric exprs (reference logs.rs:906-1100
    * join_binary/join_compare/join_logical): arithmetic, comparison
    * (`bool` mode), and/or/unless, with on()/ignoring() match keys. */
  final case class BinaryExpr(op: String, lhs: MetricExpr, rhs: MetricExpr,
      bool: Boolean, on: Seq[String] = Seq.empty,
      ignoring: Seq[String] = Seq.empty,
      group: Option[(Boolean, Seq[String])] = None) extends MetricExpr

  /** scalar literal operand of a BinaryExpr. */
  final case class LiteralExpr(v: Double) extends MetricExpr
  /** `vector(v)` literal — IMPLEMENTED BEYOND the reference (its docs
    * list `... or vector(0)` fallbacks as unsupported at execution,
    * docs/users/logql-reference.md:218-226). Only meaningful as the
    * right side of `or`, where it fills empty grid buckets. */
  final case class VectorLit(v: Double) extends MetricExpr
  /** label_replace over a metric expr (reference logs.rs:1102-1188). */
  final case class LabelReplaceExpr(inner: MetricExpr, dst: String,
      repl: String, src: String, regex: String) extends MetricExpr

  /** Loki 2.7 sort()/sort_desc() — presentation order over ANY metric
    * expr (value, then labels as tie-break). */
  final case class SortExpr(desc: Boolean, inner: MetricExpr) extends MetricExpr

  /** Raised for parseable-but-unsupported constructs — explicit, like the
    * reference's Unsupported errors (search_filter.rs:6-9). */
  final case class Unsupported(msg: String) extends RuntimeException(msg)
  final case class ParseError(msg: String, pos: Int) extends RuntimeException(s"$msg at $pos")
}
