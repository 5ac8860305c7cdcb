package graft.promql

/** PromQL AST subset (reference surface: src/querier/src/query/promql.rs
  * — specs at :46-66 aggregations, :161-184 value ops, :277-306 label ops /
  * calendar; parsing there is outsourced to the promql-parser crate, ours is
  * a fresh recursive-descent parser over the same language subset).
  */
object Ast {

  sealed trait MatchOp
  object MatchOp {
    case object Eq extends MatchOp
    case object Neq extends MatchOp
    case object Re extends MatchOp
    case object Nre extends MatchOp
  }
  final case class LabelMatcher(label: String, op: MatchOp, value: String)

  sealed trait Expr
  final case class NumLit(v: Double) extends Expr
  final case class StrLit(s: String) extends Expr

  /** `@` pinning: evaluate the selector at one fixed time instead of per
    * step (reference promql.rs:257-269; eval metrics.rs:1746-1810). */
  sealed trait AtMod
  object AtMod {
    case object Start extends AtMod
    case object End extends AtMod
    final case class Time(sec: Long) extends AtMod
  }

  /** `metric{matchers}[range] offset d @ t` — instant if `rangeNs` empty.
    * Ranges are NANOSECONDS end to end, so sub-second selectors
    * (`rate(x[500ms])`) are first-class, matching the engine's i64-nano
    * time domain. */
  final case class Selector(
      metric: Option[String],
      matchers: Seq[LabelMatcher],
      rangeNs: Option[Long],
      offsetSec: Long = 0,
      at: Option[AtMod] = None) extends Expr

  /** `expr[range:res]` — inner evaluated at resolution `resNs` (nanos; 0
    * = default, the outer step), then re-reduced per outer step by an
    * _over_time function. `at` pins the subquery's evaluation time: the
    * window is the trailing `range` at that one instant, and the single
    * result replicates across the query grid (Prometheus `@` on a
    * subquery). */
  final case class Subquery(expr: Expr, rangeNs: Long, resNs: Long,
      at: Option[AtMod] = None) extends Expr

  /** Function call: rate, increase, irate, abs, clamp, absent,
    * histogram_quantile, label_replace, … */
  final case class Call(func: String, args: Seq[Expr]) extends Expr

  /** Aggregation operator with grouping. */
  final case class Agg(
      op: String,
      param: Option[Expr],
      expr: Expr,
      by: Seq[String],
      without: Seq[String]) extends Expr

  /** Binary op; `bool` for comparison operators; on/ignoring restrict the
    * vector-match key set. `group` = Some((leftIsMany, includeLabels)) for
    * group_left/group_right many-to-one matching — the reference only
    * parse-accepts these without lowering them (promql.rs:417-419); we
    * lower them as real joins. */
  final case class Binary(op: String, lhs: Expr, rhs: Expr, bool: Boolean,
      on: Seq[String] = Seq.empty, ignoring: Seq[String] = Seq.empty,
      group: Option[(Boolean, Seq[String])] = None) extends Expr

  final case class Unsupported(msg: String) extends RuntimeException(msg)
  final case class ParseError(msg: String, pos: Int) extends RuntimeException(s"$msg at $pos")

  val aggOps: Set[String] = Set(
    "sum", "avg", "min", "max", "count", "stddev", "stdvar", "group",
    "topk", "bottomk", "quantile", "count_values", "limitk", "limit_ratio")

  val rangeFuncs: Set[String] = Set(
    "rate", "increase", "delta", "irate", "idelta", "deriv",
    "changes", "resets",
    "avg_over_time", "sum_over_time", "min_over_time", "max_over_time",
    "count_over_time", "last_over_time", "stddev_over_time",
    "stdvar_over_time", "quantile_over_time", "absent_over_time",
    "present_over_time", "mad_over_time",
    "ts_of_max_over_time", "ts_of_min_over_time", "ts_of_last_over_time",
    "holt_winters", "double_exponential_smoothing")

  val scalarFuncs: Set[String] = Set(
    "abs", "ceil", "floor", "round", "sqrt", "exp", "ln", "log2", "log10",
    "sgn", "clamp", "clamp_min", "clamp_max",
    "sin", "cos", "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh",
    "deg", "rad", "pi", "predict_linear")

  val otherFuncs: Set[String] = Set(
    "absent", "histogram_quantile", "label_replace", "label_join",
    "histogram_count", "histogram_sum", "histogram_avg", "histogram_fraction",
    "scalar", "vector", "time", "timestamp", "sort", "sort_desc", "info",
    "sort_by_label", "sort_by_label_desc",
    "day_of_week", "day_of_month", "day_of_year", "days_in_month",
    "hour", "minute", "month", "year")
}
