package graft.ir

/** Query IR AST (reference: src/common/src/query_ir/document.rs:44-66,
  * stage.rs, predicate.rs:27-73, value.rs:27-40).
  *
  * A versioned JSON document `{irVersion, from, range, result, fields?,
  * pipeline:[Stage]}` over a typed relation calculus; predicates use
  * three-valued Kleene truth with explicit Absent (value.rs:342-346).
  */
object Ir {

  sealed trait Value
  object Value {
    final case class Str(s: String) extends Value
    final case class I64(v: Long) extends Value
    final case class F64(v: Double) extends Value
    final case class Bool(b: Boolean) extends Value
    /** epoch nanos (parsed from RFC3339 or relative `now-1h`). */
    final case class TsNs(ns: Long) extends Value
  }

  /** Absolute time range in epoch nanos; relative anchors are resolved
    * against a server-stamped nowNs at parse time (deterministic relative
    * time, reference query/mod.rs:33-46). */
  final case class TimeRange(startNs: Long, endNs: Long)

  sealed trait Predicate
  object Predicate {
    final case class And(ps: Seq[Predicate]) extends Predicate
    final case class Or(ps: Seq[Predicate]) extends Predicate
    final case class Not(p: Predicate) extends Predicate
    /** ops: eq ne gt gte lt lte (predicate.rs:27-45) */
    final case class Cmp(field: String, op: String, value: Value) extends Predicate
    final case class In(field: String, values: Seq[Value]) extends Predicate
    final case class Between(field: String, lo: Value, hi: Value) extends Predicate
    final case class Contains(field: String, needle: String) extends Predicate
    final case class Regex(field: String, re: String) extends Predicate
    /** the only predicate that observes absence (predicate.rs:178-205) */
    final case class Exists(field: String) extends Predicate
  }

  /** named aggregate: op ∈ count,sum,avg,min,max,quantile (stage.rs:16-80) */
  final case class AggSpec(name: String, op: String, field: Option[String], p: Option[Double])

  final case class OrderKey(field: String, desc: Boolean, nullsLast: Boolean)

  sealed trait Stage
  object Stage {
    final case class Filter(p: Predicate) extends Stage
    /** group by fields (+ optional step-second time bucket named `bucket_start`) */
    final case class Aggregate(by: Seq[String], stepSec: Option[Long], aggs: Seq[AggSpec]) extends Stage
    final case class Order(keys: Seq[OrderKey]) extends Stage
    final case class Limit(n: Int) extends Stage
    /** sort by field desc(topk)/asc(bottomk) + limit (ir_planner.rs:509-520) */
    final case class TopK(field: String, k: Int, bottom: Boolean) extends Stage
    /** bounded json/logfmt field extraction into a new field, with a typed
      * cast (ir_planner.rs:847-1073 ir_extract) */
    final case class Extract(source: String, parser: String, key: String,
        as: String, castTo: String) extends Stage
    final case class Select(fields: Seq[String]) extends Stage
    /** cross-signal correlate — IMPLEMENTED BEYOND the reference, whose
      * IR roadmap defers it ("a `correlate` join stage (the IR becomes a
      * DAG)", docs/users/querying-ir.md:213-222). `right` is a full
      * sub-document over its own `from`; the join is keyed equality.
      * kind ∈ inner | left | semi | anti; for inner/left the right
      * side's non-key columns arrive prefixed `right_`. */
    final case class Correlate(right: Document, on: Seq[String],
        kind: String) extends Stage
  }

  final case class Document(
      irVersion: Int,
      from: String,
      range: TimeRange,
      pipeline: Seq[Stage],
      fields: Option[Seq[String]])

  final case class IrError(msg: String) extends RuntimeException(msg)
}
