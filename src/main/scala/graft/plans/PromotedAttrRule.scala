package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Coalesce, ElementAt, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Promotion-invariant attribute resolution as a CATALYST OPTIMIZER RULE
  * (reference: ir_planner.rs:10-15 — "the same query answers identically
  * before and after promotion"; column naming `label_<key>` from the
  * promotion rewriter, attr_promotion.rs).
  *
  * The LogQL/IR lowerings already consult their table's promotion map, but
  * the raw DataFrame/SQL surface does not: a user probing the attribute
  * containers directly writes
  *
  *   coalesce(element_at(log_attributes, 'region'),
  *            element_at(resource_attributes, 'region'), ...)
  *
  * — a map probe Parquet can never push down or prune with. After the
  * promotion rewriter materializes `label_region`, that column holds, for
  * every row, EXACTLY the value of the canonical container-priority
  * coalesce (that equality is the promotion invariant, asserted in
  * PromotionSpec). So the rewrite
  *
  *   Coalesce(ElementAt(c₁, k), …, ElementAt(cₙ, k))  →  label_k
  *
  * is semantics-preserving whenever the ElementAts probe the canonical
  * containers in priority order and `label_k` is available on the child —
  * and it turns an opaque map probe into a plain column read: the filter
  * reaches the scan as PushedFilters (dictionary/stats/bloom pruning), the
  * map column vanishes from ReadSchema when nothing else needs it, and the
  * expression stays inside whole-stage codegen.
  *
  * A BARE ElementAt(log_attributes, k) also rewrites, but only when no
  * later-priority container exists on the child (then the coalesce is the
  * single probe and the forms coincide). Unpromoted keys are untouched.
  */
object PromotedAttrRule extends Rule[LogicalPlan] {

  /** attribute containers in resolution-priority order — must match
    * AttrPromotion.promote and the lowerings' resolve. */
  private val Containers = Seq("log_attributes", "resource_attributes", "scope_attributes")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case node if node.children.nonEmpty =>
      val avail = node.children.flatMap(_.output)
      def promotedFor(key: String): Option[Attribute] =
        avail.find(_.name == s"label_$key")
      val containersInScope = Containers.filter(c => avail.exists(_.name == c))
      node.transformExpressionsUp {
        // canonical coalesce-of-probes, containers in priority order
        case c @ Coalesce(children) if children.size >= 2 =>
          probeKey(children, containersInScope)
            .flatMap(promotedFor)
            .getOrElse(c)
        // single probe — safe only when no shadowing container follows
        case ea @ ElementAt(att: AttributeReference, Literal(k: UTF8String, StringType), _, _)
            if containersInScope == Seq(att.name) =>
          promotedFor(k.toString).getOrElse(ea)
      }
  }

  /** Some(key) iff every child is ElementAt(container_i, key) with the
    * containers equal to the full in-scope priority list, in order. */
  private def probeKey(children: Seq[Expression], inScope: Seq[String]): Option[String] = {
    val probes = children.collect {
      case ElementAt(att: AttributeReference, Literal(k: UTF8String, StringType), _, _) =>
        (att.name, k.toString)
    }
    if (probes.size != children.size) return None
    val keys = probes.map(_._2).distinct
    if (keys.size != 1) return None
    if (probes.map(_._1) == inScope) Some(keys.head) else None
  }
}
