package graft.storage

import org.apache.spark.sql.SparkSession

import graft.storage.Storage.TableLayout

/** Multi-tenant compaction fairness (reference:
  * src/compactor/src/scheduler/mod.rs — candidates are distributed
  * round-robin across tenants with a per-tenant cap and a total cycle
  * cap, the scan position carrying over between cycles; planner.rs
  * enumerates candidates per (tenant, dataset) with closed-hour gating).
  *
  * Without this, selection by file count alone lets one noisy tenant's
  * small-file spray occupy every compaction slot and starve the others —
  * at fleet scale the compactor must make progress for EVERY tenant each
  * tick, not just the loudest. Selection is pure metadata (directory
  * listings); the actual rewrite stays `Storage.compactPartition`, one
  * partition per job.
  */
final class CompactionScheduler(
    maxPerCycle: Int = 20,
    maxPerTenant: Int = 5) {

  import CompactionScheduler.Candidate

  /** sorted key of the tenant the previous cycle served LAST; the next
    * cycle starts one after it, so tenants the cap cut off are first in
    * line next tick. */
  private var lastTenant: Option[String] = None

  /** plan one cycle over every (layout, table): gather per-tenant
    * candidates (closed hours, ≥ minFiles), then serve tenants in sorted
    * round-robin order starting after the last-served. */
  def planCycle(spark: SparkSession,
      tables: Seq[(TableLayout, String)],
      minFiles: Int = 2,
      nowNanos: Option[Long] = None,
      latenessSec: Long = 600): Seq[Candidate] = {
    val all = tables.flatMap { case (layout, table) =>
      Storage.partitionsNeedingCompaction(spark, layout, table, minFiles,
          nowNanos, latenessSec)
        .map { case (day, hour) => Candidate(layout, table, day, hour) }
    }
    schedule(all)
  }

  /** the fair distribution itself (separable for testing): at most
    * `maxPerTenant` per tenant, `maxPerCycle` total, tenants served in
    * sorted order rotated to start after the previously-served one. A
    * cap of 0 means unlimited. */
  def schedule(all: Seq[Candidate]): Seq[Candidate] = {
    if (all.isEmpty) return Seq.empty
    val byTenant = all.groupBy(_.tenantKey)
    val keys = byTenant.keys.toSeq.sorted
    val start = lastTenant.flatMap(l => {
      val p = keys.indexOf(l)
      if (p >= 0) Some((p + 1) % keys.length) else None
    }).getOrElse(0)
    val totalCap = if (maxPerCycle == 0) Int.MaxValue else maxPerCycle
    val tenantCap = if (maxPerTenant == 0) Int.MaxValue else maxPerTenant

    val out = Seq.newBuilder[Candidate]
    var taken = 0
    var served: Option[String] = None
    var i = 0
    while (i < keys.length && taken < totalCap) {
      val tenant = keys((start + i) % keys.length)
      val take = math.min(byTenant(tenant).length,
        math.min(tenantCap, totalCap - taken))
      if (take > 0) {
        out ++= byTenant(tenant).take(take)
        taken += take
        served = Some(tenant)
      }
      i += 1
    }
    served.foreach(t => lastTenant = Some(t))
    out.result()
  }

  /** reset position tracking (after tenant-list changes). */
  def resetPosition(): Unit = lastTenant = None
}

object CompactionScheduler {
  /** one closed partition of one (tenant, dataset, table) needing a
    * rewrite — the unit the executor compacts and commits. */
  final case class Candidate(layout: TableLayout, table: String,
      day: String, hour: Int) {
    def tenantKey: String = s"${layout.tenant}/${layout.dataset}"
  }
}
