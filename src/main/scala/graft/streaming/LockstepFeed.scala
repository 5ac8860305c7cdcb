package graft.streaming

import org.apache.spark.sql.DataFrame

/** ONE stream feeding SEVERAL index stores in lockstep — q403's shape
  * (every micro-batch lands in the exact-dedup hash ledger AND the
  * near-dup shingle index, one pass over the data), and the general
  * form of any multi-index ingest at 100 TB: the corpus is read once,
  * each maintainer gets the batch in a FIXED order.
  *
  * Crash-consistency law (the "multi-store feed" law,
  * `streaming/README.md`): the per-store append is atomic (own-dir
  * overwrite + _SUCCESS) but the SEQUENCE is not — a crash between two
  * appends leaves a PREFIX of the stores one batch ahead. That torn
  * window is:
  *   - per-store read-consistent: each store individually serves only
  *     complete batch dirs (the [[BatchStore]] live-dir rule) — no
  *     store ever serves a partial batch;
  *   - cross-store DIVERGENT: a probe that consults several stores can
  *     see the crashed batch in the stores before the crash point and
  *     not in the ones after it (q403's torn read: the hash ledger
  *     says `exact`, the shingle index says `new`). Cross-store
  *     agreement is only guaranteed at batch boundaries the whole
  *     sequence completed.
  *   - self-healing on replay: the streaming engine re-delivers the
  *     batch under the SAME batchId; every maintainer's append
  *     deterministically overwrites only its own `batch-<id>` dir, so
  *     stores that already took the batch converge to identical
  *     content and the ones that missed it catch up — after replay the
  *     stores are indistinguishable from an uninterrupted run
  *     (LockstepFeedSpec pins the full kill → torn-read → heal cycle).
  *
  * Maintainers must therefore never derive cross-store state inside a
  * batch (each feed reads only the batch and its OWN store), which
  * every maintainer in this package already observes. */
object LockstepFeed {

  /** test failpoint: fires after feed `i` of batch `batchId` completes
    * — the crash window between two lockstep appends. */
  private[streaming] var failpoint: (Long, Int) => Unit = (_, _) => ()

  /** a foreachBatch body applying `feeds` in order — each is a
    * maintainer's `maintainBatch(dir)` partial application. */
  def body(feeds: ((DataFrame, Long) => Unit)*)(
      batch: DataFrame, batchId: Long): Unit =
    feeds.zipWithIndex.foreach { case (f, i) =>
      f(batch, batchId)
      failpoint(batchId, i)
    }
}
