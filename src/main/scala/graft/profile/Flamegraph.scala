package graft.profile

import org.apache.spark.sql.{DataFrame, Row}

/** Pyroscope flamegraph shaping (reference:
  * src/common/src/profile/aggregation.rs — prefix-tree fold + the levels
  * encoding emitted to Pyroscope; called from profile.rs:495-529).
  *
  * The heavy fold is relational (ProfileOps q62: explode prefixes →
  * groupBy path); this module only SHAPES the already-aggregated node
  * totals (bounded by distinct stack paths) into the Pyroscope `levels`
  * wire format: per depth, groups of 4 ints
  * `[barStart (delta-encoded), total, self, nameIdx]`.
  */
object Flamegraph {

  final case class Node(path: Seq[String], total: Long)
  final case class Encoded(names: Seq[String], levels: Seq[Seq[Long]], total: Long)

  /** fold rows (path ';'-joined, depth, total) into the levels encoding. */
  def encodeLevels(folded: Seq[Node]): Encoded = {
    if (folded.isEmpty) return Encoded(Seq.empty, Seq.empty, 0L)
    val byPath = folded.map(n => n.path -> n.total).toMap
    val maxDepth = folded.map(_.path.length).max
    val names = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def nameIdx(s: String): Int = names.getOrElseUpdate(s, names.size)

    // children grouped under their parent, depth-first order preserved so
    // bars nest correctly; siblings sorted by name for determinism
    def childrenOf(p: Seq[String]): Seq[Seq[String]] =
      byPath.keys.filter(k => k.length == p.length + 1 && k.startsWith(p))
        .toSeq.sortBy(_.last)

    val levels = Array.fill(maxDepth)(Seq.newBuilder[Long])

    /** emit node at absolute offset `start`; returns its total width. */
    def emit(path: Seq[String], start: Long): Long = {
      val total = byPath(path)
      val kids = childrenOf(path)
      val kidsTotal = kids.map(byPath).sum
      val self = total - kidsTotal
      levels(path.length - 1) += start += total += self += nameIdx(path.last).toLong
      var off = start
      for (k <- kids) off += emit(k, off)
      total
    }

    val roots = byPath.keys.filter(_.length == 1).toSeq.sortBy(_.last)
    var off = 0L
    for (r <- roots) off += emit(r, off)

    // delta-encode bar starts per level (Pyroscope wire format)
    val deltaLevels = levels.toSeq.map { b =>
      val flat = b.result()
      var prevEnd = 0L
      flat.grouped(4).flatMap { case Seq(start, total, self, idx) =>
        val delta = start - prevEnd
        prevEnd = start + total
        Seq(delta, total, self, idx)
      }.toSeq
    }
    Encoded(names.keys.toSeq, deltaLevels, roots.map(byPath).sum)
  }

  /** convenience: encode from the relational fold output
    * (service-filtered DataFrame with path/depth/total columns). */
  def encodeFromFold(folded: DataFrame): Encoded =
    encodeLevels(folded.select("path", "total").collect().toSeq.map {
      case Row(path: String, total: Long) => Node(path.split(';').toSeq, total)
    })
}
