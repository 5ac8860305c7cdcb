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

  // ---- differential ("double") encoding ----------------------------------

  final case class DiffNode(path: Seq[String], left: Long, right: Long)
  final case class EncodedDiff(names: Seq[String], levels: Seq[Seq[Long]],
      leftTicks: Long, rightTicks: Long, total: Long, maxSelf: Long)

  /** fold two windows' node totals into the Pyroscope DOUBLE flamebearer
    * encoding (reference aggregation.rs `flatten_diff`): per level,
    * groups of 7 ints `[leftDeltaOffset, leftTotal, leftSelf,
    * rightDeltaOffset, rightTotal, rightSelf, nameIdx]`, with a
    * synthetic `total` root whose ticks are the two windows' sums.
    * Siblings sort by name for determinism (the single-format rule). */
  def encodeDiffLevels(folded: Seq[DiffNode]): EncodedDiff = {
    val byPath = folded.map(n => n.path -> (n.left, n.right)).toMap
    val names = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def nameIdx(s: String): Int = names.getOrElseUpdate(s, names.size)
    def childrenOf(p: Seq[String]): Seq[Seq[String]] =
      byPath.keys.filter(k => k.length == p.length + 1 && k.startsWith(p))
        .toSeq.sortBy(_.last)
    def at(p: Seq[String]): (Long, Long) = byPath.getOrElse(p, (0L, 0L))
    def selfOf(p: Seq[String]): (Long, Long) = {
      val (l, r) = at(p)
      val kids = childrenOf(p)
      (l - kids.map(at(_)._1).sum, r - kids.map(at(_)._2).sum)
    }
    val roots = byPath.keys.filter(_.length == 1).toSeq.sortBy(_.last)
    val leftTicks = roots.map(at(_)._1).sum
    val rightTicks = roots.map(at(_)._2).sum
    var maxSelf = 0L
    val rootIdx = nameIdx("total")
    val levels = Seq.newBuilder[Seq[Long]]
    levels += Seq(0L, leftTicks, 0L, 0L, rightTicks, 0L, rootIdx.toLong)
    // BFS blocks: (left absolute offset, right absolute offset, path);
    // the synthetic root's children are the depth-1 paths
    var current: Seq[(Long, Long, Seq[String])] = Seq((0L, 0L, Seq.empty))
    while (current.nonEmpty) {
      val next = Seq.newBuilder[(Long, Long, Seq[String])]
      val level = Seq.newBuilder[Long]
      var any = false
      var prevLeftEnd = 0L
      var prevRightEnd = 0L
      for ((lOff, rOff, p) <- current) {
        var lx = lOff; var rx = rOff
        for (k <- childrenOf(p)) {
          val (lt, rt) = at(k)
          val (ls, rs) = selfOf(k)
          level += (lx - prevLeftEnd) += lt += ls +=
            (rx - prevRightEnd) += rt += rs += nameIdx(k.last).toLong
          maxSelf = math.max(maxSelf, math.max(ls, rs))
          next += ((lx, rx, k))
          prevLeftEnd = lx + lt
          prevRightEnd = rx + rt
          lx += lt; rx += rt
          any = true
        }
      }
      if (any) levels += level.result()
      current = if (any) next.result() else Seq.empty
    }
    EncodedDiff(names.keys.toSeq, levels.result(), leftTicks, rightTicks,
      leftTicks + rightTicks, maxSelf)
  }

  /** encode a diff from two relational folds (path/total frames). */
  def encodeDiffFromFolds(left: DataFrame, right: DataFrame): EncodedDiff = {
    def m(df: DataFrame): Map[Seq[String], Long] =
      df.select("path", "total").collect().toSeq.map {
        case Row(path: String, total: Long) => path.split(';').toSeq -> total
      }.toMap
    val lm = m(left); val rm = m(right)
    encodeDiffLevels((lm.keySet ++ rm.keySet).toSeq.map(p =>
      DiffNode(p, lm.getOrElse(p, 0L), rm.getOrElse(p, 0L))))
  }
}
