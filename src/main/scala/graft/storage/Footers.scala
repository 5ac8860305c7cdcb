package graft.storage

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Parquet footer statistics, read WITHOUT touching row data — the
  * min/max metadata a 100 TB scan planner prunes with (the reference
  * leans on the same stats through Iceberg manifests + parquet row-group
  * skipping; compaction/Z-ordering exist precisely to make these ranges
  * tight). Exposed so layout jobs can MEASURE pruning potential instead
  * of asserting it by faith: `rangeReport` quantifies how tight each
  * file's [min,max] is per column, and `skippableFraction` answers "what
  * share of row groups would a point probe skip?" — footer reads only,
  * O(files) metadata I/O, no data pages.
  */
object Footers {

  final case class ColRange(file: String, rowGroup: Int, column: String,
      min: Long, max: Long, rows: Long)

  /** total rows under `dir` from footers alone — metadata I/O only, no
    * data pages, no Spark job. 0 for an absent/empty directory. */
  def rowCount(spark: SparkSession, dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return 0L
    var total = 0L
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        val rd = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try total += rd.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally rd.close()
      }
    }
    total
  }

  /** per-(file, row-group) [min,max] of integral columns (INT32/INT64
    * physical), from footer statistics alone. */
  def intRanges(spark: SparkSession, dir: String,
      columns: Set[String]): Seq[ColRange] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val it = fs.listFiles(root, true)
    val out = Seq.newBuilder[ColRange]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        val rd = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try {
          rd.getFooter.getBlocks.asScala.zipWithIndex.foreach { case (b, i) =>
            b.getColumns.asScala.foreach { c =>
              val name = c.getPath.toDotString
              val st = c.getStatistics
              // gate on the PHYSICAL type, not the statistics' runtime
              // class: FLOAT/DOUBLE stats are also java.lang.Number and
              // would silently truncate through longValue()
              val integral = {
                import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
                val pt = c.getPrimitiveType.getPrimitiveTypeName
                pt == INT32 || pt == INT64
              }
              if (integral && columns.contains(name) && st != null &&
                  !st.isEmpty && st.hasNonNullValue) {
                (st.genericGetMin, st.genericGetMax) match {
                  case (mn: java.lang.Number, mx: java.lang.Number) =>
                    out += ColRange(f.getPath.toString, i, name,
                      mn.longValue(), mx.longValue(), b.getRowCount)
                  case _ => ()
                }
              }
            }
          }
        } finally rd.close()
      }
    }
    out.result()
  }

  /** [min,max] of a TIMESTAMP (or raw INT64) column across all files
    * under `dir`, normalized to EPOCH MICROSECONDS from footer
    * statistics alone — no data pages, no Spark job. Unit-aware: the
    * parquet logical-type annotation (NANOS/MICROS/MILLIS) picks the
    * conversion, so the same caller works against both physical layouts
    * the events table has shipped in (TESTDATA.md). A bare INT64 with no
    * annotation is assumed to already be nanos (the engine's i64-nano
    * convention). None when no file carries stats for the column. */
  def timestampMicrosRange(spark: SparkSession, dir: String,
      column: String): Option[(Long, Long)] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return None
    var acc: Option[(Long, Long)] = None
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        val rd = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try {
          rd.getFooter.getBlocks.asScala.foreach { b =>
            b.getColumns.asScala.foreach { c =>
              val st = c.getStatistics
              val isInt64 = c.getPrimitiveType.getPrimitiveTypeName ==
                org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
              if (c.getPath.toDotString == column && isInt64 && st != null &&
                  !st.isEmpty && st.hasNonNullValue) {
                val toMicros: Long => Long = c.getPrimitiveType.getLogicalTypeAnnotation match {
                  case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                    t.getUnit match {
                      case LogicalTypeAnnotation.TimeUnit.NANOS  => v => Math.floorDiv(v, 1000L)
                      case LogicalTypeAnnotation.TimeUnit.MICROS => identity
                      case LogicalTypeAnnotation.TimeUnit.MILLIS => v => Math.multiplyExact(v, 1000L)
                    }
                  case _ => v => Math.floorDiv(v, 1000L) // bare INT64 ⇒ i64 nanos
                }
                (st.genericGetMin, st.genericGetMax) match {
                  case (mn: java.lang.Number, mx: java.lang.Number) =>
                    val lo = toMicros(mn.longValue())
                    val hi = toMicros(mx.longValue())
                    acc = acc match {
                      case None => Some((lo, hi))
                      case Some((a, b)) => Some((math.min(a, lo), math.max(b, hi)))
                    }
                  case _ => ()
                }
              }
            }
          }
        } finally rd.close()
      }
    }
    acc
  }

  /** share of row groups a point predicate `column = value` could skip
    * on min/max alone, in ppm (pure metadata answer). */
  def skippableFractionPpm(spark: SparkSession, dir: String, column: String,
      value: Long): Long = {
    val rs = intRanges(spark, dir, Set(column))
    require(rs.nonEmpty, s"no footer stats for $column under $dir")
    val skippable = rs.count(r => value < r.min || value > r.max)
    skippable.toLong * 1000000L / rs.size
  }

  /** mean [min,max] width per row group for `column` — the tightness a
    * clustering layout is trying to minimize. */
  def meanRangeWidth(spark: SparkSession, dir: String, column: String): Double = {
    val rs = intRanges(spark, dir, Set(column))
    require(rs.nonEmpty, s"no footer stats for $column under $dir")
    rs.map(r => (r.max - r.min).toDouble).sum / rs.size
  }

  /** one partition directory's health. */
  final case class PartitionStats(partition: String, files: Long,
      rows: Long, bytes: Long, avgFileBytes: Long)

  /** per-partition file health under a table root — file count, rows
    * (from footers), bytes, average file size: the numbers the
    * compaction planner decides on and the reference logs per candidate
    * (planner.rs PartitionStats). Leaf-directory listing + footer reads
    * only; no row data, no Spark job. */
  def partitionReport(spark: SparkSession, tableDir: String): Seq[PartitionStats] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(tableDir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Seq.empty
    val byPartition = scala.collection.mutable.LinkedHashMap
      .empty[String, (Long, Long, Long)] // files, rows, bytes
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        val rel = f.getPath.getParent.toString
          .stripPrefix(root.toString).stripPrefix("/")
        val part = if (rel.isEmpty) "." else rel
        val rd = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        val rows = try rd.getFooter.getBlocks.asScala.map(_.getRowCount).sum
          finally rd.close()
        val (pf, pr, pb) = byPartition.getOrElse(part, (0L, 0L, 0L))
        byPartition(part) = (pf + 1, pr + rows, pb + f.getLen)
      }
    }
    byPartition.toSeq.map { case (p, (nf, nr, nb)) =>
      PartitionStats(p, nf, nr, nb, if (nf == 0) 0L else nb / nf)
    }
  }
}
