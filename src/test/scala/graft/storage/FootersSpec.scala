package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Footer-statistics reader + the Z-order clustering claim MEASURED:
  * against a single-dimension sort, Morton layout bounds the per-file
  * [min,max] of BOTH dimensions, so point probes on the secondary
  * dimension skip row groups on metadata alone — the property that makes
  * multi-dimensional clustering worth a compaction rewrite at 100 TB.
  */
class FootersSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("z-order layout tightens secondary-dimension footer ranges") {
    import spark.implicits._
    // full 64x64 (a, b) grid, shuffled
    val grid = scala.util.Random.shuffle(
      (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong)).toList)
      .toDF("a", "b")

    // layout L: range-split + sorted on `a` alone (the time-only sort)
    val ldir = Files.createTempDirectory("graft-lin").toString + "/t"
    grid.repartitionByRange(8, col("a"))
      .sortWithinPartitions(col("a"))
      .write.parquet(ldir)

    // layout Z: range-split + sorted on the interleaved Morton key
    val zdir = Files.createTempDirectory("graft-zord").toString + "/t"
    grid.withColumn("z", Storage.zorderKey(col("a"), col("b"), bits = 6))
      .repartitionByRange(8, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.parquet(zdir)

    val linB = Footers.meanRangeWidth(spark, ldir, "b")
    val zA = Footers.meanRangeWidth(spark, zdir, "a")
    val zB = Footers.meanRangeWidth(spark, zdir, "b")

    // the a-sorted layout knows nothing about b: every file spans ~all of it
    assert(linB > 60.0, s"a-sorted layout should leave b unclustered, got $linB")
    // z-order pays a little on `a` but bounds BOTH dims well below b's
    // unclustered width
    assert(zA < 48.0 && zB < 48.0, s"z-order should bound both dims, got a=$zA b=$zB")

    // and that tightness is exactly what a metadata probe on b can use
    val linSkip = Footers.skippableFractionPpm(spark, ldir, "b", 17L)
    val zSkip = Footers.skippableFractionPpm(spark, zdir, "b", 17L)
    assert(linSkip == 0L, s"a-sorted layout cannot skip on b, got $linSkip")
    assert(zSkip >= 500000L, s"z-order should skip >=half the row groups on b, got $zSkip")
  }
}
