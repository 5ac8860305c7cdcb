package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ANN maintenance laws: assignment to frozen centroids is
  * per-vector, so any micro-batching appends the identical postings set;
  * replay rewrites identical state; frozen centroids are never touched. */
class AnnMaintainSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkCentroids(dir: String): String = {
    import spark.implicits._
    // two well-separated 4-dim centroids
    Seq((0L, Seq(1000000L, 0L, 0L, 0L)), (1L, Seq(0L, 1000000L, 0L, 0L)))
      .toDF("c_id", "cv")
      .withColumn("cn", expr(
        "aggregate(cv, CAST(0 AS BIGINT), (a, x) -> a + x * x)"))
      .write.mode("overwrite").parquet(s"$dir/centroids")
    s"$dir/centroids"
  }

  private val vecs = Seq(
    (10L, Seq(900000L, 100000L, 0L, 0L)),  // → cell 0
    (11L, Seq(100000L, 900000L, 0L, 0L)),  // → cell 1
    (12L, Seq(800000L, 50000L, 10L, 0L)),  // → cell 0
    (13L, Seq(0L, 700000L, 0L, 5L)))       // → cell 1

  private def withNorm(rows: Seq[(Long, Seq[Long])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "vq").withColumn("nrm", expr(
      "aggregate(vq, CAST(0 AS BIGINT), (a, x) -> a + x * x)"))
  }

  private def state(dir: String) =
    AnnMaintain.postings(spark, dir)
      .select(col("n_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("batching invariance + correct frozen-centroid assignment") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_annm_").toString
    val cp = mkCentroids(base)
    val d2 = s"$base/two"; val d1 = s"$base/one"
    val in = MemoryStream[(Long, Seq[Long])](spark)
    val q = AnnMaintain.start(
      in.toDF().toDF("vec_id", "vq").withColumn("nrm", expr(
        "aggregate(vq, CAST(0 AS BIGINT), (a, x) -> a + x * x)")),
      d2, cp)
    try {
      in.addData(vecs(0), vecs(1)); q.processAllAvailable()
      in.addData(vecs(2), vecs(3)); q.processAllAvailable()
    } finally q.stop()
    AnnMaintain.maintainBatch(d1, cp)(withNorm(vecs), 0L)
    val got = state(d2)
    assert(got == state(d1), "micro-batching changed the postings")
    assert(got == Set((10L, 0L), (12L, 0L), (11L, 1L), (13L, 1L)))
    // the frozen centroids were never rewritten by the stream
    assert(spark.read.parquet(cp).count() == 2)
  }

  test("replaying a batch id rewrites identical postings") {
    val base = java.nio.file.Files.createTempDirectory("graft_annr_").toString
    val cp = mkCentroids(base)
    val dir = s"$base/idx"
    AnnMaintain.maintainBatch(dir, cp)(withNorm(vecs.take(2)), 0L)
    AnnMaintain.maintainBatch(dir, cp)(withNorm(vecs.drop(2)), 1L)
    val before = state(dir)
    AnnMaintain.maintainBatch(dir, cp)(withNorm(vecs.drop(2)), 1L)
    assert(state(dir) == before)
    assert(AnnMaintain.postings(spark, dir).count() == 4,
      "replay must not duplicate postings")
    // compaction folds the batch dirs and changes nothing a probe sees
    AnnMaintain.compact(spark, dir)
    assert(state(dir) == before)
    assert(new java.io.File(s"$dir/postings").listFiles()
      .map(_.getName).toSet == Set("compact-1"))
  }
}
