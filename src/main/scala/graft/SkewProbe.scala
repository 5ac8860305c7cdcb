package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // hot key 0: 200k rows; other keys uniform
    val left = spark.range(0, 220000).select(
      when(col("id") < 200000, 0L).otherwise(col("id") % 100).as("k"),
      concat(lit("payload-"), col("id")).as("pl"))
    val right = spark.range(0, 100).select(col("id").as("k"), col("id").as("v"))
    val j = left.join(right, "k")
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    println("HAS_SKEW=" + plan.contains("skew="))
    val i = plan.indexOf("SortMergeJoin")
    if (i>=0) println(plan.substring(i, math.min(i+120, plan.length)))
    spark.stop()
  }
}
