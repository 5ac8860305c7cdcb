package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, LongType}

import graft.Tables
import graft.promql.Eval
import graft.promql.Eval.Vec

/** Stored-histogram query path (reference: metrics_histogram rows carry a
  * whole OTLP histogram as JSON array strings — schemas.toml:141-169;
  * quantile machinery metrics.rs:1061-1224,2273-2455: element-wise-sum the
  * bucket_counts arrays per (bucket, series), then interpolate φ from
  * explicit_bounds).
  *
  * The histogram view synthesizes one OTLP histogram row per event
  * (bounds [50,100,150], counts = one-hot bin + overflow); queries parse
  * the JSON arrays with from_json and aggregate element-wise via
  * posexplode + groupBy — array summation as a shuffle, not a UDAF.
  */
object HistogramOps {
  type Q = (SparkSession, String) => DataFrame

  /** events → metrics_histogram-shaped rows. */
  private def histRowsDf(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      (unix_micros(col("ts_us")) * 1000).as("timestamp"),
      col("event_id"),
      concat(lit("svc-"), pmod(col("user_id"), lit(8))).as("service_name"),
      lit("request_size").as("metric_name"),
      lit(1L).as("count"),
      col("value").as("sum"),
      // non-cumulative OTLP bins for bounds [50,100,150] + overflow
      concat(lit("["),
        when(col("value") <= 50, "1").otherwise("0"), lit(","),
        when(col("value") > 50 && col("value") <= 100, "1").otherwise("0"), lit(","),
        when(col("value") > 100 && col("value") <= 150, "1").otherwise("0"), lit(","),
        when(col("value") > 150, "1").otherwise("0"), lit("]")).as("bucket_counts"),
      lit("[50.0,100.0,150.0]").as("explicit_bounds"))

  private val histRowsSql: String =
    """SELECT epoch_ns(ts) AS timestamp, event_id,
      |  concat('svc-', user_id % 8) AS service_name,
      |  'request_size' AS metric_name, 1 AS count, value AS sum,
      |  concat('[',
      |    CASE WHEN value <= 50 THEN '1' ELSE '0' END, ',',
      |    CASE WHEN value > 50 AND value <= 100 THEN '1' ELSE '0' END, ',',
      |    CASE WHEN value > 100 AND value <= 150 THEN '1' ELSE '0' END, ',',
      |    CASE WHEN value > 150 THEN '1' ELSE '0' END, ']') AS bucket_counts,
      |  '[50.0,100.0,150.0]' AS explicit_bounds
      |FROM events""".stripMargin

  private val step = 604800L

  /** parse + element-wise sum per (bucket, service), as cumulative le rows.
    *
    * The bounds are FIXED (4 bins), so this is ONE hash aggregate — four
    * conditional sums over element_at, map-side partials — followed by a
    * 4-row explode of the inline running totals. The previous shape
    * (posexplode ×4 rows, shuffle, running-sum window) quadrupled the scan
    * and added a per-partition sort; at 100 TB that window IS the
    * bottleneck (VERDICT r1, q72 8.7 s → this). */
  private def cumulativeLe(s: SparkSession, dir: String): DataFrame = {
    val rows = histRowsDf(s, dir)
      .withColumn("bucket_start", expr(s"(timestamp div 1000000000) div $step * $step"))
      .withColumn("counts", from_json(col("bucket_counts"), ArrayType(LongType)))
    val binAggs = (0 until 4).map(i =>
      sum(element_at(col("counts"), i + 1)).as(s"_c$i"))
    val sums = rows.groupBy(col("bucket_start"), col("service_name"))
      .agg(binAggs.head, binAggs.tail: _*)
    val les = Seq("50", "100", "150", "+Inf")
    val cums = (0 until 4).map(i =>
      (0 to i).map(j => col(s"_c$j")).reduce(_ + _))
    sums.select(col("bucket_start"), col("service_name"),
      explode(array((0 until 4).map(i => struct(
        lit(i).as("bin"),
        lit(les(i)).as("le"),
        cums(i).cast(DoubleType).as("cum"))): _*)).as("_x"))
      .select(col("bucket_start"), col("service_name"),
        col("_x.bin").as("bin"), col("_x.le").as("le"), col("_x.cum").as("cum"))
  }

  /** events → metrics_exponential_histogram-shaped rows (reference
    * iceberg/schemas.rs:322-378): scale=2 (4 sub-buckets per octave),
    * offset 0, 8 positive buckets with deterministic integer counts. */
  private def expHistRowsDf(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      (unix_micros(col("ts_us")) * 1000).as("timestamp"),
      concat(lit("svc-"), pmod(col("user_id"), lit(8))).as("service_name"),
      lit("latency_exp").as("metric_name"),
      lit(2).as("scale"),
      // deterministic nonzero zero-bucket mass so the zero bucket is a
      // REAL stop on the quantile walk (q124), not schema filler
      when(pmod(expr("cast(floor(value) as bigint)"), lit(4)) === 0, 3L)
        .otherwise(0L).as("zero_count"),
      lit(0).as("positive_offset"),
      to_json(expr(
        "transform(sequence(0, 7), i -> (cast(floor(value) as bigint) + i) % 3)"))
        .as("positive_bucket_counts"))

  /** events → metrics_summary-shaped rows (schemas.rs:380-414):
    * quantile_values carries pre-computed sketch quantiles as JSON;
    * integer-rendered so the oracle round-trips exactly. */
  private def summaryRowsDf(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      (unix_micros(col("ts_us")) * 1000).as("timestamp"),
      concat(lit("svc-"), pmod(col("user_id"), lit(8))).as("service_name"),
      lit("latency_summary").as("metric_name"),
      concat(lit("""[{"q":0.5,"v":"""),
        round(col("value")).cast(LongType), lit("""},{"q":0.99,"v":"""),
        round(col("value") * 3).cast(LongType), lit("}]")).as("quantile_values"))

  val queries: Map[String, Q] = Map(
    // exponential-histogram quantile: parse counts JSON, element-wise sum
    // per (day, service), cumulative walk to φ=0.9, result in the EXACT
    // log2 domain ((idx+1)/2^scale — dyadic rational, engine-portable;
    // the linear bound is pow(2, log2_ub))
    "q92_exphist_quantile" -> ((s, dir) => {
      val rows = expHistRowsDf(s, dir)
        .withColumn("bucket_start", expr("(timestamp div 1000000000) div 86400 * 86400"))
        .withColumn("counts", from_json(col("positive_bucket_counts"), ArrayType(LongType)))
      // ONE hash aggregate (8 element-wise sums, map-side partials), then
      // the phi-bucket is a when-chain over the inline running totals —
      // no explode, no shuffle-per-bin, no window/sort at all
      val binAggs = (0 until 8).map(i =>
        sum(element_at(col("counts"), i + 1)).as(s"_c$i"))
      val sums = rows.groupBy(col("bucket_start"), col("service_name"))
        .agg(binAggs.head, binAggs.tail: _*)
      val cums = (0 until 8).map(i => (0 to i).map(j => col(s"_c$j")).reduce(_ + _))
      val total = cums(7)
      val rank = lit(0.9) * total
      // first bucket whose cumulative reaches the rank (when stops at the
      // first true branch — same pick as the oracle's rn = 1)
      val idxCol = (0 until 8).foldRight(lit(7): org.apache.spark.sql.Column) {
        (i, els) => when(cums(i) >= rank, i).otherwise(els)
      }
      // linear-domain upper bound 2^((idx+1)/scale·…): the 8 possible
      // values are inlined as Java-computed literals in BOTH the plan and
      // the oracle SQL, so no cross-engine pow() ulp drift can leak in
      val ubCol = (0 until 8).foldRight(lit(expHistUb(7)): org.apache.spark.sql.Column) {
        (i, els) => when(idxCol === i, expHistUb(i)).otherwise(els)
      }
      sums.filter(total > 0)
        .select(col("bucket_start"), col("service_name"),
          idxCol.cast(LongType).as("bucket_idx"),
          ((idxCol + 1).cast(DoubleType) / 4.0).as("log2_ub"),
          ubCol.as("ub"))
    }),

    // exponential-histogram histogram_fraction at an EXACT bucket edge
    // (bound = ub of bin 3): fraction = (zero + cum≤3)/(zero + total) as
    // one exact ppm integer — edge-aligned bounds need no interpolation,
    // so no pow() and no float division anywhere. Same one-hash-aggregate
    // shape as the quantile (map-side partials over the 8 bins + zero).
    "q224_exphist_fraction" -> ((s, dir) => {
      val rows = expHistRowsDf(s, dir)
        .withColumn("bucket_start", expr("(timestamp div 1000000000) div 86400 * 86400"))
        .withColumn("counts", from_json(col("positive_bucket_counts"), ArrayType(LongType)))
      val binAggs = (0 until 8).map(i =>
        sum(element_at(col("counts"), i + 1)).as(s"_c$i"))
      rows.groupBy(col("bucket_start"), col("service_name"))
        .agg(sum(col("zero_count")).as("_z"), binAggs: _*)
        .withColumn("num", expr("_z + _c0 + _c1 + _c2 + _c3"))
        .withColumn("den", expr("_z + _c0 + _c1 + _c2 + _c3 + _c4 + _c5 + _c6 + _c7"))
        .filter(col("den") > 0)
        .withColumn("frac_ppm", expr("(num * 1000000) div den"))
        .select(col("bucket_start"), col("service_name"), col("num"),
          col("den"), col("frac_ppm"))
    }),

    // exponential-histogram quantile WITH the zero bucket: native-
    // histogram layout orders counts zero-bucket → positive buckets, so a
    // rank that lands inside the zero mass resolves to the zero threshold
    // (bucket_idx -1, ub 0) before the positive walk begins
    "q124_exphist_zero_bucket" -> ((s, dir) => {
      val rows = expHistRowsDf(s, dir)
        .withColumn("bucket_start", expr("(timestamp div 1000000000) div 86400 * 86400"))
        .withColumn("counts", from_json(col("positive_bucket_counts"), ArrayType(LongType)))
      val binAggs = sum(col("zero_count")).as("_zc") +:
        (0 until 8).map(i => sum(element_at(col("counts"), i + 1)).as(s"_c$i"))
      val sums = rows.groupBy(col("bucket_start"), col("service_name"))
        .agg(binAggs.head, binAggs.tail: _*)
      val zc = col("_zc")
      val cums = (0 until 8).map(i => (0 to i).map(j => col(s"_c$j")).reduce(_ + _))
      val total = zc + cums(7)
      val rank = lit(0.25) * total
      val posIdx = (0 until 8).foldRight(lit(7): org.apache.spark.sql.Column) {
        (i, els) => when(zc + cums(i) >= rank, i).otherwise(els)
      }
      val idxCol = when(zc >= rank, -1).otherwise(posIdx)
      val ubCol = when(idxCol === -1, 0.0).otherwise(
        (0 until 8).foldRight(lit(expHistUb(7)): org.apache.spark.sql.Column) {
          (i, els) => when(idxCol === i, expHistUb(i)).otherwise(els)
        })
      sums.filter(total > 0)
        .select(col("bucket_start"), col("service_name"),
          idxCol.cast(LongType).as("bucket_idx"), ubCol.as("ub"))
    }),

    // summary quantile extraction: sketch p99 straight from the stored
    // quantile_values JSON, max per (day, service)
    "q93_summary_quantile" -> ((s, dir) => {
      summaryRowsDf(s, dir)
        .withColumn("bucket_start", expr("(timestamp div 1000000000) div 86400 * 86400"))
        .withColumn("p99", get_json_object(col("quantile_values"), "$[1].v").cast(LongType))
        .groupBy(col("bucket_start"), col("service_name"))
        .agg(max(col("p99")).as("p99_max"), count(lit(1)).as("n"))
    }),

    // histogram_quantile over STORED histogram rows (json arrays)
    "q72_hist_native_quantile" -> ((s, dir) => {
      val le = cumulativeLe(s, dir)
        .select(col("bucket_start"), col("service_name"), col("le"),
          col("cum").as("value"))
      Eval.histogramQuantile(0.9, Vec(le, Seq("service_name", "le"))).df
    }),

    // histogram_count + histogram_fraction (observations ≤ 100)
    "q73_hist_count_fraction" -> ((s, dir) => {
      val le = cumulativeLe(s, dir)
      val total = le.filter(col("le") === "+Inf")
        .select(col("bucket_start"), col("service_name"), col("cum").as("total"))
      val at100 = le.filter(col("le") === "100")
        .select(col("bucket_start"), col("service_name"), col("cum").as("cum100"))
      total.join(at100, Seq("bucket_start", "service_name"))
        .withColumn("count", col("total").cast(LongType))
        .withColumn("fraction_le_100", col("cum100") / col("total"))
        .select(col("bucket_start"), col("service_name"), col("count"),
          col("fraction_le_100"))
    }),

    // histogram_avg + histogram_stddev (Prometheus native-histogram
    // functions, here over stored explicit-bounds rows): avg is the exact
    // stored-sum/count ratio; the per-row double `sum` is floor-quantized
    // to integer 1/10000ths BEFORE aggregation (floor(x*1e4) is the same
    // IEEE double op on both engines — a DECIMAL cast would round HALF_UP
    // in Spark but half-even in DuckDB) and accumulated in DECIMAL(38,0)
    // so the integer sum is exact at any row count; stddev estimates from
    // bucket MIDPOINTS (25/75/125, overflow → its 150 lower bound, the
    // native histogram convention) with all moments as exact integer sums
    // — ONE hash aggregate, then closed forms
    "q170_hist_avg_stddev" -> ((s, dir) => {
      val rows = histRowsDf(s, dir)
        .withColumn("bucket_start", expr(s"(timestamp div 1000000000) div $step * $step"))
        .withColumn("counts", from_json(col("bucket_counts"), ArrayType(LongType)))
      val mids = Seq(25L, 75L, 125L, 150L)
      val binAggs = (0 until 4).map(i =>
        sum(element_at(col("counts"), i + 1)).as(s"_c$i"))
      rows.groupBy(col("bucket_start"), col("service_name"))
        .agg(binAggs.head,
          binAggs.tail :+ sum(col("count")).as("_n")
            :+ sum(floor(col("sum") * lit(10000.0)).cast(DecimalType(38, 0)))
              .as("_dq"): _*)
        .withColumn("_s1", (0 until 4).map(i => col(s"_c$i") * mids(i)).reduce(_ + _))
        .withColumn("_s2", (0 until 4).map(i => col(s"_c$i") * (mids(i) * mids(i))).reduce(_ + _))
        .withColumn("avg", col("_dq").cast(DoubleType) / lit(10000.0) / col("_n"))
        .withColumn("stddev",
          sqrt((col("_s2") * col("_n") - col("_s1") * col("_s1")).cast(DoubleType))
            / col("_n"))
        .select(col("bucket_start"), col("service_name"),
          col("_n").as("count"), col("avg"), col("stddev"))
    })
  )

  private val cumulativeLeSql: String =
    s"""hist AS ($histRowsSql),
       |bins AS (
       |  SELECT (timestamp//1000000000//$step)*$step AS bucket_start,
       |    service_name, u.i - 1 AS bin,
       |    CAST(CAST(json_extract(bucket_counts, concat('$$[', u.i - 1, ']')) AS VARCHAR) AS BIGINT) AS c
       |  FROM hist, (SELECT unnest(range(1, 5)) AS i) u),
       |binsums AS (
       |  SELECT bucket_start, service_name, bin, SUM(c) AS n
       |  FROM bins GROUP BY 1, 2, 3),
       |cum AS (
       |  SELECT *,
       |    CAST(SUM(n) OVER (PARTITION BY bucket_start, service_name
       |      ORDER BY bin ASC ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum,
       |    (['50','100','150','+Inf'])[bin + 1] AS le
       |  FROM binsums)""".stripMargin

  /** exponential-histogram upper bound for bin idx at scale 2 (base
    * 2^(1/4)): 2^((idx+1)/4), computed once in Java and inlined as the
    * SAME literal into the plan and the oracle SQL. */
  private def expHistUb(idx: Int): Double = math.pow(2.0, (idx + 1) / 4.0)

  private def expHistUbSql: String =
    (0 until 8).map(i => s"WHEN ${i} THEN CAST(${expHistUb(i)} AS DOUBLE)")
      .mkString("CASE idx ", " ", " END")

  val oracles: Map[String, String] = Map(
    "q92_exphist_quantile" ->
      s"""WITH e AS (
        |  SELECT epoch_ns(ts) AS timestamp, concat('svc-', user_id % 8) AS service_name,
        |    CAST(floor(value) AS BIGINT) AS fv
        |  FROM events),
        |bins AS (
        |  SELECT (timestamp//1000000000//86400)*86400 AS bucket_start, service_name,
        |    u.i AS idx, SUM((fv + u.i) % 3) AS n
        |  FROM e, (SELECT unnest(range(0, 8)) AS i) u
        |  GROUP BY 1, 2, 3),
        |cum AS (
        |  SELECT *,
        |    SUM(n) OVER (PARTITION BY bucket_start, service_name
        |      ORDER BY idx ASC ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(n) OVER (PARTITION BY bucket_start, service_name) AS total
        |  FROM bins),
        |hit AS (
        |  SELECT *, row_number() OVER (PARTITION BY bucket_start, service_name
        |    ORDER BY idx ASC) AS rn
        |  FROM cum WHERE total > 0 AND cum >= 0.9 * total)
        |SELECT bucket_start, service_name, idx AS bucket_idx,
        |  (idx + 1) / 4.0 AS log2_ub,
        |  $expHistUbSql AS ub
        |FROM hit WHERE rn = 1""".stripMargin,

    "q224_exphist_fraction" -> {
      val bins = (0 until 8)
        .map(i => s"CAST(SUM((fv + $i) % 3) AS BIGINT) AS b$i").mkString(", ")
      s"""WITH e AS (
         |  SELECT (epoch_ns(ts)//1000000000//86400)*86400 AS bucket_start,
         |    concat('svc-', user_id % 8) AS service_name,
         |    CAST(floor(value) AS BIGINT) AS fv
         |  FROM events),
         |s AS (
         |  SELECT bucket_start, service_name,
         |    CAST(SUM(CASE WHEN fv % 4 = 0 THEN 3 ELSE 0 END) AS BIGINT) AS z,
         |    $bins
         |  FROM e GROUP BY 1, 2)
         |SELECT bucket_start, service_name,
         |  z + b0 + b1 + b2 + b3 AS num,
         |  z + b0 + b1 + b2 + b3 + b4 + b5 + b6 + b7 AS den,
         |  ((z + b0 + b1 + b2 + b3) * 1000000)
         |    // (z + b0 + b1 + b2 + b3 + b4 + b5 + b6 + b7) AS frac_ppm
         |FROM s
         |WHERE z + b0 + b1 + b2 + b3 + b4 + b5 + b6 + b7 > 0""".stripMargin
    },

    "q124_exphist_zero_bucket" ->
      s"""WITH e AS (
        |  SELECT (epoch_ns(ts)//1000000000//86400)*86400 AS bucket_start,
        |    concat('svc-', user_id % 8) AS service_name,
        |    CAST(floor(value) AS BIGINT) AS fv
        |  FROM events),
        |z AS (
        |  SELECT bucket_start, service_name,
        |    CAST(SUM(CASE WHEN fv % 4 = 0 THEN 3 ELSE 0 END) AS BIGINT) AS zc
        |  FROM e GROUP BY 1, 2),
        |bins AS (
        |  SELECT bucket_start, service_name, u.i AS idx, SUM((fv + u.i) % 3) AS n
        |  FROM e, (SELECT unnest(range(0, 8)) AS i) u
        |  GROUP BY 1, 2, 3),
        |cum AS (
        |  SELECT b.bucket_start, b.service_name, b.idx, z.zc,
        |    SUM(n) OVER (PARTITION BY b.bucket_start, b.service_name
        |      ORDER BY idx ASC ROWS UNBOUNDED PRECEDING) AS pcum,
        |    SUM(n) OVER (PARTITION BY b.bucket_start, b.service_name) AS ptotal
        |  FROM bins b
        |  JOIN z ON z.bucket_start = b.bucket_start
        |    AND z.service_name = b.service_name),
        |hit AS (
        |  SELECT *, row_number() OVER (PARTITION BY bucket_start, service_name
        |    ORDER BY idx ASC) AS rn
        |  FROM cum
        |  WHERE zc + ptotal > 0 AND zc + pcum >= 0.25 * (zc + ptotal))
        |SELECT bucket_start, service_name,
        |  CASE WHEN zc >= 0.25 * (zc + ptotal)
        |       THEN CAST(-1 AS BIGINT) ELSE CAST(idx AS BIGINT) END AS bucket_idx,
        |  CASE WHEN zc >= 0.25 * (zc + ptotal) THEN CAST(0.0 AS DOUBLE)
        |       ELSE $expHistUbSql END AS ub
        |FROM hit WHERE rn = 1""".stripMargin,

    "q93_summary_quantile" ->
      """SELECT (epoch_ns(ts)//1000000000//86400)*86400 AS bucket_start,
        |  concat('svc-', user_id % 8) AS service_name,
        |  MAX(CAST(round(value * 3) AS BIGINT)) AS p99_max,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q72_hist_native_quantile" ->
      s"""WITH $cumulativeLeSql,
         |x AS (
         |  SELECT *,
         |    CASE WHEN le = '+Inf' THEN 'inf'::DOUBLE ELSE CAST(le AS DOUBLE) END AS le_n
         |  FROM cum),
         |y AS (
         |  SELECT *,
         |    lag(le_n, 1, 0.0) OVER w AS prev_le,
         |    lag(cum, 1, 0.0) OVER w AS prev_cum,
         |    MAX(CASE WHEN le = '+Inf' THEN cum END)
         |      OVER (PARTITION BY bucket_start, service_name) AS total,
         |    MAX(CASE WHEN le <> '+Inf' THEN le_n END)
         |      OVER (PARTITION BY bucket_start, service_name) AS maxfinite
         |  FROM x
         |  WINDOW w AS (PARTITION BY bucket_start, service_name ORDER BY le_n ASC)),
         |hit AS (
         |  SELECT *, 0.9 * total AS rank_,
         |    row_number() OVER (PARTITION BY bucket_start, service_name
         |                       ORDER BY le_n ASC) AS rn
         |  FROM y WHERE total > 0 AND cum >= 0.9 * total)
         |SELECT bucket_start, service_name,
         |  CASE WHEN le = '+Inf' THEN maxfinite
         |       ELSE prev_le + (le_n - prev_le) * (rank_ - prev_cum) / (cum - prev_cum)
         |  END AS value
         |FROM hit WHERE rn = 1""".stripMargin,

    "q73_hist_count_fraction" ->
      s"""WITH $cumulativeLeSql
         |SELECT t.bucket_start AS bucket_start, t.service_name AS service_name,
         |  CAST(t.cum AS BIGINT) AS count, h.cum / t.cum AS fraction_le_100
         |FROM cum t JOIN cum h
         |  ON t.bucket_start = h.bucket_start AND t.service_name = h.service_name
         |WHERE t.le = '+Inf' AND h.le = '100'""".stripMargin,

    "q170_hist_avg_stddev" ->
      s"""WITH hist AS ($histRowsSql),
         |g AS (
         |  SELECT (timestamp//1000000000//$step)*$step AS bucket_start,
         |    service_name,
         |    ${(0 until 4).map(i =>
             s"SUM(CAST(CAST(json_extract(bucket_counts, '$$[$i]') AS VARCHAR) AS BIGINT)) AS c$i")
             .mkString(", ")},
         |    SUM(CAST(count AS BIGINT)) AS n,
         |    SUM(CAST(floor(sum * 10000.0) AS DECIMAL(38,0))) AS dq
         |  FROM hist GROUP BY 1, 2),
         |m AS (
         |  SELECT *,
         |    c0*25 + c1*75 + c2*125 + c3*150 AS s1,
         |    c0*625 + c1*5625 + c2*15625 + c3*22500 AS s2
         |  FROM g)
         |SELECT bucket_start, service_name, CAST(n AS BIGINT) AS count,
         |  CAST(dq AS DOUBLE) / 10000.0 / n AS avg,
         |  sqrt(CAST(s2*n - s1*s1 AS DOUBLE)) / n AS stddev
         |FROM m""".stripMargin
  )
}
