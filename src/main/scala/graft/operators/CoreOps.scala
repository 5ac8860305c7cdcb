package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Core relational operator inventory (SURVEY.md §2.2–§2.8) expressed over
  * the driver testdata, each with a DuckDB oracle.
  *
  * Determinism rules used throughout (so hash-compares are exact):
  *  - money-ish double sums go through DECIMAL(30,4) then cast back to
  *    double — exact and aggregation-order-independent;
  *  - every LIMIT / row_number has a total tie-break order;
  *  - all timestamp ordering/derivation uses the µs-truncated `ts_us`
  *    (what DuckDB sees), never raw nanos.
  */
object CoreOps {
  type Q = (SparkSession, String) => DataFrame

  /** Order-independent exact sum of a double expression: decimal-accumulate,
    * then present as double. Oracle twin: `dsumSql`. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 4))).cast(DoubleType)
  private def dsumSql(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(30,4))) AS DOUBLE)"

  /** Epoch-second tumbling bucket of the events `ts` (Long nanos) column —
    * the `date_bin` analog (reference: src/querier/src/query/metrics.rs:2703
    * fixed step-aligned buckets, origin 0). */
  private def bucketExpr(stepSec: Long): Column =
    expr(s"(ts div 1000000000) div $stepSec * $stepSec")
  private def bucketSql(stepSec: Long): String =
    s"(epoch_ns(ts)//1000000000//$stepSec)*$stepSec"

  /** Dense (service × day) spine whose day range derives from the events
    * table's parquet FOOTER min/max (Tables.eventsDayBounds — metadata
    * only, no job, no fixture literal). Generated, never scanned:
    * 8 × days rows, broadcast onto the counts it densifies. Oracle twin:
    * `svcDaySpineSql`. */
  private def svcDaySpine(s: SparkSession, dir: String): DataFrame = {
    val (d0, d1) = Tables.eventsDayBounds(s, dir)
    s.range(8).select(concat(lit("svc-"), col("id")).as("service_name"))
      .crossJoin(s.range(d1 - d0 + 1).select(
        ((lit(d0) + col("id")) * 86400L).as("bucket_start")))
  }

  /** DuckDB spine CTE equivalent — bounds derived from the same data. */
  private val svcDaySpineSql: String =
    """spine AS (
      |  SELECT concat('svc-', s.i) AS service_name,
      |    d.day * 86400 AS bucket_start
      |  FROM range(0, 8) s(i),
      |    (SELECT unnest(range(
      |       (SELECT min(epoch_us(ts)//1000000//86400) FROM events),
      |       (SELECT max(epoch_us(ts)//1000000//86400) FROM events) + 1))
      |     AS day) d)""".stripMargin

  val queries: Map[String, Q] = Map(
    // Top-N + "other" rollup (the Grafana panel default: show the top 2
    // series, fold the tail into one residual line so the panel never
    // explodes at high cardinality). Counts are pre-aggregated FIRST, so
    // the rank window runs over (days × types) rows — already reduced,
    // tiny at any scale — and the residual fold is a second hash
    // aggregate, never a rescan of the raw table.
    "q255_topn_other" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .select(expr("(unix_micros(ts_us) div 1000000) div 86400").as("day"),
          col("event_type"))
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("day"))
        .orderBy(col("n").desc, col("event_type").asc)
      daily.withColumn("rk", row_number().over(w))
        .withColumn("series",
          when(col("rk") <= 2, col("event_type")).otherwise(lit("other")))
        .groupBy(col("day"), col("series"))
        .agg(sum(col("n")).as("n"))
    }),

    // Cross-signal incident timeline: error LOGS, error SPANS, and
    // anomalous METRIC points merge into one per-service event stream —
    // the on-call's first screen. Three curated projections align to a
    // common (service, ts, signal, detail, ref) shape and UNION; each
    // arm filters AT ITS SCAN (severity / status / threshold predicates
    // push down independently), so at 100 TB the union reads three
    // pre-filtered slivers, never three full signals.
    "q261_incident_timeline" -> ((s, dir) => {
      val logs = graft.SignalViews.logsDf(s, dir)
        .filter(col("severity_text") === "error")
        .select(col("service_name"), col("timestamp"), lit("log").as("signal"),
          col("event_type").as("detail"), col("event_id").as("ref"))
      val spans = graft.SignalViews.tracesGen2Df(s, dir)
        .filter(col("status_code") === "ERROR")
        .select(col("service_name"), col("timestamp"), lit("trace").as("signal"),
          col("span_name").as("detail"),
          col("span_id").cast(LongType).as("ref"))
      val mets = graft.SignalViews.metricsDf(s, dir)
        .filter(col("value") > 195.0)
        .select(col("service_name"), col("timestamp"), lit("metric").as("signal"),
          col("metric_name").as("detail"), col("event_id").as("ref"))
      logs.unionByName(spans).unionByName(mets)
    }),

    // SLO burn ATTRIBUTION (after q216 pages, who is burning the
    // budget?): per-service error counts in one hash aggregate, then the
    // 1-row global totals broadcast back — contribution (share of all
    // errors) and local burn (service's own error rate) in exact integer
    // ppm. The decomposition the on-call actually pivots on, computed
    // without a second scan.
    "q258_burn_attribution" -> ((s, dir) => {
      val per = Tables.events(s, dir)
        .select(concat(lit("svc-"), pmod(col("user_id"), lit(8))).as("service_name"),
          (col("event_type") === "error").cast("long").as("bad"))
        .groupBy(col("service_name"))
        .agg(sum(col("bad")).as("bad_s"), count(lit(1)).as("tot_s"))
      val tot = per.agg(sum(col("bad_s")).as("bad_tot"), sum(col("tot_s")).as("tot_tot"))
      // lift's numerator is bad_s * tot_tot * 1e6 — three BIGINTs whose
      // product overflows int64 at ~1e13-row scale (Spark would wrap
      // silently, DuckDB would raise). Widen through DECIMAL(38,0)
      // (DuckDB twin: HUGEINT) so the integer arithmetic stays exact at
      // 100 TB row counts; `div` on decimals yields BIGINT.
      per.crossJoin(broadcast(tot))
        .select(col("service_name"), col("bad_s"), col("tot_s"),
          expr("(CAST(bad_s AS DECIMAL(38,0)) * 1000000) div bad_tot")
            .as("contribution_ppm"),
          expr("(CAST(bad_s AS DECIMAL(38,0)) * 1000000) div tot_s")
            .as("burn_ppm"),
          expr("(CAST(bad_s AS DECIMAL(38,0)) * tot_tot * 1000000) " +
            "div (CAST(bad_tot AS DECIMAL(38,0)) * tot_s)").as("lift_ppm"))
    }),

    // FORWARD as-of join with a tolerance (conversion attribution: each
    // click ↔ the FIRST purchase within the following 24 h, per user) —
    // the mirror-image of q128's backward as-of, plus the bounded match
    // window real attribution needs. Same scalable shape: union-tag,
    // ONE shuffle on user_id, and a per-user reverse-ordered
    // last(_, ignoreNulls) carry (= next purchase); the tolerance is a
    // post-carry predicate, not a second join. Purchases are pre-reduced
    // per (user, µs) with a min-id tie pick so the nearest-match choice
    // is deterministic; side=1 sorts purchases after an equal-timestamp
    // click in the reverse order, mirroring the oracle's `<=`
    // inclusivity (DuckDB executes the twin with native ASOF LEFT JOIN).
    "q251_conversion_asof" -> ((s, dir) => {
      val tolUs = 86400L * 1000000L // 24 h attribution window
      val ev = Tables.events(s, dir)
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts_us")).as("t_us"),
          col("event_id"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts_us")).as("t_us"),
          col("event_id"))
        .groupBy(col("user_id"), col("t_us"))
        .agg(min(col("event_id")).as("purchase_id"))
      val tagged = c
        .select(col("user_id"), col("t_us"), lit(0).as("side"),
          col("event_id"), lit(null).cast(LongType).as("purchase_id"))
        .unionByName(p.select(col("user_id"), col("t_us"),
          lit(1).as("side"), lit(null).cast(LongType).as("event_id"),
          col("purchase_id")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t_us").desc, col("side").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("_next_p",
          last(when(col("side") === 1,
            struct(col("t_us").as("pt"), col("purchase_id").as("pid"))),
            ignoreNulls = true).over(w))
        .filter(col("side") === 0)
        .withColumn("_in_tol",
          col("_next_p").isNotNull && col("_next_p.pt") - col("t_us") <= tolUs)
        .select(col("event_id").as("click_id"), col("user_id"),
          col("t_us").as("click_us"),
          when(col("_in_tol"), col("_next_p.pt")).as("purchase_us"),
          when(col("_in_tol"), col("_next_p.pid")).as("purchase_id"),
          when(col("_in_tol"), col("_next_p.pt") - col("t_us")).as("lag_us"))
    }),

    // §2.4 IR aggregate stage: grouped count/sum/avg (TPC-H Q1 shape)
    "q01_agg_basic" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1995-09-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // §2.2 curated projection + predicate pushdown to parquet
    "q02_projection_filter" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(col("o_totalprice") > 150000 && col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    }),

    // §2.2 time-window filter on i64-nanos time column
    "q03_time_window" -> ((s, dir) => {
      val t0 = 1704412800L * 1000000000L // 2024-01-05T00:00:00Z
      val t1 = 1705017600L * 1000000000L // 2024-01-12T00:00:00Z
      Tables.events(s, dir)
        .filter(col("ts") >= lit(t0) && col("ts") < lit(t1))
        .select(col("event_id"), col("event_type"), col("value"))
    }),

    // §2.6 sort + limit with total-order tie-break (LogQL line-query shape)
    "q04_sort_limit" -> ((s, dir) => {
      Tables.events(s, dir)
        .orderBy(col("value").desc, col("event_id").asc)
        .limit(50)
        .select(col("event_id"), col("event_type"), col("value"))
    }),

    // §2.7 PromQL `and` = left-semi join on series identity
    "q05_semi_join" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // §2.7 PromQL `unless` = left-anti join
    "q06_anti_join" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // §2.7 PromQL `or` = union + dedup
    "q07_union_dedup" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "error").select(col("user_id"))
        .unionByName(ev.filter(col("event_type") === "signup").select(col("user_id")))
        .distinct()
    }),

    // §2.4 distinct discovery (label values)
    "q08_distinct_labels" -> ((s, dir) =>
      Tables.events(s, dir).select(col("event_type")).distinct()),

    // §2.4 date_bin tumbling bucket + grouped agg (6h step)
    "q09_date_bin_agg" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(bucketExpr(21600).as("bucket_start"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    }),

    // §2.3 PromQL vector binary op = inner equi join of two series on bucket
    "q10_binary_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val day = bucketExpr(86400).as("day")
      val e = ev.filter(col("event_type") === "error")
        .groupBy(day).agg(count(lit(1)).as("n_err"))
      val p = ev.filter(col("event_type") === "purchase")
        .groupBy(day).agg(count(lit(1)).as("n_pur"))
      e.join(p, Seq("day"), "inner")
        .withColumn("ratio", col("n_err").cast(DoubleType) / col("n_pur"))
    }),

    // §2.6 topk-per-bucket: window rank within time bucket
    "q11_topk_per_bucket" -> ((s, dir) => {
      val w = Window.partitionBy(col("day")).orderBy(col("value").desc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("day", bucketExpr(86400))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("day"), col("event_id"), col("value"), col("rn").cast(LongType).as("rn"))
    }),

    // §2.4 counter first/last per (series, bucket) — rate/increase shape
    "q12_first_last_delta" -> ((s, dir) => {
      val w = Window.partitionBy(col("wk"), col("event_type"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir)
        .withColumn("wk", bucketExpr(604800))
        .withColumn("first_v", first(col("value")).over(w))
        .withColumn("last_v", last(col("value")).over(w))
        .select(col("wk"), col("event_type"), col("first_v"), col("last_v"))
        .distinct()
        .withColumn("delta", col("last_v") - col("first_v"))
    }),

    // §2.8 calendar functions (UTC)
    "q13_calendar" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(
          year(col("ts_us")).as("y"),
          month(col("ts_us")).as("m"),
          dayofweek(col("ts_us")).as("dow"),
          hour(col("ts_us")).as("h"))
        .agg(count(lit(1)).as("n"))
    }),

    // §2.8 / §2.10 JSON field extraction (ir_extract json path)
    "q14_json_extract" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    }),

    // §2.8 math scalar family (PromQL ValueOp; exactly-rounded ops only)
    "q15_math_scalar" -> ((s, dir) => {
      Tables.events(s, dir).select(
        col("event_id"),
        abs(col("value") - 100.0).as("abs_v"),
        ceil(col("value")).cast(LongType).as("ceil_v"),
        floor(col("value")).cast(LongType).as("floor_v"),
        sqrt(abs(col("value"))).as("sqrt_v"),
        signum(col("value") - 100.0).cast(DoubleType).as("sign_v"),
        greatest(least(col("value"), lit(150.0)), lit(50.0)).as("clamp_v"),
        pmod(col("event_id"), lit(7)).as("mod_v"))
    }),

    // §2.4 count_values: histogram of bucketed values
    "q16_count_values" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy((floor(col("value") / 50.0) * 50).cast(LongType).as("value_bucket"))
        .agg(count(lit(1)).as("n"))
    }),

    // §2.2 regex + IN predicate (LogQL label matcher / line filter shapes)
    "q17_regex_filter" -> ((s, dir) => {
      Tables.documents(s, dir)
        .filter(col("text").rlike("join .* merge") && col("lang").isin("en", "de"))
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // §2.4 grouping sets through the SQL surface — SURVEY notes the
    // reference has no grouping-sets operator anywhere (DataFusion would
    // have to provide it); here it is free via Catalyst: one Expand +
    // one hash aggregate, no extra shuffle per set. grouping() flags
    // disambiguate rollup NULLs from data NULLs.
    "q137_sql_grouping_sets" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_gs")
      s.sql("""SELECT l_returnflag, l_linestatus,
              |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
              |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
              |  COUNT(*) AS n,
              |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
              |FROM lineitem_gs
              |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
              |""".stripMargin)
    }),

    // CUBE: all 2^k grouping combinations in ONE Expand + hash aggregate
    // (same plan family as q137's grouping sets — never k separate scans)
    "q179_sql_cube" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_cube")
      s.sql("""SELECT l_returnflag, l_linestatus,
              |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
              |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
              |  COUNT(*) AS n,
              |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
              |FROM lineitem_cube
              |GROUP BY CUBE (l_returnflag, l_linestatus)
              |""".stripMargin)
    }),

    // ROLLUP: the hierarchical prefix subset of CUBE — (a,b,c), (a,b),
    // (a), () — still ONE Expand + one hash aggregate. Three levels here
    // (vs the 2-key CUBE/grouping-sets twins) so the prefix semantics are
    // actually distinguishable from q179 in the oracle.
    "q189_sql_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_ru")
      s.sql("""SELECT l_returnflag, l_linestatus, l_linenumber,
              |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
              |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
              |  CAST(grouping(l_linenumber) AS INT) AS g_ln,
              |  COUNT(*) AS n,
              |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
              |FROM lineitem_ru
              |GROUP BY ROLLUP (l_returnflag, l_linestatus, l_linenumber)
              |""".stripMargin)
    }),

    // §2.5 RANGE-framed window: a sliding 10-minute window defined by the
    // ORDER-BY VALUE (seconds), not by row offsets — peers at the same
    // second share one frame, so the result is set-deterministic where a
    // ROWS frame would be tie-order-dependent. Decimal accumulation keeps
    // the frame sum order-independent too. Partitioned per user — the
    // frame never crosses the shuffle key, so each task windows its own
    // users at any scale.
    "q197_range_frame_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"))
        .rangeBetween(-600, 0)
      Tables.events(s, dir)
        .withColumn("tsec", expr("unix_micros(ts_us) div 1000000"))
        .withColumn("cnt_10m", count(lit(1)).over(w))
        .withColumn("sum_10m",
          sum(col("value").cast(DecimalType(30, 4))).over(w).cast(DoubleType))
        .select(col("event_id"), col("user_id"), col("tsec"),
          col("cnt_10m"), col("sum_10m"))
    }),

    // Trailing-window anomaly flag: |value − mean(1h window)| > 3σ, all in
    // EXACT integer arithmetic so the flag is bit-identical across engines
    // and partitionings — value quantized to cents, the z² > 9 test
    // rewritten as (n·v − Σv)² > 9·(n·Σv² − (Σv)²), which never divides.
    // Magnitude bound: v ≤ 5e4 cents, frame rows n ≤ ~3e3 even at 100×
    // density → every product ≤ ~2e16, well inside BIGINT. One RANGE
    // window per event_type partition — no self-join, no shuffle beyond
    // the partition key.
    "q201_anomaly_zscore" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("tsec"))
        .rangeBetween(-3600, 0)
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          expr("unix_micros(ts_us) div 1000000").as("tsec"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("v"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("s1", sum(col("v")).over(w))
        .withColumn("s2", sum(expr("v * v")).over(w))
        .withColumn("is_anom", expr(
          """CAST(CASE WHEN n_1h >= 30
            |  AND (n_1h*v - s1)*(n_1h*v - s1) > 9*(n_1h*s2 - s1*s1)
            |  THEN 1 ELSE 0 END AS INT)""".stripMargin))
        .select(col("event_id"), col("event_type"), col("tsec"),
          col("n_1h"), col("is_anom"))
    }),

    // Cross-series Pearson correlation matrix over hourly event counts,
    // zero-filled on a generated hour×type spine so silent hours count.
    // r² is emitted in exact fixed point (ppm) via integral division of
    // the closed-form integer sums — no float accumulate, no sqrt; the
    // sign travels separately. Pair count is K²/2 for K series (5 here) —
    // the join key is the hour, so the shuffle is the tiny spine, not the
    // raw events.
    "q202_corr_matrix" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(expr("(unix_micros(ts_us) div 1000000) div 3600").as("hr"),
          col("event_type"))
      val hours = e.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"))).as("hr"))
      val types = e.select(col("event_type")).distinct()
      val cnt = e.groupBy(col("hr"), col("event_type")).agg(count(lit(1)).as("n"))
      val full = hours.crossJoin(broadcast(types))
        .join(cnt, Seq("hr", "event_type"), "left")
        .select(col("hr"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
      val a = full.select(col("hr"), col("event_type").as("et_a"), col("n").as("x"))
      val b = full.select(col("hr"), col("event_type").as("et_b"), col("n").as("y"))
      a.join(b, Seq("hr"))
        .filter(col("et_a") < col("et_b"))
        .groupBy(col("et_a"), col("et_b"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("x*y")).as("sxy"), sum(expr("x*x")).as("sxx"),
          sum(expr("y*y")).as("syy"))
        .withColumn("num", expr("n*sxy - sx*sy"))
        .withColumn("dx", expr("n*sxx - sx*sx"))
        .withColumn("dy", expr("n*syy - sy*sy"))
        .withColumn("r2_ppm", expr(
          """CASE WHEN dx > 0 AND dy > 0
            |  THEN (CAST(num AS DECIMAL(38,0)) * num * 1000000)
            |       div (CAST(dx AS DECIMAL(38,0)) * dy)
            |  ELSE NULL END""".stripMargin))
        .withColumn("sgn", expr(
          "CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS INT)"))
        .select(col("et_a"), col("et_b"), col("n"), col("num"),
          col("r2_ppm"), col("sgn"))
    }),

    // Ties-preserved top-k (dense_rank ≤ 3): every user in the top three
    // DISTINCT spend levels per event type survives — the rank semantics
    // row_number-based top-k can't express. Spend is cent-exact so rank
    // boundaries are deterministic.
    "q228_topk_with_ties" -> ((s, dir) => {
      val spend = Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
      spend
        .withColumn("rk", dense_rank().over(
          Window.partitionBy(col("event_type")).orderBy(col("cents").desc)))
        .filter(col("rk") <= 3)
        .select(col("event_type"), col("user_id"), col("cents"),
          col("rk").cast("long").as("rk"))
    }),

    // Distribution position analytics: cume_dist of each user's spend
    // within their event type — count-based, so exact; emitted as a ppm
    // integer to keep the hash compare engine-exact.
    "q229_cume_dist" -> ((s, dir) => {
      val spend = Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
      spend
        // floor before the cast: Spark's double→long cast truncates but
        // DuckDB's rounds — floor() pins both to the same integer
        .withColumn("cd_ppm", floor(cume_dist().over(
          Window.partitionBy(col("event_type")).orderBy(col("cents").asc))
          * 1000000).cast("long"))
        .select(col("event_type"), col("user_id"), col("cents"), col("cd_ppm"))
    }),

    // SQL-surface FILTER clause: per-day conditional aggregates in ONE
    // pass — idiomatic replacement for the CASE-WHEN pivot when only a
    // few conditions are needed.
    "q230_sql_filter_clause" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(expr("(unix_micros(ts_us) div 1000000) div 86400").as("day"),
          col("event_type"), col("user_id"))
        .createOrReplaceTempView("events_fc")
      s.sql("""SELECT day,
              |  COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
              |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
              |  COUNT(DISTINCT user_id) FILTER (WHERE event_type = 'purchase')
              |    AS n_buyers
              |FROM events_fc GROUP BY day""".stripMargin)
    }),

    // SQL GROUPING SETS with grouping() disambiguation — the general
    // form behind ROLLUP (q191) and CUBE (q179): four explicit grouping
    // combinations in ONE pass (Spark expands to a single Expand +
    // hash aggregate, not four scans). Sums ride decimal accumulation.
    "q245_grouping_sets" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(expr("(unix_micros(ts_us) div 1000000) div 86400").as("day"),
          col("event_type"), col("value"))
        .createOrReplaceTempView("events_gs")
      s.sql("""SELECT event_type, day,
              |  CAST(grouping(event_type) AS INT) AS g_type,
              |  CAST(grouping(day) AS INT) AS g_day,
              |  COUNT(*) AS n,
              |  CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
              |FROM events_gs
              |GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())
              |""".stripMargin)
    }),

    // Alerting-rule `for:` duration semantics (the Prometheus ruler):
    // a rule fires only after its condition holds for N consecutive
    // evaluation buckets. Condition = above-average daily volume as pure
    // integer cross-multiplication (n·cnt > total — no float compare),
    // firing intervals via gaps-and-islands (day − row_number), keep
    // runs ≥ 3 days. One pre-agg + two narrow windows per series key —
    // the scan reduces to per-day counts before any window runs.
    "q240_alert_for_intervals" -> ((s, dir) => {
      val d = Tables.events(s, dir)
        .select(col("event_type"),
          expr("(unix_micros(ts_us) div 1000000) div 86400").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
      val perType = Window.partitionBy(col("event_type"))
      val firing = d
        .withColumn("total", sum(col("n")).over(perType))
        .withColumn("cnt", count(lit(1)).over(perType))
        .filter(col("n") * col("cnt") > col("total"))
        .withColumn("island", col("day") - row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("day").asc)))
      firing.groupBy(col("event_type"), col("island"))
        .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
          count(lit(1)).as("n_days"))
        .filter(col("n_days") >= 3)
        .drop("island")
    }),

    // Count-min sketch heavy hitters: d=4 rows × w=64 buckets, bucket =
    // md5-derived (engine-portable), estimate = min over rows of the
    // bucket sum — always ≥ the exact count (the CMS guarantee, asserted
    // as a column). The stream first collapses to per-user exact counts
    // (one hash agg — the only pass over the raw data at 100 TB), the
    // 256-cell sketch is built from those and broadcast back for the
    // probe, so sketch cost is O(users), not O(events).
    "q241_cms_heavy_hitters" -> ((s, dir) => {
      val perUser = Tables.events(s, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      val ub = perUser
        .select(col("user_id"), col("n_exact"),
          explode(expr("sequence(0, 3)")).as("r"))
        .withColumn("h",
          md5(concat(lit("cms"), col("r"), lit("|"), col("user_id").cast("string"))))
        .withColumn("bucket", expr(
          """CAST(((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 +
            |  instr('0123456789abcdef', substring(h, 2, 1)) - 1) % 64 AS BIGINT)"""
            .stripMargin))
      val cells = ub.groupBy(col("r"), col("bucket"))
        .agg(sum(col("n_exact")).as("cell_n"))
      ub.join(broadcast(cells), Seq("r", "bucket"))
        .groupBy(col("user_id"))
        .agg(first(col("n_exact")).as("n_exact"), min(col("cell_n")).as("cms_est"))
        .withColumn("overcount", col("cms_est") - col("n_exact"))
        .filter(col("cms_est") >= 40)
    }),

    // Recording-rule rollup equivalence: materialize 5-minute partial
    // aggregates (decimal-exact sum + count), answer the hourly-average
    // query from the rollup, and prove in-result that it matches the
    // raw-scan answer bit-for-bit — the invariant that makes downsampled
    // recording rules trustworthy. Decimal accumulation is what makes
    // sum-of-partial-sums == direct-sum regardless of grouping order.
    "q242_rollup_equivalence" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"),
          expr("(unix_micros(ts_us) div 1000000) div 300").as("b5"),
          col("value").cast(DecimalType(30, 4)).as("dv"))
      val r5 = ev.groupBy(col("event_type"), col("b5"))
        .agg(sum(col("dv")).as("s5"), count(lit(1)).as("n5"))
      val fromRollup = r5.groupBy(col("event_type"), expr("b5 div 12").as("hr"))
        .agg(sum(col("s5")).cast(DoubleType).as("rollup_sum"),
          sum(col("n5")).as("rollup_n"))
      val fromRaw = ev.groupBy(col("event_type"), expr("b5 div 12").as("hr"))
        .agg(sum(col("dv")).cast(DoubleType).as("raw_sum"),
          count(lit(1)).as("raw_n"))
      fromRaw.join(fromRollup, Seq("event_type", "hr"))
        .withColumn("rollup_exact",
          (col("raw_sum") === col("rollup_sum") && col("raw_n") === col("rollup_n"))
            .cast(IntegerType))
        .select(col("event_type"), col("hr"), col("raw_sum"), col("raw_n"),
          col("rollup_sum"), col("rollup_n"), col("rollup_exact"))
    }),

    // Exact WEIGHTED quantiles over pre-aggregated rollups — the
    // re-aggregation a downsampled store must answer: values arrive as
    // (bucket value, observation count), and the p50/p95 are computed by
    // cumulative-weight rank with a pure integer rule (target rank =
    // ceil(p·total) via (total·ppm + 999999) div 1e6, answer = min value
    // whose running count reaches it) — no IEEE division anywhere, so
    // the quantile is bit-identical across engines. One hash rollup +
    // one per-type window + a min-reduce; the window partitions by
    // event_type, never the whole table.
    "q250_weighted_quantile" -> ((s, dir) => {
      val rolled = Tables.events(s, dir)
        .select(col("event_type"), floor(col("value")).cast(LongType).as("v"))
        .groupBy(col("event_type"), col("v")).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("v").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = rolled
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("total", sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
      cum.withColumn("p_ppm", explode(array(lit(500000L), lit(950000L))))
        .filter(col("cum") >= expr("(total * p_ppm + 999999) div 1000000"))
        .groupBy(col("event_type"), col("p_ppm"))
        .agg(min(col("v")).as("wq_value"))
    }),

    // Multi-window SLO burn rate (the Google-SRE 1h+6h alert): hourly
    // (bad, total) pre-agg, then two RANGE-framed sliding sums per hour —
    // never a rescan per window. Burn rates ride exact fixed point
    // (ppm of the 1% error budget) and the page condition is the pure
    // integer cross-multiplication bad·100 > burn_threshold·total, so
    // the alert decision is bit-identical across engines.
    "q216_slo_burn_rate" -> ((s, dir) => {
      val hourly = Tables.events(s, dir)
        .select(expr("(unix_micros(ts_us) div 1000000) div 3600").as("h"),
          (col("event_type") === "error").cast("long").as("bad"))
        .groupBy(col("h"))
        .agg(sum(col("bad")).as("bad_h"), count(lit(1)).as("tot_h"))
      // the sliding window runs over the PRE-AGGREGATED hourly rows
      // (≤ span/3600 of them), so the unpartitioned frame is a few
      // thousand rows even at 100 TB of raw events
      val w6 = Window.orderBy(col("h")).rangeBetween(-5, 0)
      hourly
        .withColumn("bad_6h", sum(col("bad_h")).over(w6))
        .withColumn("tot_6h", sum(col("tot_h")).over(w6))
        .withColumn("burn1_ppm", expr("(bad_h * 100000000) div tot_h"))
        .withColumn("burn6_ppm", expr("(bad_6h * 100000000) div tot_6h"))
        .withColumn("page", expr(
          "CAST(CASE WHEN bad_h * 100 > 6 * tot_h AND bad_6h * 100 > 6 * tot_6h " +
            "THEN 1 ELSE 0 END AS INT)"))
        .select(col("h"), col("bad_h"), col("tot_h"), col("bad_6h"),
          col("tot_6h"), col("burn1_ppm"), col("burn6_ppm"), col("page"))
    }),

    // Week-over-week spike score: hourly counts self-joined at a 168h
    // offset (equi join on the shifted hour — no window over the whole
    // span), ratio in exact ppm. The classic "is this hour anomalous vs
    // the same hour last week" detector.
    "q217_wow_spike" -> ((s, dir) => {
      val hourly = Tables.events(s, dir)
        .select(col("event_type"),
          expr("(unix_micros(ts_us) div 1000000) div 3600").as("h"))
        .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("n"))
      val prev = hourly.select(col("event_type"),
        (col("h") + 168).as("h"), col("n").as("n_prev"))
      hourly.join(prev, Seq("event_type", "h"))
        .withColumn("spike_ppm", expr("(n * 1000000) div n_prev"))
        .select(col("event_type"), col("h"), col("n"), col("n_prev"),
          col("spike_ppm"))
    }),

    // Histogram heatmap matrix (the Grafana heatmap panel shape): value
    // binned into fixed buckets per hour — one hash aggregate producing
    // the (time, bin) → count grid.
    "q218_heatmap_matrix" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(expr("(unix_micros(ts_us) div 1000000) div 3600 * 3600").as("hr"),
          expr("least(CAST(floor(value / 50) AS INT), 3)").as("bin"))
        .groupBy(col("hr"), col("bin")).agg(count(lit(1)).as("n"))),

    // Seasonal baseline: expected traffic per (series, hour-of-week),
    // averaged over the weeks in the span in exact fixed point. The
    // occurrence count comes from a generated hour spine (sequence — no
    // second data scan), so silent hours still divide the baseline.
    "q220_seasonal_baseline" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_type"),
          expr("(unix_micros(ts_us) div 1000000) div 3600").as("h"))
      val cnt = e.groupBy(col("event_type"),
          expr("h % 168").as("how")).agg(count(lit(1)).as("n"))
      val occ = e.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"))).as("h"))
        .groupBy(expr("h % 168").as("how")).agg(count(lit(1)).as("n_occ"))
      cnt.join(occ, Seq("how"))
        .withColumn("avg_fp", expr("(n * 1000) div n_occ"))
        .select(col("event_type"), col("how"), col("n"), col("n_occ"),
          col("avg_fp"))
    }),

    // Audience-segment overlap via packed bitmaps (§2.7 set ops at scale):
    // each segment's user set becomes 64-bit blocks (bit_or aggregate),
    // pair intersections are then popcount(a AND b) summed per block —
    // the per-pair work is |users|/64 longs instead of a distinct-join
    // row per shared member, and the block id keys the shuffle. The
    // oracle is the INDEPENDENT naive form (distinct self-join), so the
    // bitmap algebra itself is what gets checked.
    "q214_segment_overlap" -> ((s, dir) => {
      val bm = Tables.events(s, dir)
        .select(col("event_type"), col("user_id")).distinct()
        .withColumn("blk", expr("user_id div 64"))
        .groupBy(col("event_type"), col("blk"))
        .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))"))
          .as("bits"))
      val a = bm.select(col("blk"), col("event_type").as("seg_a"), col("bits").as("ba"))
      val b = bm.select(col("blk"), col("event_type").as("seg_b"), col("bits").as("bb"))
      a.join(b, Seq("blk")).filter(col("seg_a") < col("seg_b"))
        .groupBy(col("seg_a"), col("seg_b"))
        .agg(sum(expr("CAST(bit_count(ba & bb) AS BIGINT)")).as("n_overlap"))
    }),

    // Incremental rollup refresh: the stored hourly rollup of closed days
    // merged with a fresh delta rollup of the open day, re-aggregated by
    // the mergeable (count, integer-sum) algebra — the incremental-view-
    // maintenance path a 100 TB deployment runs instead of full
    // recompute. The oracle recomputes the rollup directly from raw
    // events, so the merge algebra is what gets checked.
    "q215_rollup_merge_refresh" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("event_type"),
        expr("(unix_micros(ts_us) div 1000000) div 3600 * 3600").as("hr"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("v"),
        expr("(unix_micros(ts_us) div 1000000) div 86400").as("day"))
      def roll(df: DataFrame) = df.groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      roll(e.filter(col("day") < 19750L))
        .unionByName(roll(e.filter(col("day") >= 19750L)))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
    }),

    // SQL-surface PIVOT: wide per-day matrix of per-type value sums — one
    // Expand-free pivot aggregate (Spark lowers PIVOT to a single hash
    // aggregate with pivot-value conditional branches; the oracle is the
    // equivalent conditional aggregation). Cent-quantized sums keep the
    // cells exact BIGINTs.
    "q203_sql_pivot" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(expr("(unix_micros(ts_us) div 1000000) div 86400").as("day"),
          col("event_type"), expr("CAST(floor(value * 100) AS BIGINT)").as("v"))
        .createOrReplaceTempView("events_pv")
      s.sql("""SELECT * FROM events_pv
              |PIVOT (SUM(v) FOR event_type IN
              |  ('view' AS v_view, 'click' AS v_click, 'purchase' AS v_purchase))
              |""".stripMargin)
    }),

    // Time-series gap filling on a regular 10-minute grid: last-sample
    // reduce per (series, bucket), a generated spine (sequence — no table
    // scan), then LOCF and linear interpolation as two windows per series
    // partition. Interpolation runs in integer cents with the two-anchor
    // form v_prev·(t_next−b) + v_next·(b−t_prev) div span, whose numerator
    // is non-negative — integral division is floor==truncate in both
    // engines, so the fill is bit-identical. The spine is |grid|·|series|
    // rows, independent of raw volume: at 100 TB the raw reduce shrinks
    // events to one row per bucket BEFORE the windows see them.
    "q207_gap_fill" -> ((s, dir) => {
      val STEP = 600L
      val e = Tables.events(s, dir)
        .select(col("event_type"), unix_micros(col("ts_us")).as("tus"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("v"), col("event_id"))
        .withColumn("b", expr(s"tus div 1000000 div $STEP * $STEP"))
      val samp = e.groupBy(col("event_type"), col("b"))
        .agg(max_by(col("v"), struct(col("tus"), col("event_id"))).as("v_raw"))
      // bounds and the series set both derive from the REDUCED samples:
      // the three samp consumers share one shuffle via ReusedExchange
      // (no .persist() — executor-memory pinning leaks across queries)
      val grid = samp.agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
        .select(explode(sequence(col("b0"), col("b1"), lit(STEP))).as("b"))
        .crossJoin(broadcast(samp.select(col("event_type")).distinct()))
        .join(samp, Seq("event_type", "b"), "left")
      val w = Window.partitionBy(col("event_type")).orderBy(col("b"))
      val wPrev = w.rowsBetween(Window.unboundedPreceding, 0)
      val wNext = w.rowsBetween(0, Window.unboundedFollowing)
      grid
        .withColumn("v_locf", last(col("v_raw"), ignoreNulls = true).over(wPrev))
        .withColumn("t_prev",
          last(when(col("v_raw").isNotNull, col("b")), ignoreNulls = true).over(wPrev))
        .withColumn("v_next", first(col("v_raw"), ignoreNulls = true).over(wNext))
        .withColumn("t_next",
          first(when(col("v_raw").isNotNull, col("b")), ignoreNulls = true).over(wNext))
        .withColumn("v_interp", expr(
          """CASE WHEN v_raw IS NOT NULL THEN v_raw
            |  WHEN v_locf IS NOT NULL AND v_next IS NOT NULL AND t_next > t_prev
            |  THEN (v_locf * (t_next - b) + v_next * (b - t_prev))
            |       div (t_next - t_prev)
            |  ELSE NULL END""".stripMargin))
        .select(col("event_type"), col("b"), col("v_raw"), col("v_locf"),
          col("v_interp"))
    }),

    // Time-weighted average over irregular samples (the TimescaleDB
    // time_weight / Influx integral shape): each sample holds its value
    // until the next sample or the day boundary, weights partition the
    // day so Σw ≤ 86 400 s and every product stays far inside BIGINT.
    // One lead() window per series + one hash aggregate; non-negative
    // integral division keeps the result engine-exact.
    "q208_time_weighted_avg" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("tus"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_type"), unix_micros(col("ts_us")).as("tus"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("v"), col("event_id"))
        .withColumn("day", expr("tus div 1000000 div 86400"))
        .withColumn("t_next", lead(col("tus"), 1).over(w))
        .withColumn("w_us", expr(
          "least(coalesce(t_next, (day + 1) * 86400000000), (day + 1) * 86400000000) - tus"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), sum(expr("v * w_us")).as("vw"),
          sum(col("w_us")).as("wsum"))
        .withColumn("twa_cents", expr("vw div wsum"))
        .select(col("event_type"), col("day"), col("n"), col("twa_cents"))
    }),

    // SQL-surface UNPIVOT: the wide daily rollup back to long (metric,
    // value) form — Spark's Unpivot node is a single Expand over the
    // aggregated (tiny) side, never a re-scan of the fact table.
    "q204_sql_unpivot" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(expr("(unix_micros(ts_us) div 1000000) div 86400").as("day"),
          col("user_id"), expr("CAST(floor(value * 100) AS BIGINT)").as("v"))
        .createOrReplaceTempView("events_upv")
      s.sql("""SELECT day, metric, val FROM (
              |  SELECT day, COUNT(*) AS n_events,
              |    COUNT(DISTINCT user_id) AS n_users, SUM(v) AS sum_v
              |  FROM events_upv GROUP BY day)
              |UNPIVOT (val FOR metric IN (n_events, n_users, sum_v))
              |""".stripMargin)
    }),

    // Retention COHORTS (the product-analytics staple): users grouped by
    // first-seen week, activity counted per (cohort, weeks-since) cell.
    // Two hash aggregates on user_id (first-seen reduce, then distinct
    // (user, week) activity) and one join back on user_id — no windows,
    // no self-join over events; cohort matrix is weeks², tiny.
    "q282_retention_cohorts" -> ((s, dir) => {
      val wk = expr("(unix_micros(ts_us) div 1000000) div 604800")
      val ev = Tables.events(s, dir).select(col("user_id"), wk.as("week"))
      val first = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
      ev.distinct().join(first, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
    }),

    // Rolling 7-day ACTIVE USERS per day (WAU): exact distinct over a
    // sliding window via bounded fan-out — each (user, day) serves the 7
    // days whose trailing window contains it (explode ≤7, the reduced
    // per-day stream, never raw events), then one distinct count per
    // day. No HLL approximation needed; fan-out is a constant.
    "q283_rolling_wau" -> ((s, dir) => {
      // phantom-tail clamp derived from the DATA (footer metadata), not
      // a fixture literal — correct on any dataset, no job to probe it
      val lastDay = Tables.eventsDayBounds(s, dir)._2
      val day = expr("(unix_micros(ts_us) div 1000000) div 86400")
      val userDays = Tables.events(s, dir)
        .select(col("user_id"), day.as("d")).distinct()
      userDays
        .withColumn("day", explode(expr("sequence(d, d + 6)")))
        .filter(col("day") <= lastDay)
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
    }),

    // CUSUM change-point detection over daily error counts (the drift
    // alarm that catches slow regressions a threshold alert misses).
    // The recursive s_i = max(0, s_{i-1} + (x_i − k)) folds into a
    // CLOSED FORM two windows express exactly: s_i = S_i − min(0,
    // min_{j≤i} S_j) with S the prefix sums of the drifts — running sum
    // + running min per series, exact integers, no recursion, no UDAF.
    // SELF-CALIBRATED and scale-free: the reference k is each series'
    // own integer mean, the alarm threshold 3·⌊√k⌋ tracks the Poisson
    // noise scale — the same query fires meaningfully at any traffic
    // volume. Evaluated on the dense day spine (a silent day counts as
    // drift −k, exactly what CUSUM wants).
    "q281_cusum_changepoint" -> ((s, dir) => {
      val spine = svcDaySpine(s, dir)
      val counts = Tables.events(s, dir)
        .filter(col("event_type") === "error")
        .groupBy(
          concat(lit("svc-"), pmod(col("user_id"), lit(8))).as("service_name"),
          expr("(unix_micros(ts_us) div 1000000) div 86400 * 86400").as("bucket_start"))
        .agg(count(lit(1)).as("n"))
      val dense = spine.join(counts, Seq("service_name", "bucket_start"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
      // k = per-series integer mean over the spine's OWN day count (the
      // spine is data-derived, so the divisor is too)
      val kref = dense.groupBy(col("service_name"))
        .agg(expr("sum(n) div count(1)").as("kref"))
      val w = Window.partitionBy(col("service_name"))
        .orderBy(col("bucket_start").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dense.join(kref, "service_name")
        .withColumn("s_pre", sum(col("n") - col("kref")).over(w))
        .withColumn("min_s", min(col("s_pre")).over(w))
        .withColumn("cusum", col("s_pre") - least(lit(0L), col("min_s")))
        .filter(col("cusum") >=
          greatest(lit(4L), lit(3L) * expr("CAST(floor(sqrt(kref)) AS BIGINT)")))
        .select(col("service_name"), col("bucket_start"), col("n"), col("cusum"))
    }),

    // Markov TRANSITION MATRIX over per-user event streams (the behavior
    // model behind "what usually follows a click?"): lead() per user in
    // the µs domain, pair counts, and row-normalized probabilities in
    // exact integer ppm (widened so 100 TB pair counts can't wrap). One
    // window + two hash aggregates on already-shuffled keys.
    "q280_markov_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts_us")).asc, col("event_id").asc)
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val fromTot = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
      pairs.join(fromTot, "from_type")
        .withColumn("p_ppm",
          expr("(CAST(n AS DECIMAL(38,0)) * 1000000) div tot"))
        .select(col("from_type"), col("to_type"), col("n"), col("p_ppm"))
    }),

    // Prometheus ALERT `for:` semantics (alerting rule state machine):
    // expr = daily error count >= 5, for = 3 consecutive buckets. The
    // condition evaluates on a DENSE (day × service) spine (a missing
    // bucket is FALSE and resets the run — exactly why `for:` exists),
    // then one frame-bounded window (ROWS 2 PRECEDING) counts the run:
    // 3/3 true → firing, true but <3 → pending. The spine is generated,
    // never scanned (30 × 8 rows broadcast onto the counts); state per
    // series is the 3-row frame — no gaps-and-islands self-join.
    "q271_alert_for" -> ((s, dir) => {
      val spine = svcDaySpine(s, dir)
      val counts = Tables.events(s, dir)
        .filter(col("event_type") === "error")
        .groupBy(
          concat(lit("svc-"), pmod(col("user_id"), lit(8))).as("service_name"),
          expr("(unix_micros(ts_us) div 1000000) div 86400 * 86400").as("bucket_start"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("service_name"))
        .orderBy(col("bucket_start").asc).rowsBetween(-2, 0)
      spine.join(counts, Seq("service_name", "bucket_start"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .withColumn("cond", (col("n") >= 5).cast(LongType))
        .withColumn("run", sum(col("cond")).over(w))
        .filter(col("cond") === 1)
        .select(col("service_name"), col("bucket_start"), col("n"),
          when(col("run") === 3, "firing").otherwise("pending").as("state"))
    }),

    // SQL-surface PIVOT (q204's inverse): long (day, event_type) counts
    // to a wide per-day row — Spark's PivotFirst path over an aggregated
    // (tiny) frame, one shuffle on day; the fact scan never re-runs.
    "q268_sql_pivot" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(expr("(unix_micros(ts_us) div 1000000) div 86400").as("day"),
          col("event_type"))
        .createOrReplaceTempView("events_pv")
      s.sql("""SELECT * FROM (SELECT day, event_type FROM events_pv)
              |PIVOT (COUNT(*) FOR event_type IN
              |  ('click' AS click, 'view' AS view,
              |   'purchase' AS purchase, 'error' AS error))
              |""".stripMargin)
    }),

    // Ordered FUNNEL (view → click → purchase per user, strictly
    // increasing times): the product/observability "conversion steps"
    // query. ONE shuffle on user_id: each user's events fold through a
    // sorted-array aggregate() walking the stage machine (first view,
    // then first later click, then first later purchase) — no self-joins,
    // no window sorts, per-user state is three longs. The fold over the
    // ascending (t, type) array is exactly the min-chain the oracle
    // expresses with nested conditional mins. µs domain end-to-end.
    "q269_funnel_steps" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts_us")).as("t"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(
          struct(col("t"), col("event_type").as("et")))).as("evs"))
        .select(expr(
          """aggregate(evs,
            |  named_struct('tv', CAST(NULL AS BIGINT),
            |               'tc', CAST(NULL AS BIGINT),
            |               'tp', CAST(NULL AS BIGINT)),
            |  (acc, x) -> named_struct(
            |    'tv', CASE WHEN acc.tv IS NULL AND x.et = 'view'
            |               THEN x.t ELSE acc.tv END,
            |    'tc', CASE WHEN acc.tc IS NULL AND acc.tv IS NOT NULL
            |                AND x.et = 'click' AND x.t > acc.tv
            |               THEN x.t ELSE acc.tc END,
            |    'tp', CASE WHEN acc.tp IS NULL AND acc.tc IS NOT NULL
            |                AND x.et = 'purchase' AND x.t > acc.tc
            |               THEN x.t ELSE acc.tp END))""".stripMargin).as("st"))
        .agg(
          count(when(col("st.tv").isNotNull, 1)).as("n_view"),
          count(when(col("st.tc").isNotNull, 1)).as("n_view_click"),
          count(when(col("st.tp").isNotNull, 1)).as("n_full_funnel"))
    }),

    // Schema EVOLUTION read (reference schemas.toml traces v1→v2 renames
    // + computed fields): a stored directory whose older files were
    // written under v1 (`name`, `duration_nano`, no partition columns)
    // and newer files under v2, queried through the current-version
    // resolver — the filter hits a RENAMED column and the group key is a
    // COMPUTED one, so both evolution mechanisms are on the hot path.
    // The resolution is scan-level coalesce (no shuffle, no rewrite);
    // exact integer counts/sums keep the cross-engine hash stable.
    "q265_schema_evolution" -> ((s, dir) => {
      val path = graft.SignalTables.storedMixedVersionTracesPath(s, dir)
      graft.schema.SchemaVersions.resolveRead(s, path, "traces")
        .filter(col("span_name") =!= "view")
        .groupBy(col("span_name"), col("service_name"), col("date_day"))
        .agg(count(lit(1)).as("n"), sum(col("duration_nanos")).as("total_ns"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q255_topn_other" ->
      """WITH daily AS (
        |  SELECT (epoch_us(ts)//1000000)//86400 AS day, event_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY day
        |    ORDER BY n DESC, event_type ASC) AS rk
        |  FROM daily)
        |SELECT day, CASE WHEN rk <= 2 THEN event_type ELSE 'other' END AS series,
        |  CAST(sum(n) AS BIGINT) AS n
        |FROM r GROUP BY 1, 2""".stripMargin,

    "q261_incident_timeline" ->
      s"""WITH logs AS (${graft.SignalViews.logsViewSql}),
         |spans AS (${graft.SignalViews.tracesGen2ViewSql}),
         |mets AS (${graft.SignalViews.metricsViewSql})
         |SELECT service_name, timestamp, 'log' AS signal,
         |  event_type AS detail, event_id AS ref
         |FROM logs WHERE severity_text = 'error'
         |UNION ALL
         |SELECT service_name, timestamp, 'trace' AS signal,
         |  span_name AS detail, CAST(span_id AS BIGINT) AS ref
         |FROM spans WHERE status_code = 'ERROR'
         |UNION ALL
         |SELECT service_name, timestamp, 'metric' AS signal,
         |  metric_name AS detail, event_id AS ref
         |FROM mets WHERE value > 195.0""".stripMargin,

    "q258_burn_attribution" ->
      """WITH per AS (
        |  SELECT concat('svc-', user_id % 8) AS service_name,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS bad_s,
        |    COUNT(*) AS tot_s
        |  FROM events GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(bad_s) AS BIGINT) AS bad_tot,
        |    CAST(sum(tot_s) AS BIGINT) AS tot_tot FROM per)
        |SELECT service_name, bad_s, tot_s,
        |  CAST((CAST(bad_s AS HUGEINT) * 1000000) // bad_tot AS BIGINT)
        |    AS contribution_ppm,
        |  CAST((CAST(bad_s AS HUGEINT) * 1000000) // tot_s AS BIGINT)
        |    AS burn_ppm,
        |  CAST((CAST(bad_s AS HUGEINT) * tot_tot * 1000000)
        |    // (CAST(bad_tot AS HUGEINT) * tot_s) AS BIGINT) AS lift_ppm
        |FROM per, tot""".stripMargin,

    "q251_conversion_asof" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_us
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS pt,
        |    CAST(min(event_id) AS BIGINT) AS pid
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |j AS (
        |  SELECT c.click_id, c.user_id, c.click_us, p.pt, p.pid
        |  FROM c ASOF LEFT JOIN p
        |    ON c.user_id = p.user_id AND c.click_us <= p.pt)
        |SELECT click_id, user_id, click_us,
        |  CASE WHEN pt - click_us <= 86400000000 THEN pt END AS purchase_us,
        |  CASE WHEN pt - click_us <= 86400000000 THEN pid END AS purchase_id,
        |  CASE WHEN pt - click_us <= 86400000000 THEN pt - click_us END AS lag_us
        |FROM j""".stripMargin,

    "q01_agg_basic" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  SUM(l_quantity) AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price,
         |  SUM(l_quantity)/COUNT(*) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1995-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_projection_filter" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        |WHERE o_totalprice > 150000 AND o_orderstatus = 'O'""".stripMargin,

    "q03_time_window" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-12 00:00:00'""".stripMargin,

    "q04_sort_limit" ->
      """SELECT event_id, event_type, value FROM events
        |ORDER BY value DESC, event_id ASC LIMIT 50""".stripMargin,

    "q05_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q06_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q07_union_dedup" ->
      """SELECT DISTINCT user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'error'
        |  UNION ALL
        |  SELECT user_id FROM events WHERE event_type = 'signup')""".stripMargin,

    "q08_distinct_labels" -> "SELECT DISTINCT event_type FROM events",

    "q09_date_bin_agg" ->
      s"""SELECT ${bucketSql(21600)} AS bucket_start, event_type,
         |  COUNT(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,

    "q10_binary_join" ->
      s"""WITH e AS (
         |  SELECT ${bucketSql(86400)} AS day, COUNT(*) AS n_err
         |  FROM events WHERE event_type = 'error' GROUP BY 1),
         |p AS (
         |  SELECT ${bucketSql(86400)} AS day, COUNT(*) AS n_pur
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
         |SELECT e.day AS day, n_err, n_pur, CAST(n_err AS DOUBLE)/n_pur AS ratio
         |FROM e JOIN p ON e.day = p.day""".stripMargin,

    "q11_topk_per_bucket" ->
      s"""SELECT day, event_id, value, rn FROM (
         |  SELECT ${bucketSql(86400)} AS day, event_id, value,
         |    row_number() OVER (PARTITION BY ${bucketSql(86400)}
         |                       ORDER BY value DESC, event_id ASC) AS rn
         |  FROM events) WHERE rn <= 3""".stripMargin,

    "q12_first_last_delta" ->
      s"""SELECT DISTINCT wk, event_type, first_v, last_v, last_v - first_v AS delta
         |FROM (
         |  SELECT ${bucketSql(604800)} AS wk, event_type,
         |    first_value(value) OVER w AS first_v,
         |    last_value(value) OVER w AS last_v
         |  FROM events
         |  WINDOW w AS (PARTITION BY ${bucketSql(604800)}, event_type
         |               ORDER BY ts ASC, event_id ASC
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))""".stripMargin,

    "q13_calendar" ->
      """SELECT CAST(EXTRACT(year FROM ts) AS INTEGER) AS y,
        |  CAST(EXTRACT(month FROM ts) AS INTEGER) AS m,
        |  CAST(EXTRACT(dow FROM ts) + 1 AS INTEGER) AS dow,
        |  CAST(EXTRACT(hour FROM ts) AS INTEGER) AS h, COUNT(*) AS n
        |FROM events GROUP BY 1, 2, 3, 4""".stripMargin,

    "q14_json_extract" ->
      s"""SELECT CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k,
         |  COUNT(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY 1""".stripMargin,

    "q15_math_scalar" ->
      """SELECT event_id,
        |  ABS(value - 100.0) AS abs_v,
        |  CAST(CEIL(value) AS BIGINT) AS ceil_v,
        |  CAST(FLOOR(value) AS BIGINT) AS floor_v,
        |  SQRT(ABS(value)) AS sqrt_v,
        |  CAST(SIGN(value - 100.0) AS DOUBLE) AS sign_v,
        |  GREATEST(LEAST(value, 150.0), 50.0) AS clamp_v,
        |  event_id % 7 AS mod_v
        |FROM events""".stripMargin,

    "q16_count_values" ->
      """SELECT CAST(FLOOR(value/50.0)*50 AS BIGINT) AS value_bucket, COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "q17_regex_filter" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE regexp_matches(text, 'join .* merge') AND lang IN ('en','de')""".stripMargin,

    "q137_sql_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,

    "q179_sql_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q189_sql_rollup" ->
      """SELECT l_returnflag, l_linestatus, l_linenumber,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |  CAST(grouping(l_linenumber) AS INT) AS g_ln,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus, l_linenumber)""".stripMargin,

    "q197_range_frame_window" ->
      """SELECT event_id, user_id, epoch_us(ts)//1000000 AS tsec,
        |  count(*) OVER w AS cnt_10m,
        |  CAST(SUM(CAST(value AS DECIMAL(30,4))) OVER w AS DOUBLE) AS sum_10m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)//1000000
        |  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q201_anomaly_zscore" ->
      """WITH e AS (
        |  SELECT event_id, event_type, epoch_us(ts)//1000000 AS tsec,
        |    CAST(floor(value * 100) AS BIGINT) AS v
        |  FROM events),
        |w AS (
        |  SELECT event_id, event_type, tsec, v,
        |    count(*) OVER win AS n_1h,
        |    CAST(SUM(v) OVER win AS BIGINT) AS s1,
        |    CAST(SUM(v*v) OVER win AS BIGINT) AS s2
        |  FROM e
        |  WINDOW win AS (PARTITION BY event_type ORDER BY tsec
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type, tsec, n_1h,
        |  CAST(CASE WHEN n_1h >= 30
        |    AND (n_1h*v - s1)*(n_1h*v - s1) > 9*(n_1h*s2 - s1*s1)
        |    THEN 1 ELSE 0 END AS INT) AS is_anom
        |FROM w""".stripMargin,

    "q202_corr_matrix" ->
      """WITH e AS (
        |  SELECT epoch_us(ts)//1000000//3600 AS hr, event_type FROM events),
        |bounds AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM e),
        |hours AS (SELECT unnest(generate_series(h0, h1)) AS hr FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM e),
        |cnt AS (SELECT hr, event_type, count(*) AS n FROM e GROUP BY 1, 2),
        |f AS (
        |  SELECT h.hr, t.event_type, CAST(coalesce(c.n, 0) AS BIGINT) AS n
        |  FROM hours h CROSS JOIN types t
        |  LEFT JOIN cnt c ON c.hr = h.hr AND c.event_type = t.event_type),
        |p AS (
        |  SELECT a.hr, a.event_type AS et_a, b.event_type AS et_b,
        |    a.n AS x, b.n AS y
        |  FROM f a JOIN f b ON a.hr = b.hr AND a.event_type < b.event_type),
        |agg AS (
        |  SELECT et_a, et_b, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM p GROUP BY 1, 2),
        |d AS (
        |  SELECT et_a, et_b, n, n*sxy - sx*sy AS num,
        |    n*sxx - sx*sx AS dx, n*syy - sy*sy AS dy
        |  FROM agg)
        |SELECT et_a, et_b, n, num,
        |  CASE WHEN dx > 0 AND dy > 0
        |    THEN CAST((num::HUGEINT * num * 1000000) // (dx::HUGEINT * dy) AS BIGINT)
        |    ELSE NULL END AS r2_ppm,
        |  CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END AS INT) AS sgn
        |FROM d""".stripMargin,

    "q228_topk_with_ties" ->
      """WITH spend AS (
        |  SELECT event_type, user_id,
        |    CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, dense_rank() OVER (PARTITION BY event_type
        |    ORDER BY cents DESC) AS rk
        |  FROM spend)
        |SELECT event_type, user_id, cents, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 3""".stripMargin,

    "q229_cume_dist" ->
      """WITH spend AS (
        |  SELECT event_type, user_id,
        |    CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, user_id, cents,
        |  CAST(floor(cume_dist() OVER (PARTITION BY event_type
        |    ORDER BY cents ASC) * 1000000) AS BIGINT) AS cd_ppm
        |FROM spend""".stripMargin,

    "q230_sql_filter_clause" ->
      """WITH e AS (
        |  SELECT epoch_us(ts)//1000000//86400 AS day, event_type, user_id
        |  FROM events)
        |SELECT day,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
        |  COUNT(DISTINCT user_id) FILTER (WHERE event_type = 'purchase')
        |    AS n_buyers
        |FROM e GROUP BY day""".stripMargin,

    "q245_grouping_sets" ->
      """WITH e AS (
        |  SELECT epoch_us(ts)//1000000//86400 AS day, event_type, value
        |  FROM events)
        |SELECT event_type, day,
        |  CAST(grouping(event_type) AS INT) AS g_type,
        |  CAST(grouping(day) AS INT) AS g_day,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
        |FROM e
        |GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())"""
        .stripMargin,

    "q240_alert_for_intervals" ->
      """WITH d AS (
        |  SELECT event_type, epoch_us(ts)//1000000//86400 AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |f AS (
        |  SELECT event_type, day,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day ASC) AS rn
        |  FROM (
        |    SELECT *, CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total,
        |      count(*) OVER (PARTITION BY event_type) AS cnt
        |    FROM d)
        |  WHERE n * cnt > total)
        |SELECT event_type, min(day) AS start_day, max(day) AS end_day,
        |  CAST(count(*) AS BIGINT) AS n_days
        |FROM f GROUP BY event_type, day - rn
        |HAVING count(*) >= 3""".stripMargin,

    "q241_cms_heavy_hitters" ->
      """WITH pu AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact
        |  FROM events GROUP BY 1),
        |ub AS (
        |  SELECT user_id, n_exact, r,
        |    ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
        |     strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 64 AS bucket
        |  FROM (
        |    SELECT user_id, n_exact, unnest([0, 1, 2, 3]) AS r,
        |      md5('cms' || CAST(unnest([0, 1, 2, 3]) AS VARCHAR) || '|' ||
        |          CAST(user_id AS VARCHAR)) AS h
        |    FROM pu)),
        |cells AS (
        |  SELECT r, bucket, CAST(sum(n_exact) AS BIGINT) AS cell_n
        |  FROM ub GROUP BY 1, 2)
        |SELECT u.user_id, CAST(min(u.n_exact) AS BIGINT) AS n_exact,
        |  CAST(min(c.cell_n) AS BIGINT) AS cms_est,
        |  CAST(min(c.cell_n) - min(u.n_exact) AS BIGINT) AS overcount
        |FROM ub u JOIN cells c ON c.r = u.r AND c.bucket = u.bucket
        |GROUP BY 1
        |HAVING min(c.cell_n) >= 40""".stripMargin,

    "q242_rollup_equivalence" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts)//1000000//300 AS b5,
        |    CAST(value AS DECIMAL(30,4)) AS dv
        |  FROM events),
        |r5 AS (
        |  SELECT event_type, b5, SUM(dv) AS s5, CAST(count(*) AS BIGINT) AS n5
        |  FROM ev GROUP BY 1, 2),
        |roll AS (
        |  SELECT event_type, b5//12 AS hr, CAST(SUM(s5) AS DOUBLE) AS rollup_sum,
        |    CAST(SUM(n5) AS BIGINT) AS rollup_n
        |  FROM r5 GROUP BY 1, 2),
        |raw AS (
        |  SELECT event_type, b5//12 AS hr, CAST(SUM(dv) AS DOUBLE) AS raw_sum,
        |    CAST(count(*) AS BIGINT) AS raw_n
        |  FROM ev GROUP BY 1, 2)
        |SELECT raw.event_type, raw.hr, raw.raw_sum, raw.raw_n,
        |  roll.rollup_sum, roll.rollup_n,
        |  CAST(CASE WHEN raw.raw_sum = roll.rollup_sum
        |    AND raw.raw_n = roll.rollup_n THEN 1 ELSE 0 END AS INT) AS rollup_exact
        |FROM raw JOIN roll ON roll.event_type = raw.event_type
        |  AND roll.hr = raw.hr""".stripMargin,

    "q250_weighted_quantile" ->
      """WITH rolled AS (
        |  SELECT event_type, CAST(floor(value) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, v, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
        |  FROM rolled),
        |x AS (
        |  SELECT event_type, p_ppm, v
        |  FROM c, unnest([CAST(500000 AS BIGINT), CAST(950000 AS BIGINT)]) AS t(p_ppm)
        |  WHERE cum >= (total * p_ppm + 999999) // 1000000)
        |SELECT event_type, p_ppm, CAST(min(v) AS BIGINT) AS wq_value
        |FROM x GROUP BY 1, 2""".stripMargin,

    "q216_slo_burn_rate" ->
      """WITH hourly AS (
        |  SELECT epoch_us(ts)//1000000//3600 AS h,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS bad_h,
        |    COUNT(*) AS tot_h
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT h, bad_h, tot_h,
        |    CAST(SUM(bad_h) OVER win AS BIGINT) AS bad_6h,
        |    CAST(SUM(tot_h) OVER win AS BIGINT) AS tot_6h
        |  FROM hourly
        |  WINDOW win AS (ORDER BY h RANGE BETWEEN 5 PRECEDING AND CURRENT ROW))
        |SELECT h, bad_h, tot_h, bad_6h, tot_6h,
        |  (bad_h * 100000000) // tot_h AS burn1_ppm,
        |  (bad_6h * 100000000) // tot_6h AS burn6_ppm,
        |  CAST(CASE WHEN bad_h * 100 > 6 * tot_h AND bad_6h * 100 > 6 * tot_6h
        |       THEN 1 ELSE 0 END AS INT) AS page
        |FROM w""".stripMargin,

    "q217_wow_spike" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(ts)//1000000//3600 AS h, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT c.event_type, c.h, c.n, p.n AS n_prev,
        |  (c.n * 1000000) // p.n AS spike_ppm
        |FROM hourly c JOIN hourly p
        |  ON p.event_type = c.event_type AND p.h = c.h - 168""".stripMargin,

    "q218_heatmap_matrix" ->
      """SELECT (epoch_us(ts)//1000000//3600)*3600 AS hr,
        |  CAST(least(floor(value / 50), 3) AS INT) AS bin, COUNT(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q220_seasonal_baseline" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts)//1000000//3600 AS h FROM events),
        |cnt AS (
        |  SELECT event_type, h % 168 AS how, COUNT(*) AS n FROM e GROUP BY 1, 2),
        |occ AS (
        |  SELECT h % 168 AS how, COUNT(*) AS n_occ FROM (
        |    SELECT unnest(generate_series((SELECT min(h) FROM e),
        |                                  (SELECT max(h) FROM e))) AS h)
        |  GROUP BY 1)
        |SELECT c.event_type, c.how, c.n, o.n_occ,
        |  (c.n * 1000) // o.n_occ AS avg_fp
        |FROM cnt c JOIN occ o ON o.how = c.how""".stripMargin,

    "q214_segment_overlap" ->
      """WITH seg AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT a.event_type AS seg_a, b.event_type AS seg_b,
        |  COUNT(*) AS n_overlap
        |FROM seg a JOIN seg b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2""".stripMargin,

    "q215_rollup_merge_refresh" ->
      """WITH e AS (
        |  SELECT event_type, (epoch_us(ts)//1000000//3600)*3600 AS hr,
        |    CAST(floor(value * 100) AS BIGINT) AS v
        |  FROM events)
        |SELECT event_type, hr, COUNT(*) AS n,
        |  CAST(SUM(v) AS BIGINT) AS sv
        |FROM e GROUP BY 1, 2""".stripMargin,

    "q203_sql_pivot" ->
      """WITH e AS (
        |  SELECT epoch_us(ts)//1000000//86400 AS day, event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS v
        |  FROM events)
        |SELECT day,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN v END) AS BIGINT) AS v_view,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN v END) AS BIGINT) AS v_click,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN v END) AS BIGINT) AS v_purchase
        |FROM e GROUP BY day""".stripMargin,

    "q207_gap_fill" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS tus,
        |    CAST(floor(value * 100) AS BIGINT) AS v, event_id,
        |    (epoch_us(ts)//1000000//600)*600 AS b
        |  FROM events),
        |samp AS (
        |  SELECT event_type, b, v AS v_raw FROM (
        |    SELECT event_type, b, v, row_number() OVER (
        |      PARTITION BY event_type, b ORDER BY tus DESC, event_id DESC) AS rn
        |    FROM e) WHERE rn = 1),
        |bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM e),
        |grid AS (
        |  SELECT t.event_type, g.b
        |  FROM (SELECT unnest(generate_series(b0, b1, 600)) AS b FROM bounds) g
        |  CROSS JOIN (SELECT DISTINCT event_type FROM e) t),
        |j AS (
        |  SELECT g.event_type, g.b, s.v_raw FROM grid g
        |  LEFT JOIN samp s ON s.event_type = g.event_type AND s.b = g.b),
        |f AS (
        |  SELECT event_type, b, v_raw,
        |    last_value(v_raw IGNORE NULLS) OVER wp AS v_locf,
        |    last_value(CASE WHEN v_raw IS NOT NULL THEN b END IGNORE NULLS)
        |      OVER wp AS t_prev,
        |    first_value(v_raw IGNORE NULLS) OVER wn AS v_next,
        |    first_value(CASE WHEN v_raw IS NOT NULL THEN b END IGNORE NULLS)
        |      OVER wn AS t_next
        |  FROM j
        |  WINDOW wp AS (PARTITION BY event_type ORDER BY b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY event_type ORDER BY b
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, b, v_raw, v_locf,
        |  CASE WHEN v_raw IS NOT NULL THEN v_raw
        |    WHEN v_locf IS NOT NULL AND v_next IS NOT NULL AND t_next > t_prev
        |    THEN (v_locf * (t_next - b) + v_next * (b - t_prev))
        |         // (t_next - t_prev)
        |    ELSE NULL END AS v_interp
        |FROM f""".stripMargin,

    "q208_time_weighted_avg" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS tus,
        |    CAST(floor(value * 100) AS BIGINT) AS v, event_id,
        |    epoch_us(ts)//1000000//86400 AS day
        |  FROM events),
        |l AS (
        |  SELECT event_type, day, v,
        |    least(coalesce(lead(tus) OVER (PARTITION BY event_type
        |            ORDER BY tus ASC, event_id ASC), (day + 1) * 86400000000),
        |          (day + 1) * 86400000000) - tus AS w_us
        |  FROM e)
        |SELECT event_type, day, count(*) AS n,
        |  CAST(CAST(sum(v * w_us) AS BIGINT) // CAST(sum(w_us) AS BIGINT)
        |       AS BIGINT) AS twa_cents
        |FROM l GROUP BY 1, 2""".stripMargin,

    "q204_sql_unpivot" ->
      """WITH e AS (
        |  SELECT epoch_us(ts)//1000000//86400 AS day, user_id,
        |    CAST(floor(value * 100) AS BIGINT) AS v
        |  FROM events),
        |wide AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |    CAST(SUM(v) AS BIGINT) AS sum_v
        |  FROM e GROUP BY day)
        |SELECT day, 'n_events' AS metric, n_events AS val FROM wide
        |UNION ALL
        |SELECT day, 'n_users', n_users FROM wide
        |UNION ALL
        |SELECT day, 'sum_v', sum_v FROM wide""".stripMargin,

    "q282_retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts)//1000000//604800 AS week FROM events),
        |f AS (SELECT user_id, CAST(MIN(week) AS BIGINT) AS cohort_week
        |  FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, week FROM e)
        |SELECT f.cohort_week,
        |  CAST(a.week - f.cohort_week AS BIGINT) AS week_offset,
        |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "q283_rolling_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts)//1000000//86400 AS d
        |  FROM events),
        |f AS (
        |  SELECT user_id, d + o.i AS day
        |  FROM ud, (SELECT unnest(range(0, 7)) AS i) o
        |  WHERE d + o.i <= (SELECT max(epoch_us(ts)//1000000//86400) FROM events))
        |SELECT CAST(day AS BIGINT) AS day,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        |FROM f GROUP BY 1""".stripMargin,

    "q281_cusum_changepoint" ->
      s"""WITH $svcDaySpineSql,
        |c AS (
        |  SELECT concat('svc-', user_id % 8) AS service_name,
        |    (epoch_us(ts)//1000000//86400)*86400 AS bucket_start,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
        |j AS (
        |  SELECT spine.service_name, spine.bucket_start,
        |    CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        |  FROM spine LEFT JOIN c USING (service_name, bucket_start)),
        |k AS (SELECT service_name, CAST(SUM(n) // COUNT(*) AS BIGINT) AS kref
        |  FROM j GROUP BY 1),
        |r AS (
        |  SELECT j.*, k.kref,
        |    SUM(j.n - k.kref) OVER (PARTITION BY j.service_name
        |      ORDER BY j.bucket_start
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_pre
        |  FROM j JOIN k USING (service_name)),
        |m AS (
        |  SELECT *,
        |    MIN(s_pre) OVER (PARTITION BY service_name ORDER BY bucket_start
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS min_s
        |  FROM r)
        |SELECT service_name, bucket_start, n,
        |  CAST(s_pre - least(0, min_s) AS BIGINT) AS cusum
        |FROM m WHERE s_pre - least(0, min_s)
        |  >= greatest(4, 3 * CAST(floor(sqrt(kref)) AS BIGINT))""".stripMargin,

    "q280_markov_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) ASC, event_id ASC) AS to_type
        |  FROM events),
        |p AS (
        |  SELECT event_type AS from_type, to_type,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM e WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |ft AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
        |  FROM p GROUP BY 1)
        |SELECT p.from_type, p.to_type, p.n,
        |  CAST((CAST(p.n AS HUGEINT) * 1000000) // ft.tot AS BIGINT) AS p_ppm
        |FROM p JOIN ft USING (from_type)""".stripMargin,

    "q271_alert_for" ->
      s"""WITH $svcDaySpineSql,
        |c AS (
        |  SELECT concat('svc-', user_id % 8) AS service_name,
        |    (epoch_us(ts)//1000000//86400)*86400 AS bucket_start,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
        |j AS (
        |  SELECT spine.service_name, spine.bucket_start,
        |    CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
        |    CASE WHEN COALESCE(c.n, 0) >= 5 THEN 1 ELSE 0 END AS cond
        |  FROM spine LEFT JOIN c USING (service_name, bucket_start)),
        |r AS (
        |  SELECT *, SUM(cond) OVER (PARTITION BY service_name
        |    ORDER BY bucket_start
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS run
        |  FROM j)
        |SELECT service_name, bucket_start, n,
        |  CASE WHEN run = 3 THEN 'firing' ELSE 'pending' END AS state
        |FROM r WHERE cond = 1""".stripMargin,

    "q268_sql_pivot" ->
      """WITH e AS (
        |  SELECT epoch_us(ts)//1000000//86400 AS day, event_type FROM events)
        |SELECT day,
        |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
        |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
        |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error
        |FROM e GROUP BY day""".stripMargin,

    "q269_funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
        |v AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN t END) AS t_view
        |  FROM e GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, v.t_view,
        |    min(CASE WHEN e.event_type = 'click' AND e.t > v.t_view
        |        THEN e.t END) AS t_click
        |  FROM e JOIN v USING (user_id) GROUP BY 1, 2),
        |p AS (
        |  SELECT c.user_id, c.t_view, c.t_click,
        |    min(CASE WHEN e.event_type = 'purchase' AND e.t > c.t_click
        |        THEN e.t END) AS t_purchase
        |  FROM e JOIN c USING (user_id) GROUP BY 1, 2, 3)
        |SELECT
        |  CAST(count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS BIGINT) AS n_view,
        |  CAST(count(CASE WHEN t_click IS NOT NULL THEN 1 END) AS BIGINT) AS n_view_click,
        |  CAST(count(CASE WHEN t_purchase IS NOT NULL THEN 1 END) AS BIGINT)
        |    AS n_full_funnel
        |FROM p""".stripMargin,

    // the evolution fixture derives both vintages deterministically from
    // events, so the oracle recomputes straight from the source rows
    "q265_schema_evolution" ->
      """SELECT event_type AS span_name,
        |  concat('svc-', user_id % 8) AS service_name,
        |  CAST(ts AS DATE) AS date_day,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS total_ns
        |FROM events WHERE event_type <> 'view'
        |GROUP BY 1, 2, 3""".stripMargin
  )
}
