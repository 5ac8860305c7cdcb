package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.{SignalViews, Tables}

/** Discovery + advisory operators (SURVEY §2.4 distinct discovery —
  * reference logs.rs:372-637 label names/values/series/detected fields
  * with sampling and caps; §4 attribute auto-promotion —
  * src/compactor/src/attr_promotion.rs scan-stats × query-demand scoring).
  */
object DiscoveryOps {
  type Q = (SparkSession, String) => DataFrame

  private val V = SignalViews.logsViewSql

  /** deterministic sample cap: lowest N event_ids (the reference samples
    * ≤1000 docs, logs.rs:483-575; a deterministic predicate keeps the
    * oracle honest). */
  private val SampleN = 1000

  val queries: Map[String, Q] = Map(
    // Cardinality-churn detector (the "did a deploy start minting new
    // series?" guard every 100 TB metrics store needs): per day, the
    // active series count and how many of those series were seen for
    // the FIRST time that day. First-seen day is one distinct + min
    // aggregate per series — no day-over-day self-join cascade — then
    // actives and births meet in a tiny per-day join. Churn in exact
    // integer ppm.
    "q259_cardinality_churn" -> ((s, dir) => {
      val series = SignalViews.metricsDf(s, dir)
        .select(expr("(timestamp div 1000000000) div 86400").as("day"),
          col("metric_name"), col("service_name"))
        .distinct()
      val active = series.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
      val born = series.groupBy(col("metric_name"), col("service_name"))
        .agg(min(col("day")).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
      active.join(born, Seq("day"), "left")
        .select(col("day"), col("n_active"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          expr("(coalesce(n_new, 0) * 1000000) div n_active").as("churn_ppm"))
    }),

    // label values with bounded result (LABEL_SCAN_LIMIT analog)
    "q66_label_values" -> ((s, dir) =>
      SignalViews.logsDf(s, dir)
        .select(col("service_name")).distinct()
        .orderBy(col("service_name").asc).limit(1000)),

    // series discovery: distinct label sets + volume
    "q67_series_discovery" -> ((s, dir) =>
      SignalViews.logsDf(s, dir)
        .groupBy(col("service_name"), col("severity_text"), col("event_type"))
        .agg(count(lit(1)).as("n_rows"))),

    // detected fields: sample ≤1000 docs (deterministic lowest-event_id
    // predicate), explode EVERY body json key, infer each field's type and
    // cap its distinct count (reference detected_fields, logs.rs:483-575).
    // The sample cap bounds the exact-distinct work, so the result is
    // oracle-checkable — and at 100 TB the cost is fixed by the cap, not
    // the table size.
    "q68_detected_fields" -> ((s, dir) => {
      import org.apache.spark.sql.types.{MapType, StringType}
      val sample = SignalViews.logsDf(s, dir)
        .orderBy(col("event_id").asc).limit(SampleN)
      val fields = sample
        .select(explode(from_json(col("body"), MapType(StringType, StringType))).as(Seq("field", "v")))
        .filter(col("v").isNotNull)
      fields.groupBy(col("field"))
        .agg(
          count(lit(1)).as("n_present"),
          least(countDistinct(col("v")), lit(1000L)).as("ndv_capped"),
          bool_and(col("v").cast(LongType).isNotNull).as("_all_int"))
        .withColumn("inferred_type", when(col("_all_int"), "int").otherwise("string"))
        .drop("_all_int")
    }),

    // label-names discovery over the gen-2 attribute maps: a key is
    // reported iff some row carries it (sparse attrs included via any
    // row's map; reference labels endpoint, logs.rs:372-430)
    "q96_gen2_label_names" -> ((s, dir) =>
      SignalViews.logsGen2Df(s, dir)
        .select(explode(concat(
          map_keys(col("log_attributes")),
          map_keys(col("resource_attributes")))).as("label"))
        .distinct()),

    // attr promotion advisor: presence ratio × cardinality budget × demand
    // (attr_promotion.rs decision inputs; hysteresis/demand counters are
    // constants here, wired per-deployment)
    "q69_attr_promotion" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // synthetic attr presence: k always, u on 25% of rows, e always
      val attrs = ev.select(explode(array(
        struct(lit("k").as("attr"), get_json_object(col("props"), "$.k").as("v")),
        struct(lit("u").as("attr"),
          when(pmod(col("user_id"), lit(4)) === 0, col("user_id").cast("string")).as("v")),
        struct(lit("e").as("attr"), col("event_type").as("v")))).as("a"))
        .select(col("a.attr"), col("a.v"))
      // total row count as a 1-row broadcast cross join — keeps plan
      // building lazy and scans events once, instead of an eager driver
      // `count()` (the collect-in-plan-builder smell)
      val totals = ev.agg(count(lit(1)).as("_total"))
      val demanded = Seq("k", "e") // query-demand counters (attr_demand.rs)
      attrs.groupBy(col("attr"))
        .agg(count(col("v")).as("n_present"),
          countDistinct(col("v")).as("ndv"))
        .crossJoin(broadcast(totals))
        .withColumn("presence_ratio", col("n_present").cast(DoubleType) / col("_total"))
        .withColumn("demanded", col("attr").isin(demanded: _*))
        .withColumn("promote",
          col("presence_ratio") >= 0.5 && col("ndv") <= 100 && col("demanded"))
        .drop("_total")
    }),

    // HyperLogLog register table (m=256, p=8) for distinct user_id — the
    // MERGEABLE sketch state a 1000-executor cardinality pipeline ships
    // between stages instead of exact distinct sets. Deterministic by
    // construction: md5-derived register index (first 2 hex nibbles) and
    // rank rho = position of the first 1-bit in the next 48 bits, both
    // pure string/CASE arithmetic that DuckDB reproduces bit-identically.
    // One hash aggregate; state is ≤256 rows regardless of input size.
    "q205_hll_registers" -> ((s, dir) =>
      hllRegs(Tables.events(s, dir))
        .groupBy(col("reg")).agg(max(col("rho")).as("rho"))),

    // HLL estimate + the merge law that makes the sketch shippable:
    // per-day sketches max-merged equal the global sketch, so the two
    // integer raw estimates (alpha·m²·2^48 div S, S the exact power-sum
    // in a 2^48 fixed point) must agree exactly. n_exact rides along as
    // the accuracy reference.
    "q206_hll_estimate" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val withDay = hllRegs(ev)
        .withColumn("day", expr("(unix_micros(ts_us) div 1000000) div 86400"))
      val global = withDay.groupBy(col("reg")).agg(max(col("rho")).as("rho"))
      val merged = withDay.groupBy(col("day"), col("reg"))
        .agg(max(col("rho")).as("rho"))
        .groupBy(col("reg")).agg(max(col("rho")).as("rho"))
      val exact = ev.agg(countDistinct(col("user_id")).as("n_exact"))
      hllEst(global, "est_global")
        .crossJoin(hllEst(merged, "est_merged"))
        .crossJoin(exact)
        .withColumn("merge_exact",
          (col("est_global") === col("est_merged")).cast("int"))
        .select(col("n_exact"), col("est_global"), col("est_merged"),
          col("merge_exact"))
    }),

    // KMV (bottom-k theta) sketch — a NATIVE TypedImperativeAggregate
    // (functions/Kmv.scala): bounded ≤k-long state through partial agg +
    // shuffle + merge, exactly the machinery a 1000-executor distinct
    // count ships instead of distinct sets. Deterministic md5-derived
    // 60-bit hashes make the sketch itself oracle-restatable (DuckDB
    // row_number ≤ k), so the estimator `(k−1)·2^60 div theta` compares
    // bit-for-bit. n_exact rides along as the accuracy reference; at
    // sf0.001 (15 users) the exact `n < k` branch exercises, at
    // sf0.01+ the estimator branch does.
    "q299_kmv_distinct" -> ((s, dir) => {
      val hashed = Tables.events(s, dir).withColumn("h", expr(KmvHash))
      hashed.groupBy(col("event_type"))
        .agg(graft.functions.Kmv.kmvSketch(col("h"), KmvK).as("sk"),
          countDistinct(col("user_id")).as("n_exact"))
        .select(col("event_type"), col("n_exact"),
          size(col("sk")).cast(LongType).as("k_n"),
          element_at(col("sk"), size(col("sk"))).as("theta"),
          expr(s"""CASE WHEN size(sk) < $KmvK THEN CAST(size(sk) AS BIGINT)
                  |  ELSE CAST(CAST('$KmvNum' AS DECIMAL(38,0))
                  |       div element_at(sk, $KmvK) AS BIGINT) END""".stripMargin)
            .as("est"))
    }),

    // Theta-sketch SET ALGEBRA — the capability HLL fundamentally lacks:
    // intersect the click and purchase user sketches (θ = min of the two
    // thetas, count common hashes < θ, scale by 2^60/θ), plus the merged
    // union sketch proving mergeability. All three sketches are 1-row
    // broadcast sides; the estimate arithmetic is exact integers both
    // engines reproduce.
    "q300_kmv_intersection" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val hashed = ev.withColumn("h", expr(KmvHash))
      def sk(t: String, n: String) =
        hashed.filter(col("event_type") === t)
          .agg(graft.functions.Kmv.kmvSketch(col("h"), KmvK).as(s"sk_$n"))
      val unionSk = hashed.filter(col("event_type").isin("click", "purchase"))
        .agg(graft.functions.Kmv.kmvSketch(col("h"), KmvK).as("sk_u"))
      val exactInter = ev.filter(col("event_type") === "click")
        .select("user_id").distinct()
        .intersect(ev.filter(col("event_type") === "purchase")
          .select("user_id").distinct())
        .agg(count(lit(1)).as("n_exact_inter"))
      sk("click", "a").crossJoin(sk("purchase", "b"))
        .crossJoin(unionSk).crossJoin(exactInter)
        .withColumn("theta_a", expr(
          s"CASE WHEN size(sk_a) < $KmvK THEN CAST($KmvTwo60 AS BIGINT) " +
            s"ELSE element_at(sk_a, $KmvK) END"))
        .withColumn("theta_b", expr(
          s"CASE WHEN size(sk_b) < $KmvK THEN CAST($KmvTwo60 AS BIGINT) " +
            s"ELSE element_at(sk_b, $KmvK) END"))
        .withColumn("theta", least(col("theta_a"), col("theta_b")))
        .withColumn("matches", expr(
          "CAST(size(filter(array_intersect(sk_a, sk_b), x -> x < theta)) AS BIGINT)"))
        .withColumn("est_inter", expr(
          s"""CAST(CAST(matches AS DECIMAL(38,0)) *
             |  CAST($KmvTwo60 AS DECIMAL(38,0)) div theta AS BIGINT)""".stripMargin))
        .withColumn("est_union", expr(
          s"""CASE WHEN size(sk_u) < $KmvK THEN CAST(size(sk_u) AS BIGINT)
             |  ELSE CAST(CAST('$KmvNum' AS DECIMAL(38,0))
             |       div element_at(sk_u, $KmvK) AS BIGINT) END""".stripMargin))
        .select("n_exact_inter", "theta", "matches", "est_inter", "est_union")
    }),

    // Loki index-volume DISCOVERY served from the KMV sketch: per-service
    // log volume (bytes) plus the STREAM-count estimate — the stream
    // identity (service, severity, client_ip) is deliberately
    // high-cardinality, exactly where the reference bounds label scans
    // (metrics.rs:58 LABEL_SCAN_LIMIT) and where exact distinct on 100 TB
    // is the thing you can no longer afford: the sketch ships ≤k longs
    // per group through partial agg/shuffle/merge. n_streams_exact rides
    // along as the accuracy reference; the oracle restates the sketch
    // via row_number ≤ k over the same md5-derived hashes.
    "q314_loki_volume" -> ((s, dir) =>
      lokiVolumeFrame(graft.SignalViews.logsDf(s, dir)))
  )

  /** the `/loki/api/v1/index/volume` frame over a (possibly
    * selector-filtered) logs view: volume bytes + exact and
    * KMV-estimated stream counts per service. */
  def lokiVolumeFrame(logs: DataFrame): DataFrame =
    logs.withColumn("h", expr(VolHash))
      .groupBy(col("service_name"))
      // octet_length, not length: Loki volume counts BYTES, and the
      // repo's LogQL bytes_over_time path already uses octet semantics
      // (LogQLOps) — character count undercounts multi-byte UTF-8.
      .agg(expr("CAST(SUM(octet_length(body)) AS BIGINT)").as("volume_bytes"),
        countDistinct(expr("concat(severity_text, '|', client_ip)"))
          .as("n_streams_exact"),
        graft.functions.Kmv.kmvSketch(col("h"), KmvK).as("sk"))
      .select(col("service_name"), col("volume_bytes"),
        col("n_streams_exact"),
        size(col("sk")).cast(LongType).as("k_n"),
        expr(KmvEstCase).as("streams_est"))

  /** per-group KMV distinct estimates of `value`: (g, present, est,
    * capped) — presence count and the sketch in ONE bounded-state agg;
    * `capped` marks groups whose sketch saturated (the estimate is an
    * approximation, not an exact small count). The label_stats serving
    * shape (reference catalog attribute stats → promql.rs:275). */
  def kmvGroupStats(df: DataFrame, group: Column, value: Column): DataFrame =
    df.select(group.as("g"),
        conv(substring(md5(concat(lit("kmv:"), value)), 1, 15), 16, 10)
          .cast(LongType).as("h"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("present"),
        graft.functions.Kmv.kmvSketch(col("h"), KmvK).as("sk"))
      .select(col("g"), col("present"),
        expr(KmvEstCase).as("est"),
        (size(col("sk")) >= KmvK).as("capped"))

  /** KMV distinct-count estimate of a string key over `df` — ONE sketch
    * aggregation, the serving-path form (`/loki/api/v1/series` with
    * `count=estimate`). */
  def kmvEstimate(df: DataFrame, key: Column): Long =
    df.select(conv(substring(md5(concat(lit("kmv:"), key)), 1, 15),
        16, 10).cast(LongType).as("h"))
      .agg(graft.functions.Kmv.kmvSketch(col("h"), KmvK).as("sk"))
      .select(expr(KmvEstCase).as("est"))
      .collect()(0).getLong(0)

  /** 60-bit (15 hex nibbles — safely inside BIGINT) uniform hash both
    * engines derive identically from md5. */
  private val KmvK = 64
  private val KmvHash =
    "CAST(conv(substring(md5(concat('kmv:', CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
  private val KmvHashDuck =
    "CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
  private val KmvTwo60 = (BigInt(1) << 60).toString
  private val KmvNum = (BigInt(KmvK - 1) << 60).toString // (k−1)·2^60
  /** the estimator over a sketch column `sk`: exact below k, else
    * (k−1)·2^60 div θ. */
  private val KmvEstCase =
    s"""CASE WHEN size(sk) < $KmvK THEN CAST(size(sk) AS BIGINT)
       |  ELSE CAST(CAST('$KmvNum' AS DECIMAL(38,0))
       |       div element_at(sk, $KmvK) AS BIGINT) END""".stripMargin
  /** stream-identity hash for the volume frame (60-bit md5). */
  private val VolHash =
    "CAST(conv(substring(md5(concat('vol:', service_name, '|', " +
      "severity_text, '|', client_ip)), 1, 15), 16, 10) AS BIGINT)"
  private val VolHashDuck =
    "CAST(('0x' || substr(md5('vol:' || service_name || '|' || " +
      "severity_text || '|' || client_ip), 1, 15)) AS BIGINT)"

  /** Per-row HLL (reg, rho) from md5("hll:" ++ user_id): reg = first byte,
    * rho = 1-based first-1-bit position in the following 48 bits (12 hex
    * nibbles), 49 when they are all zero. Keeps every other event column. */
  private def hllRegs(ev: DataFrame): DataFrame =
    ev.withColumn("h", md5(concat(lit("hll:"), col("user_id").cast("string"))))
      .withColumn("reg", expr(
        "CAST((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16 + " +
          "instr('0123456789abcdef', substring(h, 2, 1)) - 1 AS BIGINT)"))
      .withColumn("zn",
        length(regexp_extract(substring(col("h"), 3, 12), "^(0*)", 1)))
      .withColumn("fn", expr(
        "instr('0123456789abcdef', substring(h, 3 + zn, 1)) - 1"))
      .withColumn("rho", expr(
        """CAST(CASE WHEN zn >= 12 THEN 49
          |  ELSE 4*zn + (CASE WHEN fn >= 8 THEN 1 WHEN fn >= 4 THEN 2
          |               WHEN fn >= 2 THEN 3 ELSE 4 END) END AS INT)""".stripMargin))

  /** Raw HLL estimate over a (reg, rho) register table as ONE exact integer:
    * S = Σ 2^(48−rho) over present registers + (m−present)·2^48, then
    * alpha·m²·2^48 div (alpha_den·S) with alpha = 71827/100000 (m=256). */
  private def hllEst(regs: DataFrame, as: String): DataFrame = {
    // 71827·65536·2^48 precomputed so both engines divide the same literal
    val num = (BigInt(71827) * 65536 * (BigInt(1) << 48)).toString
    regs.agg(count(lit(1)).as("m_present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 48 - least(rho, 48))")).as("s_present"))
      .select(expr(
        s"""CAST(CAST('$num' AS DECIMAL(38,0)) div
           |  (CAST(100000 AS DECIMAL(38,0)) *
           |   (s_present + (256 - m_present) * shiftleft(CAST(1 AS BIGINT), 48)))
           |  AS BIGINT)""".stripMargin).as(as))
  }

  val oracles: Map[String, String] = Map(
    "q259_cardinality_churn" ->
      s"""WITH m AS (${SignalViews.metricsViewSql}),
         |series AS (
         |  SELECT DISTINCT (timestamp//1000000000)//86400 AS day,
         |    metric_name, service_name
         |  FROM m),
         |active AS (
         |  SELECT day, COUNT(*) AS n_active FROM series GROUP BY 1),
         |born AS (
         |  SELECT day, COUNT(*) AS n_new FROM (
         |    SELECT metric_name, service_name,
         |      CAST(min(day) AS BIGINT) AS day
         |    FROM series GROUP BY 1, 2) GROUP BY 1)
         |SELECT a.day, a.n_active,
         |  CAST(coalesce(b.n_new, 0) AS BIGINT) AS n_new,
         |  (coalesce(b.n_new, 0) * 1000000) // a.n_active AS churn_ppm
         |FROM active a LEFT JOIN born b USING (day)""".stripMargin,

    "q66_label_values" ->
      s"""WITH logs AS ($V)
         |SELECT DISTINCT service_name FROM logs
         |ORDER BY service_name ASC LIMIT 1000""".stripMargin,

    "q67_series_discovery" ->
      s"""WITH logs AS ($V)
         |SELECT service_name, severity_text, event_type, COUNT(*) AS n_rows
         |FROM logs GROUP BY 1, 2, 3""".stripMargin,

    // exact because the deterministic ≤1000-row sample bounds distinct work
    "q68_detected_fields" ->
      s"""WITH logs AS ($V),
         |sample AS (SELECT event_id, body FROM logs ORDER BY event_id ASC LIMIT 1000),
         |f AS (
         |  SELECT t.field AS field,
         |    json_extract_string(body, '$$.' || t.field) AS v
         |  FROM sample, unnest(json_keys(body)) AS t(field))
         |SELECT field, COUNT(*) AS n_present,
         |  least(COUNT(DISTINCT v), 1000) AS ndv_capped,
         |  CASE WHEN bool_and(TRY_CAST(v AS BIGINT) IS NOT NULL)
         |       THEN 'int' ELSE 'string' END AS inferred_type
         |FROM f WHERE v IS NOT NULL GROUP BY field""".stripMargin,

    // a key is listed iff ANY row resolves it non-null — exactly the
    // map_filter presence semantics of the gen-2 view
    "q96_gen2_label_names" ->
      s"""WITH v AS (${SignalViews.gen2ViewSql})
         |SELECT 'k' AS label WHERE EXISTS (SELECT 1 FROM v WHERE k IS NOT NULL)
         |UNION ALL
         |SELECT 'event_type' WHERE EXISTS (SELECT 1 FROM v WHERE event_type IS NOT NULL)
         |UNION ALL
         |SELECT 'region' WHERE EXISTS (SELECT 1 FROM v WHERE region IS NOT NULL)
         |UNION ALL
         |SELECT 'plan' WHERE EXISTS (SELECT 1 FROM v WHERE plan IS NOT NULL)
         |UNION ALL
         |SELECT 'host' WHERE EXISTS (SELECT 1 FROM v WHERE host IS NOT NULL)
         |UNION ALL
         |SELECT 'env' WHERE EXISTS (SELECT 1 FROM v WHERE env IS NOT NULL)""".stripMargin,

    "q69_attr_promotion" ->
      """WITH attrs AS (
        |  SELECT 'k' AS attr, json_extract_string(props, '$.k') AS v FROM events
        |  UNION ALL
        |  SELECT 'u' AS attr,
        |    CASE WHEN user_id % 4 = 0 THEN CAST(user_id AS VARCHAR) END AS v
        |  FROM events
        |  UNION ALL
        |  SELECT 'e' AS attr, event_type AS v FROM events),
        |t AS (SELECT COUNT(*) AS total FROM events)
        |SELECT attr, COUNT(v) AS n_present, COUNT(DISTINCT v) AS ndv,
        |  CAST(COUNT(v) AS DOUBLE) / total AS presence_ratio,
        |  attr IN ('k','e') AS demanded,
        |  (CAST(COUNT(v) AS DOUBLE) / total >= 0.5 AND COUNT(DISTINCT v) <= 100
        |   AND attr IN ('k','e')) AS promote
        |FROM attrs, t GROUP BY attr, total""".stripMargin,

    "q205_hll_registers" ->
      """WITH h AS (
        |  SELECT DISTINCT md5('hll:' || CAST(user_id AS VARCHAR)) AS h
        |  FROM events),
        |r AS (
        |  SELECT
        |    CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef', substr(h, 2, 1)) - 1 AS BIGINT) AS reg,
        |    length(regexp_extract(substr(h, 3, 12), '^(0*)', 1)) AS zn,
        |    strpos('0123456789abcdef', substr(h, 3 + zn, 1)) - 1 AS fn
        |  FROM h)
        |SELECT reg,
        |  CAST(MAX(CASE WHEN zn >= 12 THEN 49
        |    ELSE 4*zn + (CASE WHEN fn >= 8 THEN 1 WHEN fn >= 4 THEN 2
        |                 WHEN fn >= 2 THEN 3 ELSE 4 END) END) AS INT) AS rho
        |FROM r GROUP BY reg""".stripMargin,

    "q206_hll_estimate" -> {
      val num = (BigInt(71827) * 65536 * (BigInt(1) << 48)).toString
      s"""WITH base AS (
         |  SELECT user_id, epoch_us(ts)//1000000//86400 AS day,
         |    md5('hll:' || CAST(user_id AS VARCHAR)) AS h
         |  FROM events),
         |r AS (
         |  SELECT day,
         |    (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
         |      + strpos('0123456789abcdef', substr(h, 2, 1)) - 1 AS reg,
         |    length(regexp_extract(substr(h, 3, 12), '^(0*)', 1)) AS zn,
         |    strpos('0123456789abcdef', substr(h, 3 + zn, 1)) - 1 AS fn
         |  FROM base),
         |rr AS (
         |  SELECT day, reg,
         |    CASE WHEN zn >= 12 THEN 49
         |      ELSE 4*zn + (CASE WHEN fn >= 8 THEN 1 WHEN fn >= 4 THEN 2
         |                   WHEN fn >= 2 THEN 3 ELSE 4 END) END AS rho
         |  FROM r),
         |g AS (SELECT reg, MAX(rho) AS rho FROM rr GROUP BY 1),
         |md AS (
         |  SELECT reg, MAX(rho) AS rho FROM (
         |    SELECT day, reg, MAX(rho) AS rho FROM rr GROUP BY 1, 2)
         |  GROUP BY 1),
         |eg AS (
         |  SELECT CAST($num::HUGEINT // (100000::HUGEINT *
         |    (CAST(SUM(1::BIGINT << (48 - least(rho, 48))) AS HUGEINT)
         |     + (256 - COUNT(*)) * (1::BIGINT << 48))) AS BIGINT) AS est_global
         |  FROM g),
         |em AS (
         |  SELECT CAST($num::HUGEINT // (100000::HUGEINT *
         |    (CAST(SUM(1::BIGINT << (48 - least(rho, 48))) AS HUGEINT)
         |     + (256 - COUNT(*)) * (1::BIGINT << 48))) AS BIGINT) AS est_merged
         |  FROM md),
         |ex AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
         |       FROM events)
         |SELECT ex.n_exact, eg.est_global, em.est_merged,
         |  CAST(CASE WHEN eg.est_global = em.est_merged THEN 1 ELSE 0 END AS INT)
         |    AS merge_exact
         |FROM ex, eg, em""".stripMargin
    },

    "q299_kmv_distinct" ->
      s"""WITH hh AS (
         |  SELECT DISTINCT event_type, $KmvHashDuck AS h FROM events),
         |r AS (
         |  SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM hh),
         |sk AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k_n, MAX(h) AS theta
         |  FROM r WHERE rn <= $KmvK GROUP BY 1),
         |ex AS (
         |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
         |  FROM events GROUP BY 1)
         |SELECT s.event_type, e.n_exact, s.k_n, s.theta,
         |  CASE WHEN s.k_n < $KmvK THEN s.k_n
         |       ELSE CAST('$KmvNum'::HUGEINT // s.theta AS BIGINT) END AS est
         |FROM sk s JOIN ex e ON s.event_type = e.event_type""".stripMargin,

    "q300_kmv_intersection" ->
      s"""WITH hh AS (
         |  SELECT DISTINCT event_type, $KmvHashDuck AS h
         |  FROM events WHERE event_type IN ('click', 'purchase')),
         |ra AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
         |       FROM hh WHERE event_type = 'click'),
         |rb AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
         |       FROM hh WHERE event_type = 'purchase'),
         |ru AS (SELECT h, row_number() OVER (ORDER BY h) AS rn
         |       FROM (SELECT DISTINCT h FROM hh)),
         |ta AS (SELECT CASE WHEN COUNT(*) < $KmvK THEN $KmvTwo60
         |              ELSE MAX(h) END AS theta_a FROM ra WHERE rn <= $KmvK),
         |tb AS (SELECT CASE WHEN COUNT(*) < $KmvK THEN $KmvTwo60
         |              ELSE MAX(h) END AS theta_b FROM rb WHERE rn <= $KmvK),
         |t AS (SELECT least(theta_a, theta_b) AS theta FROM ta, tb),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS matches
         |  FROM (SELECT h FROM ra WHERE rn <= $KmvK) ia
         |  JOIN (SELECT h FROM rb WHERE rn <= $KmvK) ib USING (h), t
         |  WHERE h < t.theta),
         |u AS (
         |  SELECT CASE WHEN COUNT(*) < $KmvK THEN CAST(COUNT(*) AS BIGINT)
         |         ELSE CAST('$KmvNum'::HUGEINT // MAX(h) AS BIGINT) END AS est_union
         |  FROM ru WHERE rn <= $KmvK),
         |ei AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_inter FROM (
         |    SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
         |    INTERSECT
         |    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'))
         |SELECT ei.n_exact_inter, t.theta, m.matches,
         |  CAST(m.matches::HUGEINT * $KmvTwo60 // t.theta AS BIGINT) AS est_inter,
         |  u.est_union
         |FROM ei, t, m, u""".stripMargin,

    "q314_loki_volume" ->
      s"""WITH l AS (${graft.SignalViews.logsViewSql}),
         |hh AS (SELECT DISTINCT service_name, $VolHashDuck AS h FROM l),
         |r AS (
         |  SELECT service_name, h,
         |    row_number() OVER (PARTITION BY service_name ORDER BY h) AS rn
         |  FROM hh),
         |sk AS (
         |  SELECT service_name, CAST(COUNT(*) AS BIGINT) AS k_n,
         |    MAX(h) AS theta
         |  FROM r WHERE rn <= $KmvK GROUP BY 1),
         |vol AS (
         |  SELECT service_name,
         |    CAST(SUM(strlen(body)) AS BIGINT) AS volume_bytes,
         |    CAST(COUNT(DISTINCT severity_text || '|' || client_ip)
         |      AS BIGINT) AS n_streams_exact
         |  FROM l GROUP BY 1)
         |SELECT v.service_name, v.volume_bytes, v.n_streams_exact, s.k_n,
         |  CASE WHEN s.k_n < $KmvK THEN s.k_n
         |       ELSE CAST('$KmvNum'::HUGEINT // s.theta AS BIGINT)
         |  END AS streams_est
         |FROM vol v JOIN sk s USING (service_name)""".stripMargin
  ).filter(_._2 != null)
}
