package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.storage.{IcebergExport, Snapshots}

/** Format-interop operators: the Iceberg v2 metadata projection
  * (reference tables are REAL Iceberg — `src/common/src/iceberg/
  * schemas.rs:189-455`, `table_manager.rs` — so an external engine can
  * open them; graft's CAS snapshots replicate the semantics and
  * [[graft.storage.IcebergExport]] now projects the format).
  *
  * q323 is the row-level conformance gate: it resolves the stored logs
  * table STRICTLY through the exported chain (version-hint →
  * metadata.json → manifest-list Avro → manifest Avro → data files; the
  * walk an external reader performs), aggregates the resolved rows, and
  * rides the manifest-claimed totals (record_count sums, identity
  * partition tuples) along as columns — DuckDB restates all of it from
  * the raw events view, so wrong file sets, wrong stats, or wrong
  * partition values all hash-mismatch. (DuckDB's `iceberg` extension
  * itself is not installable offline; IcebergExportSpec pins the format
  * details the extension would check.)
  */
object InteropOps {
  type Q = (SparkSession, String) => DataFrame

  /** export once per (process, sf dir); re-running is idempotent but
    * re-reads parquet footers, which bench passes need not repeat. The
    * table is this query's OWN stored layout (same Storage.append
    * path), not the shared storedLogs fixture — exporting writes a
    * `metadata/` dir under the table root, and a shared fixture's plain
    * root reads must never have to know about it. */
  private val exported = scala.collection.concurrent.TrieMap[String, String]()
  private def icebergLogsLocation(s: SparkSession, dir: String): String =
    exported.getOrElseUpdate(dir, {
      val base = graft.storage.LocalCache.dir(s"iceberg_logs|$dir")
      val layout = graft.storage.Storage.TableLayout(base, "tenant0", "default")
      if (Snapshots.current(s, layout, "logs").isEmpty) {
        graft.storage.Storage.append(
          graft.storage.Storage.withPartitionCols(
            graft.SignalViews.logsGen2Df(s, dir))
            .repartition(org.apache.spark.sql.functions.col("date_day"),
              org.apache.spark.sql.functions.col("hour")),
          layout, "logs", alreadyPartitioned = true)
        Snapshots.commit(s, layout, "logs")
      }
      IcebergExport.export(s, layout, "logs")
      layout.path("logs")
    })

  /** two-version stored-logs fixture for q330, built once per
    * (process, sf dir) through the REAL storage ops: v1 = days ≤ 29
    * committed; v2 adds the Jan 30 day AND a Jan 10 error-rows backfill
    * (two appends, one commit). */
  private val diffFixture = scala.collection.concurrent.TrieMap[String, String]()
  private def snapshotDiffFixture(s: SparkSession, dir: String): String =
    diffFixture.getOrElseUpdate(dir, {
      val base = graft.storage.LocalCache.dir(s"snapdiff|$dir")
      val layout = graft.storage.Storage.TableLayout(base, "tenant0", "default")
      if (Snapshots.current(s, layout, "logs").isEmpty) {
        val logs = graft.storage.Storage.withPartitionCols(
          graft.SignalViews.logsGen2Df(s, dir))
        graft.storage.Storage.append(
          logs.filter(col("date_day") <= "2024-01-29")
            .repartition(col("date_day"), col("hour")),
          layout, "logs", alreadyPartitioned = true)
        require(Snapshots.commit(s, layout, "logs") == 1)
        graft.storage.Storage.append(
          logs.filter(col("date_day") === "2024-01-30" ||
            (col("date_day") === "2024-01-10" && col("severity_text") === "error"))
            .repartition(col("date_day"), col("hour")),
          layout, "logs", alreadyPartitioned = true)
        require(Snapshots.commit(s, layout, "logs") == 2)
      }
      base
    })

  /** two-commit documents fixture for q370 (VERDICT r10 #1), built once
    * per (process, sf dir, data version) through the REAL storage ops:
    *   v1 = the base corpus (docs with doc_id % 3 ≠ 0) committed;
    *   v2 = a delta append carrying, by construction, every dedup class:
    *     fresh rows           doc_id % 3 = 0, own text
    *     exact dups vs base   base docs % 10 = 1, text verbatim, id+10M
    *     exact dups in delta  fresh docs % 5 = 0, text verbatim, id+20M
    *     near dups vs base    base docs % 10 = 3, text + 3 words, id+30M
    * Ingest timestamps are deterministic (fixed epoch + doc_id nanos;
    * the delta lands one day later) — the layout machinery is the real
    * sink, the wall clock is not part of the fixture. */
  private val deltaFixture = scala.collection.concurrent.TrieMap[String, String]()
  private def dedupDeltaFixture(s: SparkSession, dir: String): String =
    deltaFixture.getOrElseUpdate(dir, {
      val base = graft.storage.LocalCache.dir(
        s"deltadedup|$dir@${graft.storage.LocalCache.dataVersion(dir)}")
      val layout = graft.storage.Storage.TableLayout(base, "tenant0", "default")
      if (Snapshots.current(s, layout, "docs").isEmpty) {
        val docs = graft.Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val epoch = 1706745600L * 1000000000L
        graft.storage.Storage.append(
          docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
            .withColumn("timestamp", lit(epoch) + col("doc_id")),
          layout, "docs")
        require(Snapshots.commit(s, layout, "docs") == 1)
        val fresh = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        val dupVsBase = docs
          .filter(pmod(col("doc_id"), lit(3)) =!= 0 && pmod(col("doc_id"), lit(10)) === 1)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
        val dupIntra = docs
          .filter(pmod(col("doc_id"), lit(3)) === 0 && pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + 20000000L).as("doc_id"), col("text"))
        val nearVsBase = docs
          .filter(pmod(col("doc_id"), lit(3)) =!= 0 && pmod(col("doc_id"), lit(10)) === 3)
          .select((col("doc_id") + 30000000L).as("doc_id"),
            concat(col("text"), lit(" zulu yankee xray")).as("text"))
        graft.storage.Storage.append(
          fresh.unionByName(dupVsBase).unionByName(dupIntra).unionByName(nearVsBase)
            .withColumn("timestamp", lit(epoch + 86400L * 1000000000L) + col("doc_id")),
          layout, "docs")
        require(Snapshots.commit(s, layout, "docs") == 2)
      }
      base
    })

  /** q379's BUCKETED corpus indexes, materialized once per fixture from
    * the v1 snapshot through [[graft.storage.Storage.writeBucketed]]:
    * the content-hash ledger bucketed on `h`, and the shingle index
    * bucketed on `sh` with the per-doc shingle count DENORMALIZED into
    * every row (so probe-time candidate aggregation carries it via
    * first() — no corpus-sized sizes join at probe time, ever). Bucketed
    * writes hash-cluster + sort at INGEST time; a probe then shuffles
    * only its own (delta) side. Catalog registration is per process
    * (in-memory catalog) — re-running writeBucketed over an existing
    * fixture rewrites the same deterministic content. */
  private val deltaIndexLock = new Object
  private def ensureDeltaIndex(s: SparkSession, loc: String): (String, String) = {
    val layout = graft.storage.Storage.TableLayout(loc, "tenant0", "idx")
    val suffix = Integer.toHexString(loc.hashCode)
    val ledger = s"hash_ledger_$suffix"
    val index = s"shingle_idx_$suffix"
    deltaIndexLock.synchronized {
      if (!s.catalog.tableExists(s"tenant0_idx_$ledger")) {
        val base = Snapshots.read(s, graft.storage.Storage.TableLayout(
          loc, "tenant0", "default"), "docs", Some(1))
          .select(col("doc_id"), col("text"))
        val bSh = PipelineOps.deltaShingles(base)
        val bSize = bSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        graft.storage.Storage.writeBucketed(
          base.select(md5(col("text")).as("h")).distinct(),
          layout, ledger, "h", 8)
        graft.storage.Storage.writeBucketed(
          bSh.join(bSize, "doc_id")
            .select(col("doc_id").as("b_id"), col("sh"), col("n_sh").as("n_b")),
          layout, index, "sh", 8)
      }
    }
    (s"tenant0_idx_$ledger", s"tenant0_idx_$index")
  }

  val queries: Map[String, Q] = Map(
    // the q370 classification against the STORED BUCKETED corpus
    // indexes — the 100 TB probe shape made physical: the hash ledger
    // and shingle index are bucketed (and sorted) on their join keys at
    // write time, so the only exchanges in the probe plan are on the
    // DELTA side (PlanSpec pins the bucketed scans); the corpus is
    // never rescanned or reshuffled per drop. Output (and oracle) are
    // q370's verbatim.
    "q379_dedup_delta_indexed" -> ((s, dir) => {
      val loc = dedupDeltaFixture(s, dir)
      val (ledger, index) = ensureDeltaIndex(s, loc)
      val layout = graft.storage.Storage.TableLayout(loc, "tenant0", "default")
      val root = layout.path("docs")
      val v1set = Snapshots.files(s, layout, "docs", 1).toSet
      val newFiles = Snapshots.files(s, layout, "docs", 2)
        .filterNot(v1set.contains).map(rel => s"$root/$rel")
      val delta = s.read.option("basePath", root).parquet(newFiles: _*)
        .select(col("doc_id"), col("text"))
      PipelineOps.dedupDeltaFrom(delta, s.table(ledger), s.table(index))
    }),

    // INCREMENTAL DELTA-VS-CORPUS DEDUP (the single most common 100 TB
    // pipeline operation: a new drop lands, dedup ONLY the delta against
    // the committed corpus — never recompute the corpus). The delta rows
    // are resolved from the MANIFEST FILE-SET DIFFERENCE between the two
    // committed snapshots (q330's incremental-read primitive: only files
    // in v2 and not in v1 are ever read for the delta side), the base
    // corpus from v1's own manifest; [[PipelineOps.dedupDelta]] then
    // classifies every delta row (exact hash anti-join, shingle-Jaccard
    // candidate joins — never base×base work). The oracle restates the
    // fixture's membership rules from raw documents and the full survivor
    // calculus in SQL.
    "q370_dedup_delta" -> ((s, dir) => {
      val loc = dedupDeltaFixture(s, dir)
      val layout = graft.storage.Storage.TableLayout(loc, "tenant0", "default")
      val root = layout.path("docs")
      val v1 = Snapshots.files(s, layout, "docs", 1)
      val v1set = v1.toSet
      val newFiles = Snapshots.files(s, layout, "docs", 2)
        .filterNot(v1set.contains).map(rel => s"$root/$rel")
      require(newFiles.nonEmpty, "fixture must append files between v1 and v2")
      val base = s.read.option("basePath", root)
        .parquet(v1.map(rel => s"$root/$rel"): _*)
        .select(col("doc_id"), col("text"))
      val delta = s.read.option("basePath", root).parquet(newFiles: _*)
        .select(col("doc_id"), col("text"))
      PipelineOps.dedupDelta(base, delta)
    }),
    // TABLE PROFILER (the Deequ/data-profiling pass a pipeline runs
    // before trusting a new drop): per-column row/null/distinct counts
    // and min/max, computed in ONE scan — a single aggregate produces
    // every stat (Spark expands the multi-distinct into one pass), then
    // stack() pivots the wide row into the (column, stats) report.
    // min/max surface as strings so one report row type covers every
    // column dtype (BIGINT→string renders identically across engines;
    // floats would not, so float columns would report quantized —
    // documents has none). At 100 TB the exact distincts swap for the
    // KMV sketch (q313/q314's discipline); the scan shape is the same.
    "q329_table_profile" -> ((s, dir) => {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val d = graft.Tables.documents(s, dir)
      val aggs = count(lit(1)).as("n_rows") +:
        cols.flatMap(c => Seq(
          count(col(c)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).cast("string").as(s"mn_$c"),
          max(col(c)).cast("string").as(s"mx_$c")))
      val stack = cols.map(c =>
        s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
      d.agg(aggs.head, aggs.tail: _*)
        .select(col("n_rows"), expr(
          s"stack(${cols.size}, $stack) AS (column, n_present, n_distinct, min_str, max_str)"))
        .select(col("column"), col("n_rows"),
          (col("n_rows") - col("n_present")).as("n_null"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }),

    // SNAPSHOT DIFF / INCREMENTAL READ (Iceberg's changelog shape): the
    // rows appended between two committed snapshots, resolved from the
    // MANIFEST FILE-SET DIFFERENCE — the actual incremental-read
    // mechanism: only files in v2's manifest and not in v1's are ever
    // read, so the consumer's cost tracks the delta, not the table (the
    // 100 TB point — an anti-join over both versions would re-scan
    // everything). Per-day appended counts are what an incremental
    // consumer checkpoints on. Removals in this storage design only
    // happen through maintenance that EXPIRES old snapshots (manifests
    // older than a rewrite go stale by design, Snapshots doc) — there
    // is no between-snapshot row delete to report, and the file-level
    // diff would surface one loudly.
    "q330_snapshot_diff" -> ((s, dir) => {
      val loc = snapshotDiffFixture(s, dir)
      val layout = graft.storage.Storage.TableLayout(loc, "tenant0", "default")
      val root = layout.path("logs")
      val v1 = Snapshots.files(s, layout, "logs", 1).toSet
      val v2 = Snapshots.files(s, layout, "logs", 2)
      val appended = v2.filterNot(v1.contains).map(rel => s"$root/$rel")
      require(appended.nonEmpty, "fixture must append files between v1 and v2")
      s.read.option("basePath", root).parquet(appended: _*)
        .groupBy(col("date_day").cast("string").as("date_day"))
        .agg(count(lit(1)).as("n_appended"))
        .select(col("date_day"), col("n_appended"))
    }),

    "q323_iceberg_export" -> ((s, dir) => {
      val loc = icebergLogsLocation(s, dir)
      val files = IcebergExport.readDataFiles(loc)
      val manifestRows = files.map(_.recordCount).sum
      val manifestPartitions = files
        .map(f => (f.partition("date_day"), f.partition("hour")))
        .distinct.size.toLong
      s.read.option("basePath", loc).parquet(files.map(_.path): _*)
        .groupBy(col("service_name"))
        .agg(count(lit(1)).as("n_rows"))
        .select(col("service_name"), col("n_rows"),
          lit(manifestRows).as("manifest_rows"),
          lit(manifestPartitions).as("manifest_partitions"))
    })
  )

  // base/delta membership restated from raw documents (the fixture's
  // construction rules), then the shared survivor calculus
  // ([[PipelineOps.dedupDeltaOracleSql]] — one statement of the rule for
  // both engines). Shared verbatim by the bucketed-index probe (q379):
  // the indexes hold exactly the v1 base's hashes/shingles, so the
  // classification plane is identical.
  private val dedupDeltaSql: String =
      s"""WITH basec AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
         |deltac AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
         |  UNION ALL
         |  SELECT doc_id + 10000000, text FROM documents
         |  WHERE doc_id % 3 <> 0 AND doc_id % 10 = 1
         |  UNION ALL
         |  SELECT doc_id + 20000000, text FROM documents
         |  WHERE doc_id % 3 = 0 AND doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 30000000, text || ' zulu yankee xray' FROM documents
         |  WHERE doc_id % 3 <> 0 AND doc_id % 10 = 3),
         |${PipelineOps.dedupDeltaOracleSql("basec", "deltac")}
         |SELECT doc_id, status FROM st""".stripMargin

  val oracles: Map[String, String] = Map(
    "q370_dedup_delta" -> dedupDeltaSql,
    "q379_dedup_delta_indexed" -> dedupDeltaSql,
    // the appended slice restated from the raw view: day 30 plus the
    // Jan 10 error backfill (UTC day derivation matches withPartitionCols)
    "q330_snapshot_diff" ->
      s"""WITH l AS (${graft.SignalViews.gen2ViewSql}),
         |d AS (
         |  SELECT strftime(make_timestamp(timestamp // 1000), '%Y-%m-%d')
         |    AS date_day, severity_text
         |  FROM l)
         |SELECT date_day, CAST(COUNT(*) AS BIGINT) AS n_appended
         |FROM d
         |WHERE date_day = '2024-01-30'
         |   OR (date_day = '2024-01-10' AND severity_text = 'error')
         |GROUP BY 1""".stripMargin,

    "q329_table_profile" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      cols.map(c =>
        s"""SELECT '$c' AS "column",
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_rows,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents)
           |    - CAST(COUNT($c) AS BIGINT) AS n_null,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(MIN($c) AS VARCHAR) AS min_str,
           |  CAST(MAX($c) AS VARCHAR) AS max_str
           |FROM documents""".stripMargin).mkString("\nUNION ALL\n")
    },

    // the manifest totals restated from the raw view: total rows, and
    // the distinct (day, hour) tuples the identity partition spec
    // materializes (UTC derivation matches Storage.withPartitionCols)
    "q323_iceberg_export" ->
      s"""WITH l AS (${graft.SignalViews.gen2ViewSql})
         |SELECT service_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM l) AS manifest_rows,
         |  (SELECT CAST(COUNT(DISTINCT strftime(
         |     make_timestamp(timestamp // 1000), '%Y-%m-%d %H')) AS BIGINT)
         |   FROM l) AS manifest_partitions
         |FROM l GROUP BY 1""".stripMargin
  )
}
