package graft.schema

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Versioned table schemas: a declarative inheritance/rename/computed-field
  * layer over the fixed current-version StructTypes in [[Schemas]]
  * (reference: schemas.toml:41-57 — traces v2 `inherits = "v1"`, renames
  * `name→span_name`, `duration_nano→duration_nanos`,
  * `attributes_json→span_attributes`, `resource_json→resource_attributes`,
  * adds computed `timestamp`/`date_day`/`hour`; parser/resolution:
  * src/common/src/schema/schema_parser.rs).
  *
  * The Spark translation of "resolve an old table through the current
  * schema" is a SCAN-LEVEL view, not a rewrite: read the directory with
  * parquet mergeSchema (the union of every vintage's physical columns),
  * then for each rename in the version chain `coalesce(new, old)` — a
  * v2-written row carries the new column, a v1-written row carries the
  * old one, and exactly one side is non-null per row — and derive any
  * computed column absent from old files from its source expression. The
  * result is rename-invariant: the same query over a v1-written,
  * v2-written, or mixed directory returns the same rows. Untouched
  * columns keep full predicate pushdown; a filter on a renamed column
  * becomes a coalesce filter (evaluated post-scan, the honest cost of
  * reading un-rewritten history — the compactor's rewrite path upgrades
  * files physically via [[upgrade]], after which pushdown returns).
  */
object SchemaVersions {

  final case class FieldDef(name: String, dataType: DataType, required: Boolean = false)
  final case class Rename(from: String, to: String)

  /** one version of one table. `computed`: column name → expression over
    * the POST-rename frame (source columns already resolved). */
  final case class VersionDef(
      version: Int,
      inherits: Option[Int],
      fields: Seq[FieldDef] = Nil,
      renames: Seq[Rename] = Nil,
      computed: Seq[(String, DataType, Column)] = Nil)

  /** nanosecond Long → partition day (UTC). */
  private def dateDayOf(tsNanos: Column): Column =
    to_date(timestamp_micros((tsNanos / 1000L).cast(LongType)))
  private def hourOf(tsNanos: Column): Column =
    hour(timestamp_micros((tsNanos / 1000L).cast(LongType)))

  private val attrMap = MapType(StringType, StringType)

  /** traces v1 — the reference's initial OTLP-conversion schema
    * (schemas.toml:14-41): pre-rename names, no partition/computed cols. */
  private val tracesV1 = VersionDef(1, None, fields = Seq(
    FieldDef("trace_id", StringType, required = true),
    FieldDef("span_id", StringType, required = true),
    FieldDef("parent_span_id", StringType),
    FieldDef("name", StringType, required = true),
    FieldDef("service_name", StringType, required = true),
    FieldDef("start_time_unix_nano", LongType, required = true),
    FieldDef("end_time_unix_nano", LongType, required = true),
    FieldDef("duration_nano", LongType, required = true),
    FieldDef("span_kind", StringType),
    FieldDef("status_code", StringType),
    FieldDef("status_message", StringType),
    FieldDef("is_root", BooleanType),
    FieldDef("attributes_json", attrMap),
    FieldDef("resource_json", attrMap),
    FieldDef("scope_attributes", attrMap),
    FieldDef("events", StringType),
    FieldDef("links", StringType),
    FieldDef("trace_state", StringType)))

  /** traces v2 — inherits v1, renames, adds computed partition fields
    * (schemas.toml:44-57). */
  private val tracesV2 = VersionDef(2, Some(1),
    renames = Seq(
      Rename("name", "span_name"),
      Rename("duration_nano", "duration_nanos"),
      Rename("attributes_json", "span_attributes"),
      Rename("resource_json", "resource_attributes")),
    computed = Seq(
      ("timestamp", LongType, col("start_time_unix_nano")),
      ("date_day", DateType, dateDayOf(col("start_time_unix_nano"))),
      ("hour", IntegerType, hourOf(col("start_time_unix_nano")))))

  /** logs v1 is current (schemas.toml metadata current_log_version=v1);
    * declared so every signal table resolves through one registry. */
  private val logsV1 = VersionDef(1, None,
    fields = Schemas.logs.fields.map(f => FieldDef(f.name, f.dataType)))

  private val gaugeV1 = VersionDef(1, None,
    fields = Schemas.metricsGauge.fields.map(f => FieldDef(f.name, f.dataType)))

  val registry: Map[String, Seq[VersionDef]] = Map(
    "traces" -> Seq(tracesV1, tracesV2),
    "logs" -> Seq(logsV1),
    "metrics_gauge" -> Seq(gaugeV1))

  def currentVersion(table: String): Int = registry(table).map(_.version).max

  private def versionDef(table: String, v: Int): VersionDef =
    registry(table).find(_.version == v)
      .getOrElse(throw new IllegalArgumentException(s"$table has no version v$v"))

  /** effective field list of (table, version), inheritance applied. */
  def fieldsOf(table: String, version: Int): Seq[FieldDef] = {
    val d = versionDef(table, version)
    val base = d.inherits.map(fieldsOf(table, _)).getOrElse(Nil)
    val renamed = base.map { f =>
      d.renames.find(_.from == f.name) match {
        case Some(r) => f.copy(name = r.to)
        case None    => f
      }
    }
    renamed ++ d.fields ++ d.computed.map { case (n, t, _) => FieldDef(n, t) }
  }

  def schemaOf(table: String, version: Int): StructType =
    StructType(fieldsOf(table, version).map(f =>
      StructField(f.name, f.dataType, nullable = !f.required)))

  /** rename chain from v1 up to `version` (old name → new name, in
    * application order). */
  private def renameChain(table: String, version: Int): Seq[Rename] = {
    val d = versionDef(table, version)
    d.inherits.map(renameChain(table, _)).getOrElse(Nil) ++ d.renames
  }

  private def computedChain(table: String, version: Int): Seq[(String, DataType, Column)] = {
    val d = versionDef(table, version)
    d.inherits.map(computedChain(table, _)).getOrElse(Nil) ++ d.computed
  }

  /** physically upgrade a frame written under `fromVersion` to the current
    * schema — the compaction-rewrite path (column renames + computed
    * fields materialized). Pure projection: no shuffle. */
  def upgrade(df: DataFrame, table: String, fromVersion: Int): DataFrame = {
    val cur = currentVersion(table)
    var out = df
    ((fromVersion + 1) to cur).foreach { v =>
      val d = versionDef(table, v)
      d.renames.foreach(r => out = out.withColumnRenamed(r.from, r.to))
      d.computed.foreach { case (n, t, e) =>
        out = out.withColumn(n, e.cast(t))
      }
    }
    out
  }

  /** read a table directory whose files may be written under ANY version,
    * resolved to the CURRENT schema. mergeSchema unions the physical
    * columns across vintages; renamed pairs coalesce (new wins — exactly
    * one side is non-null per row); computed columns derive when a row
    * predates them. Column order = current schema order. */
  def resolveRead(spark: SparkSession, path: String, table: String): DataFrame = {
    val cur = currentVersion(table)
    var df = spark.read.option("mergeSchema", "true").parquet(path)
    val have = df.columns.toSet
    renameChain(table, cur).foreach { r =>
      df = (have.contains(r.from), have.contains(r.to)) match {
        case (true, true)  => df.withColumn(r.to, coalesce(col(r.to), col(r.from)))
          .drop(r.from)
        case (true, false) => df.withColumnRenamed(r.from, r.to)
        case _             => df
      }
    }
    computedChain(table, cur).foreach { case (n, t, e) =>
      df =
        if (!df.columns.contains(n)) df.withColumn(n, e.cast(t))
        else df.withColumn(n, coalesce(col(n).cast(t), e.cast(t)))
    }
    val want = fieldsOf(table, cur).map(_.name).filter(df.columns.contains)
    df.select(want.map(col): _*)
  }
}
