package graft.api

import scala.collection.mutable

/** The tenant/dataset/API-key catalog behind the management surface
  * (reference `src/common/src/catalog/` — there a SQL database reached
  * through sqlx; here an in-process, synchronized store, because the
  * driver scopes external databases out and the catalog is control-plane
  * METADATA, not data: the data path stays on the Storage layout).
  *
  * Two provenances, mirroring the reference's precedence rules
  * (`authenticator.rs` checks config tenants first, then the database):
  *  - CONFIG-backed keys/tenants: the immutable constructor map — these
  *    authenticate but are not listed, cannot be revoked, and their
  *    tenant ids are reserved (creating one again answers 409, exactly
  *    management.rs:141 "A configuration-backed tenant already uses
  *    this ID").
  *  - CATALOG-backed tenants/datasets/keys: created over the wire via
  *    `/api/v1/manage/...`; keys store only their sha256 hash
  *    (management.rs:497 hashes before upsert; the raw secret appears
  *    exactly once, in the 201 body).
  *
  * All raw key material is hashed with [[HttpShell.hashApiKey]] before
  * it reaches this class.
  */
final class TenantCatalog(
    /** sha256-hex-of-key → owning tenant (config-backed, unscoped). */
    configKeys: Map[String, String],
    /** sha256 hashes of INSTANCE-ADMIN keys (the `is_instance_admin`
      * principal of management.rs:117 — may create tenants and manage
      * any tenant). */
    adminKeyHashes: Set[String] = Set.empty) {

  import TenantCatalog._

  private val tenants = mutable.LinkedHashMap.empty[String, Tenant]
  private val keysById = mutable.LinkedHashMap.empty[String, ApiKey]
  /** per-tenant datasets in creation order: name → id. */
  private val datasetsByTenant =
    mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, String]]

  private def newId(): String =
    java.util.UUID.randomUUID().toString.replace("-", "")

  /** Resolve a presented key hash to its principal: admin keys first,
    * then config keys (legacy unscoped), then live catalog keys —
    * a revoked key does not authenticate at all (401, not 403). */
  def resolve(hash: String): Option[Principal] = synchronized {
    if (adminKeyHashes.contains(hash))
      Some(Principal(tenant = None, scopes = None, datasetId = None,
        isAdmin = true))
    else configKeys.get(hash) match {
      case Some(t) =>
        Some(Principal(Some(t), scopes = None, datasetId = None,
          isAdmin = false))
      case None =>
        keysById.values.find(k => k.hash == hash && !k.revoked).map(k =>
          Principal(Some(k.tenantId), k.scopes, k.datasetId, isAdmin = false))
    }
  }

  def configTenantIds: Set[String] = configKeys.values.toSet

  def getTenant(id: String): Option[Tenant] =
    synchronized(tenants.get(id))

  /** management.rs create_tenant body semantics (validation at the
    * endpoint layer; this is the catalog's uniqueness + transactional
    * default-dataset step). */
  def createTenant(id: String, name: String,
      defaultDataset: Option[String]): Either[(Int, String), String] =
    synchronized {
      if (configKeys.values.exists(_ == id))
        Left(409 -> "A configuration-backed tenant already uses this ID")
      else if (tenants.contains(id))
        Left(409 -> "Tenant already exists")
      else {
        // tenant row and default dataset land atomically (we hold the
        // lock), the management.rs:154 comment's invariant: a tenant
        // whose default dataset has no row would fail closed
        tenants.put(id, Tenant(id, name, defaultDataset))
        defaultDataset.foreach { d =>
          datasetsByTenant.getOrElseUpdate(id,
            mutable.LinkedHashMap.empty).put(d, newId())
        }
        Right(id)
      }
    }

  def listDatasets(tenant: String): Seq[(String, String)] = synchronized {
    datasetsByTenant.get(tenant).map(_.toSeq.map {
      case (name, id) => (id, name)
    }).getOrElse(Seq.empty)
  }

  def createDataset(tenant: String,
      name: String): Either[(Int, String), String] = synchronized {
    val ds = datasetsByTenant.getOrElseUpdate(tenant,
      mutable.LinkedHashMap.empty)
    if (ds.contains(name)) Left(409 -> "Unable to create dataset")
    else { val id = newId(); ds.put(name, id); Right(id) }
  }

  def deleteDataset(tenant: String,
      name: String): Either[(Int, String), Unit] = synchronized {
    if (tenants.get(tenant).exists(_.defaultDataset.contains(name)))
      Left(409 -> "The default dataset cannot be deleted")
    else datasetsByTenant.get(tenant) match {
      case Some(ds) if ds.contains(name) => ds.remove(name); Right(())
      case _ => Left(404 -> "Dataset not found")
    }
  }

  def datasetExists(tenant: String, name: String): Boolean = synchronized {
    datasetsByTenant.get(tenant).exists(_.contains(name))
  }

  /** Mint a scoped key: returns (key id, RAW secret) — the only moment
    * the secret exists server-side; storage keeps the hash. */
  def createApiKey(tenant: String, name: Option[String],
      datasetId: Option[String], scopes: Seq[String]): (String, String) =
    synchronized {
      val secret = "sdbk_" + newId()
      val id = newId()
      keysById.put(id, ApiKey(id, tenant, HttpShell.hashApiKey(secret),
        name, datasetId, Some(scopes), revoked = false))
      (id, secret)
    }

  def listApiKeys(tenant: String): Seq[ApiKey] = synchronized {
    keysById.values.filter(_.tenantId == tenant).toSeq
  }

  def getApiKey(id: String): Option[ApiKey] =
    synchronized(keysById.get(id))

  /** Revocation is a tombstone, not a delete — the key stays listable
    * as revoked (management.rs revoke sets revoked_at). */
  def revokeApiKey(id: String): Unit = synchronized {
    keysById.get(id).foreach(k => keysById.put(id, k.copy(revoked = true)))
  }
}

object TenantCatalog {
  /** The four ingestion scopes a managed key may carry
    * (management.rs:19 INGEST_SCOPES). */
  val IngestScopes: Set[String] =
    Set("metrics:write", "logs:write", "traces:write", "profiles:write")

  /** What a resolved credential may do. `tenant=None` only for
    * instance-admin keys (they act on the tenant named in the path /
    * header). `scopes=None` = legacy unrestricted key (auth/mod.rs
    * can_ingest/can_read: absent scopes allow everything; present
    * scopes must contain the exact `<signal>:read|write`). */
  final case class Principal(tenant: Option[String],
      scopes: Option[Seq[String]], datasetId: Option[String],
      isAdmin: Boolean) {
    def canIngest(signal: String): Boolean =
      scopes.forall(_.contains(s"$signal:write"))
    def canRead(signal: String): Boolean =
      scopes.forall(_.contains(s"$signal:read"))
  }

  final case class Tenant(id: String, name: String,
      defaultDataset: Option[String])

  final case class ApiKey(id: String, tenantId: String, hash: String,
      name: Option[String], datasetId: Option[String],
      scopes: Option[Seq[String]], revoked: Boolean)

  /** Reference `validation.rs validate_id`: trim, non-empty, ≤64 chars,
    * ASCII alphanumerics plus `-`/`_` only (the charset rules out path
    * traversal and injection by construction). Returns the trimmed id
    * or the reference's error message. */
  def validateId(raw: String): Either[String, String] = {
    val t = raw.trim
    if (t.isEmpty) Left("ID cannot be empty")
    else if (t.length > 64)
      Left(s"ID exceeds maximum length (${t.length} > 64)")
    else {
      val bad = t.filterNot(c =>
        (c < 128 && c.isLetterOrDigit) || c == '-' || c == '_').distinct
      if (bad.nonEmpty) Left(s"ID contains invalid characters: '$bad'")
      else Right(t)
    }
  }
}
