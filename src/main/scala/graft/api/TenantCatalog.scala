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
    adminKeyHashes: Set[String] = Set.empty,
    /** durable catalog state: a JSON snapshot rewritten ATOMICALLY
      * (temp + move) after every mutation and replayed on construction,
      * so tenants/datasets/keys minted over the wire survive a restart
      * — the reference keeps this state in its catalog DATABASE;
      * config-backed keys stay config and are never written here.
      * None = in-memory (test shells, ephemeral serving). */
    persistPath: Option[java.nio.file.Path] = None) {

  import TenantCatalog._

  private val tenants = mutable.LinkedHashMap.empty[String, Tenant]
  private val keysById = mutable.LinkedHashMap.empty[String, ApiKey]
  /** per-tenant datasets in creation order: name → id. */
  private val datasetsByTenant =
    mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, String]]

  loadPersisted()

  private def newId(): String =
    java.util.UUID.randomUUID().toString.replace("-", "")

  // ---- durability ---------------------------------------------------

  private def loadPersisted(): Unit = persistPath.foreach { p =>
    if (java.nio.file.Files.isRegularFile(p)) {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readAllBytes(p))
      def arr(f: String) = {
        val n = root.get(f)
        if (n == null || !n.isArray) Seq.empty
        else (0 until n.size()).map(n.get)
      }
      def opt(n: com.fasterxml.jackson.databind.JsonNode, f: String) =
        Option(n.get(f)).filterNot(_.isNull).map(_.asText)
      arr("tenants").foreach { t =>
        tenants.put(t.get("id").asText,
          Tenant(t.get("id").asText, t.get("name").asText,
            opt(t, "default_dataset")))
      }
      arr("datasets").foreach { d =>
        datasetsByTenant.getOrElseUpdate(d.get("tenant").asText,
          mutable.LinkedHashMap.empty)
          .put(d.get("name").asText, d.get("id").asText)
      }
      arr("keys").foreach { k =>
        val scopes = Option(k.get("scopes")).filterNot(_.isNull).map(a =>
          (0 until a.size()).map(a.get(_).asText))
        keysById.put(k.get("id").asText,
          ApiKey(k.get("id").asText, k.get("tenant").asText,
            k.get("hash").asText, opt(k, "name"), opt(k, "dataset_id"),
            scopes, k.get("revoked").asBoolean))
      }
    }
  }

  /** serialize-then-atomic-move, called with the lock held: a crash
    * leaves either the previous snapshot or the new one, never a torn
    * file. */
  private def persist(): Unit = persistPath.foreach { p =>
    def js(s: String) = ApiJson.jstr(s)
    def jo(s: Option[String]) = s.map(js).getOrElse("null")
    val ts = tenants.values.map(t =>
      s"""{"id":${js(t.id)},"name":${js(t.name)},""" +
        s""""default_dataset":${jo(t.defaultDataset)}}""")
    val ds = datasetsByTenant.flatMap { case (tn, m) =>
      m.map { case (name, id) =>
        s"""{"tenant":${js(tn)},"name":${js(name)},"id":${js(id)}}"""
      }
    }
    val ks = keysById.values.map(k =>
      s"""{"id":${js(k.id)},"tenant":${js(k.tenantId)},""" +
        s""""hash":${js(k.hash)},"name":${jo(k.name)},""" +
        s""""dataset_id":${jo(k.datasetId)},""" +
        s""""scopes":${k.scopes.map(_.map(js).mkString("[", ",", "]"))
          .getOrElse("null")},"revoked":${k.revoked}}""")
    val body = s"""{"tenants":[${ts.mkString(",")}],""" +
      s""""datasets":[${ds.mkString(",")}],"keys":[${ks.mkString(",")}]}"""
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

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
        persist()
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
    else { val id = newId(); ds.put(name, id); persist(); Right(id) }
  }

  def deleteDataset(tenant: String,
      name: String): Either[(Int, String), Unit] = synchronized {
    if (tenants.get(tenant).exists(_.defaultDataset.contains(name)))
      Left(409 -> "The default dataset cannot be deleted")
    else datasetsByTenant.get(tenant) match {
      case Some(ds) if ds.contains(name) =>
        ds.remove(name); persist(); Right(())
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
      persist()
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
    persist()
  }

  // ---- OAuth dynamic clients (RFC 7591; reference catalog
  // register_oauth_client) -------------------------------------------

  private val oauthClients = mutable.LinkedHashMap.empty[String, OAuthClient]

  /** `/oauth/register` is PUBLIC by spec, so registration is the one
    * unauthenticated write surface — cap how many clients an anonymous
    * caller can persist (each registration lands on disk on ingest
    * shells; unbounded growth is a trivial disk/memory DoS). */
  val MaxOAuthClients = 128

  def registerOAuthClient(name: Option[String], redirectUris: Seq[String],
      grantTypes: Option[Seq[String]],
      scope: Option[String]): Either[(Int, String), OAuthClient] =
    synchronized {
      if (oauthClients.size >= MaxOAuthClients)
        Left(429 -> s"client registry is full ($MaxOAuthClients clients)")
      else {
        val c = OAuthClient(newId(), name, redirectUris, grantTypes, scope)
        oauthClients.put(c.id, c)
        persistOAuth()
        Right(c)
      }
    }

  def getOAuthClient(id: String): Option[OAuthClient] =
    synchronized(oauthClients.get(id))

  /** OAuth clients persist beside the tenant state (same snapshot
    * discipline, separate file so the two surfaces stay independently
    * greppable). */
  private def persistOAuth(): Unit = persistPath.foreach { p =>
    def js(s: String) = ApiJson.jstr(s)
    val cs = oauthClients.values.map { c =>
      s"""{"id":${js(c.id)},"name":${c.name.map(js).getOrElse("null")},""" +
        s""""redirect_uris":${c.redirectUris.map(js).mkString("[", ",", "]")},""" +
        s""""grant_types":${c.grantTypes.map(_.map(js).mkString("[", ",", "]"))
          .getOrElse("null")},""" +
        s""""scope":${c.scope.map(js).getOrElse("null")}}"""
    }
    val f = p.resolveSibling("oauth_clients.json")
    Option(f.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val tmp = f.resolveSibling(f.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp,
      s"""{"clients":[${cs.mkString(",")}]}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, f,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def loadOAuth(): Unit = persistPath.foreach { p =>
    val f = p.resolveSibling("oauth_clients.json")
    if (java.nio.file.Files.isRegularFile(f)) {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readAllBytes(f))
      val n = root.get("clients")
      if (n != null && n.isArray) (0 until n.size()).map(n.get).foreach { c =>
        def strs(f2: String) = Option(c.get(f2)).filterNot(_.isNull).map(a =>
          (0 until a.size()).map(a.get(_).asText))
        oauthClients.put(c.get("id").asText, OAuthClient(
          c.get("id").asText,
          Option(c.get("name")).filterNot(_.isNull).map(_.asText),
          strs("redirect_uris").getOrElse(Seq.empty),
          strs("grant_types"),
          Option(c.get("scope")).filterNot(_.isNull).map(_.asText)))
      }
    }
  }
  loadOAuth()
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

  /** An RFC 7591 dynamically-registered PUBLIC client (PKCE, no
    * secret; `token_endpoint_auth_method` is always "none" —
    * oauth.rs:266). */
  final case class OAuthClient(id: String, name: Option[String],
      redirectUris: Seq[String], grantTypes: Option[Seq[String]],
      scope: Option[String])

  /** The per-signal read scopes the OAuth surface grants
    * (auth/mod.rs:22 READ_SCOPES). */
  val ReadScopes: Seq[String] =
    Seq("metrics:read", "logs:read", "traces:read", "profiles:read")

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
