package graft.api

import java.nio.charset.StandardCharsets
import java.security.{MessageDigest, SecureRandom}
import java.util.Base64

/** Credential primitives for the human-auth surface (reference
  * `src/common/src/auth/{password,session,oauth}.rs`):
  *
  *  - PASSWORDS are stored as PHC-format KDF strings and verified
  *    constant-time. The reference hashes with Argon2id; no Argon2
  *    implementation ships in this container, so the KDF here is
  *    PBKDF2-HMAC-SHA256 (the JDK's standard KDF, RFC 8018/2898) with
  *    the OWASP-recommended 600k iterations — the PHC envelope
  *    (`$pbkdf2-sha256$i=N$salt$hash`) keeps the storage shape and the
  *    plaintext-never-stored contract identical.
  *  - SESSION TOKENS are opaque `sdbs_` + 32 bytes of OS randomness
  *    (base64url, no padding); only their SHA-256 hex digest is stored
  *    (password.rs:37,:99-:117).
  *  - OAUTH values (access/refresh/code) are the same construction with
  *    the `sdb_at_`/`sdb_rt_`/`sdb_ac_` prefixes (auth/oauth.rs:22-26),
  *    hashed the same way.
  *  - PKCE S256 (RFC 7636): challenge == BASE64URL-NOPAD(SHA256(verifier)).
  */
object AuthTokens {

  val SessionTokenPrefix = "sdbs_"
  val AccessTokenPrefix = "sdb_at_"
  val RefreshTokenPrefix = "sdb_rt_"
  val AuthCodePrefix = "sdb_ac_"

  /** Name of the session cookie set by `POST /ui/session`
    * (session.rs:12). */
  val SessionCookie = "signaldb_session"

  private val rng = new SecureRandom()
  private val b64url = Base64.getUrlEncoder.withoutPadding()

  private def randomToken(prefix: String): String = {
    val bytes = new Array[Byte](32)
    rng.synchronized(rng.nextBytes(bytes))
    prefix + b64url.encodeToString(bytes)
  }

  def generateSessionToken(): String = randomToken(SessionTokenPrefix)
  def generateAccessToken(): String = randomToken(AccessTokenPrefix)
  def generateRefreshToken(): String = randomToken(RefreshTokenPrefix)
  def generateAuthCode(): String = randomToken(AuthCodePrefix)

  /** SHA-256 lowercase hex — deterministic, so a presented value is
    * looked up by hashing it (same shape for sessions and OAuth values). */
  def hashToken(token: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(token.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Extract the session token from a Cookie header value; the prefix
    * requirement deliberately rejects any legacy cookie payload
    * (session.rs:18-33). */
  def sessionTokenFromCookies(cookieHeaders: Seq[String]): Option[String] = {
    cookieHeaders.iterator.flatMap(_.split(';').iterator).flatMap { pair =>
      pair.split("=", 2) match {
        case Array(name, value)
          if name.trim == SessionCookie &&
            value.trim.startsWith(SessionTokenPrefix) =>
          Some(value.trim)
        case _ => None
      }
    }.nextOption()
  }

  // ---- passwords ------------------------------------------------------

  private val PbkdfIterations = 600000
  private val PbkdfKeyLen = 32 * 8

  private def pbkdf2(password: String, salt: Array[Byte],
      iterations: Int): Array[Byte] = {
    val spec = new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, salt, iterations, PbkdfKeyLen)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  /** PHC-format hash for storage: the plaintext never persists
    * (password.rs:63 — Argon2id there, PBKDF2-HMAC-SHA256 here; see the
    * object doc for why). */
  def hashPassword(password: String): String = {
    val salt = new Array[Byte](16)
    rng.synchronized(rng.nextBytes(salt))
    val hash = pbkdf2(password, salt, PbkdfIterations)
    s"$$pbkdf2-sha256$$i=$PbkdfIterations$$" +
      s"${b64url.encodeToString(salt)}$$${b64url.encodeToString(hash)}"
  }

  /** Verify against a stored PHC string. Returns false on mismatch; a
    * malformed hash is also a non-match (the caller treats stored-state
    * corruption as failed auth, never as a grant). Constant-time
    * comparison on the derived key. */
  def verifyPassword(password: String, phc: String): Boolean = {
    val parts = phc.split('$')
    // "", "pbkdf2-sha256", "i=N", salt, hash
    if (parts.length != 5 || parts(1) != "pbkdf2-sha256" ||
        !parts(2).startsWith("i=")) return false
    try {
      val iters = parts(2).stripPrefix("i=").toInt
      val salt = Base64.getUrlDecoder.decode(parts(3))
      val expect = Base64.getUrlDecoder.decode(parts(4))
      MessageDigest.isEqual(pbkdf2(password, salt, iters), expect)
    } catch { case _: IllegalArgumentException | _: NumberFormatException =>
      false }
  }

  // ---- PKCE -----------------------------------------------------------

  /** RFC 7636 S256: BASE64URL-NOPAD(SHA256(verifier)) == challenge. */
  def verifyPkceS256(verifier: String, challenge: String): Boolean = {
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(verifier.getBytes(StandardCharsets.US_ASCII))
    b64url.encodeToString(digest) == challenge
  }
}
