package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** Credential primitives: PKCE pinned to the RFC 7636 Appendix B vector,
  * PHC password round trips, token prefixes, cookie extraction (incl.
  * the legacy-payload rejection the reference tests, session.rs:53). */
class AuthTokensSpec extends AnyFunSuite {

  test("PKCE S256 matches the RFC 7636 Appendix B vector") {
    val verifier = "dBjftJeZ4CVP-mB92K27uhbUJU1p1r_wW1gFWFOEjXk"
    val challenge = "E9Melhoa2OwvFrEMTJguCHaoeK1t8URWbuGJSstw-cM"
    assert(AuthTokens.verifyPkceS256(verifier, challenge))
    assert(!AuthTokens.verifyPkceS256(verifier + "x", challenge))
    assert(!AuthTokens.verifyPkceS256(verifier, challenge.toLowerCase))
  }

  test("password hashing: PHC round trip, mismatch, malformed hash") {
    val phc = AuthTokens.hashPassword("correct horse battery staple")
    assert(phc.startsWith("$pbkdf2-sha256$i="))
    assert(AuthTokens.verifyPassword("correct horse battery staple", phc))
    assert(!AuthTokens.verifyPassword("wrong", phc))
    // two hashes of the same password differ (fresh salt) but both verify
    val phc2 = AuthTokens.hashPassword("correct horse battery staple")
    assert(phc2 != phc &&
      AuthTokens.verifyPassword("correct horse battery staple", phc2))
    // corruption is a non-match, never a grant or an exception
    assert(!AuthTokens.verifyPassword("x", "not-a-phc-string"))
    assert(!AuthTokens.verifyPassword("x", "$pbkdf2-sha256$i=abc$AA$BB"))
    assert(!AuthTokens.verifyPassword("x", "$argon2id$v=19$m=19456$s$h"))
  }

  test("token generation: prefixes, entropy, sha256 lookup hash") {
    val s = AuthTokens.generateSessionToken()
    assert(s.startsWith("sdbs_") && s.length > 40)
    assert(AuthTokens.generateAccessToken().startsWith("sdb_at_"))
    assert(AuthTokens.generateRefreshToken().startsWith("sdb_rt_"))
    assert(AuthTokens.generateAuthCode().startsWith("sdb_ac_"))
    assert(AuthTokens.generateSessionToken() != s, "tokens must not repeat")
    // sha256 known answer ("abc")
    assert(AuthTokens.hashToken("abc") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("session cookie extraction finds the token among others; legacy rejected") {
    val tok = AuthTokens.generateSessionToken()
    assert(AuthTokens.sessionTokenFromCookies(
      Seq(s"theme=dark; signaldb_session=$tok; other=1")).contains(tok))
    assert(AuthTokens.sessionTokenFromCookies(Seq.empty).isEmpty)
    // a legacy base64 cookie payload has no sdbs_ prefix → rejected
    assert(AuthTokens.sessionTokenFromCookies(
      Seq("signaldb_session=eyJhcGlfa2V5IjoibGVnYWN5In0")).isEmpty)
  }
}
