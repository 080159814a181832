package graft.security

/**
 * Outcome of one authorization check: `success`, or a deny with the
 * provider's reason (surfaced verbatim in the 403 body / WS error message).
 */
final case class AuthResult(success: Boolean, failReason: String = "") {
  def isDenied: Boolean = !success
}

object AuthResult {
  val Allowed: AuthResult              = AuthResult(success = true)
  def denied(reason: String): AuthResult = AuthResult(success = false, reason)
}

/**
 * Pluggable authorization seam for the serving layer — the reference's
 * `nsdb-security/.../NSDbAuthorizationProvider.java:26-119` contract,
 * Scala-shaped: a provider extracts an opaque security payload from the
 * transport (HTTP headers, WS subprotocols) and rules on requests at
 * three scopes (db / namespace / metric), each with a read-or-write flag.
 *
 * Wiring mirrors the reference's route directives
 * (`nsdb-http/.../NSDbHttpSecurityDirective.scala:45-104`): a denied check
 * short-circuits the route with `403 {"error":"not authorized <reason>"}`
 * before any parsing/planning side effects; on the WS transport — where a
 * 403 can't follow the upgrade — a denied register answers with the same
 * reason as an error message and no subscription, the reference's
 * `SubscriptionByQueryStringFailed` shape (`WsResources.scala:89-101`).
 *
 * The default is [[GraftAuthProvider.AllowAll]] (the reference's
 * `EmptyNSDbAuthorizationProvider`): every check passes and the serving
 * surface behaves exactly as without the seam.
 */
trait GraftAuthProvider {

  /**
   * Distill the security payload (token, cookie, whatever the provider
   * understands) from raw HTTP headers. Keys are lower-cased header names;
   * multi-valued headers keep their first value.
   */
  def extractHttpSecurityPayload(rawHeaders: Map[String, String]): String

  /**
   * Distill the security payload from the WS handshake's offered
   * subprotocols (`Sec-WebSocket-Protocol`) — the only client-controlled
   * channel the browser WebSocket API exposes, hence the reference's
   * token-in-subprotocol convention.
   */
  def extractWsSecurityPayload(subProtocols: Seq[String]): String

  /** May `payload` act on database `db`? */
  def checkDbAuth(db: String, payload: String, writePermission: Boolean): AuthResult

  /** May `payload` act on `db.namespace`? */
  def checkNamespaceAuth(db: String, namespace: String, payload: String, writePermission: Boolean): AuthResult

  /** May `payload` act on `db.namespace.metric`? */
  def checkMetricAuth(db: String, namespace: String, metric: String, payload: String, writePermission: Boolean): AuthResult
}

object GraftAuthProvider {

  /** Allow-everything default — the seam disappears at zero cost. */
  object AllowAll extends GraftAuthProvider {
    def extractHttpSecurityPayload(rawHeaders: Map[String, String]): String = ""
    def extractWsSecurityPayload(subProtocols: Seq[String]): String         = ""
    def checkDbAuth(db: String, payload: String, writePermission: Boolean): AuthResult =
      AuthResult.Allowed
    def checkNamespaceAuth(db: String, namespace: String, payload: String, writePermission: Boolean): AuthResult =
      AuthResult.Allowed
    def checkMetricAuth(db: String, namespace: String, metric: String, payload: String, writePermission: Boolean): AuthResult =
      AuthResult.Allowed
  }
}
