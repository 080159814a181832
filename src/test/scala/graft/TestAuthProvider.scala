package graft

import graft.security.{AuthResult, GraftAuthProvider}

/**
 * Token provider for serving-layer auth specs: the payload is the
 * `x-auth-token` header (HTTP) or the first offered subprotocol (WS);
 * `secret_*`-named dbs/namespaces/metrics demand the token `"token"`,
 * everything else is open — so the same spec exercises allow, deny and
 * allow-with-credentials per scope.
 */
class TestAuthProvider extends GraftAuthProvider {
  def extractHttpSecurityPayload(rawHeaders: Map[String, String]): String =
    rawHeaders.getOrElse("x-auth-token", "")
  def extractWsSecurityPayload(subProtocols: Seq[String]): String =
    subProtocols.headOption.getOrElse("")
  private def check(scope: String, name: String, payload: String): AuthResult =
    if (!name.startsWith("secret_") || payload == "token") AuthResult.Allowed
    else AuthResult.denied(s"$scope $name requires a token")
  def checkDbAuth(db: String, payload: String, writePermission: Boolean): AuthResult =
    check("db", db, payload)
  def checkNamespaceAuth(db: String, namespace: String, payload: String, writePermission: Boolean): AuthResult =
    check("db", db, payload) match {
      case r if r.isDenied => r
      case _               => check("namespace", namespace, payload)
    }
  def checkMetricAuth(db: String, namespace: String, metric: String, payload: String, writePermission: Boolean): AuthResult =
    checkNamespaceAuth(db, namespace, payload, writePermission) match {
      case r if r.isDenied => r
      case _               => check("metric", metric, payload)
    }
}
