package graft.streaming

/**
 * C1: the control plane's auth filter (reference app/app.py:31-52 — a
 * Flask decorator checking the `x-api-key` header against an
 * environment secret), re-expressed as a pure guard any HTTP layer can
 * wrap around the [[JobControl]] verbs.
 *
 * Reference semantics preserved exactly:
 *  - header absent        → 401 "Must provide x-api-key:token"
 *  - header ≠ secret      → 401 "Invalid API KEY"
 *  - header = secret      → run the action, return its result
 * Plus two hardenings the reference lacked: header-name lookup is
 * case-insensitive (HTTP header names are), and the key comparison is
 * constant-time (`MessageDigest.isEqual`) so the filter doesn't leak
 * prefix-match timing.
 */
object Auth {

  sealed trait AuthResult[+A] { def status: Int }
  final case class Authorized[A](value: A) extends AuthResult[A] {
    def status: Int = 200
  }
  final case class Rejected(message: String) extends AuthResult[Nothing] {
    def status: Int = 401
  }

  val HeaderName = "x-api-key"
  val MissingMsg = "Must provide x-api-key:token"
  val InvalidMsg = "Invalid API KEY"

  private def constantTimeEq(a: String, b: String): Boolean =
    java.security.MessageDigest.isEqual(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  /** Run `action` iff the request headers carry the expected api key;
    * `action` is by-name and never evaluated on rejection. */
  def authorize[A](headers: Map[String, String], expectedKey: String)(
      action: => A): AuthResult[A] =
    headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase(HeaderName) => v
    } match {
      case None                                    => Rejected(MissingMsg)
      case Some(k) if constantTimeEq(k, expectedKey) => Authorized(action)
      case Some(_)                                 => Rejected(InvalidMsg)
    }
}
