package graft.sql

import scala.util.parsing.combinator.RegexParsers

import graft.sql.Ast._

/**
 * Metadata command parser: `SHOW DATABASES | SHOW NAMESPACES | USE <ns> |
 * SHOW METRICS | DESCRIBE <metric>` (reference surface:
 * `nsdb-sql/.../CommandStatementParser.scala:42-77`).
 */
object CommandParser extends RegexParsers {
  private def kw(s: String): Parser[String] = ("""(?i)\Q""" + s + """\E\b""").r ^^ (_.toUpperCase)
  private val ident: Parser[String]         = """[a-zA-Z_][a-zA-Z0-9_]*""".r

  private val command: Parser[Command] =
    kw("show databases") ^^^ ShowDatabases |
      kw("show namespaces") ^^^ ShowNamespaces |
      kw("show metrics") ^^^ ShowMetrics |
      kw("use") ~> ident ^^ (UseNamespace(_)) |
      (kw("describe") | kw("desc")) ~> ident ^^ (DescribeMetric(_)) |
      kw("explain") ~> """.+""".r ^^ (q => Explain(q.trim)) |
      // pipeline commands (beyond the reference surface): the curation
      // library reachable from the dialect, not only from Scala
      kw("dedup exact on") ~> ident ^^ (DedupExact(_)) |
      kw("audit profile on") ~> ident ^^ (AuditProfile(_))

  def parse(input: String): Either[String, Command] =
    parseAll(command, input.trim.stripSuffix(";")) match {
      case Success(c, _)        => Right(c)
      case NoSuccess(msg, next) => Left(s"command not valid: $msg at ${next.pos.column}")
      case other                => Left(s"command not valid: $other")
    }
}
