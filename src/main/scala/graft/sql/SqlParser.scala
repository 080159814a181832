package graft.sql

import scala.util.parsing.combinator.RegexParsers
import graft.sql.Ast._

/**
 * Parser for the graft time-series SQL dialect.
 *
 * Grammar (mirrors the surface of the reference dialect,
 * `nsdb-sql/src/main/scala/io/radicalbit/nsdb/sql/parser/SQLStatementParser.scala:29-47`):
 *
 * {{{
 *   statement  := select | insert | delete | drop
 *   select     := SELECT [DISTINCT] fields FROM metric [WHERE expr]
 *                 [GROUP BY (INTERVAL [n] unit | field)]
 *                 [ORDER BY field [DESC]] [SINCE n unit] [LIMIT n]
 *   fields     := * | (agg(field|*) | field) ("," ...)*
 *   agg        := SUM | MIN | MAX | COUNT | AVG | FIRST | LAST  (COUNT(DISTINCT x) allowed)
 *   expr       := NOT expr | conj (OR expr)?      -- NOT spans the rest unless bracketed
 *   conj       := term (AND conj)?
 *   term       := "(" expr ")" | field IS [NOT] NULL | field IN (v, v)
 *               | field (= | > | >= | < | <=) value | field LIKE wildcard
 *   value      := NOW [± n unit] | double | long | string
 *   unit       := d|day | h|hour | min|minute | s|sec|second   (case-insensitive)
 * }}}
 *
 * Keywords are case-insensitive; identifiers are `[a-zA-Z_][a-zA-Z0-9_]*`;
 * string literals are bare words or single-quoted word sequences; the LIKE
 * wildcard character is `$` (translated to `%` downstream).
 */
class SqlParser extends RegexParsers {

  // keyword: case-insensitive, must end at a word boundary so that e.g. a
  // field named "notes" is not eaten by the NOT keyword
  private def kw(s: String): Parser[String] = ("""(?i)\Q""" + s + """\E\b""").r ^^ (_.toUpperCase)

  private val ident: Parser[String]  = """[a-zA-Z_][a-zA-Z0-9_]*""".r
  private val metricName: Parser[String] = """[a-zA-Z][a-zA-Z0-9_]*""".r
  private val longLit: Parser[Long]  = """-?\d+""".r ^^ (_.toLong)
  private val intLit: Parser[Int]    = """-?\d+""".r ^^ (_.toInt)
  private val doubleLit: Parser[Double] = """-?\d+\.\d+""".r ^^ (_.toDouble)

  // a bare string token may carry the same special chars the reference
  // allows; \p{L}/\p{N} admit unicode letters/digits (charset parity)
  private val wordLit: Parser[String]     = """[\p{L}_][\p{L}\p{N}_\-\.:~!\?]*""".r
  private val wildcardTok: Parser[String] = """[\p{L}\p{N}_\-$\.:~!\?]+""".r

  /** bare word, or single-quoted raw string (any chars except the quote). */
  private val stringLit: Parser[String] =
    "'" ~> """[^']*""".r <~ "'" | wordLit

  private val wildcardLit: Parser[String] =
    "'" ~> """[^']*""".r <~ "'" | wildcardTok

  // ---- time measures -----------------------------------------------------
  // longest alternative first so "day" wins over "d" etc.
  private val timeUnit: Parser[String] =
    (kw("day") | kw("d") | kw("hour") | kw("h") | kw("minute") | kw("min") |
      kw("second") | kw("sec") | kw("s")) ^^ (_.toUpperCase)

  private val relNow: Parser[RelValue] =
    kw("now") ~> opt(("+" | "-") ~ longLit ~ timeUnit) ^^ {
      case Some(sign ~ n ~ u) => RelValue(if (sign == "-") -1 else 1, n * unitMillis(u))
      case None               => RelValue(1, 0L)
    }

  private val compValue: Parser[CompValue] =
    relNow | doubleLit ^^ (d => AbsValue(d)) | longLit ^^ (l => AbsValue(l))

  private val compOrString: Parser[CompValue] =
    compValue | stringLit ^^ (s => AbsValue(s))

  // ---- projection --------------------------------------------------------

  private val aggKeyword: Parser[String => Agg] =
    kw("sum") ^^^ (SumAgg(_)) | kw("min") ^^^ (MinAgg(_)) | kw("max") ^^^ (MaxAgg(_)) |
      kw("count") ^^^ (CountAgg(_)) | kw("first") ^^^ (FirstAgg(_)) |
      kw("last") ^^^ (LastAgg(_)) | kw("avg") ^^^ (AvgAgg(_))

  private val aggField: Parser[ProjField] =
    aggKeyword ~ ("(" ~> opt(kw("distinct")) ~ (ident | "*") <~ ")") >> {
      case mk ~ (Some(_) ~ target) =>
        // DISTINCT inside an aggregation call is count-only
        mk("") match {
          case _: CountAgg =>
            val f = if (target == "*") "value" else target
            success(ProjField(if (target == "*") "*" else target, Some(CountDistinctAgg(f))))
          case _ => err("Distinct clause is only applicable to the count aggregation")
        }
      case mk ~ (None ~ "*")    => success(ProjField("*", Some(mk("value"))))
      case mk ~ (None ~ target) => success(ProjField(target, Some(mk(target))))
    }

  private val plainField: Parser[ProjField] = ident ^^ (n => ProjField(n, None))

  private val projection: Parser[Projection] =
    "*" ^^^ StarProjection |
      rep1sep(aggField | plainField, ",") ^^ (fs => FieldsProjection(fs))

  // ---- predicates --------------------------------------------------------
  // NOT spans the remainder of the expression unless brackets narrow it,
  // matching the reference parser's `Not ~> expression` rule.

  private lazy val expression: Parser[Predicate] =
    kw("not") ~> expression ^^ (NotPred(_)) |
      conjunction ~ opt(kw("or") ~> expression) ^^ {
        case l ~ Some(r) => OrPred(l, r)
        case l ~ None    => l
      }

  private lazy val conjunction: Parser[Predicate] =
    term ~ opt(kw("and") ~> conjunction) ^^ {
      case l ~ Some(r) => AndPred(l, r)
      case l ~ None    => l
    }

  private lazy val term: Parser[Predicate] =
    "(" ~> expression <~ ")" |
      kw("not") ~> expression ^^ (NotPred(_)) |
      ident ~ (kw("is") ~> opt(kw("not")) <~ kw("null")) ^^ {
        case f ~ Some(_) => NotPred(NullPred(f))
        case f ~ None    => NullPred(f)
      } |
      ident ~ (kw("in") ~> "(" ~> compValue) ~ ("," ~> compValue <~ ")") ^^ {
        case f ~ lo ~ hi => RangePred(f, lo, hi)
      } |
      ident ~ (">=" ^^^ Gte | "<=" ^^^ Lte | ">" ^^^ Gt | "<" ^^^ Lt) ~ compValue ^^ {
        case f ~ op ~ v => CmpPred(f, op, v)
      } |
      ident ~ (kw("like") ~> wildcardLit) ^^ { case f ~ p => LikePred(f, p) } |
      ident ~ ("=" ~> compOrString) ^^ { case f ~ v => EqPred(f, v) }

  // ---- clauses -----------------------------------------------------------

  private val whereClause: Parser[Predicate] = kw("where") ~> expression

  private val groupByClause: Parser[GroupBy] =
    kw("group by") ~> (
      kw("interval") ~> opt(longLit) ~ timeUnit ^^ {
        case q ~ u =>
          val n = q.getOrElse(1L)
          IntervalGroupBy(n * unitMillis(u), n, u)
      } |
        ident ^^ (TagGroupBy(_))
    )

  private val orderClause: Parser[OrderBy] =
    kw("order by") ~> ident ~ opt(kw("desc")) ^^ { case f ~ d => OrderBy(f, d.isDefined) }

  private val limitClause: Parser[Int]   = kw("limit") ~> intLit
  private val graceClause: Parser[Grace] = kw("since") ~> longLit ~ timeUnit ^^ {
    case n ~ u => Grace(n, u)
  }

  // ---- statements --------------------------------------------------------

  private def selectStmt(db: String, ns: String): Parser[SelectStatement] =
    kw("select") ~> opt(kw("distinct")) ~ projection ~ (kw("from") ~> metricName) ~
      opt(whereClause) ~ opt(groupByClause) ~ opt(orderClause) ~ opt(graceClause) ~
      opt(limitClause) ^^ {
      case d ~ proj ~ m ~ w ~ g ~ o ~ gr ~ l =>
        SelectStatement(db, ns, m, d.isDefined, proj, w, g, o, gr, l)
    }

  private val assignment: Parser[(String, Any)] =
    ident ~ ("=" ~> (doubleLit ^^ (x => x: Any) | longLit ^^ (x => x: Any) | stringLit ^^ (x => x: Any))) ^^ {
      case k ~ v => k -> v
    }

  private val assignments: Parser[Map[String, Any]] =
    "(" ~> rep1sep(assignment, ",") <~ ")" ^^ (_.toMap)

  private def insertStmt(db: String, ns: String): Parser[InsertStatement] =
    (kw("insert into") ~> metricName) ~ opt(kw("ts") ~> "=" ~> longLit) ~
      opt(kw("dim") ~> assignments) ~ opt(kw("tags") ~> assignments) ~
      (kw("val") ~> "=" ~> (doubleLit ^^ (x => x: Any) | longLit ^^ (x => x: Any))) ^^ {
      case m ~ ts ~ dims ~ tags ~ v =>
        InsertStatement(db, ns, m, ts, dims.getOrElse(Map.empty), tags.getOrElse(Map.empty), v)
    }

  private def deleteStmt(db: String, ns: String): Parser[DeleteStatement] =
    kw("delete") ~> kw("from") ~> metricName ~ whereClause ^^ {
      case m ~ w => DeleteStatement(db, ns, m, w)
    }

  private def dropStmt(db: String, ns: String): Parser[DropStatement] =
    kw("drop metric") ~> metricName ^^ (DropStatement(db, ns, _))

  private def statement(db: String, ns: String): Parser[Statement] =
    selectStmt(db, ns) | insertStmt(db, ns) | deleteStmt(db, ns) | dropStmt(db, ns)

  /** Parse one statement; returns Left(message) on failure. */
  def parse(db: String, namespace: String, input: String): Either[String, Statement] =
    parseAll(statement(db, namespace), input.trim.stripSuffix(";")) match {
      case Success(st, _) => Right(st)
      case NoSuccess(msg, next) =>
        Left(s"statement not valid: $msg at position ${next.pos.column}")
      case other => Left(s"statement not valid: $other")
    }
}

object SqlParser {
  private val instance = new SqlParser
  def parse(db: String, namespace: String, input: String): Either[String, Ast.Statement] =
    instance.parse(db, namespace, input)
}
