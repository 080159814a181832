package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.sql.Ast._
import graft.sql.SqlParser

/** Property tests: render a random statement AST to dialect text, parse it
  * back, require the identical AST (round-trip totality of the grammar). */
object ParserPropertySpec extends Properties("SqlParser") {

  private val identGen: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
  } yield (h :: t).mkString.toLowerCase match {
    // avoid words the grammar reserves in predicate/order positions
    case kw @ ("not" | "and" | "or" | "is" | "in" | "like" | "now" | "desc" | "limit" | "since" | "s" | "d" | "h" | "min" | "sec" | "day" | "hour" | "minute" | "second" | "from" | "where" | "group" | "order" | "select" | "val" | "ts" | "dim" | "tags") => kw + "x"
    case ok => ok
  }

  private val valueGen: Gen[CompValue] = Gen.oneOf(
    Gen.choose(-100000L, 100000L).map(AbsValue(_)),
    Gen.choose(-1000.0, 1000.0).map(d => AbsValue(math.round(d * 100) / 100.0)),
    for {
      sign <- Gen.oneOf(1, -1)
      n    <- Gen.choose(1L, 500L)
      unit <- Gen.oneOf("S", "MIN", "H", "D")
    } yield RelValue(sign, n * unitMillis(unit))
  )

  private def renderValue(v: CompValue): String = v match {
    case AbsValue(d: Double) => f"$d%.2f".replace(",", ".") match {
      case s if s.contains(".") => s
      case s                    => s + ".0"
    }
    case AbsValue(x) => x.toString
    case RelValue(sign, ms) =>
      val (n, u) =
        if (ms % 86400000L == 0) (ms / 86400000L, "d")
        else if (ms % 3600000L == 0) (ms / 3600000L, "h")
        else if (ms % 60000L == 0) (ms / 60000L, "min")
        else (ms / 1000L, "s")
      s"now ${if (sign < 0) "-" else "+"} $n $u"
  }

  private val leafGen: Gen[Predicate] = Gen.oneOf(
    for { f <- identGen; v <- valueGen } yield EqPred(f, v),
    for { f <- identGen } yield EqPred(f, AbsValue("strv")),
    for { f <- identGen; op <- Gen.oneOf(Gt, Gte, Lt, Lte); v <- valueGen } yield CmpPred(f, op, v),
    for { f <- identGen; lo <- valueGen; hi <- valueGen } yield RangePred(f, lo, hi),
    for { f <- identGen } yield LikePred(f, "pre$fix"),
    identGen.map(NullPred(_))
  )

  private def predGen(depth: Int): Gen[Predicate] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      4 -> leafGen,
      2 -> (for { l <- predGen(depth - 1); r <- predGen(depth - 1) } yield AndPred(l, r)),
      2 -> (for { l <- predGen(depth - 1); r <- predGen(depth - 1) } yield OrPred(l, r)),
      1 -> predGen(depth - 1).map(NotPred(_))
    )

  /** render with explicit brackets everywhere so associativity is exact. */
  private def render(p: Predicate): String = p match {
    case EqPred(f, AbsValue(s: String)) => s"$f = '$s'"
    case EqPred(f, v)                   => s"$f = ${renderValue(v)}"
    case CmpPred(f, op, v)              => s"$f ${op.sql} ${renderValue(v)}"
    case RangePred(f, lo, hi)           => s"$f in (${renderValue(lo)}, ${renderValue(hi)})"
    case LikePred(f, pat)               => s"$f like $pat"
    case NullPred(f)                    => s"$f is null"
    case NotPred(NullPred(f))           => s"$f is not null"
    case NotPred(inner)                 => s"not (${render(inner)})"
    case AndPred(l, r)                  => s"(${render(l)}) and (${render(r)})"
    case OrPred(l, r)                   => s"(${render(l)}) or (${render(r)})"
  }

  property("round-trips arbitrary bracketed predicates") = forAll(predGen(3)) { p =>
    val sql = s"select * from m where ${render(p)}"
    SqlParser.parse("db", "ns", sql) match {
      case Right(s: SelectStatement) => Prop(s.where == Some(p)) :| s"$sql -> ${s.where}"
      case other                     => Prop.falsified :| s"$sql -> $other"
    }
  }

  property("round-trips aggregation + group-by + order + limit") = {
    val aggGen: Gen[(String, String => Agg)] = Gen.oneOf[(String, String => Agg)](
      ("sum", SumAgg(_)), ("min", MinAgg(_)), ("max", MaxAgg(_)),
      ("avg", AvgAgg(_)), ("count", CountAgg(_)), ("first", FirstAgg(_)), ("last", LastAgg(_)))
    val cases = for {
      (kw, mk) <- aggGen
      tag      <- identGen
      desc     <- Gen.oneOf(true, false)
      limit    <- Gen.option(Gen.choose(1, 1000))
    } yield (kw, mk, tag, desc, limit)
    forAll(cases) { case (kw, mk, tag, desc, limit) =>
      val sql = s"select $kw(value) from m group by $tag order by value${if (desc) " desc" else ""}" +
        limit.map(l => s" limit $l").getOrElse("")
      SqlParser.parse("db", "ns", sql) match {
        case Right(s: SelectStatement) =>
          Prop(
            s.projection == FieldsProjection(List(ProjField("value", Some(mk("value"))))) &&
            s.groupBy == Some(TagGroupBy(tag)) &&
            s.order == Some(OrderBy("value", desc)) &&
            s.limit == limit) :| sql
        case other => Prop.falsified :| s"$sql -> $other"
      }
    }
  }

  property("round-trips temporal group-by intervals") = {
    val cases = for {
      n    <- Gen.choose(1L, 96L)
      unit <- Gen.oneOf("s", "sec", "second", "min", "minute", "h", "hour", "d", "day")
    } yield (n, unit)
    forAll(cases) { case (n, unit) =>
      val sql = s"select count(*) from m group by interval $n $unit"
      SqlParser.parse("db", "ns", sql) match {
        case Right(s: SelectStatement) =>
          Prop(s.groupBy == Some(IntervalGroupBy(n * unitMillis(unit.toUpperCase), n, unit.toUpperCase))) :| sql
        case other => Prop.falsified :| s"$sql -> $other"
      }
    }
  }
}
