package graft

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.sql.Ast._
import graft.sql.SqlParser

/** Parser specs: query string → exact AST (mirrors the reference's
  * nsdb-sql parser test altitude). */
class SqlParserSpec extends AnyFlatSpec with Matchers {

  private def parseSelect(q: String): SelectStatement =
    SqlParser.parse("db", "ns", q) match {
      case Right(s: SelectStatement) => s
      case other                     => fail(s"expected select, got $other")
    }

  "SqlParser" should "parse select star" in {
    val s = parseSelect("SELECT * FROM people")
    s.metric shouldBe "people"
    s.projection shouldBe StarProjection
    s.distinct shouldBe false
  }

  it should "parse a field list with aggregations" in {
    val s = parseSelect("select count(*), sum(*), name from people")
    s.projection shouldBe FieldsProjection(List(
      ProjField("*", Some(CountAgg("value"))),
      ProjField("*", Some(SumAgg("value"))),
      ProjField("name", None)
    ))
  }

  it should "parse count distinct on a field and on star" in {
    parseSelect("select count(distinct name) from people").projection shouldBe
      FieldsProjection(List(ProjField("name", Some(CountDistinctAgg("name")))))
    parseSelect("select count(distinct *) from people").projection shouldBe
      FieldsProjection(List(ProjField("*", Some(CountDistinctAgg("value")))))
  }

  it should "reject distinct inside non-count aggregations" in {
    SqlParser.parse("db", "ns", "select sum(distinct value) from people").isLeft shouldBe true
  }

  it should "parse comparison, range, like, null predicates" in {
    val s = parseSelect(
      "SELECT name FROM people WHERE timestamp IN (2, 4) AND surname = pippo AND name like $an$ AND code is not null")
    val w = s.where.get
    w shouldBe AndPred(
      RangePred("timestamp", AbsValue(2L), AbsValue(4L)),
      AndPred(
        EqPred("surname", AbsValue("pippo")),
        AndPred(LikePred("name", "$an$"), NotPred(NullPred("code")))
      )
    )
  }

  it should "parse relative time NOW arithmetic" in {
    val s = parseSelect("select * from m where timestamp < now + 30d and timestamp > now - 2h")
    s.where.get shouldBe AndPred(
      CmpPred("timestamp", Lt, RelValue(1, 30L * 86400000L)),
      CmpPred("timestamp", Gt, RelValue(-1, 2L * 3600000L))
    )
  }

  it should "keep NOT spanning the rest of the expression unless bracketed" in {
    val s = parseSelect("SELECT name FROM people WHERE NOT timestamp >= 2 OR timestamp < 4")
    s.where.get shouldBe NotPred(OrPred(CmpPred("timestamp", Gte, AbsValue(2L)), CmpPred("timestamp", Lt, AbsValue(4L))))
    val b = parseSelect("SELECT name FROM people WHERE (NOT timestamp >= 2) OR (timestamp < 4)")
    b.where.get shouldBe OrPred(NotPred(CmpPred("timestamp", Gte, AbsValue(2L))), CmpPred("timestamp", Lt, AbsValue(4L)))
  }

  it should "give AND precedence over OR" in {
    val s = parseSelect("select * from m where a = 1 and b = 2 or c = 3")
    s.where.get shouldBe OrPred(
      AndPred(EqPred("a", AbsValue(1L)), EqPred("b", AbsValue(2L))),
      EqPred("c", AbsValue(3L))
    )
  }

  it should "parse group by tag with order and limit" in {
    val s = parseSelect("select sum(value) from m group by age order by value desc limit 5")
    s.groupBy shouldBe Some(TagGroupBy("age"))
    s.order shouldBe Some(OrderBy("value", desc = true))
    s.limit shouldBe Some(5)
  }

  it should "parse temporal group by with and without quantity" in {
    parseSelect("select count(*) from m group by interval 30s").groupBy shouldBe
      Some(IntervalGroupBy(30000L, 30L, "S"))
    parseSelect("select count(*) from m group by interval d").groupBy shouldBe
      Some(IntervalGroupBy(86400000L, 1L, "D"))
    parseSelect("select count(*) from m group by interval 2 min").groupBy shouldBe
      Some(IntervalGroupBy(120000L, 2L, "MIN"))
  }

  it should "parse a grace period" in {
    val s = parseSelect("select count(*) from m group by interval 30s since 1 h")
    s.grace shouldBe Some(Grace(1, "H"))
    s.grace.get.millis shouldBe 3600000L
  }

  it should "parse the reference bracket-spec edge cases to exact ASTs" in {
    // inputs from the reference's SQLStatementBracketsSpec (public test
    // corpus — same grammar, exact AST parity)
    parseSelect("SELECT name FROM people WHERE (timestamp IN (2,4))").where.get shouldBe
      RangePred("timestamp", AbsValue(2L), AbsValue(4L))
    parseSelect("SELECT name FROM people WHERE (timestamp IN (now - 2 s, now + 4 s))").where.get shouldBe
      RangePred("timestamp", RelValue(-1, 2000L), RelValue(1, 4000L))
    parseSelect("SELECT name FROM people WHERE (timestamp = word_word)").where.get shouldBe
      EqPred("timestamp", AbsValue("word_word"))
    parseSelect("SELECT name FROM people WHERE (timestamp > 2) AND (timestamp = 4)").where.get shouldBe
      AndPred(CmpPred("timestamp", Gt, AbsValue(2L)), EqPred("timestamp", AbsValue(4L)))
    parseSelect("SELECT name FROM people WHERE NOT (timestamp >= 2 OR NOT timestamp < 4)").where.get shouldBe
      NotPred(OrPred(CmpPred("timestamp", Gte, AbsValue(2L)), NotPred(CmpPred("timestamp", Lt, AbsValue(4L)))))
    parseSelect(
      "SELECT name FROM people WHERE timestamp < now + 30d and (timestamp > now - 2h) AND (timestamp = now + 4 min)").where.get shouldBe
      AndPred(CmpPred("timestamp", Lt, RelValue(1, 30L * 86400000L)),
        AndPred(CmpPred("timestamp", Gt, RelValue(-1, 2L * 3600000L)),
          EqPred("timestamp", RelValue(1, 4L * 60000L))))
  }

  it should "match the reference on value literals, LIKE charsets and clause order" in {
    // reference SelectSQLEqExpressionSpec / SelectSQLLikeExpressionSpec /
    // GracePeriodStatementSpec inputs, exact-AST (or exact-failure) parity
    parseSelect("SELECT name FROM people WHERE timestamp = -10").where.get shouldBe
      EqPred("timestamp", AbsValue(-10L))
    parseSelect("SELECT name FROM people WHERE timestamp = -10.5").where.get shouldBe
      EqPred("timestamp", AbsValue(-10.5))
    parseSelect("select name from people where name = '' limit 5").where.get shouldBe
      EqPred("name", AbsValue(""))
    parseSelect("select name from people where name = 'a$' limit 5").where.get shouldBe
      EqPred("name", AbsValue("a$"))
    parseSelect("SELECT name FROM people WHERE name like $a_:m?!-e$").where.get shouldBe
      LikePred("name", "$a_:m?!-e$")
    parseSelect("SELECT * FROM people since 6d").grace shouldBe Some(Grace(6, "D"))
    // clause order: SINCE belongs before LIMIT — the reference parser
    // rejects it after (GracePeriodStatementSpec "fail if grace period is
    // provided after the limit"), and so do we
    SqlParser.parse("db", "ns",
      "SELECT name FROM people WHERE surname = pippo order by name desc limit 5 since 6h").isLeft shouldBe true
    parseSelect("SELECT name FROM people WHERE surname = pippo order by name desc since 6h limit 5")
      .limit shouldBe Some(5)
  }

  it should "parse quoted multi-word strings" in {
    val s = parseSelect("select * from m where name = 'john frank'")
    s.where.get shouldBe EqPred("name", AbsValue("john frank"))
  }

  it should "not let keywords eat identifier prefixes" in {
    val s = parseSelect("select notes from m where notes = 5")
    s.projection shouldBe FieldsProjection(List(ProjField("notes", None)))
    s.where.get shouldBe EqPred("notes", AbsValue(5L))
  }

  it should "parse insert statements" in {
    SqlParser.parse("db", "ns", "INSERT INTO m TS=123 DIM(x = 1, y = ab) TAGS(t = v) VAL = 2.5") shouldBe
      Right(InsertStatement("db", "ns", "m", Some(123L), Map("x" -> 1L, "y" -> "ab"), Map("t" -> "v"), 2.5))
  }

  it should "parse delete and drop" in {
    SqlParser.parse("db", "ns", "delete from m where value > 1") shouldBe
      Right(DeleteStatement("db", "ns", "m", CmpPred("value", Gt, AbsValue(1L))))
    SqlParser.parse("db", "ns", "drop metric m") shouldBe Right(DropStatement("db", "ns", "m"))
  }

  it should "reject malformed statements" in {
    SqlParser.parse("db", "ns", "select from m").isLeft shouldBe true
    SqlParser.parse("db", "ns", "frobnicate").isLeft shouldBe true
  }
}
