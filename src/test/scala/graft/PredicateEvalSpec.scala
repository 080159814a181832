package graft

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.exec.PredicateEval
import graft.plan.TimeContext
import graft.sql.Ast._

/** Per-record predicate matching — the pub/sub TemporaryIndex analogue. */
class PredicateEvalSpec extends AnyFlatSpec with Matchers {

  private val tc  = TimeContext(10000L)
  private val rec = Map[String, Any]("timestamp" -> 5000L, "value" -> 7.5, "name" -> "frank", "age" -> 20L)

  private def m(p: Predicate) = PredicateEval.matches(p, rec, tc)

  "PredicateEval" should "match equality on strings and numbers (with coercion)" in {
    m(EqPred("name", AbsValue("frank"))) shouldBe true
    m(EqPred("value", AbsValue(7.5))) shouldBe true
    m(EqPred("age", AbsValue(20.0))) shouldBe true // double vs long
    m(EqPred("name", AbsValue("bob"))) shouldBe false
    m(EqPred("missing", AbsValue(1L))) shouldBe false
  }

  it should "evaluate comparisons, ranges and NOW-relative values" in {
    m(CmpPred("value", Gt, AbsValue(7L))) shouldBe true
    m(CmpPred("value", Lte, AbsValue(7.5))) shouldBe true
    m(RangePred("age", AbsValue(10L), AbsValue(20L))) shouldBe true
    m(CmpPred("timestamp", Lt, RelValue(-1, 4000L))) shouldBe true  // < now-4s = 6000
    m(CmpPred("timestamp", Gt, RelValue(-1, 6000L))) shouldBe true  // > now-6s = 4000
    m(CmpPred("missing", Gt, AbsValue(0L))) shouldBe false
  }

  it should "evaluate LIKE with the $ wildcard" in {
    m(LikePred("name", "$ran$")) shouldBe true
    m(LikePred("name", "fran$")) shouldBe true
    m(LikePred("name", "$xyz$")) shouldBe false
  }

  it should "treat NOT as missing-field-matching and evaluate null checks" in {
    m(NullPred("missing")) shouldBe true
    m(NullPred("name")) shouldBe false
    m(NotPred(EqPred("missing", AbsValue("x")))) shouldBe true // missing field matches NOT
    m(NotPred(EqPred("name", AbsValue("frank")))) shouldBe false
  }

  it should "combine with AND/OR" in {
    m(AndPred(EqPred("name", AbsValue("frank")), CmpPred("value", Gt, AbsValue(5L)))) shouldBe true
    m(OrPred(EqPred("name", AbsValue("bob")), CmpPred("value", Gt, AbsValue(5L)))) shouldBe true
    m(AndPred(EqPred("name", AbsValue("bob")), CmpPred("value", Gt, AbsValue(5L)))) shouldBe false
  }
}
