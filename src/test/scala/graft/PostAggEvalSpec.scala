package graft

import graft.model._
import graft.streaming.PostAggEval
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side post-aggregation evaluator semantics: Spark parity on
  * three-valued logic, arithmetic typing, ordering, and record shaping. */
class PostAggEvalSpec extends AnyFunSuite {

  private def recs(jsons: String*): Seq[String] = jsons.toSeq
  private def run(posts: Seq[PostAggregation], records: Seq[String]): Seq[String] =
    PostAggEval(posts, records)

  test("HAVING keeps only TRUE: null comparisons filter out") {
    val out = run(
      Seq(Having(Binary(Field("x"), Lit(5L), BinOp.GREATER_THAN))),
      recs("""{"x":10}""", """{"x":3}""", """{"x":null}""", """{"y":1}"""))
    assert(out === Seq("""{"x":10}"""))
  }

  test("integer arithmetic stays integral except DIV (Spark Divide)") {
    val out = run(
      Seq(Computation(Seq(
        "s" -> Binary(Field("a"), Field("b"), BinOp.ADD),
        "d" -> Binary(Field("a"), Field("b"), BinOp.DIV),
        "m" -> Binary(Field("a"), Field("b"), BinOp.MOD)))),
      recs("""{"a":7,"b":2}"""))
    assert(out === Seq("""{"a":7,"b":2,"s":9,"d":3.5,"m":1}"""))
  }

  test("ORDER BY: asc nulls first, desc nulls last, multi-key") {
    val rows = recs("""{"k":2,"t":"b"}""", """{"k":null,"t":"a"}""", """{"k":1,"t":"c"}""",
      """{"k":1,"t":"a"}""")
    val asc = run(Seq(OrderBy(Seq("k" -> true, "t" -> true))), rows)
    assert(asc.map(PostAggEval.parseRecord(_)("t")) === Seq("a", "a", "c", "b"))
    val desc = run(Seq(OrderBy(Seq("k" -> false, "t" -> true))), rows)
    assert(desc.map(PostAggEval.parseRecord(_)("t")) === Seq("b", "a", "c", "a"))
  }

  test("CULLING removes fields; COMPUTATION sees earlier computed fields") {
    val out = run(
      Seq(
        Computation(Seq("twice" -> Binary(Field("x"), Lit(2L), BinOp.MUL))),
        Computation(Seq("four" -> Binary(Field("twice"), Lit(2L), BinOp.MUL))),
        Culling(Seq("x", "twice"))),
      recs("""{"x":3}"""))
    assert(out === Seq("""{"four":12}"""))
  }

  test("3VL logic: AND/OR/NOT/XOR with nulls match SQL") {
    val r = PostAggEval.parseRecord("""{"t":true,"f":false,"n":null}""")
    def ev(e: Expr) = PostAggEval.eval(e, r)
    assert(ev(Binary(Field("t"), Field("n"), BinOp.AND)) === null)
    assert(ev(Binary(Field("f"), Field("n"), BinOp.AND)) === false)
    assert(ev(Binary(Field("t"), Field("n"), BinOp.OR)) === true)
    assert(ev(Binary(Field("f"), Field("n"), BinOp.OR)) === null)
    assert(ev(Unary(UnaryOp.NOT, Field("n"))) === null)
    assert(ev(Binary(Field("t"), Field("n"), BinOp.XOR)) === null)
  }

  test("membership, BETWEEN, IF, SUBSTRING, CAST, REGEX_LIKE") {
    val r = PostAggEval.parseRecord("""{"x":5,"s":"hello","d":2.5}""")
    def ev(e: Expr) = PostAggEval.eval(e, r)
    assert(ev(Binary(Field("x"), ListExpr(Seq(Lit(4L), Lit(5L))), BinOp.IN)) === true)
    assert(ev(Binary(Field("x"), ListExpr(Seq(Lit(6L), Lit(7L))), BinOp.EQUALS_ANY)) === false)
    assert(ev(NAry(NAryOp.BETWEEN, Seq(Field("d"), Lit(2.0), Lit(3.0)))) === true)
    assert(ev(NAry(NAryOp.IF, Seq(
      Binary(Field("x"), Lit(4L), BinOp.GREATER_THAN), Lit("big"), Lit("small")))) === "big")
    assert(ev(NAry(NAryOp.SUBSTRING, Seq(Field("s"), Lit(2L), Lit(3L)))) === "ell")
    assert(ev(Cast(Field("x"), FieldType.DOUBLE)) === 5.0)
    assert(ev(Cast(Field("s"), FieldType.LONG)) === null) // non-ANSI cast → null
    assert(ev(Binary(Field("s"), Lit("^he"), BinOp.REGEX_LIKE)) === true)
  }

  test("CAST integral strings to LONG parses exactly above 2^53") {
    // Spark's non-ANSI string→long cast parses integral strings exactly —
    // a round-trip through Double would land on ...992 here
    val r = PostAggEval.parseRecord(
      """{"big":"9007199254740993","dec":"3.9","neg":"-12"}""")
    def ev(e: Expr) = PostAggEval.eval(e, r)
    assert(ev(Cast(Field("big"), FieldType.LONG)) === 9007199254740993L)
    assert(ev(Cast(Field("dec"), FieldType.LONG)) === 3L) // decimals truncate
    assert(ev(Cast(Field("neg"), FieldType.INTEGER)) === -12L)
  }

  test("SUBSTRING negative positions match Spark substringSQL (unclamped window)") {
    val r = PostAggEval.parseRecord("""{"s":"hello"}""")
    def sub(pos: Long, len: Long) =
      PostAggEval.eval(NAry(NAryOp.SUBSTRING, Seq(Field("s"), Lit(pos), Lit(len))), r)
    assert(sub(-7, 3) === "h")   // start -2, window ends at 1 → only "h"
    assert(sub(-3, 2) === "ll")
    assert(sub(2, 3) === "ell")
    assert(sub(9, 3) === "")
  }

  test("nested JSON objects survive re-rendering (mutable map render)") {
    val out = run(Seq(Culling(Seq("drop"))),
      recs("""{"a":{"x":1,"y":[1,2]},"drop":0}"""))
    assert(out === Seq("""{"a":{"x":1,"y":[1,2]}}"""))
  }

  test("numeric comparison crosses long/double like Spark") {
    val r = PostAggEval.parseRecord("""{"l":5,"d":5.0,"d2":5.5}""")
    def ev(e: Expr) = PostAggEval.eval(e, r)
    assert(ev(Binary(Field("l"), Field("d"), BinOp.EQUALS)) === true)
    assert(ev(Binary(Field("l"), Field("d2"), BinOp.LESS_THAN)) === true)
  }
}
