package graft

import graft.compile.ExprCompiler
import graft.model._
import org.apache.spark.sql.Row

/** Expression-compiler semantics over a tiny typed DataFrame. */
class ExprCompilerSpec extends SparkTestBase {
  import org.apache.spark.sql.functions.col

  private lazy val df = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "hello", Seq("a", "b", "c"), Map("k1" -> "v1", "k2" -> "v2"), 5.0),
      (2L, "  pad  ", Seq("x"), Map("k1" -> "w1"), -3.5),
      (3L, null.asInstanceOf[String], Seq.empty[String], Map.empty[String, String], 10.0)
    ).toDF("id", "s", "arr", "m", "v")
  }

  private def ids(e: Expr): Seq[Long] = {
    val c = ExprCompiler.compile(e, Some(df.schema))
    df.filter(c).select(col("id")).collect().map(_.getLong(0)).toSeq.sorted
  }
  private def eval(e: Expr): Seq[Any] = {
    val c = ExprCompiler.compile(e, Some(df.schema))
    df.orderBy("id").select(c).collect().map(_.get(0)).toSeq
  }

  test("ElementAt: 0-based list index, map key, and nested list-of-map lattice") {
    // list index is 0-based (reference type system)
    assert(eval(ElementAt(Field("arr"), 0)) === Seq("a", "x", null))
    assert(eval(ElementAt(Field("m"), "k1")) === Seq("v1", "w1", null))
    // nested: list-of-map — one constructed column, path lom[1].k
    val s = spark
    import s.implicits._
    val nested = Seq(
      (1L, Seq(Map("k" -> "first"), Map("k" -> "second"))),
      (2L, Seq(Map("k" -> "only")))
    ).toDF("id", "lom")
    val c = ExprCompiler.compile(
      ElementAt(ElementAt(Field("lom"), 1), "k"), Some(nested.schema))
    assert(nested.orderBy("id").select(c).collect().map(_.get(0)).toSeq ===
      Seq("second", null))
  }

  test("SIZE_OF on an ArrayType column is the element count") {
    assert(eval(Unary(UnaryOp.SIZE_OF, Field("arr"))) === Seq(3, 1, 0))
  }

  test("SIZE_OF on a MapType column is the entry count") {
    assert(eval(Unary(UnaryOp.SIZE_OF, Field("m"))) === Seq(2, 1, 0))
  }

  test("SIZE_OF on a string column is the character length") {
    assert(eval(Unary(UnaryOp.SIZE_OF, Field("s"))) === Seq(5, 7, null))
  }

  test("CONTAINS_VALUE works on list fields") {
    assert(ids(Binary(Field("arr"), Lit("b"), BinOp.CONTAINS_VALUE)) === Seq(1L))
  }

  test("CONTAINS_VALUE works on map fields") {
    assert(ids(Binary(Field("m"), Lit("w1"), BinOp.CONTAINS_VALUE)) === Seq(2L))
  }

  test("CONTAINS_KEY on map fields") {
    assert(ids(Binary(Field("m"), Lit("k2"), BinOp.CONTAINS_KEY)) === Seq(1L))
  }

  test("map subfield access compiles to element lookup") {
    assert(ids(Binary(Field("m", Some("k1")), Lit("v1"), BinOp.EQUALS)) === Seq(1L))
  }

  test("EQUALS_ANY / NOT_EQUALS_ALL membership") {
    val list = ListExpr(Seq(Lit(1L), Lit(3L)))
    assert(ids(Binary(Field("id"), list, BinOp.EQUALS_ANY)) === Seq(1L, 3L))
    assert(ids(Binary(Field("id"), list, BinOp.NOT_EQUALS_ALL)) === Seq(2L))
  }

  test("GREATER_THAN_ALL / LESS_THAN_ANY comparisons against lists") {
    val list = ListExpr(Seq(Lit(0.0), Lit(4.0)))
    assert(ids(Binary(Field("v"), list, BinOp.GREATER_THAN_ALL)) === Seq(1L, 3L))
    assert(ids(Binary(Field("v"), list, BinOp.LESS_THAN_ANY)) === Seq(2L))
  }

  test("XOR is boolean exclusive-or") {
    val t = Binary(Field("v"), Lit(0.0), BinOp.GREATER_THAN)   // T F T
    val u = Binary(Field("id"), Lit(2L), BinOp.LESS_THAN)      // T F F
    assert(ids(Binary(t, u, BinOp.XOR)) === Seq(3L))
  }

  test("BETWEEN / NOT_BETWEEN") {
    assert(ids(NAry(NAryOp.BETWEEN, Seq(Field("v"), Lit(0.0), Lit(6.0)))) === Seq(1L))
    assert(ids(NAry(NAryOp.NOT_BETWEEN, Seq(Field("v"), Lit(0.0), Lit(6.0)))) === Seq(2L, 3L))
  }

  test("IF picks branches per row") {
    val e = NAry(NAryOp.IF, Seq(
      Binary(Field("v"), Lit(0.0), BinOp.GREATER_THAN), Lit("pos"), Lit("neg")))
    assert(eval(e) === Seq("pos", "neg", "pos"))
  }

  test("arithmetic ADD/MUL/MOD") {
    assert(eval(Binary(Binary(Field("id"), Lit(10L), BinOp.MUL), Lit(7L), BinOp.MOD))
      === Seq(3L, 6L, 2L))
    assert(eval(Binary(Field("v"), Lit(1.0), BinOp.ADD)) === Seq(6.0, -2.5, 11.0))
  }

  test("TRIM / UPPER / ABS / IS_NULL") {
    assert(eval(Unary(UnaryOp.TRIM, Field("s"))) === Seq("hello", "pad", null))
    assert(eval(Unary(UnaryOp.UPPER, Field("s"))) === Seq("HELLO", "  PAD  ", null))
    assert(eval(Unary(UnaryOp.ABS, Field("v"))) === Seq(5.0, 3.5, 10.0))
    assert(ids(Unary(UnaryOp.IS_NULL, Field("s"))) === Seq(3L))
  }

  test("REGEX_LIKE with a literal pattern") {
    assert(ids(Binary(Field("s"), Lit("h.*o"), BinOp.REGEX_LIKE)) === Seq(1L))
  }

  test("Cast string to long for comparison") {
    val s = spark
    import s.implicits._
    val d2 = Seq(Tuple1("42"), Tuple1("7")).toDF("n")
    val c = ExprCompiler.compile(
      Binary(Cast(Field("n"), FieldType.LONG), Lit(10L), BinOp.GREATER_THAN),
      Some(d2.schema))
    assert(d2.filter(c).count() === 1L)
  }

  test("SUBSTRING with literal pos/len") {
    assert(eval(NAry(NAryOp.SUBSTRING, Seq(Field("s"), Lit(2), Lit(3))))
      === Seq("ell", " pa", null))
  }
}
