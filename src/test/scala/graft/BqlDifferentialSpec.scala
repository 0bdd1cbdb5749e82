package graft

import graft.bql.Bql
import graft.compile.QueryCompiler
import graft.model._
import org.apache.spark.sql.DataFrame

import scala.util.Random

/** Randomized differential conformance for the BQL front-end: a seeded
  * generator builds each query TWICE — once as a hand-constructed model
  * [[QuerySpec]], once as the equivalent BQL text — and both must execute
  * to identical results through the same compiler. One failing seed is a
  * parser/compiler divergence (precedence, literal typing, default names,
  * post-agg ordering); the assertion message carries the BQL text and the
  * spec so the case reproduces directly.
  */
class BqlDifferentialSpec extends SparkTestBase {

  private lazy val fixture: DataFrame = {
    val s = spark
    import s.implicits._
    (1L to 400L).map { i =>
      (i, Seq("click", "view", "purchase", "error")((i % 4).toInt),
        (i % 97).toDouble / 2.0, s"c${i % 5}")
    }.toDF("event_id", "etype", "value", "cat")
  }

  private def run(spec: QuerySpec): Seq[String] =
    QueryCompiler.run(fixture, spec).collect().map(_.toString).toSeq

  // ---- renderer for the generated subset (model → BQL text) ----------
  private def r(e: Expr): String = e match {
    case Field(n, None)      => n
    case Lit(s: String)      => s"'$s'"
    case Lit(v)              => v.toString
    case ListExpr(xs)        => xs.map(r).mkString("[", ", ", "]")
    case Unary(UnaryOp.NOT, x) => s"NOT (${r(x)})"
    case Unary(UnaryOp.ABS, x) => s"ABS(${r(x)})"
    case NAry(NAryOp.AND, xs)  => xs.map(x => s"(${r(x)})").mkString(" AND ")
    case NAry(NAryOp.OR, xs)   => xs.map(x => s"(${r(x)})").mkString(" OR ")
    case NAry(NAryOp.BETWEEN, Seq(x, lo, hi)) =>
      s"(${r(x)}) BETWEEN ${r(lo)} AND ${r(hi)}"
    case Binary(l, rr, op) =>
      import BinOp._
      val sym = op match {
        case EQUALS => "=";  case NOT_EQUALS => "!="
        case GREATER_THAN => ">"; case LESS_THAN => "<"
        case GREATER_OR_EQUALS => ">="; case LESS_OR_EQUALS => "<="
        case IN => "IN"; case ADD => "+"; case SUB => "-"
        case MUL => "*"; case DIV => "/"; case MOD => "%"
        case o => sys.error(s"no renderer for $o")
      }
      s"(${r(l)} $sym ${r(rr)})"
    case x => sys.error(s"no renderer for $x")
  }

  // ---- seeded generator ----------------------------------------------
  private def genLeaf(rnd: Random): Expr = rnd.nextInt(6) match {
    case 0 => Binary(Field("value"),
      Lit(rnd.nextInt(80).toDouble / 2.0 + 0.5), BinOp.GREATER_THAN)
    case 1 => Binary(Field("value"),
      Lit(rnd.nextInt(80).toDouble / 2.0 + 0.5), BinOp.LESS_OR_EQUALS)
    case 2 => Binary(Field("etype"), Lit("click"), BinOp.EQUALS)
    case 3 => Binary(Field("etype"),
      ListExpr(Seq(Lit("click"), Lit("view"))), BinOp.IN)
    case 4 =>
      val lo = rnd.nextInt(30).toDouble
      NAry(NAryOp.BETWEEN, Seq(Field("value"), Lit(lo), Lit(lo + 10.5)))
    case 5 => Binary(Binary(Field("event_id"), Lit(7L), BinOp.MOD),
      Lit(rnd.nextInt(7).toLong), BinOp.EQUALS)
  }

  private def genFilter(rnd: Random, depth: Int): Expr =
    if (depth == 0 || rnd.nextInt(3) == 0) {
      val l = genLeaf(rnd)
      if (rnd.nextInt(4) == 0) Unary(UnaryOp.NOT, l) else l
    } else {
      val op = if (rnd.nextBoolean()) NAryOp.AND else NAryOp.OR
      NAry(op, Seq(genFilter(rnd, depth - 1), genFilter(rnd, depth - 1)))
    }

  private case class GenQ(spec: QuerySpec, bql: String)

  private def gen(rnd: Random, id: String): GenQ = {
    val filter = if (rnd.nextInt(4) > 0) Some(genFilter(rnd, 2)) else None
    val where = filter.map(f => s" WHERE ${r(f)}").getOrElse("")
    rnd.nextInt(7) match {
      case 0 => // RAW: computed projection + order + limit
        val lim = 1 + rnd.nextInt(20)
        val proj = Seq("event_id" -> (Field("event_id"): Expr),
          "v2" -> (Binary(Field("value"), Lit(2.0), BinOp.MUL): Expr))
        GenQ(
          QuerySpec(id, filter, Some(proj), Raw(lim),
            postAggregations = Seq(OrderBy(Seq("event_id" -> true)))),
          s"SELECT event_id AS event_id, (value * 2.0) AS v2" +
            s" FROM STREAM$where ORDER BY event_id LIMIT $lim")
      case 1 => // GROUP all: random prefix of the five metric ops
        val all = Seq(GroupOp(GroupOpType.COUNT, None, "cnt"),
          GroupOp(GroupOpType.SUM, Some("value"), "sv"),
          GroupOp(GroupOpType.AVG, Some("value"), "av"),
          GroupOp(GroupOpType.MIN, Some("value"), "mn"),
          GroupOp(GroupOpType.MAX, Some("value"), "mx"))
        val chosen = all.take(1 + rnd.nextInt(all.size))
        val items = chosen.map {
          case GroupOp(GroupOpType.COUNT, None, nm) => s"COUNT(*) AS $nm"
          case GroupOp(op, Some(f), nm)             => s"$op($f) AS $nm"
          case o                                    => sys.error(o.toString)
        }.mkString(", ")
        GenQ(QuerySpec(id, filter, None, GroupAll(chosen)),
          s"SELECT $items FROM STREAM$where")
      case 2 => // GROUP BY with optional HAVING
        val keys = if (rnd.nextBoolean()) Seq("etype" -> "e")
                   else Seq("etype" -> "e", "cat" -> "c")
        val ops = Seq(GroupOp(GroupOpType.COUNT, None, "cnt"),
          GroupOp(GroupOpType.SUM, Some("value"), "sv"))
        val having =
          if (rnd.nextInt(3) == 0)
            Some(Binary(Field("cnt"), Lit(2L), BinOp.GREATER_THAN): Expr)
          else None
        val keyOut = keys.map(_._2)
        val post = having.map(Having.apply).toSeq :+
          OrderBy(keyOut.map(_ -> true))
        val sel = (keys.map { case (f, a) => s"$f AS $a" } ++
          Seq("COUNT(*) AS cnt", "SUM(value) AS sv")).mkString(", ")
        val hv = having.map(h => s" HAVING ${r(h)}").getOrElse("")
        GenQ(
          QuerySpec(id, filter, None, GroupBy(keys, ops),
            postAggregations = post),
          s"SELECT $sel FROM STREAM$where GROUP BY " +
            s"${keys.map(_._1).mkString(", ")}$hv" +
            s" ORDER BY ${keyOut.mkString(", ")}")
      case 3 => // COUNT DISTINCT over a field tuple
        val flds = if (rnd.nextBoolean()) Seq("etype") else Seq("etype", "cat")
        GenQ(QuerySpec(id, filter, None, CountDistinct(flds, "cd")),
          s"SELECT COUNT(DISTINCT ${flds.mkString(", ")}) AS cd" +
            s" FROM STREAM$where")
      case 4 => // TOP-K frequent items
        val flds = if (rnd.nextBoolean()) Seq("etype") else Seq("etype", "cat")
        val k = 2 + rnd.nextInt(4)
        GenQ(
          QuerySpec(id, filter, None,
            TopK(flds.map(f => f -> f), k, "cnt")),
          s"SELECT TOP($k, ${flds.mkString(", ")}) AS cnt FROM STREAM$where")
      case 5 => // DISTRIBUTION quantiles at explicit points
        val pts = Seq(0.0, 0.25, 0.5, 0.75, 1.0).take(2 + rnd.nextInt(4))
        GenQ(
          QuerySpec(id, filter, None,
            Distribution("value", DistributionType.QUANTILE, pts)),
          s"SELECT QUANTILE(value, [${pts.mkString(", ")}])" +
            s" FROM STREAM$where")
      case 6 => // DISTRIBUTION PMF with REGION start/end/increment points
        GenQ(
          QuerySpec(id, filter, None,
            Distribution("value", DistributionType.PMF,
              Seq(0.0, 12.0, 24.0, 36.0, 48.0))),
          s"SELECT FREQ(value, 0.0, 48.0, 12.0) FROM STREAM$where")
    }
  }

  test("60 random (model, BQL) query pairs execute identically") {
    val rnd = new Random(20260813L)
    (1 to 60).foreach { i =>
      val g = gen(rnd, s"dq$i")
      val parsed = Bql.parse(g.bql, s"dq$i")
      assert(run(parsed) === run(g.spec),
        s"\nBQL:  ${g.bql}\nspec: ${g.spec}")
    }
  }
}
