package graft.streaming

import graft.model._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/**
 * Driver-side post-aggregation evaluation for the streaming runner.
 *
 * The reference applies the FULL query — including post aggregations — at the
 * combiner when a window closes or the query finishes (bullet-core
 * `Querier.finish`; SURVEY §2.6). Our streaming results are bounded
 * (≤ `entries` grouped rows, ≤ RAW cap, or one sketch record), so
 * HAVING / COMPUTATION / CULLING / ORDER BY run as a tiny in-memory pass over
 * the finished records — no Spark job per emit, safe on the tick thread.
 *
 * Semantics mirror the batch path ([[graft.compile.QueryCompiler]] applyPost):
 *  - Spark three-valued logic (null-propagating comparisons; AND/OR/NOT as in
 *    SQL); HAVING keeps only rows evaluating to TRUE.
 *  - Integer arithmetic stays integral except DIV, which is always floating
 *    (Spark's `Divide` casts integral inputs to double).
 *  - ORDER BY asc = nulls first, desc = nulls last (Spark defaults).
 */
object PostAggEval {
  private val mapper = new ObjectMapper()

  /** A result record: insertion-ordered field map (Computation appends,
    * Culling removes, rendering preserves order). */
  type Rec = mutable.LinkedHashMap[String, Any]

  def apply(posts: Seq[PostAggregation], records: Seq[String]): Seq[String] = {
    if (posts.isEmpty || records.isEmpty) return records
    var recs: Seq[Rec] = records.map(parseRecord)
    posts.foreach {
      case Having(e)       => recs = recs.filter(r => eval(e, r) == true)
      case Computation(fs) => recs.foreach(r => fs.foreach { case (n, e) => r(n) = eval(e, r) })
      case Culling(names)  => recs.foreach(r => names.foreach(r.remove))
      case OrderBy(fields) => recs = recs.sortWith((a, b) => compareRecs(fields, a, b) < 0)
    }
    recs.map(r => Json.obj(r.toSeq: _*))
  }

  // ------------------------------------------------------------- JSON ↔ Rec

  def parseRecord(json: String): Rec = {
    val n = mapper.readTree(json)
    val rec = mutable.LinkedHashMap.empty[String, Any]
    n.fields().asScala.foreach(e => rec += e.getKey -> fromNode(e.getValue))
    rec
  }

  private def fromNode(n: JsonNode): Any =
    if (n.isNull) null
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isTextual) n.asText()
    else if (n.isArray) n.elements().asScala.map(fromNode).toVector
    else if (n.isObject) {
      val m = mutable.LinkedHashMap.empty[String, Any]
      n.fields().asScala.foreach(e => m += e.getKey -> fromNode(e.getValue))
      m
    } else n.asText()

  // --------------------------------------------------------------- ordering

  /** Null-aware value comparison with null smallest (asc = nulls first;
    * negating for desc then puts nulls last — Spark's defaults). */
  private def cmpNullsFirst(a: Any, b: Any): Int =
    if (a == null && b == null) 0
    else if (a == null) -1
    else if (b == null) 1
    else (numeric(a), numeric(b)) match {
      case (Some(Left(x)), Some(Left(y)))  => java.lang.Long.compare(x, y)
      // + 0.0 normalizes signed zero: SQL equality has -0.0 = 0.0, while
      // Double.compare does not
      case (Some(x), Some(y))              => java.lang.Double.compare(toD(x) + 0.0, toD(y) + 0.0)
      case _ => (a, b) match {
        case (x: String, y: String)   => x.compareTo(y)
        case (x: Boolean, y: Boolean) => x.compareTo(y)
        case _                        => a.toString.compareTo(b.toString)
      }
    }

  private def compareRecs(fields: Seq[(String, Boolean)], a: Rec, b: Rec): Int = {
    fields.foreach { case (f, asc) =>
      val c = cmpNullsFirst(a.getOrElse(f, null), b.getOrElse(f, null))
      if (c != 0) return if (asc) c else -c
    }
    0
  }

  // ------------------------------------------------------------- evaluation

  private def numeric(v: Any): Option[Either[Long, Double]] = v match {
    case l: Long   => Some(Left(l))
    case i: Int    => Some(Left(i.toLong))
    case s: Short  => Some(Left(s.toLong))
    case b: Byte   => Some(Left(b.toLong))
    case d: Double => Some(Right(d))
    case f: Float  => Some(Right(f.toDouble))
    case _         => None
  }
  private def toD(e: Either[Long, Double]): Double = e.fold(_.toDouble, identity)

  /** Three-valued comparison: None when either side is null or incomparable. */
  private def cmp(a: Any, b: Any): Option[Int] =
    if (a == null || b == null) None
    else (numeric(a), numeric(b)) match {
      case (Some(Left(x)), Some(Left(y))) => Some(java.lang.Long.compare(x, y))
      // + 0.0 normalizes signed zero (SQL: -0.0 = 0.0)
      case (Some(x), Some(y))             => Some(java.lang.Double.compare(toD(x) + 0.0, toD(y) + 0.0))
      case _ => (a, b) match {
        case (x: String, y: String)   => Some(x.compareTo(y))
        case (x: Boolean, y: Boolean) => Some(x.compareTo(y))
        case _                        => if (a == b) Some(0) else None
      }
    }

  def eval(e: Expr, r: Rec): Any = e match {
    case Field(n, None)      => r.getOrElse(n, null)
    case Field(n, Some(sub)) => r.getOrElse(n, null) match {
      case m: scala.collection.Map[_, _] =>
        m.asInstanceOf[scala.collection.Map[String, Any]].getOrElse(sub, null)
      case _ => null
    }
    case Lit(v)          => v
    case ListExpr(items) => items.map(eval(_, r))
    case ElementAt(base, key) => eval(base, r) match {
      case m: scala.collection.Map[_, _] =>
        m.asInstanceOf[scala.collection.Map[Any, Any]].getOrElse(key, null)
      case xs: scala.collection.Seq[_] => key match {
        case i: Int if i >= 0 && i < xs.size => xs(i)
        case _ => null
      }
      case _ => null
    }
    case Explode(_) =>
      throw new IllegalArgumentException("EXPLODE is not supported in post-aggregations")
    case Cast(x, to)     => cast(eval(x, r), to)
    case Unary(op, x)    => unary(op, eval(x, r))
    case Binary(l, rr, op) => binary(op, eval(l, r), eval(rr, r))
    case NAry(op, xs)    => nary(op, xs, r)
  }

  private def cast(v: Any, to: FieldType.Value): Any = {
    if (v == null) return null
    import FieldType._
    try to match {
      case STRING => v.toString
      case INTEGER | LONG => v match {
        case b: Boolean => if (b) 1L else 0L
        // legacy-cast semantics: integral strings parse exactly (Spark's
        // non-ANSI string→long does NOT round through double — must hold
        // above 2^53 too); decimal strings truncate ("3.5" → 3);
        // unparseable strings → null below
        case s: String  =>
          try s.trim.toLong catch {
            case _: NumberFormatException => s.trim.toDouble.toLong
          }
        case _          => numeric(v).map(e => e.fold(identity, _.toLong)).orNull
      }
      case FLOAT | DOUBLE => v match {
        case b: Boolean => if (b) 1.0 else 0.0
        case s: String  => s.trim.toDouble
        case _          => numeric(v).map(toD).orNull
      }
      case BOOLEAN => v match {
        case b: Boolean => b
        case s: String  => s.trim.toLowerCase match {
          case "true" | "t" | "1"  => true
          case "false" | "f" | "0" => false
          case _                   => null
        }
        case _ => numeric(v).map(toD(_) != 0.0).orNull
      }
      case TIMESTAMP => v // no timestamp type in the record JSON; pass through
    } catch { case _: NumberFormatException => null } // non-ANSI cast → null
  }

  private def unary(op: UnaryOp.Value, v: Any): Any = {
    import UnaryOp._
    op match {
      case NOT         => v match { case b: Boolean => !b; case _ => null }
      case IS_NULL     => v == null
      case IS_NOT_NULL => v != null
      case SIZE_OF => v match {
        case null                       => null
        case xs: scala.collection.Seq[_]    => xs.size
        case m: scala.collection.Map[_, _]  => m.size
        case other                      => other.toString.length
      }
      case TRIM  => if (v == null) null else v.toString.trim
      case LOWER => if (v == null) null else v.toString.toLowerCase
      case UPPER => if (v == null) null else v.toString.toUpperCase
      case ABS   => numeric(v).map(_.fold(l => math.abs(l): Any, d => math.abs(d): Any)).orNull
    }
  }

  /** Spark `exists` 3VL: true if any true, else null if any null, else false. */
  private def exists3(xs: Seq[Any], f: Any => Any): Any = {
    var sawNull = false
    xs.foreach { x =>
      f(x) match {
        case true  => return true
        case null  => sawNull = true
        case _     =>
      }
    }
    if (sawNull) null else false
  }

  /** Spark `forall` 3VL: false if any false, else null if any null, else true. */
  private def forall3(xs: Seq[Any], f: Any => Any): Any = {
    var sawNull = false
    xs.foreach { x =>
      f(x) match {
        case false => return false
        case null  => sawNull = true
        case _     =>
      }
    }
    if (sawNull) null else true
  }

  private def arith(op: BinOp.Value, l: Any, r: Any): Any = {
    import BinOp._
    if (l == null || r == null) return null
    (numeric(l), numeric(r)) match {
      case (Some(a), Some(b)) => (op, a, b) match {
        // DIV always floating, matching Spark's Divide on integral inputs
        case (DIV, _, _) =>
          val d = toD(b); if (d == 0.0) null else toD(a) / d
        case (ADD, Left(x), Left(y)) => x + y
        case (SUB, Left(x), Left(y)) => x - y
        case (MUL, Left(x), Left(y)) => x * y
        case (MOD, Left(x), Left(y)) => if (y == 0L) null else x % y
        case (ADD, _, _) => toD(a) + toD(b)
        case (SUB, _, _) => toD(a) - toD(b)
        case (MUL, _, _) => toD(a) * toD(b)
        case (MOD, _, _) => val d = toD(b); if (d == 0.0) null else toD(a) % d
        case _ => null
      }
      case _ => null
    }
  }

  private def binary(op: BinOp.Value, l: Any, r: Any): Any = {
    import BinOp._
    def rel(f: Int => Boolean): Any = cmp(l, r).map(f).orNull
    def asList(v: Any): Seq[Any] = v match {
      case xs: scala.collection.Seq[_] => xs.toSeq
      case null => null
      case other => Seq(other)
    }
    op match {
      case EQUALS            => rel(_ == 0)
      case NOT_EQUALS        => rel(_ != 0)
      case GREATER_THAN      => rel(_ > 0)
      case LESS_THAN         => rel(_ < 0)
      case GREATER_OR_EQUALS => rel(_ >= 0)
      case LESS_OR_EQUALS    => rel(_ <= 0)

      case EQUALS_ANY | NOT_EQUALS_ANY | GREATER_THAN_ANY | LESS_THAN_ANY |
           GREATER_OR_EQUALS_ANY | LESS_OR_EQUALS_ANY =>
        val rs = asList(r); if (rs == null) null
        else exists3(rs, x => binary(scalarOf(op), l, x))
      case EQUALS_ALL | NOT_EQUALS_ALL | GREATER_THAN_ALL | LESS_THAN_ALL |
           GREATER_OR_EQUALS_ALL | LESS_OR_EQUALS_ALL =>
        val rs = asList(r); if (rs == null) null
        else forall3(rs, x => binary(scalarOf(op), l, x))

      case AND => (l, r) match {
        case (false, _) | (_, false) => false
        case (null, _) | (_, null)   => null
        case _                       => true
      }
      case OR => (l, r) match {
        case (true, _) | (_, true) => true
        case (null, _) | (_, null) => null
        case _                     => false
      }
      case XOR => if (l == null || r == null) null else l != r

      case IN     => if (r == null) null else exists3(asList(r), x => binary(EQUALS, l, x))
      case NOT_IN => binary(IN, l, r) match { case b: Boolean => !b; case _ => null }
      case CONTAINS_KEY => l match {
        case m: scala.collection.Map[_, _] => m.asInstanceOf[scala.collection.Map[Any, Any]].contains(r)
        case _ => null
      }
      case CONTAINS_VALUE => l match {
        case m: scala.collection.Map[_, _] =>
          exists3(m.values.toSeq, x => binary(EQUALS, x, r))
        case xs: scala.collection.Seq[_] => exists3(xs.toSeq, x => binary(EQUALS, x, r))
        case _ => null
      }
      case REGEX_LIKE =>
        if (l == null || r == null) null
        else java.util.regex.Pattern.compile(r.toString).matcher(l.toString).find()
      case SIZE_IS => binary(EQUALS, unary(UnaryOp.SIZE_OF, l), r)

      case ADD | SUB | MUL | DIV | MOD => arith(op, l, r)
    }
  }

  private def scalarOf(op: BinOp.Value): BinOp.Value = {
    import BinOp._
    op match {
      case EQUALS_ANY | EQUALS_ALL                       => EQUALS
      case NOT_EQUALS_ANY | NOT_EQUALS_ALL               => NOT_EQUALS
      case GREATER_THAN_ANY | GREATER_THAN_ALL           => GREATER_THAN
      case LESS_THAN_ANY | LESS_THAN_ALL                 => LESS_THAN
      case GREATER_OR_EQUALS_ANY | GREATER_OR_EQUALS_ALL => GREATER_OR_EQUALS
      case LESS_OR_EQUALS_ANY | LESS_OR_EQUALS_ALL       => LESS_OR_EQUALS
      case other                                         => other
    }
  }

  private def nary(op: NAryOp.Value, xs: Seq[Expr], r: Rec): Any = {
    import NAryOp._
    op match {
      case AND => xs.map(eval(_, r)).reduce((a, b) => binary(BinOp.AND, a, b))
      case OR  => xs.map(eval(_, r)).reduce((a, b) => binary(BinOp.OR, a, b))
      case IF  =>
        if (eval(xs(0), r) == true) eval(xs(1), r) else eval(xs(2), r)
      case BETWEEN =>
        val v = eval(xs(0), r)
        binary(BinOp.AND,
          binary(BinOp.GREATER_OR_EQUALS, v, eval(xs(1), r)),
          binary(BinOp.LESS_OR_EQUALS, v, eval(xs(2), r)))
      case NOT_BETWEEN =>
        unary(UnaryOp.NOT, nary(BETWEEN, xs, r))
      case SUBSTRING =>
        val s = eval(xs(0), r)
        if (s == null) null
        else {
          val str = s.toString
          val pos = numeric(eval(xs(1), r)).map(e => e.fold(identity, _.toLong).toInt).getOrElse(1)
          val len =
            if (xs.length >= 3)
              numeric(eval(xs(2), r)).map(e => e.fold(identity, _.toLong).toInt).getOrElse(str.length)
            else str.length
          // Spark substringSQL: 1-based; negative pos counts from the end
          // UNCLAMPED — the length window is applied before clamping, so
          // substring('hello', -7, 3) is "h", not "hel"
          val start = if (pos > 0) pos - 1 else if (pos < 0) str.length + pos else 0
          val end = start.toLong + math.max(len, 0)
          val from = math.max(start, 0)
          val until = math.min(str.length.toLong, math.max(end, 0L)).toInt
          if (until <= from) "" else str.substring(from, until)
        }
      case UNIX_TIMESTAMP =>
        throw new IllegalArgumentException(
          "UNIX_TIMESTAMP is not supported in streaming post-aggregations")
    }
  }
}
