package graft.compile

import graft.model._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Compiles the engine-agnostic [[graft.model.Expr]] AST into Catalyst
 * [[Column]] trees. Pure function — no SparkSession needed; everything stays
 * inside whole-stage codegen (built-in functions only, zero UDFs).
 *
 * Semantics notes (reference parity):
 *  - Map-subfield access `Field(f, Some(k))` compiles to `col(f)(k)` which
 *    Catalyst resolves for both MapType and StructType columns
 *    (reference FieldExpression(field, subfield), FilterBoltTest.java:269).
 *  - Missing fields / null values follow Spark three-valued logic; the
 *    reference's typed-null behavior matches (a filter on a missing field
 *    does not match).
 */
object ExprCompiler {

  def compile(e: Expr): Column = compile(e, None)

  /** Compile with an optional input schema. The schema drives type dispatch
    * for the few ops whose Spark builtin differs by operand type (SIZE_OF,
    * CONTAINS_VALUE); everything else is type-agnostic. */
  def compile(e: Expr, schema: Option[StructType]): Column = e match {
    // A field the record lacks evaluates as a typed null, NOT an analysis
    // error — the reference's schemaless-record semantics (missing field
    // `B` groups as the string "null", FilterBoltTest.java:827-828). Only
    // possible when a schema is supplied; schemaless compile keeps the
    // plain column reference.
    case Field(name, _) if schema.exists(!_.fieldNames.contains(name)) => lit(null)
    case Field(name, None)      => col(name)
    case Field(name, Some(sub)) => col(name)(sub)
    case Lit(null)              => lit(null)
    case Lit(v)                 => lit(v)
    case ListExpr(items)        => array(items.map(compile(_, schema)): _*)
    case Cast(op, to)           => compile(op, schema).cast(sparkType(to))
    case Explode(op)            => explode(compile(op, schema))
    // 0-based list index via null-tolerant get() (out-of-bounds → typed
    // null, matching the reference's missing-field semantics); map/struct
    // keys via getItem (missing key → null)
    case ElementAt(base, key)   => key match {
      case i: Int => get(compile(base, schema), lit(i))
      case k      => compile(base, schema).getItem(k)
    }
    case Unary(op, x)           => compileUnary(op, compile(x, schema), x, schema)
    case Binary(l, r, op)       => compileBinary(compile(l, schema), l, r, op, schema)
    case NAry(op, xs)           => compileNAry(op, xs, schema)
  }

  /** Best-effort static type of an expression against the input schema. */
  def resolvedType(e: Expr, schema: Option[StructType]): Option[DataType] = e match {
    case Field(name, None) =>
      schema.flatMap(_.find(_.name == name)).map(_.dataType)
    case Field(name, Some(sub)) =>
      schema.flatMap(_.find(_.name == name)).map(_.dataType).flatMap {
        case MapType(_, vt, _)  => Some(vt)
        case st: StructType     => st.find(_.name == sub).map(_.dataType)
        case _                  => None
      }
    case Lit(_: String)  => Some(StringType)
    case Lit(_: Int)     => Some(IntegerType)
    case Lit(_: Long)    => Some(LongType)
    case Lit(_: Double)  => Some(DoubleType)
    case Lit(_: Boolean) => Some(BooleanType)
    case ListExpr(items) =>
      Some(ArrayType(items.headOption.flatMap(resolvedType(_, schema)).getOrElse(StringType)))
    case Cast(_, to) => Some(sparkType(to))
    case _           => None
  }

  def sparkType(t: FieldType.Value): DataType = t match {
    case FieldType.STRING    => StringType
    case FieldType.INTEGER   => IntegerType
    case FieldType.LONG      => LongType
    case FieldType.FLOAT     => FloatType
    case FieldType.DOUBLE    => DoubleType
    case FieldType.BOOLEAN   => BooleanType
    case FieldType.TIMESTAMP => TimestampType
  }

  private def compileUnary(op: UnaryOp.Value, c: Column, raw: Expr,
                           schema: Option[StructType]): Column = {
    import UnaryOp._
    op match {
      case NOT         => !c
      case IS_NULL     => c.isNull
      case IS_NOT_NULL => c.isNotNull
      // SIZE_OF: lists/maps → element count via size(); strings (and
      // unresolvable types) → character length. Dispatch on the resolved
      // schema type, falling back to AST shape for literal lists.
      case SIZE_OF     => resolvedType(raw, schema) match {
        case Some(_: ArrayType) | Some(_: MapType) => size(c)
        case None if raw.isInstanceOf[ListExpr]    => size(c)
        case _                                     => length(c.cast(StringType))
      }
      case TRIM        => trim(c)
      case LOWER       => lower(c)
      case UPPER       => upper(c)
      case ABS         => abs(c)
    }
  }

  /** For the ANY/ALL families the right side must be a list expression;
    * `exists`/`forall` keep evaluation inside codegen'd higher-order funcs. */
  private def compileBinary(l: Column, leftExpr: Expr, rightExpr: Expr,
                            op: BinOp.Value, schema: Option[StructType]): Column = {
    import BinOp._
    lazy val r = compile(rightExpr, schema)
    def anyOf(f: (Column, Column) => Column): Column = exists(r, x => f(l, x))
    def allOf(f: (Column, Column) => Column): Column = forall(r, x => f(l, x))
    op match {
      case EQUALS            => l === r
      case NOT_EQUALS        => l =!= r
      case GREATER_THAN      => l > r
      case LESS_THAN         => l < r
      case GREATER_OR_EQUALS => l >= r
      case LESS_OR_EQUALS    => l <= r

      case EQUALS_ANY            => anyOf(_ === _)
      case EQUALS_ALL            => allOf(_ === _)
      case NOT_EQUALS_ANY        => anyOf(_ =!= _)
      case NOT_EQUALS_ALL        => allOf(_ =!= _)
      case GREATER_THAN_ANY      => anyOf(_ > _)
      case GREATER_THAN_ALL      => allOf(_ > _)
      case LESS_THAN_ANY         => anyOf(_ < _)
      case LESS_THAN_ALL         => allOf(_ < _)
      case GREATER_OR_EQUALS_ANY => anyOf(_ >= _)
      case GREATER_OR_EQUALS_ALL => allOf(_ >= _)
      case LESS_OR_EQUALS_ANY    => anyOf(_ <= _)
      case LESS_OR_EQUALS_ALL    => allOf(_ <= _)

      case AND => l && r
      case OR  => l || r
      case XOR => l =!= r // boolean xor

      case IN             => array_contains(r, l)
      case NOT_IN         => !array_contains(r, l)
      case CONTAINS_KEY   => map_contains_key(l, r)
      // CONTAINS_VALUE applies to both list and map fields in the reference;
      // dispatch on the resolved type (map without a schema stays the default
      // since map-subfield access is the only evidenced use).
      case CONTAINS_VALUE => resolvedType(leftExpr, schema) match {
        case Some(_: ArrayType) => array_contains(l, r)
        case _                  => array_contains(map_values(l), r)
      }
      case REGEX_LIKE     => l.rlike(rightExpr match {
        case Lit(s: String) => s
        case _ => throw new IllegalArgumentException("REGEX_LIKE needs a string literal pattern")
      })
      case SIZE_IS        => size(l) === r

      case ADD => l + r
      case SUB => l - r
      case MUL => l * r
      case DIV => l / r
      case MOD => l % r
    }
  }

  private def compileNAry(op: NAryOp.Value, xs: Seq[Expr],
                          schema: Option[StructType]): Column = {
    import NAryOp._
    lazy val cs = xs.map(compile(_, schema))
    op match {
      case AND => cs.reduce(_ && _)
      case OR  => cs.reduce(_ || _)
      case IF  => when(cs(0), cs(1)).otherwise(cs(2))
      case BETWEEN     => cs(0) >= cs(1) && cs(0) <= cs(2)
      case NOT_BETWEEN => !(cs(0) >= cs(1) && cs(0) <= cs(2))
      case SUBSTRING =>
        if (cs.length == 3) substring(cs(0), lit2int(xs(1)), lit2int(xs(2)))
        else cs(0).substr(cs(1), length(cs(0)))
      case UNIX_TIMESTAMP =>
        if (cs.isEmpty) unix_timestamp()
        else unix_timestamp(cs(0))
    }
  }

  private def lit2int(e: Expr): Int = e match {
    case Lit(i: Int)  => i
    case Lit(l: Long) => l.toInt
    case _ => throw new IllegalArgumentException("SUBSTRING pos/len must be int literals")
  }
}
