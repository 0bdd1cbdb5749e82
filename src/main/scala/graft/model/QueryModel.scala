package graft.model

/**
 * The query model: a Spark-native re-expression of the reference engine's
 * query surface (see SURVEY.md §2).
 *
 * A [[QuerySpec]] is a declarative description of one forward-looking query:
 * an optional filter expression evaluated on the RAW record (before
 * projection — reference: FilterBoltTest.java:349-393), an optional
 * projection (list of named expressions), exactly one aggregation, an
 * optional emission window, optional post-aggregations, and a duration.
 *
 * The AST here is deliberately engine-agnostic data; compilation to Catalyst
 * [[org.apache.spark.sql.Column]] trees lives in [[graft.compile.ExprCompiler]].
 */
sealed trait Expr extends Serializable

/** Column reference, with optional map-subfield / struct-field access.
  * Reference: FieldExpression(field[, subfield]) — FilterBoltTest.java:269-270. */
final case class Field(name: String, subfield: Option[String] = None) extends Expr

/** Typed literal (String/Int/Long/Double/Boolean/null).
  * Reference: ValueExpression — FilterBoltTest.java:330,575,583. */
final case class Lit(value: Any) extends Expr

/** Literal list, for the ANY/ALL membership operations.
  * Reference: ListExpression — FilterBoltTest.java:571-573. */
final case class ListExpr(items: Seq[Expr]) extends Expr

/** Unary operation. Reference: UnaryExpression (bullet-core). */
final case class Unary(op: UnaryOp.Value, operand: Expr) extends Expr

/** Binary operation, arbitrarily nested.
  * Reference: BinaryExpression — FilterBoltTest.java:566-586. */
final case class Binary(left: Expr, right: Expr, op: BinOp.Value) extends Expr

/** N-ary operation (AND/OR/IF and string ops with >2 args). */
final case class NAry(op: NAryOp.Value, operands: Seq[Expr]) extends Expr

/** Explicit cast. Reference: CastExpression — FilterBoltTest.java:579. */
final case class Cast(operand: Expr, to: FieldType.Value) extends Expr

/** Nested extraction with a literal key: map value (`String` key), list
  * element (`Int` index, 0-based as in the reference's type system), or
  * struct field — composable for the full list-of-map / map-of-map lattice
  * (bullet-core FieldExpression(field, index|key[, subkey]), SURVEY §1.2
  * [core-only]). `Field(f, Some(k))` stays the common one-level shorthand. */
final case class ElementAt(base: Expr, key: Any) extends Expr

/** Row generator: one output row per element of a list-valued operand —
  * the reference BQL's EXPLODE/LATERAL VIEW table function (SURVEY §2.10
  * [core-only]). Valid only as a top-level projection item of a RAW batch
  * query (Spark: one Generate per select; the streaming runner rejects it
  * in validate — generators can't ride a struct collector). */
final case class Explode(operand: Expr) extends Expr

object FieldType extends Enumeration {
  val STRING, INTEGER, LONG, FLOAT, DOUBLE, BOOLEAN, TIMESTAMP = Value
}

object BinOp extends Enumeration {
  // comparison (exercised in reference tests — SURVEY §2.2)
  val EQUALS, NOT_EQUALS, GREATER_THAN, LESS_THAN, GREATER_OR_EQUALS,
      LESS_OR_EQUALS = Value
  // list-membership variants (EQUALS_ANY exercised: FilterBoltTest.java:418)
  val EQUALS_ANY, EQUALS_ALL, NOT_EQUALS_ANY, NOT_EQUALS_ALL,
      GREATER_THAN_ANY, GREATER_THAN_ALL, LESS_THAN_ANY, LESS_THAN_ALL,
      GREATER_OR_EQUALS_ANY, GREATER_OR_EQUALS_ALL,
      LESS_OR_EQUALS_ANY, LESS_OR_EQUALS_ALL = Value
  // logic
  val AND, OR, XOR = Value
  // membership / containment [core-only surface]
  val IN, NOT_IN, CONTAINS_KEY, CONTAINS_VALUE, REGEX_LIKE, SIZE_IS = Value
  // arithmetic [core-only surface]
  val ADD, SUB, MUL, DIV, MOD = Value
}

object UnaryOp extends Enumeration {
  val NOT, IS_NULL, IS_NOT_NULL, SIZE_OF, TRIM, LOWER, UPPER, ABS = Value
}

object NAryOp extends Enumeration {
  val AND, OR, IF, BETWEEN, NOT_BETWEEN, SUBSTRING, UNIX_TIMESTAMP = Value
}

// ---------------------------------------------------------------------------
// Aggregations (SURVEY §2.4 — all five reference aggregation types)
// ---------------------------------------------------------------------------

sealed trait Aggregation extends Serializable { def size: Int }

/** RAW: collect up to `size` records (reference JoinBoltTest.java:339-351). */
final case class Raw(size: Int = 500) extends Aggregation

/** One metric of a GROUP aggregation: COUNT / COUNT_FIELD / SUM / MIN / MAX /
  * AVG, with output name. Reference GroupOperation (FilterBoltTest.java:647). */
final case class GroupOp(op: GroupOpType.Value, field: Option[String], name: String)
object GroupOpType extends Enumeration {
  val COUNT, COUNT_FIELD, SUM, MIN, MAX, AVG = Value
}

/** GROUP with no keys: single output record of named metrics. */
final case class GroupAll(ops: Seq[GroupOp]) extends Aggregation { val size = 1 }

/** GROUP BY a key list with per-key rename; key-space capped at `entries`
  * (reference: Tuple-sketch cap, JoinBoltTest.java:738-786; exact ≤ entries). */
final case class GroupBy(fields: Seq[(String, String)], ops: Seq[GroupOp],
                         entries: Int = 512) extends Aggregation {
  def size: Int = entries
}

/** COUNT DISTINCT of a field tuple → one record {name: N}. Theta-sketch
  * backed: exact ≤ 2^lgK nominal entries (FilterBoltTest.java:680-710). */
final case class CountDistinct(fields: Seq[String], name: String = "count",
                               lgK: Int = 17) extends Aggregation { val size = 1 }

object DistributionType extends Enumeration { val QUANTILE, PMF, CDF = Value }

/** DISTRIBUTION: quantile sketch over a numeric field. Three result shapes
  * (FilterBoltTest.java:741-786): QUANTILE → {Value, Quantile}; PMF/CDF →
  * {Range, Probability, Count} with ±∞ end bins. KLL-backed.
  *
  * Points come either explicitly (`points`, the reference's MANUAL form) or
  * generated (`numPoints`, the LINEAR form — FilterBoltTest.java:747 uses
  * numberOfPoints 3): QUANTILE generates evenly spaced ranks in [0, 1];
  * PMF/CDF generate split points evenly spaced between the sketch's min
  * and max AT FINISH (data-dependent, as in bullet-core). */
final case class Distribution(field: String, dtype: DistributionType.Value,
                              points: Seq[Double], k: Int = 2048,
                              numPoints: Option[Int] = None)
    extends Aggregation { val size = 100 }

/** TOP_K frequent-items over a field tuple with renames; optional minimum
  * count `threshold`; count under `countName`; group values stringified and
  * missing → "null" (FilterBoltTest.java:789-832). */
final case class TopK(fields: Seq[(String, String)], k: Int,
                      countName: String = "count", threshold: Option[Long] = None,
                      maxMapSize: Int = 1024) extends Aggregation {
  def size: Int = k
}

// ---------------------------------------------------------------------------
// Windows (SURVEY §2.8 — streaming emission windows, processing-time)
// ---------------------------------------------------------------------------

object WindowUnit extends Enumeration { val RECORD, TIME, ALL = Value }

/** Emission window: emit `every` (ms or records); `include` controls whether
  * state resets on emit (RECORD/TIME include == tumbling/sliding reset; ALL
  * include == additive/cumulative, no reset). Reference Window. */
final case class WindowSpec(emitUnit: WindowUnit.Value, emitEvery: Long,
                            includeUnit: WindowUnit.Value, includeFirst: Long) {
  /** Additive windows accumulate across emissions (no reset). */
  def isAdditive: Boolean = includeUnit == WindowUnit.ALL
}

// ---------------------------------------------------------------------------
// Post-aggregations (SURVEY §2.6 [core-only]: HAVING / ORDER BY /
// COMPUTATION / CULLING, applied to the final micro-result)
// ---------------------------------------------------------------------------

sealed trait PostAggregation extends Serializable
final case class Having(expr: Expr) extends PostAggregation
final case class OrderBy(fields: Seq[(String, Boolean)]) extends PostAggregation // (field, ascending)
final case class Computation(fields: Seq[(String, Expr)]) extends PostAggregation
final case class Culling(names: Seq[String]) extends PostAggregation

// ---------------------------------------------------------------------------
// The query
// ---------------------------------------------------------------------------

/**
 * One registered query.
 *
 * @param id            unique query id (duplicate registration is suppressed —
 *                      FilterBolt.java:117-124)
 * @param filter        WHERE predicate on the RAW record (pre-projection)
 * @param projection    None = passthrough (RAW "SELECT *")
 * @param aggregation   exactly one aggregation
 * @param window        None = windowless (single final result at duration end)
 * @param durationMs    query lifetime from registration
 * @param postAggregations applied in order to each emitted result
 * @param rateLimitMaxEmit  max emitted records per check interval; exceeded →
 *                      RateLimitError + KILL (JoinBolt.java:199-208)
 */
final case class QuerySpec(
    id: String,
    filter: Option[Expr] = None,
    projection: Option[Seq[(String, Expr)]] = None,
    aggregation: Aggregation = Raw(),
    window: Option[WindowSpec] = None,
    durationMs: Long = 10000L,
    postAggregations: Seq[PostAggregation] = Nil,
    rateLimitMaxEmit: Option[Long] = None)
