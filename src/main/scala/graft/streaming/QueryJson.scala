package graft.streaming

import graft.model._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import scala.jdk.CollectionConverters._

/**
 * JSON codec for [[QuerySpec]] — queries travel as data on the control
 * plane (the reference's PubSubMessage JSON queries, QuerySpout.java:
 * 113-148). Round-trips: `parse(render(spec)) == spec`, so the registry
 * can be checkpointed/replayed as JSON lines.
 *
 * Expression nodes:
 *   {"field": "f"[, "subfield": "k"]}            column reference
 *   {"value": <string|number|bool|null>}          typed literal
 *   {"list": [<expr>...]}                         literal list
 *   {"op": "<UnaryOp>", "operand": <expr>}        unary
 *   {"op": "CAST", "operand": <expr>, "to": "T"}  cast
 *   {"op": "<BinOp>", "left": ..., "right": ...}  binary
 *   {"op": "<NAryOp>", "operands": [...]}         n-ary
 */
object QueryJson {
  private val mapper = new ObjectMapper()

  // ---------------------------------------------------------------- parse

  def parse(json: String): QuerySpec = parseSpec(mapper.readTree(json))

  def parseSpec(n: JsonNode): QuerySpec = QuerySpec(
    id = req(n, "id").asText(),
    filter = opt(n, "filter").map(parseExpr),
    projection = opt(n, "projection").map(_.elements().asScala.toSeq.map { f =>
      req(f, "name").asText() -> parseExpr(req(f, "expr"))
    }),
    aggregation = opt(n, "aggregation").map(parseAgg).getOrElse(Raw()),
    window = opt(n, "window").map(parseWindow),
    durationMs = opt(n, "durationMs").map(_.asLong()).getOrElse(10000L),
    postAggregations = opt(n, "postAggregations")
      .map(_.elements().asScala.toSeq.map(parsePost)).getOrElse(Nil),
    rateLimitMaxEmit = opt(n, "rateLimitMaxEmit").map(_.asLong()))

  def parseExpr(n: JsonNode): Expr =
    if (n.has("field"))
      Field(n.get("field").asText(), opt(n, "subfield").map(_.asText()))
    else if (n.has("value")) Lit(literal(n.get("value")))
    else if (n.has("list"))
      ListExpr(n.get("list").elements().asScala.toSeq.map(parseExpr))
    else if (n.has("op")) {
      val op = req(n, "op").asText()
      if (op == "CAST")
        Cast(parseExpr(req(n, "operand")), FieldType.withName(req(n, "to").asText()))
      else if (op == "EXPLODE")
        Explode(parseExpr(req(n, "operand")))
      else if (op == "ELEMENT_AT") {
        val k = req(n, "key")
        ElementAt(parseExpr(req(n, "operand")),
          if (k.isIntegralNumber) k.asInt() else k.asText())
      }
      else if (n.has("operand"))
        Unary(UnaryOp.withName(op), parseExpr(n.get("operand")))
      else if (n.has("left"))
        Binary(parseExpr(req(n, "left")), parseExpr(req(n, "right")), BinOp.withName(op))
      else
        NAry(NAryOp.withName(op),
          req(n, "operands").elements().asScala.toSeq.map(parseExpr))
    }
    else throw new IllegalArgumentException(s"unrecognized expression node: $n")

  private def literal(v: JsonNode): Any =
    if (v.isNull) null
    else if (v.isBoolean) v.asBoolean()
    else if (v.isIntegralNumber) v.asLong()
    else if (v.isNumber) v.asDouble()
    else v.asText()

  private def parseOps(n: JsonNode): Seq[GroupOp] =
    n.elements().asScala.toSeq.map { o =>
      GroupOp(GroupOpType.withName(req(o, "op").asText()),
        opt(o, "field").map(_.asText()), req(o, "name").asText())
    }

  private def parseFieldPairs(n: JsonNode): Seq[(String, String)] =
    n.elements().asScala.toSeq.map { f =>
      val name = req(f, "field").asText()
      name -> opt(f, "as").map(_.asText()).getOrElse(name)
    }

  def parseAgg(n: JsonNode): Aggregation = req(n, "type").asText() match {
    case "RAW" => Raw(opt(n, "size").map(_.asInt()).getOrElse(500))
    case "GROUP_ALL" => GroupAll(parseOps(req(n, "ops")))
    case "GROUP_BY" => GroupBy(parseFieldPairs(req(n, "fields")),
      parseOps(req(n, "ops")), opt(n, "entries").map(_.asInt()).getOrElse(512))
    case "COUNT_DISTINCT" => CountDistinct(
      req(n, "fields").elements().asScala.toSeq.map(_.asText()),
      opt(n, "name").map(_.asText()).getOrElse("count"),
      opt(n, "lgK").map(_.asInt()).getOrElse(17))
    case "DISTRIBUTION" =>
      // three point forms (bullet-core Manual/Linear/RegionDistribution):
      // explicit "points", "numPoints" (LINEAR), or start/end/increment
      // (REGION — expanded to explicit points here, they are static)
      val regionPoints = (opt(n, "start"), opt(n, "end"), opt(n, "increment")) match {
        case (Some(s), Some(e), Some(i)) =>
          regionToPoints(s.asDouble(), e.asDouble(), i.asDouble())
        case _ => Nil
      }
      val explicit = opt(n, "points")
        .map(_.elements().asScala.toSeq.map(_.asDouble())).getOrElse(Nil)
      Distribution(req(n, "field").asText(),
        DistributionType.withName(req(n, "dtype").asText()),
        if (explicit.nonEmpty) explicit else regionPoints,
        opt(n, "k").map(_.asInt()).getOrElse(2048),
        opt(n, "numPoints").map(_.asInt()))
    case "TOP_K" => TopK(parseFieldPairs(req(n, "fields")),
      req(n, "k").asInt(),
      opt(n, "countName").map(_.asText()).getOrElse("count"),
      opt(n, "threshold").map(_.asLong()),
      opt(n, "maxMapSize").map(_.asInt()).getOrElse(1024))
    case other => throw new IllegalArgumentException(s"unknown aggregation type: $other")
  }

  def parseWindow(n: JsonNode): WindowSpec = WindowSpec(
    WindowUnit.withName(req(n, "emitUnit").asText()),
    req(n, "emitEvery").asLong(),
    opt(n, "includeUnit").map(u => WindowUnit.withName(u.asText()))
      .getOrElse(WindowUnit.withName(req(n, "emitUnit").asText())),
    opt(n, "includeFirst").map(_.asLong()).getOrElse(0L))

  def parsePost(n: JsonNode): PostAggregation = req(n, "type").asText() match {
    case "HAVING" => Having(parseExpr(req(n, "expr")))
    case "ORDER_BY" => OrderBy(n.get("fields").elements().asScala.toSeq.map { f =>
      req(f, "field").asText() -> opt(f, "ascending").forall(_.asBoolean())
    })
    case "COMPUTATION" => Computation(n.get("fields").elements().asScala.toSeq.map { f =>
      req(f, "name").asText() -> parseExpr(req(f, "expr"))
    })
    case "CULLING" => Culling(n.get("names").elements().asScala.toSeq.map(_.asText()))
    case other => throw new IllegalArgumentException(s"unknown post-aggregation: $other")
  }

  /** REGION points: start, start+inc, … ≤ end (multiplicative stepping —
    * repeated addition drifts). Capped at 10,000 points: a single
    * control-plane message must not be able to allocate an unbounded Seq
    * on the driver (the reference caps distribution points via config). */
  def regionToPoints(start: Double, end: Double, inc: Double): Seq[Double] = {
    require(inc > 0, "REGION increment must be positive")
    require(end >= start, "REGION end must be >= start")
    val steps = (end - start) / inc
    // the expansion yields n+1 points (0 to n inclusive) and validate()
    // rejects > 10000 points — the cap must be checked against the SAME
    // floored n the expansion uses, or a float ratio landing fractionally
    // above 9999 (end/inc rounding) is rejected despite generating exactly
    // the permitted count. Floored as a double first: a pathological
    // end/inc could overflow Int before the cap check.
    val nD = math.floor(steps + 1e-9)
    require(nD + 1 <= 10000, s"REGION would generate ${nD.toLong + 1} points; cap is 10000")
    val n = nD.toInt
    (0 to n).map(i => start + i * inc)
  }

  private def req(n: JsonNode, f: String): JsonNode = {
    val v = n.get(f)
    if (v == null) throw new IllegalArgumentException(s"missing field '$f' in $n")
    v
  }
  private def opt(n: JsonNode, f: String): Option[JsonNode] =
    Option(n.get(f)).filterNot(_.isNull)

  // --------------------------------------------------------------- render

  def render(spec: QuerySpec): String = mapper.writeValueAsString(renderSpec(spec))

  def renderSpec(spec: QuerySpec): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("id", spec.id)
    spec.filter.foreach(f => n.set[JsonNode]("filter", renderExpr(f)))
    spec.projection.foreach { fields =>
      val arr = n.putArray("projection")
      fields.foreach { case (name, e) =>
        val f = arr.addObject(); f.put("name", name); f.set[JsonNode]("expr", renderExpr(e))
      }
    }
    n.set[JsonNode]("aggregation", renderAgg(spec.aggregation))
    spec.window.foreach { w =>
      val wn = n.putObject("window")
      wn.put("emitUnit", w.emitUnit.toString); wn.put("emitEvery", w.emitEvery)
      wn.put("includeUnit", w.includeUnit.toString); wn.put("includeFirst", w.includeFirst)
    }
    n.put("durationMs", spec.durationMs)
    if (spec.postAggregations.nonEmpty) {
      val arr = n.putArray("postAggregations")
      spec.postAggregations.foreach(p => arr.add(renderPost(p)))
    }
    spec.rateLimitMaxEmit.foreach(n.put("rateLimitMaxEmit", _))
    n
  }

  def renderExpr(e: Expr): ObjectNode = {
    val n = mapper.createObjectNode()
    e match {
      case Field(f, sub) => n.put("field", f); sub.foreach(n.put("subfield", _))
      case Lit(v) => v match {
        case null       => n.putNull("value")
        case s: String  => n.put("value", s)
        case i: Int     => n.put("value", i.toLong)
        case l: Long    => n.put("value", l)
        case d: Double  => n.put("value", d)
        case f: Float   => n.put("value", f.toDouble)
        case b: Boolean => n.put("value", b)
        case other      => n.put("value", other.toString)
      }
      case ListExpr(items) =>
        val arr = n.putArray("list"); items.foreach(i => arr.add(renderExpr(i)))
      case Cast(op, to) =>
        n.put("op", "CAST"); n.set[JsonNode]("operand", renderExpr(op)); n.put("to", to.toString)
      case Explode(op) =>
        n.put("op", "EXPLODE"); n.set[JsonNode]("operand", renderExpr(op))
      case ElementAt(base, key) =>
        n.put("op", "ELEMENT_AT"); n.set[JsonNode]("operand", renderExpr(base))
        key match {
          case i: Int  => n.put("key", i)
          case other   => n.put("key", other.toString)
        }
      case Unary(op, x) =>
        n.put("op", op.toString); n.set[JsonNode]("operand", renderExpr(x))
      case Binary(l, r, op) =>
        n.put("op", op.toString)
        n.set[JsonNode]("left", renderExpr(l)); n.set[JsonNode]("right", renderExpr(r))
      case NAry(op, xs) =>
        n.put("op", op.toString)
        val arr = n.putArray("operands"); xs.foreach(x => arr.add(renderExpr(x)))
    }
    n
  }

  private def renderOps(arr: ArrayNode, ops: Seq[GroupOp]): Unit =
    ops.foreach { op =>
      val o = arr.addObject()
      o.put("op", op.op.toString); op.field.foreach(o.put("field", _)); o.put("name", op.name)
    }

  private def renderFieldPairs(arr: ArrayNode, fields: Seq[(String, String)]): Unit =
    fields.foreach { case (f, as) =>
      val o = arr.addObject(); o.put("field", f); o.put("as", as)
    }

  def renderAgg(agg: Aggregation): ObjectNode = {
    val n = mapper.createObjectNode()
    agg match {
      case Raw(size) => n.put("type", "RAW"); n.put("size", size)
      case GroupAll(ops) =>
        n.put("type", "GROUP_ALL"); renderOps(n.putArray("ops"), ops)
      case GroupBy(fields, ops, entries) =>
        n.put("type", "GROUP_BY")
        renderFieldPairs(n.putArray("fields"), fields)
        renderOps(n.putArray("ops"), ops); n.put("entries", entries)
      case CountDistinct(fields, name, lgK) =>
        n.put("type", "COUNT_DISTINCT")
        val arr = n.putArray("fields"); fields.foreach(arr.add)
        n.put("name", name); n.put("lgK", lgK)
      case Distribution(field, dtype, points, k, numPoints) =>
        n.put("type", "DISTRIBUTION"); n.put("field", field)
        n.put("dtype", dtype.toString)
        if (points.nonEmpty) { val arr = n.putArray("points"); points.foreach(arr.add) }
        n.put("k", k)
        numPoints.foreach(n.put("numPoints", _))
      case TopK(fields, k, countName, threshold, maxMapSize) =>
        n.put("type", "TOP_K")
        renderFieldPairs(n.putArray("fields"), fields)
        n.put("k", k); n.put("countName", countName)
        threshold.foreach(n.put("threshold", _)); n.put("maxMapSize", maxMapSize)
    }
    n
  }

  def renderPost(p: PostAggregation): ObjectNode = {
    val n = mapper.createObjectNode()
    p match {
      case Having(e) => n.put("type", "HAVING"); n.set[JsonNode]("expr", renderExpr(e))
      case OrderBy(fields) =>
        n.put("type", "ORDER_BY")
        val arr = n.putArray("fields")
        fields.foreach { case (f, asc) =>
          val o = arr.addObject(); o.put("field", f); o.put("ascending", asc)
        }
      case Computation(fields) =>
        n.put("type", "COMPUTATION")
        val arr = n.putArray("fields")
        fields.foreach { case (name, e) =>
          val o = arr.addObject(); o.put("name", name); o.set[JsonNode]("expr", renderExpr(e))
        }
      case Culling(names) =>
        n.put("type", "CULLING")
        val arr = n.putArray("names"); names.foreach(arr.add)
    }
    n
  }

  // ------------------------------------------------------ control messages

  /** Control message: {"type":"REGISTER","query":{...}[,"queryString":"…"]}
    * or {"type":"KILL","id":"..."}. `queryString` is free-form original
    * query text echoed via the QUERY_STRING Meta concept. */
  def parseMessage(json: String): ControlMessage = {
    val n = mapper.readTree(json)
    req(n, "type").asText() match {
      case "REGISTER" => RegisterQuery(parseSpec(req(n, "query")),
        opt(n, "queryString").map(_.asText()))
      // BQL text submission — the reference's primary user surface (a BQL
      // string through the PubSub): parse here so a malformed query
      // surfaces as the standard error Clip, and the original text rides
      // along as the queryString for QUERY_STRING result metadata. Parse
      // failures carry the SUBMITTED id so the error clip is attributed
      // to the query the client is watching, not "unknown".
      case "REGISTER_BQL" =>
        val id = req(n, "id").asText()
        val bql = req(n, "bql").asText()
        val spec =
          try graft.bql.Bql.parse(bql, id)
          catch { case e: Exception => throw new BqlParseException(id, e) }
        RegisterQuery(spec, Some(bql))
      case "KILL"     => KillQuery(req(n, "id").asText())
      case other => throw new IllegalArgumentException(s"unknown message type: $other")
    }
  }
}

sealed trait ControlMessage
final case class RegisterQuery(spec: QuerySpec,
                               queryString: Option[String] = None) extends ControlMessage
final case class KillQuery(id: String) extends ControlMessage

/** A REGISTER_BQL whose BQL text failed to parse — carries the submitted
  * query id so the error clip can be attributed to it. */
final class BqlParseException(val queryId: String, cause: Throwable)
    extends IllegalArgumentException(
      s"BQL parse failed: ${Option(cause.getMessage).getOrElse(cause.toString)}", cause)
