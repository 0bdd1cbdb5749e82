package graft.streaming

/** Minimal JSON rendering for Clip envelopes (string keys, primitive or
  * raw-JSON values). Records produced by the engine are already JSON
  * object strings; [[Raw]] embeds them without re-escaping. */
object Json {
  final case class Raw(json: String)

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  def render(v: Any): String = v match {
    case null            => "null"
    case Raw(j)          => j
    case s: String       => "\"" + escape(s) + "\""
    case b: Boolean      => b.toString
    case d: Double       => if (d.isNaN || d.isInfinite) "\"" + d.toString + "\"" else d.toString
    case n: Number       => n.toString
    // scala.collection.Map: matches mutable maps too (PostAggEval parses
    // nested JSON objects into LinkedHashMap — a plain `Map[_, _]` pattern
    // is immutable-only and would fall through to the Iterable tuple case)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => render(k.toString) + ":" + render(x) }.mkString("{", ",", "}")
    case xs: Iterable[_] => xs.map(render).mkString("[", ",", "]")
    case other           => render(other.toString)
  }

  def obj(fields: (String, Any)*): String =
    fields.map { case (k, v) => render(k) + ":" + render(v) }.mkString("{", ",", "}")
}

/** Lifecycle signals — reference Metadata.Signal (QueryBolt.java:98-112). */
object Signal extends Enumeration {
  val COMPLETE, KILL, FAIL = Value
}

/**
 * Result envelope: `{meta, records}` — reference Clip (JoinBolt.java:270-273)
 * with the Meta concepts of JoinBoltTest.java:524-616 (query id, receive and
 * finish times, signal, errors, sketch-estimation metadata).
 *
 * @param records JSON object strings, embedded verbatim.
 */
final case class Clip(queryId: String, meta: Map[String, Any], records: Seq[String]) {
  def signal: Option[String] = meta.get("signal").map(_.toString)
  def asJson: String =
    Json.obj(
      "meta" -> meta,
      "records" -> records.map(Json.Raw))
}
