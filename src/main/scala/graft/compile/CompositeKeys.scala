package graft.compile

import com.fasterxml.jackson.databind.ObjectMapper

/** Driver-side parsing of the JSON-array composite keys produced by
  * [[QueryCompiler.compositeKey]] (jackson is on the Spark classpath). */
object CompositeKeys {
  private val mapper = new ObjectMapper()
  def parse(key: String): Seq[String] = {
    val node = mapper.readTree(key)
    (0 until node.size()).map { i =>
      val n = node.get(i)
      if (n.isNull) "null" else n.asText()
    }
  }
}
