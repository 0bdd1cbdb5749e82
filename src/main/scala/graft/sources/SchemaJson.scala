package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/**
 * DSL-style schema declarations: a JSON `{fields: [{name, type}...]}` list
 * (reference: bullet-dsl schema file, test_dsl_schema.json:1-12) compiled to
 * a Spark StructType, with optional type-check enforcement
 * (bullet.dsl.converter.schema.type.check.enable).
 *
 * In Spark the schema's main job is done by the source itself (parquet/Kafka
 * + from_json are typed); this is the validation surface for schemaless
 * ingestion paths.
 */
object SchemaJson {
  private val mapper = new ObjectMapper()

  def sparkType(name: String): DataType = name.toUpperCase match {
    case "STRING"             => StringType
    case "INTEGER" | "INT"    => IntegerType
    case "LONG"               => LongType
    case "FLOAT"              => FloatType
    case "DOUBLE"             => DoubleType
    case "BOOLEAN"            => BooleanType
    case "TIMESTAMP"          => TimestampType
    case "STRING_MAP"         => MapType(StringType, StringType)
    case "STRING_LIST"        => ArrayType(StringType)
    case other => throw new IllegalArgumentException(s"unknown DSL type: $other")
  }

  /** Parse `{"fields":[{"name":...,"type":...},...]}` (or a bare array). */
  def parseSchema(json: String): StructType = {
    val root = mapper.readTree(json)
    val fields = if (root.isArray) root else root.get("fields")
    StructType(fields.elements().asScala.toSeq.map { f =>
      StructField(f.get("name").asText(), sparkType(f.get("type").asText()))
    })
  }

  /** Type-check a DataFrame against a declared schema: missing columns and
    * type mismatches, as the reference's converter would report. Extra
    * columns are allowed (records are schemaless by default). */
  def typeCheck(df: DataFrame, declared: StructType): Seq[String] = {
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    declared.flatMap { f =>
      actual.get(f.name) match {
        case None => Some(s"missing field '${f.name}'")
        case Some(t) if t != f.dataType =>
          Some(s"field '${f.name}' has type $t, declared ${f.dataType}")
        case _ => None
      }
    }
  }
}
