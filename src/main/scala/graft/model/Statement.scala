package graft.model

import org.apache.spark.sql.types._

/** The atomic fact record of the engine: one (entity, property, value)
  * assertion with full provenance.
  *
  * Modeled on the reference's Statement
  * (zavod/zavod/context.py:645-666, zavod/zavod/entity.py:76-85):
  * all values are strings; typing lives in the property metadata
  * ([[FtmModel]]), not in the Spark schema. This is the engine's single
  * fact table — every downstream product is a plan over it.
  */
final case class Statement(
    id: String,            // content hash of the statement (dedup key)
    entityId: String,      // source-scoped entity ID
    canonicalId: String,   // post-resolution cluster ID
    prop: String,          // property name; Statement.Base marks entity existence
    schema: String,        // schema name (Person, Company, Ownership, ...)
    value: String,         // cleaned string value
    dataset: String,       // emitting dataset
    lang: String,          // ISO 639-2 language of the value
    origin: String,        // provenance tag
    originalValue: String, // pre-cleaning raw value
    firstSeen: java.sql.Timestamp,
    lastSeen: java.sql.Timestamp,
    external: Boolean      // true => enrichment candidate, excluded from default exports
)

object Statement {
  /** Sentinel property marking entity existence
    * (zavod/zavod/exporters/statements.py:24-25). */
  val Base = "id"

  /** Fixed columnar schema for the statement fact table. */
  val sparkSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("entityId", StringType, nullable = false),
    StructField("canonicalId", StringType, nullable = true),
    StructField("prop", StringType, nullable = false),
    StructField("schema", StringType, nullable = false),
    StructField("value", StringType, nullable = true),
    StructField("dataset", StringType, nullable = false),
    StructField("lang", StringType, nullable = true),
    StructField("origin", StringType, nullable = true),
    StructField("originalValue", StringType, nullable = true),
    StructField("firstSeen", TimestampType, nullable = true),
    StructField("lastSeen", TimestampType, nullable = true),
    StructField("external", BooleanType, nullable = false)
  ))
}
