package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.operators.Relational.dsum

/** Semi-structured interchange: XML source/sink (built into Spark 4)
  * and the VARIANT type for shredding-free JSON (SURVEY §2 A9, A10).
  */
object SemiStructured {

  // --------------------------------------------------------------- A9
  /** XML round-trip: write events through the XML sink (one <event>
    * element per row), read back with an EXPLICIT schema — like JSON,
    * XML schema inference is a full extra pass at 100 TB — and
    * aggregate. The oracle recomputes from parquet, so any
    * serialization loss (escaping, numeric text forms, dropped rows)
    * fails the compare. */
  def xmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = s"/tmp/graft_sink/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/events_xml"
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite")
      .option("rootTag", "events").option("rowTag", "event")
      .format("xml").save(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    s.read.schema(schema).option("rowTag", "event").format("xml").load(out)
      .filter(col("event_type") =!= "error")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
  }

  val xmlRoundtripSql: String =
    """SELECT COUNT(*) AS n,
      |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events WHERE event_type <> 'error'""".stripMargin

  // --------------------------------------------------------------- A10
  /** VARIANT ingestion: `parse_json` once into Spark 4's binary
    * semi-structured type, then typed `variant_get` extraction — the
    * shredding-free pattern for ragged JSON at scale (parse cost paid
    * once, extraction is a cheap binary probe, no per-query re-parse
    * of the string). Malformed payloads surface as NULL via
    * try_parse_json instead of failing the batch. */
  def variantExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("v", try_parse_json(col("props")))
      .select(col("event_type"),
        variant_get(col("v"), "$.k", "bigint").as("k"),
        is_variant_null(col("v")).as("vnull"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        sum(when(col("vnull"), 1L).otherwise(0L)).as("n_null"))

  val variantExtractSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(MIN(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k,
      |  CAST(0 AS BIGINT) AS n_null
      |FROM events GROUP BY event_type""".stripMargin
}
