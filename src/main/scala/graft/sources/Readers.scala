package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File readers (SURVEY.md §2 A4-A7).
  *
  * The reference downloads each object to a temp file and parses it
  * with pandas one at a time (reference: etl_pipeline.py:355-377).
  * Spark reads the whole file *set* as one distributed scan — gzip
  * (`.csv.gz`) is decoded transparently by extension, schema comes
  * from inference or a supplied schema, and `source_file` tagging
  * (etl_pipeline.py:389) is the codegen'd `input_file_name()` instead
  * of a per-frame python assignment.
  */
object Readers {

  /** Consistent CSV options for write+read roundtrips: explicit quote
    * and escape so embedded quotes/commas/JSON survive. */
  val csvOptions: Map[String, String] = Map(
    "header" -> "true",
    "quote" -> "\"",
    "escape" -> "\"",
    "multiLine" -> "false")

  /** CSV / CSV.gz reader. `paths` may mix plain and gzipped files —
    * Spark picks the codec per file from the extension. */
  def csv(spark: SparkSession, paths: Seq[String],
          inferSchema: Boolean = true,
          schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.options(csvOptions)
    val r2 = schema.map(r.schema).getOrElse(r.option("inferSchema", inferSchema.toString))
    r2.csv(paths: _*)
  }

  /** CSV ingest with row-level quarantine (A4b): PERMISSIVE parse
    * into a declared schema plus a corrupt-record column, split into
    * (good, quarantined). The reference dropped a whole file on any
    * parse error (etl_pipeline.py:375-377); here bad ROWS are
    * preserved for inspection and good rows still load. The frame is
    * cached before the split — Spark forbids filtering on the
    * internal corrupt-record column of a streaming-read plan
    * otherwise, and the split would double-parse anyway. */
  def csvWithQuarantine(spark: SparkSession, paths: Seq[String],
                        schema: org.apache.spark.sql.types.StructType):
      (DataFrame, DataFrame) = {
    val (good, bad, _) = csvWithQuarantineCached(spark, paths, schema)
    (good, bad)
  }

  /** [[csvWithQuarantine]] plus the underlying cached permissive
    * parse, so a caller that materializes both splits can
    * `parsed.unpersist()` when done. A caller that re-reads the SAME
    * path in one JVM must unpersist (or use a fresh path): an
    * `overwrite` write to a path with a live cached read triggers
    * CacheManager's recache at a moment when side-files written after
    * the Spark write are absent, leaving the cache stale. */
  def csvWithQuarantineCached(spark: SparkSession, paths: Seq[String],
                              schema: org.apache.spark.sql.types.StructType):
      (DataFrame, DataFrame, DataFrame) = {
    val corrupt = "_corrupt_record"
    val parsed = spark.read.options(csvOptions)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .schema(schema.add(corrupt, org.apache.spark.sql.types.StringType))
      .csv(paths: _*)
      .cache()
    (parsed.filter(col(corrupt).isNull).drop(corrupt),
      parsed.filter(col(corrupt).isNotNull).select(col(corrupt)), parsed)
  }

  /** Tag each row with the basename of the file it came from
    * (reference: etl_pipeline.py:389 `df['source_file'] = basename`). */
  def withSourceFile(df: DataFrame): DataFrame =
    df.withColumn("source_file",
      element_at(split(input_file_name(), "/"), -1))

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Schema-evolved parquet read: union the schemas of all footers
    * (columns added over time come back null-padded for old files) —
    * the parquet-level form of the reference's disjoint-column merge
    * (etl_pipeline.py:413-418). Off by default in Spark because footer
    * merging costs a distributed job, which is exactly why it's an
    * explicit reader here. */
  def parquetMergedSchema(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  def json(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.json(paths: _*)

  /** JDBC (PostgreSQL) source — partitioned parallel read. No database
    * ships in this container, so this builds the reader config; the
    * option map is unit-tested. */
  def jdbc(spark: SparkSession, url: String, table: String,
           user: String, password: String,
           partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("fetchsize", "10000")
    val withPart = partitionColumn match {
      case Some((colName, lower, upper, n)) => base
        .option("partitionColumn", colName)
        .option("lowerBound", lower.toString)
        .option("upperBound", upper.toString)
        .option("numPartitions", n.toString)
      case None => base
    }
    withPart.load()
  }

  /** The JDBC option map alone (testable without a server). */
  def jdbcOptions(url: String, table: String, user: String, password: String,
                  partitionColumn: Option[(String, Long, Long, Int)] = None): Map[String, String] = {
    val base = Map(
      "url" -> url, "dbtable" -> table, "user" -> user,
      "password" -> password, "fetchsize" -> "10000")
    partitionColumn.map { case (c, lo, hi, n) =>
      base ++ Map("partitionColumn" -> c, "lowerBound" -> lo.toString,
        "upperBound" -> hi.toString, "numPartitions" -> n.toString)
    }.getOrElse(base)
  }
}
