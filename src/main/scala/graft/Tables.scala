package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated star schema
  * (see TESTDATA.md). Reads are plain `spark.read.parquet` so Catalyst
  * keeps full pushdown/pruning freedom — no caching, no collect.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def df(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = df(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = df(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = df(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = df(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = df(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = df(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = df(s, d, "lineitem")
  /** `events.ts` arrives in whatever physical form the data generator
    * used, normalized here to a µs TimestampType (LTZ) column so every
    * downstream operator sees ONE type:
    *  - parquet TIMESTAMP(NANOS): Spark 4 won't map it to TimestampType;
    *    with `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as
    *    epoch-nanos LongType — integer-divide to µs (ns epochs exceed
    *    double's 2^53).
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ, which watermarks/unix_micros reject — cast to
    *    TimestampType; under the UTC session timezone the wall-clock is
    *    preserved, so values match DuckDB's naive-timestamp reading. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = df(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // the NTZ->LTZ cast is wall-clock-preserving ONLY under a UTC
        // session timezone; a caller with any other tz would silently
        // shift every ts and diverge from the naive-timestamp oracle —
        // fail loudly instead
        val tz = s.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"Tables.events requires spark.sql.session.timeZone=UTC to cast " +
          s"TIMESTAMP_NTZ wall-clocks losslessly (session has '$tz')")
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = df(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = df(s, d, "embeddings")
}
