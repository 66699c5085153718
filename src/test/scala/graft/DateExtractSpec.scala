package graft

import org.apache.spark.sql.functions._
import graft.sources.DateExtract

/** The 11 reference filename patterns (reference: etl_pipeline.py:27-213),
  * exercised one fixture per pattern plus the validation fall-throughs. */
class DateExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(names: String*): Map[String, String] =
    names.toDF("f")
      .select(col("f"), DateExtract.extractDate(col("f")).as("d"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1)).orNull).toMap

  test("all 11 reference patterns extract the expected date") {
    val m = extract(
      "data_2024-01-15T030000_export.csv.gz",   // iso datetime compact
      "log_2024-01-15T03:00:00.txt",            // iso datetime full
      "sales_2024-01-15.csv",                   // iso date
      "backup_01-15-2024_120000.sql",           // us datetime
      "report_01-15-2024.pdf",                  // us date
      "data_20240115.csv",                      // compact date
      "logs_2024_01_15.txt",                    // underscore date
      "analytics.2024.01.15.json",              // dot date
      "archive_2024-01.zip",                    // year-month
      "data_timestamp_1705276800.json",         // unix ts (2024-01-15 UTC)
      "range_2024-01-15_to_2024-01-20.csv")     // date range → start
    assert(m("data_2024-01-15T030000_export.csv.gz") == "2024-01-15")
    assert(m("log_2024-01-15T03:00:00.txt") == "2024-01-15")
    assert(m("sales_2024-01-15.csv") == "2024-01-15")
    assert(m("backup_01-15-2024_120000.sql") == "2024-01-15")
    assert(m("report_01-15-2024.pdf") == "2024-01-15")
    assert(m("data_20240115.csv") == "2024-01-15")
    assert(m("logs_2024_01_15.txt") == "2024-01-15")
    assert(m("analytics.2024.01.15.json") == "2024-01-15")
    assert(m("archive_2024-01.zip") == "2024-01")
    assert(m("data_timestamp_1705276800.json") == "2024-01-15")
    assert(m("range_2024-01-15_to_2024-01-20.csv") == "2024-01-15")
  }

  test("invalid candidates fall through; no pattern → null") {
    val m = extract("junk_99999999.csv", "nodate.txt", "bad_2024-13-40.csv")
    assert(m("junk_99999999.csv") == null)     // 8 digits but not a date
    assert(m("nodate.txt") == null)
    assert(m("bad_2024-13-40.csv") == null)    // month 13 fails ISO and
    // year-month validation, so every candidate falls through
  }

  test("extractTimestamp carries the time component when present") {
    val ts = Seq("data_2024-01-15T030000_x.csv", "sales_2024-01-15.csv")
      .toDF("f")
      .select(col("f"), date_format(DateExtract.extractTimestamp(col("f")),
        "yyyy-MM-dd HH:mm:ss").as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ts("data_2024-01-15T030000_x.csv") == "2024-01-15 03:00:00")
    assert(ts("sales_2024-01-15.csv") == "2024-01-15 00:00:00")
  }
}
