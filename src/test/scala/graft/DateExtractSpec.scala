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

  // reference get_custom_patterns() conventions (etl_pipeline.py:234-249)
  private val custom = Seq(
    DateExtract.DatePattern("sales_daily",
      "sales_(\\d{4}-\\d{2}-\\d{2})_daily\\.csv", "yyyy-MM-dd"),
    DateExtract.DatePattern("sales_monthly",
      "sales_(\\d{4}-\\d{2})_monthly\\.csv", "yyyy-MM"),
    DateExtract.DatePattern("log_file",
      "app_(\\d{8})_(\\d{6})\\.log", "yyyyMMdd"),
    DateExtract.DatePattern("backup_file",
      "backup_(\\d{4}_\\d{2}_\\d{2}_\\d{2}_\\d{2}_\\d{2})\\.sql",
      "yyyy_MM_dd_HH_mm_ss"))

  test("custom patterns extract; defaults still work through the same call") {
    val m = Seq("sales_2024-01-15_daily.csv", "sales_2024-02_monthly.csv",
        "app_20240115_123045.log", "backup_2024_01_15_12_30_45.sql",
        "report_01-15-2024.pdf", "nodate.txt")
      .toDF("f")
      .select(col("f"), DateExtract.extractDate(col("f"), custom).as("d"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1)).orNull).toMap
    assert(m("sales_2024-01-15_daily.csv") == "2024-01-15")
    assert(m("sales_2024-02_monthly.csv") == "2024-02-01") // parsed yyyy-MM → first of month
    assert(m("app_20240115_123045.log") == "2024-01-15")
    assert(m("backup_2024_01_15_12_30_45.sql") == "2024-01-15")
    assert(m("report_01-15-2024.pdf") == "2024-01-15")     // default us_date fallback
    assert(m("nodate.txt") == null)
  }

  test("custom timestamp keeps the backup convention's time of day") {
    val t = Seq("backup_2024_01_15_12_30_45.sql").toDF("f")
      .select(date_format(DateExtract.extractTimestamp(col("f"), custom),
        "yyyy-MM-dd HH:mm:ss").as("t")).collect()(0).getString(0)
    // the default underscore_date pattern would collapse this to midnight
    assert(t == "2024-01-15 12:30:45")
  }

  test("extractAllDates reports per-pattern matches (the dict form)") {
    val row = Seq("sales_2024-01-15_daily.csv").toDF("f")
      .select(DateExtract.extractAllDates(col("f"), custom).as("all"))
      .select(col("all.sales_daily"), col("all.iso_date"),
        col("all.backup_file"), col("all.compact_date"))
      .collect()(0)
    assert(row.getString(0) == "2024-01-15") // custom convention hit
    assert(row.getString(1) == "2024-01-15") // greedy default also sees it
    assert(row.isNullAt(2))                  // other custom: no match
    assert(row.isNullAt(3))                  // compact_date: no 8-digit run
  }

  test("an invalid custom candidate falls through to the defaults") {
    // sales_daily regex matches but the date is not real → strptime-like
    // fall-through; no default pattern validates month 13 either
    val d = Seq("sales_2024-13-40_daily.csv").toDF("f")
      .select(DateExtract.extractDate(col("f"), custom).as("d"))
      .collect()(0).getString(0)
    assert(d == null)
  }

  // multi-group and computed conventions (etl_pipeline.py:243-248)
  private val composed = Seq(
    DateExtract.DateTimePattern("log_file",
      "app_(\\d{8})_(\\d{6})\\.log", "yyyyMMdd", "HHmmss"),
    DateExtract.QuarterPattern("report_quarterly",
      "report_Q(\\d)_(\\d{4})\\.xlsx"))

  test("log_file composes date and time capture groups into one timestamp") {
    val t = Seq("app_20240115_123045.log").toDF("f")
      .select(date_format(DateExtract.extractTimestamp(col("f"), composed),
        "yyyy-MM-dd HH:mm:ss").as("t")).collect()(0).getString(0)
    // the single-group DatePattern form can only see the date half
    assert(t == "2024-01-15 12:30:45")
  }

  test("report_quarterly computes the quarter's first day; Q5 falls through") {
    val m = Seq("report_Q1_2024.xlsx", "report_Q3_2024.xlsx",
        "report_Q4_1995.xlsx", "report_Q5_2024.xlsx")
      .toDF("f")
      .select(col("f"), DateExtract.extractDate(col("f"), composed).as("d"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1)).orNull).toMap
    assert(m("report_Q1_2024.xlsx") == "2024-01-01")
    assert(m("report_Q3_2024.xlsx") == "2024-07-01")
    assert(m("report_Q4_1995.xlsx") == "1995-10-01")
    assert(m("report_Q5_2024.xlsx") == null) // invalid quarter digit
  }

  test("the dict form carries date_range's end date and the raw unix timestamp") {
    val row = Seq("range_2024-01-15_to_2024-01-20.csv").toDF("f")
      .select(DateExtract.extractAllDates(col("f")).as("all"))
      .select(col("all.date_range"), col("all.date_range_end"),
        col("all.unix_timestamp_raw"))
      .collect()(0)
    assert(row.getString(0) == "2024-01-15") // start (the scalar form's answer)
    assert(row.getString(1) == "2024-01-20") // end (etl_pipeline.py:183)
    assert(row.isNullAt(2))
    val unix = Seq("data_timestamp_1705276800.json").toDF("f")
      .select(DateExtract.extractAllDates(col("f")).as("all"))
      .select(col("all.unix_timestamp_raw"), col("all.unix_timestamp"))
      .collect()(0)
    assert(unix.getLong(0) == 1705276800L)   // raw int (etl_pipeline.py:178)
    assert(unix.getString(1) == "2024-01-15")
  }
}
