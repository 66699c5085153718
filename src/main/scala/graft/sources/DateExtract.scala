package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Filename → date extraction (SURVEY.md §2 A2).
  *
  * Re-expresses the reference's `extract_date_from_filename`
  * (reference: etl_pipeline.py:27-213): try each regex pattern in
  * priority order, validate the parsed date, return the first hit.
  *
  * Implementation is a single `coalesce` of codegen'd
  * `regexp_extract`/`to_date` chains — one whole-stage-codegen
  * projection per row, no UDF, so it runs at scan speed over a
  * 100M-file catalog. Invalid candidates (e.g. the `compact_date`
  * pattern grabbing the first 8 digits of a unix timestamp) yield
  * null from `to_date` and fall through, exactly like the
  * reference's strptime try/except (etl_pipeline.py:193-195).
  */
object DateExtract {

  private def ext(c: Column, pattern: String, group: Int = 1): Column = {
    val m = regexp_extract(c, pattern, group)
    when(m =!= "", m)
  }

  /** Validate a yyyy-MM-dd candidate: null unless it parses.
    * `try_to_date`, not `to_date`: under ANSI mode (Spark 4 default) a
    * plausible-looking but invalid candidate (e.g. the compact_date
    * pattern grabbing the first 8 digits of a unix timestamp →
    * "1705-27-68") must fall through like the reference's
    * strptime try/except, not kill the scan. */
  private def validIso(c: Column): Column =
    when(call_function("try_to_date", c, lit("yyyy-MM-dd")).isNotNull, c)

  // The 11 reference patterns (etl_pipeline.py:43-76), same priority.
  private val isoDatetimeCompact = "(\\d{4}-\\d{2}-\\d{2})T(\\d{6})"
  private val isoDatetimeFull    = "(\\d{4}-\\d{2}-\\d{2})T(\\d{2}:\\d{2}:\\d{2})"
  private val isoDate            = "(\\d{4}-\\d{2}-\\d{2})"
  private val usDatetime         = "(\\d{2}-\\d{2}-\\d{4})_(\\d{6})"
  private val usDate             = "(\\d{2}-\\d{2}-\\d{4})"
  private val compactDate        = "(\\d{8})"
  private val underscoreDate     = "(\\d{4}_\\d{2}_\\d{2})"
  private val dotDate            = "(\\d{4}\\.\\d{2}\\.\\d{2})"
  private val yearMonth          = "(\\d{4}-\\d{2})"
  private val unixTimestamp      = "timestamp_(\\d{10})"
  private val dateRange          = "(\\d{4}-\\d{2}-\\d{2})_to_(\\d{4}-\\d{2}-\\d{2})"

  private def usToIso(us: Column): Column = // MM-DD-YYYY → YYYY-MM-DD
    concat(substring(us, 7, 4), lit("-"), substring(us, 1, 2), lit("-"), substring(us, 4, 2))

  private def compactToIso(c: Column): Column = // YYYYMMDD → YYYY-MM-DD
    concat(substring(c, 1, 4), lit("-"), substring(c, 5, 2), lit("-"), substring(c, 7, 2))

  /** ISO date string (or yyyy-MM for the year_month pattern), null if
    * no pattern matches — the reference's `return_format='string'`. */
  def extractDate(filename: Column): Column = coalesce(
    validIso(ext(filename, isoDatetimeCompact)),
    validIso(ext(filename, isoDatetimeFull)),
    validIso(ext(filename, isoDate)),
    validIso(usToIso(ext(filename, usDatetime))),
    validIso(usToIso(ext(filename, usDate))),
    validIso(compactToIso(ext(filename, compactDate))),
    validIso(translate(ext(filename, underscoreDate), "_", "-")),
    validIso(translate(ext(filename, dotDate), ".", "-")),
    // year_month: valid when it parses as yyyy-MM (month 01-12)
    when(call_function("try_to_date", ext(filename, yearMonth), lit("yyyy-MM")).isNotNull,
      ext(filename, yearMonth)),
    date_format(to_timestamp(ext(filename, unixTimestamp).cast("long")), "yyyy-MM-dd"),
    validIso(ext(filename, dateRange)))

  /** Full timestamp where the pattern carries a time component, else
    * midnight of the extracted date — the reference's
    * `return_format='datetime'`. */
  def extractTimestamp(filename: Column): Column = {
    val compactTime = ext(filename, isoDatetimeCompact, 2)
    val isoCompactTs = when(
      validIso(ext(filename, isoDatetimeCompact)).isNotNull && compactTime.isNotNull,
      try_to_timestamp(concat(
        ext(filename, isoDatetimeCompact), lit(" "),
        substring(compactTime, 1, 2), lit(":"),
        substring(compactTime, 3, 2), lit(":"),
        substring(compactTime, 5, 2))))
    val isoFullTs = try_to_timestamp(
      concat(ext(filename, isoDatetimeFull), lit(" "), ext(filename, isoDatetimeFull, 2)))
    val usTime = ext(filename, usDatetime, 2)
    val usTs = when(
      validIso(usToIso(ext(filename, usDatetime))).isNotNull && usTime.isNotNull,
      try_to_timestamp(concat(
        usToIso(ext(filename, usDatetime)), lit(" "),
        substring(usTime, 1, 2), lit(":"),
        substring(usTime, 3, 2), lit(":"),
        substring(usTime, 5, 2))))
    val unixTs = to_timestamp(ext(filename, unixTimestamp).cast("long"))
    coalesce(isoCompactTs, isoFullTs, usTs, unixTs,
      try_to_timestamp(extractDate(filename), lit("yyyy-MM-dd")))
  }
}
