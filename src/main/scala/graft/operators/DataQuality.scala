package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate (SURVEY.md §2 C10): the load-time
  * expectations a warehouse pipeline runs before committing a batch —
  * null checks, domain checks, range checks, key uniqueness — folded
  * into ONE aggregation pass over the data (uniqueness piggybacks as
  * `count - countDistinct`), then unpivoted to a (rule, violations)
  * report. No per-rule scans, no driver-side row iteration.
  */
object DataQuality {

  /** A named expectation; `violation` evaluates true on BAD rows. */
  final case class Expect(name: String, violation: Column)

  def expectNonNull(c: String): Expect =
    Expect(s"non_null_$c", col(c).isNull)
  def expectBetween(c: String, lo: Double, hi: Double): Expect =
    Expect(s"range_$c", col(c).isNull || col(c) < lo || col(c) > hi)
  def expectIn(c: String, allowed: Seq[String]): Expect =
    Expect(s"domain_$c", !col(c).isin(allowed: _*))

  /** One row per rule: (rule, n_violations). `uniqueKey` adds a
    * duplicate-count rule for the given key column. */
  def report(df: DataFrame, expects: Seq[Expect],
             uniqueKey: Option[String] = None): DataFrame = {
    val aggs = expects.map(e =>
      sum(when(e.violation, 1L).otherwise(0L)).as(e.name)) ++
      uniqueKey.map(k =>
        (count(col(k)) - countDistinct(col(k))).as(s"unique_$k")).toSeq
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.unpivot(Array.empty[Column], wide.columns.map(col),
      "rule", "n_violations")
  }
}
