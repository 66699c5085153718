package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.functions._
import graft.plans.RangeBinRewrite

/** The bounded-range-join binning rule (SURVEY.md §2 D52): fires on
  * `p >= lo && p < lo + C`, equips the join with a bin equality key,
  * and is row-for-row equivalent to the nested-loop plan. */
class RangeBinRewriteSpec extends SparkSpec {

  private def executed(df: DataFrame): String = {
    df.collect()
    df.asInstanceOf[ClassicDataset[_]].queryExecution.executedPlan.toString
  }

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations = Seq(RangeBinRewrite)
    try body finally spark.experimental.extraOptimizations = Nil
  }

  private def intervals = Tables.orders(spark, sf).select(col("o_orderkey"),
    (col("o_totalprice") / 1000.0).as("lo"))
  private def points = Tables.events(spark, sf).select(col("event_id"), col("value"))

  private def rangeCond(iv: DataFrame, pt: DataFrame) =
    pt("value") >= iv("lo") && pt("value") < (iv("lo") + 5.0)

  test("rewrites the bounded range join to a binned equi-join, same rows") {
    val baseline = {
      val iv = intervals; val pt = points
      iv.join(pt, rangeCond(iv, pt))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    withRule {
      // disable auto-broadcast so the only fallback would be a
      // cartesian/NL plan — the rewrite must provide the equi key
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val iv = intervals; val pt = points
        val df = iv.join(pt, rangeCond(iv, pt))
          .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
        val p = executed(df)
        assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
        val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == baseline)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("fires with the sides flipped (points on the left)") {
    withRule {
      val iv = intervals; val pt = points
      val df = pt.join(iv, rangeCond(iv, pt))
      val p = executed(df.groupBy(col("event_id")).agg(count(lit(1))))
      assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    }
  }

  test("leaves attribute-bounded range joins (unknowable width) alone") {
    withRule {
      val iv = Tables.orders(spark, sf).select(col("o_orderkey"),
        (col("o_totalprice") / 1000.0).as("lo"),
        (col("o_totalprice") / 1000.0 + col("o_custkey") / 1000.0 + 5.0).as("hi"))
      val pt = points
      val df = iv.join(pt, pt("value") >= iv("lo") && pt("value") < iv("hi"))
      // no literal width → no rewrite → broadcast NL (iv is small here)
      val p = executed(df.agg(count(lit(1))))
      assert(p.contains("NestedLoop") || p.contains("CartesianProduct"), p)
    }
  }

  test("ignores joins that already carry an equality conjunct") {
    withRule {
      val iv = intervals.withColumn("k", col("o_orderkey") % 7)
      val pt = points.withColumn("k", col("event_id") % 7)
      val df = iv.join(pt,
        iv("k") === pt("k") && pt("value") >= iv("lo") && pt("value") < (iv("lo") + 5.0))
      val p = executed(df.agg(count(lit(1))))
      assert(!p.contains("graft_bin"), p)
    }
  }
}
