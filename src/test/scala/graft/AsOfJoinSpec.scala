package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoin

/** The native as-of join operator (custom LogicalPlan + Strategy +
  * merge-scan SparkPlan): exact semantics against a declarative
  * oracle, null extension, and the physical plan shape. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("hand-built edges: backward match, ties, no-match null extension") {
    // repartition scrambles inputs so EnsureRequirements must insert
    // the co-partition + sort itself
    val left = Seq((1L, 5L, "p1"), (1L, 10L, "p2"), (1L, 10L, "p3"),
        (2L, 3L, "p4"), (3L, 7L, "p5"))
      .toDF("lk", "lt", "lv").repartition(5)
    val right = Seq((1L, 4L, "a"), (1L, 10L, "b"), (2L, 5L, "x"), (4L, 1L, "z"))
      .toDF("rk", "rt", "rv").repartition(3)
    val got = AsOfJoin.asofJoin(left, right, "lk", "rk", "lt", "rt")
      .select(col("lv"), col("rv")).as[(String, Option[String])]
      .collect().toSet
    assert(got == Set(
      ("p1", Some("a")),  // 4 <= 5 < 10
      ("p2", Some("b")), ("p3", Some("b")), // equal times match backward
      ("p4", None),       // right time 5 > 3
      ("p5", None)))      // no key 3 on the right
  }

  test("matches a declarative left as-of oracle on events") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_val"))
    // unique (key, time) on the right: deterministic tie behavior
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .agg(max(col("value")).as("c_val"))
    val got = AsOfJoin.asofJoin(purchases, clicks, "p_user", "c_user", "p_ts", "c_ts")
      .select(col("p_id"), col("c_ts"), col("c_val"))
    // oracle: all candidate pairs, keep the max (c_ts, c_val) struct
    val exp = purchases
      .join(clicks, col("p_user") === col("c_user") && col("c_ts") <= col("p_ts"), "left")
      .groupBy(col("p_id"))
      .agg(max(struct(col("c_ts"), col("c_val"))).as("best"))
      .select(col("p_id"), col("best.c_ts").as("c_ts"), col("best.c_val").as("c_val"))
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
    assert(got.count() == purchases.count()) // every left row survives
  }

  test("plans as AsOfJoinExec with merge-scan inputs, no window") {
    val left = Seq((1L, 5L, "p")).toDF("lk", "lt", "lv")
    val right = Seq((1L, 4L, "a")).toDF("rk", "rt", "rv")
    val df = AsOfJoin.asofJoin(left, right, "lk", "rk", "lt", "rt")
    df.collect()
    val p = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
  }

  test("rejects overlapping column names up front") {
    val df = Seq((1L, 2L)).toDF("k", "t")
    intercept[IllegalArgumentException](AsOfJoin.asofJoin(df, df, "k", "k", "t", "t"))
  }
}
