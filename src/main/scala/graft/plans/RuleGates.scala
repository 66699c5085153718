package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Driver-visible CORRECTNESS gates for the optimizer rules
  * (SURVEY.md §2 D31/D52): each gate enables the rule on the live
  * session (restored afterwards), runs a query the rule must rewrite,
  * and emits both the ORACLE-checkable result (the rewrite must be
  * semantics-preserving) and a boolean that the rewritten plan shape
  * actually materialized — so a rule that silently stops firing, or
  * fires and corrupts rows, turns a CORRECTNESS row red. */
object RuleGates {

  private def withRule[A](s: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan])(body: => A): A = {
    val prev = s.experimental.extraOptimizations
    s.experimental.extraOptimizations =
      if (prev.contains(rule)) prev else prev :+ rule
    try body finally s.experimental.extraOptimizations = prev
  }

  // ------------------------------------------------------------- D31
  /** Top-k window rewrite: the `row_number ≤ k` idiom must plan as the
    * bounded aggregate (no Window, no per-group sort) and return
    * row-identical results to the window form the oracle computes. */
  def topkRewriteGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withRule(s, TopKRewrite) {
      val df = graft.operators.Relational.windowRank(s, dir)
      val n = df.collect().length.toLong
      val p = df.queryExecution.executedPlan.toString
      Seq(("topk_rewrite", n,
          p.contains("bounded_top_k") && !p.contains("Window")))
        .toDF("metric", "n_rows", "rule_fired")
    }
  }

  val topkRewriteGateSql: String =
    """SELECT 'topk_rewrite' AS metric, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  TRUE AS rule_fired
      |FROM (SELECT ROW_NUMBER() OVER (PARTITION BY o_custkey
      |        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |      FROM orders) t
      |WHERE rn <= 3""".stripMargin

  // ------------------------------------------------------------- D52
  /** Range-bin rewrite: a literal-width interval join must plan as a
    * binned equi-join (shuffled hash / sort-merge — never a nested
    * loop, with auto-broadcast disabled so there is no easy fallback)
    * and produce exactly the oracle's pair count. */
  def rangeBinRewriteGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withRule(s, RangeBinRewrite) {
      val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // the width must appear as a LITERAL in the join condition —
        // `p >= lo && p < lo + C` — for the rewrite to prove the bound
        val iv = Tables.nation(s, dir).select(col("n_nationkey"),
          col("n_nationkey").cast("double").as("lo"))
        val pt = Tables.lineitem(s, dir).filter(col("l_orderkey") < 1000L)
          .select(col("l_orderkey"), col("l_quantity").as("value"))
        val df = iv.join(pt,
            col("value") >= col("lo") && col("value") < (col("lo") + 0.5))
          .agg(count(lit(1)).as("n"))
        val n = df.collect().head.getLong(0)
        val p = df.queryExecution.executedPlan.toString
        Seq(("range_bin_rewrite", n,
            !p.contains("NestedLoop") && !p.contains("CartesianProduct") &&
              (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))))
          .toDF("metric", "n_pairs", "rule_fired")
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  val rangeBinRewriteGateSql: String =
    """SELECT 'range_bin_rewrite' AS metric, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  TRUE AS rule_fired
      |FROM nation JOIN lineitem
      |  ON l_orderkey < 1000
      |  AND l_quantity >= CAST(n_nationkey AS DOUBLE)
      |  AND l_quantity < CAST(n_nationkey AS DOUBLE) + 0.5""".stripMargin
}
