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

  // ------------------------------------------------------------- C41
  private val gateSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Extract the left-deep dimension order of the FIRST join chain in
    * an optimized plan, naming each right branch by which dim key its
    * output carries (works for catalog tables and raw scans alike). */
  private def dimChain(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
    def dimOf(b: LogicalPlan): String = {
      val names = b.output.map(_.name).toSet
      if (names.contains("p_partkey")) "part"
      else if (names.contains("s_suppkey")) "supplier"
      else if (names.contains("o_orderkey")) "orders"
      else "?"
    }
    // look through the pass-through Projects column pruning interleaves
    def chain(q: LogicalPlan): Seq[String] = q match {
      case Join(l, r, _, _, _) => chain(l) :+ dimOf(r)
      case p: Project => chain(p.child)
      case _ => Nil
    }
    p.collectFirst { case j: Join => chain(j) }.getOrElse(Nil)
  }

  /** DimJoinReorder gate: the uniform-containment cost model as an
    * optimizer DECISION (C40 reports the same ranking as a
    * diagnostic). The fact joins three filtered dims written in the
    * deliberately WORST estimated order (supplier σ≈0.9, part σ≈0.5,
    * orders σ≈0.2 — gaps ≈0.3 wide so the ESTIMATED and TRUE rankings
    * agree at every test SF: sf0.001's 10-row supplier flips a narrow
    * gap under sampling noise, which sank the first cut of this gate
    * with s_acctbal > 5000 / p_size < 10 / 1-URGENT there);
    * with ANALYZE-collected stats + CBO stats propagation the rule
    * must rebuild the chain most-selective-first, while the identical
    * query over raw parquet scans (no rowCount stats) must come back
    * UNTOUCHED — the no-stats negative guard. The emitted order
    * string is checked against the oracle's independently-computed
    * true-selectivity ranking, and rows/sums pin semantics
    * preservation across the permutation.
    *
    * Scratch tables get unique per-invocation names (same-JVM rerun
    * discipline) and are dropped in a finally; CBO conf is restored
    * likewise. */
  def joinReorderRewriteGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withRule(s, DimJoinReorder) {
      val tag = s"grjr_${ProcessHandle.current().pid()}_${gateSeq.incrementAndGet()}"
      val pT = s"${tag}_part"; val sT = s"${tag}_supplier"; val oT = s"${tag}_orders"
      val prevCbo = s.conf.get("spark.sql.cbo.enabled", "false")
      try {
        Tables.part(s, dir).select(col("p_partkey"), col("p_size"))
          .write.saveAsTable(pT)
        Tables.supplier(s, dir).select(col("s_suppkey"), col("s_acctbal"))
          .write.saveAsTable(sT)
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"))
          .write.saveAsTable(oT)
        // the production on-ramp, exercised by the gate itself: one
        // call per table + one call per session (Stats.enableReorder
        // is idempotent with withRule's injection above)
        Seq(pT, sT, oT).foreach(t => Stats.analyze(s, t))
        Stats.enableReorder(s)
        val fact = Tables.lineitem(s, dir)
          .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
            col("l_quantity"))
        def q(pa: DataFrame, su: DataFrame, or: DataFrame) = fact
          .join(su.filter(col("s_acctbal") > 0),
            col("l_suppkey") === col("s_suppkey"))
          .join(pa.filter(col("p_size") < 25),
            col("l_partkey") === col("p_partkey"))
          .join(or.filter(col("o_orderpriority") === "1-URGENT"),
            col("l_orderkey") === col("o_orderkey"))
          .agg(count(lit(1)).as("n"),
            graft.operators.Relational.dsum(col("l_quantity")).as("qty"))
        val withStats = q(s.table(pT), s.table(sT), s.table(oT))
        val row = withStats.collect().head
        val statsOrder = dimChain(
          withStats.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
            .queryExecution.optimizedPlan).mkString(",")
        // negative guard: raw parquet scans carry sizeInBytes only —
        // no rowCount, no rewrite; the written order must survive
        val noStats = q(Tables.part(s, dir), Tables.supplier(s, dir),
          Tables.orders(s, dir))
        val noStatsOrder = dimChain(
          noStats.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
            .queryExecution.optimizedPlan).mkString(",")
        Seq(("join_reorder", row.getLong(0), row.getDouble(1), statsOrder,
            noStatsOrder == "supplier,part,orders"))
          .toDF("metric", "n_rows", "sum_qty", "stats_order",
            "nostats_untouched")
      } finally {
        s.conf.set("spark.sql.cbo.enabled", prevCbo)
        Seq(pT, sT, oT).foreach(t =>
          try s.sql(s"DROP TABLE IF EXISTS $t")
          catch { case _: Throwable => () })
      }
    }
  }

  val joinReorderRewriteGateSql: String =
    """WITH sig AS (
      |  SELECT 'part' AS d,
      |    (SELECT CAST(COUNT(*) FILTER (WHERE p_size < 25) AS DOUBLE)
      |       / COUNT(*) FROM part) AS s
      |  UNION ALL SELECT 'supplier',
      |    (SELECT CAST(COUNT(*) FILTER (WHERE s_acctbal > 0) AS DOUBLE)
      |       / COUNT(*) FROM supplier)
      |  UNION ALL SELECT 'orders',
      |    (SELECT CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')
      |       AS DOUBLE) / COUNT(*) FROM orders)),
      |j AS (SELECT COUNT(*) AS n,
      |    CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS q
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey AND s_acctbal > 0
      |  JOIN orders ON l_orderkey = o_orderkey AND o_orderpriority = '1-URGENT'
      |  JOIN part ON l_partkey = p_partkey AND p_size < 25)
      |SELECT 'join_reorder' AS metric, n AS n_rows, q AS sum_qty,
      |  (SELECT string_agg(d, ',' ORDER BY s ASC) FROM sig) AS stats_order,
      |  TRUE AS nostats_untouched
      |FROM j""".stripMargin
}
