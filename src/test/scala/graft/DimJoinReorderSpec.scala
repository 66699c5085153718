package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.functions._
import graft.plans.DimJoinReorder

/** The dimension-join reorder rule (SURVEY.md §2 C41): with catalog
  * stats present it rebuilds a left-deep inner star join
  * most-selective-first under the uniform-containment model; with no
  * stats (raw scans) it must not touch the plan. Synthetic dims with
  * widely separated selectivities (σ ≈ 0.1 / 0.5 / 0.9) so the
  * expected ordering is unambiguous regardless of estimator
  * rounding. */
class DimJoinReorderSpec extends SparkSpec {

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations = Seq(DimJoinReorder)
    try body finally spark.experimental.extraOptimizations = Nil
  }

  /** Left-deep chain of dim names, identified by each right branch's
    * key column (k1/k2/k3). */
  private def chainOf(df: DataFrame): Seq[String] = {
    val opt = df.asInstanceOf[ClassicDataset[_]].queryExecution.optimizedPlan
    def dimOf(b: LogicalPlan): String =
      b.output.map(_.name).find(_.startsWith("k")).getOrElse("?")
    def walk(p: LogicalPlan): Seq[String] = p match {
      case Join(l, r, _, _, _) => walk(l) :+ dimOf(r)
      case pj: Project => walk(pj.child)
      case _ => Nil
    }
    opt.collectFirst { case j: Join => walk(j) }.getOrElse(Nil)
  }

  private val tag = s"jrspec_${ProcessHandle.current().pid()}"

  private def mkDims(): Unit = {
    // dims: key 0..99, value uniform 0..99 → filter v<c has σ ≈ c/100
    (1 to 3).foreach { i =>
      spark.range(0, 100)
        .select(col("id").as(s"k$i"), (col("id") % 100).as(s"v$i"))
        .write.mode("overwrite").saveAsTable(s"${tag}_d$i")
      spark.sql(
        s"ANALYZE TABLE ${tag}_d$i COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    spark.range(0, 1000)
      .select((col("id") % 100).as("f1"), ((col("id") / 2) % 100).as("f2"),
        ((col("id") / 3) % 100).as("f3"))
      .write.mode("overwrite").saveAsTable(s"${tag}_fact")
    spark.sql(s"ANALYZE TABLE ${tag}_fact COMPUTE STATISTICS")
  }

  private def dropDims(): Unit =
    (Seq("fact") ++ (1 to 3).map(i => s"d$i")).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${tag}_$t"))

  // written deliberately worst-first: σ=0.9 dim joined before σ=0.1
  private def starQuery(fact: DataFrame, d1: DataFrame, d2: DataFrame,
      d3: DataFrame): DataFrame =
    fact
      .join(d3.filter(col("v3") < 90), col("f3") === col("k3"))
      .join(d2.filter(col("v2") < 50), col("f2") === col("k2"))
      .join(d1.filter(col("v1") < 10), col("f1") === col("k1"))

  test("reorders a stats-backed star join most-selective-first, rows unchanged") {
    mkDims()
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def q() = starQuery(spark.table(s"${tag}_fact"),
        spark.table(s"${tag}_d1"), spark.table(s"${tag}_d2"),
        spark.table(s"${tag}_d3"))
      val baseline = q().collect()
        .map(r => r.toSeq.mkString("|")).sorted.toSeq
      withRule {
        val df = q()
        assert(chainOf(df) === Seq("k1", "k2", "k3"),
          "expected most-selective-first (σ 0.1 < 0.5 < 0.9)")
        val rows = df.collect().map(r => r.toSeq.mkString("|")).sorted.toSeq
        assert(rows === baseline, "reorder must be semantics-preserving")
        // column ORDER must survive the permutation (the restoring
        // Project): same schema as the unrewritten query
        assert(df.columns.toSeq === q().columns.toSeq)
      }
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      dropDims()
    }
  }

  test("reorders under interleaved pruning Projects (aggregate on top)") {
    // an aggregate above the chain makes column pruning insert
    // pass-through Projects BETWEEN the joins — the shape that blocked
    // the first gate run; the unstack must look through them
    mkDims()
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def q() = starQuery(spark.table(s"${tag}_fact"),
        spark.table(s"${tag}_d1"), spark.table(s"${tag}_d2"),
        spark.table(s"${tag}_d3"))
        .agg(count(lit(1)).as("n"))
      val baseline = q().collect().head.getLong(0)
      withRule {
        val df = q()
        assert(chainOf(df) === Seq("k1", "k2", "k3"))
        assert(df.collect().head.getLong(0) === baseline)
      }
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      dropDims()
    }
  }

  test("no-stats fallback: raw in-memory relations are left untouched") {
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // same shapes, but no catalog stats → no rowCount → no rewrite
      def dim(i: Int) = spark.range(0, 100)
        .select(col("id").as(s"k$i"), (col("id") % 100).as(s"v$i"))
      val fact = spark.range(0, 1000)
        .select((col("id") % 100).as("f1"), ((col("id") / 2) % 100).as("f2"),
          ((col("id") / 3) % 100).as("f3"))
      withRule {
        val df = starQuery(fact, dim(1), dim(2), dim(3))
        assert(chainOf(df) === Seq("k3", "k2", "k1"),
          "without rowCount stats the written order must survive")
      }
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
  }

  test("cross-dimension predicate blocks the reorder") {
    mkDims()
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      withRule {
        // d2's join condition references d3's output → not permutable
        val df = spark.table(s"${tag}_fact")
          .join(spark.table(s"${tag}_d3").filter(col("v3") < 90),
            col("f3") === col("k3"))
          .join(spark.table(s"${tag}_d2").filter(col("v2") < 50),
            col("f2") === col("k2") && col("k2") =!= col("k3"))
          .join(spark.table(s"${tag}_d1").filter(col("v1") < 10),
            col("f1") === col("k1"))
        // d1 (σ=0.1) must NOT have been hoisted above the entangled pair
        assert(chainOf(df).take(2) === Seq("k3", "k2"))
      }
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      dropDims()
    }
  }
}
