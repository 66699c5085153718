package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.functions._
import graft.plans.TopKRewrite

/** The top-k window → bounded-aggregate optimizer rule (SURVEY.md §2
  * D31): fires on the idiom, leaves everything else alone, and is
  * row-for-row equivalent to the window plan. */
class TopKRewriteSpec extends SparkSpec {

  private def executed(df: DataFrame): String = {
    df.collect()
    df.asInstanceOf[ClassicDataset[_]].queryExecution.executedPlan.toString
  }

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations = Seq(TopKRewrite)
    try body finally spark.experimental.extraOptimizations = Nil
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("rewrites rn<=k over row_number into bounded_top_k, dropping the sort") {
    val baseline = sortedRows(operators.Relational.windowRank(spark, sf))
    withRule {
      val df = operators.Relational.windowRank(spark, sf)
      val p = executed(df)
      assert(p.contains("bounded_top_k"), p)
      assert(!p.contains("Window"), p)
      assert(!p.contains("WindowGroupLimit"), p)
      assert(sortedRows(df) == baseline)
    }
  }

  test("honors desc/asc mixed order and ties deterministically on unique keys") {
    withRule {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_linestatus"))
        .orderBy(col("l_quantity").asc, col("l_orderkey").desc)
      val df = Tables.lineitem(spark, sf)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("l_linestatus"), col("l_orderkey"), col("l_quantity"), col("rn"))
      val p = executed(df)
      assert(p.contains("bounded_top_k"), p)
      // equivalence vs the un-rewritten window
      spark.experimental.extraOptimizations = Nil
      val base = Tables.lineitem(spark, sf)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("l_linestatus"), col("l_orderkey"), col("l_quantity"), col("rn"))
      assert(sortedRows(df) == sortedRows(base))
    }
  }

  test("does not fire on rank(), lower bounds, or huge k") {
    withRule {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
      val ranked = Tables.orders(spark, sf).withColumn("rn", rank().over(w))
        .filter(col("rn") <= 3)
      assert(!executed(ranked).contains("bounded_top_k"))
      val lower = Tables.orders(spark, sf).withColumn("rn", row_number().over(w))
        .filter(col("rn") >= 3)
      assert(!executed(lower).contains("bounded_top_k"))
      val huge = Tables.orders(spark, sf).withColumn("rn", row_number().over(w))
        .filter(col("rn") <= TopKRewrite.MaxK + 1)
      assert(!executed(huge).contains("bounded_top_k"))
    }
  }
}
