package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Physical-plan pins for the native LocalRank operator (the rank
  * half of globalRank): the shape that makes the offset math correct
  * at ANY scale is one range exchange feeding both branches. */
class LocalRankPlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String = {
    df.collect()
    df.asInstanceOf[ClassicDataset[_]].queryExecution.executedPlan.toString
  }

  test("globalRank: one range exchange, reused by the offsets branch, no window over data") {
    val p = plan(Relational.globalRank(
      Tables.lineitem(spark, sf).select(col("l_linestatus"), col("l_extendedprice")),
      Seq("l_linestatus"), Seq("l_extendedprice")))
      .split("== Initial Plan ==")(0)
    // the rank operator plans against a VISIBLE range exchange
    assert(p.toLowerCase.contains("rangepartitioning"), p)
    assert(p.contains("LocalRank"), p)
    // the offsets branch consumes the SAME exchange — partition ids in
    // the two branches can only be coherent if this reuse holds
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"), p)
    // exactly one MATERIALIZED range shuffle of the data exists (the
    // ReusedExchange line echoes the exchange it points at — exclude it)
    val materialized = p.linesIterator
      .filter(_.contains("Exchange rangepartitioning"))
      .filterNot(_.contains("ReusedExchange")).size
    assert(materialized == 1, s"expected 1 materialized range exchange:\n$p")
    // no row_number window anywhere (that is the single-reducer shape
    // this operator exists to avoid)
    assert(!p.contains("row_number"), p)
  }

  test("the counts branch pays no sort: only the rank branch sorts the data") {
    val ranked = Relational.globalRank(
      Tables.orders(spark, sf).select(col("o_orderpriority"), col("o_totalprice")),
      Seq("o_orderpriority"), Seq("o_totalprice"))
    val p = plan(ranked).split("== Initial Plan ==")(0)
    // exactly one full-width data sort — (group, value) — feeds
    // LocalRank; the offsets branch's only sort is (group, __pid) over
    // #partitions × #groups COUNT rows, never the data
    val dataSorts = "Sort \\[o_orderpriority[^\\n]*o_totalprice".r.findAllIn(p).size
    assert(dataSorts == 1, s"expected 1 data sort, got $dataSorts in:\n$p")
  }
}
