package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Physical-plan pins for the native GlobalRank operator: the folded
  * single-operator shape — one range exchange, no offsets aggregate,
  * no window, no broadcast join — is what keeps the rank math correct
  * and cheap at ANY scale. */
class GlobalRankPlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String = {
    df.collect()
    df.asInstanceOf[ClassicDataset[_]].queryExecution.executedPlan.toString
  }

  test("globalRank is one range exchange into one GlobalRank operator") {
    val p = plan(Relational.globalRank(
      Tables.lineitem(spark, sf).select(col("l_linestatus"), col("l_extendedprice")),
      Seq("l_linestatus"), Seq("l_extendedprice")))
      .split("== Initial Plan ==")(0)
    // the rank operator plans against a VISIBLE range exchange
    assert(p.toLowerCase.contains("rangepartitioning"), p)
    assert(p.contains("GlobalRank"), p)
    // exactly one materialized range shuffle of the data
    val materialized = p.linesIterator
      .filter(_.contains("Exchange rangepartitioning"))
      .filterNot(_.contains("ReusedExchange")).size
    assert(materialized == 1, s"expected 1 materialized range exchange:\n$p")
    // the offsets tail is gone: no window, no broadcast join, no
    // row_number (the single-reducer shape this operator avoids)
    assert(!p.contains("row_number"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("ranks and group sizes are exact on a grouped total order") {
    val ranked = Relational.globalRank(
      Tables.orders(spark, sf)
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey")),
      Seq("o_orderpriority"), Seq("o_totalprice", "o_orderkey"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val expect = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("xrn", row_number().over(w).cast("long"))
      .withColumn("xn", count(lit(1))
        .over(Window.partitionBy(col("o_orderpriority"))))
    val bad = ranked.join(expect,
        Seq("o_orderpriority", "o_totalprice", "o_orderkey"))
      .filter(col("rn") =!= col("xrn") || col("n") =!= col("xn"))
    assert(bad.isEmpty, bad.limit(5).collect().mkString("\n"))
  }

  test("a high-cardinality group fails fast instead of OOMing the driver") {
    // o_orderkey is unique per row: every row is its own group, so the
    // offsets merge would be O(#rows) driver heap. With the cap planted
    // below the row count the job must die with the documented message
    // (raised executor-side, before any per-partition map is collected).
    val e = intercept[Exception] {
      graft.plans.GlobalRank.withGlobalRank(
        Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice")),
        Seq("o_orderkey"), Seq("o_totalprice"), maxGroups = 16).count()
    }
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(messages(e).contains("distinct group keys"), messages(e))
  }

  test("rank/count column names colliding with input columns are rejected") {
    val e = intercept[IllegalArgumentException] {
      graft.plans.GlobalRank.withGlobalRank(
        Tables.orders(spark, sf)
          .select(col("o_orderkey"), col("o_totalprice").as("rn")),
        Nil, Seq("o_orderkey"))
    }
    assert(e.getMessage.contains("collides"), e.getMessage)
  }

  test("running sum is an exact inclusive prefix scan (grouped + ungrouped)") {
    // grouped: vs the window formulation on a small slice
    val base = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"),
        (col("o_orderkey") % 1000L).as("v"))
    val scanned = Relational.globalRunningSum(base,
      Seq("o_orderpriority"), Seq("o_orderkey"), "v")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = base.withColumn("xsum", sum(col("v")).over(w))
    val bad = scanned.join(expect, Seq("o_orderpriority", "o_orderkey", "v"))
      .filter(col("run_sum") =!= col("xsum"))
    assert(bad.isEmpty, bad.limit(5).collect().mkString("\n"))
    // ungrouped: the global prefix scan ends at the global total
    val g = Relational.globalRunningSum(
      Tables.documents(spark, sf).select(col("doc_id"), col("n_chars")),
      Nil, Seq("doc_id"), "n_chars")
    val last = g.orderBy(col("rn").desc).limit(1).collect()(0)
    val total = Tables.documents(spark, sf).agg(sum(col("n_chars"))).collect()(0).getLong(0)
    assert(last.getAs[Long]("run_sum") == total,
      s"inclusive scan must end at the total: ${last} vs $total")
  }

  test("running-sum column must be LONG (doubles are order-dependent)") {
    val e = intercept[IllegalArgumentException] {
      graft.plans.GlobalRank.withGlobalRank(
        Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice")),
        Nil, Seq("o_orderkey"), sumCol = Some("o_totalprice"))
    }
    assert(e.getMessage.contains("must be LONG"), e.getMessage)
  }

  test("rankFilter rider: selection equals post-hoc filter, state unaffected") {
    val base = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
    // rider selection (inside the operator, pre-projection)
    val rider = Relational.globalRank(base,
        groupCols = Seq("source"), sortCols = Seq("doc_id"),
        rankFilter = Some((rn, n) => rn === 1L || rn === n || rn === (n / 2L)))
      .orderBy(col("source"), col("rn")).collect().toSeq
    // reference: full rank, filtered afterwards
    val post = Relational.globalRank(base,
        groupCols = Seq("source"), sortCols = Seq("doc_id"))
      .filter(col("rn") === 1L || col("rn") === col("n") ||
        col("rn") === (col("n") / lit(2L)))
      .orderBy(col("source"), col("rn")).collect().toSeq
    assert(rider == post, "rider selection must not disturb rank/count state")
    assert(rider.nonEmpty)
    // the rider composes with the running sum: filtered-out rows still
    // accumulate into later rows' inclusive prefix sums
    val g = graft.plans.GlobalRank.withGlobalRank(
      Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
        .repartitionByRange(8, col("doc_id")),
      Nil, Seq("doc_id"), sumCol = Some("n_chars"),
      rankFilter = Some((rn, n) => rn === n))
    val last = g.collect()
    val total = Tables.documents(spark, sf).agg(sum(col("n_chars"))).head().getLong(0)
    assert(last.length == 1 && last(0).getAs[Long]("run_sum") == total,
      s"rider + prefix scan: last row must carry the full total, got ${last.toSeq}")
  }

  test("totCol + rankFilterOn: weighted-median crossing row selected exactly") {
    // the weighted prefix scan: tot is the group's sum total, and the
    // generalized rider may reference input columns and the running sum
    val base = Tables.lineitem(spark, sf)
      .select(col("l_linestatus"), col("l_extendedprice"),
        col("l_quantity").cast("long").as("w"))
    val got = graft.plans.GlobalRank.withGlobalRank(base,
        Seq("l_linestatus"), Seq("l_extendedprice"),
        sumCol = Some("w"), runCol = "cw", totCol = Some("tw"),
        rankFilterOn = Some(d =>
          d("cw") * 2 >= d("tw") && (d("cw") - d("w")) * 2 < d("tw")))
      .select(col("l_linestatus"), col("l_extendedprice"), col("tw"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    // reference: per-(group, value) cumulative weights via windows
    import org.apache.spark.sql.expressions.Window
    val byValue = base.groupBy(col("l_linestatus"), col("l_extendedprice"))
      .agg(sum(col("w")).as("vw"))
    val wo = Window.partitionBy(col("l_linestatus")).orderBy(col("l_extendedprice"))
    val wg = Window.partitionBy(col("l_linestatus"))
    val expect = byValue
      .withColumn("cw", sum(col("vw")).over(wo.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tw", sum(col("vw")).over(wg))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(col("l_linestatus"))
      .agg(min(col("l_extendedprice")).as("v"), min(col("tw")).as("tw"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == expect)
    // exactly one crossing row per group
    assert(got.map(_._1).size == got.size)
  }

  test("totCol without sumCol, and rankFilter+rankFilterOn together, are rejected") {
    val base = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    val e1 = intercept[IllegalArgumentException] {
      graft.plans.GlobalRank.withGlobalRank(base, Nil, Seq("doc_id"),
        totCol = Some("tw"))
    }
    assert(e1.getMessage.contains("requires sumCol"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.plans.GlobalRank.withGlobalRank(base, Nil, Seq("doc_id"),
        rankFilter = Some((rn, _) => rn === 1L),
        rankFilterOn = Some(d => d("rn") === 1L))
    }
    assert(e2.getMessage.contains("not both"), e2.getMessage)
  }

  test("ungrouped ranks are a global total order (corpus-shuffle shape)") {
    val ranked = Relational.globalRank(
      Tables.documents(spark, sf).select(col("doc_id")),
      groupCols = Nil, sortCols = Seq("doc_id"),
      rankCol = "pos", countCol = "n_docs")
    val rows = ranked.orderBy(col("doc_id")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("pos") == i + 1L, s"row $i")
      assert(r.getAs[Long]("n_docs") == rows.length.toLong)
    }
  }
}
