package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import graft.operators._

/** Oracle-independent invariants for the round-14 operators (the
  * merge_into lesson: a same-shaped SQL oracle can agree with a bug,
  * so every operator also pins a property the oracle doesn't test). */
class R14OpsSpec extends SparkSpec {

  // ------------------------------------------------------------ C40
  test("join_order_probe: ranks are permutations, finals agree, model picks truth") {
    val rows = DataQuality.joinOrderProbe(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 6), "rank_est not 1..6")
    assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to 6), "rank_act not 1..6")
    // every order ends at the same final cardinality, estimated and true
    assert(rows.map(_.getDouble(5)).distinct.length == 1)
    assert(rows.map(_.getLong(6)).distinct.length == 1)
    // cost monotonicity: est_cost is non-decreasing in rank_est (ditto act)
    val byEst = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
    assert(byEst.zip(byEst.tail).forall { case (a, b) => a <= b })
    val byAct = rows.sortBy(_.getInt(2)).map(_.getLong(4))
    assert(byAct.zip(byAct.tail).forall { case (a, b) => a <= b })
    // the model's pick (rank_est 1) starts with the most selective dim
    val sels = Map(
      "part" -> {
        val p = Tables.part(spark, sf)
        p.filter(col("p_size") < 10).count().toDouble / p.count()
      },
      "supplier" -> {
        val su = Tables.supplier(spark, sf)
        su.filter(col("s_acctbal") > 5000).count().toDouble / su.count()
      },
      "orders" -> {
        val o = Tables.orders(spark, sf)
        o.filter(col("o_orderpriority") === "1-URGENT").count().toDouble / o.count()
      })
    val best = rows.find(_.getInt(1) == 1).get.getString(0)
    val greedy = sels.toSeq.sortBy { case (n, v) => (v, n) }.map(_._1).mkString(",")
    assert(best == greedy, s"model pick $best != greedy-selectivity $greedy")
    // the model's pick must also be truly cheapest (uniform-containment
    // holds on this schema: FKs are assigned independently of the dims'
    // filter columns)
    assert(rows.find(_.getInt(1) == 1).get.getInt(2) == 1,
      "est-best order is not act-best")
  }

  // ------------------------------------------------------------ A14
  test("graft-catalog DSv2: listing pushdown, column pruning, v1 equivalence") {
    import graft.sources.{CatalogScan, CatalogScanBuilder, FileCatalog}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val drop = EtlStage.stageEventsCsvByDay(spark, sf)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // equality pushdown: residual empty, exactly ONE partition planned
    val sb = new CatalogScanBuilder(drop, conf)
    val residual = sb.pushFilters(Array(
      org.apache.spark.sql.sources.EqualTo("extracted_date", "2024-01-16")))
    assert(residual.isEmpty, "date filter must be fully pushed")
    val one = sb.build().asInstanceOf[CatalogScan].planInputPartitions()
    assert(one.length == 1, s"pushdown planned ${one.length} partitions")
    // unfiltered: one partition per day directory
    val nDays = spark.read.format("graft-catalog").load(drop)
      .select("extracted_date").distinct().count()
    val all = new CatalogScanBuilder(drop, conf).build()
      .asInstanceOf[CatalogScan].planInputPartitions()
    assert(all.length == nDays, s"${all.length} partitions for $nDays days")
    // a range predicate prunes to the in-range days
    val sb2 = new CatalogScanBuilder(drop, conf)
    sb2.pushFilters(Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("extracted_date", "2024-01-10"),
      org.apache.spark.sql.sources.LessThan("extracted_date", "2024-01-13")))
    assert(sb2.build().asInstanceOf[CatalogScan].planInputPartitions().length == 3)
    // column pruning reaches the scan
    val prunedDf = spark.read.format("graft-catalog").load(drop).select("name")
    prunedDf.collect()
    val scan = prunedDf.asInstanceOf[ClassicDataset[_]].queryExecution
      .executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("name"))
    // equivalence with the v1 DataFrame catalog on the same tree
    val v2 = spark.read.format("graft-catalog").load(drop)
      .select("path", "size").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val v1 = FileCatalog.listFiles(spark, drop)
      .filter(!col("name").startsWith("_") && !col("name").startsWith("."))
      .select("path", "size").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(v2 == v1, s"v2 ${v2.size} files vs v1 ${v1.size}")
  }

  // ------------------------------------------------------------ F23
  test("stream_lateness_histogram: bins partition the slice, lateness real, rerun-stable") {
    def run() = graft.streaming.StreamGates
      .streamLatenessHistogram(spark, sf).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val h1 = run()
    val slice = Tables.events(spark, sf)
      .filter(col("event_id") < 2000).count()
    // the four bins partition the slice exactly — every arrival was
    // matched to a per-batch watermark (a batch missing from progress
    // would silently drop its rows at the join)
    assert(h1.values.sum == slice, s"bins ${h1.values.sum} != slice $slice")
    // batch 0 rides watermark 0, so on-time rows must exist; chunks are
    // keyed by user (event-time-independent), so chunks 1..3 span the
    // full ts range and genuine lateness must appear too
    assert(h1.getOrElse("a_on_time", 0L) > 0L, s"no on-time rows: $h1")
    assert((h1 - "a_on_time").values.sum > 0L, s"no late rows: $h1")
    // same-JVM re-execution (the r13 quarantine lesson): fresh scratch
    // dirs per invocation make the histogram identical, not corrupted
    assert(run() == h1, "rerun drifted")
  }

}
