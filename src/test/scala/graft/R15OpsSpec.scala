package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import graft.operators.EtlQueries

/** Oracle-independent invariants for the round-15 operators. */
class R15OpsSpec extends SparkSpec {

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: kids.flatMap(nodes)
  }

  private def catalogScan(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    val all = nodes(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan)
    all.collect { case b: BatchScanExec
        if b.scan.isInstanceOf[graft.sources.CatalogScan] => b }.head
  }

  // ------------------------------------------------------------ A16
  test("catalog DPP gate: runtime filter fires, one dir listed") {
    val row = EtlQueries.catalogV2DppGate(spark, sf).head()
    assert(row.getLong(1) > 1, "needs a multi-day drop")
    assert(row.getBoolean(3), "no runtime filter planned on the DSv2 scan")
    assert(row.getBoolean(4), "runtime pruning did not reduce the listing to one dir")
  }

  test("catalog DPP: runtime-filtered join equals the static-filter read") {
    val drop = EtlStage.stageEventsCsvByDay(spark, sf)
    import spark.implicits._
    val catalog = spark.read.format("graft-catalog").load(drop)
    val dim = Seq("2024-01-16").toDF("loaded_date")
    val viaJoin = catalog
      .join(broadcast(dim), col("extracted_date") === col("loaded_date"))
      .select(col("name")).collect().map(_.getString(0)).sorted.toSeq
    val viaStatic = spark.read.format("graft-catalog").load(drop)
      .filter(col("extracted_date") === "2024-01-16")
      .select(col("name")).collect().map(_.getString(0)).sorted.toSeq
    assert(viaJoin == viaStatic && viaJoin.nonEmpty)
  }

  test("catalog DPP negative guard: unfiltered dim plans no runtime filter") {
    val drop = EtlStage.stageEventsCsvByDay(spark, sf)
    val catalog = spark.read.format("graft-catalog").load(drop)
    val dim = catalog.select(col("extracted_date").as("loaded_date")).distinct()
    val joined = catalog
      .join(dim, col("extracted_date") === col("loaded_date"))
      .select(col("name"), col("extracted_date"))
    val n = joined.collect().length
    val scan = catalogScan(joined)
    assert(scan.runtimeFilters.isEmpty,
      "runtime filter planned without a selective dim predicate")
    assert(n > 0)
  }

  // ------------------------------------------------------------ A17
  test("agg pushdown: planted tree, null-date counts, global agg") {
    import java.nio.file.{Files, Paths}
    val root = s"/tmp/graft_aggpd_spec/${System.nanoTime()}"
    Files.createDirectories(Paths.get(s"$root/day=2024-01-01"))
    Files.createDirectories(Paths.get(s"$root/day=2024-01-02"))
    Files.write(Paths.get(s"$root/day=2024-01-01/a.csv"), "xy".getBytes)
    Files.write(Paths.get(s"$root/day=2024-01-02/b.csv"), "xyzw".getBytes)
    Files.write(Paths.get(s"$root/nodate.csv"), "x".getBytes) // null date
    try {
      val cat = spark.read.format("graft-catalog").load(root)
      // global (no group by): COUNT(*), COUNT(extracted_date), MIN/MAX(size)
      val g = cat.agg(count(lit(1)).as("n"),
        count(col("extracted_date")).as("n_dated"),
        min(col("size")).as("min_s"), max(col("size")).as("max_s")).head()
      assert((g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3))
        == ((3L, 2L, 1L, 4L)))
      // grouped: one partial row per scan partition-group
      val rows = cat.groupBy(col("extracted_date"))
        .agg(count(lit(1)).as("n"), max(col("size")).as("mx"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set(("2024-01-01", 1L, 2L), ("2024-01-02", 1L, 4L),
        (null, 1L, 1L)))
      // count-distinct and unsupported columns fall back, same answers
      val fb = cat.groupBy(col("extracted_date"))
        .agg(countDistinct(col("name")).as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(fb == Set(("2024-01-01", 1L), ("2024-01-02", 1L), (null, 1L)))
    } finally {
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  // ------------------------------------------------------------ E83
  test("bpe_learn: counts weakly decrease, merges build on the alphabet") {
    val rows = graft.operators.CorpusAnalytics.bpeLearn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.map(_._1).toSeq == (1 to rows.length))
    // a step's winning count never exceeds the previous step's: the
    // new pair existed (or was created from a sub-pair that existed)
    // and was not chosen earlier
    val counts = rows.map(_._4)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a }, counts.toSeq)
    // every merge operand is either a single char or a previously
    // learned merge result
    val known = scala.collection.mutable.Set.empty[String]
    rows.foreach { case (_, l, r, _) =>
      assert((l.length == 1 || known(l)) && (r.length == 1 || known(r)),
        s"merge ($l,$r) uses an unlearned compound symbol")
      known += (l + r)
    }
    // same-JVM rerun determinism (localCheckpoint loop state is fresh)
    val again = graft.operators.CorpusAnalytics.bpeLearn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(again.toSeq == rows.toSeq)
  }

  // ------------------------------------------------------------ A15
  test("atomic sink gate end-to-end at the spec SF") {
    val row = EtlQueries.atomicSinkGate(spark, sf).head()
    assert(row.getLong(4) == 0L, "readback row diff")
    assert(row.getBoolean(5), "abort was not atomic")
    assert(row.getBoolean(6), "stray files after abort")
  }
}
