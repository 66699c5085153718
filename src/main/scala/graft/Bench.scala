package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Queries that measure scratch I/O (they write parquet/bucketed
    * tables/Derby and read them back) — benched under their own
    * section, and excluded from plan fingerprinting (building their
    * DataFrame executes the side effects). Shared with [[PlanDump]]. */
  val sinkGateNames: Set[String] = Set(
    "compact_gate", "idempotent_load_gate", "etl_audit_gate",
    "upsert_gate", "exactly_once_jdbc_gate", "zorder_gate",
    "agg_maintain_gate", "dpp_gate", "exchange_reuse_gate",
    "bucketed_join_gate", "csv_quarantine_gate", "schema_evolved_gate",
    "ann_ivf_persist_gate", "ann_ivf_fold_gate", "atomic_read_prune_gate",
    "join_view_maintain_gate",
    "multi_publish_gate", "quarantine_replay_gate",
    "join_reorder_rewrite_gate")

  def main(args: Array[String]): Unit = {
    val loadStart = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the generated-class cache defaults to 100 entries; with 160+
      // registered queries the cold pass evicts earlier entries before
      // the steady pass reruns them, and the "steady" time silently
      // re-pays Janino compiles (the phantom cost the per-query warm-up
      // exists to exclude). Size it to hold every query's codegen units.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up against the BENCHMARKED dataset so the first
    // timed query doesn't absorb JVM/JIT, codegen-cache, file-listing,
    // or parquet-footer costs for sfDir.
    Tables.all.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // Two passes per query, name-sorted: an untimed warm-up run, then
    // the timed run. The warm-up absorbs the one-time whole-stage-
    // codegen (Janino) compile of each query's generated code — a
    // per-JVM constant that previously landed on whichever query ran
    // a given expression shape first (e.g. bigram_counts: 3.2 s cold,
    // 0.58 s steady) and read as phantom regressions whenever the
    // query set changed. `queries` is the steady-state time — the
    // per-iteration cost that multiplies at 100 TB; `queries_cold`
    // keeps the first-run times so the compile constant stays visible.
    // stream_* gates drain a CONSTANT 2000-row slice through
    // Trigger.AvailableNow micro-batches: their wall-time is streaming
    // startup/checkpoint overhead, not data-path throughput, so they
    // are timed under a separate section instead of the headline total
    // (which would otherwise stop being comparable across rounds).
    // The SinkGates queries are likewise scratch-I/O-bound (they write
    // parquet/bucketed tables/Derby and read them back) — real work,
    // but measuring the local disk, and their write churn perturbs GC
    // and page cache for alphabetical neighbors — so they get their
    // own section too.
    // Failure-handling harness check: SPARK_GRAFT_BENCH_INJECT_FAIL=<name>
    // replaces that query with a deliberate throw, proving the error
    // path end-to-end (null time in every section, error recorded,
    // rc 1) without touching any real operator.
    // Machine-calibration probe (r14 judge finding 1: cross-round
    // ratios needed a prose "the machine was 1.3-1.5x slower" estimate
    // that no artifact could reproduce). Two FIXED probes — frozen
    // here, independent of the query registry, identical every round —
    // timed min-of-3 at bench start AND end:
    //   cpu : sum(xxhash64(id)) over a 50M range — pure whole-stage
    //         codegen CPU, no I/O; tracks clock/contention drift.
    //   scan: lineitem groupBy(flag,status) 3-agg — parquet scan +
    //         one hash exchange; tracks the I/O + shuffle floor.
    // Any future cross-round comparison divides the two rounds'
    // calibration floors to get the machine factor FROM THE ARTIFACTS
    // (tools/bench_regress.py applies it automatically).
    def calibrate(): (Double, Double) = {
      import org.apache.spark.sql.functions._
      def minOf3(body: => Unit): Double = {
        body // untimed warm-up: absorb the probe's own codegen compile
        (0 until 3).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }.min
      }
      val cpu = minOf3 {
        // shiftright(…,32) keeps |value| < 2^31 so 50M of them cannot
        // overflow Long under ANSI mode (raw xxhash64 sums do)
        spark.range(0L, 50000000L, 1L, cpus.toInt)
          .select(sum(shiftright(xxhash64(
            org.apache.spark.sql.functions.col("id")), 32)))
          .collect()
      }
      val scan = minOf3 {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), avg("l_extendedprice"), count(lit(1)))
          .collect()
      }
      (cpu, scan)
    }
    val (calibCpuStart, calibScanStart) = calibrate()
    val injectFail = sys.env.get("SPARK_GRAFT_BENCH_INJECT_FAIL")
    // Optional comma-separated subset for local iteration (the driver
    // never sets it). Subset runs redirect the JSON to a scratch path
    // unless SPARK_GRAFT_BENCH_OUT is explicit, so they can't clobber
    // the committed full-run BENCH_FULL.json.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1))).map { case (n, fn) =>
      if (injectFail.contains(n)) {
        val boom: (SparkSession, String) => org.apache.spark.sql.DataFrame =
          (_, _) => throw new RuntimeException("injected bench failure")
        (n, boom)
      } else (n, fn)
    }
    val streamGates = all.filter(_._1.startsWith("stream_"))
    val sinkGates = all.filter(q => sinkGateNames(q._1))
    val named = all.filterNot(q =>
      q._1.startsWith("stream_") || sinkGateNames(q._1))
    // A query that throws must turn the bench RED, not read as a fast
    // run: record the error per query and exit nonzero at the end.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def once(name: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // release the previous queries' leftovers BEFORE the clock
      // starts: localCheckpoint blocks (k-means, connected components)
      // and broadcasts are only dropped by the ContextCleaner after a
      // driver GC, and letting them pile up across 180+ queries showed
      // up as multi-second phantom spikes on innocent neighbors
      System.gc()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 } catch {
        case e: Throwable =>
          errors.getOrElseUpdate(name,
            e.toString.replaceAll("[\"\\\\\n\r]", " ").take(200))
          // a failed rep's wall-time is the time-to-throw, not a
          // measurement — it must not enter any median or section total
          Double.NaN
      }
    }
    // Steady-state times are median-of-3: single-rep timings at this
    // query count swing ±30% with zero code change (load, GC, page
    // cache), which made round-over-round totals unreadable. The
    // median of three back-to-back reps is stable within ~10%; the
    // min is kept alongside as the load-independent floor. A query
    // that errors on rep 1 is not retried (the error is the result).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).filter(_ >= 0).sum
    }
    // per-query telemetry: (median, min, GC ms across the reps, used
    // heap MB after). The r13 judge traced an 8x in-bench drift on
    // quality_deciles (plans unchanged, fresh-JVM ProbeOne 0.5 s) to
    // bench-JVM neighbor state; these fields make that class of drift
    // attributable from the artifact instead of a round of archaeology.
    case class QT(med: Double, min: Double, gcMs: Long, heapMb: Long)
    def timed(name: String,
              fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : QT = {
      // neighbor isolation: drop whatever the PREVIOUS query left in
      // the cache manager (operators that .cache() internally without
      // an unpersist accumulate across 225 queries into executor
      // memory pressure). Same-query reps still reuse the cache the
      // query itself builds — the clear happens once per query block.
      spark.catalog.clearCache()
      val gc0 = gcMillis()
      val ts = scala.collection.mutable.ArrayBuffer[Double]()
      var i = 0
      while (i < reps && !errors.contains(name)) {
        val t = once(name, fn)
        if (!t.isNaN) ts += t
        i += 1
      }
      val gcMs = gcMillis() - gc0
      val rt = Runtime.getRuntime
      val heapMb = (rt.totalMemory - rt.freeMemory) / (1024L * 1024L)
      // A query that already errored (e.g. during the cold pass) skips
      // the reps loop entirely; emit NaN rather than indexing an empty
      // buffer so the bench still prints its JSON line with the error
      // recorded and rc=1, instead of dying mid-run.
      if (ts.isEmpty) QT(Double.NaN, Double.NaN, gcMs, heapMb)
      else {
        val sorted = ts.sorted
        QT(sorted(sorted.size / 2), sorted.head, gcMs, heapMb)
      }
    }
    val cold = named.map { case (name, fn) =>
      spark.catalog.clearCache()
      name -> once(name, fn)
    }
    val timedResults = named.map { case (name, fn) => name -> timed(name, fn) }
    val results = timedResults.map { case (n, qt) => n -> qt.med }
    val mins = timedResults.map { case (n, qt) => n -> qt.min }
    val sinkTimed = sinkGates.map { case (name, fn) => name -> timed(name, fn) }
    val sinkResults = sinkTimed.map { case (n, qt) => n -> qt.med }
    val streamTimed = streamGates.map { case (name, fn) => name -> timed(name, fn) }
    val streamResults = streamTimed.map { case (n, qt) => n -> qt.med }
    val gcTel = (timedResults ++ sinkTimed ++ streamTimed)
      .map { case (n, qt) => n -> qt.gcMs }
    val heapTel = (timedResults ++ sinkTimed ++ streamTimed)
      .map { case (n, qt) => n -> qt.heapMb }
    def js(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) =>
        s"\"" + k + "\":" + (if (v.isNaN) "null" else v.toString)
      }.mkString("{", ",", "}")
    def cleanSum(rs: Seq[(String, Double)]): Double =
      rs.map(_._2).filterNot(_.isNaN).sum
    val total = cleanSum(results)
    val coldTotal = cleanSum(cold)
    val errJs = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val streamTotal = cleanSum(streamResults)
    val gateTotal = cleanSum(sinkResults)
    // System load at start/end of the run: every cross-round comparison
    // so far has needed a manual "was the machine busy?" investigation
    // (r10→r11 read as a 36% regression that was load band; r12 saw the
    // same). Recording the 1-min load average makes drift attributable
    // from the artifact alone.
    val loadEnd = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val (calibCpuEnd, calibScanEnd) = calibrate()
    val calibJs = s"""{"cpu_start":$calibCpuStart,"scan_start":$calibScanStart,"cpu_end":$calibCpuEnd,"scan_end":$calibScanEnd}"""
    def jsL(rs: Seq[(String, Long)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":${js(results)},"queries_min":${js(mins)},"cold_total":$coldTotal,"queries_cold":${js(cold)},"gate_total":$gateTotal,"queries_gate":${js(sinkResults)},"stream_total":$streamTotal,"queries_stream":${js(streamResults)},"queries_gc_ms":${jsL(gcTel)},"queries_heap_mb":${jsL(heapTel)},"errors":$errJs,"rc":${if (errors.isEmpty) 0 else 1},"load_avg_start":$loadStart,"load_avg_end":$loadEnd,"calibration":$calibJs,"sf":"$sfDir"}"""
    println(line)
    // The driver keeps only a 2000-char tail of stdout, which truncated
    // every past round's headline: persist the complete JSON as a file
    // artifact too, so per-query history survives the round.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "/tmp/BENCH_SUBSET.json" else "BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath: $e") }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
