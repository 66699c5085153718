package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{StringType, StructType}
import graft.streaming.EventStream
import graft.streaming.EventStream.Ev

/** Structured Streaming coverage (SURVEY.md §2 F1-F3) driven through
  * MemoryStream / a temp file drop — asserts the streaming results
  * equal what the batch operators produce on the same data. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  implicit private def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("F1: watermarked tumbling window aggregates per hour") {
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.windowedCounts(df, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("f1").outputMode(OutputMode.Complete).start()
    try {
      in.addData(
        (ts("2024-01-15 10:05:00"), "click", 1.0),
        (ts("2024-01-15 10:55:00"), "click", 2.0),
        (ts("2024-01-15 11:05:00"), "click", 4.0),
        (ts("2024-01-15 10:10:00"), "view", 8.0))
      q.processAllAvailable()
      val out = spark.table("f1")
        .select(date_format(col("window_start"), "HH:mm").as("h"),
          col("event_type"), col("n"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(out == Set(("10:00", "click", 2L, 3.0), ("11:00", "click", 1L, 4.0),
        ("10:00", "view", 1L, 8.0)))
    } finally q.stop()
  }

  test("F2: stateful sessionization accumulates across micro-batches") {
    val in = MemoryStream[Ev]
    val q = EventStream.sessionCounts(in.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("f2").outputMode(OutputMode.Update).start()
    try {
      in.addData(
        Ev(1L, ts("2024-01-15 10:00:00"), 1.0),
        Ev(1L, ts("2024-01-15 10:10:00"), 1.0))
      q.processAllAvailable()
      in.addData(Ev(1L, ts("2024-01-15 12:00:00"), 1.0)) // > 30 min gap
      q.processAllAvailable()
      val byBatch = spark.table("f2").as[EventStream.SessionAgg].collect()
      assert(byBatch.last == EventStream.SessionAgg(1L, 2L, 3L))
    } finally q.stop()
  }

  test("F9: transformWithState running totals accumulate; TTL evicts idle state") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // accumulation across micro-batches (no TTL)
      val in = MemoryStream[Ev]
      val q = EventStream.runningTotals(in.toDS())
        .writeStream.format("memory").queryName("f9").outputMode(OutputMode.Update).start()
      try {
        in.addData(Ev(1L, ts("2024-01-15 10:00:00"), 2.0),
          Ev(1L, ts("2024-01-15 10:01:00"), 3.0), Ev(2L, ts("2024-01-15 10:00:30"), 7.0))
        q.processAllAvailable()
        in.addData(Ev(1L, ts("2024-01-15 10:02:00"), 5.0))
        q.processAllAvailable()
        val last = spark.table("f9").as[EventStream.UserTotal].collect()
          .groupBy(_.user_id).view.mapValues(_.last).toMap
        assert(last(1L) == EventStream.UserTotal(1L, 3L, 10.0))
        assert(last(2L) == EventStream.UserTotal(2L, 1L, 7.0))
      } finally q.stop()

      // TTL: state for an idle user is evicted → totals restart.
      // ProcessingTime mode keeps scheduling no-data batches (same
      // engine behavior as the ProcessingTimeTimeout hang), so drive
      // it with AvailableNow runs over a shared checkpoint instead of
      // processAllAvailable.
      val ckpt = Files.createTempDirectory("graft_f9ttl").toString
      val in2 = MemoryStream[Ev]
      // memory sink can't recover from a checkpoint → collect each
      // AvailableNow run through foreachBatch (checkpoint-restartable)
      val collected = scala.collection.mutable.ArrayBuffer.empty[EventStream.UserTotal]
      def runOnce(): Seq[EventStream.UserTotal] = {
        collected.clear()
        val q2 = EventStream.runningTotals(in2.toDS(), ttlMillis = 1500L)
          .writeStream
          .outputMode(OutputMode.Update)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventStream.UserTotal], _: Long) =>
            val rows = batch.collect()
            collected.synchronized { collected ++= rows }; ()
          }
          .start()
        try q2.awaitTermination(60000L) finally q2.stop()
        collected.toSeq
      }
      in2.addData(Ev(5L, ts("2024-01-15 10:00:00"), 1.0))
      assert(runOnce() == Seq(EventStream.UserTotal(5L, 1L, 1.0)))
      Thread.sleep(2500) // > TTL: the stored value expires in the store
      in2.addData(Ev(5L, ts("2024-01-15 10:10:00"), 1.0))
      // restarted from zero, not 2 events / 2.0
      assert(runOnce() == Seq(EventStream.UserTotal(5L, 1L, 1.0)))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("F2c: flatMapGroupsWithState emits closed sessions only") {
    val in = MemoryStream[Ev]
    val q = EventStream.closedSessions(in.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("f2c")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        Ev(1L, ts("2024-01-15 10:00:00"), 1.0),
        Ev(1L, ts("2024-01-15 10:10:00"), 1.0))
      q.processAllAvailable()
      assert(spark.table("f2c").count() == 0) // session still open
      // >gap later: closes session 1 in-stream (no watermark needed)
      in.addData(Ev(1L, ts("2024-01-15 12:00:00"), 1.0))
      q.processAllAvailable()
      val out = spark.table("f2c").as[EventStream.ClosedSession].collect().toSeq
      assert(out == Seq(EventStream.ClosedSession(1L,
        ts("2024-01-15 10:00:00").getTime / 1000,
        ts("2024-01-15 10:10:00").getTime / 1000, 2L)))
    } finally q.stop()
  }

  test("F2b: session_window emits a session exactly once, when it closes") {
    val in = MemoryStream[(Timestamp, Long, Double)]
    val q = EventStream.sessionWindowAgg(in.toDF().toDF("ts", "user_id", "value"))
      .writeStream.format("memory").queryName("f2b")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts("2024-01-15 10:00:00"), 1L, 1.0),
        (ts("2024-01-15 10:10:00"), 1L, 2.0))
      q.processAllAvailable()
      // session [10:00, 10:40) is still open — nothing emitted yet
      assert(spark.table("f2b").count() == 0)
      // a much later event pushes the watermark past the session end
      in.addData((ts("2024-01-15 12:00:00"), 1L, 4.0))
      q.processAllAvailable()
      val out = spark.table("f2b")
        .select("user_id", "n_events", "sum_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(out == Set((1L, 2L, 3.0))) // closed session only; 12:00 still open
    } finally q.stop()
  }

  test("F4: streaming dedup drops duplicates within the watermark") {
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = in.toDF().toDF("event_id", "ts", "payload")
    val q = graft.streaming.EventStream.dedupStream(df, Seq("event_id"))
      .writeStream.format("memory").queryName("f4").outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, ts("2024-01-15 10:00:00"), "a"), (1L, ts("2024-01-15 10:01:00"), "dup"))
      q.processAllAvailable()
      in.addData((1L, ts("2024-01-15 10:02:00"), "dup2"), (2L, ts("2024-01-15 10:03:00"), "b"))
      q.processAllAvailable()
      val ids = spark.table("f4").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("F5: stream-static join enriches each micro-batch from a dim table") {
    val in = MemoryStream[(Long, Double)]
    val events = in.toDF().toDF("user_id", "value")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStream.enrichWithDim(events, dim, "user_id")
      .writeStream.format("memory").queryName("f5").outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, 10.0), (2L, 20.0), (3L, 30.0))
      q.processAllAvailable()
      val out = spark.table("f5").as[(Long, Double, String)].collect().toSet
      assert(out == Set((1L, 10.0, "gold"), (2L, 20.0, "basic"), (3L, 30.0, null)))
    } finally q.stop()
  }

  test("F6: foreachBatch sink appends each micro-batch with its batch id") {
    val dir = Files.createTempDirectory("graft_f6_sink").toString
    val in = MemoryStream[(Long, String)]
    val events = in.toDF().toDF("event_id", "payload")
    val q = EventStream.foreachBatchSink(events, "f6") { (batch, _) =>
      batch.write.mode("append").parquet(dir)
    }.start()
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      in.addData((3L, "c"))
      q.processAllAvailable()
      val out = spark.read.parquet(dir)
      assert(out.count() == 3)
      // batch provenance recorded: the two arrivals carry distinct ids
      assert(out.select("batch_id").distinct().count() == 2)
      assert(out.filter(col("event_id") === 3L).select("batch_id").head().getLong(0) >
        out.filter(col("event_id") === 1L).select("batch_id").head().getLong(0))
    } finally q.stop()
  }

  test("F7: stream-stream interval join attributes purchases to clicks in-horizon") {
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventStream.attributeWithin(
      clicks.toDF().toDF("user_id", "ts"),
      purchases.toDF().toDF("user_id", "ts", "value"),
      horizonSeconds = 1800)
    val q = joined.writeStream.format("memory").queryName("f7")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((1L, ts("2024-01-15 10:00:00")), (2L, ts("2024-01-15 10:00:00")))
      purchases.addData(
        (1L, ts("2024-01-15 10:20:00"), 5.0),  // in horizon → attributed
        (2L, ts("2024-01-15 11:30:00"), 7.0),  // past horizon → dropped
        (3L, ts("2024-01-15 10:10:00"), 9.0))  // no click → dropped
      q.processAllAvailable()
      val out = spark.table("f7")
        .select("user_id", "purchase_value").as[(Long, Double)].collect().toSet
      assert(out == Set((1L, 5.0)))
    } finally q.stop()
  }

  test("F10: left-outer interval join emits abandoned clicks after the watermark") {
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventStream.attributeOrAbandon(
      clicks.toDF().toDF("user_id", "ts"),
      purchases.toDF().toDF("user_id", "ts", "value"),
      horizonSeconds = 1800, watermarkDelay = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("f10")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData((1L, ts("2024-01-15 10:00:00")), (2L, ts("2024-01-15 10:00:00")))
      purchases.addData((1L, ts("2024-01-15 10:20:00"), 5.0)) // converts
      q.processAllAvailable()
      // nothing abandoned yet: user 2's horizon is still open
      val early = spark.table("f10").filter(col("purchase_value").isNull).count()
      assert(early == 0)
      // advance BOTH watermarks far past click+horizon+delay → user 2's
      // click state evicts and must emit exactly one null-padded row
      clicks.addData((9L, ts("2024-01-15 13:00:00")))
      purchases.addData((9L, ts("2024-01-15 13:00:01"), 1.0))
      q.processAllAvailable()
      clicks.addData((10L, ts("2024-01-15 14:00:00")))
      purchases.addData((10L, ts("2024-01-15 14:00:01"), 1.0))
      q.processAllAvailable()
      val abandoned = spark.table("f10")
        .filter(col("purchase_value").isNull)
        .select("user_id").as[Long].collect().toSet
      assert(abandoned == Set(2L), s"got $abandoned")
      val converted = spark.table("f10")
        .filter(col("purchase_value").isNotNull)
        .select("user_id").as[Long].collect().toSet
      assert(converted.contains(1L))
    } finally q.stop()
  }

  test("F8: restart from checkpoint resumes ingest without reprocessing") {
    val drop = Files.createTempDirectory("graft_ckpt_drop").toString
    val out = Files.createTempDirectory("graft_ckpt_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_state").toString
    val schema = new StructType().add("user", StringType).add("v", StringType)
    def writeFile(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(drop, name), ("user,v" +: rows).mkString("\n").getBytes)
    def start() = EventStream.fileDropStream(spark, drop, schema)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    writeFile("events_2024-01-15.csv", Seq("a,1", "b,2"))
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(out).count() == 2)

    // a restart must pick up ONLY the new file — the checkpoint's file
    // log already holds day 1 (the reference had no such guarantee:
    // rerunning a day re-inserted its rows)
    writeFile("events_2024-01-16.csv", Seq("c,3"))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 3)
    assert(rows.filter(col("user") === "a").count() == 1) // no duplicate replay
  }

  test("F12: quality gate quarantines rule violations and logs per-batch counters") {
    import graft.operators.DataQuality
    val in = MemoryStream[(Long, String, Double)]
    val df = in.toDF().toDF("id", "event_type", "value")
    val rules = Seq(
      DataQuality.expectBetween("value", 0.0, 10.0),
      DataQuality.expectIn("event_type", Seq("a", "b")),
      DataQuality.expectNonNull("id")) // never violated: pins the zero branch
    val root = Files.createTempDirectory("f12").toString
    val (good, quar, log) = (root + "/g", root + "/q", root + "/l")
    val q = EventStream.qualityGateSink(df, rules, good, quar, log, "f12")
      .option("checkpointLocation", root + "/ck").start()
    try {
      in.addData((1L, "a", 1.0), (2L, "zz", 2.0))
      q.processAllAvailable()
      in.addData((3L, "b", 99.0), (4L, "zz", -5.0), (5L, "a", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val goodIds = spark.read.parquet(good).select("id").as[Long].collect().toSet
    assert(goodIds == Set(1L, 5L))
    val quarMap = spark.read.parquet(quar)
      .select(col("id"), col("violated_rules"))
      .as[(Long, Seq[String])].collect().toMap
    assert(quarMap.keySet == Set(2L, 3L, 4L))
    assert(quarMap(2L) == Seq("domain_event_type"))
    assert(quarMap(3L) == Seq("range_value"))
    assert(quarMap(4L) == Seq("range_value", "domain_event_type")) // rule order preserved
    val logRows = spark.read.parquet(log).orderBy("batch_id").collect()
    assert(logRows.length == 2)
    val (b0, b1) = (logRows(0), logRows(1))
    assert(b0.getAs[Long]("n_in") == 2 && b0.getAs[Long]("n_good") == 1
      && b0.getAs[Long]("n_quarantined") == 1)
    assert(b1.getAs[Long]("n_in") == 3 && b1.getAs[Long]("n_good") == 1
      && b1.getAs[Long]("n_quarantined") == 2)
    assert(b1.getAs[Long]("range_value") == 2
      && b1.getAs[Long]("domain_event_type") == 1
      && b1.getAs[Long]("non_null_id") == 0)
  }

  test("F3: file-drop stream ingests newly arriving date-named CSVs") {
    val drop = Files.createTempDirectory("graft_stream_drop").toString
    val schema = new StructType().add("{user}", StringType).add("v", StringType)
    def writeFile(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(drop, name),
        ("{user},v" +: rows).mkString("\n").getBytes)

    writeFile("events_2024-01-15.csv", Seq("a,1", "b,2"))
    val q = EventStream.fileDropStream(spark, drop, schema)
      .writeStream.format("memory").queryName("f3").outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      assert(spark.table("f3").count() == 2)
      // a new day's file arrives → picked up incrementally
      writeFile("events_2024-01-16.csv", Seq("c,3"))
      q.processAllAvailable()
      val out = spark.table("f3")
      assert(out.count() == 3)
      // column names cleaned + provenance tagged, like the batch path
      assert(out.columns.contains("user"))
      assert(out.filter(col("source_file") === "events_2024-01-16.csv").count() == 1)
    } finally q.stop()
  }

  test("F11: incremental sketch table — two batches union to the true distinct") {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.{Sketches => Th}
    val table = Files.createTempDirectory("graft_sketch_table").toString + "/t"
    val in = MemoryStream[(String, Long)]
    val q = EventStream.sketchTableSink(
      in.toDF().toDF("event_type", "user_id"), table)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sketch_ckpt").toString)
      .start()
    try {
      in.addData((0 until 300).map(i => ("click", i.toLong)): _*)
      q.processAllAvailable()
      // overlapping second batch: 150..449 — union must dedup to 450
      in.addData((150 until 450).map(i => ("click", i.toLong)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val rows = EventStream.readSketchTable(spark, table).collect()
    assert(rows.length == 1)
    val est = Th.wrapSketch(
      Memory.wrap(rows(0).getAs[Array[Byte]]("sk"))).getEstimate
    // 450 < 2^12 nominal entries → the union is in exact mode
    assert(math.round(est) == 450, s"expected exact 450 distinct, got $est")
  }

  private def sketchEstimate(rows: Array[org.apache.spark.sql.Row]): Long = {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.{Sketches => Th}
    assert(rows.length == 1)
    math.round(Th.wrapSketch(
      Memory.wrap(rows(0).getAs[Array[Byte]]("sk"))).getEstimate)
  }

  private def runSketchBatch(table: String, users: Range): Unit = {
    val in = MemoryStream[(String, Long)]
    val q = EventStream.sketchTableSink(
      in.toDF().toDF("event_type", "user_id"), table)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sketch_ck").toString)
      .start()
    try {
      in.addData(users.map(i => ("click", i.toLong)): _*)
      q.processAllAvailable()
    } finally q.stop()
  }

  test("F11: sketch table survives a lost pointer (crash mid-swap)") {
    val table = Files.createTempDirectory("graft_sketch_rec").toString + "/t"
    // batch 1 accumulates 300 users, then we simulate the worst swap
    // crash: the _CURRENT pointer is gone entirely
    runSketchBatch(table, 0 until 300)
    val root = new org.apache.hadoop.fs.Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(root, "_CURRENT"), false),
      "test setup: simulate pointer lost mid-swap")
    // a reader with no pointer falls back to the newest complete version
    assert(sketchEstimate(
      EventStream.readSketchTable(spark, table).collect()) == 300)
    // the next batch (disjoint users) must also recover and MERGE —
    // not rebuild from the current batch alone
    runSketchBatch(table, 1000 until 1100)
    assert(sketchEstimate(
      EventStream.readSketchTable(spark, table).collect()) == 400,
      "recovery lost accumulated sketches")
  }

  test("F11: a partial version without _SUCCESS is invisible and gets overwritten") {
    val table = Files.createTempDirectory("graft_sketch_part").toString + "/t"
    runSketchBatch(table, 0 until 300)
    val root = new org.apache.hadoop.fs.Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a publish that crashed mid-write: v_1 exists, incomplete
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "v_1"))
    assert(sketchEstimate(
      EventStream.readSketchTable(spark, table).collect()) == 300)
    runSketchBatch(table, 300 until 450) // publishes a complete v_1
    assert(sketchEstimate(
      EventStream.readSketchTable(spark, table).collect()) == 450)
  }

  test("F11: a reader holding the previous version survives the next publish") {
    val table = Files.createTempDirectory("graft_sketch_race").toString + "/t"
    runSketchBatch(table, 0 until 300)
    // resolve NOW (v_0) — an in-flight reader racing the next publish
    val held = EventStream.readSketchTable(spark, table)
    runSketchBatch(table, 300 until 450) // publishes v_1; v_0 retained
    assert(sketchEstimate(held.collect()) == 300,
      "in-flight reader lost its version to the publish")
    assert(sketchEstimate(
      EventStream.readSketchTable(spark, table).collect()) == 450)
    // a third publish garbage-collects v_0 (two versions back)
    runSketchBatch(table, 450 until 500)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(table + "/v_0")),
      "old versions must be garbage-collected")
    assert(sketchEstimate(
      EventStream.readSketchTable(spark, table).collect()) == 500)
  }

  test("F20: as-of processor answers facts from versions <= their time") {
    import org.apache.spark.sql.functions._
    // run the REAL stream over a temp staging: v1@100, v2@200 for user 1,
    // facts at 50 (before any version), 150 (v1), 250 (v2)
    val dir = java.nio.file.Files.createTempDirectory("graft_sasof_spec").toString
    val in = dir + "/in"
    val rows = Seq(
      EventStream.AsOfRow(1L, 100L, "dim", "v1", 0L),
      EventStream.AsOfRow(1L, 200L, "dim", "v2", 0L),
      EventStream.AsOfRow(1L, 50L, "fact", null, 101L),
      EventStream.AsOfRow(1L, 150L, "fact", null, 102L),
      EventStream.AsOfRow(1L, 250L, "fact", null, 103L))
    import spark.implicits._
    rows.toDF().coalesce(1).write.mode("overwrite").parquet(in)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = EventStream.asOfEnrichStream(
          spark.readStream.schema(rows.toDF().schema).parquet(in)
            .as[EventStream.AsOfRow])
        .writeStream.format("memory").queryName("sasof_spec")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", dir + "/ck").start()
      q.awaitTermination(60000)
      val got = spark.table("sasof_spec").collect()
        .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
      assert(got == Map(101L -> None, 102L -> Some("v1"), 103L -> Some("v2")),
        got.toString)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("F19: versioned fold is exactly-once under replay and order-robust") {
    import org.apache.spark.sql.functions._
    val table = java.nio.file.Files.createTempDirectory("graft_vfold").toString + "/t"
    val ev = Tables.events(spark, sf).filter(col("event_id") < 500)
    val b1 = ev.filter(col("event_id") % 2 === 0)
    val b2 = ev.filter(col("event_id") % 2 === 1)
    EventStream.foldBatchIntoVersioned(b1, 0L, table)
    val v1 = graft.sinks.Sinks.latestVersion(spark, table).get
    EventStream.foldBatchIntoVersioned(b1, 0L, table) // replayed batch
    assert(graft.sinks.Sinks.latestVersion(spark, table).contains(v1),
      "replaying a committed batch must not publish a new version")
    EventStream.foldBatchIntoVersioned(b2, 1L, table)
    val got = graft.sinks.Sinks.readVersion(spark, table)
      .select(col("event_type"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = ev.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"$got vs $want")
  }

  test("F18: cdcSummarize max-merge is batch-split invariant; tombstone wins") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf).filter(col("event_id") < 1000)
    val whole = EventStream.cdcSummarize(ev)
    // split arbitrarily (NOT by time), summarize each, max-merge
    val parts = Seq(ev.filter(col("event_id") % 3 === 0),
      ev.filter(col("event_id") % 3 === 1),
      ev.filter(col("event_id") % 3 === 2))
    val merged = parts.map(EventStream.cdcSummarize)
      .reduce(_ unionByName _)
      .groupBy(col("user_id"))
      .agg(max(col("err")).as("err"), max(col("ev")).as("ev"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty,
      "split-then-merge must equal whole-slice summary")
    // replay idempotence: merging the whole summary into itself is a no-op
    val replayed = whole.unionByName(whole).groupBy(col("user_id"))
      .agg(max(col("err")).as("err"), max(col("ev")).as("ev"))
    assert(whole.exceptAll(replayed).isEmpty && replayed.exceptAll(whole).isEmpty)
    // tombstone-wins: a user whose latest change is an error is filtered
    // from the live view even though their upserts are still in state
    val lastIsError = ev
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1 && col("event_type") === "error")
      .select(col("user_id"))
    val liveShaped = whole.filter(col("ev").isNotNull &&
      (col("err").isNull ||
        struct(col("ev.us"), col("ev.id")) > struct(col("err.us"), col("err.id"))))
    assert(liveShaped.join(lastIsError, Seq("user_id")).count() == 0,
      "tombstoned users must not appear live")
  }
}
