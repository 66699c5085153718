package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY.md §2 F1-F3): the reference's
  * daily batch loop (reference: etl_pipeline.py:708-727) re-expressed
  * as continuous queries. Each builder takes/returns streaming
  * DataFrames so the same transforms compose with `readStream` file
  * sources in production and `MemoryStream` in tests.
  *
  * Scale notes: the watermark bounds window state; sessionization
  * state is per-user and updated incrementally (no per-batch sort of
  * history); the file-drop source paces itself with
  * `maxFilesPerTrigger` so a backlogged 100M-object bucket is drained
  * in bounded batches.
  */
object EventStream {

  /** F1: watermarked tumbling-window aggregation over an event stream
    * — the continuous version of `Relational.eventWindow`. */
  def windowedCounts(events: DataFrame, watermarkDelay: String = "30 minutes",
                     windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionAgg(user_id: Long, n_sessions: Long, n_events: Long)
  final case class SessState(nSessions: Long, nEvents: Long, lastSec: Long)

  /** F2: stateful gap-based sessionization (mapGroupsWithState) — the
    * streaming analogue of `Relational.sessionize`. State per user is
    * three longs; each micro-batch folds its events in timestamp
    * order into the running session count.
    *
    * Bounded state: a user's state is evicted once the event-time
    * watermark passes their last activity + gap (the session is
    * closed and can never reopen) — without eviction, per-user state
    * grows monotonically with user cardinality. Event-time timeout is
    * used deliberately: `ProcessingTimeTimeout` makes
    * `FlatMapGroupsWithStateExec.shouldRunAnotherBatch` return true
    * unconditionally, so the micro-batch engine spins no-data batches
    * back-to-back and `processAllAvailable()` never returns. Late
    * events are folded without rewinding `lastSec`, so an
    * out-of-order arrival can't make the next in-order event look
    * like a session break. */
  def sessionCounts(events: Dataset[Ev], gapSeconds: Long = 1800,
                    watermarkDelay: String = "1 hour"): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessState, SessionAgg](GroupStateTimeout.EventTimeTimeout) {
        case (uid, evs, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastSec + gap: session closed for good —
            // emit the final totals and release the state
            val st = state.get
            state.remove()
            SessionAgg(uid, st.nSessions, st.nEvents)
          } else {
            var st = state.getOption.getOrElse(SessState(0L, 0L, Long.MinValue))
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val sec = e.ts.getTime / 1000
              val isNew = st.lastSec == Long.MinValue || sec - st.lastSec > gapSeconds
              st = SessState(st.nSessions + (if (isNew) 1L else 0L),
                st.nEvents + 1L, math.max(st.lastSec, sec))
            }
            state.update(st)
            // a timeout timestamp must stay ahead of the watermark; the
            // max() guards users whose whole batch arrived late
            state.setTimeoutTimestamp(math.max(
              (st.lastSec + gapSeconds) * 1000L,
              state.getCurrentWatermarkMs() + 1L))
            SessionAgg(uid, st.nSessions, st.nEvents)
          }
      }
  }

  /** F4: streaming exact dedup — duplicates arriving within the
    * watermark horizon are dropped with bounded state (the streaming
    * form of `Cleaning.dedupRows`). */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  final case class ClosedSession(user_id: Long, start_sec: Long, end_sec: Long, n_events: Long)
  final case class OpenSess(startSec: Long, lastSec: Long, nEvents: Long)

  /** F2c: closed-session emission via `flatMapGroupsWithState` — emits
    * NOTHING while a session is open and exactly one row when the
    * event-time watermark passes last activity + gap (or when a new
    * in-order event opens the next session, closing the previous one).
    * flatMap (not map) because a batch can close zero or several
    * sessions for one user. State per user is one open session. */
  def closedSessions(events: Dataset[Ev], gapSeconds: Long = 1800,
                     watermarkDelay: String = "1 hour"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSess, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        case (uid, evs, state: GroupState[OpenSess]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, s.startSec, s.lastSec, s.nEvents))
          } else {
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var open = state.getOption
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val sec = e.ts.getTime / 1000
              open match {
                case Some(s) if sec - s.lastSec > gapSeconds =>
                  closed += ClosedSession(uid, s.startSec, s.lastSec, s.nEvents)
                  open = Some(OpenSess(sec, sec, 1L))
                case Some(s) =>
                  open = Some(OpenSess(s.startSec, math.max(s.lastSec, sec), s.nEvents + 1L))
                case None =>
                  open = Some(OpenSess(sec, sec, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(math.max(
                (s.lastSec + gapSeconds) * 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            closed.iterator
          }
      }
  }

  /** F2b: declarative streaming sessionization via `session_window` —
    * gap-merged sessions as a native aggregation; in Append mode a
    * session row is emitted exactly once, when the watermark passes
    * its end (closed-session semantics, bounded state). The custom
    * `sessionCounts` keeps running per-user totals instead; this form
    * yields per-session granularity. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
                       watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("n_events"), col("sum_value"))

  final case class UserTotal(user_id: Long, n_events: Long, sum_value: Double)
  final case class Totals(n: Long, sum: Double)

  /** F9 processor: running per-user totals in typed `ValueState` via
    * the Spark 4 arbitrary-state API. With a TTL, a user idle longer
    * than the TTL has their state evicted by the store itself and
    * restarts from zero — bounded state with no hand-rolled timer
    * bookkeeping (contrast `sessionCounts`' explicit timeout dance). */
  class RunningTotalsProcessor(ttlMillis: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, UserTotal] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}
    @transient private var totals: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[Totals]("totals",
        org.apache.spark.sql.Encoders.product[Totals],
        if (ttlMillis > 0) TTLConfig(java.time.Duration.ofMillis(ttlMillis))
        else TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotal] = {
      val prev = if (totals.exists()) totals.get() else Totals(0L, 0.0)
      var n = prev.n
      var s = prev.sum
      rows.foreach { e => n += 1; s += e.value }
      totals.update(Totals(n, s))
      Iterator(UserTotal(key, n, s))
    }
  }

  final case class BandDoc(bucket: String, doc_id: Long)
  final case class FlaggedDoc(doc_id: Long)

  /** F16 processor: one LSH band bucket per key, the bucket's member
    * doc ids in `ListState`. The near-dup rule is the batch LSH
    * candidate semantics — a doc is flagged iff its bucket contains a
    * SMALLER doc id — made batch-split-invariant by retro-emission:
    * when a new minimum arrives, every stored larger member is
    * re-emitted, so the cumulative flagged set equals the batch
    * computation no matter how arrivals interleave. Bucket size is
    * capped like the batch strict mode: an over-full bucket raises
    * instead of silently dropping candidates. */
  class NearDupProcessor(maxBucket: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, BandDoc, FlaggedDoc] {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TTLConfig}
    @transient private var members: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Long]("members",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BandDoc],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[FlaggedDoc] = {
      val olds = if (members.exists()) members.get().toSet else Set.empty[Long]
      val all = olds ++ rows.map(_.doc_id)
      if (all.size > maxBucket) throw new IllegalStateException(
        s"streaming LSH bucket exceeds maxBucket=$maxBucket (${all.size} ids) " +
        "— near-dup candidates would be silently dropped")
      val mn = all.min
      members.put(all.toArray)
      all.iterator.filter(_ > mn).map(FlaggedDoc)
    }
  }

  /** F16: streaming MinHash near-dup detection — the batch LSH dedup
    * (E2) as a continuous operator. Each doc explodes to its
    * [[graft.functions.HashExprs.minhashBandKeys]] band buckets (the
    * SAME codegen signature expression as the batch path); the
    * stateful per-bucket processor flags any doc whose bucket holds a
    * smaller id. State per bucket is its member list — bounded by the
    * same maxBucket cap the batch strict mode enforces. Requires the
    * RocksDB state store provider (the transformWithState contract).
    * Emissions are cumulative-with-retro-emission; readers take the
    * DISTINCT flagged ids. */
  def nearDupDocs(docs: DataFrame, shingleN: Int = 3, bands: Int = 32,
                  rowsPerBand: Int = 4, maxBucket: Int = 64): Dataset[FlaggedDoc] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    docs
      .select(col("doc_id"), posexplode(graft.functions.HashExprs.minhashBandKeys(
          graft.operators.Dedup.wordShingles("text", shingleN), bands, rowsPerBand))
        .as(Seq("band", "key")))
      .select(concat_ws(":", col("band"), col("key")).as("bucket"), col("doc_id"))
      .as[BandDoc]
      .groupByKey(_.bucket)
      .transformWithState(new NearDupProcessor(maxBucket),
        TimeMode.None(), OutputMode.Update())
  }

  /** F9: running per-user totals through `transformWithState` — the
    * Spark 4 replacement for mapGroupsWithState, on the RocksDB state
    * store (set `spark.sql.streaming.stateStore.providerClass` to the
    * RocksDB provider). ttlMillis > 0 turns on store-level state
    * expiry (requires processing-time mode per the API contract). */
  def runningTotals(events: Dataset[Ev], ttlMillis: Long = 0L): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor(ttlMillis),
        if (ttlMillis > 0) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }

  /** F5: stream-static enrichment join — each micro-batch joins
    * against a (small, broadcast) dimension snapshot, the streaming
    * form of the star join's dim lookup. The static side is re-read
    * per batch by Spark, so a refreshed dim table is picked up without
    * restarting the query. */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** F6: micro-batch JDBC/warehouse load via foreachBatch — the
    * reference's chunked PostgreSQL insert (etl_pipeline.py:485-517)
    * as a continuous sink. Each batch is appended transactionally by
    * the writer lambda; `batchId` gives exactly-once bookkeeping if
    * the writer dedups on it (the JDBC sink writes batchId into the
    * audit column for that). */
  def foreachBatchSink(events: DataFrame, queryName: String)(
      write: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .queryName(queryName)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        write(batch.withColumn("batch_id", lit(batchId)), batchId)
      }

  /** F12: streaming data-quality gate — the C10 expectations
    * ([[graft.operators.DataQuality]]) applied per micro-batch, with
    * rows that violate ANY rule quarantined instead of loaded, and a
    * per-batch audit row (batch id, rows in/good/quarantined, one
    * count per rule) folded into a processing-log table — the
    * operational shape a continuous 100 TB ingest actually runs: bad
    * data never reaches the warehouse, and the log explains every
    * dropped row without a second scan.
    *
    * Per batch the work is ONE marking projection + one aggregation
    * pass for all rule counters (the C10 single-pass shape) + two
    * filtered writes; the batch is persisted so the three consumers
    * share one read of the source files, and the quarantine write
    * carries a `violated_rules` array naming each failing rule so
    * triage never re-derives it. All paths are append-mode parquet —
    * idempotent replay semantics ride on the streaming checkpoint
    * exactly like [[foreachBatchSink]]. */
  def qualityGateSink(events: DataFrame,
                      expects: Seq[graft.operators.DataQuality.Expect],
                      goodPath: String, quarantinePath: String,
                      logPath: String, queryName: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(expects.nonEmpty, "qualityGateSink needs at least one rule")
    val anyBad = expects.map(_.violation).reduce(_ || _)
    val ruleNames = array(expects.map(e =>
      when(e.violation, lit(e.name))): _*)
    events.writeStream
      .queryName(queryName)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val marked = batch.withColumn("__bad", anyBad).persist()
        try {
          val aggs = count(lit(1)).as("n_in") +:
            sum(when(col("__bad"), 1L).otherwise(0L)).as("n_quarantined") +:
            expects.map(e => sum(when(e.violation, 1L).otherwise(0L)).as(e.name))
          marked.agg(aggs.head, aggs.tail: _*)
            .withColumn("batch_id", lit(batchId))
            .withColumn("n_good", col("n_in") - col("n_quarantined"))
            .write.mode("append").parquet(logPath)
          marked.filter(!col("__bad")).drop("__bad")
            .write.mode("append").parquet(goodPath)
          marked.filter(col("__bad")).drop("__bad")
            .withColumn("violated_rules", filter(ruleNames, _.isNotNull))
            .write.mode("append").parquet(quarantinePath)
        } finally marked.unpersist()
      }
  }

  /** F7: stream-stream interval join — click→purchase attribution with
    * bounded state: both sides are watermarked and the join condition
    * bounds purchase time to [click, click + `horizonSeconds`], so
    * Spark can expire click state once the watermark passes the
    * horizon. Without BOTH the watermarks and the time bound, a
    * stream-stream join would buffer one side forever. */
  def attributeWithin(clicks: DataFrame, purchases: DataFrame,
                      horizonSeconds: Long = 1800,
                      watermarkDelay: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizonSeconds SECONDS"))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** F10: stream-stream LEFT OUTER interval join — the abandonment
    * view of F7: clicks that never converted surface with null
    * purchase columns, but only once the watermark proves no purchase
    * can still arrive inside the horizon (outer rows emit on state
    * eviction, never speculatively). Same bounded-state requirements
    * as the inner form. */
  def attributeOrAbandon(clicks: DataFrame, purchases: DataFrame,
                         horizonSeconds: Long = 1800,
                         watermarkDelay: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizonSeconds SECONDS"),
      "leftOuter")
      .select(col("user_id"), col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** F3: continuous file-drop ingest — the reference's daily CSV loop
    * as a stream. New `events_<date>.csv[.gz]` files appearing in
    * `dropDir` are read incrementally, column-cleaned, and tagged with
    * their source file, exactly like the batch `EtlPipeline`. */
  def fileDropStream(spark: SparkSession, dropDir: String,
                     schema: StructType, maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .options(graft.sources.Readers.csvOptions)
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .csv(dropDir)
      .transform(graft.operators.Cleaning.cleanColumnNames)
      .withColumn("source_file", element_at(split(input_file_name(), "/"), -1))

  /** F11: incremental sketch-table maintenance — the streaming arm of
    * the E46 mergeable-sketch pattern. Each micro-batch is reduced to
    * per-key Theta sketches (kilobytes), which are UNIONED into the
    * persisted sketch table via `theta_union_agg`; the base events are
    * never re-read, so "distinct users per type, all time" stays
    * queryable at per-batch cost forever. The rewrite of the table is
    * keys-sized, not data-sized — the same incremental-maintenance
    * contract as the C13 aggregate sink, except sketches make even
    * DISTINCT mergeable.
    *
    * Publish is VERSIONED: each batch writes a complete new
    * `v_<n>` directory under the table root, then atomically swaps
    * the `_CURRENT` pointer file onto it. Readers
    * ([[readSketchTable]]) resolve the pointer, falling back to the
    * highest `_SUCCESS`-complete version if the pointer is mid-swap
    * or a crash removed it — so a reader can NEVER observe a missing
    * or partial table. The previously-current version is retained one
    * publish for in-flight readers; older versions are garbage-
    * collected. Crash points: a partial `v_<n>` without `_SUCCESS` is
    * invisible to resolution and simply overwritten by the next
    * publish; a lost pointer resolves to the newest complete version;
    * replaying a batch is idempotent because union is. */
  def sketchTableSink(events: DataFrame, tablePath: String, lgK: Int = 12):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    foreachBatchSink(events, "sketch_table") { (batch, _) =>
      import graft.functions.SketchFns._
      val spark = batch.sparkSession
      val batchSk = batch.groupBy(col("event_type"))
        .agg(thetaSketch(col("user_id"), lgK).as("sk"))
      val root = new org.apache.hadoop.fs.Path(tablePath)
      // resolve the filesystem FROM the path: tablePath may live on a
      // different scheme (s3a://, hdfs://) than the default FS
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val cur = currentSketchVersion(fs, root)
      val merged = cur match {
        case Some(n) =>
          spark.read.parquet(versionDir(root, n).toString)
            .unionByName(batchSk)
            .groupBy(col("event_type"))
            .agg(thetaUnion(col("sk"), lgK).as("sk"))
        case None => batchSk
      }
      val next = cur.map(_ + 1L).getOrElse(0L)
      // overwrite handles a partial v_<next> left by a crashed publish
      merged.write.mode("overwrite").parquet(versionDir(root, next).toString)
      // pointer swap: tmp-write + delete + rename. A reader in the
      // delete→rename instant falls back to the highest complete
      // version — which is already v_<next>.
      val ptr = new org.apache.hadoop.fs.Path(root, "_CURRENT")
      val tmp = new org.apache.hadoop.fs.Path(root, "_CURRENT.tmp")
      val out = fs.create(tmp, true)
      try out.write(next.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      fs.delete(ptr, false)
      if (!fs.rename(tmp, ptr))
        throw new java.io.IOException(s"sketch pointer swap failed: $tmp -> $ptr")
      // retain the just-replaced version for in-flight readers; GC older
      cur.foreach(n => listSketchVersions(fs, root)
        .filter(_ < n).foreach(v => fs.delete(versionDir(root, v), true)))
    }

  private def versionDir(root: org.apache.hadoop.fs.Path, n: Long) =
    new org.apache.hadoop.fs.Path(root, s"v_$n")

  private def listSketchVersions(fs: org.apache.hadoop.fs.FileSystem,
                                 root: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v_"))
      .flatMap(n => scala.util.Try(n.stripPrefix("v_").toLong).toOption)

  /** Resolve the current version of a versioned sketch table: the
    * `_CURRENT` pointer when it names a complete (`_SUCCESS`-marked)
    * version, else the highest complete version on disk — the
    * fallback that makes a pointer swap invisible to readers. */
  def currentSketchVersion(fs: org.apache.hadoop.fs.FileSystem,
                           root: org.apache.hadoop.fs.Path): Option[Long] = {
    def complete(n: Long): Boolean =
      try fs.exists(new org.apache.hadoop.fs.Path(versionDir(root, n), "_SUCCESS"))
      catch { case _: java.io.IOException => false }
    val pointed =
      try {
        val in = fs.open(new org.apache.hadoop.fs.Path(root, "_CURRENT"))
        try Some(new String(
            org.apache.commons.io.IOUtils.toByteArray(in),
            java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
        finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    pointed.filter(complete)
      .orElse(listSketchVersions(fs, root).filter(complete).sorted.lastOption)
  }

  /** Reader for [[sketchTableSink]] tables: resolves the current
    * complete version under the root, never a partial or mid-swap
    * state. */
  def readSketchTable(spark: SparkSession, tablePath: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val n = currentSketchVersion(fs, root).getOrElse(
      throw new java.io.FileNotFoundException(
        s"no complete sketch table version under $tablePath"))
    spark.read.parquet(versionDir(root, n).toString)
  }

  /** F17: incrementally-maintained per-window top-k serving table —
    * the "trending now" dashboard feed. The watermarked windowed
    * aggregation runs in UPDATE mode, so each micro-batch emits only
    * the (window, event_type) rows whose cumulative count changed;
    * foreachBatch appends them with their batch id, and
    * [[readTopK]] resolves last-writer-wins per key before the
    * bounded top-k selection. The append-only log is idempotent under
    * checkpoint replay (a replayed batch re-appends the same rows —
    * last-writer-wins collapses them), and per batch only CHANGED keys
    * hit the table, never the full window history. */
  def topKTableSink(events: DataFrame, tablePath: String, queryName: String,
                    watermarkDelay: String = "3650 days"):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    windowedCounts(events, watermarkDelay = watermarkDelay)
      .writeStream.queryName(queryName)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(tablePath)
      }

  /** Reader for [[topKTableSink]] tables: latest cumulative count per
    * (window, event_type) by max batch id, then the top `k` types per
    * window via the bounded [[graft.functions.TopKAgg]] aggregate
    * (map-side pruning to ≤ k per partition — no per-window sort).
    * Ties break on event_type ascending, a total order. */
  def readTopK(spark: SparkSession, tablePath: String, k: Int): DataFrame = {
    val latest = spark.read.parquet(tablePath)
      .groupBy(col("window_start"), col("event_type"))
      .agg(max(struct(col("batch_id"), col("n"))).as("f"))
      .select(col("window_start"), col("event_type"), col("f.n").as("n"))
    latest.groupBy(col("window_start"))
      .agg(graft.functions.TopKAgg.boundedTopK(
        struct((-col("n")).as("nn"), col("event_type")), k).as("top"))
      .select(col("window_start"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("window_start"), (col("pos") + 1).cast("int").as("rk"),
        col("t.event_type").as("event_type"), (-col("t.nn")).as("n"))
  }

  final case class AsOfRow(user_id: Long, us: Long, kind: String,
                           tier: String, event_id: Long)
  final case class DimVer(us: Long, tier: String)
  final case class AsOfEnriched(event_id: Long, user_id: Long, us: Long,
                                tier: Option[String])

  // ------------------------------------------------------------- F20
  /** F20 processor: streaming AS-OF enrichment where the dimension is
    * ITSELF a stream — the shape F5 (static dim) and F15 (static SCD2)
    * cannot express: profile updates and facts interleave on the wire,
    * and each fact must join the latest dim version at-or-before its
    * event time. Per-user `ListState` holds the dim version history
    * (bounded by versions per key, not facts); a fact scans it for the
    * greatest `us ≤ fact.us`. Dim rows in the same batch are indexed
    * before facts are answered, so intra-batch interleaving is safe;
    * CROSS-batch order (a fact arriving before its dim version) is the
    * caller's contract — production buffers facts behind a watermark
    * for one trigger, the gate stages dims ahead of facts, and a fact
    * with NO version at-or-before it emits tier=None rather than a
    * wrong join. */
  class StreamAsOfProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, AsOfRow, AsOfEnriched] {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TTLConfig}
    @transient private var versions: ListState[DimVer] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      versions = getHandle.getListState[DimVer]("versions",
        org.apache.spark.sql.Encoders.product[DimVer], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[AsOfRow],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[AsOfEnriched] = {
      val (dims, facts) = rows.toSeq.partition(_.kind == "dim")
      if (dims.nonEmpty) {
        val merged = (if (versions.exists()) versions.get().toSeq else Nil) ++
          dims.map(d => DimVer(d.us, d.tier))
        versions.put(merged.distinct.sortBy(_.us).toArray)
      }
      val vs = if (versions.exists()) versions.get().toSeq else Nil
      facts.iterator.map { f =>
        val hit = vs.filter(_.us <= f.us) match {
          case Seq() => None
          case hits  => Some(hits.maxBy(_.us).tier)
        }
        AsOfEnriched(f.event_id, f.user_id, f.us, hit)
      }
    }
  }

  /** F20: streaming as-of enrichment stream (tagged dim+fact union →
    * [[StreamAsOfProcessor]]). Append mode: each fact emits exactly
    * once, when it is answered. */
  def asOfEnrichStream(tagged: Dataset[AsOfRow]): Dataset[AsOfEnriched] = {
    import tagged.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    tagged.groupByKey(_.user_id)
      .transformWithState(new StreamAsOfProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  // ------------------------------------------------------------- F18
  /** CDC summary for [[cdcApplySink]]: reduce any slice of the change
    * stream to one row per key holding the latest delete tombstone
    * (`err`: an 'error' event deletes the key) and the latest upsert
    * (`ev`: any other event sets the key's value), each as a
    * `(us, id[, v])` struct ordered by logical event time. `max` over
    * these structs is a COMMUTATIVE, ASSOCIATIVE, IDEMPOTENT merge, so
    * the final state is independent of how the stream was cut into
    * micro-batches, of file arrival order, AND of checkpoint replays —
    * the CRDT-shaped formulation that makes a hand-rolled streaming
    * MERGE safe without transactional sinks. */
  def cdcSummarize(changes: DataFrame): DataFrame =
    changes.groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "error",
          struct(unix_micros(col("ts")).as("us"), col("event_id").as("id")))).as("err"),
        max(when(col("event_type") =!= "error",
          struct(unix_micros(col("ts")).as("us"), col("event_id").as("id"),
            col("value").as("v")))).as("ev"))

  /** F18: continuous CDC apply — maintain a keyed serving table from a
    * change stream (upserts + delete tombstones) via foreachBatch: each
    * micro-batch reduces to its [[cdcSummarize]] summary (one row per
    * touched key — the only thing that ever hits the state table), the
    * summary max-merges with the stored state, and the result swaps in
    * atomically (write-sibling-then-rename, the C9 upsert discipline).
    * Replay of a batch after a crash re-merges the same summary into a
    * state that may already contain it — a no-op by idempotence, so
    * the sink recovers from its checkpoint without a transactional
    * target. At scale the state rewrite is keys-sized, never
    * events-sized, and the per-batch shuffle carries touched keys
    * only. */
  def cdcApplySink(changes: DataFrame, statePath: String, queryName: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream
      .queryName(queryName)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        import org.apache.hadoop.fs.Path
        val s = batch.sparkSession
        val summ = cdcSummarize(batch)
        val fs = new Path(statePath)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val merged =
          if (!fs.exists(new Path(statePath))) summ
          else s.read.parquet(statePath).unionByName(summ)
            .groupBy(col("user_id"))
            .agg(max(col("err")).as("err"), max(col("ev")).as("ev"))
        val tmp = new Path(statePath + "_graft_cdc_tmp")
        val dst = new Path(statePath)
        merged.write.mode("overwrite").parquet(tmp.toString)
        fs.delete(dst, true)
        if (!fs.rename(tmp, dst))
          throw new java.io.IOException(s"cdc state swap failed: $tmp -> $dst")
      }

  // ------------------------------------------------------------- F19
  /** Fold one micro-batch of events into a [[graft.sinks.Sinks
    * .versionedPublish]] table of per-type running totals, EXACTLY
    * ONCE: the batch id rides into the snapshot as its atomic `_TAG`,
    * so a replayed batch (checkpoint recovery re-delivers the last
    * uncommitted batch) is detected by tag equality and skipped —
    * publish-then-crash cannot double-fold, crash-before-publish
    * refolds from unchanged state. Counts and exact-decimal sums are
    * algebraic, so fold order across batches cannot move the result.
    * Each fold's work is keys-sized (the batch pre-aggregates to one
    * row per type before touching stored state). */
  def foldBatchIntoVersioned(batch: DataFrame, batchId: Long,
                             tablePath: String): Unit = {
    import graft.sinks.Sinks
    import org.apache.spark.sql.types.DecimalType
    val s = batch.sparkSession
    val already = Sinks.latestVersion(s, tablePath).exists { v =>
      Sinks.versionTag(s, tablePath, v).contains(batchId.toString)
    }
    if (!already) {
      val inc = batch.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).as("sv"))
      val merged = Sinks.latestVersion(s, tablePath) match {
        case None => inc
        case Some(v) =>
          Sinks.readVersion(s, tablePath, v).unionByName(inc)
            .groupBy(col("event_type"))
            .agg(sum(col("n")).as("n"),
              sum(col("sv")).cast(DecimalType(18, 6)).as("sv"))
      }
      Sinks.versionedPublish(merged, tablePath, retain = 3,
        tag = Some(batchId.toString))
    }
  }

  /** F19 sink: every micro-batch publishes a new immutable version of
    * the per-type totals table via [[foldBatchIntoVersioned]] —
    * continuous aggregation with time travel over its own history and
    * exactly-once folds without a transactional store. */
  def versionedCountsSink(events: DataFrame, tablePath: String, queryName: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .queryName(queryName)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
        foldBatchIntoVersioned(batch.toDF(), bid, tablePath)
      }

  /** Reader for [[cdcApplySink]] state: the LIVE view — keys whose
    * latest upsert post-dates their latest tombstone (or that were
    * never deleted). Tombstoned keys stay in the state table (they
    * must: a stale replayed upsert has to lose to the tombstone) but
    * are filtered from the serving view here. */
  def readCdcState(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath)
      .filter(col("ev").isNotNull &&
        (col("err").isNull ||
          struct(col("ev.us"), col("ev.id")) > struct(col("err.us"), col("err.id"))))
      .select(col("user_id"), col("ev.us").as("last_us"), col("ev.v").as("last_value"))

  final case class EvId(user_id: Long, ts: Timestamp, event_id: Long, value: Double)
  final case class EwmaState(ewma: Double, n: Long, nAnom: Long,
                             lastUs: Long, lastId: Long, monotone: Boolean)
  final case class EwmaOut(user_id: Long, n_events: Long, n_anomalies: Long,
                           ewma: Double, monotone: Boolean)

  private def micros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** F21: stateful EWMA spike detection — the continuous form of the
    * C27 volume monitor. Per key the state is ONE (ewma, counters)
    * record; each micro-batch folds its events in (event-time, id)
    * order through the recursion `ewma' = (x + 3·ewma)/4` and flags
    * `|x − ewma_prev| > threshold`. The recursion is the SAME IEEE-754
    * op sequence the batch replay uses (an `aggregate` HOF over the
    * sorted history), so a stream drained in event-time order
    * reproduces the batch answer bit-for-bit — no tolerance needed.
    *
    * State is one fixed-size record per key — bounded by key
    * cardinality, not stream length; `monotone` records whether every
    * arrival respected (ts, id) order (the gate stages files so they
    * do, and asserts it — an EWMA folded out of order is a DIFFERENT
    * statistic, so the flag makes the precondition observable). */
  def ewmaAnomaly(events: Dataset[EvId],
                  threshold: Double = 25.0): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaOut](GroupStateTimeout.NoTimeout) {
        case (uid, evs, state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(
            EwmaState(0.0, 0L, 0L, Long.MinValue, Long.MinValue, monotone = true))
          evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val us = micros(e.ts)
            val mono = st.monotone && (st.n == 0L ||
              us > st.lastUs || (us == st.lastUs && e.event_id > st.lastId))
            val anom = st.n > 0L && math.abs(e.value - st.ewma) > threshold
            val ew = if (st.n == 0L) e.value else (e.value + 3.0 * st.ewma) / 4.0
            st = EwmaState(ew, st.n + 1L, st.nAnom + (if (anom) 1L else 0L),
              us, e.event_id, mono)
          }
          state.update(st)
          EwmaOut(uid, st.n, st.nAnom, st.ewma, st.monotone)
      }
  }

  /** F22: per-window value histogram against FIXED baseline bucket
    * edges — the streaming half of the PSI drift monitor (C33's
    * continuous form). The baseline min/max arrive as CONSTANTS
    * (precomputed from the reference snapshot, the way a deployed
    * monitor ships its baseline), so bucket assignment is pure
    * codegen in the stream — no stream-static join, no state beyond
    * the windowed counts. PSI assembly over the (window, bucket)
    * counts is a keys-sized batch step on the sink side. */
  def windowedHistogram(events: DataFrame, mn: Double, mx: Double,
                        nBuckets: Int = 10,
                        watermarkDelay: String = "30 minutes",
                        windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen),
        least(lit(nBuckets - 1),
          floor((col("value") - lit(mn)) / (lit(mx) - lit(mn)) * nBuckets)
            .cast("int")).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("bucket"), col("n"))
}
