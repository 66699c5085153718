package graft.sources

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** `graft-atomic` — a transactional DataSourceV2 source (A15 write,
  * A18 read), the commit-contract complement of the `graft-catalog`
  * listing source (A14). The reference's loader commits by chunked
  * INSERTs with no all-or-nothing boundary (etl_pipeline.py:485-517);
  * this sink gives a plain object store the commit contract a
  * warehouse table has:
  *
  *   - Tasks write attempt-unique files DIRECTLY into the target
  *     directory — `part-<partition>-<taskId>-<queryId>.csv` — with NO
  *     rename at commit. On an object store a "rename" is a full
  *     copy, so rename-based commit protocols (Hadoop FileOutputCommitter
  *     v1/v2) cost O(data) at commit or lose atomicity; here commit
  *     cost is O(1) regardless of data size: the Iceberg/Delta
  *     insight, re-expressed minimally.
  *   - Visibility is MANIFEST-ONLY and VERSIONED: a reader lists only
  *     `_MANIFEST.v<n>` names, opens the highest version whose commit
  *     footer validates, and reads exactly the files that manifest
  *     names. A crashed job's orphan files are invisible forever; a
  *     torn (partially written) manifest fails footer validation and
  *     the reader falls back to the previous version — there is NO
  *     window in which a committed table reads as empty, because
  *     nothing is ever deleted or renamed on the commit path.
  *   - `commit()` publishes version n+1 the Delta/HDFSLogStore way:
  *     the COMPLETE manifest is written to an attempt-unique tmp name,
  *     then bound to `_MANIFEST.v<n+1>` through the PLUGGABLE claim
  *     primitive ([[graft.sources.ManifestCommitStore]]): atomic
  *     rename-no-overwrite where the filesystem honors that contract
  *     (HDFS/POSIX — [[graft.sources.RenameCommitStore]]), a
  *     conditional PUT (`If-None-Match: *`) through a configured
  *     [[graft.sources.ConditionalPutCommitStore]] on object stores.
  *     Schemes whose rename is EMULATED (s3a, gs, wasb, abfs) are
  *     REFUSED outright unless such a store is configured
  *     ([[graft.sources.AtomicCommitStores.ConfKey]]) — a lost update
  *     must be impossible, not merely unlikely. The version name only
  *     ever appears with complete content; a residual check-then-act
  *     race is closed by reading the manifest back and verifying the
  *     committer id in its footer. A loser re-reads the NEW latest manifest,
  *     re-folds its entries, and retries at the next version —
  *     concurrent appends BOTH stay visible (no lost update);
  *     contention past [[AtomicSink.MaxCommitRetries]] fails loudly.
  *   - Appends carry an optional idempotence TAG
  *     (`.option("graft.tag", ...)`): a commit whose tag is already
  *     recorded in the current manifest chain is a REPLAY — its files
  *     are deleted and no new version is published. This is the
  *     exactly-once handshake for foreachBatch streaming publishes
  *     (tag = batch id): a checkpoint-restart re-execution of a batch
  *     folds nothing twice.
  *   - Spark's output-commit coordinator admits ONE winning attempt
  *     per task; only winners' [[WriterCommitMessage]]s reach
  *     `commit()`, so a speculative or retried attempt's file never
  *     enters the manifest — exactly-once visibility without
  *     distributed locks.
  *   - NOTHING is physically deleted at commit time — an overwrite
  *     publishes a manifest that simply stops listing the previous
  *     generation, so concurrent readers of older versions keep their
  *     snapshot. [[AtomicSink.vacuum]] is the single reclamation
  *     point, and it only touches files older than its retention
  *     threshold, so it cannot destroy a concurrent in-flight write's
  *     task files (which are by definition young).
  *   - `abort()` (driver) and `DataWriter.abort()` (task) delete this
  *     query's physical files; even if a crash skips that cleanup, the
  *     manifest never saw them, so readers are unaffected.
  *
  * The READ side (A18) is first-class DSv2: `spark.read
  * .format("graft-atomic").load(root)` plans one [[InputPartition]]
  * per manifest-listed file, prunes columns into the CSV decoder
  * (only required fields are converted), and reports exact row/byte
  * statistics straight from the manifest — no listing, no sampling.
  *
  * Rows are RFC-4180 CSV (strings always quoted, internal quotes
  * doubled, null = unquoted empty), readable by Spark's splittable CSV
  * reader; supported column types are string/long/int/double/float/
  * boolean — rejected up front otherwise. Values containing newlines
  * need `multiLine` readback and are out of contract at scale.
  */
object AtomicSink {
  /** Versioned manifest name prefix; the 20-digit zero-pad keeps
    * lexicographic and numeric order identical. */
  val ManifestPrefix = "_MANIFEST.v"
  /** Commit-contention bound: each retry re-reads the latest manifest
    * and attempts the next version, so 50 failures means 50 other
    * commits landed meanwhile — at that point give up loudly. */
  val MaxCommitRetries = 50
  /** Default vacuum retention: files younger than this are presumed to
    * belong to an in-flight (not yet committed) write and are never
    * reclaimed. Callers that can assert no concurrent writers (tests,
    * single-job pipelines) may pass 0. */
  val DefaultRetentionMs: Long = 24L * 60 * 60 * 1000

  /** One committed table version: schema DDL, the exact files visible
    * (name, rows, bytes), the idempotence tags already applied in this
    * chain, and the committer id the CAS verification checks.
    * `stats` (r19, A19) carries optional per-file column min/max —
    * fileName → (column, min, max) triples, values as the exact
    * round-tripping `toString` of the column's native type — recorded
    * at commit time for numeric columns and enforced by the DSv2
    * scan's file skipping; a file absent from the map (pre-stats
    * manifests) or a column absent from a file's triples is simply
    * never skipped. */
  case class Manifest(version: Long, ddl: String,
      entries: Seq[(String, Long, Long)], tags: Set[String],
      committerId: String,
      stats: Map[String, Seq[(String, String, String)]] = Map.empty)

  private[sources] def supportedType(t: DataType): Boolean = t match {
    case StringType | LongType | IntegerType | DoubleType | FloatType |
         BooleanType => true
    case _ => false
  }

  private[sources] def csvCell(v: Any): String = v match {
    case null => ""
    case s: String => "\"" + s.replace("\"", "\"\"") + "\""
    case other => other.toString
  }

  def manifestPath(root: Path, version: Long): Path =
    new Path(root, f"$ManifestPrefix$version%020d")

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith(ManifestPrefix))
      name.substring(ManifestPrefix.length).toLongOption
    else None

  /** All claimed version numbers, descending (claims happen by atomic
    * rename, so a claimed name normally implies complete content — an
    * invalid one is protocol-foreign garbage, skipped by readers). */
  private def claimedVersions(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Array[Long] =
    if (fs.exists(root))
      fs.listStatus(root).flatMap(st => versionOf(st.getPath.getName))
        .sorted(Ordering[Long].reverse)
    else Array.empty[Long]

  /** Highest-version manifest whose footer validates. Invalid claims
    * (a non-protocol writer, or an object store whose emulated rename
    * tore) are skipped — the previous version stays visible. */
  def latestManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Option[Manifest] =
    claimedVersions(fs, root).iterator
      .flatMap(v => readManifest(fs, manifestPath(root, v), v))
      .nextOption()

  /** Read back ONLY what a committed manifest makes visible. No data
    * listing: absent manifest = empty table (the defined state after
    * an aborted first write). */
  def readCommitted(s: SparkSession, root: String): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    latestManifest(fs, rootPath) match {
      case None => s.emptyDataFrame
      case Some(m) =>
        val schema = StructType.fromDDL(m.ddl)
        if (m.entries.isEmpty)
          s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else s.read.schema(schema)
          .option("quote", "\"").option("escape", "\"")
          .csv(m.entries.map(f => new Path(rootPath, f._1).toString): _*)
    }
  }

  /** Reclaim files the LATEST manifest does not list — crashed jobs'
    * orphans and previous table generations — plus superseded manifest
    * versions. Returns (keptFiles, deletedFiles).
    *
    * The retention guard is load-bearing for concurrency: an IN-FLIGHT
    * write's task files exist before its manifest does, so an unguarded
    * vacuum would delete them and the subsequent commit would publish
    * dangling names. Anything younger than `retentionMs` is therefore
    * presumed in-flight and kept (the Delta/Iceberg vacuum contract);
    * pass 0 only when the caller can assert no concurrent writers. */
  def vacuum(s: SparkSession, root: String,
      retentionMs: Long = DefaultRetentionMs): (Long, Long) = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val latest = latestManifest(fs, rootPath)
    val live: Set[String] = latest.map(_.entries.map(_._1).toSet).getOrElse(Set.empty)
    val latestName = latest.map(m => manifestPath(rootPath, m.version).getName)
    val cutoff = System.currentTimeMillis() - retentionMs
    var kept = 0L
    var deleted = 0L
    if (fs.exists(rootPath)) fs.listStatus(rootPath).foreach { st =>
      val n = st.getPath.getName
      val reclaimable = st.isFile &&
        (n.startsWith("part-") || n.startsWith("_MANIFEST.tmp.") ||
          versionOf(n).isDefined) &&
        !latestName.contains(n) && !live.contains(n) &&
        st.getModificationTime <= cutoff
      if (reclaimable) { fs.delete(st.getPath, false); deleted += 1 }
      else kept += 1 // live, latest manifest, young, or foreign — not ours to reclaim
    }
    (kept, deleted)
  }

  /** Manifest format: line 1 = schema DDL; one
    * `name\trows\tbytes[\tcol:min:max;col:min:max…]` line per
    * committed file (the 4th field is the optional per-file column
    * stats — pre-stats readers split on tab and take the first three,
    * so the format is forward/backward compatible); zero or more
    * `#TAG <tag>` lines; final line `#COMMIT <entryCount>
    * <committerId>`. The footer makes a manifest self-validating: a
    * torn write has no footer (or a count that disagrees) and is
    * treated as never committed. Hand-parsed — no JSON dependency.
    * Returns None for invalid/vanished files. */
  private[graft] def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      mf: Path, version: Long): Option[Manifest] = try {
    parseManifest(fs.open(mf), version)
  } catch {
    case _: java.io.FileNotFoundException => None // vacuumed between list and open
    case _: NumberFormatException | _: ArrayIndexOutOfBoundsException => None
    case ce: org.apache.hadoop.fs.ChecksumException =>
      // Two very different kinds of damage arrive as ChecksumException:
      // a claim torn mid-write (no valid #COMMIT footer — never
      // committed, fall back) versus a COMMITTED manifest whose
      // data/.crc pair was damaged AFTER publish. Treating the latter
      // as nonexistent would make the next publish fold from the
      // previous version — silently dropping the damaged version's
      // files from n+1 onward — so re-read the bytes with checksum
      // verification off and fail stop if the footer is intact.
      val raw = org.apache.hadoop.fs.FileSystem.newInstance(fs.getUri, fs.getConf)
      val committed = try {
        raw.setVerifyChecksum(false)
        try parseManifest(raw.open(mf), version)
        catch { case scala.util.control.NonFatal(_) => None }
      } finally raw.close()
      if (committed.isDefined) throw new java.io.IOException(
        s"manifest $mf is COMMITTED (footer intact) but fails checksum " +
          "verification — refusing to treat post-publish damage as a torn " +
          "claim, which would silently drop its files from the next fold. " +
          "Restore the manifest or remove the stale .crc sidecar.", ce)
      None
  }

  private def parseManifest(stream: java.io.InputStream,
      version: Long): Option[Manifest] = {
    val in = new BufferedReader(new InputStreamReader(stream, StandardCharsets.UTF_8))
    try {
      val ddl = in.readLine()
      if (ddl == null) return None
      val entries = Seq.newBuilder[(String, Long, Long)]
      val stats = Map.newBuilder[String, Seq[(String, String, String)]]
      val tags = Set.newBuilder[String]
      var footer: Option[(Long, String)] = None
      var line = in.readLine()
      while (line != null) {
        if (line.startsWith("#COMMIT ")) {
          val p = line.split(" ", 3)
          footer = for (c <- p(1).toLongOption if p.length == 3) yield (c, p(2))
        } else if (line.startsWith("#TAG ")) {
          tags += line.substring(5)
        } else if (line.nonEmpty) {
          val p = line.split("\t")
          entries += ((p(0), p(1).toLong, p(2).toLong))
          if (p.length > 3 && p(3).nonEmpty)
            stats += p(0) -> p(3).split(";").toSeq.map { t =>
              val c = t.split(":")
              (c(0), c(1), c(2))
            }
        }
        line = in.readLine()
      }
      val es = entries.result()
      footer.collect { case (count, qid) if count == es.length =>
        Manifest(version, ddl, es, tags.result(), qid, stats.result())
      }
    } finally in.close()
  }

  /** Claim `version` the Delta/HDFSLogStore way: write the COMPLETE
    * manifest to an attempt-unique tmp name, then bind it to the
    * version name through the pluggable claim primitive
    * ([[ManifestCommitStore.tryClaim]]) — rename-no-overwrite where
    * rename is atomic (HDFS/POSIX), a conditional PUT on object stores
    * — so the name only ever appears with complete content and exactly
    * one committer per version wins. Reading the footer back and
    * checking the committer id closes any residual check-then-act race
    * a store might leak. True iff this committer owns the published
    * version. */
  private def tryPublishVersion(fs: org.apache.hadoop.fs.FileSystem,
      store: graft.sources.ManifestCommitStore,
      root: Path, version: Long, ddl: String,
      entries: Seq[(String, Long, Long)], tags: Set[String],
      committerId: String, attempt: Int,
      stats: Map[String, Seq[(String, String, String)]]): Boolean = {
    val tmp = new Path(root, s"_MANIFEST.tmp.$committerId.$attempt")
    val out = new OutputStreamWriter(fs.create(tmp, true), StandardCharsets.UTF_8)
    try {
      out.write(ddl + "\n")
      entries.foreach { case (n, r, b) =>
        val st = stats.getOrElse(n, Nil)
        if (st.isEmpty) out.write(s"$n\t$r\t$b\n")
        else out.write(s"$n\t$r\t$b\t" +
          st.map { case (c, lo, hi) => s"$c:$lo:$hi" }.mkString(";") + "\n")
      }
      tags.toSeq.sorted.foreach(t => out.write(s"#TAG $t\n"))
      out.write(s"#COMMIT ${entries.length} $committerId\n")
    } finally out.close()
    val dst = manifestPath(root, version)
    if (!store.tryClaim(fs, tmp, dst)) return false
    readManifest(fs, dst, version).exists(_.committerId == committerId)
  }

  /** Commit protocol shared by batch and streaming publishes: fold the
    * fresh files into the latest manifest (or replace it when
    * `truncate`) and CAS-publish the next version, retrying on
    * contention. A `tag` already present in the chain means this
    * commit is a replay: the fresh files are deleted and nothing is
    * published. Returns the published version, or -1 for a skipped
    * replay. */
  private[graft] def publish(fs: org.apache.hadoop.fs.FileSystem,
      root: Path, ddl: String, fresh: Seq[(String, Long, Long)],
      truncate: Boolean, tag: Option[String], committerId: String,
      freshStats: Map[String, Seq[(String, String, String)]] = Map.empty): Long = {
    // resolve the claim primitive FIRST: an unsafe scheme must refuse
    // before any manifest state is touched, not after a partial fold
    val store = graft.sources.AtomicCommitStores.forFileSystem(fs, fs.getConf)
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val claimed = claimedVersions(fs, root)
      val cur = claimed.iterator
        .flatMap(v => readManifest(fs, manifestPath(root, v), v))
        .nextOption()
      if (tag.exists(t => cur.exists(_.tags.contains(t)))) {
        // replayed batch: the previous execution's commit is visible,
        // so this attempt's files are duplicates — reclaim and skip
        fresh.foreach { case (n, _, _) => fs.delete(new Path(root, n), false) }
        return -1L
      }
      // append folds old files under the NEW manifest's schema line —
      // refuse a drifted writer schema rather than publish a manifest
      // whose DDL misdescribes half its files (overwrite replaces the
      // table, so drift is fine there)
      cur.foreach { m =>
        if (!truncate && m.ddl != ddl) throw new IllegalStateException(
          s"graft-atomic append schema drift: table has [${m.ddl}], " +
            s"writer has [$ddl]; use overwrite to replace")
      }
      val entries = (if (truncate) Nil else cur.map(_.entries).getOrElse(Nil)) ++ fresh
      val stats = (if (truncate) Map.empty[String, Seq[(String, String, String)]]
                   else cur.map(_.stats).getOrElse(Map.empty)) ++ freshStats
      val tags = (if (truncate) Set.empty[String]
                  else cur.map(_.tags).getOrElse(Set.empty)) ++ tag
      // next version clears every CLAIMED name (valid or garbage) so a
      // foreign invalid claim can never livelock the committer; entries
      // still fold from the latest VALID manifest only
      val next = math.max(claimed.headOption.getOrElse(0L),
        cur.map(_.version).getOrElse(0L)) + 1L
      if (tryPublishVersion(fs, store, root, next, ddl, entries, tags,
          committerId, attempt, stats)) return next
      attempt += 1 // lost the CAS — re-read the new latest and re-fold
    }
    throw new java.io.IOException(
      s"graft-atomic commit contention: $MaxCommitRetries consecutive " +
        s"version claims lost at $root; is a runaway writer looping?")
  }
}

class AtomicSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-atomic"
  override def supportsExternalMetadata(): Boolean = true
  /** Read-path schema: the latest committed manifest's DDL (the writer
    * supplies its own schema, so this only runs for reads). */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = AtomicSink2Util.rootOf(options)
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    AtomicSink.latestManifest(fs, rootPath) match {
      case Some(m) => StructType.fromDDL(m.ddl)
      case None => throw new IllegalArgumentException(
        s"graft-atomic: no committed manifest at $root (an aborted first " +
          "write or an empty dir reads as an empty table via " +
          "AtomicSink.readCommitted, but a schema-less scan cannot plan)")
    }
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val root = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-atomic requires a path: df.write.format(\"graft-atomic\").save(root)"))
    val bad = schema.fields.filterNot(f => AtomicSink.supportedType(f.dataType))
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"graft-atomic supports string/long/int/double/float/boolean columns; " +
        s"unsupported: ${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}")
    new AtomicTable(root, schema)
  }
}

private object AtomicSink2Util {
  def rootOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-atomic requires a path"))

  /** Field indexes whose min/max the writer records: the numeric
    * columns (the only types with a total order the skip logic can
    * compare against filter literals exactly), optionally restricted
    * by the writer's `graft.statsColumns` (comma-separated) — a
    * declared stats set keeps per-row tracking off columns nobody
    * filters on. Names containing the stats-encoding separators are
    * excluded rather than escaped. */
  def statsFieldIndexes(schema: StructType,
      statsCols: Option[String]): Array[Int] = {
    val declared = statsCols.map(_.split(",").map(_.trim).toSet)
    schema.fields.zipWithIndex.collect {
      case (f, i)
        if (f.dataType == LongType || f.dataType == IntegerType ||
            f.dataType == DoubleType || f.dataType == FloatType) &&
          !f.name.contains(":") && !f.name.contains(";") &&
          declared.forall(_.contains(f.name)) => i
    }
  }
}

class AtomicTable(root: String, tschema: StructType)
    extends Table with SupportsWrite with SupportsRead {
  override def name(): String = s"graft-atomic($root)"
  override def schema(): StructType = tschema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.BATCH_READ)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AtomicWriteBuilder(root, info.schema(), info.queryId(),
      Option(info.options.get("graft.tag")),
      Option(info.options.get("graft.statsColumns")))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AtomicScanBuilder(root, tschema)
}

class AtomicWriteBuilder(root: String, schema: StructType, queryId: String,
    tag: Option[String], statsCols: Option[String] = None)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val conf = new SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration)
      new AtomicBatchWrite(root, schema, queryId, doTruncate, tag, conf,
        statsCols)
    }
  }
}

/** Per-file commit message: file name + audit counts (the manifest
  * doubles as a C8-style row-accounting record) + the per-column
  * min/max stats the manifest records for reader-side file skipping. */
private case class AtomicFileCommit(name: String, rows: Long, bytes: Long,
    stats: Seq[(String, String, String)] = Nil)
    extends WriterCommitMessage

class AtomicBatchWrite(root: String, schema: StructType, queryId: String,
    truncate: Boolean, tag: Option[String], conf: SerializableConfiguration,
    statsCols: Option[String] = None)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AtomicWriterFactory(root, schema, queryId, conf,
      AtomicSink2Util.statsFieldIndexes(schema, statsCols))

  // default useCommitCoordinator() = true: one winning attempt per task

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf.value)
    fs.mkdirs(rootPath)
    val fresh = messages.toSeq.map { case AtomicFileCommit(n, r, b, _) => (n, r, b) }
    val freshStats = messages.toSeq.collect {
      case AtomicFileCommit(n, _, _, st) if st.nonEmpty => n -> st
    }.toMap
    // DDL is stored as-nullable: a CSV cell can always be empty, and the
    // readback schema (file source) forces nullable anyway — keeping the
    // writer's NOT NULL would make the DSv2 scan's schema disagree with
    // readCommitted's for the same table
    val nullableDdl =
      StructType(schema.fields.map(_.copy(nullable = true))).toDDL
    AtomicSink.publish(fs, rootPath, nullableDdl, fresh, truncate, tag,
      queryId, freshStats)
    // previous-generation files are NOT deleted here: versioned readers
    // may still hold them, and vacuum (retention-guarded) is the single
    // reclamation point
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // failed/uncommitted tasks already deleted their own files via
    // DataWriter.abort; this sweeps files of WINNING attempts whose
    // job still failed. The manifest was never touched.
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf.value)
    messages.collect { case AtomicFileCommit(n, _, _, _) =>
      fs.delete(new Path(rootPath, n), false)
    }
  }
}

class AtomicWriterFactory(root: String, schema: StructType, queryId: String,
    conf: SerializableConfiguration, statsIdx: Array[Int] = Array.empty)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AtomicDataWriter(root, schema, queryId, partitionId, taskId, conf,
      statsIdx)
}

class AtomicDataWriter(root: String, schema: StructType, queryId: String,
    partitionId: Int, taskId: Long, conf: SerializableConfiguration,
    statsIdx: Array[Int] = Array.empty)
    extends DataWriter[InternalRow] {
  // taskId (the TID) is unique PER ATTEMPT, so a retried task never
  // collides with its predecessor's file
  private val name = f"part-$partitionId%05d-$taskId-$queryId.csv"
  private val path = new Path(root, name)
  private val fs = path.getFileSystem(conf.value)
  private lazy val out = {
    fs.mkdirs(path.getParent)
    new OutputStreamWriter(fs.create(path, true), StandardCharsets.UTF_8)
  }
  private var rows = 0L
  // per-stats-column running min/max over NON-NULL values, as the
  // native numeric type (long for int/long, double for float/double —
  // float widens to double exactly). A NaN poisons its column's stats
  // for this file: Spark orders NaN ABOVE every double, so a max that
  // ignored NaN could wrongly skip a file whose only matching rows are
  // NaN under `col > x`.
  private val stLongMin = Array.fill(statsIdx.length)(Long.MaxValue)
  private val stLongMax = Array.fill(statsIdx.length)(Long.MinValue)
  private val stDblMin = Array.fill(statsIdx.length)(Double.PositiveInfinity)
  private val stDblMax = Array.fill(statsIdx.length)(Double.NegativeInfinity)
  private val stSeen = Array.fill(statsIdx.length)(false)
  private val stNaN = Array.fill(statsIdx.length)(false)

  private def trackStats(record: InternalRow): Unit = {
    var j = 0
    while (j < statsIdx.length) {
      val i = statsIdx(j)
      if (!record.isNullAt(i)) {
        schema.fields(i).dataType match {
          case LongType | IntegerType =>
            val v = if (schema.fields(i).dataType == LongType) record.getLong(i)
                    else record.getInt(i).toLong
            if (v < stLongMin(j)) stLongMin(j) = v
            if (v > stLongMax(j)) stLongMax(j) = v
          case _ =>
            val v = if (schema.fields(i).dataType == DoubleType) record.getDouble(i)
                    else record.getFloat(i).toDouble
            if (v.isNaN) stNaN(j) = true
            else {
              if (v < stDblMin(j)) stDblMin(j) = v
              if (v > stDblMax(j)) stDblMax(j) = v
            }
        }
        stSeen(j) = true
      }
      j += 1
    }
  }

  private def statsResult: Seq[(String, String, String)] =
    statsIdx.indices.collect {
      case j if stSeen(j) && !stNaN(j) =>
        val i = statsIdx(j)
        schema.fields(i).dataType match {
          case LongType | IntegerType =>
            (schema.fields(i).name, stLongMin(j).toString, stLongMax(j).toString)
          case _ =>
            // Double.toString round-trips the exact double; the scan
            // parses it back before comparing, so no decimal drift
            (schema.fields(i).name, stDblMin(j).toString, stDblMax(j).toString)
        }
    }.toSeq

  override def write(record: InternalRow): Unit = {
    trackStats(record)
    val cells = schema.fields.iterator.zipWithIndex.map { case (f, i) =>
      if (record.isNullAt(i)) ""
      else AtomicSink.csvCell(f.dataType match {
        case StringType => record.getUTF8String(i).toString
        case LongType => record.getLong(i)
        case IntegerType => record.getInt(i)
        case DoubleType => record.getDouble(i)
        case FloatType => record.getFloat(i)
        case BooleanType => record.getBoolean(i)
        case other => throw new IllegalStateException(s"unsupported $other")
      })
    }
    out.write(cells.mkString(","))
    out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    AtomicFileCommit(name, rows, fs.getFileStatus(path).getLen, statsResult)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Exception => () }
    fs.delete(path, false)
  }

  override def close(): Unit = ()
}

// ----------------------------------------------------------------- read side

/** Column-pruning scan builder: Spark hands the required schema after
  * optimizer pruning; only those fields are CONVERTED by the decoder
  * (every CSV cell is still tokenized — the format is row-major — but
  * string/number materialization happens per required column only).
  *
  * Filter pushdown (r19, A19) is FILE-GRAIN, against the manifest's
  * per-file column stats: the five null-rejecting comparisons on
  * numeric columns are accepted and used to SKIP whole files whose
  * [min,max] cannot satisfy the conjunction — the parquet
  * row-group-stats move at manifest grain, with zero data I/O spent
  * deciding. Every filter is also returned as residual (Spark
  * re-evaluates row-level), so skipping is pure pruning: a file
  * without stats for a column is simply never skipped on it. */
class AtomicScanBuilder(root: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources.Filter
  private var required: StructType = full
  private var usable: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    usable = filters.filter(AtomicStatsSkip.usable(full, _))
    filters // all residual: file skipping never substitutes row filtering
  }
  override def pushedFilters(): Array[Filter] = usable
  override def build(): Scan = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    new AtomicScan(root, full, required, conf, usable)
  }
}

/** Manifest-stats file skipping: interval tests of the pushed
  * comparisons against each file's recorded [min, max]. Comparisons
  * run in exact BigDecimal — stats strings parse back to the exact
  * native value (Long directly; Double/Float via the round-tripping
  * parse), and both sides convert to BigDecimal losslessly, so a
  * half-ulp decimal-rendering drift can never skip a boundary file.
  * All five accepted predicates are null-rejecting, so files whose
  * matching rows could only be NULL are correctly skippable — but the
  * writer never records stats for all-null columns anyway, and
  * no-stats means no skip. */
private[sources] object AtomicStatsSkip {
  import org.apache.spark.sql.sources._

  private def numericField(full: StructType, name: String): Option[DataType] =
    full.fields.find(_.name == name).map(_.dataType).filter {
      case LongType | IntegerType | DoubleType | FloatType => true
      case _ => false
    }

  private def toBig(v: Any): Option[java.math.BigDecimal] = v match {
    case n: java.lang.Long => Some(java.math.BigDecimal.valueOf(n))
    case n: java.lang.Integer => Some(java.math.BigDecimal.valueOf(n.longValue))
    case n: java.lang.Short => Some(java.math.BigDecimal.valueOf(n.longValue))
    case n: java.lang.Byte => Some(java.math.BigDecimal.valueOf(n.longValue))
    case n: java.lang.Double if !n.isNaN && !n.isInfinite =>
      Some(new java.math.BigDecimal(n))
    case n: java.lang.Float if !n.isNaN && !n.isInfinite =>
      Some(new java.math.BigDecimal(n.doubleValue))
    case n: java.math.BigDecimal => Some(n)
    case n: scala.math.BigDecimal => Some(n.bigDecimal)
    case _ => None
  }

  private def attrValue(f: Filter): Option[(String, Any)] = f match {
    case EqualTo(a, v) => Some((a, v))
    case GreaterThan(a, v) => Some((a, v))
    case GreaterThanOrEqual(a, v) => Some((a, v))
    case LessThan(a, v) => Some((a, v))
    case LessThanOrEqual(a, v) => Some((a, v))
    case _ => None
  }

  def usable(full: StructType, f: Filter): Boolean =
    attrValue(f).exists { case (a, v) =>
      v != null && numericField(full, a).isDefined && toBig(v).isDefined
    }

  /** Decode a stored stat string back to the exact committed value. */
  private def statBig(dt: DataType, s: String): java.math.BigDecimal = dt match {
    case LongType | IntegerType => new java.math.BigDecimal(s)
    case _ => new java.math.BigDecimal(java.lang.Double.parseDouble(s))
  }

  /** True iff the file MIGHT contain a matching row (keep). */
  def mightMatch(full: StructType,
      stats: Seq[(String, String, String)], f: Filter): Boolean = {
    val byCol = stats.map(t => t._1 -> (t._2, t._3)).toMap
    attrValue(f) match {
      case Some((a, v)) =>
        (numericField(full, a), byCol.get(a), toBig(v)) match {
          case (Some(dt), Some((loS, hiS)), Some(value)) =>
            val lo = statBig(dt, loS); val hi = statBig(dt, hiS)
            f match {
              case _: EqualTo =>
                lo.compareTo(value) <= 0 && hi.compareTo(value) >= 0
              case _: GreaterThan => hi.compareTo(value) > 0
              case _: GreaterThanOrEqual => hi.compareTo(value) >= 0
              case _: LessThan => lo.compareTo(value) < 0
              case _: LessThanOrEqual => lo.compareTo(value) <= 0
              case _ => true
            }
          case _ => true // no stats for this column: never skip on it
        }
      case None => true
    }
  }
}

private case class AtomicFilePartition(root: String, name: String, rows: Long)
    extends InputPartition

class AtomicScan(root: String, full: StructType, required: StructType,
    conf: SerializableConfiguration,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends Scan with Batch with SupportsReportStatistics {

  /** Resolved ONCE per scan: the snapshot this query reads. Every task
    * opens exactly these files even if newer versions commit mid-query
    * — versioned manifests make the read repeatable. */
  private lazy val manifest: Option[AtomicSink.Manifest] = {
    val rootPath = new Path(root)
    AtomicSink.latestManifest(rootPath.getFileSystem(conf.value), rootPath)
  }

  /** The manifest entries this scan actually opens: files whose
    * recorded column stats cannot satisfy the pushed conjunction are
    * skipped HERE, before any InputPartition exists — at 100 TB the
    * predicate decides file-set membership from manifest metadata
    * alone, no data I/O. */
  private lazy val visibleEntries: Seq[(String, Long, Long)] =
    manifest.map { m =>
      if (filters.isEmpty) m.entries
      else m.entries.filter { case (n, _, _) =>
        val st = m.stats.getOrElse(n, Nil)
        filters.forall(f => AtomicStatsSkip.mightMatch(full, st, f))
      }
    }.getOrElse(Nil)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-atomic root=$root cols=[${required.fieldNames.mkString(",")}]" +
      (if (filters.isEmpty) ""
       else s" statsFilters=[${filters.mkString(",")}]")

  override def planInputPartitions(): Array[InputPartition] =
    visibleEntries.map { case (n, r, _) =>
      AtomicFilePartition(root, n, r): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AtomicReaderFactory(conf, full, required.fieldNames)

  /** Exact stats straight from the manifest — no listing, no sampling
    * — over the SKIP-SURVIVING files, so the optimizer sizes joins on
    * what will actually be read. Bytes are scaled by the
    * required-column fraction so a pruned scan advertises the smaller
    * width (what lets Catalyst broadcast a thin projection of a wide
    * table). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val (rows, bytes) =
      (visibleEntries.map(_._2).sum, visibleEntries.map(_._3).sum)
    private val frac =
      if (full.fields.isEmpty) 1.0
      else required.fields.length.toDouble / full.fields.length
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(1L, (bytes * frac).toLong))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }
}

class AtomicReaderFactory(conf: SerializableConfiguration, full: StructType,
    requiredNames: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AtomicFilePartition]
    new AtomicCsvReader(new Path(p.root, p.name), conf, full, requiredNames)
  }
}

/** Streaming RFC-4180 decoder for the sink's own output: quoted fields
  * (doubled-quote escapes, embedded newlines legal), unquoted empty =
  * null, quoted empty = empty string. Tokenizes every cell (row-major
  * format) but converts only the required columns. */
class AtomicCsvReader(path: Path, conf: SerializableConfiguration,
    full: StructType, requiredNames: Array[String])
    extends PartitionReader[InternalRow] {

  private val in = new BufferedReader(new InputStreamReader(
    path.getFileSystem(conf.value).open(path), StandardCharsets.UTF_8))
  private val nFull = full.fields.length
  // full-schema column index -> output slot (-1 = pruned away)
  private val slotOf: Array[Int] = {
    val want = requiredNames.zipWithIndex.toMap
    full.fieldNames.map(n => want.getOrElse(n, -1))
  }
  private val types: Array[DataType] = full.fields.map(_.dataType)
  private val row = new org.apache.spark.sql.catalyst.expressions
    .GenericInternalRow(requiredNames.length)
  private val cell = new java.lang.StringBuilder(64)

  private def convert(colIdx: Int, quoted: Boolean): AnyRef = {
    if (!quoted && cell.length() == 0) return null // unquoted empty = null
    types(colIdx) match {
      case StringType => UTF8String.fromString(cell.toString)
      case LongType => java.lang.Long.valueOf(cell.toString)
      case IntegerType => java.lang.Integer.valueOf(cell.toString)
      case DoubleType => java.lang.Double.valueOf(cell.toString)
      case FloatType => java.lang.Float.valueOf(cell.toString)
      case BooleanType => java.lang.Boolean.valueOf(cell.toString)
      case other => throw new IllegalStateException(s"unsupported $other")
    }
  }

  override def next(): Boolean = {
    var c = in.read()
    if (c < 0) return false
    var colIdx = 0
    var quoted = false
    cell.setLength(0)
    def endCell(): Unit = {
      if (colIdx < nFull) {
        val slot = slotOf(colIdx)
        if (slot >= 0) row.update(slot, convert(colIdx, quoted))
      }
      colIdx += 1; quoted = false; cell.setLength(0)
    }
    val Quote = '"'.toInt; val Comma = ','.toInt; val Nl = '\n'.toInt
    var done = false
    while (!done) {
      if (quoted) {
        if (c == Quote) {
          val nxt = in.read()
          if (nxt == Quote) { cell.append('"'); c = in.read() } // doubled quote
          else if (nxt == Comma) { endCell(); c = in.read() }
          else { endCell(); done = true } // '\n' or EOF ends the record
        } else if (c == -1) {
          throw new java.io.IOException(s"unterminated quote in $path")
        } else { cell.append(c.toChar); c = in.read() }
      } else {
        if (c == Quote && cell.length() == 0) { quoted = true; c = in.read() }
        else if (c == Comma) { endCell(); c = in.read() }
        else if (c == Nl || c == -1) { endCell(); done = true }
        else { cell.append(c.toChar); c = in.read() }
      }
    }
    if (colIdx != nFull) throw new java.io.IOException(
      s"malformed row in $path: $colIdx cells, schema has $nFull")
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
