package graft.sources

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** `graft-atomic` — a transactional DataSourceV2 WRITE path (A15),
  * the write-side complement of the `graft-catalog` read source (A14).
  * The reference's loader commits by chunked INSERTs with no
  * all-or-nothing boundary (etl_pipeline.py:485-517); this sink gives
  * a plain object store the commit contract a warehouse table has:
  *
  *   - Tasks write attempt-unique files DIRECTLY into the target
  *     directory — `part-<partition>-<taskId>-<queryId>.csv` — with NO
  *     rename at commit. On an object store a "rename" is a full
  *     copy, so rename-based commit protocols (Hadoop FileOutputCommitter
  *     v1/v2) cost O(data) at commit or lose atomicity; here commit
  *     cost is O(1) regardless of data size: the Iceberg/Delta
  *     insight, re-expressed minimally.
  *   - Visibility is MANIFEST-ONLY: a reader ([[AtomicSink.readCommitted]])
  *     lists nothing — it reads `_MANIFEST` (schema DDL + the exact
  *     file names the driver committed) and opens only those files. A
  *     crashed job's orphan files are invisible forever (and physically
  *     reclaimable by a C31-style vacuum that keeps manifest-listed
  *     files).
  *   - Spark's output-commit coordinator admits ONE winning attempt
  *     per task; only winners' [[WriterCommitMessage]]s reach
  *     `commit()`, so a speculative or retried attempt's file never
  *     enters the manifest — exactly-once visibility without
  *     distributed locks.
  *   - `commit()` publishes by writing `_MANIFEST.tmp` and renaming it
  *     over `_MANIFEST` — atomic on a POSIX FS, a single last-writer-
  *     wins PUT on an object store. Append mode folds the previous
  *     manifest's files in; overwrite (via [[SupportsTruncate]])
  *     replaces the manifest, then best-effort deletes the orphaned
  *     previous-generation files AFTER the new manifest is live.
  *   - `abort()` (driver) and `DataWriter.abort()` (task) delete this
  *     query's physical files; even if a crash skips that cleanup, the
  *     manifest never saw them, so readers are unaffected.
  *
  * Rows are RFC-4180 CSV (strings always quoted, internal quotes
  * doubled, null = unquoted empty), readable by Spark's splittable CSV
  * reader; supported column types are string/long/int/double/float/
  * boolean — rejected up front otherwise. Values containing newlines
  * need `multiLine` readback and are out of contract at scale.
  */
object AtomicSink {
  val MANIFEST = "_MANIFEST"

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

  /** Read back ONLY what a committed manifest makes visible. No
    * directory listing: absent manifest = empty table (the defined
    * state after an aborted first write). */
  def readCommitted(s: SparkSession, root: String): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    val mf = new Path(root, MANIFEST)
    val fs = mf.getFileSystem(conf)
    if (!fs.exists(mf)) return s.emptyDataFrame
    val (ddl, files) = readManifest(fs, mf)
    val schema = StructType.fromDDL(ddl)
    if (files.isEmpty) s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else s.read.schema(schema)
      .option("quote", "\"").option("escape", "\"")
      .csv(files.map(f => new Path(root, f._1).toString): _*)
  }

  /** Reclaim physical files the manifest does not list — the orphans a
    * crashed job can leave (invisible to readers, but paid for in
    * storage). Returns (keptFiles, deletedFiles). The C31 vacuum idea
    * applied to this sink's visibility contract: the manifest IS the
    * liveness root, so anything else named `part-*` is garbage. */
  def vacuum(s: SparkSession, root: String): (Long, Long) = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val mf = new Path(rootPath, MANIFEST)
    val live: Set[String] =
      if (fs.exists(mf)) readManifest(fs, mf)._2.map(_._1).toSet else Set.empty
    var kept = 0L
    var deleted = 0L
    fs.listStatus(rootPath).foreach { st =>
      val n = st.getPath.getName
      if (n == MANIFEST || live.contains(n)) kept += 1
      else if (st.isFile && n.startsWith("part-")) {
        fs.delete(st.getPath, false); deleted += 1
      } else kept += 1 // foreign files are not ours to reclaim
    }
    (kept, deleted)
  }

  /** Manifest format: line 1 = schema DDL; then one `name\trows\tbytes`
    * line per committed file. Hand-parsed — no JSON dependency. */
  private[graft] def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      mf: Path): (String, Seq[(String, Long, Long)]) = {
    val in = new BufferedReader(new InputStreamReader(fs.open(mf), StandardCharsets.UTF_8))
    try {
      val ddl = in.readLine()
      val files = Iterator.continually(in.readLine()).takeWhile(_ != null)
        .filter(_.nonEmpty).map { l =>
          val p = l.split("\t"); (p(0), p(1).toLong, p(2).toLong)
        }.toSeq
      (ddl, files)
    } finally in.close()
  }

  private[sources] def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: Path, ddl: String, entries: Seq[(String, Long, Long)]): Unit = {
    val tmp = new Path(root, MANIFEST + ".tmp")
    val out = new OutputStreamWriter(fs.create(tmp, true), StandardCharsets.UTF_8)
    try {
      out.write(ddl + "\n")
      entries.foreach { case (n, r, b) => out.write(s"$n\t$r\t$b\n") }
    } finally out.close()
    val dst = new Path(root, MANIFEST)
    fs.delete(dst, false) // HDFS-style FS: rename won't clobber
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"manifest publish failed: $tmp -> $dst")
  }
}

class AtomicSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-atomic"
  // write-only source: the writer's schema is the table's schema
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-atomic is a write path; read back with AtomicSink.readCommitted")
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

class AtomicTable(root: String, tschema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-atomic($root)"
  override def schema(): StructType = tschema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AtomicWriteBuilder(root, info.schema(), info.queryId())
}

class AtomicWriteBuilder(root: String, schema: StructType, queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val conf = new SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration)
      new AtomicBatchWrite(root, schema, queryId, doTruncate, conf)
    }
  }
}

/** Per-file commit message: file name + audit counts (the manifest
  * doubles as a C8-style row-accounting record). */
private case class AtomicFileCommit(name: String, rows: Long, bytes: Long)
    extends WriterCommitMessage

class AtomicBatchWrite(root: String, schema: StructType, queryId: String,
    truncate: Boolean, conf: SerializableConfiguration) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AtomicWriterFactory(root, schema, queryId, conf)

  // default useCommitCoordinator() = true: one winning attempt per task

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf.value)
    fs.mkdirs(rootPath)
    val fresh = messages.toSeq.map { case AtomicFileCommit(n, r, b) => (n, r, b) }
    val mf = new Path(rootPath, AtomicSink.MANIFEST)
    val old: Seq[(String, Long, Long)] =
      if (fs.exists(mf)) {
        val (oldDdl, entries) = AtomicSink.readManifest(fs, mf)
        // append folds old files under the NEW manifest's schema line —
        // refuse a drifted writer schema rather than publish a manifest
        // whose DDL misdescribes half its files (overwrite replaces the
        // table, so drift is fine there)
        if (!truncate && oldDdl != schema.toDDL)
          throw new IllegalStateException(
            s"graft-atomic append schema drift: table has [$oldDdl], " +
              s"writer has [${schema.toDDL}]; use overwrite to replace")
        entries
      } else Nil
    val entries = (if (truncate) Nil else old) ++ fresh
    AtomicSink.writeManifest(fs, rootPath, schema.toDDL, entries)
    // previous-generation files become garbage only AFTER the new
    // manifest is live; a crash between the two steps leaves orphans
    // that are invisible (manifest-only visibility) and vacuumable
    if (truncate) old.foreach { case (n, _, _) =>
      fs.delete(new Path(rootPath, n), false)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // failed/uncommitted tasks already deleted their own files via
    // DataWriter.abort; this sweeps files of WINNING attempts whose
    // job still failed. The manifest was never touched.
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf.value)
    messages.collect { case AtomicFileCommit(n, _, _) =>
      fs.delete(new Path(rootPath, n), false)
    }
  }
}

class AtomicWriterFactory(root: String, schema: StructType, queryId: String,
    conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AtomicDataWriter(root, schema, queryId, partitionId, taskId, conf)
}

class AtomicDataWriter(root: String, schema: StructType, queryId: String,
    partitionId: Int, taskId: Long, conf: SerializableConfiguration)
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

  override def write(record: InternalRow): Unit = {
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
    AtomicFileCommit(name, rows, fs.getFileStatus(path).getLen)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Exception => () }
    fs.delete(path, false)
  }

  override def close(): Unit = ()
}
