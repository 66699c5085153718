package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeFiltering}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** `graft-catalog` — the object-store catalog (SURVEY §2 A1/A3) as a
  * first-class DataSourceV2 TABLE (A14): `spark.read
  * .format("graft-catalog").load(root)` yields one row per object
  * (path, name, size, mtime_ms, extracted_date) — and, unlike the
  * [[FileCatalog]] DataFrame builder, date predicates PUSH INTO THE
  * LISTING: a `WHERE extracted_date = d` prunes entire date-named
  * subtrees before a single LIST call is issued against them. At
  * 100 TB that is the difference between paging a 100M-object bucket
  * and listing one day's prefix — the DSv2 analog of partition
  * pruning, applied to the catalog itself (the reference pages the
  * whole bucket per day: etl_pipeline.py:290-324).
  *
  * Layout contract: objects live either in date-named first-level
  * directories (`day=YYYY-MM-DD`, `event_date=YYYY-MM-DD` or bare
  * `YYYY-MM-DD` — every file inherits the directory's date, so date
  * predicates are FULLY enforced by pruning) or loose under the root
  * (date = first ISO `yyyy-MM-dd` in the file name, enforced per file
  * inside the reader). Both paths enforce in-source, so pushed date
  * filters never leave a residual FilterExec in the plan. Hidden
  * files (`_SUCCESS`, dotfiles) are skipped, matching Spark's file
  * source convention. Non-date subdirectories are listed unpruned and
  * their files dated from file names.
  *
  * Scale shape: the driver lists ONLY the first level (one paged LIST);
  * each surviving subtree becomes an InputPartition listed on an
  * executor with a recursive remote iterator (S3A pages these), so
  * executor parallelism scales with date dirs, not object count.
  * Observability is native DSv2 metrics: `dirs_pruned` (driver,
  * subtrees skipped by pushdown), `dirs_listed` / `files_emitted`
  * (task) — the pushdown gate asserts pruning from the executed
  * plan's own metrics, not from side-channel counters.
  */
object CatalogSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("mtime_ms", LongType, nullable = false),
    StructField("extracted_date", StringType, nullable = true)))

  private[sources] val dirDateRe =
    "^(?:day=|event_date=)?(\\d{4}-\\d{2}-\\d{2})$".r
  private[sources] val fileDateRe = "(\\d{4}-\\d{2}-\\d{2})".r.unanchored

  private[sources] def dirDate(name: String): Option[String] =
    name match { case dirDateRe(d) => Some(d); case _ => None }
  private[sources] def fileDate(name: String): Option[String] =
    fileDateRe.findFirstMatchIn(name).map(_.group(1))
  private[sources] def hidden(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  /** Conjunction of pushed date predicates. ISO date strings compare
    * lexicographically in chronological order, so bounds are plain
    * string comparisons. Any pushed predicate rejects a null date
    * (SQL comparison semantics). */
  private[sources] case class DateBounds(
      lo: Option[String], loInc: Boolean,
      hi: Option[String], hiInc: Boolean,
      set: Option[Set[String]], rejectNulls: Boolean) {
    def constrained: Boolean =
      lo.nonEmpty || hi.nonEmpty || set.nonEmpty
    def accepts(d: Option[String]): Boolean = d match {
      case None => !constrained && !rejectNulls
      case Some(v) =>
        lo.forall(l => if (loInc) v >= l else v > l) &&
        hi.forall(h => if (hiInc) v <= h else v < h) &&
        set.forall(_.contains(v))
    }
  }
  private[sources] object DateBounds {
    val empty: DateBounds = DateBounds(None, true, None, true, None, false)
    def merge(b: DateBounds, f: Filter): DateBounds = f match {
      case EqualTo("extracted_date", v: String) =>
        val s = b.set.map(_.intersect(Set(v))).getOrElse(Set(v))
        b.copy(set = Some(s))
      case In("extracted_date", vs) =>
        val nv = vs.collect { case s: String => s }.toSet
        b.copy(set = Some(b.set.map(_.intersect(nv)).getOrElse(nv)))
      case GreaterThan("extracted_date", v: String) =>
        if (b.lo.forall(l => v >= l)) b.copy(lo = Some(v), loInc = false) else b
      case GreaterThanOrEqual("extracted_date", v: String) =>
        if (b.lo.forall(l => v > l)) b.copy(lo = Some(v), loInc = true) else b
      case LessThan("extracted_date", v: String) =>
        if (b.hi.forall(h => v <= h)) b.copy(hi = Some(v), hiInc = false) else b
      case LessThanOrEqual("extracted_date", v: String) =>
        if (b.hi.forall(h => v < h)) b.copy(hi = Some(v), hiInc = true) else b
      case IsNotNull("extracted_date") => b.copy(rejectNulls = true)
      case _ => b
    }
    def supported(f: Filter): Boolean = f match {
      case EqualTo("extracted_date", _: String) => true
      case In("extracted_date", vs) => vs.forall(_.isInstanceOf[String])
      case GreaterThan("extracted_date", _: String) => true
      case GreaterThanOrEqual("extracted_date", _: String) => true
      case LessThan("extracted_date", _: String) => true
      case LessThanOrEqual("extracted_date", _: String) => true
      case IsNotNull("extracted_date") => true
      case _ => false
    }
  }
}

/** TableProvider + short-name registration (`graft-catalog` via
  * META-INF/services DataSourceRegister). */
class CatalogSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-catalog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CatalogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val root = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-catalog requires a path: spark.read.format(\"graft-catalog\").load(root)"))
    new CatalogTable(root)
  }
}

class CatalogTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"graft-catalog($root)"
  override def schema(): StructType = CatalogSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // hadoop conf captured on the driver at scan-build time
    val conf = new SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    new CatalogScanBuilder(root, conf)
  }
}

class CatalogScanBuilder(root: String, conf: SerializableConfiguration)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import CatalogSource._
  private var required: StructType = CatalogSource.schema
  private var bounds: DateBounds = DateBounds.empty
  private var accepted: Array[Filter] = Array.empty
  private var hadResidual = false
  private var pushedAgg: Option[CatalogAggSpec] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(DateBounds.supported)
    accepted = ok
    bounds = ok.foldLeft(DateBounds.empty)(DateBounds.merge)
    hadResidual = residual.nonEmpty
    residual // date predicates are fully enforced in-source
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Aggregate pushdown (A17): COUNT/MIN/MAX (+ GROUP BY
    * extracted_date) are answered from the LISTING metadata — one row
    * per (partition, group) leaves the reader instead of one per
    * object. Partial pushdown: Spark's final Aggregate merges the
    * per-partition partials (counts sum, mins min), which is exactly
    * the map-side-combine shape — at 100 TB the per-file catalog rows
    * never exist. Rejected whenever any filter stayed residual (the
    * per-file rows those filters need are gone once aggregated). */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    false // partitions each emit partials; Spark merges

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (hadResidual) return false
    CatalogAggSpec.translate(agg) match {
      case Some(spec) => pushedAgg = Some(spec); true
      case None => false
    }
  }

  override def build(): Scan = pushedAgg match {
    case Some(spec) => new CatalogAggScan(root, conf, spec, bounds)
    case None => new CatalogScan(root, conf, required, bounds)
  }
}

/** A pushed catalog aggregation: optional GROUP BY extracted_date plus
  * count/min/max functions over the listing's long columns. */
private[sources] case class CatalogAggSpec(groupByDate: Boolean,
    funcs: Seq[(String, String)]) { // (kind, column) — column "" for count(*)
  import CatalogSource.schema
  /** Scan output contract: group columns first, then one column per
    * aggregate in the Aggregation's order (count partials are longs,
    * min/max keep the column type — all longs here). */
  def readSchema: StructType = {
    val g = if (groupByDate)
      Seq(StructField("extracted_date", StringType, nullable = true)) else Nil
    StructType(g ++ funcs.zipWithIndex.map { case ((kind, c), i) =>
      StructField(s"agg_$i($kind:$c)", LongType,
        nullable = kind != "count" && kind != "countstar")
    })
  }
  override def toString: String = {
    val fs = funcs.map { case (k, c) => if (c.isEmpty) s"$k(*)" else s"$k($c)" }
    s"[${fs.mkString(", ")}]${if (groupByDate) " GROUP BY extracted_date" else ""}"
  }
}

private[sources] object CatalogAggSpec {
  import org.apache.spark.sql.connector.expressions.aggregate._
  import org.apache.spark.sql.connector.expressions.{FieldReference, NamedReference}

  private def colName(e: org.apache.spark.sql.connector.expressions.Expression):
      Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames()(0))
    case _ => None
  }

  def translate(agg: Aggregation): Option[CatalogAggSpec] = {
    val groupByDate = agg.groupByExpressions() match {
      case Array() => false
      case Array(g) if colName(g).contains("extracted_date") => true
      case _ => return None
    }
    val numeric = Set("size", "mtime_ms")
    val funcs = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => ("countstar", "")
      case c: Count if !c.isDistinct =>
        colName(c.column) match {
          case Some(n) => ("count", n)
          case None => return None
        }
      case m: Min => colName(m.column) match {
        case Some(n) if numeric(n) => ("min", n)
        case _ => return None
      }
      case m: Max => colName(m.column) match {
        case Some(n) if numeric(n) => ("max", n)
        case _ => return None
      }
      case _ => return None
    }
    Some(CatalogAggSpec(groupByDate, funcs))
  }
}

/** The aggregate-pushdown scan: same partitioning and pruning as
  * [[CatalogScan]], but each reader FOLDS its listing into one partial
  * row per group instead of emitting per-file rows. */
class CatalogAggScan(root: String, conf: SerializableConfiguration,
    spec: CatalogAggSpec, bounds: CatalogSource.DateBounds)
    extends Scan with Batch {
  import CatalogSource._
  private var prunedDirs = 0L

  override def readSchema(): StructType = spec.readSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-catalog root=$root pushed=$bounds PushedAggregation: $spec"

  override def planInputPartitions(): Array[InputPartition] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf.value)
    val top =
      if (fs.exists(rootPath)) fs.listStatus(rootPath)
      else Array.empty[org.apache.hadoop.fs.FileStatus]
    val (dirs, files) = top.partition(_.isDirectory)
    var pruned = 0L
    val dirParts = dirs.toSeq.flatMap { d =>
      val dd = dirDate(d.getPath.getName)
      dd match {
        case Some(date) if !bounds.accepts(Some(date)) =>
          pruned += 1; None
        case _ =>
          Some(CatalogPartition(d.getPath.toString, dd, looseFilesOnly = false))
      }
    }
    prunedDirs = pruned
    val looseParts =
      if (files.exists(f => !hidden(f.getPath.getName)))
        Seq(CatalogPartition(root, None, looseFilesOnly = true))
      else Nil
    (dirParts ++ looseParts).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CatalogAggReaderFactory(conf, spec, bounds)

  override def supportedCustomMetrics(): Array[CustomMetric] = Array(
    new DirsPrunedMetric, new DirsListedMetric, new FilesEmittedMetric)

  override def reportDriverMetrics(): Array[CustomTaskMetric] =
    Array(GraftTaskMetric("dirs_pruned", prunedDirs))
}

class CatalogAggReaderFactory(conf: SerializableConfiguration,
    spec: CatalogAggSpec, bounds: CatalogSource.DateBounds)
    extends PartitionReaderFactory {
  import CatalogSource._

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CatalogPartition]
    new PartitionReader[InternalRow] {
      private val dirPath = new Path(p.dir)
      private val fs = dirPath.getFileSystem(conf.value)
      private var emitted = 0L
      // group key (date, possibly null) -> one accumulator per func:
      // (count, min, max) folded as the listing streams by
      private val acc = scala.collection.mutable.LinkedHashMap
        .empty[Option[String], Array[Long]]
      private def fold(): Unit = {
        val files: Iterator[org.apache.hadoop.fs.FileStatus] =
          if (p.looseFilesOnly)
            fs.listStatus(dirPath).iterator.filter(f =>
              f.isFile && !hidden(f.getPath.getName))
          else {
            val it = fs.listFiles(dirPath, true)
            val dirRaw = dirPath.toUri.getPath
            def underHiddenDir(file: Path): Boolean = {
              var q = file.getParent
              while (q != null && q.toUri.getPath != dirRaw) {
                if (hidden(q.getName)) return true
                q = q.getParent
              }
              false
            }
            new Iterator[org.apache.hadoop.fs.FileStatus] {
              def hasNext: Boolean = it.hasNext
              def next(): org.apache.hadoop.fs.FileStatus = it.next()
            }.filter(f =>
              !hidden(f.getPath.getName) && !underHiddenDir(f.getPath))
          }
        files.foreach { f =>
          val date = p.dirDate.orElse(fileDate(f.getPath.getName))
          if (p.dirDate.isDefined || bounds.accepts(date)) {
            val key = if (spec.groupByDate) date else None
            val a = acc.getOrElseUpdate(key,
              spec.funcs.map { case (kind, _) => kind match {
                case "min" => Long.MaxValue
                case "max" => Long.MinValue
                case _ => 0L
              }}.toArray)
            spec.funcs.zipWithIndex.foreach { case ((kind, c), i) =>
              def v: Long = c match {
                case "size" => f.getLen
                case "mtime_ms" => f.getModificationTime
                case _ => 0L
              }
              kind match {
                case "countstar" => a(i) += 1
                case "count" =>
                  // only extracted_date is nullable; others always count
                  if (c != "extracted_date" || date.isDefined) a(i) += 1
                case "min" => if (v < a(i)) a(i) = v
                case "max" => if (v > a(i)) a(i) = v
              }
            }
          }
        }
      }
      private var it: Iterator[(Option[String], Array[Long])] = _
      private var current: InternalRow = _

      override def next(): Boolean = {
        if (it == null) { fold(); it = acc.iterator }
        if (!it.hasNext) return false
        val (key, a) = it.next()
        val g: Seq[Any] =
          if (spec.groupByDate) Seq(key.map(UTF8String.fromString).orNull)
          else Nil
        val vals: Seq[Any] = spec.funcs.zipWithIndex.map { case ((kind, _), i) =>
          kind match {
            // an empty group can't occur (groups exist only via files),
            // but a min/max over zero rows must read as null
            case "min" if a(i) == Long.MaxValue => null
            case "max" if a(i) == Long.MinValue => null
            case _ => a(i)
          }
        }
        current = InternalRow.fromSeq(g ++ vals)
        emitted += 1
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
      override def currentMetricsValues(): Array[CustomTaskMetric] = Array(
        GraftTaskMetric("dirs_listed", 1L),
        GraftTaskMetric("files_emitted", emitted))
    }
  }
}

private case class CatalogPartition(dir: String, dirDate: Option[String],
    looseFilesOnly: Boolean) extends InputPartition

private case class GraftTaskMetric(name: String, value: Long)
    extends CustomTaskMetric

/* CustomMetric classes must be TOP-LEVEL with zero-arg constructors:
 * Spark re-instantiates them reflectively when aggregating metric
 * values for the UI/event log. */
class DirsPrunedMetric extends CustomSumMetric {
  override def name(): String = "dirs_pruned"
  override def description(): String =
    "date subtrees skipped by pushdown before any LIST"
}
class DirsListedMetric extends CustomSumMetric {
  override def name(): String = "dirs_listed"
  override def description(): String = "subtrees listed by readers"
}
class FilesEmittedMetric extends CustomSumMetric {
  override def name(): String = "files_emitted"
  override def description(): String = "catalog rows emitted"
}

class CatalogScan(root: String, conf: SerializableConfiguration,
    required: StructType, bounds: CatalogSource.DateBounds)
    extends Scan with Batch with SupportsRuntimeFiltering {
  import CatalogSource._
  private var prunedDirs = 0L
  /* Static pushed bounds, possibly narrowed at RUNTIME by dynamic
   * partition pruning (A16): when the catalog joins a filtered dim on
   * extracted_date, Spark evaluates the dim side first and hands this
   * scan the surviving key set via filter() — listing-level DPP. The
   * narrowed bounds only PRUNE date-dir partitions (the join re-applies
   * the condition, so best-effort pruning is always safe); per-file
   * enforcement inside readers stays at the statically-pushed bounds. */
  @volatile private var effectiveBounds: DateBounds = bounds

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-catalog root=$root pushed=$bounds"

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("extracted_date"))

  override def filter(filters: Array[Filter]): Unit = {
    val supported = filters.filter(DateBounds.supported)
    // narrow from the STATIC bounds on every call, not from the last
    // call's result: a re-executed (cached) physical plan hands this
    // scan a fresh runtime key set, and folding into the previous
    // execution's intersection would over-prune if the dim side's data
    // changed between actions
    effectiveBounds = supported.foldLeft(bounds)(DateBounds.merge)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf.value)
    val top =
      if (fs.exists(rootPath)) fs.listStatus(rootPath)
      else Array.empty[org.apache.hadoop.fs.FileStatus]
    val (dirs, files) = top.partition(_.isDirectory)
    var pruned = 0L
    val dirParts = dirs.toSeq.flatMap { d =>
      val dd = dirDate(d.getPath.getName)
      dd match {
        case Some(date) if !effectiveBounds.accepts(Some(date)) =>
          pruned += 1; None // whole subtree skipped — never listed
        case _ =>
          Some(CatalogPartition(d.getPath.toString, dd, looseFilesOnly = false))
      }
    }
    prunedDirs = pruned
    val looseParts =
      if (files.exists(f => !hidden(f.getPath.getName)))
        Seq(CatalogPartition(root, None, looseFilesOnly = true))
      else Nil
    (dirParts ++ looseParts).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CatalogReaderFactory(conf, required, bounds)

  override def supportedCustomMetrics(): Array[CustomMetric] = Array(
    new DirsPrunedMetric, new DirsListedMetric, new FilesEmittedMetric)

  override def reportDriverMetrics(): Array[CustomTaskMetric] =
    Array(GraftTaskMetric("dirs_pruned", prunedDirs))
}

class CatalogReaderFactory(conf: SerializableConfiguration,
    required: StructType, bounds: CatalogSource.DateBounds)
    extends PartitionReaderFactory {
  import CatalogSource._

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CatalogPartition]
    new PartitionReader[InternalRow] {
      private val dirPath = new Path(p.dir)
      private val fs = dirPath.getFileSystem(conf.value)
      private var emitted = 0L
      private val files: Iterator[org.apache.hadoop.fs.FileStatus] =
        if (p.looseFilesOnly)
          fs.listStatus(dirPath).iterator.filter(f =>
            f.isFile && !hidden(f.getPath.getName))
        else {
          val it = fs.listFiles(dirPath, true)
          // Spark's file sources skip hidden entries at EVERY path
          // level: a normally-named file under `.staging/` or
          // `_temporary/` must not surface either. The recursive LIST
          // yields leaf files directly, so check every directory
          // component between the file and the partition root.
          val dirRaw = dirPath.toUri.getPath
          def underHiddenDir(file: Path): Boolean = {
            var q = file.getParent
            while (q != null && q.toUri.getPath != dirRaw) {
              if (hidden(q.getName)) return true
              q = q.getParent
            }
            false
          }
          new Iterator[org.apache.hadoop.fs.FileStatus] {
            def hasNext: Boolean = it.hasNext
            def next(): org.apache.hadoop.fs.FileStatus = it.next()
          }.filter(f =>
            !hidden(f.getPath.getName) && !underHiddenDir(f.getPath))
        }
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (files.hasNext) {
          val f = files.next()
          val date = p.dirDate.orElse(fileDate(f.getPath.getName))
          // a date-dir partition was already accepted whole; loose and
          // non-date-dir files enforce the pushed predicate per file
          if (p.dirDate.isDefined || bounds.accepts(date)) {
            current = InternalRow.fromSeq(required.fields.toSeq.map(_.name match {
              case "path" => UTF8String.fromString(f.getPath.toString)
              case "name" => UTF8String.fromString(f.getPath.getName)
              case "size" => f.getLen
              case "mtime_ms" => f.getModificationTime
              case "extracted_date" =>
                date.map(UTF8String.fromString).orNull
            }))
            emitted += 1
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
      override def currentMetricsValues(): Array[CustomTaskMetric] = Array(
        GraftTaskMetric("dirs_listed", 1L),
        GraftTaskMetric("files_emitted", emitted))
    }
  }
}
