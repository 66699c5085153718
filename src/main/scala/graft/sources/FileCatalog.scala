package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Object-store catalog (SURVEY.md §2 A1/A3/C5).
  *
  * Re-expresses the reference's bucket scan
  * (reference: etl_pipeline.py:290-324): list every object, extract a
  * date from each filename, filter to the processing day.
  *
  * Scale design: the reference pages the whole bucket through the
  * driver. Here only the first directory level is listed on the
  * driver; each subtree is then listed *on executors* (Hadoop
  * FileSystem is S3A-compatible), so a 100M-object bucket becomes a
  * distributed DataFrame instead of a driver OOM. Filename-date
  * extraction is a codegen'd projection (see [[DateExtract]]).
  */
object FileCatalog {

  /** Recursive listing as a DataFrame of (path, name, size, mtime). */
  def listFiles(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf.value)
    val top = fs.listStatus(rootPath)
    val (dirs, files) = top.partition(_.isDirectory)
    val topRows = files.toSeq.map(f =>
      (f.getPath.toString, f.getPath.getName, f.getLen, f.getModificationTime))
    // One task per top-level subtree; each lists its own subtree with
    // a recursive remote iterator (S3A translates this to paged LIST).
    val subRows =
      if (dirs.isEmpty) spark.emptyDataset[(String, String, Long, Long)]
      else spark.sparkContext
        .parallelize(dirs.map(_.getPath.toString).toSeq, math.max(1, dirs.length))
        .flatMap { d =>
          val p = new Path(d)
          val dfs = p.getFileSystem(conf.value)
          val it = dfs.listFiles(p, true)
          val buf = scala.collection.mutable.ArrayBuffer
            .empty[(String, String, Long, Long)]
          while (it.hasNext) {
            val f = it.next()
            buf += ((f.getPath.toString, f.getPath.getName, f.getLen, f.getModificationTime))
          }
          buf
        }.toDS()
    topRows.toDF("path", "name", "size", "mtime_ms")
      .unionByName(subRows.toDF("path", "name", "size", "mtime_ms"))
  }

  /** Listing + extracted_date column — the queryable catalog. */
  def catalog(spark: SparkSession, root: String): DataFrame =
    listFiles(spark, root)
      .withColumn("extracted_date", DateExtract.extractDate(col("name")))

  /** Files whose filename-date equals the processing day
    * (reference: etl_pipeline.py:314-324). */
  def filesForDate(spark: SparkSession, root: String, date: String): DataFrame =
    catalog(spark, root).filter(col("extracted_date") === date)

  /** Driver-side (path, name) list for one day, name-sorted, CAPPED.
    *
    * Spark's file-based sources materialize the scan's file list on
    * the driver no matter how it is produced, so "fully distributed"
    * is not on the table for the read itself — what this helper does
    * is make that driver bound explicit and fail-fast: the collect is
    * `limit(maxFiles+1)`, never unbounded, and a day with more objects
    * than `maxFiles` raises a clear error (partition the drop by date
    * subdirectories and read the directory instead) rather than
    * silently pinning driver memory. */
  def pathsForDate(spark: SparkSession, root: String, date: String,
                   maxFiles: Int = 100000): Seq[(String, String)] = {
    // strict upper bound so maxFiles + 1 can't overflow to a negative
    // limit and silently drop the cap
    require(maxFiles > 0 && maxFiles < Int.MaxValue,
      s"maxFiles must be in [1, ${Int.MaxValue - 1}], got $maxFiles")
    val rows = filesForDate(spark, root, date)
      .select("path", "name").limit(maxFiles + 1).collect()
    require(rows.length <= maxFiles,
      s"more than maxFiles=$maxFiles objects for date=$date under $root; " +
        "raise maxFiles, or partition the drop into per-date subdirectories " +
        "and read the day's directory as a single source")
    rows.map(r => (r.getString(0), r.getString(1))).sortBy(_._2).toSeq
  }

  /** The reference's `--analyze-dates` histogram
    * (etl_pipeline.py:599-658): file count + size + modification-time
    * range per extracted date. */
  def dateHistogram(spark: SparkSession, root: String): DataFrame =
    catalog(spark, root)
      .groupBy(col("extracted_date"))
      .agg(count(lit(1)).as("n_files"), sum(col("size")).as("total_bytes"),
        min(col("mtime_ms")).as("min_mtime_ms"),
        max(col("mtime_ms")).as("max_mtime_ms"))

  /** Whole-bucket summary (the reference's analyze header): object
    * count, bytes, distinct dates, date + modification-time ranges. */
  def bucketSummary(spark: SparkSession, root: String): DataFrame =
    catalog(spark, root).agg(
      count(lit(1)).as("n_files"),
      sum(col("size")).as("total_bytes"),
      countDistinct(col("extracted_date")).as("n_dates"),
      min(col("extracted_date")).as("min_date"),
      max(col("extracted_date")).as("max_date"),
      min(col("mtime_ms")).as("min_mtime_ms"),
      max(col("mtime_ms")).as("max_mtime_ms"))
}
