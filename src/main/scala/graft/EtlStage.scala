package graft

import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-fixture staging: materialize the `events` table as the kind of
  * date-named CSV drop the reference consumes from S3
  * (`events_2024-01-15.csv`, alternate days gzipped like the
  * reference's `.csv.gz` support, reference: etl_pipeline.py:368-374).
  *
  * This is scaffolding that stands in for the external bucket — the
  * engine under test is [[EtlPipeline]]/[[graft.sources.FileCatalog]],
  * not this writer. Staging is idempotent per (sfDir).
  */
object EtlStage {

  def dropDir(sfDir: String): String = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    s"/tmp/graft_stage/$safe/drop"
  }

  /** Stage once; returns the drop directory. */
  def stageEventsCsv(spark: SparkSession, sfDir: String): String = {
    val drop = dropDir(sfDir)
    val marker = Paths.get(drop).getParent.resolve("_STAGED")
    if (Files.exists(marker)) return drop

    val tmpOut = s"${drop}_parts"
    Tables.events(spark, sfDir)
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("ts_us", unix_micros(col("ts")))
      .drop("ts")
      .repartition(col("event_date")) // all rows of a date in one task → one file per date dir
      .write.mode("overwrite")
      .options(graft.sources.Readers.csvOptions)
      .partitionBy("event_date")
      .csv(tmpOut)

    Files.createDirectories(Paths.get(drop))
    val partDirs = Files.list(Paths.get(tmpOut)).iterator()
    while (partDirs.hasNext) {
      val d = partDirs.next()
      val dn = d.getFileName.toString
      if (dn.startsWith("event_date=")) {
        val date = dn.stripPrefix("event_date=")
        val part = Files.list(d).iterator()
        var src: Path = null
        while (part.hasNext) {
          val f = part.next()
          if (f.getFileName.toString.startsWith("part-") &&
            f.getFileName.toString.endsWith(".csv")) src = f
        }
        require(src != null, s"no part file for $date")
        val dayOfMonth = date.takeRight(2).toInt
        if (dayOfMonth % 2 == 0) gzipTo(src, Paths.get(drop, s"events_$date.csv.gz"))
        else Files.move(src, Paths.get(drop, s"events_$date.csv"),
          StandardCopyOption.REPLACE_EXISTING)
      }
    }
    deleteRecursively(Paths.get(tmpOut))
    Files.createFile(marker)
    drop
  }

  /** Stage the events table as a DATE-PARTITIONED drop
    * (`day=YYYY-MM-DD/part-*.csv`) — the layout whose first-level
    * date directories the `graft-catalog` DataSourceV2 source (A14)
    * prunes at LIST time. One file per day (repartition by day).
    * Idempotent per sfDir, like [[stageEventsCsv]]. */
  def stageEventsCsvByDay(spark: SparkSession, sfDir: String): String = {
    val drop = dropDir(sfDir) + "_byday"
    val marker = Paths.get(drop).getParent.resolve("_STAGED_BYDAY")
    if (Files.exists(marker)) return drop
    Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("ts_us", unix_micros(col("ts")))
      .drop("ts")
      .repartition(col("day"))
      .write.mode("overwrite")
      .options(graft.sources.Readers.csvOptions)
      .partitionBy("day")
      .csv(drop)
    Files.createFile(marker)
    drop
  }

  private def gzipTo(src: Path, dst: Path): Unit = {
    val in = new BufferedInputStream(new FileInputStream(src.toFile))
    val out = new GZIPOutputStream(new BufferedOutputStream(new FileOutputStream(dst.toFile)))
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally { in.close(); out.close() }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val it = Files.list(p).iterator()
      while (it.hasNext) deleteRecursively(it.next())
    }
    Files.deleteIfExists(p)
  }
}
