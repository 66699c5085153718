package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.FileCatalog

class FileCatalogSpec extends SparkSpec {

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft_catalog").toString
    Files.createDirectories(Paths.get(dir, "sub"))
    Files.write(Paths.get(dir, "events_2024-01-15.csv"), "a,b\n1,2\n".getBytes)
    Files.write(Paths.get(dir, "sub", "events_2024-01-16.csv.gz"), Array[Byte](1, 2, 3))
    Files.write(Paths.get(dir, "sub", "nodate.txt"), "x".getBytes)
    dir
  }

  test("quarantine ingest keeps good rows and captures bad ones") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_quarantine").toString
    Files.write(Paths.get(dir, "drop.csv"),
      "id,v\n1,10\n2,abc\n3,30\n".getBytes)
    val schema = new StructType().add("id", LongType).add("v", IntegerType)
    val (good, bad) = graft.sources.Readers.csvWithQuarantine(
      spark, Seq(s"$dir/drop.csv"), schema)
    assert(good.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val quarantined = bad.collect().map(_.getString(0))
    assert(quarantined.length == 1 && quarantined.head.contains("abc"))
  }

  test("listing is recursive and carries size + mtime") {
    val rows = FileCatalog.listFiles(spark, root).collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getAs[Long]("size") > 0 && r.getAs[Long]("mtime_ms") > 0))
  }

  test("catalog extracts dates; date filter selects the right files") {
    val names = FileCatalog.filesForDate(spark, root, "2024-01-16")
      .select("name").collect().map(_.getString(0)).toSeq
    assert(names == Seq("events_2024-01-16.csv.gz"))
  }

  test("bucket summary reports counts, date range, and mtime range") {
    val r = FileCatalog.bucketSummary(spark, root).head()
    assert(r.getAs[Long]("n_files") == 3)
    assert(r.getAs[Long]("n_dates") == 2)
    assert(r.getAs[String]("min_date") == "2024-01-15")
    assert(r.getAs[String]("max_date") == "2024-01-16")
    assert(r.getAs[Long]("min_mtime_ms") <= r.getAs[Long]("max_mtime_ms"))
  }

  test("pathsForDate is name-sorted and fails fast past the cap") {
    val got = FileCatalog.pathsForDate(spark, root, "2024-01-16")
    assert(got.map(_._2) == Seq("events_2024-01-16.csv.gz"))
    // a day with more objects than maxFiles must raise, not OOM the driver
    val dir = Files.createTempDirectory("graft_cap").toString
    (1 to 5).foreach(i =>
      Files.write(Paths.get(dir, s"events_2024-01-16_$i.csv"), "a\n1\n".getBytes))
    val e = intercept[IllegalArgumentException](
      FileCatalog.pathsForDate(spark, dir, "2024-01-16", maxFiles = 3))
    assert(e.getMessage.contains("maxFiles=3"))
  }

  test("date histogram carries per-date file counts and mtime ranges") {
    val m = FileCatalog.dateHistogram(spark, root)
      .filter(col("extracted_date").isNotNull)
      .collect().map(r => r.getAs[String]("extracted_date") -> r.getAs[Long]("n_files")).toMap
    assert(m == Map("2024-01-15" -> 1L, "2024-01-16" -> 1L))
  }
}
