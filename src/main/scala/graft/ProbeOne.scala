package graft
import org.apache.spark.sql.SparkSession
/** Profiling aid: time ONE registered query N times in a fresh JVM —
  * isolates a query's intrinsic cold/steady cost from whole-bench JVM
  * state (codegen-cache pressure, GC churn from neighbors). This is
  * how the r6 "dedup_clusters regressed 2×" phantom was root-caused
  * to generated-class cache eviction, not the query.
  *
  *   sbt "runMain graft.ProbeOne dedup_clusters /root/testdata/sf0.1 3"
  */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val (name, sfDir, reps) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"PROBE $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
