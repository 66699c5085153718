package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence tool: write `.explain("formatted")` for
  * named registered queries to files, so before/after plan shapes are
  * committable artifacts (plans/r{N}/<query>_{before,after}.txt).
  *
  *   sbt "runMain graft.ExplainDump /root/testdata/sf0.01 plans/r19 after dedup_minhash q_quantile"
  *
  * AQE is disabled for the dump (the PlanDump discipline) so every
  * exchange the planner needs is statically visible; auto-broadcast
  * keeps its default so join strategies match what the bench runs.
  * Sink/stream gates execute side effects at frame-construction time
  * and are not meaningful here — pass pure-compute queries only. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: ExplainDump <sfDir> <outDir> <suffix> <query> [query ...]\n" +
          "  optional: SPARK_GRAFT_EXPLAIN_CONF=k=v[;k=v...] extra session confs")
      sys.exit(2)
    }
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2) // "before" | "after" | a variant label
    val names = args.drop(3)
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — valid names are SparkEntry.queries keys")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    // variant dumps (e.g. forcing the large arm of a size dispatch)
    sys.env.get("SPARK_GRAFT_EXPLAIN_CONF").foreach(_.split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[explain] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
