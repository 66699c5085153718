package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

/** Per-query physical-plan fingerprints, persisted per round so a plan
  * change is diffable the round it happens instead of surfacing as
  * bench archaeology two rounds later (the r11 GlobalRank lesson).
  *
  * For every headline query (stream/sink gates excluded — building
  * their DataFrame executes the gate), the PREPARED physical plan is
  * reduced to a sorted operator-class multiset. The fingerprint is
  * deliberately coarse: stable across attribute-id churn and literal
  * changes, sensitive to exactly the things a plan regression is made
  * of — a new exchange, a lost whole-stage span, a join strategy flip,
  * an extra sort. Plans are captured with AQE off and auto-broadcast
  * at -1 (the PlanAuditSweepSpec discipline), so every exchange the
  * planner would need is statically visible and size-threshold noise
  * at test SF cannot flap the diff.
  *
  *   sbt "runMain graft.PlanDump /root/testdata/sf0.01 PLANS.json"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outPath = if (args.length > 1) args(1) else "PLANS.json"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val skip = (n: String) => n.startsWith("stream_") || Bench.sinkGateNames(n)
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skip(n) }
      .map { case (name, fn) =>
        val fp =
          try {
            val plan = fn(spark, sfDir)
              .asInstanceOf[ClassicDataset[_]].queryExecution.executedPlan
            val counts = scala.collection.mutable.Map[String, Int]()
            plan.foreach(p =>
              counts.update(p.getClass.getSimpleName,
                counts.getOrElse(p.getClass.getSimpleName, 0) + 1))
            counts.toSeq.sorted
              .map { case (op, c) => s"\"$op\":$c" }
              .mkString("{", ",", "}")
          } catch {
            case e: Throwable =>
              "{\"__plan_error\":\"" +
                e.toString.replaceAll("[\"\\\\\n\r\t]", " ").take(160) + "\"}"
          }
        s"  \"$name\": $fp"
      }
    val json = rows.mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"PLANDUMP wrote ${rows.length} fingerprints to $outPath")
    spark.stop()
  }
}
