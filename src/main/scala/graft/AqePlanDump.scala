package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec}

/** AQE-ON final-plan evidence (the complement of [[PlanDump]], which
  * audits AQE-OFF by design so exchanges are statically visible).
  * Executes the expensive-query cohort with adaptive execution enabled
  * — the 100 TB configuration — and records, per query, the FINAL
  * adaptive plan's node-class counts plus the AQE actions that fired:
  * coalesced shuffle reads, skew splits, and any join-strategy classes
  * in the final plan. The committed artifact (AQE_PLANS_r{N}.json)
  * documents that runtime re-planning leaves every plan inside the
  * audited shape envelope: no all-pairs flips, codegen retained,
  * coalescing active where partitions run small. */
object AqePlanDump {

  /** The queries worth re-plan evidence: the most expensive headline
    * queries by bench floor (sink/stream gates excluded — building
    * their frames runs side effects) plus the skew/shuffle cohort the
    * audit exists for. Shared with AqePlanAuditSpec. */
  val Cohort: Seq[String] = Seq(
    "dedup_embedding", "canonical_docs", "dedup_clusters", "dedup_minhash",
    "similarity_prefix_join", "doc_pagerank", "record_linkage",
    "token_budget", "source_interleave", "tfidf_top", "q_mad",
    "q_weighted_median", "q_weighted_quantiles", "paragraph_dedup",
    "cdc_chunk_dedup", "dedup_bow", "kn_bigram_lm", "bpe_pair_counts",
    "date_extract_custom", "record_linkage", "dup_ngram_ratio",
    "q_range_join_binned", "cross_source_dup",
    "q_big_join", "q_salted_join", "q_star_join", "q_topk_per_key")
    .distinct

  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other =>
        other.children ++ other.subqueries ++ (other match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case _ => Nil
        })
    }
    inner.foreach(walk(_)(f))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outPath = if (args.length > 1) args(1) else "AQE_PLANS.json"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32") // room for AQE to coalesce
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    val rows = Cohort.filter(qs.contains).map { name =>
      val cell =
        try {
          val df = qs(name)(spark, sfDir)
          // run THIS queryExecution's physical plan so the
          // AdaptiveSparkPlanExec being inspected is the one that
          // finalized (df.count() would build a NEW execution and
          // leave this one un-materialized)
          val plan = df.asInstanceOf[ClassicDataset[_]].queryExecution.executedPlan
          plan.execute().count()
          val counts = scala.collection.mutable.Map[String, Int]()
          var coalescedReads = 0
          var skewSplits = 0
          var codegenSpans = 0
          walk(plan) { p =>
            counts.update(p.getClass.getSimpleName,
              counts.getOrElse(p.getClass.getSimpleName, 0) + 1)
            p match {
              case r: AQEShuffleReadExec =>
                if (r.partitionSpecs.exists(_.isInstanceOf[
                  org.apache.spark.sql.execution.CoalescedPartitionSpec]))
                  coalescedReads += 1
                if (r.partitionSpecs.exists(_.isInstanceOf[
                  org.apache.spark.sql.execution.PartialReducerPartitionSpec]))
                  skewSplits += 1
              case _: org.apache.spark.sql.execution.WholeStageCodegenExec =>
                codegenSpans += 1
              case _ =>
            }
          }
          val nodeJson = counts.toSeq.sorted
            .map { case (op, c) => s"\"$op\":$c" }.mkString("{", ",", "}")
          s"""{"nodes":$nodeJson,"coalesced_reads":$coalescedReads,""" +
            s""""skew_splits":$skewSplits,"codegen_spans":$codegenSpans}"""
        } catch {
          case e: Throwable =>
            "{\"__error\":\"" +
              e.toString.replaceAll("[\"\\\\\n\r\t]", " ").take(160) + "\"}"
        }
      s"  \"$name\": $cell"
    }
    val json = rows.mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"AQEPLANDUMP wrote ${rows.length} final adaptive plans to $outPath")
    spark.stop()
  }
}
