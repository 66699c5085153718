package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.Tables

/** Mergeable-sketch operators (SURVEY §2 E42-E43): the pre-aggregated
  * summary-table pattern that makes interactive analytics possible at
  * 100 TB — build tiny mergeable sketches per shard ONCE, then answer
  * distinct-count / frequency questions by merging sketches instead of
  * re-scanning data. Both operators pin their formal accuracy
  * guarantee as an exact-oracle boolean, the same discipline as the
  * HLL/GK/freqItems gates (SURVEY §5).
  */
object Sketches {

  // --------------------------------------------------------------- E42
  /** Mergeable HLL sketch rollup: per-(lang, source) Datasketches HLL
    * sketches of the doc id domain (the shard-level summary table a
    * 100 TB corpus would persist next to each ingest batch), then a
    * second-level `hll_union_agg` merge up to per-lang distinct-doc
    * estimates — NO rescan of the base data at query time, which is
    * the entire point of the pattern: the merge input is
    * #shards × ~2^lgK bytes regardless of corpus size.
    *
    * Correctness gate (driver-checkable): the merged estimate must
    * land within `tol` of the exact distinct count (relative error of
    * the k=2^12 HLL is ~1.6%; below the sparse-mode threshold the
    * sketch is EXACT, so 5% never flakes while any merge bug — e.g.
    * unioning the wrong shard level — lands far outside). Columns are
    * the exact count + flag so the DuckDB oracle pins every row. */
  def hllRollup(s: SparkSession, dir: String, tol: Double = 0.05): DataFrame = {
    val docs = Tables.documents(s, dir)
    // shard-level sketch table: one 2^12-bucket sketch per (lang, source)
    val shard = docs.groupBy(col("lang"), col("source"))
      .agg(hll_sketch_agg(col("doc_id"), lit(12)).as("sk"))
    // rollup by merging sketches — never touches `docs` again
    val merged = shard.groupBy(col("lang"))
      .agg(hll_union_agg(col("sk")).as("sk"))
      .select(col("lang"), hll_sketch_estimate(col("sk")).as("est"))
    val exact = docs.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_exact"))
    exact.join(merged, "lang")
      .select(col("lang"), col("n_exact"),
        (abs(col("est") - col("n_exact")) <=
          col("n_exact").cast("double") * tol).as("within_tol"))
  }

  val hllRollupSql: String =
    """SELECT lang, COUNT(DISTINCT doc_id) AS n_exact, TRUE AS within_tol
      |FROM documents GROUP BY lang""".stripMargin

  // --------------------------------------------------------------- E43
  /** Count-min-sketch frequency probe: merge one CMS over the event
    * stream (`count_min_sketch` is an algebraic aggregate — partials
    * combine map-side, the exchange carries one w×d counter array per
    * partition, never rows), then probe it for each key and check the
    * CMS contract: the estimate NEVER undercounts, and overcounts by
    * at most eps·N (w = ⌈2/eps⌉ counters/row; overflow probability
    * (1-confidence)^d). The probe set (distinct event types) is a
    * bounded domain — the collect is capped and fail-fast, mirroring
    * FileCatalog.pathsForDate's discipline, because a CMS probe list
    * must be driver-sized by definition (that's what the sketch is
    * for; an unbounded key set would use the exact groupBy instead). */
  def cmsProbe(s: SparkSession, dir: String, eps: Double = 0.001,
               confidence: Double = 0.99, maxKeys: Int = 1000): DataFrame = {
    val ev = Tables.events(s, dir)
    val skRow = ev.agg(
      count_min_sketch(col("event_type"), lit(eps), lit(confidence), lit(42)).as("sk"),
      count(lit(1)).as("n_total")).head()
    val sketch = CountMinSketch.readFrom(skRow.getAs[Array[Byte]]("sk"))
    val nTotal = skRow.getAs[Long]("n_total")
    val exact = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_exact"))
      .limit(maxKeys + 1).collect()
    require(exact.length <= maxKeys,
      s"more than maxKeys=$maxKeys distinct event types — a CMS probe list " +
        "must be driver-sized; use the exact groupBy for unbounded key sets")
    val slack = math.ceil(eps * nTotal).toLong
    val rows = exact.toSeq.map { r =>
      val key = r.getAs[String]("event_type")
      val n = r.getAs[Long]("n_exact")
      val est = sketch.estimateCount(key.getBytes(StandardCharsets.UTF_8))
      (key, n, est >= n, est <= n + slack)
    }
    import s.implicits._
    rows.toDF("event_type", "n_exact", "never_under", "within_eps")
  }

  val cmsProbeSql: String =
    """SELECT event_type, COUNT(*) AS n_exact,
      |  TRUE AS never_under, TRUE AS within_eps
      |FROM events GROUP BY event_type""".stripMargin
}
