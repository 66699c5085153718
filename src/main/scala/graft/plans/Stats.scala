package graft.plans

import org.apache.spark.sql.SparkSession

/** Production on-ramp for the cost-based pieces (SURVEY.md §2 C41):
  * [[DimJoinReorder]] is deliberately inert without catalog row
  * counts — an estimate-free reorder is a coin flip — so turning it
  * on in a real pipeline is a two-step that was previously spread
  * across raw SQL + conf mutation + extraOptimizations plumbing.
  * These helpers make each step ONE call; the C41 gate runs through
  * them so the on-ramp itself is driver-verified. */
object Stats {

  /** Collect the statistics the cost model consumes: table-level row
    * count + per-column NDV/min/max (`ANALYZE TABLE ... FOR ALL
    * COLUMNS`). Idempotent; re-run after large loads — stale counts
    * mis-rank joins as surely as missing ones. One metastore write,
    * one scan of the table (Spark aggregates the stats distributed). */
  def analyze(s: SparkSession, table: String): Unit =
    s.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR ALL COLUMNS")

  /** Enable the dimension-join reorder decision path: CBO stats
    * propagation on (filter selectivity estimated from the ANALYZE
    * column stats) + [[DimJoinReorder]] injected into this session's
    * extra optimizer rules. Idempotent. */
  def enableReorder(s: SparkSession): Unit = {
    s.conf.set("spark.sql.cbo.enabled", "true")
    if (!s.experimental.extraOptimizations.contains(DimJoinReorder))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ DimJoinReorder
  }
}
