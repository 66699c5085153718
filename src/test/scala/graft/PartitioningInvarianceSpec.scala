package graft

/** Adversarial partitioning-independence sweep: the §4 discipline
  * (exact decimal/integer sums before any order-sensitive float math)
  * claims every statistic is independent of HOW the data is
  * partitioned. This spec attacks the claim directly — each
  * order-sensitive query runs under 1, 7, and 32 shuffle partitions on
  * fresh sessions and the results must be BIT-identical (Row equality
  * boxes doubles through Double.equals = doubleToLongBits comparison;
  * no rounding escape hatch). A double summed in shuffle order would
  * pass the DuckDB oracle only by luck of one partitioning and fail
  * here the moment the partition count changes — the failure mode the
  * merge_into three-valued-logic episode showed oracle agreement
  * alone cannot rule out.
  *
  * The query list is the order-sensitive cohort: iterative float
  * recursions (doc_pagerank), libm-adjacent statistics (chi2, KL,
  * regression, correlation, zipf/heaps fits, entropy, lm_score),
  * decayed/interpolated values, and the weighted rank selections whose
  * crossing arithmetic must be exactly integral.
  */
class PartitioningInvarianceSpec extends SparkSpec {

  private val cohort = Seq(
    "lm_score", "q_regression", "q_chi2", "source_kl", "decayed_counts",
    "q_interpolate", "corr_matrix", "zipf_fit", "heaps_fit",
    "entropy_score", "q_weighted_median", "q_weighted_quantiles",
    "attribution", "doc_pagerank", "q_stats_agg", "logistic_quality",
    // r17 re-planned queries: the banded near-dup join's float scores
    // and the TermTable-derived family must not pick up any shuffle-
    // order sensitivity from their new plans
    "dedup_embedding", "tfidf_top", "oov_rate", "top_terms")

  test("order-sensitive statistics are bit-identical at 1, 7, and 32 shuffle partitions") {
    cohort.foreach { name =>
      val fn = SparkEntry.queries(name)
      val results = Seq("1", "7", "32").map { p =>
        val s2 = spark.newSession()
        s2.conf.set("spark.sql.shuffle.partitions", p)
        fn(s2, sf).collect().sortBy(_.toString).toSeq
      }
      assert(results(0) == results(1) && results(1) == results(2),
        s"$name is partitioning-DEPENDENT: a float reduction is riding " +
          "shuffle order (compare the three collects; fix = pin the " +
          "per-row contribution to DECIMAL before the sum, §4)")
    }
  }
}
