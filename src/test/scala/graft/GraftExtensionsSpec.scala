package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

/** The `spark.sql.extensions=graft.functions.GraftExtensions` entry
  * point: one config line must light up the whole library surface on
  * a fresh session — SQL functions, both optimizer rules, and the
  * native as-of join strategy — with no imperative registration. */
class GraftExtensionsSpec extends SparkSpec {

  private def withExtensionSession[A](body: SparkSession => A): A = {
    // `spark.sql.extensions` is a STATIC conf read from the
    // SparkContext at session build — the shared test context already
    // exists without it, so exercise the same hook through the public
    // builder API (`withExtensions` invokes exactly the function the
    // config path instantiates) on a NEW session over the shared
    // context.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = org.apache.spark.sql.classic.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions()(_))
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
      body(s2) // do NOT stop s2 — it shares the JVM-wide SparkContext
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("one config line registers functions, rewrites, and the as-of strategy") {
    assume(spark != null) // materialize the shared session/context first
    withExtensionSession { s2 =>
      // 1. SQL functions resolve with no imperative register() call
      val fp = s2.sql("SELECT rolling_hash('abc') AS h").collect().head.getLong(0)
      assert(fp == (((0L * 31 + 'a') * 31 + 'b') * 31 + 'c') % 1000000007L)
      val topk = s2.sql(
        "SELECT bounded_top_k(x, 2) AS t FROM VALUES (3), (1), (2) AS v(x)")
        .collect().head.getSeq[Int](0)
      assert(topk == Seq(1, 2))
      // 2. the top-k window rewrite fires through pure SQL
      Tables.orders(s2, sf).createOrReplaceTempView("ext_orders")
      val q = s2.sql(
        """SELECT * FROM (
          |  SELECT o_custkey, o_orderkey,
          |    ROW_NUMBER() OVER (PARTITION BY o_custkey
          |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM ext_orders) t WHERE rn <= 2""".stripMargin)
      q.collect()
      val p = q.asInstanceOf[ClassicDataset[_]].queryExecution.executedPlan.toString
      assert(p.contains("bounded_top_k") && !p.contains("Window"), p)
      // 3. the as-of strategy is installed session-wide: planning the
      // native node needs no imperative extraStrategies mutation
      assert(s2.sessionState.planner.strategies
        .contains(graft.plans.AsOfJoinStrategy),
        s2.sessionState.planner.strategies.mkString(", "))
      assert(s2.sessionState.planner.strategies
        .contains(graft.plans.GlobalRankStrategy),
        s2.sessionState.planner.strategies.mkString(", "))
      // 4. the byte-range shingle hasher resolves in SQL and agrees
      // with xxhash64 of the gram string
      val sh = s2.sql(
        "SELECT word_shingle_hashes('a b c', 2) AS h, " +
          "array(xxhash64('a b'), xxhash64('b c')) AS e")
        .collect().head
      assert(sh.getSeq[Long](0).toSet == sh.getSeq[Long](1).toSet)
      // 5. the dim-join reorder rule is installed (its no-stats guard
      // keeps it inert on raw scans)
      assert(s2.sessionState.optimizer.batches.flatMap(_.rules)
        .contains(graft.plans.DimJoinReorder))
    }
  }

  test("the shared session is untouched by the extension session") {
    // no graft functions leak into the base session's registry unless
    // imperatively registered; its optimizer has no extra rules
    assert(spark.experimental.extraOptimizations.isEmpty ||
      !spark.experimental.extraOptimizations.contains(graft.plans.TopKRewrite))
  }
}
