package graft

import graft.operators.Relational

/** SQL front-end parity: the engine's queries are reachable through
  * plain `spark.sql` too, and the ANSI subset of the oracle SQL runs
  * unchanged on Spark — same rows as the DataFrame formulation. */
class SqlApiSpec extends SparkSpec {

  private def asSets(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case d: java.math.BigDecimal => d.doubleValue()
      case x => x
    }).toSet

  private def registerViews(): Unit =
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").createOrReplaceTempView(t)
    }

  test("ANSI oracle SQL runs unchanged on Spark and matches the DataFrame plan") {
    registerViews()
    for ((df, sql) <- Seq(
      Relational.q1Agg(spark, sf) -> Relational.q1AggSql,
      Relational.starJoin(spark, sf) -> Relational.starJoinSql,
      Relational.bigJoin(spark, sf) -> Relational.bigJoinSql,
      Relational.havingAgg(spark, sf) -> Relational.havingAggSql,
      Relational.rollupAgg(spark, sf) -> Relational.rollupAggSql)) {
      assert(asSets(spark.sql(sql)) == asSets(df), s"SQL diverged for: $sql")
    }
  }

  test("round-5 ANSI-subset oracles run unchanged on Spark too") {
    registerViews()
    // events normalized through Tables.events so ts is a timestamp in SQL
    Tables.events(spark, sf).createOrReplaceTempView("events")
    for ((df, sql) <- Seq(
      operators.Analytics.statsAgg(spark, sf) -> operators.Analytics.statsAggSql,
      operators.Analytics.modeAgg(spark, sf) -> operators.Analytics.modeAggSql,
      operators.Analytics.funnel(spark, sf) -> operators.Analytics.funnelSql)) {
      assert(asSets(spark.sql(sql)) == asSets(df), s"SQL diverged for: $sql")
    }
  }

  test("custom expressions are callable from SQL after registration") {
    registerViews()
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("documents")
    val viaSql = spark.sql(
      "SELECT doc_id, rolling_hash(text) AS fp FROM documents ORDER BY doc_id")
    val viaApi = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.RollingHash.rollingHash(
          org.apache.spark.sql.functions.col("text")).as("fp"))
      .orderBy("doc_id")
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq)
  }
}
