package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data-quality gate (SURVEY.md §2 C10): the load-time
  * expectations a warehouse pipeline runs before committing a batch —
  * null checks, domain checks, range checks, key uniqueness — folded
  * into ONE aggregation pass over the data (uniqueness piggybacks as
  * `count - countDistinct`), then unpivoted to a (rule, violations)
  * report. No per-rule scans, no driver-side row iteration.
  */
object DataQuality {

  /** A named expectation; `violation` evaluates true on BAD rows. */
  final case class Expect(name: String, violation: Column)

  def expectNonNull(c: String): Expect =
    Expect(s"non_null_$c", col(c).isNull)
  def expectBetween(c: String, lo: Double, hi: Double): Expect =
    Expect(s"range_$c", col(c).isNull || col(c) < lo || col(c) > hi)
  def expectIn(c: String, allowed: Seq[String]): Expect =
    Expect(s"domain_$c", !col(c).isin(allowed: _*))

  /** One row per rule: (rule, n_violations). `uniqueKey` adds a
    * duplicate-count rule for the given key column. */
  def report(df: DataFrame, expects: Seq[Expect],
             uniqueKey: Option[String] = None): DataFrame = {
    val aggs = expects.map(e =>
      sum(when(e.violation, 1L).otherwise(0L)).as(e.name)) ++
      uniqueKey.map(k =>
        (count(col(k)) - countDistinct(col(k))).as(s"unique_$k")).toSeq
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.unpivot(Array.empty[Column], wide.columns.map(col),
      "rule", "n_violations")
  }

  // --------------------------------------------------------------- C23
  /** Referential-integrity audit: one report row per foreign-key edge
    * of the star schema, counting orphaned child keys and rows — the
    * check a warehouse load runs BEFORE declaring constraints on the
    * target (the reference's Postgres target enforces FKs; at Spark
    * scale the audit has to be a query). Orphan children are planted
    * into each child side so a healthy snapshot still proves the
    * detector fires (and the dup-planted key pins rows ≠ keys).
    *
    * Scale shape: the child side is aggregated to (key, row-count)
    * FIRST — map-side partials reduce the exchange to distinct keys —
    * and only that reduced key set anti-joins the parent's key
    * projection. The per-edge scalars stitch with a cross join of two
    * single-row aggregates (bounded by construction). */
  def fkIntegrity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def edge(name: String, child: DataFrame, parentKeys: DataFrame): DataFrame = {
      val perKey = child.groupBy(col("fk")).agg(count(lit(1)).as("n_rows"))
      val orphan = perKey.join(parentKeys,
        perKey("fk") === parentKeys("pk"), "left_anti")
      val tot = perKey.agg(sum(col("n_rows")).as("n_child_rows"),
        count(lit(1)).as("n_child_keys"))
      val orp = orphan.agg(count(lit(1)).as("n_orphan_keys"),
        coalesce(sum(col("n_rows")), lit(0L)).as("n_orphan_rows"))
      tot.crossJoin(orp).select(lit(name).as("edge"),
        col("n_child_rows"), col("n_child_keys"),
        col("n_orphan_keys"), col("n_orphan_rows"))
    }
    val e1 = edge("lineitem.l_orderkey->orders.o_orderkey",
      Tables.lineitem(s, dir).select(col("l_orderkey").as("fk"))
        .unionByName(Seq(-1L, -2L, -3L, -1L).toDF("fk")),
      Tables.orders(s, dir).select(col("o_orderkey").as("pk")))
    val e2 = edge("orders.o_custkey->customer.c_custkey",
      Tables.orders(s, dir).select(col("o_custkey").as("fk"))
        .unionByName(Seq(-10L, -20L).toDF("fk")),
      Tables.customer(s, dir).select(col("c_custkey").as("pk")))
    e1.unionByName(e2)
  }

  val fkIntegritySql: String =
    """WITH li AS (SELECT l_orderkey AS fk FROM lineitem
      |  UNION ALL SELECT CAST(fk AS BIGINT)
      |            FROM (VALUES (-1), (-2), (-3), (-1)) v(fk)),
      |k1 AS (SELECT fk, COUNT(*) AS n_rows FROM li GROUP BY fk),
      |o1 AS (SELECT n_rows FROM k1
      |       WHERE fk NOT IN (SELECT o_orderkey FROM orders)),
      |od AS (SELECT o_custkey AS fk FROM orders
      |  UNION ALL SELECT CAST(fk AS BIGINT)
      |            FROM (VALUES (-10), (-20)) v(fk)),
      |k2 AS (SELECT fk, COUNT(*) AS n_rows FROM od GROUP BY fk),
      |o2 AS (SELECT n_rows FROM k2
      |       WHERE fk NOT IN (SELECT c_custkey FROM customer)),
      |e1 AS (SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS edge,
      |  CAST((SELECT SUM(n_rows) FROM k1) AS BIGINT) AS n_child_rows,
      |  CAST((SELECT COUNT(*) FROM k1) AS BIGINT) AS n_child_keys,
      |  CAST((SELECT COUNT(*) FROM o1) AS BIGINT) AS n_orphan_keys,
      |  CAST(COALESCE((SELECT SUM(n_rows) FROM o1), 0) AS BIGINT) AS n_orphan_rows),
      |e2 AS (SELECT 'orders.o_custkey->customer.c_custkey' AS edge,
      |  CAST((SELECT SUM(n_rows) FROM k2) AS BIGINT) AS n_child_rows,
      |  CAST((SELECT COUNT(*) FROM k2) AS BIGINT) AS n_child_keys,
      |  CAST((SELECT COUNT(*) FROM o2) AS BIGINT) AS n_orphan_keys,
      |  CAST(COALESCE((SELECT SUM(n_rows) FROM o2), 0) AS BIGINT) AS n_orphan_rows)
      |SELECT * FROM e1 UNION ALL SELECT * FROM e2""".stripMargin
}
