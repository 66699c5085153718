package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SCD Type-2 merge (SURVEY §2 C15): dimension versioning with
  * validity intervals — the warehouse-standard upgrade of C9's SCD-1
  * overwrite (reference behavior: etl_pipeline.py's if_exists-replace
  * load keeps no history).
  *
  * Scale shape: one equi-join between the current dimension and the
  * incoming snapshot on the business key (updates are normally a
  * day's trickle → broadcast; a full-reload worst case degrades to a
  * shuffled hash join, still partitionable). Rows are never compared
  * column-by-column in the driver; the change predicate is a single
  * codegen'd expression.
  */
object Scd2 {

  /** Merge an update snapshot into a current SCD-2 dimension.
    *
    * @param current  existing dimension with `validFrom`/`validTo`/
    *                 `isCurrent` columns (validTo null on open rows)
    * @param updates  new attribute snapshot keyed by `key` (no SCD cols).
    *                 PRECONDITION: one row per key — a snapshot with
    *                 duplicate keys would fan out the join and version
    *                 the same dimension row twice in one wave
    * @param key      business key column name
    * @param changed  predicate over (current, updates) attribute pairs:
    *                 true when the incoming row differs → version bump
    * @param effectiveDate ISO date the new versions start
    */
  def merge(current: DataFrame, updates: DataFrame, key: String,
            changed: Column, effectiveDate: String): DataFrame = {
    val attrCols = updates.columns.filterNot(_ == key)
    val cur = current
    val upd = broadcast(updates.select(
      col(key).as("u_key") +: attrCols.map(c => col(c).as(s"u_$c")): _*))
    val joined = cur.join(upd, cur(key) === col("u_key"), "left")
    // open rows whose attributes changed close at effectiveDate...
    val closedOrKept = joined.select(
      (cur.columns.filterNot(Seq("valid_to", "is_current").contains(_)).map(cur(_)) ++ Seq(
        when(col("u_key").isNotNull && col("is_current") && changed,
          lit(effectiveDate)).otherwise(col("valid_to")).as("valid_to"),
        when(col("u_key").isNotNull && col("is_current") && changed,
          lit(false)).otherwise(col("is_current")).as("is_current"))): _*)
    // ...and the changed updates re-enter as the new current version
    val fresh = joined
      .filter(col("u_key").isNotNull && col("is_current") && changed)
      .select(col("u_key").as(key) +:
        attrCols.map(c => col(s"u_$c").as(c)) :+
        lit(effectiveDate).as("valid_from") :+
        lit(null).cast("string").as("valid_to") :+
        lit(true).as("is_current"): _*)
    closedOrKept.unionByName(fresh)
  }

  /** Driver query: seed an SCD-2 customer dimension from the snapshot,
    * apply a deterministic update wave (every 10th key gets +100
    * balance, every 50th is unchanged → must NOT version), and emit
    * the full merged history. */
  def scd2Merge(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir).select(
      col("c_custkey"), col("c_name"), col("c_acctbal"),
      lit("2024-01-01").as("valid_from"),
      lit(null).cast("string").as("valid_to"),
      lit(true).as("is_current"))
    val updates = Tables.customer(s, dir)
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_name"),
        when(col("c_custkey") % 50 === 0, col("c_acctbal"))
          .otherwise(round(col("c_acctbal") + 100.0, 2)).as("c_acctbal"))
    merge(base, updates, "c_custkey",
      changed = col("c_acctbal") =!= col("u_c_acctbal"),
      effectiveDate = "2024-02-01")
  }

  // --------------------------------------------------------------- C18
  /** Reconciliation report between two versions of a table (the
    * check you run after a migration/backfill): per-nation row counts
    * and exact balance sums for the before/after snapshots, full-outer
    * joined so rows appearing on only one side still surface, with a
    * per-group match verdict. Both sides aggregate BEFORE the join —
    * the exchange carries one row per group per side, never raw rows. */
  def reconReport(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def summarize(df: DataFrame, tag: String): DataFrame =
      df.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as(s"n_$tag"),
          sum(col("c_acctbal").cast(DecimalType(18, 6))).as(s"sum_$tag"))
    val before = Tables.customer(s, dir)
    val after = before
      .withColumn("c_acctbal",
        when(col("c_custkey") % 10 === 0, round(col("c_acctbal") + 100.0, 2))
          .otherwise(col("c_acctbal")))
      .filter(col("c_custkey") % 97 =!= 0) // planted missing rows
    summarize(before, "before")
      .join(summarize(after, "after"), Seq("c_nationkey"), "full_outer")
      .select(col("c_nationkey"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        round(coalesce(col("sum_before"), lit(0)).cast(DecimalType(18, 6)), 2)
          .cast("double").as("sum_before"),
        round(coalesce(col("sum_after"), lit(0)).cast(DecimalType(18, 6)), 2)
          .cast("double").as("sum_after"),
        (coalesce(col("n_before"), lit(0L)) === coalesce(col("n_after"), lit(0L)) &&
          coalesce(col("sum_before"), lit(0)).cast(DecimalType(18, 6)) ===
            coalesce(col("sum_after"), lit(0)).cast(DecimalType(18, 6)))
          .as("matches"))
  }

  val reconReportSql: String =
    """WITH before_t AS (SELECT c_nationkey, COUNT(*) AS n_before,
      |    SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS sum_before
      |  FROM customer GROUP BY 1),
      |after_t AS (SELECT c_nationkey, COUNT(*) AS n_after,
      |    SUM(CAST(CASE WHEN c_custkey % 10 = 0
      |      THEN round(c_acctbal + 100.0, 2) ELSE c_acctbal END
      |      AS DECIMAL(18,6))) AS sum_after
      |  FROM customer WHERE c_custkey % 97 <> 0 GROUP BY 1)
      |SELECT COALESCE(b.c_nationkey, a.c_nationkey) AS c_nationkey,
      |  COALESCE(n_before, 0) AS n_before,
      |  COALESCE(n_after, 0) AS n_after,
      |  CAST(ROUND(COALESCE(sum_before, 0), 2) AS DOUBLE) AS sum_before,
      |  CAST(ROUND(COALESCE(sum_after, 0), 2) AS DOUBLE) AS sum_after,
      |  (COALESCE(n_before, 0) = COALESCE(n_after, 0) AND
      |   COALESCE(sum_before, 0) = COALESCE(sum_after, 0)) AS matches
      |FROM before_t b FULL OUTER JOIN after_t a
      |  ON b.c_nationkey = a.c_nationkey""".stripMargin

  // --------------------------------------------------------------- C24
  /** Row-level change-data-capture diff between two versions of a
    * table — the migration/backfill companion to C18's aggregate
    * reconciliation: WHICH keys were inserted / updated / deleted,
    * not just whether per-group totals still match. v2 is derived
    * deterministically from the snapshot (every 10th key's balance
    * +100, every 97th key deleted, every 101st key re-inserted under a
    * shifted key) so both engines diff identical inputs. One full-outer
    * shuffle join on the business key; unchanged rows are filtered
    * out by a codegen'd predicate, so the output is only the delta —
    * at 100 TB the join shuffles both versions once on the key and
    * nothing else. */
  def cdcDiff(s: SparkSession, dir: String): DataFrame = {
    val v1 = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal").as("bal"))
    val base = Tables.customer(s, dir)
    val v2 = base
      .filter(col("c_custkey") % 97 =!= 0)
      .select(col("c_custkey"),
        when(col("c_custkey") % 10 === 0, round(col("c_acctbal") + 100.0, 2))
          .otherwise(col("c_acctbal")).as("bal"))
      .unionByName(base
        .filter(col("c_custkey") % 101 === 0)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          round(col("c_acctbal") + 1.0, 2).as("bal")))
    v1.select(col("c_custkey").as("k1"), col("bal").as("bal_before"))
      .join(v2.select(col("c_custkey").as("k2"), col("bal").as("bal_after")),
        col("k1") === col("k2"), "full_outer")
      .filter(col("k2").isNull || col("k1").isNull ||
        col("bal_before") =!= col("bal_after"))
      .select(coalesce(col("k1"), col("k2")).as("c_custkey"),
        when(col("k2").isNull, "D")
          .when(col("k1").isNull, "I")
          .otherwise("U").as("change_type"),
        col("bal_before"), col("bal_after"))
  }

  val cdcDiffSql: String =
    """WITH v1 AS (SELECT c_custkey, c_acctbal AS bal FROM customer),
      |v2 AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 10 = 0 THEN round(c_acctbal + 100.0, 2)
      |         ELSE c_acctbal END AS bal
      |  FROM customer WHERE c_custkey % 97 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000 AS c_custkey, round(c_acctbal + 1.0, 2) AS bal
      |  FROM customer WHERE c_custkey % 101 = 0)
      |SELECT COALESCE(a.c_custkey, b.c_custkey) AS c_custkey,
      |  CASE WHEN b.c_custkey IS NULL THEN 'D'
      |       WHEN a.c_custkey IS NULL THEN 'I'
      |       ELSE 'U' END AS change_type,
      |  a.bal AS bal_before, b.bal AS bal_after
      |FROM v1 a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey
      |WHERE b.c_custkey IS NULL OR a.c_custkey IS NULL OR a.bal <> b.bal""".stripMargin

  val scd2MergeSql: String =
    """WITH upd AS (
      |  SELECT c_custkey, c_name,
      |    CASE WHEN c_custkey % 50 = 0 THEN c_acctbal
      |         ELSE round(c_acctbal + 100.0, 2) END AS c_acctbal
      |  FROM customer WHERE c_custkey % 10 = 0),
      |changed AS (
      |  SELECT c.c_custkey FROM customer c JOIN upd u USING (c_custkey)
      |  WHERE c.c_acctbal <> u.c_acctbal)
      |SELECT c.c_custkey, c.c_name, c.c_acctbal,
      |  '2024-01-01' AS valid_from,
      |  CASE WHEN ch.c_custkey IS NOT NULL THEN '2024-02-01' END AS valid_to,
      |  ch.c_custkey IS NULL AS is_current
      |FROM customer c LEFT JOIN changed ch ON c.c_custkey = ch.c_custkey
      |UNION ALL
      |SELECT u.c_custkey, u.c_name, u.c_acctbal,
      |  '2024-02-01', NULL, TRUE
      |FROM upd u JOIN changed ch ON u.c_custkey = ch.c_custkey""".stripMargin

  // --------------------------------------------------------------- C34
  /** Three-action MERGE INTO semantics (the lakehouse primitive:
    * WHEN MATCHED AND close THEN DELETE / WHEN MATCHED THEN UPDATE /
    * WHEN NOT MATCHED THEN INSERT) resolved in ONE full-outer pass —
    * completing the family: C9 is two-action upsert, C24 computes a
    * diff, F18 applies CDC continuously; this is the conditional
    * multi-action batch form, with per-row action attribution.
    * Change set (deterministic): key%7=0 closes, key%7∈{1,2} gets
    * +100 balance, key%13=0 spawns an insert at key+2,000,000.
    *
    * Scale shape: exactly one key-partitioned shuffle (the full-outer
    * join); every action resolves from the joined row with no second
    * pass, no window, no driver state. Deletes are row drops in the
    * result — the physical-rewrite half (touch only affected
    * partitions, swap atomically) is C9/C29's proven machinery and is
    * deliberately not repeated here. At 100 TB the join is the whole
    * cost and AQE picks SMJ vs shuffled-hash from runtime stats. */
  def mergeInto(s: SparkSession, dir: String): DataFrame = {
    val tgt = Tables.customer(s, dir)
      .select(col("c_custkey").as("id"), col("c_acctbal").as("bal"))
    val closes = tgt.filter(col("id") % 7 === 0)
      .select(col("id"), lit(null).cast("double").as("v"), lit("close").as("op"))
    val updates = tgt.filter(col("id") % 7 === 1 || col("id") % 7 === 2)
      .select(col("id"), lit(100.0).as("v"), lit("upsert").as("op"))
    val inserts = tgt.filter(col("id") % 13 === 0)
      .select((col("id") + 2000000L).as("id"), (col("bal") / 2.0).as("v"),
        lit("upsert").as("op"))
    val src = closes.unionByName(updates).unionByName(inserts)
    // op is NULL for unmatched target rows: comparisons must be
    // null-safe (<=>) or three-valued logic silently drops every
    // 'keep' row from a NOT(...) filter
    tgt.join(src, Seq("id"), "full_outer")
      .filter(!(col("bal").isNotNull && (col("op") <=> "close")))
      .select(col("id"),
        when(col("bal").isNotNull && (col("op") <=> "upsert"),
          col("bal") + col("v"))
          .when(col("bal").isNotNull, col("bal"))
          .otherwise(col("v")).as("bal"),
        when(col("bal").isNotNull && (col("op") <=> "upsert"), lit("update"))
          .when(col("bal").isNotNull, lit("keep"))
          .otherwise(lit("insert")).as("action"))
      .filter(col("bal").isNotNull) // drops close-of-missing ghosts
  }

  val mergeIntoSql: String =
    """WITH tgt AS (SELECT c_custkey AS id, c_acctbal AS bal FROM customer),
      |src AS (
      |  SELECT id, CAST(NULL AS DOUBLE) AS v, 'close' AS op FROM tgt
      |  WHERE id % 7 = 0
      |  UNION ALL
      |  SELECT id, 100.0, 'upsert' FROM tgt WHERE id % 7 IN (1, 2)
      |  UNION ALL
      |  SELECT id + 2000000, bal / 2.0, 'upsert' FROM tgt
      |  WHERE id % 13 = 0),
      |j AS (SELECT COALESCE(t.id, s.id) AS id, t.bal, s.v, s.op
      |  FROM tgt t FULL OUTER JOIN src s ON t.id = s.id)
      |SELECT id,
      |  CASE WHEN bal IS NOT NULL AND op IS NOT DISTINCT FROM 'upsert'
      |    THEN bal + v WHEN bal IS NOT NULL THEN bal ELSE v END AS bal,
      |  CASE WHEN bal IS NOT NULL AND op IS NOT DISTINCT FROM 'upsert'
      |    THEN 'update' WHEN bal IS NOT NULL THEN 'keep'
      |    ELSE 'insert' END AS action
      |FROM j
      |WHERE NOT (bal IS NOT NULL AND op IS NOT DISTINCT FROM 'close')
      |  AND (CASE WHEN bal IS NOT NULL AND op IS NOT DISTINCT FROM 'upsert'
      |    THEN bal + v WHEN bal IS NOT NULL THEN bal ELSE v END)
      |    IS NOT NULL""".stripMargin
}
