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
  /** The full FK edge set of the TPC-H-ish star, shared by the Spark
    * audit and the generated DuckDB oracle so the two can never drift:
    * (edge child-table, fk column, parent table, pk column, planted
    * orphan keys). Every edge plants orphans — a healthy snapshot must
    * still prove the detector fires — and the first edge plants a
    * DUPLICATED key (-1 twice) so `n_orphan_rows ≠ n_orphan_keys` pins
    * the rows-vs-keys distinction. Keys are negative: disjoint from
    * every generated key space. */
  private val fkEdges: Seq[(String, String, String, String, Seq[Long])] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey", Seq(-1L, -2L, -3L, -1L)),
    ("lineitem", "l_partkey", "part", "p_partkey", Seq(-4L, -5L)),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey", Seq(-6L, -7L)),
    ("orders", "o_custkey", "customer", "c_custkey", Seq(-10L, -20L)),
    ("customer", "c_nationkey", "nation", "n_nationkey", Seq(-30L)),
    ("supplier", "s_nationkey", "nation", "n_nationkey", Seq(-40L)),
    ("nation", "n_regionkey", "region", "r_regionkey", Seq(-50L)))

  def fkIntegrity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def table(name: String): DataFrame = name match {
      case "lineitem" => Tables.lineitem(s, dir)
      case "orders"   => Tables.orders(s, dir)
      case "customer" => Tables.customer(s, dir)
      case "supplier" => Tables.supplier(s, dir)
      case "nation"   => Tables.nation(s, dir)
      case "region"   => Tables.region(s, dir)
      case "part"     => Tables.part(s, dir)
    }
    // ONE scan per child TABLE, not per edge: a table's edges fan out
    // through a single inline explode (an Expand over the projected fk
    // columns), so lineitem — the 100 TB fact — is read once for its
    // three edges instead of three times. The (edge, fk) stream then
    // reduces in ONE hash aggregation (map-side partials collapse each
    // edge's keys before the exchange); everything after operates on
    // distinct keys per edge, orders of magnitude smaller than rows.
    val edgeName = (ct: String, fk: String, pt: String, pk: String) =>
      s"$ct.$fk->$pt.$pk"
    // the edge travels as a 4-byte ORDINAL through the key-grain
    // shuffles (r19, guide-§2.3 narrower types): the ~35-char edge name
    // on every one of the millions of (edge, fk) rows was pure exchange
    // payload — names re-attach onto the 7-row report at the end
    val edgeId: ((String, String, String, String, Seq[Long])) => Int =
      fkEdges.zipWithIndex.toMap
    val childKeys = fkEdges.groupBy(_._1).map { case (ct, edges) =>
      table(ct).select(explode(array(edges.map { case e @ (_, fk, _, _, _) =>
        struct(lit(edgeId(e)).as("edge"), col(fk).cast("long").as("fk"))
      }: _*)).as("e")).select(col("e.edge").as("edge"), col("e.fk").as("fk"))
    }.reduce(_.unionByName(_))
    val planted = fkEdges.flatMap { case e @ (_, _, _, _, keys) =>
      keys.map(k => (edgeId(e), k))
    }.toDF("edge", "fk")
    val perKey = childKeys.unionByName(planted)
      .groupBy(col("edge"), col("fk")).agg(count(lit(1)).as("n_rows"))
    // ONE anti-join for all 7 edges: parents union into a tagged
    // (edge, pk) key set — each parent table scanned once, projected
    // to its key column — and orphanhood is decided on the composite
    // (edge, key) equi-key, hash-partitioned and skew-free. Both
    // report halves are then #edges-sized aggregates of the reduced
    // frames; the final join is 7 rows against 7 rows.
    val parents = fkEdges.map { case e @ (_, _, pt, pk, _) =>
      table(pt).select(lit(edgeId(e)).as("edge"),
        col(pk).cast("long").as("pk"))
    }.reduce(_.unionByName(_))
    val orphans = perKey.join(parents,
      perKey("edge") === parents("edge") && perKey("fk") === parents("pk"),
      "left_anti")
    val tot = perKey.groupBy(col("edge"))
      .agg(sum(col("n_rows")).as("n_child_rows"),
        count(lit(1)).as("n_child_keys"))
    val orp = orphans.groupBy(col("edge"))
      .agg(count(lit(1)).as("n_orphan_keys"),
        sum(col("n_rows")).as("n_orphan_rows"))
    val names = fkEdges.map { case e @ (ct, fk, pt, pk, _) =>
      (edgeId(e), edgeName(ct, fk, pt, pk))
    }.toDF("edge", "edge_name")
    tot.join(orp, Seq("edge"), "left")
      .join(broadcast(names), Seq("edge"))
      .select(col("edge_name").as("edge"),
        col("n_child_rows"), col("n_child_keys"),
        coalesce(col("n_orphan_keys"), lit(0L)).as("n_orphan_keys"),
        coalesce(col("n_orphan_rows"), lit(0L)).as("n_orphan_rows"))
  }

  /** Oracle generated from the SAME [[fkEdges]] list. Orphan detection
    * uses NOT EXISTS, not NOT IN: a NULL parent key would make NOT IN
    * evaluate UNKNOWN and silently report zero orphans — exactly the
    * failure mode an integrity audit on dirty data cannot have. */
  val fkIntegritySql: String = {
    val ctes = fkEdges.zipWithIndex.map { case ((ct, fk, pt, pk, planted), i) =>
      val values = planted.map(v => s"($v)").mkString(", ")
      s"""c$i AS (SELECT CAST($fk AS BIGINT) AS fk FROM $ct
         |  UNION ALL SELECT CAST(fk AS BIGINT) FROM (VALUES $values) v(fk)),
         |k$i AS (SELECT fk, COUNT(*) AS n_rows FROM c$i GROUP BY fk),
         |o$i AS (SELECT n_rows FROM k$i
         |       WHERE NOT EXISTS (SELECT 1 FROM $pt p
         |                         WHERE CAST(p.$pk AS BIGINT) = k$i.fk))""".stripMargin
    }
    val selects = fkEdges.zipWithIndex.map { case ((ct, fk, pt, pk, _), i) =>
      s"""SELECT '$ct.$fk->$pt.$pk' AS edge,
         |  CAST((SELECT SUM(n_rows) FROM k$i) AS BIGINT) AS n_child_rows,
         |  CAST((SELECT COUNT(*) FROM k$i) AS BIGINT) AS n_child_keys,
         |  CAST((SELECT COUNT(*) FROM o$i) AS BIGINT) AS n_orphan_keys,
         |  CAST(COALESCE((SELECT SUM(n_rows) FROM o$i), 0) AS BIGINT) AS n_orphan_rows""".stripMargin
    }
    "WITH " + ctes.mkString(",\n") + "\n" + selects.mkString("\nUNION ALL\n")
  }

  // --------------------------------------------------------------- C25
  /** Benford's-law first-digit audit (the forensic screen for
    * fabricated or truncated monetary data): observed share of each
    * leading digit of o_totalprice vs the Benford expectation
    * log10(1 + 1/d), with a chi-square contribution per digit.
    *
    * Determinism: the digit comes from the DECIMAL STRING of the
    * integer part (both engines print BIGINT identically) — not from
    * log10 of a double, whose ULP near powers of ten would misclassify
    * boundary values differently per libm. Shares and the expectation
    * are rounded to 6 BEFORE the chi-square arithmetic, so every
    * engine computes it from identical operands.
    *
    * Scale shape: one projection + a 9-group hash aggregate with
    * map-side partials; the total broadcasts back. Nothing but 9 rows
    * ever crosses the wire after the partial agg. */
  def benfordAudit(s: SparkSession, dir: String): DataFrame = {
    val digits = Tables.orders(s, dir).select(
      substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
    val counts = digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("total").cast("double"), 6).as("obs_share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6).as("exp_share"),
        col("total"))
      .select(col("digit"), col("n"), col("obs_share"), col("exp_share"),
        round(col("total").cast("double") *
          (col("obs_share") - col("exp_share")) * (col("obs_share") - col("exp_share")) /
          col("exp_share"), 6).as("chi2_term"))
  }

  val benfordAuditSql: String =
    """WITH d AS (SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
      |      AS INT) AS digit
      |  FROM orders),
      |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
      |sh AS (SELECT digit, n,
      |    ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS obs_share,
      |    ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS exp_share,
      |    total
      |  FROM c, t)
      |SELECT digit, n, obs_share, exp_share,
      |  ROUND(CAST(total AS DOUBLE) * (obs_share - exp_share) * (obs_share - exp_share)
      |        / exp_share, 6) AS chi2_term
      |FROM sh""".stripMargin

  // --------------------------------------------------------------- C26
  /** Join-key skew profile (the pre-flight a 100 TB join needs: how
    * many keys are singletons, how heavy is the hot tail?): a
    * count-of-counts histogram of l_partkey multiplicity — frequency f
    * → how many keys occur f times, how many rows they carry, and the
    * row share. The classic two-level aggregate: the first (big)
    * groupBy partial-aggregates map-side; the second sees only
    * |distinct keys| rows and collapses to |distinct frequencies|. */
  def skewReport(s: SparkSession, dir: String): DataFrame = {
    val perKey = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val hist = perKey.groupBy(col("cnt")).agg(count(lit(1)).as("n_keys"))
      .select(col("cnt"), col("n_keys"), (col("cnt") * col("n_keys")).as("n_rows"))
    val total = hist.agg(sum(col("n_rows")).as("total"))
    hist.crossJoin(broadcast(total))
      .select(col("cnt"), col("n_keys"), col("n_rows"),
        round(col("n_rows").cast("double") / col("total").cast("double"), 6).as("row_share"))
  }

  // --------------------------------------------------------------- C27
  /** Daily-volume anomaly monitor (the freshness/volume SLO check an
    * ingest pipeline alerts on): each day's event count z-scored
    * against the trailing 7 COMPLETE days (frame excludes the current
    * day — today must not dilute its own baseline). The window sums
    * (Σn, Σn²) are exact BIGINTs, so mean/variance derive from
    * identical integer operands in both engines; days with fewer than
    * 7 priors or zero variance report NULL rather than a fake z.
    *
    * Scale shape: the fact table reduces to one row per day BEFORE the
    * unpartitioned window — the window input is |days|, so the single
    * partition is a few-hundred-row frame, not a data funnel (in a
    * multi-tenant deployment the window would partition by source). */
  def volumeAnomaly(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("day")).rowsBetween(-7, -1)
    val st = daily
      .withColumn("n_prior", count(col("n")).over(w))
      .withColumn("s1", sum(col("n")).over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
    val mean = col("s1").cast("double") / lit(7.0)
    val variance = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / lit(7.0)) / lit(6.0)
    st.select(col("day"), col("n"),
      when(col("n_prior") === 7, round(mean, 6)).as("mean7"),
      when(col("n_prior") === 7 && variance > 0, round(sqrt(variance), 6)).as("std7"),
      when(col("n_prior") === 7 && variance > 0,
        round((col("n").cast("double") - mean) / sqrt(variance), 6)).as("z"))
  }

  val volumeAnomalySql: String =
    """WITH d AS (SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1),
      |st AS (SELECT day, n,
      |    COUNT(n) OVER w AS n_prior,
      |    SUM(n) OVER w AS s1,
      |    SUM(n * n) OVER w AS s2
      |  FROM d WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT CAST(day AS TIMESTAMP) AS day, n,
      |  CASE WHEN n_prior = 7
      |    THEN ROUND(CAST(s1 AS DOUBLE) / 7.0, 6) END AS mean7,
      |  CASE WHEN n_prior = 7 AND (CAST(s2 AS DOUBLE) -
      |      CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0) / 6.0 > 0
      |    THEN ROUND(sqrt((CAST(s2 AS DOUBLE) -
      |      CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0) / 6.0), 6) END AS std7,
      |  CASE WHEN n_prior = 7 AND (CAST(s2 AS DOUBLE) -
      |      CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0) / 6.0 > 0
      |    THEN ROUND((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0) /
      |      sqrt((CAST(s2 AS DOUBLE) -
      |        CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0) / 6.0), 6) END AS z
      |FROM st""".stripMargin

  val skewReportSql: String =
    """WITH pk AS (SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey),
      |h AS (SELECT cnt, COUNT(*) AS n_keys, cnt * COUNT(*) AS n_rows
      |  FROM pk GROUP BY cnt),
      |t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM h)
      |SELECT cnt, n_keys, CAST(n_rows AS BIGINT) AS n_rows,
      |  ROUND(CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE), 6) AS row_share
      |FROM h, t""".stripMargin

  // --------------------------------------------------------------- C30
  /** Engine-portable table fingerprint: an order-independent content
    * checksum two DIFFERENT engines can compute over the same table and
    * compare byte-for-byte — the migration-validation primitive ("does
    * the new engine's copy of this 100 TB table equal the old one?")
    * that motivated this whole library. Each row canonicalizes to a
    * delimited string of engine-neutral atoms (ints as decimal text,
    * doubles pinned through DECIMAL(18,6), timestamps as epoch
    * microseconds), hashes through MD5 (bit-identical everywhere), and
    * the first 40 bits sum per bucket — an exact, commutative
    * reduction, so partitioning and row order are irrelevant. The sum
    * runs as TWO long limbs (quotient/remainder by 2^20, the
    * corr_matrix trick — long math, never per-row BigDecimal): each
    * limb addend is < 2^20, so limb sums stay inside int64 to ~2^43
    * rows PER BUCKET (~140 trillion table rows). The fingerprint IS
    * the exact limb pair (fp_hi, fp_lo) = (Σ h div 2^20, Σ h mod
    * 2^20) — logically fp_hi·2^20 + fp_lo, but published as the pair
    * so both engines compare in native int64 (a recombined
    * DECIMAL(38,0) reaches pandas/arrow as float64 and loses
    * exactness; a single 40-bit sum in int64 overflows at only ~2^23
    * rows per bucket — and Spark's non-ANSI sum(long) would wrap
    * silently while DuckDB promotes to HUGEINT, so the engines would
    * diverge precisely at migration scale). Bucketing
    * by key mod 16 turns "the table diverged"
    * into "bucket 11 diverged": at scale the two sides re-fingerprint
    * only that bucket's partitions to localize the corruption.
    *
    * Scale shape: one scan, one partial-combined exchange of 16 groups
    * carrying (count, decimal sum) — the cheapest possible full-table
    * verification; nothing wide ever shuffles. */
  def tableFingerprint(s: SparkSession, dir: String): DataFrame = {
    // o_orderdate arrives TIMESTAMP_NTZ; the NTZ->LTZ cast preserves
    // the wall-clock only under the UTC session timezone every graft
    // entry point pins (see Tables.events, which enforces the same)
    val tz = s.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"tableFingerprint canonicalizes TIMESTAMP_NTZ via a UTC session " +
      s"timezone; session has '$tz'")
    val canon = concat_ws("|",
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 6)),
      unix_micros(col("o_orderdate")
        .cast(org.apache.spark.sql.types.TimestampType)),
      col("o_orderpriority"))
    Tables.orders(s, dir)
      .select(pmod(col("o_orderkey"), lit(16L)).as("bucket"),
        conv(substring(md5(canon), 1, 10), 16, 10).cast("long").as("h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("h div 1048576")).as("fp_hi"),
        sum(expr("h % 1048576")).as("fp_lo"))
  }

  val tableFingerprintSql: String =
    """SELECT bucket, COUNT(*) AS n_rows,
      |  CAST(SUM(h // 1048576) AS BIGINT) AS fp_hi,
      |  CAST(SUM(h % 1048576) AS BIGINT) AS fp_lo
      |FROM (SELECT o_orderkey % 16 AS bucket,
      |  CAST(CONCAT('0x', substr(md5(CONCAT_WS('|',
      |    o_orderkey, o_custkey, o_orderstatus,
      |    CAST(o_totalprice AS DECIMAL(18,6)),
      |    epoch_us(o_orderdate), o_orderpriority)), 1, 10)) AS BIGINT) AS h
      |  FROM orders) GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- C33
  /** Population-stability-index drift monitor between two versions of
    * a table (the production data-drift alarm that C18's exact
    * reconciliation is too strict for — recon asks "is it identical?",
    * PSI asks "did the DISTRIBUTION move?"): bucket both versions on
    * BASELINE-derived equal-width edges, then
    * PSI = Σ_b (p_cur − p_base)·ln(p_cur / p_base); the simulated
    * current version shifts every 5th order's total by +10%. Per-
    * bucket contributions are reported so an alarm localizes WHICH
    * band moved (> 0.1 total is the conventional "investigate").
    *
    * Scale shape: one agg for the baseline min/max (broadcast back),
    * one scan per version into a 10-key hash aggregate (map-side
    * partials), totals carried by a broadcast cross join — no sort,
    * no window, no per-row state; empty buckets contribute 0 by the
    * CASE guard, never NaN. The bucket expression evaluates an
    * identical double tree in both engines; ln's ≤ 1-ulp wobble is
    * absorbed by round(…,6). */
  def psiDrift(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice").as("v"))
    val cur = base.select(col("o_orderkey"),
      when(col("o_orderkey") % 5 === 0, col("v") * 1.1)
        .otherwise(col("v")).as("v"))
    val mm = base.agg(min("v").as("mn"), max("v").as("mx"))
    def bucketed(df: DataFrame, tag: String): DataFrame =
      df.crossJoin(broadcast(mm))
        .select(least(lit(9),
          floor((col("v") - col("mn")) / (col("mx") - col("mn")) * 10.0)
            .cast("int")).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(s"n_$tag"))
    val j = bucketed(base, "base")
      .join(bucketed(cur, "cur"), Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_base", "n_cur"))
    val tot = j.agg(sum("n_base").as("tb"), sum("n_cur").as("tc"))
    val pb = col("n_base").cast("double") / col("tb").cast("double")
    val pc = col("n_cur").cast("double") / col("tc").cast("double")
    j.crossJoin(broadcast(tot))
      .select(col("bucket"),
        round(pb, 6).as("p_base"), round(pc, 6).as("p_cur"),
        round(when(col("n_base") > 0 && col("n_cur") > 0,
          (pc - pb) * log(pc / pb)).otherwise(lit(0.0)), 6).as("contrib"))
  }

  val psiDriftSql: String =
    """WITH base AS (SELECT o_orderkey, o_totalprice AS v FROM orders),
      |cur AS (SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 5 = 0 THEN v * 1.1 ELSE v END AS v
      |  FROM base),
      |mm AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM base),
      |bb AS (SELECT LEAST(9, CAST(FLOOR((v - mn) / (mx - mn) * 10.0)
      |    AS INTEGER)) AS bucket FROM base, mm),
      |bc AS (SELECT LEAST(9, CAST(FLOOR((v - mn) / (mx - mn) * 10.0)
      |    AS INTEGER)) AS bucket FROM cur, mm),
      |gb AS (SELECT bucket, COUNT(*) AS n_base FROM bb GROUP BY bucket),
      |gc AS (SELECT bucket, COUNT(*) AS n_cur FROM bc GROUP BY bucket),
      |j AS (SELECT COALESCE(gb.bucket, gc.bucket) AS bucket,
      |    COALESCE(n_base, 0) AS n_base, COALESCE(n_cur, 0) AS n_cur
      |  FROM gb FULL OUTER JOIN gc ON gb.bucket = gc.bucket),
      |t AS (SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc FROM j)
      |SELECT bucket,
      |  ROUND(CAST(n_base AS DOUBLE) / CAST(tb AS DOUBLE), 6) AS p_base,
      |  ROUND(CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE), 6) AS p_cur,
      |  ROUND(CASE WHEN n_base > 0 AND n_cur > 0 THEN
      |      (CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE)
      |        - CAST(n_base AS DOUBLE) / CAST(tb AS DOUBLE))
      |      * ln((CAST(n_cur AS DOUBLE) / CAST(tc AS DOUBLE))
      |        / (CAST(n_base AS DOUBLE) / CAST(tb AS DOUBLE)))
      |    ELSE 0.0 END, 6) AS contrib
      |FROM j, t""".stripMargin

  // --------------------------------------------------------------- C36
  /** Exact two-sample Kolmogorov–Smirnov drift test between two table
    * versions — the distribution alarm with a SIGNIFICANCE story that
    * C33's PSI lacks (PSI has conventional thresholds; KS has an exact
    * null distribution): D = sup_x |F_base(x) − F_cur(x)| over the
    * empirical CDFs, compared against the α=0.05 two-sample critical
    * value 1.358·√((n_b+n_c)/(n_b·n_c)). Same simulated drift as C33
    * (every 5th order's total shifted +10%) so the two monitors are
    * directly comparable on one planted change.
    *
    * Scale shape: both versions reduce to per-DISTINCT-VALUE counts in
    * one hash aggregate (map-side partials — the table never sorts).
    * The empirical CDFs are inclusive prefix sums over that value-
    * distinct frame, and ride [[Relational.globalRunningSum]]'s native
    * prefix-scan (range exchange + counting pass, no single-reducer
    * window) — two passes, one per side's counts, each an exchange of
    * |distinct values| rows, negligible beside the scan. The argmax is
    * a struct-max aggregate (deterministic: ties on D break toward the
    * smallest value). D's per-row arithmetic is two exact-long
    * divisions by the broadcast totals in IEEE doubles — identical in
    * both engines — and rounds to 6 at the single output row. */
  def ksDrift(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice").as("v"))
    val cur = base.select(
      when(col("o_orderkey") % 5 === 0, col("v") * 1.1)
        .otherwise(col("v")).as("v"))
    val tagged = base.select(col("v"), lit(1L).as("one_b"), lit(0L).as("one_c"))
      .unionByName(cur.select(col("v"), lit(0L).as("one_b"), lit(1L).as("one_c")))
    val counts = tagged.groupBy(col("v"))
      .agg(sum(col("one_b")).as("cb"), sum(col("one_c")).as("cc"))
    // two prefix passes (exact at ANY row count — a single combined-
    // limb encoding cb·2³¹+cc would overflow past 2³¹ rows per side);
    // the second pass re-ranges the already-ranged frame: cheap
    val run1 = Relational.globalRunningSum(counts, Nil, Seq("v"), "cb",
      rankCol = "rn_b", countCol = "n_vals_b", runCol = "run_b")
    val run2 = Relational.globalRunningSum(run1, Nil, Seq("v"), "cc",
      rankCol = "rn_c", countCol = "n_vals_c", runCol = "run_c")
    val tot = counts.agg(sum(col("cb")).as("nb"), sum(col("cc")).as("nc"))
    run2.crossJoin(broadcast(tot))
      .select(col("v"), col("nb"), col("nc"),
        abs(col("run_b").cast("double") / col("nb").cast("double")
          - col("run_c").cast("double") / col("nc").cast("double")).as("dd"))
      .agg(max(struct(col("dd"), (-col("v")).as("nv"))).as("m"),
        first(col("nb")).as("n_base"), first(col("nc")).as("n_cur"))
      .select(round(col("m.dd"), 6).as("d_stat"),
        (-col("m.nv")).as("at_value"),
        col("n_base"), col("n_cur"),
        round(lit(1.358) * sqrt((col("n_base") + col("n_cur")).cast("double")
          / (col("n_base") * col("n_cur")).cast("double")), 6).as("crit_05"),
        (col("m.dd") > lit(1.358)
          * sqrt((col("n_base") + col("n_cur")).cast("double")
            / (col("n_base") * col("n_cur")).cast("double"))).as("drifted"))
  }

  val ksDriftSql: String =
    """WITH base AS (SELECT o_totalprice AS v FROM orders),
      |cur AS (SELECT CASE WHEN o_orderkey % 5 = 0
      |    THEN o_totalprice * 1.1 ELSE o_totalprice END AS v FROM orders),
      |u AS (SELECT v, 1 AS one_b, 0 AS one_c FROM base
      |      UNION ALL SELECT v, 0, 1 FROM cur),
      |g AS (SELECT v, SUM(one_b) AS cb, SUM(one_c) AS cc FROM u GROUP BY v),
      |t AS (SELECT SUM(cb) AS nb, SUM(cc) AS nc FROM g),
      |w AS (SELECT v,
      |    SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS rb,
      |    SUM(cc) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS rc
      |  FROM g),
      |d AS (SELECT v,
      |    ABS(CAST(rb AS DOUBLE) / nb - CAST(rc AS DOUBLE) / nc) AS dd
      |  FROM w, t),
      |m AS (SELECT v, dd FROM d ORDER BY dd DESC, v ASC LIMIT 1)
      |SELECT ROUND(dd, 6) AS d_stat, v AS at_value,
      |  CAST(nb AS BIGINT) AS n_base, CAST(nc AS BIGINT) AS n_cur,
      |  ROUND(1.358 * sqrt(CAST(nb + nc AS DOUBLE)
      |    / CAST(nb * nc AS DOUBLE)), 6) AS crit_05,
      |  dd > 1.358 * sqrt(CAST(nb + nc AS DOUBLE)
      |    / CAST(nb * nc AS DOUBLE)) AS drifted
      |FROM m, t""".stripMargin

  // --------------------------------------------------------------- C37
  /** Join-cardinality pre-flight (the OTHER number a 100 TB join needs
    * beside C26's per-side skew profile): the EXACT output row count
    * of an equi-join is Σ_k cnt_A(k)·cnt_B(k) — computable from two
    * keys-sized count aggregates WITHOUT running the join, so the
    * planner (or the engineer) learns "this self-join explodes 40×"
    * for the price of two scans and a keys-sized join of count tables.
    * Demonstrated on the lineitem×lineitem self-join on l_partkey (the
    * C26 skew subject): reports the total output rows, the blow-up
    * factor vs the input, and the top-5 contributing keys with their
    * output share — the keys salting/AQE-skew-split would target.
    *
    * Scale shape: one hash aggregate per side (map-side partials),
    * both keys-sized; the count-table join shuffles only keys; top-5
    * is TakeOrdered (bounded), totals are a 1-row aggregate broadcast
    * back. Nothing the size of the join output is ever materialized —
    * that is the point. */
  def joinSizeEstimate(s: SparkSession, dir: String): DataFrame = {
    // Counts and their squares ride DECIMAL(38,0): under non-ANSI
    // int64 a hot key past ~3e9 rows wraps cnt*cnt silently — and
    // explosive-join pre-flight is exactly the regime where counts
    // are extreme. Decimal is exact to 1e38; the final BIGINT cast
    // saturates visibly at Long.MaxValue instead of wrapping.
    val pk = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("cnt"))
      .select(col("l_partkey"), (col("cnt") * col("cnt")).as("contrib"))
    val tot = pk.agg(sum(col("contrib")).as("join_rows"),
      count(lit(1)).as("n_keys"))
    val top = pk.orderBy(col("contrib").desc, col("l_partkey").asc).limit(5)
    val maxL = lit(Long.MaxValue).cast("decimal(38,0)")
    def toLong(c: org.apache.spark.sql.Column) =
      when(c > maxL, lit(Long.MaxValue)).otherwise(c.cast("long"))
    top.crossJoin(broadcast(tot))
      .select(col("l_partkey").as("part_key"),
        toLong(col("contrib")).as("out_rows"),
        toLong(col("join_rows")).as("total_join_rows"), col("n_keys"),
        round(col("contrib").cast("double")
          / col("join_rows").cast("double"), 6).as("out_share"))
  }

  val joinSizeEstimateSql: String =
    """WITH pk AS (SELECT l_partkey, COUNT(*) * COUNT(*) AS contrib
      |  FROM lineitem GROUP BY l_partkey),
      |t AS (SELECT CAST(SUM(contrib) AS BIGINT) AS join_rows,
      |    COUNT(*) AS n_keys FROM pk),
      |top5 AS (SELECT * FROM pk ORDER BY contrib DESC, l_partkey ASC LIMIT 5)
      |SELECT l_partkey AS part_key, CAST(contrib AS BIGINT) AS out_rows,
      |  join_rows AS total_join_rows, CAST(n_keys AS BIGINT) AS n_keys,
      |  ROUND(CAST(contrib AS DOUBLE) / CAST(join_rows AS DOUBLE), 6)
      |    AS out_share
      |FROM top5, t""".stripMargin

  // ----------------------------------------------------------- C40
  /** Cost-based join-order probe (the third pre-flight beside C26's
    * skew profile and C37's cardinality estimate — the one an
    * optimizer actually runs): for a star fact with three filtered
    * dimension branches (part p_size<10, supplier s_acctbal>5000,
    * orders 1-URGENT), rank every left-deep dimension-join order by
    * the textbook uniform-containment cost model — after joining a
    * dim with selectivity σ the fact shrinks by σ, cost = Σ of
    * intermediate sizes — and report the model's estimates beside the
    * TRUE intermediate sizes, so the advisor's pick is auditable, not
    * just asserted. Most-selective-first wins; the model's rank order
    * must agree with the actual-cost rank order (the spec pins it).
    *
    * Scale shape: three keys-sized dim aggregates (one per branch)
    * give the selectivities; ALL SEVEN true intermediate sizes come
    * from ONE scan of the fact — three broadcast key-membership
    * probes attach boolean flags, then a single hash aggregate takes
    * the 2³−1 conditional counts (an actual intermediate size depends
    * only on WHICH dims are applied, not their order). The 6-row
    * permutation frame and the rank windows are constant-sized; no
    * join output is ever materialized — the probe costs three dim
    * scans plus one fact scan regardless of scale. */
  def joinOrderProbe(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
    def selOf(df: DataFrame, pred: Column, out: String) =
      df.agg((sum(when(pred, 1L).otherwise(0L)).cast("double") /
        count(lit(1)).cast("double")).as(out))
    val selP = selOf(Tables.part(s, dir), col("p_size") < 10, "sel_part")
    val selS = selOf(Tables.supplier(s, dir), col("s_acctbal") > 5000, "sel_supplier")
    val selO = selOf(Tables.orders(s, dir),
      col("o_orderpriority") === "1-URGENT", "sel_orders")
    // key-membership probes: UNHINTED equi-joins on the filtered key
    // sets — the planner broadcasts a key set that fits (the common
    // case: 8-byte keys after a selective filter) and falls back to a
    // shuffle join when a branch's surviving keys outgrow the
    // threshold, which a 100 TB orders branch would; a forced
    // broadcast() here would be a scale bug, not a hint
    val flags = li
      .join(Tables.part(s, dir).filter(col("p_size") < 10)
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"), "left")
      .join(Tables.supplier(s, dir).filter(col("s_acctbal") > 5000)
        .select(col("s_suppkey")), col("l_suppkey") === col("s_suppkey"), "left")
      .join(Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left")
      .select(col("p_partkey").isNotNull.as("fp"),
        col("s_suppkey").isNotNull.as("fs"),
        col("o_orderkey").isNotNull.as("fo"))
    def cnt(c: Column, out: String) =
      sum(when(c, 1L).otherwise(0L)).as(out)
    val acts = flags.agg(count(lit(1)).as("n_l"),
      cnt(col("fp"), "a_p"), cnt(col("fs"), "a_s"), cnt(col("fo"), "a_o"),
      cnt(col("fp") && col("fs"), "a_ps"),
      cnt(col("fp") && col("fo"), "a_po"),
      cnt(col("fs") && col("fo"), "a_so"),
      cnt(col("fp") && col("fs") && col("fo"), "a_pso"))
    val perms = s.createDataFrame(Seq(
      ("part,supplier,orders", "part", "supplier", "orders"),
      ("part,orders,supplier", "part", "orders", "supplier"),
      ("supplier,part,orders", "supplier", "part", "orders"),
      ("supplier,orders,part", "supplier", "orders", "part"),
      ("orders,part,supplier", "orders", "part", "supplier"),
      ("orders,supplier,part", "orders", "supplier", "part")))
      .toDF("perm", "d1", "d2", "d3")
    def sel(d: Column) = when(d === "part", col("sel_part"))
      .when(d === "supplier", col("sel_supplier")).otherwise(col("sel_orders"))
    def act1(d: Column) = when(d === "part", col("a_p"))
      .when(d === "supplier", col("a_s")).otherwise(col("a_o"))
    // the pair after step 2 is identified by the dim NOT yet joined
    def act2(d3: Column) = when(d3 === "orders", col("a_ps"))
      .when(d3 === "supplier", col("a_po")).otherwise(col("a_so"))
    val est1 = col("n_l").cast("double") * sel(col("d1"))
    val est2 = est1 * sel(col("d2"))
    val est3 = est2 * sel(col("d3"))
    // constant 6-row frame: the unpartitioned rank windows are bounded
    // by the permutation count, never by data (the q_chi2 discipline)
    val byEst = Window.orderBy(
      (est1 + est2 + est3).asc_nulls_last, col("perm").asc)
    val byAct = Window.orderBy(
      (col("a_1") + col("a_2") + col("a_pso")).asc_nulls_last, col("perm").asc)
    perms.crossJoin(broadcast(selP)).crossJoin(broadcast(selS))
      .crossJoin(broadcast(selO)).crossJoin(broadcast(acts))
      .withColumn("a_1", act1(col("d1")))
      .withColumn("a_2", act2(col("d3")))
      .withColumn("rank_est", row_number().over(byEst))
      .withColumn("rank_act", row_number().over(byAct))
      .select(col("perm"), col("rank_est"), col("rank_act"),
        round(est1 + est2 + est3, 6).as("est_cost"),
        (col("a_1") + col("a_2") + col("a_pso")).as("act_cost"),
        round(est3, 6).as("est_final"), col("a_pso").as("act_final"))
      .orderBy(col("rank_est"))
  }

  val joinOrderProbeSql: String =
    """WITH dp AS (SELECT CAST(COUNT(*) FILTER (WHERE p_size < 10) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS sel_part FROM part),
      |ds AS (SELECT CAST(COUNT(*) FILTER (WHERE s_acctbal > 5000) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS sel_supplier FROM supplier),
      |dd AS (SELECT CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')
      |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS sel_orders FROM orders),
      |fl AS (SELECT
      |    l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 10) AS fp,
      |    l_suppkey IN (SELECT s_suppkey FROM supplier
      |      WHERE s_acctbal > 5000) AS fs,
      |    l_orderkey IN (SELECT o_orderkey FROM orders
      |      WHERE o_orderpriority = '1-URGENT') AS fo
      |  FROM lineitem),
      |acts AS (SELECT COUNT(*) AS n_l,
      |    COUNT(*) FILTER (WHERE fp) AS a_p,
      |    COUNT(*) FILTER (WHERE fs) AS a_s,
      |    COUNT(*) FILTER (WHERE fo) AS a_o,
      |    COUNT(*) FILTER (WHERE fp AND fs) AS a_ps,
      |    COUNT(*) FILTER (WHERE fp AND fo) AS a_po,
      |    COUNT(*) FILTER (WHERE fs AND fo) AS a_so,
      |    COUNT(*) FILTER (WHERE fp AND fs AND fo) AS a_pso
      |  FROM fl),
      |perms(perm, d1, d2, d3) AS (VALUES
      |  ('part,supplier,orders', 'part', 'supplier', 'orders'),
      |  ('part,orders,supplier', 'part', 'orders', 'supplier'),
      |  ('supplier,part,orders', 'supplier', 'part', 'orders'),
      |  ('supplier,orders,part', 'supplier', 'orders', 'part'),
      |  ('orders,part,supplier', 'orders', 'part', 'supplier'),
      |  ('orders,supplier,part', 'orders', 'supplier', 'part')),
      |calc AS (SELECT perm,
      |    CAST(n_l AS DOUBLE) * (CASE d1 WHEN 'part' THEN sel_part
      |      WHEN 'supplier' THEN sel_supplier ELSE sel_orders END) AS est1,
      |    CAST(n_l AS DOUBLE) * (CASE d1 WHEN 'part' THEN sel_part
      |      WHEN 'supplier' THEN sel_supplier ELSE sel_orders END)
      |      * (CASE d2 WHEN 'part' THEN sel_part
      |      WHEN 'supplier' THEN sel_supplier ELSE sel_orders END) AS est2,
      |    CAST(n_l AS DOUBLE) * (CASE d1 WHEN 'part' THEN sel_part
      |      WHEN 'supplier' THEN sel_supplier ELSE sel_orders END)
      |      * (CASE d2 WHEN 'part' THEN sel_part
      |      WHEN 'supplier' THEN sel_supplier ELSE sel_orders END)
      |      * (CASE d3 WHEN 'part' THEN sel_part
      |      WHEN 'supplier' THEN sel_supplier ELSE sel_orders END) AS est3,
      |    (CASE d1 WHEN 'part' THEN a_p WHEN 'supplier' THEN a_s
      |      ELSE a_o END) AS a_1,
      |    (CASE d3 WHEN 'orders' THEN a_ps WHEN 'supplier' THEN a_po
      |      ELSE a_so END) AS a_2,
      |    a_pso
      |  FROM perms, dp, ds, dd, acts)
      |SELECT perm,
      |  CAST(ROW_NUMBER() OVER (ORDER BY est1 + est2 + est3 ASC NULLS LAST,
      |    perm ASC) AS INTEGER) AS rank_est,
      |  CAST(ROW_NUMBER() OVER (ORDER BY a_1 + a_2 + a_pso ASC NULLS LAST,
      |    perm ASC) AS INTEGER) AS rank_act,
      |  ROUND(est1 + est2 + est3, 6) AS est_cost,
      |  CAST(a_1 + a_2 + a_pso AS BIGINT) AS act_cost,
      |  ROUND(est3, 6) AS est_final,
      |  CAST(a_pso AS BIGINT) AS act_final
      |FROM calc ORDER BY rank_est""".stripMargin
}
