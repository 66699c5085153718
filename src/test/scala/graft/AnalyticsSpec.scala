package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, CorpusAnalytics, DataQuality, SemiStructured}

/** Specs for the D44-D48 / A9-A10 / E30-E33 additions. The driver's
  * DuckDB compare is the primary gate; these pin the internal
  * invariants that the oracle can't see (plan shape, determinism,
  * mathematical identities). */
class AnalyticsSpec extends SparkSpec {

  test("statsAgg: correlations are in [-1,1] and match Spark's corr() to 1e-6") {
    val rows = Analytics.statsAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    val builtin = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val c = r.getAs[Any]("corr_qty_price") match {
        case d: java.lang.Double => d.doubleValue()
        case b: java.math.BigDecimal => b.doubleValue()
      }
      assert(c >= -1.0 && c <= 1.0)
      assert(math.abs(c - builtin(r.getString(0))) < 1e-6)
    }
  }

  test("timeRangeFrame: trailing window includes the current row and only 1h back") {
    val df = Analytics.timeRangeFrame(spark, sf)
    val one = df.filter(col("user_id") === 1).orderBy(col("ts_us")).collect()
    assert(one.nonEmpty)
    // brute-force recompute for one user
    val evs = one.map(r => (r.getLong(2), r.getDouble(3)))
    val vals = Tables.events(spark, sf).filter(col("user_id") === 1)
      .select(unix_micros(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    evs.foreach { case (ts, got) =>
      val want = vals.filter { case (t, _) => t <= ts && t >= ts - 3600L * 1000000L }
        .map(_._2).map(BigDecimal(_)).sum
      assert(math.abs(got - want.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"ts=$ts got=$got want=$want")
    }
  }

  test("modeAgg: deterministic argmax — recomputable from the value counts") {
    Analytics.modeAgg(spark, sf).collect().foreach { r =>
      val flag = r.getString(0)
      val counts = Tables.lineitem(spark, sf).filter(col("l_returnflag") === flag)
        .groupBy(col("l_quantity")).count().collect()
        .map(x => (x.getDouble(0), x.getLong(1)))
      val best = counts.minBy { case (q, n) => (-n, q) }
      assert(r.getLong(1) == best._2 && r.getDouble(2) == best._1)
    }
  }

  test("arrayHof: sum_len + (n_tokens - 1) spaces reconstructs n_chars") {
    val joined = Analytics.arrayHof(spark, sf)
      .join(Tables.documents(spark, sf), "doc_id")
      .filter(col("sum_len") + col("n_tokens") - 1 =!= col("n_chars"))
    assert(joined.count() == 0)
  }

  test("xmlRoundtrip preserves counts vs the parquet source") {
    val r = SemiStructured.xmlRoundtrip(spark, sf).collect().head
    val want = Tables.events(spark, sf).filter(col("event_type") =!= "error").count()
    assert(r.getLong(0) == want)
  }

  test("variantExtract agrees with string-side JSON parsing") {
    val v = SemiStructured.variantExtract(spark, sf)
      .select("event_type", "n", "sum_k").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val j = Tables.events(spark, sf)
      .withColumn("k", expr("from_json(props, 'k BIGINT').k"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"), sum(col("k")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v == j)
  }

  test("bm25: every scored doc contains at least one query term; scores positive") {
    val scored = CorpusAnalytics.bm25Score(spark, sf)
    assert(scored.filter(col("bm25") <= 0.0).count() == 0)
    val hits = Tables.documents(spark, sf)
      .filter(col("text").rlike("(^| )(table|sort|merge|hash|spark)( |$)")).count()
    assert(scored.count() == hits)
  }

  test("matryoshka: energy ratio in (0,1], c0 is a unit-vector component") {
    val rows = CorpusAnalytics.matryoshka(spark, sf).collect()
    assert(rows.length == Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val er = r.getDouble(1); val c0 = r.getDouble(2)
      assert(er > 0.0 && er <= 1.0 + 1e-9)
      assert(c0 >= -1.0 - 1e-9 && c0 <= 1.0 + 1e-9)
    }
  }

  test("reservoirSample: exactly min(k, |stratum|) per lang, no Window in the plan") {
    val k = 3
    val got = CorpusAnalytics.reservoirSample(spark, sf, k)
    val sizes = Tables.documents(spark, sf).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val per = got.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (l, n) => assert(per(l) == math.min(k.toLong, n)) }
    // a second run returns the identical sample (deterministic hash rank)
    assert(got.except(CorpusAnalytics.reservoirSample(spark, sf, k)).count() == 0)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sort leaked into plan:\n$plan")
  }

  test("binnedRangeJoin: matches the direct non-equi join, no nested-loop in plan") {
    val binned = Analytics.binnedRangeJoin(spark, sf)
    val iv = Tables.orders(spark, sf).select(col("o_orderkey"),
      (col("o_totalprice") / 1000.0).as("lo"),
      ((col("o_totalprice") / 1000.0) + 0.5).as("hi"))
    val direct = Tables.events(spark, sf).select(col("event_id"), col("value"))
      .join(iv, col("value") >= col("lo") && col("value") < col("hi"))
      .agg(count(lit(1)), countDistinct(col("o_orderkey")),
        countDistinct(col("event_id"))).collect().head
    val got = binned.collect().head
    assert(got.getLong(0) == direct.getLong(0))
    assert(got.getLong(1) == direct.getLong(1))
    assert(got.getLong(2) == direct.getLong(2))
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"bin join fell back to NL:\n$plan")
  }

  test("tableProfile: ndv and top frequency match direct per-column queries") {
    val prof = Analytics.tableProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("l_returnflag", "l_linestatus", "l_linenumber"))
    val li = Tables.lineitem(spark, sf)
    Seq("l_returnflag", "l_linestatus", "l_linenumber").foreach { c =>
      val ndv = li.select(col(c)).filter(col(c).isNotNull).distinct().count()
      assert(prof(c).getLong(1) == ndv, s"ndv($c)")
      val top = li.groupBy(col(c).cast("string").as("v")).count()
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .minBy { case (v, n) => (-n, v) }
      assert((prof(c).getString(3), prof(c).getLong(4)) == top, s"top($c)")
    }
  }

  test("semDeDup drops every planted exact duplicate, keeps every base row") {
    val kept = operators.CorpusAnalytics.semDedup(spark, sf)
    val nBase = Tables.embeddings(spark, sf).count()
    assert(kept.filter(col("vec_id") < 10000L).count() == nBase)
    assert(kept.filter(col("vec_id") >= 10000L).count() == 0)
    // candidate pairs are generated per cell — an equi-join, never a
    // cartesian of the corpus with itself
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan)
  }

  test("corpusMix: token shares sum to 1") {
    val total = CorpusAnalytics.corpusMix(spark, sf)
      .agg(sum(col("token_share"))).collect().head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-3)
  }

  test("quantilesInterp equals Spark's exact percentile (same R-7 interpolation)") {
    val ours = Analytics.quantilesInterp(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val builtin = Tables.lineitem(spark, sf)
      .groupBy(col("l_linestatus"))
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))").as("qs"))
      .collect().flatMap { r =>
        r.getSeq[Double](1).zip(Seq(0.25, 0.5, 0.75, 0.95)).map {
          case (v, p) => (r.getString(0), p) -> v
        }
      }.toMap
    assert(ours.keySet == builtin.keySet)
    ours.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 1e-4, s"$k: $v vs ${builtin(k)}")
    }
    // the distributed plan (r19, binnedRankInterp): a histogram hash
    // aggregate + crossing-bin resolve — NO data-sized sort or range
    // exchange anywhere, and the resolve scan's value-range predicate
    // reaches the parquet reader
    val plan = Analytics.quantilesInterp(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("GlobalRank"), plan)
    assert(!plan.toLowerCase.contains("rangepartitioning"), plan)
    assert(plan.contains("HashAggregate"), plan)
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_extendedprice"
      .r.findAllIn(plan).hasNext, plan)
    assert(!plan.contains("row_number"), plan)
  }

  test("sourceInterleave: collision-free positions, one residue class per source") {
    val rows = CorpusAnalytics.sourceInterleave(spark, sf).collect()
    val nSources = rows.map(_.getString(1)).distinct.length.toLong
    // collision-free
    val positions = rows.map(_.getAs[Long]("position"))
    assert(positions.distinct.length == rows.length)
    // the spread-by-construction property: each source owns exactly one
    // residue class mod n_sources, so no n_sources-wide window ever
    // holds two docs of one source
    val residues = rows.groupBy(_.getString(1))
      .map { case (src, rs) => src -> rs.map(_.getAs[Long]("position") % nSources).distinct }
    residues.foreach { case (src, cls) =>
      assert(cls.length == 1, s"source $src spans residues $cls")
    }
    assert(residues.values.map(_.head).toSeq.distinct.length == nSources)
  }

  test("excludeFrame: matches a brute-force per-row frame scan, empty frames are NULL") {
    val got = Analytics.excludeFrame(spark, sf).collect()
      .map(r => r.getLong(0) -> (Option(r.getAs[java.lang.Double]("ex_cur")),
        Option(r.getAs[java.lang.Double]("ex_grp")),
        r.getAs[Double]("ex_ties"))).toMap
    val raw = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01")).as("day_n"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val byCust = raw.groupBy(_._2)
    assert(got.size == raw.length)
    raw.foreach { case (ok, ck, day, p) =>
      // brute-force: the RANGE frame is every order of this customer
      // in [day-30, day]; peers share the exact day
      val frame = byCust(ck).filter(t => t._3 >= day - 30 && t._3 <= day)
      val peers = frame.filter(_._3 == day)
      val fSum = BigDecimal(frame.map(t => BigDecimal(t._4)).sum.toString)
      val gSum = peers.map(t => BigDecimal(t._4)).sum
      val (exCur, exGrp, exTies) = got(ok)
      if (frame.length > 1)
        assert(math.abs(exCur.get - (fSum - BigDecimal(p)).toDouble) < 1e-6)
      else assert(exCur.isEmpty, s"order $ok: lone-row frame must give NULL ex_cur")
      if (frame.length > peers.length)
        assert(math.abs(exGrp.get - (fSum - gSum).toDouble) < 1e-6)
      else assert(exGrp.isEmpty, s"order $ok: all-peer frame must give NULL ex_grp")
      assert(math.abs(exTies - (fSum - gSum + BigDecimal(p)).toDouble) < 1e-6)
    }
    // the planted structure must actually exercise all three branches
    assert(got.values.exists(_._1.isEmpty) && got.values.exists(_._1.isDefined))
    assert(got.values.exists(_._2.isEmpty) && got.values.exists(_._2.isDefined))
  }

  test("groupsExclude: matches a brute-force GROUPS-frame scan with EXCLUDE algebra") {
    val got = Analytics.groupsExclude(spark, sf).collect()
      .map(r => r.getLong(0) -> (Option(r.getAs[java.lang.Double]("ex_cur")),
        Option(r.getAs[java.lang.Double]("ex_grp")),
        r.getAs[Double]("ex_ties"))).toMap
    val raw = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01")).as("day_n"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val byCust = raw.groupBy(_._2)
    assert(got.size == raw.length)
    raw.foreach { case (ok, ck, day, p) =>
      // brute-force GROUPS frame: the current day's peer group plus
      // the 2 PRECEDING distinct-day groups of this customer
      val days = byCust(ck).map(_._3).distinct.sorted
      val di = days.indexOf(day)
      val frameDays = days.slice(math.max(0, di - 2), di + 1).toSet
      val frame = byCust(ck).filter(t => frameDays(t._3))
      val peers = frame.filter(_._3 == day)
      val fSum = frame.map(t => BigDecimal(t._4)).sum
      val gSum = peers.map(t => BigDecimal(t._4)).sum
      val (exCur, exGrp, exTies) = got(ok)
      if (frame.length > 1)
        assert(math.abs(exCur.get - (fSum - BigDecimal(p)).toDouble) < 1e-6)
      else assert(exCur.isEmpty, s"order $ok: lone-row frame must give NULL ex_cur")
      if (frame.length > peers.length)
        assert(math.abs(exGrp.get - (fSum - gSum).toDouble) < 1e-6)
      else assert(exGrp.isEmpty, s"order $ok: all-peer frame must give NULL ex_grp")
      assert(math.abs(exTies - (fSum - gSum + BigDecimal(p)).toDouble) < 1e-6)
    }
    assert(got.values.exists(_._1.isDefined))
    assert(got.values.exists(_._2.isEmpty) && got.values.exists(_._2.isDefined))
  }

  test("regressionAgg: slope/intercept match Spark's regr_* builtins to 1e-6") {
    val got = Analytics.regressionAgg(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val builtin = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(regr_slope(col("l_extendedprice"), col("l_quantity")).as("s"),
        regr_intercept(col("l_extendedprice"), col("l_quantity")).as("i"),
        regr_r2(col("l_extendedprice"), col("l_quantity")).as("r"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.nonEmpty && got.keySet == builtin.keySet)
    got.foreach { case (k, (s, i, r2)) =>
      val (bs, bi, br) = builtin(k)
      assert(math.abs(s - bs) < 1e-6, s"slope $k: $s vs $bs")
      assert(math.abs(i - bi) < 1e-6, s"intercept $k: $i vs $bi")
      assert(math.abs(r2 - br) < 1e-6, s"r2 $k: $r2 vs $br")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("madAgg: median and MAD are values from the data; MAD <= max deviation") {
    val rows = Analytics.madAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ls = r.getString(0); val med = r.getDouble(1); val mad = r.getDouble(2)
      val vals = Tables.lineitem(spark, sf).filter(col("l_linestatus") === ls)
        .select(col("l_quantity")).collect().map(_.getDouble(0)).sorted
      // the rank-selected median is the value at ceil(n/2)
      assert(med == vals((math.ceil(vals.length * 0.5) - 1).toInt), s"$ls median")
      val devs = vals.map(v => math.abs(v - med)).sorted
      assert(mad == devs((math.ceil(devs.length * 0.5) - 1).toInt), s"$ls mad")
    }
  }

  test("frequencyQuantile == exactQuantiles on bounded-cardinality data; guard fires past it") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map(i =>
      (s"g${i % 3}", rnd.nextInt(40).toDouble)).toDF("g", "v")
    for (p <- Seq(0.25, 0.5, 0.9)) {
      val freq = Analytics.frequencyQuantile(df, Seq("g"), "v", p)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val rank = graft.operators.Relational
        .exactQuantiles(df, Seq("g"), "v", Seq(p), nParts = 4)
        .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
      assert(freq == rank, s"p=$p: $freq vs $rank")
    }
    // past the distinct-values guard: fail fast, not degrade
    val wide = (1 to 300).map(i => ("g", i.toDouble)).toDF("g", "v")
    val err = intercept[Exception] {
      Analytics.frequencyQuantile(wide, Seq("g"), "v", 0.5, maxDistinct = 100L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("distinct values")), msgs(err).mkString(";"))
  }

  test("cdcDiff: every change class appears and classifications are consistent") {
    val rows = graft.operators.Scd2.cdcDiff(spark, sf).collect()
    val byType = rows.groupBy(_.getString(1))
    assert(byType.keySet == Set("I", "U", "D"), byType.keySet)
    byType("D").foreach { r => assert(!r.isNullAt(2) && r.isNullAt(3)) }
    byType("I").foreach { r => assert(r.isNullAt(2) && !r.isNullAt(3)) }
    byType("U").foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3) && r.getDouble(2) != r.getDouble(3))
    }
    // planted cardinalities: deletes are the %97 keys, inserts the %101 keys
    val keys = Tables.customer(spark, sf).select(col("c_custkey"))
      .collect().map(_.getLong(0))
    assert(byType("D").length == keys.count(_ % 97 == 0))
    assert(byType("I").length == keys.count(_ % 101 == 0))
  }

  test("mixtureTemperature: rates in (0,1]; head source is down-weighted hardest") {
    val rows = CorpusAnalytics.mixtureTemperature(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, rate, nKept) =>
      assert(rate > 0.0 && rate <= 1.0); assert(nKept > 0)
    }
    val bySize = Tables.documents(spark, sf).groupBy(col("source"))
      .agg(sum(col("n_chars")).as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val biggest = bySize.maxBy(_._2)._1
    val smallest = bySize.minBy(_._2)._1
    val rateOf = rows.map(t => t._1 -> t._2).toMap
    // temperature flattening: the biggest source keeps the smallest rate
    assert(rateOf(biggest) <= rateOf(smallest),
      s"$biggest=${rateOf(biggest)} vs $smallest=${rateOf(smallest)}")
  }

  test("tokenBudget: kept chars stay within budget and selection is quality-prefix") {
    val kept = CorpusAnalytics.tokenBudget(spark, sf).collect()
    val total = Tables.documents(spark, sf).agg(sum(col("n_chars"))).collect()(0).getLong(0)
    val budget = total / 2
    val charsKept = kept.map(_.getLong(2)).sum
    assert(charsKept <= budget, s"$charsKept > $budget")
    // the selection is a PREFIX of the quality order: adding the single
    // next-best document must overflow the budget
    val scored = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"),
        graft.operators.TextAnalysis.qualityScore(col("text")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .select(col("n_chars")).collect().map(_.getLong(0))
    var cum = 0L; var i = 0
    while (i < scored.length && cum + scored(i) <= budget) { cum += scored(i); i += 1 }
    assert(charsKept == cum, s"prefix sum $cum vs kept $charsKept")
  }

  test("intervalMerge: islands are disjoint per user and cover every event") {
    val islands = Analytics.intervalMerge(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))
    assert(islands.nonEmpty)
    val nEvents = Tables.events(spark, sf).count()
    assert(islands.map(_._4).sum == nEvents) // every event lands in exactly one island
    islands.groupBy(_._1).foreach { case (_, is) =>
      val sorted = is.sortBy(_._2.getTime)
      sorted.foreach { case (_, s, e, _) => assert(!e.before(s)) }
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2.after(e1), s"islands overlap: next start $s2 <= prev end $e1")
        case _ =>
      }
    }
  }

  test("weightedMedian: cumulative-weight invariant holds per group") {
    val rows = Analytics.weightedMedian(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity").cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.foreach { case (flag, med, tot) =>
      val grp = li.filter(_._1 == flag)
      assert(grp.map(_._3).sum == tot)
      val below = grp.filter(_._2 < med).map(_._3).sum   // weight strictly below
      val atOrBelow = grp.filter(_._2 <= med).map(_._3).sum
      assert(below * 2 < tot, s"$flag: too much weight below $med")
      assert(atOrBelow * 2 >= tot, s"$flag: $med does not reach half the weight")
    }
  }

  test("debounce: runs reconstruct the event sequence exactly") {
    val runs = Analytics.debounce(spark, sf)
      .orderBy(col("user_id"), col("run")).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(4)))
    val events = Tables.events(spark, sf)
      .orderBy(col("user_id"), col("ts"), col("event_id"))
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // expanding each run back to run_len events reproduces the sequence
    val expanded = runs.flatMap { case (u, t, len) => Seq.fill(len.toInt)((u, t)) }
    assert(expanded.toSeq == events.toSeq)
    // no two adjacent runs for a user share a type (maximal runs)
    runs.toSeq.sliding(2).foreach {
      case Seq((u1, t1, _), (u2, t2, _)) if u1 == u2 => assert(t1 != t2)
      case _ =>
    }
  }

  test("nullSafeJoin: the NULL key group survives the join") {
    val rows = Analytics.nullSafeJoin(spark, sf).collect()
    assert(rows.length == 5) // 4 named priorities + the NULL group
    val nullRow = rows.filter(_.isNullAt(0))
    assert(nullRow.length == 1, "null-safe join must match NULL with NULL")
    val urgentF = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT").count()
    assert(nullRow(0).getLong(1) == urgentF)
  }

  test("hybridSearch: query doc retrieves itself; fused ranks are valid") {
    val rows = CorpusAnalytics.hybridSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 10)
      val sorted = rs.sortBy(_._4)
      // rrf non-increasing in rank
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3)
        case _ =>
      }
      // the query document itself tops both arms -> must be in its own top-10
      assert(rs.exists(_._2 == q), s"query $q missing from its own results")
    }
  }

  test("ngramPmi: min-count respected and PMI matches a direct recount") {
    val rows = CorpusAnalytics.ngramPmi(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    assert(rows.nonEmpty)
    rows.foreach { case (_, (c, _)) => assert(c >= 10) }
    // recount one bigram by hand
    val ((w1, w2), (cxy, pmi)) = rows.maxBy(_._2._2)
    val toks = Tables.documents(spark, sf).select(col("text")).collect()
      .map(_.getString(0).toLowerCase.split(" ", -1).toSeq)
    val n1 = toks.map(_.length).sum.toDouble
    val n2 = toks.map(t => math.max(0, t.length - 1)).sum.toDouble
    val cx = toks.map(_.count(_ == w1)).sum.toDouble
    val cy = toks.map(_.count(_ == w2)).sum.toDouble
    val cxy2 = toks.map(_.sliding(2).count(p => p.length == 2 && p(0) == w1 && p(1) == w2)).sum
    assert(cxy2.toLong == cxy)
    val want = math.log(cxy * n1 * n1 / (n2 * cx * cy))
    assert(math.abs(pmi - want) < 1e-5, s"$pmi vs $want")
  }

  test("benfordAudit: digits 1-9, shares sum to 1, chi2 terms non-negative") {
    val rows = DataQuality.benfordAudit(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSet.subsetOf((1 to 9).toSet))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4) // Benford shares total 1
    rows.foreach { r => assert(r._5 >= 0.0) }
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum == total)
  }

  test("skewReport: histogram accounts for every row and key exactly") {
    val rows = DataQuality.skewReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val li = Tables.lineitem(spark, sf)
    assert(rows.map(_._3).sum == li.count())
    assert(rows.map(_._2).sum == li.select(col("l_partkey")).distinct().count())
    rows.foreach { case (cnt, nKeys, nRows, share) =>
      assert(cnt * nKeys == nRows); assert(share > 0.0 && share <= 1.0)
    }
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3)
  }

  test("volumeAnomaly: first 7 days have no baseline; z matches a recount") {
    val rows = DataQuality.volumeAnomaly(spark, sf)
      .orderBy(col("day")).collect()
    assert(rows.length >= 8, "need more than a week of days")
    rows.take(7).foreach { r => assert(r.isNullAt(2), s"day ${r.get(0)} has a premature baseline") }
    val counts = rows.map(_.getLong(1))
    rows.zipWithIndex.drop(7).foreach { case (r, i) =>
      val prior = counts.slice(i - 7, i).map(_.toDouble)
      val mean = prior.sum / 7.0
      val varr = prior.map(x => (x - mean) * (x - mean)).sum / 6.0
      if (!r.isNullAt(4)) {
        val z = (counts(i) - mean) / math.sqrt(varr)
        assert(math.abs(r.getDouble(4) - z) < 1e-4, s"day $i: ${r.getDouble(4)} vs $z")
      }
    }
  }

  test("pivotMulti: pivoted cells equal the filtered aggregates") {
    val rows = graft.operators.Relational.pivotMulti(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
    rows.foreach { r =>
      val flag = r.getString(0)
      val fCnt = li.filter(col("l_returnflag") === flag && col("l_linestatus") === "F").count()
      val oCnt = li.filter(col("l_returnflag") === flag && col("l_linestatus") === "O").count()
      assert(r.getLong(2) == fCnt && r.getLong(4) == oCnt)
      val fQty = li.filter(col("l_returnflag") === flag && col("l_linestatus") === "F")
        .agg(sum(col("l_quantity"))).collect()(0).getDouble(0)
      assert(math.abs(r.getDouble(1) - fQty) < 1e-6)
    }
  }

  test("heapsFit: vocab curve is monotone, concave-ish, and ends at the full vocab") {
    val rows = CorpusAnalytics.heapsFit(spark, sf)
      .orderBy(col("j")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    // monotone in both tokens and vocab
    rows.sliding(2).foreach {
      case Array((_, n1, v1), (_, n2, v2)) => assert(n2 >= n1 && v2 >= v1)
      case _ =>
    }
    val totalTokens = Tables.documents(spark, sf)
      .select(size(split(lower(col("text")), " ")).cast("long").as("l"))
      .agg(sum(col("l"))).collect()(0).getLong(0)
    assert(rows.last._2 == totalTokens)
    val fullVocab = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .distinct().count()
    assert(rows.last._3 == fullVocab, "checkpoint 10 must see the whole vocabulary")
    // sublinear growth: second half of the corpus adds fewer NEW terms
    val firstHalf = rows(4)._3
    assert(fullVocab - firstHalf < firstHalf,
      s"vocab growth not sublinear: $firstHalf then ${fullVocab - firstHalf}")
  }

  test("embeddingClusterStats: cohesion beats separation for a labeled space") {
    val rows = CorpusAnalytics.embeddingClusterStats(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val totalVecs = Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum == totalVecs)
    rows.foreach { case (label, n, coh, sep) =>
      assert(n > 0)
      assert(coh >= -1.0 - 1e-9 && coh <= 1.0 + 1e-9, s"label $label cohesion $coh")
      assert(sep >= -1.0 - 1e-9 && sep <= 1.0 + 1e-9, s"label $label separation $sep")
    }
  }

  test("crossSourceDup: containment bounded, directional, hash path matches literal grams") {
    val rows = CorpusAnalytics.crossSourceDup(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    rows.foreach { case ((a, b), (ov, c)) =>
      assert(a != b); assert(ov > 0); assert(c > 0.0 && c <= 1.0)
    }
    // directional: |A∩B| identical both ways, denominators differ
    val m = rows.toMap
    m.keys.foreach { case (a, b) =>
      assert(m.contains((b, a)), "overlap is symmetric in membership")
      assert(m((a, b))._1 == m((b, a))._1, "intersection size must be symmetric")
    }
    // recount one pair with literal grams (no hashing)
    val ((sa, sb), (ov, _)) = rows.head
    def gramsOf(src: String) = Tables.documents(spark, sf)
      .filter(col("source") === src)
      .select(explode(expr(
        """CASE WHEN size(split(lower(text), ' ')) >= 5
          |  THEN transform(sequence(0, size(split(lower(text), ' ')) - 5),
          |    i -> concat_ws(' ', slice(split(lower(text), ' '), i + 1, 5)))
          |  ELSE array() END""".stripMargin)).as("g"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(gramsOf(sa).intersect(gramsOf(sb)).size.toLong == ov)
  }

  test("rollingMedian: med7 is the lower median of the trailing frame") {
    val rows = Analytics.rollingMedian(spark, sf)
      .orderBy(col("user_id"), col("ts"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getDouble(4)))
    val vals = Tables.events(spark, sf)
      .orderBy(col("user_id"), col("ts"), col("event_id"))
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    vals.indices.foreach { idx =>
      val (u, _) = vals(idx)
      val firstOfUser = vals.indexWhere(_._1 == u)
      val frame = (math.max(firstOfUser, idx - 6) to idx).map(vals(_)._2).sorted
      val (ru, rn, rm) = rows(idx)
      assert(ru == u && rn == frame.length)
      assert(rm == frame((frame.length + 1) / 2 - 1), s"row $idx: $rm vs frame $frame")
    }
  }

  test("asofNearest: chosen gap is the min of the two directions") {
    val rows = Analytics.asofNearest(spark, sf).collect()
    assert(rows.nonEmpty)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    rows.foreach { r =>
      val p = fmt.parse(r.getString(1)).getTime
      val cb = Option(r.getString(2)).map(fmt.parse(_).getTime)
      val cf = Option(r.getString(3)).map(fmt.parse(_).getTime)
      (cb, cf) match {
        case (None, None) => assert(r.isNullAt(4) && r.isNullAt(5))
        case _ =>
          val gb = cb.map(p - _); val gf = cf.map(_ - p)
          gb.foreach(g => assert(g >= 0)); gf.foreach(g => assert(g >= 0))
          // formatted strings are second-truncated while the operator
          // decides on microseconds — only assert away from the tie zone
          if (gf.isEmpty || gb.isEmpty || math.abs(gb.get - gf.get) > 2000) {
            val wantDir =
              if (gf.isEmpty || (gb.nonEmpty && gb.get <= gf.get)) "backward" else "forward"
            assert(r.getString(4) == wantDir, s"$r")
            val wantGapMs = if (wantDir == "backward") gb.get else gf.get
            assert(math.abs(r.getLong(5) / 1000L - wantGapMs) <= 1000)
          }
      }
    }
  }

  test("labelNoiseAudit: cells partition the corpus; shares sum to 1 per label") {
    val rows = graft.operators.TrainingQueries.labelNoiseAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._3).sum == Tables.documents(spark, sf).count())
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      assert(math.abs(cells.map(_._4).sum - 1.0) < 1e-4, s"$lang shares don't sum to 1")
    }
    // some diagonal mass must exist (a zero-agreement matrix means the
    // prediction column is broken, not that labels are noisy) and every
    // declared label must be audited
    val agree = rows.filter(r => r._1 == r._2).map(_._3).sum
    assert(agree > 0, "no label ever agrees - prediction column broken")
    val declared = Tables.documents(spark, sf).select(col("lang"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_._1).toSet == declared)
  }

  test("docPagerank: total rank is conserved and every rank >= 0.15") {
    val rows = CorpusAnalytics.docPagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty, "the shared-shingle graph must not be empty")
    rows.foreach { case (_, deg, pr) => assert(deg >= 1); assert(pr >= 0.15 - 1e-9) }
    // with every node having out-edges the damped walk conserves mass:
    // sum r_{t+1} = 0.15*N + 0.85*sum r_t, and sum r_0 = N -> sum r_t = N
    val n = rows.length.toDouble
    val total = rows.map(_._3).sum
    assert(math.abs(total - n) < 1e-3 * n, s"rank mass $total drifted from $n")
  }

  test("sourceKl: KL >= 0 up to rounding and components cover the vocab") {
    val rows = CorpusAnalytics.sourceKl(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // Gibbs' inequality holds exactly only over a COMMON support; the
      // per-source restriction can push slightly negative, but a large
      // negative KL means broken math
      assert(r.getDouble(2) > -0.2, r.toString)
      assert(r.getLong(1) > 0)
    }
  }
}
