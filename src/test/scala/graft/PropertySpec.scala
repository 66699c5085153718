package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.EventStream

/** Property-based equivalence checks: the engine's distributed
  * formulations must agree with their single-node/declarative oracles
  * on RANDOM inputs, not just the fixtures — rank lifting, bounded
  * top-k pruning, and the two-phase skew join are all plan
  * optimizations whose contract is "identical result". Inputs come
  * from seeded ScalaCheck generators, so every run replays the same
  * cases (no flaky CI) while still covering shapes no fixture does. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** n reproducible samples of g (seeds 1..n — deterministic). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(0xCAFEL + i)))

  private val smallData: Gen[List[(String, Double)]] = for {
    n <- Gen.choose(1, 300)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(-1000, 1000).map(_ / 4.0)
    } yield (g, v))
  } yield rows

  test("globalRank value-at-rank equals the row_number window on random data") {
    samples(smallData, 8).foreach { rows =>
      val df = rows.toDF("g", "v")
      // distributed rank (tiny nParts to force offset lifting)
      val got = operators.Relational.globalRank(df, Seq("g"), Seq("v"), nParts = 5)
        .select(col("g"), col("v"), col("rn"), col("n"))
        .as[(String, Double, Long, Long)].collect()
      // oracle: single window; ties make rn of EQUAL values
      // interchangeable, so compare the (g, rn) -> v mapping
      val w = Window.partitionBy(col("g")).orderBy(col("v"))
      val exp = df.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
        .as[(String, Double, Long, Long)].collect()
      val gotMap = got.map(r => (r._1, r._3) -> r._2).toMap
      val expMap = exp.map(r => (r._1, r._3) -> r._2).toMap
      assert(gotMap == expMap, s"rank->value mismatch on ${rows.take(8)}…")
      assert(got.map(r => (r._1, r._4)).toSet == exp.map(r => (r._1, r._4)).toSet)
    }
  }

  test("weightedMedian equals the lower median of the weight-expanded multiset") {
    val gen: Gen[List[(String, Int, Int)]] = for {
      n <- Gen.choose(1, 120)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        v <- Gen.choose(-50, 50)
        w <- Gen.choose(1, 9)
      } yield (g, v, w))
    } yield rows
    samples(gen, 10).foreach { rows =>
      val df = rows.toDF("g", "v", "w")
      val got = operators.Analytics.weightedMedianOf(df, "g", "v", "w")
        .as[(String, Int, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val exp = rows.groupBy(_._1).map { case (g, rs) =>
        val expanded = rs.flatMap { case (_, v, w) => Seq.fill(w)(v) }.sorted
        g -> (expanded((expanded.length + 1) / 2 - 1), expanded.length.toLong)
      }
      assert(got == exp, s"on ${rows.take(8)}…")
    }
  }

  test("weightedQuantileBrackets equal expanded-multiset lower quantiles at every p") {
    val gen: Gen[List[(String, Int, Int)]] = for {
      n <- Gen.choose(1, 120)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        v <- Gen.choose(-50, 50)
        w <- Gen.choose(1, 9)
      } yield (g, v, w))
    } yield rows
    val ps = Seq((1L, 10L, "0.10"), (1L, 4L, "0.25"), (1L, 2L, "0.50"),
      (3L, 4L, "0.75"), (9L, 10L, "0.90"), (1L, 1L, "1.00"))
    samples(gen, 10).foreach { rows =>
      val df = rows.toDF("g", "v", "w")
      val got = operators.Analytics
        .weightedQuantileBracketsOf(df, "g", "v", "w", ps)
        .as[(String, String, Int)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val exp = (for {
        (g, rs) <- rows.groupBy(_._1)
        expanded = rs.flatMap { case (_, v, w) => Seq.fill(w)(v) }.sorted
        bigW = expanded.length.toLong
        (num, den, lbl) <- ps
      } yield {
        // smallest v with cum >= (num/den)·W == expanded value at
        // 1-based index ceil(num·W/den) (cum weights are integers)
        val idx = ((num * bigW + den - 1) / den).toInt
        (g, lbl) -> expanded(idx - 1)
      }).toMap
      assert(got == exp, s"on ${rows.take(8)}…")
    }
  }

  test("cdcSummarize: random interleavings split-merge to the whole-slice summary") {
    val gen: Gen[List[(Long, Long, String, Double)]] = for {
      n <- Gen.choose(1, 150)
      rows <- Gen.listOfN(n, for {
        user <- Gen.choose(0L, 9L)
        ms <- Gen.choose(0L, 100000L)
        typ <- Gen.oneOf("click", "error", "purchase")
        v <- Gen.choose(0, 1000).map(_ / 10.0)
      } yield (user, ms, typ, v))
    } yield rows
    samples(gen, 8).foreach { rows =>
      val all = rows.zipWithIndex.map { case ((u, ms, t, v), i) =>
        (i.toLong, new java.sql.Timestamp(ms), u, t, v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val whole = EventStream.cdcSummarize(all).collect().toSet
      // split on an arbitrary, non-temporal predicate and max-merge
      val parts = Seq(all.where(col("event_id") % 2 === 0),
        all.where(col("event_id") % 2 === 1))
      val merged = parts.map(EventStream.cdcSummarize).reduce(_ unionByName _)
        .groupBy(col("user_id"))
        .agg(max(col("err")).as("err"), max(col("ev")).as("ev"))
        .collect().toSet
      assert(merged == whole)
    }
  }

  test("globalRank ranks stay contiguous at a scale where partitions split groups") {
    // regression: the offsets branch must reuse the SAME range shuffle
    // as the rank pass — a re-executed repartitionByRange re-samples
    // its boundaries and shifts boundary rows between __pids, which
    // showed up as duplicate/missing ranks (maxrn > cnt) at sf0.01
    val df = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_linestatus"), col("l_extendedprice"))
    val g = operators.Relational
      .globalRank(df, Seq("l_linestatus"), Seq("l_extendedprice"))
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), max(col("rn")).as("maxrn"),
        countDistinct(col("rn")).as("ndist"), max(col("n")).as("nval"))
      .collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"maxrn != cnt for ${r.getString(0)}")
      assert(r.getLong(1) == r.getLong(3), s"duplicate ranks for ${r.getString(0)}")
      assert(r.getLong(1) == r.getLong(4), s"group size wrong for ${r.getString(0)}")
    }
  }

  test("BoundedTopK equals sorted-take on random data at any k") {
    val gen = for { rows <- smallData; k <- Gen.choose(1, 8) } yield (rows, k)
    samples(gen, 8).foreach { case (rows, k) =>
      val df = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id").repartition(7)
      val got = df.groupBy(col("g"))
        .agg(functions.TopKAgg.boundedTopK(struct(col("v"), col("id")), k).as("top"))
        .select(col("g"), explode(col("top")).as("t"))
        .select(col("g"), col("t.v"), col("t.id"))
        .as[(String, Double, Long)].collect().toSet
      val exp = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
        .groupBy(_._1).toList
        .flatMap { case (_, grp) => grp.sortBy(r => (r._2, r._3)).take(k) }
        .toSet
      assert(got == exp, s"k=$k rows=${rows.take(8)}…")
    }
  }

  test("two-phase skew join equals the plain join on random skewed data") {
    val gen = for {
      nHot <- Gen.choose(0, 200)
      nCold <- Gen.choose(1, 100)
      hotKey <- Gen.choose(0L, 5L)
    } yield (nHot, nCold, hotKey)
    samples(gen, 6).foreach { case (nHot, nCold, hotKey) =>
      val big = spark.range(0, nHot.toLong)
        .select(lit(hotKey).as("bk"), col("id").as("bv"))
        .union(spark.range(0, nCold.toLong)
          .select(pmod(col("id"), lit(20L)).as("bk"), (col("id") + 1000).as("bv")))
      val dim = spark.range(0, 20).select(col("id").as("dk"), (col("id") * 7).as("dv"))
      val got = operators.Relational.skewSaltedJoin(big, "bk", dim, "dk",
        nSalts = 3, topHot = 2, sampleFraction = 0.5)
      val exp = big.join(dim, col("bk") === col("dk"))
        .select(col("bk"), col("bv"), col("dk"), col("dv"))
      assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
        s"nHot=$nHot nCold=$nCold hotKey=$hotKey")
    }
  }

  test("exactQuantiles selects the value at rank ceil(p*n) on random data") {
    samples(smallData, 6).foreach { rows =>
      val df = rows.toDF("g", "v")
      val got = operators.Relational
        .exactQuantiles(df, Seq("g"), "v", ps = Seq(0.25, 0.5, 0.9), nParts = 4)
        .as[(String, Double, Double)].collect()
        .map { case (g, p, v) => (g, p) -> v }.toMap
      val exp = rows.groupBy(_._1).flatMap { case (g, grp) =>
        val sorted = grp.map(_._2).sorted
        Seq(0.25, 0.5, 0.9).map(p =>
          (g, p) -> sorted(math.ceil(p * sorted.size).toInt - 1))
      }
      assert(got == exp, s"on ${rows.take(8)}…")
    }
  }

  test("native as-of join equals the direct backward-match oracle on random data") {
    val gen = for {
      nl <- Gen.choose(0, 120)
      lrows <- Gen.listOfN(nl, for {
        k <- Gen.choose(0L, 5L); t <- Gen.choose(0L, 50L)
      } yield (k, t))
      rpairs <- Gen.listOf(for {
        k <- Gen.choose(0L, 5L); t <- Gen.choose(0L, 50L); v <- Gen.choose(0, 999)
      } yield ((k, t), v.toLong))
    } yield (lrows, rpairs.toMap) // map ⇒ unique (key, time) right side
    samples(gen, 6).foreach { case (lrows, rmap) =>
      val left = lrows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("lk", "lt", "lid").repartition(4)
      val right = rmap.toList.map { case ((k, t), v) => (k, t, v) }
        .toDF("rk", "rt", "rv").repartition(3)
      val got = plans.AsOfJoin.asofJoin(left, right, "lk", "rk", "lt", "rt")
        .select(col("lid"), col("rv")).as[(Long, Option[Long])].collect().toMap
      val exp = lrows.zipWithIndex.map { case ((k, t), i) =>
        val cand = rmap.keys.filter(p => p._1 == k && p._2 <= t)
        i.toLong -> (if (cand.isEmpty) None else Some(rmap(cand.maxBy(_._2))))
      }.toMap
      assert(got == exp, s"left=${lrows.take(8)}… right=${rmap.take(8)}…")
    }
  }

  test("date extraction inverts formatting for every convention on random dates") {
    val dates = Gen.choose(0L, 20000L).map(d => java.time.LocalDate.ofEpochDay(d))
    samples(Gen.listOfN(20, dates), 4).foreach { ds =>
      val fmts = Seq[java.time.LocalDate => String](
        d => s"data_${d}T030000_x.csv.gz",
        d => s"sales_$d.csv",
        d => s"report_${d.toString.replace("-", "")}.xlsx",
        d => s"logs_${d.toString.replace("-", "_")}.txt",
        d => f"backup_${d.getMonthValue}%02d-${d.getDayOfMonth}%02d-${d.getYear}%04d_120000.sql",
        d => s"analytics.${d.toString.replace("-", ".")}.json")
      val rows = for { d <- ds; f <- fmts } yield (f(d), d.toString)
      val out = rows.toDF("fname", "truth")
        .select(sources.DateExtract.extractDate(col("fname")).as("got"), col("truth"))
        .as[(String, String)].collect()
      out.foreach { case (got, truth) => assert(got == truth, s"$got != $truth") }
    }
  }

  test("scd2 merge invariants hold on random update waves") {
    val gen: Gen[(List[(Long, Double)], List[(Long, Double)])] = for {
      nDim <- Gen.choose(1, 80)
      dim <- Gen.listOfN(nDim, Gen.choose(0, 10000).map(_ / 8.0))
      updKeys <- Gen.someOf(0 until nDim)
      updVals <- Gen.listOfN(updKeys.size, Gen.oneOf(true, false))
    } yield (
      dim.zipWithIndex.map { case (v, i) => (i.toLong, v) },
      updKeys.toList.zip(updVals).map { case (k, change) =>
        (k.toLong, if (change) dim(k) + 1.0 else dim(k)) })
    samples(gen, 8).foreach { case (dimRows, updRows) =>
      val cur = dimRows.toDF("k", "bal")
        .select(col("k"), col("bal"), lit("2024-01-01").as("valid_from"),
          lit(null).cast("string").as("valid_to"), lit(true).as("is_current"))
      val upd = updRows.toDF("k", "bal")
      val merged = operators.Scd2.merge(cur, upd, "k",
        changed = col("bal") =!= col("u_bal"), effectiveDate = "2024-02-01")
        .as[(Long, Double, String, String, Boolean)].collect()
      val changedKeys = updRows.filter { case (k, v) =>
        dimRows.exists(d => d._1 == k && d._2 != v) }.map(_._1).toSet
      // exactly one open row per key; changed keys have a closed row
      val byKey = merged.groupBy(_._1)
      byKey.foreach { case (k, rows) =>
        assert(rows.count(_._5) == 1, s"key $k open rows != 1")
        val closed = rows.filter(!_._5)
        if (changedKeys(k)) {
          assert(closed.length == 1 && closed.head._4 == "2024-02-01")
          assert(rows.find(_._5).get._3 == "2024-02-01")
        } else assert(closed.isEmpty, s"key $k spuriously versioned")
      }
      assert(merged.length == dimRows.size + changedKeys.size)
    }
  }

  test("RangeBinRewrite join equals the nested-loop join on random intervals/points") {
    val gen: Gen[(List[(Long, Double)], List[(Long, Double)], Double)] = for {
      w <- Gen.oneOf(0.5, 1.0, 3.0, 7.5)
      nIv <- Gen.choose(1, 120)
      nPt <- Gen.choose(1, 200)
      iv <- Gen.listOfN(nIv, Gen.choose(-10000, 10000).map(_ / 16.0))
      pt <- Gen.listOfN(nPt, Gen.choose(-10000, 10000).map(_ / 16.0))
    } yield (iv.zipWithIndex.map { case (v, i) => (i.toLong, v) },
      pt.zipWithIndex.map { case (v, i) => (i.toLong, v) }, w)
    samples(gen, 6).foreach { case (ivRows, ptRows, w) =>
      val iv = ivRows.toDF("iv_id", "lo")
      val pt = ptRows.toDF("pt_id", "p")
      def cond = pt("p") >= iv("lo") && pt("p") < (iv("lo") + w)
      val expected = iv.join(pt, cond)
        .select(col("iv_id"), col("pt_id")).as[(Long, Long)].collect().toSet
      spark.experimental.extraOptimizations = Seq(plans.RangeBinRewrite)
      try {
        val got = iv.join(pt, cond)
          .select(col("iv_id"), col("pt_id")).as[(Long, Long)].collect().toSet
        assert(got == expected,
          s"w=$w missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      } finally spark.experimental.extraOptimizations = Nil
    }
  }

  test("entropy run-length formulation equals the frequency-map oracle on random docs") {
    val docGen: Gen[String] = for {
      n <- Gen.choose(0, 60)
      toks <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
    } yield toks.mkString(" ")
    val docs = samples(docGen, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("graft_entropy_prop").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.TrainingQueries.entropyScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, text, _, _, _) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val row = got(id)
      assert(row.getLong(1) == toks.length)
      val freqs = toks.groupBy(identity).view.mapValues(_.length.toDouble).values
      assert(row.getLong(2) == freqs.size)
      if (toks.nonEmpty) {
        val n = toks.length.toDouble
        val want = -freqs.map { c => (c / n) * (math.log(c / n) / math.log(2)) }.sum
        val gotH = row.getAs[java.lang.Double]("entropy_bits")
        assert(math.abs(gotH - want) < 1e-5, s"doc $id: got $gotH want $want")
        // information-theoretic bound: H <= log2(#types), equality iff uniform
        assert(gotH <= math.log(freqs.size.toDouble) / math.log(2) + 1e-9)
      } else assert(row.getAs[java.lang.Double]("entropy_bits") == null)
    }
  }

  private val prefixJoinCorpus: Gen[(List[(Long, String)], Double)] = for {
    n <- Gen.choose(2, 18)
    tau <- Gen.oneOf(0.3, 0.5, 0.8, 1.0)
    texts <- Gen.listOfN(n, for {
      w <- Gen.choose(0, 9)
      words <- Gen.listOfN(w, Gen.oneOf("a", "b", "c", "d", "e"))
    } yield words.mkString(" "))
  } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, tau)

  test("prefixJaccardSelfJoin equals all-pairs brute force on random corpora") {
    // the prefix-filter theorem's contract is EXACT equality with the
    // quadratic definition — including empty docs (one "" shingle),
    // sub-trigram docs (whole-text shingle), identical docs (J = 1),
    // and every tested τ
    samples(prefixJoinCorpus, 10).foreach { case (docs, tau) =>
      val df = docs.toDF("doc_id", "text")
      val got = operators.TrainingQueries
        .prefixJaccardSelfJoin(df, "doc_id", "text", tau)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
        .toMap
      def sh(t: String): Set[String] = {
        val w = t.split(" ", -1)
        if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
        else Set(w.mkString(" "))
      }
      val sets = docs.map { case (id, t) => (id, sh(t)) }
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        j = (sa & sb).size.toDouble / (sa | sb).size
        if j >= tau
      } yield ((a, b), math.rint(j * 1e6) / 1e6)).toMap
      assert(got == want, s"tau=$tau docs=$docs")
    }
  }

  private val digitsAndSwap: Gen[(String, Int)] = for {
    ds <- Gen.listOfN(9, Gen.choose(0, 9)).map(_.mkString)
    p <- Gen.choose(0, 7)
  } yield (ds, p)

  test("record-linkage blocking model: transpositions are key-invariant, distance ∈ {0,2}") {
    // the E76 guarantees hold for EVERY digit string and swap
    // position, not just the customer fixtures: the sorted-digit key
    // is invariant under any adjacent transposition, and same-length
    // same-multiset strings sit at Levenshtein 0 or 2, never 1
    def swap(s: String, p: Int): String =
      s.substring(0, p) + s(p + 1) + s(p) + s.substring(p + 2)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    samples(digitsAndSwap, 200).foreach { case (ds, p) =>
      val sw = swap(ds, p)
      assert(ds.sorted == sw.sorted, s"$ds p=$p")
      val d = lev(ds, sw)
      assert(d == 0 || d == 2, s"$ds -> $sw dist=$d")
      assert((d == 0) == (ds(p) == ds(p + 1)))
    }
  }

  private val limbValues: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 400)
    rows <- Gen.listOfN(n, for {
      // the C32 domain bound: 2-decimal measures ≤ ~105k scale to ≤ 1.05e7
      a <- Gen.choose(0L, 10500000L)
      b <- Gen.choose(0L, 10500000L)
    } yield (a, b))
  } yield rows

  test("corr_matrix limb split reconstructs exact product sums on random bounded values") {
    // Σ(a·b) via SUM(p div 1e9)·1e9 + SUM(p mod 1e9) must equal the
    // BigInt truth for any row count — including products right at the
    // 1.1e14 domain ceiling where a single-long sum would overflow
    val m = 1000000000L
    samples(limbValues, 8).foreach { rows =>
      val hi = rows.map { case (a, b) => a * b / m }.sum
      val lo = rows.map { case (a, b) => a * b % m }.sum
      val truth = rows.map { case (a, b) => BigInt(a) * BigInt(b) }.sum
      assert(BigInt(hi) * m + BigInt(lo) == truth, s"n=${rows.length}")
    }
  }
}
