package graft

import org.apache.spark.sql.functions._
import graft.functions.{CdcChunks, MatrixAgg}
import graft.operators.{Analytics, DataQuality, TrainingQueries}

/** Unit tests for the round-12 additions: Pareto skyline, linear
  * interpolation, engine-portable fingerprint, snapshot vacuum,
  * distributed PCA, content-defined chunking, and the ordered EWMA
  * stream gate. Each is checked against an independent brute-force or
  * invariant formulation, never against itself.
  */
class R12OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ D77
  test("skyline: no returned point is dominated; every dropped point is") {
    val sky = Analytics.skyline(spark, sf)
      .select(col("p_brand"), col("p_retailprice"), col("best_size"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    val all = Tables.part(spark, sf)
      .select(col("p_brand"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    def dominates(a: (String, Double, Int), b: (String, Double, Int)): Boolean =
      a._1 == b._1 && a._2 <= b._2 && a._3 >= b._3 &&
        (a._2 < b._2 || a._3 > b._3)
    // returned points undominated
    assert(sky.forall(p => !all.exists(q => dominates(q, p))))
    // every (brand, price, size) combo NOT on the skyline is dominated
    val skySet = sky.toSet
    assert(all.distinct.filterNot(skySet).forall(p =>
      all.exists(q => dominates(q, p))))
  }

  // ------------------------------------------------------------ D78
  test("interpolate: observed hours keep their value; gaps sit on the line") {
    val rows = Analytics.interpolate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getBoolean(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      // spine is contiguous hourly and clamped to observed endpoints
      assert(sorted.head._3 && sorted.last._3)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._2 - a._2 == 3600000L)
        case _ =>
      }
      // every gap value lies between its bracketing observations
      val obs = sorted.filter(_._3)
      sorted.filterNot(_._3).foreach { g =>
        val prev = obs.filter(_._2 < g._2).last
        val next = obs.find(_._2 > g._2).get
        val lo = math.min(prev._4, next._4) - 1e-9
        val hi = math.max(prev._4, next._4) + 1e-9
        assert(g._4 >= lo && g._4 <= hi)
        val frac = (g._2 - prev._2).toDouble / (next._2 - prev._2)
        assert(math.abs(g._4 - (prev._4 + (next._4 - prev._4) * frac)) < 1e-6)
      }
    }
  }

  // ------------------------------------------------------------ C30
  test("tableFingerprint is invariant under partitioning and row order") {
    val a = DataQuality.tableFingerprint(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      val b = DataQuality.tableFingerprint(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(a.sameElements(b))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(a.map(_._2).sum == Tables.orders(spark, sf).count())
  }

  test("tableFingerprint detects a single-row, single-column change") {
    val base = Tables.orders(spark, sf)
    val mutated = base.withColumn("o_totalprice",
      when(col("o_orderkey") === 7L, col("o_totalprice") + 0.01)
        .otherwise(col("o_totalprice")))
    // recompute both fingerprints through the same canonicalization by
    // round-tripping the mutated frame through a temp table path
    val tmp = java.nio.file.Files.createTempDirectory("graft_fp").toString
    mutated.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    base.sparkSession.catalog.clearCache()
    val fa = DataQuality.tableFingerprint(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    val fb = DataQuality.tableFingerprint(spark, tmp).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    val diff = fa.keySet.filter(k => fa(k) != fb(k))
    assert(diff == Set(7L % 16L))
  }

  // ------------------------------------------------------------ E73
  test("symmetricEigen recovers a known spectrum") {
    // A = Q diag(5, 2, 1) Q^T for a hand-built orthonormal Q
    val s3 = math.sqrt(1.0 / 3.0); val s2 = math.sqrt(1.0 / 2.0)
    val s6 = math.sqrt(1.0 / 6.0)
    val q = Array(
      Array(s3, s3, s3),
      Array(s2, -s2, 0.0),
      Array(s6, s6, -2.0 * s6))
    val lam = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => lam(k) * q(k)(i) * q(k)(j)).sum)
    val (eig, vecs) = MatrixAgg.symmetricEigen(a)
    assert(eig.zip(lam).forall { case (e, l) => math.abs(e - l) < 1e-10 })
    // eigenvectors match up to sign
    (0 until 3).foreach { k =>
      val dot = math.abs((0 until 3).map(i => vecs(k)(i) * q(k)(i)).sum)
      assert(math.abs(dot - 1.0) < 1e-10)
    }
  }

  test("GramMatrixAgg moments equal a local single-threaded pass") {
    val vecs = Tables.embeddings(spark, sf).limit(100)
    val blob = vecs.agg(MatrixAgg.gramMatrix(col("embedding")).as("g"))
      .head().getAs[Array[Byte]]("g")
    val (n, mean, cov) = MatrixAgg.decode(blob)
    val local = vecs.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    assert(n == local.length)
    val d = local.head.length
    val lmean = (0 until d).map(i => local.map(_(i)).sum / n)
    assert((0 until d).forall(i => math.abs(mean(i) - lmean(i)) < 1e-9))
    // spot-check a few covariance entries against the definition
    for ((i, j) <- Seq((0, 0), (3, 7), (d - 1, d - 1), (1, d - 2))) {
      val c = local.map(x => (x(i) - lmean(i)) * (x(j) - lmean(j))).sum / n
      assert(math.abs(cov(i)(j) - c) < 1e-7, s"cov($i,$j)")
    }
  }

  // ------------------------------------------------------------ E74
  test("CdcChunks: chunks partition the bytes exactly, for any content") {
    val docs = Seq("", "a", "short", "x" * 1000,
      "zürich ünïcode ﬆring — ürsula",
      scala.util.Random.alphanumeric.take(5000).mkString)
      .toDF("text")
    val bad = docs.select(
      octet_length(col("text")).cast("long").as("blen"),
      CdcChunks.cdcChunks(col("text"), 4, 8, 128).as("chunks"))
      .filter(expr("aggregate(chunks, 0L, (a, c) -> a + c.chunk_len)") =!=
        col("blen"))
    assert(bad.isEmpty)
    // every chunk inside [1, maxLen]
    val sizes = docs.select(explode(
        CdcChunks.cdcChunks(col("text"), 4, 8, 128)).as("c"))
      .select(col("c.chunk_len").as("l"))
      .filter(col("l") < 1 || col("l") > 128)
    assert(sizes.isEmpty)
  }

  test("CdcChunks: boundaries re-synchronize after a prefix insert") {
    val body = scala.util.Random.shuffle(
      (1 to 300).map(i => s"tok$i")).mkString(" ")
    val df = Seq(("base", body), ("edit", "PREFIX-12345: " + body))
      .toDF("which", "text")
      .select(col("which"), explode(
        CdcChunks.cdcChunks(col("text"), 4, 8, 128)).as("c"))
      .select(col("which"), col("c.chunk_hash").as("h"))
    val base = df.filter(col("which") === "base").select("h")
      .collect().map(_.getLong(0)).toSet
    val edit = df.filter(col("which") === "edit").select("h")
      .collect().map(_.getLong(0)).toSet
    val shared = (base & edit).size.toDouble / edit.size
    assert(shared >= 0.6, s"shared=$shared")
  }

  // ------------------------------------------------------- gate runs
  test("vacuum gate holds at sf0.001") {
    val r = sinks.SinkGates.vacuumGate(spark, sf).head()
    assert(r.getBoolean(5), r.toString)
  }

  test("cdc_chunk_dedup gate holds at sf0.001") {
    val r = TrainingQueries.cdcChunkDedup(spark, sf).head()
    assert(r.getBoolean(3) && r.getBoolean(4), r.toString)
  }

  test("embedding_pca invariants hold at sf0.001") {
    val r = operators.CorpusAnalytics.embeddingPca(spark, sf).head()
    assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6), r.toString)
  }

  test("stream_anomaly: stream equals batch bit-for-bit") {
    val r = streaming.StreamGates.streamAnomaly(spark, sf).head()
    assert(r.getBoolean(3), r.toString)
  }

  test("stream_psi: windowed histogram matches batch; PSI non-negative") {
    val r = streaming.StreamGates.streamPsi(spark, sf).head()
    assert(r.getBoolean(4) && r.getBoolean(5), r.toString)
    assert(r.getDouble(3) >= 0.0)
  }

  // ------------------------------------------------------------ E75
  test("bpe_pair_counts matches a brute-force local recount") {
    val got = operators.CorpusAnalytics.bpePairCounts(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val texts = Tables.documents(spark, sf).select("text")
      .collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for (t <- texts; w <- t.toLowerCase.split(" ") if w.length >= 2;
         i <- 0 until w.length - 1)
      counts(w.substring(i, i + 2)) = counts.getOrElse(w.substring(i, i + 2), 0L) + 1L
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
      .zipWithIndex.map { case ((p, n), i) => (i + 1, p, n) }
    assert(got.sortBy(_._1).toSeq == want)
  }

  // ------------------------------------------------------------ C32
  test("corr_matrix agrees with Spark's built-in corr per pair") {
    val got = operators.Analytics.corrMatrix(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(got.size == 6)
    val li = Tables.lineitem(spark, sf)
    got.keys.foreach { case (a, b) =>
      val want = li.agg(corr(col(a), col(b))).head().getDouble(0)
      assert(math.abs(got((a, b)) - want) < 1e-5,
        s"($a,$b): ${got((a, b))} vs $want")
    }
  }

  // ------------------------------------------------------------ C35
  test("join_view_maintain: delta terms partition the recomputed view") {
    val got = sinks.SinkGates.joinViewMaintainGate(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val orders = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf)
    val full = orders.join(cust,
      col("o_custkey") === col("c_custkey"))
    // the maintained rollup must account for every full-join row
    assert(got.map(_._2).sum == full.count())
    // quadrant disjointness: old/delta splits partition the join
    def q(om: Int, cm: Int) = orders
      .filter(if (om == 0) col("o_orderkey") % 17 =!= 0
              else col("o_orderkey") % 17 === 0)
      .join(cust.filter(if (cm == 0) col("c_custkey") % 23 =!= 0
                        else col("c_custkey") % 23 === 0),
        col("o_custkey") === col("c_custkey")).count()
    assert(q(0, 0) + q(1, 0) + q(0, 1) + q(1, 1) == full.count())
  }

  // ------------------------------------------------------------ E79
  test("dup_span: planted middle-thirds are fully duplicated; bases carry the span") {
    val rows = operators.CorpusAnalytics.dupSpan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byId = rows.map(r => (r._1, r)).toMap
    val plantedIds = rows.map(_._1).filter(_ >= 20000L)
    assert(plantedIds.nonEmpty)
    plantedIds.foreach { id =>
      val (_, nGrams, maxRun, span) = byId(id)
      // the planted doc is a verbatim excerpt: every gram duplicated
      assert(maxRun == nGrams && span == nGrams + 4, s"planted $id")
      // its base doc must carry a duplicated run covering the excerpt
      assert(byId(id - 20000L)._3 >= nGrams, s"base of $id")
    }
    // span algebra: dup_token_span == max_dup_run + 4 exactly when a run exists
    rows.foreach { case (id, _, run, span) =>
      assert(if (run > 0) span == run + 4 else span == 0, s"doc $id") }
  }

  // ------------------------------------------------------------ C34
  test("merge_into: action accounting reconciles with the change set") {
    val tgt = Tables.customer(spark, sf)
      .select(col("c_custkey").as("id"), col("c_acctbal").as("bal"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val got = operators.Scd2.mergeInto(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val byAction = got.groupBy(_._3).view.mapValues(_.length).toMap
    val nClose = tgt.keys.count(_ % 7 == 0)
    val nUpd = tgt.keys.count(k => k % 7 == 1 || k % 7 == 2)
    val nIns = tgt.keys.count(_ % 13 == 0)
    assert(byAction.getOrElse("update", 0) == nUpd)
    assert(byAction.getOrElse("insert", 0) == nIns)
    assert(byAction.getOrElse("keep", 0) == tgt.size - nClose - nUpd)
    assert(got.length == tgt.size - nClose + nIns)
    // value semantics per branch
    got.foreach {
      case (id, b, "update") => assert(b == tgt(id) + 100.0)
      case (id, b, "keep")   => assert(b == tgt(id))
      case (id, b, "insert") => assert(b == tgt(id - 2000000L) / 2.0)
      case other             => fail(other.toString)
    }
    // no closed key survives
    assert(got.forall { case (id, _, _) => !(id % 7 == 0 && id < 2000000L) })
  }

  // ------------------------------------------------------------ E78
  test("kn_bigram_lm matches a local KN computation; mass sums to 1") {
    val got = operators.CorpusAnalytics.knBigramLm(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    val texts = Tables.documents(spark, sf).select("text")
      .collect().map(_.getString(0))
    val bi = texts.flatMap { t =>
      val w = t.toLowerCase.split(" ", -1)
      if (w.length >= 2) w.sliding(2).map(p => (p(0), p(1)))
      else Iterator.empty
    }.filter(p => p._1.nonEmpty && p._2.nonEmpty)
    val c = bi.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val c1dot = c.groupBy(_._1._1).map { case (w1, m) => (w1, m.values.sum) }
    val nfwd = c.groupBy(_._1._1).map { case (w1, m) => (w1, m.size.toLong) }
    val nrev = c.groupBy(_._1._2).map { case (w2, m) => (w2, m.size.toLong) }
    val nTypes = c.size.toLong
    val d = 0.75
    def pkn(w1: String, w2: String): Double =
      math.max(c((w1, w2)) - d, 0.0) / c1dot(w1) +
        (d * nfwd(w1) / c1dot(w1)) * (nrev(w2).toDouble / nTypes)
    val want = c.toSeq.sortBy { case ((w1, w2), n) => (-n, w1, w2) }.take(30)
      .zipWithIndex.map { case (((w1, w2), n), i) =>
        (i + 1, w1, w2, n, math.rint(pkn(w1, w2) * 1e6) / 1e6) }
    assert(got.sortBy(_._1).toSeq == want)
    // KN mass: for any context, discounted mass + lambda * sum(Pcont) = 1
    nfwd.keys.take(20).foreach { w1 =>
      val seen = c.collect { case ((`w1`, w2), n) =>
        math.max(n - d, 0.0) / c1dot(w1) }.sum
      val lambda = d * nfwd(w1) / c1dot(w1)
      val contAll = nrev.values.map(_.toDouble / nTypes).sum // == 1
      assert(math.abs(seen + lambda * contAll - 1.0) < 1e-9, w1)
    }
  }

  // ------------------------------------------------------------ C33
  test("psi_drift: shares sum to 1, contributions non-negative, drift registers") {
    val rows = operators.DataQuality.psiDrift(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    // (p_cur - p_base) and ln(p_cur/p_base) always share a sign
    assert(rows.forall(_._4 >= 0.0))
    assert(rows.map(_._4).sum > 0.0) // the planted +10% shift must register
  }

  // ------------------------------------------------------------ E77
  test("similarity_prefix_join equals local brute force and finds every plant") {
    val got = operators.TrainingQueries.similarityPrefixJoin(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // local brute force over the same corpus construction
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
      else Set(w.mkString(" "))
    }
    val corpus = docs ++ docs.filter(_._1 % 10 == 0).map { case (id, t) =>
      val w = t.split(" ", -1)
      (id + 1000000L, w.take(math.max(1, 9 * w.length / 10)).mkString(" "))
    }
    val sets = corpus.map { case (id, t) => (id, shingles(t)) }
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.8
    } yield ((a, b), math.rint(j * 1e6) / 1e6)).toMap
    assert(got == want, s"got ${got.size} want ${want.size}")
    // every planted truncation whose true Jaccard clears τ links back
    // (very short docs legitimately fall under: J ≈ (0.9W−2)/(W−2))
    val eligible = docs.filter(_._1 % 10 == 0)
      .map { case (id, _) => (id, id + 1000000L) }.filter(want.contains)
    assert(eligible.nonEmpty)
    assert(eligible.forall(got.contains))
  }

  // ------------------------------------------------------------ E76
  test("record_linkage: 100% recall and transposition-consistent distances") {
    val links = operators.TrainingQueries.recordLinkage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    val nCust = Tables.customer(spark, sf).count()
    // every dirty record links back to its own clean record
    assert(links.count(l => l._4 && l._1 == l._2) == nCust)
    // same-length same-multiset candidates can only sit at distance 0 or 2
    assert(links.forall(l => l._3 == 0 || l._3 == 2), links.filterNot(l =>
      l._3 == 0 || l._3 == 2).take(3).mkString(","))
  }
}
