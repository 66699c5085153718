package graft

import org.apache.spark.sql.functions._
import graft.sources.AtomicSink

/** Oracle-independent invariants for the `graft-atomic` transactional
  * DSv2 source (A15 write / A18 read) — the commit/abort/concurrency
  * corners the gate's documents round-trip doesn't isolate. */
class AtomicSinkSpec extends SparkSpec {
  import org.apache.hadoop.fs.Path

  private def scratch(tag: String): String =
    s"/tmp/graft_atomic_spec/$tag-${System.nanoTime()}"

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def latest(out: String): AtomicSink.Manifest =
    AtomicSink.latestManifest(fs(out), new Path(out)).get

  private def latestName(out: String): String =
    AtomicSink.manifestPath(new Path(out), latest(out).version).getName

  test("append folds the previous manifest; overwrite truncates it") {
    import spark.implicits._
    val out = scratch("modes")
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.format("graft-atomic").mode("append").save(out)
      Seq((3L, "c")).toDF("id", "v")
        .write.format("graft-atomic").mode("append").save(out)
      assert(AtomicSink.readCommitted(spark, out).count() == 3)
      Seq((9L, "z")).toDF("id", "v")
        .write.format("graft-atomic").mode("overwrite").save(out)
      val back = AtomicSink.readCommitted(spark, out).collect()
      assert(back.map(r => (r.getLong(0), r.getString(1))).toSet == Set((9L, "z")))
      // commit deletes NOTHING (older-version readers keep their
      // snapshot); vacuum with test-scoped zero retention reclaims the
      // previous generation + superseded manifests
      AtomicSink.vacuum(spark, out, retentionMs = 0L)
      val listed = latest(out).entries.map(_._1).toSet
      val physical = fs(out).listStatus(new Path(out)).map(_.getPath.getName).toSet
      assert(physical == listed + latestName(out))
    } finally fs(out).delete(new Path(out), true)
  }

  test("CSV corners round-trip: quotes, commas, newlines-free nulls") {
    import spark.implicits._
    val out = scratch("csv")
    try {
      val rows = Seq(
        (1L, """say "hi", ok""", Some(2.5)),
        (2L, "plain", None),
        (3L, null.asInstanceOf[String], Some(-0.0)))
      rows.toDF("id", "s", "d")
        .write.format("graft-atomic").mode("append").save(out)
      val back = AtomicSink.readCommitted(spark, out)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(back == rows.toSet)
      // the DSv2 scan decodes the same corners identically
      val v2 = spark.read.format("graft-atomic").load(out)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(v2 == rows.toSet)
    } finally fs(out).delete(new Path(out), true)
  }

  test("failed job leaves prior state intact and no stray data files") {
    import spark.implicits._
    val out = scratch("abort")
    try {
      Seq((1L, 10L), (2L, 20L)).toDF("id", "x")
        .write.format("graft-atomic").mode("append").save(out)
      val boom = intercept[Exception] {
        Seq((3L, 30L), (4L, 40L)).toDF("id", "x")
          .select(col("id"), when(col("id") === 4L,
            raise_error(lit("boom"))).otherwise(col("x")).cast("long").as("x"))
          .write.format("graft-atomic").mode("overwrite").save(out)
      }
      assert(boom != null)
      val back = AtomicSink.readCommitted(spark, out).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(back == Set((1L, 10L), (2L, 20L)), "previous commit mutated by failed overwrite")
      val listed = latest(out).entries.map(_._1).toSet
      val physical = fs(out).listStatus(new Path(out)).map(_.getPath.getName).toSet
      assert(physical == listed + latestName(out), s"stray files: ${physical -- listed}")
    } finally fs(out).delete(new Path(out), true)
  }

  test("aborted FIRST write yields the defined empty state") {
    import spark.implicits._
    val out = scratch("abort-first")
    try {
      intercept[Exception] {
        Seq((1L, 1L)).toDF("id", "x")
          .select(col("id"), (col("x") / 0 + raise_error(lit("boom"))
            .cast("double")).cast("long").as("x"))
          .write.format("graft-atomic").mode("append").save(out)
      }
      assert(AtomicSink.readCommitted(spark, out).count() == 0)
    } finally fs(out).delete(new Path(out), true)
  }

  test("unsupported column types are rejected up front") {
    import spark.implicits._
    val out = scratch("types")
    val err = intercept[Exception] {
      Seq((1L, Seq(1, 2))).toDF("id", "arr")
        .write.format("graft-atomic").mode("append").save(out)
    }
    assert(err.getMessage.contains("unsupported") ||
      Option(err.getCause).exists(_.getMessage.contains("unsupported")))
  }

  test("vacuum reclaims aged orphans, keeps committed/foreign/young files") {
    import spark.implicits._
    val out = scratch("vacuum")
    try {
      Seq((1L, "a")).toDF("id", "v")
        .write.format("graft-atomic").mode("append").save(out)
      // plant a crashed job's orphan + a foreign file
      val f = fs(out)
      f.create(new Path(out, "part-99999-0-deadbeef.csv"), true).close()
      f.create(new Path(out, "unrelated.txt"), true).close()
      val before = AtomicSink.readCommitted(spark, out).count()
      // retention guard: a YOUNG unlisted part file is presumed to be a
      // concurrent in-flight write's task output and must survive
      val (keptG, deletedG) = AtomicSink.vacuum(spark, out) // default retention
      assert(deletedG == 0L, "retention guard must keep the young orphan")
      assert(keptG == 4L)
      // zero retention = caller asserts no concurrent writers
      val (kept, deleted) = AtomicSink.vacuum(spark, out, retentionMs = 0L)
      assert(deleted == 1L, "exactly the orphan reclaimed")
      assert(kept == 3L, "manifest + committed file + foreign file kept")
      assert(AtomicSink.readCommitted(spark, out).count() == before)
      assert(f.exists(new Path(out, "unrelated.txt")))
    } finally fs(out).delete(new Path(out), true)
  }

  test("append with a drifted schema is refused; overwrite accepts it") {
    import spark.implicits._
    val out = scratch("drift")
    try {
      Seq((1L, "a")).toDF("id", "v")
        .write.format("graft-atomic").mode("append").save(out)
      val err = intercept[Exception] {
        Seq((2L, 2.0)).toDF("id", "d")
          .write.format("graft-atomic").mode("append").save(out)
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(err).exists(_.contains("schema drift")), msgs(err).mkString("; "))
      // the failed append changed nothing visible
      assert(AtomicSink.readCommitted(spark, out).count() == 1)
      Seq((2L, 2.0)).toDF("id", "d")
        .write.format("graft-atomic").mode("overwrite").save(out)
      assert(AtomicSink.readCommitted(spark, out).columns.toSeq == Seq("id", "d"))
    } finally fs(out).delete(new Path(out), true)
  }

  test("manifest audit counts equal written rows") {
    import spark.implicits._
    val out = scratch("audit")
    try {
      (1L to 100L).toDF("id").repartition(4)
        .write.format("graft-atomic").mode("append").save(out)
      val entries = latest(out).entries
      assert(entries.map(_._2).sum == 100L)
      assert(entries.forall(_._3 > 0L))
    } finally fs(out).delete(new Path(out), true)
  }

  test("concurrent committers: CAS loser refolds — both appends stay visible") {
    import spark.implicits._
    val out = scratch("cas")
    try {
      Seq((1L, "a")).toDF("id", "v")
        .write.format("graft-atomic").mode("append").save(out)
      val root = new Path(out)
      val f = fs(out)
      // a "concurrent" committer lands version 2 first: a physically
      // real file published through the same protocol
      val rival = new Path(root, "part-77777-1-rival.csv")
      val ws = f.create(rival, true)
      ws.write("7,\"r\"\n".getBytes("UTF-8")); ws.close()
      val rivalBytes = f.getFileStatus(rival).getLen
      val v2 = AtomicSink.publish(f, root, latest(out).ddl,
        Seq(("part-77777-1-rival.csv", 1L, rivalBytes)),
        truncate = false, tag = None, committerId = "rival")
      assert(v2 == 2L)
      // plus a TORN claim of version 3 (a committer that died mid-create):
      // the API append below must skip it as invalid, fold v2's entries,
      // lose the CAS on v3 (name taken), and land at v4 with EVERYTHING
      val torn = f.create(AtomicSink.manifestPath(root, 3L), false)
      torn.write("garbage no footer\n".getBytes("UTF-8")); torn.close()
      Seq((3L, "c")).toDF("id", "v")
        .write.format("graft-atomic").mode("append").save(out)
      val m = latest(out)
      assert(m.version == 4L, s"expected CAS retry to land v4, got v${m.version}")
      val back = AtomicSink.readCommitted(spark, out).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(back == Set((1L, "a"), (7L, "r"), (3L, "c")),
        "a concurrent commit was lost by the fold")
    } finally fs(out).delete(new Path(out), true)
  }

  test("torn latest manifest is invisible: readers fall back to the previous version") {
    import spark.implicits._
    val out = scratch("torn")
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.format("graft-atomic").mode("append").save(out)
      val f = fs(out)
      // a committer died after creating v2 but before the footer
      val torn = f.create(AtomicSink.manifestPath(new Path(out), 2L), false)
      torn.write("STRUCT<id: BIGINT, v: STRING>\npart-bogus\t1\t1\n".getBytes("UTF-8"))
      torn.close()
      assert(AtomicSink.readCommitted(spark, out).count() == 2,
        "torn manifest leaked into visibility")
      assert(latest(out).version == 1L)
    } finally fs(out).delete(new Path(out), true)
  }

  test("checksum damage: torn claim falls back, COMMITTED manifest fails stop") {
    import spark.implicits._
    // corrupt a manifest's bytes in place (same length, via nio so the
    // .crc sidecar goes stale) — the ChecksumFileSystem read then fails
    def corrupt(p: Path): Unit = {
      val nio = java.nio.file.Paths.get(p.toUri.getPath)
      val bytes = java.nio.file.Files.readAllBytes(nio)
      bytes(0) = 'X'.toByte // mangles the DDL text, leaves the footer intact
      java.nio.file.Files.write(nio, bytes)
    }
    // case 1: a TORN (footer-less) damaged claim stays invisible —
    // readers fall back to the previous version as before
    val out = scratch("cksum_torn")
    try {
      Seq((1L, "a")).toDF("id", "v")
        .write.format("graft-atomic").mode("append").save(out)
      val f = fs(out)
      val torn = f.create(AtomicSink.manifestPath(new Path(out), 2L), false)
      torn.write("STRUCT<id: BIGINT, v: STRING>\npart-bogus\t1\t1\n".getBytes("UTF-8"))
      torn.close()
      corrupt(AtomicSink.manifestPath(new Path(out), 2L))
      assert(latest(out).version == 1L, "damaged torn claim leaked or dead-ended")
    } finally fs(out).delete(new Path(out), true)
    // case 2: the same damage on a COMMITTED latest manifest must NOT
    // be treated as nonexistent (the next publish would silently fold
    // from the previous version, losing this version's files) — it
    // fails stop instead
    val out2 = scratch("cksum_committed")
    try {
      Seq((1L, "a")).toDF("id", "v")
        .write.format("graft-atomic").mode("append").save(out2)
      // hard-link claims carry no .crc sidecar; recreate the COMMITTED
      // manifest through a checksummed write so the damage is detectable
      val f2 = fs(out2)
      val mp = AtomicSink.manifestPath(new Path(out2), 1L)
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(f2.open(mp))
      val o = f2.create(mp, true)
      try o.write(bytes) finally o.close()
      corrupt(mp)
      val e = intercept[java.io.IOException] {
        AtomicSink.latestManifest(fs(out2), new Path(out2))
      }
      assert(e.getMessage.contains("COMMITTED"), e.getMessage)
    } finally fs(out2).delete(new Path(out2), true)
  }

  test("tagged appends are idempotent: a replayed batch folds nothing twice") {
    import spark.implicits._
    val out = scratch("tags")
    try {
      Seq((1L, 10L)).toDF("id", "x").write.format("graft-atomic")
        .option("graft.tag", "batch-0").mode("append").save(out)
      Seq((2L, 20L)).toDF("id", "x").write.format("graft-atomic")
        .option("graft.tag", "batch-1").mode("append").save(out)
      val v = latest(out).version
      // checkpoint-restart replay: same tag, same (or different) data —
      // must publish nothing and leave no stray files
      Seq((2L, 20L)).toDF("id", "x").write.format("graft-atomic")
        .option("graft.tag", "batch-1").mode("append").save(out)
      assert(latest(out).version == v, "replay published a new version")
      assert(AtomicSink.readCommitted(spark, out).count() == 2)
      assert(latest(out).tags == Set("batch-0", "batch-1"))
      val listed = latest(out).entries.map(_._1).toSet
      val parts = fs(out).listStatus(new Path(out)).map(_.getPath.getName)
        .filter(_.startsWith("part-")).toSet
      assert(parts == listed, s"replayed batch left stray files: ${parts -- listed}")
    } finally fs(out).delete(new Path(out), true)
  }

  test("DSv2 read: snapshot scan matches readCommitted, prunes columns, reports manifest stats") {
    import spark.implicits._
    val out = scratch("read")
    try {
      val df = (1L to 50L).map(i => (i, s"s$i", i * 1.5)).toDF("id", "s", "d")
      df.write.format("graft-atomic").mode("append").save(out)
      val scan = spark.read.format("graft-atomic").load(out)
      assert(scan.schema == AtomicSink.readCommitted(spark, out).schema)
      // row-for-row equality with the helper reader
      val helper = AtomicSink.readCommitted(spark, out)
      assert(scan.exceptAll(helper).isEmpty && helper.exceptAll(scan).isEmpty)
      // column prune reaches the scan: only required fields survive
      import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
      val pruned = scan.select(col("id"), col("d"))
      val rel = pruned.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r
      }.head
      assert(rel.scan.readSchema().fieldNames.toSeq == Seq("id", "d"),
        s"prune missing from scan: ${rel.scan.description()}")
      assert(pruned.agg(sum(col("d"))).head().getDouble(0) == (1L to 50L).map(_ * 1.5).sum)
      // stats come from the manifest: exact row count, no listing
      assert(rel.computeStats().rowCount.contains(BigInt(50)),
        s"manifest row stats missing: ${rel.computeStats()}")
    } finally fs(out).delete(new Path(out), true)
  }

  // ------------------------------------------------- A19 manifest stats

  test("manifest stats: numeric min/max recorded, nulls excluded, NaN poisons, strings skipped") {
    import spark.implicits._
    val out = scratch("stats")
    try {
      Seq(
        (5L, Some(1.5), "x"),
        (2L, None, "y"),
        (9L, Some(-3.25), "z"))
        .toDF("k", "d", "s")
        .coalesce(1)
        .write.format("graft-atomic").mode("append").save(out)
      val m = latest(out)
      val st = m.stats(m.entries.head._1).map(t => t._1 -> (t._2, t._3)).toMap
      assert(st("k") == ("2", "9"))
      assert(st("d") == ("-3.25", "1.5")) // nulls contribute nothing
      assert(!st.contains("s")) // strings have no comparable stats
      // NaN in a double column drops that column's stats for the file
      val out2 = scratch("stats_nan")
      try {
        Seq((1L, Double.NaN), (2L, 7.0)).toDF("k", "d")
          .coalesce(1)
          .write.format("graft-atomic").mode("append").save(out2)
        val m2 = latest(out2)
        val st2 = m2.stats(m2.entries.head._1).map(_._1).toSet
        assert(st2 == Set("k"), st2)
      } finally fs(out2).delete(new org.apache.hadoop.fs.Path(out2), true)
    } finally fs(out).delete(new org.apache.hadoop.fs.Path(out), true)
  }

  test("stats skipping: filtered DSv2 scan plans only interval-matching files, rows unchanged") {
    import spark.implicits._
    val out = scratch("skip")
    try {
      // three files with disjoint key ranges
      (0 until 3).foreach { b =>
        Seq.tabulate(10)(i => (b * 100L + i, s"v$b$i"))
          .toDF("k", "v").coalesce(1)
          .write.format("graft-atomic").mode("append").save(out)
      }
      assert(latest(out).entries.length == 3)
      def planned(df: org.apache.spark.sql.DataFrame): Int = {
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        df.collect()
        def nodes(p: SparkPlan): Seq[SparkPlan] = {
          val kids = p match {
            case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
            case q: QueryStageExec => Seq(q.plan)
            case _ => p.children
          }
          p +: kids.flatMap(nodes)
        }
        nodes(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
            .queryExecution.executedPlan)
          .collectFirst { case b: BatchScanExec => b }
          .map(_.inputPartitions.length).getOrElse(-1)
      }
      val mid = spark.read.format("graft-atomic").load(out)
        .filter(col("k") >= 100L && col("k") <= 109L)
      assert(planned(mid) == 1)
      assert(mid.count() == 10)
      val edge = spark.read.format("graft-atomic").load(out)
        .filter(col("k") === 200L) // exact boundary value must keep its file
      assert(planned(edge) == 1)
      assert(edge.count() == 1)
      val none = spark.read.format("graft-atomic").load(out)
        .filter(col("k") > 500L)
      assert(planned(none) == 0)
      assert(none.count() == 0)
      // a filter on a stats-less (string) column never skips
      val str = spark.read.format("graft-atomic").load(out)
        .filter(col("v") === "v00")
      assert(planned(str) == 3)
      assert(str.count() == 1)
    } finally fs(out).delete(new org.apache.hadoop.fs.Path(out), true)
  }

  test("pre-stats manifests still parse and are never skipped") {
    import spark.implicits._
    val out = scratch("prestats")
    try {
      Seq((1L, 10L), (2L, 20L)).toDF("k", "w").coalesce(1)
        .write.format("graft-atomic").mode("append").save(out)
      val m = latest(out)
      // rewrite the manifest WITHOUT the stats field (the pre-r19 wire
      // format) under the next version
      val root = new org.apache.hadoop.fs.Path(out)
      val mf = AtomicSink.manifestPath(root, m.version + 1)
      val outS = new java.io.OutputStreamWriter(
        fs(out).create(mf, true), java.nio.charset.StandardCharsets.UTF_8)
      outS.write(m.ddl + "\n")
      m.entries.foreach { case (n, r, b) => outS.write(s"$n\t$r\t$b\n") }
      outS.write(s"#COMMIT ${m.entries.length} legacy\n")
      outS.close()
      val m2 = latest(out)
      assert(m2.version == m.version + 1 && m2.stats.isEmpty)
      val filtered = spark.read.format("graft-atomic").load(out)
        .filter(col("k") > 100L) // would skip under stats; must NOT here
      assert(filtered.count() == 0) // row filter still applies
      // and the scan planned every file (no stats = no skip)
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      filtered.collect()
      val n = filtered.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
        .orElse {
          import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
          filtered.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
            .queryExecution.executedPlan.collectFirst {
              case a: AdaptiveSparkPlanExec => a
            }.flatMap(_.executedPlan.collectFirst { case b: BatchScanExec => b })
        }
        .map(_.inputPartitions.length).getOrElse(-1)
      assert(n == m.entries.length, s"planned $n of ${m.entries.length}")
    } finally fs(out).delete(new org.apache.hadoop.fs.Path(out), true)
  }
}
