package graft

import org.apache.spark.sql.functions._
import graft.sources.AtomicSink

/** Oracle-independent invariants for the `graft-atomic` transactional
  * DSv2 sink (A15) — the commit/abort corners the gate's documents
  * round-trip doesn't isolate. */
class AtomicSinkSpec extends SparkSpec {
  import org.apache.hadoop.fs.Path

  private def scratch(tag: String): String =
    s"/tmp/graft_atomic_spec/$tag-${System.nanoTime()}"

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

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
      // truncate reclaimed the previous generation's physical files
      val listed = AtomicSink
        .readManifest(fs(out), new Path(out, AtomicSink.MANIFEST))._2.map(_._1).toSet
      val physical = fs(out).listStatus(new Path(out)).map(_.getPath.getName).toSet
      assert(physical == listed + AtomicSink.MANIFEST)
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
    } finally fs(out).delete(new Path(out), true)
  }

  test("failed job leaves prior state intact and no stray files") {
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
      val listed = AtomicSink
        .readManifest(fs(out), new Path(out, AtomicSink.MANIFEST))._2.map(_._1).toSet
      val physical = fs(out).listStatus(new Path(out)).map(_.getPath.getName).toSet
      assert(physical == listed + AtomicSink.MANIFEST, s"stray files: ${physical -- listed}")
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

  test("vacuum reclaims orphans, keeps committed files and foreign files") {
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
      val (kept, deleted) = AtomicSink.vacuum(spark, out)
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
      val entries = AtomicSink
        .readManifest(fs(out), new Path(out, AtomicSink.MANIFEST))._2
      assert(entries.map(_._2).sum == 100L)
      assert(entries.forall(_._3 > 0L))
    } finally fs(out).delete(new Path(out), true)
  }
}
