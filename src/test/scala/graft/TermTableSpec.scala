package graft

import org.apache.spark.sql.functions._
import graft.operators.{TermTable, TrainingQueries, CorpusAnalytics}

class TermTableSpec extends SparkSpec {

  // resolved through TermTable itself (warehouse-derived by default) so
  // the spec tracks the real layout instead of a hardcoded /tmp path
  private def tableBase: java.io.File = new java.io.File(
    new org.apache.hadoop.fs.Path(TermTable.scratchBase(spark)).toUri.getPath)

  private def listTables(): Set[String] = {
    val d = tableBase
    if (!d.exists()) Set.empty
    else d.listFiles().map(_.getName).filter(_.startsWith("tf-")).toSet
  }

  test("the shared pass materializes once and is reused, not rebuilt") {
    val before = listTables()
    TermTable.termFrequencies(spark, sf).count()
    val after1 = listTables()
    assert((after1 -- before).size <= 1) // at most one new table for this sf
    val tableDirs = after1
    // mtime of the table dir must not change on a second call
    val dir = tableBase
    def stamp(): Map[String, Long] =
      dir.listFiles().filter(f => tableDirs(f.getName))
        .map(f => f.getName -> f.lastModified()).toMap
    val s1 = stamp()
    TermTable.termCounts(spark, sf).count()
    TermTable.termFrequencies(spark, sf).count()
    assert(stamp() == s1, "a reuse call rebuilt the table")
    assert(listTables() == after1, "a reuse call created a new table dir")
  }

  test("every family member is bit-identical to its re-tokenizing form") {
    import spark.implicits._
    // the inline reference form, written here independently
    val inlineTf = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val shared = TermTable.termFrequencies(spark, sf)
    val a = inlineTf.as[(Long, String, Long)].collect().toSet
    val b = shared.select(col("doc_id"), col("term"), col("tf"))
      .as[(Long, String, Long)].collect().toSet
    assert(a == b, s"tf tables differ: ${(a -- b).take(3)} / ${(b -- a).take(3)}")
    // and a corpus-count consumer: top_terms vs inline recompute
    val inlineTop = inlineTf.groupBy(col("term"))
      .agg(sum(col("tf")).cast("long").as("n"))
      .orderBy(col("n").desc, col("term").asc).limit(100)
      .as[(String, Long)].collect().toSeq
    val top = TrainingQueries.topTerms(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(top == inlineTop)
  }

  test("a refreshed source forces a rebuild (fingerprint covers mtime/len)") {
    // copy the documents table to a scratch dir twice with different
    // mtimes: the two builds must land in different table dirs
    val scratch = java.nio.file.Files.createTempDirectory("graft_tt_src").toString
    val src = java.nio.file.Paths.get(s"$sf/documents.parquet")
    val dst = java.nio.file.Paths.get(s"$scratch/documents.parquet")
    java.nio.file.Files.copy(src, dst)
    TermTable.termFrequencies(spark, scratch).count()
    val t1 = listTables()
    dst.toFile.setLastModified(System.currentTimeMillis() + 60000)
    TermTable.termFrequencies(spark, scratch).count()
    val t2 = listTables()
    assert((t2 -- t1).size == 1, "refreshed source did not trigger a rebuild")
  }

  test("maintained fold equals the one-shot build bit-for-bit; a replay folds nothing") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_tt_fold").toString + "/t"
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    (0 until 3).foreach { day =>
      TermTable.foldBatch(spark, root,
        docs.filter(pmod(col("doc_id"), lit(3)) === day), tag = s"d$day")
    }
    def rows() = TermTable.foldedTermFrequencies(spark, root)
      .as[(Long, String, Long)].collect().toSet
    val folded = rows()
    val oneShot = TermTable.termFrequencies(spark, sf)
      .as[(Long, String, Long)].collect().toSet
    assert(folded == oneShot, s"fold diverged: ${(folded -- oneShot).take(3)} / " +
      s"${(oneShot -- folded).take(3)}")
    // replayed day: same tag, must publish nothing
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vBefore = graft.sources.AtomicSink
      .latestManifest(fs, new org.apache.hadoop.fs.Path(root)).get.version
    TermTable.foldBatch(spark, root,
      docs.filter(pmod(col("doc_id"), lit(3)) === 1), tag = "d1")
    val vAfter = graft.sources.AtomicSink
      .latestManifest(fs, new org.apache.hadoop.fs.Path(root)).get.version
    assert(vAfter == vBefore, "a replayed batch published a new version")
    assert(rows() == oneShot, "a replayed batch changed the table")
  }

  test("gram-table fold equals the one-shot shingling bit-for-bit; replay folds nothing") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_gt_fold").toString + "/t"
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"), col("text"))
    (0 until 3).foreach { day =>
      graft.operators.GramTable.foldBatch(spark, root,
        docs.filter(pmod(col("doc_id"), lit(3)) === day), tag = s"d$day")
    }
    def rows() = graft.operators.GramTable.foldedDocGrams(spark, root)
      .as[(Long, String, Long, Long)].collect().toSet
    val folded = rows()
    val oneShot = graft.operators.GramTable.docGrams(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(folded == oneShot, s"fold diverged: ${(folded -- oneShot).take(3)} / " +
      s"${(oneShot -- folded).take(3)}")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vBefore = graft.sources.AtomicSink
      .latestManifest(fs, new org.apache.hadoop.fs.Path(root)).get.version
    graft.operators.GramTable.foldBatch(spark, root,
      docs.filter(pmod(col("doc_id"), lit(3)) === 1), tag = "d1")
    val vAfter = graft.sources.AtomicSink
      .latestManifest(fs, new org.apache.hadoop.fs.Path(root)).get.version
    assert(vAfter == vBefore, "a replayed batch published a new version")
    assert(rows() == oneShot, "a replayed batch changed the table")
  }

  test("concurrent first builds settle on one table, both callers read it") {
    val scratch = java.nio.file.Files.createTempDirectory("graft_tt_race").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      java.nio.file.Paths.get(s"$scratch/documents.parquet"))
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { _ =>
      val t = new Thread(() => {
        try results.add(TermTable.termFrequencies(spark, scratch).count())
        catch { case e: Throwable => errors.add(e) }
      })
      t.start(); t
    }
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, errors.toArray.mkString("; "))
    val counts = results.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSet
    assert(counts.size == 1 && counts.head > 0, s"divergent counts: $counts")
  }
}
