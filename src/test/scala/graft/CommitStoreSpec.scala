package graft

import java.net.URI
import java.util.concurrent.{CountDownLatch, CyclicBarrier, TimeUnit}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FileSystem, FileUtil, Path, RawLocalFileSystem}
import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommitStores, AtomicDirectoryClaim, AtomicSink, ConditionalPutCommitStore, RenameCommitStore}

/** A local filesystem masquerading as an object store: `rename` is
  * EMULATED as exists-check + copy + delete — the S3A/GCS shape — so
  * the dest-must-not-exist contract RenameCommitStore relies on does
  * NOT hold. A spec-controlled barrier widens the check-to-copy window
  * so the double-claim race is deterministic, not probabilistic. */
class EmulatedRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3mock"
  override def getUri: URI = URI.create("s3mock:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) return false // the HEAD
    EmulatedRenameFileSystem.renameBarrier.foreach(_.await(10, TimeUnit.SECONDS))
    FileUtil.copy(this, src, this, dst, true, getConf) // the COPY+DELETE
    true
  }
}
object EmulatedRenameFileSystem {
  @volatile var renameBarrier: Option[CyclicBarrier] = None
}

/** FileContext registration for the s3mock scheme (RenameCommitStore
  * claims through FileContext, whose AbstractFileSystem rename does
  * its own exists-check before delegating — exactly the emulated
  * check-then-act being simulated). */
class EmulatedRenameAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new EmulatedRenameFileSystem, conf, "s3mock", false)

/** In-memory simulation of an object store's conditional PUT
  * (`If-None-Match: *`): the claim decision and the content write are
  * one atomic step with exactly one winner per name — what S3/GCS/ABFS
  * provide natively. Used to prove the graft-atomic protocol safe on a
  * filesystem whose rename is NOT. */
class InMemoryCondPutStore extends ConditionalPutCommitStore {
  override def putIfAbsent(fs: FileSystem, dst: Path, content: Array[Byte]): Boolean =
    InMemoryCondPutStore.lock.synchronized {
      val key = fs.makeQualified(dst).toString
      if (InMemoryCondPutStore.claimed.contains(key) || fs.exists(dst)) false
      else {
        // Fidelity matters: a real conditional PUT makes the name and
        // the COMPLETE content visible in one step — an object store
        // never exposes a partially-written object. Writing straight to
        // dst through fs.create would leak a name-visible/content-torn
        // window no real store has (and a concurrent committer reading
        // that torn claim would fold from an older version — a lost
        // update the simulation would be INVENTING). Stage + atomic
        // local move reproduces the real PUT's all-or-nothing.
        val stage = java.nio.file.Files.createTempFile("condput", ".stage")
        java.nio.file.Files.write(stage, content)
        java.nio.file.Files.move(stage,
          java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        InMemoryCondPutStore.claimed += key
        true
      }
    }
}
object InMemoryCondPutStore {
  val lock = new Object
  val claimed: scala.collection.mutable.Set[String] =
    scala.collection.mutable.Set.empty
}

class CommitStoreSpec extends SparkSpec {

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def registerS3Mock(): Unit = {
    hconf.set("fs.s3mock.impl", classOf[EmulatedRenameFileSystem].getName)
    hconf.set("fs.AbstractFileSystem.s3mock.impl",
      classOf[EmulatedRenameAbstractFs].getName)
  }

  private def scratch(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_cstore_$tag")
    d.toString
  }

  test("publish on an emulated-rename scheme is refused loudly, naming the conf key") {
    registerS3Mock()
    val root = "s3mock://" + scratch("refuse")
    val fs = new Path(root).getFileSystem(hconf)
    val e = intercept[UnsupportedOperationException] {
      AtomicSink.publish(fs, new Path(root), "`a` BIGINT",
        Seq(("part-x", 1L, 1L)), truncate = false, tag = None, committerId = "c1")
    }
    assert(e.getMessage.contains(AtomicCommitStores.ConfKey), e.getMessage)
    assert(e.getMessage.contains("s3mock"), e.getMessage)
    // and through the full DSv2 write path: the job must FAIL, not
    // silently publish through a lossy rename
    import spark.implicits._
    val thrown = intercept[Throwable] {
      Seq((1L, "a")).toDF("k", "v").write.format("graft-atomic")
        .mode("append").save(root + "/t1")
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).toSeq
    assert(chain(thrown).exists(_.contains(AtomicCommitStores.ConfKey)),
      chain(thrown).mkString(" | "))
  }

  test("the refusal is load-bearing: emulated rename double-claims under a forced race") {
    registerS3Mock()
    val root = new Path("s3mock://" + scratch("race"))
    val fs = root.getFileSystem(hconf)
    fs.mkdirs(root)
    def writeTmp(n: String, content: String): Path = {
      val p = new Path(root, n)
      val out = fs.create(p, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      p
    }
    val dst = new Path(root, "claim.target")
    EmulatedRenameFileSystem.renameBarrier = Some(new CyclicBarrier(2))
    try {
      val results = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
      val threads = Seq("alpha", "beta").map { who =>
        val t = new Thread(() => {
          val tmp = writeTmp(s"tmp.$who", s"content-$who")
          results.put(who, RenameCommitStore.tryClaim(fs, tmp, dst))
        })
        t.start(); t
      }
      threads.foreach(_.join(20000))
      // BOTH committers believe they won — the lost update the scheme
      // refusal in AtomicCommitStores exists to prevent
      assert(results.get("alpha") && results.get("beta"),
        s"expected a double-claim on the emulated store, got $results")
      // two winners, one blob: at most one claim's content can survive —
      // and because the two copy streams raced on the same name, the
      // survivor is often a TORN interleaving of both (observed:
      // "content-betaa" = beta's bytes over alpha's longer tail).
      // Either way at least one "successful" commit's content is gone.
      val survivor = new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(dst)), "UTF-8")
      val aIntact = survivor == "content-alpha"
      val bIntact = survivor == "content-beta"
      assert(!(aIntact && bIntact),
        s"impossible: both contents intact in one blob ($survivor)")
    } finally EmulatedRenameFileSystem.renameBarrier = None
  }

  test("conditional-PUT store makes the same scheme race-safe: no append is ever dropped") {
    registerS3Mock()
    hconf.set(AtomicCommitStores.ConfKey, classOf[InMemoryCondPutStore].getName)
    try {
      val root = new Path("s3mock://" + scratch("condput"))
      val fs = root.getFileSystem(hconf)
      fs.mkdirs(root)
      val perThread = 20
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val start = new CountDownLatch(1)
      val threads = Seq("a", "b").map { who =>
        val t = new Thread(() => {
          start.await()
          (0 until perThread).foreach { i =>
            try {
              val name = s"part-$who-$i"
              val out = fs.create(new Path(root, name), true)
              try out.write('x') finally out.close()
              val v = AtomicSink.publish(fs, root, "`a` BIGINT",
                Seq((name, 1L, 1L)), truncate = false, tag = None,
                committerId = s"$who-$i")
              assert(v > 0, s"publish $name returned $v")
            } catch { case e: Throwable => errors.add(e) }
          }
        })
        t.start(); t
      }
      start.countDown()
      threads.foreach(_.join(120000))
      assert(errors.isEmpty, s"publish errors: ${errors.toArray.mkString("; ")}")
      val m = AtomicSink.latestManifest(fs, root).get
      val expected = (for (w <- Seq("a", "b"); i <- 0 until perThread)
        yield s"part-$w-$i").toSet
      val listed = m.entries.map(_._1)
      assert(listed.toSet == expected,
        s"missing: ${expected -- listed.toSet}; extra: ${listed.toSet -- expected}")
      assert(listed.size == listed.distinct.size, "an entry folded twice")
      assert(m.version == (2 * perThread).toLong)
    } finally hconf.unset(AtomicCommitStores.ConfKey)
  }

  test("directory claim: two racers, one winner, loser never nests inside the table") {
    val base = new Path(scratch("dirclaim"))
    val fs = base.getFileSystem(hconf)
    def buildTmp(who: String): Path = {
      val t = new Path(base, s"tmp-$who")
      fs.mkdirs(t)
      val out = fs.create(new Path(t, s"part-$who"), true)
      try out.write(who.getBytes("UTF-8")) finally out.close()
      t
    }
    val dst = new Path(base, "tf-race")
    val results = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    val threads = Seq("alpha", "beta").map { who =>
      val tmp = buildTmp(who) // built BEFORE the gun so the claims collide
      val t = new Thread(() => {
        start.await()
        try results.put(who, AtomicDirectoryClaim.tryClaim(fs, tmp, dst))
        catch { case e: Throwable => errors.add(e) }
      })
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join(20000))
    assert(errors.isEmpty, errors.toArray.mkString("; "))
    val wins = Seq("alpha", "beta").filter(results.get(_))
    assert(wins.size == 1, s"expected exactly one winner, got $results")
    // the published table holds EXACTLY the winner's content — no
    // nested tmp-* directory, no loser files, and both tmps consumed
    val inside = fs.listStatus(dst).map(_.getPath.getName).toSet
    assert(inside == Set(s"part-${wins.head}"),
      s"published dir poisoned: $inside")
    assert(!fs.exists(new Path(base, "tmp-alpha")) &&
      !fs.exists(new Path(base, "tmp-beta")), "a tmp dir survived the claim")
  }

  test("the directory primitive is load-bearing: Hadoop's local rename copy-nests a loser") {
    // deterministic reproduction of the failure AtomicDirectoryClaim
    // exists to prevent: once a winner has published dst, a loser's
    // FileSystem.rename(tmp, dst) on the local scheme moves tmp INSIDE
    // dst instead of failing — poisoning the table for every reader
    val base = new Path(scratch("dirnest"))
    val fs = base.getFileSystem(hconf)
    val dst = new Path(base, "tf-table")
    fs.mkdirs(dst) // the winner's published table — NON-empty, as a
    fs.create(new Path(dst, "part-winner"), true).close() // real table is
    val tmp = new Path(base, "tmp-loser")
    fs.mkdirs(tmp)
    fs.create(new Path(tmp, "part-loser"), true).close()
    assert(fs.rename(tmp, dst), "hadoop local rename 'succeeded' into dst")
    assert(fs.exists(new Path(dst, "tmp-loser/part-loser")),
      "expected the documented nesting failure from hadoop's local rename")
    // the claim primitive on the same layout refuses cleanly instead
    val tmp2 = new Path(base, "tmp-loser2")
    fs.mkdirs(tmp2)
    fs.create(new Path(tmp2, "part-loser2"), true).close()
    assert(!AtomicDirectoryClaim.tryClaim(fs, tmp2, dst))
    assert(!fs.exists(new Path(dst, "tmp-loser2")), "claim nested the loser")
    assert(!fs.exists(tmp2), "loser tmp not consumed")
  }

  test("two REAL JVMs race 30 tagged appends: every commit visible exactly once") {
    // stronger than the in-process stress below: each committer is its
    // own process, so nothing but the filesystem claim primitive
    // (hard-link CAS on local) arbitrates between them
    val root = scratch("procrace")
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val perProc = 15
    val procs = Seq("p1", "p2").map { who =>
      new ProcessBuilder(java, "-Xmx1g", "-cp", cp,
        "--add-opens=java.base/java.lang=ALL-UNNAMED",
        "--add-opens=java.base/java.nio=ALL-UNNAMED",
        "--add-opens=java.base/java.util=ALL-UNNAMED",
        "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
        "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
        "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
        "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
        "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED",
        "graft.RaceAppend", root, who, perProc.toString)
        .redirectErrorStream(true).start()
    }
    val outputs = procs.map { p =>
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      val rc = if (p.waitFor(300, TimeUnit.SECONDS)) p.exitValue() else {
        p.destroyForcibly(); -1
      }
      (rc, out)
    }
    outputs.foreach { case (rc, out) =>
      assert(rc == 0, s"committer process failed (rc=$rc):\n${out.takeRight(2000)}")
    }
    val fs = new Path(root).getFileSystem(hconf)
    val m = AtomicSink.latestManifest(fs, new Path(root)).get
    val expectedTags = (for (w <- Seq("p1", "p2"); i <- 0 until perProc)
      yield s"tag-$w-$i").toSet
    assert(m.tags == expectedTags,
      s"missing tags: ${expectedTags -- m.tags}; extra: ${m.tags -- expectedTags}")
    val listed = m.entries.map(_._1)
    assert(listed.size == 2 * perProc && listed.distinct.size == listed.size)
    val got = AtomicSink.readCommitted(spark, root)
      .select("src").collect().map(_.getString(0)).toSeq
    assert(got.size == 2 * perProc && got.toSet.size == got.size,
      s"rows read back: ${got.size}, distinct: ${got.toSet.size}")
  }

  test("stress: 100+ racing tagged appends from independent sessions, zero lost updates") {
    val root = scratch("stress")
    val perThread = 50
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new CountDownLatch(1)
    // independent SparkSessions (shared context, separate states) —
    // each thread drives REAL DSv2 write jobs, so the race covers task
    // write, commit coordination, and the manifest CAS end to end
    val threads = Seq("a", "b").map { who =>
      val sess = spark.newSession()
      val t = new Thread(() => {
        start.await()
        (0 until perThread).foreach { i =>
          try {
            sess.range(0, 1, 1, 1).select(
              lit(s"$who-$i").as("src"), col("id").cast("long").as("n"))
              .write.format("graft-atomic")
              .option("graft.tag", s"tag-$who-$i")
              .mode("append").save(root)
          } catch { case e: Throwable => errors.add(e) }
        }
      })
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join(600000))
    assert(errors.isEmpty, s"write errors: ${errors.toArray.take(3).mkString("; ")}")
    val fs = new Path(root).getFileSystem(hconf)
    val m = AtomicSink.latestManifest(fs, new Path(root)).get
    val expectedTags = (for (w <- Seq("a", "b"); i <- 0 until perThread)
      yield s"tag-$w-$i").toSet
    assert(m.tags == expectedTags,
      s"missing tags: ${expectedTags -- m.tags}; extra: ${m.tags -- expectedTags}")
    val listed = m.entries.map(_._1)
    assert(listed.size == listed.distinct.size, "a file folded twice")
    assert(listed.size == 2 * perThread, s"expected ${2 * perThread} files, got ${listed.size}")
    // every appended row is visible exactly once
    val got = AtomicSink.readCommitted(spark, root)
      .select("src").collect().map(_.getString(0)).toSeq
    assert(got.size == 2 * perThread)
    assert(got.toSet.size == got.size, "a row read back twice")
  }
}
