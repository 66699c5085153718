package graft

import java.net.InetSocketAddress
import java.util.concurrent.CountDownLatch

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.Path

import graft.sources.{AtomicCommitStores, AtomicSink, HttpConditionalPutCommitStore}

/** Drives [[graft.sources.HttpConditionalPutCommitStore]] against a
  * REAL HTTP round-trip: a local shim implementing the
  * `If-None-Match: *` create-if-absent contract (the S3 PutObject
  * shape), backed by the SAME directory the emulated-rename
  * [[EmulatedRenameFileSystem]] serves — so a successful PUT is
  * exactly "the object the readers will open appeared atomically with
  * complete content", and the whole graft-atomic publish protocol runs
  * end-to-end over a scheme whose rename is NOT trustworthy. */
class HttpCommitStoreSpec extends SparkSpec {

  private def hconf = spark.sparkContext.hadoopConfiguration

  /** If-None-Match shim: one synchronized create-if-absent per PUT.
    * Name + content appear in one step (temp file + ATOMIC_MOVE),
    * mirroring a real object PUT's all-or-nothing visibility. */
  private def startShim(): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val lock = new Object
    server.createContext("/", (ex: HttpExchange) => {
      try {
        val body = ex.getRequestBody.readAllBytes()
        if (ex.getRequestMethod != "PUT") ex.sendResponseHeaders(405, -1)
        else if (ex.getRequestHeaders.getFirst("If-None-Match") != "*")
          ex.sendResponseHeaders(400, -1) // unconditional PUT: refuse — it could lose updates
        else {
          val target = java.nio.file.Paths.get(ex.getRequestURI.getPath)
          val status = lock.synchronized {
            if (java.nio.file.Files.exists(target)) 412
            else {
              java.nio.file.Files.createDirectories(target.getParent)
              val stage = java.nio.file.Files.createTempFile("shim", ".put")
              java.nio.file.Files.write(stage, body)
              java.nio.file.Files.move(stage, target,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              201
            }
          }
          ex.sendResponseHeaders(status, -1)
        }
      } finally ex.close()
    })
    server.start()
    server
  }

  private def registerS3Mock(): Unit = {
    hconf.set("fs.s3mock.impl", classOf[EmulatedRenameFileSystem].getName)
    hconf.set("fs.AbstractFileSystem.s3mock.impl",
      classOf[EmulatedRenameAbstractFs].getName)
  }

  test("HTTP If-None-Match claim: two racers, one 201, one 412, content intact") {
    registerS3Mock()
    val server = startShim()
    hconf.set(HttpConditionalPutCommitStore.EndpointKey,
      s"http://127.0.0.1:${server.getAddress.getPort}")
    try {
      val root = new Path("s3mock://" +
        java.nio.file.Files.createTempDirectory("graft_http_race"))
      val fs = root.getFileSystem(hconf)
      val store = new HttpConditionalPutCommitStore
      def writeTmp(who: String): Path = {
        val p = new Path(root, s"tmp.$who")
        val out = fs.create(p, true)
        try out.write(s"content-$who".getBytes("UTF-8")) finally out.close()
        p
      }
      val dst = new Path(root, "claim.target")
      val results = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val start = new CountDownLatch(1)
      val threads = Seq("alpha", "beta").map { who =>
        val tmp = writeTmp(who)
        val t = new Thread(() => {
          start.await()
          try results.put(who, store.tryClaim(fs, tmp, dst))
          catch { case e: Throwable => errors.add(e) }
        })
        t.start(); t
      }
      start.countDown()
      threads.foreach(_.join(20000))
      assert(errors.isEmpty, errors.toArray.mkString("; "))
      val wins = Seq("alpha", "beta").filter(results.get(_))
      assert(wins.size == 1, s"expected exactly one winner, got $results")
      val got = new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(dst)), "UTF-8")
      assert(got == s"content-${wins.head}",
        s"claimed object is not the winner's complete content: $got")
      assert(!fs.exists(new Path(root, "tmp.alpha")) &&
        !fs.exists(new Path(root, "tmp.beta")), "a tmp survived the claim")
    } finally {
      server.stop(0)
      hconf.unset(HttpConditionalPutCommitStore.EndpointKey)
    }
  }

  test("full publish protocol over HTTP claims: racing appends, zero lost updates") {
    registerS3Mock()
    val server = startShim()
    hconf.set(HttpConditionalPutCommitStore.EndpointKey,
      s"http://127.0.0.1:${server.getAddress.getPort}")
    hconf.set(AtomicCommitStores.ConfKey,
      classOf[HttpConditionalPutCommitStore].getName)
    try {
      val root = new Path("s3mock://" +
        java.nio.file.Files.createTempDirectory("graft_http_publish"))
      val fs = root.getFileSystem(hconf)
      fs.mkdirs(root)
      val perThread = 15
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
    } finally {
      server.stop(0)
      hconf.unset(HttpConditionalPutCommitStore.EndpointKey)
      hconf.unset(AtomicCommitStores.ConfKey)
    }
  }

  test("a non-claim HTTP status surfaces as an error, not a lost race") {
    registerS3Mock()
    // an endpoint that always answers 503: the claim must raise, not
    // spin the publish loop reporting fake contention
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      try { ex.getRequestBody.readAllBytes(); ex.sendResponseHeaders(503, -1) }
      finally ex.close()
    })
    server.start()
    hconf.set(HttpConditionalPutCommitStore.EndpointKey,
      s"http://127.0.0.1:${server.getAddress.getPort}")
    try {
      val root = new Path("s3mock://" +
        java.nio.file.Files.createTempDirectory("graft_http_err"))
      val fs = root.getFileSystem(hconf)
      val tmp = new Path(root, "tmp.x")
      val out = fs.create(tmp, true)
      try out.write('x') finally out.close()
      val e = intercept[java.io.IOException] {
        (new HttpConditionalPutCommitStore).tryClaim(fs, tmp, new Path(root, "dst"))
      }
      assert(e.getMessage.contains("503"), e.getMessage)
    } finally {
      server.stop(0)
      hconf.unset(HttpConditionalPutCommitStore.EndpointKey)
    }
  }
}
