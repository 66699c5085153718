package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

/** The stream gates mutate session-global conf (shuffle partitions)
  * under a sequential-per-session assumption; this pins that the
  * assumption is ENFORCED — a concurrent gate on the same session
  * fails loudly — and that separate sessions (`spark.newSession()`)
  * scope their gate conf independently, so concurrent runners have a
  * sanctioned path. */
class StreamGateGuardSpec extends SparkSpec {

  test("concurrent gates on one session are refused; separate sessions don't clobber") {
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    @volatile var holderFailed: Throwable = null
    val t = new Thread(() => {
      try graft.streaming.StreamGates.withGateConf(spark) {
        entered.countDown()
        release.await(30, TimeUnit.SECONDS); ()
      } catch { case e: Throwable => holderFailed = e; entered.countDown() }
    }, "gate-holder")
    t.start()
    assert(entered.await(30, TimeUnit.SECONDS) && holderFailed == null)
    try {
      // same session, second thread: must fail loudly, not interleave
      val err = intercept[IllegalStateException] {
        graft.streaming.StreamGates.withGateConf(spark) { () }
      }
      assert(err.getMessage.contains("newSession"), err.getMessage)
      // a separate session enters fine while the first is held, sees
      // the gate conf, and restores ITS OWN previous value on exit
      val s2 = spark.newSession()
      val prev2 = s2.conf.get("spark.sql.shuffle.partitions")
      graft.streaming.StreamGates.withGateConf(s2) {
        assert(s2.conf.get("spark.sql.shuffle.partitions") == "4")
      }
      assert(s2.conf.get("spark.sql.shuffle.partitions") == prev2)
    } finally {
      release.countDown()
      t.join(30000)
    }
    assert(holderFailed == null)
    // the holder released cleanly: the first session is usable again
    // and its conf was restored to the pre-gate value
    val prev1 = spark.conf.get("spark.sql.shuffle.partitions")
    graft.streaming.StreamGates.withGateConf(spark) {
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev1)
  }
}
