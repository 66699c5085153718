package graft

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{Sketches => Th}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.functions._

import graft.functions.SketchFns._

/** The mergeable-sketch aggregates (SURVEY §2 E46-E47): exactness
  * below sketch capacity, the two-level (shard build → sketch merge)
  * contract, intersection semantics, SQL registration, and the plan
  * shape of both rollup queries. */
class SketchAggSpec extends SparkSpec {

  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.asInstanceOf[ClassicDataset[_]].queryExecution.executedPlan.toString
  }

  test("theta sketch is exact below nominal capacity, and unions dedup") {
    // 3 shards with overlapping id ranges; 2^12 nominal >> 600 ids
    val df = (0 until 900).map(i => (i % 3, (i % 600).toLong)).toDF("shard", "id")
    val shard = df.groupBy($"shard").agg(thetaSketch($"id", 12).as("sk"))
    val merged = shard.agg(thetaUnion($"sk", 12).as("sk")).head()
    val est = Th.wrapSketch(Memory.wrap(merged.getAs[Array[Byte]]("sk"))).getEstimate
    assert(math.round(est) == 600, s"exact-mode union must dedup to 600, got $est")
  }

  test("two-level theta (shard -> union) equals the one-level sketch") {
    val df = (0 until 5000).map(i => (i % 7, s"user_$i")).toDF("shard", "u")
    val twoLevel = df.groupBy($"shard").agg(thetaSketch($"u", 12).as("sk"))
      .agg(thetaUnion($"sk", 12).as("sk")).head().getAs[Array[Byte]]("sk")
    val oneLevel = df.agg(thetaSketch($"u", 12).as("sk")).head().getAs[Array[Byte]]("sk")
    val e2 = Th.wrapSketch(Memory.wrap(twoLevel)).getEstimate
    val e1 = Th.wrapSketch(Memory.wrap(oneLevel)).getEstimate
    assert(math.abs(e2 - e1) / e1 < 1e-9,
      s"two-level union must equal one-level build: $e2 vs $e1")
  }

  test("theta intersection recovers a planted overlap exactly in exact mode") {
    val a = (0 until 1000).map(i => ("a", i.toLong)) // 0..999
    val b = (600 until 1600).map(i => ("b", i.toLong)) // 600..1599, overlap 400
    val sks = (a ++ b).toDF("side", "id")
      .groupBy($"side").agg(thetaSketch($"id", 12).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap
    val inter = org.apache.datasketches.theta.SetOperation.builder()
      .setLogNominalEntries(12).buildIntersection()
    inter.intersect(Th.wrapSketch(Memory.wrap(sks("a"))))
    inter.intersect(Th.wrapSketch(Memory.wrap(sks("b"))))
    assert(math.round(inter.getResult.getEstimate) == 400)
  }

  test("kll merge: rolled-up quantile rank stays inside 3x the sketch bound") {
    val n = 20000
    val df = (0 until n).map(i => (i % 13, i.toDouble)).toDF("shard", "v")
    val bytes = df.groupBy($"shard").agg(kllSketch($"v", 200).as("sk"))
      .agg(kllMerge($"sk", 200).as("sk")).head().getAs[Array[Byte]]("sk")
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    val eps = org.apache.datasketches.kll.KllSketch.getNormalizedRankError(200, false)
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val q = sk.getQuantile(p,
        org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
      // values are 0..n-1, so the true normalized rank of q is (q+1)/n
      val trueRank = (q + 1.0) / n
      assert(math.abs(trueRank - p) <= 3 * eps,
        s"p=$p: quantile $q has true rank $trueRank, bound ${3 * eps}")
    }
  }

  test("sketch aggregates are SQL-registered") {
    graft.functions.GraftFunctions.register(spark)
    (0 until 100).map(i => (i % 2, i.toLong, i.toDouble)).toDF("g", "id", "v")
      .createOrReplaceTempView("sk_in")
    val row = spark.sql(
      """SELECT theta_union_agg(tsk, 12) AS t, kll_merge_agg(ksk, 200) AS k
        |FROM (SELECT g, theta_sketch_agg(id, 12) AS tsk, kll_agg(v, 200) AS ksk
        |      FROM sk_in GROUP BY g)""".stripMargin).head()
    val est = Th.wrapSketch(Memory.wrap(row.getAs[Array[Byte]]("t"))).getEstimate
    assert(math.round(est) == 100)
    val ksk = KllDoublesSketch.heapify(Memory.wrap(row.getAs[Array[Byte]]("k")))
    assert(ksk.getN == 100)
  }

  test("theta overlap gate: all pairs within tolerance, plan merges sketches") {
    val rows = operators.Sketches.thetaOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("within_tol"),
      s"pair ${r.getString(0)}/${r.getString(1)} estimate out of tolerance"))
    // the rollup level consumes serialized sketches, not events rows
    val audience = Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"), $"user_id")
    val shard = audience.groupBy($"event_type", $"day")
      .agg(thetaSketch(xxhash64($"user_id", $"day"), 14).as("sk"))
    val p = plan(shard.groupBy($"event_type").agg(thetaUnion($"sk", 14).as("sk")))
      .split("== Initial Plan ==")(0)
    assert(p.contains("theta_sketch_agg"), p)
    assert(p.contains("theta_union_agg"), p)
    assert("Scan parquet|FileScan parquet".r.findAllIn(p).size == 1, p)
  }

  test("kll rollup gate: both quantile probes inside the rank bound") {
    val rows = operators.Sketches.kllRollup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_in_bound"), r.toString)
      assert(r.getAs[Boolean]("p90_in_bound"), r.toString)
    }
  }
}
