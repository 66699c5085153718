package graft

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{IvfIndex, Similarity}

/** E87 — incrementally-maintained IVF index: fold equivalence beyond
  * the driver gate, and the drift trigger the gate can't exercise
  * (the gate's deltas are in-distribution by construction). */
class IvfIndexSpec extends SparkSpec {

  private def freshRoot(name: String): String = {
    val root = s"/tmp/graft_ivf_spec/$name"
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    root
  }

  test("quantizer round-trips the atomic store bit-identically") {
    val root = freshRoot("quantizer")
    val e = Tables.embeddings(spark, sf)
    // compare against the TRAINED frame build returns (materialized by
    // localCheckpoint) — retraining would race aggregate summation order
    val trained = IvfIndex.build(spark, root, e.filter(col("vec_id") % 3 === 0))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val reloaded = IvfIndex.centroids(spark, root).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(reloaded.keySet == trained.keySet)
    reloaded.foreach { case (cell, v) => assert(v == trained(cell), s"cell $cell") }
  }

  test("fold(d0)∘fold(d1)∘fold(d2) assignments equal the one-shot batch; replay is a no-op") {
    val root = freshRoot("fold")
    val e = Tables.embeddings(spark, sf)
    def day(i: Int) = e.filter(pmod(col("vec_id"), lit(3)) === i)
    IvfIndex.build(spark, root, day(0))
    IvfIndex.foldBatch(spark, root, day(1), tag = "day-1")
    IvfIndex.foldBatch(spark, root, day(2), tag = "day-2")
    val folded = IvfIndex.assignments(spark, root)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Similarity.assignCells(
        e.select(col("vec_id"), col("embedding")),
        IvfIndex.centroids(spark, root)).collect()
      .map(r => r.getLong(r.fieldIndex("vec_id")) ->
        r.getLong(r.fieldIndex("cell"))).toMap
    assert(folded == batch)
    IvfIndex.foldBatch(spark, root, day(1), tag = "day-1")
    assert(IvfIndex.assignments(spark, root).count() == folded.size.toLong)
  }

  test("drift trigger: in-distribution delta quiet, out-of-distribution delta fires") {
    val root = freshRoot("drift")
    val e = Tables.embeddings(spark, sf)
    def day(i: Int) = e.filter(pmod(col("vec_id"), lit(3)) === i)
    IvfIndex.build(spark, root, day(0))
    val baseline = IvfIndex.driftStats(spark, root, e)
    assert(baseline.meanCos > 0.0, s"degenerate baseline: $baseline")
    // in-distribution: the next real day
    IvfIndex.foldBatch(spark, root, day(1), tag = "day-1")
    val inDist = IvfIndex.driftStats(spark, root, e)
    assert(!IvfIndex.drifted(baseline, inDist),
      s"false drift alarm: $baseline vs $inDist")
    // out-of-distribution: day 2 arrives NEGATED (an embedding-model
    // swap / pipeline bug) — member→centroid cosine collapses
    val negated = day(2).select(col("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    val negRoot = freshRoot("drift_neg")
    IvfIndex.build(spark, negRoot, day(0))
    IvfIndex.foldBatch(spark, negRoot, day(1), tag = "day-1")
    IvfIndex.foldBatch(spark, negRoot, negated, tag = "day-2")
    val negCorpus = day(0).select(col("vec_id"), col("embedding"))
      .unionByName(day(1).select(col("vec_id"), col("embedding")))
      .unionByName(negated)
    val outDist = IvfIndex.driftStats(spark, negRoot, negCorpus)
    assert(IvfIndex.drifted(baseline, outDist),
      s"drift not detected: $baseline vs $outDist")
  }
}
