import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeCdc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.CdcChunks.cdcChunks
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val base = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val planted = base
        .filter(col("doc_id") % 10 === 0 && octet_length(col("text")) >= 200)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(lit("EDIT-"), col("doc_id"), lit(": "), col("text")).as("text"))
      val all = base.union(planted)
      val chunked = all.select(col("doc_id"),
        cdcChunks(col("text"), maskBits = 4, minLen = 8, maxLen = 128).as("chunks"))
      val ex = chunked.select(col("doc_id"), explode(col("chunks")).as("c"))
        .select(col("doc_id"), col("c.chunk_len").as("len"), col("c.chunk_hash").as("h"))
      val src = ex.filter(col("doc_id") % 10 === 0 && col("doc_id") < 100000)
        .groupBy(col("doc_id"), col("len"), col("h")).agg(count(lit(1)).as("n_src"))
      val cp = ex.filter(col("doc_id") >= 100000)
        .select((col("doc_id") - 100000).as("doc_id"), col("len"), col("h"))
        .groupBy(col("doc_id"), col("len"), col("h")).agg(count(lit(1)).as("n_cp"))
      val shared = cp.join(src, Seq("doc_id", "len", "h"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(least(col("n_cp"), coalesce(col("n_src"), lit(0L)))).as("n_shared"),
          sum(col("n_cp")).as("n_total"))
        .withColumn("frac", col("n_shared").cast("double")/col("n_total"))
      val lens = base.select(col("doc_id"), octet_length(col("text")).as("blen"))
      // eligibility: source chunking fully content-defined (no forced maxLen cuts)
      val srcMax = chunked.filter(col("doc_id") % 10 === 0 && col("doc_id") < 100000)
        .select(col("doc_id"),
          expr("aggregate(chunks, 0L, (a, c) -> GREATEST(a, c.chunk_len))").as("maxc"))
      val j = shared.join(lens, "doc_id").join(srcMax, "doc_id")
      val elig = j.filter(col("maxc") < 128)
      println(s"[probe] $dir eligible=" + elig.count() + " of " + j.count())
      val rows = elig.orderBy(col("frac")).limit(5).collect()
      println(s"[probe] $dir worst ELIGIBLE fracs (doc_id, shared, total, frac, blen, maxc):")
      rows.foreach(r => println(s"[probe]   $r"))
    }
    spark.stop()
  }
}
