package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scale-slope tooling: derive a smaller, distribution-faithful slice
  * of an SF dir by deterministic key-mod filtering (1/m of each fact
  * table; dims copied whole — at every TPC-H SF the dims are the same
  * order of magnitude, and keeping them intact preserves join
  * selectivities). Tables are read and written RAW (no normalization)
  * so physical parquet types match the source exactly. Facts filter on
  * their primary entity key so referential integrity survives:
  * lineitem follows orders via l_orderkey; events keeps every event of
  * 1/m of the users so per-user temporal density (sessionization,
  * windows) is preserved rather than thinned.
  *
  *   sbt "runMain graft.MakeSlice /root/testdata/sf0.1 /tmp/sfslice_0.02 5"
  */
object MakeSlice {
  def main(args: Array[String]): Unit = {
    val (src, out, m) = (args(0), args(1), args(2).toLong)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val keyOf = Map(
      "orders" -> "o_orderkey", "lineitem" -> "l_orderkey",
      "events" -> "user_id", "documents" -> "doc_id",
      "embeddings" -> "vec_id")
    Tables.all.foreach { t =>
      val raw = spark.read.parquet(s"$src/$t.parquet")
      val sliced = keyOf.get(t) match {
        case Some(k) => raw.filter(col(k) % m === 0)
        case None    => raw
      }
      sliced.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[slice] $t: ${sliced.count()} rows")
    }
    spark.stop()
  }
}
