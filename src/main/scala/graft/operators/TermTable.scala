package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** ONE shared tokenization pass for the corpus-analytics family
  * (SURVEY.md §2 E15 top_terms, E22 tfidf_top, E34 oov_rate, E48
  * vocab_coverage, E58 zipf_fit — all of which tokenize identically:
  * `explode(split(lower(text), " "))`, empty tokens dropped).
  *
  * Before this table each of those queries re-exploded and re-shuffled
  * the whole corpus to rebuild the same (doc, term, tf) aggregate — a
  * curation run over 100 TB paid ~5 corpus passes for one logical
  * tokenization. This is the C13 incremental-fold discipline applied
  * to the read side: the pass is materialized ONCE as a parquet table
  * keyed by a fingerprint of the source (path + length + mtime of
  * documents.parquet + tokenizer version), and every family member
  * derives its exact result from it —
  *
  *   - per-doc term frequencies: the table verbatim (tfidf_top),
  *   - corpus term counts: `sum(tf) GROUP BY term` (top_terms,
  *     vocab_coverage, zipf_fit, oov_rate's vocabulary),
  *   - per-doc token totals: `sum(tf) GROUP BY doc_id` (oov_rate).
  *
  * All integer-exact, so every consumer's output is bit-identical to
  * its re-tokenizing form (spec-pinned). A stale or missing table is
  * rebuilt; a concurrent builder race is settled by an atomic
  * directory-rename claim (complete directory or nothing — the same
  * publish-by-rename shape as graft-atomic, coarse-grained because a
  * loser simply discards its identical build). Readers only ever see
  * a fully-populated table directory.
  */
object TermTable {

  /** Bump when the tokenization changes — the fingerprint includes it,
    * so stale tables from an older tokenizer are never reused. */
  val TokenizerVersion = 1

  private def scratchBase: String =
    sys.env.getOrElse("GRAFT_TERMTABLE_DIR", "/tmp/graft_termtable")

  /** Source fingerprint: path, length and mtime of documents.parquet —
    * any refresh of the source data changes it and forces a rebuild. */
  private def fingerprint(s: SparkSession, dir: String): String = {
    val src = new Path(s"$dir/documents.parquet")
    val fs = src.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(src)
    val h = java.security.MessageDigest.getInstance("MD5").digest(
      s"v$TokenizerVersion|${fs.makeQualified(src)}|${st.getLen}|${st.getModificationTime}"
        .getBytes("UTF-8"))
    h.map("%02x".format(_)).mkString.take(16)
  }

  /** The tokenization pass itself — the ONLY place the family's
    * tokenizer is defined. */
  private def build(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  /** Per-document term frequencies (doc_id, term, tf), materialized
    * once per (source, tokenizer) and reused by every family member. */
  def termFrequencies(s: SparkSession, dir: String): DataFrame = {
    val root = new Path(scratchBase, s"tf-${fingerprint(s, dir)}")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(root, "_SUCCESS"))) {
      val tmp = new Path(scratchBase,
        s"tmp-${java.util.UUID.randomUUID().toString.take(12)}")
      build(s, dir).write.mode("overwrite").parquet(tmp.toString)
      // atomic claim: rename the COMPLETE build onto the final name —
      // exactly one builder wins; a loser's build is byte-identical
      // (deterministic aggregate of the same source), discard it.
      // FileContext, not FileSystem.rename: the latter moves src INTO
      // an existing dst directory (nesting a stray parquet dir inside
      // the table a concurrent winner just published); FileContext's
      // dest-must-not-exist rename fails cleanly instead.
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.makeQualified(root).toUri, s.sparkContext.hadoopConfiguration)
      val won =
        try { fc.rename(fs.makeQualified(tmp), fs.makeQualified(root)); true }
        catch { case _: java.io.IOException => false }
      if (!won) fs.delete(tmp, true)
    }
    s.read.parquet(root.toString)
  }

  /** Corpus-wide term counts (term, n) derived from the shared pass. */
  def termCounts(s: SparkSession, dir: String): DataFrame =
    termFrequencies(s, dir).groupBy(col("term"))
      .agg(sum(col("tf")).cast("long").as("n"))
}
