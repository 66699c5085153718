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
  * rebuilt; a concurrent builder race is settled by
  * [[graft.sources.AtomicDirectoryClaim]] — the repo's ONE directory
  * claim discipline (complete directory or nothing; a loser simply
  * discards its byte-identical build). Readers only ever see a
  * fully-populated table directory.
  *
  * The table root must be a filesystem EVERY executor and driver can
  * see — on a cluster a node-local /tmp would give each node a private
  * (and mutually invisible) copy. Resolution order: Spark conf
  * `graft.termtable.dir`, env `GRAFT_TERMTABLE_DIR`, then
  * `<spark.sql.warehouse.dir>/graft_termtable` (the warehouse dir is by
  * definition the job's shared table location).
  */
object TermTable {

  /** Bump when the tokenization changes — the fingerprint includes it,
    * so stale tables from an older tokenizer are never reused. */
  val TokenizerVersion = 1

  private[graft] def scratchBase(s: SparkSession): String =
    PassCache.scratchBase(s)

  /** The tokenization pass itself — the ONLY place the family's
    * tokenizer is defined (both the one-shot table and the maintained
    * fold go through it). */
  private[graft] def tokenize(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  private def build(s: SparkSession, dir: String): DataFrame =
    tokenize(Tables.documents(s, dir))

  /** Resolved table directory for this (source, tokenizer) — exposed so
    * specs can observe materialization without duplicating the layout. */
  private[graft] def tableRoot(s: SparkSession, dir: String): Path =
    PassCache.tableRoot(s, dir, "tf", s"v$TokenizerVersion")

  /** Per-document term frequencies (doc_id, term, tf), materialized
    * once per (source, tokenizer) and reused by every family member. */
  def termFrequencies(s: SparkSession, dir: String): DataFrame =
    PassCache.materialized(s, tableRoot(s, dir))(build(s, dir))

  /** Corpus-wide term counts (term, n) derived from the shared pass. */
  def termCounts(s: SparkSession, dir: String): DataFrame =
    termFrequencies(s, dir).groupBy(col("term"))
      .agg(sum(col("tf")).cast("long").as("n"))

  // ------------------------------------------------- maintained fold

  /** C13 ∘ A15 — the MAINTAINED term table: fold one batch (a day's
    * ingest) of documents into a `graft-atomic` term table at |Δ|
    * cost. The one-shot table above re-tokenizes the WHOLE corpus
    * whenever its source fingerprint moves — correct, but at 100 TB a
    * daily refresh must not cost a corpus pass. Because every batch
    * carries NEW doc_ids, its (doc_id, term, tf) rows are disjoint
    * from the table's, so incremental maintenance is a pure
    * transactional APPEND of the tokenized delta — no read-modify-
    * write, no re-aggregation of the old corpus, and consumers
    * aggregate at read time exactly as they do over the one-shot
    * table, so a folded table is query-equivalent to a full rebuild
    * (the E85 gate pins the equivalence bit-for-bit against the
    * recomputing oracle). Delivery faults ride graft-atomic's
    * idempotence tag: a re-delivered batch publishes NOTHING (the C7
    * exactly-once discipline), and a crash mid-fold leaves the table
    * at its previous committed version — readers never see a partial
    * day. */
  def foldBatch(s: SparkSession, root: String, docs: DataFrame,
                tag: String): Unit =
    tokenize(docs)
      .write.format("graft-atomic").option("graft.tag", tag)
      .mode("append").save(root)

  /** The maintained table's committed rows (doc_id, term, tf). */
  def foldedTermFrequencies(s: SparkSession, root: String): DataFrame =
    graft.sources.AtomicSink.readCommitted(s, root)

  /** Corpus term counts over the maintained table — same derivation
    * as [[termCounts]], same integer exactness. */
  def foldedTermCounts(s: SparkSession, root: String): DataFrame =
    foldedTermFrequencies(s, root).groupBy(col("term"))
      .agg(sum(col("tf")).cast("long").as("n"))
}

/** The materialize-once machinery shared by every corpus-pass table
  * ([[TermTable]], [[GramTable]]): fingerprint the source, build into a
  * builder-unique tmp directory, bind it to the final name through
  * [[graft.sources.AtomicDirectoryClaim]] — the repo's one directory
  * claim discipline. A loser's build is byte-identical (deterministic
  * aggregate of the same source) and simply discarded; readers only
  * ever see a fully-populated table directory. */
private[graft] object PassCache {

  def scratchBase(s: SparkSession): String =
    s.conf.getOption("graft.termtable.dir")
      .orElse(sys.env.get("GRAFT_TERMTABLE_DIR"))
      .getOrElse(new Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_termtable").toString)

  /** Source fingerprint: path, length and mtime of documents.parquet
    * plus the pass's version tag — any refresh of the source data or
    * bump of the pass definition forces a rebuild. */
  def tableRoot(s: SparkSession, dir: String,
                prefix: String, versionTag: String): Path = {
    val src = new Path(s"$dir/documents.parquet")
    val fs = src.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(src)
    val h = java.security.MessageDigest.getInstance("MD5").digest(
      s"$versionTag|${fs.makeQualified(src)}|${st.getLen}|${st.getModificationTime}"
        .getBytes("UTF-8"))
    new Path(scratchBase(s), s"$prefix-${h.map("%02x".format(_)).mkString.take(16)}")
  }

  def materialized(s: SparkSession, root: Path)(build: => DataFrame): DataFrame = {
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(root, "_SUCCESS"))) {
      val tmp = new Path(root.getParent,
        s"tmp-${java.util.UUID.randomUUID().toString.take(12)}")
      build.write.mode("overwrite").parquet(tmp.toString)
      graft.sources.AtomicDirectoryClaim.tryClaim(fs, tmp, root)
    }
    s.read.parquet(root.toString)
  }
}
