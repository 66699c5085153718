package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines
  * (SURVEY.md §2 E16-E19): deterministic train/valid/test assignment,
  * stratified sampling, fixed-budget sequence packing, and
  * sliding-window chunking. These are the steps between "deduped
  * documents" and "batches a trainer can consume".
  *
  * Scale notes: split assignment and chunking are pure per-row
  * projections (no shuffle, whole-stage codegen). Packing windows by
  * `source`, never globally, so the sort-shuffle parallelizes across
  * sources. Stratified sampling pushes the per-stratum Bernoulli draw
  * into the scan (`sampleBy` = one filter, no shuffle).
  */
object Corpus {

  /** Deterministic train/valid/test assignment from the document id —
    * the standard "hash mod 10" split, written with a bounded
    * multiplicative hash so the arithmetic can't overflow in ANY
    * engine (ids are first reduced mod 1e6+3, so the product stays
    * < 2^52): reproducible across runs, engines, and repartitions,
    * unlike `rand()`-based splits. 8/1/1 by default. */
  def splitColumn(idCol: Column, trainBuckets: Int = 8, validBuckets: Int = 1): Column = {
    val bucket = pmod((idCol % 1000003L) * 2654435761L, lit(10L))
    when(bucket < trainBuckets, "train")
      .when(bucket < trainBuckets + validBuckets, "valid")
      .otherwise("test")
  }

  /** Per-split corpus accounting: documents and characters per
    * (split, lang) — the sanity check every corpus build runs after
    * assignment. */
  def splitSummary(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.withColumn("split", splitColumn(col(idCol)))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))

  /** Stratified sample: per-stratum Bernoulli fractions with a fixed
    * seed (`sampleBy`). Hash-based and reproducible for a given seed,
    * but the hash is engine-specific — verify proportions, not exact
    * membership. */
  def stratifiedSample(docs: DataFrame, strataCol: String,
                       fractions: Map[String, Double], seed: Long): DataFrame =
    docs.stat.sampleBy(strataCol, fractions, seed)

  /** Fixed-budget contiguous sequence packing: per `source` (in
    * doc_id order), a document joins the pack its starting token
    * offset falls in — pack k covers offsets [k·budget, (k+1)·budget).
    * One sort-shuffle per source partition; no driver state. A pack
    * can overhang its budget by at most one document (the trainer-side
    * convention: the overhanging tail is truncated or wrapped). */
  def packSequences(docs: DataFrame, budget: Int = 256,
                    idCol: String = "doc_id", textCol: String = "text",
                    byCol: String = "source"): DataFrame = {
    val w = Window.partitionBy(col(byCol)).orderBy(col(idCol))
    docs
      .select(col(byCol), col(idCol), size(split(col(textCol), " ")).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("cum") - col("n_tokens")) / lit(budget.toDouble)))
      .groupBy(col(byCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
  }

  /** Sliding-window token chunking: split each document into chunks of
    * `chunkTokens` tokens advancing by `stride` (overlap =
    * chunkTokens - stride), the context-window preparation step for
    * LLM training. Pure projection + explode — no shuffle; chunk
    * count per doc is ⌈(n-C)/S⌉+1 so every token is covered and the
    * last chunk may be short. */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 64, stride: Int = 48,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(stride > 0 && stride <= chunkTokens,
      s"stride must be in (0, chunkTokens]; got stride=$stride chunkTokens=$chunkTokens")
    val withToks = docs.select(col(idCol), split(col(textCol), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("n_chunks",
        when(col("n") <= chunkTokens, lit(1L))
          .otherwise(ceil((col("n") - chunkTokens) / lit(stride.toDouble)) + 1L))
    withToks
      .select(col(idCol), col("toks"), col("n"),
        posexplode(sequence(lit(0L), col("n_chunks") - 1L)).as(Seq("chunk_idx", "_c")))
      .select(col(idCol), col("chunk_idx").cast("int").as("chunk_idx"),
        concat_ws(" ", slice(col("toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), col("n") - col("chunk_idx") * stride)
          .cast("int").as("chunk_tokens"))
  }

  /** Cross-document boilerplate scoring (E28) — the CCNet/RefinedWeb
    * duplicated-content signal: for each document, the fraction of its
    * distinct `n`-grams that occur in at least `minDocs` documents.
    * Headers, footers, license blurbs, and templated spans repeat
    * across a corpus; a doc dominated by such shared n-grams is
    * boilerplate and is dropped (`keep` = ratio ≤ maxRatio).
    *
    * Scale shape: the docfreq aggregate shuffles gram partials once
    * (map-side combine absorbs hot grams), then only the grams at
    * docfreq ≥ minDocs — the "common" set, orders of magnitude smaller
    * than the gram universe — come back as a BROADCAST membership
    * probe, so the per-doc side never shuffles on the gram key at all
    * (the hot keys there are, by definition, the boilerplate grams).
    * Set `broadcastCommon=false` if the common set ever outgrows the
    * driver: the probe degrades to a shuffle join and AQE's skew split
    * covers the hot grams. `hashGrams=true` is the 100 TB mode:
    * shuffle 8-byte xxhash64 keys instead of the gram strings (an
    * order of magnitude less exchange volume; a hash collision merges
    * two grams' docfreq, P ≈ G²/2⁶⁵ — irrelevant for a boilerplate
    * ratio). The exact-string default is what the DuckDB oracle
    * checks. */
  def boilerplateScore(docs: DataFrame, n: Int = 5, minDocs: Int = 3,
                       maxRatio: Double = 0.5, hashGrams: Boolean = false,
                       broadcastCommon: Boolean = true,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // hashGrams never even BUILDS gram strings: WordShingleHashes
    // hashes each window as a byte range of the text (values identical
    // to xxhash64(gram), zero slice/join allocations)
    val grams =
      if (hashGrams) docs.select(col(idCol),
        explode(graft.functions.HashExprs.wordShingleHashes(col(textCol), n))
          .as("gram"))
      else docs.select(col(idCol),
        explode(Dedup.wordShingles(textCol, n)).as("gram"))
    // each doc's grams are distinct → count(*) IS the document frequency
    val common = grams.groupBy(col("gram")).agg(count(lit(1)).as("docfreq"))
      .filter(col("docfreq") >= minDocs)
      .select(col("gram"), lit(1L).as("is_common"))
    grams.join(if (broadcastCommon) broadcast(common) else common,
        Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("is_common"), lit(0L))).as("n_common"))
      .select(col(idCol), col("n_grams"), col("n_common"),
        round(col("n_common").cast("double") / col("n_grams"), 6).as("boiler_ratio"),
        (col("n_common").cast("double") <= col("n_grams") * maxRatio).as("keep"))
  }

  /** Test-set decontamination (E29): flag every training document that
    * shares at least one `n`-gram with the (small) evaluation set —
    * the standard guard against benchmark leakage into training data.
    *
    * Scale shape: the eval n-gram set is tiny by construction, so the
    * probe is a BROADCAST semi join against a single pass over the
    * training corpus — the 100 TB side never shuffles. Exact string
    * n-grams, no hashing, so the result is engine-portable. */
  def decontaminate(train: DataFrame, eval_ : DataFrame, n: Int = 8,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val evalGrams = eval_.select(explode(Dedup.wordShingles(textCol, n)).as("gram"))
      .distinct()
    val flagged = train
      .select(col(idCol), explode(Dedup.wordShingles(textCol, n)).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .select(col(idCol)).distinct()
      .withColumn("contaminated", lit(true))
    train.select(col(idCol))
      .join(flagged, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }
}
