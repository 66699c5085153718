package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.RollingHash

/** Driver-checkable queries for the training-data operators
  * (SURVEY.md §2 E1-E12). Near-dup inputs plant known duplicates
  * deterministically: a copy of each document with the last token
  * replaced (text), or a 1.5×-scaled copy of each embedding
  * (vectors), shifted by +10000 in id.
  */
object TrainingQueries {

  /** documents ∪ exact copies at doc_id+10000. */
  private def docsWithCopies(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    d.union(d.select(col("doc_id") + 10000, col("text")))
  }

  /** documents ∪ near-dup copies (last token → 'zzz') at doc_id+10000. */
  private def docsWithMutations(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val mutated = d.select(
      (col("doc_id") + 10000).as("doc_id"),
      concat_ws(" ", concat(
        expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)"),
        array(lit("zzz")))).as("text"))
    d.union(mutated)
  }

  /** embeddings ∪ 1.5×-scaled copies at vec_id+10000 (cosine ≈ 1). */
  private def vecsWithScaledCopies(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    e.union(e.select(col("vec_id") + 10000,
      expr("transform(embedding, x -> CAST(1.5 * x AS FLOAT))")))
  }

  // ----------------------------------------------------------- E1
  def dedupExactText(s: SparkSession, dir: String): DataFrame =
    Dedup.exactTextDedup(docsWithCopies(s, dir), "doc_id", "text")
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_kept"),
        sum(col("n_copies")).as("sum_copies"))

  /** Oracle computes the REAL dedup semantics (group by text, keep min
    * id, count copies) — the earlier COUNT(*)-shortcut form assumed
    * every base text is unique, which sf0.1 falsified (8 naturally-
    * identical document pairs exist there; Spark correctly kept 4992,
    * the shortcut said 5000). */
  val dedupExactTextSql: String =
    """WITH allv AS (SELECT doc_id, text FROM documents
      |              UNION ALL SELECT doc_id + 10000, text FROM documents),
      |g AS (SELECT MIN(doc_id) AS kept, COUNT(*) AS n_copies
      |      FROM allv GROUP BY text)
      |SELECT COUNT(*) AS n, CAST(SUM(kept) AS BIGINT) AS sum_kept,
      |  CAST(SUM(n_copies) AS BIGINT) AS sum_copies FROM g""".stripMargin

  // ----------------------------------------------------------- E2
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDuplicates(docsWithMutations(s, dir), "doc_id", "text",
        threshold = 0.8, maxBucket = 4096, strict = true)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))

  /** Ground truth: all pairs with 3-gram Jaccard ≥ 0.8 — the LSH
    * pipeline must find them all: candidate miss probability at the
    * 0.8 boundary with 32 bands × 4 rows is (1-0.8⁴)³² ≈ 5e-8 per
    * pair, and `strict=true` raises on bucket truncation rather than
    * silently dropping candidates. */
  val dedupMinhashSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |mut AS (SELECT doc_id + 10000 AS doc_id,
      |  list_append(toks[1:len(toks)-1], 'zzz') AS toks FROM d),
      |allv AS (SELECT * FROM d UNION ALL SELECT * FROM mut),
      |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
      |  THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
      |  ELSE [array_to_string(toks, ' ')] END) AS sh FROM allv)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |        CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |      CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8""".stripMargin

  // ----------------------------------------------------------- E21
  /** Near-dup cluster assignment: minhash pairs at J ≥ 0.8 (the
    * oracle-proven edge set) → connected components → (doc_id,
    * component = min id in cluster). The oracle replays the closure
    * with a recursive CTE. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
      Dedup.minhashNearDuplicates(docsWithMutations(s, dir), "doc_id", "text",
        threshold = 0.8, maxBucket = 4096, strict = true)
        .select(col("id_a"), col("id_b")))
      .select(col("id").as("doc_id"), col("component"))

  // ----------------------------------------------------------- E53
  /** Best-of-cluster canonical selection: within every near-dup
    * cluster keep the LONGEST member (ties to the lower doc_id) — the
    * keep-best policy real corpus dedup applies instead of
    * keep-lowest-id, since near-dups usually differ by truncation.
    * One argmax aggregate per component (max over a (length, −id)
    * struct — no window over members); lengths ride the dedup
    * pipeline's OWN shingle projection as a carried meta column
    * (r20, [[Dedup.minhashNearDuplicatesWithSig]]) instead of a second
    * full text scan of the mutated corpus. */
  def canonicalDocs(s: SparkSession, dir: String): DataFrame = {
    val (pairs, sig) = Dedup.minhashNearDuplicatesWithSig(
      docsWithMutations(s, dir), "doc_id", "text",
      threshold = 0.8, maxBucket = 4096, strict = true,
      meta = Seq(length(col("text")).as("doc_len")))
    val clusters = Dedup.connectedComponents(
        pairs.select(col("id_a"), col("id_b")))
      .select(col("id").as("doc_id"), col("component"))
    val docs = sig.select(col("id").as("doc_id"), col("doc_len"))
    clusters.join(docs, "doc_id")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"),
        max(struct(col("doc_len"), (-col("doc_id")).as("neg_id"))).as("best"))
      .select(col("component"), col("cluster_size"),
        (-col("best").getField("neg_id")).as("kept_doc_id"),
        col("best").getField("doc_len").as("kept_len"))
  }

  val canonicalDocsSql: String =
    """WITH RECURSIVE
      |d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |mut AS (SELECT doc_id + 10000 AS doc_id,
      |  list_append(toks[1:len(toks)-1], 'zzz') AS toks FROM d),
      |allv AS (SELECT * FROM d UNION ALL SELECT * FROM mut),
      |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
      |  THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
      |  ELSE [array_to_string(toks, ' ')] END) AS sh FROM allv),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |        CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8),
      |e AS (SELECT id_a AS src, id_b AS dst FROM p
      |      UNION SELECT id_b AS src, id_a AS dst FROM p),
      |reach AS (SELECT src, dst FROM e
      |          UNION SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
      |                 WHERE e.dst <> r.src),
      |comp AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
      |         FROM reach GROUP BY src),
      |lens AS (SELECT doc_id, length(array_to_string(toks, ' ')) AS doc_len
      |         FROM allv),
      |ranked AS (SELECT component, doc_id, doc_len,
      |    ROW_NUMBER() OVER (PARTITION BY component
      |      ORDER BY doc_len DESC, doc_id ASC) AS rk,
      |    COUNT(*) OVER (PARTITION BY component) AS cluster_size
      |  FROM comp JOIN lens USING (doc_id))
      |SELECT component, CAST(cluster_size AS BIGINT) AS cluster_size,
      |  doc_id AS kept_doc_id, CAST(doc_len AS INTEGER) AS kept_len
      |FROM ranked WHERE rk = 1""".stripMargin

  val dedupClustersSql: String =
    """WITH RECURSIVE
      |d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |mut AS (SELECT doc_id + 10000 AS doc_id,
      |  list_append(toks[1:len(toks)-1], 'zzz') AS toks FROM d),
      |allv AS (SELECT * FROM d UNION ALL SELECT * FROM mut),
      |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
      |  THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
      |  ELSE [array_to_string(toks, ' ')] END) AS sh FROM allv),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |        CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.8),
      |e AS (SELECT id_a AS src, id_b AS dst FROM p
      |      UNION SELECT id_b AS src, id_a AS dst FROM p),
      |reach AS (SELECT src, dst FROM e
      |          UNION SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
      |                 WHERE e.dst <> r.src)
      |SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
      |FROM reach GROUP BY src""".stripMargin

  // ----------------------------------------------------------- E3
  /** SimHash near-dups — hash-dependent, so rows-only for the driver;
    * the ScalaTest invariant checks planted-pair recall. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDuplicates(docsWithMutations(s, dir), "doc_id", "text",
      maxHamming = 10)

  /** Driver-checkable gate for the SimHash pigeonhole guarantee: at
    * maxHamming=3 with 4×16-bit banding, any pair whose signatures
    * differ in ≤ 3 bits MUST share an identical chunk and be found
    * (strict mode ⇒ no bucket ever truncates). The guaranteed set is
    * measured over the planted (id, id+10000) mutation pairs — O(n),
    * not all-pairs — and full recall over it is pinned as an exact
    * row. The guaranteed-pair count itself is hash-dependent, so only
    * the verdict is oracle-compared. */
  def dedupSimhashRecall(s: SparkSession, dir: String): DataFrame = {
    val docs = docsWithMutations(s, dir)
    // ONE SimHash pass (r19): the signature frame previously computed
    // three times (both planted-join sides + inside the near-dup
    // pipeline) is cut once and shared by all three consumers
    val sigs = docs.select(col("doc_id").as("id"), Dedup.simhash("text").as("sim"))
      .localCheckpoint()
    val planted = sigs.filter(col("id") < 10000)
      .join(sigs.filter(col("id") >= 10000)
        .select((col("id") - 10000).as("id"), col("sim").as("sim_m")), "id")
      .select(col("id").as("id_a"), (col("id") + 10000).as("id_b"),
        expr("bit_count(sim ^ sim_m)").as("hamming"))
    val guaranteed = planted.filter(col("hamming") <= 3)
    val found = Dedup.simhashNearDuplicatesFromSigs(sigs,
        maxHamming = 3, maxBucket = 4096, strict = true)
      .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
    guaranteed.join(found, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_guaranteed"),
        coalesce(sum(col("hit")), lit(0L)).as("n_found"))
      .select(lit("simhash_pigeonhole").as("metric"),
        (col("n_found") === col("n_guaranteed")).as("full_recall"))
  }

  val dedupSimhashRecallSql: String =
    "SELECT 'simhash_pigeonhole' AS metric, TRUE AS full_recall"

  // ----------------------------------------------------------- E4
  /** Exact 3-gram Jaccard between consecutive documents. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val pairs = d.select(col("doc_id").as("id_a"))
      .join(d.select(col("doc_id").as("id_b")), col("id_b") === col("id_a") + 1)
    Dedup.withJaccard(pairs, d, "doc_id", "text", n = 3)
      .select(col("id_a"), round(col("jaccard"), 6).as("jaccard"))
  }

  val ngramJaccardSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
      |  THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
      |  ELSE [array_to_string(toks, ' ')] END) AS sh FROM d)
      |SELECT a.doc_id AS id_a,
      |  ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |        CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
      |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin

  // ----------------------------------------------------------- E11
  def docFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), RollingHash.rollingHash(col("text")).as("fp"))

  val docFingerprintSql: String =
    """SELECT doc_id, list_reduce(
      |  list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT))),
      |  (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
      |FROM documents""".stripMargin

  // ----------------------------------------------------------- E8
  def langId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))

  val langIdSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |  length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS zh FROM documents),
      |s AS (SELECT doc_id, zh,
      |  len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS en,
      |  len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en','un'], x))) AS es,
      |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS de,
      |  len(list_filter(toks, x -> list_contains(['le','les','et','une','est','du'], x))) AS fr
      |FROM t)
      |SELECT doc_id, CASE
      |  WHEN zh > en AND zh > es AND zh > de AND zh > fr THEN 'zh'
      |  WHEN en >= es AND en >= de AND en >= fr AND en > 0 THEN 'en'
      |  WHEN es >= de AND es >= fr AND es > 0 THEN 'es'
      |  WHEN de >= fr AND de > 0 THEN 'de'
      |  WHEN fr > 0 THEN 'fr' ELSE 'und' END AS lang_pred
      |FROM s""".stripMargin

  // ----------------------------------------------------------- E72
  /** Label-noise audit: confusion matrix of the corpus's DECLARED
    * language column against the E8 heuristic's prediction, with the
    * per-declared-label agreement rate — the audit that catches a
    * mislabeled crawl or a drifting upstream classifier before a
    * mixture is balanced on bad labels. Pure composition: one codegen
    * prediction projection + one (declared, predicted) hash aggregate;
    * the rate denominator joins back from a per-label rollup (both
    * keys-sized). */
  def labelNoiseAudit(s: SparkSession, dir: String): DataFrame = {
    val pred = Tables.documents(s, dir).select(col("lang"),
      TextAnalysis.langId(col("text")).as("lang_pred"))
    val cells = pred.groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("lang")).agg(sum(col("n")).as("n_label"))
    cells.join(totals, Seq("lang"))
      .select(col("lang"), col("lang_pred"), col("n"),
        round(col("n").cast("double") / col("n_label").cast("double"), 6)
          .as("share_of_label"))
  }

  val labelNoiseAuditSql: String =
    """WITH t AS (SELECT lang, string_split(text, ' ') AS toks,
      |  length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS zh FROM documents),
      |s AS (SELECT lang, zh,
      |  len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS en,
      |  len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en','un'], x))) AS es,
      |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS de,
      |  len(list_filter(toks, x -> list_contains(['le','les','et','une','est','du'], x))) AS fr
      |FROM t),
      |p AS (SELECT lang, CASE
      |  WHEN zh > en AND zh > es AND zh > de AND zh > fr THEN 'zh'
      |  WHEN en >= es AND en >= de AND en >= fr AND en > 0 THEN 'en'
      |  WHEN es >= de AND es >= fr AND es > 0 THEN 'es'
      |  WHEN de >= fr AND de > 0 THEN 'de'
      |  WHEN fr > 0 THEN 'fr' ELSE 'und' END AS lang_pred
      |FROM s),
      |c AS (SELECT lang, lang_pred, COUNT(*) AS n FROM p GROUP BY 1, 2),
      |tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_label FROM c GROUP BY lang)
      |SELECT c.lang, c.lang_pred, c.n,
      |  ROUND(CAST(c.n AS DOUBLE) / CAST(n_label AS DOUBLE), 6) AS share_of_label
      |FROM c JOIN tot ON c.lang = tot.lang""".stripMargin

  // ----------------------------------------------------------- E9
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      TextAnalysis.tokenCountWs(col("text")).as("n_tokens"),
      TextAnalysis.qualityScore(col("text")).as("score"))

  val qualityScoreSql: String =
    """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
      |  ROUND(
      |    0.5 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text))
      |    + 0.3 * LEAST(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0)
      |    + 0.2 * (CAST(len(list_filter(string_split(text, ' '),
      |        x -> list_contains(['the','a','and','of','to','in','is'], x))) AS DOUBLE)
      |      / CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS score
      |FROM documents""".stripMargin

  // ----------------------------------------------------------- E33
  /** Unicode canonicalization: web corpora mix precomposed (é) and
    * decomposed (e + U+0301) forms, which hash/dedup/tokenize
    * differently until NFC-canonicalized. Plants decomposed sequences
    * on every document, normalizes with the codegen
    * [[graft.functions.UnicodeNormalize]] expression, and strips
    * accents (NFD + drop combining marks) — the oracle recomputes all
    * of it with DuckDB's nfc_normalize/strip_accents, pinning the
    * exact strings and the length deltas. */
  def unicodeNormalizeQ(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.UnicodeExprs.{normalizeUnicode, stripAccents}
    // decomposed forms planted explicitly: e+COMBINING ACUTE, u+COMBINING DIAERESIS
    val dirty = concat(substring(col("text"), 1, 40),
      lit(" cafe\u0301 Mu\u0308nchen"))
    Tables.documents(s, dir).select(col("doc_id"),
      length(dirty).as("n_raw"),
      length(normalizeUnicode(dirty, "NFC")).as("n_nfc"),
      normalizeUnicode(dirty, "NFC").as("nfc"),
      stripAccents(dirty).as("ascii"))
  }

  val unicodeNormalizeSql: String =
    """WITH t AS (SELECT doc_id,
      |    substr(text, 1, 40) || ' cafe' || chr(769) || ' Mu' || chr(776) || 'nchen' AS dirty
      |  FROM documents)
      |SELECT doc_id, CAST(length(dirty) AS INTEGER) AS n_raw,
      |  CAST(length(nfc_normalize(dirty)) AS INTEGER) AS n_nfc,
      |  nfc_normalize(dirty) AS nfc,
      |  strip_accents(nfc_normalize(dirty)) AS ascii
      |FROM t""".stripMargin

  // ----------------------------------------------------------- E10
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      TextAnalysis.tokenCountWs(col("text")).as("n_ws"),
      TextAnalysis.tokenCountRegex(col("text")).cast("int").as("n_re"))

  val tokenCountSql: String =
    """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ ]')) AS INTEGER) AS n_re
      |FROM documents""".stripMargin

  // ----------------------------------------------------------- E57
  /** Per-document lexical-diversity signals: Shannon entropy (bits)
    * and type-token ratio over the normalized token multiset — the
    * C4/Gopher-class filter for keyboard-mash, boilerplate, and
    * template spam that length/stopword ratios miss (both have LOW
    * entropy for their length).
    *
    * Scale shape: ZERO shuffles. The per-doc token frequencies come
    * from run-lengths of the SORTED token array — one codegen
    * projection per row (`array_sort` + boundary scan via higher-order
    * functions), state bounded by the document, nothing keyed by
    * doc_id ever crosses the wire. The oracle recomputes through the
    * opposite formulation (unnest → GROUP BY doc,token → entropy
    * identity log2(n) − Σc·log2(c)/n), so the run-length algebra is
    * cross-checked, not mirrored. Entropies ride round(6): the two
    * engines' log2 may differ in the last ULP. */
  def entropyScore(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", array_sort(filter(
        split(TextAnalysis.normalizeText(col("text")), " "), t => t =!= "")))
      .withColumn("n", size(col("toks")))
      // boundaries of equal-token runs in the sorted array, closed
      // with n; counts are adjacent differences
      .withColumn("bnds", expr(
        "if(n = 0, array(0), " +
        "concat(filter(sequence(0, n - 1), i -> i = 0 OR toks[i] != toks[i-1]), array(n)))"))
      .withColumn("counts", expr(
        "transform(sequence(1, size(bnds) - 1), j -> bnds[j] - bnds[j-1])"))
      .select(col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        (size(col("bnds")) - 1).cast("long").as("n_types"),
        when(col("n") > 0, round(
          (size(col("bnds")) - 1).cast("double") / col("n"), 6)).as("ttr"),
        when(col("n") > 0, round(
          log2(col("n")) -
            expr("aggregate(counts, 0D, (a, c) -> a + c * log2(c))") / col("n"),
          6)).as("entropy_bits"))

  val entropyScoreSql: String =
    """WITH t AS (SELECT doc_id,
      |    list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
      |c AS (SELECT doc_id, tok, COUNT(*) AS c FROM u GROUP BY 1, 2),
      |a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(COUNT(*) AS BIGINT) AS n_types, SUM(c * log2(c)) AS s
      |  FROM c GROUP BY 1)
      |SELECT t.doc_id,
      |  COALESCE(a.n_tokens, 0) AS n_tokens,
      |  COALESCE(a.n_types, 0) AS n_types,
      |  ROUND(CAST(a.n_types AS DOUBLE) / a.n_tokens, 6) AS ttr,
      |  ROUND(log2(a.n_tokens) - a.s / a.n_tokens, 6) AS entropy_bits
      |FROM t LEFT JOIN a USING (doc_id)""".stripMargin

  // ----------------------------------------------------------- E13
  /** Normalize + remove stopwords; verified through the cleaned string
    * and surviving-token count. */
  def cleanText(s: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.contentTokens(col("text"))
    Tables.documents(s, dir).select(col("doc_id"),
      concat_ws(" ", toks).as("clean"),
      size(toks).as("n_kept"))
  }

  val cleanTextSql: String =
    """WITH t AS (SELECT doc_id,
      |  list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
      |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
      |    x -> NOT list_contains(['the','a','and','of','to','in','is'], x)) AS toks
      |  FROM documents)
      |SELECT doc_id, array_to_string(toks, ' ') AS clean,
      |  CAST(len(toks) AS INTEGER) AS n_kept FROM t""".stripMargin

  // ----------------------------------------------------------- E14
  /** PII scrub: deterministic synthetic emails/phones are planted per
    * row, then masked; verified on the scrubbed text and match
    * counts. */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val withPii = concat(col("text"),
      lit(" contact user"), col("doc_id"),
      lit("@mail.example.com or +1-555-123-4567"))
    Tables.documents(s, dir).select(col("doc_id"),
      TextAnalysis.emailCount(withPii).as("n_emails"),
      TextAnalysis.phoneCount(withPii).as("n_phones"),
      TextAnalysis.scrubPii(withPii).as("scrubbed"))
  }

  val piiScrubSql: String =
    """WITH t AS (SELECT doc_id,
      |  text || ' contact user' || doc_id || '@mail.example.com or +1-555-123-4567' AS s
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
      |  CAST(len(regexp_extract_all(s, '\+?[0-9][0-9-]{7,}[0-9]')) AS INTEGER) AS n_phones,
      |  regexp_replace(regexp_replace(s,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |    '\+?[0-9][0-9-]{7,}[0-9]', '[PHONE]', 'g') AS scrubbed
      |FROM t""".stripMargin

  // ----------------------------------------------------------- E15
  /** Corpus top-100 terms — TakeOrderedAndProject after a partial-agg
    * term count, so only k rows cross to the driver. */
  /** Rides the family's shared tokenization pass ([[TermTable]]) —
    * n per term = Σ tf, integer-exact vs the re-tokenizing form. */
  def topTerms(s: SparkSession, dir: String): DataFrame =
    TermTable.termCounts(s, dir)
      .orderBy(col("n").desc, col("term").asc)
      .limit(100)

  val topTermsSql: String =
    """WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents)
      |SELECT term, COUNT(*) AS n FROM t WHERE len(term) > 0
      |GROUP BY term ORDER BY n DESC, term ASC LIMIT 100""".stripMargin

  // ----------------------------------------------------------- E85
  /** Incrementally-maintained term table gate (C13 ∘ A15): the corpus
    * arrives as three disjoint "days" folded one at a time through
    * [[TermTable.foldBatch]] — each fold tokenizes ONLY its delta and
    * transactionally appends it — and day 1 is then RE-DELIVERED (the
    * at-least-once reality) with its original tag, which must publish
    * nothing. The emitted top-100 corpus terms from the maintained
    * table must equal the one-shot full-corpus recompute (the E15
    * oracle) bit-for-bit: a dropped batch, a double-folded replay, or
    * a torn fold all surface as count mismatches. This is what keeps
    * the curation family's shared pass affordable at 100 TB — a daily
    * refresh costs |day|, not |corpus|. */
  def termTableFoldGate(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_sink/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/term_table_fold"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(p, true) // fresh fold every run: the gate IS the maintenance
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    (0 until 3).foreach { day =>
      TermTable.foldBatch(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === day),
        tag = s"day-$day")
    }
    // replayed delivery of day 1: the tag makes it fold NOTHING
    TermTable.foldBatch(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 1),
      tag = "day-1")
    TermTable.foldedTermCounts(s, root)
      .orderBy(col("n").desc, col("term").asc)
      .limit(100)
  }

  val termTableFoldGateSql: String = topTermsSql

  // ----------------------------------------------------------- E86
  /** Incrementally-maintained GRAM table gate — E85's discipline at
    * shingle grain: three "days" fold one at a time through
    * [[GramTable.foldBatch]] (each shingles only its delta), day 1
    * re-delivers with its original tag (must publish nothing), and the
    * emitted per-document distinct-gram counts off the maintained
    * table must equal the one-shot full-corpus shingling's — the
    * output is hash-free (doc_id, n_grams), so the string-resolving
    * oracle recomputes it exactly and any dropped batch, double-folded
    * replay, or hash-collision effect surfaces as a count mismatch. */
  def gramTableFoldGate(s: SparkSession, dir: String): DataFrame = {
    val root = s"/tmp/graft_sink/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/gram_table_fold"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(p, true) // fresh fold every run: the gate IS the maintenance
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text"))
    (0 until 3).foreach { day =>
      GramTable.foldBatch(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === day),
        tag = s"day-$day")
    }
    GramTable.foldBatch(s, root, docs.filter(pmod(col("doc_id"), lit(3)) === 1),
      tag = "day-1") // replayed delivery: the tag makes it fold NOTHING
    GramTable.foldedDocGrams(s, root)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
  }

  val gramTableFoldGateSql: String =
    """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
      |           FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, len(toks) - 3),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
      |           toks[i+3] || ' ' || toks[i+4])) AS gram
      |  FROM d WHERE len(toks) >= 5)
      |SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id""".stripMargin

  // ----------------------------------------------------------- E22
  /** TF-IDF top-3 terms per document. tf and df are exact integers;
    * only the final score multiplies through ln() — ranked by
    * (tf·idf, term) with the rounded score exposed for the oracle.
    * One term explode → two aggregations; the corpus size joins in as
    * a broadcast scalar, never a driver constant. The per-doc top-3 is
    * the repo's own `BoundedTopK` aggregate (ascending on the struct
    * (-tfidf, term), so ties break by term) — map-side partials prune
    * to ≤ 3 rows per doc before the shuffle, where a `row_number`
    * window would sort every (doc, term) score. tfidf > 0 always
    * (idf ≥ 1 by construction), so the negation round-trips exactly. */
  def tfidfTop(s: SparkSession, dir: String): DataFrame = {
    // tf comes straight off the family's shared tokenization pass
    // ([[TermTable]]); df falls out of tf (one row per (doc, term)) —
    // no explode over the corpus, no separate distinct shuffle
    val tf = TermTable.termFrequencies(s, dir)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") *
        (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    scored.groupBy(col("doc_id"))
      .agg(graft.functions.TopKAgg.boundedTopK(
        struct((-col("tfidf")).as("nt"), col("term"), col("tf"), col("df")), 3)
        .as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("rk"),
        col("t.term").as("term"), col("t.tf").as("tf"), col("t.df").as("df"),
        (-col("t.nt")).as("tfidf"))
  }

  val tfidfTopSql: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
      |t AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms
      |      WHERE len(term) > 0 GROUP BY 1, 2),
      |d AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms
      |      WHERE len(term) > 0 GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |sc AS (SELECT doc_id, term, tf, df,
      |    ROUND(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
      |  FROM t JOIN d USING (term) CROSS JOIN n)
      |SELECT doc_id, CAST(rk AS INTEGER) AS rk, term, tf, df, tfidf FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY tfidf DESC, term ASC) AS rk FROM sc)
      |WHERE rk <= 3""".stripMargin

  // ----------------------------------------------------------- E23
  /** Bigram language-model counts (all occurrences, not distinct
    * shingles) — the n-gram statistics table an LM data pipeline
    * materializes. Thresholded at ≥ 20 occurrences (the usual
    * min-count cut). */
  def bigramCounts(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(split(lower(col("text")), " ").as("toks"))
      // guard: sequence(0, -1) DESCENDS in Spark (step defaults to -1),
      // so a 1-token doc must map to an empty array, as in the oracle
      .select(explode(expr(
        """CASE WHEN size(toks) >= 2
          |  THEN transform(sequence(0, size(toks) - 2),
          |                 i -> concat_ws(' ', toks[i], toks[i+1]))
          |  ELSE array() END""".stripMargin))
        .as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 20)

  val bigramCountsSql: String =
    """WITH t AS (SELECT string_split(lower(text), ' ') AS toks FROM documents),
      |b AS (SELECT unnest(list_transform(range(1, len(toks)),
      |        i -> toks[i] || ' ' || toks[i + 1])) AS bigram FROM t)
      |SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram HAVING COUNT(*) >= 20""".stripMargin

  // ----------------------------------------------------------- E27
  /** Int8 embedding quantization: per-vector max-abs scale, each
    * component rounded to [-127, 127] — 4× storage cut for a 100 TB
    * embedding table with ~1% cosine error. Verified through the
    * per-vector scale and component checksum (array columns don't
    * sort/hash portably across engines). */
  def quantizeEmbeddings(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      // hoist the per-vector scale into its own projection: one O(d)
      // array_max pass per row, referenced (not recomputed) inside the
      // per-component lambda — inlining it there would make the scale
      // O(d) per COMPONENT, O(d²) per vector
      .select(col("vec_id"), col("embedding"),
        expr("CAST(array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS DOUBLE)")
          .as("max_abs"))
      .select(col("vec_id"), round(col("max_abs"), 6).as("max_abs"),
        expr("""aggregate(
                 transform(embedding,
                   x -> CAST(ROUND(CAST(x AS DOUBLE) / max_abs * 127.0) AS BIGINT)),
                 CAST(0 AS BIGINT), (acc, v) -> acc + v)""").as("q_checksum"))

  val quantizeEmbeddingsSql: String =
    """WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |m AS (SELECT vec_id, e,
      |        list_max(list_transform(e, x -> abs(x))) AS max_abs FROM t)
      |SELECT vec_id, ROUND(max_abs, 6) AS max_abs,
      |  CAST(list_sum(list_transform(e,
      |    x -> CAST(ROUND(x / max_abs * 127.0) AS BIGINT))) AS BIGINT) AS q_checksum
      |FROM m""".stripMargin

  // ----------------------------------------------------------- E25
  /** Repetition ratio: fraction of word 3-grams that are duplicates
    * within the document (1 − distinct/total) — the repeated-content
    * signal corpus filters cut on. Pure per-row projection. */
  def repetitionRatio(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        expr("""CASE WHEN size(toks) >= 3 THEN
                 transform(sequence(0, size(toks) - 3),
                   i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                ELSE array() END""").as("grams"))
      .select(col("doc_id"),
        size(col("grams")).as("n_grams"),
        when(size(col("grams")) > 0,
          round(lit(1.0) - size(array_distinct(col("grams"))).cast("double")
            / size(col("grams")), 6)).otherwise(0.0).as("rep_ratio"))

  val repetitionRatioSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |g AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
      |        list_transform(range(1, len(toks) - 1),
      |          i -> array_to_string(toks[i:i+2], ' '))
      |      ELSE [] END AS grams FROM t)
      |SELECT doc_id, CAST(len(grams) AS INTEGER) AS n_grams,
      |  CASE WHEN len(grams) > 0
      |    THEN ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
      |    ELSE 0.0 END AS rep_ratio
      |FROM g""".stripMargin

  // ----------------------------------------------------------- E26
  /** Gopher-style corpus filter rules: token-count bounds, mean token
    * length bounds, alphabetic-token fraction, stopword floor — each
    * exposed as a flag plus the final keep decision, all in one
    * projection (integer-ratio arithmetic, reproducible). */
  def gopherRules(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks)
    val meanLen = (length(col("text")) - nTok + 1).cast("double") / nTok
    val alphaFrac = size(filter(toks, t => t.rlike("[A-Za-z\\x{4e00}-\\x{9fff}]")))
      .cast("double") / nTok
    val stopHits = TextAnalysis.stopwordHits(col("text"), "en") +
      TextAnalysis.cjkChars(col("text"))
    Tables.documents(s, dir).select(col("doc_id"),
      (nTok >= 20 && nTok <= 100000).as("ok_len"),
      (meanLen >= lit(2.0) && meanLen <= lit(12.0)).as("ok_word_len"),
      (alphaFrac >= lit(0.7)).as("ok_alpha"),
      (stopHits >= 2).as("ok_stop"))
      .withColumn("keep",
        col("ok_len") && col("ok_word_len") && col("ok_alpha") && col("ok_stop"))
  }

  val gopherRulesSql: String =
    """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
      |m AS (SELECT doc_id, text, toks, len(toks) AS n,
      |  CAST(length(text) - len(toks) + 1 AS DOUBLE) / len(toks) AS mean_len,
      |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z\x{4e00}-\x{9fff}]'))) AS DOUBLE)
      |    / len(toks) AS alpha_frac,
      |  len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is'], x)))
      |    + length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS stop_hits
      |FROM t)
      |SELECT doc_id,
      |  n >= 20 AND n <= 100000 AS ok_len,
      |  mean_len >= 2.0 AND mean_len <= 12.0 AS ok_word_len,
      |  alpha_frac >= 0.7 AS ok_alpha,
      |  stop_hits >= 2 AS ok_stop,
      |  (n >= 20 AND n <= 100000) AND (mean_len >= 2.0 AND mean_len <= 12.0)
      |    AND alpha_frac >= 0.7 AND stop_hits >= 2 AS keep
      |FROM m""".stripMargin

  // ----------------------------------------------------------- E24
  /** Edit-distance verification between candidate pairs (consecutive
    * docs as the bounded pair set): Levenshtein on a fixed prefix —
    * the fuzzy-match verifier used when token-set Jaccard is too
    * coarse (e.g. short strings, OCR noise). Never run all-pairs;
    * here the pair set is O(n) by construction. */
  def editDistance(s: SparkSession, dir: String): DataFrame = {
    // ASCII-only prefix: engines disagree on the "unit" (bytes vs
    // UTF-16 vs codepoints) for multi-byte text, so pin the domain
    val d = Tables.documents(s, dir).select(col("doc_id"),
      substring(regexp_replace(col("text"), "[^ -~]", ""), 1, 80).as("prefix"))
    val a = d.select(col("doc_id").as("id_a"), col("prefix").as("pref_a"))
    val b = d.select(col("doc_id").as("id_b"), col("prefix").as("pref_b"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(col("id_a"),
        levenshtein(col("pref_a"), col("pref_b")).as("edit_dist"))
  }

  val editDistanceSql: String =
    """WITH d AS (SELECT doc_id,
      |  substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 80) AS prefix
      |  FROM documents)
      |SELECT a.doc_id AS id_a,
      |  CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS edit_dist
      |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1""".stripMargin

  // ----------------------------------------------------------- E6
  def annBruteforce(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    Similarity.bruteForceTopK(e.filter(col("vec_id") < 5), e, k = 10)
  }

  val annBruteforceSql: String =
    """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |sc AS (SELECT q_id, vec_id,
      |  ROUND(list_dot_product(qe, e) /
      |    (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))), 6) AS cos
      |  FROM q, c)
      |SELECT q_id, vec_id, cos, rn FROM (
      |  SELECT q_id, vec_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rn
      |  FROM sc) WHERE rn <= 10""".stripMargin

  // ----------------------------------------------------------- E5
  /** Exact cosine near-dup over the corpus + planted 1.5× copies. The
    * EXACT pair set — DuckDB oracle-checks every pair — but since r17
    * the plan is the banded equi-join ([[Similarity.cosineNearDuplicatesBanded]]:
    * unit-pivot cells + half-neighborhood fan-out + prefix-distance
    * refutation), not an all-pairs cartesian; the brute form survives
    * only as the spec-side verification oracle. */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDuplicates(vecsWithScaledCopies(s, dir),
      threshold = 0.99, exact = true)

  val dedupEmbeddingSql: String =
    """WITH base AS (SELECT vec_id, embedding FROM embeddings),
      |scaled AS (SELECT vec_id + 10000 AS vec_id,
      |  list_transform(embedding, x -> CAST(1.5 * x AS FLOAT)) AS embedding FROM base),
      |allv AS (SELECT * FROM base UNION ALL SELECT * FROM scaled),
      |d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM allv)
      |SELECT id_a, id_b, cos FROM (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    ROUND(list_dot_product(a.e, b.e) /
      |      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cos
      |  FROM d a JOIN d b ON a.vec_id < b.vec_id)
      |WHERE cos >= 0.99""".stripMargin

  // ----------------------------------------------------------- E7
  /** LSH-bucketed variant — recall is probabilistic, so rows-only for
    * the driver; ScalaTest checks planted-pair recall. */
  def annLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDuplicates(vecsWithScaledCopies(s, dir),
      threshold = 0.99, exact = false)

  // ----------------------------------------------------------- E7b
  /** IVF ANN over the embeddings table: 16 k-means cells, probe 4.
    * Approximate (recall spec-checked) → rows-only. */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    Similarity.ivfTopK(e.filter(col("vec_id") < 5), e, k = 10)
  }

  // ----------------------------------------------------------- E7 (recall gate)
  /** LSH near-dup recall as a driver-checkable exact row: a positively
    * scaled copy has identical hyperplane signs, so every planted pair
    * (v, 1.5·v) lands in one bucket with probability 1 — recall over
    * the planted set is exactly 1 by construction, and the oracle pins
    * n_found == n_planted. A single missed pair flips full_recall and
    * fails the hash compare. */
  def annLshRecall(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir).select(col("vec_id"))
    val planted = Similarity.cosineNearDuplicates(vecsWithScaledCopies(s, dir),
        threshold = 0.99, exact = false)
      .filter(col("id_b") === col("id_a") + 10000)
      .select(col("id_a"), lit(1L).as("hit"))
    base.select(col("vec_id").as("id_a"))
      .join(planted, Seq("id_a"), "left")
      .agg(count(lit(1)).as("n_planted"),
        coalesce(sum(col("hit")), lit(0L)).as("n_found"))
      .select(lit("lsh_planted_recall").as("metric"),
        col("n_planted").cast("long").as("n_planted"),
        col("n_found").cast("long").as("n_found"),
        (col("n_found") === col("n_planted")).as("full_recall"))
  }

  val annLshRecallSql: String =
    """SELECT 'lsh_planted_recall' AS metric,
      |  CAST(COUNT(*) AS BIGINT) AS n_planted,
      |  CAST(COUNT(*) AS BIGINT) AS n_found,
      |  TRUE AS full_recall
      |FROM embeddings""".stripMargin

  /** IVF recall@10 against the exact brute-force top-k, surfaced as a
    * driver-checkable row. The hit count itself depends on k-means
    * float summation order, so only the thresholded verdict is
    * oracle-compared; the threshold sits well under the measured
    * recall (spec pins the planted-copy invariant separately). */
  def annIvfRecall(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(q, e, k = 10)
      .select(col("q_id"), col("vec_id"))
    val approx = Similarity.ivfTopK(q, e, k = 10)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    exact.join(approx, Seq("q_id", "vec_id"), "left")
      .agg(count(lit(1)).as("n_expected"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
      .select(lit("ivf_recall_at_10").as("metric"),
        col("n_expected").cast("long").as("n_expected"),
        (col("n_hits") >= col("n_expected") * 0.7).as("recall_ok"))
  }

  val annIvfRecallSql: String =
    """SELECT 'ivf_recall_at_10' AS metric,
      |  CAST(10 * COUNT(*) AS BIGINT) AS n_expected,
      |  TRUE AS recall_ok
      |FROM embeddings WHERE vec_id < 5""".stripMargin

  // ----------------------------------------------------------- E7c
  /** Persisted IVF index gate: the coarse quantizer is trained ONCE,
    * the index (centroids + cell-assigned corpus with norms) lands as
    * two parquet tables, and SEARCH runs against the RELOADED tables —
    * the amortized production shape, where the index build is paid
    * once and queries arrive forever after. Asserted: search over the
    * persisted index equals search over the same in-memory index
    * EXACTLY (multiset equality on (q_id, vec_id, cos, rn)) — pinning
    * that the float arrays round-trip parquet losslessly and that
    * [[Similarity.ivfSearch]] is a pure function of the index frames.
    * One k-means build total: comparing against a REBUILT index would
    * race double-sum ordering instead of testing persistence. */
  def annIvfPersistGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val queries = e.filter(col("vec_id") < 5)
    val c0 = e.select(col("vec_id"), col("embedding"))
    val n = c0.count()
    val cents = Similarity.kmeansCentroids(
      c0, Similarity.cellCount(n, 64L), iters = 3, n = n)
    val indexed = Similarity.assignCells(c0, cents)
      .withColumn("c_nrm", Similarity.norm("embedding"))
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    cents.write.mode("overwrite").parquet(s"$root/centroids")
    indexed.write.mode("overwrite").parquet(s"$root/index")
    // ONE comparison job (r20, [[graft.DfCompare]]): the ±1-tag
    // union/group multiset equality evaluates each search lineage
    // exactly once and its observe metrics carry the result count —
    // replacing r19's 2 localCheckpoints + 2 exceptAll jobs + count
    val persisted = Similarity.ivfSearch(queries,
        s.read.parquet(s"$root/centroids"), s.read.parquet(s"$root/index"),
        k = 10)
    val inMemory = Similarity.ivfSearch(queries, cents, indexed, k = 10)
    val (matches, nResults, _) =
      graft.DfCompare.multisetEqualCounts(persisted, inMemory)
    Seq(("ann_ivf_persist", queries.count(), nResults, matches))
      .toDF("metric", "n_queries", "n_results", "persisted_matches_memory")
  }

  val annIvfPersistGateSql: String =
    """SELECT 'ann_ivf_persist' AS metric,
      |  CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  CAST(10 * COUNT(*) AS BIGINT) AS n_results,
      |  TRUE AS persisted_matches_memory
      |FROM embeddings WHERE vec_id < 5""".stripMargin

  // ----------------------------------------------------------- E87
  /** Incrementally-maintained IVF index gate (C13 ∘ A15 at index
    * grain — the E85/E86 discipline applied to the third shared
    * asset): the corpus arrives as three disjoint "days"; day 0 trains
    * the coarse quantizer and folds as the initial batch
    * ([[IvfIndex.build]]), days 1-2 fold at |Δ| cost (centroids
    * FROZEN — one broadcast argmax per delta, no corpus rescan,
    * transactional append), then day 1 RE-DELIVERS with its original
    * tag and must publish nothing. Pinned exactly: (a) search over the
    * folded index equals search over a one-shot in-memory assignment
    * of the full corpus to the same quantizer (multiset equality on
    * (q_id, vec_id, cos, rn) — a dropped batch, a double-folded
    * replay, a torn fold, or a lossy quantizer round-trip all break
    * it); (b) the replay added zero assignment rows; (c) recall@10 of
    * the folded index vs exact brute force stays ≥ 0.7 (the E7b
    * operating point — probe count derived from the committed cell
    * count). The drift trigger that bounds how long folding onto a
    * frozen quantizer is legal is spec-pinned separately
    * (IvfIndexSpec: planted out-of-distribution delta fires
    * [[IvfIndex.drifted]]; an in-distribution delta does not). */
  def annIvfFoldGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = s"/tmp/graft_sink/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/ivf_fold"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(p, true) // fresh fold every run: the gate IS the maintenance
    val e = Tables.embeddings(s, dir)
    def day(i: Int) = e.filter(pmod(col("vec_id"), lit(3)) === i)
    IvfIndex.build(s, root, day(0))
    IvfIndex.foldBatch(s, root, day(1), tag = "day-1")
    IvfIndex.foldBatch(s, root, day(2), tag = "day-2")
    val nBefore = IvfIndex.assignments(s, root).count()
    IvfIndex.foldBatch(s, root, day(1), tag = "day-1") // replayed delivery
    val nAfter = IvfIndex.assignments(s, root).count()
    val queries = e.filter(col("vec_id") < 5)
    // k-row quantizer frame, reused by probe sizing and the batch
    // search — cut once instead of re-reading + reassembling per use
    val cents = IvfIndex.centroids(s, root).localCheckpoint()
    val probe = math.max(4, ((cents.count() + 1) / 2).toInt)
    // the folded search result is cut ONCE (r19) — it still has two
    // consumers (the equality check and the recall join); the batch
    // search is NOT cut (r20): the one-job ±1-tag comparison
    // ([[graft.DfCompare]]) evaluates each side exactly once and its
    // observe metrics carry the folded result count, replacing r19's
    // second checkpoint + 2 exceptAll jobs + count
    val folded = IvfIndex.search(s, root, e, queries, k = 10, nProbe = probe)
      .localCheckpoint()
    val batch = Similarity.ivfSearch(queries, cents,
      Similarity.assignCells(e.select(col("vec_id"), col("embedding")), cents)
        .withColumn("c_nrm", Similarity.norm("embedding")),
      k = 10, nProbe = probe)
    val (matches, nResults, _) =
      graft.DfCompare.multisetEqualCounts(folded, batch)
    val exact = Similarity.bruteForceTopK(queries, e, k = 10)
      .select(col("q_id"), col("vec_id"))
    val hits = exact.join(
        folded.select(col("q_id"), col("vec_id"), lit(1L).as("hit")),
        Seq("q_id", "vec_id"), "left")
      .agg(count(lit(1)).as("n_expected"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hits")).head()
    val recallOk = hits.getLong(1) >= hits.getLong(0) * 0.7
    Seq(("ann_ivf_fold", queries.count(), nResults, matches,
        nBefore == nAfter, recallOk))
      .toDF("metric", "n_queries", "n_results", "folded_matches_batch",
        "replay_noop", "recall_ok")
  }

  val annIvfFoldGateSql: String =
    """SELECT 'ann_ivf_fold' AS metric,
      |  CAST(COUNT(*) AS BIGINT) AS n_queries,
      |  CAST(10 * COUNT(*) AS BIGINT) AS n_results,
      |  TRUE AS folded_matches_batch, TRUE AS replay_noop,
      |  TRUE AS recall_ok
      |FROM embeddings WHERE vec_id < 5""".stripMargin

  // ----------------------------------------------------------- E12
  def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.toMediaRows(s, Tables.documents(s, dir), "doc_id", "text")
    Multimodal.decodeFeatures(s, media)
      .select(col("doc_id"), col("media_len"), col("frame_count"), col("feature_dim"))
  }

  val multimodalMetaSql: String =
    """SELECT doc_id, CAST(strlen(text) AS INTEGER) AS media_len,
      |  CAST(strlen(text) // 100 + 1 AS INTEGER) AS frame_count,
      |  CAST(16 AS INTEGER) AS feature_dim
      |FROM documents""".stripMargin

  // ----------------------------------------------------------- E12 (real decode)
  /** REAL image decode end-to-end: plant a deterministic synthetic PNG
    * per document (width/height derived from doc_id), decode it with
    * the JDK ImageIO path on executors, and emit the recovered pixel
    * dimensions — the oracle recomputes them from doc_id, so a decode
    * that lies about geometry fails the hash compare. */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .map(id => Multimodal.MediaRow(id,
        Multimodal.syntheticPng(1 + (id % 16).toInt, 1 + (id % 8).toInt, id),
        "image/png"))
    Multimodal.decodeFeatures(s, media)
      .select(col("doc_id"), col("width"), col("height"),
        col("frame_count"), col("feature_dim"))
  }

  val multimodalDecodeSql: String =
    """SELECT doc_id, CAST(1 + doc_id % 16 AS INTEGER) AS width,
      |  CAST(1 + doc_id % 8 AS INTEGER) AS height,
      |  CAST(1 AS INTEGER) AS frame_count, CAST(16 AS INTEGER) AS feature_dim
      |FROM documents""".stripMargin

  // ----------------------------------------------------------- E12 (real audio decode)
  /** REAL audio decode end-to-end: plant a deterministic synthetic WAV
    * per document (frame count derived from doc_id, 8 kHz mono), decode
    * it with the JDK javax.sound.sampled path on executors, and emit
    * the recovered frame count / sample rate / channel count — the
    * oracle recomputes them from doc_id, so a decode that lies about
    * audio geometry fails the hash compare. */
  def multimodalAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .map(id => Multimodal.MediaRow(id,
        Multimodal.syntheticWav(800 + (id % 800).toInt, 8000, id),
        "audio/wav"))
    Multimodal.decodeFeatures(s, media)
      .select(col("doc_id"), col("frame_count"), col("sample_rate"),
        col("channels"), col("feature_dim"))
  }

  val multimodalAudioSql: String =
    """SELECT doc_id, CAST(800 + doc_id % 800 AS INTEGER) AS frame_count,
      |  CAST(8000 AS INTEGER) AS sample_rate, CAST(1 AS INTEGER) AS channels,
      |  CAST(16 AS INTEGER) AS feature_dim
      |FROM documents""".stripMargin

  // ----------------------------------------------------------- E12 (real video metadata decode)
  /** REAL video metadata decode end-to-end: plant a deterministic
    * minimal MP4 per document (presentation size and duration derived
    * from doc_id), walk its ISO BMFF `moov`/`mvhd`/`tkhd` boxes on
    * executors, and emit the recovered width / height / duration_ms —
    * the oracle recomputes them from doc_id, so a decode that lies
    * about video geometry fails the hash compare. */
  def multimodalVideo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .map(id => Multimodal.MediaRow(id,
        Multimodal.syntheticMp4(16 * (1 + (id % 16)).toInt,
          16 * (1 + (id % 8)).toInt, 1000 + (id % 5000).toInt, id),
        "video/mp4"))
    Multimodal.decodeFeatures(s, media)
      .select(col("doc_id"), col("width"), col("height"),
        col("duration_ms"), col("feature_dim"))
  }

  val multimodalVideoSql: String =
    """SELECT doc_id, CAST(16 * (1 + doc_id % 16) AS INTEGER) AS width,
      |  CAST(16 * (1 + doc_id % 8) AS INTEGER) AS height,
      |  CAST(1000 + doc_id % 5000 AS INTEGER) AS duration_ms,
      |  CAST(16 AS INTEGER) AS feature_dim
      |FROM documents""".stripMargin

  // ----------------------------------------------------------- E30
  /** Deterministic distributed corpus shuffle — the trainer-prep
    * "global shuffle" step: every document gets a reproducible
    * pseudorandom key (multiplicative hash of its id) and its GLOBAL
    * 1-based position in shuffled order, computed by distributed rank
    * ([[Relational.globalRank]]: range repartition + per-partition
    * offsets) — never a single-reducer ORDER BY. The (key, doc_id)
    * sort is a total order, so positions are exact and the oracle
    * reproduces them. */
  def corpusShuffle(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documents(s, dir).select(col("doc_id"),
      pmod((col("doc_id") % 1000003L) * 2654435761L, lit(999983L)).as("shuffle_key"))
    Relational.globalRank(keyed, groupCols = Nil,
        sortCols = Seq("shuffle_key", "doc_id"),
        rankCol = "pos", countCol = "n_docs")
      .select(col("doc_id"), col("shuffle_key"), col("pos"), col("n_docs"))
  }

  val corpusShuffleSql: String =
    """SELECT doc_id, ((doc_id % 1000003) * 2654435761) % 999983 AS shuffle_key,
      |  ROW_NUMBER() OVER (ORDER BY ((doc_id % 1000003) * 2654435761) % 999983, doc_id)
      |    AS pos,
      |  COUNT(*) OVER () AS n_docs
      |FROM documents""".stripMargin

  // ----------------------------------------------------------- E31
  /** Per-source quality quota: keep only the `k` highest-quality
    * documents per source (ties by doc_id) — the per-domain cap a
    * corpus build applies so one crawl source can't dominate the
    * mixture. BoundedTopK prunes to ≤ k per source map-side; the
    * exchange carries O(sources · k), never a per-source sort of all
    * documents. */
  def sourceQuota(s: SparkSession, dir: String, k: Int = 10): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("score"))
      .groupBy(col("source"))
      .agg(graft.functions.TopKAgg.boundedTopK(
        struct((-col("score")).as("ns"), col("doc_id")), k).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("source"), (col("pos") + 1).cast("int").as("rk"),
        col("t.doc_id").as("doc_id"), (-col("t.ns")).as("score"))

  val sourceQuotaSql: String =
    """WITH sc AS (SELECT source, doc_id,
      |  ROUND(
      |    0.5 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text))
      |    + 0.3 * LEAST(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0)
      |    + 0.2 * (CAST(len(list_filter(string_split(text, ' '),
      |        x -> list_contains(['the','a','and','of','to','in','is'], x))) AS DOUBLE)
      |      / CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS score
      |  FROM documents)
      |SELECT source, CAST(rk AS INTEGER) AS rk, doc_id, score FROM (
      |  SELECT source, doc_id, score,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY score DESC, doc_id ASC) AS rk
      |  FROM sc)
      |WHERE rk <= 10""".stripMargin

  // ----------------------------------------------------------- E32
  /** Engine-portable EXACT stratified sampler: keep a document iff a
    * well-mixed hash bucket of its id falls under its stratum's
    * fraction — a pure projection (no RNG, no shuffle before the
    * aggregate) that any engine reproduces bit-for-bit, so membership
    * is exact-oracle-checkable. This is the production counterpart of
    * E17's seeded `sampleBy` (whose engine-specific hash is only
    * gate-checkable); strata missing from the map sample to zero. */
  def exactStratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val fractions = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 1.0, "es" -> 1.0, "zh" -> 1.0)
    val bucket = pmod((col("doc_id") % 1000003L) * 2654435761L, lit(10000L))
    val f = fractions.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col("lang") === k, lit(v)).otherwise(acc)
    }
    Tables.documents(s, dir)
      .filter(bucket < f * 10000.0)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sum_chars"))
  }

  val exactStratifiedSampleSql: String =
    """WITH t AS (SELECT lang, n_chars,
      |    ((doc_id % 1000003) * 2654435761) % 10000 AS b FROM documents)
      |SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM t
      |WHERE b < (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0 WHEN 'fr' THEN 1.0
      |           WHEN 'es' THEN 1.0 WHEN 'zh' THEN 1.0 ELSE 0.0 END) * 10000
      |GROUP BY lang""".stripMargin

  // ----------------------------------------------------------- E34
  /** Out-of-vocabulary rate per document against a corpus-derived
    * top-`vocabSize` vocabulary — the tokenizer-coverage signal a
    * corpus build tracks before committing to a vocab. The vocabulary
    * is a LIMIT over the term-count aggregate (deterministic ties by
    * term), stays inside the plan, and broadcasts to the probe side —
    * the document side never shuffles on the term key. */
  def oovRate(s: SparkSession, dir: String, vocabSize: Int = 1000): DataFrame = {
    // both sides ride the shared tokenization pass: the vocabulary is
    // a LIMIT over the corpus term counts, the probe side weights each
    // (doc, term) row by its tf instead of re-exploding occurrences
    val tf = TermTable.termFrequencies(s, dir)
    val vocab = TermTable.termCounts(s, dir)
      .orderBy(col("n").desc, col("term").asc)
      .limit(vocabSize)
      .select(col("term"), lit(1L).as("in_vocab"))
    tf.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("tf")).otherwise(0L))
          .cast("long").as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
  }

  val oovRateSql: String =
    """WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |           FROM documents),
      |tt AS (SELECT doc_id, term FROM t WHERE len(term) > 0),
      |v AS (SELECT term FROM (
      |        SELECT term, COUNT(*) AS n FROM tt GROUP BY term
      |        ORDER BY n DESC, term ASC LIMIT 1000)),
      |j AS (SELECT tt.doc_id, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
      |      FROM tt LEFT JOIN v ON tt.term = v.term)
      |SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(oov) AS BIGINT) AS n_oov,
      |  ROUND(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6) AS oov_rate
      |FROM j GROUP BY doc_id""".stripMargin

  // ----------------------------------------------------------- E35
  /** Bigram language-model scoring — the CCNet-style perplexity
    * filter shape: train add-one-smoothed bigram probabilities on the
    * corpus itself (c(w1 w2), prefix counts c(w1 ·), vocab size V),
    * then score every document by its total negative log-probability
    * (with the bigram count alongside — the average is a trivial
    * client-side division). Counts are exact integers; each
    * occurrence's ln() is rounded to 6 decimals and summed as an exact
    * decimal, so the per-doc score is order- and partitioning-
    * insensitive — and the output deliberately stops BEFORE dividing
    * by n: a 6-decimal sum over a small n lands exactly on 7th-decimal
    * half-boundaries where engines' double rounding legitimately
    * disagrees (observed at sf0.1: 2 docs off by 1e-6). Two count aggregates (map-
    * side partials); the probability table is assembled FIRST from the
    * two aggregates (bigram-vocab ⋈ unigram-vocab on w1 — aggregate-
    * sized inputs, never occurrences, and never a broadcast of a
    * web-scale vocab), then occurrences shuffle-join it once on the
    * bigram key (AQE covers the hot-bigram skew); only the scalar V
    * broadcasts. */
  def lmScore(s: SparkSession, dir: String): DataFrame = {
    val bigramsPerDoc = Tables.documents(s, dir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(toks) >= 2
          |  THEN transform(sequence(0, size(toks) - 2),
          |                 i -> struct(toks[i] AS w1, toks[i+1] AS w2))
          |  ELSE array() END""".stripMargin)).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c2 = bigramsPerDoc.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val c1 = bigramsPerDoc.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .agg(countDistinct(col("term")).as("vocab"))
    val logp = round(
      log((col("c2") + 1.0) / (col("c1") + col("vocab"))), 6)
    val probs = c2.join(c1, Seq("w1")).crossJoin(broadcast(v))
    bigramsPerDoc
      .join(probs, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(logp.cast(org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)))
          .as("sum_logp"))
      .select(col("doc_id"), col("n_bigrams"),
        (-col("sum_logp")).cast("double").as("sum_neg_logp"))
  }

  val lmScoreSql: String =
    """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      |bg AS (SELECT doc_id,
      |         unnest(list_transform(range(1, len(toks)),
      |           i -> {'w1': toks[i], 'w2': toks[i+1]})) AS bg
      |       FROM d),
      |b AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM bg),
      |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM b GROUP BY w1, w2),
      |c1 AS (SELECT w1, COUNT(*) AS c1 FROM b GROUP BY w1),
      |t AS (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents),
      |v AS (SELECT COUNT(DISTINCT term) AS vocab FROM t WHERE len(term) > 0),
      |j AS (SELECT b.doc_id,
      |        ROUND(ln((c2.c2 + 1.0) / (c1.c1 + v.vocab)), 6) AS logp
      |      FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(-SUM(CAST(logp AS DECIMAL(28,6))) AS DOUBLE) AS sum_neg_logp
      |FROM j GROUP BY doc_id""".stripMargin

  // ----------------------------------------------------------- E16
  /** Deterministic 8/1/1 train/valid/test split + per-split corpus
    * accounting. The assignment is a pure function of doc_id, so the
    * oracle reproduces it exactly. */
  def trainTestSplit(s: SparkSession, dir: String): DataFrame =
    Corpus.splitSummary(Tables.documents(s, dir))

  val trainTestSplitSql: String =
    """SELECT CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'valid' ELSE 'test' END AS split,
      |  lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM (SELECT lang, n_chars, ((doc_id % 1000003) * 2654435761) % 10 AS b
      |      FROM documents) t
      |GROUP BY 1, 2""".stripMargin

  // ----------------------------------------------------------- E17
  /** Stratified sample by language (reproducible for a fixed seed but
    * engine-specific hashing — rows-only for the driver; the spec
    * asserts per-stratum proportions). */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    Corpus.stratifiedSample(Tables.documents(s, dir), "lang",
        Map("en" -> 0.5, "de" -> 1.0, "fr" -> 1.0, "es" -> 1.0, "zh" -> 1.0),
        seed = 42L)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))

  /** Driver-checkable gate for the stratified sampler: fraction-1.0
    * strata must be kept EXACTLY in full, and the Bernoulli stratum
    * (en at 0.5) must land within 5 binomial standard deviations of
    * its expectation — deterministic for a fixed seed and dataset,
    * astronomically unlikely to fail for a correct sampler
    * (P < 6e-7), and a wrong-fraction bug moves the count by far more
    * than 5σ. Stratum totals are oracle-pinned exactly. */
  def stratifiedSampleGate(s: SparkSession, dir: String): DataFrame = {
    val fractions = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 1.0, "es" -> 1.0, "zh" -> 1.0)
    val docs = Tables.documents(s, dir)
    val sampled = Corpus.stratifiedSample(docs, "lang", fractions, seed = 42L)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
    // sampleBy treats strata missing from the map as fraction 0 — a
    // lang outside the map must therefore sample to EXACTLY 0 rows
    // (tolerance collapses to 0), not silently skip the gate via null
    val f = fractions.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col("lang") === k, lit(v)).otherwise(acc)
    }
    docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
      .join(sampled, Seq("lang"), "left")
      .withColumn("n_sampled", coalesce(col("n_sampled"), lit(0L)))
      .withColumn("f", f)
      .select(col("lang"), col("n_total"),
        when(col("f") === 1.0, col("n_sampled") === col("n_total"))
          .otherwise(
            abs(col("n_sampled") - col("f") * col("n_total")) <=
              lit(5.0) * sqrt(col("n_total") * col("f") * (lit(1.0) - col("f"))))
          .as("within_tol"))
  }

  val stratifiedSampleGateSql: String =
    """SELECT lang, COUNT(*) AS n_total, TRUE AS within_tol
      |FROM documents GROUP BY lang""".stripMargin

  // ----------------------------------------------------------- E18
  /** Fixed-budget (256-token) sequence packing per source. */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    Corpus.packSequences(Tables.documents(s, dir), budget = 256)

  val packSequencesSql: String =
    """WITH t AS (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
      |           FROM documents),
      |c AS (SELECT source, doc_id, n_tokens,
      |        SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum FROM t)
      |SELECT source, CAST(FLOOR((cum - n_tokens) / 256.0) AS BIGINT) AS pack_id,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
      |FROM c GROUP BY 1, 2""".stripMargin

  // ----------------------------------------------------------- E71
  /** Packing-efficiency report over the E18 packing (the number a
    * token-budgeted training run actually pays for: how much of every
    * 256-token context window is padding?): per source — pack count,
    * token total, padding total (budget shortfall of under-full
    * packs; boundary-spanning packs may exceed the budget and spill,
    * contributing zero padding), and utilization = tokens /
    * (packs·budget). All integer sums; the single division runs on
    * identical operands in both engines. One extra keys-sized rollup
    * on top of E18's plan — nothing new touches the corpus. */
  def packEfficiency(s: SparkSession, dir: String): DataFrame = {
    val budget = 256
    Corpus.packSequences(Tables.documents(s, dir), budget = budget)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_packs"),
        sum(col("pack_tokens")).as("tokens_total"),
        sum(when(col("pack_tokens") < budget, lit(budget.toLong) - col("pack_tokens"))
          .otherwise(lit(0L))).as("padding_total"))
      .select(col("source"), col("n_packs"), col("tokens_total"), col("padding_total"),
        round(col("tokens_total").cast("double") /
          (col("n_packs").cast("double") * lit(budget.toDouble)), 6).as("utilization"))
  }

  val packEfficiencySql: String =
    """WITH t AS (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
      |           FROM documents),
      |c AS (SELECT source, doc_id, n_tokens,
      |        SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum FROM t),
      |p AS (SELECT source, CAST(FLOOR((cum - n_tokens) / 256.0) AS BIGINT) AS pack_id,
      |        CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
      |      FROM c GROUP BY 1, 2)
      |SELECT source, COUNT(*) AS n_packs,
      |  CAST(SUM(pack_tokens) AS BIGINT) AS tokens_total,
      |  CAST(SUM(CASE WHEN pack_tokens < 256 THEN 256 - pack_tokens ELSE 0 END)
      |    AS BIGINT) AS padding_total,
      |  ROUND(CAST(SUM(pack_tokens) AS DOUBLE) /
      |    (CAST(COUNT(*) AS DOUBLE) * 256.0), 6) AS utilization
      |FROM p GROUP BY source""".stripMargin

  // ----------------------------------------------------------- E19
  /** Sliding-window chunking: 64-token chunks, stride 48 (16-token
    * overlap). */
  def chunkDocuments(s: SparkSession, dir: String): DataFrame =
    Corpus.chunkDocuments(Tables.documents(s, dir), chunkTokens = 64, stride = 48)

  val chunkDocumentsSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
      |k AS (SELECT doc_id, toks, n,
      |        CASE WHEN n <= 64 THEN 1
      |             ELSE CAST(CEIL((n - 64) / 48.0) AS BIGINT) + 1 END AS n_chunks FROM n),
      |e AS (SELECT doc_id, toks, n, UNNEST(range(n_chunks)) AS chunk_idx FROM k)
      |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
      |  array_to_string(toks[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ') AS chunk_text,
      |  CAST(LEAST(64, n - chunk_idx * 48) AS INTEGER) AS chunk_tokens
      |FROM e""".stripMargin

  // ----------------------------------------------------------- E20
  /** Approximate heavy hitters over corpus terms (`freqItems`, a
    * single-pass mergeable sketch — the 100 TB path where exact
    * `top_terms` would need a full term shuffle). Sketch contents are
    * engine-specific → rows-only; the spec asserts every truly
    * frequent term is present. */
  def heavyHitters(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .stat.freqItems(Seq("term"), 0.01)

  // ----------------------------------------------------------- E28
  /** Cross-document boilerplate fraction per doc (5-grams shared by
    * ≥ 3 docs). Registered in hashGrams mode — the 100 TB shape: the
    * docfreq exchange carries 8-byte xxhash64 keys, never gram
    * strings. The DuckDB oracle keeps the literal-gram formulation, so
    * a hash collision (P ≈ G²/2⁶⁵) would fail the compare — the same
    * discipline as source_novelty / E55 / E69. */
  def boilerplateScoreQ(s: SparkSession, dir: String): DataFrame =
    Corpus.boilerplateScore(Tables.documents(s, dir), n = 5, minDocs = 3,
      hashGrams = true)

  val boilerplateScoreSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |g AS (SELECT doc_id, UNNEST(list_distinct(CASE WHEN len(toks) >= 5
      |  THEN list_transform(range(1, len(toks) - 3), i -> array_to_string(toks[i:i+4], ' '))
      |  ELSE [array_to_string(toks, ' ')] END)) AS gram FROM d),
      |df AS (SELECT gram, COUNT(*) AS docfreq FROM g GROUP BY gram),
      |j AS (SELECT doc_id, COUNT(*) AS n_grams,
      |        SUM(CASE WHEN docfreq >= 3 THEN 1 ELSE 0 END) AS n_common
      |      FROM g JOIN df USING (gram) GROUP BY doc_id)
      |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
      |  CAST(n_common AS BIGINT) AS n_common,
      |  ROUND(CAST(n_common AS DOUBLE) / n_grams, 6) AS boiler_ratio,
      |  CAST(n_common AS DOUBLE) <= n_grams * 0.5 AS keep
      |FROM j""".stripMargin

  // ----------------------------------------------------------- E29
  /** Decontamination fixture: eval = docs with doc_id % 97 == 0;
    * training docs at doc_id % 50 == 0 get the first 8 tokens of the
    * lowest-id eval doc appended (planted leakage). The flagging must
    * recover exactly the planted overlap set — exact string 8-grams,
    * so the DuckDB oracle reproduces it bit-for-bit. */
  def decontaminateQ(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val evalDocs = d.filter(col("doc_id") % 97 === 0)
    val evalSpan = evalDocs.orderBy(col("doc_id")).limit(1)
      .select(concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("span"))
    val train = d.filter(col("doc_id") % 97 =!= 0)
      .crossJoin(broadcast(evalSpan))
      .select(col("doc_id"),
        when(col("doc_id") % 50 === 0, concat_ws(" ", col("text"), col("span")))
          .otherwise(col("text")).as("text"))
    Corpus.decontaminate(train, evalDocs, n = 8)
  }

  val decontaminateSql: String =
    """WITH d AS (SELECT doc_id, text FROM documents),
      |ev AS (SELECT doc_id, text FROM d WHERE doc_id % 97 = 0),
      |span AS (SELECT array_to_string(string_split(text, ' ')[1:8], ' ') AS s
      |         FROM ev ORDER BY doc_id LIMIT 1),
      |train AS (SELECT doc_id,
      |  CASE WHEN doc_id % 50 = 0 THEN text || ' ' || (SELECT s FROM span)
      |       ELSE text END AS text
      |  FROM d WHERE doc_id % 97 <> 0),
      |eg AS (SELECT DISTINCT UNNEST(list_distinct(CASE WHEN len(toks) >= 8
      |    THEN list_transform(range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' '))
      |    ELSE [array_to_string(toks, ' ')] END)) AS gram
      |  FROM (SELECT string_split(text, ' ') AS toks FROM ev)),
      |tg AS (SELECT doc_id, UNNEST(list_distinct(CASE WHEN len(toks) >= 8
      |    THEN list_transform(range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' '))
      |    ELSE [array_to_string(toks, ' ')] END)) AS gram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM train)),
      |c AS (SELECT DISTINCT tg.doc_id FROM tg JOIN eg USING (gram))
      |SELECT t.doc_id, (c.doc_id IS NOT NULL) AS contaminated
      |FROM train t LEFT JOIN c ON t.doc_id = c.doc_id""".stripMargin

  // ----------------------------------------------------------- E59
  /** Fuzzy decontamination by shingle CONTAINMENT — the check modern
    * eval hygiene actually needs beyond E29's exact 8-gram hit: a
    * paraphrased or partially-copied eval item shares most of its
    * 5-gram set with the training doc without any single long exact
    * span. Score = |shingles(eval) ∩ shingles(train)| / |shingles(eval)|
    * (Jaccard containment, directional — a tiny eval item inside a
    * long doc still scores 1.0); pairs at ≥ 0.3 are reported.
    *
    * Planted truth: one eval doc's FIRST 60% of tokens is appended to
    * every doc_id % 50 == 0 training doc — no full copy, so the
    * containment is ~0.6, exactly the partial-overlap regime exact
    * matching under-reports.
    *
    * Scale shape: the E29 broadcast-probe discipline. Eval benchmarks
    * are small by nature, so the (eval_id, gram) set and the per-eval
    * gram totals broadcast; the training side explodes its distinct
    * shingles ONCE and probes — the only exchange after the probe
    * carries (train, eval, hits) MATCH counts, never corpus grams. */
  def contaminationScore(s: SparkSession, dir: String,
                         n: Int = 5, threshold: Double = 0.3): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val evalDocs = d.filter(col("doc_id") % 97 === 0)
    val span = evalDocs.orderBy(col("doc_id")).limit(1)
      .select(concat_ws(" ", slice(split(col("text"), " "), lit(1),
        ceil(size(split(col("text"), " ")) * 0.6).cast("int"))).as("span"))
    val train = d.filter(col("doc_id") % 97 =!= 0)
      .crossJoin(broadcast(span))
      .select(col("doc_id").as("train_id"),
        when(col("doc_id") % 50 === 0, concat_ws(" ", col("text"), col("span")))
          .otherwise(col("text")).as("text"))
    // grams never surface in the output — probe on 8-byte window
    // hashes (WordShingleHashes: no gram string is ever built; the
    // literal-gram oracle would fail the compare on a collision), so
    // the broadcast carries longs and the train side hashes bytes
    val evalGrams = evalDocs.select(col("doc_id").as("eval_id"),
      explode(graft.functions.HashExprs.wordShingleHashes(col("text"), n))
        .as("gram"))
    val evalSizes = evalGrams.groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_eval"))
    train
      .select(col("train_id"),
        explode(graft.functions.HashExprs.wordShingleHashes(col("text"), n))
          .as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy(col("train_id"), col("eval_id")).agg(count(lit(1)).as("n_hit"))
      .join(broadcast(evalSizes), "eval_id")
      .select(col("train_id"), col("eval_id"),
        round(col("n_hit").cast("double") / col("n_eval"), 6).as("containment"))
      .filter(col("containment") >= threshold)
  }

  val contaminationScoreSql: String =
    """WITH d AS (SELECT doc_id, text FROM documents),
      |ev AS (SELECT doc_id, text FROM d WHERE doc_id % 97 = 0),
      |span AS (SELECT array_to_string(
      |    toks[1:CAST(ceil(len(toks) * 0.6) AS INTEGER)], ' ') AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM ev)
      |  ORDER BY doc_id LIMIT 1),
      |train AS (SELECT doc_id AS train_id,
      |    CASE WHEN doc_id % 50 = 0 THEN text || ' ' || (SELECT s FROM span)
      |         ELSE text END AS text
      |  FROM d WHERE doc_id % 97 <> 0),
      |eg AS (SELECT eval_id, UNNEST(list_distinct(CASE WHEN len(toks) >= 5
      |    THEN list_transform(range(1, len(toks) - 3), i -> array_to_string(toks[i:i+4], ' '))
      |    ELSE [array_to_string(toks, ' ')] END)) AS gram
      |  FROM (SELECT doc_id AS eval_id, string_split(text, ' ') AS toks FROM ev)),
      |es AS (SELECT eval_id, COUNT(*) AS n_eval FROM eg GROUP BY 1),
      |tg AS (SELECT train_id, UNNEST(list_distinct(CASE WHEN len(toks) >= 5
      |    THEN list_transform(range(1, len(toks) - 3), i -> array_to_string(toks[i:i+4], ' '))
      |    ELSE [array_to_string(toks, ' ')] END)) AS gram
      |  FROM (SELECT train_id, string_split(text, ' ') AS toks FROM train)),
      |m AS (SELECT train_id, eval_id, COUNT(*) AS n_hit
      |      FROM tg JOIN eg USING (gram) GROUP BY 1, 2)
      |SELECT m.train_id, m.eval_id,
      |  ROUND(CAST(n_hit AS DOUBLE) / n_eval, 6) AS containment
      |FROM m JOIN es USING (eval_id)
      |WHERE ROUND(CAST(n_hit AS DOUBLE) / n_eval, 6) >= 0.3""".stripMargin

  /** Driver-checkable gate for the freqItems sketch: its guarantee is
    * NO FALSE NEGATIVES — every term with frequency strictly above the
    * 1% support must appear in the sketch output (false positives are
    * allowed and ignored here). The exact above-support term set and
    * counts are oracle-computable; `in_sketch` must be true for every
    * one of them. Integer cross-multiplication keeps the support
    * threshold exact in both engines. */
  def heavyHittersVerified(s: SparkSession, dir: String): DataFrame = {
    val terms = Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val counts = terms.groupBy(col("term")).agg(count(lit(1)).as("n"))
    val exactHH = counts
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("total"))))
      .filter(col("n") * 100 > col("total"))
    exactHH.crossJoin(broadcast(heavyHitters(s, dir)))
      .select(col("term"), col("n"),
        array_contains(col("term_freqItems"), col("term")).as("in_sketch"))
  }

  val heavyHittersVerifiedSql: String =
    """WITH t AS (SELECT UNNEST(string_split(lower(text), ' ')) AS term FROM documents),
      |f AS (SELECT term, COUNT(*) AS n FROM t WHERE strlen(term) > 0 GROUP BY term)
      |SELECT term, CAST(n AS BIGINT) AS n, TRUE AS in_sketch
      |FROM f WHERE n * 100 > (SELECT SUM(n) FROM f)""".stripMargin

  // ----------------------------------------------------------- E60
  /** Credit-card-number PII detection with checksum verification — the
    * E14 regex scrub upgraded with the Luhn mod-10 check real PII
    * pipelines apply, because a bare \d{16} regex over web text is
    * mostly false positives (order ids, hashes): a candidate only
    * counts as PII when its checksum validates. Candidates are planted
    * deterministically from doc_id (so both engines scan identical
    * text and ~10% of check digits validate by construction); the scan
    * is regexp_extract + the codegen'd `luhn_check` builtin — one
    * projection, no shuffle until the per-source severity rollup (one
    * row per source on the wire). */
  def piiLuhn(s: SparkSession, dir: String): DataFrame = {
    val card = concat(
      lpad(((col("doc_id") * 7919L) % 1000000000L).cast("string"), 9, "0"),
      lpad((col("doc_id") % 1000000L).cast("string"), 6, "0"),
      (col("doc_id") % 10L).cast("string"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        concat(col("text"), lit(" card "), card).as("text2"))
      .select(col("doc_id"), col("source"),
        regexp_extract(col("text2"), "\\b(\\d{16})\\b", 1).as("candidate"))
      .select(col("doc_id"), col("source"), col("candidate"),
        expr("luhn_check(candidate)").as("luhn_valid"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("luhn_valid"), 1L).otherwise(0L)).as("n_pii"))
  }

  val piiLuhnSql: String =
    """WITH c AS (SELECT doc_id, source,
      |    text || ' card ' ||
      |      lpad(CAST((doc_id * 7919) % 1000000000 AS VARCHAR), 9, '0') ||
      |      lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0') ||
      |      CAST(doc_id % 10 AS VARCHAR) AS text2
      |  FROM documents),
      |e AS (SELECT doc_id, source,
      |    regexp_extract(text2, '\b(\d{16})\b', 1) AS candidate FROM c),
      |v AS (SELECT doc_id, source, candidate,
      |    list_sum(list_transform(range(1, 17), i ->
      |      CASE WHEN i % 2 = 0
      |        THEN CASE WHEN CAST(candidate[17-i] AS INT) * 2 > 9
      |             THEN CAST(candidate[17-i] AS INT) * 2 - 9
      |             ELSE CAST(candidate[17-i] AS INT) * 2 END
      |        ELSE CAST(candidate[17-i] AS INT) END)) % 10 = 0 AS luhn_valid
      |  FROM e)
      |SELECT source, COUNT(*) AS n_candidates,
      |  CAST(SUM(CASE WHEN luhn_valid THEN 1 ELSE 0 END) AS BIGINT) AS n_pii
      |FROM v GROUP BY source""".stripMargin

  // ----------------------------------------------------------- E66
  /** Bag-of-words dedup: documents identical up to WORD ORDER collapse
    * to one — the paraphrase-adjacent exact tier between E1 (byte
    * identity) and E2 (fuzzy MinHash), catching shuffled-sentence
    * boilerplate and templated rewrites that byte-hashing misses while
    * staying an exact, drama-free groupBy. The signature is the MD5 of
    * the SORTED token multiset, so the exchange carries a 32-byte key
    * per doc, never token arrays (the 100 TB shape); MD5 because both
    * engines print identical hex — the signature itself is engine-
    * portable, unlike xxhash64. Planted truth: every doc gains a
    * token-REVERSED copy at doc_id+20000, bag-equal but byte-unequal —
    * exact dedup scores zero on it, this catches all 500 pairs. */
  def dedupBow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val rev = base.select((col("doc_id") + 20000).as("doc_id"),
      concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
    val sig = base.unionByName(rev).select(col("doc_id"),
      md5(concat_ws(" ", sort_array(split(col("text"), " ")))).as("sig"))
    sig.withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(col("sig"))))
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("keep_id"), col("doc_id").as("dup_id"))
  }

  val dedupBowSql: String =
    """WITH base AS (SELECT doc_id, text FROM documents),
      |rev AS (SELECT doc_id + 20000 AS doc_id,
      |    array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text
      |  FROM base),
      |allv AS (SELECT * FROM base UNION ALL SELECT * FROM rev),
      |sig AS (SELECT doc_id,
      |    md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS sig
      |  FROM allv),
      |k AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY sig) AS keep_id FROM sig)
      |SELECT keep_id, doc_id AS dup_id FROM k WHERE doc_id <> keep_id""".stripMargin

  // --------------------------------------------------------------- E74
  /** Content-defined-chunk dedup ([[graft.functions.CdcChunks]]): the
    * corpus plus a planted prefix-shifted copy of every 10th document
    * ("EDIT-{id}: " prepended — every byte offset moves) is chunked by
    * content, and the gate pins the two properties that make CDC a
    * dedup primitive rather than a curiosity:
    *
    *  - coverage is EXACT: per document, Σ chunk_len = octet_length,
    *    for every row — the chunker is a partition of the bytes;
    *  - boundaries re-synchronize after an insert (the resync THEOREM,
    *    byte-weighted): every planted copy of a fully content-chunked
    *    source shares ≥ blen − (window + maxLen) bytes of chunk
    *    (hash,len) multiset with it — fixed-size chunking shares ~0
    *    under the same shift. Sources with a forced maxLen cut are
    *    excluded: a forced cut is position-defined, no theorem exists.
    *
    * Scale shape: chunking is a codegen'd per-row projection; the
    * shared-fraction join explodes (doc, chunk) pairs but joins ONLY
    * planted-pair ids (an equi-join on the original id), and chunk
    * hashes — 8-byte longs, never text — are all that shuffles. The
    * oracle recomputes the doc counts; the chunk-level facts ride the
    * asserted booleans. */
  def cdcChunkDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.CdcChunks.cdcChunks
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    // plant only docs long enough for the resync guarantee to bite:
    // boundary damage after an insert is bounded by ~one max chunk, so
    // a ≥200-byte doc at 16-byte average chunks keeps a wide margin
    val planted = base
      .filter(col("doc_id") % 10 === 0 && octet_length(col("text")) >= 200)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(lit("EDIT-"), col("doc_id"), lit(": "), col("text")).as("text"))
    val all = base.union(planted)
    // cut the chunking pass once (r19): the gear-hash kernel walks
    // every corpus byte, and this frame feeds the coverage check, the
    // shared-bytes pipeline and the resilience filter — three
    // separately-planned actions that each re-chunked the corpus
    val chunked = all.select(col("doc_id"),
      octet_length(col("text")).as("blen"),
      cdcChunks(col("text"), maskBits = 4, minLen = 8, maxLen = 128)
        .as("chunks"))
      .localCheckpoint()
    val coverageExact = chunked
      .filter(expr("aggregate(chunks, 0L, (a, c) -> a + c.chunk_len)") =!=
        col("blen").cast("long")).isEmpty
    // Resilience is asserted as the CDC RESYNC THEOREM, byte-weighted
    // and deterministic at every SF (the old "≥60% of the chunk
    // multiset" heuristic was chunk-count granular: a low-entropy
    // 2-chunk doc loses 50% from ONE damaged chunk, and sf0.1 sampled
    // such docs): for a source whose chunking is fully CONTENT-defined
    // (no forced maxLen cut — a forced cut is position-defined, so no
    // resilience theorem exists for it), the prefix edit can damage at
    // most the gear window (maskBits = 4 bytes of state feed the
    // trailing-zero test) plus the bytes before the first surviving
    // source boundary (≤ maxLen when every chunk is content-cut) —
    // every source byte after that is chunked identically. So each
    // eligible copy must share ≥ blen − (window + maxLen) BYTES of
    // chunk multiset with its source, and eligible copies must exist.
    val ex = chunked.select(col("doc_id"), explode(col("chunks")).as("c"))
      .select(col("doc_id"), col("c.chunk_len").as("len"),
        col("c.chunk_hash").as("h"))
    val src = ex.filter(col("doc_id") % 10 === 0 && col("doc_id") < 100000)
      .groupBy(col("doc_id"), col("len"), col("h"))
      .agg(count(lit(1)).as("n_src"))
    val cp = ex.filter(col("doc_id") >= 100000)
      .select((col("doc_id") - 100000).as("doc_id"), col("len"), col("h"))
      .groupBy(col("doc_id"), col("len"), col("h"))
      .agg(count(lit(1)).as("n_cp"))
    val sharedBytes = cp.join(src, Seq("doc_id", "len", "h"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(least(col("n_cp"), coalesce(col("n_src"), lit(0L))) * col("len"))
        .as("shared_bytes"))
    val srcFacts = chunked
      .filter(col("doc_id") % 10 === 0 && col("doc_id") < 100000)
      .select(col("doc_id"), col("blen"),
        expr("aggregate(chunks, 0L, (a, c) -> GREATEST(a, c.chunk_len))")
          .as("max_chunk"))
    val eligible = sharedBytes.join(srcFacts, "doc_id")
      .filter(col("max_chunk") < 128) // fully content-defined source
    val bound = col("blen").cast("long") - lit(4L + 128L) // window + maxLen
    val resilient = !eligible.isEmpty &&
      eligible.filter(col("shared_bytes") < bound).isEmpty
    Seq(("cdc_chunk_dedup", base.count(), planted.count(),
        coverageExact, resilient))
      .toDF("metric", "n_docs", "n_planted",
        "coverage_exact", "shift_resilient")
  }

  val cdcChunkDedupSql: String =
    """SELECT 'cdc_chunk_dedup' AS metric,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN doc_id % 10 = 0
      |    AND octet_length(encode(text)) >= 200 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_planted,
      |  TRUE AS coverage_exact,
      |  TRUE AS shift_resilient
      |FROM documents""".stripMargin

  // --------------------------------------------------------------- E76
  /** Blocked record linkage (entity resolution): link a clean
    * registry against a deterministically-corrupted copy — each dirty
    * record swaps two adjacent digits of the name's numeric suffix at
    * a key-dependent position (the classic transposition typo) —
    * WITHOUT ever comparing all pairs.
    *
    * Scale shape: the blocking key is a corruption-model INVARIANT:
    * the sorted digit multiset of the suffix, which a transposition
    * cannot change. Every true match therefore lands in the same hash
    * bucket, candidate generation is a plain equi-join on the block
    * key (pair count bounded by permutation-class sizes, never n²),
    * and Levenshtein verification (≤ 2 = one transposition) runs only
    * within blocks. This is the strongest blocking available when the
    * noise channel is known; for open-world typos the same skeleton
    * takes multi-pass q-gram keys instead. `is_true_link` exposes the
    * collision rate (distinct keys whose digit permutations also pass
    * the edit-distance gate) — the precision a linkage audit reports. */
  def recordLinkage(s: SparkSession, dir: String): DataFrame = {
    // c_name is 'Customer#' + 9 zero-padded digits; suffix = chars 10..18
    val base = Tables.customer(s, dir)
      .select(col("c_custkey").cast("long").as("id"), col("c_name").as("name"))
    val dirty = base
      .withColumn("p", (col("id") % 8).cast("int")) // swap suffix[p], suffix[p+1] (0-idx)
      .select((col("id") + 1000000L).as("id"),
        concat(lit("Customer#"),
          expr("substring(name, 10, p)"),
          expr("substring(name, 11 + p, 1)"),
          expr("substring(name, 10 + p, 1)"),
          expr("substring(name, 12 + p, 7 - p)")).as("name"))
    // the key is join-internal, so its REPRESENTATION is free: a codegen
    // packed digit-count long ([[graft.functions.DigitMultisetKey]] —
    // the only digits in c_name are the suffix) defines exactly the
    // same equivalence classes as the oracle's sorted-digit string with
    // zero split/array-sort/join allocations on either join side, and
    // the shuffle carries an 8-byte key instead of a 9-char string
    def keyed(df: DataFrame, idAs: String, sfxAs: String): DataFrame =
      df.select(col("id").as(idAs),
        substring(col("name"), 10, 9).as(sfxAs),
        graft.functions.HashExprs.digitMultisetKey(col("name")).as("bk"))
    // every name shares the literal 'Customer#' prefix, and edit
    // distance is invariant under stripping a common prefix — so the
    // verify runs the Levenshtein DP over the 9-digit suffixes (81
    // cells) instead of the full 18-char names (289 cells), exactly
    // the oracle's full-name distance at ~3.5x less per-candidate work
    val ed = levenshtein(col("clean_sfx"), col("dirty_sfx"))
    keyed(base, "clean_id", "clean_sfx")
      .join(keyed(dirty, "dirty_id", "dirty_sfx"), "bk")
      .filter(ed <= 2)
      .select(col("clean_id"), (col("dirty_id") - 1000000L).as("dirty_src"),
        ed.cast("int").as("edit_dist"),
        (col("clean_id") === col("dirty_id") - 1000000L).as("is_true_link"))
  }

  val recordLinkageSql: String =
    """WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name
      |              FROM customer),
      |wp AS (SELECT id, name, CAST(id % 8 AS INTEGER) AS p FROM base),
      |dirty AS (SELECT id + 1000000 AS id,
      |    'Customer#' || substr(name, 10, p) || substr(name, 11 + p, 1) ||
      |    substr(name, 10 + p, 1) || substr(name, 12 + p, 7 - p) AS name
      |  FROM wp),
      |ck AS (SELECT id AS clean_id, name AS clean_name,
      |    array_to_string(list_sort(string_split(substr(name, 10, 9), '')), '')
      |      AS bk FROM base),
      |dk AS (SELECT id AS dirty_id, name AS dirty_name,
      |    array_to_string(list_sort(string_split(substr(name, 10, 9), '')), '')
      |      AS bk FROM dirty)
      |SELECT c.clean_id, d.dirty_id - 1000000 AS dirty_src,
      |  CAST(levenshtein(c.clean_name, d.dirty_name) AS INTEGER) AS edit_dist,
      |  c.clean_id = d.dirty_id - 1000000 AS is_true_link
      |FROM ck c JOIN dk d USING (bk)
      |WHERE levenshtein(c.clean_name, d.dirty_name) <= 2""".stripMargin

  // ----------------------------------------------------------- E77
  /** Exact set-similarity self-join via PREFIX FILTERING (the
    * AllPairs/PPJoin family) — the deterministic alternative to E2's
    * MinHash-LSH: guaranteed zero false negatives at threshold τ,
    * no banding parameters to tune, at the cost of an exact verify
    * per candidate. Corpus = documents plus truncated copies of every
    * 10th doc (kept prefix ≈ 90% of tokens → trigram-Jaccard ≈ 0.9,
    * comfortably over τ = 0.8; random pairs sit near 0).
    *
    * Scale shape: the prefix-filter theorem — under ANY common total
    * order on tokens, J(x,y) ≥ τ forces the first |x|−⌈τ|x|⌉+1
    * tokens of x and y to intersect — means the candidate generator
    * indexes only that prefix per document, ordered RAREST-FIRST
    * (document frequency asc, token asc) so prefix tokens are the
    * tokens fewest documents share: candidate buckets stay small by
    * construction and the join is an equi-join on prefix token, never
    * n². Verification joins the full shingle sets back for the two
    * candidates only. The DuckDB oracle is the brute-force all-pairs
    * definition, so the driver's hash compare pins completeness (no
    * false negatives) AND precision (no threshold leaks) exactly. */
  def similarityPrefixJoin(s: SparkSession, dir: String,
                           tau: Double = 0.8): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val planted = base.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(col("t"), lit(1),
          greatest(lit(1), expr("(9 * size(t)) div 10"))), " ").as("text"))
    prefixJaccardSelfJoin(base.unionByName(planted), "doc_id", "text", tau)
  }

  /** Reusable core of E77: all pairs of `docs` whose word-trigram
    * Jaccard ≥ τ, via prefix filtering + the PPJoin length filter
    * (see similarityPrefixJoin's scale notes). `idCol` must be
    * unique and castable to long; returns (id_a, id_b, jaccard)
    * with id_a < id_b. */
  def prefixJaccardSelfJoin(docs: DataFrame, idCol: String,
                            textCol: String, tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau out of (0,1]: $tau")
    // shingle text never crosses the wire: sets reduce to 8-byte
    // xxhash64 keys in the scan projection (the E55 trick — the
    // brute-force STRING oracle would fail the gate on a collision),
    // so every exchange, array_intersect, and sort runs on longs
    // localCheckpoint: sh feeds the prefix pipeline AND both verify
    // joins, idx feeds both sides of the self-join — without the cut,
    // Spark recomputes the shingle projection and the whole prefix
    // pipeline once per consumer (measured 9.5 s vs 3.5 s at sf0.1)
    val sh = docs
      .select(col(idCol).cast("long").as("doc_id"),
        split(col(textCol), " ").as("t"))
      .select(col("doc_id"), array_distinct(expr(
        """transform(
          |  CASE WHEN size(t) >= 3
          |    THEN transform(sequence(1, size(t) - 2),
          |           i -> concat_ws(' ', slice(t, i, 3)))
          |    ELSE array(concat_ws(' ', t)) END,
          |  g -> xxhash64(g))""".stripMargin)).as("sh"))
      .withColumn("sz", size(col("sh")))
      .localCheckpoint()
    val ex = sh.select(col("doc_id"), col("sz"), explode(col("sh")).as("g"))
    val dfreq = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val prefixes = ex.join(dfreq, "g")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("g")))).as("ord"),
        first(col("sz")).as("sz"))
      .select(col("doc_id"), col("sz"), expr(
        s"slice(ord, 1, size(ord) - cast(ceil($tau * size(ord)) as int) + 1)")
        .as("pref"))
    val idx = prefixes.select(col("doc_id"), col("sz"),
        explode(col("pref")).as("p"))
      .select(col("doc_id"), col("sz"), col("p.g").as("g"))
      .localCheckpoint()
    // PPJoin length filter alongside the prefix match: J ≥ τ forces
    // τ·|x| ≤ |y| AND τ·|y| ≤ |x|, so size-incompatible bucket pairs
    // never reach verification
    val cand = idx.as("x")
      .join(idx.as("y"), col("x.g") === col("y.g") &&
        col("x.doc_id") < col("y.doc_id") &&
        col("x.sz") * lit(tau) <= col("y.sz") &&
        col("y.sz") * lit(tau) <= col("x.sz"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val j = size(array_intersect(col("sa"), col("sb"))).cast("double") /
      size(array_union(col("sa"), col("sb"))).cast("double")
    cand
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sa")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"), j.as("j"))
      .filter(col("j") >= tau)
      .select(col("id_a"), col("id_b"), round(col("j"), 6).as("jaccard"))
  }

  // ----------------------------------------------------------- E81
  /** Hard-negative mining over the embedding table: per query vector
    * (bounded probe set), the 5 nearest neighbors with a DIFFERENT
    * label below the near-dup ceiling — the contrastive-training
    * counterpart of E6's plain top-k. See
    * [[Similarity.hardNegatives]] for the scale shape. */
  def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    Similarity.hardNegatives(e.filter(col("vec_id") < 5), e, k = 5)
  }

  val hardNegativesSql: String =
    """WITH q AS (SELECT vec_id AS q_id, label AS q_label,
      |    CAST(embedding AS DOUBLE[]) AS qe
      |  FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      |  FROM embeddings),
      |sc AS (SELECT q_id, vec_id,
      |  ROUND(list_dot_product(qe, e) /
      |    (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))), 6)
      |    AS cos
      |  FROM q, c WHERE c.label <> q.q_label)
      |SELECT q_id, vec_id, cos, rn FROM (
      |  SELECT q_id, vec_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      |      ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rn
      |  FROM sc WHERE cos < 0.95) WHERE rn <= 5""".stripMargin

  // ----------------------------------------------------------- E82
  /** k-anonymity audit over quasi-identifiers (the privacy pre-flight
    * before a corpus release: any combination of externally-knowable
    * attributes shared by fewer than k documents is a re-
    * identification handle): QI = (lang, source, length band); every
    * QI group is reported with its population and an at-risk flag
    * (n < 5). One hash aggregate with map-side partials; the output
    * is bounded by the QI domain (|langs|·|sources|·|bands|), never
    * by rows — the same keys-sized discipline as C14's profiler. */
  def kAnonymity(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), col("source"),
        (col("n_chars") / 500).cast("long").as("len_band"))
      .groupBy(col("lang"), col("source"), col("len_band"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("at_risk", col("n_docs") < 5)

  val kAnonymitySql: String =
    """SELECT lang, source, n_chars // 500 AS len_band,
      |  COUNT(*) AS n_docs, COUNT(*) < 5 AS at_risk
      |FROM documents GROUP BY 1, 2, 3""".stripMargin

  val similarityPrefixJoinSql: String =
    """WITH base AS (SELECT doc_id, text FROM documents),
      |planted AS (SELECT doc_id + 1000000 AS doc_id,
      |    array_to_string(toks[1:greatest(1, (9 * len(toks)) // 10)], ' ')
      |      AS text
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM base)
      |  WHERE doc_id % 10 = 0),
      |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
      |d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
      |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
      |  THEN list_transform(range(1, len(toks) - 1),
      |    i -> array_to_string(toks[i:i+2], ' '))
      |  ELSE [array_to_string(toks, ' ')] END) AS sh FROM d)
      |SELECT id_a, id_b, ROUND(j, 6) AS jaccard FROM (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |    CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS j
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |WHERE j >= 0.8""".stripMargin

  // ------------------------------------------------------------- E84
  /** Distributed LOGISTIC-regression training via iteratively
    * reweighted least squares (the quality-classifier calibration step
    * every curation pipeline runs — fastText/CCNet-style filtering —
    * and a genuinely different technique from D69's closed-form OLS:
    * Newton's method, where EACH iteration is one distributed pass):
    * predict lang='en' from two length features (token count, mean
    * chars/token), two unrolled Newton steps from β = 0.
    *
    * Per step: one hash aggregate with map-side partials reduces the
    * corpus to the 6 entries of the symmetric 3×3 normal matrix X'WX
    * plus the 3-entry gradient X'(y−μ) — every per-row contribution
    * (w·xᵢxⱼ, (y−μ)·xᵢ) pinned DECIMAL(28,12) BEFORE the
    * order-sensitive sum (the §4 discipline: exp()'s engine-libm ULP
    * wobble is absorbed by the pin + the final round(6), exactly the
    * sourceKl/doc_pagerank precedent), then the Newton solve runs on
    * the 9 aggregated scalars as one explicit cofactor inverse — a
    * constant-width expression over a ONE-ROW frame, broadcast back
    * for the next pass. Step 1 (β=0 ⇒ μ=1/2, W=I/4) needs no exp at
    * all: its normal matrix is X'X/4 on exact sums. At 100 TB each
    * step shuffles 9 decimals per partition, never a row; k steps = k
    * corpus passes. DECIMAL(28,12) bounds Σx1² at ~10¹⁶ — beyond
    * ~10¹² rows of 100-token docs, rescale features first. */
  def logisticQuality(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(28, 12)
    def pin(c: Column): Column = c.cast(dec)
    // Rows with null features are excluded UP FRONT so every Newton
    // step optimizes the same population: without this, step 1's
    // count(*)/sum(y-0.5) terms counted null-x rows (implicitly
    // imputing x=0) while step 2's mu-weighted sums dropped them (null
    // mu skips every pin) — two steps over two different datasets.
    val d = Tables.documents(s, dir).select(
      when(col("lang") === "en", lit(1.0d)).otherwise(lit(0.0d)).as("y"),
      size(split(col("text"), " ")).cast("double").as("x1"),
      (col("n_chars").cast("double") /
        size(split(col("text"), " ")).cast("double")).as("x2"))
      .filter(col("x1").isNotNull && col("x2").isNotNull)

    // symmetric 3x3 [[a,b,c],[b,dd,e],[c,e,f]] solved against
    // (r0,r1,r2) by explicit cofactors — identical expression tree on
    // both engines, so identical IEEE ops on identical operands
    def solve3(a: Column, b: Column, c: Column, dd: Column, e: Column,
               f: Column, r0: Column, r1: Column, r2: Column)
        : (Column, Column, Column) = {
      val det = a * (dd * f - e * e) - b * (b * f - e * c) +
        c * (b * e - dd * c)
      val b0 = ((dd * f - e * e) * r0 + (c * e - b * f) * r1 +
        (b * e - dd * c) * r2) / det
      val b1 = ((c * e - b * f) * r0 + (a * f - c * c) * r1 +
        (c * b - a * e) * r2) / det
      val b2 = ((b * e - dd * c) * r0 + (c * b - a * e) * r1 +
        (a * dd - b * b) * r2) / det
      (b0, b1, b2)
    }
    def dbl(n: String): Column = col(n).cast("double")

    // step 1 from beta = 0: mu = 1/2, W = I/4 — no exp anywhere
    val m1 = d.agg(
      count(lit(1)).as("n"),
      sum(pin(col("x1"))).as("sx1"), sum(pin(col("x2"))).as("sx2"),
      sum(pin(col("x1") * col("x1"))).as("sx11"),
      sum(pin(col("x1") * col("x2"))).as("sx12"),
      sum(pin(col("x2") * col("x2"))).as("sx22"),
      sum(pin(col("y") - 0.5d)).as("r0"),
      sum(pin(col("x1") * (col("y") - 0.5d))).as("r1"),
      sum(pin(col("x2") * (col("y") - 0.5d))).as("r2"))
    val (b10, b11, b12) = solve3(
      col("n").cast("double") / 4.0d, dbl("sx1") / 4.0d, dbl("sx2") / 4.0d,
      dbl("sx11") / 4.0d, dbl("sx12") / 4.0d, dbl("sx22") / 4.0d,
      dbl("r0"), dbl("r1"), dbl("r2"))
    val beta1 = m1.select(col("n"),
      b10.as("b0"), b11.as("b1"), b12.as("b2"))

    // step 2: one reweighted pass at beta1 (exp pinned before the sum)
    val eta = col("b0") + col("b1") * col("x1") + col("b2") * col("x2")
    val mu = lit(1.0d) / (lit(1.0d) + exp(-eta))
    val scored = d.crossJoin(broadcast(beta1))
      .select(col("y"), col("x1"), col("x2"),
        col("b0"), col("b1"), col("b2"), mu.as("mu"))
    val w = col("mu") * (lit(1.0d) - col("mu"))
    val g = col("y") - col("mu")
    val m2 = scored.groupBy(col("b0"), col("b1"), col("b2")).agg(
      count(lit(1)).as("n"),
      sum(pin(w)).as("sw"),
      sum(pin(w * col("x1"))).as("swx1"), sum(pin(w * col("x2"))).as("swx2"),
      sum(pin(w * col("x1") * col("x1"))).as("swx11"),
      sum(pin(w * col("x1") * col("x2"))).as("swx12"),
      sum(pin(w * col("x2") * col("x2"))).as("swx22"),
      sum(pin(g)).as("g0"),
      sum(pin(g * col("x1"))).as("g1"), sum(pin(g * col("x2"))).as("g2"))
    val (d0, d1, d2) = solve3(
      dbl("sw"), dbl("swx1"), dbl("swx2"),
      dbl("swx11"), dbl("swx12"), dbl("swx22"),
      dbl("g0"), dbl("g1"), dbl("g2"))
    val beta2 = m2.select(col("n"),
      (col("b0") + d0).as("b0"), (col("b1") + d1).as("b1"),
      (col("b2") + d2).as("b2"))

    def out(step: Int, frame: DataFrame): DataFrame = frame.select(
      lit(step.toLong).as("step"), col("n"),
      round(col("b0"), 6).as("b0"), round(col("b1"), 6).as("b1"),
      round(col("b2"), 6).as("b2"))
    out(1, beta1).unionAll(out(2, beta2))
  }

  val logisticQualitySql: String = {
    // the shared CTE text for one cofactor solve against (r0,r1,r2)
    def solve(a: String, b: String, c: String, dd: String, e: String,
              f: String, r0: String, r1: String, r2: String, pre: String)
        : (String, String, String) = {
      val det = s"($a*($dd*$f - $e*$e) - $b*($b*$f - $e*$c) + $c*($b*$e - $dd*$c))"
      (s"$pre((($dd*$f - $e*$e)*$r0 + ($c*$e - $b*$f)*$r1 + ($b*$e - $dd*$c)*$r2) / $det)",
       s"$pre((($c*$e - $b*$f)*$r0 + ($a*$f - $c*$c)*$r1 + ($c*$b - $a*$e)*$r2) / $det)",
       s"$pre((($b*$e - $dd*$c)*$r0 + ($c*$b - $a*$e)*$r1 + ($a*$dd - $b*$b)*$r2) / $det)")
    }
    val (b10, b11, b12) = solve("(CAST(n AS DOUBLE)/4)", "(CAST(sx1 AS DOUBLE)/4)",
      "(CAST(sx2 AS DOUBLE)/4)", "(CAST(sx11 AS DOUBLE)/4)",
      "(CAST(sx12 AS DOUBLE)/4)", "(CAST(sx22 AS DOUBLE)/4)",
      "CAST(r0 AS DOUBLE)", "CAST(r1 AS DOUBLE)", "CAST(r2 AS DOUBLE)", "")
    val (d0, d1, d2) = solve("CAST(sw AS DOUBLE)", "CAST(swx1 AS DOUBLE)",
      "CAST(swx2 AS DOUBLE)", "CAST(swx11 AS DOUBLE)",
      "CAST(swx12 AS DOUBLE)", "CAST(swx22 AS DOUBLE)",
      "CAST(g0 AS DOUBLE)", "CAST(g1 AS DOUBLE)", "CAST(g2 AS DOUBLE)", "")
    s"""WITH d AS (SELECT
       |    CASE WHEN lang = 'en' THEN CAST(1 AS DOUBLE)
       |         ELSE CAST(0 AS DOUBLE) END AS y,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS x1,
       |    CAST(n_chars AS DOUBLE) /
       |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS x2
       |  FROM documents
       |  WHERE len(string_split(text, ' ')) IS NOT NULL
       |    AND n_chars / len(string_split(text, ' ')) IS NOT NULL),
       |m1 AS (SELECT COUNT(*) AS n,
       |    SUM(CAST(x1 AS DECIMAL(28,12))) AS sx1,
       |    SUM(CAST(x2 AS DECIMAL(28,12))) AS sx2,
       |    SUM(CAST(x1*x1 AS DECIMAL(28,12))) AS sx11,
       |    SUM(CAST(x1*x2 AS DECIMAL(28,12))) AS sx12,
       |    SUM(CAST(x2*x2 AS DECIMAL(28,12))) AS sx22,
       |    SUM(CAST(y - 0.5 AS DECIMAL(28,12))) AS r0,
       |    SUM(CAST(x1*(y - 0.5) AS DECIMAL(28,12))) AS r1,
       |    SUM(CAST(x2*(y - 0.5) AS DECIMAL(28,12))) AS r2
       |  FROM d),
       |beta1 AS (SELECT n, $b10 AS b0, $b11 AS b1, $b12 AS b2 FROM m1),
       |sc AS (SELECT d.y, d.x1, d.x2, beta1.b0, beta1.b1, beta1.b2,
       |    1 / (1 + exp(-(beta1.b0 + beta1.b1*d.x1 + beta1.b2*d.x2))) AS mu
       |  FROM d, beta1),
       |m2 AS (SELECT b0, b1, b2, COUNT(*) AS n,
       |    SUM(CAST(mu*(1-mu) AS DECIMAL(28,12))) AS sw,
       |    SUM(CAST(mu*(1-mu)*x1 AS DECIMAL(28,12))) AS swx1,
       |    SUM(CAST(mu*(1-mu)*x2 AS DECIMAL(28,12))) AS swx2,
       |    SUM(CAST(mu*(1-mu)*x1*x1 AS DECIMAL(28,12))) AS swx11,
       |    SUM(CAST(mu*(1-mu)*x1*x2 AS DECIMAL(28,12))) AS swx12,
       |    SUM(CAST(mu*(1-mu)*x2*x2 AS DECIMAL(28,12))) AS swx22,
       |    SUM(CAST(y - mu AS DECIMAL(28,12))) AS g0,
       |    SUM(CAST((y - mu)*x1 AS DECIMAL(28,12))) AS g1,
       |    SUM(CAST((y - mu)*x2 AS DECIMAL(28,12))) AS g2
       |  FROM sc GROUP BY b0, b1, b2)
       |SELECT CAST(1 AS BIGINT) AS step, n,
       |  ROUND($b10, 6) AS b0, ROUND($b11, 6) AS b1, ROUND($b12, 6) AS b2
       |FROM m1
       |UNION ALL
       |SELECT CAST(2 AS BIGINT) AS step, n,
       |  ROUND(b0 + $d0, 6) AS b0, ROUND(b1 + $d1, 6) AS b1,
       |  ROUND(b2 + $d2, 6) AS b2
       |FROM m2""".stripMargin
  }
}
