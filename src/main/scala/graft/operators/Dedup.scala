package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training corpora (SURVEY.md §2 B7 +
  * E1-E4): exact text dedup, MinHash+LSH and SimHash near-dup
  * candidate generation, and n-gram Jaccard verification.
  *
  * Scale design: nothing here is O(n²). Exact dedup shuffles a 32-byte
  * digest, not the document. MinHash/SimHash emit `bands` (resp. 4)
  * rows per doc and only documents sharing a band bucket ever meet in
  * a shuffle; bucket fan-out is capped (`maxBucket`) so one degenerate
  * key can't explode a task. Verification joins shingle sets only for
  * surviving candidate pairs.
  */
object Dedup {

  /** Exact text dedup: group by SHA-256 of the text, keep the lowest
    * id (reference semantics: drop_duplicates keep-first,
    * etl_pipeline.py:480-483 — "first" made deterministic as min id). */
  def exactTextDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("text_sha"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles (falls back to the whole text when
    * shorter than n tokens).
    *
    * The tokenization is bound ONCE per row via the single-element
    * `transform(array(split(..)), toks -> ..)` idiom: SQL expressions
    * have no let-binding, and writing `split(text)` inline inside the
    * per-position lambda re-tokenizes the document for EVERY gram —
    * O(tokens²) character work that measured as the dominant cost of
    * the whole shingle operator family (source_novelty/boilerplate:
    * ~2 s of a ~2.5 s floor was the explode projection alone at
    * sf0.1). With the hoist each row splits once and the lambda only
    * slices. */
  def wordShingles(textCol: String, n: Int): Column = expr(
    s"""element_at(transform(array(split($textCol, ' ')), toks ->
       |  CASE WHEN size(toks) >= $n
       |    THEN array_distinct(transform(
       |      sequence(0, size(toks) - $n),
       |      i -> concat_ws(' ', slice(toks, i + 1, $n))))
       |    ELSE array($textCol) END), 1)""".stripMargin)

  /** LSH candidate pairs (id_a < id_b): per-band minhash bucket keys
    * (single-pass codegen, [[graft.functions.MinHashBandKeys]] — one
    * string hash per shingle, k minima by double hashing), bucket by
    * (band, key), pair within buckets. Collisions across ≥1 of `bands`
    * bands ⇒ candidate; P(candidate) ≈ 1-(1-J^rows)^bands.
    *
    * `maxBucket` caps the quadratic per-bucket pair fan-out so one
    * degenerate key can't explode a task. With `strict=true` an
    * over-full bucket raises instead of silently truncating — required
    * when downstream claims exact recall (the correctness-gate mode);
    * the default truncates and is the permissive 100 TB mode. */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                            n: Int = 3, bands: Int = 32, rowsPerBand: Int = 4,
                            maxBucket: Int = 64, strict: Boolean = false): DataFrame =
    pairsWithinBuckets(
      docs
        .select(col(idCol).as("id"), wordShingles(textCol, n).as("sh"))
        .select(col("id"),
          posexplode(graft.functions.HashExprs.minhashBandKeys(col("sh"), bands, rowsPerBand))
            .as(Seq("band", "key"))),
      maxBucket, strict)

  /** Bucket-bounded pair emission shared by [[minhashCandidatePairs]]
    * and [[minhashNearDuplicates]]: group the (id, band, key) stream by
    * bucket, emit each bucket's ordered pairs. */
  private def pairsWithinBuckets(sig: DataFrame, maxBucket: Int,
                                 strict: Boolean): DataFrame = {
    val guarded =
      if (strict)
        when(size(col("ids")) > maxBucket, expr(
          s"""raise_error(concat('minhash LSH bucket exceeds maxBucket=$maxBucket (',
             |  CAST(size(ids) AS STRING), ' ids) — pairs would be silently dropped'))"""
            .stripMargin))
          .otherwise(col("ids"))
      else expr(s"slice(ids, 1, $maxBucket)")
    sig.groupBy(col("band"), col("key"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .withColumn("ids", array_sort(col("ids")))
      .withColumn("ids", guarded)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1),
          |  i -> transform(sequence(0, i - 1),
          |    j -> named_struct('id_a', ids[j], 'id_b', ids[i]))))""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** Attach exact n-gram Jaccard to candidate pairs (E4): join the
    * shingle sets back (only for candidates) and compute
    * |∩| / |∪| as an integer-ratio double.
    *
    * Shingle identity travels as 8-byte `xxhash64(gram)` keys, never
    * strings (the E55/E77 discipline — r19): the two verify joins
    * exchange long arrays instead of the full gram text, and the
    * intersect/union loops compare longs. Distinctness is preserved up
    * to hash collision (P ≈ |sh|²/2⁶⁵ per pair — the string-gram
    * DuckDB oracles would fail the compare on one, so the hash compare
    * pins absence of collisions on every tested corpus). */
  def withJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                  textCol: String, n: Int = 3): DataFrame =
    joinJaccard(pairs,
      docs.select(col(idCol).as("id"),
        hashedShingles(textCol, n).as("sh")))

  /** Distinct word n-gram shingles reduced to 8-byte xxhash64 keys
    * (seed 42 — the identical per-gram h1 the minhash kernel uses). */
  private def hashedShingles(textCol: String, n: Int): Column =
    transform(wordShingles(textCol, n), g => xxhash64(g))

  /** Verify-join core over a prepared (id, sh: array<long>) frame. */
  private def joinJaccard(pairs: DataFrame, sh: DataFrame): DataFrame =
    pairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .drop("sh_a", "sh_b")

  /** Full MinHash near-dup pipeline: candidates → verify → threshold.
    * With bands=32 × rows=4, a pair at J=0.8 is missed with
    * probability (1-0.8⁴)³² ≈ 5e-8 — thresholds ≥ 0.8 are safe to
    * hold to exact recall; lower thresholds should be treated as
    * probabilistic (use more bands or rows=3).
    *
    * One shingle projection feeds BOTH the band-key pipeline and the
    * two verify joins (r19 — previously the split+slice+concat shingle
    * projection ran once for the candidate pass and once per verify
    * side, 3× the dominant per-row cost; the E77 lesson applied).
    * `localCheckpoint` cuts the projection so no consumer recomputes
    * it — note this EXECUTES a job at DataFrame-construction time. */
  def minhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                            threshold: Double, n: Int = 3,
                            bands: Int = 32, rowsPerBand: Int = 4,
                            maxBucket: Int = 64, strict: Boolean = false): DataFrame =
    minhashNearDuplicatesWithSig(docs, idCol, textCol, threshold, n,
      bands, rowsPerBand, maxBucket, strict)._1

  /** As [[minhashNearDuplicates]], additionally returning the cut
    * signature frame `(id, bk, sh, meta…)` so callers that need more
    * per-document columns (canonical selection needs doc lengths) ride
    * the SAME corpus projection/checkpoint instead of paying a second
    * full text scan (r20). `meta` columns are evaluated in the one
    * shingle projection and must be aliased. With `meta = Nil` the
    * plan is byte-identical to [[minhashNearDuplicates]]'s. */
  def minhashNearDuplicatesWithSig(docs: DataFrame, idCol: String, textCol: String,
                            threshold: Double, n: Int = 3,
                            bands: Int = 32, rowsPerBand: Int = 4,
                            maxBucket: Int = 64, strict: Boolean = false,
                            meta: Seq[Column] = Nil): (DataFrame, DataFrame) = {
    val projected = docs.select(
      Seq(col(idCol).as("id"), wordShingles(textCol, n).as("shs")) ++ meta: _*)
    val metaNames = projected.columns.drop(2).toSeq
    val sh = projected
      .select(Seq(col("id"),
        graft.functions.HashExprs.minhashBandKeys(col("shs"), bands, rowsPerBand).as("bk"),
        expr("transform(shs, g -> xxhash64(g))").as("sh")) ++ metaNames.map(col): _*)
      .localCheckpoint()
    val sig = sh.select(col("id"),
      posexplode(col("bk")).as(Seq("band", "key")))
    val pairs = joinJaccard(pairsWithinBuckets(sig, maxBucket, strict),
        sh.select(col("id"), col("sh")))
      .filter(col("jaccard") >= threshold)
    (pairs, sh)
  }

  /** Connected components over a near-dup pair graph (E21) — the
    * clustering step after candidate verification: every document in a
    * component is a rewrite of the same underlying text, and the keep
    * policy ("retain min id per component") needs the component id.
    *
    * Iterative min-label propagation on DataFrames: each round every
    * node adopts the smallest label among itself and its neighbors, so
    * labels converge in O(component diameter) rounds — near-dup
    * components are shallow (a hub document and its variants), so
    * convergence is a handful of rounds even at corpus scale. Each
    * round is one join + one groupBy (two shuffles) and the lineage is
    * cut with `localCheckpoint` so the plan doesn't grow per round.
    * Throws if `maxIter` rounds don't converge rather than returning
    * partial clusters; maxIter must be ≥ 2 (the fused init counts as
    * round 1 and cannot observe its own convergence — ADVICE r19).
    *
    * NOTE (r20, tried and REVERTED): chaining TWO propagation rounds
    * per job (the second doubling as the convergence proof, so the
    * planted-pair family would finish in one job instead of two)
    * measured ~0.85-0.9× on fresh-JVM probes (dedup_clusters steady
    * 2.25-2.4 s → 2.5-2.6 s): the un-materialized round-k labels
    * appear twice in the fused plan (neighbor-min side + node side),
    * and the duplicated subtree's extra stages cost more than the one
    * removed job-floor. The one-round-per-job shape stays.
    *
    * Output: (id, component) for every id in `pairs`, component = min
    * id in the connected component. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    require(maxIter >= 2,
      "connectedComponents: the fused init round cannot observe its own " +
        "convergence; maxIter must be >= 2")
    // materialize the (possibly expensive) pair pipeline ONCE — the
    // symmetric edge union would otherwise evaluate everything above
    // the last exchange in `pairs` once per branch
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint()
    val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(p.select(col("id_b").as("src"), col("id_a").as("dst")))
    // fused round 1 (r19): with identity labels, the first round's
    // neighbor-min is simply min(src) over each node's incoming edges,
    // so initialization IS round 1 — one groupBy replaces the previous
    // distinct-init job plus the first join round (every node appears
    // as dst because `edges` carries both directions)
    var labels = edges.groupBy(col("dst").as("id"))
      .agg(min(col("src")).as("nbr"))
      .select(col("id"), least(col("id"), col("nbr")).as("component"))
      .localCheckpoint()
    var converged = false
    var round = 1
    while (!converged && round < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("src"), col("component").as("src_comp")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("src_comp")).as("nbr_comp"))
      val newComp = least(col("component"), coalesce(col("nbr_comp"), col("component")))
      // the convergence flag rides the checkpoint materialization as an
      // observe metric — one action per round, no second agg job
      val obs = org.apache.spark.sql.Observation(s"cc_round_$round")
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), newComp.as("component"),
          (newComp =!= col("component")).cast("int").as("changed"))
        .observe(obs, coalesce(max(col("changed")), lit(0)).as("max_changed"))
        .localCheckpoint()
      converged = obs.get("max_changed").asInstanceOf[Int] == 0
      labels = next.select(col("id"), col("component"))
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        "component diameter exceeds the bound; raise maxIter")
    labels
  }

  /** 64-bit SimHash over the distinct token set (E3): per bit j, sum
    * ±1 votes from each token's hash bit, take the sign. Single-pass
    * codegen ([[graft.functions.SimHash64]]): one xxhash64 per token. */
  def simhash(textCol: String): Column =
    graft.functions.HashExprs.simHash64(array_distinct(split(col(textCol), " ")))

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    * Candidates via 4×16-bit chunk banding (pigeonhole: distance ≤ 3
    * guarantees an identical chunk; larger distances are found with
    * high probability), verified with bit_count(xor). The pigeonhole
    * guarantee only holds while no bucket truncates — as with minhash,
    * `strict=true` raises on an over-full bucket instead of silently
    * dropping pairs. */
  def simhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                            maxHamming: Int = 3, maxBucket: Int = 64,
                            strict: Boolean = false): DataFrame =
    simhashNearDuplicatesFromSigs(
      docs.select(col(idCol).as("id"), simhash(textCol).as("sim")),
      maxHamming, maxBucket, strict)

  /** [[simhashNearDuplicates]] over an already-computed signature frame
    * (id, sim) — split out (r19) so callers that need the signatures
    * for their own audit (E3's recall gate measures planted-pair
    * Hamming distances from the same sigs) compute the corpus SimHash
    * pass once instead of once per consumer. */
  def simhashNearDuplicatesFromSigs(sigs: DataFrame,
                            maxHamming: Int = 3, maxBucket: Int = 64,
                            strict: Boolean = false): DataFrame = {
    val banded = sigs.select(col("id"), col("sim"), explode(expr(
      "transform(sequence(0, 3), c -> named_struct('chunk', c, 'key', (sim >> (c * 16)) & 65535))")).as("ck"))
    val guarded =
      if (strict)
        when(size(col("members")) > maxBucket, expr(
          s"""raise_error(concat('simhash bucket exceeds maxBucket=$maxBucket (',
             |  CAST(size(members) AS STRING), ' ids) — pairs would be silently dropped'))"""
            .stripMargin))
          .otherwise(col("members"))
      else expr(s"slice(members, 1, $maxBucket)")
    banded.groupBy(col("ck.chunk"), col("ck.key"))
      .agg(collect_list(struct(col("id"), col("sim"))).as("members"))
      .filter(size(col("members")) > 1)
      .withColumn("members", array_sort(col("members")))
      .withColumn("members", guarded)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(members) - 1),
          |  i -> transform(sequence(0, i - 1),
          |    j -> named_struct('id_a', members[j].id, 'id_b', members[i].id,
          |                      'hamming', bit_count(members[j].sim ^ members[i].sim)))))""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
