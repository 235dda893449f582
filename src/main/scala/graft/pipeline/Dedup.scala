package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All variants are pure DataFrame plans (no driver-side loops, no UDFs):
  * shingling/hashing stay inside whole-stage codegen via higher-order
  * functions and xxhash64; candidate generation is a self-join on LSH band
  * buckets, which at 100 TB shuffles only (docId, bandHash) pairs — never the
  * documents themselves.
  */
object Dedup {

  /** Exact dedup: canonical-row-per-key via hash aggregation. `keep` rows with
    * the minimum id per identical `key` (e.g. raw text or a normalized
    * fingerprint). One shuffle on the key hash; with Bloom-filter dynamic
    * pruning the second pass is map-side only.
    */
  def exact(df: DataFrame, key: Column, idCol: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(idCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-dup groups: fingerprint → keeper id + duplicate count. */
  def exactGroups(df: DataFrame, key: Column, idCol: Column): DataFrame =
    df.groupBy(md5(key).as("fp"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Normalization used before fingerprinting: lowercase, strip
    * non-alphanumerics, collapse whitespace.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Word k-shingles of a document as a distinct array.
    *
    * NOTE: fine for small/per-row use, but Spark evaluates higher-order
    * functions interpreted (no codegen) and the slice-per-index construction
    * is O(tokens²) per document — at corpus scale use [[shingleRows]], which
    * builds the same shingles relationally through codegen'd operators.
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(normalize(text), " ")
    array_distinct(
      transform(sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))
  }

  /** Word k-shingles as ROWS (id, carry…, sh): tokenize once per document,
    * explode the shingle start positions, and slice k tokens per position.
    * The whole pipeline is scan → project → generate → project with no
    * shuffle (the earlier window-`lead` formulation sorted every token row
    * by (id, pos) — a full shuffle+sort that dominated corpus-scale runs);
    * downstream aggregates see map-side partials only. Cost is O(tokens·k)
    * per document and every operator is whole-stage-codegen'd — this is the
    * shape that survives a 100 TB corpus.
    */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, k: Int,
                  carry: Seq[String] = Nil, distinctRows: Boolean = true): DataFrame = {
    val spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    val rows = spread
      .select((col(idCol).as("id") +: carry.map(col) :+
        split(normalize(col(textCol)), " ").as("__toks")): _*)
      .filter(size(col("__toks")) >= k)
      .select((col("id") +: carry.map(col) :+ col("__toks") :+
        explode(sequence(lit(0), size(col("__toks")) - k)).as("__i")): _*)
      .select((col("id") +: carry.map(col) :+
        concat_ws(" ", slice(col("__toks"), col("__i") + 1, lit(k))).as("sh")): _*)
    if (distinctRows) rows.distinct() else rows
  }

  /** Benchmark decontamination (training pipelines check eval-set n-gram
    * overlap against the corpus before training — the standard 8-13-gram
    * collision test). Returns one row per CONTAMINATED probe document:
    * (probe id, matched = distinct corpus-colliding n-grams).
    *
    * Scale shape: both sides reduce to distinct (id, gram) /(gram) rows with
    * map-side combine, then one shuffle keyed on the gram for a semi-shaped
    * inner join — documents never move, and the corpus side carries one row
    * per DISTINCT gram regardless of corpus duplication.
    */
  def ngramContamination(corpus: DataFrame, probe: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 8): DataFrame =
    distinctNgramRows(probe, idCol, textCol, n, withId = true)
      .join(distinctNgramRows(corpus, idCol, textCol, n, withId = false),
        Seq("__g"))
      .groupBy(col("__pid").as(idCol))
      .agg(count(lit(1)).as("matched"))

  /** Contamination FRACTION per probe document: distinct corpus-colliding
    * n-grams over distinct n-grams, one row per probe doc that has at least
    * one n-gram (clean docs score 0.0 — unlike [[ngramContamination]] they
    * are not dropped, because a decontamination threshold filter needs to
    * SEE them). Same distinct-gram semi-join shape; the probe gram table is
    * persisted since it feeds both the totals and the match counts.
    *
    * @return (idCol, matched, total, score = matched/total rounded to 6 dp)
    */
  def contaminationScore(corpus: DataFrame, probe: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 8): DataFrame = {
    val pg = CacheScope.autoRelease(
      distinctNgramRows(probe, idCol, textCol, n, withId = true))
    val totals = pg.groupBy(col("__pid")).agg(count(lit(1)).as("total"))
    val matches = pg
      .join(distinctNgramRows(corpus, idCol, textCol, n, withId = false),
        Seq("__g"))
      .groupBy(col("__pid")).agg(count(lit(1)).as("matched"))
    totals.join(matches, Seq("__pid"), "left")
      .select(col("__pid").as(idCol),
        coalesce(col("matched"), lit(0L)).as("matched"), col("total"),
        round(coalesce(col("matched"), lit(0L)).cast("double") /
          col("total"), 6).as("score"))
  }

  /** Distinct whitespace n-gram rows (__pid?, __g) — shared by the
    * contamination operators. `__g` is the xxhash64 of the n-token slice
    * (hashing the ARRAY directly — the operators only ever compare grams
    * for equality and count distincts, so an 8-byte key replaces the
    * ~50-byte gram string in the distinct + join shuffles and the string
    * never even materializes; collisions need two distinct grams of one
    * document pair to collide in 64 bits, ~n²/2⁶⁴).
    */
  private def distinctNgramRows(df: DataFrame, idCol: String,
                                textCol: String, n: Int,
                                withId: Boolean): DataFrame = {
    val toks = split(col(textCol), "\\s+")
    val firstId = if (withId) Seq(col(idCol).as("__pid")) else Nil
    val keepId = if (withId) Seq(col("__pid")) else Nil
    df.select(firstId :+ toks.as("__toks"): _*)
      .filter(size(col("__toks")) >= n)
      .select(keepId :+
        explode(sequence(lit(0), size(col("__toks")) - n)).as("__i") :+
        col("__toks"): _*)
      .select(keepId :+
        xxhash64(slice(col("__toks"), col("__i") + 1, lit(n))).as("__g"): _*)
      .distinct()
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum xxhash64 over the shingle set. Expressed with higher-order
    * `transform`/`aggregate` so the whole signature is computed in one
    * projection over the scan — no explode, no shuffle.
    */
  def minHashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), seed =>
      array_min(transform(shingleCol, s => xxhash64(s, seed))))

  /** MinHash-LSH near-duplicate candidate pairs.
    *
    * signature → `numBands` bands of `rowsPerBand` hashes → band bucket id →
    * self-join on (band, bucket). Only ids and band hashes shuffle; the
    * estimated Jaccard (fraction of matching minhashes) filters candidates.
    *
    * @return (id_a, id_b, est_jaccard) with id_a < id_b
    */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleSize: Int = 3, numHashes: Int = 64,
                 numBands: Int = 16, threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / numBands
    // signature via explode + numHashes min-aggregates: stays inside
    // whole-stage codegen (the nested-lambda expression form would re-derive
    // the shingle array once per hash seed in interpreted mode) and
    // parallelizes the hashing across the cluster with one small shuffle of
    // (id, shingle) pairs. The hash family derives h_i from two base hashes
    // by xor-rotation (h_i = h1 XOR rotl(h2, i)) so each shingle is hashed
    // twice, not numHashes times — and the mixing is pure bit ops, safe
    // under ANSI arithmetic (no overflow).
    // no distinct: min() is idempotent over duplicate shingles, so skipping
    // the dedup shuffle is free
    val exploded = shingleRows(df, idCol, textCol, shingleSize, distinctRows = false)
      .select(col("id"), xxhash64(col("sh")).as("h1"), xxhash64(col("sh"), lit(1)).as("h2"))
    def rotl(c: Column, i: Int): Column =
      if (i == 0) c
      else shiftleft(c, i).bitwiseOR(shiftrightunsigned(c, 64 - i))
    val minAggs = (0 until numHashes).map(i =>
      min(col("h1").bitwiseXOR(rotl(col("h2"), i))).as(s"h$i"))
    // persist: the signature table feeds BOTH sides of the band self-join,
    // and Spark will not reuse the exchange between a repartitioned probe
    // and a broadcast build — without this the whole shingle+min-agg
    // pipeline runs twice. One row of K longs per doc: tiny relative to
    // the corpus, safe to cache at any scale.
    val sigs = exploded.groupBy(col("id"))
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
      .transform(CacheScope.autoRelease(_))
    val banded = sigs.select(
      col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(numBands - 1)), b =>
        xxhash64(array_join(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), ","))))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"),
      col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"),
      col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      // est_jaccard through the codegen'd positional-eq loop: the
      // higher-order zip_with+aggregate form ran interpreted per candidate
      // pair and dominated the filter (same integer count, same division)
      .select(col("id_a"), col("id_b"),
        (graft.functions.VectorMath.positionalEqCount(col("sig_a"), col("sig_b"))
          .cast("double") / numHashes).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }

  /** SimHash (64-bit): per-token hash bits weighted ±1, summed, sign-packed.
    * Pure expression composition (aggregate over token array × bit positions
    * folded into a BIGINT), so it runs inside codegen per row.
    */
  def simHash(text: Column): Column = {
    val toks = split(normalize(text), " ")
    val hashes = transform(toks, t => xxhash64(t))
    // For each bit position, majority vote over token hash bits.
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, bit) => {
        val votes = aggregate(hashes, lit(0),
          (v, h) => v + when(call_function("shiftright", h, bit)
            .bitwiseAND(1L) === 1L, 1).otherwise(-1))
        acc + when(votes > 0, call_function("shiftleft", lit(1L), bit))
          .otherwise(0L)
      })
  }

  /** Table-form SimHash: one (id, simhash) row per input row, computed as
    * explode → per-token hash → 64 signed bit-vote aggregates → bit-pack.
    * Unlike the expression form above this stays entirely inside whole-stage
    * codegen (hash aggregation with map-side combine), which is the shape
    * you want when simhashing billions of documents.
    */
  def simHashTable(df: DataFrame, idCol: String, textCol: String,
                   carry: Seq[String] = Nil): DataFrame = {
    val toks = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select((col(idCol).as("id") +: carry.map(col) :+
        explode(split(normalize(col(textCol)), " ")).as("tok")): _*)
      .select((col("id") +: carry.map(col) :+ xxhash64(col("tok")).as("h")): _*)
    val voteAggs = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1L) === 1L, 1).otherwise(-1))
        .as(s"v$i"))
    toks.groupBy(col("id") +: carry.map(col): _*)
      .agg(voteAggs.head, voteAggs.tail: _*)
      .select((col("id") +: carry.map(col) :+
        (0 until 64).map(i => when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L))
          .reduce(_ + _).as("simhash")): _*)
  }

  /** SimHash near-duplicate pairs, two-stage: a cheap hamming-distance
    * prefilter over block-keyed simhash pairs, then EXACT shingle-Jaccard
    * verification of the survivors (the verify step of Manku et al.'s
    * web-dedup design — "Detecting Near-Duplicates for Web Crawling",
    * WWW'07). The hamming radius can stay permissive (so borderline true
    * dups aren't lost) because verification removes its false positives;
    * verification cost is bounded because only prefilter survivors — a
    * vanishing fraction of the pair space — ever reach the exact-Jaccard
    * join. Same two-stage pattern as [[fuzzyPairs]].
    *
    * Scale shape: stage 1 shuffles only (block, id, 64-bit simhash) rows
    * through the size-gated [[graft.operators.Joins.boundedBlockJoin]];
    * stage 2 joins the surviving id pairs against per-doc sorted gram-hash
    * arrays (codegen'd two-pointer intersection, see [[ngramJaccardPairs]]).
    *
    * @return (id_a, id_b, hamming, jaccard) with id_a < id_b and
    *         jaccard >= minJaccard
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   blockKey: Column, maxHamming: Int = 12,
                   minJaccard: Double = 0.3, shingleSize: Int = 3,
                   mode: String = "auto"): DataFrame = {
    val d = CacheScope.autoRelease(
      simHashTable(df.withColumn("__block", blockKey), idCol, textCol,
        carry = Seq("__block")))
    // Candidate generation dispatches on the hamming radius.
    //
    // Small radii (the 3-6 of web dedup practice, Manku et al. WWW'07) use
    // pigeonhole banding: split the 64-bit simhash into (maxHamming+1) bit
    // bands — a pair within radius t MUST agree exactly on at least one
    // band, so joining on (block, band, band value) finds every qualifying
    // pair (loss-free) while replacing the per-block all-pairs product with
    // equi-join buckets of ~N/2^width docs. At corpus scale this is the
    // difference between O(B²) per block and ordinary shuffle-join fan-in.
    //
    // Wide radii make the bands too narrow to select (width < 8 bits →
    // ≤256 bucket values: the join output stays ~quadratic while paying
    // (t+1)× input duplication plus a pair-dedup shuffle — measured SLOWER
    // than the plain block join at t=12), so those fall back to the
    // size-gated all-pairs block join.
    val bands = maxHamming + 1
    val useBanding = bands <= 8 // band width >= 8 bits
    val cand0 =
      if (useBanding) {
        val bounds = (0 until bands).map(i => (i * 64 / bands, (i + 1) * 64 / bands))
        def banded(idAs: String, shAs: String) = d.select(col("__block").as("block"),
            col("id").as(idAs), col("simhash").as(shAs),
            posexplode(array(bounds.map { case (lo, hi) =>
              val width = hi - lo
              val mask = if (width >= 64) -1L else (1L << width) - 1
              shiftrightunsigned(col("simhash"), lo).bitwiseAND(lit(mask))
            }: _*)).as(Seq("band", "bv")))
        graft.operators.Joins.boundedBlockJoin(
            banded("id_a", "sh_a"), banded("id_b", "sh_b"),
            Seq("block", "band", "bv"), saltBy = col("id_a"), mode = mode)
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            hammingDistance(col("sh_a"), col("sh_b")).as("hamming"))
          .filter(col("hamming") <= maxHamming)
          .distinct() // a close pair can collide in several bands
      } else {
        val l = d.select(col("__block").as("block"), col("id").as("id_a"),
          col("simhash").as("sh_a"))
        val r = d.select(col("__block").as("block"), col("id").as("id_b"),
          col("simhash").as("sh_b"))
        graft.operators.Joins.boundedBlockJoin(l, r, Seq("block"),
            saltBy = col("id_a"), mode = mode)
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            hammingDistance(col("sh_a"), col("sh_b")).as("hamming"))
          .filter(col("hamming") <= maxHamming)
      }
    // persist: the candidate set feeds the id prefilter AND the verify join
    val cand = CacheScope.autoRelease(cand0)
    // stage 2: exact verify. Grams are computed ONLY for docs that appear
    // in some candidate pair (left-semi prefilter) — at corpus scale the
    // survivors are a vanishing fraction, and rescanning/shingling the
    // whole corpus for them would dwarf the prefilter's savings. Sorted
    // gram-hash array per doc → codegen'd two-pointer intersection per
    // pair. Inner joins: a doc too short to have any shingle cannot
    // exact-verify, so its candidate pairs drop.
    val candIds = cand.select(col("id_a").as("__cid"))
      .union(cand.select(col("id_b").as("__cid"))).distinct()
    // persist: g feeds BOTH pair-side joins below — without the cache the
    // semi-join + shingle + collect_set pipeline runs once per side (both
    // joins broadcast-build g independently; measured ~1.3 s each at sf0.1).
    // One sorted hash array per candidate doc: bytes/doc, safe at any scale.
    val g = CacheScope.autoRelease(shingleRows(
      df.join(candIds, col(idCol) === col("__cid"), "left_semi"),
      idCol, textCol, shingleSize)
      .groupBy(col("id"))
      .agg(array_sort(collect_set(xxhash64(col("sh")))).as("grams")))
    val inter = graft.functions.VectorMath
      .sortedIntersectCount(col("g_a"), col("g_b")).cast("double")
    val union = size(col("g_a")) + size(col("g_b")) - inter
    cand
      .join(g.select(col("id").as("id_a"), col("grams").as("g_a")), "id_a")
      .join(g.select(col("id").as("id_b"), col("grams").as("g_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("hamming"),
        when(union === 0, lit(0.0)).otherwise(inter / union).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Fuzzy near-duplicate pairs by Jaro-Winkler similarity within blocks —
    * the string-distance variant of the dedup family, powered by the native
    * codegen'd [[graft.functions.JaroWinklerSimilarity]] expression. The
    * pair join is size-gated ([[graft.operators.Joins.boundedBlockJoin]]):
    * broadcast while the block table fits the broadcast threshold, salted
    * shuffle on the block key beyond it — the corpus-side table must never
    * be an unconditional broadcast.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, textCol: String,
                 blockKey: Column, threshold: Double,
                 mode: String = "auto"): DataFrame = {
    import graft.functions.JaroWinklerImpl.jaroWinkler
    val g = df.select(col(idCol).as("id"), blockKey.as("block"),
      col(textCol).as("s"))
    val l = g.select(col("block"), col("id").as("id_a"), col("s").as("s_a"))
    val r = g.select(col("block"), col("id").as("id_b"), col("s").as("s_b"))
    graft.operators.Joins.boundedBlockJoin(l, r, Seq("block"),
      saltBy = col("id_a"), mode = mode)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        jaroWinkler(col("s_a"), col("s_b")).as("jw"))
      .filter(col("jw") >= threshold)
  }

  /** Hamming distance between two 64-bit simhashes (bit_count of xor). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact n-gram Jaccard similarity between two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Exact n-gram Jaccard over candidate pairs produced by a blocking key.
    * Verifying only within blocks keeps the pair space linear-ish instead of
    * O(n²); at 100 TB the block key comes from LSH buckets (`minHashLsh`) or,
    * as here, a (category, length-bucket) composite — a Jaccard >= t pair
    * must have similar set sizes, so length-bucketing is a principled filter,
    * not just a shortcut.
    *
    * The pair join is size-gated ([[graft.operators.Joins.boundedBlockJoin]]):
    * blocking keys are low-cardinality, so while the gram table fits the
    * broadcast threshold the probe spreads round-robin against a broadcast
    * build; past it both sides shuffle on a salted block key — never an
    * unconditional corpus broadcast.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockKey: Column, shingleSize: Int = 3,
                        threshold: Double = 0.1,
                        mode: String = "auto"): DataFrame = {
    // shingle rows (codegen'd, see shingleRows) hashed to longs, then packed
    // to one array per doc: set-intersection on fixed-width longs is several
    // times cheaper than on strings, and (collisions being ~(n²/2^64)-
    // improbable) the Jaccard counts are identical to the string-set math.
    // persist: both join sides read the gram table (see minHashLsh note).
    // grams are SORTED once per doc so the per-pair intersection is a
    // codegen'd two-pointer merge (SortedIntersectCount), not a hash set
    // build per candidate pair.
    val g = shingleRows(df.withColumn("__block", blockKey), idCol, textCol,
      shingleSize, carry = Seq("__block"))
      .groupBy(col("id"), col("__block").as("block"))
      .agg(array_sort(collect_set(xxhash64(col("sh")))).as("grams"))
      .transform(CacheScope.autoRelease(_))
    val l = g.select(col("block"), col("id").as("id_a"), col("grams").as("g_a"))
    val r = g.select(col("block"), col("id").as("id_b"), col("grams").as("g_b"))
    val inter = graft.functions.VectorMath
      .sortedIntersectCount(col("g_a"), col("g_b")).cast("double")
    val union = size(col("g_a")) + size(col("g_b")) - inter
    graft.operators.Joins.boundedBlockJoin(l, r, Seq("block"),
      saltBy = col("id_a"), mode = mode)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        when(union === 0, lit(0.0)).otherwise(inter / union).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over near-dup pairs: iterative min-label
    * propagation (each node takes the smallest id reachable in i hops;
    * converges in graph-diameter rounds — near-dup families are shallow,
    * so `maxIters` ~10 is generous). Each round localCheckpoints: without
    * lineage truncation the plan doubles per iteration and the driver, not
    * the data, becomes the scale limit. Convergence is detected by label
    * stability, so typical inputs stop early.
    *
    * @param pairs (aCol, bCol) undirected dup edges
    * @return (id, comp) — comp = min id of the member's component
    */
  def components(pairs: DataFrame, aCol: String, bCol: String,
                 maxIters: Int = 10): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist()
    // LAZY localCheckpoints: each round's convergence probe is then the
    // round's ONLY job — it materializes `next`'s blocks as a side effect
    // while computing the changed-label count (the eager checkpoint +
    // separate isEmpty probe was two jobs per round). Lineage is still
    // truncated once materialized, so the plan never grows per iteration.
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint(false)
    var i = 0
    var done = false
    while (i < maxIters && !done) {
      val next = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
        .union(labels)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint(false)
      done = next.join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") =!= col("prev")).isEmpty
      // the probe materialized `next`'s checkpoint (job-end doCheckpoint
      // fills partitions isEmpty short-circuited past); the previous
      // round's blocks are dead — release them NOW rather than waiting for
      // driver GC + ContextCleaner (Dataset.unpersist can't: checkpoint
      // blocks are RDD-level persists the CacheManager never sees)
      org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpointBlocks(labels)
      labels = next
      i += 1
    }
    // labels is fully materialized (every round's convergence probe
    // computes it, populating the lazy checkpoint), so
    // the edge cache is dead once the OUTPUT is read — but an eager
    // unpersist HERE invalidates sibling cache registrations mid-build
    // (CacheManager re-registers dependents; plans analyzed against the
    // old InMemoryRelation lose their reuse — measured 3.8 s → 35 s on
    // q_pipeline_e2e), so the release rides the first consumption of the
    // checkpointed labels instead
    CacheScope.releaseOnConsumption(labels, () => edges.unpersist())
    labels
  }

  /** Canonical-representative dedup: from near-dup `pairs` over `df`, keep
    * one row (the min-id member) per duplicate family plus every row that
    * was never paired. The standard corpus-dedup final step.
    */
  def dropDuplicateFamilies(df: DataFrame, pairs: DataFrame, idCol: String,
                            aCol: String = "id_a", bCol: String = "id_b")
      : DataFrame = {
    val comps = components(pairs, aCol, bCol)
    val losers = comps.filter(col("id") =!= col("comp")).select(col("id"))
    df.join(losers, df(idCol) === losers("id"), "left_anti")
  }
}
