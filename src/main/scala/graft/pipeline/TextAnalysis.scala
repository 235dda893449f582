package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language-ID heuristics, fingerprinting. All pure
  * column expressions — they run inside whole-stage codegen over the scan,
  * no shuffle, which is exactly what a 100 TB filter pass needs.
  */
object TextAnalysis {

  /** Spread an unsplittable input across the cluster before expensive
    * per-row text work (guide §2.5: "one huge unsplittable file →
    * repartition immediately after the read"). The local testdata ships
    * single-row-group parquet, so without this every regex/HOF-heavy scan
    * projection runs in ONE task; one narrow round-robin shuffle of the
    * raw rows buys full-cluster parallelism for the tokenize/gram work
    * that follows. On a well-laid-out table the extra exchange is the
    * cost — which is why it is applied per heavy OPERATOR, not baked into
    * the table layer.
    */
  def spreadInput(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Whitespace tokenization (regex-based, handles runs of whitespace). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** BPE-ish subword proxy: alphanumeric runs and individual punctuation
    * marks as separate tokens (RE2-compatible pattern — no lookaround).
    */
  def roughTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  private val Stopwords = Seq("the", "a", "an", "of", "and", "to", "in", "is")

  /** Quality metrics à la C4/Gopher rules: length, mean token length,
    * stopword ratio, punctuation ratio, non-alnum ratio.
    */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nChar = length(text).cast("double")
    val nStop = size(filter(toks, t => t.isin(Stopwords.map(lit): _*)))
    val nPunct = nChar - length(regexp_replace(text, "[\\p{Punct}]", ""))
    Seq(
      "n_chars" -> nChar.cast("long"),
      "n_tokens" -> nTok.cast("long"),
      "n_stopwords" -> nStop.cast("long"),
      "mean_token_len" -> when(nTok === 0, 0.0)
        .otherwise((nChar - (nTok - 1)) / nTok),
      "stopword_ratio" -> when(nTok === 0, 0.0).otherwise(nStop / nTok),
      "punct_ratio" -> when(nChar === 0, 0.0).otherwise(nPunct / nChar))
  }

  /** Composite quality score in [0,1]: documents that are too short, too
    * punctuation-heavy, or stopword-free score low (deterministic integer/
    * single-division math → reproducible across engines).
    */
  def qualityScore(text: Column): Column = {
    val m = qualityMetrics(text).toMap
    val lenScore = least(m("n_tokens").cast("double") / 50.0, lit(1.0))
    val stopScore = least(m("stopword_ratio") * 10.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - m("punct_ratio") * 4.0)
    lenScore * (lit(0.5) + stopScore * 0.5) * punctPenalty
  }

  /** Language-ID heuristic: score candidate languages by marker-token hits
    * (an n-gram/stopword heuristic; a real model would be a per-partition
    * scoring pass). Deterministic and expression-only.
    */
  def langIdHeuristic(text: Column): Column = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "is", "of"),
      "fr" -> Seq("le", "la", "et", "les"),
      "es" -> Seq("el", "los", "las", "una"),
      "de" -> Seq("der", "die", "und", "das"))
    val toks = tokens(lower(text))
    val scores = markers.map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isin(ms.map(lit): _*)))
    }
    // argmax with deterministic tie-break on language order; no hits → "und"
    val best = scores.reduceLeft[(String, Column)] { case ((l1, s1), (l2, s2)) =>
      // keep l1 on ties (earlier language wins)
      (l1, when(s2 > s1, s2).otherwise(s1))
    }
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s > 0 && s === best._2, lang).otherwise(acc)
    }
  }

  /** Content-defined fingerprint: md5 of normalized text (stable across
    * engines/partitions — used as the exact-dedup key).
    */
  def fingerprint(text: Column): Column = md5(Dedup.normalize(text))

  /** Gopher/Dolma-style quality FILTER WITH REASONS: every document gets a
    * pass/fail verdict plus the list of rule names it violated — the
    * "attributes" stage of a curation pipeline, where downstream mixes
    * filter on reasons rather than re-deriving them. Thresholds follow the
    * Gopher rules adapted to [[qualityMetrics]]'s definitions. Pure column
    * expressions (codegen, no shuffle).
    */
  def qualityFilter(text: Column,
                    minTokens: Int = 5, maxTokens: Int = 1000,
                    minMeanTokLen: Double = 2.0, maxMeanTokLen: Double = 12.0,
                    minStopwordRatio: Double = 0.02,
                    maxPunctRatio: Double = 0.2): Column = {
    val m = qualityMetrics(text).toMap
    val reasons = array(
      when(m("n_tokens") < minTokens, "too_short"),
      when(m("n_tokens") > maxTokens, "too_long"),
      when(m("mean_token_len") < minMeanTokLen ||
           m("mean_token_len") > maxMeanTokLen, "token_len_out_of_range"),
      when(m("stopword_ratio") < minStopwordRatio, "low_stopword_ratio"),
      when(m("punct_ratio") > maxPunctRatio, "high_punct_ratio"))
    filter(reasons, r => r.isNotNull)
  }

  /** Chunk-level exact dedup WITH REMOVAL — the C4/Dolma span-dedup pass:
    * split each document into non-overlapping `chunkTokens`-token chunks,
    * count how many DISTINCT documents each chunk text appears in, and
    * rebuild every document keeping only chunks seen in fewer than
    * `minDocs` documents (boilerplate/duplicated spans drop everywhere,
    * including from their first occurrence — C4's rule). Detection-only
    * mining lives in [[boilerplateGrams]]; this is the transform.
    *
    * Shape at 100 TB: tokenize once, explode chunk INDEXES (never tokens),
    * one (chunk-text) hash aggregate for the global counts, one
    * chunk-keyed join back, one per-doc regroup — documents themselves
    * never shuffle, only (id, chunk) rows do.
    *
    * @return (idCol, n_chunks, n_kept, cleaned) — cleaned is the rebuilt
    *         text of the surviving chunks in document order
    */
  def removeDuplicateChunks(df: DataFrame, idCol: String, textCol: String,
                            chunkTokens: Int = 10, minDocs: Int = 2): DataFrame = {
    require(chunkTokens >= 1 && minDocs >= 2)
    val toks = df.select(col(idCol).as("__id"), tokens(col(textCol)).as("__toks"))
    // Zero-token documents must yield ZERO chunks (and so drop from the
    // output, matching the oracle's range() semantics) — without the guard,
    // (size-1)/chunkTokens is double division whose int cast gives 0 for
    // size=0, producing sequence(0,0) = one phantom empty chunk.
    val chunks = toks.select(col("__id"),
      posexplode(when(size(col("__toks")) === 0,
        array().cast("array<string>")).otherwise(transform(
        sequence(lit(0),
          ((size(col("__toks")) - 1) / chunkTokens).cast("int")),
        i => array_join(
          slice(col("__toks"), i * chunkTokens + 1, lit(chunkTokens)), " ")))))
      .toDF("__id", "chunk_no", "chunk")
    val counts = chunks.groupBy("chunk")
      .agg(countDistinct(col("__id")).as("__ndocs"))
    chunks.join(counts, "chunk")
      .groupBy(col("__id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("__ndocs") < minDocs, 1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__ndocs") < minDocs,
              struct(col("chunk_no"), col("chunk"))))),
            s => s.getField("chunk")), " ").as("cleaned"))
      .withColumnRenamed("__id", idCol)
  }

  /** URL canonicalization — the normalization pass a crawl-dedup pipeline
    * runs BEFORE exact/near dedup so `HTTP://Example.COM:80/a/?b=2&utm_x=1`
    * and `http://example.com/a?b=2` collapse. Rules (each expressible in
    * any engine, so the oracle can mirror them):
    *   1. strip the fragment;
    *   2. lowercase scheme and authority;
    *   3. drop the scheme's default port (:80 http, :443 https);
    *   4. empty path → "/", else strip one trailing "/" (root kept);
    *   5. drop tracking params (utm_*, gclid, fbclid) and empty params;
    *   6. byte-sort the remaining query params.
    * Pure function composition (regexp + higher-order array fns) — stays
    * inside whole-stage codegen, no UDF; at 100 TB this runs in the scan
    * projection before the dedup shuffle.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val authNoPort = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val pathq = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val rawPath = regexp_extract(pathq, "^([^?]*)", 1)
    val path = when(length(rawPath) === 0, lit("/"))
      .when(rawPath === "/", lit("/"))
      .otherwise(regexp_replace(rawPath, "/$", ""))
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = filter(split(query, "&"), p =>
      length(p) > 0 && !p.startsWith("utm_") &&
        !p.startsWith("gclid=") && !p.startsWith("fbclid=") &&
        !(p === "gclid") && !(p === "fbclid"))
    val canonQ = array_join(sort_array(params), "&")
    concat(scheme, lit("://"), authNoPort, path,
      when(length(canonQ) > 0, concat(lit("?"), canonQ)).otherwise(lit("")))
  }

  /** Rolling-hash document sketch: first 8 hex chars of the fingerprint,
    * useful as a cheap shard/bucket key.
    */
  def fingerprintPrefix(text: Column, n: Int = 8): Column =
    substring(fingerprint(text), 1, n)

  /** Sliding-window token chunking — split documents into ~`chunkTokens`-
    * token windows advancing by `chunkTokens - overlap` (training pipelines
    * chunk long documents to the model context length; overlap preserves
    * cross-boundary context). One explode per chunk, no shuffle: each
    * document expands to ceil((tokens - overlap) / step) rows in place.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"need chunkTokens > overlap >= 0, got ($chunkTokens, $overlap)")
    val step = chunkTokens - overlap
    val toks = split(col(textCol), "\\s+")
    val nChunks = greatest(lit(1),
      ceil((size(toks) - lit(overlap)) / lit(step.toDouble)).cast("int"))
    df.select(col(idCol), toks.as("__toks"), nChunks.as("__n"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__n") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__toks"),
          col("chunk_idx") * step + 1, lit(chunkTokens)), " ").as("chunk_text"),
        size(slice(col("__toks"),
          col("chunk_idx") * step + 1, lit(chunkTokens))).as("n_tokens"))
  }

  /** Within-document repetition signals — the Gopher-rule repetition
    * family (duplicate n-gram fraction, most-frequent-n-gram coverage)
    * used by C4/Gopher/FineWeb-style pipelines to drop documents dominated
    * by repeated spans (boilerplate, keyword stuffing, generation loops).
    * Documents shorter than `n` tokens have no n-grams and drop out, like
    * the empty-unnest on the oracle side.
    *
    * Shape at scale: explode to (doc, gram), one hash aggregate whose
    * map-side partial collapses each document's grams before the only
    * wide shuffle, then a per-doc rollup on the already-doc-keyed stream —
    * no joins, no second scan of the corpus.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    // materialize the token array in its own projection: referenced from
    // inside the transform lambda, an inline split() would re-tokenize the
    // document once per gram (measured 4.7x slower at sf0.1); the multiple
    // non-cheap references keep CollapseProject from inlining this
    val pre = spreadInput(df).select(col(idCol), tokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    val gramCount = size(toks) - n + 1
    val grams = when(gramCount >= 1,
      transform(sequence(lit(1), gramCount),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array())
    val perGram = pre
      .select(col(idCol), explode(grams).as("gram"))
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    perGram.groupBy(col(idCol))
      .agg(sum("cnt").as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"),
        max("cnt").as("top_ngram_count"))
      .select(col(idCol),
        col("total_ngrams"), col("distinct_ngrams"), col("top_ngram_count"),
        round(lit(1.0) -
          col("distinct_ngrams") / col("total_ngrams").cast("double"), 6)
          .as("dup_ngram_frac"),
        round(col("top_ngram_count") / col("total_ngrams").cast("double"), 6)
          .as("top_ngram_cover"))
  }

  /** Cross-document boilerplate spans — word n-grams that appear in at
    * least `minDocs` distinct documents (site templates, license headers,
    * navigation text). The cross-corpus complement of
    * [[repetitionSignals]]: pipelines first FIND widespread spans with
    * this, then strip or down-weight documents dominated by them. One
    * explode + one hash aggregate keyed on the gram (count-distinct runs
    * two-phase); only (gram, id) pairs shuffle, documents never move.
    */
  def boilerplateGrams(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 5, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 1,
      s"need n >= 1 and minDocs >= 1, got ($n, $minDocs)")
    val pre = spreadInput(df).select(col(idCol), tokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    val gramCount = size(toks) - n + 1
    val grams = when(gramCount >= 1,
      transform(sequence(lit(1), gramCount),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array())
    pre.select(col(idCol), explode(grams).as("gram"))
      .groupBy(col("gram"))
      .agg(count_distinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Full document-profile projection used by q_text_* queries.
    *
    * Computed as one explode + hash-aggregate pass (token counts, stopword
    * hits, language-marker hits all come from the same grouped scan) rather
    * than per-row higher-order functions — HOFs run interpreted, and at
    * corpus scale this shape is several times faster while producing
    * bit-identical metrics.
    */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val base = df.repartition(par).select(
      col(idCol).as("__id"),
      col(textCol).as("__text"),
      length(col(textCol)).cast("double").as("__nc"),
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), "[\\p{Punct}]", "")))
        .cast("double").as("__np"),
      fingerprint(col(textCol)).as("fp"))
    val markers = Map(
      "en" -> Seq("the", "and", "is", "of"), "fr" -> Seq("le", "la", "et", "les"),
      "es" -> Seq("el", "los", "las", "una"), "de" -> Seq("der", "die", "und", "das"))
    // outer-explode so zero-token docs keep their row (tok = null), then a
    // single groupBy: the per-doc scalars ride along under first() and the
    // map-side partial aggregate collapses each doc's tokens before the
    // shuffle, so the exchange carries one small row per document — one
    // shuffle total, no re-scan, no join (previous shape: explode-agg +
    // join back to a second scan of the table)
    val toks = base
      .select(col("__id"), col("__nc"), col("__np"), col("fp"),
        explode_outer(filter(split(col("__text"), "\\s+"),
          t => length(t) > 0)).as("tok"))
      .withColumn("ltok", lower(col("tok")))
    val j = toks.groupBy(col("__id")).agg(
      first(col("__nc")).as("__nc"),
      first(col("__np")).as("__np"),
      first(col("fp")).as("fp"),
      count(col("tok")).cast("double").as("__nt"),
      sum(when(col("tok").isin(Stopwords.map(lit): _*), 1).otherwise(0))
        .cast("double").as("__ns"),
      sum(when(col("ltok").isin(markers("en").map(lit): _*), 1).otherwise(0)).as("sc_en"),
      sum(when(col("ltok").isin(markers("fr").map(lit): _*), 1).otherwise(0)).as("sc_fr"),
      sum(when(col("ltok").isin(markers("es").map(lit): _*), 1).otherwise(0)).as("sc_es"),
      sum(when(col("ltok").isin(markers("de").map(lit): _*), 1).otherwise(0)).as("sc_de"))
      .withColumn("__ns", coalesce(col("__ns"), lit(0.0)))
    val nt = col("__nt"); val nc = col("__nc"); val ns = col("__ns")
    val stopRatio = when(nt === 0, 0.0).otherwise(ns / nt)
    val punctRatio = when(nc === 0, 0.0).otherwise(col("__np") / nc)
    val best = greatest(col("sc_en"), col("sc_fr"), col("sc_es"), col("sc_de"))
    j.select(
      col("__id").as(idCol),
      nc.cast("long").as("n_chars"),
      nt.cast("long").as("n_tokens"),
      ns.cast("long").as("n_stopwords"),
      when(nt === 0, 0.0).otherwise((nc - (nt - 1)) / nt).as("mean_token_len"),
      stopRatio.as("stopword_ratio"),
      punctRatio.as("punct_ratio"),
      (least(nt / 50.0, lit(1.0)) * (lit(0.5) + least(stopRatio * 10.0, lit(1.0)) * 0.5) *
        greatest(lit(0.0), lit(1.0) - punctRatio * 4.0)).as("quality"),
      when(col("sc_en") > 0 && col("sc_en") === best, "en")
        .when(col("sc_fr") > 0 && col("sc_fr") === best, "fr")
        .when(col("sc_es") > 0 && col("sc_es") === best, "es")
        .when(col("sc_de") > 0 && col("sc_de") === best, "de")
        .otherwise("und").as("pred_lang"),
      col("fp"))
  }
}
