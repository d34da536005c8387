package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting
  * (whitespace + regex sub-token), quality scoring from cheap ratios,
  * stopword-profile language identification, and content fingerprints.
  *
  * Everything is per-row map work over built-in (codegen'd) expressions —
  * no UDFs, no shuffles except where a query aggregates. All ratios are
  * quotients of integers, so their doubles are engine-identical and the
  * whole family sits on the exact-hash oracle path.
  */
object TextStats {

  /** Whitespace token array (single-space contract of the corpus). */
  def tokens(textCol: Column): Column = split(lower(textCol), " ")

  /** "BPE-ish" sub-token count: alpha runs, digit runs, or single
    * non-alphanumeric marks — the usual pre-tokenizer shape. */
  def regexTokenCount(textCol: Column): Column =
    size(regexp_extract_all(lower(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Quality components + composite score:
    *  - len_score: length capped at `lenCap` chars, scaled to [0,1]
    *  - distinct_ratio: lexical diversity (|distinct| / |tokens|)
    *  - stop_ratio: stopword fraction (natural-text prior)
    * score = mean of the three (∈ [0,1]).
    */
  def withQuality(df: DataFrame, textCol: Column, stopwords: Seq[String], lenCap: Int = 200): DataFrame = {
    val toks = tokens(textCol)
    val nTok = size(toks)
    val stopArr = array(stopwords.map(lit): _*)
    df.withColumn("n_tokens", nTok)
      .withColumn("re_tokens", regexTokenCount(textCol))
      .withColumn("len_score", least(length(textCol).cast("double") / lenCap, lit(1.0)))
      .withColumn("distinct_ratio", size(array_distinct(toks)).cast("double") / nTok)
      .withColumn("stop_ratio",
        size(filter(toks, t => array_contains(stopArr, t))).cast("double") / nTok)
      .withColumn("quality",
        (col("len_score") + col("distinct_ratio") + col("stop_ratio")) / 3.0)
  }

  /** Canonical text for dedup: lowercase, punctuation → space, runs of
    * spaces collapsed, ends trimmed. Reformatted copies (case changes,
    * punctuation swaps, whitespace reflow) collapse to one canonical
    * form, so a digest over THIS catches the trivially-edited
    * duplicates a raw digest misses — the standard normalize-then-hash
    * first stage of a dedup pipeline. Dialect-neutral character-class
    * regex (the q_text_redact precedent): Spark replaces globally by
    * default, DuckDB mirrors with the 'g' flag. Pure narrow per-row
    * compute — composes into any scan. */
  def normalized(textCol: Column): Column =
    trim(regexp_replace(regexp_replace(lower(textCol), "[^a-z0-9 ]+", " "), " +", " "))

  /** Exact integer floor division for positive operands: (a − a mod b) ∕ b
    * — the subtraction makes the double division exact (the result is an
    * integer ≤ 2^53), where a bare `a / b` could round UP across an
    * integer boundary and break floor semantics cross-engine. */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** [[withQuality]]'s EXACT-INTEGER counterpart for threshold work: the
    * three components as permille (floor) integers, summed to a
    * `quality_pm` score ∈ [0, 3000]. Integer scores make downstream
    * selection thresholds bit-exact across engines (no float ratio ever
    * compares against a cut), and the bounded domain is what lets
    * [[Sample.topFractionByScore]] find an exact threshold from a
    * 3001-row histogram instead of a corpus sort. */
  def withQualityInt(df: DataFrame, textCol: Column, stopwords: Seq[String],
      lenCap: Int = 200): DataFrame = {
    val toks = tokens(textCol)
    // Divisor floor at 1: a zero token count would make Spark's integer
    // division yield NULL while DuckDB's `//` raises — a single degenerate
    // doc would desync the oracle. greatest(n, 1) is mirrored verbatim in
    // the q_quality_prune SQL so both engines stay on the exact-hash path.
    val nTok = greatest(size(toks).cast("long"), lit(1L))
    val stopArr = array(stopwords.map(lit): _*)
    df.withColumn("quality_pm",
      least(idiv(length(textCol).cast("long") * 1000L, lit(lenCap.toLong)), lit(1000L)) +
        idiv(size(array_distinct(toks)).cast("long") * 1000L, nTok) +
        idiv(size(filter(toks, t => array_contains(stopArr, t))).cast("long") * 1000L, nTok))
  }

  /** A Gopher/C4-style document gate: the published doc-level filter
    * heuristics for LLM pretraining corpora (word-count band, mean-
    * word-length band, stop-word presence, lexical-diversity floor —
    * Rae et al. 2021 §A1.1; Raffel et al. 2020 §2.2), as declarative
    * defaults a pipeline overrides per corpus. Thresholds that are
    * ratios in the papers are permille integers here, the repo-wide
    * exact-integer trade that keeps the gate bit-identical across
    * engines. */
  final case class GateRules(
      minWords: Int = 30, maxWords: Int = 90,
      minWordLenPm: Long = 4000, maxWordLenPm: Long = 5000,
      stopwords: Seq[String] = Seq("a", "the", "and", "of", "to", "in", "is", "that"),
      minStopHits: Int = 2,
      minDistinctPm: Long = 450)

  /** Per-document [[GateRules]] evaluation: the rule inputs (`n_words`,
    * `mwl_pm` mean word length, `distinct_pm`, `stop_hits`), one
    * boolean flag per rule, and the conjunction `keep` — so a pipeline
    * can filter on `keep` AND audit per-rule kill rates from the same
    * pass. One narrow map over the scan: no shuffle, no UDF, composes
    * with any downstream gate (the Gopher pipeline shape: rule gate →
    * dedup → mix). Mean word length uses the corpus's single-space
    * contract (`chars = length − (n − 1)` — no second tokenization),
    * and every division is [[idiv]]-floored on positives, so the whole
    * report replays exactly in DuckDB (q_quality_gate). */
  def withGateFlags(df: DataFrame, textCol: Column,
                    rules: GateRules = GateRules()): DataFrame = {
    val toks = tokens(textCol)
    // same degenerate-doc floor as withQualityInt (mirrored in the SQL)
    val nTok = greatest(size(toks).cast("long"), lit(1L))
    val stopArr = array(rules.stopwords.map(lit): _*)
    df.withColumn("n_words", size(toks))
      .withColumn("mwl_pm",
        idiv((length(textCol).cast("long") - col("n_words") + 1L) * 1000L, nTok))
      .withColumn("distinct_pm",
        idiv(size(array_distinct(toks)).cast("long") * 1000L, nTok))
      .withColumn("stop_hits", size(array_intersect(array_distinct(toks), stopArr)))
      .withColumn("r_nwords", col("n_words").between(rules.minWords, rules.maxWords))
      .withColumn("r_wordlen", col("mwl_pm").between(rules.minWordLenPm, rules.maxWordLenPm))
      .withColumn("r_stop", col("stop_hits") >= rules.minStopHits)
      .withColumn("r_distinct", col("distinct_pm") >= rules.minDistinctPm)
      .withColumn("keep",
        col("r_nwords") && col("r_wordlen") && col("r_stop") && col("r_distinct"))
  }

  /** Stopword-profile language ID: count marker-token hits per language,
    * predict the argmax with an alphabetical tie-break. (The real thing
    * uses char-n-gram profiles — same operator shape: per-language score
    * columns + a deterministic argmax.) Returns the input plus one
    * `hits_<lang>` column per profile and `predicted_lang`. */
  def withLangId(df: DataFrame, textCol: Column, profiles: Map[String, Seq[String]]): DataFrame = {
    val langs = profiles.keys.toSeq.sorted
    val toks = tokens(textCol)
    val withHits = langs.foldLeft(df) { (acc, lang) =>
      val marker = array(profiles(lang).map(lit): _*)
      acc.withColumn(s"hits_$lang",
        size(filter(toks, t => array_contains(marker, t))))
    }
    val best = greatest(langs.map(l => col(s"hits_$l")): _*)
    val predicted = langs.tail.foldLeft(when(col(s"hits_${langs.head}") === best, langs.head)) {
      (acc, l) => acc.when(col(s"hits_$l") === best, l)
    }
    withHits.withColumn("predicted_lang", predicted)
  }

  /** Content fingerprints: md5 hex plus a positional polynomial hash
    * (Σ ascii(ch_i)·i over 1-based positions — order-sensitive, exact
    * integer arithmetic, trivially portable). */
  def withFingerprints(df: DataFrame, textCol: Column): DataFrame = {
    val chars = filter(split(textCol, ""), c => c =!= "")
    df.withColumn("fp_md5", md5(textCol.cast("binary")))
      .withColumn("fp_poly",
        aggregate(
          zip_with(chars, sequence(lit(1), length(textCol)), (c, i) => ascii(c) * i.cast("long")),
          lit(0L), (acc, v) => acc + v))
  }

  /** Exact heavy hitters (all keys with count >= minCount) WITHOUT a
    * full-cardinality shuffle — the two-pass count-min pattern:
    *
    *   1. sketch pass: one distributive `cms_build` aggregate collapses
    *      every partition to a fixed depth×width counter grid (KBs
    *      cross the wire, vs one partial row per (partition, distinct
    *      key) for the exact groupBy — the vocabulary, at corpus scale);
    *   2. candidate pass: a narrow codegen'd scan filter keeps only
    *      rows whose estimate reaches minCount. CMS overestimates ONLY,
    *      so this is a SUPERSET of the true heavy hitters;
    *   3. exact recount of the candidates — the shuffle now carries
    *      only (partition × candidate-key) partials — and a final
    *      `>= minCount` erases the sketch's false positives.
    *
    * Output is EXACTLY the plain `groupBy.count.having` answer, which
    * is what the q_heavy_hitters oracle checks. Width controls the
    * false-positive rate (estimate error ≈ 2·N/width per row with
    * depth rows to take the min over); exactness never depends on it.
    * Input scanned twice (sketch + candidates) — the linear-scan price
    * of not shuffling the universe; cache upstream if the key column
    * is expensive to derive. */
  def heavyHitters(keys: DataFrame, keyCol: Column, minCount: Long,
                   depth: Int = 4, width: Int = 1 << 16,
                   literalMaxBytes: Int = 1 << 19): DataFrame = {
    require(minCount > 0, s"heavyHitters: minCount must be positive, got $minCount")
    graft.GraftFunctions.ensure(keys.sparkSession)
    val k = keys.select(keyCol.as("key"))
    val cms = k.select(xxhash64(col("key")).as("h"))
      .agg(call_function("cms_build", col("h"), lit(depth), lit(width)).as("c"))
      .head().getAs[Array[Byte]](0)
    // size-adaptive delivery (the bloomDecontaminate pattern): a wide
    // low-error grid (depth × width × 8 bytes) rides the broadcast bus
    // as a BroadcastRef instead of bloating every task's serialized plan
    val probe =
      if (cms.length <= literalMaxBytes) lit(cms)
      else graft.expressions.BroadcastRef.column(
        keys.sparkSession.sparkContext.broadcast(cms),
        org.apache.spark.sql.types.BinaryType)
    k.filter(call_function("cms_query", probe, xxhash64(col("key"))) >= minCount)
      .groupBy("key").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Repetition signals (the Gopher/C4-style quality gates against
    * machine-generated or boilerplate text), per document:
    *
    *  - `n_words`        — whitespace token count
    *  - `dup_word_permille`   — ⌊(n − |distinct words|)·1000 / n⌋: the
    *    fraction of word occurrences that are repeats of an earlier word
    *  - `top_bigram_permille` — ⌊(occurrences of the most frequent word
    *    2-gram)·2·1000 / n⌋: the fraction of the doc covered by its
    *    single most repeated bigram (≈ the "fraction of characters in
    *    the most common n-gram" filter, in word units)
    *
    * Permille as FLOOR of an IEEE double division, spelled identically
    * in the DuckDB mirror: both engines perform the same single
    * division (exact-integer quotients are exact in IEEE; non-integer
    * quotients floor identically for numerators < 2^53 — documents
    * would need 2^43 words to breach it).
    *
    * Everything is per-row map work in one stage — no shuffle, no UDF.
    * The top-bigram mode is the longest equal-run of the SORTED bigram
    * array — one `array_sort` + one `aggregate` pass, O(n log n) per
    * doc. (The naive `transform(distinct, x -> count(filter(bg, =x)))`
    * spelling re-evaluates the whole tokenize→zip chain inside the
    * lambda — lambdas are interpreted, not codegen'd, and CSE does not
    * reach into them: measured 17.9 s → sub-second at sf0.1.) For
    * pathological single-docs of 10⁶+ words, explode → per-(doc,
    * bigram) count → max_by is the same contract with two exchanges. */
  def withRepetition(df: DataFrame, textCol: Column): DataFrame = {
    val toks = tokens(textCol)
    val n = size(toks)
    // adjacent-pair zip: slice is 1-based; n-1 pairs for n tokens
    val bigrams = zip_with(
      slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    // longest run in sort order = max multiplicity; a bigram always
    // contains a space so the "" init can never match the first element,
    // and an empty array returns the zero's best = 0 (no coalesce needed)
    val topBigram = aggregate(
      array_sort(bigrams),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    df.withColumn("n_words", n.cast("long"))
      .withColumn("dup_word_permille",
        floor((n - size(array_distinct(toks))).cast("double") * 1000 / n).cast("long"))
      .withColumn("top_bigram_permille",
        floor(topBigram.cast("double") * 2000 / n).cast("long"))
  }

  /** Sliding-window CHUNKING: split each document into `window`-token
    * chunks every `stride` tokens (overlap = window − stride), the
    * long-document → training-sequence step of an LLM data pipeline.
    * The final chunk starts at the smallest stride multiple whose
    * window reaches the end of the document, so every token lands in
    * ≥ 1 chunk and no start index runs past the text; short documents
    * yield exactly one (possibly sub-window) chunk.
    *
    * Emits one row per (doc, chunk): `chunk_id` (0-based), `start`
    * (0-based token offset), `chunk_len`, `chunk_text`. Pure map-side
    * work — tokenize, one `sequence` of start offsets, `posexplode`,
    * `slice` — a single narrow codegen stage, no shuffle; output size
    * is ~n/stride rows per doc, the chunking's inherent inflation. */
  def chunkSliding(df: DataFrame, idCol: Column, textCol: Column,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"chunkSliding: need 0 < stride <= window, got window=$window stride=$stride")
    val toks = tokens(textCol)
    val n = size(toks)
    // ceil((n - window)/stride)·stride via floor of an IEEE division —
    // exact cross-engine (see withRepetition's bound); 0 when the doc
    // fits a single window
    val lastStart = greatest(lit(0),
      (floor((n - window + (stride - 1)).cast("double") / stride) * stride).cast("int"))
    df.select(idCol.as("id"), toks.as("__toks"), lastStart.as("__last"))
      .select(col("id"), col("__toks"),
        posexplode(sequence(lit(0), col("__last"), lit(stride))).as(Seq("chunk_id", "start")))
      .select(
        col("id"), col("chunk_id").cast("long").as("chunk_id"),
        col("start").cast("long").as("start"),
        size(slice(col("__toks"), col("start") + 1, lit(window))).cast("long").as("chunk_len"),
        array_join(slice(col("__toks"), col("start") + 1, lit(window)), " ").as("chunk_text"))
  }

  /** Corpus DISTRIBUTION-DRIFT report between two snapshots — the
    * monitoring step between corpus versions (a scrape refresh, a new
    * source mix): per token the add-one-smoothed RATE ratio
    * `ratio_ppm = 10⁶ · ((n_new+1)/(N_new+V)) / ((n_old+1)/(N_old+V))`
    * evaluated as one integer expression (log-free, engine-exact — the
    * [[NgramLm]] discipline; V = the union vocabulary, so both
    * smoothed rates share a denominator convention and a token absent
    * from one side gets a finite, saturating ratio instead of a
    * divide-by-zero). `drift_ppm = max(ratio, 10¹²/ratio)` folds both
    * directions onto one magnitude so the top-k surfaces collapses AND
    * explosions.
    *
    * Scale shape: each snapshot folds to its token-count table
    * (map-side combined, one vocabulary-sized shuffle each), a FULL
    * OUTER join on token aligns them, and the report is top-k via
    * TakeOrdered — the corpora are touched once each and never joined
    * row-to-row. `minSupport` (on n_old + n_new) keeps one-off typos
    * out of the report.
    *
    * Output: `(token, n_old, n_new, ratio_ppm, drift_ppm)`, the `topK`
    * largest drifts (ties broken by token). */
  def vocabDrift(oldToks: DataFrame, newToks: DataFrame, tokenCol: Column,
                 minSupport: Long = 20L, topK: Int = 100,
                 scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    require(topK > 0, s"vocabDrift: topK must be positive, got $topK")
    def counts(df: DataFrame, out: String) =
      df.select(tokenCol.as("token")).groupBy("token")
        .agg(count(lit(1)).as(out))
    // pinned: the aligned table feeds the totals aggregate AND the
    // report — without the pin both token streams fold twice
    val joined = scope.pin(counts(oldToks, "n_old")
      .join(counts(newToks, "n_new"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new")))
    // snapshot totals + union vocabulary: one tiny aggregate, crossed
    // in (the min-max pattern)
    val totals = joined.agg(
      sum("n_old").as("__no"), sum("n_new").as("__nn"),
      count(lit(1)).as("__v"))
    joined.filter(col("n_old") + col("n_new") >= minSupport)
      .crossJoin(broadcast(totals))
      // the numerator product can pass 2⁶³ on a large corpus, so it
      // rides an exact DECIMAL and the integral divide (Spark's `div`
      // = divideToIntegralValue — exact, no rounding drift; DuckDB
      // mirrors with HUGEINT `//`)
      .withColumn("ratio_ppm",
        expr("1000000 * CAST(n_new + 1 AS DECIMAL(20, 0)) * (__no + __v)" +
          " DIV ((n_old + 1) * CAST(__nn + __v AS DECIMAL(20, 0)))"))
      .withColumn("drift_ppm",
        greatest(col("ratio_ppm"),
          expr("1000000000000 DIV greatest(ratio_ppm, 1)")))
      .select("token", "n_old", "n_new", "ratio_ppm", "drift_ppm")
      .orderBy(col("drift_ppm").desc, col("token"))
      .limit(topK)
  }
}
