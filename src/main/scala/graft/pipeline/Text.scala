package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftShim.{column => toCol, expression => toExpr}
import org.apache.spark.sql.functions._

/**
 * Text-quality metrics composed from built-in (codegen'd) functions wherever
 * SQL can express them — only the sketches (lang-id/simhash/minhash/
 * fingerprint) are custom expressions. Composition keeps everything inside
 * whole-stage codegen and lets Catalyst push projections into the scan.
 */
object Text {

  /** One-pass statistics struct shared by every metric below: sibling
    * calls inside one projection deduplicate via subexpression
    * elimination, so computing all quality metrics costs ONE document
    * scan (the regexp_replace/split compositions each allocated a
    * stripped copy of the document per metric per row). Counts are
    * definitionally identical to the regex forms they replaced — all
    * DuckDB oracles mirror the semantics, not the implementation. */
  private def stats(text: Column): Column = toCol(TextStats(toExpr(text)))

  /** Whitespace token count; 0 for blank/empty. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(stats(text).getField("n_tokens"))

  def charCount(text: Column): Column = length(text)

  /** Fraction of characters that are ASCII letters. */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(stats(text).getField("n_alpha").cast("double") / length(text))

  /** Fraction of characters that are digits. */
  def digitRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(stats(text).getField("n_digit").cast("double") / length(text))

  /** Fraction of characters that are ASCII punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(stats(text).getField("n_punct").cast("double") / length(text))

  /** Mean token length. */
  def avgWordLen(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(stats(text).getField("n_nonws").cast("double") / tokenCount(text))

  /** English stopword list shared with the language-ID profile (the same
    * set drives the one-pass stop counter in [[TextUtil.textStats]]). */
  val enStopwords: Seq[String] = TextUtil.enStopSet.toSeq.sorted

  /** Fraction of whitespace tokens that are (lowercased) English stopwords. */
  def stopwordRatio(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(stats(text).getField("n_stop").cast("double") / tokenCount(text))

  /** Word n-gram shingles as array<string> (consecutive-token join).
    * Native expression — the composed `transform`/`element_at(split(…))`
    * form re-ran the regex split per shingle per lambda argument in
    * interpreted HOF evaluation (see [[WordShingles]]); this splits once. */
  def wordShingles(text: Column, n: Int): Column =
    toCol(WordShingles(toExpr(text), n))

  /** GPT-2-style pre-tokenizer pattern, confined to the lookahead-free
    * dialect Java and RE2 share: a token is an optional leading space plus
    * a letter run, digit run, or punctuation run. Counting these
    * approximates BPE token counts far better than whitespace words
    * ("don't" → 3, "3.14" → 3) — the unit that matters for sequence
    * packing and training-cost estimates. */
  val BpeishTokenRe = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  /** BPE-ish token count: matches of [[BpeishTokenRe]] — scan-side,
    * codegen'd, oracle-reproducible (`regexp_extract_all` length). */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeishTokenRe)).cast("long")

  /** Email/phone patterns shared by [[scrubPii]] and its oracle mirror —
    * deliberately confined to the regex dialect Java and RE2 interpret
    * identically (char classes, bounded/unbounded quantifiers; no
    * backrefs, no lookaround). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.][A-Za-z0-9.-]*\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+\\d{1,3}-\\d{3}-\\d{4}"

  /** PII scrubbing (every released corpus pipeline redacts before
    * training): emails then phone numbers replaced by typed placeholder
    * tokens. Pure per-row codegen'd regexp_replace — scan-side, no
    * shuffle, composes with the quality gates. */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** HTML-extraction patterns shared by [[stripHtml]] and its oracle
    * mirror — same Java∩RE2 dialect discipline as [[EmailRe]]. Script
    * and style need their own patterns (no backreferences in RE2), with
    * `(?is)` for case-insensitive dotall block matching; the whitespace
    * run is an explicit class because Java `\s` includes `\x0B` while
    * RE2's does not. */
  val HtmlScriptRe  = "(?is)<script[^>]*>.*?</script[^>]*>"
  val HtmlStyleRe   = "(?is)<style[^>]*>.*?</style[^>]*>"
  val HtmlCommentRe = "(?s)<!--.*?-->"
  val HtmlTagRe     = "<[^>]*>"
  val WsRunRe       = "[ \\t\\n\\r\\f]+"

  /** Entity decodes applied after tag removal, in order — `&amp;` last so
    * double-escaped text (`&amp;lt;`) decodes one level, as a single-pass
    * decoder would. Literal (non-regex) replaces on both engines. */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")

  /**
   * WET-style HTML text extraction — the first step of every web-crawl
   * curation pipeline (CCNet/C4 operate on extracted text, not markup):
   * drop script/style blocks and comments whole, strip remaining tags,
   * decode the common entities, collapse whitespace runs. A pure chain of
   * per-row codegen'd `regexp_replace`/`replace` calls — scan-side, no
   * shuffle, composes with the quality gates downstream.
   */
  def stripHtml(text: Column): Column = {
    val noBlocks = Seq(HtmlScriptRe, HtmlStyleRe, HtmlCommentRe, HtmlTagRe)
      .foldLeft(text)((c, re) => regexp_replace(c, re, " "))
    val decoded = HtmlEntities.foldLeft(noBlocks) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, WsRunRe, " "))
  }

  /**
   * N-gram repetition ratio in [0,1]: 1 − distinct/total word n-grams —
   * the boilerplate/template signal (C4-style quality filtering drops
   * high-repetition docs). DataFrame-shaped so the shingle array is
   * materialized in its own projection and the three references to it
   * below stay references (CollapseProject declines to inline a non-cheap
   * expression referenced three times — the bandHashes rule).
   */
  def repetitionScore(df: DataFrame, textCol: String, idCol: String,
                      n: Int = 3): DataFrame =
    df.select(col(idCol), wordShingles(col(textCol), n).as("__sh"))
      .select(col(idCol),
        when(size(col("__sh")) > 0,
            lit(1.0) - size(array_distinct(col("__sh"))).cast("double") /
              size(col("__sh")))
          .otherwise(0.0).as("repetition"))

  /**
   * Gopher-style per-document n-gram repetition signals (Rae et al. 2021,
   * arXiv:2112.11446 §A1.1 — the "repetitious text" filters), on the
   * whitespace word stream with character mass = Σ word lengths (spaces
   * excluded, so the metric is layout-invariant):
   *
   *  - `top2_char_frac`  — characters covered by occurrences of the single
   *    most frequent word 2-gram / total word characters (ties break to
   *    the lexicographically smallest 2-gram);
   *  - `dup3_char_frac`  — characters covered by ALL occurrences of word
   *    3-grams that appear ≥ 2 times / total word characters (overlapping
   *    occurrences each count — the fraction may exceed 1 on degenerate
   *    repetition, which is exactly the signal).
   *
   * Both are ratios of exact integers (one IEEE division — bit-identical
   * in any engine; docs with no 2-grams/3-grams report 0.0).
   *
   * Scale shape: shingles explode per doc and aggregate by (doc, gram)
   * with map-side partial combine — a boilerplate gram repeated 10⁶ times
   * inside one document still combines locally (same argument as
   * dedupLines' winner aggregate); the two gram branches and the per-doc
   * char total then meet in joins keyed on the doc id only.
   */
  def ngramRepetitionStats(df: DataFrame, textCol: String,
                           idCol: String): DataFrame = {
    // character mass of one word n-gram occurrence = gram length minus its
    // n−1 joining spaces
    def gramChars(n: Int): Column = length(col("__g")) - lit(n - 1)
    def gramCounts(n: Int): DataFrame =
      df.select(col(idCol), explode(wordShingles(col(textCol), n)).as("__g"))
        .groupBy(col(idCol), col("__g"))
        .agg(count(lit(1)).as("__c"), first(gramChars(n)).as("__w"))
    // NOTE (round-10 audit): a single-scan variant (both gram orders
    // tagged into one struct-array explode + one conditional-aggregate
    // pass) was built and measured 6× SLOWER at sf0.1 (8.7 s vs 0.9 s
    // for the generate stage) — the tagged-struct array materialization
    // costs far more per row than the scan it saves. Two plain explodes
    // of string arrays stay in codegen and win at every scale where the
    // scan is not the bottleneck; at 100 TB the two scans read the slim
    // (id, text) projection twice, the documented trade.
    val totals = df.select(col(idCol),
      aggregate(filter(split(trim(col(textCol)), "\\s+"), w => w =!= ""),
        lit(0L), (acc, w) => acc + length(w)).as("__chars"))
    // argmax by (count desc, gram asc) as a min(struct(-count, gram)) —
    // no Window, combines map-side
    val top2 = gramCounts(2)
      .groupBy(col(idCol))
      .agg(min(struct((-col("__c")).as("nc"), col("__g").as("g"),
        col("__w").as("w"))).as("__t"))
      .select(col(idCol),
        ((-col("__t.nc")) * col("__t.w")).as("__top2_chars"))
    val dup3 = gramCounts(3)
      .groupBy(col(idCol))
      .agg(sum(when(col("__c") >= 2, col("__c") * col("__w"))
        .otherwise(lit(0L))).as("__dup3_chars"))
    totals
      .join(top2, Seq(idCol), "left")
      .join(dup3, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__chars") > 0,
            coalesce(col("__top2_chars"), lit(0L)).cast("double") / col("__chars"))
          .otherwise(0.0).as("top2_char_frac"),
        when(col("__chars") > 0,
            coalesce(col("__dup3_chars"), lit(0L)).cast("double") / col("__chars"))
          .otherwise(0.0).as("dup3_char_frac"))
  }

  /**
   * Composite quality score in [0,1]: rewards mid-length docs with high
   * letter content and penalizes punctuation/digit noise. A cheap, fully
   * codegen'd scan-side metric for corpus filtering.
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val alpha = alphaRatio(text)
    val noise = punctRatio(text) + digitRatio(text)
    greatest(least(lenScore * 0.3 + alpha * 0.7 - noise * 0.5, lit(1.0)), lit(0.0))
  }

  /**
   * Corpus term statistics: one row per (doc, term) with term frequency,
   * plus each term's document frequency — the exact-count substrate of
   * TF-IDF. Two shuffles: one groupBy (doc, term), one term-level DF join
   * (broadcastable when vocabulary is small).
   */
  def termStats(df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("term"))
  }

  /**
   * BM25 relevance of each document for each query term:
   * idf(df)·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with the Robertson idf
   * ln(1 + (N−df+0.5)/(df+0.5)). Corpus stats (N, avgdl) join in as a
   * broadcast one-row aggregate — no driver-side action (unlike [[tfidf]]'s
   * `count()`), so the operator composes lazily at any scale.
   */
  def bm25(df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    val stats = termStats(df, textCol, idCol) // (term, doc_id, tf, df)
    val dl = df.select(col(idCol).as("doc_id"),
      tokenCount(col(textCol)).cast("double").as("dl"))
    val corpus = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    stats.filter(col("term").isin(queryTerms: _*))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("bm25", col("idf") * col("tf") * (lit(k1) + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("bm25"))
  }

  /** TF-IDF scores from [[termStats]]: tf · (ln((N+1)/(df+1)) + 1).
    * The corpus size joins in as a broadcast one-row aggregate (same
    * no-driver-action shape as [[bm25]]) — the operator composes lazily
    * at any scale instead of forcing a `count()` action per call. */
  def tfidf(df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    val corpus = df.agg(count(lit(1)).cast("double").as("__n_docs"))
    termStats(df, textCol, idCol)
      .crossJoin(broadcast(corpus))
      .withColumn("tfidf",
        col("tf") * (log((col("__n_docs") + 1.0) / (col("df") + 1.0)) + 1.0))
      .drop("__n_docs")
  }

  /**
   * Keyword extraction: each document's top-k terms by TF-IDF — the
   * "what is this doc about" tagger feeding search facets and topic
   * audits. Rides [[tfidf]]'s exact per-term weights; the per-doc cut
   * is the bounded top-k aggregate (no Window), ties broken by term.
   * Exact ties come only from equal (tf, df) pairs — identical in any
   * engine — so the ranking is deterministic; display-round the weight.
   */
  def docKeywords(df: DataFrame, textCol: String, idCol: String,
                  k: Int): DataFrame =
    GroupedTopK.topK(tfidf(df, textCol, idCol), Seq("doc_id"),
      Seq(("tfidf", false), ("term", true)), k, rankCol = "rank")

  /**
   * Sparse TF-IDF cosine document pairs ≥ `threshold` via the inverted
   * index — the sparse lexical complement to the dense-embedding ANN
   * family ([[graft.pipeline.Similarity]]): exact cosine over
   * [[tfidf]]-weighted term vectors with no embedding model in the loop.
   *
   * Pair generation is a posting-list self-join on the term (only doc
   * pairs sharing a term can have cosine > 0), partial-aggregated into
   * per-pair dot products; norms join back per side. `maxDf` drops terms
   * appearing in more than `maxDf` documents from the INDEX — their idf
   * weight is near-noise and their posting lists are the quadratic
   * hazard — bounding pair-generation work at df ≤ maxDf per term: the
   * deterministic analogue of the LSH hot-bucket guard. (Dropped terms
   * also leave the norms, so the result is exactly the cosine over the
   * capped vocabulary — state the cap when reporting similarities.)
   *
   * Per-term weights are exact-count expressions; the dot/norm sums are
   * order-dependent at ~1e-15 — callers round the cosine (4dp) and keep
   * thresholds away from that noise floor.
   */
  def tfidfCosinePairs(df: DataFrame, textCol: String, idCol: String,
                       threshold: Double, maxDf: Long): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(maxDf > 0, s"maxDf must be positive, got $maxDf")
    // w is consumed four times (both posting-join sides, norms, and the
    // final cosine projection) and each consumer would otherwise replay
    // the whole tfidf pipeline (scan + explode + three aggregate layers
    // — the formatted plan showed four copies of the subtree). The frame
    // is SLIM — (doc, term, weight), already df-bounded by maxDf — so it
    // persists MEMORY_AND_DISK; cache-hygiene contract as documented in
    // OPERATORS.md (caller clears after materializing).
    val w = tfidf(df, textCol, idCol)
      .filter(col("df") <= maxDf)
      .select(col("doc_id").as("__id"), col("term"), col("tfidf").as("__w"))
      .persist()
    val norms = w.groupBy("__id")
      .agg(sqrt(sum(col("__w") * col("__w"))).as("__nrm"))
    // the posting self-join's inputs are byte-light (16-byte rows) but
    // its output is the compute-dense pair expansion + dot partials —
    // exactly the shape AQE's byte-based coalescing serializes (measured
    // at sf0.1: the whole 124k-pair expansion in ONE 870 ms task, 30% of
    // q133). Pin both sides on a term-keyed exchange at session
    // parallelism: user-specified shuffles are exempt from coalescing,
    // the two sides canonicalize to ONE reused exchange, and the join is
    // co-partitioned so no further exchange precedes the expansion (the
    // q130 set-sim verify fix).
    val wKeyed = w.repartition(
      df.sparkSession.sparkContext.defaultParallelism, col("term"))
    // shuffle_hash pins the join strategy too: AQE otherwise broadcasts
    // the byte-small build side and runs the probe (and with it the
    // whole expansion) inside the coalesced downstream stage — the
    // repartition alone measured no width change. Co-partitioned SHJ
    // executes the expansion at the exchange's 32 tasks.
    wKeyed.select(col("__id").as("id_a"), col("term"), col("__w").as("__wa"))
      .join(wKeyed.select(col("__id").as("id_b"), col("term"), col("__w").as("__wb"))
        .hint("shuffle_hash"), Seq("term"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("__wa") * col("__wb")).as("__dot"))
      .join(norms.select(col("__id").as("id_a"), col("__nrm").as("__na")), Seq("id_a"))
      .join(norms.select(col("__id").as("id_b"), col("__nrm").as("__nb")), Seq("id_b"))
      .withColumn("cosine", col("__dot") / (col("__na") * col("__nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /**
   * Unigram negative log-likelihood per document — the KenLM-style
   * perplexity proxy for quality filtering (documents whose tokens are
   * improbable under the corpus unigram distribution score high and get
   * dropped/downweighted). score = avg over tokens of −ln(count(t)/N).
   *
   * Scale shape: one token explode, one vocab aggregate (term-keyed
   * shuffle with map-side partial), the corpus total folded in as a
   * broadcast ONE-ROW aggregate (the bm25/tfidf shape — no driver
   * action), then a broadcast-able vocab join back to the token stream.
   */
  def unigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol),
        explode(filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")).as("__t"))
    val vocab = toks.groupBy("__t").agg(count(lit(1)).as("__c"))
    val total = toks.agg(count(lit(1)).cast("double").as("__n"))
    toks.join(vocab, "__t")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(avg(-log(col("__c").cast("double") / col("__n"))).as("nll"))
  }

  /**
   * Bigram language-model scoring with Stupid Backoff — the CCNet-style
   * perplexity filter one order up from [[unigramLogProb]]: documents are
   * scored under bigram statistics trained on a (possibly different)
   * corpus, so domain-shifted or low-quality text surfaces as a low
   * average log-score while fluent in-domain text scores high.
   *
   * score(doc) = avg over adjacent word pairs (w1, w2) of ln S(w2|w1):
   *   S(w2|w1) = c(w1,w2) / c(w1)           bigram seen in `train`
   *            = alpha · (c(w2)+1) / (N+V)  otherwise — unigram backoff
   *              with add-one smoothing so unseen words stay finite
   * (alpha = 0.4, the published Stupid Backoff constant; "stupid" because
   * the backoff weight is unnormalized — at web scale that loses nothing
   * against Kneser-Ney and needs no discount estimation pass.)
   *
   * Scale shape: the bigram/unigram count tables are token-keyed
   * aggregates with map-side partials; the scorer joins the document
   * bigram stream against them as SHUFFLE equi-joins (at 100 TB the
   * vocabulary outgrows any broadcast) while N and V fold to a one-row
   * broadcast. No Window, no driver-side state; bigram generation is
   * `transform(sequence(...))` over the already-split word array, inside
   * whole-stage codegen. Per-pair S is a ratio of exact counts (identical
   * IEEE in any engine); only the per-doc avg-of-ln is order-dependent —
   * callers round to 4dp (q79 precedent).
   */
  def bigramLm(score: DataFrame, train: DataFrame, textCol: String,
               idCol: String, alpha: Double = 0.4): DataFrame = {
    def words = filter(split(trim(col(textCol)), "\\s+"), w => w =!= "")
    def bigrams(df: DataFrame): DataFrame = df
      .select(col(idCol), words.as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__w")) - 1),
        i => struct(element_at(col("__w"), i).as("w1"),
                    element_at(col("__w"), i + 1).as("w2")))).as("__b"))
      .select(col(idCol), col("__b.w1").as("__w1"), col("__b.w2").as("__w2"))
    val trainToks = train.select(explode(words).as("__t"))
    val uni = trainToks.groupBy("__t").agg(count(lit(1)).as("__c1"))
    val totals = trainToks.agg(count(lit(1)).cast("double").as("__n"),
      count_distinct(col("__t")).cast("double").as("__v"))
    val big = bigrams(train).groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12"))
    bigrams(score)
      .join(big, Seq("__w1", "__w2"), "left")
      .join(uni.select(col("__t").as("__w1"), col("__c1").as("__cw1")), Seq("__w1"), "left")
      .join(uni.select(col("__t").as("__w2"), col("__c1").as("__cw2")), Seq("__w2"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__s", when(col("__c12").isNotNull,
          col("__c12").cast("double") / col("__cw1").cast("double"))
        .otherwise(lit(alpha) *
          (coalesce(col("__cw2"), lit(0L)).cast("double") + 1.0) /
          // empty train ⇒ N=V=0: floor the divisor so the degenerate
          // case scores ln(alpha) per pair instead of an ANSI
          // divide-by-zero crash mid-pipeline
          greatest(col("__n") + col("__v"), lit(1.0))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(log(col("__s"))).as("lm_score"))
  }

  /**
   * CCNet-style per-group quality bucketing: rank every document's
   * perplexity proxy ([[unigramLogProb]]) WITHIN its group (language)
   * and split into `k` equal-frequency buckets — bucket 1 = most fluent
   * ("head"), k = least ("tail"). Normalizing within the group is the
   * point: absolute perplexities aren't comparable across languages, so
   * a global threshold would throw away whole languages (the CCNet
   * lesson); the per-language tercile is the standard keep/downweight
   * knob.
   *
   * `exact = true` uses `ntile(k)` — one Window whose partition is the
   * GROUP (per-language total order): certifiable, and fine while each
   * language fits a reducer. At 100 TB use `exact = false`: bucket
   * boundaries come from `approx_percentile` per group (map-side-partial
   * sketch, broadcast-sized cutoff table, no per-group total order) at
   * the cost of sketch rank error near the cuts — same columns, so
   * pipelines swap freely.
   */
  def qualityBuckets(df: DataFrame, textCol: String, idCol: String,
                     groupCol: String, k: Int = 3,
                     exact: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val scored = df.select(col(idCol), col(groupCol))
      .join(unigramLogProb(df, textCol, idCol), Seq(idCol))
    if (exact) {
      // rank on the ROUNDED score (id tie-break): raw avg-of-ln doubles
      // carry ~1e-13 engine-order noise — ranking on them would let a
      // last-bit difference swap neighbors across a bucket boundary;
      // at 4dp the order is engine-independent (q79 precedent)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol)).orderBy(round(col("nll"), 4), col(idCol))
      scored.withColumn("bucket", ntile(k).over(w))
    } else {
      val cuts = scored.groupBy(col(groupCol))
        .agg(expr(s"approx_percentile(nll, array(${
          (1 until k).map(i => s"${i.toDouble / k}D").mkString(", ")
        }), 10000)").as("__cuts"))
      scored.join(broadcast(cuts), Seq(groupCol))
        .withColumn("bucket",
          (aggregate(col("__cuts"), lit(0),
            (acc, c) => acc + when(col("nll") > c, 1).otherwise(0)) + 1)
            .cast("int"))
        .drop("__cuts")
    }
  }

  /**
   * Vocabulary coverage: per-document out-of-vocabulary token rate
   * against the corpus's own top-`vocabSize` words (count desc, word asc
   * tie-break — deterministic boundary in any engine). The tokenizer-
   * design / domain-shift signal: a doc slice with high OOV against the
   * pretraining vocabulary will fragment into long byte-level token
   * sequences.
   *
   * Scale shape: the vocabulary is a global top-k
   * (TakeOrderedAndProject — per-partition top-k then merge, no global
   * sort) that joins back as a BROADCAST (vocabSize rows by
   * construction); the corpus shuffles only on the doc id for the final
   * per-doc fraction, which is one exact integer division (no rounding
   * needed).
   */
  def vocabOovRate(df: DataFrame, textCol: String, idCol: String,
                   vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val toks = df.select(col(idCol),
      explode(filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")).as("__t"))
    val vocab = toks.groupBy(col("__t")).agg(count(lit(1)).as("__c"))
      .orderBy(desc("__c"), asc("__t")).limit(vocabSize)
      .select(col("__t"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("__t"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("__oov"))
      .select(col(idCol), col("n_tokens"),
        (col("__oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }

  /**
   * Per-document word-distribution Shannon entropy (nats):
   * H = ln(n) − (Σ_w c_w·ln c_w)/n over the doc's own word counts — the
   * lexical-diversity quality signal (template/keyword-stuffed docs score
   * low, natural prose high). One (doc, word) aggregation feeds one
   * per-doc aggregation; both partial-combine map-side. ln drift ≤ 1 ulp
   * and the per-doc sum's order dependence ~1e-13 — callers round to 4dp
   * (q79 precedent).
   */
  def wordEntropy(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
        explode(filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")).as("__t"))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__c").cast("double") * log(col("__c").cast("double"))).as("__s"))
      .select(col(idCol), col("n_tokens"),
        (log(col("n_tokens").cast("double")) -
          col("__s") / col("n_tokens").cast("double")).as("entropy"))

  /**
   * Word-window document chunking — the training-prep move that turns
   * over-long documents into model-sized overlapping pieces: chunk i
   * covers words [i·stride, i·stride+window) of the whitespace-split
   * token stream (stride = window − overlap), 0-based; the final chunk
   * keeps the tail. Chunk text rejoins with single spaces (canonical
   * whitespace — an external engine reproduces every chunk
   * byte-identically from the same word list). Documents with no words
   * emit nothing.
   *
   * Scale shape: one projection, one bounded explode (ceil(n/stride)
   * rows per doc), no shuffle, no UDF — the whole op stays inside
   * whole-stage codegen and chunk extraction is `slice`/`array_join`
   * over the already-split word array.
   */
  def chunkByWords(df: DataFrame, idCol: String, textCol: String,
                   window: Int, overlap: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(overlap >= 0 && overlap < window,
      s"overlap must be in [0, window), got $overlap")
    val stride = window - overlap
    val nw = size(col("__w"))
    val nChunks = greatest(lit(1),
      ceil((nw - lit(window)).cast("double") / stride).cast("int") + lit(1))
    df.select(col(idCol),
        filter(split(trim(col(textCol)), "\\s+"), w => w =!= "").as("__w"))
      .filter(size(col("__w")) > 0)
      .select(col(idCol), col("__w"),
        explode(sequence(lit(0), nChunks - lit(1))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__w"), col("chunk_idx") * stride + 1, lit(window)), " ")
          .as("chunk_text"),
        least(lit(window), nw - col("chunk_idx") * lit(stride)).as("n_words"))
  }

  /**
   * Phrase occurrences by positional VOTE COUNTING — the positional-
   * inverted-index query without materializing per-term position lists:
   * token (pos, w) votes for candidate start `pos − i` for every phrase
   * slot i with words(i) == w; a start with votes in all k slots is a
   * match. For fixed (doc, start), slot i pins token position start+i,
   * so votes are at most one per slot and count = k ⟺ every slot
   * matched. ONE shuffle on (doc, start) after a broadcast join against
   * the k-row slot table; tokens outside the phrase vocabulary drop
   * BEFORE the exchange, so the shuffled volume is the phrase terms'
   * postings, not the corpus. Overlapping matches count (repeated-word
   * phrases vote once per slot — "table table" over "table table table"
   * yields starts 0 and 1). Returns (id, n_matches, first_start) for
   * documents with ≥ 1 match; single-space tokenization, consistent
   * with [[wordShingles]]' contract.
   */
  def phraseMatches(df: DataFrame, idCol: String, textCol: String,
                    phrase: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = phrase.trim.split("\\s+").toSeq
    require(words.nonEmpty && words.head.nonEmpty, "empty phrase")
    val k = words.length
    val pat = words.zipWithIndex.toDF("__w", "__i")
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), " ")).as(Seq("__pos", "__w")))
    toks.join(broadcast(pat), "__w")
      .select(col("id"), (col("__pos") - col("__i")).as("start"))
      .filter(col("start") >= 0)
      .groupBy(col("id"), col("start"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") === k)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_matches"), min(col("start")).as("first_start"))
  }

  /**
   * BPE tokenizer TRAINING in-engine: the classic byte-pair-encoding
   * merge loop (Sennrich et al. 2016) over a (word, frequency) table —
   * the step that turns a curated corpus into a tokenizer. Each round
   * counts adjacent token pairs (frequency-weighted), merges the most
   * frequent pair corpus-wide, and repeats; returns the merge
   * trajectory (merge_rank, lhs, rhs, pair_count) — the artifact a
   * tokenizer ships.
   *
   * Token state is the BRACKET-wrapped token string per word
   * (`"[a][b][c]"`): every token carries its own `[`…`]` delimiters, so
   * adjacent tokens share NO characters — a merge is then a LITERAL
   * replace of `"[l][r]"` with `"[lr]"`, and left-to-right
   * non-overlapping replacement is exactly BPE's canonical greedy merge
   * (a space-separated encoding would consume the shared boundary and
   * under-merge identical-token runs like `a a a a`; brackets also make
   * multi-character boundaries unambiguous — `"[b][c]"` never matches
   * inside `"[ab][c]"`). Both Spark's `replace` and DuckDB's share
   * these semantics, so an unrolled SQL replay is bit-exact. Input
   * words must not contain `[` or `]` (they are the delimiter
   * alphabet); filter them upstream.
   *
   * Scale shape, per round: pair counting is explode + one map-side-
   * combined groupBy on the pair (the only shuffle — vocabulary-of-
   * pairs-sized, not corpus-sized); the winner is a ONE-ROW struct-min
   * aggregate collected to the driver (count desc, then lhs, rhs asc —
   * deterministic); the merge itself is a codegen'd literal replace.
   * The words frame is vocabulary-sized (distinct words, not corpus
   * rows) and persists across rounds — at 100 TB the corpus is read
   * once to build it. Driver state = `merges` rows, like the k-means
   * centroid collect.
   */
  def bpeTrain(words: DataFrame, wordCol: String, freqCol: String,
               merges: Int): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val spark = words.sparkSession
    var state = words.select(
      regexp_replace(col(wordCol), "(.)", "[$1]").as("__s"),
      col(freqCol).cast("long").as("__f")).persist()
    val traj = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < merges && !exhausted) {
      val arr = split(regexp_replace(col("__s"), "^\\[|\\]$", ""), "\\]\\[")
      val pairs = state
        .where(size(arr) >= 2)
        .select(col("__f"), explode(transform(sequence(lit(0), size(arr) - 2),
          i => struct(element_at(arr, i + 1).as("l"),
            element_at(arr, i + 2).as("r")))).as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(sum(col("__f")).as("c"))
      val winner = pairs
        .agg(min(struct((-col("c")).as("nc"), col("l"), col("r"))).as("__w"))
        .select(col("__w.l"), col("__w.r"), (-col("__w.nc")).as("c"))
        .collect()
      if (winner.isEmpty || winner.head.isNullAt(0)) exhausted = true
      else {
        val (l, rr, c) =
          (winner.head.getString(0), winner.head.getString(1), winner.head.getLong(2))
        traj += ((r + 1, l, rr, c))
        // localCheckpoint (EAGER): materialize the merged state BEFORE
        // dropping the previous round's cache. The earlier lazy
        // persist-then-unpersist left `next` unmaterialized when its
        // parent cache vanished, so EVERY round silently re-derived the
        // vocabulary from the corpus scan and replayed all prior merges
        // — O(rounds²) work (profiled: one corpus-scan stage per round
        // in q160). Checkpointing also pins lineage at one leaf, so a
        // real 10k-merge tokenizer doesn't accrete a 10k-replace plan.
        val next = state.select(
          replace(col("__s"), lit(s"[$l][$rr]"), lit(s"[$l$rr]")).as("__s"),
          col("__f")).localCheckpoint(true)
        state.unpersist()
        state = next
        r += 1
      }
    }
    state.unpersist()
    import spark.implicits._
    traj.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /**
   * Windowed PMI collocations — pointwise mutual information
   * log(p(a,b) / (p(a)·p(b))) over token-pair co-occurrence EVENTS
   * within `window` positions in a document, both orders collapsed to
   * (min, max). The corpus-analysis staple for finding multiword
   * expressions / template phrases before tokenizer or dedup decisions.
   * `minPairCount` drops the unstable tail (PMI of a count-1 pair is
   * noise). Probabilities: p(a,b) = pairs(a,b)/P over co-occurrence
   * events, p(t) = count(t)/N over tokens — exact integer ratios; the
   * single log is ≤1-ulp — callers round.
   *
   * Scale shape: pair generation is a per-document array comprehension
   * (transform × transform over the ≤window offsets — bounded fan-out
   * w·n per doc, NOT n²; stays in codegen), pairs partial-combine
   * map-side on the (a, b) key, unigram counts on the token key, and
   * the three totals fold to one-row broadcasts. No self-join of the
   * posting lists, no Window.
   */
  def pmiPairs(df: DataFrame, textCol: String, window: Int = 5,
               minPairCount: Long = 2L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")
    val tokDf = df.select(toks.as("__t")).where(size(col("__t")) > 0)
    val unigrams = tokDf.select(explode(col("__t")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("__ct"))
    val n = unigrams.agg(sum(col("__ct")).as("__n"))
    val pairsArr = flatten(transform(col("__t"), (tok, i) =>
      filter(transform(sequence(lit(1), lit(window)), o =>
        when(i + o < size(col("__t")),
          struct(least(tok, element_at(col("__t"), i + o + 1)).as("a"),
            greatest(tok, element_at(col("__t"), i + o + 1)).as("b")))),
        p => p.isNotNull)))
    val pairsAll = tokDf.select(explode(pairsArr).as("__p"))
      .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
      .agg(count(lit(1)).as("pair_count"))
    // P normalizes over ALL co-occurrence events — filtering first would
    // bias every surviving pair's p(a,b) upward
    val p = pairsAll.agg(sum(col("pair_count")).as("__p"))
    val pairs = pairsAll
      .where(col("pair_count") >= minPairCount && col("a") =!= col("b"))
    // unigram joins stay UNHINTED: the vocabulary outgrows any broadcast
    // at corpus scale, and both sides are already token-keyed (the q129
    // bigram-LM argument); only the one-row totals are forced broadcast
    pairs
      .join(unigrams.withColumnRenamed("t", "a")
        .withColumnRenamed("__ct", "__ca"), Seq("a"))
      .join(unigrams.withColumnRenamed("t", "b")
        .withColumnRenamed("__ct", "__cb"), Seq("b"))
      .crossJoin(broadcast(p)).crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("pair_count"),
        log((col("pair_count").cast("double") / col("__p")) /
          ((col("__ca").cast("double") / col("__n")) *
            (col("__cb").cast("double") / col("__n")))).as("pmi"))
  }

  /**
   * Mojibake artifact inventory — the byte sequences UTF-8 text grows
   * when it is decoded as Latin-1/Windows-1252 somewhere in a pipeline
   * and re-encoded ("café" → "cafÃ©", curly quotes → "â€œ…â€"),
   * plus U+FFFD (a decoder already gave up). All literal printable
   * sequences — the shared-regex-dialect discipline ([[EmailRe]]): the
   * alternation compiles identically under Java regex and RE2.
   */
  val MojibakeArtifacts: Seq[String] = Seq(
    "Ã©", "Ã¨", "Ã¡", "Ã³", "Ãº", "Ã±", "Ã¶", "Ã¼", "Ã§", "Ã¯",
    "â€™", "â€œ", "â€¦", "Â«", "Â»", "Â°", "ï¿½", "�")

  val MojibakeRe: String = MojibakeArtifacts.mkString("|")

  /** Occurrences of [[MojibakeArtifacts]] in `text` — the
    * encoding-corruption gate run before training (mojibake survives
    * every downstream filter and poisons the byte distribution). Pure
    * codegen `regexp_count` — scan-side, no shuffle. */
  def mojibakeCount(text: Column): Column =
    regexp_count(text, lit(MojibakeRe)).cast("long")

  /** [[mojibakeCount]] per character, 0 for empty text. */
  def mojibakeScore(text: Column): Column =
    mojibakeCount(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  /**
   * Apply a trained BPE merge table ([[bpeTrain]]'s trajectory, in
   * merge order) to a word — the ENCODE half of the tokenizer: the
   * same bracket encoding and literal left-to-right replaces as
   * training, so segmentation is canonical greedy merge-order BPE.
   * Returns the token array. The merge chain compiles to one codegen'd
   * projection (|merges| literal replaces) — tokenizing 100 TB costs a
   * scan; no UDF, no shuffle.
   */
  def bpeSegment(word: Column, merges: Seq[(String, String)]): Column = {
    val init = regexp_replace(word, "(.)", "[$1]")
    val merged = merges.foldLeft(init) { case (s, (l, r)) =>
      replace(s, lit(s"[$l][$r]"), lit(s"[$l$r]"))
    }
    split(regexp_replace(merged, "^\\[|\\]$", ""), "\\]\\[")
  }

  /** Query parameters dropped whole by [[canonicalizeUrl]] (click/session
    * trackers that vary per impression, never per resource). */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "msclkid", "ref")

  /** Parameter-name PREFIXES dropped by [[canonicalizeUrl]] (`utm_*`). */
  val TrackingPrefixes: Seq[String] = Seq("utm_")

  /**
   * URL canonicalization — the key-maker for dedup-by-URL and per-domain
   * provenance accounting over a web crawl (the same page arrives as
   * `HTTP://Site.COM/a?utm_source=x&b=1#top` and `http://site.com/a?b=1`;
   * exact dedup only works on the canonical form). Rules:
   *
   *  - scheme and host lowercase; explicit default ports dropped
   *    (`:80` for http, `:443` for https);
   *  - fragment dropped;
   *  - empty path becomes `/`;
   *  - tracking parameters removed ([[TrackingParams]] exactly,
   *    [[TrackingPrefixes]] by prefix — case-insensitive, the casing
   *    trackers actually ship with varies);
   *  - surviving query parameters sorted bytewise (order never
   *    distinguishes resources); an emptied query drops its `?`.
   *
   * A pure chain of codegen'd regexp/array expressions — scan-side, no
   * UDF, no shuffle: canonicalizing 100 TB of crawl metadata costs one
   * projection. Non-URL strings (no `scheme://`) pass through unchanged
   * rather than turning into nulls mid-pipeline.
   */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val hostPort = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = lower(regexp_replace(hostPort, ":[0-9]*$", ""))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val schemeL = lower(scheme)
    val keepPort = port =!= "" &&
      !(schemeL === "http" && port === "80") &&
      !(schemeL === "https" && port === "443")
    val path = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val rawQuery = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = filter(split(rawQuery, "&"), p => {
      val pl = lower(p)
      p =!= "" &&
        !TrackingParams.map(t => pl === t || pl.startsWith(t + "="))
          .reduce(_ || _) &&
        !TrackingPrefixes.map(t => pl.startsWith(t)).reduce(_ || _)
    })
    val query = array_join(array_sort(params), "&")
    val canon = concat(
      schemeL, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      when(path === "", lit("/")).otherwise(path),
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
    when(scheme === "", url).otherwise(canon)
  }

  // custom-expression wrappers
  def langId(text: Column): Column = toCol(LangId(toExpr(text)))
  def nfcNormalize(text: Column): Column = toCol(NfcNormalize(toExpr(text)))
  def fingerprint64(text: Column): Column = toCol(Fingerprint64(toExpr(text)))
  def simhash64(text: Column): Column = toCol(SimHash64(toExpr(text)))
  def minhash(text: Column, numHashes: Int = 64, shingleSize: Int = 3): Column =
    toCol(MinHash(toExpr(text), numHashes, shingleSize))

  /**
   * N-gram novelty against a reference corpus — the memorization /
   * novelty gate for GENERATED data (synthetic-data pipelines ask two
   * opposite questions of the same number: "is this sample novel or
   * memorized from the teacher corpus" and "is it so novel it's
   * off-distribution"): per eval document, the fraction of its
   * DISTINCT word n-grams absent from the reference corpus's global
   * n-gram set. Exact counts; novelty is one exact-int division
   * (null for documents with no n-grams — shorter than n words).
   *
   * Scale shape: the reference collapses to its DISTINCT gram set
   * (map-side combined) once; eval grams meet it in one gram-keyed
   * LEFT ANTI join (novel grams survive) — the corpus shuffles only
   * on the gram key, and a reference this is run against repeatedly
   * belongs in a persisted gram index (the writeLineIndex pattern).
   * Returns (id, n_grams, n_novel, novelty) for every eval document.
   */
  def ngramNovelty(eval: DataFrame, reference: DataFrame, textCol: String,
                   idCol: String, n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    def grams(df: DataFrame, extra: Column*): DataFrame =
      df.select(extra :+ explode(array_distinct(
        wordShingles(col(textCol), n))).as("__g"): _*)
    val refGrams = grams(reference).select(col("__g")).distinct()
    val evalGrams = grams(eval, col(idCol))
    val novel = evalGrams.join(refGrams, Seq("__g"), "left_anti")
      .groupBy(col(idCol)).agg(count(lit(1)).as("__novel"))
    val totals = evalGrams.groupBy(col(idCol)).agg(count(lit(1)).as("__tot"))
    eval.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(novel, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__tot"), lit(0L)).as("n_grams"),
        coalesce(col("__novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("__tot"), lit(0L)) > 0,
          coalesce(col("__novel"), lit(0L)).cast("double") /
            col("__tot").cast("double"))
          .otherwise(lit(null).cast("double")).as("novelty"))
  }

  /**
   * Truncation-budget curve — the context-length design telemetry
   * [[vocabCoverage]]'s sibling asks of SEQUENCE length: for each
   * candidate cap L, how many documents would truncate and what
   * fraction of token mass survives if every document is cut at L
   * tokens. "Is 2k context enough, or does 8k buy real data" is the
   * first question of any packing/truncation policy; the answer is one
   * scan.
   *
   * Returns one row per cap: (max_len, docs_truncated, tokens_kept,
   * tokens_total, keep_frac). All counts exact integer sums
   * (Σ min(tk, L) per cap rides the SAME single aggregate as the
   * totals — |caps| conditional sums, one corpus scan, a one-row
   * result exploded to |caps| rows); keep_frac is one exact-int
   * division.
   */
  def truncationBudget(df: DataFrame, textCol: String,
                       lengths: Seq[Int]): DataFrame = {
    require(lengths.nonEmpty && lengths.forall(_ >= 1),
      "lengths must be a non-empty list of positive caps")
    require(lengths.distinct.size == lengths.size, "lengths must be distinct")
    val tk = tokenCount(col(textCol)).cast("long")
    val aggs = sum(tk).as("__tot") +: lengths.flatMap { l =>
      Seq(sum(least(tk, lit(l.toLong))).as(s"__kept_$l"),
        sum(when(tk > l, 1L).otherwise(0L)).as(s"__trunc_$l"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = lengths.map { l =>
      struct(lit(l).as("max_len"), col(s"__trunc_$l").as("docs_truncated"),
        col(s"__kept_$l").as("tokens_kept"))
    }
    one.select(explode(array(rows: _*)).as("__r"), col("__tot"))
      .select(col("__r.max_len").as("max_len"),
        col("__r.docs_truncated").as("docs_truncated"),
        col("__r.tokens_kept").as("tokens_kept"),
        col("__tot").as("tokens_total"),
        (col("__r.tokens_kept").cast("double") /
          col("__tot").cast("double")).as("keep_frac"))
  }

  /**
   * Tokenizer-design telemetry: the vocabulary coverage curve. For each
   * requested coverage threshold t, the smallest frequency-ranked
   * vocabulary whose tokens account for ≥ t of all (lowercased,
   * whitespace) token OCCURRENCES — plus the exact occurrence count it
   * covers. "How big must the vocab be to cover 95 / 99 % of the
   * corpus" is the first question of any tokenizer budget.
   *
   * Shape: one token-count shuffle (vocab-sized output), then the
   * DISTRIBUTED ordered cumsum ([[Dedup.globalOrderedCumsum]] over
   * (count desc, token)) — no single-reducer `sum() OVER (ORDER BY …)`
   * even at 10⁹-token vocabularies. Thresholds meet the cumsum frame
   * as a broadcast; the answer per threshold is a struct-min (the
   * first rank whose running total clears t·N). All counts are exact
   * integers; the only floating comparison is cum ≥ t·N with the same
   * IEEE product in any engine.
   */
  def vocabCoverage(df: DataFrame, textCol: String,
                    thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(t => t > 0.0 && t <= 1.0))
    val counts = df.select(
        explode(filter(split(trim(lower(col(textCol))), "\\s+"),
          t => t =!= "")).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
    val ranked = Dedup.globalOrderedCumsum(counts,
      Seq(col("__c").desc, col("__t").asc), "__c", "rank", "cum")
    // total = the cumsum's last value — reuses the cached ranking frame
    // instead of re-running the corpus-sized token count for a sum
    val thr = ranked.agg(max(col("cum")).as("__tot"))
      .select(col("__tot"), explode(typedLit(thresholds)).as("threshold"))
    ranked.crossJoin(broadcast(thr))
      .filter(col("cum").cast("double") >=
        col("threshold") * col("__tot").cast("double"))
      .groupBy(col("threshold"))
      .agg(min(struct(col("rank"), col("cum"))).as("__w"),
        first(col("__tot")).as("__tt"))
      .select(col("threshold"),
        col("__w").getField("rank").as("vocab_size"),
        col("__w").getField("cum").as("tokens_covered"),
        col("__tt").as("total_tokens"))
  }

  /**
   * Lexical-diversity profile per group: token count, type (distinct
   * token) count, type–token ratio, hapax legomena count (tokens seen
   * exactly once in the group) and hapax share of types — the corpus-
   * health metrics that flag template spam (low TTR) and OCR noise
   * (high hapax rate). Tokens are lowercased whitespace splits (the
   * [[vocabCoverage]] convention). Two partial-aggregated passes over
   * the (group, token) count frame; ratios are exact-int divisions —
   * UNROUNDED cross-engine equality.
   */
  def lexicalDiversity(df: DataFrame, groupCol: String,
                       textCol: String): DataFrame = {
    df.select(col(groupCol).as("__g"),
        explode(filter(split(trim(lower(col(textCol))), "\\s+"),
          t => t =!= "")).as("__t"))
      .groupBy(col("__g"), col("__t")).agg(count(lit(1)).as("__c"))
      .groupBy(col("__g"))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("__g").as(groupCol), col("n_tokens"), col("n_types"),
        (col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        col("n_hapax"),
        (col("n_hapax").cast("double") / col("n_types").cast("double"))
          .as("hapax_rate"))
  }

  /**
   * Heaps'-law fit of vocabulary growth: V(n) ≈ K·n^β where V(n) is
   * the distinct-token count after the first n documents (in id
   * order). β ≈ 0.4–0.6 for natural text; a β near 0 flags template
   * spam (no new vocabulary), near 1 flags noise (every doc invents
   * tokens) — a one-row corpus-health scalar.
   *
   * Shape: each token contributes at its FIRST document ordinal
   * (min over the distributed rank of its docs — one shuffle on the
   * token); new-token counts per ordinal then cumulate over the
   * |docs|-sized frame ([[Dedup.globalOrderedCumsum]]) and one
   * regression aggregate fits ln V on ln n. Nothing subject-sized
   * past the token min. Returns (n_docs, vocab, beta, ln_k).
   */
  def heapsLaw(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ords = Dedup.globalRank(
      df.select(col(idCol).as("__id")).distinct(), Seq("__id"), "__ord")
    val firstOrd = df.select(col(idCol).as("__id"),
        explode(filter(split(trim(lower(col(textCol))), "\\s+"),
          t => t =!= "")).as("__t"))
      .join(ords, Seq("__id"))
      .groupBy(col("__t")).agg(min(col("__ord")).as("__fo"))
    val newPerOrd = firstOrd.groupBy(col("__fo").as("__ord"))
      .agg(count(lit(1)).as("__new"))
    // every ordinal appears (docs with zero new tokens still advance n):
    // right-join the ordinal frame, zero-fill, then cumulate
    val curve = Dedup.globalOrderedCumsum(
      ords.select(col("__ord")).join(newPerOrd, Seq("__ord"), "left")
        .select(col("__ord"), coalesce(col("__new"), lit(0L)).as("__new")),
      Seq(col("__ord").asc), "__new", "__r", "__v")
    curve.agg(count(lit(1)).as("n_docs"), max(col("__v")).as("vocab"),
      expr("round(regr_slope(ln(CAST(__v AS DOUBLE)), ln(CAST(__ord AS DOUBLE))), 6)")
        .as("beta"),
      expr("round(regr_intercept(ln(CAST(__v AS DOUBLE)), ln(CAST(__ord AS DOUBLE))), 6)")
        .as("ln_k"))
  }

  /** Register the custom text expressions for SQL. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("lang_id", es => LangId(es.head), "built-in")
    reg.createOrReplaceTempFunction("nfc_normalize", es => NfcNormalize(es.head), "built-in")
    reg.createOrReplaceTempFunction("fingerprint64", es => Fingerprint64(es.head), "built-in")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("vec_dot", es => VecDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm", es => VecNorm(es.head), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine", es => VecCosine(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("ts_micros", es => TsMicros(es.head), "built-in")
    reg.createOrReplaceTempFunction("ntz_to_utc", es => NtzToUtc(es.head), "built-in")
    reg.createOrReplaceTempFunction("minhash", {
      case Seq(e) => MinHash(e, 64, 3)
      case Seq(e, n, k) =>
        MinHash(e,
          n.eval().asInstanceOf[Number].intValue(),
          k.eval().asInstanceOf[Number].intValue())
      case es => MinHash(es.head, 64, 3)
    }, "built-in")
  }
}
