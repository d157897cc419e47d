package graft.queries

import graft.core.Tables.table
import graft.functions.{PolyHash, TextFunctions => TF}
import graft.operators.SkewJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation gate queries a large-scale training-data pipeline
  * needs beyond dedup/similarity: repetition signals (Gopher-style
  * filters), vocabulary heavy-hitters, per-source curation dashboards,
  * temperature-based domain mixture weights, length histograms, PII
  * scanning/redaction, a salted skew join, cluster-balanced topic
  * selection, BPE adjacent-pair counting, fixed-count per-stratum
  * sampling, and per-source exact quality quantiles.
  *
  * All are plain relational plans (explode → groupBy → agg) with
  * map-side partial aggregation — per-doc or per-token keyed, so they
  * scale linearly with corpus size and never collect to the driver.
  * The synthetic-PII injection in [[queries pii_scan]] is mirrored
  * expression-for-expression in the oracle so the regex kernels are
  * value-checked even though the base corpus contains no PII.
  */
object CurationQueries {
  private val VocabK = 100
  private val HistBucket = 64
  /** compact_plan target output-file size (chars). */
  private val CompactTarget = 2000L
  /** hll_distinct register count (2^6) and rho bit budget: PolyHash
    * values are < 2^30, so h div 64 < 2^24 and a 24-bit rho suffices. */
  private val HllM = 64
  private val HllBits = 24
  /** dsir_weights hashed-feature buckets, target language, and top-k. */
  private val DsirB = 256
  private val DsirLang = "en"
  private val DsirTopN = 25
  private val SaltBuckets = 8
  private val SelectBudget = 10000L
  private val SelCents = 8
  private val SelQuota = 20
  private val BpeK = 50
  private val FixedN = 10
  private val WeightedN = 50
  /** k_anon_audit group-size floor (matches the reference's k=4). */
  private val kAnonFloor = 4

  /** Word-count bounds for the Gopher filter gate, calibrated so the
    * synthetic corpus (10-99 words/doc) lands on both sides. */
  private val GopherMinWords = 25
  private val GopherMaxWords = 90

  /** unimax_alloc epoch cap (UniMax's N parameter) and its budget as a
    * fraction of the corpus (3/5 in exact integer arithmetic). */
  private val UnimaxEpochCap = 2

  /** Email/phone detection regexes — deliberately restricted to syntax
    * with identical semantics in Java regex (Spark codegen) and RE2
    * (oracle): no lookaround, no backrefs, no possessive quantifiers. */
  private val EmailRe = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]{2,}"
  private val PhoneRe = "\\+1-\\d{3}-\\d{4}"

  private def docs(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")

  /** (doc_id, g) word-bigram stream — vocab_growth's and doc_novelty's
    * shared extraction (a zero-shuffle projection + explode; cheap
    * enough that each gate builds its own rather than memoizing). */
  private def bigrams(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(col("doc_id"),
      TF.tokens(col("text")).as("t"))
    toks.select(col("doc_id"), explode(
        when(size(col("t")) < 2, array().cast("array<string>"))
          .otherwise(expr(
            "transform(slice(t, 1, size(t) - 1), (x, i) -> concat(x, ' ', t[i + 1]))")))
      .as("g"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C4-style intra-document line dedup (TextFunctions.dedupLines): a
    // pure per-row projection — no shuffle at any corpus size. The
    // synthetic documents are single-line, so the gate builds a
    // multiline doc with REAL duplicate lines from each doc's own text
    // (text, text, its 20-char prefix, text — both engines assemble it
    // identically), then value-checks the transform via
    // order-insensitive stats (line counts before/after + cleaned
    // length), since DuckDB's list_distinct doesn't share Spark's
    // first-occurrence order; the order itself is pinned in
    // TextDedupSpec.
    "line_dedup" -> ((s, dir) => {
      val synth = concat_ws("\n", col("text"), col("text"),
        substring(col("text"), 1, 20), col("text"))
      val lines = split(synth, "\n")
      docs(s, dir).select(col("doc_id"),
          size(lines).cast("long").as("n_lines"),
          size(array_distinct(lines)).cast("long").as("n_kept"),
          length(TF.dedupLines(synth)).cast("long").as("kept_len"))
        .orderBy("doc_id")
    }),

    // RefinedWeb/Falcon-style CROSS-document boilerplate removal
    // (Dedup.stripBoilerplateLines): lines appearing in >1 distinct docs
    // are stripped from every doc. Same synthesized multiline docs as
    // line_dedup — exact-duplicate texts and shared 20-char prefixes
    // produce real cross-doc hot lines. Value-checked through the
    // reassembled text's length and line count (order-insensitive; the
    // in-order reassembly itself is pinned in TextDedupSpec).
    "boilerplate_lines" -> ((s, dir) => {
      val synth = concat_ws("\n", col("text"), col("text"),
        substring(col("text"), 1, 20), col("text"))
      val cleaned = graft.operators.Dedup.stripBoilerplateLines(
        docs(s, dir).select(col("doc_id"), synth.as("text")),
        "doc_id", "text", maxDocs = 1)
      cleaned.select(col("id").as("doc_id"),
          length(col("text")).cast("long").as("kept_len"),
          when(length(col("text")) === 0, 0L)
            .otherwise(size(split(col("text"), "\n")).cast("long"))
            .as("n_kept"))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition signals: duplicate-token fraction and the
    // mass of the single most frequent word bigram. Relational shape
    // (explode → per-doc count → per-doc max/sum) keeps the partial
    // aggregation map-side; no per-doc quadratic work.
    // Tokenizer fertility per language (subword pieces per word — the
    // number multilingual tokenizer/mix decisions are made from: a lang
    // whose fertility is 2× pays 2× the context budget per word). Both
    // counts are the exact integer kernels text_stats certifies per
    // doc; here one lang-keyed map-side-combined rollup + integer-ppm
    // ratio.
    "tokenizer_fertility" -> ((s, dir) => {
      docs(s, dir).select(col("lang"),
          TF.tokenCount(col("text")).cast("long").as("w"),
          TF.bpeTokenCount(col("text")).as("b"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("w").as("words"),
          sum("b").as("bpe_tokens"))
        .select(col("lang"), col("n_docs"), col("words"),
          col("bpe_tokens"),
          when(col("words") > 0,
            expr("(1000000 * bpe_tokens) div words")).as("fertility_ppm"))
        .orderBy("lang")
    }),

    // Coleman-Liau readability (Coleman & Liau 1975) — the grade-level
    // filter curation pipelines run next to Gopher heuristics. Letters,
    // words, sentence terminators are exact integers; the index itself
    // is one fixed-shape per-row IEEE expression over those integers
    // (no aggregation, so no summation-order hazard), written
    // identically in the oracle and rounded to 4dp. words = 0 → NULL;
    // terminator-free docs count as one sentence, as the index assumes.
    "readability" -> ((s, dir) => {
      val letters = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
        .cast("long")
      val words = size(TF.tokens(col("text"))).cast("long")
      val sents = greatest(lit(1L),
        length(regexp_replace(col("text"), "[^.!?]", "")).cast("long"))
      docs(s, dir).select(col("doc_id"), letters.as("letters"),
          words.as("words"), sents.as("sentences"))
        .select(col("doc_id"), col("letters"), col("words"),
          col("sentences"),
          when(col("words") > 0, round(
            lit(0.0588) * (lit(100.0) * col("letters") / col("words"))
              - lit(0.296) * (lit(100.0) * col("sentences") / col("words"))
              - lit(15.8), 4)).as("cli4"))
        .orderBy("doc_id")
    }),

    // Term burstiness (Church & Gale 1995): variance-to-mean ratio of a
    // term's per-document counts over the documents that CONTAIN it —
    // the "topical vs function word" signal vocabulary curation ranks
    // by. VMR = (df·Σx² − (Σx)²) / (df·Σx) kept as one integer-ppm
    // floor division (all three moments are exact integer aggregates);
    // floor Σx ≥ 50 keeps the tail deterministic and the output
    // dimension-sized, top-30 under the full (vmr desc, token)
    // tiebreak via TakeOrdered.
    "term_burstiness" -> ((s, dir) => {
      val perDoc = docs(s, dir)
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("x"))
      perDoc.groupBy("w")
        .agg(count(lit(1)).as("df"), sum("x").as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .where(col("sx") >= 50)
        .select(col("w"), col("df"), col("sx"),
          expr("(1000000 * (df * sxx - sx * sx)) div (df * sx)")
            .as("vmr_ppm"))
        .orderBy(col("vmr_ppm").desc, col("w"))
        .limit(30)
    }),

    "rep_signals" -> ((s, dir) => {
      val d = docs(s, dir)
      val tk = TF.tokens(col("text"))
      val stats = d.select(col("doc_id"),
        size(tk).cast("long").as("n_tokens"),
        size(array_distinct(tk)).cast("long").as("n_distinct"))
      val top = d.select(col("doc_id"),
          explode(TF.wordShingles(col("text"), 2)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("mx"), sum("c").as("nb"))
      stats.join(top, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          when(col("n_tokens") === 0, 0.0)
            .otherwise(round(lit(1.0)
              - col("n_distinct").cast("double") / col("n_tokens"), 6))
            .as("dup_token_frac"),
          round(coalesce(col("mx").cast("double") / col("nb"), lit(0.0)), 6)
            .as("top_bigram_frac"))
        .orderBy("doc_id")
    }),

    // Vocabulary heavy-hitters: top-K tokens by corpus frequency with
    // document frequency — the tokenizer-vocab / stopword-mining pass.
    // groupBy(token) partial-aggregates map-side; the top-K is a
    // TakeOrdered (no full sort), and the rank window runs on K rows.
    "vocab_topk" -> ((s, dir) => {
      val top = docs(s, dir)
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
        .orderBy(col("tf").desc, col("token")).limit(VocabK)
      top.withColumn("rank",
          row_number().over(Window.orderBy(col("tf").desc, col("token"))))
        .orderBy("rank")
    }),

    // Per-source curation dashboard: doc/char/token volume, mean quality,
    // language spread — the "which sources do we keep" aggregation.
    "source_stats" -> ((s, dir) => {
      docs(s, dir).groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"),
          sum(TF.tokenCount(col("text")).cast("long")).cast("long")
            .as("sum_tokens"),
          round(avg(TF.qualityScore(col("text"))), 6).as("avg_quality"),
          countDistinct("lang").as("n_langs"))
        .orderBy("source")
    }),

    // Temperature-based domain mixture: the corpus-mixing step that turns
    // per-source token volumes into sampling weights w_s ∝ n_s^α
    // (Pile/LLaMA-style reweighting — α < 1 flattens the mix toward small
    // sources) plus per-source epochs at a constant total token budget,
    // epochs_s = w_s·N/n_s. α is fixed at 0.5 so the power is sqrt —
    // IEEE-correctly-rounded, hence bit-identical between the JVM and the
    // oracle; the |sources|-term normalizer is the only order-sensitive
    // double sum and is round-6'd like every double agg on the board.
    // Plan: map-side-combined groupBy on the tiny source key, then a
    // 1-row broadcast scalar attach — candidate work independent of
    // corpus size past the first agg.
    "domain_mix" -> ((s, dir) => {
      val perSrc = docs(s, dir).groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(TF.tokenCount(col("text")).cast("long")).cast("long")
            .as("n_tokens"))
      val glob = perSrc.agg(
        sum(sqrt(col("n_tokens").cast("double"))).as("z"),
        sum("n_tokens").cast("long").as("tot"))
      perSrc.crossJoin(broadcast(glob))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(sqrt(col("n_tokens").cast("double")) / col("z"), 6)
            .as("weight"),
          when(col("n_tokens") === 0, lit(0.0))
            .otherwise(round(col("tot").cast("double") /
              (col("z") * sqrt(col("n_tokens").cast("double"))), 6))
            .as("epochs"))
        .orderBy("source")
    }),

    // UniMax corpus allocation (Chung et al., ICLR'23): spread a token
    // budget (3/5 of the corpus, exact integer) as uniformly as possible
    // across sources, capping each source at UnimaxEpochCap epochs of its
    // own size. The waterfill has a closed form over the per-source
    // table: sorted by capacity ascending, a source is saturated iff
    // granting it AND every larger source its own capacity level still
    // fits the budget; the first unsaturated row fixes the integer water
    // level θ = (B − prefix<) div remaining, and every unsaturated source
    // gets θ. Plan: one map-side-combined groupBy down to the
    // |sources|-row table, then windows over that bounded table and 1-row
    // scalar joins — candidate work independent of corpus size past the
    // first agg (domain_mix's shape).
    "unimax_alloc" -> ((s, dir) => {
      val perSrc = docs(s, dir).groupBy("source").agg(
        sum(TF.tokenCount(col("text")).cast("long")).cast("long")
          .as("n_tokens"))
      graft.operators.Sampling
        .unimaxAlloc(perSrc, UnimaxEpochCap, budgetNum = 3, budgetDen = 5)
        .orderBy("source")
    }),

    // Unigram-surprisal quality scoring (LexicalRank.unigramSurprisal):
    // rare-vocabulary documents score high, boilerplate-common ones low —
    // the CCNet-style corpus-LM filter with the log made integer-exact
    // (floor(log2(N div c)) bits per token via length(bin(...))-1) so the
    // whole score is value-level oracle-checkable, not just rows-checked.
    "surprisal_score" -> ((s, dir) =>
      graft.operators.LexicalRank.unigramSurprisal(docs(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"), col("sum_bits"),
          col("surprisal"))
        .orderBy("doc_id")),

    // CCNet perplexity bucketing (Wenzek et al., LREC 2020): rank the
    // corpus by LM bits-per-token and cut into head/middle/tail thirds —
    // the selection mechanism CCNet filters Common Crawl with (keep
    // head, sample middle, drop tail). The order key is exact integer
    // milli-bits-per-token (surprisal_score's integer-bit trick), the
    // global rank is the two-phase PrefixScan (range partition + per-
    // partition scan — never a single-partition window), and the cut is
    // the explicit (rank·3) div n so both engines share one remainder
    // rule. Output: per-third doc/token mass and the bit-rate range.
    "ccnet_buckets" -> ((s, dir) => {
      val np = s.sparkContext.defaultParallelism
      val scored = graft.operators.LexicalRank
        .unigramSurprisal(docs(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"), col("sum_bits"),
          expr("(sum_bits * 1000) div greatest(n_tokens, 1)")
            .as("milli_bits"))
      val ranked = graft.operators.PrefixScan.denseIds(
        scored, Seq("milli_bits", "doc_id"), "rk0", np)
      val total = scored.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(total))
        .withColumn("bucket", expr("(rk0 * 3) div n").cast("int"))
        .groupBy("bucket").agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").cast("long").as("sum_tokens"),
          min("milli_bits").as("min_mbits"),
          max("milli_bits").as("max_mbits"))
        .orderBy("bucket")
    }),

    // The same corpus-LM filter raised to bigram order: integer-exact
    // -log2 p(w2|w1) bits summed per document (LexicalRank.bigramSurprisal
    // — the operator that catches common-words-in-impossible-order text a
    // unigram LM scores as fluent). Pairing is a zero-shuffle zip_with;
    // every model shuffle is keyed by bigram or prefix token with the
    // per-(doc, bigram) pre-count bounding Zipf skew.
    "bigram_score" -> ((s, dir) =>
      graft.operators.LexicalRank.bigramSurprisal(docs(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_bigrams"), col("sum_bits"),
          col("surprisal2"))
        .orderBy("doc_id")),

    // fasttext-shaped hashed linear classifier scoring
    // (TextFunctions.hashedLinearLogit): dim=4096 feature buckets,
    // integer logit summed per document inside ONE codegen'd projection —
    // zero shuffle at any corpus size; keep = sign of the logit.
    "quality_lr" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens"),
          TF.hashedLinearLogit(col("text"), 4096).as("logit"))
        .withColumn("keep", (col("logit") > 0).cast("int"))
        .orderBy("doc_id")),

    // Token-budget corpus selection: rank by (quality desc, doc_id) and
    // greedily keep documents that fit ENTIRELY within a fixed token
    // budget (cum + toks <= budget, cum = exclusive running sum in rank
    // order) — the "best data under a compute budget" selection step.
    // The running sum is the two-phase PrefixScan over a (-quality,
    // doc_id) range partitioning, so parallelism follows numParts instead
    // of collapsing into one global-window task; values are identical to
    // the single-window form by construction.
    "budget_select" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        TF.qualityScore(col("text")).as("quality"),
        TF.bpeTokenCount(col("text")).as("toks"))
        .withColumn("negq", -col("quality"))
      graft.operators.PrefixScan.exclusiveCumsum(
          d.withColumn("__all", lit(1)), "__all", Seq("negq", "doc_id"),
          "toks", "cum", numParts = s.sparkContext.defaultParallelism)
        .where(col("cum") + col("toks") <= SelectBudget)
        .select(col("doc_id"), col("quality"), col("toks"), col("cum"))
        .orderBy(col("quality").desc, col("doc_id"))
    }),

    // Document-length histogram with a running total — the sequence-length
    // planning input for packing/batching.
    "len_hist" -> ((s, dir) => {
      docs(s, dir)
        .select(expr(s"n_chars div $HistBucket").as("bucket"), col("n_chars"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
        .withColumn("cum_docs", sum("n_docs").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
        .orderBy("bucket")
    }),

    // PII scan + redaction: count email/phone matches and fingerprint the
    // redacted text. The corpus has no PII, so a deterministic synthetic
    // injection (mirrored in the oracle) makes the hit paths non-trivial.
    "pii_scan" -> ((s, dir) => {
      val inj = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      docs(s, dir).select(col("doc_id"), inj.as("itext"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("itext"), lit(EmailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("itext"), lit(PhoneRe), lit(0)))
            .cast("long").as("n_phones"),
          PolyHash.poly_hash(
            regexp_replace(regexp_replace(col("itext"), EmailRe, "[EMAIL]"),
              PhoneRe, "[PHONE]")).as("red_fp"))
        .orderBy("doc_id")
    }),

    // Cluster-balanced corpus selection (topic balancing): document
    // embeddings (vec_id ≡ doc_id in the testdata) assigned to FIXED
    // cosine centroids (the first SelCents embedding vectors — the
    // deterministic, SQL-expressible quantizer seam ann_ivf_fixed
    // established), then each topic bucket keeps its SelQuota
    // highest-quality docs — so one dominant topic can't crowd the
    // selection the way a global top-k by quality does. The bucket
    // assign is the zero-shuffle nearest_centroids kernel projection;
    // the rank is a bucket-partitioned window (work distributes over
    // topics). Every row is emitted with its rank + keep flag.
    "cluster_select" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val cents = graft.operators.SimilaritySearch.fixedCentroids(
        e, "vec_id", "embedding", 0, SelCents)
      val scored = docs(s, dir)
        .join(e.select(col("vec_id"), col("embedding")),
          col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("embedding"),
          TF.qualityScore(col("text")).as("q6"))
      graft.operators.Sampling.clusterBalanced(
          scored, "doc_id", "embedding", "q6", cents, SelQuota)
        .select(col("doc_id"), col("bucket"), col("q6"),
          col("rk").cast("int").as("rk"), col("kept"))
        .orderBy("doc_id")
    }),

    // BPE-style adjacent-pair counting — the first merge step of
    // tokenizer training: every adjacent token pair in the corpus,
    // counted, top-K by frequency. Pure explode → map-side-combined
    // groupBy on the pair key; the top-K is a TakeOrdered with the rank
    // window over K rows (the vocab_topk pattern — never a global sort).
    "bpe_pairs" -> ((s, dir) => {
      val t = TF.tokens(col("text"))
      val pairs = docs(s, dir)
        .select(col("doc_id"), t.as("t"))
        .where(size(col("t")) >= 2)
        .select(explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("pair"))
      val top = pairs.groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(BpeK)
      top.withColumn("rank", row_number()
          .over(Window.orderBy(col("cnt").desc, col("pair"))).cast("int"))
        .orderBy("rank")
    }),

    // Fixed-COUNT per-source sample (Sampling.fixedPerStratum): exactly
    // FixedN docs per source by deterministic hash rank — the balanced
    // eval-subset builder, where rate-based sampling can't hit exact
    // counts. The actual sampled rows are emitted, so the oracle checks
    // WHICH docs survive, not just how many.
    "sample_fixed" -> ((s, dir) => {
      graft.operators.Sampling.fixedPerStratum(
          docs(s, dir).select(col("doc_id"), col("source")),
          "doc_id", col("source"), FixedN)
        .orderBy("source", "doc_id")
    }),

    // Per-source EXACT quality quantiles (rank-based, not approximate):
    // the adaptive-threshold planning pass — "filter each domain at its
    // own p25" needs per-domain cutoffs, and approx_percentile isn't
    // oracle-checkable. Rank r = ceil(q·n) over (quality asc, doc_id)
    // picks a deterministic member value; one source-partitioned window
    // + one groupBy, work distributed over sources.
    "quality_cutoffs" -> ((s, dir) => {
      val base = docs(s, dir).select(col("source"), col("doc_id"),
        TF.qualityScore(col("text")).as("q6"))
      val w = Window.partitionBy("source").orderBy(col("q6").asc, col("doc_id"))
      val cw = Window.partitionBy("source")
      base
        .withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(cw))
        .groupBy("source")
        .agg(max("n").cast("long").as("n"),
          max(when(col("rk") === ceil(col("n") * 0.25), col("q6"))).as("p25"),
          max(when(col("rk") === ceil(col("n") * 0.50), col("q6"))).as("p50"),
          max(when(col("rk") === ceil(col("n") * 0.75), col("q6"))).as("p75"))
        .orderBy("source")
    }),

    // Classifier-evaluation AUC (Mann-Whitney U over ranks), exact
    // integers end-to-end: tied scores take average ranks via the
    // doubled form 2·avg = 2·minrank + |tie group| − 1 (always integer),
    // so auc_ppm = ((ΣR2_pos − n_pos(n_pos+1))·1e6) div (2·n_pos·n_neg)
    // needs no floats at all. The rank table is per-DISTINCT-score
    // (PrefixScan cumulative counts, broadcast back), so no global
    // window touches the corpus. Scored here: quality predicting the
    // lang='en' slice — ≈0.5 on this corpus by construction (shared
    // vocabulary), which is itself the correct eval answer.
    "quality_auc" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        (col("lang") === DsirLang).cast("int").as("pos"),
        TF.qualityScore(col("text")).as("q"))
      val sc = d.groupBy("q").agg(count(lit(1)).as("cnt"))
      val ranked = graft.operators.PrefixScan.exclusiveCumsum(
          sc.withColumn("__all", lit(1)), "__all", Seq("q"), "cnt", "cum",
          numParts = s.sparkContext.defaultParallelism)
        .select(col("q"), col("cnt"), (col("cum") + 1).as("minrank"))
      val agg = d.join(broadcast(ranked), Seq("q"))
        .select(col("pos"),
          (lit(2) * col("minrank") + col("cnt") - 1).as("r2"))
        .agg(sum(when(col("pos") === 1, col("r2"))).as("r2pos"),
          sum(col("pos").cast("long")).as("np"),
          sum((lit(1) - col("pos")).cast("long")).as("nn"))
      agg.select(col("np").as("n_pos"), col("nn").as("n_neg"),
        when(col("np") > 0 && col("nn") > 0,
          expr("((r2pos - np * (np + 1)) * 1000000) div (2 * np * nn)"))
          .otherwise(500000L).as("auc_ppm"))
    }),

    // Average precision (area under the precision-recall curve at every
    // positive) for the same quality-predicts-lang setup as quality_auc
    // — the eval metric that matters when positives are rare and ROC-AUC
    // flatters. Exact end-to-end: rank and inclusive positive-count come
    // from ONE PrefixScan pass (rank and Σpos packed into a single long,
    // 2^32 + pos, so one scan carries both — corpus < 2^31 rows, widen
    // the base past that), precision at each positive is integer ppm,
    // and AP is their integer mean. No global window anywhere.
    "avg_precision" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        (col("lang") === DsirLang).cast("long").as("pos"),
        TF.qualityScore(col("text")).as("q"))
      val keyed = d.select(col("doc_id"), col("pos"), (-col("q")).as("nq"))
        .withColumn("__all", lit(1))
        .withColumn("pk", lit(4294967296L) + col("pos"))
      val scanned = graft.operators.PrefixScan.exclusiveCumsum(
        keyed, "__all", Seq("nq", "doc_id"), "pk", "cum",
        numParts = s.sparkContext.defaultParallelism)
      val perPos = scanned.where(col("pos") === 1)
        .select(expr("(1000000 * (cum % 4294967296 + 1)) div " +
          "(cum div 4294967296 + 1)").as("prec_ppm"))
      perPos.agg(count(lit(1)).as("n_pos"),
          sum("prec_ppm").cast("long").as("sum_prec"))
        .select(col("n_pos"), col("sum_prec"),
          when(col("n_pos") > 0, expr("sum_prec div n_pos"))
            .otherwise(0L).as("ap_ppm"))
    }),

    // Vocabulary growth curve (the Heaps'-law measurement behind "is
    // more data still adding new phrases?") over word BIGRAMS — the
    // unigram vocab of the synthetic corpus saturates in the first
    // slice, so the bigram space is where growth is observable: the
    // corpus in doc-id order split into 10 equal slices, each reporting
    // the bigrams whose FIRST occurrence falls in it plus the running
    // vocabulary size. Integer-exact end-to-end: first occurrence is a
    // bigram-keyed min (map-side combined), the slice is integer
    // arithmetic on (first·10) div n, and the 10-row cumulative closes
    // over a broadcast triangle join on a literal decile spine — no
    // window ever touches token-level data.
    "vocab_growth" -> ((s, dir) => {
      val n = docs(s, dir).agg((max("doc_id") + 1).as("n"))
      val first = bigrams(s, dir).groupBy("g").agg(min("doc_id").as("fd"))
      val slice = first.crossJoin(broadcast(n))
        .select(expr("(fd * 10) div n").as("decile"))
        .groupBy("decile").agg(count(lit(1)).as("c"))
      val spine = s.range(10).select(col("id").as("decile"))
      val filled = spine.join(slice, Seq("decile"), "left")
        .select(col("decile"), coalesce(col("c"), lit(0L)).as("n_new_bigrams"))
      val b = filled.select(col("decile").as("d2"), col("n_new_bigrams").as("c2"))
      filled.join(broadcast(b), col("d2") <= col("decile"))
        .groupBy("decile", "n_new_bigrams")
        .agg(sum("c2").as("vocab_size"))
        .orderBy("decile")
    }),

    // Spearman rank correlation between two doc signals (quality vs
    // length) — the signal-redundancy check run before adding a filter
    // to a curation stack. Tie-averaged ranks stay INTEGRAL via the
    // doubled form 2·avg = 2·minrank + ties − 1 (quality_auc's trick),
    // so every moment (n, Σxy, Σx², …) is an exact integer in both
    // engines and the single float is the final rho = (nΣxy − ΣxΣy) /
    // √((nΣx²−(Σx)²)(nΣy²−(Σy)²)), identical cross-engine from
    // identical integers. Rank tables are distinct-value PrefixScan
    // cumulatives (broadcast back) — no window over docs.
    "rank_corr" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        TF.qualityScore(col("text")).as("q"),
        col("n_chars").as("len"))
      def rankTable(src: DataFrame, vCol: String) = {
        val sc = src.groupBy(vCol).agg(count(lit(1)).as("cnt"))
        graft.operators.PrefixScan.exclusiveCumsum(
            sc.withColumn("__all", lit(1)), "__all", Seq(vCol), "cnt",
            "cum", numParts = s.sparkContext.defaultParallelism)
          .select(col(vCol),
            (lit(2) * (col("cum") + 1) + col("cnt") - 1).as(s"r2_$vCol"))
      }
      val withRanks = d
        .join(broadcast(rankTable(d, "q")), Seq("q"))
        .join(broadcast(rankTable(d, "len")), Seq("len"))
        .select(col("r2_q").as("x"), col("r2_len").as("y"))
      // num/aa/bb are exact longs (< 2^53, so their double images are
      // exact); the aa·bb product is formed in DOUBLES because the
      // integer product would overflow 64 bits — one IEEE multiply,
      // identical in both engines
      withRanks.agg(count(lit(1)).as("n"),
          sum(col("x") * col("y")).as("sxy"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("n"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("aa"),
          (col("n") * col("syy") - col("sy") * col("sy")).as("bb"))
        .select(col("n"),
          round(col("num").cast("double") /
            sqrt(col("aa").cast("double") * col("bb").cast("double")), 6)
            .as("rho6"))
    }),

    // Source-concentration Gini coefficient — "is the corpus dominated
    // by a few domains?", the diversity red-flag read next to
    // domain_mix. Exact integers to the last step: with source doc
    // counts x_1≤…≤x_n (ties broken by source name for a total order),
    // G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i) — both numerator and
    // denominator are emitted as exact BIGINTs plus the one 6dp
    // division. The rank i comes from a broadcast triangle join over
    // the |sources|-row aggregate (domain counts are tiny-key at any
    // corpus size), keeping the no-unpartitioned-window discipline
    // absolute — same idiom as vocab_growth's cumulative.
    "gini_sources" -> ((s, dir) => {
      val counts = docs(s, dir).groupBy("source")
        .agg(count(lit(1)).as("x"))
      val b = counts.select(col("source").as("s2"), col("x").as("x2"))
      val ranked = counts.join(broadcast(b),
          col("x2") < col("x") ||
            (col("x2") === col("x") && col("s2") <= col("source")))
        .groupBy("source", "x").agg(count(lit(1)).as("i"))
      ranked.agg(count(lit(1)).as("n_sources"),
          sum("x").as("total_docs"),
          (lit(2) * sum(col("i") * col("x"))
            - (count(lit(1)) + 1) * sum("x")).as("gini_num"),
          (count(lit(1)) * sum("x")).as("gini_den"))
        .withColumn("gini6",
          round(col("gini_num").cast("double") / col("gini_den"), 6))
    }),

    // Classifier calibration bins (the reliability diagram behind
    // quality_auc's single number): docs ranked by quality via the same
    // distinct-score PrefixScan rank table, split into 10 equal-RANK
    // bins (score ties share a bin by minrank, so the cut is
    // deterministic), each reporting size, positive count, positive
    // rate in integer ppm, and the exact score span (raw member values,
    // no interpolation). Integer arithmetic end-to-end; the rank table
    // and the 1-row total ride as broadcasts.
    "calibration_bins" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        (col("lang") === DsirLang).cast("long").as("pos"),
        TF.qualityScore(col("text")).as("q"))
      val sc = d.groupBy("q").agg(count(lit(1)).as("cnt"))
      val ranked = graft.operators.PrefixScan.exclusiveCumsum(
          sc.withColumn("__all", lit(1)), "__all", Seq("q"), "cnt", "cum",
          numParts = s.sparkContext.defaultParallelism)
        .select(col("q"), (col("cum") + 1).as("minrank"))
      val nTot = d.agg(count(lit(1)).as("nt"))
      d.join(broadcast(ranked), Seq("q")).crossJoin(broadcast(nTot))
        .withColumn("bin", expr("((minrank - 1) * 10) div nt"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum("pos").as("n_pos"),
          min("q").as("min_q"), max("q").as("max_q"))
        .withColumn("pos_ppm", expr("n_pos * 1000000 div n_docs"))
        .orderBy("bin")
    }),

    // Per-document novelty: what fraction of a doc's word bigrams first
    // appear in THAT doc (doc-id order = ingestion order) — the "is this
    // doc adding anything" signal dedup-aware sampling weights by, and
    // vocab_growth's per-doc twin. Integer-exact: first occurrence is a
    // bigram-keyed min, the join back is bigram-keyed, novelty is an
    // integer ppm division. Docs without a bigram are absent by
    // definition (mirrored in the oracle).
    "doc_novelty" -> ((s, dir) => {
      val g = bigrams(s, dir)
      val first = g.groupBy("g").agg(min("doc_id").as("fd"))
      g.join(first, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum((col("fd") === col("doc_id")).cast("long")).as("n_novel"))
        .withColumn("novel_ppm", expr("n_novel * 1000000 div n_bigrams"))
        .orderBy("doc_id")
    }),

    // Robust per-source scaling statistics (median + MAD — the outlier-
    // resistant siblings of anomaly_flags' moment z-scores): both are
    // EXACT lower-medians picked by rank (rk = (n+1) div 2), so every
    // reported value is a corpus member, not an interpolation —
    // deterministic and hashable in any engine. Two rank passes (values,
    // then absolute deviations from the per-source median), each a
    // source-keyed window + a 20-row broadcast back; work distributes
    // over sources, skew ceiling = largest single source.
    "robust_scale" -> ((s, dir) => {
      val d = docs(s, dir).select(col("source"), col("doc_id"),
        col("n_chars"))
      val w1 = Window.partitionBy("source")
        .orderBy(col("n_chars"), col("doc_id"))
      val cw = Window.partitionBy("source")
      val med = d.withColumn("rk", row_number().over(w1).cast("long"))
        .withColumn("n", count(lit(1)).over(cw))
        .where(expr("rk = (n + 1) div 2"))
        .select(col("source"), col("n").as("n_docs"),
          col("n_chars").as("med_chars"))
      val dev = d.join(broadcast(med), Seq("source"))
        .select(col("source"), col("doc_id"), col("n_docs"),
          col("med_chars"),
          abs(col("n_chars") - col("med_chars")).as("ad"))
      val w2 = Window.partitionBy("source").orderBy(col("ad"), col("doc_id"))
      dev.withColumn("rk", row_number().over(w2).cast("long"))
        .where(expr("rk = (n_docs + 1) div 2"))
        .select(col("source"), col("n_docs"), col("med_chars"),
          col("ad").as("mad_chars"))
        .orderBy("source")
    }),

    // Two-sample Kolmogorov–Smirnov distance between the doc-length
    // distributions of the corpus's two snapshot halves (doc_id parity —
    // the deterministic stand-in for snapshot ids), exact integers
    // end-to-end: with samples of size n_a/n_b, D·n_a·n_b is the max
    // over values v of |n_b·cumA(v) − n_a·cumB(v)|, a running sum of
    // per-value integer deltas. Per-value counts are one map-side-
    // combined groupBy (domain-bounded, like quality_auc's rank table),
    // the running sum is the two-phase PrefixScan (no global window over
    // data), and the argmax ships through TakeOrdered(1) with a full
    // (d desc, v asc) tiebreak. The single float — D itself — is one
    // division of exact integers, identical in any engine.
    "ks_test" -> ((s, dir) => {
      val d = docs(s, dir).select(col("n_chars").as("v"),
        (col("doc_id") % 2 === 0).cast("long").as("is_a"))
      val counts = d.groupBy("v").agg(
        sum(col("is_a")).as("ca"),
        sum(lit(1L) - col("is_a")).as("cb"))
      val tot = counts.agg(sum("ca").as("na"), sum("cb").as("nb"))
      val delta = counts.crossJoin(broadcast(tot))
        .select(col("v"),
          (col("nb") * col("ca") - col("na") * col("cb")).as("delta"),
          col("na"), col("nb"))
        .withColumn("__all", lit(1))
      graft.operators.PrefixScan.exclusiveCumsum(delta, "__all", Seq("v"),
          "delta", "cum", numParts = s.sparkContext.defaultParallelism)
        .select(col("v"), abs(col("cum") + col("delta")).as("d_nm"),
          col("na"), col("nb"))
        .orderBy(col("d_nm").desc, col("v"))
        .limit(1)
        .select(col("na").as("n_a"), col("nb").as("n_b"), col("d_nm"),
          round(col("d_nm").cast("double") / (col("na") * col("nb")), 6)
            .as("ks6"),
          col("v").as("at_value"))
    }),

    // Pearson chi-squared independence cells for the lang × source
    // contingency table — the corpus-balance diagnostic that tells a
    // curation pass whether language mix differs by source. Emitted
    // per OBSERVED cell (the groupBy's domain) so no float is ever
    // summed across cells: obs and both marginals are exact longs, and
    // the two per-cell floats (expected count, chi² contribution) are
    // single IEEE expressions with identical operand shapes in both
    // engines, rounded to 6dp. Plan: one map-side-combined cell
    // groupBy over the corpus; marginals are tiny-key aggs that ride
    // as broadcasts — scales linearly at any corpus size.
    "chi2_test" -> ((s, dir) => {
      val d = docs(s, dir).select("lang", "source")
      val cells = d.groupBy("lang", "source").agg(count(lit(1)).as("obs"))
      val rt = d.groupBy("lang").agg(count(lit(1)).as("rt"))
      val ct = d.groupBy("source").agg(count(lit(1)).as("ct"))
      val n = d.agg(count(lit(1)).as("n"))
      val expC = col("rt").cast("double") * col("ct").cast("double") /
        col("n").cast("double")
      cells.join(broadcast(rt), "lang").join(broadcast(ct), "source")
        .crossJoin(broadcast(n))
        .select(col("lang"), col("source"), col("obs"), col("rt"),
          col("ct"), col("n"), round(expC, 6).as("exp6"),
          round((col("obs").cast("double") - expC) *
            (col("obs").cast("double") - expC) / expC, 6).as("chi2_c6"))
        .orderBy("lang", "source")
    }),

    // Pointwise mutual information between declared language and source
    // — the association strength read next to chi2_test's significance:
    // PMI(x,y) = ln(n_xy·N / (n_x·n_y)). Determinism: the log's argument
    // is ONE double division of two exact integer products (both far
    // under 2^53), bit-identical cross-engine, and the single ln folds
    // at 6dp — the BM25 idf discipline. Cell mass rides as integer ppm.
    // Marginals broadcast; the corpus pays one cell groupBy.
    "mutual_info" -> ((s, dir) => {
      val d = docs(s, dir).select("lang", "source")
      val cells = d.groupBy("lang", "source").agg(count(lit(1)).as("n_xy"))
      val rt = d.groupBy("lang").agg(count(lit(1)).as("n_x"))
      val ct = d.groupBy("source").agg(count(lit(1)).as("n_y"))
      val n = d.agg(count(lit(1)).as("n"))
      cells.join(broadcast(rt), "lang").join(broadcast(ct), "source")
        .crossJoin(broadcast(n))
        .select(col("lang"), col("source"), col("n_xy"),
          expr("n_xy * 1000000 div n").as("p_ppm"),
          round(log((col("n_xy") * col("n")).cast("double") /
            (col("n_x") * col("n_y")).cast("double")), 6).as("pmi6"))
        .orderBy("lang", "source")
    }),

    // CUBE over (lang, source): every rollup combination — per-cell,
    // per-lang, per-source, grand total — in ONE pass (Spark expands the
    // grouping sets map-side, so the corpus is scanned once and each
    // partial aggregates all four groupings before the shuffle).
    // grouping() flags disambiguate the <all> rows structurally.
    "cube_counts" -> ((s, dir) => {
      docs(s, dir).select("lang", "source")
        .cube("lang", "source")
        .agg(count(lit(1)).as("n"),
          grouping(col("lang")).cast("long").as("g_lang"),
          grouping(col("source")).cast("long").as("g_source"))
        .select(coalesce(col("lang"), lit("<all>")).as("lang"),
          coalesce(col("source"), lit("<all>")).as("source"),
          col("n"), col("g_lang"), col("g_source"))
        .orderBy("g_lang", "g_source", "lang", "source")
    }),

    // Cross-source quantile normalization (the batch-effect correction
    // of bioinformatics, applied to quality scores): each doc's quality
    // maps to its ppm percentile WITHIN its source, then to the global
    // quality value at that percentile — so per-source scoring biases
    // cancel and thresholds compare apples to apples across sources.
    // Ranks are integer ppm (no float percentiles); the within-source
    // rank is a source-keyed window, the global lookup table comes from
    // the two-phase PrefixScan (data-scaled, not one global window), and
    // the percentile→value mapping is an equi-join on the computed
    // global rank. N rides as a 1-row broadcast.
    "quantile_norm" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        TF.qualityScore(col("text")).as("q"))
      val wSrc = Window.partitionBy("source").orderBy("q", "doc_id")
      val withPct = d
        .withColumn("rk", row_number().over(wSrc).cast("long"))
        .withColumn("ns",
          count(lit(1)).over(Window.partitionBy("source")))
        .withColumn("pct_ppm",
          when(col("ns") > 1,
            expr("((rk - 1) * 1000000) div (ns - 1)")).otherwise(0L))
      val globalVals = graft.operators.PrefixScan
        .denseIds(d.select(col("q").as("gq"), col("doc_id").as("gid")),
          Seq("gq", "gid"), "grank",
          s.sparkContext.defaultParallelism)
        .select(col("grank"), col("gq"))
      val nTot = d.agg(count(lit(1)).as("nt"))
      withPct.crossJoin(broadcast(nTot))
        .withColumn("grank",
          expr("(pct_ppm * (nt - 1)) div 1000000"))
        .join(globalVals, Seq("grank"))
        .select(col("doc_id"), col("source"), col("pct_ppm"),
          col("gq").as("norm_q"))
        .orderBy("doc_id")
    }),

    // Sketch quantiles under a rank-error CONTRACT (ann_ivf-style
    // invariant gate): percentile_approx's mergeable sketch is the
    // 100 TB quantile path (map-side-combinable, one pass — where
    // quality_cutoffs' exact ranks need a per-group sort), but its merge
    // order follows partitioning, so the VALUE can't be hash-pinned
    // cross-engine. The gate emits oracle-recomputable group counts plus
    // integer flags the ENGINE verifies by exact rank cross-check:
    // rank(approx_p50)/n ∈ [0.4, 0.6], rank(approx_p90)/n ∈ [0.82, 0.98]
    // (sketch error ≤ 1% at accuracy 100, ±1-element discreteness at the
    // gate's 25-row groups). A broken sketch flips a flag to 0 and the
    // hash mismatches.
    "approx_quantile" -> ((s, dir) => {
      val base = docs(s, dir).select(col("source"), col("n_chars"))
      val ap = base.groupBy("source").agg(
        percentile_approx(col("n_chars"), lit(0.5), lit(100)).as("p50"),
        percentile_approx(col("n_chars"), lit(0.9), lit(100)).as("p90"))
      base.join(broadcast(ap), "source")
        .groupBy("source")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("n_chars") <= col("p50"), 1L).otherwise(0L)).as("le50"),
          sum(when(col("n_chars") <= col("p90"), 1L).otherwise(0L)).as("le90"))
        .select(col("source"), col("n_rows"),
          (col("le50") * 10 >= col("n_rows") * 4 &&
            col("le50") * 10 <= col("n_rows") * 6).cast("int").as("p50_ok"),
          (col("le90") * 50 >= col("n_rows") * 41 &&
            col("le90") * 50 <= col("n_rows") * 49).cast("int").as("p90_ok"))
        .orderBy("source")
    }),

    // Weighted sampling without replacement (Sampling.weightedSample —
    // deterministic Efraimidis-Spirakis): quality-proportional corpus
    // subsampling, the "prefer good docs but keep diversity" downsampler.
    // The WINNER SET and priorities are value-checked by the oracle.
    "sample_weighted" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"),
        (TF.qualityScore(col("text")) + 0.1).as("w"))
      graft.operators.Sampling.weightedSample(base, "doc_id", col("w"),
          WeightedN)
        .select(col("doc_id"), round(col("w"), 6).as("w6"), col("priority"))
        .orderBy(col("priority").desc, col("doc_id"))
    }),

    // Cardinality estimation: HyperLogLog++ vocabulary size vs the exact
    // distinct count, in ONE aggregation pass — the sketch a 100 TB
    // pipeline uses where countDistinct's shuffle is unaffordable. HLL
    // is deterministic given the data, and the gate asserts the rsd-5%
    // sketch lands within 10% of exact (the flag has teeth in-engine;
    // the oracle recomputes the exact count from the table).
    "approx_distinct" -> ((s, dir) => {
      docs(s, dir).select(explode(TF.tokens(col("text"))).as("w"))
        .agg(countDistinct("w").cast("long").as("n_exact"),
          approx_count_distinct("w", 0.05).as("n_approx"))
        .select(col("n_exact"),
          (abs(col("n_approx") - col("n_exact")) * 10 <= col("n_exact"))
            .cast("int").as("within_10pct"))
    }),

    // Salted skew join: events fact joined to a tiny per-type dim on the
    // massively skewed event_type key via SkewJoin (row-identical to the
    // plain join, spec + oracle checked). Money amounts are integerized
    // (floor(value*100)) BEFORE summing so the aggregate is exact across
    // engines and summation orders.
    "skew_join" -> ((s, dir) => {
      val e = table(s, dir, "events").select(col("user_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
      val dim = e.select("event_type").distinct()
        .withColumn("weight", (length(col("event_type")) % 5 + 1).cast("long"))
      SkewJoin.saltedJoin(e, dim, "event_type", SaltBuckets)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("cents") * col("weight")).as("weighted_cents"))
        .orderBy("user_id")
    }),

    // Gopher-style rule-based document filter (Rae et al. 2021 §A1.1):
    // word-count bounds, mean-word-length sanity, symbol-to-word ratio
    // ('#' chars + ellipses), bullet-line and ellipsis-line fractions,
    // alphabetic-word fraction, and a stopword floor. The synthetic corpus
    // is single-line and symbol-free, so a deterministic augmentation
    // (mirrored verbatim in the oracle, like pii_scan's injection) makes
    // every rule's fail path non-trivial. Every rule is an integer
    // cross-multiplication — no floating point anywhere, so the gate
    // hashes exactly across engines. One pure projection: the per-doc
    // work needs zero shuffle at any corpus size (the orderBy is the
    // gate's determinism requirement, not the operator's).
    "gopher_filter" -> ((s, dir) => {
      val synth = concat(col("text"),
        when(col("doc_id") % 7 === 0, lit(" ########")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          lit("\n- b1\n- b2\n- b3\n- b4\n- b5\n- b6\n- b7\n- b8\n- b9\n- b10"))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit("\nto be continued...\nwait…"))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit(" 0 12 345 678 90 1 23 456"))
          .otherwise(lit("")))
      docs(s, dir)
        .select(col("doc_id"),
          TF.gopherFlags(synth, GopherMinWords, GopherMaxWords).as("g"))
        .select(col("doc_id"), col("g.*"))
        .orderBy("doc_id")
    }),

    // Mergeable HyperLogLog (Flajolet et al. 2007), fully deterministic
    // and value-exact under the oracle — unlike approx_distinct's
    // contract gate, every register and the estimate itself replay in
    // SQL. Hash = PolyHash (< 2^30): bucket = h mod 64, rho = leading-
    // zero rank of the remaining 24 bits via an exact integer CASE chain
    // (no log2 floats). The per-(source, bucket) max IS the mergeable
    // sketch state — a union of corpora is max-merge of registers — and
    // the register payload is O(sources·64) regardless of corpus size.
    // Σ2^-M sums exact powers of two (mantissa span 25 bits < 53), so
    // float order can't perturb it; the raw estimate's one division is
    // the only rounding op in either engine. At gate SF the per-source
    // vocabulary (~31) sits deep in HLL's small-range regime, so raw_est
    // over-reads by design — v_zero is emitted precisely so downstream
    // applies the linear-counting correction m·ln(m/V) (≈ 30.1 here; ln
    // is kept OUT of the gate because libm ln is not cross-engine
    // bit-reproducible, unlike the division).
    "hll_distinct" -> ((s, dir) => {
      val pairs = docs(s, dir)
        .select(col("source"), explode(TF.tokens(col("text"))).as("w"))
        .distinct()
      val regs = graft.operators.Sketches
        .hllRegisters(pairs, "source", "w", HllM, HllBits)
      val agg = regs.groupBy("source").agg(
        count(lit(1)).as("nb"),
        sum("m").as("reg_sum"), max("m").as("reg_max"),
        sum(expr("1.0 / cast(shiftleft(cast(1 as bigint), cast(m as int)) as double)"))
          .as("s2"))
      val nEx = pairs.groupBy("source").agg(count(lit(1)).as("n_exact"))
      agg.join(broadcast(nEx), Seq("source"))
        .select(col("source"), col("n_exact"),
          (lit(HllM) - col("nb")).cast("long").as("v_zero"),
          col("reg_sum"), col("reg_max"),
          round(lit(0.709) * lit(HllM * HllM.toDouble) /
            (col("s2") + (lit(HllM) - col("nb")).cast("double")), 6)
            .as("raw_est"))
        .orderBy("source")
    }),

    // DSIR-shaped importance scoring (Xie et al. 2023): rank raw-corpus
    // documents by how much their hashed-unigram feature counts look
    // like a TARGET distribution (here the lang='en' slice). Per-bucket
    // importance is the integer bit weight flog2(ct+1) − flog2(cs+1)
    // (the repo's exact floor-log2 `length(bin(x))-1` trick — no float
    // logs, identical in SQL), and a doc's score is the integer sum
    // Σ c_doc[b]·w[b]. The 256-row weight table broadcasts; the per-doc
    // bucket counts are a map-side-combined groupBy bounded at B rows
    // per doc; selection is TakeOrdered — every stage scales.
    //
    // Honest caveat: the synthetic corpus draws every language's text
    // from ONE shared vocabulary (lang is independent metadata), so no
    // unigram signal separates the target slice and the top-k stays
    // near the base rate — the gate value-checks the MACHINERY (hashing,
    // weights, normalization, ranking); on a real multilingual corpus
    // the same plan is the DSIR selection step.
    "dsir_weights" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(TF.tokens(col("text"))).as("w"))
        .withColumn("b", PolyHash.poly_hash(col("w")) % DsirB)
      val cs = toks.groupBy("b").agg(count(lit(1)).as("cs"))
      val ct = toks.where(col("lang") === DsirLang)
        .groupBy("b").agg(count(lit(1)).as("ct"))
      val wt = cs.join(ct, Seq("b"), "left").select(col("b"),
        (expr("length(bin(coalesce(ct, 0) + 1)) - 1")
          - expr("length(bin(cs + 1)) - 1")).cast("long").as("wt"))
      val docB = toks.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      // rank by the PER-TOKEN bit rate, not the raw sum — every bucket
      // weight is negative (ct <= cs), so the unnormalized score just
      // rewards short documents; the rate is one IEEE division over
      // exact integers, 6dp-rounded in both engines
      docB.join(broadcast(wt), Seq("b"))
        .groupBy("doc_id")
        .agg(sum(col("c") * col("wt")).as("score_bits"),
          sum("c").cast("long").as("n_tokens"))
        .withColumn("bits_per_kt",
          round((col("score_bits") * 1000).cast("double") / col("n_tokens"),
            6))
        .join(broadcast(docs(s, dir).select(col("doc_id"), col("lang"))),
          Seq("doc_id"))
        .orderBy(col("bits_per_kt").desc, col("doc_id"))
        .limit(DsirTopN)
        .select("doc_id", "lang", "n_tokens", "score_bits", "bits_per_kt")
    }),

    // Temperature-sampling mixture weights (the corpus-mixing step of
    // LLM pretraining: sample source i with p_i ∝ n_i^τ, τ = 1/2 —
    // upweights small high-value sources, de-emphasizes the dominant
    // crawl). Determinism without float sums: w_i = floor(1e6·sqrt(n_i))
    // is one correctly-rounded IEEE sqrt per source (bit-identical in
    // both engines), and both normalizations are integer divisions over
    // exact integer totals — no float accumulation anywhere, so source
    // order can't flip a ppm. Scale shape: per-source counts are a
    // map-side-combined tiny-key agg; the totals are a 1-row broadcast.
    "mix_temperature" -> ((s, dir) => {
      val c = docs(s, dir).groupBy("source").agg(count(lit(1)).as("n"))
      val w = c.withColumn("w",
        floor(sqrt(col("n").cast("double")) * 1000000).cast("long"))
      val t = w.agg(sum("n").cast("long").as("tn"),
        sum("w").cast("long").as("tw"))
      w.crossJoin(broadcast(t))
        .select(col("source"), col("n"), col("w"),
          expr("(1000000 * w) div tw").as("p_ppm"),
          expr("(1000000 * n) div tn").as("r_ppm"))
        .orderBy("source")
    }),

    // k-anonymity risk audit over quasi-identifiers (the privacy gate a
    // release pipeline runs BEFORE publishing a corpus — Sweeney 2002;
    // the reference's whole anonymization pipeline enforces k=4 on
    // cluster size, DBSCAN.py:103-133): group documents by the QI tuple
    // (lang, source, length bucket) and report, per lang, how many QI
    // groups and documents sit below the k=4 floor. One map-side-
    // combined ≤|QI-domain|-key groupBy, then a tiny-key rollup —
    // nothing row-scale shuffles twice.
    "k_anon_audit" -> ((s, dir) => {
      val g = docs(s, dir)
        .groupBy(col("lang"), col("source"),
          expr("n_chars div 256").as("len_b"))
        .agg(count(lit(1)).as("n"))
      g.groupBy("lang").agg(
          count(lit(1)).as("n_groups"),
          sum((col("n") < kAnonFloor).cast("long")).as("unsafe_groups"),
          sum(when(col("n") < kAnonFloor, col("n")).otherwise(0L))
            .cast("long").as("unsafe_docs"),
          min("n").as("min_group"), max("n").as("max_group"))
        .orderBy("lang")
    }),

    // Kendall's tau-b (Kendall 1938; tie-corrected 1945) between two
    // per-source corpus signals (total chars vs doc count) — the
    // rank-agreement check next to rank_corr's Spearman, and the one
    // that stays EXACT under ties: concordant/discordant/tied pair
    // counts are integers from the ≤|sources|² broadcast self-join, and
    // the only float is the final sqrt-normalized division, one IEEE
    // expression both engines replay. Source-level aggregates first, so
    // the pair join is over 20 rows regardless of corpus size.
    "kendall_tau" -> ((s, dir) => {
      val m = docs(s, dir).groupBy("source")
        .agg(sum("n_chars").cast("long").as("x"),
          max("n_chars").cast("long").as("y"))
      val a = m.select(col("source").as("sa"), col("x").as("xa"),
        col("y").as("ya"))
      val b = m.select(col("source").as("sb"), col("x").as("xb"),
        col("y").as("yb"))
      val prod = (col("xa") - col("xb")) * (col("ya") - col("yb"))
      val p = a.crossJoin(broadcast(b)).where(col("sa") < col("sb"))
        .select((prod > 0).cast("long").as("c"),
          (prod < 0).cast("long").as("d"),
          (col("xa") === col("xb")).cast("long").as("tx"),
          (col("ya") === col("yb")).cast("long").as("ty"))
      p.agg(count(lit(1)).as("n0"), sum("c").cast("long").as("nc"),
          sum("d").cast("long").as("nd"),
          sum("tx").cast("long").as("x_ties"),
          sum("ty").cast("long").as("y_ties"))
        .select(col("n0"), col("nc"), col("nd"), col("x_ties"),
          col("y_ties"),
          // tau is undefined when one signal is constant (every pair
          // tied) — NULL, not a division error, in both engines
          when((col("n0") === col("x_ties")) ||
              (col("n0") === col("y_ties")), lit(null).cast("double"))
            .otherwise(round((col("nc") - col("nd")).cast("double") /
              sqrt(((col("n0") - col("x_ties")) *
                (col("n0") - col("y_ties"))).cast("double")), 6))
            .as("tau_b"))
    }),

    // Small-file compaction planner: per source, documents pack into
    // target-sized output files in doc_id order — file_id =
    // floor(exclusive running chars / target), i.e. a new file starts
    // once the running total crosses the target. The running sum is the
    // two-phase PrefixScan over a (source, doc_id) range partitioning
    // (parallelism follows numParts, not |sources|); the emitted plan is
    // the per-file manifest (doc count, char total, doc_id range) a
    // compaction job would execute. Pure keyed aggregation after the
    // scan — scales.
    "compact_plan" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
      graft.operators.PrefixScan.exclusiveCumsum(
          d, "source", Seq("doc_id"), "n_chars", "cum",
          numParts = s.sparkContext.defaultParallelism)
        .select(col("source"), col("doc_id"), col("n_chars"),
          (col("cum") / CompactTarget).cast("long").as("file_id"))
        .groupBy("source", "file_id")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("total_chars"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("source", "file_id")
    }))

  // ----------------------------------------------------------- oracles

  import TextQueries.{sqlPolyHash, sqlQuality, sqlToks}

  val oracleSql: Map[String, String] = Map(
    // the text_stats count kernels rolled up per lang; sums CAST back
    // to BIGINT (DuckDB widens to HUGEINT)
    "tokenizer_fertility" ->
      s"""WITH $sqlToks,
         |m AS (SELECT doc_id, text, CAST(len(t) AS BIGINT) AS w,
         |    CAST(coalesce(list_sum(list_transform(t,
         |      x -> CAST(ceil(length(x) / 4.0) AS BIGINT))), 0) AS BIGINT)
         |      AS b
         |  FROM toks),
         |r AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(m.w) AS BIGINT) AS words,
         |    CAST(sum(m.b) AS BIGINT) AS bpe_tokens
         |  FROM m JOIN documents d USING (doc_id) GROUP BY d.lang)
         |SELECT lang, n_docs, words, bpe_tokens,
         |  CAST(CASE WHEN words > 0
         |    THEN (1000000 * bpe_tokens) // words END AS BIGINT)
         |    AS fertility_ppm
         |FROM r ORDER BY lang""".stripMargin,
    // same per-row integer counts, same fixed-shape IEEE expression
    "readability" ->
      s"""WITH $sqlToks,
         |m AS (SELECT doc_id,
         |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
         |      AS BIGINT) AS letters,
         |    CAST(len(t) AS BIGINT) AS words,
         |    greatest(CAST(1 AS BIGINT),
         |      CAST(length(regexp_replace(text, '[^.!?]', '', 'g'))
         |        AS BIGINT)) AS sentences
         |  FROM toks)
         |SELECT doc_id, letters, words, sentences,
         |  CASE WHEN words > 0 THEN round(
         |    0.0588 * (100.0 * letters / words)
         |      - 0.296 * (100.0 * sentences / words) - 15.8, 4)
         |  END AS cli4
         |FROM m ORDER BY doc_id""".stripMargin,
    // the three exact moments + the same integer-ppm floor division
    "term_burstiness" ->
      s"""WITH $sqlToks,
         |pd AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS x FROM (
         |    SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY doc_id, w),
         |mo AS (SELECT w, CAST(count(*) AS BIGINT) AS df,
         |    CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(x * x) AS BIGINT) AS sxx
         |  FROM pd GROUP BY w HAVING sum(x) >= 50)
         |SELECT w, df, sx,
         |  CAST((1000000 * (df * sxx - sx * sx)) // (df * sx) AS BIGINT)
         |    AS vmr_ppm
         |FROM mo ORDER BY vmr_ppm DESC, w LIMIT 30""".stripMargin,
    "k_anon_audit" ->
      s"""WITH g AS (SELECT lang, source, n_chars // 256 AS len_b,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY lang, source, len_b)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CAST(n < $kAnonFloor AS BIGINT)) AS BIGINT)
        |    AS unsafe_groups,
        |  CAST(sum(CASE WHEN n < $kAnonFloor THEN n ELSE 0 END) AS BIGINT)
        |    AS unsafe_docs,
        |  min(n) AS min_group, max(n) AS max_group
        |FROM g GROUP BY lang ORDER BY lang""".stripMargin,
    "kendall_tau" ->
      """WITH m AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS x,
        |    CAST(max(n_chars) AS BIGINT) AS y
        |  FROM documents GROUP BY source),
        |p AS (SELECT
        |    CAST((a.x - b.x) * (a.y - b.y) > 0 AS BIGINT) AS c,
        |    CAST((a.x - b.x) * (a.y - b.y) < 0 AS BIGINT) AS d,
        |    CAST(a.x = b.x AS BIGINT) AS tx,
        |    CAST(a.y = b.y AS BIGINT) AS ty
        |  FROM m a JOIN m b ON a.source < b.source),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n0,
        |    CAST(sum(c) AS BIGINT) AS nc, CAST(sum(d) AS BIGINT) AS nd,
        |    CAST(sum(tx) AS BIGINT) AS x_ties,
        |    CAST(sum(ty) AS BIGINT) AS y_ties FROM p)
        |SELECT n0, nc, nd, x_ties, y_ties,
        |  CASE WHEN n0 = x_ties OR n0 = y_ties THEN NULL
        |    ELSE round(CAST(nc - nd AS DOUBLE) /
        |      sqrt(CAST((n0 - x_ties) * (n0 - y_ties) AS DOUBLE)), 6)
        |  END AS tau_b
        |FROM t""".stripMargin,
    "mix_temperature" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS w
        |  FROM c),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
        |    CAST(sum(w) AS BIGINT) AS tw FROM w)
        |SELECT source, n, w,
        |  CAST((1000000 * w) // tw AS BIGINT) AS p_ppm,
        |  CAST((1000000 * n) // tn AS BIGINT) AS r_ppm
        |FROM w, t ORDER BY source""".stripMargin,
    // the fixed-centroid bucket assign replayed in SQL (the ann_ivf_fixed
    // machinery: argmax cosine = row_number over (-cos, cluster)), joined
    // to the 6dp quality score, ranked per bucket
    "cluster_select" -> {
      val cos =
        "list_dot_product(a.e, c.c) / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.c, c.c)))"
      s"""WITH $sqlToks,
         |q AS (SELECT doc_id, $sqlQuality AS q6 FROM toks),
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |cents AS (SELECT vec_id AS cluster, e AS c FROM v
         |  WHERE vec_id < $SelCents),
         |vb AS (SELECT vec_id, cluster AS bucket FROM (
         |    SELECT a.vec_id, c.cluster,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY -($cos), c.cluster) AS rn
         |    FROM v a CROSS JOIN cents c) WHERE rn = 1),
         |j AS (SELECT q.doc_id, vb.bucket, q.q6
         |  FROM q JOIN vb ON q.doc_id = vb.vec_id),
         |r AS (SELECT doc_id, bucket, q6, row_number() OVER (
         |    PARTITION BY bucket ORDER BY q6 DESC, doc_id) AS rk
         |  FROM j)
         |SELECT doc_id, CAST(bucket AS INT) AS bucket, q6,
         |  CAST(rk AS INT) AS rk, rk <= $SelQuota AS kept
         |FROM r ORDER BY doc_id""".stripMargin
    },
    // adjacent pairs via the LIST range (the rep_signals bigram form):
    // range(1, len(t)) yields i in [1, len-1], so t[i] || ' ' || t[i+1]
    // is in bounds exactly when the doc has >= 2 tokens
    "bpe_pairs" ->
      s"""WITH $sqlToks,
         |p AS (SELECT unnest(list_transform(range(1, len(t)),
         |    i -> t[i] || ' ' || t[i + 1])) AS pair
         |  FROM toks WHERE len(t) >= 2),
         |c AS (SELECT pair, CAST(count(*) AS BIGINT) AS cnt
         |  FROM p GROUP BY pair),
         |ranked AS (SELECT pair, cnt,
         |    row_number() OVER (ORDER BY cnt DESC, pair) AS rank FROM c)
         |SELECT pair, cnt, CAST(rank AS INT) AS rank FROM ranked
         |WHERE rank <= $BpeK ORDER BY rank""".stripMargin,
    // the deterministic hash rank replayed with the PolyHash formula on
    // the stringified key — WHICH rows survive is value-checked
    "sample_fixed" -> {
      val h = sqlPolyHash("CAST(doc_id AS VARCHAR)")
      s"""WITH r AS (SELECT doc_id, source, row_number() OVER (
         |    PARTITION BY source ORDER BY $h, doc_id) AS rk
         |  FROM documents)
         |SELECT doc_id, source FROM r WHERE rk <= $FixedN
         |ORDER BY source, doc_id""".stripMargin
    },
    // the Efraimidis-Spirakis priority replayed exactly: u from the
    // PolyHash formula, priority = round(u^(1/w), 6) (the 6dp round
    // absorbs libm pow ulp differences), top-N by (priority desc, id)
    "sample_weighted" -> {
      val h = sqlPolyHash("CAST(doc_id AS VARCHAR)")
      val pDenom = (graft.functions.PolyHash.Prime + 1).toDouble
      s"""WITH $sqlToks,
         |q AS (SELECT doc_id, $sqlQuality + 0.1 AS w FROM toks),
         |pr AS (SELECT doc_id, w,
         |    round(power(CAST($h + 1 AS DOUBLE) / $pDenom, 1.0 / w), 6)
         |      AS priority
         |  FROM q WHERE w > 0),
         |top AS (SELECT doc_id, round(w, 6) AS w6, priority FROM pr
         |  ORDER BY priority DESC, doc_id LIMIT $WeightedN)
         |SELECT doc_id, w6, priority FROM top
         |ORDER BY priority DESC, doc_id""".stripMargin
    },
    // exact vocabulary cardinality recomputed from the table; the 10%
    // envelope's teeth are the in-engine exact-vs-HLL comparison
    "approx_distinct" ->
      s"""WITH $sqlToks,
         |u AS (SELECT unnest(t) AS w FROM toks)
         |SELECT CAST(count(DISTINCT w) AS BIGINT) AS n_exact,
         |  CAST(1 AS INT) AS within_10pct FROM u""".stripMargin,
    // exact rank-based percentiles: value at rank ceil(q*n) over
    // contract gate: counts recomputed from the table; the flags' teeth
    // are the engine's exact rank cross-check (see the gate comment)
    "approx_quantile" ->
      s"""SELECT source, count(*) AS n_rows,
         |  CAST(1 AS INT) AS p50_ok, CAST(1 AS INT) AS p90_ok
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // (quality asc, doc_id) per source — deterministic member values,
    // no interpolation, no approx sketch
    "quality_cutoffs" ->
      s"""WITH $sqlToks,
         |q AS (SELECT doc_id, $sqlQuality AS q6 FROM toks),
         |j AS (SELECT d.source, q.doc_id, q.q6
         |  FROM documents d JOIN q ON d.doc_id = q.doc_id),
         |r AS (SELECT source, doc_id, q6,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY q6, doc_id) AS rk,
         |    count(*) OVER (PARTITION BY source) AS n FROM j)
         |SELECT source, CAST(max(n) AS BIGINT) AS n,
         |  max(CASE WHEN rk = CAST(ceil(n * 0.25) AS BIGINT) THEN q6 END)
         |    AS p25,
         |  max(CASE WHEN rk = CAST(ceil(n * 0.50) AS BIGINT) THEN q6 END)
         |    AS p50,
         |  max(CASE WHEN rk = CAST(ceil(n * 0.75) AS BIGINT) THEN q6 END)
         |    AS p75
         |FROM r GROUP BY source ORDER BY source""".stripMargin,
    // line counts before/after dedup + cleaned length; kept_len is
    // reconstructed as sum(distinct-line lengths) + (n_kept - 1)
    // newline separators, exactly array_join's arithmetic
    "line_dedup" ->
      """WITH synth AS (SELECT doc_id,
        |    concat_ws(chr(10), text, text, substr(text, 1, 20), text) AS text
        |  FROM documents),
        |l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
        |  FROM synth),
        |d AS (SELECT DISTINCT doc_id, line FROM l),
        |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
        |  FROM l GROUP BY doc_id),
        |b AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    CAST(sum(length(line)) AS BIGINT) AS chars
        |  FROM d GROUP BY doc_id)
        |SELECT a.doc_id, a.n_lines, b.n_kept,
        |  CAST(b.chars + b.n_kept - 1 AS BIGINT) AS kept_len
        |FROM a JOIN b ON a.doc_id = b.doc_id
        |ORDER BY a.doc_id""".stripMargin,
    // the kept_len/n_kept pair mirrors array_join arithmetic: assembled
    // length = Σ line lengths + (n-1) separators; a fully-stripped doc
    // (or one whose only survivor is the empty line) reassembles to ""
    "boilerplate_lines" ->
      """WITH synth AS (SELECT doc_id,
        |    concat_ws(chr(10), text, text, substr(text, 1, 20), text) AS text
        |  FROM documents),
        |l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
        |  FROM synth),
        |hot AS (SELECT line FROM l GROUP BY line
        |  HAVING count(DISTINCT doc_id) > 1),
        |kept AS (SELECT doc_id, line FROM l ANTI JOIN hot USING (line)),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(length(line)) + count(*) - 1 AS BIGINT) AS klen
        |  FROM kept GROUP BY doc_id)
        |SELECT s.doc_id,
        |  CAST(coalesce(a.klen, 0) AS BIGINT) AS kept_len,
        |  CAST(CASE WHEN coalesce(a.klen, 0) = 0 THEN 0 ELSE a.n_rows END
        |    AS BIGINT) AS n_kept
        |FROM synth s LEFT JOIN agg a ON s.doc_id = a.doc_id
        |ORDER BY s.doc_id""".stripMargin,
    "rep_signals" ->
      s"""WITH $sqlToks,
         |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
         |    i -> t[i] || ' ' || t[i + 1])) AS g
         |  FROM toks WHERE len(t) >= 2),
         |bc AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2),
         |bt AS (SELECT doc_id, max(c) AS mx, sum(c) AS nb FROM bc GROUP BY 1),
         |ts AS (SELECT doc_id, len(t) AS nt, len(list_distinct(t)) AS nd
         |  FROM toks)
         |SELECT ts.doc_id, CAST(nt AS BIGINT) AS n_tokens,
         |  CASE WHEN nt = 0 THEN 0.0
         |       ELSE round(1.0 - CAST(nd AS DOUBLE) / nt, 6) END
         |    AS dup_token_frac,
         |  round(coalesce(CAST(mx AS DOUBLE) / nb, 0.0), 6)
         |    AS top_bigram_frac
         |FROM ts LEFT JOIN bt ON ts.doc_id = bt.doc_id
         |ORDER BY ts.doc_id""".stripMargin,
    "vocab_topk" ->
      s"""WITH $sqlToks,
         |tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
         |agg AS (SELECT token, CAST(count(*) AS BIGINT) AS tf,
         |    CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM tok GROUP BY 1),
         |r AS (SELECT token, tf, df,
         |    row_number() OVER (ORDER BY tf DESC, token) AS rank FROM agg)
         |SELECT token, tf, df, CAST(rank AS INT) AS rank FROM r
         |WHERE rank <= $VocabK ORDER BY rank""".stripMargin,
    "source_stats" ->
      s"""WITH $sqlToks,
         |q AS (SELECT doc_id, len(t) AS nt, $sqlQuality AS quality
         |  FROM toks)
         |SELECT d.source AS source, count(*) AS n_docs,
         |  CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
         |  CAST(sum(q.nt) AS BIGINT) AS sum_tokens,
         |  round(avg(q.quality), 6) AS avg_quality,
         |  CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs
         |FROM documents d JOIN q ON d.doc_id = q.doc_id
         |GROUP BY d.source ORDER BY source""".stripMargin,
    // mirrors the Spark expressions op-for-op: z·sqrt(n) grouping before
    // the division, CASE guard on n_tokens = 0, round-6 at the end
    "domain_mix" ->
      s"""WITH $sqlToks,
         |q AS (SELECT doc_id, len(t) AS nt FROM toks),
         |s AS (SELECT d.source AS source, count(*) AS n_docs,
         |    CAST(sum(q.nt) AS BIGINT) AS n_tokens
         |  FROM documents d JOIN q ON d.doc_id = q.doc_id
         |  GROUP BY d.source),
         |g AS (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) AS z,
         |    CAST(sum(n_tokens) AS BIGINT) AS tot FROM s)
         |SELECT source, n_docs, n_tokens,
         |  round(sqrt(CAST(n_tokens AS DOUBLE)) / z, 6) AS weight,
         |  CASE WHEN n_tokens = 0 THEN 0.0
         |       ELSE round(CAST(tot AS DOUBLE) /
         |         (z * sqrt(CAST(n_tokens AS DOUBLE))), 6) END AS epochs
         |FROM s, g ORDER BY source""".stripMargin,
    // the same waterfill windows over the tiny source table; DuckDB's
    // window sums widen to HUGEINT, so alloc is CAST back to BIGINT
    "unimax_alloc" ->
      s"""WITH $sqlToks,
         |q AS (SELECT doc_id, len(t) AS nt FROM toks),
         |s AS (SELECT d.source AS source,
         |    CAST(sum(q.nt) AS BIGINT) AS n_tokens
         |  FROM documents d JOIN q ON d.doc_id = q.doc_id
         |  GROUP BY d.source),
         |g AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
         |    CAST(count(*) AS BIGINT) AS nd FROM s),
         |r AS (SELECT s.source, s.n_tokens,
         |    s.n_tokens * $UnimaxEpochCap AS cap,
         |    (g.tot * 3) // 5 AS budget, g.nd AS nd,
         |    CAST(row_number() OVER (
         |      ORDER BY s.n_tokens * $UnimaxEpochCap, s.source) AS BIGINT)
         |      AS i,
         |    sum(s.n_tokens * $UnimaxEpochCap) OVER (
         |      ORDER BY s.n_tokens * $UnimaxEpochCap, s.source
         |      ROWS UNBOUNDED PRECEDING) AS prefix
         |  FROM s, g),
         |rs AS (SELECT *, (prefix + cap * (nd - i) <= budget) AS sat
         |  FROM r),
         |th AS (SELECT coalesce(min(theta), 0) AS theta FROM (
         |  SELECT (budget - prefix + cap) // (nd - i + 1) AS theta
         |  FROM rs WHERE NOT sat ORDER BY i LIMIT 1))
         |SELECT source, n_tokens, CAST(cap AS BIGINT) AS cap,
         |  CAST(CASE WHEN sat THEN cap
         |       ELSE least(cap, th.theta) END AS BIGINT) AS alloc,
         |  CASE WHEN n_tokens = 0 THEN 0.0
         |       ELSE round(CAST(CASE WHEN sat THEN cap
         |           ELSE least(cap, th.theta) END AS DOUBLE) /
         |         CAST(n_tokens AS DOUBLE), 6) END AS epochs
         |FROM rs, th ORDER BY source""".stripMargin,
    // bit counts via length(bin(tot // vc)) - 1 — pure integer arithmetic
    // mirrored from the Spark plan; the only double op is the final
    // division of two exact integers, 6dp-rounded in both engines
    "surprisal_score" ->
      s"""WITH $sqlToks,
         |occ AS (SELECT doc_id, unnest(t) AS w FROM toks),
         |dt AS (SELECT doc_id, w, count(*) AS c FROM occ GROUP BY 1, 2),
         |v AS (SELECT w, CAST(sum(c) AS BIGINT) AS vc FROM dt GROUP BY 1),
         |g AS (SELECT CAST(sum(vc) AS BIGINT) AS tot FROM v),
         |sc AS (SELECT dt.doc_id,
         |    CAST(sum(dt.c * (length(bin(g.tot // v.vc)) - 1)) AS BIGINT)
         |      AS sb,
         |    CAST(sum(dt.c) AS BIGINT) AS nt
         |  FROM dt JOIN v USING (w), g GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(sc.nt, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(sc.sb, 0) AS BIGINT) AS sum_bits,
         |  CASE WHEN coalesce(sc.nt, 0) = 0 THEN 0.0
         |       ELSE round(CAST(sc.sb AS DOUBLE) / sc.nt, 6) END AS surprisal
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // surprisal_score's integer-bit CTEs + row_number in (milli_bits,
    // doc_id) order + the explicit (rank·3)//n third cut
    "ccnet_buckets" ->
      s"""WITH $sqlToks,
         |occ AS (SELECT doc_id, unnest(t) AS w FROM toks),
         |dt AS (SELECT doc_id, w, count(*) AS c FROM occ GROUP BY 1, 2),
         |v AS (SELECT w, CAST(sum(c) AS BIGINT) AS vc FROM dt GROUP BY 1),
         |g AS (SELECT CAST(sum(vc) AS BIGINT) AS tot FROM v),
         |sc AS (SELECT dt.doc_id,
         |    CAST(sum(dt.c * (length(bin(g.tot // v.vc)) - 1)) AS BIGINT)
         |      AS sb,
         |    CAST(sum(dt.c) AS BIGINT) AS nt
         |  FROM dt JOIN v USING (w), g GROUP BY 1),
         |ds AS (SELECT d.doc_id,
         |    CAST(coalesce(sc.nt, 0) AS BIGINT) AS nt,
         |    CAST(coalesce(sc.sb, 0) AS BIGINT) AS sb,
         |    CAST((coalesce(sc.sb, 0) * 1000) //
         |      greatest(coalesce(sc.nt, 0), 1) AS BIGINT) AS mb
         |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
         |r AS (SELECT *, row_number() OVER (ORDER BY mb, doc_id) AS rn,
         |    count(*) OVER () AS n FROM ds)
         |SELECT CAST(((rn - 1) * 3) // n AS INT) AS bucket,
         |  count(*) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS sum_tokens,
         |  CAST(min(mb) AS BIGINT) AS min_mbits,
         |  CAST(max(mb) AS BIGINT) AS max_mbits
         |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin,
    // bigram order: aligned slice-unnest pairs, prefix counts from the
    // bigram table, bits = length(bin(c1 // c12)) - 1 — same integer
    // discipline as surprisal_score, one double division at the end
    "bigram_score" ->
      s"""WITH $sqlToks,
         |bgl AS (SELECT doc_id,
         |    CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
         |         ELSE t[1:len(t)-1] END AS l1,
         |    CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
         |         ELSE t[2:len(t)] END AS l2
         |  FROM toks),
         |occ AS (SELECT doc_id, unnest(l1) AS w1, unnest(l2) AS w2 FROM bgl),
         |db AS (SELECT doc_id, w1, w2, count(*) AS c FROM occ GROUP BY 1, 2, 3),
         |cb AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS cc FROM db GROUP BY 1, 2),
         |pc AS (SELECT w1, CAST(sum(cc) AS BIGINT) AS pcnt FROM cb GROUP BY 1),
         |sc AS (SELECT db.doc_id,
         |    CAST(sum(db.c * (length(bin(pc.pcnt // cb.cc)) - 1)) AS BIGINT)
         |      AS sb,
         |    CAST(sum(db.c) AS BIGINT) AS nb
         |  FROM db JOIN cb USING (w1, w2) JOIN pc USING (w1) GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(sc.nb, 0) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce(sc.sb, 0) AS BIGINT) AS sum_bits,
         |  CASE WHEN coalesce(sc.nb, 0) = 0 THEN 0.0
         |       ELSE round(CAST(sc.sb AS DOUBLE) / sc.nb, 6) END AS surprisal2
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // hashing-trick linear scorer: bucket = poly_hash(w) % 4096, weight =
    // Knuth-mix of the bucket into [-1000, 1000] — all BIGINT arithmetic,
    // identical in both engines; list_sum is NULL on empty → coalesce 0
    "quality_lr" ->
      s"""WITH $sqlToks
         |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(list_sum(list_transform(t, w ->
         |    ((${sqlPolyHash("w")}) % 4096) * 2654435761 % 2001 - 1000)), 0)
         |    AS BIGINT) AS logit,
         |  CASE WHEN CAST(coalesce(list_sum(list_transform(t, w ->
         |    ((${sqlPolyHash("w")}) % 4096) * 2654435761 % 2001 - 1000)), 0)
         |    AS BIGINT) > 0 THEN 1 ELSE 0 END AS keep
         |FROM toks ORDER BY doc_id""".stripMargin,
    // the greedy fill in rank order: exclusive window cumsum over
    // (-quality, doc_id) — quality is already 6dp-rounded in both
    // engines, so the rank order (and hence the integer cumsum) is
    // engine-independent
    "budget_select" ->
      s"""WITH $sqlToks,
         |q AS (SELECT doc_id, $sqlQuality AS quality,
         |    CAST(coalesce(list_sum(list_transform(t,
         |      w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0) AS BIGINT)
         |      AS toks
         |  FROM toks),
         |c AS (SELECT doc_id, quality, toks,
         |    coalesce(sum(toks) OVER (ORDER BY -quality, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM q)
         |SELECT doc_id, quality, toks, CAST(cum AS BIGINT) AS cum
         |FROM c WHERE cum + toks <= $SelectBudget
         |ORDER BY -quality, doc_id""".stripMargin,
    "len_hist" ->
      s"""WITH h AS (SELECT n_chars // $HistBucket AS bucket,
         |    count(*) AS n_docs,
         |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |  FROM documents GROUP BY 1)
         |SELECT bucket, n_docs, sum_chars,
         |  CAST(sum(n_docs) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_docs
         |FROM h ORDER BY bucket""".stripMargin,
    "pii_scan" ->
      s"""WITH inj AS (SELECT doc_id, text ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' contact user'
         |      || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0 THEN ' call +1-555-'
         |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
         |    AS itext
         |  FROM documents),
         |red AS (SELECT doc_id, itext,
         |    regexp_replace(regexp_replace(itext,
         |      '$EmailRe', '[EMAIL]', 'g'), '$PhoneRe', '[PHONE]', 'g')
         |    AS rtext
         |  FROM inj)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(itext, '$EmailRe')) AS BIGINT)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all(itext, '$PhoneRe')) AS BIGINT)
         |    AS n_phones,
         |  ${sqlPolyHash("rtext")} AS red_fp
         |FROM red ORDER BY doc_id""".stripMargin,
    "gopher_filter" -> {
      val stops = TF.GopherStops.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH synth AS (SELECT doc_id, text ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' ########' ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0 THEN e'\\n- b1\\n- b2\\n- b3\\n- b4' ||
         |      e'\\n- b5\\n- b6\\n- b7\\n- b8\\n- b9\\n- b10' ELSE '' END ||
         |    CASE WHEN doc_id % 4 = 0
         |      THEN e'\\nto be continued...\\nwait…' ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0
         |      THEN ' 0 12 345 678 90 1 23 456' ELSE '' END AS tx
         |  FROM documents),
         |tk AS (SELECT doc_id, tx,
         |    CASE WHEN length(trim(tx)) = 0 THEN CAST([] AS VARCHAR[])
         |         ELSE string_split_regex(trim(tx), '\\s+') END AS t,
         |    string_split(tx, e'\\n') AS ls FROM synth),
         |c AS (SELECT doc_id,
         |    CAST(len(t) AS BIGINT) AS nw,
         |    CAST(length(regexp_replace(tx, '\\s', '', 'g')) AS BIGINT)
         |      AS nonws,
         |    CAST((length(tx) - length(regexp_replace(tx, '#', '', 'g')))
         |      + (length(tx) - length(regexp_replace(tx, '\\.\\.\\.', '',
         |          'g'))) // 3
         |      + (length(tx) - length(regexp_replace(tx, '…', '', 'g')))
         |      AS BIGINT) AS symbols,
         |    CAST(len(ls) AS BIGINT) AS nl,
         |    CAST(len(list_filter(ls, l -> starts_with(ltrim(l), '- ')
         |      OR starts_with(ltrim(l), '* ')
         |      OR starts_with(ltrim(l), '•'))) AS BIGINT) AS bullets,
         |    CAST(len(list_filter(ls, l -> ends_with(rtrim(l), '...')
         |      OR ends_with(rtrim(l), '…'))) AS BIGINT) AS ells,
         |    CAST(len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]')))
         |      AS BIGINT) AS alphaw,
         |    CAST(len(list_filter(t, w -> list_contains($stops, w)))
         |      AS BIGINT) AS stops
         |  FROM tk),
         |f AS (SELECT doc_id, nw AS n_words,
         |    CAST(nw BETWEEN $GopherMinWords AND $GopherMaxWords AS INT)
         |      AS wc_ok,
         |    CAST(nw > 0 AND nonws >= nw * 3 AND nonws <= nw * 10 AS INT)
         |      AS wordlen_ok,
         |    CAST(symbols * 10 <= nw AS INT) AS symbol_ok,
         |    CAST(bullets * 10 <= nl * 9 AS INT) AS bullet_ok,
         |    CAST(ells * 10 <= nl * 3 AS INT) AS ellipsis_ok,
         |    CAST(alphaw * 10 >= nw * 8 AS INT) AS alpha_ok,
         |    CAST(stops >= 2 AS INT) AS stop_ok
         |  FROM c)
         |SELECT doc_id, n_words, wc_ok, wordlen_ok, symbol_ok, bullet_ok,
         |  ellipsis_ok, alpha_ok, stop_ok,
         |  CAST(wc_ok * wordlen_ok * symbol_ok * bullet_ok * ellipsis_ok
         |    * alpha_ok * stop_ok AS INT) AS keep
         |FROM f ORDER BY doc_id""".stripMargin
    },
    "skew_join" ->
      s"""WITH e AS (SELECT user_id, event_type,
         |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
         |dim AS (SELECT DISTINCT event_type,
         |    CAST(length(event_type) % 5 + 1 AS BIGINT) AS weight FROM e)
         |SELECT user_id, count(*) AS n_events,
         |  CAST(sum(cents * weight) AS BIGINT) AS weighted_cents
         |FROM e JOIN dim USING (event_type)
         |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "compact_plan" ->
      s"""WITH c AS (SELECT doc_id, source,
         |    CAST(n_chars AS BIGINT) AS n_chars,
         |    CAST(coalesce(sum(CAST(n_chars AS BIGINT)) OVER (
         |      PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum
         |  FROM documents)
         |SELECT source, cum // $CompactTarget AS file_id,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY source, file_id
         |ORDER BY source, file_id""".stripMargin,
    "quality_auc" ->
      s"""WITH $sqlToks,
         |q AS (SELECT doc_id, $sqlQuality AS q FROM toks),
         |j AS (SELECT CASE WHEN d.lang = '$DsirLang' THEN 1 ELSE 0 END
         |    AS pos, q.q
         |  FROM documents d JOIN q ON d.doc_id = q.doc_id),
         |r AS (SELECT pos, 2 * rank() OVER (ORDER BY q)
         |    + count(*) OVER (PARTITION BY q) - 1 AS r2 FROM j),
         |a AS (SELECT CAST(sum(CASE WHEN pos = 1 THEN r2 END) AS BIGINT)
         |      AS r2pos,
         |    CAST(sum(pos) AS BIGINT) AS np,
         |    CAST(sum(1 - pos) AS BIGINT) AS nn FROM r)
         |SELECT np AS n_pos, nn AS n_neg,
         |  CAST(CASE WHEN np > 0 AND nn > 0
         |    THEN ((r2pos - np * (np + 1)) * 1000000) // (2 * np * nn)
         |    ELSE 500000 END AS BIGINT) AS auc_ppm
         |FROM a""".stripMargin,
    // the oracle may window freely: row_number + running positive
    // count over (q DESC, doc_id), precision ppm per positive
    "avg_precision" ->
      s"""WITH $sqlToks,
         |q AS (SELECT doc_id, $sqlQuality AS q FROM toks),
         |j AS (SELECT q.doc_id,
         |    CASE WHEN d.lang = '$DsirLang' THEN 1 ELSE 0 END AS pos, q.q
         |  FROM documents d JOIN q ON d.doc_id = q.doc_id),
         |r AS (SELECT pos,
         |    row_number() OVER (ORDER BY q DESC, doc_id) AS rk,
         |    sum(pos) OVER (ORDER BY q DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cp
         |  FROM j),
         |p AS (SELECT (1000000 * cp) // rk AS prec_ppm FROM r
         |  WHERE pos = 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_pos,
         |  CAST(sum(prec_ppm) AS BIGINT) AS sum_prec,
         |  CAST(CASE WHEN count(*) > 0 THEN sum(prec_ppm) // count(*)
         |    ELSE 0 END AS BIGINT) AS ap_ppm
         |FROM p""".stripMargin,
    "vocab_growth" ->
      s"""WITH $sqlToks,
         |sg AS (SELECT doc_id, unnest(CASE WHEN len(t) < 2
         |      THEN CAST([] AS VARCHAR[])
         |      ELSE list_transform(range(1, len(t)),
         |        i -> t[i] || ' ' || t[i + 1]) END) AS g
         |  FROM toks),
         |n AS (SELECT max(doc_id) + 1 AS n FROM documents),
         |f AS (SELECT g, min(doc_id) AS fd FROM sg GROUP BY g),
         |sl AS (SELECT (fd * 10) // n.n AS decile, count(*) AS c
         |  FROM f, n GROUP BY 1),
         |spine AS (SELECT unnest(range(0, 10)) AS decile),
         |filled AS (SELECT sp.decile,
         |    CAST(coalesce(sl.c, 0) AS BIGINT) AS n_new_bigrams
         |  FROM spine sp LEFT JOIN sl ON sp.decile = sl.decile)
         |SELECT decile, n_new_bigrams,
         |  CAST(sum(n_new_bigrams) OVER (ORDER BY decile) AS BIGINT)
         |    AS vocab_size
         |FROM filled ORDER BY decile""".stripMargin,
    // rank()/count() windows reproduce the doubled tie-averaged ranks;
    // aa·bb formed in doubles exactly as the engine does
    "rank_corr" ->
      s"""WITH $sqlToks,
         |qq AS (SELECT doc_id, $sqlQuality AS q FROM toks),
         |d AS (SELECT dd.doc_id, qq.q, dd.n_chars AS len
         |  FROM documents dd JOIN qq ON dd.doc_id = qq.doc_id),
         |r AS (SELECT doc_id,
         |    CAST(2 * rank() OVER (ORDER BY q)
         |      + count(*) OVER (PARTITION BY q) - 1 AS BIGINT) AS x,
         |    CAST(2 * rank() OVER (ORDER BY len)
         |      + count(*) OVER (PARTITION BY len) - 1 AS BIGINT) AS y
         |  FROM d),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy FROM r),
         |m AS (SELECT n, CAST(n * sxy - sx * sy AS BIGINT) AS num,
         |    CAST(n * sxx - sx * sx AS BIGINT) AS aa,
         |    CAST(n * syy - sy * sy AS BIGINT) AS bb FROM a)
         |SELECT n, round(CAST(num AS DOUBLE)
         |  / sqrt(CAST(aa AS DOUBLE) * CAST(bb AS DOUBLE)), 6) AS rho6
         |FROM m""".stripMargin,
    "gini_sources" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS x
        |  FROM documents GROUP BY source),
        |r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, source)
        |    AS BIGINT) AS i FROM c),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(i * x) AS BIGINT) AS six FROM r)
        |SELECT n AS n_sources, sx AS total_docs,
        |  CAST(2 * six - (n + 1) * sx AS BIGINT) AS gini_num,
        |  CAST(n * sx AS BIGINT) AS gini_den,
        |  round(CAST(2 * six - (n + 1) * sx AS DOUBLE) / (n * sx), 6)
        |    AS gini6
        |FROM a""".stripMargin,
    // rank() (= minrank over ties) reproduces the PrefixScan cum+1
    "calibration_bins" ->
      s"""WITH $sqlToks,
         |qq AS (SELECT doc_id, $sqlQuality AS q FROM toks),
         |j AS (SELECT d.doc_id,
         |    CASE WHEN d.lang = '$DsirLang' THEN 1 ELSE 0 END AS pos, qq.q
         |  FROM documents d JOIN qq ON d.doc_id = qq.doc_id),
         |r AS (SELECT pos, q,
         |    CAST(rank() OVER (ORDER BY q) AS BIGINT) AS minrank,
         |    CAST(count(*) OVER () AS BIGINT) AS nt FROM j),
         |b AS (SELECT ((minrank - 1) * 10) // nt AS bin, pos, q FROM r)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(pos) AS BIGINT) AS n_pos,
         |  min(q) AS min_q, max(q) AS max_q,
         |  CAST((CAST(sum(pos) AS BIGINT) * 1000000) // count(*) AS BIGINT)
         |    AS pos_ppm
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "doc_novelty" ->
      s"""WITH $sqlToks,
         |sg AS (SELECT doc_id, unnest(CASE WHEN len(t) < 2
         |      THEN CAST([] AS VARCHAR[])
         |      ELSE list_transform(range(1, len(t)),
         |        i -> t[i] || ' ' || t[i + 1]) END) AS g
         |  FROM toks),
         |f AS (SELECT g, min(doc_id) AS fd FROM sg GROUP BY g)
         |SELECT sg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(CASE WHEN f.fd = sg.doc_id THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_novel,
         |  CAST((CAST(sum(CASE WHEN f.fd = sg.doc_id THEN 1 ELSE 0 END)
         |    AS BIGINT) * 1000000) // count(*) AS BIGINT) AS novel_ppm
         |FROM sg JOIN f USING (g) GROUP BY sg.doc_id
         |ORDER BY sg.doc_id""".stripMargin,
    "robust_scale" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents),
        |med AS (SELECT source, n AS n_docs, n_chars AS med_chars FROM r
        |  WHERE rk = (n + 1) // 2),
        |dev AS (SELECT d.source, d.doc_id, m.n_docs, m.med_chars,
        |    abs(d.n_chars - m.med_chars) AS ad
        |  FROM documents d JOIN med m USING (source)),
        |r2 AS (SELECT source, n_docs, med_chars, ad,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY ad, doc_id) AS BIGINT) AS rk
        |  FROM dev)
        |SELECT source, n_docs, med_chars, ad AS mad_chars FROM r2
        |WHERE rk = (n_docs + 1) // 2 ORDER BY source""".stripMargin,
    // per-value parity counts, one window running sum over the value
    // domain (the oracle may window freely), argmax with (d desc, v)
    // tiebreak; every quantity integral until the single D division
    "ks_test" ->
      """WITH c AS (SELECT n_chars AS v,
        |    CAST(count(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS BIGINT)
        |      AS ca,
        |    CAST(count(CASE WHEN doc_id % 2 <> 0 THEN 1 END) AS BIGINT)
        |      AS cb
        |  FROM documents GROUP BY n_chars),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM c),
        |cum AS (SELECT c.v, t.na, t.nb,
        |    abs(CAST(sum(t.nb * c.ca - t.na * c.cb)
        |      OVER (ORDER BY c.v) AS BIGINT)) AS d_nm
        |  FROM c CROSS JOIN t)
        |SELECT na AS n_a, nb AS n_b, d_nm,
        |  round(CAST(d_nm AS DOUBLE) / (na * nb), 6) AS ks6,
        |  v AS at_value
        |FROM cum ORDER BY d_nm DESC, v LIMIT 1""".stripMargin,
    // same observed-cell domain; expected and chi² contribution are
    // the identical IEEE expression shapes, rounded 6dp per cell
    "chi2_test" ->
      """WITH d AS (SELECT lang, source FROM documents),
        |cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
        |  FROM d GROUP BY lang, source),
        |r AS (SELECT lang, CAST(count(*) AS BIGINT) AS rt FROM d
        |  GROUP BY lang),
        |c AS (SELECT source, CAST(count(*) AS BIGINT) AS ct FROM d
        |  GROUP BY source),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)
        |SELECT cells.lang, cells.source, obs, rt, ct, n.n,
        |  round(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |    / CAST(n.n AS DOUBLE), 6) AS exp6,
        |  round((CAST(obs AS DOUBLE) - CAST(rt AS DOUBLE)
        |      * CAST(ct AS DOUBLE) / CAST(n.n AS DOUBLE))
        |    * (CAST(obs AS DOUBLE) - CAST(rt AS DOUBLE)
        |      * CAST(ct AS DOUBLE) / CAST(n.n AS DOUBLE))
        |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |      / CAST(n.n AS DOUBLE)), 6) AS chi2_c6
        |FROM cells JOIN r USING (lang) JOIN c USING (source), n
        |ORDER BY lang, source""".stripMargin,
    "mutual_info" ->
      """WITH d AS (SELECT lang, source FROM documents),
        |cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_xy
        |  FROM d GROUP BY lang, source),
        |r AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_x FROM d
        |  GROUP BY lang),
        |c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_y FROM d
        |  GROUP BY source),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)
        |SELECT cells.lang, cells.source, n_xy,
        |  n_xy * 1000000 // n AS p_ppm,
        |  round(ln(CAST(n_xy * n AS DOUBLE)
        |    / CAST(n_x * n_y AS DOUBLE)), 6) AS pmi6
        |FROM cells JOIN r USING (lang) JOIN c USING (source), nn
        |ORDER BY lang, source""".stripMargin,
    "cube_counts" ->
      """SELECT coalesce(lang, '<all>') AS lang,
        |  coalesce(source, '<all>') AS source,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(GROUPING(lang) AS BIGINT) AS g_lang,
        |  CAST(GROUPING(source) AS BIGINT) AS g_source
        |FROM documents GROUP BY CUBE (lang, source)
        |ORDER BY g_lang, g_source, lang, source""".stripMargin,
    "quantile_norm" ->
      s"""WITH $sqlToks,
         |q AS (SELECT doc_id, $sqlQuality AS q FROM toks),
         |j AS (SELECT d.source, q.doc_id, q.q
         |  FROM documents d JOIN q ON d.doc_id = q.doc_id),
         |r AS (SELECT source, doc_id, q,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY q, doc_id) AS BIGINT) AS rk,
         |    count(*) OVER (PARTITION BY source) AS ns FROM j),
         |p AS (SELECT source, doc_id,
         |    CASE WHEN ns > 1 THEN ((rk - 1) * 1000000) // (ns - 1)
         |      ELSE 0 END AS pct_ppm FROM r),
         |g AS (SELECT q AS gq,
         |    CAST(row_number() OVER (ORDER BY q, doc_id) - 1 AS BIGINT)
         |      AS grank FROM j),
         |nt AS (SELECT count(*) AS nt FROM j)
         |SELECT p.doc_id, p.source,
         |  CAST(p.pct_ppm AS BIGINT) AS pct_ppm, g.gq AS norm_q
         |FROM p CROSS JOIN nt
         |JOIN g ON g.grank = (p.pct_ppm * (nt.nt - 1)) // 1000000
         |ORDER BY p.doc_id""".stripMargin,
    "dsir_weights" ->
      s"""WITH toks AS (SELECT doc_id, lang,
         |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |      ELSE string_split_regex(trim(text), '\\s+') END AS t
         |  FROM documents),
         |tk AS (SELECT doc_id, lang, (${sqlPolyHash("w")}) % $DsirB AS b
         |  FROM toks, unnest(t) AS u(w)),
         |cs AS (SELECT b, count(*) AS cs FROM tk GROUP BY b),
         |ct AS (SELECT b, count(*) AS ct FROM tk
         |  WHERE lang = '$DsirLang' GROUP BY b),
         |wt AS (SELECT cs.b,
         |    CAST((length(bin(coalesce(ct.ct, 0) + 1)) - 1)
         |      - (length(bin(cs.cs + 1)) - 1) AS BIGINT) AS wt
         |  FROM cs LEFT JOIN ct ON cs.b = ct.b),
         |db AS (SELECT doc_id, b, count(*) AS c FROM tk
         |  GROUP BY doc_id, b),
         |sc AS (SELECT db.doc_id,
         |    CAST(sum(db.c * wt.wt) AS BIGINT) AS score_bits,
         |    CAST(sum(db.c) AS BIGINT) AS n_tokens
         |  FROM db JOIN wt ON db.b = wt.b GROUP BY db.doc_id)
         |SELECT sc.doc_id, d.lang, sc.n_tokens, sc.score_bits,
         |  round(CAST(sc.score_bits * 1000 AS DOUBLE) / sc.n_tokens, 6)
         |    AS bits_per_kt
         |FROM sc JOIN documents d ON d.doc_id = sc.doc_id
         |ORDER BY bits_per_kt DESC, sc.doc_id LIMIT $DsirTopN""".stripMargin,
    "hll_distinct" -> {
      // the same exact-integer rho chain the engine builds, highest bit
      // first (rho = 1 + leading zeros of the 24-bit remainder)
      val rhoCase = (HllBits - 1 to 0 by -1)
        .map(b => s"WHEN w24 >= ${1L << b} THEN ${HllBits - b}")
        .mkString("CASE ", " ", s" ELSE ${HllBits + 1} END")
      s"""WITH tok AS (SELECT DISTINCT source, t2.w AS w
         |  FROM (SELECT source, CASE WHEN length(trim(text)) = 0
         |      THEN CAST([] AS VARCHAR[])
         |      ELSE string_split_regex(trim(text), '\\s+') END AS t
         |    FROM documents) d, unnest(d.t) AS t2(w)),
         |h AS (SELECT source, ${sqlPolyHash("w")} AS h FROM tok),
         |b AS (SELECT source, h % $HllM AS bucket, h // $HllM AS w24
         |  FROM h),
         |r AS (SELECT source, bucket,
         |    CAST(max($rhoCase) AS BIGINT) AS m FROM b GROUP BY 1, 2),
         |a AS (SELECT source, count(*) AS nb,
         |    CAST(sum(m) AS BIGINT) AS reg_sum,
         |    CAST(max(m) AS BIGINT) AS reg_max,
         |    sum(1.0 / CAST(CAST(1 AS BIGINT) << m AS DOUBLE)) AS s2
         |  FROM r GROUP BY 1),
         |n AS (SELECT source, count(*) AS n_exact FROM tok GROUP BY 1)
         |SELECT a.source, n.n_exact,
         |  CAST($HllM - a.nb AS BIGINT) AS v_zero, a.reg_sum, a.reg_max,
         |  round(0.709 * ${HllM * HllM}.0
         |    / (a.s2 + CAST($HllM - a.nb AS DOUBLE)), 6) AS raw_est
         |FROM a JOIN n USING (source) ORDER BY a.source""".stripMargin
    })
}
