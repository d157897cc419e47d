package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for training-data pipelines, all pure Column
  * expressions (codegen-able, no UDFs) with exact DuckDB-SQL counterparts
  * so every operator built on them is value-level oracle-checkable.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text; empty text → empty array. */
  def tokens(t: Column): Column =
    when(length(trim(t)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(t), "\\s+"))

  /** Whitespace-token count (the standard LLM-corpus budget unit's cheap
    * proxy; a BPE-ish variant is [[bpeTokenCount]]). */
  def tokenCount(t: Column): Column = size(tokens(t))

  /** BPE-ish subword count: ceil(len/4) pieces per whitespace token — a
    * deterministic approximation of byte-pair tokenizers' ~4 chars/token
    * average, SQL-mirrorable (no lookaround regex, which RE2 lacks). */
  def bpeTokenCount(t: Column): Column =
    coalesce(aggregate(tokens(t), lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("long")), lit(0L))

  /** Character n-gram shingles (positions 1..len-n+1); shorter text → []. */
  def charShingles(t: Column, n: Int): Column =
    when(length(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(t) - (n - 1)),
        i => substring(t, i, lit(n))))

  /** Word n-gram shingles over whitespace tokens, space-joined. Built by
    * zipping the token array with its shifted slices (NOT by indexing
    * from inside a transform lambda: `element_at(tk, i)` on a DERIVED
    * array re-evaluates the whole token split per element in interpreted
    * HOF eval — O(m·len) per row; the slice-zip form evaluates the split
    * O(n) times per row). */
  def wordShingles(t: Column, n: Int): Column = {
    val tk = tokens(t)
    val len = greatest(size(tk) - (n - 1), lit(0))
    (2 to n).foldLeft(slice(tk, lit(1), len)) { (acc, k) =>
      zip_with(acc, slice(tk, lit(k), len),
        (a, b) => concat(a, lit(" "), b))
    }
  }

  /** Punctuation character ratio. */
  def punctRatio(t: Column): Column =
    ((length(t) - length(regexp_replace(t, "[.,;:!?'\"()\\[\\]{}]", ""))).cast("double")
      / greatest(length(t), lit(1)))

  /** Ratio of tokens found in `stopwords` (multiset: every occurrence
    * counts, unlike an array_intersect). */
  def stopwordRatio(t: Column, stopwords: Seq[String]): Column = {
    val tk = tokens(t)
    val sw = array(stopwords.map(lit(_)): _*)
    (size(filter(tk, w => array_contains(sw, w))).cast("double")
      / greatest(size(tk), lit(1)))
  }

  /** Mean token length (non-whitespace chars / tokens). */
  def avgWordLen(t: Column): Column =
    (length(regexp_replace(t, "\\s", "")).cast("double")
      / greatest(tokenCount(t), lit(1)))

  /** English stopwords used by [[qualityScore]]; kept tiny and literal so
    * the oracle SQL can inline the identical list. */
  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this")

  /** Composite document quality score in [0,1]: length saturation,
    * punctuation sanity, stopword presence, word-length sanity — the
    * standard cheap heuristics of corpus filtering (C4/Gopher-style),
    * deterministic and SQL-mirrorable.
    */
  def qualityScore(t: Column): Column = {
    val lenScore = least(tokenCount(t).cast("double") / 50.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(t) * 5.0, lit(1.0))
    val swScore = least(stopwordRatio(t, EnStopwords) * 5.0, lit(1.0))
    val wl = avgWordLen(t)
    val wlScore = when(wl.between(3.0, 10.0), 1.0).otherwise(0.0)
    round(lenScore * 0.25 + punctScore * 0.25 + swScore * 0.25 + wlScore * 0.25, 6)
  }

  /** Per-language stopword marker lists for [[langId]]. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "en", "que", "de", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "en", "que", "de", "pour", "dans"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"))

  /** N-gram-heuristic language id: the language whose marker-token hit
    * count is highest wins (ties → alphabetically first; no hits → "und").
    *
    * Single argmin pass: hit counts are doubled so a (-1, "und") sentinel
    * sits strictly between "no hits" (neg = 0) and "any hit" (neg ≤ -2) —
    * the fallback rides the same array_min instead of a `when(best…)`
    * wrapper that would reference (and after predicate pushdown, re-inline
    * and re-evaluate) the whole scoring tree twice per occurrence. */
  def langId(t: Column): Column = {
    val tk = tokens(t)
    val scored = LangMarkers.map { case (lang, words) =>
      val sw = array(words.map(lit(_)): _*)
      struct((-size(filter(tk, w => array_contains(sw, w))) * 2).as("neg"),
        lit(lang).as("lang"))
    }
    val sentinel = struct(lit(-1).as("neg"), lit("und").as("lang"))
    array_min(array((scored :+ sentinel): _*)).getField("lang")
  }

  /** Document fingerprint = [[PolyHash]] of the normalized text
    * (lowercased, whitespace collapsed). */
  def fingerprint(t: Column): Column =
    PolyHash.poly_hash(regexp_replace(lower(trim(t)), "\\s+", " "))

  /** C4-style intra-document line dedup: drop every repeat of a line,
    * keeping first occurrences in order (`array_distinct` preserves
    * first-occurrence order). A pure projection — the per-doc transform
    * needs no shuffle at any corpus size. Boilerplate lines (headers,
    * cookie banners) are the usual casualty. */
  def dedupLines(t: Column): Column =
    array_join(array_distinct(split(t, "\n")), "\n")

  /** Byte-level Jaro-Winkler similarity (Winkler 1990), codegen and
    * arithmetic-identical to DuckDB's `jaro_winkler_similarity` — see
    * [[graft.functions.TextKernels.jaroWinkler]] for the pinned
    * semantics (byte alphabet, 0.7 boost threshold, 4-byte prefix cap,
    * both-empty → 0). */
  def jaroWinkler(a: Column, b: Column): Column = TextKernels.jaro_winkler(a, b)

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD'03 — public literature): over the ORDERED sequence of
    * word-`n`-gram shingle hashes h_0..h_{m-1}, every length-`w` window
    * contributes its minimum hash (rightmost position on ties — the
    * paper's §4 tie rule), and the distinct selected (hash, position)
    * occurrences are the document's fingerprints. Any shared run of
    * w + n - 1 tokens is guaranteed a shared fingerprint, while the
    * stored set shrinks to a ~2/(w+1) fraction of all shingles — the
    * storage/recall dial MOSS-style local plagiarism/overlap detection
    * runs on.
    *
    * Winnowing is by construction document-local, and so is the plan:
    * one pure projection, zero shuffle at any corpus size. Selection is
    * branch-free — min over enc = h·2^20 + (2^20-1-pos), so min(enc) ==
    * (min hash, rightmost pos) — keeping both the O(m·w) scan and its
    * DuckDB window-min mirror in exact BIGINT arithmetic (h < 1e9+7,
    * pos < 2^20; a shard is chunked long before a million shingles).
    * Sequences shorter than one window contribute their overall
    * rightmost-min as the single fingerprint; empty sequences none.
    *
    * @return ascending distinct encoded fingerprints; decode
    *         h = enc div 2^20, pos = 2^20-1 - (enc mod 2^20). */
  def winnowedFingerprints(t: Column, n: Int, w: Int): Column =
    TextKernels.winnow_fingerprints(t, n, w)

  /** The declarative HOF form of [[winnowedFingerprints]], kept as the
    * kernel's bit-equality cross-check (TextDedupSpec), NOT the runtime
    * path: HOF lambdas are interpreted and Catalyst inlines every
    * reference to a derived array, so even this slice-zip formulation
    * (which already avoids the O(m·w) per-element re-evaluation the
    * naive index form pays) re-runs the tokenize→shingle→hash chain
    * O(w) times per document through subtrees that never reach codegen
    * — measured ~9 ms per 300-char document vs the kernel's one fused
    * pass. */
  private[graft] def winnowedFingerprintsHof(t: Column, n: Int, w: Int): Column = {
    val hs = transform(wordShingles(t, n), s => PolyHash.poly_hash(s))
    val encs = zip_with(hs, sequence(lit(0), greatest(size(hs), lit(1)) - 1),
      (h, j) => h * lit(1048576L) + (lit(1048575L) - j))
    // shingle count from the cheap token split, not from `encs`
    val m = greatest(size(tokens(t)) - (n - 1), lit(0))
    val nWin = greatest(m - (w - 1), lit(0))
    val full = (2 to w).foldLeft(slice(encs, lit(1), nWin)) { (acc, k) =>
      zip_with(acc, slice(encs, lit(k), nWin), (a, b) => least(a, b))
    }
    val short = array(aggregate(encs, lit(Long.MaxValue), (acc, e) => least(acc, e)))
    when(m === 0, array().cast("array<bigint>"))
      .when(m < w, short)
      .otherwise(array_sort(array_distinct(full)))
  }

  /** Skip-gram (center, context) pair extraction (word2vec-style,
    * Mikolov et al. 2013 — public literature): every ordered token pair
    * within `window` positions of each other, both directions, the raw
    * material of embedding-training corpora and co-occurrence counts.
    * Pure projection + later explode — generation is zero-shuffle at any
    * corpus size; counting is one map-side-combined groupBy downstream. */
  def skipgramPairs(t: Column, window: Int): Column = {
    // Same slice-zip discipline as [[winnowedFingerprints]]: pairs at
    // offset d are the token array zipped with its d-shifted self (both
    // directions), so the token split evaluates O(window) times per
    // document instead of once per generated pair.
    val tk = tokens(t)
    val m = size(tk)
    val legs = (1 to window).flatMap { d =>
      val len = greatest(m - d, lit(0))
      Seq(
        zip_with(slice(tk, lit(1), len), slice(tk, lit(1 + d), len),
          (a, b) => struct(a.as("center"), b.as("context"))),
        zip_with(slice(tk, lit(1 + d), len), slice(tk, lit(1), len),
          (a, b) => struct(a.as("center"), b.as("context"))))
    }
    concat(legs: _*)
  }

  /** Hashed linear classifier logit — the fasttext-shaped scoring pass
    * (Joulin et al. 2016) every production corpus pipeline runs for
    * quality/language/domain classification, reduced to its Spark-native
    * essence: tokens hash into `dim` feature buckets ([[PolyHash]] mod
    * dim — the hashing trick, so the model is a fixed-width vector
    * regardless of vocabulary) and the document logit is the sum of its
    * occurrences' bucket weights. A pure per-row `aggregate` over the
    * token array: ZERO shuffle at any corpus size, fully codegen'd —
    * the ideal 100 TB scoring shape (score rides along a scan).
    *
    * Weights here are a deterministic integer hash of the bucket id
    * (Knuth multiplicative mix → [-1000, 1000]), which keeps the gate
    * value-level oracle-checkable; a TRAINED model ships the same way —
    * swap the weight expression for `element_at(lit(weights), bucket+1)`
    * with the learned vector as a broadcast literal array, everything
    * else identical. */
  def hashedLinearLogit(t: Column, dim: Int): Column =
    aggregate(tokens(t), lit(0L), (acc, w) =>
      acc + ((PolyHash.poly_hash(w) % dim) * 2654435761L % 2001L - 1000L))

  /** Stopword floor list for [[gopherFlags]] (Rae et al. 2021 use a
    * similar tiny closed-class list); literal so oracles can inline it. */
  val GopherStops: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /** Gopher-style rule-based document filter flags (Rae et al. 2021
    * §A1.1): word-count bounds, mean-word-length sanity (3-10 chars),
    * symbol-to-word ratio ('#' chars + '...' + '…' ellipses, ≤ 0.1),
    * bullet-line fraction (≤ 90%), ellipsis-line fraction (≤ 30%),
    * alphabetic-word fraction (≥ 80%), and a ≥2-stopword floor.
    *
    * Returns a struct (n_words, wc_ok, wordlen_ok, symbol_ok, bullet_ok,
    * ellipsis_ok, alpha_ok, stop_ok, keep) with int 0/1 flags. Every rule
    * is an integer cross-multiplication — no floating point anywhere, so
    * results hash exactly across engines. Pure projection: zero shuffle
    * at any corpus size. */
  def gopherFlags(t: Column, minWords: Int, maxWords: Int): Column = {
    val tk = tokens(t)
    val ls = split(t, "\n")
    val nw = size(tk).cast("long")
    val nonws = length(regexp_replace(t, "\\s", "")).cast("long")
    val symbols =
      ((length(t) - length(regexp_replace(t, "#", ""))) +
        ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3) +
        (length(t) - length(regexp_replace(t, "…", "")))).cast("long")
    val nl = size(ls).cast("long")
    val bullets = size(filter(ls, l => ltrim(l).startsWith("- ") ||
      ltrim(l).startsWith("* ") || ltrim(l).startsWith("•"))).cast("long")
    val ells = size(filter(ls, l => rtrim(l).endsWith("...") ||
      rtrim(l).endsWith("…"))).cast("long")
    val alphaw = size(filter(tk, w => w.rlike("[A-Za-z]"))).cast("long")
    val sw = array(GopherStops.map(lit(_)): _*)
    val stops = size(filter(tk, w => array_contains(sw, w))).cast("long")
    val wcOk = nw.between(minWords, maxWords).cast("int")
    val wordlenOk = (nw > 0 && nonws >= nw * 3 && nonws <= nw * 10).cast("int")
    val symbolOk = (symbols * 10 <= nw).cast("int")
    val bulletOk = (bullets * 10 <= nl * 9).cast("int")
    val ellipsisOk = (ells * 10 <= nl * 3).cast("int")
    val alphaOk = (alphaw * 10 >= nw * 8).cast("int")
    val stopOk = (stops >= 2).cast("int")
    struct(nw.as("n_words"), wcOk.as("wc_ok"), wordlenOk.as("wordlen_ok"),
      symbolOk.as("symbol_ok"), bulletOk.as("bullet_ok"),
      ellipsisOk.as("ellipsis_ok"), alphaOk.as("alpha_ok"),
      stopOk.as("stop_ok"),
      (wcOk * wordlenOk * symbolOk * bulletOk * ellipsisOk * alphaOk *
        stopOk).cast("int").as("keep"))
  }
}
