package graft.operators

import graft.functions.{Distances, PolyHash, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large text/embedding corpora.
  *
  * Scale design: every variant is a *candidate-generation equi-join*
  * (group-by key, inverted index, LSH bucket, or bit-band) followed by an
  * exact verify filter — never an O(n²) comparison. At 100 TB each join
  * shuffles by its candidate key, so work is bounded by bucket population,
  * and AQE's skew handling covers hot buckets (e.g. an empty-string key).
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact duplicates by full-text equality: per text, the surviving
    * (minimum) id and the duplicate count. A hash-groupBy with map-side
    * partial aggregation — the canonical first pass of corpus dedup. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Corpus-level boilerplate-line removal (the RefinedWeb/Falcon
    * curation pass): any line appearing in more than `maxDocs` DISTINCT
    * documents (headers, nav bars, cookie banners) is stripped from every
    * document; surviving lines keep their in-document order. Returns
    * (id, text) with cleaned text — a fully-stripped document becomes "".
    *
    * Scale shape: lines explode to (id, pos, line) rows; the hot-line set
    * is a line-keyed groupBy (countDistinct = two partial-aggregable
    * levels), removal is a left-anti equi-join on the line, and
    * reassembly is one groupBy on the doc id with an in-group sort by
    * position — every shuffle is keyed, nothing is quadratic, and the
    * intra-doc counterpart ([[TextFunctions.dedupLines]]) stays a pure
    * projection. */
  def stripBoilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                            maxDocs: Int): DataFrame = {
    val lines = docs.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val hot = lines.groupBy("line")
      .agg(countDistinct("id").as("nd"))
      .where(col("nd") > maxDocs)
      .select(col("line").as("hline"))
    val kept = lines.join(hot, lines("line") === col("hline"), "left_anti")
      .groupBy("id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as("text"))
    docs.select(col(idCol).as("id"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), coalesce(col("text"), lit("")).as("text"))
  }

  // ------------------------------------------------- exact-substring spans

  /** Duplicated-span detection — the exact-substring dedup of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better" (ACL'22),
    * at token-n-gram resolution: every length-`n` token window whose
    * exact text occurs ≥ 2 times across the corpus marks its positions,
    * and per document the marked windows merge into maximal duplicated
    * spans. With `keepFirst` (the paper's semantics) the corpus-wide
    * first occurrence of each duplicated n-gram — minimum (doc, position)
    * — is exempt, so one copy of every repeated passage survives.
    *
    * Returns (id, span_start, span_end): 0-based token offsets, end
    * exclusive, ordered within each doc. Feed to a slicer to cut the
    * spans out, or aggregate for duplication-rate stats.
    *
    * Scale shape: the suffix-array the paper builds is a single-machine
    * structure; the distributed equivalent is this n-gram inventory —
    * positions posexplode to (doc, pos, hash) rows, duplicated hashes are
    * a hash-keyed groupBy (map-side combined, Zipf-hot n-grams bounded
    * per partition before the merge), the first-occurrence exemption a
    * min-struct agg on the same key (NO per-key window), marking a keyed
    * semi/inner join, and span merging a per-doc window whose partition
    * is one document's hits. Nothing is quadratic; nothing collects. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, keepFirst: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = when(length(trim(col(textCol))) === 0,
        array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    // (id, p, h): PolyHash of the n-gram starting at 0-based token p
    val occ = docs
      .select(col(idCol).as("id"), toks.as("t"))
      .where(size(col("t")) >= n)
      .select(col("id"), posexplode(
        transform(sequence(lit(0), size(col("t")) - n),
          p => PolyHash.poly_hash(
            concat_ws(" ", slice(col("t"), p + 1, lit(n)))))))
      .select(col("id"), col("pos").as("p"), col("col").as("h"))
    val dupAgg = occ.groupBy("h").agg(
      count(lit(1)).as("n_occ"),
      min(struct(col("id"), col("p"))).as("first"))
      .where(col("n_occ") >= 2)
    val hits =
      if (keepFirst)
        occ.join(dupAgg, Seq("h"))
          .where(!(col("id") === col("first.id") && col("p") === col("first.p")))
          .select(col("id"), col("p"))
      else occ.join(dupAgg, Seq("h"), "left_semi").select(col("id"), col("p"))
    // gaps-and-islands: a hit starts a new span iff no earlier hit's
    // window [p', p'+n) reaches it
    val w = Window.partitionBy("id").orderBy("p")
    val withIsland = hits
      .withColumn("pme", max(col("p") + n)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("isl", sum(
        when(col("pme").isNull || col("p") >= col("pme"), 1).otherwise(0))
        .over(w))
    withIsland.groupBy("id", "isl")
      .agg(min("p").as("span_start"), (max("p") + n).as("span_end"))
      .select(col("id"), col("span_start").cast("int"),
        col("span_end").cast("int"))
  }

  /** Apply [[duplicatedSpans]]: rebuild every document from the tokens
    * OUTSIDE its duplicated spans (single-space joined — tokenization is
    * whitespace-normalizing by construction). A fully-duplicated document
    * becomes ""; the keep-first exemption means one copy of every
    * repeated passage survives corpus-wide.
    *
    * One groupBy collapses each doc's spans to an interval array (tiny:
    * spans are maximal, disjoint), one keyed join attaches it, and the
    * cut itself is a pure projection — no token-level explode. */
  def stripDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame = {
    val spans = duplicatedSpans(docs, idCol, textCol, n)
      .groupBy("id")
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("spans"))
    val toks = when(length(trim(col(textCol))) === 0,
        array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    docs.select(col(idCol).as("id"), toks.as("t"))
      .join(spans, Seq("id"), "left")
      .select(col("id"), when(size(col("t")) === 0, lit("")).otherwise(
        array_join(
          transform(
            filter(
              zip_with(col("t"), sequence(lit(0), size(col("t")) - 1),
                (tok, i) => struct(tok.as("tok"), i.as("i"))),
              x => !exists(coalesce(col("spans"),
                array().cast("array<struct<s:int,e:int>>")),
                sp => x.getField("i") >= sp.getField("s") &&
                  x.getField("i") < sp.getField("e"))),
            x => x.getField("tok")), " ")).as("text"))
  }

  /** MOSS-style local-overlap pairs over winnowed fingerprints
    * (Schleimer et al. SIGMOD'03 §5 — the architecture of the MOSS
    * plagiarism detector): documents sharing at least `minShared`
    * DISTINCT winnowed fingerprint hashes
    * ([[graft.functions.TextFunctions.winnowedFingerprints]]). Winnowing
    * guarantees any shared token run of w+n-1 tokens leaves a shared
    * fingerprint, so local copying is caught while the index holds only
    * a ~2/(w+1) sample of the shingles — the storage economics that let
    * MOSS index the world's CS assignments.
    *
    * Scale shape: fingerprint extraction is the zero-shuffle projection;
    * the pair count is an inverted-index equi-join on the SAMPLED hash
    * stream + one map-side-combined pair groupBy. Join output is
    * quadratic in hot-fingerprint frequency — a boilerplate line that
    * survives winnowing pairs every copy — so, exactly as the paper's
    * deployment notes prescribe, fingerprints appearing in more than
    * `maxDf` documents are dropped from the index before the join
    * (they are corpus-wide boilerplate, not evidence of copying; MOSS
    * ignores over-common fingerprints for the same reason). The bound is
    * load-bearing: on this deliberately tiny-vocabulary synthetic corpus
    * the uncapped join's output grows ~93× from sf0.01 to sf0.1 (20.6M
    * candidate rows, 67 s) while the capped one stays linear-ish (115k,
    * sub-second) — and a Zipfian real corpus behaves like the capped
    * case to begin with. */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
                  n: Int, w: Int, minShared: Long,
                  maxDf: Long = 50L): DataFrame = {
    // materialized once — it feeds the df aggregation and both sides of
    // the pair join (same discipline as [[jaccardPairsImpl]]'s sets)
    val sel = docs.select(col(idCol).as("id"),
        explode(graft.functions.TextFunctions
          .winnowedFingerprints(col(textCol), n, w)).as("enc"))
      .select(col("id"), shiftright(col("enc"), 20).as("h"))
      .distinct()
      .localCheckpoint()
    val rare = sel.join(
      sel.groupBy("h").agg(count(lit(1)).as("df"))
        .where(col("df") <= maxDf).select("h"), "h")
    rare.as("a").join(rare.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  // ------------------------------------------------------- n-gram Jaccard

  /** Distinct word-`n`-gram shingle set per doc: (id, shingle). */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(array_distinct(TextFunctions.wordShingles(col(textCol), n))).as("sh"))

  /** Distinct shingle-hash set per doc (id, h) via the fused native kernel
    * — the scale path: an 8-byte join key instead of a string, one pass
    * over the text instead of a 4-deep HOF tree. Distinctness is on the
    * HASH (collisions collapse), mirrored identically in the SQL oracle. */
  def shingleHashIndex(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(graft.functions.TextKernels.shingle_hashes(col(textCol), lit(n))).as("h"))

  /** The per-doc shingle-set table every PPJoin-style candidate join
    * verifies against: (id, byRarity, sh, nsh) with `byRarity` ordered by
    * ascending global (df, hash) — the prefix-filter order — and `sh`
    * hash-ascending — the merge-intersect order. One narrow extraction,
    * one df aggregation, one 1:N join back. [[jaccardPairs]] and
    * [[containmentPairs]] both consume it; a session computing several
    * pair surfaces over one corpus should build (and checkpoint) it once
    * and pass it to each via their `setsOpt`. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame = {
    val sh = shingleHashIndex(docs, idCol, textCol, n)
    val df = sh.groupBy("h").agg(count(lit(1)).as("df"))
    sh.join(df, "h")
      .groupBy("id")
      .agg(transform(sort_array(collect_list(struct(col("df"), col("h")))),
        s => s.getField("h")).as("byRarity"))
      .select(col("id"), col("byRarity"),
        sort_array(col("byRarity")).as("sh"),
        size(col("byRarity")).as("nsh"))
  }

  /** Benchmark decontamination: corpus documents sharing at least
    * `minShared` distinct word-`n`-gram shingle hashes with an evaluation
    * set, with the overlap count (the pipeline step that excludes
    * eval-set leakage from training data — an OVERLAP test against a
    * small fixed set, not the all-pairs problem [[jaccardPairs]] solves).
    *
    * Scale shape: the eval side is tiny by nature (a benchmark), so its
    * distinct hash set broadcasts; the corpus side is one narrow
    * projection → hash semi-join → partial-aggregated count, no shuffle
    * of text and no corpus self-join anywhere. */
  def contamination(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                    textCol: String, n: Int, minShared: Long = 1L): DataFrame = {
    val corpus = shingleHashIndex(docs, idCol, textCol, n)
    val evals = shingleHashIndex(evalDocs, idCol, textCol, n)
      .select(col("h")).distinct()
    corpus.join(broadcast(evals), "h")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Span-level contamination FRACTION per document — the thresholdable
    * form of [[contamination]] (Lee et al. "Deduplicating Training Data
    * Makes Language Models Better", ACL'22 report overlap fractions, not
    * just hit counts): for EVERY corpus document, the share of its
    * distinct word-`n`-gram shingle hashes that appear anywhere in the
    * eval set. Unlike [[contamination]] (which emits only contaminated
    * docs), zero-overlap and shingle-less documents are kept with
    * fraction 0 so the output joins 1:1 against the corpus for filtering.
    *
    * Scale shape: same as [[contamination]] — the eval hash set
    * broadcasts, the per-doc totals and overlap counts come from ONE
    * doc-keyed aggregation over the semi-annotated shingle stream (a left
    * broadcast join marks hits; no second corpus pass, no self-join). */
  def contaminationStats(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                         textCol: String, n: Int): DataFrame = {
    val corpus = shingleHashIndex(docs, idCol, textCol, n)
    val evals = shingleHashIndex(evalDocs, idCol, textCol, n)
      .select(col("h")).distinct()
    val agg = corpus
      .join(broadcast(evals.withColumn("hit", lit(1L))), Seq("h"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum("hit"), lit(0L)).as("n_shared"))
    docs.select(col(idCol).as("id"))
      .join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(coalesce(col("n_shingles"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("n_shared").cast("double") / col("n_shingles"), 6))
          .as("contam_frac"))
  }

  /** Near-duplicate pairs with exact n-gram Jaccard >= tau, via
    * document-frequency-ordered PREFIX FILTERING (PPJoin-style, Bayardo et
    * al. "Scaling Up All Pairs Similarity Search", WWW'07 — public
    * literature, not the reference):
    *
    * J(A,B) >= tau implies |A∩B| >= ceil(tau·max(|A|,|B|)), so with any
    * consistent global token order the two prefixes of length
    * |x| - ceil(tau·|x|) + 1 must intersect. Ordering tokens by ascending
    * global document frequency (ties by hash) puts the RAREST shingles in
    * the prefixes — the stop-word-grade shingle that pairs every document
    * lands in almost no prefix, which kills the hot-key join-output skew
    * that an unfiltered inverted index suffers (its straggler task is the
    * first thing to break at corpus scale). The candidate equi-join on
    * prefix tokens also carries a size-compatibility predicate
    * (tau·|B| <= |A| <= |B|/tau); survivors are verified exactly against
    * the full precomputed shingle sets. Exact by construction — no recall
    * knob. [[jaccardPairsIndex]] keeps the plain inverted-index form as
    * the spec cross-check.
    *
    * Pruning power scales with vocabulary rarity: real corpora are
    * Zipfian (most shingles near-singleton), so prefixes are near-unique
    * and candidates stay close to the true pair count. The synthetic test
    * corpus is the adversarial opposite (~1k distinct shingles, median
    * df in the hundreds, no rare tokens), where ~n² of the pairs
    * genuinely share prefix tokens — exact Jaccard then degrades toward
    * all-pairs for ANY index scheme, which is why the verify step uses
    * the native merge-intersect kernel rather than per-pair hash sets. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, tau: Double,
                   setsOpt: Option[DataFrame] = None): DataFrame =
    jaccardPairsImpl(docs, idCol, textCol, n, tau, skipSides = None,
      setsOpt = setsOpt)

  /** DIRECTED containment pairs: C(a→b) = |A∩B| / |A| >= tau over the
    * distinct word-`n`-gram shingle-hash sets — the asymmetric near-dup
    * test Jaccard misses. A short document quoted wholesale inside a much
    * longer one has J ≈ |A|/|B| ≈ 0 but C(a→b) = 1; corpus pipelines run
    * this to drop subsumed fragments (quote pages, excerpt mirrors)
    * whose symmetric similarity never crosses a dedup threshold.
    *
    * Candidate generation adapts [[jaccardPairs]]'s rarity-ordered prefix
    * filter to the asymmetric bound (set-containment join literature,
    * e.g. Melnik & Garcia-Molina TODS'03; the prefix lemma of Bayardo et
    * al. WWW'07): |A∩B| >= ceil(tau·|A|) forces a shared shingle among
    * A's first |A| - ceil(tau·|A|) + 1 RAREST shingles, while the B side
    * admits any superset, so it contributes its FULL inverted index —
    * with the size necessity |B| >= tau·|A| riding inside the join.
    * Rarity-first prefixes keep hot-token join output near-linear on
    * Zipfian corpora for exactly the reason documented on
    * [[jaccardPairs]]; survivors verify exactly against the precomputed
    * sorted sets via the native merge-intersect kernel, so the result is
    * exact with no recall knob. Output: (id_a, id_b, containment) with
    * id_a ≠ id_b, DIRECTED (a's set is tau-contained in b's). */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, tau: Double,
                       setsOpt: Option[DataFrame] = None): DataFrame = {
    val sets = setsOpt.getOrElse(
      shingleSets(docs, idCol, textCol, n).localCheckpoint())
    val prefix = sets.select(col("id"), col("nsh"),
      explode(slice(col("byRarity"), lit(1),
        (col("nsh") - ceil(col("nsh") * tau) + 1).cast("int"))).as("h"))
    val index = sets.select(col("id"), col("nsh"), explode(col("byRarity")).as("h"))
    val cand = prefix.as("a").join(index.as("b"),
        col("a.h") === col("b.h") && col("a.id") =!= col("b.id")
          && col("b.nsh") >= col("a.nsh") * tau)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.nsh").as("na"))
      .distinct()
    val setArr = sets.select(col("id"), col("sh"))
    val inter = graft.functions.VecKernels
      .sorted_intersect_count(col("sh_a"), col("sh_b"))
    cand
      .join(setArr.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(setArr.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("containment", round(inter.cast("double") / col("na"), 6))
      .where(col("containment") >= tau)
      .select("id_a", "id_b", "containment")
  }

  /** Incremental near-dup detection — the daily-ingest shape: exact
    * Jaccard >= tau pairs where AT LEAST ONE side is a new document
    * (new-vs-corpus and new-vs-new), skipping corpus-vs-corpus pairs the
    * previous run already resolved. Same PPJoin prefix discipline and
    * exact verify as [[jaccardPairs]] over the union (document
    * frequencies are computed across both sides, so the rarity order —
    * and therefore pruning power — reflects the full collection); the
    * old-old exclusion rides INSIDE the candidate join, so skipped pairs
    * never generate join output. At scale the corpus side's shingle
    * index is the natural thing to persist between runs; this computes
    * it inline from the two inputs. */
  def incrementalJaccardPairs(corpus: DataFrame, newDocs: DataFrame,
                              idCol: String, textCol: String,
                              n: Int, tau: Double): DataFrame = {
    val tagged = corpus.select(col(idCol), col(textCol))
      .withColumn("__side", lit("old"))
      .unionByName(newDocs.select(col(idCol), col(textCol))
        .withColumn("__side", lit("new")))
    jaccardPairsImpl(tagged, idCol, textCol, n, tau,
      skipSides = Some(("__side", "old")))
  }

  /** Shared PPJoin core. `skipSides = Some((sideCol, v))` drops pairs
    * where BOTH documents carry side `v` (see
    * [[incrementalJaccardPairs]]); the side column must be present on
    * `docs`. */
  private def jaccardPairsImpl(docs: DataFrame, idCol: String,
                               textCol: String, n: Int, tau: Double,
                               skipSides: Option[(String, String)],
                               setsOpt: Option[DataFrame] = None): DataFrame = {
    // full shingle-hash set per doc — [[shingleSets]], checkpointed here
    // because it feeds the prefix explode and both verify joins (callers
    // sharing one corpus across pair surfaces pass a prebuilt table)
    val sets = setsOpt.getOrElse(
      shingleSets(docs, idCol, textCol, n).localCheckpoint())
    val prefix0 = sets.select(col("id"), col("nsh"),
      posexplode(slice(col("byRarity"), lit(1),
        (col("nsh") - ceil(col("nsh") * tau) + 1).cast("int"))))
      .select(col("id"), col("nsh"), col("pos"), col("col").as("h"))
    // incremental mode: ride the side flag on the prefix rows so the
    // old-old exclusion can live inside the candidate join
    val prefix = skipSides match {
      case Some((sc, _)) => prefix0.join(
        docs.select(col(idCol).as("id"), col(sc).as("__side")), "id")
      case None => prefix0
    }
    // Positional (PPJoin/SSJoin-style) pruning inside the join: J >= tau
    // forces overlap alpha = ceil(tau/(1+tau) * (|A|+|B|)), and the prefix
    // lemma guarantees a shared token within the first |x| - alpha + 1
    // tokens of BOTH sets — so rows whose position exceeds that pairwise
    // bound on either side can't be the witness and are dropped in the
    // join itself. Unrelated docs share only mid-frequency tokens, which
    // the rarest-first order pushes past the bound — most of the ~n²
    // vocabulary-overlap pairs die here, before the verify join exists.
    val alpha = ceil(lit(tau / (1.0 + tau)) * (col("a.nsh") + col("b.nsh")))
    val sideOk = skipSides match {
      case Some((_, v)) =>
        !(col("a.__side") === lit(v) && col("b.__side") === lit(v))
      case None => lit(true)
    }
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id")
          && sideOk
          && col("a.nsh") >= col("b.nsh") * tau
          && col("b.nsh") >= col("a.nsh") * tau
          && col("a.pos") <= col("a.nsh") - alpha
          && col("b.pos") <= col("b.nsh") - alpha)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.nsh").as("na"), col("b.nsh").as("nb"))
      .distinct()
    // exact verify: join the per-doc set arrays back (AQE broadcasts the
    // set table when it fits; at corpus scale it shuffles by id) and
    // merge-count the sorted arrays natively — no per-pair hash-set
    // allocation, which is what dominates array_intersect at millions of
    // candidates
    val setArr = sets.select(col("id"), col("sh"))
    val inter = graft.functions.VecKernels
      .sorted_intersect_count(col("sh_a"), col("sh_b"))
    cand
      .join(setArr.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(setArr.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        round(inter.cast("double") / (col("na") + col("nb") - inter), 6))
      .where(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
  }

  /** The plain inverted-index form: every shared shingle generates a
    * candidate row and the intersection is counted by the join itself.
    * Correct and cartesian-free, but join OUTPUT is quadratic in hot-
    * shingle frequency — kept as the cross-check for [[jaccardPairs]] and
    * to exercise the salting knob.
    *
    * Stop-word-grade shingles ("the a") pair almost every document, and a
    * plain equi-join puts each such hot key in ONE task (AQE splits by
    * partition size, and the skew here is in join *output*, not input) —
    * so with `salt > 1` the left side is salted by id-hash and the right
    * side replicated across the `salt` buckets: identical output, hot keys
    * spread over `salt` tasks. */
  def jaccardPairsIndex(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, tau: Double, salt: Int = 1): DataFrame = {
    // materialize the index once — it feeds both join sides and the size
    // table, and shingle extraction is the expensive projection here
    val sh = shingleHashIndex(docs, idCol, textCol, n).localCheckpoint()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("nsh"))
    val inter = (if (salt <= 1) {
      sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
    } else {
      val salted = sh.withColumn("salt", pmod(xxhash64(col("id")), lit(salt)))
      val replicated = sh.withColumn("salt",
        explode(sequence(lit(0), lit(salt - 1)).cast("array<bigint>")))
      salted.as("a").join(replicated.as("b"),
        col("a.h") === col("b.h") && col("a.salt") === col("b.salt")
          && col("a.id") < col("b.id"))
    })
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("nsh").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("nsh").as("nb")), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6))
      .where(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------------------- MinHash

  /** Deterministic permutation constants h_i(x) = (a_i·x + b_i) mod P,
    * shared verbatim with the SQL oracle. a_i·x stays < 2^63 because both
    * factors are < P ≈ 2^30.
    *
    * The multipliers are FULL-RANGE (golden-ratio multiples folded into
    * [1, P-1]), not small odd integers: with a_i ≤ 127 (rounds ≤ 11) a
    * shingle whose PolyHash lands below ~P/127 never wraps mod P and is
    * the argmin of EVERY permutation — StreamingDedupSpec caught a 0.95-
    * Jaccard pair reading 7/64 signature agreement and escaping all 16
    * bands through exactly such a min-dominator. Full-range multipliers
    * make the permutations behave as independent uniform hashes, so
    * signature agreement tracks true Jaccard (Broder's estimator
    * contract) and band recall at 16×4 holds where the theory says it
    * should. */
  def minhashPerms(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map { i =>
      val a = Math.floorMod(0x9E3779B97F4A7C15L * (i + 1), PolyHash.Prime - 1) + 1
      val b = Math.floorMod(0xC2B2AE3D27D4EB4FL * (i + 1), PolyHash.Prime)
      (a, b)
    }

  /** MinHash signature column: for each permutation, the minimum permuted
    * [[PolyHash]] over the doc's distinct shingles. Pure nested
    * higher-order functions — signatures are computed in one narrow pass. */
  def minhashSignature(textCol: Column, n: Int, numHashes: Int): Column = {
    val hashes = transform(array_distinct(TextFunctions.wordShingles(textCol, n)),
      sh => PolyHash.poly_hash(sh))
    val perms = minhashPerms(numHashes)
    array(perms.map { case (a, b) =>
      array_min(transform(hashes, h => (h * a + b) % PolyHash.Prime))
    }: _*)
  }

  /** LSH banding: docs sharing any (band index, folded band key) are
    * candidates; candidates are verified with exact Jaccard >= tau.
    * bands·rows must equal numHashes. Empty docs (null band key) are
    * dropped before banding.
    *
    * Shingle sets are computed ONCE per document and joined back to the
    * (id-only) candidate pairs — never recomputed per pair, so verify cost
    * is O(candidates), and candidate generation is an equi-join on the
    * band key: the whole operator is shuffle-bounded, no cartesian. */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, tau: Double, bands: Int = 16, rows: Int = 4): DataFrame = {
    // `sh` stays in kernel (first-occurrence) order for the signature;
    // `shs` is the hash-sorted view the merge-intersect verify needs
    val shingleSets = docs.select(col(idCol).as("id"),
      graft.functions.TextKernels.shingle_hashes(col(textCol), lit(n)).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("shs", sort_array(col("sh")))

    val cand = bandedCandidates(shingleSets, bands, rows)

    // exact-Jaccard verification of the candidates only, against the
    // precomputed hash-sorted shingle sets (native merge-count — no
    // per-pair hash-set allocation)
    val inter = graft.functions.VecKernels
      .sorted_intersect_count(col("sh_a"), col("sh_b"))
    cand
      .join(shingleSets.select(col("id").as("id_a"), col("shs").as("sh_a")), "id_a")
      .join(shingleSets.select(col("id").as("id_b"), col("shs").as("sh_b")), "id_b")
      .withColumn("jaccard",
        round(inter.cast("double") / (size(col("sh_a")) + size(col("sh_b")) - inter), 6))
      .where(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
  }

  /** The banded MinHash candidate stream [[minhashPairs]] verifies —
    * band-key equi-join over the signature slices, PRE-verify — exposed
    * so sketch-quality evaluation (lsh_precision) can measure the band
    * geometry itself: precision is a property of the candidates, not of
    * the verified output. Same plan shape as inside minhashPairs. */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, bands: Int = 16, rows: Int = 4): DataFrame = {
    val shingleSets = docs.select(col(idCol).as("id"),
      graft.functions.TextKernels.shingle_hashes(col(textCol), lit(n)).as("sh"))
      .where(size(col("sh")) > 0)
    bandedCandidates(shingleSets, bands, rows)
  }

  /** (id_a, id_b) band-collision pairs over a precomputed shingle-set
    * table with kernel-order `sh` hashes. */
  private def bandedCandidates(shingleSets: DataFrame, bands: Int,
                               rows: Int): DataFrame =
    bandedCandidatesFromSigs(
      shingleSets.select(col("id"),
        graft.functions.TextKernels.minhash_sig(col("sh"), bands * rows)
          .as("sig")),
      bands, rows)

  /** Band-collision pairs from a PRECOMPUTED (id, sig) signature table —
    * the path for callers that materialize signatures once and reuse
    * them across banding and per-pair estimation (the signature build is
    * the expensive kernel pass; the band keys are cheap slice folds over
    * it). */
  def bandedCandidatesFromSigs(sigs: DataFrame, bands: Int,
                               rows: Int): DataFrame = {
    // band key = polynomial fold of the band's signature slice
    val banded = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        aggregate(slice(col("sig"), b * rows + lit(1), lit(rows)), lit(0L),
          (acc, v) => (acc * 31 + v) % PolyHash.Prime))))
      .select(col("id"), col("pos").as("band"), col("col").as("key"))
      .where(col("key").isNotNull)

    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }


  // ------------------------------------------------------------- SimHash

  /** 60-bit SimHash over word shingles: bit b of the fingerprint is 1 iff
    * Σ_sh sign(bit b of the per-shingle hash) > 0. 60 bits (not 64) so
    * every shift stays overflow-free in engines with checked shifts
    * (DuckDB oracle parity); the per-shingle hash packs two salted 30-bit
    * PolyHashes.
    */
  val SimhashBits = 60

  def simhash(textCol: Column, n: Int): Column =
    graft.functions.TextKernels.simhash_60(textCol, n)

  /** The declarative Column form of [[simhash]], kept as the kernel's
    * bit-equality spec cross-check, NOT the runtime path: its 60 per-bit
    * `aggregate` expressions each re-evaluate the whole interpreted
    * tokenize→shingle→hash subtree (~150 ms per 300-char document). */
  private[graft] def simhashDeclarative(textCol: Column, n: Int): Column = {
    val sh = array_distinct(TextFunctions.wordShingles(textCol, n))
    val h60 = transform(sh, s => {
      val h0 = PolyHash.poly_hash(s)
      val h1 = PolyHash.poly_hash(concat(s, lit("#1")))
      h0.bitwiseXOR(shiftleft(h1, 30))
    })
    val bitSums = (0 until SimhashBits).map { b =>
      // +1 when bit set, -1 otherwise; fingerprint bit = sum > 0
      when(coalesce(aggregate(h60, lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)),
        lit(0L)) > 0, lit(1L)).otherwise(lit(0L))
    }
    bitSums.zipWithIndex.map { case (bit, i) => shiftleft(bit, i) }
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: candidates share one of four 15-bit bands
    * (any pair within Hamming distance 3 must agree on >= 1 band), then
    * exact Hamming <= maxHamming verifies. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, maxHamming: Int = 3): DataFrame = {
    val fps = docs.select(col(idCol).as("id"), simhash(col(textCol), n).as("fp"))
    val banded = fps.select(col("id"), col("fp"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("fp"), b * 15).bitwiseAND(0x7FFFL)): _*)))
      .select(col("id"), col("fp"), col("pos").as("band"), col("col").as("key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.fp"), col("b.fp")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  // ------------------------------------------- embedding cosine near-dup

  /** Near-duplicate embedding pairs (cosine >= tau): sign-band LSH
    * candidate generation + exact cosine verify
    * ([[SimilaritySearch.cosinePairsLsh]]) — an equi-join on band keys,
    * never the all-pairs crossJoin ([[SimilaritySearch.cosinePairs]] stays
    * as the brute-force oracle baseline). */
  def embeddingPairs(embs: DataFrame, idCol: String, vecCol: String,
                     tau: Double): DataFrame =
    SimilaritySearch.cosinePairsLsh(embs, idCol, vecCol, tau)
}
