package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical relevance ranking over a document corpus — BM25 (Robertson &
  * Spärck Jones's probabilistic weighting; Robertson et al., TREC-3), the
  * standard scorer a training-data pipeline uses for query-targeted corpus
  * selection and retrieval-based decontamination.
  *
  * Spark-first shape for a FIXED query-term bag: each term becomes a tf
  * COLUMN of a narrow per-document projection (no token explosion, no
  * shuffle over the corpus); document frequencies and the average document
  * length come from ONE scalar aggregate that broadcasts back into a
  * per-document projection. At 100 TB the corpus is scanned twice (once
  * for the global stats, once to score) and shuffles only the one stats
  * row — for ad-hoc many-term workloads the inverted-index variant
  * [[bm25Inverted]] amortizes differently (postings rows instead of tf
  * columns), but for the fixed-bag scoring this plan is optimal.
  *
  * Float determinism (the gate is hash-compared against DuckDB):
  *  - idf is rounded to 6dp straight out of `ln` — JVM StrictMath.log and
  *    glibc's log differ by 1 ulp on ~8% of the (N, df) inputs (measured),
  *    and 6dp rounding collapses that except within ~1e-15 of a rounding
  *    boundary;
  *  - per-term weights are rounded at 6dp and summed in the LITERAL term
  *    order (a left fold, not an agg), so association is identical across
  *    engines;
  *  - document lengths are integer-valued doubles, so avg(dl) is exact in
  *    any summation order.
  */
object LexicalRank {

  /** Per-document BM25 score for the fixed `terms` bag: (doc_id, score),
    * score already rounded to 6dp. Zero-scoring documents are kept (the
    * caller decides whether to filter); zero-length documents score 0. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val base = docs
      .select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("tk"))
      .select(col("doc_id") +:
        size(col("tk")).cast("double").as("dl") +:
        terms.indices.map(i =>
          size(filter(col("tk"), w => w === lit(terms(i))))
            .cast("double").as(s"tf$i")): _*)
    val aggCols = avg(col("dl")).as("avgdl") +:
      count(lit(1)).cast("double").as("n") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1.0).otherwise(0.0)).as(s"df$i"))
    val glob = base.agg(aggCols.head, aggCols.tail: _*)
    val scored = base.crossJoin(broadcast(glob))
    val weights: Seq[Column] = terms.indices.map { i =>
      val idf6 = round(log(lit(1.0)
        + (col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5)), 6)
      val norm = (col(s"tf$i") * lit(k1 + 1)) /
        (col(s"tf$i") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
      round(idf6 * norm, 6)
    }
    scored.select(col("doc_id"),
      round(weights.reduceLeft(_ + _), 6).as("score"))
  }

  /** Unigram-surprisal document scoring — the CCNet-style "how surprising
    * is this text under a corpus language model" quality signal, with the
    * LM reduced to the corpus's own unigram distribution and the log
    * reduced to EXACT integer bit counts so the score is value-level
    * oracle-checkable: a token with corpus count c out of N total carries
    * floor(log2(N div c)) bits — computed as length(bin(N div c)) - 1,
    * pure integer arithmetic identical in every engine — and a document
    * scores round(Σ bits / n_tokens, 6): one exact integer sum, one IEEE
    * division, one 6dp round. High surprisal ⇒ rare vocabulary (often
    * gibberish or genuinely novel text); low ⇒ boilerplate-common tokens.
    *
    * Scale shape: the per-(doc, token) pre-count caps every Zipf-hot
    * token at ONE row per document before the vocabulary join, so the
    * token-keyed equi-join's skew is bounded by document count, not
    * occurrence count (AQE splits what remains); occurrence counts are a
    * two-level map-side-combined groupBy; the corpus total is a 1-row
    * broadcast. Nothing collects, nothing is quadratic in the corpus.
    *
    * Returns one row per input document: (id, n_tokens, sum_bits,
    * surprisal); tokenless documents score 0. */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dt = docs
      .select(col(idCol).as("id"), explode(TF.tokens(col(textCol))).as("w"))
      .groupBy("id", "w").agg(count(lit(1)).as("c"))
    val vocab = dt.groupBy("w").agg(sum("c").as("vc"))
    val tot = vocab.agg(sum("vc").as("tot"))
    val perDoc = dt.join(vocab, "w")
      .crossJoin(broadcast(tot))
      .select(col("id"), col("c"),
        (length(bin(expr("tot div vc"))) - 1).cast("long").as("bits"))
      .groupBy("id")
      .agg(sum(col("c") * col("bits")).as("sum_bits"),
        sum("c").as("n_tokens"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("sum_bits").cast("double") / col("n_tokens"), 6))
          .as("surprisal"))
  }

  /** Bigram-conditional surprisal — [[unigramSurprisal]]'s LM raised one
    * order, which is where a corpus-LM filter starts separating "common
    * words in impossible order" (shuffled/templated spam that unigram
    * statistics can't see) from real prose. A bigram occurrence (w1, w2)
    * with corpus bigram count c12 and prefix count c1 = Σ_w c(w1, w)
    * carries floor(log2(c1 div c12)) bits — the integer-exact form of
    * -log2 p(w2 | w1) with the same length(bin(·))-1 trick, so the gate
    * stays value-level oracle-checkable — and a document scores
    * round(Σ bits / n_bigrams, 6).
    *
    * Scale shape mirrors the unigram pass one order up: bigrams are a
    * zero-shuffle zip_with projection; the per-(doc, w1, w2) pre-count
    * caps every hot bigram at one row per document before the model
    * joins; corpus bigram counts and prefix counts are two-level
    * map-side-combined groupBys; both model joins are keyed equi-joins
    * (bigram-keyed, then prefix-keyed). The prefix table is vocabulary-
    * sized and the bigram table is corpus-bigram-type-sized — both far
    * smaller than the corpus, neither collected.
    *
    * Returns one row per input document: (id, n_bigrams, sum_bits,
    * surprisal2); documents with fewer than two tokens score 0. */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = TF.tokens(col(textCol))
    val pairs = when(size(tk) < 2,
        array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(zip_with(
        slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
    val db = docs
      .select(col(idCol).as("id"), explode(pairs).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("id", "w1", "w2").agg(count(lit(1)).as("c"))
    val cb = db.groupBy("w1", "w2").agg(sum("c").as("cc"))
    val pc = cb.groupBy("w1").agg(sum("cc").as("pcnt"))
    val perDoc = db.join(cb, Seq("w1", "w2")).join(pc, Seq("w1"))
      .select(col("id"), col("c"),
        (length(bin(expr("pcnt div cc"))) - 1).cast("long").as("bits"))
      .groupBy("id")
      .agg(sum(col("c") * col("bits")).as("sum_bits"), sum("c").as("n_bigrams"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("sum_bits").cast("double") / col("n_bigrams"), 6))
          .as("surprisal2"))
  }

  /** Inverted-index BM25 — the ad-hoc/many-term shape of [[bm25]]. Where
    * the fixed-bag form carries one tf COLUMN per term (plan width grows
    * with |terms|), this one explodes to postings ROWS and keeps the plan
    * O(1) in term count: tokenize → keep postings whose token is in the
    * query bag (an `isin` literal filter — no corpus self-join, nothing
    * like a terms-table shuffle) → per-(doc, term) tf via a map-side-
    * combined groupBy → per-term document frequencies (≤ |terms| rows,
    * broadcast back) → per-posting weight → per-doc sum. Only documents
    * containing ≥1 query term appear (inverted-index semantics; [[bm25]]
    * keeps zero-scoring docs).
    *
    * Scale shape: the only corpus-sized shuffles are keyed by
    * (doc, term) then doc; the df table and the 1-row global stats are
    * broadcast. Zipf-hot query terms cap at one row per (doc, term)
    * after the first combine, so no hot-key blowup.
    *
    * Float determinism: idf and per-posting weights follow [[bm25]]'s 6dp
    * discipline, but the per-doc combine is a GROUPED sum whose order
    * Spark doesn't fix — so each 6dp weight is lifted to an exact integer
    * (round(w·10⁶) as long), summed exactly, and divided back once:
    * associativity-free, mirrored verbatim in the SQL oracle. (Scores can
    * therefore differ from [[bm25]]'s literal-order float fold by 1 ulp
    * at a 6dp rounding boundary — each form matches its own oracle.) */
  def bm25Inverted(docs: DataFrame, idCol: String, textCol: String,
                   terms: Seq[String], k1: Double = 1.2,
                   b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Inverted needs at least one query term")
    val base = docs.select(col(idCol).as("doc_id"),
      TF.tokens(col(textCol)).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("double").as("dl"),
        col("tk"))
    val glob = base.agg(avg(col("dl")).as("avgdl"),
      count(lit(1)).cast("double").as("n"))
    val postings = base
      .select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
      .where(col("term").isin(terms: _*))
    val tf = postings.groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val weighted = tf
      .join(broadcast(dft), "term")
      .crossJoin(broadcast(glob))
      .select(col("doc_id"), {
        val idf6 = round(log(lit(1.0)
          + (col("n") - col("df") + 0.5) / (col("df") + 0.5)), 6)
        val norm = (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
        round(round(idf6 * norm, 6) * 1e6).cast("long").as("wq")
      })
    weighted.groupBy("doc_id").agg(sum(col("wq")).as("swq"))
      .select(col("doc_id"),
        round(col("swq").cast("double") / 1e6, 6).as("score"))
  }

  /** Positive scores only, top-`k` by (score desc, doc_id asc) as a
    * TakeOrdered (per-partition partial top-k — never an unpartitioned
    * window over the corpus), then ranked over exactly the k rows.
    * Shared by both scorers so the top-k discipline cannot diverge. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val top = scored
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(w))
  }

  /** Top-`k` of [[bm25Inverted]], ranked (score desc, doc_id asc) with
    * the same TakeOrdered shape as [[bm25TopK]]. */
  def bm25InvertedTopK(docs: DataFrame, idCol: String, textCol: String,
                       terms: Seq[String], k: Int, k1: Double = 1.2,
                       b: Double = 0.75): DataFrame =
    rankTopK(bm25Inverted(docs, idCol, textCol, terms, k1, b), k)

  /** Top-`k` documents by BM25 for the fixed `terms` bag, positive scores
    * only, ranked (score desc, doc_id asc).
    *
    * Scale shape (see [[rankTopK]]): TakeOrdered top-k, rank window over
    * k rows. The previous form (`row_number` over an unpartitioned
    * window on the score-filtered stream, then `rank <= k`) funneled
    * EVERY positive-scoring document through one window task; with
    * common query terms at corpus scale that is nearly every document
    * containing any term, a single-task sort. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    rankTopK(bm25(docs, idCol, textCol, terms, k1, b), k)
}
