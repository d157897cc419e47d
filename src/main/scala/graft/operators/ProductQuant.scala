package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI'11) — the memory-bound ANN path: vectors are
  * cut into `m` subvectors, each quantized to its nearest entry of a
  * per-subspace codebook, so a d-dim float vector compresses to m small
  * codes and query scoring becomes additive table lookups (ADC) instead
  * of full-vector arithmetic.
  *
  * Scale shape: encoding is a pure projection (codebooks ride into
  * codegen as literals — m·ks·subDim doubles, e.g. 4·8·16 = 512), so the
  * corpus is scanned once with NO shuffle. ADC scoring broadcasts one
  * precomputed m×ks lookup table per query (O(queries·m·ks) driver
  * doubles — the classic ADC trick: all subspace distances are computed
  * ONCE per query against the codebook, never against corpus vectors),
  * scans the encoded corpus once summing m lookups per row, and ranks
  * through the partial top-k aggregate so the shuffle carries
  * O(queries·k) rows. Codebook training at 100 TB uses the same bounded
  * deterministic sample as the IVF quantizer; the fixed-codebook seam
  * here is also the entry point for an externally trained codebook.
  *
  * Distances are squared-L2 per subspace, rounded to 6dp before any
  * comparison (argmin ties break to the lower code, rankings to the
  * lower id) so float associativity can't flip a choice across engines.
  */
object ProductQuant {

  /** `m` per-subspace codebooks over `subDim`-wide slices; `books(j)(c)`
    * is entry `c` of subspace `j`. Every book must have the same entry
    * count ks ≤ 128 (codes are small ints by design). */
  case class PqCodebook(subDim: Int, books: IndexedSeq[IndexedSeq[Array[Double]]]) {
    def m: Int = books.size
    def ks: Int = books.head.size
    require(books.forall(_.size == ks), "ragged codebook")
    require(books.forall(_.forall(_.length == subDim)), "entry width != subDim")
  }

  /** Deterministic codebook from `ks` sample vectors (entry c of book j =
    * subvector j of sample c) — the fixed-codebook seam, exactly
    * reproducible in SQL. A trained codebook would come from per-subspace
    * Lloyd on a bounded sample instead. */
  def codebookFromSamples(samples: Seq[Array[Double]], m: Int): PqCodebook = {
    val subDim = samples.head.length / m
    PqCodebook(subDim, (0 until m).map(j =>
      samples.map(v => v.slice(j * subDim, (j + 1) * subDim)).toIndexedSeq))
  }

  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** The per-subspace argmin as a column over `vec`: nearest codebook
    * entry of book `j` by 6dp-rounded squared L2, ties to the lower
    * code. */
  private def codeCol(vec: Column, cb: PqCodebook, j: Int): Column = {
    val bookLit = array(cb.books(j).map(e =>
      array(e.map(lit(_)): _*)): _*)
    val sub = slice(vec, j * cb.subDim + 1, cb.subDim)
    array_min(transform(bookLit, (cent, ci) =>
      struct(round(l2sq(sub, cent), 6).as("d"), ci.as("c"))))
      .getField("c").cast("int")
  }

  /** Encode every vector to its m codes: (id, codes array<int>). One
    * shuffle-free projection pass. */
  def encode(embs: DataFrame, idCol: String, vecCol: String,
             cb: PqCodebook): DataFrame = {
    val vec = col(vecCol).cast("array<double>")
    embs.select(col(idCol).cast("long").as("id"),
      array((0 until cb.m).map(j => codeCol(vec, cb, j)): _*).as("codes"))
  }

  /** ADC lookup table for one query: dtab(j)(c) = ||q_sub_j − book_j(c)||²,
    * computed once on the driver (m·ks sums of subDim squares). */
  private def lookupTable(q: Array[Double], cb: PqCodebook): Seq[Seq[Double]] =
    (0 until cb.m).map { j =>
      cb.books(j).map { cent =>
        var s = 0.0
        var i = 0
        while (i < cb.subDim) {
          val dlt = q(j * cb.subDim + i) - cent(i)
          s += dlt * dlt
          i += 1
        }
        s
      }.toSeq
    }

  /** Negated 6dp ADC distance (codes summed through the broadcast `dtab`
    * column) — negated so the shared top-k aggregate's (sim desc, id asc)
    * ordering yields (dist asc, id asc). */
  private def negAdcCol: Column =
    -round(aggregate(
      zip_with(col("codes"), col("dtab"),
        (cj, row) => element_at(row, cj + 1)),
      lit(0.0), (acc, v) => acc + v), 6)

  /** Asymmetric-distance top-k: for each query vector, the `k` encoded
    * corpus vectors with the smallest summed per-subspace distance to the
    * query's lookup table. `queryRows` are driver-side (q_id, vector)
    * pairs — queries are few by contract; each contributes m·ks doubles
    * of broadcast literal, never a corpus-side join.
    *
    * @return (q_id, id, dist, rank), dist 6dp, rank 1-based by
    *         (dist asc, id asc); the query's own id is excluded.
    */
  def adcTopK(encoded: DataFrame, queryRows: Seq[(Long, Array[Double])],
              cb: PqCodebook, k: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val qTabs = queryRows.map { case (qid, q) => (qid, lookupTable(q, cb)) }
    val scored = encoded.crossJoin(
        broadcast(qTabs.toDF("q_id", "dtab")))
      .where(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"), negAdcCol.as("sim"))
    SimilaritySearch.rankTopK(scored, k)
      .select(col("q_id"), col("id"), (-col("sim")).as("dist"), col("rank"))
  }

  /** IVF-PQ: the production ANN composition — the coarse quantizer prunes
    * each query to its `nprobe` nearest buckets (max-cosine, the same
    * probe as [[SimilaritySearch.IvfIndex.search]]), then candidates are
    * ranked by ADC over their PQ codes instead of full-vector arithmetic.
    * Bucket id and codes come from ONE shuffle-free projection of the
    * corpus; the query side (probes × lookup tables, O(queries·nprobe) +
    * O(queries·m·ks) values) broadcasts into a bucket equi-join, so
    * candidate work is bounded by probed-bucket population and per-
    * candidate cost is m table lookups — independent of both corpus size
    * and vector dimension. The scale path for billion-vector ANN.
    *
    * @return (q_id, id, dist, rank), dist 6dp ADC, rank 1-based by
    *         (dist asc, id asc); the query's own id is excluded.
    */
  def ivfAdcTopK(embs: DataFrame, idCol: String, vecCol: String,
                 cents: Map[Int, Array[Double]], cb: PqCodebook,
                 queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val idx = SimilaritySearch.ivfIndexFixed(embs, idCol, vecCol, cents)
    val enc = idx.indexed.select(col("id").cast("long").as("id"),
      col("bucket"),
      array((0 until cb.m).map(j => codeCol(col("vec"), cb, j)): _*)
        .as("codes"))
    val q = queries.select(col(idCol).cast("long").as("q_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val qTabs = q.collect()
      .map(r => (r.getLong(0),
        lookupTable(r.getSeq[Double](1).toArray, cb))).toSeq
    val qb = q.select(col("q_id"), explode(
        graft.functions.VecKernels.nearest_centroids(
          col("q_vec"), cents.toSeq, nprobe, cosine = true)).as("p"))
      .select(col("q_id"), col("p.cluster").as("bucket"))
      .join(qTabs.toDF("q_id", "dtab"), "q_id")
    val scored = enc.join(broadcast(qb), "bucket")
      .where(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"), negAdcCol.as("sim"))
    SimilaritySearch.rankTopK(scored, k)
      .select(col("q_id"), col("id"), (-col("sim")).as("dist"), col("rank"))
  }
}
