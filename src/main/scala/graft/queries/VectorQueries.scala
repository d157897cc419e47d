package graft.queries

import graft.core.Tables.table
import graft.operators.SimilaritySearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search gate queries on the `embeddings` table. Cosine values
  * are rounded to 6dp in BOTH engines and every ranking orders by the
  * rounded value with an id tiebreak, so float associativity can't flip
  * the comparison. The DuckDB oracle writes the cosine exactly as Spark
  * computes it: dot / (sqrt(dot(a,a)) * sqrt(dot(b,b))).
  */
object VectorQueries {
  private val CosTau = 0.4
  private val TopK = 10
  private val NQueries = 5
  private val NList = 8
  private val NProbe = 3
  /** knn_graph neighbors per vector. */
  private val KnnK = 3
  /** ivf_nprobe_curve sweeps nprobe 1..NProbeMax. */
  private val NProbeMax = 4
  /** semdedup's per-task pair-work cap: buckets larger than this split
    * into hash slices before the within-cluster verify (exact triangle
    * blocking via SkewJoin.blockedSelfPairs), so a skewed mega-bucket
    * costs O((n_b/cap)²) tasks of ≤cap² comparisons instead of one
    * quadratic task. 256 keeps a block's pair work ≈ 65k cosines —
    * comfortably one task-second — while sf0.01's ~750-row buckets
    * already exercise the multi-slice path (S ≈ 3). */
  private val SemDedupBlockCap = 256
  /** ann_refine first-stage (ADC) candidate count per query. */
  private val RefineN = 50
  /** rrf_fusion's reciprocal-rank smoothing constant (the k=60 of
    * Cormack et al., SIGIR'09). */
  private val RrfK = 60
  /** matryoshka_recall truncation width (first MatDim of 64 dims). */
  private val MatDim = 16

  /** The two brute-force gates exist as correctness BASELINES — their scale
    * stories are embed_pairs_lsh and ann_ivf. Cap their input so a larger
    * gate SF can't go quadratic/linear-per-query on them: a no-op at every
    * current SF (max vec_id is 1999 at sf0.1), mirrored in the oracles. */
  private val BruteCap = 2000
  /** kcenter_coreset size (greedy farthest-first rounds). */
  private val KCenterK = 4
  /** graph_diameter sweep bound — generous, since each sweep stops at
    * its fixpoint and near-dup components are diameter-bounded by
    * construction (that bound is what the gate measures). */
  private val DiamMaxHops = 32
  private val PqM = 4       // PQ subspaces over the 64-dim embeddings
  private val PqKs = 8      // entries per subspace codebook
  private val PqSub = 16    // = 64 / PqM, mirrored in the oracle SQL

  private def embs(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "embeddings")

  /** The shared fixed-quantizer codebook pull (ids [lo, hi)) — one seam,
    * bound-enforced in [[SimilaritySearch.fixedCentroids]]. */
  private def fixedCentroids(e: DataFrame, lo: Int,
                             hi: Int): Map[Int, Array[Double]] =
    SimilaritySearch.fixedCentroids(e, "vec_id", "embedding", lo, hi)

  /** Fixed deterministic PQ codebook: entry c of book j = subvector j of
    * corpus vector c (the first PqKs vectors — O(ks·dim) driver scalars,
    * same shape as ann_ivf_fixed's centroid collect). */
  private def pqCodebook(s: SparkSession, dir: String): graft.operators.ProductQuant.PqCodebook = {
    val samples = embs(s, dir).where(col("vec_id") < PqKs)
      .orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray).toSeq
    graft.operators.ProductQuant.codebookFromSamples(samples, PqM)
  }

  /** embed_pairs_lsh and embed_dedup walk the same near-dup pair graph —
    * computed once per (session, dir), eagerly checkpointed, shared via
    * [[graft.core.QueryCache]] (key exposed so the shuffle-budget spec
    * can evict and measure the build plan). */
  private[graft] val EmbPairsKey = "vector.embedPairs"
  private def sharedEmbedPairs(s: SparkSession, dir: String): DataFrame =
    graft.core.QueryCache.shared(EmbPairsKey, s, dir) {
      graft.operators.Dedup.embeddingPairs(embs(s, dir), "vec_id", "embedding",
        CosTau).localCheckpoint()
    }

  /** embed_stream's verified pair set (sign-band stateful banding +
    * exact cosine verify), memoized like the text-side StreamPairsKey. */
  private[graft] val EmbStreamKey = "vector.embedStreamPairs"
  /** embed_stream's ingest split: vec_id >= split is the new side. */
  private val EmbIncrSplit = 400

  /** SemDeDup's fixed-quantizer assignment (bucket, id, vec), memoized +
    * checkpointed per (session, dir): [[graft.operators.SkewJoin
    * .blockedSelfPairs]] documents that it executes its input plan three
    * times (slice-size agg + both join sides), and the gate's n_total agg
    * adds a fourth — materializing here runs the broadcast-cosine
    * assignment kernel ONCE instead of 4× per evaluation, matching the
    * operator's stated expectation of a materialized input. */
  private[graft] val SemDedupAssignKey = "vector.semdedupAssigned"
  private def sharedSemDedupAssigned(s: SparkSession, dir: String): DataFrame =
    graft.core.QueryCache.shared(SemDedupAssignKey, s, dir) {
      val e = embs(s, dir)
      SimilaritySearch.ivfIndexFixed(
          e, "vec_id", "embedding", fixedCentroids(e, 0, NList)).indexed
        .select(col("bucket"), col("id"), col("vec"))
        .localCheckpoint()
    }

  /** Component labels over the shared pair graph (embed_dedup's CC),
    * memoized like the pairs — one labeling per (session, dir). */
  private[graft] val EmbCompKey = "vector.embedComp"
  private def sharedEmbedComp(s: SparkSession, dir: String): DataFrame =
    graft.core.QueryCache.shared(EmbCompKey, s, dir) {
      graft.graph.ConnectedComponents.run(
          sharedEmbedPairs(s, dir)
            .select(col("id_a").as("src"), col("id_b").as("dst")))
        .localCheckpoint()
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // brute-force exact cosine top-k for the first NQueries vectors
    "ann_topk" -> ((s, dir) => {
      val e = embs(s, dir).where(col("vec_id") < BruteCap)
      SimilaritySearch.cosineTopK(
        e, e.where(col("vec_id") < NQueries), "vec_id", "embedding", TopK)
        .orderBy("q_id", "rank")
    }),

    // Matryoshka truncation eval: recall@k of retrieval using only the
    // FIRST MatDim of 64 dims against the full-dim exact top-k — the
    // measurement that decides how far an MRL-style embedding can be
    // truncated before retrieval quality pays (Kusupati et al.,
    // NeurIPS'22). Both rankings use the same (rounded sim desc, id)
    // total order, so the two sets are engine-independent and the
    // overlap count plus its integer-ppm recall are exact. Truncation
    // itself is a narrow projection (slice); at scale the full-dim leg
    // is whatever ANN index serves production, so the eval's cost is
    // the truncated leg only.
    "matryoshka_recall" -> ((s, dir) => {
      val e = embs(s, dir).where(col("vec_id") < BruteCap)
      val full = SimilaritySearch.cosineTopK(
        e, e.where(col("vec_id") < NQueries), "vec_id", "embedding", TopK)
      val te = e.select(col("vec_id"),
        slice(col("embedding").cast("array<double>"), 1, MatDim).as("temb"))
      val trunc = SimilaritySearch.cosineTopK(
        te, te.where(col("vec_id") < NQueries), "vec_id", "temb", TopK)
      val hits = full.select("q_id", "id")
        .join(trunc.select(col("q_id"), col("id")), Seq("q_id", "id"),
          "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
      e.where(col("vec_id") < NQueries).select(col("vec_id").as("q_id"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .select(col("q_id"), col("n_hits"),
          expr(s"(1000000 * n_hits) div $TopK").as("recall_ppm"))
        .orderBy("q_id")
    }),

    // Greedy k-center coreset selection (Gonzalez 1985 farthest-first
    // traversal, cosine space): start from the min-id vector, then
    // KCenterK−1 rounds of "pick the candidate LEAST similar to its
    // most-similar chosen center" — the diverse-subset selection that
    // seeds coverage-oriented training-data curation (the 2-approx of
    // the k-center objective). Scale shape: chosen centers are O(k·dim)
    // driver scalars riding into the scan as literals, so each round is
    // ONE zero-shuffle projection + a TakeOrdered(1) argmin — no joins,
    // no corpus shuffle, at any corpus size. Determinism: argmin on
    // (6dp-rounded max-sim, vec_id); the cosines are the same
    // sequential-fold doubles as every embedding oracle.
    "kcenter_coreset" -> ((s, dir) => {
      import s.implicits._
      val e = embs(s, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      val c0 = e.orderBy("vec_id").limit(1).head()
      var chosen = List((0, c0.getLong(0), Option.empty[Double],
        c0.getSeq[Double](1)))
      for (r <- 1 until KCenterK) {
        val sims = chosen.map(c =>
          graft.functions.Distances.cosine(col("e"), typedLit(c._4)))
        val msim = round(sims.reduceLeft((a, b) => greatest(a, b)), 6)
        val next = e.where(!col("vec_id").isInCollection(chosen.map(_._2)))
          .select(col("vec_id"), msim.as("msim"), col("e"))
          .orderBy(col("msim").asc, col("vec_id").asc).limit(1).head()
        chosen = chosen :+ ((r, next.getLong(0), Some(next.getDouble(1)),
          next.getSeq[Double](2)))
      }
      chosen.map(c => (c._1, c._2, c._3)).toDF("step", "vec_id", "max_sim")
        .orderBy("step")
    }),

    // exact all-pairs cosine >= tau (embedding near-dup baseline)
    "cosine_pairs" -> ((s, dir) => {
      SimilaritySearch.cosinePairs(
        embs(s, dir).where(col("vec_id") < BruteCap),
        "vec_id", "embedding", CosTau)
        .orderBy("id_a", "id_b")
    }),

    // LSH-pruned embedding near-dup: sign-band candidates + exact verify.
    // The planes are deterministic, so the result is exactly the brute
    // all-pairs set and shares its SQL oracle; the plan is asserted
    // cartesian-free in SimilaritySearchSpec.
    "embed_pairs_lsh" -> ((s, dir) => {
      sharedEmbedPairs(s, dir).orderBy("id_a", "id_b")
    }),

    // continuous-ingest EMBEDDING near-dup — dedup_stream's sign-band
    // sibling (the banding-agnostic stateful core,
    // StreamingDedup.bandedCandidatesStatefulFromKeys): each vector's 64
    // sign-band keys route it into the accumulating store, pairs emit
    // exactly once via the min-colliding-band rule with >= 1 new side
    // (vec_id >= EmbIncrSplit), and candidates verify with exact cosine
    // >= CosTau. Run in batch mode here (split-invariant, like
    // dedup_stream); same full-recall-at-this-geometry argument as
    // embed_pairs_lsh, so the oracle is the brute pair SQL + side filter.
    "embed_stream" -> ((s, dir) => {
      graft.core.QueryCache.shared(EmbStreamKey, s, dir) {
        val e = embs(s, dir)
        val base = e.select(col("vec_id").cast("long").as("id"),
          col("embedding").cast("array<double>").as("vec"))
        val keyed = base.select(col("id"),
          (col("id") >= EmbIncrSplit).as("isNew"),
          graft.functions.VecKernels.sign_bands(col("vec"), dim = 64,
            bits = 5, bands = 64).as("keys"))
        val cand = graft.streaming.StreamingDedup
          .bandedCandidatesStatefulFromKeys(keyed).toDF()
        cand
          .join(base.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
          .join(base.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
          .select(col("id_a"), col("id_b"),
            round(graft.functions.Distances.cosine(col("vec_a"), col("vec_b")), 6)
              .as("sim"))
          .where(col("sim") >= CosTau)
          .localCheckpoint()
      }.orderBy("id_a", "id_b")
    }),

    // chunk->document mean pooling: vectors grouped into synthetic docs
    // (vec_id mod 50), element-wise averaged, summarized by the pooled
    // vector's norm and first component
    "embed_pool" -> ((s, dir) => {
      val e = embs(s, dir).select((col("vec_id") % 50).as("group_id"),
        col("embedding"))
      SimilaritySearch.meanPool(e, "group_id", "embedding", dim = 64)
        .select(col("group_id"),
          round(graft.functions.Distances.norm(col("pooled")), 6)
            .as("pooled_norm"),
          round(element_at(col("pooled"), 1), 6).as("pooled_x0"))
        .orderBy("group_id")
    }),

    // the WIDE pooling plan (posexplode → per-(group,pos) avg →
    // reassemble) under the oracle: the table's 64-dim vectors are
    // concatenated into 512-dim ones (8 integer-scaled copies — IEEE
    // multiplies, bit-equal on both engines) so dim >= wideDim selects
    // meanPoolWide, the plan modern 2-4k-dim embeddings take. First,
    // last, and norm summarize the pooled vector so the whole width is
    // value-checked.
    "embed_pool_wide" -> ((s, dir) => {
      val e = col("embedding").cast("array<double>")
      val wide = flatten(array((1 to 8).map(k =>
        transform(e, x => x * k)): _*))
      val src = embs(s, dir).select((col("vec_id") % 50).as("group_id"),
        wide.as("wembedding"))
      SimilaritySearch.meanPool(src, "group_id", "wembedding", dim = 512)
        .select(col("group_id"),
          round(graft.functions.Distances.norm(col("pooled")), 6)
            .as("pooled_norm"),
          round(element_at(col("pooled"), 1), 6).as("pooled_x0"),
          round(element_at(col("pooled"), 512), 6).as("pooled_x511"))
        .orderBy("group_id")
    }),

    // k-NN graph construction over the shared LSH pair graph: each
    // vector's top-KnnK neighbors by cosine among its tau-similar
    // candidates — the adjacency SemDeDup/graph-based curation and
    // diversity sampling consume. The rank window partitions by vector
    // id (candidate lists are LSH-bucket sized, never corpus sized), so
    // ranking distributes at any scale; vectors with no tau-neighbor
    // are absent, exactly as in the oracle.
    "knn_graph" -> ((s, dir) => {
      val p = sharedEmbedPairs(s, dir)
      val sym = p.select(col("id_a").as("id"), col("id_b").as("nbr_id"),
          col("sim"))
        .unionByName(p.select(col("id_b").as("id"), col("id_a").as("nbr_id"),
          col("sim")))
      val w = Window.partitionBy("id").orderBy(col("sim").desc, col("nbr_id"))
      sym.withColumn("rank", row_number().over(w))
        .where(col("rank") <= KnnK)
        .select(col("id"), col("nbr_id"), col("sim"), col("rank"))
        .orderBy("id", "rank")
    }),

    // Double-sweep diameter bound (Magnien, Latapy & Habib, JEA 2009) of
    // the LARGEST near-dup component — the transitive-chaining
    // diagnostic for τ-threshold dedup: CC glues A~B~C even when A≁C,
    // and this gate measures exactly how long those chains get (diameter
    // 1 = true clique of mutual dups; large diameter = drift). BFS from
    // the component's min-id vertex (its CC label — deterministic), then
    // BFS from the farthest vertex found (ties → min id); the second
    // eccentricity is the classic 2-BFS diameter lower bound, exact on
    // trees. Driver traffic is two 1-row argmax collects between
    // fixpoints (the kcenter_coreset legging idiom); each sweep is the
    // bfs_hops frontier fixpoint (all shuffles keyed), and rounds are
    // bounded by the component diameter — small by construction for
    // cohesive near-dup groups, which is the point of the measurement.
    // Oracle: recursive-CTE CC picks the same root, two recursive-CTE
    // BFS walks replay the sweeps.
    "graph_diameter" -> ((s, dir) => {
      import s.implicits._
      val e = sharedEmbedPairs(s, dir)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val comp = sharedEmbedComp(s, dir)
      val top = comp.groupBy("component").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("component")).limit(1).head()
      val (root, nv) = (top.getLong(0), top.getLong(1))
      // symmetrize + checkpoint the simple edge view ONCE for both
      // sweeps (round 15) — the second BFS walks the same graph, so
      // re-deriving the adjacency per sweep was a full extra
      // shuffle+materialization of the edge set
      val sym = graft.graph.Traversals.symmetrize(e)
        .localCheckpoint(eager = false)
      val b1 = graft.graph.Traversals.bfsHopsSym(sym, Seq(root).toDF("id"),
        maxHops = DiamMaxHops)
      val far1 = b1.orderBy(col("hops").desc, col("id")).limit(1).head()
      val (farId, eccStart) = (far1.getLong(0), far1.getInt(1))
      val b2 = graft.graph.Traversals.bfsHopsSym(sym, Seq(farId).toDF("id"),
        maxHops = DiamMaxHops)
      graft.core.LineageCut.release(sym)
      b2.agg(max("hops").as("diameter_lb"))
        .select(lit(root).as("component"), lit(nv).as("n_vertices"),
          lit(eccStart).as("ecc_start"), lit(farId).as("far_id"),
          col("diameter_lb"))
    }),

    // GraphSAGE-style neighbor feature aggregation (Hamilton et al.,
    // NeurIPS'17's AGGREGATE step as data prep): each vector pools its
    // kNN-graph neighbors' int8-quantized codes — the node-feature
    // construction a GNN/diversity pipeline feeds on. Quantizing first
    // (embed_quant's kernel) keeps the pool EXACT integers, so the
    // element-wise neighbor sum is order-independent and hash-exact.
    // Plan: the memoized LSH pair graph → per-id rank window (bucket-
    // bounded lists, as in knn_graph) → one id-keyed join to the code
    // table → (id, dim)-keyed sum → id-keyed rollup; every shuffle keyed,
    // fan-out bounded by KnnK·dim.
    "nbr_pool" -> ((s, dir) => {
      import graft.operators.VecQuant
      val p = sharedEmbedPairs(s, dir)
      val sym = p.select(col("id_a").as("id"), col("id_b").as("nbr_id"),
          col("sim"))
        .unionByName(p.select(col("id_b").as("id"),
          col("id_a").as("nbr_id"), col("sim")))
      val w = Window.partitionBy("id").orderBy(col("sim").desc,
        col("nbr_id"))
      val knn = sym.withColumn("rank", row_number().over(w))
        .where(col("rank") <= KnnK).select(col("id"), col("nbr_id"))
      val e = embs(s, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("vec"))
      val q = e.select(col("vec_id"),
        VecQuant.quantize(col("vec"), VecQuant.quantScale(col("vec")))
          .as("qc"))
      val nn = knn.groupBy("id").agg(count(lit(1)).as("n_nbrs"))
      val perDim = knn.join(q, knn("nbr_id") === q("vec_id"))
        .select(col("id"), posexplode(col("qc")).as(Seq("dim", "qv")))
        .groupBy("id", "dim").agg(sum(col("qv").cast("long")).as("sv"))
      val pooled = perDim.groupBy("id").agg(
        sum(abs(col("sv"))).as("pool_l1"), sum(col("sv")).as("pool_sum"))
      nn.join(pooled, "id").orderBy("id")
    }),

    // SemDeDup-style semantic dedup endpoint: embedding near-dup pairs
    // (sign-band LSH candidates + exact cosine verify — the same
    // cartesian-free graph embed_pairs_lsh certifies) → connected
    // components → one group id (min member) per vector, with the
    // keep/drop flag a dedup pass acts on. Oracle = recursive-CTE
    // min-label propagation over the same cosine pair graph.
    "embed_dedup" -> ((s, dir) => {
      val e = embs(s, dir)
      val comp = sharedEmbedComp(s, dir)
      e.select(col("vec_id"))
        .join(comp, e("vec_id") === comp("id"), "left")
        .select(col("vec_id"),
          coalesce(col("component"), col("vec_id")).as("group_id"))
        .withColumn("is_kept", col("vec_id") === col("group_id"))
        .orderBy("vec_id")
    }),

    // int8 embedding quantization: per-vector scale, quantized-code sum
    // (integer-exact), and the L1 reconstruction error — the float32→int8
    // storage compression step of an embedding pipeline, value-hash-exact
    // against the oracle (see VecQuant float-determinism notes)
    "embed_quant" -> ((s, dir) => {
      import graft.operators.VecQuant
      val e = embs(s, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("vec"))
      val withScale = e.withColumn("scale", VecQuant.quantScale(col("vec")))
      val withQ = withScale.withColumn("q",
        VecQuant.quantize(col("vec"), col("scale")))
      withQ.select(col("vec_id"),
        round(col("scale"), 6).as("scale6"),
        aggregate(col("q"), lit(0L), (acc, qi) => acc + qi.cast("long"))
          .as("qsum"),
        round(VecQuant.reconstructionError(col("vec"), col("q"), col("scale")), 6)
          .as("err6"))
        .orderBy("vec_id")
    }),

    // IVF-bucketed ANN end-to-end (Lloyd quantizer, seed 42). The raw hit
    // list is approximate by nature, so the gate emits the MEASURABLE
    // contract instead: every query answered with a full top-k (counts
    // cross-checked — the oracle derives n_queries and n_results from
    // the table itself, not from Spark's output) and macro recall@k
    // against the exact brute top-k (computed in-engine — the same
    // kernel the hash-green ann_topk gate certifies) above 0.5. The
    // floor is deliberately the CONTRACT line, not the measurement: the
    // synthetic embeddings are near-uniform (worst case for IVF), where
    // blind nprobe/nlist probing would recall 0.375 — measured macro
    // recall is a stable 0.56-0.58 at sf0.001/0.01/0.1.
    "ann_ivf" -> ((s, dir) => {
      // the recall cross-check needs the exact brute top-k, so the gate
      // corpus is BruteCap'd like the other brute baselines (a no-op at
      // every current SF); IVF's own uncapped scale path — equi-join
      // probes, candidate work independent of corpus size — is the
      // oracle-exact ann_ivf_fixed
      val e = embs(s, dir).where(col("vec_id") < BruteCap)
      val q = e.where(col("vec_id") < NQueries)
      val idx = SimilaritySearch.ivfIndex(e, "vec_id", "embedding",
        nlist = 8, seed = 42)
      val ivf = idx.search(q, "vec_id", "embedding", TopK, nprobe = NProbe)
      val brute = SimilaritySearch.cosineTopK(e, q, "vec_id", "embedding",
        TopK).select(col("q_id"), col("id"))
      val nHits = ivf.join(brute, Seq("q_id", "id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      ivf.agg(countDistinct("q_id").cast("long").as("n_queries"),
          count(lit(1)).cast("long").as("n_results"))
        .crossJoin(nHits)
        .select(col("n_queries"), col("n_results"),
          (col("n_hits") * 2 >= NQueries * TopK).cast("int")
            .as("recall_ge_half"))
    }),

    // The ann_ivf recall floor (0.5) is honest for the near-uniform
    // synthetic embeddings — IVF's worst case. THIS gate is the contract
    // on data IVF is actually built for: the same embeddings shifted into
    // 8 separable cosine clusters (a +10.0 bump on dimensions ≡ vec_id
    // mod 8 — one IEEE double add per element, deterministic in any
    // engine), where the Lloyd quantizer must recover the cluster
    // structure and macro recall@10 vs the in-engine brute top-k (the
    // kernel the hash-green ann_topk certifies) must clear 0.9. Counts
    // are recomputed by the oracle from the table as in ann_ivf.
    "ann_ivf_clustered" -> ((s, dir) => {
      val shifted = transform(col("embedding").cast("array<double>"),
        (x, i) => x + when(i % 8 === col("vec_id") % 8, lit(10.0))
          .otherwise(lit(0.0)))
      val e = embs(s, dir).where(col("vec_id") < BruteCap)
        .select(col("vec_id"), shifted.as("embedding"))
      val q = e.where(col("vec_id") < NQueries)
      val idx = SimilaritySearch.ivfIndex(e, "vec_id", "embedding",
        nlist = 8, seed = 42)
      val ivf = idx.search(q, "vec_id", "embedding", TopK, nprobe = NProbe)
      val brute = SimilaritySearch.cosineTopK(e, q, "vec_id", "embedding",
        TopK).select(col("q_id"), col("id"))
      val nHits = ivf.join(brute, Seq("q_id", "id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      ivf.agg(countDistinct("q_id").cast("long").as("n_queries"),
          count(lit(1)).cast("long").as("n_results"))
        .crossJoin(nHits)
        .select(col("n_queries"), col("n_results"),
          (col("n_hits") * 10 >= NQueries * TopK * 9).cast("int")
            .as("recall_ge_09"))
    }),

    // The IVF probe→score→rank machinery under the oracle: centroids are
    // FIXED (the first NList embedding vectors — deterministic and
    // SQL-expressible at any SF), so bucket assignment, probing, and
    // ranking are all pure. The collect is NList rows (O(nlist·dim), the
    // same driver-scalar shape as the quantizer fit). ann_ivf stays as the
    // recall-spec'd Lloyd end-to-end.
    "ann_ivf_fixed" -> ((s, dir) => {
      val e = embs(s, dir)
      val idx = SimilaritySearch.ivfIndexFixed(e, "vec_id", "embedding",
        fixedCentroids(e, 0, NList))
      idx.search(e.where(col("vec_id") < NQueries), "vec_id", "embedding",
        TopK, nprobe = NProbe).orderBy("q_id", "rank")
    }),

    // The nprobe tuning curve for fixed-quantizer IVF — recall@k vs
    // probe count, the plot an ANN deployment is tuned from — fully
    // VALUE-exact (unlike the Lloyd gates' contract rows) because the
    // quantizer is ann_ivf_fixed's: deterministic fixed centroids make
    // probing, ranking, and the brute cross-check all SQL-expressible.
    // Recall is integer ppm over the constant q·k denominator; the
    // curve is monotone by construction (probe sets nest). Each leg
    // reuses the same index; candidate work stays bucket-bounded.
    "ivf_nprobe_curve" -> ((s, dir) => {
      val e = embs(s, dir).where(col("vec_id") < BruteCap)
      val q = e.where(col("vec_id") < NQueries)
      val idx = SimilaritySearch.ivfIndexFixed(e, "vec_id", "embedding",
        fixedCentroids(e, 0, NList))
      val brute = SimilaritySearch.cosineTopK(e, q, "vec_id", "embedding",
        TopK).select(col("q_id"), col("id"))
      (1 to NProbeMax).map { np =>
        idx.search(q, "vec_id", "embedding", TopK, nprobe = np)
          .join(brute, Seq("q_id", "id"), "left_semi")
          .agg(count(lit(1)).as("n_hits"))
          .select(lit(np).as("nprobe"), col("n_hits"),
            expr(s"n_hits * 1000000 div ${NQueries * TopK}")
              .as("recall_ppm"))
      }.reduce(_.unionByName(_)).orderBy("nprobe")
    }),

    // Product quantization, fixed deterministic codebook (subvectors of
    // the first PqKs corpus vectors — the externally-trained-codebook
    // seam, SQL-expressible like ann_ivf_fixed): every vector encoded to
    // PqM small codes in one shuffle-free projection.
    "pq_encode" -> ((s, dir) => {
      graft.operators.ProductQuant.encode(
          embs(s, dir), "vec_id", "embedding", pqCodebook(s, dir))
        .select(Seq(col("id").as("vec_id")) ++
          (0 until PqM).map(j =>
            element_at(col("codes"), j + 1).as(s"c$j")): _*)
        .orderBy("vec_id")
    }),

    // ADC ranking over the PQ codes: per query one m×ks lookup table
    // (computed once on the driver, broadcast), corpus scanned once
    // summing m lookups per row, ranking through the partial top-k
    // aggregate — O(queries·k) shuffle rows, zero corpus-side vector
    // arithmetic.
    "pq_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      val cb = pqCodebook(s, dir)
      val qs = e.where(col("vec_id") < NQueries)
        .select(col("vec_id").cast("long"),
          col("embedding").cast("array<double>"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toSeq
      graft.operators.ProductQuant.adcTopK(
          graft.operators.ProductQuant.encode(e, "vec_id", "embedding", cb),
          qs, cb, TopK)
        .orderBy("q_id", "rank")
    }),

    // Two-stage retrieval (the production shape: cheap approximate scan,
    // exact rerank of a small candidate set): PQ-ADC ranks the whole
    // corpus per query at m-lookups-per-row cost, the top-RefineN
    // candidates rerank by EXACT cosine, top-K of that ships. Candidate
    // fetch is an id equi-join; the query vectors broadcast; rerank cost
    // is O(queries·RefineN·dim) regardless of corpus size.
    "ann_refine" -> ((s, dir) => {
      val e = embs(s, dir)
      val cb = pqCodebook(s, dir)
      val qs = e.where(col("vec_id") < NQueries)
        .select(col("vec_id").cast("long"),
          col("embedding").cast("array<double>"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toSeq
      val cand = graft.operators.ProductQuant.adcTopK(
          graft.operators.ProductQuant.encode(e, "vec_id", "embedding", cb),
          qs, cb, RefineN)
        .select(col("q_id"), col("id"))
      val vecs = e.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("vec"))
      val qv = e.where(col("vec_id") < NQueries)
        .select(col("vec_id").cast("long").as("q_id"),
          col("embedding").cast("array<double>").as("q_vec"))
      val scored = cand.join(vecs, "id").join(broadcast(qv), "q_id")
        .select(col("q_id"), col("id"),
          round(graft.functions.Distances.cosine(col("q_vec"), col("vec")), 6)
            .as("sim"))
      SimilaritySearch.rankTopK(scored, TopK).orderBy("q_id", "rank")
    }),

    // IVF-PQ — the billion-vector ANN composition, fully under the
    // oracle because both quantizers are fixed: coarse probe prunes to
    // NProbe buckets (ann_ivf_fixed's machinery), ADC over PQ codes
    // ranks the candidates (pq_topk's machinery). Candidate work is
    // bounded by probed-bucket population; per-candidate cost is PqM
    // table lookups, independent of dimension.
    "ann_ivfpq" -> ((s, dir) => {
      val e = embs(s, dir)
      graft.operators.ProductQuant.ivfAdcTopK(
          e, "vec_id", "embedding", fixedCentroids(e, 0, NList),
          pqCodebook(s, dir),
          e.where(col("vec_id") < NQueries), TopK, NProbe)
        .orderBy("q_id", "rank")
    }),

    // Degree distribution of the near-dup pair graph — the dedup health
    // diagnostic (a fat tail here means a template cluster is about to
    // blow up the CC step). Shares the memoized pair set; two keyed
    // map-side-combined aggregations after it.
    "degree_hist" -> ((s, dir) => {
      val p = sharedEmbedPairs(s, dir)
      val sym = p.select(col("id_a").as("id"))
        .union(p.select(col("id_b").as("id")))
      sym.groupBy("id").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")
    }),

    // Degree assortativity of the pair graph (Newman 2002), in the
    // sqrt-free symmetric form r = (m·Σxy − (Σx)²) / (m·Σxx − (Σx)²)
    // over the symmetrized edge list — every sum is an exact integer, so
    // the single final division is the only float op in either engine.
    // Degrees broadcast onto the edges; one global aggregate.
    "assortativity" -> ((s, dir) => {
      val p = sharedEmbedPairs(s, dir).select("id_a", "id_b")
      val sym = p.union(p.select(col("id_b").as("id_a"),
        col("id_a").as("id_b")))
      val deg = sym.groupBy(col("id_a").as("id"))
        .agg(count(lit(1)).as("degree"))
      val j = sym
        .join(broadcast(deg.select(col("id").as("id_a"),
          col("degree").as("da"))), Seq("id_a"))
        .join(broadcast(deg.select(col("id").as("id_b"),
          col("degree").as("db"))), Seq("id_b"))
      val s1 = j.agg(count(lit(1)).as("m"), sum("da").as("sx"),
        sum(col("da") * col("db")).as("sxy"),
        sum(col("da") * col("da")).as("sxx"))
      val dd = deg.agg(count(lit(1)).as("n_nodes"),
        max("degree").as("max_degree"))
      dd.crossJoin(broadcast(s1))
        .select(col("n_nodes"), (col("m") / 2).cast("long").as("n_edges"),
          col("max_degree"),
          round((col("m") * col("sxy") - col("sx") * col("sx"))
            .cast("double") /
            (col("m") * col("sxx") - col("sx") * col("sx")).cast("double"),
            6).as("assortativity"))
    }),

    // Embedding-distribution drift between corpus snapshots — the
    // monitoring twin of token_drift for the vector side: the corpus
    // splits into an "old" and "new" half (vec_id parity — the
    // deterministic stand-in for snapshot ids), and each label reports
    // its centroid's L2 shift plus the population delta. Two meanPool
    // passes (label-keyed, map-side-combined) + one 10-row join; the
    // centroid join is broadcast, so the plan is two scans at any
    // corpus size.
    "embed_drift" -> ((s, dir) => {
      val e = embs(s, dir).select(col("label"), col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      def pool(half: DataFrame) = SimilaritySearch.meanPool(
        half.select(col("label").as("group_id"), col("emb").as("embedding")),
        "group_id", "embedding", dim = 64)
      val old = e.where(col("vec_id") % 2 === 0)
      val nw = e.where(col("vec_id") % 2 =!= 0)
      val po = pool(old).select(col("group_id").as("label"),
        col("pooled").as("po"))
      val pn = pool(nw).select(col("group_id").as("label"),
        col("pooled").as("pn"))
      val counts = e.groupBy("label").agg(
        count(when(col("vec_id") % 2 === 0, 1)).as("n_old"),
        count(when(col("vec_id") % 2 =!= 0, 1)).as("n_new"))
      counts.join(broadcast(po), Seq("label"))
        .join(broadcast(pn), Seq("label"))
        .select(col("label"), col("n_old"), col("n_new"),
          round(graft.functions.Distances.norm(
            zip_with(col("po"), col("pn"), (x, y) => x - y)), 6)
            .as("drift"))
        .orderBy("label")
    }),

    // Johnson–Lindenstrauss random projection 64 → 16 dims with a ±1
    // sign matrix (Achlioptas 2003) — the cheap dim-reduction in front
    // of ANN/clustering at scale. Each output dim is ONE pass of the
    // native sequential-fold dot kernel against a literal sign row
    // (bit-equal to DuckDB's list_dot_product by fold order), scaled by
    // 1/4 = 1/√16 (an exact power of two). dist_ratio = ‖y‖²/‖x‖² is
    // the per-vector JL distortion, a left-assoc 16-term chain in both
    // engines. A pure projection: zero shuffles before the final sort.
    "jl_project" -> ((s, dir) => {
      val e = col("embedding").cast("array<double>")
      val ys = jlSigns.map(row =>
        graft.functions.Distances.dot(e, typedLit(row.toSeq)) * 0.25d)
      val sq = ys.map(y => y * y).reduceLeft(_ + _)
      embs(s, dir).select(col("vec_id"),
          round(ys(0), 6).as("y0"),
          round(ys(JlDim / 2), 6).as("y8"),
          round(ys(JlDim - 1), 6).as("y15"),
          round(sq / graft.functions.Distances.dot(e, e), 6)
            .as("dist_ratio"))
        .orderBy("vec_id")
    }),

    // SemDeDup (Abbas et al., arXiv:2303.09540): cluster the embedding
    // space, then prune near-duplicates ONLY within each cluster — the
    // clustering bounds the quadratic verification the way LSH bands
    // bound minhash_pairs, which is what lets semantic dedup run at
    // corpus scale (pair work per cluster, never per corpus). Centroids
    // are the first NList vectors (the ann_ivf_fixed seam), so assignment
    // is deterministic and SQL-expressible; a vector is dropped iff a
    // lower-id same-cluster vector is cosine-≥ CosTau similar (the
    // paper's keep-one policy with min-id as the canonical survivor).
    // Fixed-centroid assignment on real embedding distributions is
    // SKEWED, and a plain bucket equi-join puts a mega-bucket's whole
    // O(n_b²) verify in one task — the pair join therefore runs through
    // SkewJoin.blockedSelfPairs (exact triangle blocking: identical pair
    // set, per-task pair work capped at ~SemDedupBlockCap², one hot
    // bucket spread over O((n_b/cap)²) tasks). The dropped id is
    // greatest(id_a, id_b): blocked pairs surface in hash order, and
    // cosine is symmetric, so this is exactly the id_a < id_b drop rule.
    "semdedup" -> ((s, dir) => {
      val assigned = sharedSemDedupAssigned(s, dir)
      val dropped = graft.operators.SkewJoin.blockedSelfPairs(
          assigned, "bucket", "id", cap = SemDedupBlockCap)
        .where(round(graft.functions.Distances.cosine(
          col("vec_a"), col("vec_b")), 6) >= CosTau)
        .select(col("bucket"),
          greatest(col("id_a"), col("id_b")).as("id_b")).distinct()
      assigned.groupBy("bucket").agg(count(lit(1)).as("n_total"))
        .join(dropped.groupBy("bucket").agg(count(lit(1)).as("n_dropped")),
          Seq("bucket"), "left")
        .select(col("bucket").cast("long").as("cluster"), col("n_total"),
          (col("n_total") - coalesce(col("n_dropped"), lit(0L)))
            .as("n_kept"))
        .orderBy("cluster")
    }),

    // Hard-negative mining for contrastive training (the in-batch-
    // negatives upgrade every retrieval-model pipeline ships): for each
    // query, the most cosine-similar corpus vectors whose LABEL differs —
    // similar enough to be hard, labeled different so they are true
    // negatives. The scale path is candidate-bounded end to end: the
    // fixed-quantizer IVF probe ranks TopK·4 candidates per query
    // (ann_ivf_fixed's exact machinery), the label filter and final
    // rerank run on that bounded stream, never the corpus. Fewer than
    // TopK survivors per query is possible and deterministic.
    "hard_negatives" -> ((s, dir) => {
      val e = embs(s, dir)
      val idx = SimilaritySearch.ivfIndexFixed(e, "vec_id", "embedding",
        fixedCentroids(e, 0, NList))
      val labels = e.select(col("vec_id"), col("label"))
      val cand = idx.search(e.where(col("vec_id") < NQueries), "vec_id",
        "embedding", TopK * 4, nprobe = NProbe)
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("id"))
      cand
        .join(labels.select(col("vec_id").as("id"),
          col("label").as("id_label")), "id")
        .join(labels.select(col("vec_id").as("q_id"),
          col("label").as("q_label")), "q_id")
        .where(col("id_label") =!= col("q_label"))
        .withColumn("neg_rank", row_number().over(w))
        .where(col("neg_rank") <= TopK)
        .select(col("q_id"), col("id"), col("sim"),
          col("neg_rank").cast("int").as("neg_rank"))
        .orderBy("q_id", "neg_rank")
    }),

    // PER-QUERY reciprocal-rank fusion (Cormack, Clarke & Büttcher,
    // SIGIR'09) — the retrieval-time sibling of rank_fusion (which fuses
    // two GLOBAL corpus rankings): per query, the IVF semantic
    // candidates (hard_negatives' probe machinery, TopK·4) are re-ranked
    // within the pool by the documents' quality prior, and the two ranks
    // fuse as Σ 10⁶ div (RrfK + r) — exact integers, so fusion order
    // can't flip a tie. Both rankings and the fusion window are
    // per-query over the probe-bounded pool: candidate work never
    // touches the corpus, the quality join is id-keyed, and no global
    // rank exists anywhere — the plan a hybrid search serves per request.
    "rrf_fusion" -> ((s, dir) => {
      val e = embs(s, dir)
      val idx = SimilaritySearch.ivfIndexFixed(e, "vec_id", "embedding",
        fixedCentroids(e, 0, NList))
      val cand = idx.search(e.where(col("vec_id") < NQueries), "vec_id",
        "embedding", TopK * 4, nprobe = NProbe)
      val q6 = table(s, dir, "documents").select(col("doc_id").as("id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q6"))
      val wq = Window.partitionBy("q_id").orderBy(col("q6").desc, col("id"))
      val wf = Window.partitionBy("q_id")
        .orderBy(col("rrf").desc, col("id"))
      cand.join(q6, "id")
        .withColumn("r_qual", row_number().over(wq))
        .withColumn("rrf",
          expr(s"1000000L div ($RrfK + rank) + 1000000L div ($RrfK + r_qual)"))
        .withColumn("fused_rank", row_number().over(wf))
        .where(col("fused_rank") <= TopK)
        .select(col("q_id"), col("id"), col("rrf"),
          col("fused_rank").cast("int").as("fused_rank"))
        .orderBy("q_id", "fused_rank")
    }),

    // Cluster purity against the embeddings' ground-truth labels — the
    // external-validation twin of ari_clusterings (a label-aware check a
    // pipeline runs when a labeled eval slice exists). Fixed-centroid
    // assignment (ann_ivf_fixed's seam), per-(cluster, label) contingency
    // counts, majority label per cluster by (count desc, label) — all
    // exact integers, purity as integer ppm. Plan: broadcast-kernel
    // assignment, one contingency groupBy, a cluster-partitioned rank
    // window over the k·|labels|-row table.
    "cluster_purity" -> ((s, dir) => {
      val e = embs(s, dir)
      val assigned = SimilaritySearch.ivfIndexFixed(
          e, "vec_id", "embedding", fixedCentroids(e, 0, NList)).indexed
        .join(e.select(col("vec_id"), col("label")),
          col("id") === col("vec_id"))
      val byLab = assigned.groupBy("bucket", "label")
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("bucket")
        .orderBy(col("c").desc, col("label"))
      byLab
        .withColumn("n", sum("c").over(Window.partitionBy("bucket")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("bucket").cast("long").as("cluster"),
          col("n").cast("long").as("n"),
          col("label").cast("long").as("maj_label"),
          col("c").as("n_major"),
          expr("(c * 1000000) div n").cast("long").as("purity_ppm"))
        .orderBy("cluster")
    }),

    // Adjusted Rand Index between two clusterings of the same corpus
    // (Hubert & Arabie 1985) — the agreement score a curation pipeline
    // checks before swapping a new clustering run in for the reference
    // one. The two clusterings are fixed-centroid assignments from
    // disjoint centroid sets (vec_id < NList vs the next NList — the
    // deterministic ann_ivf_fixed seam). Every pair count is an exact
    // integer; the expected-index product sum_a·sum_b grows ~n⁴/4 and
    // leaves 2^53 around n≈13k, so the double arithmetic is not exact at
    // scale — it IS engine-identical (both engines evaluate the same op
    // chain in the same order on the same exact-integer inputs), which
    // is what the hash oracle pins. Plan: two
    // broadcast-kernel assignments, one contingency groupBy, 1-row
    // scalar joins — no pair set is ever materialized.
    "ari_clusterings" -> ((s, dir) => {
      val e = embs(s, dir)
      val a = SimilaritySearch.ivfIndexFixed(e, "vec_id", "embedding",
          fixedCentroids(e, 0, NList)).indexed
        .select(col("id"), col("bucket").as("ba"))
      val b = SimilaritySearch.ivfIndexFixed(e, "vec_id", "embedding",
        fixedCentroids(e, NList, 2 * NList)).indexed
        .select(col("id"), col("bucket").as("bb"))
      val ab = a.join(b, "id")
      def c2(df: DataFrame, keys: String*) = df
        .groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(sum(expr("(c * (c - 1)) div 2")).cast("long"))
      val sIdx = c2(ab, "ba", "bb").toDF("sum_idx")
      val sA = c2(ab, "ba").toDF("sum_a")
      val sB = c2(ab, "bb").toDF("sum_b")
      val expected = col("sum_a").cast("double") *
        col("sum_b").cast("double") /
        expr("(n * (n - 1)) div 2").cast("double")
      ab.agg(count(lit(1)).cast("long").as("n"))
        .crossJoin(broadcast(sIdx))
        .crossJoin(broadcast(sA))
        .crossJoin(broadcast(sB))
        .select(col("n"), col("sum_idx"), col("sum_a"), col("sum_b"),
          round((col("sum_idx").cast("double") - expected) /
            ((col("sum_a") + col("sum_b")).cast("double") / 2.0d -
              expected), 6).as("ari"))
    }))

  /** jl_project output dimensionality. */
  private val JlDim = 16
  /** Deterministic ±1 JL sign matrix (Achlioptas 2003): row k is the
    * sign vector for output dim k, derived from PolyHash("k:j") parity —
    * computed ONCE here and embedded as literal arrays in BOTH engines,
    * so no hashing happens at run time and the matrices agree by
    * construction. */
  private lazy val jlSigns: IndexedSeq[Array[Double]] =
    (0 until JlDim).map { k =>
      Array.tabulate(64) { j =>
        if (graft.functions.PolyHash.hash(s"$k:$j") % 2 == 0) 1.0 else -1.0
      }
    }

  private val sqlCos =
    "list_dot_product(a.e, b.e) / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))"

  /** Greedy farthest-first replayed leg by leg: sN scores every
    * not-yet-chosen candidate by max cosine to the chosen set chN−1, cN
    * is the (rounded-sim, id) argmin, chN accumulates. Same rounding and
    * tiebreak as the Spark side. */
  private def sqlKcenter: String = {
    def cos(x: String, c: String) =
      s"list_dot_product($x.e, $c.e) / (sqrt(list_dot_product($x.e, $x.e)) * sqrt(list_dot_product($c.e, $c.e)))"
    val legs = (1 until KCenterK).map { r =>
      s"""s$r AS (SELECT x.vec_id, round(max(${cos("x", "c")}), 6) AS msim
         |  FROM v x, ch${r - 1} c
         |  WHERE x.vec_id NOT IN (SELECT vec_id FROM ch${r - 1})
         |  GROUP BY x.vec_id),
         |c$r AS (SELECT s.vec_id, v.e, s.msim FROM s$r s
         |  JOIN v ON v.vec_id = s.vec_id
         |  ORDER BY s.msim, s.vec_id LIMIT 1),
         |ch$r AS (SELECT vec_id, e FROM ch${r - 1}
         |  UNION ALL SELECT vec_id, e FROM c$r)""".stripMargin
    }.mkString(",\n")
    val sel = (1 until KCenterK).map(r =>
      s"UNION ALL SELECT $r, vec_id, msim FROM c$r").mkString("\n")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |  FROM embeddings),
       |c0 AS (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 1),
       |ch0 AS (SELECT vec_id, e FROM c0),
       |$legs
       |SELECT CAST(0 AS INT) AS step, vec_id, CAST(NULL AS DOUBLE) AS max_sim
       |FROM c0
       |$sel
       |ORDER BY step""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "kcenter_coreset" -> sqlKcenter,
    // fixed-centroid assignment (ann_ivf_fixed's vb CTE), then the
    // within-cluster min-id keep policy as one self-join
    "semdedup" -> {
      val cos = (x: String, y: String) =>
        s"list_dot_product($x, $y) / (sqrt(list_dot_product($x, $x)) * sqrt(list_dot_product($y, $y)))"
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |cents AS (SELECT vec_id AS cluster, e AS c FROM v
         |  WHERE vec_id < $NList),
         |vb AS (SELECT vec_id, e, bucket FROM (
         |    SELECT a.vec_id, a.e, c.cluster AS bucket,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY -(${cos("a.e", "c.c")}), c.cluster) AS rn
         |    FROM v a CROSS JOIN cents c) WHERE rn = 1),
         |drp AS (SELECT DISTINCT b.bucket, b.vec_id FROM vb a JOIN vb b
         |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |    WHERE round(${cos("a.e", "b.e")}, 6) >= $CosTau),
         |tot AS (SELECT bucket, count(*) AS n_total FROM vb GROUP BY bucket),
         |d AS (SELECT bucket, count(*) AS n_dropped FROM drp GROUP BY bucket)
         |SELECT CAST(t.bucket AS BIGINT) AS cluster, t.n_total,
         |  t.n_total - coalesce(d.n_dropped, 0) AS n_kept
         |FROM tot t LEFT JOIN d USING (bucket) ORDER BY cluster""".stripMargin
    },
    // ann_ivf_fixed's probe→score→rank chain widened to TopK·4
    // candidates, then the different-label filter and the final rerank
    // in the same (sim desc, id) order
    "hard_negatives" -> {
      val cos = (x: String, y: String) =>
        s"list_dot_product($x, $y) / (sqrt(list_dot_product($x, $x)) * sqrt(list_dot_product($y, $y)))"
      s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |cents AS (SELECT vec_id AS cluster, e AS c FROM v
         |  WHERE vec_id < $NList),
         |vb AS (SELECT vec_id, cluster AS bucket FROM (
         |    SELECT a.vec_id, c.cluster,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY -(${cos("a.e", "c.c")}), c.cluster) AS rn
         |    FROM v a CROSS JOIN cents c) WHERE rn = 1),
         |qp AS (SELECT q_id, cluster AS bucket FROM (
         |    SELECT a.vec_id AS q_id, c.cluster,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY -(${cos("a.e", "c.c")}), c.cluster) AS rn
         |    FROM v a CROSS JOIN cents c WHERE a.vec_id < $NQueries)
         |  WHERE rn <= $NProbe),
         |scored AS (SELECT qp.q_id, vb.vec_id AS id,
         |    round(${cos("qa.e", "b.e")}, 6) AS sim
         |  FROM qp JOIN vb ON qp.bucket = vb.bucket
         |  JOIN v qa ON qa.vec_id = qp.q_id
         |  JOIN v b ON b.vec_id = vb.vec_id
         |  WHERE vb.vec_id <> qp.q_id),
         |cand AS (SELECT q_id, id, sim FROM (SELECT q_id, id, sim,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, id)
         |      AS rank FROM scored)
         |  WHERE rank <= ${TopK * 4}),
         |neg AS (SELECT c.q_id, c.id, c.sim,
         |    row_number() OVER (PARTITION BY c.q_id
         |      ORDER BY c.sim DESC, c.id) AS neg_rank
         |  FROM cand c
         |  JOIN v li ON li.vec_id = c.id
         |  JOIN v lq ON lq.vec_id = c.q_id
         |  WHERE li.label <> lq.label)
         |SELECT q_id, id, sim, CAST(neg_rank AS INT) AS neg_rank
         |FROM neg WHERE neg_rank <= $TopK ORDER BY q_id, neg_rank""".stripMargin
    },
    // same probe/candidate CTEs as hard_negatives, then the quality rank
    // within the pool and the integer RRF fusion
    "rrf_fusion" -> {
      val cos = (x: String, y: String) =>
        s"list_dot_product($x, $y) / (sqrt(list_dot_product($x, $x)) * sqrt(list_dot_product($y, $y)))"
      s"""WITH ${graft.queries.TextQueries.sqlToks},
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |cents AS (SELECT vec_id AS cluster, e AS c FROM v
         |  WHERE vec_id < $NList),
         |vb AS (SELECT vec_id, cluster AS bucket FROM (
         |    SELECT a.vec_id, c.cluster,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY -(${cos("a.e", "c.c")}), c.cluster) AS rn
         |    FROM v a CROSS JOIN cents c) WHERE rn = 1),
         |qp AS (SELECT q_id, cluster AS bucket FROM (
         |    SELECT a.vec_id AS q_id, c.cluster,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY -(${cos("a.e", "c.c")}), c.cluster) AS rn
         |    FROM v a CROSS JOIN cents c WHERE a.vec_id < $NQueries)
         |  WHERE rn <= $NProbe),
         |scored AS (SELECT qp.q_id, vb.vec_id AS id,
         |    round(${cos("qa.e", "b.e")}, 6) AS sim
         |  FROM qp JOIN vb ON qp.bucket = vb.bucket
         |  JOIN v qa ON qa.vec_id = qp.q_id
         |  JOIN v b ON b.vec_id = vb.vec_id
         |  WHERE vb.vec_id <> qp.q_id),
         |cand AS (SELECT q_id, id, rank FROM (SELECT q_id, id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, id)
         |      AS rank FROM scored)
         |  WHERE rank <= ${TopK * 4}),
         |q6 AS (SELECT doc_id AS id,
         |    ${graft.queries.TextQueries.sqlQuality} AS q6 FROM toks),
         |rq AS (SELECT c.q_id, c.id, c.rank,
         |    row_number() OVER (PARTITION BY c.q_id
         |      ORDER BY q6.q6 DESC, c.id) AS r_qual
         |  FROM cand c JOIN q6 ON q6.id = c.id),
         |f AS (SELECT q_id, id,
         |    CAST(1000000 // ($RrfK + rank)
         |      + 1000000 // ($RrfK + r_qual) AS BIGINT) AS rrf
         |  FROM rq),
         |fr AS (SELECT q_id, id, rrf,
         |    row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, id)
         |      AS fused_rank FROM f)
         |SELECT q_id, id, rrf, CAST(fused_rank AS INT) AS fused_rank
         |FROM fr WHERE fused_rank <= $TopK
         |ORDER BY q_id, fused_rank""".stripMargin
    },
    // fixed-centroid assignment joined to labels; majority via the same
    // (count desc, label) rank order as the Spark window
    "cluster_purity" -> {
      val cos = (x: String, y: String) =>
        s"list_dot_product($x, $y) / (sqrt(list_dot_product($x, $x)) * sqrt(list_dot_product($y, $y)))"
      s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |cents AS (SELECT vec_id AS cluster, e AS c FROM v
         |  WHERE vec_id < $NList),
         |vb AS (SELECT vec_id, label, bucket FROM (
         |    SELECT a.vec_id, a.label, c.cluster AS bucket,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY -(${cos("a.e", "c.c")}), c.cluster) AS rn
         |    FROM v a CROSS JOIN cents c) WHERE rn = 1),
         |bl AS (SELECT bucket, label, count(*) AS c FROM vb
         |  GROUP BY bucket, label),
         |r AS (SELECT bucket, label, c,
         |    CAST(sum(c) OVER (PARTITION BY bucket) AS BIGINT) AS n,
         |    row_number() OVER (PARTITION BY bucket
         |      ORDER BY c DESC, label) AS rn
         |  FROM bl)
         |SELECT CAST(bucket AS BIGINT) AS cluster, n,
         |  CAST(label AS BIGINT) AS maj_label, c AS n_major,
         |  CAST((c * 1000000) // n AS BIGINT) AS purity_ppm
         |FROM r WHERE rn = 1 ORDER BY cluster""".stripMargin
    },
    // two fixed-centroid assignments, contingency pair counts, the ARI
    // ratio written op-for-op as the Spark expression (one double divide
    // over exact integers)
    "ari_clusterings" -> {
      val cos = (x: String, y: String) =>
        s"list_dot_product($x, $y) / (sqrt(list_dot_product($x, $x)) * sqrt(list_dot_product($y, $y)))"
      def assign(lo: Int, hi: Int, out: String) =
        s"""(SELECT vec_id, bucket AS $out FROM (
           |    SELECT a.vec_id, c.cluster AS bucket,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY -(${cos("a.e", "c.c")}), c.cluster) AS rn
           |    FROM v a CROSS JOIN
           |      (SELECT vec_id AS cluster, e AS c FROM v
           |       WHERE vec_id >= $lo AND vec_id < $hi) c) WHERE rn = 1)""".stripMargin
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |ab AS (SELECT x.vec_id, x.ba, y.bb FROM
         |  ${assign(0, NList, "ba")} x JOIN
         |  ${assign(NList, 2 * NList, "bb")} y USING (vec_id)),
         |si AS (SELECT CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS sum_idx
         |  FROM (SELECT count(*) AS c FROM ab GROUP BY ba, bb)),
         |sa AS (SELECT CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS sum_a
         |  FROM (SELECT count(*) AS c FROM ab GROUP BY ba)),
         |sb AS (SELECT CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS sum_b
         |  FROM (SELECT count(*) AS c FROM ab GROUP BY bb)),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ab)
         |SELECT n, sum_idx, sum_a, sum_b,
         |  round((CAST(sum_idx AS DOUBLE) -
         |      CAST(sum_a AS DOUBLE) * CAST(sum_b AS DOUBLE) /
         |        CAST((n * (n - 1)) // 2 AS DOUBLE)) /
         |    (CAST(sum_a + sum_b AS DOUBLE) / 2.0 -
         |      CAST(sum_a AS DOUBLE) * CAST(sum_b AS DOUBLE) /
         |        CAST((n * (n - 1)) // 2 AS DOUBLE)), 6) AS ari
         |FROM nn, si, sa, sb""".stripMargin
    },
    "ann_topk" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings WHERE vec_id < $BruteCap),
         |scored AS (SELECT a.vec_id AS q_id, b.vec_id AS id,
         |    round($sqlCos, 6) AS sim
         |  FROM v a JOIN v b ON a.vec_id < $NQueries AND a.vec_id <> b.vec_id),
         |ranked AS (SELECT q_id, id, sim, row_number() OVER (
         |    PARTITION BY q_id ORDER BY sim DESC, id) AS rank
         |  FROM scored)
         |SELECT q_id, id, sim, CAST(rank AS INT) AS rank FROM ranked
         |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    // full-dim and truncated rankings share the (sim desc, id) order;
    // overlap per query via join, recall as integer ppm
    "matryoshka_recall" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings WHERE vec_id < $BruteCap),
         |fs AS (SELECT a.vec_id AS q_id, b.vec_id AS id,
         |    round($sqlCos, 6) AS sim
         |  FROM v a JOIN v b ON a.vec_id < $NQueries AND a.vec_id <> b.vec_id),
         |fr AS (SELECT q_id, id FROM (SELECT q_id, id, row_number()
         |    OVER (PARTITION BY q_id ORDER BY sim DESC, id) AS rank FROM fs)
         |  WHERE rank <= $TopK),
         |t AS (SELECT vec_id, list_slice(e, 1, $MatDim) AS e FROM v),
         |ts AS (SELECT a.vec_id AS q_id, b.vec_id AS id,
         |    round($sqlCos, 6) AS sim
         |  FROM t a JOIN t b ON a.vec_id < $NQueries AND a.vec_id <> b.vec_id),
         |tr AS (SELECT q_id, id FROM (SELECT q_id, id, row_number()
         |    OVER (PARTITION BY q_id ORDER BY sim DESC, id) AS rank FROM ts)
         |  WHERE rank <= $TopK),
         |h AS (SELECT fr.q_id, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM fr JOIN tr ON fr.q_id = tr.q_id AND fr.id = tr.id
         |  GROUP BY fr.q_id)
         |SELECT q.vec_id AS q_id,
         |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  CAST((1000000 * coalesce(h.n_hits, 0)) // $TopK AS BIGINT)
         |    AS recall_ppm
         |FROM (SELECT vec_id FROM v WHERE vec_id < $NQueries) q
         |LEFT JOIN h ON q.vec_id = h.q_id ORDER BY q_id""".stripMargin,
    "cosine_pairs" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings WHERE vec_id < $BruteCap)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($sqlCos, 6) AS sim
         |FROM v a JOIN v b ON a.vec_id < b.vec_id
         |WHERE round($sqlCos, 6) >= $CosTau
         |ORDER BY id_a, id_b""".stripMargin,
    "embed_pool" ->
      s"""WITH v AS (SELECT vec_id % 50 AS group_id,
         |    CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |u AS (SELECT group_id, i, avg(e[i]) AS m
         |  FROM v, range(1, 65) t(i) GROUP BY group_id, i),
         |p AS (SELECT group_id, list(m ORDER BY i) AS pooled
         |  FROM u GROUP BY group_id)
         |SELECT group_id,
         |  round(sqrt(list_dot_product(pooled, pooled)), 6) AS pooled_norm,
         |  round(pooled[1], 6) AS pooled_x0
         |FROM p ORDER BY group_id""".stripMargin,
    // same pipeline over the 8×-concatenated 512-dim vectors; the scaled
    // copies are integer-multiple IEEE products, so both engines build
    // bit-identical inputs and 6dp rounding absorbs avg associativity
    // exactly as in embed_pool
    "embed_pool_wide" -> {
      val copies = (1 to 8)
        .map(k => s"list_transform(e, x -> x * $k)").mkString(", ")
      s"""WITH v AS (SELECT vec_id % 50 AS group_id,
         |    CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |w AS (SELECT group_id, flatten([$copies]) AS we FROM v),
         |u AS (SELECT group_id, i, avg(we[i]) AS m
         |  FROM w, range(1, 513) t(i) GROUP BY group_id, i),
         |p AS (SELECT group_id, list(m ORDER BY i) AS pooled
         |  FROM u GROUP BY group_id)
         |SELECT group_id,
         |  round(sqrt(list_dot_product(pooled, pooled)), 6) AS pooled_norm,
         |  round(pooled[1], 6) AS pooled_x0,
         |  round(pooled[512], 6) AS pooled_x511
         |FROM p ORDER BY group_id""".stripMargin
    },
    // list_reduce without an init seeds from the FIRST element —
    // f(f(e1,e2),e3)... — which equals Spark's aggregate fold seeded with
    // 0 (0.0 + x == x for the non-negative summands here), so the error
    // fold associates identically on both engines
    // the embed_dedup pair graph + recursive-CTE CC (so the root matches
    // the Spark labeling exactly), then two recursive BFS walks replay
    // the sweeps (bfs_hops' walk idiom)
    "graph_diameter" ->
      s"""WITH RECURSIVE
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |pr AS (SELECT a.vec_id AS src, b.vec_id AS dst
         |  FROM v a JOIN v b ON a.vec_id < b.vec_id
         |  WHERE round($sqlCos, 6) >= $CosTau),
         |sym AS (SELECT src, dst FROM pr UNION SELECT dst, src FROM pr),
         |verts AS (SELECT DISTINCT src AS id FROM sym),
         |walk(id, reach) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT s.dst, w.reach FROM walk w JOIN sym s ON s.src = w.id),
         |comp AS (SELECT id, min(reach) AS component FROM walk GROUP BY id),
         |sizes AS (SELECT component, count(*) AS csize FROM comp
         |          GROUP BY component),
         |root AS (SELECT component AS rid, csize FROM sizes
         |         ORDER BY csize DESC, component LIMIT 1),
         |b1(id, hops) AS (
         |  SELECT rid, 0 FROM root
         |  UNION
         |  SELECT s.dst, w.hops + 1 FROM b1 w JOIN sym s ON s.src = w.id
         |  WHERE w.hops < $DiamMaxHops),
         |d1 AS (SELECT id, min(hops) AS h FROM b1 GROUP BY id),
         |far AS (SELECT id AS fid, h AS ecc1 FROM d1
         |        ORDER BY h DESC, id LIMIT 1),
         |b2(id, hops) AS (
         |  SELECT fid, 0 FROM far
         |  UNION
         |  SELECT s.dst, w.hops + 1 FROM b2 w JOIN sym s ON s.src = w.id
         |  WHERE w.hops < $DiamMaxHops),
         |d2 AS (SELECT id, min(hops) AS h FROM b2 GROUP BY id)
         |SELECT (SELECT rid FROM root) AS component,
         |  (SELECT csize FROM root) AS n_vertices,
         |  (SELECT CAST(ecc1 AS INT) FROM far) AS ecc_start,
         |  (SELECT fid FROM far) AS far_id,
         |  (SELECT CAST(max(h) AS INT) FROM d2) AS diameter_lb""".stripMargin,
    // knn_graph's ranked-candidate CTE + embed_quant's quantization CTE,
    // composed; the zipped unnests expand (code, dim) in lockstep and the
    // sums are CAST back to BIGINT (DuckDB widens sum(BIGINT) to HUGEINT)
    "nbr_pool" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |sym AS (SELECT a.vec_id AS id, b.vec_id AS nbr_id,
         |    round($sqlCos, 6) AS sim
         |  FROM v a JOIN v b ON a.vec_id <> b.vec_id
         |  WHERE round($sqlCos, 6) >= $CosTau),
         |ranked AS (SELECT id, nbr_id, row_number() OVER (
         |    PARTITION BY id ORDER BY sim DESC, nbr_id) AS rank FROM sym),
         |knn AS (SELECT id, nbr_id FROM ranked WHERE rank <= $KnnK),
         |sc AS (SELECT vec_id, e,
         |    coalesce(list_max(list_transform(e, x -> abs(x))), 0.0) / 127.0
         |      AS scale
         |  FROM v),
         |q AS (SELECT vec_id,
         |    CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
         |         ELSE list_transform(e, x -> CAST(round(x / scale) AS INT))
         |    END AS qc
         |  FROM sc),
         |ex AS (SELECT k.id AS id, unnest(q.qc) AS qv,
         |    unnest(range(1, len(q.qc) + 1)) AS dim
         |  FROM knn k JOIN q ON q.vec_id = k.nbr_id),
         |pd AS (SELECT id, dim, CAST(sum(qv) AS BIGINT) AS sv
         |  FROM ex GROUP BY id, dim),
         |nn AS (SELECT id, count(*) AS n_nbrs FROM knn GROUP BY id)
         |SELECT n.id, n.n_nbrs,
         |  CAST(sum(abs(p.sv)) AS BIGINT) AS pool_l1,
         |  CAST(sum(p.sv) AS BIGINT) AS pool_sum
         |FROM nn n JOIN pd p USING (id)
         |GROUP BY n.id, n.n_nbrs ORDER BY n.id""".stripMargin,
    "embed_quant" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |s AS (SELECT vec_id, e,
         |    coalesce(list_max(list_transform(e, x -> abs(x))), 0.0) / 127.0
         |      AS scale
         |  FROM v),
         |q AS (SELECT vec_id, e, scale,
         |    CASE WHEN scale = 0 THEN list_transform(e, x -> 0)
         |         ELSE list_transform(e, x -> CAST(round(x / scale) AS INT))
         |    END AS qc
         |  FROM s)
         |SELECT vec_id,
         |  round(scale, 6) AS scale6,
         |  list_reduce(list_transform(qc, x -> CAST(x AS BIGINT)),
         |    (acc, x) -> acc + x) AS qsum,
         |  round(list_reduce(list_transform(range(1, len(e) + 1),
         |      i -> abs(e[i] - CAST(qc[i] AS DOUBLE) * scale)),
         |    (acc, x) -> acc + x), 6) AS err6
         |FROM q ORDER BY vec_id""".stripMargin,
    // the whole fixed-centroid IVF pipeline in SQL: bucket = argmax cosine
    // vs the first NList vectors (tie → lowest cluster, the kernel's
    // (-cos, cluster) order), probes = top NProbe buckets per query,
    // candidates = bucket equi-join, rank = (sim desc, id). The negated
    // ORDER BY mirrors the kernel's d = -(cos) exactly.
    "ann_ivf_fixed" -> {
      val cos = (x: String, y: String) =>
        s"list_dot_product($x, $y) / (sqrt(list_dot_product($x, $x)) * sqrt(list_dot_product($y, $y)))"
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |cents AS (SELECT vec_id AS cluster, e AS c FROM v
         |  WHERE vec_id < $NList),
         |vb AS (SELECT vec_id, cluster AS bucket FROM (
         |    SELECT a.vec_id, c.cluster,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY -(${cos("a.e", "c.c")}), c.cluster) AS rn
         |    FROM v a CROSS JOIN cents c) WHERE rn = 1),
         |qp AS (SELECT q_id, cluster AS bucket FROM (
         |    SELECT a.vec_id AS q_id, c.cluster,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY -(${cos("a.e", "c.c")}), c.cluster) AS rn
         |    FROM v a CROSS JOIN cents c WHERE a.vec_id < $NQueries)
         |  WHERE rn <= $NProbe),
         |scored AS (SELECT qp.q_id, vb.vec_id AS id,
         |    round(${cos("qa.e", "b.e")}, 6) AS sim
         |  FROM qp JOIN vb ON qp.bucket = vb.bucket
         |  JOIN v qa ON qa.vec_id = qp.q_id
         |  JOIN v b ON b.vec_id = vb.vec_id
         |  WHERE vb.vec_id <> qp.q_id),
         |ranked AS (SELECT q_id, id, sim,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, id)
         |      AS rank
         |  FROM scored)
         |SELECT q_id, id, sim, CAST(rank AS INT) AS rank FROM ranked
         |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin
    },
    // the full fixed-IVF pipeline per nprobe leg (shared bucket
    // assignment + brute CTEs, one probe→score→rank→hit-count chain per
    // leg), mirroring ann_ivf_fixed's ordering discipline exactly
    "ivf_nprobe_curve" -> {
      val cos = (x: String, y: String) =>
        s"list_dot_product($x, $y) / (sqrt(list_dot_product($x, $x)) * sqrt(list_dot_product($y, $y)))"
      val denom = NQueries * TopK
      val legCtes = (1 to NProbeMax).map { np =>
        s"""qp$np AS (SELECT q_id, bucket FROM qa WHERE rn <= $np),
           |sc$np AS (SELECT qp.q_id, vb.vec_id AS id,
           |    round(${cos("qv.e", "b.e")}, 6) AS sim
           |  FROM qp$np qp JOIN vb ON qp.bucket = vb.bucket
           |  JOIN v qv ON qv.vec_id = qp.q_id
           |  JOIN v b ON b.vec_id = vb.vec_id
           |  WHERE vb.vec_id <> qp.q_id),
           |tp$np AS (SELECT q_id, id FROM (
           |    SELECT q_id, id, row_number() OVER (PARTITION BY q_id
           |      ORDER BY sim DESC, id) AS rk FROM sc$np)
           |  WHERE rk <= $TopK),
           |h$np AS (SELECT CAST(count(*) AS BIGINT) AS n
           |  FROM tp$np JOIN brute USING (q_id, id))""".stripMargin
      }.mkString(",\n")
      val legs = (1 to NProbeMax).map { np =>
        s"""SELECT $np AS nprobe, (SELECT n FROM h$np) AS n_hits,
           |  CAST((SELECT n FROM h$np) * 1000000 // $denom AS BIGINT)
           |    AS recall_ppm""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings WHERE vec_id < $BruteCap),
         |cents AS (SELECT vec_id AS cluster, e AS c FROM v
         |  WHERE vec_id < $NList),
         |vb AS (SELECT vec_id, cluster AS bucket FROM (
         |    SELECT a.vec_id, c.cluster,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY -(${cos("a.e", "c.c")}), c.cluster) AS rn
         |    FROM v a CROSS JOIN cents c) WHERE rn = 1),
         |qa AS (SELECT a.vec_id AS q_id, c.cluster AS bucket,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY -(${cos("a.e", "c.c")}), c.cluster) AS rn
         |    FROM v a CROSS JOIN cents c WHERE a.vec_id < $NQueries),
         |brute AS (SELECT q_id, id FROM (
         |    SELECT a.vec_id AS q_id, b.vec_id AS id,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY round(${cos("a.e", "b.e")}, 6) DESC, b.vec_id)
         |        AS rk
         |    FROM v a JOIN v b ON a.vec_id < $NQueries
         |      AND a.vec_id <> b.vec_id)
         |  WHERE rk <= $TopK),
         |$legCtes
         |$legs
         |ORDER BY nprobe""".stripMargin
    },
    // clustered-data IVF contract: counts recomputed from the table; the
    // 0.9 recall floor's teeth are the in-engine brute cross-check — a
    // sub-0.9 quantizer flips recall_ge_09 to 0 and the hash mismatches
    "ann_ivf_clustered" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(count(*) * $TopK AS BIGINT) AS n_results,
         |  CAST(1 AS INT) AS recall_ge_09
         |FROM embeddings WHERE vec_id < $NQueries""".stripMargin,
    // the IVF contract row: query/result counts recomputed from the
    // table (cross-checked against Spark's actual output sizes), recall
    // floor pinned — see the gate comment for why 0.5 is the honest line
    "ann_ivf" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  CAST(count(*) * $TopK AS BIGINT) AS n_results,
         |  CAST(1 AS INT) AS recall_ge_half
         |FROM embeddings WHERE vec_id < $NQueries""".stripMargin,
    // min-label propagation to a fixpoint over the symmetric closure of
    // the cosine near-dup graph — the group id every member converges to
    // is the component minimum, exactly the large-star/small-star result
    "embed_dedup" ->
      s"""WITH RECURSIVE v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM v a JOIN v b ON a.vec_id < b.vec_id
         |  WHERE round($sqlCos, 6) >= $CosTau),
         |sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |verts AS (SELECT DISTINCT src AS id FROM sym),
         |walk(id, reach) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT s.dst, w.reach FROM walk w JOIN sym s ON s.src = w.id),
         |comp AS (SELECT id, min(reach) AS gid FROM walk GROUP BY id)
         |SELECT e.vec_id, coalesce(c.gid, e.vec_id) AS group_id,
         |  e.vec_id = coalesce(c.gid, e.vec_id) AS is_kept
         |FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.id
         |ORDER BY e.vec_id""".stripMargin,
    // brute symmetric mirror of the engine's LSH-pruned adjacency —
    // identical by the same full-recall argument as embed_pairs_lsh
    "knn_graph" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |sym AS (SELECT a.vec_id AS id, b.vec_id AS nbr_id,
         |    round($sqlCos, 6) AS sim
         |  FROM v a JOIN v b ON a.vec_id <> b.vec_id
         |  WHERE round($sqlCos, 6) >= $CosTau),
         |ranked AS (SELECT id, nbr_id, sim, row_number() OVER (
         |    PARTITION BY id ORDER BY sim DESC, nbr_id) AS rank
         |  FROM sym)
         |SELECT id, nbr_id, sim, CAST(rank AS INT) AS rank FROM ranked
         |WHERE rank <= $KnnK ORDER BY id, rank""".stripMargin,
    // identical result set to cosine_pairs by construction (deterministic
    // planes, full recall at the gate's tau/data) — same oracle
    "embed_pairs_lsh" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($sqlCos, 6) AS sim
         |FROM v a JOIN v b ON a.vec_id < b.vec_id
         |WHERE round($sqlCos, 6) >= $CosTau
         |ORDER BY id_a, id_b""".stripMargin,
    // embed_pairs_lsh's brute mirror restricted to >= 1-new-side pairs —
    // the stateful sign-band stream's batch-mode output lands exactly
    // here (same full-recall-at-this-geometry argument)
    "embed_stream" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($sqlCos, 6) AS sim
         |FROM v a JOIN v b ON a.vec_id < b.vec_id
         |WHERE round($sqlCos, 6) >= $CosTau
         |  AND (a.vec_id >= $EmbIncrSplit OR b.vec_id >= $EmbIncrSplit)
         |ORDER BY id_a, id_b""".stripMargin,
    "pq_encode" ->
      s"""WITH $sqlPqCodes
         |SELECT vec_id,
         |${(0 until PqM).map(j =>
             s"  CAST(max(CASE WHEN j = $j THEN code END) AS INT) AS c$j")
           .mkString(",\n")}
         |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "pq_topk" ->
      s"""WITH $sqlPqCodes,
         |q AS (SELECT vec_id AS q_id, e FROM v WHERE vec_id < $NQueries),
         |qd AS (SELECT q.q_id, t.j, cb.c AS code,
         |    ${sqlPqSubL2("q", "cb")} AS d
         |  FROM q, cb, unnest(range(0, $PqM)) t(j)),
         |scored AS (SELECT qd.q_id, c.vec_id AS id, round(sum(qd.d), 6) AS dist
         |  FROM codes c JOIN qd ON qd.j = c.j AND qd.code = c.code
         |  WHERE c.vec_id <> qd.q_id
         |  GROUP BY qd.q_id, c.vec_id),
         |ranked AS (SELECT q_id, id, dist, row_number() OVER (
         |    PARTITION BY q_id ORDER BY dist, id) AS rank FROM scored)
         |SELECT q_id, id, dist, CAST(rank AS INT) AS rank FROM ranked
         |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    // two-stage: ADC top-RefineN candidates (same ranking as pq_topk),
    // exact-cosine rerank, top-K — both stages' orderings 6dp + id
    // tiebreak so the candidate CUT is identical in both engines
    "ann_refine" ->
      s"""WITH $sqlPqCodes,
         |q AS (SELECT vec_id AS q_id, e FROM v WHERE vec_id < $NQueries),
         |qd AS (SELECT q.q_id, t.j, cb.c AS code,
         |    ${sqlPqSubL2("q", "cb")} AS d
         |  FROM q, cb, unnest(range(0, $PqM)) t(j)),
         |scored AS (SELECT qd.q_id, c.vec_id AS id, round(sum(qd.d), 6) AS dist
         |  FROM codes c JOIN qd ON qd.j = c.j AND qd.code = c.code
         |  WHERE c.vec_id <> qd.q_id
         |  GROUP BY qd.q_id, c.vec_id),
         |cand AS (SELECT q_id, id FROM (
         |    SELECT q_id, id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY dist, id) AS rank FROM scored)
         |  WHERE rank <= $RefineN),
         |ex AS (SELECT cd.q_id, cd.id,
         |    round(list_dot_product(qv.e, b.e) / (sqrt(list_dot_product(qv.e, qv.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS sim
         |  FROM cand cd JOIN v qv ON qv.vec_id = cd.q_id
         |  JOIN v b ON b.vec_id = cd.id),
         |r2 AS (SELECT q_id, id, sim, row_number() OVER (PARTITION BY q_id
         |    ORDER BY sim DESC, id) AS rank FROM ex)
         |SELECT q_id, id, sim, CAST(rank AS INT) AS rank FROM r2
         |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin,
    "ann_ivfpq" -> {
      val cos = (x: String, y: String) =>
        s"list_dot_product($x, $y) / (sqrt(list_dot_product($x, $x)) * sqrt(list_dot_product($y, $y)))"
      s"""WITH $sqlPqCodes,
         |cents AS (SELECT vec_id AS cluster, e AS cv FROM v
         |  WHERE vec_id < $NList),
         |vb AS (SELECT vec_id, cluster AS bucket FROM (
         |    SELECT a.vec_id, ct.cluster,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY -(${cos("a.e", "ct.cv")}), ct.cluster) AS rn
         |    FROM v a CROSS JOIN cents ct) WHERE rn = 1),
         |qp AS (SELECT q_id, cluster AS bucket FROM (
         |    SELECT a.vec_id AS q_id, ct.cluster,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY -(${cos("a.e", "ct.cv")}), ct.cluster) AS rn
         |    FROM v a CROSS JOIN cents ct WHERE a.vec_id < $NQueries)
         |  WHERE rn <= $NProbe),
         |q AS (SELECT vec_id AS q_id, e FROM v WHERE vec_id < $NQueries),
         |qd AS (SELECT q.q_id, t.j, cb.c AS code,
         |    ${sqlPqSubL2("q", "cb")} AS d
         |  FROM q, cb, unnest(range(0, $PqM)) t(j)),
         |scored AS (SELECT qp.q_id, vb.vec_id AS id,
         |    round(sum(qd.d), 6) AS dist
         |  FROM qp JOIN vb ON qp.bucket = vb.bucket
         |  JOIN codes c ON c.vec_id = vb.vec_id
         |  JOIN qd ON qd.q_id = qp.q_id AND qd.j = c.j AND qd.code = c.code
         |  WHERE vb.vec_id <> qp.q_id
         |  GROUP BY qp.q_id, vb.vec_id),
         |ranked AS (SELECT q_id, id, dist, row_number() OVER (
         |    PARTITION BY q_id ORDER BY dist, id) AS rank FROM scored)
         |SELECT q_id, id, dist, CAST(rank AS INT) AS rank FROM ranked
         |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin
    },
    "degree_hist" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM v a JOIN v b ON a.vec_id < b.vec_id
         |  WHERE round($sqlCos, 6) >= $CosTau),
         |sym AS (SELECT id_a AS id FROM pairs
         |  UNION ALL SELECT id_b FROM pairs),
         |deg AS (SELECT id, count(*) AS degree FROM sym GROUP BY id)
         |SELECT degree, count(*) AS n_nodes FROM deg
         |GROUP BY degree ORDER BY degree""".stripMargin,
    "assortativity" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM v a JOIN v b ON a.vec_id < b.vec_id
         |  WHERE round($sqlCos, 6) >= $CosTau),
         |sym AS (SELECT id_a, id_b FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |deg AS (SELECT id_a AS id, count(*) AS degree FROM sym
         |  GROUP BY id_a),
         |j AS (SELECT d1.degree AS da, d2.degree AS db
         |  FROM sym JOIN deg d1 ON sym.id_a = d1.id
         |  JOIN deg d2 ON sym.id_b = d2.id),
         |s AS (SELECT count(*) AS m, CAST(sum(da) AS BIGINT) AS sx,
         |    CAST(sum(da * db) AS BIGINT) AS sxy,
         |    CAST(sum(da * da) AS BIGINT) AS sxx FROM j),
         |dd AS (SELECT count(*) AS n_nodes,
         |    CAST(max(degree) AS BIGINT) AS max_degree FROM deg)
         |SELECT dd.n_nodes, s.m // 2 AS n_edges, dd.max_degree,
         |  round(CAST(s.m * s.sxy - s.sx * s.sx AS DOUBLE)
         |    / CAST(s.m * s.sxx - s.sx * s.sx AS DOUBLE), 6)
         |    AS assortativity
         |FROM dd CROSS JOIN s""".stripMargin,
    "embed_drift" ->
      s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |od AS (SELECT label, u.i AS i, avg(e[u.i]) AS c
         |  FROM v, unnest(range(1, 65)) u(i)
         |  WHERE vec_id % 2 = 0 GROUP BY label, u.i),
         |nd AS (SELECT label, u.i AS i, avg(e[u.i]) AS c
         |  FROM v, unnest(range(1, 65)) u(i)
         |  WHERE vec_id % 2 <> 0 GROUP BY label, u.i),
         |ol AS (SELECT label, list(c ORDER BY i) AS po FROM od
         |  GROUP BY label),
         |nl AS (SELECT label, list(c ORDER BY i) AS pn FROM nd
         |  GROUP BY label),
         |cnt AS (SELECT label,
         |    count(CASE WHEN vec_id % 2 = 0 THEN 1 END) AS n_old,
         |    count(CASE WHEN vec_id % 2 <> 0 THEN 1 END) AS n_new
         |  FROM v GROUP BY label)
         |SELECT c.label, c.n_old, c.n_new,
         |  round(sqrt(list_dot_product(
         |    list_transform(range(1, 65), i -> ol.po[i] - nl.pn[i]),
         |    list_transform(range(1, 65), i -> ol.po[i] - nl.pn[i]))), 6)
         |    AS drift
         |FROM cnt c JOIN ol ON ol.label = c.label
         |JOIN nl ON nl.label = c.label
         |ORDER BY c.label""".stripMargin,
    "jl_project" -> {
      def row(k: Int): String = jlSigns(k)
        .map(s => if (s > 0) "1.0" else "-1.0")
        .mkString("CAST([", ", ", "] AS DOUBLE[])")
      val yDefs = (0 until JlDim)
        .map(k => s"list_dot_product(e, ${row(k)}) * 0.25 AS y$k")
        .mkString(",\n    ")
      val chain = (0 until JlDim).map(k => s"y$k * y$k").mkString(" + ")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |p AS (SELECT vec_id,
         |    $yDefs,
         |    list_dot_product(e, e) AS nx FROM v)
         |SELECT vec_id, round(y0, 6) AS y0,
         |  round(y${JlDim / 2}, 6) AS y8, round(y${JlDim - 1}, 6) AS y15,
         |  round(($chain) / nx, 6) AS dist_ratio
         |FROM p ORDER BY vec_id""".stripMargin
    })

  /** Squared L2 between subspace `j` slices of `a.e` and `b.e` (both
    * tables must expose a DOUBLE[] column `e`; `t.j` in scope). */
  private def sqlPqSubL2(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, ${PqSub + 1}),
       |      i -> ($a.e[t.j*$PqSub + i] - $b.e[t.j*$PqSub + i])
       |         * ($a.e[t.j*$PqSub + i] - $b.e[t.j*$PqSub + i])))""".stripMargin

  /** Shared PQ prologue: corpus `v`, fixed codebook `cb` (the first PqKs
    * vectors), per-(vector, subspace) code via 6dp-rounded argmin with
    * the lower code winning ties — bit-aligned with
    * [[graft.operators.ProductQuant.encode]]. */
  private def sqlPqCodes: String =
    s"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |  FROM embeddings),
       |cb AS (SELECT vec_id AS c, e FROM v WHERE vec_id < $PqKs),
       |sd AS (SELECT v.vec_id, t.j, cb.c AS code,
       |    round(${sqlPqSubL2("v", "cb")}, 6) AS d
       |  FROM v, cb, unnest(range(0, $PqM)) t(j)),
       |codes AS (SELECT vec_id, j, code FROM (
       |  SELECT vec_id, j, code, row_number() OVER (
       |    PARTITION BY vec_id, j ORDER BY d, code) AS rn FROM sd)
       |  WHERE rn = 1)""".stripMargin
}
