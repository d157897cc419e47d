package graft

import graft.functions.{PolyHash, TextFunctions => TF}
import graft.operators.{Dedup, SimilaritySearch}
import org.apache.spark.sql.functions._

class TextDedupSpec extends GraftSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different text about spark engines here"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, ""), // empty
    (6L, "single")
  ).toDF("doc_id", "text")

  test("poly_hash matches the reference formula and handles unicode") {
    val got = Seq("abc", "", "héllo", "日本語").toDF("s")
      .select(PolyHash.poly_hash(col("s"))).as[Long].collect()
    def ref(s: String): Long = {
      var acc = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i); acc = (acc * 31 + cp) % PolyHash.Prime
        i += Character.charCount(cp)
      }
      acc
    }
    assert(got.toSeq == Seq("abc", "", "héllo", "日本語").map(ref))
    assert(ref("abc") == ((('a' * 31 + 'b') % PolyHash.Prime) * 31 + 'c') % PolyHash.Prime)
  }

  test("tokens / shingles edge cases") {
    val m = docs.select(col("doc_id"), TF.tokenCount(col("text")),
      size(TF.wordShingles(col("text"), 2))).as[(Long, Int, Int)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(m(5L) == ((0, 0)), "empty text → no tokens, no shingles")
    assert(m(6L) == ((1, 0)), "one token → no bigram shingles")
    assert(m(1L) == ((9, 8)))
  }

  test("exact dedup keeps min id with copy count") {
    val got = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L))) // docs 1 and 4
    assert(got.count(_._2 == 1L) == 4)
  }

  test("jaccard pairs find the near-dup and the exact dup") {
    val got = Dedup.jaccardPairs(docs, "doc_id", "text", 2, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 4L)), "exact dup has jaccard 1.0")
    assert(got.contains((1L, 2L)) && got.contains((2L, 4L)),
      "near-dup shares 7 of 9 bigrams (jaccard ~0.78)")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("prefix-filtered jaccard == inverted index == salted index") {
    val d = graft.core.Tables.table(spark, sf0001, "documents")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val prefix = collect(Dedup.jaccardPairs(d, "doc_id", "text", 2, 0.3))
    val index = collect(Dedup.jaccardPairsIndex(d, "doc_id", "text", 2, 0.3))
    val salted = collect(Dedup.jaccardPairsIndex(d, "doc_id", "text", 2, 0.3, salt = 4))
    assert(prefix.nonEmpty, "test data must produce pairs")
    assert(prefix == index, s"prefix vs index: ${(prefix diff index) ++ (index diff prefix)}")
    assert(salted == index, s"salted vs index: ${(salted diff index) ++ (index diff salted)}")
  }

  test("dedup groups: transitive closure of near-dup pairs, singletons kept") {
    // 1~2 and 2~4 (and 1~4) → one group {1,2,4} labeled by min id; 3, 5, 6
    // have no partners → own group
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 2, 0.5)
    val comp = graft.graph.ConnectedComponents.run(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
    val groups = docs.select(col("doc_id"))
      .join(comp, docs("doc_id") === comp("id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("group_id"))
      .as[(Long, Long)].collect().toMap
    assert(groups(1L) == 1L && groups(2L) == 1L && groups(4L) == 1L)
    assert(groups(3L) == 3L && groups(5L) == 5L && groups(6L) == 6L)
  }

  test("minhash-LSH finds the same pairs as exact jaccard at tau=0.5") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 2, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashPairs(docs, "doc_id", "text", 2, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // LSH candidates are verified with exact jaccard → lsh ⊆ exact;
    // at 16 bands × 4 rows recall at j>=0.5 is ~1 for these sizes
    assert(lsh.subsetOf(exact))
    assert(lsh == exact, s"recall miss: ${exact -- lsh}")
  }

  test("simhash: identical texts same fp; near-dups within small hamming") {
    val fps = docs.where(length(col("text")) > 0)
      .select(col("doc_id"), Dedup.simhash(col("text"), 2).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(4L), "identical text → identical fingerprint")
    val ham12 = java.lang.Long.bitCount(fps(1L) ^ fps(2L))
    val ham13 = java.lang.Long.bitCount(fps(1L) ^ fps(3L))
    assert(ham12 < ham13, "near-dup closer in hamming space than unrelated")
  }

  test("quality score bounds and monotone-ish behavior") {
    val r = docs.select(col("doc_id"), TF.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(r.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(r(1L) > r(5L), "real sentence beats empty text")
  }

  test("langId picks the marker language, und for no markers") {
    val r = Seq(
      (1L, "the cat is on the mat and it is happy"),
      (2L, "der hund ist nicht auf der matte und er"),
      (3L, "el perro es grande y la casa es azul"),
      (4L, "zz yy xx ww vv")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TF.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(r(1L) == "en" && r(2L) == "de" && r(3L) == "es" && r(4L) == "und")
  }

  test("stripBoilerplateLines drops corpus-hot lines, keeps order") {
    val docs = Seq(
      (1L, "BANNER\nunique one\nBANNER\nalso unique"),
      (2L, "BANNER\nother text"),
      (3L, "solo doc")).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .stripBoilerplateLines(docs, "doc_id", "text", maxDocs = 1)
      .as[(Long, String)].collect().toMap
    // BANNER is in 2 distinct docs -> stripped everywhere (both copies in
    // doc 1); unique lines survive in original order
    assert(got == Map(
      1L -> "unique one\nalso unique",
      2L -> "other text",
      3L -> "solo doc"))
    // maxDocs=2 tolerates the two-doc banner
    val loose = graft.operators.Dedup
      .stripBoilerplateLines(docs, "doc_id", "text", maxDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(loose(1L) == "BANNER\nunique one\nBANNER\nalso unique")
    // a fully-stripped doc comes back as ""
    val wiped = graft.operators.Dedup.stripBoilerplateLines(
      Seq((1L, "X"), (2L, "X")).toDF("doc_id", "text"),
      "doc_id", "text", maxDocs = 1)
      .as[(Long, String)].collect().toMap
    assert(wiped == Map(1L -> "", 2L -> ""))
  }

  test("nfc_normalize recomposes, is idempotent, fast-paths ASCII and null") {
    import graft.functions.TextKernels
    val rows = Seq(
      (1L, "caf" + "é"), // decomposed e + combining acute
      (2L, "plain ascii"),
      (3L, "café"), // already composed
      (4L, "")).toDF("id", "s")
      .select(col("id"), TextKernels.nfc_normalize(col("s")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(rows(1L) == "café" && rows(1L).length == 4,
      "decomposed pair must recompose to one codepoint")
    assert(rows(2L) == "plain ascii" && rows(4L) == "")
    assert(rows(3L) == "café", "already-NFC text unchanged (idempotent)")
    val n = Seq((1L, null: String)).toDF("id", "s")
      .select(TextKernels.nfc_normalize(col("s"))).collect()(0)
    assert(n.isNullAt(0), "null in, null out")
  }

  test("contaminationStats: fractions, zero-overlap and shingle-less rows kept") {
    val eval = Seq((0L, "x y z")).toDF("doc_id", "text")
    val corpus = Seq(
      (5L, "x y q r"), // shares bigram "x y" of its 3 → 1/3
      (6L, "no overlap here at all"), // 4 shingles, 0 shared
      (7L, "w") // shingle-less
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationStats(corpus, eval, "doc_id", "text", 2)
      .select("id", "n_shingles", "n_shared", "contam_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(5L) == ((5L, 3L, 1L, 0.333333)))
    assert(got(6L) == ((6L, 4L, 0L, 0.0)))
    assert(got(7L) == ((7L, 0L, 0L, 0.0)))
  }

  test("unigramSurprisal: exact bit arithmetic on a hand-computed corpus") {
    import graft.operators.LexicalRank
    // vocab: a:3, b:1, c:1, N=5 → bits(a)=len(bin(5 div 3))-1=0,
    // bits(b)=bits(c)=len(bin(5))-1=2
    val d = Seq((1L, "a a b"), (2L, "a c"), (3L, "")).toDF("doc_id", "text")
    val got = LexicalRank.unigramSurprisal(d, "doc_id", "text")
      .select("id", "n_tokens", "sum_bits", "surprisal")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 2L, 0.666667)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 2L, 2L, 1.0)))
    assert(got(3L) == ((3L, 0L, 0L, 0.0)), "tokenless doc scores 0")
  }

  test("budget_select: greedy fill is prefix-closed in rank order") {
    val rows = SparkEntry.queries("budget_select")(spark, sf0001)
      .select("doc_id", "quality", "toks", "cum")
      .as[(Long, Double, Long, Long)].collect()
    assert(rows.nonEmpty, "budget must admit some documents")
    assert(rows.map(_._3).sum <= 10000L, "selection must fit the budget")
    // cum is the exclusive running sum in (quality desc, doc_id) order
    val sorted = rows.sortBy(r => (-r._2, r._1))
    assert(sorted.toSeq == rows.toSeq, "output ordered by rank")
    var acc = 0L
    for (r <- sorted) {
      assert(r._4 == acc, s"cum mismatch at doc ${r._1}: ${r._4} vs $acc")
      acc += r._3
      assert(acc <= 10000L, "every kept doc fits entirely")
    }
  }

  test("dedupLines keeps first occurrences in order") {
    val got = Seq(
      "a\nb\na\nc\nb",  // repeats dropped, first-seen order kept
      "a",              // single line unchanged
      "",               // empty text -> one empty line
      "x\nx\nx")        // all-same collapses to one
      .toDF("text")
      .select(graft.functions.TextFunctions.dedupLines(col("text")))
      .as[String].collect().toSeq
    assert(got == Seq("a\nb\nc", "a", "", "x"))
  }
  // ------------------------------------------------ exact-substring spans

  private def spans(d: Seq[(Long, String)], n: Int,
                    keepFirst: Boolean = true): Seq[(Long, Int, Int)] =
    Dedup.duplicatedSpans(d.toDF("doc_id", "text"), "doc_id", "text", n,
      keepFirst)
      .as[(Long, Int, Int)].collect().sorted.toSeq

  test("duplicatedSpans marks repeated passages, exempting the first occurrence") {
    val d = Seq(
      (1L, "a b c d e x y z"), // "a b c d e" first occurs here → exempt
      (2L, "p q a b c d e r"), // repeat at tokens 2..7
      (3L, "n o t h i n g like it"))
    assert(spans(d, 5) == Seq((2L, 2, 7)))
    // without the exemption both occurrences are marked
    assert(spans(d, 5, keepFirst = false) == Seq((1L, 0, 5), (2L, 2, 7)))
  }

  test("duplicatedSpans merges overlapping n-gram hits into one maximal span") {
    // tokens 0..6 of doc 2 repeat doc 1's 7-token passage: three
    // overlapping 5-grams at p=0,1,2 must fuse into [0, 7)
    val d = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g h"))
    assert(spans(d, 5) == Seq((2L, 0, 7)))
  }

  test("duplicatedSpans keeps disjoint spans apart and honors within-doc repeats") {
    // doc 1 repeats its own 5-gram: second occurrence (p=6) is marked,
    // first exempt; the gap at token 5 splits nothing else
    val d = Seq((1L, "a b c d e x a b c d e"))
    assert(spans(d, 5) == Seq((1L, 6, 11)))
  }

  test("duplicatedSpans ignores docs shorter than n and empty text") {
    val d = Seq((1L, "a b"), (2L, ""), (3L, "a b"))
    assert(spans(d, 5) == Seq.empty)
  }

  test("stripDuplicatedSpans cuts marked spans, keeps the first copy") {
    val d = Seq(
      (1L, "a b c d e x y z"),
      (2L, "p q a b c d e r"),   // span [2,7) cut, edges survive
      (3L, "a b c d e"),         // fully duplicated → ""
      (4L, ""))
    val got = Dedup.stripDuplicatedSpans(
        d.toDF("doc_id", "text"), "doc_id", "text", 5)
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "a b c d e x y z",
      2L -> "p q r",
      3L -> "",
      4L -> ""))
  }
}

class SimilaritySearchSpec extends GraftSuite {
  import spark.implicits._

  private def vecs = {
    val rnd = new scala.util.Random(5)
    (0 until 100).map { i =>
      val base = Array.fill(16)(rnd.nextGaussian())
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
  }

  test("brute-force topk is self-consistent and symmetric-sane") {
    val res = SimilaritySearch.cosineTopK(vecs,
      vecs.where(col("vec_id") < 3), "vec_id", "embedding", 5)
    val rows = res.select("q_id", "id", "rank").as[(Long, Long, Int)].collect()
    assert(rows.length == 15)
    assert(rows.groupBy(_._1).forall(_._2.map(_._3).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
    assert(rows.forall(r => r._1 != r._2), "self excluded")
  }

  test("IVF search achieves high recall vs brute force") {
    val q = vecs.where(col("vec_id") < 10)
    val brute = SimilaritySearch.cosineTopK(vecs, q, "vec_id", "embedding", 5)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val idx = SimilaritySearch.ivfIndex(vecs, "vec_id", "embedding",
      nlist = 4, seed = 11)
    val ivf = idx.search(q, "vec_id", "embedding", 5, nprobe = 3)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall $recall too low")
  }

  test("IVF recall clears 0.9 on clusterable data (ann_ivf_clustered's floor)") {
    // the gate's exact construction: real embeddings shifted into 8
    // separable cosine clusters; the Lloyd quantizer must recover them
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(
          col("embedding").cast("array<double>"),
          (x, i) => x + when(i % 8 === col("vec_id") % 8, lit(10.0))
            .otherwise(lit(0.0))).as("embedding"))
    val q = e.where(col("vec_id") < 5)
    val brute = SimilaritySearch.cosineTopK(e, q, "vec_id", "embedding", 10)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val idx = SimilaritySearch.ivfIndex(e, "vec_id", "embedding",
      nlist = 8, seed = 42)
    val ivf = idx.search(q, "vec_id", "embedding", 10, nprobe = 3)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    info(s"clustered macro recall@10 = $recall")
    assert(recall >= 0.9, s"clustered IVF recall $recall below the 0.9 floor")
    // and every query must come back with a full top-k
    assert(ivf.size == brute.size)
  }

  test("cosinePairs strict threshold") {
    val twins = Seq(
      (1L, Array(1.0, 0.0, 0.0)), (2L, Array(0.999, 0.01, 0.0)),
      (3L, Array(0.0, 1.0, 0.0))).toDF("vec_id", "embedding")
    val got = SimilaritySearch.cosinePairs(twins, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("LSH pairs equal the brute-force set on real embeddings") {
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
    val brute = SimilaritySearch.cosinePairs(e, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    val lsh = graft.operators.Dedup.embeddingPairs(e, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(brute), "exact verify → no false positives")
    assert(lsh == brute, s"recall miss: ${brute -- lsh}")
  }

  test("LSH pairs plan is an equi-join — no cartesian, no nested loop") {
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
    val p = graft.operators.Dedup.embeddingPairs(e, "vec_id", "embedding", 0.4)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LSH candidate generation must plan as an equi-join:\n${p.take(600)}")
  }

  test("nearest_centroids at nlist=1024 stays in whole-stage codegen") {
    // the centroid matrix rides as a reference object, so the projection
    // must stay inside a WholeStageCodegen span (the literal fold would
    // drop interpreted past the 64KB codegen method limit at this nlist);
    // a parquet-backed input keeps ConvertToLocalRelation from folding
    // the projection away at optimization time
    val rnd = new scala.util.Random(23)
    val cents = (0 until 1024).map(c => c -> Array.fill(64)(rnd.nextGaussian()))
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val assigned = e.select(col("vec_id"),
      element_at(graft.functions.VecKernels.nearest_centroids(
        col("vec"), cents, 16, cosine = true), 1).getField("cluster").as("bucket"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val planStr = assigned.queryExecution.executedPlan.toString
      val line = planStr.linesIterator
        .find(_.contains("nearest_centroids")).getOrElse("")
      assert(line.trim.startsWith("*("),
        s"bucket assignment fell out of codegen:\n${planStr.take(1500)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(assigned.where(col("bucket").between(0, 1023)).count() == 500)
  }

  test("IVF fit+search at nlist=1024 returns full result sets") {
    val rnd = new scala.util.Random(23)
    val pts = (0 until 2048).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian()))).toDF("vec_id", "embedding")
    val idx = SimilaritySearch.ivfIndex(pts, "vec_id", "embedding",
      nlist = 1024, seed = 5, lloydIters = 1)
    val res = idx.search(pts.where(col("vec_id") < 3), "vec_id", "embedding",
      k = 4, nprobe = 16)
    val counts = res.groupBy("q_id").count().as[(Long, Long)].collect().toMap
    assert(counts.size == 3 && counts.values.forall(_ == 4L), counts.toString)
  }

  test("partial top-k aggregate equals the window-rank form") {
    import graft.functions.Distances
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
    val agg = SimilaritySearch.cosineTopK(
      e, e.where(col("vec_id") < 7), "vec_id", "embedding", 9)
      .select("q_id", "id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val base = e.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vec"))
    val q = e.where(col("vec_id") < 7).select(col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("q_vec"))
    val scored = base.crossJoin(broadcast(q))
      .where(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"),
        round(Distances.cosine(col("q_vec"), col("vec")), 6).as("sim"))
    val win = SimilaritySearch.rankTopKWindow(scored, 9)
      .select("q_id", "id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(agg == win, s"diff: ${(agg diff win) ++ (win diff agg)}")
    assert(agg.nonEmpty)
  }

  test("native sign_bands kernel matches the declarative signBucket form") {
    import graft.functions.VecKernels
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      .limit(50)
    for (band <- Seq(0, 3, 63)) {
      val mismatches = e.select(
        element_at(VecKernels.sign_bands(col("vec"), 64, 5, 64), band + 1).as("k"),
        SimilaritySearch.signBucket("vec", 64, 5,
          VecKernels.bandSeed(VecKernels.SignBandBaseSeed, band)).as("d"))
        .where(col("k") =!= col("d")).count()
      assert(mismatches == 0, s"band $band diverges from declarative form")
    }
  }

  test("int8 quantization bounds error and survives zero vectors") {
    import graft.operators.VecQuant
    val d = Seq((1L, Array(1.0, -0.5, 0.25, 127.0)),
        (2L, Array(0.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "vec")
      .withColumn("scale", VecQuant.quantScale(col("vec")))
      .withColumn("q", VecQuant.quantize(col("vec"), col("scale")))
      .withColumn("err",
        VecQuant.reconstructionError(col("vec"), col("q"), col("scale")))
      .select("vec_id", "scale", "q", "err")
      .as[(Long, Double, Array[Int], Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, s1, q1, e1) = d(1L)
    assert(q1(3) == 127, "max component maps to 127")
    assert(q1.forall(v => v >= -127 && v <= 127))
    // per-element error bounded by scale/2 (round-to-nearest)
    assert(e1 <= s1 / 2 * 4 + 1e-12)
    val (_, s2, q2, e2) = d(2L)
    assert(s2 == 0.0 && q2.forall(_ == 0) && e2 == 0.0, "zero vector safe")
  }

  test("hash sampling is deterministic, rate-accurate, join-consistent") {
    import graft.operators.Sampling
    val d = graft.core.Tables.table(spark, sf0001, "documents")
    val s1 = Sampling.hashSample(d, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.hashSample(d, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "same key set must survive every run")
    assert(math.abs(s1.size - 250) < 60, s"rate off: ${s1.size}/500")
    // nested rates: a 0.25 sample is a subset of the 0.5 sample (hash
    // thresholding, not independent coins)
    val s3 = Sampling.hashSample(d, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(s3.subsetOf(s1), "threshold samples must nest")
    // stratified with default 1.0 keeps unlisted strata whole
    val strat = Sampling.stratified(
      d.withColumn("st", (col("doc_id") % 2 === 0).cast("string")),
      "doc_id", col("st"), Seq("true" -> 0.0), default = 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(strat.forall(_ % 2 == 1) && strat.size > 200)
  }

  test("chunkTokens: tiling, overlap, short final chunk, empty doc") {
    import graft.operators.Chunking
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than a chunk
      (3L, "")                                        // tokenless: no chunks
    ).toDF("doc_id", "text")
    val out = Chunking.chunkTokens(docs, "doc_id", "text",
        chunkLen = 4, stride = 3)
      .select("id", "chunk_idx", "start", "n_tokens")
      .as[(Long, Int, Int, Long)].collect()
    assert(!out.exists(_._1 == 3L), "tokenless doc produces no chunks")
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 1,4,7,10; lengths 4,4,4,1 (short final kept)
    assert(d1.map(_._3).toSeq == Seq(1, 4, 7, 10))
    assert(d1.map(_._4).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(d1.map(_._2).toSeq == Seq(0, 1, 2, 3), "chunk_idx is dense")
    // coverage: every token position falls inside at least one chunk
    val covered = d1.flatMap(c => c._3 until (c._3 + c._4.toInt)).toSet
    assert(covered == (1 to 10).toSet)
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length == 1 && d2.head._4 == 3L)
  }

  test("dedup_canonical keeps exactly one best-quality doc per group") {
    val rows = SparkEntry.queries("dedup_canonical")(spark, sf0001)
      .select("doc_id", "q6", "group_id", "canonical")
      .as[(Long, Double, Long, Boolean)].collect()
    val byGroup = rows.groupBy(_._3)
    assert(byGroup.forall(_._2.count(_._4) == 1),
      "exactly one canonical per group")
    for ((_, g) <- byGroup; c = g.find(_._4).get)
      assert(g.forall(r => r._2 < c._2 ||
          (r._2 == c._2 && r._1 >= c._1)),
        s"canonical must be argmax (quality, -id): $g")
    // dup groups exist at this SF, so the selection is non-trivial
    assert(byGroup.exists(_._2.length > 1))
  }

  test("incremental jaccard = full pairs minus old-old, exact values") {
    import graft.operators.Dedup
    val d = graft.core.Tables.table(spark, sf0001, "documents")
    val split = 400L
    val full = Dedup.jaccardPairs(d, "doc_id", "text", 2, 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val incr = Dedup.incrementalJaccardPairs(
        d.where(col("doc_id") < split), d.where(col("doc_id") >= split),
        "doc_id", "text", 2, 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val expected = full.filterNot(p => p._1 < split && p._2 < split)
    assert(incr == expected,
      s"missing=${expected -- incr} extra=${incr -- expected}")
    assert(incr.nonEmpty && incr.size < full.size)
  }

  test("weightedSample: deterministic, weight-monotone, excludes w<=0") {
    import graft.operators.Sampling
    val d = (0 until 100).map(i => (i.toLong, 1.0 + (i % 5))).toDF("id", "w")
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(df, "id", col("w"), 20)
        .select("id").as[Long].collect().toSet
    val s1 = ids(d)
    assert(s1 == ids(d) && s1.size == 20, "same winners every run")
    // priority u^(1/w) is increasing in w for u in (0,1): boosting one
    // row's weight can only raise its priority, never drop it out
    val target = s1.head
    val boosted = d.withColumn("w",
      when(col("id") === target, col("w") * 100).otherwise(col("w")))
    assert(ids(boosted).contains(target), "boosted weight must stay sampled")
    // non-positive weights never qualify
    val withZero = d.withColumn("w",
      when(col("id") < 50, lit(0.0)).otherwise(col("w")))
    assert(ids(withZero).forall(_ >= 50))
    // heavier rows win more often than lighter ones on average
    val wOf = d.as[(Long, Double)].collect().toMap
    val avgW = s1.toSeq.map(wOf).sum / s1.size
    val popW = wOf.values.sum / wOf.size
    assert(avgW > popW, s"sampled mean weight $avgW must exceed $popW")
  }

  test("fixedPerStratum: exact counts, deterministic, small strata whole") {
    import graft.operators.Sampling
    val d = graft.core.Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"))
    def run() = Sampling.fixedPerStratum(d, "doc_id", col("source"), 5)
      .as[(Long, String)].collect().toSet
    val s1 = run()
    assert(s1 == run(), "same rows every run")
    val perSource = s1.groupBy(_._2).view.mapValues(_.size)
    val sizes = d.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    for ((src, n) <- sizes)
      assert(perSource.getOrElse(src, 0) == math.min(5L, n),
        s"$src: want min(5, $n)")
    // a stratum smaller than n survives whole
    val tiny = Sampling.fixedPerStratum(
      d.where(col("doc_id") < 3), "doc_id", lit("one"), 5)
      .select("doc_id").as[Long].collect().toSet
    assert(tiny == Set(0L, 1L, 2L))
  }

  test("clusterBalanced honors per-bucket quotas and keeps every row") {
    import graft.operators.Sampling
    // two orthogonal clusters; scores descend with id so the expected
    // per-bucket ranking is id order
    val cents = Map(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
    val rows = (0 until 10).map { i =>
      val v = if (i % 2 == 0) Array(1.0, 0.01 * i) else Array(0.01 * i, 1.0)
      (i.toLong, v, 1.0 - 0.05 * i)
    }.toDF("id", "vec", "score")
    val out = Sampling.clusterBalanced(rows, "id", "vec", "score", cents, 3)
      .select("id", "bucket", "rk", "kept")
      .as[(Long, Int, Int, Boolean)].collect()
    assert(out.length == 10, "every input row is returned")
    val byBucket = out.groupBy(_._2)
    assert(byBucket.keySet == Set(0, 1))
    for ((b, rs) <- byBucket) {
      assert(rs.count(_._4) == 3, s"bucket $b keeps exactly the quota")
      // ranks are 1..n within the bucket, ordered by score desc = id asc
      assert(rs.sortBy(_._3).map(_._1).toSeq == rs.map(_._1).sorted.toSeq)
    }
    // even ids project onto centroid 0, odd onto centroid 1
    assert(out.forall(r => r._2 == (r._1 % 2)))
  }

  test("bm25 ranks multi-term matches above single-term, respects length norm") {
    import graft.operators.LexicalRank
    val docs = Seq(
      (1L, "spark merge window"),            // all three terms, short
      (2L, "spark spark spark"),             // one term repeated
      (3L, "spark merge window " + ("filler " * 50).trim), // all terms, long
      (4L, "table scan join"),               // no terms
      (5L, "")                               // empty
    ).toDF("doc_id", "text")
    val terms = Seq("spark", "merge", "window")
    val scores = LexicalRank.bm25(docs, "doc_id", "text", terms)
      .as[(Long, Double)].collect().toMap
    assert(scores(1L) > scores(2L), "coverage beats repetition")
    assert(scores(1L) > scores(3L), "length normalization penalizes padding")
    assert(scores(4L) == 0.0 && scores(5L) == 0.0)
    val top = LexicalRank.bm25TopK(docs, "doc_id", "text", terms, 2)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    assert(top(1L) == 1 && top.size == 2)
    // the inverted-index form: same scores to within the 1-ulp-at-6dp
    // reassociation tolerance, postings semantics (zero-match docs absent)
    val inv = LexicalRank.bm25Inverted(docs, "doc_id", "text", terms)
      .as[(Long, Double)].collect().toMap
    assert(inv.keySet == Set(1L, 2L, 3L), "only matching docs in postings")
    for ((id, s) <- inv)
      assert(math.abs(s - scores(id)) <= 1e-6,
        s"doc $id: inverted $s vs fixed-bag ${scores(id)}")
    val topInv = LexicalRank.bm25InvertedTopK(docs, "doc_id", "text", terms, 2)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    assert(topInv(1L) == 1 && topInv.size == 2)
  }

  test("wide-dim meanPool path equals the columnar path") {
    // the columnar plan carries dim agg columns — the wide (posexplode)
    // plan is the 2-4k-dim alternative; same math, row-oriented shuffle.
    // Float sums may reassociate across the two groupings, so compare at
    // 9dp (the gates round to 6).
    val e = graft.core.Tables.table(spark, sf0001, "embeddings")
      .select((col("vec_id") % 50).as("group_id"), col("embedding"))
    def rounded(df: org.apache.spark.sql.DataFrame) = df
      .select(col("group_id"), posexplode(col("pooled")))
      .select(col("group_id"), col("pos"), round(col("col"), 9).as("m"))
      .as[(Long, Int, Double)].collect().toSet
    val colForm = rounded(
      SimilaritySearch.meanPool(e, "group_id", "embedding", dim = 64))
    val wideForm = rounded(
      SimilaritySearch.meanPoolWide(e, "group_id", "embedding"))
    assert(colForm == wideForm)
    assert(colForm.size == 50 * 64)
    // and the dispatch: dim >= wideDim routes to the wide plan (no
    // per-dimension agg columns in it)
    val widePlan = SimilaritySearch
      .meanPool(e, "group_id", "embedding", dim = 64, wideDim = 64)
      .queryExecution.analyzed.toString
    assert(widePlan.contains("posexplode"), widePlan.take(400))
  }

  test("gopherFlags: each rule's fail path fires on the right document") {
    // mean word length must clear the 3-char floor (42 chars / 13 words)
    val ok = ("the cat sat and the dog ran near the mat under the sun " * 3).trim
    val cases = Seq(
      (1L, ok),                                       // passes everything
      (2L, "the a of"),                               // too few words
      (3L, ok + " ########"),                         // symbol-heavy
      (4L, ok + "\n- x\n" + Seq.fill(20)("- y").mkString("\n")), // bullets
      (5L, ok + "\nwait...\nmore…"),                  // ellipsis lines
      (6L, ok + " " + (1 to 40).map(_.toString).mkString(" ")), // numeric
      (7L, "zz qq ww rr " * 7),                       // no stopwords
      (8L, Seq.fill(30)("a").mkString(" ")))          // mean word len < 3
    val got = cases.toDF("doc_id", "text")
      .select(col("doc_id"), TF.gopherFlags(col("text"), 5, 1000).as("g"))
      .select(col("doc_id"), col("g.*"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6),
          r.getInt(7), r.getInt(8), r.getInt(9))).toMap
    // (wc, wordlen, symbol, bullet, ellipsis, alpha, stop, keep)
    assert(got(1L) == ((1, 1, 1, 1, 1, 1, 1, 1)), s"doc1 ${got(1L)}")
    assert(got(2L)._1 == 0 && got(2L)._8 == 0, "wc floor")
    assert(got(3L)._3 == 0, "symbol ratio")
    assert(got(4L)._4 == 0, "bullet fraction")
    assert(got(5L)._5 == 0, "ellipsis fraction")
    assert(got(6L)._6 == 0, "alpha fraction")
    assert(got(7L)._7 == 0, "stopword floor")
    assert(got(8L)._2 == 0, "mean word length")
  }

  test("bigramSurprisal: short docs score 0; repeated bigrams are cheap") {
    // corpus: "a b" appears 3x as a bigram, "a c" once → p(b|a)=3/4,
    // bits("a b") = floor(log2(4 div 3)) = 0; bits("a c") = floor(log2(4)) = 2
    val docs = Seq((1L, "a b a b a b a c"), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
    val got = graft.operators.LexicalRank
      .bigramSurprisal(docs, "doc_id", "text")
      .select("id", "n_bigrams", "sum_bits", "surprisal2")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc1 bigrams: (a,b)x3 (b,a)x3 (a,c)x1 = 7; prefix a count 4, b 3;
    // bits: (a,b)=floor(log2(4/3))=0, (b,a)=floor(log2(3/3))=0,
    // (a,c)=floor(log2(4/1))=2 → sum 2
    assert(got(1L) == ((7L, 2L, math.rint(2.0 / 7 * 1e6) / 1e6)), got(1L))
    assert(got(2L) == ((0L, 0L, 0.0)), "single-token doc must score 0")
    assert(got(3L) == ((0L, 0L, 0.0)), "empty doc must score 0")
  }

  test("hashedLinearLogit: empty text scores 0, token order is irrelevant") {
    val docs = Seq((1L, "x y z"), (2L, "z y x"), (3L, ""), (4L, "   "))
      .toDF("doc_id", "text")
    val got = docs
      .select(col("doc_id"), TF.hashedLinearLogit(col("text"), 4096).as("l"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L), "bag-of-words: order must not matter")
    assert(got(3L) == 0L && got(4L) == 0L, "tokenless text scores 0")
    // weights genuinely vary across buckets (not a constant function)
    assert(got(1L) != 0L)
  }

  test("containmentPairs: directed quote detection Jaccard misses") {
    val quote = "alpha beta gamma delta epsilon"
    val host = s"intro words first $quote and then a very long tail " +
      "of unrelated filler prose continuing on and on with more filler"
    val cd = Seq((1L, quote), (2L, host), (3L, "separate thing entirely"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(cd, "doc_id", "text", n = 2, tau = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(cont.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0),
      s"doc 1's shingles all appear in doc 2: $cont")
    assert(!cont.exists(p => p._1 == 2L && p._2 == 1L),
      "containment is directed — the host is not contained in the quote")
    // symmetric Jaccard at the same threshold misses the pair entirely
    val jac = Dedup.jaccardPairs(cd, "doc_id", "text", n = 2, tau = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(!jac.exists(p => p._1 == 1L && p._2 == 2L), s"J(1,2) << 0.9: $jac")
  }

  test("winnowedFingerprints: guarantee, tie rule, edges") {
    val w = 4
    def fps(rows: Seq[(Long, String)]): Map[Long, Seq[(Long, Long)]] =
      rows.toDF("doc_id", "text")
        .select(col("doc_id"),
          TF.winnowedFingerprints(col("text"), 2, w).as("f"))
        .as[(Long, Seq[Long])].collect().toMap.view
        .mapValues(_.map(e => (e >> 20, 1048575L - (e & 1048575L)))).toMap

    // any shared run of >= w + n - 1 tokens must share a fingerprint HASH
    val shared = "one two three four five six"  // 6 tokens = w + n
    val m = fps(Seq(
      (1L, s"$shared padding tail here"),
      (2L, s"prefix words ahead $shared")))
    val h1 = m(1L).map(_._1).toSet
    val h2 = m(2L).map(_._1).toSet
    assert((h1 & h2).nonEmpty, s"winnowing guarantee violated: $h1 vs $h2")

    // all-equal hashes: each window picks its RIGHTMOST position (the
    // selected SET is the contract; the gate consumes order-free sums)
    val e = fps(Seq((3L, "x x x x x x")))(3L) // 5 shingles, windows at 0,1
    assert(e.toSet ==
      Set((PolyHash.hash("x x"), 3L), (PolyHash.hash("x x"), 4L)), e)

    // shorter than one window -> single overall fingerprint; empty -> none
    val s2 = fps(Seq((4L, "a b c"), (5L, ""), (6L, "solo")))
    assert(s2(4L).size == 1 && s2(5L).isEmpty && s2(6L).isEmpty, s2)
  }

  test("cdc_boundaries kernel equals the declarative filter form") {
    import org.apache.spark.sql.catalyst.expressions.Substring
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((9001L, ""), (9002L, "short"), (9003L, "exactly8"))
        .toDF("doc_id", "text"))
    val declarative = when(length(col("text")) < 8,
        array().cast("array<int>"))
      .otherwise(filter(sequence(lit(8), length(col("text"))), j =>
        PolyHash.poly_hash(column(Substring(expression(col("text")),
          expression(j - 7), expression(lit(8))))) % 64 === 0))
    val diff = d.select(col("doc_id"),
        graft.functions.TextKernels.cdc_boundaries(col("text"), 8, 64).as("k"),
        declarative.as("h"))
      .where(not(col("k") <=> col("h")))
    assert(diff.isEmpty, diff.take(3).mkString("; "))
  }

  test("simhash kernel is bit-equal to the declarative form") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((9001L, ""), (9002L, "solo"), (9003L, "a b c a b"))
        .toDF("doc_id", "text"))
    val diff = d.select(col("doc_id"),
        Dedup.simhash(col("text"), 2).as("k"),
        Dedup.simhashDeclarative(col("text"), 2).as("h"))
      .where(not(col("k") <=> col("h")))
    assert(diff.isEmpty, diff.take(3).mkString("; "))
  }

  test("winnow kernel is bit-equal to the declarative HOF form") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((9001L, ""), (9002L, "solo"), (9003L, "a b c"),
        (9004L, "x x x x x x")).toDF("doc_id", "text"))
    val both = d.select(col("doc_id"),
        TF.winnowedFingerprints(col("text"), 2, 4).as("k"),
        TF.winnowedFingerprintsHof(col("text"), 2, 4).as("h"))
      .where(not(col("k") <=> col("h")))
    assert(both.isEmpty, both.take(3).mkString("; "))
  }

  test("jaroWinkler matches DuckDB golden values bit-exactly") {
    // goldens from duckdb 1.0 jaro_winkler_similarity (byte alphabet,
    // boost threshold 0.7 strict, prefix cap 4, both-empty -> 0)
    val golden = Seq(
      ("martha", "marhta", 0.9611111111111111),    // classic + boost
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("abcdefgh", "abcdefxy", 0.9),               // prefix capped at 4
      ("abcdef", "fedcba", 0.38888888888888884),   // jaro<0.7: no boost
      ("héllo", "hallo", 0.8400000000000001),      // BYTE-level multibyte
      ("", "abc", 0.0), ("", "", 0.0), ("abc", "abc", 1.0),
      ("Hello", "hello", 0.8666666666666667),      // case-sensitive
      ("ab", "ax", 0.6666666666666666),            // 0.7 threshold strict
      ("aaaa", "aaaaaaaaaaaa", 0.8666666666666666))
    // codegen path (DataFrame) and interpreted path (nullSafeEval)
    val got = golden.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(TF.jaroWinkler(col("a"), col("b"))).as[Double].collect()
    golden.zip(got).foreach { case ((a, b, exp), v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(exp), s"codegen $a/$b: $v != $exp")
    }
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    golden.foreach { case (a, b, exp) =>
      val v = graft.functions.TextKernels.jaroWinkler(u8(a), u8(b))
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(exp), s"eval $a/$b: $v != $exp")
    }
    // symmetry on the jaro core holds for same-length prefix situations;
    // null in -> null out through the expression
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(TF.jaroWinkler(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("levenshtein counts CODEPOINTS on non-ASCII (edit_pairs caveat)") {
    // edit_pairs is oracle-exact only on the ASCII documents corpus:
    // DuckDB's levenshtein counts BYTES, Spark's counts codepoints. This
    // pins the Spark semantics the gate ships — 'é' is ONE edit away
    // from 'e' (a byte-level distance would say 2: 0xC3 0xA9 vs 0x65),
    // and a 2-codepoint word is distance 2 from empty even when it is 5
    // bytes of UTF-8.
    val got = Seq(("café", "cafe"), ("日本", ""), ("naïve", "naive"))
      .toDF("a", "b")
      .select(org.apache.spark.sql.functions.levenshtein(col("a"), col("b")))
      .as[Int].collect().toSeq
    assert(got == Seq(1, 2, 1), got)
  }

  test("skipgramPairs: window, symmetry, edges") {
    val got = Seq((1L, "a b c d"), (2L, ""), (3L, "solo"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TF.skipgramPairs(col("text"), 2).as("p"))
      .as[(Long, Seq[(String, String)])].collect().toMap
    // every ordered pair within distance 2, both directions
    val exp = Seq("a" -> "b", "a" -> "c", "b" -> "a", "b" -> "c", "b" -> "d",
      "c" -> "a", "c" -> "b", "c" -> "d", "d" -> "b", "d" -> "c")
    assert(got(1L).sorted == exp.sorted, got(1L))
    assert(got(2L).isEmpty && got(3L).isEmpty)
  }

}
