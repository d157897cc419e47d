package graft.operators

import graft.functions.PolyHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic membership / frequency sketches built on the engine's
  * deterministic PolyHash, so every bit and every counter is reproducible
  * across engines (the DuckDB oracle replays the sketch exactly — even
  * false positives match).
  *
  * Scale rationale: a Bloom filter is the semi-join-pushdown primitive a
  * 100 TB pipeline reaches for when the membership set is small and the
  * probe side is the corpus — O(mBits) broadcast state filters the big
  * side in a pure zero-shuffle projection, and only the survivors pay the
  * exact verification join (the decontam pattern with the broadcast hash
  * set replaced by a fixed-size bitmap that does not grow with the key
  * set). The count-min sketch is the bounded-memory frequency table:
  * d·w counters regardless of vocabulary size, mergeable map-side, with
  * the classic one-sided (over-estimate only) error.
  *
  * Both use Kirsch-Mitzenmacher double hashing — position_i =
  * (h1 + i·h2) mod m with h1 = PolyHash(key) and h2 from the '#'-salted
  * key, h2 forced nonzero — so the oracle needs only two hash
  * evaluations per key, not k independent hash families.
  */
object Sketches {

  /** The k probe positions for `key` in a table of `mBits` slots:
    * array((h1 + i*h2) % mBits for i in 0 until k). All arithmetic stays
    * in [0, mBits·k) — no overflow, no sign handling. */
  def positions(key: Column, mBits: Int, k: Int): Column = {
    val h1 = PolyHash.poly_hash(key) % mBits
    val h2 = PolyHash.poly_hash(concat(key, lit("#"))) % (mBits - 1) + 1
    transform(sequence(lit(0), lit(k - 1)), i => (h1 + i * h2) % mBits)
  }

  /** The set Bloom words as a DataFrame: (widx, word) with 32 bits per
    * word (32-bit words keep every mask in [1, 2^31] — positive in both
    * engines' BIGINT, so no sign-extension mismatch). Map-side combined
    * groupBy on the word index; rows = at most mBits/32. */
  def bloomWords(keys: DataFrame, keyCol: String, mBits: Int, k: Int): DataFrame =
    keys.select(explode(positions(col(keyCol), mBits, k)).as("pos"))
      .select(floor(col("pos") / 32).as("widx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").as("m"))
      .groupBy("widx").agg(expr("bit_or(m)").as("word"))

  /** Collects the word table into a dense driver-side array — O(mBits/32)
    * longs, broadcast into the probe projection as a literal. */
  def buildBloom(keys: DataFrame, keyCol: String, mBits: Int, k: Int): Array[Long] = {
    val words = new Array[Long](mBits / 32)
    bloomWords(keys, keyCol, mBits, k).collect()
      .foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** Membership probe against a built filter: true iff every probe bit is
    * set. Pure projection (element_at on a literal array + exact 2^i
    * arithmetic — pow(2, i) is IEEE-exact for i ≤ 31), stays inside
    * whole-stage codegen; no shuffle at any probe-side size. */
  def mightContain(key: Column, words: Array[Long], mBits: Int, k: Int): Column =
    forall(positions(key, mBits, k), p =>
      (element_at(typedLit(words.toSeq), (floor(p / 32) + 1).cast("int"))
        .bitwiseAND(pow(lit(2.0), (p % 32).cast("double")).cast("long"))) =!= 0)

  /** Count-min sketch cells over every row of `items` (multiset counts):
    * (r, pos, c) for r in 0 until depth — the d·w counter matrix as rows.
    * One explode + one map-side-combined groupBy; the sketch size is
    * independent of the input cardinality. */
  def countMin(items: DataFrame, itemCol: String, width: Int, depth: Int): DataFrame =
    items.select(posexplode(positions(col(itemCol), width, depth)))
      .withColumnRenamed("pos", "r").withColumnRenamed("col", "p")
      .groupBy("r", "p").agg(count(lit(1)).as("c"))

  /** Point estimates for `queries` (one `itemCol` row each) against a
    * sketch from [[countMin]]: est = min over rows r of cell(r, pos_r).
    * The query side carries O(|queries|·depth) rows — broadcastable —
    * so the join never shuffles the sketch side by more than d·w rows. */
  def cmsEstimate(queries: DataFrame, itemCol: String, sketch: DataFrame,
                  width: Int, depth: Int): DataFrame = {
    val probes = queries.select(col("*"),
        posexplode(positions(col(itemCol), width, depth)))
      .withColumnRenamed("pos", "r").withColumnRenamed("col", "p")
    probes.join(sketch, Seq("r", "p"))
      .groupBy(itemCol).agg(min("c").as("est"))
  }

  /** HyperLogLog registers per group (Flajolet et al. 2007), fully
    * deterministic: bucket = PolyHash(key) mod mBuckets, rho = 1 +
    * leading zeros of the remaining `rhoBits` bits via an exact integer
    * CASE chain (no log2 floats — the same chain the hll_distinct oracle
    * regenerates). Returns (groupCol, bucket, m) — the per-(group,
    * bucket) MAX is the mergeable sketch state: the registers of a union
    * of inputs are the element-wise max of the inputs' registers
    * (SketchesSpec pins this), so shards sketch independently and merge
    * with one tiny max-groupBy. O(groups · mBuckets) rows at any input
    * size; the groupBy combines map-side. */
  def hllRegisters(keys: DataFrame, groupCol: String, keyCol: String,
                   mBuckets: Int, rhoBits: Int): DataFrame = {
    val first = when(col("__w") >= (1L << (rhoBits - 1)), 1)
    val rho = (rhoBits - 2 to 0 by -1)
      .foldLeft(first) { (acc, b) =>
        acc.when(col("__w") >= (1L << b), rhoBits - b)
      }.otherwise(rhoBits + 1).cast("long")
    keys
      .select(col(groupCol), PolyHash.poly_hash(col(keyCol)).as("__h"))
      .select(col(groupCol), expr(s"__h % $mBuckets").as("bucket"),
        expr(s"__h div $mBuckets").as("__w"))
      .withColumn("__rho", rho)
      .groupBy(groupCol, "bucket").agg(max("__rho").as("m"))
  }

  /** Misra-Gries heavy-hitter CANDIDATE generation (Misra & Gries 1982;
    * mergeability per Agarwal et al., "Mergeable Summaries", PODS'12):
    * one bounded-memory pass per partition keeps at most k-1 counters,
    * and any item with PARTITION frequency > n_p/k ends with a live
    * counter; by pigeonhole, every item with GLOBAL frequency > n/k
    * clears that bar in at least one partition, so the union of
    * per-partition survivors is a guaranteed superset of the true heavy
    * hitters. Callers re-count the candidates EXACTLY (broadcast
    * semi-join + keyed agg) and threshold on the exact counts, so the
    * final answer is deterministic — independent of partitioning and of
    * which extra candidates survived. This is the map-side-memory
    * alternative to a full groupBy when the DISTINCT-key cardinality
    * itself is data-scale (a trillion-token vocabulary): state is O(k)
    * per task instead of a spilling hash table. `mapPartitions` is the
    * honest host — the sketch is genuinely per-partition imperative
    * state, and it emits ≤ k-1 strings per partition, not data. */
  def mgCandidates(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col(itemCol).cast("string")).as[String]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { s =>
          if (s != null) {
            if (m.contains(s)) m(s) += 1L
            else if (m.size < k - 1) m(s) = 1L
            else m.keysIterator.toArray.foreach { key =>
              val v = m(key) - 1L
              if (v == 0L) m.remove(key) else m(key) = v
            }
          }
        }
        m.keysIterator
      }
      .toDF(itemCol).distinct()
  }
}
