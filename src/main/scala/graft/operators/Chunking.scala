package graft.operators

import graft.functions.{PolyHash, TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-length token-window chunking with stride — the pre-embedding
  * segmentation step of an embedding/RAG pipeline (documents are embedded
  * per chunk, then pooled back per doc: see SimilaritySearch.meanPool for
  * the other half of that round trip).
  *
  * Semantics: 1-based token starts at 1, 1+stride, 1+2·stride, ... ≤ n;
  * each chunk is the next `chunkLen` tokens (the final chunk may be
  * shorter — it is kept, matching the usual embedder behavior); tokenless
  * documents produce NO chunks. `stride < chunkLen` gives overlapping
  * windows; `stride = chunkLen` tiles exactly.
  *
  * Scale shape: one narrow projection + one explode — zero shuffle at any
  * corpus size; output volume is `ceil(n/stride)` rows per doc, each
  * carrying the chunk fingerprint and bounds, not the text itself (the
  * caller re-slices or joins when it needs the content — keeping the
  * exploded stream narrow is what makes the pass cheap at 100 TB).
  */
object Chunking {

  /** (id, chunk_idx, start, n_tokens, chunk_fp) per chunk: `chunk_idx`
    * 0-based in document order, `start` the 1-based token offset,
    * `n_tokens` the actual (possibly short final) chunk length,
    * `chunk_fp` the PolyHash of the space-joined chunk tokens. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen > 0 && stride > 0, "chunkLen and stride must be positive")
    val base = docs.select(col(idCol).as("id"), TF.tokens(col(textCol)).as("t"))
      .where(size(col("t")) >= 1)
    base
      .select(col("id"), col("t"),
        posexplode(sequence(lit(1), size(col("t")), lit(stride))))
      .select(col("id"),
        col("pos").cast("int").as("chunk_idx"),
        col("col").cast("int").as("start"),
        slice(col("t"), col("col"), lit(chunkLen)).as("chunk"))
      .select(col("id"), col("chunk_idx"), col("start"),
        size(col("chunk")).cast("long").as("n_tokens"),
        PolyHash.poly_hash(concat_ws(" ", col("chunk"))).as("chunk_fp"))
  }
}
