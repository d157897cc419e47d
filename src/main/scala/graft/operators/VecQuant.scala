package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding storage — the
  * standard 4× compression of an embedding corpus (float32→int8) before
  * ANN indexing: scale = max|x|/127, q_i = round(x_i/scale), so the max
  * component maps to ±127 and reconstruction is q_i·scale.
  *
  * Declarative HOF forms over `array<double>`: narrow projections, no
  * shuffle, pushdown-friendly. Cross-engine determinism: every float step
  * (abs-max, one division, half-away-from-zero rounding) is IEEE-exact or
  * identically rounded in DuckDB, and the reconstruction-error fold runs
  * in explicit element order on both sides (list_reduce mirror) — so the
  * gate is value-hash-exact, not approximately checked.
  */
object VecQuant {

  /** Per-vector quantization scale: max|x| / 127 (0.0 for a zero/empty
    * vector — quantized form is then all zeros). */
  def quantScale(vec: Column): Column =
    coalesce(array_max(transform(vec, x => abs(x))), lit(0.0)) / 127.0

  /** int8 codes as array<int> (kept wide for SQL mirroring; a production
    * sink would pack to binary). Zero scale → all-zero codes. */
  def quantize(vec: Column, scale: Column): Column =
    when(scale === 0.0, transform(vec, _ => lit(0)))
      .otherwise(transform(vec, x => round(x / scale, 0).cast("int")))

  /** Reconstruction q_i·scale. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, qi => qi.cast("double") * scale)

  /** L1 reconstruction error, folded in element order (aggregate HOF ≡
    * DuckDB list_reduce — deterministic association). */
  def reconstructionError(vec: Column, q: Column, scale: Column): Column =
    aggregate(zip_with(vec, dequantize(q, scale), (a, b) => abs(a - b)),
      lit(0.0), (acc, e) => acc + e)
}
