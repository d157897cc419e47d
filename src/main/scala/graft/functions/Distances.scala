package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distance kernels over `array<double>` columns, built from Spark's
  * higher-order functions (`zip_with`/`aggregate`) so they stay inside the
  * JVM with no UDF serialization (reference kernel: `dist` at DBSCAN.py:58-59
  * — L1/Manhattan over the first `dimension` coords).
  */
object Distances {

  /** L1 / Manhattan distance: Σ |a_i - b_i| (native codegen kernel). */
  def l1(a: Column, b: Column): Column = VecKernels.l1_dist(a, b)

  /** Reference higher-order-function form of [[l1]] (spec cross-check). */
  def l1Hof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0.0), (acc, v) => acc + v)

  /** Squared Euclidean distance: Σ (a_i - b_i)². */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Dot product Σ a_i·b_i (native codegen kernel). */
  def dot(a: Column, b: Column): Column = VecKernels.dot_product(a, b)

  /** Reference higher-order-function form of [[dot]] (spec cross-check). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm of a vector column. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 for zero-norm vectors (instead of NaN). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Pack fixed numeric columns into an `array<double>` point column. */
  def pack(cols: Column*): Column = array(cols.map(_.cast("double")): _*)
}
