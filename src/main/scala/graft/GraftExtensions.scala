package graft

import graft.functions.{DotExpr, L1DistExpr, PolyHashExpr, ShingleHashesExpr, SimHash60Expr, SortedIntersectCountExpr, WinnowFingerprintsExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark session extension registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT poly_hash(text) ...")` works next to
  * the Column API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * This is the (b)-tier extension point of the custom-operator ladder
  * (SURVEY §7): scalar kernels as injected functions; no custom
  * LogicalPlan/Strategy is needed anywhere in the engine — every
  * whole-operator semantic composes from built-ins. One (c)-tier
  * optimizer rule rides along: [[graft.plans.GlobalWindowTopK]] rewrites
  * the global-window top-k anti-pattern (`row_number` over an
  * unpartitioned order filtered to `rank <= k`) into a distributed
  * Sort+Limit, protecting user queries from the single-task funnel the
  * engine's own gates avoid by hand.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        GraftExtensions.info(name, usage), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.GlobalWindowTopK)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[PolyHashExpr].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("poly_hash", "poly_hash(str) - rolling polynomial hash mod 1e9+7",
      args => PolyHashExpr(args.head)),
    ("l1_dist", "l1_dist(a, b) - Manhattan distance of double arrays",
      args => L1DistExpr(args.head, args(1))),
    ("dot_product", "dot_product(a, b) - dot product of double arrays",
      args => DotExpr(args.head, args(1))),
    ("shingle_hashes",
      "shingle_hashes(text, n) - distinct poly-hashes of word n-grams",
      args => ShingleHashesExpr(args.head, args(1))),
    ("sorted_intersect_count",
      "sorted_intersect_count(a, b) - |A∩B| of ascending-sorted long arrays",
      args => SortedIntersectCountExpr(args.head, args(1))),
    ("winnow_fingerprints",
      "winnow_fingerprints(text, n, w) - winnowed fingerprint encodings " +
        "h*2^20 + (2^20-1-pos), ascending distinct",
      args => WinnowFingerprintsExpr(args.head, intLit(args(1)), intLit(args(2)))),
    ("simhash60", "simhash60(text, n) - 60-bit SimHash of word n-grams",
      args => SimHash60Expr(args.head, intLit(args(1)))),
    ("cdc_boundaries",
      "cdc_boundaries(text, n, mod) - content-defined chunk boundary positions",
      args => graft.functions.CdcBoundariesExpr(args.head,
        intLit(args(1)), intLit(args(2)))),
    ("jaro_winkler",
      "jaro_winkler(a, b) - byte-level Jaro-Winkler similarity " +
        "(DuckDB-identical arithmetic)",
      args => graft.functions.JaroWinklerExpr(args.head, args(1))),
    // round 12: the remaining vector/text kernels, so SQL-only users
    // reach the full library without the Scala API
    ("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of double arrays " +
        "(0.0 for a zero-norm side)",
      args => cosineExpr(args.head, args(1))),
    ("sign_bands",
      "sign_bands(vec, dim, bits, bands) - random-hyperplane LSH band " +
        "keys (array<long>, one per band) of a double array",
      args => graft.functions.SignBandsExpr(args.head,
        graft.functions.VecKernels.SignBandBaseSeed,
        bands = intLit(args(3)), bits = intLit(args(2)),
        dim = intLit(args(1)))),
    ("minhash_sig",
      "minhash_sig(hashes, n) - n-permutation MinHash signature of a " +
        "long-array hash set; inputs are folded into [0, 1e9+7) first, " +
        "so full-range hashes (xxhash64) are accepted",
      args => graft.functions.MinHashSigExpr(args.head, intLit(args(1)))),
    ("nfc_normalize",
      "nfc_normalize(text) - Unicode NFC normalization",
      args => graft.functions.NfcNormalizeExpr(args.head)))

  /** The Catalyst tree [[graft.functions.Distances.cosine]]'s Column form
    * analyzes to, built directly (a composed Column can't ride through a
    * FunctionRegistry builder — its node tree stays unresolved inside the
    * registered expression). The parity spec pins SQL ≡ Column plans. */
  private def cosineExpr(a: Expression, b: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Divide, EqualTo, Literal, Multiply, Sqrt}
    def dot(x: Expression, y: Expression) = graft.functions.DotExpr(x, y)
    val d = Multiply(Sqrt(dot(a, a)), Sqrt(dot(b, b)))
    CaseWhen(Seq((EqualTo(d, Literal(0.0)), Literal(0.0))),
      Some(Divide(dot(a, b), d)))
  }

  /** Int value of a foldable literal argument (n/w parameters ride as
    * case-class ints on the expressions, not as child expressions). */
  private def intLit(e: Expression): Int =
    e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Number].intValue()

  /** Register on an already-built session (temp functions + the top-k
    * rewrite via `experimental.extraOptimizations`) — the runtime
    * alternative to `spark.sql.extensions` for sessions you don't build. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(graft.plans.GlobalWindowTopK))
      spark.experimental.extraOptimizations =
        cur :+ graft.plans.GlobalWindowTopK
  }
}
