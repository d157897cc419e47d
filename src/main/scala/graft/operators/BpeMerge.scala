package graft.operators

import graft.core.{LineageCut, QueryCache}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.StringReplace
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Greedy byte-pair-encoding merge training (Sennrich et al., ACL 2016),
  * distributed: each round counts adjacent symbol pairs across the whole
  * corpus, picks the most frequent (ties to the lexicographically first),
  * and rewrites every left-to-right non-overlapping occurrence into one
  * merged symbol. `bpe_pairs` gates the first round's counting table;
  * this operator runs the actual iteration.
  *
  * Representation: a document's symbol sequence is ONE padded string —
  * " s1  s2  ...  sn " (two spaces between symbols, one at each end) —
  * so a merge round is a literal string replace of " x  y " with
  * " xy " (the marker records merge structure; symbols never
  * contain spaces). That makes the whole rewrite a zero-shuffle codegen
  * projection: the chosen pair is an O(1) driver scalar broadcast into a
  * `StringReplace`, and literal replace has identical left-to-right
  * continue-after-replacement semantics in the JVM and the oracle
  * engine, so greedy non-overlap ("x y x y" merges twice, "x x x" once)
  * reproduces exactly.
  *
  * Scale: per round, one map-side-combined pair-count groupBy, one
  * TakeOrdered(1), one projection — no shuffle grows with the merge
  * count, and the driver holds one (pair, count) row per round.
  */
object BpeMerge {
  /** Joins the two halves of a merged symbol. */
  val Marker = "\u0001"

  final case class Merge(round: Int, lhs: String, rhs: String, cnt: Long)

  /** Memoizable fit result (symbol table checkpointed by the caller). */
  final case class Fit(syms: DataFrame, merges: Seq[Merge])
    extends QueryCache.Releasable {
    def release(): Unit = LineageCut.release(syms)
  }

  private def litReplace(src: Column, search: String, repl: String): Column =
    ColumnBridge.column(StringReplace(ColumnBridge.expression(src),
      ColumnBridge.expression(lit(search)), ColumnBridge.expression(lit(repl))))

  /** Symbol array of a padded symbol string. */
  def symbols(sym: Column): Column =
    when(length(trim(sym)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(sym), "  "))

  /** (id, sym): the padded symbol string seeded from whitespace tokens. */
  def initSymbols(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      concat(lit(" "), array_join(TF.tokens(col(textCol)), "  "), lit(" "))
        .as("sym"))

  /** Adjacent symbol pairs, one row per occurrence (zero-shuffle
    * zip_with pairing, the bigram_score pattern). */
  private def pairs(df: DataFrame): DataFrame = {
    val a = symbols(col("sym"))
    df.where(size(a) >= 2)
      .select(explode(zip_with(
        slice(a, lit(1), size(a) - 1),
        slice(a, lit(2), size(a) - 1),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
  }

  /** Runs `rounds` greedy merges. Returns the final symbol table
    * (persisted; caller owns release) and the merge sequence. Stops
    * early if a round finds no pairs. */
  def fit(docs: DataFrame, idCol: String, textCol: String, rounds: Int): Fit = {
    var cur = initSymbols(docs, idCol, textCol).persist()
    cur.count()
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val top = pairs(cur).groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (w1, w2) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(r, w1, w2, top(0).getLong(2))
        val next = cur.withColumn("sym",
          litReplace(col("sym"), s" $w1  $w2 ", s" $w1$Marker$w2 ")).persist()
        next.count()
        cur.unpersist()
        cur = next
      }
      r += 1
    }
    Fit(cur, merges.result())
  }
}
