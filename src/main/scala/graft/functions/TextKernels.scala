package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels for the text-dedup hot path.
  *
  * [[ShingleHashesExpr]] fuses tokenize → word-n-gram → PolyHash →
  * distinct into ONE pass over the string (the declarative form is a
  * 4-deep higher-order-function tree that falls back to interpreted eval);
  * [[MinHashSigExpr]] folds all permutations over the hash array in a
  * single loop. Both reproduce the exact arithmetic of the SQL oracles
  * (PolyHash over ' '-joined token n-grams; (a·h+b) mod P minima), so
  * results stay value-level oracle-checkable.
  */
object TextKernels {

  /** Distinct PolyHash values of the whitespace-token n-grams of `s`,
    * in first-occurrence order. */
  def shingleHashes(s: String, n: Int): Array[Long] = {
    val toks = s.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return Array.emptyLongArray
    val seen = new java.util.LinkedHashSet[Long]()
    var i = 0
    while (i + n <= toks.length) {
      // PolyHash of the ' '-joined n-gram without materializing the string
      var acc = 0L
      var j = 0
      while (j < n) {
        if (j > 0) acc = (acc * 31 + ' ') % PolyHash.Prime
        val w = toks(i + j)
        var k = 0
        while (k < w.length) {
          val cp = w.codePointAt(k)
          acc = (acc * 31 + cp) % PolyHash.Prime
          k += Character.charCount(cp)
        }
        j += 1
      }
      seen.add(acc)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  def shingleHashesArray(s: UTF8String, n: Int): ArrayData =
    new GenericArrayData(shingleHashes(s.toString, n))

  /** Winnowing fingerprint selection fused into one pass (tokenize →
    * ordered n-gram PolyHash sequence → per-window rightmost-tie min →
    * distinct, ascending) — the kernel behind
    * [[graft.functions.TextFunctions.winnowedFingerprints]]; same
    * encoding enc = h·2^20 + (2^20-1-pos), identical to the DuckDB
    * row-window mirror. The declarative HOF form re-evaluates its
    * token/shingle subtrees per slice reference (interpreted, no
    * codegen), which measured ~9 ms per 300-char document; this kernel
    * is a straight O(m·w) long loop. */
  def winnowFingerprints(s: String, n: Int, w: Int): Array[Long] = {
    val toks = s.trim.split("\\s+").filter(_.nonEmpty)
    val m = toks.length - n + 1
    if (m <= 0) return Array.emptyLongArray
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var j = 0
      while (j < n) {
        if (j > 0) acc = (acc * 31 + ' ') % PolyHash.Prime
        val word = toks(i + j)
        var k = 0
        while (k < word.length) {
          val cp = word.codePointAt(k)
          acc = (acc * 31 + cp) % PolyHash.Prime
          k += Character.charCount(cp)
        }
        j += 1
      }
      hs(i) = acc
      i += 1
    }
    @inline def enc(j: Int): Long = hs(j) * 1048576L + (1048575L - j)
    if (m < w) {
      var best = Long.MaxValue
      var j = 0
      while (j < m) { val e = enc(j); if (e < best) best = e; j += 1 }
      return Array(best)
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i + w <= m) {
      var best = Long.MaxValue
      var j = i
      while (j < i + w) { val e = enc(j); if (e < best) best = e; j += 1 }
      sel.add(best)
      i += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  def winnowFingerprintsArray(s: UTF8String, n: Int, w: Int): ArrayData =
    new GenericArrayData(winnowFingerprints(s.toString, n, w))

  /** 60-bit SimHash fused into one pass — the kernel behind
    * [[graft.operators.Dedup.simhash]]. Arithmetic identical to the
    * declarative form and the SQL oracle: DISTINCT word-n-gram STRINGS
    * (string set semantics, not hash set), per shingle
    * h = PolyHash(g) xor (PolyHash(g || "#1") << 30), bit b of the
    * fingerprint = [Σ ±1 over shingles > 0]. The declarative form's 60
    * per-bit `aggregate` expressions each re-evaluate the whole
    * tokenize→shingle→hash subtree interpreted (measured ~150 ms per
    * 300-char document — 78 s for a 500-doc pass); this kernel hashes
    * each shingle once and updates 60 counters in a flat loop. */
  def simhash60(s: String, n: Int): Long = {
    val toks = s.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return 0L
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val cnt = new Array[Int](60)
    val it = seen.iterator()
    while (it.hasNext) {
      val g = it.next()
      val h = PolyHash.hash(g) ^ (PolyHash.hash(g + "#1") << 30)
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 60) { if (cnt(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }

  def simhash_60(text: Column, n: Int): Column =
    ColumnBridge.column(SimHash60Expr(ColumnBridge.expression(text), n))

  /** Content-defined chunk boundaries fused into one pass: position j
    * (1-based, j in [n, len]) is a boundary iff PolyHash of the n
    * characters ending at j is ≡ 0 (mod `mod`) — bit-for-bit the
    * declarative `filter(sequence(n, length(text)), j ->
    * poly_hash(substring(text, j-n+1, n)) % mod = 0)` form and the
    * DuckDB range() mirror, at ~n integer ops per character instead of
    * one boxed interpreted-HOF element evaluation per position.
    * Positions are CODEPOINT positions (identical to Spark substring /
    * DuckDB substr on this BMP/ASCII corpus). */
  def cdcBoundaries(s: String, n: Int, mod: Int): Array[Int] = {
    val cps = s.codePoints().toArray
    val len = cps.length
    if (len < n) return Array.emptyIntArray
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var j = n
    while (j <= len) {
      var acc = 0L
      var k = j - n
      while (k < j) { acc = (acc * 31 + cps(k)) % PolyHash.Prime; k += 1 }
      if (acc % mod == 0) out += j
      j += 1
    }
    out.toArray
  }

  def cdcBoundariesArray(s: UTF8String, n: Int, mod: Int): ArrayData =
    new GenericArrayData(cdcBoundaries(s.toString, n, mod))

  def cdc_boundaries(text: Column, n: Int, mod: Int): Column =
    ColumnBridge.column(CdcBoundariesExpr(ColumnBridge.expression(text), n, mod))

  def winnow_fingerprints(text: Column, n: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprintsExpr(
      ColumnBridge.expression(text), n, w))

  /** MinHash signature over a hash array: per permutation i,
    * min((a_i·h + b_i) mod P); null-free, Long.MaxValue → null upstream
    * is represented by an empty input producing an all-null signature
    * marker (-1), which callers filter.
    *
    * Inputs are folded into [0, P) once per element BEFORE the
    * permutation loop — a no-op for the engine's own poly-hash streams
    * (already < P, so `h % P = h` and every product stays < 2^60), but
    * it keeps the SQL-registered form well-defined for a user feeding
    * full-range hashes (e.g. xxhash64 output), where the raw product
    * would overflow Long and Java's sign-preserving % would emit
    * negative signature garbage silently. */
  def minhashSig(hashes: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val m = hashes.numElements()
    val folded = new Array[Long](m)
    var j = 0
    while (j < m) {
      folded(j) = Math.floorMod(hashes.getLong(j), PolyHash.Prime)
      j += 1
    }
    val sig = new Array[Long](as.length)
    var i = 0
    while (i < as.length) {
      var best = Long.MaxValue
      j = 0
      while (j < m) {
        val v = (folded(j) * as(i) + bs(i)) % PolyHash.Prime
        if (v < best) best = v
        j += 1
      }
      sig(i) = if (m == 0) -1L else best
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Unicode NFC normalization (canonical composition) — the text-cleanup
    * pass that collapses decomposed sequences (e + U+0301 → é) so
    * fingerprints/dedup keys are stable across byte-level encodings of
    * the same text. Fast path: `Normalizer.isNormalized` is a cheap scan
    * that returns the INPUT buffer untouched for already-NFC text (the
    * overwhelmingly common case in a mostly-ASCII corpus), so the
    * String round-trip is only paid on rows that actually change. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfc_normalize(text: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(text)))

  /** Byte-level Jaro-Winkler similarity, arithmetic-identical to DuckDB's
    * `jaro_winkler_similarity` (a RapidFuzz port): the alphabet is RAW
    * UTF-8 BYTES (not codepoints — DuckDB scores multibyte text per
    * byte, validated empirically), match window ⌊max(|a|,|b|)/2⌋−1,
    * transpositions = half the mismatched matched positions, Winkler
    * prefix boost only when jaro > 0.7 (strict), prefix capped at 4
    * bytes, weight 0.1, and BOTH-empty → 0.0 (DuckDB's convention, not
    * the classical 1.0). The double expression mirrors RapidFuzz's
    * left-to-right evaluation order, so results are bit-identical —
    * validated against DuckDB 1.0 on 20k random multibyte pairs plus
    * empties before porting (see JaroWinklerSpec golden rows). */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes; val s2 = b.getBytes
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var looking = true
      while (j <= hi && looking) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; looking = false
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // mismatched matched positions come in pairs; t/2 is the Jaro count
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    var sim = (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
    if (sim > 0.7) {
      val pmax = math.min(math.min(l1, l2), 4)
      var p = 0
      while (p < pmax && s1(p) == s2(p)) p += 1
      sim = sim + p * 0.1 * (1.0 - sim)
    }
    sim
  }

  def jaro_winkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def shingle_hashes(text: Column, n: Column): Column =
    ColumnBridge.column(ShingleHashesExpr(
      ColumnBridge.expression(text), ColumnBridge.expression(n)))

  def minhash_sig(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(hashes),
      numHashes))
}

/** Codegen NFC normalization over a string column (DuckDB mirror:
  * `nfc_normalize`). Null in → null out; the kernel's fast path makes
  * already-normalized rows allocation-free. */
case class NfcNormalizeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StringType
  override def toString: String = s"nfc_normalize($child)"
  protected override def nullSafeEval(s: Any): Any =
    TextKernels.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.nfc($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Codegen content-defined chunk boundaries (see
  * [[TextKernels.cdcBoundaries]]). */
case class CdcBoundariesExpr(child: Expression, n: Int, mod: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def toString: String = s"cdc_boundaries($child, $n, $mod)"
  protected override def nullSafeEval(s: Any): Any =
    TextKernels.cdcBoundariesArray(s.asInstanceOf[UTF8String], n, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.TextKernels.cdcBoundariesArray($s, $n, $mod)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Codegen 60-bit SimHash (see [[TextKernels.simhash60]]). */
case class SimHash60Expr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def toString: String = s"simhash60($child, $n)"
  protected override def nullSafeEval(s: Any): Any =
    TextKernels.simhash60(s.asInstanceOf[UTF8String].toString, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.TextKernels.simhash60($s.toString(), $n)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Codegen winnowing selection (see [[TextKernels.winnowFingerprints]]);
  * `n`/`w` ride as case-class ints so canonicalization-based plan reuse
  * works structurally. */
case class WinnowFingerprintsExpr(child: Expression, n: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def toString: String = s"winnow_fingerprints($child, $n, $w)"
  protected override def nullSafeEval(s: Any): Any =
    TextKernels.winnowFingerprintsArray(s.asInstanceOf[UTF8String], n, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.TextKernels.winnowFingerprintsArray($s, $n, $w)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class ShingleHashesExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def toString: String = s"shingle_hashes($left, $right)"
  protected override def nullSafeEval(s: Any, n: Any): Any =
    TextKernels.shingleHashesArray(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) =>
      s"graft.functions.TextKernels.shingleHashesArray($s, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Carries only `numHashes` — the permutation constants are re-derived
  * lazily from [[graft.operators.Dedup.minhashPerms]] (deterministic),
  * so case-class equality is structural and canonicalization-based plan
  * reuse works across independently built instances (an `Array` field
  * compares by reference; see [[graft.functions.SignBandsExpr]]). */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val (as, bs): (Array[Long], Array[Long]) = {
    val perms = graft.operators.Dedup.minhashPerms(numHashes)
    (perms.map(_._1).toArray, perms.map(_._2).toArray)
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def toString: String = s"minhash_sig($child, $numHashes)"

  protected override def nullSafeEval(h: Any): Any =
    TextKernels.minhashSig(h.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    defineCodeGen(ctx, ev, h =>
      s"graft.functions.TextKernels.minhashSig($h, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Codegen byte-level Jaro-Winkler similarity (see
  * [[TextKernels.jaroWinkler]] for the exact DuckDB-mirroring
  * semantics). Null in → null out. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def toString: String = s"jaro_winkler($left, $right)"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextKernels.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
