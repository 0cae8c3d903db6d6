package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the per-document character-histogram
  * fold behind `text_entropy`.
  *
  * The HOF formulation (`aggregate(array_sort(split(text, '')), …)`) is
  * semantically right but pays interpreted-lambda dispatch and a boxed
  * struct allocation PER CHARACTER — measured 1.40 s for the sf0.1
  * corpus. This expression runs the identical algorithm — sort the
  * code points, one run-length pass accumulating `Σ run·log2(run)` in
  * ascending-run order (the float sum order is part of the
  * cross-engine contract) — as one tight primitive loop per document,
  * invoked from inside whole-stage codegen. Same numbers, same
  * summation order, no per-char anything.
  */
case class CharRunStats(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = CharRunStats.Shape
  override def prettyName: String = "char_run_stats"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${t.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    CharRunStats.stats(input.asInstanceOf[UTF8String])

  // one static call per ROW doing the whole primitive loop — the row
  // stays inside the surrounding WholeStageCodegen (no lambda
  // interpretation, no per-element dispatch)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharRunStats.stats($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CharRunStats {

  /** `(n_chars, n_unique, clog)` — code-point count, distinct
    * code-point count, and `Σ run·log2(run)` over the sorted histogram
    * runs. Entropy composes downstream as
    * `log2(n_chars) − clog/n_chars`, exactly like the HOF fold did.
    */
  val Shape: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_unique", LongType, nullable = false),
    StructField("clog", DoubleType, nullable = false)))

  private val Log2 = java.lang.Math.log(2.0)

  /** Static so generated code can call it directly. Sort order is
    * ascending code point — identical to the HOF's `array_sort` of
    * single-char strings for all BMP text (UTF8 byte order = code-point
    * order there), so the float accumulation visits runs in the same
    * sequence.
    */
  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    val cps = new Array[Int](str.length)
    var m = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(m) = cp
      m += 1
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps, 0, m)
    var unique = 0L
    var acc = 0.0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && cps(j) == cps(i)) j += 1
      val run = (j - i).toDouble
      // run·(log(run)/log2) — the same grouping as the HOF's
      // `n * log2(n)`, so results are bit-identical
      acc += run * (java.lang.Math.log(run) / Log2)
      unique += 1
      i = j
    }
    new GenericInternalRow(Array[Any](m.toLong, unique, acc))
  }
}

/** Native expression for the per-document bigram repetition profile
  * behind `text_repetition`: whitespace-tokenize, form word bigrams,
  * count total / distinct / most-frequent — one hash-map pass per row.
  * The HOF formulation (transform + array_sort + aggregate lambda) was
  * measured at 11.6 s for the sf0.1 corpus; every output here is an
  * INTEGER, so unlike [[CharRunStats]] there is no float-order contract
  * to preserve and the count map needs no ordering at all.
  */
case class BigramStats(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BigramStats.Shape
  override def prettyName: String = "bigram_stats"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${t.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    BigramStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BigramStats.stats($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BigramStats {

  val Shape: StructType = StructType(Seq(
    StructField("n_ngrams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_n", LongType, nullable = false)))

  /** Tokenization contract matches the query layer's
    * `split(trim(text), "\\s+")`: UTF8String.trim strips ASCII spaces
    * only (Java's String.trim would also strip tabs/newlines — a
    * different token count on tab-led text), then Java regex split.
    */
  def stats(s: UTF8String): InternalRow = {
    val str = s.trim().toString
    val ws = str.split("\\s+", -1)
    if (ws.length < 2)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Int](ws.length * 2)
    var top = 0
    var i = 0
    while (i < ws.length - 1) {
      val g = ws(i) + " " + ws(i + 1)
      val c = counts.merge(g, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    new GenericInternalRow(Array[Any](
      (ws.length - 1).toLong, counts.size.toLong, top.toLong))
  }
}

/** Native expression producing every consecutive CODE-POINT bigram of
  * a string — the tokenizer feed for `text_bigram_lm`. The HOF
  * formulation (`transform(sequence(1, length-1), i ⇒ substr(i, 2))`)
  * re-scans the string from its head on EVERY position (SQL substr is
  * code-point-indexed, so each call walks the UTF-8 bytes to position
  * i): O(len²) per document, measured 3.6 s for the sf0.1 corpus. This
  * walks the code points once and slices — O(len), same output,
  * including the same 2-code-point bigram semantics DuckDB's substr
  * oracle sees.
  */
case class CharBigrams(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_bigrams"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${t.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    CharBigrams.bigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharBigrams.bigrams($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CharBigrams {

  def bigrams(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    // UTF-16 offset of each code point start, plus the end sentinel —
    // bigram k spans [starts(k), starts(k+2))
    val starts = new Array[Int](n + 1)
    var m = 0
    var i = 0
    while (i < n) {
      starts(m) = i
      m += 1
      i += Character.charCount(str.codePointAt(i))
    }
    starts(m) = n
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - 1)
    var k = 0
    while (k < m - 1) {
      out(k) = UTF8String.fromString(str.substring(starts(k), starts(k + 2)))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Native expression emitting the content-defined chunk boundaries of a
  * document — every 1-based code-point position `i ≥ window` where the
  * polynomial hash of the trailing `window` code points satisfies
  * `(h mod P) mod mask == 0` — in ONE O(len) rolling pass per row.
  *
  * This replaces the per-position md5-prefix boundary test (O(window)
  * digest work at EVERY character — ~50× the arithmetic of the standard
  * Gear/Rabin shape, and the bench's top text cost). The hash is the
  * classic Rabin-Karp polynomial `Σ c(i−k)·B^k mod P` over a Mersenne
  * prime, updated per position with one multiply, one add, one
  * subtract, one mod — and chosen over a Gear table because the closed
  * form is 8 integer multiply-adds any SQL engine can state verbatim:
  * the DuckDB oracle computes the IDENTICAL window sum with the same
  * precomputed `B^k mod P` constants, so boundaries are bit-identical
  * cross-engine (all arithmetic exact in int64: `c·B^k mod P` ≤
  * 0x10FFFF·(P−1) ≈ 2.3e15, window sums ≤ 8× that).
  */
case class CdcBoundaries(child: Expression, window: Int, mask: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${t.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.boundaries(input.asInstanceOf[UTF8String], window, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcBoundaries.boundaries($c, $window, ${mask}L);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CdcBoundaries {

  /** Polynomial base and modulus — PUBLIC constants of the boundary
    * contract: the DuckDB oracle's `B^k mod P` literals derive from
    * these same values, so the two engines cannot drift.
    */
  val Base = 257L
  val Prime = 2147483647L // 2^31 − 1 (Mersenne)

  /** `B^k mod P` for `k = 0 until n` — the closed-form coefficients the
    * oracle SQL states verbatim (leftmost window char carries the
    * highest power).
    */
  def powers(n: Int): IndexedSeq[Long] =
    (1 until n).scanLeft(1L)((p, _) => p * Base % Prime).toIndexedSeq

  /** One rolling pass: after consuming code point at 1-based position
    * `pos`, `h = Σ_{k=0}^{W−1} c(pos−k)·B^k mod P` (induction: multiply
    * by B shifts every power up, adding the new char supplies B^0,
    * subtracting the evicted char's `c·B^W` restores the window). The
    * evicted code point is read from a W-slot ring at `pos mod W` —
    * position `pos−W` wrote that same slot — just before the new char
    * overwrites it.
    */
  def boundaries(s: UTF8String, window: Int, mask: Long): ArrayData = {
    val str = s.toString
    var powW = 1L
    var k = 0
    while (k < window) { powW = powW * Base % Prime; k += 1 }
    val ring = new Array[Long](window)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var pos = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      pos += 1
      h = (h * Base + cp) % Prime
      if (pos > window) {
        val slot = pos % window
        h = java.lang.Math.floorMod(h - ring(slot) * powW % Prime, Prime)
        ring(slot) = cp.toLong
      } else {
        ring(pos % window) = cp.toLong
      }
      if (pos >= window && h % mask == 0L) out += pos
    }
    new GenericArrayData(out.toArray)
  }
}

/** Every sliding-window polynomial hash of a document, one O(len)
  * rolling pass — the cross-document repeated-n-gram primitive behind
  * `dedup_repeated_ngrams` (Lee et al. 2021, "Deduplicating Training
  * Data Makes Language Models Better": drop spans whose content
  * reappears elsewhere in the corpus).
  *
  * Same recurrence and constants as [[CdcBoundaries]] ([[CdcBoundaries.Base]]
  * / [[CdcBoundaries.Prime]]) but emitting the HASH at every complete
  * window instead of boundary positions: element `i` (0-based) is
  * `Σ_{k=0}^{W−1} c(i+W−k)·B^k mod P` — the hash of the window whose
  * 1-based code-point start is `i + 1`. Array length is
  * `max(0, n_codepoints − W + 1)`.
  *
  * Scale shape: map-side only. Downstream groups 8-byte longs (not
  * W-char strings) to find candidate repeats, then verifies the
  * surviving few by content — the standard hash-prefilter shape for
  * substring-level dedup over 100 TB, where shuffling every raw window
  * string would be W× the shuffle bytes for mostly-unique keys.
  */
case class RollingWindowHashes(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_window_hashes"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${t.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    RollingWindowHashes.hashes(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingWindowHashes.hashes($c, $window);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RollingWindowHashes {
  import CdcBoundaries.{Base, Prime}

  /** The same ring-buffer rolling update as [[CdcBoundaries.boundaries]]
    * (multiply by B, add the new code point, evict `c·B^W`), collecting
    * the mod-P window hash at every position `pos ≥ W`.
    */
  def hashes(s: UTF8String, window: Int): ArrayData = {
    val str = s.toString
    var powW = 1L
    var k = 0
    while (k < window) { powW = powW * Base % Prime; k += 1 }
    val ring = new Array[Long](window)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var pos = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      pos += 1
      h = (h * Base + cp) % Prime
      if (pos > window) {
        val slot = pos % window
        h = java.lang.Math.floorMod(h - ring(slot) * powW % Prime, Prime)
        ring(slot) = cp.toLong
      } else {
        ring(pos % window) = cp.toLong
      }
      if (pos >= window) out += h
    }
    new GenericArrayData(out.toArray)
  }
}

object TextExpressions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def char_run_stats(text: Column): Column =
    column(CharRunStats(expression(text)))

  def bigram_stats(text: Column): Column =
    column(BigramStats(expression(text)))

  def char_bigrams(text: Column): Column =
    column(CharBigrams(expression(text)))

  def cdc_boundaries(text: Column, window: Int, mask: Long): Column =
    column(CdcBoundaries(expression(text), window, mask))

  def rolling_window_hashes(text: Column, window: Int): Column =
    column(RollingWindowHashes(expression(text), window))
}
