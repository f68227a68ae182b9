package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** Winnowing fingerprint selection (Schleimer et al. 2003) as ONE native
  * Catalyst expression: token array in, selected `(pos, gram_hash)`
  * structs out. Replaces the four-stage higher-order-function chain in
  * [[graft.ext.TextAnalysis.winnowFingerprints]]'s original formulation —
  * per-char `aggregate` lambdas, two explode barriers against
  * CollapseProject re-inlining, an `array_distinct` over structs — with
  * the tight primitive loop the algorithm actually is. The HOF form
  * evaluated a boxed lambda per character/gram/window element
  * (~0.45 ms/doc measured at sf0.1); this kernel is one static call per
  * row inside whole-stage codegen.
  *
  * Hash contract (unchanged, bitwise): token hash = code-point polynomial
  * mod 2³¹−1 base 31 (empty token → 0), k-gram hash = token-hash
  * polynomial base 131 mod 2³¹−1, window width `min(w, #grams)`, minimum
  * per window with RIGHTMOST tie-break. Portable arithmetic — the DuckDB
  * oracles re-derive every hash in SQL, which is the whole point of this
  * lane (see winnowOracleCtes).
  *
  * Dedup note: with the rightmost-tie rule the selected position is
  * non-decreasing across windows (a dropped left element can only move
  * the rightmost minimum right), so consecutive-duplicate suppression is
  * exactly the `array_distinct` of the HOF form, in the same
  * first-occurrence (= increasing `pos`) order.
  *
  * Null contract: null array → null; a null TOKEN → null result (split
  * never produces null tokens; anything else is a caller bug surfaced as
  * null, the HOF chain's propagation). Fewer than k tokens → empty array
  * (callers filter those rows before the kernel, keeping explode
  * semantics identical).
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = WinnowSelect.outType
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_select"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.select(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // one static call per row; the kernel body is primitive loops, so
      // inlining it as raw Java here would buy nothing over the JIT
      s"""
        |${ev.value} = graft.functions.WinnowKernel.select($a, $k, $w);
        |${ev.isNull} = (${ev.value} == null);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {
  val outType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("gram_hash", LongType, nullable = false))),
    containsNull = false)
}

/** The static winnowing kernel — a plain object so generated code can
  * call it through the Scala static forwarder.
  */
object WinnowKernel {

  private val M = 2147483647L // 2^31 - 1: every intermediate < 2^39

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Selected fingerprints for one token array; see [[WinnowSelect]]. */
  def select(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return Empty
    // token hashes: code-point polynomial, base 31 mod M
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) return null
      val s = tokens.getUTF8String(i).toString
      var a = 0L
      var ci = 0
      while (ci < s.length) {
        val cp = s.codePointAt(ci)
        a = (a * 31L + cp) % M
        ci += Character.charCount(cp)
      }
      th(i) = a
      i += 1
    }
    // k-gram hashes: token-hash polynomial, base 131 mod M
    val ng = n - k + 1
    val gh = new Array[Long](ng)
    var p = 0
    while (p < ng) {
      var a = 0L
      var j = 0
      while (j < k) { a = (a * 131L + th(p + j)) % M; j += 1 }
      gh(p) = a
      p += 1
    }
    // windowed rightmost-minimum; short documents winnow as one window
    val width = if (w < ng) w else ng
    val nWin = ng - width + 1
    val outPos = new Array[Long](nWin)
    val outHash = new Array[Long](nWin)
    var m = 0
    var lastPos = -1
    var q = 0
    while (q < nWin) {
      var best = gh(q)
      var bestJ = 0
      var j = 1
      while (j < width) {
        if (gh(q + j) <= best) { best = gh(q + j); bestJ = j }
        j += 1
      }
      val pos = q + bestJ
      if (pos != lastPos) {
        outPos(m) = pos.toLong
        outHash(m) = best
        m += 1
        lastPos = pos
      }
      q += 1
    }
    val rows = new Array[Any](m)
    var r = 0
    while (r < m) {
      rows(r) = InternalRow(outPos(r), outHash(r))
      r += 1
    }
    new GenericArrayData(rows)
  }
}
