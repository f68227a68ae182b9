package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** M3 — FFT magnitude over a window array (reference
  * `src/util/calculations.py:160-172`: `abs(np.fft.fft(window))`).
  *
  * Implemented as a native Catalyst Expression over `array<double>` rather
  * than a Scala UDF: no Row boxing/unboxing per call, null handling inside
  * the expression, and the surrounding projection stays inside whole-stage
  * codegen (this node itself is CodegenFallback — the FFT body is a tight
  * primitive-array loop, which is what codegen would emit anyway).
  *
  * Algorithm: iterative radix-2 Cooley-Tukey for power-of-two lengths
  * (the reference's windows are 100 → padded? No: NumPy handles any n via
  * Bluestein; we implement the O(n²) DFT for non-power-of-two lengths,
  * exact parity with `np.fft.fft` magnitudes to float tolerance — window
  * sizes here are ≤ a few hundred, so n² ≤ 1e5 flops per window).
  */
case class FftMagnitude(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "fft_magnitude"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(FftMagnitude.magnitudes(arr))
  }

  override protected def withNewChildInternal(newChild: Expression): FftMagnitude =
    copy(child = newChild)
}

object FftMagnitude {

  /** |FFT(x)| for real input x, any length. Radix-2 iterative when n is a
    * power of two; direct DFT otherwise.
    */
  def magnitudes(x: Array[Double]): Array[Double] = {
    val n = x.length
    if (n == 0) return Array.empty
    if ((n & (n - 1)) == 0) fftPow2Magnitudes(x)
    else dftMagnitudes(x)
  }

  private def dftMagnitudes(x: Array[Double]): Array[Double] = {
    val n = x.length
    val out = new Array[Double](n)
    val w = -2.0 * math.Pi / n
    var k = 0
    while (k < n) {
      var re = 0.0; var im = 0.0
      var t = 0
      while (t < n) {
        val a = w * k * t
        re += x(t) * math.cos(a)
        im += x(t) * math.sin(a)
        t += 1
      }
      out(k) = math.sqrt(re * re + im * im)
      k += 1
    }
    out
  }

  private def fftPow2Magnitudes(x: Array[Double]): Array[Double] = {
    val n = x.length
    val re = java.util.Arrays.copyOf(x, n)
    val im = new Array[Double](n)
    // bit reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var s = 0
      while (s < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(s + k); val ui = im(s + k)
          val vr = re(s + k + len / 2) * cr - im(s + k + len / 2) * ci
          val vi = re(s + k + len / 2) * ci + im(s + k + len / 2) * cr
          re(s + k) = ur + vr; im(s + k) = ui + vi
          re(s + k + len / 2) = ur - vr; im(s + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        s += len
      }
      len <<= 1
    }
    val out = new Array[Double](n)
    var k2 = 0
    while (k2 < n) { out(k2) = math.sqrt(re(k2) * re(k2) + im(k2) * im(k2)); k2 += 1 }
    out
  }
}

/** Column-level entry points for graft's custom expressions. */
object GraftFunctions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.graftbridge.{registerFunction, toColumn, toExpression}

  def fft_magnitude(c: Column): Column = toColumn(FftMagnitude(toExpression(c)))

  /** Codegen'd cosine similarity of two array<double> columns. */
  def cosine_sim(a: Column, b: Column): Column =
    toColumn(CosineSim(toExpression(a), toExpression(b)))

  /** Codegen'd `matrix · vec` against a plan-constant row-major matrix. */
  def matvec_product(v: Column, matrix: Array[Array[Double]]): Column =
    toColumn(MatVecProduct(toExpression(v), matrix))

  /** Codegen'd IVF probe selection: top-`nprobe` coarse-quantizer cells
    * of a raw array<double> vector, rank order (element 1 = membership
    * cell); null on null/zero-norm/dim-mismatch rows (see [[IvfProbes]]
    * for the arithmetic contract and why this must be ONE expression).
    */
  def ivf_probes(v: Column, centroids: Array[Array[Double]],
                 offsets: Array[Double], nprobe: Int): Column =
    toColumn(IvfProbes(toExpression(v), centroids, offsets, nprobe))

  /** [[ivf_probes]] with the quantizer behind a broadcast handle — the
    * production-join form: the centroid matrix ships once per executor
    * instead of with every stage's task binary (see
    * [[IvfProbesBroadcast]] for the measured sizes at autoNlist scale).
    */
  def ivf_probes_bc(v: Column,
                    bc: org.apache.spark.broadcast.Broadcast[IvfQuantizer],
                    nprobe: Int): Column =
    toColumn(IvfProbesBroadcast(toExpression(v), bc, nprobe))

  /** Codegen'd uint8 quantization of an array<double> to packed binary
    * codes against plan-constant per-dim (lo, hi) stats — the
    * compressed-vector leg of the IVF-PQ-lite join.
    */
  def quantize_uint8(v: Column, lo: Array[Double], hi: Array[Double]): Column =
    toColumn(QuantizeUint8(toExpression(v), lo, hi))

  /** Codegen'd cosine of the affine reconstructions of two
    * [[quantize_uint8]] code blobs (see [[QuantCosine]] for the exact
    * float order the DuckDB oracle mirrors).
    */
  def quant_cosine(a: Column, b: Column, lo: Array[Double], hi: Array[Double]): Column =
    toColumn(QuantCosine(toExpression(a), toExpression(b), lo, hi))

  /** Codegen'd binary-search membership of a bigint column in a
    * plan-constant SORTED long array (caller owns sortedness).
    */
  def sorted_long_contains(c: Column, sorted: Array[Long]): Column =
    toColumn(SortedLongContains(toExpression(c), sorted))

  /** Codegen'd splitmix64 finalizer over a bigint column — the
    * DuckDB-restatable 64-bit mix (see [[SplitMix64]]).
    */
  def splitmix64(c: Column): Column = toColumn(SplitMix64(toExpression(c)))

  /** Codegen'd winnowing fingerprint selection over a token array:
    * distinct `(pos, gram_hash)` structs, rightmost-tie window minima
    * (see [[WinnowSelect]] for the hash contract).
    */
  def winnow_select(tokens: Column, k: Int, w: Int): Column =
    toColumn(WinnowSelect(toExpression(tokens), k, w))

  /** Codegen'd BPE encode of a text column against a PLAN-CONSTANT
    * merge table (see [[BpeEncodeExpr]] for the fold contract and when
    * to prefer the distinct-word scalable encoder instead).
    */
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    toColumn(BpeEncodeExpr(toExpression(text), merges))

  /** Codegen'd regex match COUNT with a plan-constant pattern — no
    * match-array allocation (see [[RegexCountLit]]).
    */
  def regex_count(c: Column, regex: String): Column =
    toColumn(RegexCountLit(toExpression(c), regex))

  /** Codegen'd one-pass regex (count, replace-all) struct with
    * plan-constant pattern/replacement (see [[RegexCountReplaceLit]]).
    */
  def regex_count_replace(c: Column, regex: String, replacement: String): Column =
    toColumn(RegexCountReplaceLit(toExpression(c), regex, replacement))

  /** Codegen'd one-byte-scan (n_tokens, n_stop, n_punct) struct over a
    * string column (see [[SpaceTokenStats]]).
    */
  def space_token_stats(c: Column, stopwords: Seq[String]): Column =
    toColumn(SpaceTokenStats(toExpression(c), stopwords))

  /** Make graft's expressions callable from `spark.sql(...)`. */
  def registerAll(spark: SparkSession): Unit = {
    registerFunction(spark, "fft_magnitude", exprs => FftMagnitude(exprs.head))
    registerFunction(spark, "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)))
    registerFunction(spark, "splitmix64", exprs => SplitMix64(exprs.head))
  }
}

/** `SparkSessionExtensions` hook for cluster deployments
  * (`spark.sql.extensions=graft.functions.GraftExtensions`): injects the
  * same function set at session build time. In-process callers use
  * [[GraftFunctions.registerAll]] on a live session instead.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("fft_magnitude"),
      new ExpressionInfo(classOf[FftMagnitude].getName, "fft_magnitude"),
      (exprs: Seq[Expression]) => FftMagnitude(exprs.head)))
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("splitmix64"),
      new ExpressionInfo(classOf[SplitMix64].getName, "splitmix64"),
      (exprs: Seq[Expression]) => SplitMix64(exprs.head)))
  }
}
