package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector kernels for the similarity operators, as Catalyst
  * expressions WITH `doGenCode`: the higher-order-function formulations
  * (`aggregate(zip_with(...))`) are semantically right but evaluate boxed
  * lambdas per element — measured ~100 ns per multiply-add on the
  * embeddings bench. These generate the tight primitive loop that a
  * hand-written inner kernel would be, stay inside whole-stage codegen,
  * and keep bitwise-identical results (same sequential fold order).
  */

/** Cosine similarity of two `array<double>` columns. Null when either
  * side is null, lengths differ, or any element is null — exactly the
  * propagation of the `zip_with` + `aggregate` form it replaces (zip_with
  * null-pads length mismatches, nulling the fold). A zero norm divides
  * to NaN/Inf like the HOF form, preserving ordering semantics.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      // freshName for EVERY local: raw `x`/`y` spliced into the shared
      // whole-stage method scope can collide with another expression's
      // locals — Janino then fails the stage and Spark silently falls back
      // to interpreted execution, losing the kernel's entire speedup.
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    final double $x = $a.getDouble($i);
        |    final double $y = $b.getDouble($i);
        |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |  }
        |  if (!${ev.isNull}) {
        |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        |  }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `matrix · vec` for a PLAN-CONSTANT row-major matrix (the LSH
  * hyperplane bank): one primitive nested loop per row emitting all
  * projections at once — the (planes × dim) multiply the HOF form paid
  * per-plane lambda overhead for. The matrix rides along as a codegen
  * reference object, not as 128 literal-array expressions. Output length
  * = matrix rows; null on null input, null elements, or a length
  * mismatch with the matrix columns.
  */
case class MatVecProduct(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "matvec_product"

  private val rows = matrix.length
  private val cols = if (rows == 0) 0 else matrix(0).length

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${other.sql}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != cols) return null
    val out = new Array[Double](rows)
    var p = 0
    while (p < rows) {
      val mRow = matrix(p)
      var s = 0.0
      var i = 0
      while (i < cols) {
        if (a.isNullAt(i)) return null
        s += a.getDouble(i) * mRow(i)
        i += 1
      }
      out(p) = s
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("matvecMatrix", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val mRow = ctx.freshName("mRow")
      s"""
        |if ($a.numElements() != $cols) {
        |  ${ev.isNull} = true;
        |} else {
        |  final double[] $out = new double[$rows];
        |  for (int $p = 0; $p < $rows && !${ev.isNull}; $p++) {
        |    final double[] $mRow = $matRef[$p];
        |    double $s = 0.0;
        |    for (int $i = 0; $i < $cols; $i++) {
        |      if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
        |      $s += $a.getDouble($i) * $mRow[$i];
        |    }
        |    $out[$p] = $s;
        |  }
        |  if (!${ev.isNull}) {
        |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |  }
        |}
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecProduct =
    copy(child = newChild)
}

/** Membership probe of a `bigint` column against a PLAN-CONSTANT sorted
  * long array (the stored-gram-table literal of the streaming scrub):
  * one binary search per probe — O(log m) against the O(m) linear scan
  * an `array_contains(lit(hashes), …)` pays — with the array riding
  * along as a single codegen reference object instead of an m-element
  * literal expression. Null on null input, like `array_contains`' null
  * child. The caller owns sortedness (`java.util.Arrays.binarySearch`
  * contract); [[graft.streaming.StreamingOps.scrubAtIngest]] sorts at
  * collect time.
  */
case class SortedLongContains(child: Expression, sorted: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "sorted_long_contains"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires bigint, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    java.util.Arrays.binarySearch(sorted, input.asInstanceOf[Long]) >= 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrRef = ctx.addReferenceObj("sortedLongSet", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = java.util.Arrays.binarySearch($arrRef, $v) >= 0;")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedLongContains =
    copy(child = newChild)
}
