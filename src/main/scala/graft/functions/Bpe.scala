package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encode (text → subword array) as ONE native Catalyst expression —
  * the [[WinnowSelect]] precedent applied to the tokenizer lifecycle.
  * The original expression-CHAIN form nested one interpreted
  * `aggregate` lambda per merge in the plan, evaluated per corpus
  * TOKEN: measured 33 s warm at sf0.1 for a 12-merge table once the
  * bench drained real output (the `Dataset.count()` plan-collapse fix
  * had been hiding it). This kernel runs the same greedy fold as
  * primitive JVM loops in one static call per row inside whole-stage
  * codegen — the merge table stays PLAN-CONSTANT (embedded in the
  * expression, no broadcast, no shuffle, no state), which is the
  * property that distinguishes this shape from
  * [[graft.ext.TextAnalysis.bpeEncodeScalable]]'s distinct-word
  * join-back (still the right tool for 32 k-merge production tables,
  * where a plan-constant table would bloat every task binary).
  *
  * Semantics (bitwise-pinned against both the HOF chain and the
  * scalable encoder in EvalFunctionsSpec):
  *  - words = `split(text, " +")` dropping empties (space runs only —
  *    the corpus tokenizer contract, not general whitespace);
  *  - each word splits to CODE POINTS (astral-plane chars stay whole);
  *  - each merge (l, r) applies in RANK order as one greedy
  *    left-to-right pass: `last == l && next == r` → replace last with
  *    `l + r` (a just-formed merge participates as `last` immediately,
  *    the learner's replay rule);
  *  - per-word subword arrays concatenate in word order;
  *  - null text → null (the HOF chain's propagation).
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.sql}")
    }

  // (l, r) pairs flattened to [l0, r0, l1, r1, …]: a plain String[] both
  // nullSafeEval and the generated code can share via one reference slot
  @transient private lazy val packed: Array[String] =
    merges.iterator.flatMap { case (l, r) => Iterator(l, r) }.toArray

  override def nullSafeEval(input: Any): Any =
    BpeKernel.encode(input.asInstanceOf[UTF8String], packed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", packed, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, t => {
      s"""
        |${ev.value} = graft.functions.BpeKernel.encode($t, $ref);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

/** Static BPE-encode kernel (see [[BpeEncodeExpr]]); a plain object so
  * generated code calls it through the Scala static forwarder.
  */
object BpeKernel {

  /** Encode one text; `packed` = flattened (l, r) merge pairs. Never
    * returns null (null input is handled by the expression's null
    * check).
    */
  def encode(text: UTF8String, packed: Array[String]): ArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    val n = s.length
    while (i < n) {
      // next space-run-delimited word [i, j)
      while (i < n && s.charAt(i) == ' ') i += 1
      var j = i
      while (j < n && s.charAt(j) != ' ') j += 1
      if (j > i) {
        encodeWord(s, i, j, packed, out)
        i = j
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** One word's greedy rank-order fold, appending UTF8String subwords. */
  private def encodeWord(s: String, from: Int, until: Int,
                         packed: Array[String],
                         out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    // code-point symbols
    var syms = new Array[String](until - from)
    var m = 0
    var ci = from
    while (ci < until) {
      val step = Character.charCount(s.codePointAt(ci))
      syms(m) = s.substring(ci, ci + step)
      m += 1
      ci += step
    }
    // each merge: one greedy left-to-right pass, in place (write index w)
    var mi = 0
    while (mi < packed.length) {
      val l = packed(mi)
      val r = packed(mi + 1)
      if (m >= 2) {
        var w = 0
        var i = 0
        while (i < m) {
          val cur = syms(i)
          if (w > 0 && syms(w - 1) == l && cur == r) syms(w - 1) = l + r
          else { syms(w) = cur; w += 1 }
          i += 1
        }
        m = w
      }
      mi += 2
    }
    var k = 0
    while (k < m) { out += UTF8String.fromString(syms(k)); k += 1 }
  }
}
