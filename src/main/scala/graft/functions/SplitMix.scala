package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** The splitmix64 finalizer (Steele/Lea/Flood, "Fast Splittable
  * Pseudorandom Number Generators", OOPSLA 2014; the `java.util.SplittableRandom`
  * mix) as a codegen'd Catalyst expression over a bigint column.
  *
  * Purpose: a 64-bit mix DuckDB can RESTATE exactly — unlike `xxhash64`,
  * whose seeding has no SQL restatement, the three multiply/xor-shift
  * steps translate to HUGEINT mod-2^64 arithmetic (the proven
  * `x_ann_lsh` hyperplane-oracle pattern). Oracle twins of engine-hash
  * lanes (`x_simhash_splitmix`) swap `xxhash64(token)` for
  * `splitmix64(restatable_key(token))` so the surrounding kernel —
  * votes, banding, joins — runs under the driver's DuckDB hash gate with
  * real 64-bit avalanche behavior.
  */
case class SplitMix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "splitmix64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    SplitMix64.mix(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SplitMix64.mix($c)")

  override protected def withNewChildInternal(newChild: Expression): SplitMix64 =
    copy(child = newChild)
}

object SplitMix64 {
  /** The canonical mix: z += 0x9E3779B97F4A7C15 (golden-gamma advance),
    * then two multiply/xor-shift rounds and a final xor-shift. Static so
    * both the interpreted `eval` and the generated code call the same
    * JVM method.
    */
  def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
