package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `poly_hash(str)` — the cross-engine polynomial rolling hash
 * (`acc = (acc * 31 + codepoint) mod 1e9+7`, left fold over code points)
 * as a native Catalyst expression with whole-stage codegen.
 *
 * Value-identical to the pure-SQL form in [[graft.analytics.Tables]]
 * (`aggregate(transform(split(s, ''), ...), ...)`) and to its DuckDB twin
 * (`list_reduce(list_transform(string_split(s, ''), ...), ...)`), but
 * without materializing a per-character array of strings per row, and
 * with a tight single-pass loop in both the interpreted path (used when
 * the call sits inside a higher-order-function lambda — HOFs are
 * CodegenFallback) and the generated-code path (top-level calls, e.g.
 * whole-document fingerprints).
 */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a STRING argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |String $str = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $acc = ($acc * 31L + $cp) % ${PolyHash.Mod}L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {

  final val Mod = 1000000007L

  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("poly_hash"),
    new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
    (children: Seq[Expression]) => PolyHash(children.head))

  /** Imperative registration for sessions built without
    * [[GraftExtensions]] (e.g. a driver-owned session). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      descriptor._1, descriptor._2, descriptor._3)
}

/** Session extension wiring (`spark.sql.extensions=graft.functions.GraftExtensions`):
  * injects the custom functions into every session built with it, plus the
  * [[graft.plans.PartitionFilterGuard]] plan check (no-op until its conf
  * names protected tables). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(PolyHash.descriptor)
    ext.injectFunction(DotI64.descriptor)
    ext.injectFunction(NgramHashes.descriptor)
    ext.injectFunction(GramStrHashes.descriptor)
    ext.injectFunction(CdcCuts.descriptor)
    ext.injectFunction(ZInterleave.descriptor)
    ext.injectFunction(MinHashSigs.descriptor)
    ext.injectFunction(BloomFunctions.aggDescriptor)
    ext.injectFunction(BloomFunctions.mightContainDescriptor)
    ext.injectFunction(CmsEstimate.descriptor)
    ext.injectOptimizerRule(s => new graft.plans.PartitionFilterGuard(s))
  }
}
