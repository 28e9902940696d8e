package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd Morton (Z-order) interleave of the low 16 bits of two
  * non-negative long columns: bit i of `left` lands at bit 2i, bit i of
  * `right` at bit 2i+1 — the multi-dimensional clustering key.
  *
  * Why an Expression and not SQL bit-twiddling: the z-value is a WRITE-PATH
  * sort key at 100 TB (cluster files so that parquet row-group min/max
  * stats prune multi-dimensional range predicates); it sits under a global
  * sort of the whole corpus, so it must stay inside whole-stage codegen —
  * this compiles to four shift-mask rounds per side (binary magic numbers),
  * no loop, no boxing. Values are masked to 16 bits (callers bucket or
  * quantize first — same contract as the reference's grid partitioner
  * masks, `FlinkSkyline.java:118-131` cell addressing).
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two bigint inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  private def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      def rounds(v: String): String =
        s"""$v = ($v | ($v << 8)) & 0x00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""
         |long $sx = $x & 0xFFFFL;
         |long $sy = $y & 0xFFFFL;
         |${rounds(sx)}
         |${rounds(sy)}
         |${ev.value} = $sx | ($sy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}
