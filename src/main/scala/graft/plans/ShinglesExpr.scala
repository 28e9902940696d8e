package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All word-`n`-gram shingles of a token array in ONE native loop:
  * `graft_shingles(tokens, n)` returns `array<string>` with element i =
  * tokens[i..i+n−1] joined by a single space — bit-for-bit the
  * `transform(sequence(…), i -> concat_ws(" ", slice(tokens, i, n)))`
  * column this replaces (null elements are skipped by the join, exactly
  * concat_ws' contract), with the per-POSITION interpreted lambda
  * (slice allocation + concat_ws dispatch, ~3 µs/shingle measured —
  * ~85 % of the shingle pass every dedup/fingerprint operator starts
  * with) collapsed into one method. Fewer than `n` tokens yields an
  * EMPTY array; a null token array yields NULL (callers keep their
  * `when(size ≥ n)` guards for exact legacy parity — both forms agree
  * through them). */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _ if n < 1 || n > 1000 =>
        TypeCheckResult.TypeCheckFailure(s"n must be in 1..1000: $n")
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> tokens, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(a: Any): Any =
    Shingles.shinglesOf(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w => {
      val cls = Shingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$cls.shinglesOf($w, ${n});"
    })

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  private val Sep = UTF8String.fromString(" ")

  /** The shared interpreted/codegen kernel (called from generated code:
    * keep the signature stable). */
  def shinglesOf(w: ArrayData, n: Int): ArrayData = {
    val m = w.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val res = new Array[Any](m)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var k = 0
      while (k < n) {
        parts(k) =
          if (w.isNullAt(i + k)) null else w.getUTF8String(i + k)
        k += 1
      }
      res(i) = UTF8String.concatWs(Sep, parts: _*)
      i += 1
    }
    new GenericArrayData(res)
  }

  private[plans] def fromChildren(children: Seq[Expression]): Shingles =
    children match {
      case Seq(w, n) if n.foldable &&
          n.dataType == org.apache.spark.sql.types.IntegerType =>
        Shingles(w, n.eval().asInstanceOf[Int])
      case _ => throw new IllegalArgumentException(
        "graft_shingles(tokens, n) needs a foldable int n")
    }
}
