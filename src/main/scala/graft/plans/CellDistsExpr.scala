package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer squared-L2 distances of a quantized vector to EVERY trained
  * centroid in ONE native loop: `graft_cell_dists(v, cents)` returns
  * `array<bigint>` of length K where element k is
  * Σ_i (v_i − c_{k,i})² — bit-for-bit the per-centroid `intL2` column
  * ([[graft.operators.VectorOps]]) for all K cells at once (integer
  * arithmetic — summation order is immaterial to the value, and the SQL
  * oracles replay the same integers).
  *
  * WHY AN EXPRESSION: the per-centroid formulation is K
  * `aggregate(zip_with(...))` higher-order calls per row — interpreted
  * lambda evaluation, outside whole-stage codegen (the same failure
  * measured at ~140 μs/row on the LSH bucket pass,
  * [[LshBuckets]]'s scaladoc). Every trained-quantizer consumer pays it
  * per corpus row per Lloyd scan: k-means assignment, IVF probe lists,
  * PQ encoding and ADC tables. Here the flattened centroid matrix folds
  * to a primitive long[] once and the whole distance computation is a
  * single K × dims primitive loop.
  *
  * `cents` must be a FOLDABLE array<bigint> laid out k-major (centroid
  * k's components at [k·dims, (k+1)·dims)) whose length is an exact
  * multiple of the foldable positive int `dims`. NULL on a null vector
  * or whenever v.length ≠ dims — the EXPLICIT dims makes any drifted
  * vector surface as a visible null (a divisibility-only guard would
  * silently accept a shorter vector that happens to divide the matrix
  * and emit garbage distances for a wrong K). */
case class CellDists(left: Expression, right: Expression, dims: Int)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case _ if dims < 1 =>
        TypeCheckResult.TypeCheckFailure(s"dims must be >= 1: $dims")
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        if (!right.foldable) TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a foldable (literal) centroid matrix")
        else right.eval() match {
          // A null literal matrix must fail analysis cleanly, not NPE.
          case null => TypeCheckResult.TypeCheckFailure(
            s"$prettyName centroid matrix must not be null")
          case m: ArrayData if m.numElements() % dims != 0 =>
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName centroid matrix length must be a multiple of dims=$dims")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<bigint> inputs, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_cell_dists"

  @transient private lazy val centsArr: Array[Long] =
    right.eval().asInstanceOf[ArrayData].toLongArray()

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val c = centsArr
    if (v.numElements() != dims) return null
    val k = c.length / dims
    val res = new Array[Long](k)
    var off = 0
    var j = 0
    while (j < k) {
      var s = 0L
      var i = 0
      while (i < dims) {
        val d = v.getLong(i) - c(off + i)
        s += d * d
        i += 1
      }
      off += dims
      res(j) = s
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cellCents", centsArr, "long[]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val k = ctx.freshName("k")
      val res = ctx.freshName("res")
      val off = ctx.freshName("off")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |if ($v.numElements() != ${dims}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $k = $cRef.length / ${dims};
         |  long[] $res = new long[$k];
         |  int $off = 0;
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $s = 0L;
         |    for (int $i = 0; $i < ${dims}; $i++) {
         |      long $d = $v.getLong($i) - $cRef[$off + $i];
         |      $s += $d * $d;
         |    }
         |    $off += ${dims};
         |    $res[$j] = $s;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($res);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CellDists =
    copy(left = newLeft, right = newRight)
}

object CellDists {
  /** Registry builder: `dims` accepts any FOLDABLE int expression,
    * folded at resolution time. */
  private[plans] def fromChildren(children: Seq[Expression]): CellDists =
    children match {
      case Seq(v, c, d) if d.foldable &&
          d.dataType == org.apache.spark.sql.types.IntegerType =>
        CellDists(v, c, d.eval().asInstanceOf[Int])
      case _ => throw new IllegalArgumentException(
        "graft_cell_dists(vector, centroids, dims) needs a foldable int dims")
    }
}
