package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All hyperplane-LSH bucket ids of a vector in ONE native loop:
  * `graft_lsh_buckets(v, planes, bits)` returns `array<int>` of length
  * `tables` where element t is Σ_b (dot(v, plane(t,b)) ≥ 0) · 2^b —
  * bit-for-bit [[graft.operators.VectorOps.bucketCol]] for every table
  * at once (same sequential per-plane summation order, so results and
  * the DuckDB oracle replays are unchanged).
  *
  * WHY AN EXPRESSION: the per-bit formulation is tables × bits
  * `graft_dot` calls against per-bit literal arrays — at the LSH design
  * points (48+ dots of 64 dims) that expression tree blows past the
  * whole-stage-codegen method limits and the corpus-side bucket pass
  * runs INTERPRETED, measured ~140 μs/row (140 s/1M rows, the entire
  * cost of the 1M LSH envelope). Here the plane matrix is one flat
  * literal folded to a primitive double[] once (codegen: a reference
  * object; interpreted: a lazy val), and the whole bucket computation is
  * a single tables × bits × dims primitive loop — ~3k mult-adds/row at
  * the same design point, back inside codegen.
  *
  * `planes` must be a FOLDABLE array<double> laid out t-major
  * ([[graft.operators.VectorOps.planeValue]]'s (t·bits + b)·dims + i
  * indexing) whose length is an exact multiple of bits × dims; `bits`
  * and `dims` foldable positive ints. NULL on a null vector or whenever
  * v.length ≠ dims — the EXPLICIT dims makes any drifted vector surface
  * as a visible null (a divisibility-only guard would silently accept a
  * shorter vector that happens to divide the plane matrix and emit
  * plausible-but-wrong buckets for a wrong table count).
  */
case class LshBuckets(left: Expression, right: Expression, bits: Int,
                      dims: Int)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case _ if bits < 1 || bits > 30 =>
        TypeCheckResult.TypeCheckFailure(s"bits must be in 1..30: $bits")
      case _ if dims < 1 =>
        TypeCheckResult.TypeCheckFailure(s"dims must be >= 1: $dims")
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        if (!right.foldable) TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a foldable (literal) plane matrix")
        else right.eval() match {
          // A null literal matrix must fail analysis cleanly, not NPE.
          case null => TypeCheckResult.TypeCheckFailure(
            s"$prettyName plane matrix must not be null")
          case m: ArrayData if m.numElements() % (bits * dims) != 0 =>
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName plane matrix length must be a multiple of " +
                s"bits × dims = ${bits * dims}")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<double> inputs, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_lsh_buckets"

  @transient private lazy val planesArr: Array[Double] =
    right.eval().asInstanceOf[ArrayData].toDoubleArray()

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val p = planesArr
    if (v.numElements() != dims) return null
    val tables = p.length / (bits * dims)
    val res = new Array[Int](tables)
    var off = 0
    var t = 0
    while (t < tables) {
      var bkt = 0
      var b = 0
      while (b < bits) {
        var s = 0.0
        var i = 0
        while (i < dims) { s += v.getDouble(i) * p(off + i); i += 1 }
        off += dims
        if (s >= 0) bkt |= (1 << b)
        b += 1
      }
      res(t) = bkt
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The folded plane matrix rides the generated class as a primitive
    // double[] reference — no per-row ArrayData access on the constant.
    val pRef = ctx.addReferenceObj("lshPlanes", planesArr, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val tables = ctx.freshName("tables")
      val res = ctx.freshName("res")
      val off = ctx.freshName("off")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bkt = ctx.freshName("bkt")
      s"""
         |if ($v.numElements() != ${dims}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $tables = $pRef.length / (${bits} * ${dims});
         |  int[] $res = new int[$tables];
         |  int $off = 0;
         |  for (int $t = 0; $t < $tables; $t++) {
         |    int $bkt = 0;
         |    for (int $b = 0; $b < ${bits}; $b++) {
         |      double $s = 0.0;
         |      for (int $i = 0; $i < ${dims}; $i++) {
         |        $s += $v.getDouble($i) * $pRef[$off + $i];
         |      }
         |      $off += ${dims};
         |      if ($s >= 0) $bkt |= (1 << $b);
         |    }
         |    $res[$t] = $bkt;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($res);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshBuckets =
    copy(left = newLeft, right = newRight)
}

object LshBuckets {
  /** Registry builder: `bits`/`dims` accept any FOLDABLE int expression
    * (a bare literal, a cast, constant arithmetic — the documented
    * contract), folded here at resolution time. */
  private[plans] def fromChildren(children: Seq[Expression]): LshBuckets = {
    def foldInt(e: Expression, what: String): Int = e.dataType match {
      case org.apache.spark.sql.types.IntegerType if e.foldable =>
        e.eval().asInstanceOf[Int]
      case _ => throw new IllegalArgumentException(
        s"graft_lsh_buckets needs a foldable int $what, got $e")
    }
    children match {
      case Seq(v, p, b, d) =>
        LshBuckets(v, p, foldInt(b, "bits"), foldInt(d, "dims"))
      case _ => throw new IllegalArgumentException(
        "graft_lsh_buckets(vector, planes, bits, dims)")
    }
  }
}
