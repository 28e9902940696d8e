package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** All grid×grid nearest-neighbor sample-cell brightness sums of an
  * uncompressed 24bpp bottom-up BMP in ONE native byte loop:
  * `graft_bmp_cells(blob, grid)` returns `array<long>` where element
  * k = j·grid + i is the 3-channel byte sum at sampled pixel
  * (x = ⌊(w−1)·i/(grid−1)⌋, y = ⌊(h−1)·j/(grid−1)⌋) through the 4-byte-
  * aligned row stride and the bottom-up row flip — bit-for-bit the
  * per-cell `byteAtN` column lattice this replaces (same header gate,
  * same zero-fill for bytes addressed past a truncated pixel array or
  * outside guard-addressable positions, same floor division — exact vs
  * the column form's double floor for every w, h < 2²², far inside
  * double's integer range). NULL on a null blob, any header-gate failure
  * (magic "BM", BITMAPINFOHEADER size 40, 24bpp, w and h < 2²²), or a
  * claimed pixel array past guard-addressable bytes (o + rs·h ≥ 2³⁰ —
  * [[graft.operators.MultimodalOps]]'s `bmpOk`).
  *
  * WHY AN EXPRESSION: the column lattice evaluates a substr→hex→conv
  * tree per sampled BYTE inside HOF lambdas that run interpreted (the
  * [[WavEnergies]] rationale) — bounded at 3·grid² reads per row, but
  * ~7 µs per interpreted read puts ~0.3 ms/row on every mm_phash /
  * mm_pixels consumer; this loop reads the raw bytes.
  */
case class BmpCells(child: Expression, grid: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _ if grid < 2 || grid > 16 =>
        TypeCheckResult.TypeCheckFailure(s"grid must be in 2..16: $grid")
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary blob, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_bmp_cells"

  override def nullSafeEval(a: Any): Any = {
    val b = a.asInstanceOf[Array[Byte]]
    val cells = BmpCells.cellsOf(b, grid)
    if (cells == null) null
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(cells)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val cells = ctx.freshName("cells")
      val cls = BmpCells.getClass.getName.stripSuffix("$") + "$.MODULE$"
      // The kernel is one shared method (not inlined loops): the header
      // parse + lattice is branch-heavy scalar code with no per-row
      // expression inputs beyond the bytes, so a plain JVM call keeps
      // the surrounding whole-stage method small and JIT-hot.
      s"""
         |long[] $cells = $cls.cellsOf($b, ${grid});
         |if ($cells == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($cells);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BmpCells =
    copy(child = newChild)
}

object BmpCells {
  /** The shared interpreted/codegen kernel (called from generated code:
    * keep the signature stable). Returns null when the header gate
    * fails; otherwise the grid² 3-channel cell sums with zero fill for
    * any byte outside [0, min(len, 2³⁰)). */
  def cellsOf(b: Array[Byte], grid: Int): Array[Long] = {
    if (b.length < 54) return null
    def leU(off: Int, n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    val w = leU(18, 4)
    val h = leU(22, 4)
    if (leU(0, 2) != 0x4D42L || leU(14, 4) != 40L || leU(28, 2) != 24L ||
      w >= (1L << 22) || h >= (1L << 22)) return null
    val o = leU(10, 4)
    val rs = (w * 3 + 3) / 4 * 4
    if (o + rs * h >= (1L << 30)) return null
    val res = new Array[Long](grid * grid)
    var k = 0
    while (k < grid * grid) {
      val i = k % grid
      val j = k / grid
      val x = Math.floorDiv((w - 1) * i, (grid - 1).toLong)
      val y = Math.floorDiv((h - 1) * j, (grid - 1).toLong)
      val base = o + rs * (h - 1 - y) + x * 3
      var cell = 0L
      var c = 0
      while (c < 3) {
        val p = base + c
        if (p >= 0 && p < b.length && p < (1L << 30))
          cell += (b(p.toInt) & 0xff).toLong
        c += 1
      }
      res(k) = cell
      k += 1
    }
    res
  }

  private[plans] def fromChildren(children: Seq[Expression]): BmpCells =
    children match {
      case Seq(b, g) if g.foldable &&
          g.dataType == org.apache.spark.sql.types.IntegerType =>
        BmpCells(b, g.eval().asInstanceOf[Int])
      case _ => throw new IllegalArgumentException(
        "graft_bmp_cells(blob, grid) needs a foldable int grid")
    }
}
