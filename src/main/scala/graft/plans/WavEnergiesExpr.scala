package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** All `segs` per-segment energies of a spec-valid 8-bit mono WAV blob in
  * ONE native byte loop: `graft_wav_energies(blob, segs)` returns
  * `array<long>` where element s is Σ (byte[44+k] − 128)² over the
  * segment's floor-division sample range [⌊s·n/segs⌋, ⌊(s+1)·n/segs⌋),
  * n = min(claimed data length, actual payload bytes) — bit-for-bit the
  * per-segment `aggregate(sequence(lo, hi), …)` column this replaces
  * (same header gate, same clamp, same integer arithmetic; the
  * floor-division bounds agree with the column form's double-floor for
  * every n < 2³⁰ because the quotient is ≥ 1/segs away from the next
  * integer — far beyond double rounding). NULL on a null blob or any
  * header-gate failure (RIFF/WAVE/fmt/data magics, PCM mono 8-bit,
  * claimed length < 2³⁰ — [[graft.operators.MultimodalOps]]'s `wavOk8`).
  *
  * WHY AN EXPRESSION: the column formulation is a `transform` over
  * segments whose lambda runs an `aggregate(sequence(lo, hi), …)` per
  * segment — nested higher-order functions whose per-SAMPLE lambda tree
  * (binary substr → hex → conv per byte) runs interpreted, the same
  * out-of-codegen failure measured on the LSH bucket pass
  * ([[LshBuckets]]'s scaladoc; here ~1 ms/row at fixture blob sizes,
  * the entire cost of the mm_audiohash gates). This loop reads the raw
  * bytes directly.
  */
case class WavEnergies(child: Expression, segs: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _ if segs < 2 || segs > 32 =>
        TypeCheckResult.TypeCheckFailure(s"segs must be in 2..32: $segs")
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary blob, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_wav_energies"

  override def nullSafeEval(a: Any): Any = {
    val b = a.asInstanceOf[Array[Byte]]
    val n = WavEnergies.nSamples(b)
    if (n < 0) return null
    val res = new Array[Long](segs)
    var s = 0
    while (s < segs) {
      val lo = s.toLong * n / segs
      val hi = (s + 1).toLong * n / segs - 1
      var k = lo
      var e = 0L
      while (k <= hi) {
        val v = (b(44 + k.toInt) & 0xff) - 128L
        e += v * v
        k += 1
      }
      res(s) = e
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val n = ctx.freshName("n")
      val res = ctx.freshName("res")
      val s = ctx.freshName("s")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val k = ctx.freshName("k")
      val e = ctx.freshName("e")
      val v = ctx.freshName("v")
      val cls = WavEnergies.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |long $n = $cls.nSamples($b);
         |if ($n < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $res = new long[${segs}];
         |  for (int $s = 0; $s < ${segs}; $s++) {
         |    long $lo = ((long) $s) * $n / ${segs};
         |    long $hi = ((long) ($s + 1)) * $n / ${segs} - 1;
         |    long $e = 0L;
         |    for (long $k = $lo; $k <= $hi; $k++) {
         |      long $v = ($b[44 + (int) $k] & 0xff) - 128L;
         |      $e += $v * $v;
         |    }
         |    $res[$s] = $e;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($res);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WavEnergies =
    copy(child = newChild)
}

/** FIXED-WIDTH windowed PCM energies — [[WavEnergies]]' sibling for
  * [[graft.operators.MultimodalOps.wavWindowEnergy8]]'s layout:
  * `graft_wav_win_energies(blob, win)` returns one Σ(byte−128)² per FULL
  * window of `win` samples (⌊n/win⌋ elements — possibly empty; partial
  * tails drop), NULL on a null blob or any header-gate failure. Same
  * header kernel, same replacement rationale (the column form ran one
  * interpreted lambda per SAMPLE). */
case class WavWinEnergies(child: Expression, win: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _ if win < 1 || win > 65536 =>
        TypeCheckResult.TypeCheckFailure(s"win must be in 1..65536: $win")
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary blob, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_wav_win_energies"

  override def nullSafeEval(a: Any): Any = {
    val b = a.asInstanceOf[Array[Byte]]
    val n = WavEnergies.nSamples(b)
    if (n < 0) return null
    val nWin = (n / win).toInt
    val res = new Array[Long](nWin)
    var wi = 0
    while (wi < nWin) {
      var k = 0
      var e = 0L
      while (k < win) {
        val v = (b(44 + wi * win + k) & 0xff) - 128L
        e += v * v
        k += 1
      }
      res(wi) = e
      wi += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val n = ctx.freshName("n")
      val nWin = ctx.freshName("nWin")
      val res = ctx.freshName("res")
      val wi = ctx.freshName("wi")
      val k = ctx.freshName("k")
      val e = ctx.freshName("e")
      val v = ctx.freshName("v")
      val cls = WavEnergies.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |long $n = $cls.nSamples($b);
         |if ($n < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $nWin = (int) ($n / ${win});
         |  long[] $res = new long[$nWin];
         |  for (int $wi = 0; $wi < $nWin; $wi++) {
         |    long $e = 0L;
         |    for (int $k = 0; $k < ${win}; $k++) {
         |      long $v = ($b[44 + $wi * ${win} + $k] & 0xff) - 128L;
         |      $e += $v * $v;
         |    }
         |    $res[$wi] = $e;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($res);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WavWinEnergies =
    copy(child = newChild)
}

object WavWinEnergies {
  private[plans] def fromChildren(children: Seq[Expression]): WavWinEnergies =
    children match {
      case Seq(b, w) if w.foldable &&
          w.dataType == org.apache.spark.sql.types.IntegerType =>
        WavWinEnergies(b, w.eval().asInstanceOf[Int])
      case _ => throw new IllegalArgumentException(
        "graft_wav_win_energies(blob, win) needs a foldable int win")
    }
}

object WavEnergies {
  private val RiffMagic = 0x46464952L
  private val WaveMagic = 0x45564157L
  private val FmtMagic  = 0x20746D66L
  private val DataMagic = 0x61746164L

  /** Clamped sample count of a spec-valid blob, or −1 when any header
    * gate fails — the shared kernel of the interpreted and generated
    * paths (called from generated code: keep signature stable). */
  def nSamples(b: Array[Byte]): Long = {
    if (b.length < 44) return -1L
    def leU(off: Int, n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v |= (b(off + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    val ok = leU(0, 4) == RiffMagic && leU(8, 4) == WaveMagic &&
      leU(12, 4) == FmtMagic && leU(36, 4) == DataMagic &&
      leU(20, 2) == 1L && leU(22, 2) == 1L && leU(34, 2) == 8L &&
      leU(40, 4) < (1L << 30)
    if (!ok) -1L else math.min(leU(40, 4), (b.length - 44).toLong)
  }

  private[plans] def fromChildren(children: Seq[Expression]): WavEnergies =
    children match {
      case Seq(b, s) if s.foldable &&
          s.dataType == org.apache.spark.sql.types.IntegerType =>
        WavEnergies(b, s.eval().asInstanceOf[Int])
      case _ => throw new IllegalArgumentException(
        "graft_wav_energies(blob, segs) needs a foldable int segs")
    }
}
