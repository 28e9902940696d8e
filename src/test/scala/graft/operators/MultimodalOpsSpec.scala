package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class MultimodalOpsSpec extends AnyFunSuite {

  test("byteProfile: hand-computed byte-value histogram; empty payload -> zeros") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 'A'=0x41 -> bin 2, 'b'=0x62 -> bin 3, ' '=0x20 -> bin 1,
    // '9'=0x39 -> bin 1, '~'=0x7e -> bin 3.
    val got = Seq("Ab 9~", "").toDF("text")
      .select(MultimodalOps.byteProfile(
        MultimodalOps.asBlob(col("text"))).as("p"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(got(0) == Seq(0L, 2L, 1L, 2L, 0L, 0L, 0L, 0L))
    assert(got(1) == Seq.fill(8)(0L))
    // Multi-byte UTF-8 counts BYTES, not characters: 'é' = 0xC3 0xA9 ->
    // bins 6 and 5.
    val multi = Seq("é").toDF("text")
      .select(MultimodalOps.byteProfile(
        MultimodalOps.asBlob(col("text"))).as("p"))
      .head().getSeq[Long](0).toSeq
    assert(multi == Seq(0L, 0L, 0L, 0L, 0L, 1L, 1L, 0L))
  }

  test("bmpBlob: exact bytes of a 1x1 24bpp BMP (hand-computed header)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = Seq("AB").toDF("text")
      .select(hex(MultimodalOps.bmpBlob(lit(1), lit(1),
        MultimodalOps.asBlob(col("text")))).as("hx"))
      .head().getString(0)
    // 54-byte header: magic, fileSize=58, reserved, offset=54, infoSize=40,
    // w=1, h=1, planes=1, bpp=24, BI_RGB, imgSize=4 (row padded to 4),
    // 2835 ppm x2, colors 0/0; pixels: "AB" bytes then zero padding.
    val expected = "424D" + "3A000000" + "00000000" + "36000000" +
      "28000000" + "01000000" + "01000000" + "0100" + "1800" +
      "00000000" + "04000000" + "130B0000" + "130B0000" +
      "00000000" + "00000000" + "41420000"
    assert(got == expected)
  }

  test("decodeBmp: parses real headers, rejects non-BMP, handles top-down") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Round trip through the builder at asymmetric dimensions.
    val rt = Seq("some pixel payload").toDF("text")
      .select(MultimodalOps.decodeBmp(MultimodalOps.bmpBlob(lit(17), lit(9),
        MultimodalOps.asBlob(col("text")))).as("m"))
      .select(col("m.width"), col("m.height"), col("m.channels"))
      .head()
    assert((rt.getInt(0), rt.getInt(1), rt.getInt(2)) == ((17, 9, 3)))
    // Top-down BMP stores height as NEGATIVE i32; a hand-built header with
    // height = -9 (F7FFFFFF) must decode to magnitude 9. Also parses a
    // 32bpp field ("2000" -> 4 channels).
    val topDownHex = "424D" + "3A000000" + "00000000" + "36000000" +
      "28000000" + "11000000" + "F7FFFFFF" + "0100" + "2000" +
      "00000000" + "04000000" + "130B0000" + "130B0000" +
      "00000000" + "00000000" + "00000000"
    val td = Seq(topDownHex).toDF("hx")
      .select(MultimodalOps.decodeBmp(unhex(col("hx"))).as("m"))
      .select(col("m.width"), col("m.height"), col("m.channels"))
      .head()
    assert((td.getInt(0), td.getInt(1), td.getInt(2)) == ((17, 9, 4)))
    // Rejection: wrong magic, truncated file, and wrong info-header marker
    // all decode to NULL.
    val bads = Seq(
      "504E470D0A1A0A" + "00" * 60,          // PNG magic, right length
      "424D3A000000",                         // BM but truncated
      ("424D" + "3A000000" + "00000000" + "36000000" +
        "0C000000" + "00" * 40))              // BITMAPCOREHEADER (size 12)
    val nulls = bads.toDF("hx")
      .select(MultimodalOps.decodeBmp(unhex(col("hx"))).as("m"))
      .collect().map(_.isNullAt(0))
    assert(nulls.forall(identity))
  }

  test("wavBlob/decodeWav: round trip, derived duration, rejection") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 11 payload bytes at 2ch x 16bit (blockAlign 4) -> 2 whole frames;
    // duration = floor(2 * 1000 / 16000) = 0 ms. A longer payload at 8kHz
    // mono 8-bit gives a nonzero duration: 9000 bytes -> 9000 frames ->
    // 1125 ms.
    val rt = Seq("elevenbytes").toDF("text")
      .select(MultimodalOps.decodeWav(MultimodalOps.wavBlob(
        lit(16000), lit(2), lit(16), MultimodalOps.asBlob(col("text")))).as("m"))
      .select(col("m.sample_rate"), col("m.channels"), col("m.bits"),
        col("m.n_frames"), col("m.duration_ms"))
      .head()
    assert((rt.getInt(0), rt.getInt(1), rt.getInt(2), rt.getLong(3), rt.getLong(4))
      == ((16000, 2, 16, 2L, 0L)))
    val long = Seq("x" * 9000).toDF("text")
      .select(MultimodalOps.decodeWav(MultimodalOps.wavBlob(
        lit(8000), lit(1), lit(8), MultimodalOps.asBlob(col("text")))).as("m"))
      .select(col("m.n_frames"), col("m.duration_ms")).head()
    assert((long.getLong(0), long.getLong(1)) == ((9000L, 1125L)))
    // Exact header bytes of an empty-payload 8kHz mono 8-bit file.
    val hx = Seq("").toDF("text")
      .select(hex(MultimodalOps.wavBlob(lit(8000), lit(1), lit(8),
        MultimodalOps.asBlob(col("text")))).as("h")).head().getString(0)
    val expected = "52494646" + "24000000" + "57415645" + "666D7420" +
      "10000000" + "0100" + "0100" + "401F0000" + "401F0000" + "0100" +
      "0800" + "64617461" + "00000000"
    assert(hx == expected)
    // Rejection: BMP bytes, truncated RIFF, non-PCM format, and a ZERO
    // sample rate (would make duration a null-producing division) -> NULL.
    val nonPcm = "52494646" + "24000000" + "57415645" + "666D7420" +
      "10000000" + "0300" + "0100" + "401F0000" + "401F0000" + "0100" +
      "0800" + "64617461" + "00000000"
    val zeroRate = "52494646" + "24000000" + "57415645" + "666D7420" +
      "10000000" + "0100" + "0100" + "00000000" + "00000000" + "0100" +
      "0800" + "64617461" + "00000000"
    val bads = Seq("424D" + "00" * 50, "524946460800000057415645", nonPcm, zeroRate)
    val nulls = bads.toDF("hx")
      .select(MultimodalOps.decodeWav(unhex(col("hx"))).as("m"))
      .collect().map(_.isNullAt(0))
    assert(nulls.forall(identity))
  }

  test("resizeFit: aspect-preserving integer fit into 224x224") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = Seq((448, 112)).toDF("w", "h")
      .select(MultimodalOps.resizeFit(
        struct(col("w").as("width"), col("h").as("height"),
          lit(3).as("channels")), 224, 224).as("r"))
      .select(col("r.width"), col("r.height")).head()
    assert((r.getInt(0), r.getInt(1)) == ((224, 56)))
  }
}
