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

  test("bmpPixelGridSum: hand-computed lattice through stride, padding, and bottom-up rows") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 2×2 image, rowSize = ceil(6/4)·4 = 8 (2 pad bytes per row), payload
    // = bytes 1..16 (imgSize = 16). Bottom-up: file row 0 is IMAGE row
    // y=1. grid=2 lattice = the 4 corners; pixel (x, y) starts at file
    // byte 8·(1−y) + 3x:
    //   (0,0)→off 8  : 9,10,11   (0,1)→off 0 : 1,2,3
    //   (1,0)→off 11 : 12,13,14  (1,1)→off 3 : 4,5,6
    // sum = 30+6+39+15 = 90. A stride of 6 (no padding) or top-down rows
    // would give a different sum — that is the point of the fixture.
    val payload = (1 to 16).map(_.toChar).mkString
    val got = Seq(payload).toDF("text")
      .select(MultimodalOps.bmpPixelGridSum(
        MultimodalOps.bmpBlob(lit(2), lit(2),
          MultimodalOps.asBlob(col("text"))), 2).as("p"))
      .select(col("p.pix_sum"), col("p.n_bytes")).head()
    assert((got.getLong(0), got.getLong(1)) == ((90L, 12L)))
    // Truncated payload: bytes past the text zero-fill (bmpBlob contract).
    val short = Seq("").toDF("text")
      .select(MultimodalOps.bmpPixelGridSum(
        MultimodalOps.bmpBlob(lit(2), lit(2),
          MultimodalOps.asBlob(col("text"))), 2).as("p"))
      .select(col("p.pix_sum")).head().getLong(0)
    assert(short == 0L, "an empty payload zero-fills the whole pixel array")
    // Non-BMP rejects to null.
    val bad = Seq("xx").toDF("text")
      .select(MultimodalOps.bmpPixelGridSum(
        MultimodalOps.asBlob(col("text")), 2).as("p"))
      .head().isNullAt(0)
    assert(bad)
  }

  test("bmpAHash: hand-computed bits over the 2×2 corner lattice; identical payloads collide") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Same fixture as the pixel test: corner brightnesses 30, 39, 6, 15
    // (k = 0..3), total 90; bit k set iff b·4 > 90 → k0 (30) and k1 (39)
    // → hash = 1 + 2 = 3.
    val payload = (1 to 16).map(_.toChar).mkString
    val got = Seq(payload).toDF("text")
      .select(MultimodalOps.bmpAHash(
        MultimodalOps.bmpBlob(lit(2), lit(2),
          MultimodalOps.asBlob(col("text"))), 2).as("p"))
      .select(col("p.ahash"), col("p.lum_sum")).head()
    assert((got.getLong(0), got.getLong(1)) == ((3L, 90L)))
    // Identical payloads hash identically; a brightness change flips bits.
    val hashes = Seq(payload, payload, (16 to 1 by -1).map(_.toChar).mkString)
      .toDF("text")
      .select(MultimodalOps.bmpAHash(
        MultimodalOps.bmpBlob(lit(2), lit(2),
          MultimodalOps.asBlob(col("text"))), 2).as("p"))
      .select(col("p.ahash")).collect().map(_.getLong(0))
    assert(hashes(0) == hashes(1))
    assert(hashes(0) != hashes(2), "reversed bytes must flip threshold bits")
    // Non-BMP rejects to null.
    val bad = Seq("xx").toDF("text")
      .select(MultimodalOps.bmpAHash(
        MultimodalOps.asBlob(col("text")), 2).as("p"))
      .head().isNullAt(0)
    assert(bad)
  }

  test("wavFingerprint8: hand-computed segment bits; short clips yield null fp") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 8 samples "AAAA    ", segs = 4 → bounds [0,2) [2,4) [4,6) [6,8):
    // 'A' = 65 → 3969, ' ' = 32 → 9216; energies 7938, 7938, 18432, 18432,
    // total 52740; bit s iff e·4 > 52740 → bits 2 and 3 → fp = 12.
    val got = Seq("AAAA    ").toDF("text")
      .select(MultimodalOps.wavFingerprint8(
        MultimodalOps.wavBlob(lit(8000), lit(1), lit(8),
          MultimodalOps.asBlob(col("text"))), 4).as("p"))
      .select(col("p.fp"), col("p.energy_sum")).head()
    assert((got.getLong(0), got.getLong(1)) == ((12L, 52740L)))
    // Fewer samples than segments → null fingerprint (struct present).
    val short = Seq("AB").toDF("text")
      .select(MultimodalOps.wavFingerprint8(
        MultimodalOps.wavBlob(lit(8000), lit(1), lit(8),
          MultimodalOps.asBlob(col("text"))), 4).as("p"))
      .select(col("p.fp")).head()
    assert(short.isNullAt(0))
    // Identical payloads collide; a loud tail flips bits.
    val fps = Seq("AAAA    ", "AAAA    ", "    AAAA").toDF("text")
      .select(MultimodalOps.wavFingerprint8(
        MultimodalOps.wavBlob(lit(8000), lit(1), lit(8),
          MultimodalOps.asBlob(col("text"))), 4).as("p"))
      .select(col("p.fp")).collect().map(_.getLong(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
    // Non-WAV rejects to a null struct.
    val bad = Seq("xx").toDF("text")
      .select(MultimodalOps.wavFingerprint8(
        MultimodalOps.asBlob(col("text")), 4).as("p"))
      .head().isNullAt(0)
    assert(bad)
  }

  test("wavWindowEnergy8: window fold, tail drop, and format rejection") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 7 samples, win=3 → 2 full windows (tail sample dropped).
    // Samples: 'A'=65 → (65-128)² = 3969; window energy = 3·3969.
    val payload = "A" * 7
    val got = Seq(payload).toDF("text")
      .select(MultimodalOps.wavWindowEnergy8(
        MultimodalOps.wavBlob(lit(8000), lit(1), lit(8),
          MultimodalOps.asBlob(col("text"))), 3).as("e"))
      .select(col("e.n_windows"), col("e.sum_energy"), col("e.max_energy"))
      .head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      ((2L, 2L * 3L * 3969L, 3L * 3969L)))
    // Mixed amplitudes: max picks the hot window deterministically.
    // Window 1 = "~~~" (126 → 4), window 2 = "   " (32 → 9216).
    val mixed = Seq("~~~   ").toDF("text")
      .select(MultimodalOps.wavWindowEnergy8(
        MultimodalOps.wavBlob(lit(8000), lit(1), lit(8),
          MultimodalOps.asBlob(col("text"))), 3).as("e"))
      .select(col("e.n_windows"), col("e.sum_energy"), col("e.max_energy"))
      .head()
    assert((mixed.getLong(0), mixed.getLong(1), mixed.getLong(2)) ==
      ((2L, 3L * 4L + 3L * 9216L, 3L * 9216L)))
    // Stereo and 16-bit inputs reject (the operator is 8-bit mono only).
    val rejects = Seq(
      MultimodalOps.wavBlob(lit(8000), lit(2), lit(8),
        MultimodalOps.asBlob(lit("AAAA"))),
      MultimodalOps.wavBlob(lit(8000), lit(1), lit(16),
        MultimodalOps.asBlob(lit("AAAA"))))
      .map(b => Seq(1).toDF("x")
        .select(MultimodalOps.wavWindowEnergy8(b, 3).as("e"))
        .head().isNullAt(0))
    assert(rejects.forall(identity))
    // Empty payload: zero windows, zero energies.
    val empty = Seq("").toDF("text")
      .select(MultimodalOps.wavWindowEnergy8(
        MultimodalOps.wavBlob(lit(8000), lit(1), lit(8),
          MultimodalOps.asBlob(col("text"))), 3).as("e"))
      .select(col("e.n_windows"), col("e.sum_energy"), col("e.max_energy"))
      .head()
    assert((empty.getLong(0), empty.getLong(1), empty.getLong(2)) ==
      ((0L, 0L, 0L)))
  }

  test("adversarial headers: magic-valid lies about size neither stall nor error") {
    val spark = TestSpark.spark
    import spark.implicits._
    // A WAV whose header passes every wavOk8 magic/format check but CLAIMS
    // 2^30−1 samples over 6 actual data bytes. bindOnce evaluates eagerly,
    // so an unclamped bound count would materialize a ~21M-window lattice
    // (a multi-minute stall / multi-GB allocation) before any `when(ok,…)`
    // gate fires. The clamp bounds the lattice by the bytes that exist:
    // 6 'A' samples, win=3 → 2 windows of 3·(65−128)² = 11907.
    val lyingWav = "52494646" + "24000000" + "57415645" + "666D7420" +
      "10000000" + "0100" + "0100" + "401F0000" + "401F0000" + "0100" +
      "0800" + "64617461" + "FFFFFF3F" + "41" * 6
    val e = Seq(lyingWav).toDF("hx")
      .select(MultimodalOps.wavWindowEnergy8(unhex(col("hx")), 3).as("e"))
      .select(col("e.n_windows"), col("e.sum_energy"), col("e.max_energy"))
      .head()
    assert((e.getLong(0), e.getLong(1), e.getLong(2)) ==
      ((2L, 2L * 3L * 3969L, 3L * 3969L)))
    // Same blob through the fingerprint: segs=2 over 6 equal samples →
    // neither segment strictly exceeds the mean → fp = 0 (not an error,
    // not a stall).
    val fp = Seq(lyingWav).toDF("hx")
      .select(MultimodalOps.wavFingerprint8(unhex(col("hx")), 2).as("p"))
      .select(col("p.fp")).head().getLong(0)
    assert(fp == 0L)
    // A BMP whose header passes the magic/infoSize/bpp checks but claims
    // w = 2^32−1, h = 2^31−1: rowSize·h ≈ 2.8e19 overflows long, which
    // under ANSI mode is a JOB-FAILING error if the lattice arithmetic
    // ever evaluates. The bounded header rejects it to NULL before any
    // arithmetic runs.
    val lyingBmp = "424D" + "3A000000" + "00000000" + "36000000" +
      "28000000" + "FFFFFFFF" + "FFFFFF7F" + "0100" + "1800" +
      "00000000" + "04000000" + "130B0000" + "130B0000" +
      "00000000" + "00000000" + "00000000"
    val bmpNulls = Seq(lyingBmp).toDF("hx")
      .select(
        MultimodalOps.bmpPixelGridSum(unhex(col("hx")), 2).as("p"),
        MultimodalOps.bmpAHash(unhex(col("hx")), 2).as("a"))
      .head()
    assert(bmpNulls.isNullAt(0) && bmpNulls.isNullAt(1))
  }

  test("decodeBmpPartitions: partition-map decode is bit-identical to the expression path") {
    val spark = TestSpark.spark
    import spark.implicits._
    // The production swap shape, driven end-to-end over a mixed corpus:
    // valid BMPs at varied dimensions (built from real header bytes), a
    // top-down 32bpp header, every rejection case the expression path
    // pins, WAV bytes (wrong modality), and raw text. Parity must be
    // exact, including WHERE the nulls fall.
    val topDownHex = "424D" + "3A000000" + "00000000" + "36000000" +
      "28000000" + "11000000" + "F7FFFFFF" + "0100" + "2000" +
      "00000000" + "04000000" + "130B0000" + "130B0000" +
      "00000000" + "00000000" + "00000000"
    val fixtures = Seq(
      (1L, MultimodalOps.bmpBlob(lit(1), lit(1), MultimodalOps.asBlob(lit("AB")))),
      (2L, MultimodalOps.bmpBlob(lit(17), lit(9), MultimodalOps.asBlob(lit("payload")))),
      (3L, MultimodalOps.bmpBlob(lit(24), lit(24), MultimodalOps.asBlob(lit("x" * 100)))),
      (4L, unhex(lit(topDownHex))),
      (5L, unhex(lit("504E470D0A1A0A" + "00" * 60))),    // PNG magic
      (6L, unhex(lit("424D3A000000"))),                  // truncated BM
      (7L, unhex(lit("424D" + "3A000000" + "00000000" + "36000000" +
        "0C000000" + "00" * 40))),                       // BITMAPCOREHEADER
      (8L, MultimodalOps.wavBlob(lit(8000), lit(1), lit(8),
        MultimodalOps.asBlob(lit("AAAA")))),             // wrong modality
      (9L, MultimodalOps.asBlob(lit("just text"))))
    val blobs = fixtures.map(_._1).toDF("id")
      .select(col("id"),
        element_at(array(fixtures.map(_._2): _*), col("id").cast("int")).as("blob"))
      .cache()
    val exprPath = blobs.select(col("id"), MultimodalOps.decodeBmp(col("blob")).as("meta"))
    val partPath = MultimodalOps.decodeBmpPartitions(blobs, "id", "blob")
    // Field names and types must match exactly; the partition path's
    // fields are additionally non-nullable (case-class Ints) where the
    // expression path's are nullable — strictly stronger, invisible to
    // any consumer.
    import org.apache.spark.sql.types.StructType
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema("meta").dataType.asInstanceOf[StructType]
        .fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(partPath) == shape(exprPath),
      "the swap must preserve the metadata schema")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getStruct(1).toSeq)).toMap
    assert(rows(partPath) == rows(exprPath))
    // And the downstream stage composes unchanged across the swap:
    // resizeFit over the partition-map output equals it over the
    // expression output.
    def resized(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("meta").isNotNull)
        .select(col("id"), MultimodalOps.resizeFit(col("meta"), 224, 224).as("r"))
        .collect().map(r => r.getLong(0) -> r.getStruct(1).toSeq).toMap
    assert(resized(partPath) == resized(exprPath))
    blobs.unpersist()
  }
}
