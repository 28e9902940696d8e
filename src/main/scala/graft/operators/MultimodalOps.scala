package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video payloads modeled as opaque
  * `binary` columns with typed metadata, per the large-scale curation
  * pattern (decode late, move bytes rarely).
  *
  * The DECODE STEP IS A STUB — this environment has no image/audio codecs —
  * implemented as deterministic arithmetic over the bytes so the whole
  * pipeline stays testable and oracle-checkable. A production deployment
  * swaps [[decodeStub]] for a real decoder over the very same binary column
  * (an Arrow-batched `mapInPartitions`/Pandas-UDF stage with this exact
  * output schema `struct<width:int, height:int, channels:int>`); every
  * other operator here — the blob plumbing, frame slicing, metadata
  * resize — is real and unchanged by that swap.
  */
object MultimodalOps {

  /** Opaque media bytes. The test corpus has no binary table, so documents'
    * UTF-8 bytes stand in as the payload column. */
  def asBlob(text: Column): Column = encode(text, "UTF-8")

  /** STUB image decode: fake-but-deterministic metadata derived from the
    * payload (byte length + md5 characters), schema-identical to a real
    * decoder's output. */
  def decodeStub(bin: Column): Column = {
    val h = md5(bin)
    struct(
      (lit(16) + pmod(length(bin), lit(512))).cast("int").as("width"),
      (lit(16) + pmod(ascii(substring(h, 1, 1)) * 7 + ascii(substring(h, 2, 1)),
        lit(512))).cast("int").as("height"),
      lit(3).as("channels"))
  }

  /** Aspect-preserving fit of decoded metadata into a boxW×boxH bounding
    * box, integer milli-scale arithmetic (no floats → exact oracles). */
  def resizeStub(meta: Column, boxW: Int, boxH: Int): Column = {
    // floor() before every narrowing cast: Spark truncates double→long but
    // DuckDB rounds, so the oracle-safe form is an explicit floor.
    val w = meta("width").cast("long")
    val hh = meta("height").cast("long")
    val scale = least(floor(lit(boxW * 1000L) / w), floor(lit(boxH * 1000L) / hh))
    struct(
      greatest(lit(1L), floor(w * scale / 1000L)).cast("int").as("width"),
      greatest(lit(1L), floor(hh * scale / 1000L)).cast("int").as("height"),
      meta("channels").as("channels"))
  }

  /** FEATURE EXTRACTION (real, not a stub — no codec needed): the 8-bin
    * byte-value histogram of the payload, the standard modality-agnostic
    * cheap feature for corrupt-payload / wrong-modality detection (text
    * concentrates in bins 1–3, compressed media is near-uniform). Bin =
    * byte >> 5, i.e. the HIGH hex nibble halved — so the histogram reads
    * off `hex(bin)`'s odd positions without any per-byte decode. Pure
    * column expressions, zero shuffle. Returns array<long> of 8 counts. */
  def byteProfile(bin: Column): Column = {
    val hx = hex(bin)
    // High nibble of byte i sits at 1-based hex position 2i−1.
    val highs = transform(sequence(lit(1), length(bin)),
      i => hx.substr(i * 2 - 1, lit(1)))
    val digits = "0123456789ABCDEF"
    array((0 until 8).map { b =>
      val (d1, d2) = (digits(2 * b).toString, digits(2 * b + 1).toString)
      size(filter(highs, c => c === d1 || c === d2)).cast("long")
    }: _*)
  }

  /** Frame sampling: cut the payload into frames of `frameLen` bytes every
    * `stride` bytes (video/audio windowing shape). Returns array<binary>;
    * payloads shorter than one frame yield an empty array. */
  def frameSample(bin: Column, frameLen: Int, stride: Int): Column = {
    val n = floor((length(bin) - frameLen) / stride).cast("int") + 1
    when(length(bin) >= frameLen,
      transform(sequence(lit(0), n - 1),
        i => bin.substr(i * stride + 1, lit(frameLen))))
      .otherwise(array().cast("array<binary>"))
  }
}
