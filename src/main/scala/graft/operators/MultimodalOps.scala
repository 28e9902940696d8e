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
