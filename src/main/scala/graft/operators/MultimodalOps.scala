package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video payloads modeled as opaque
  * `binary` columns with typed metadata, per the large-scale curation
  * pattern (decode late, move bytes rarely).
  *
  * The decode step is REAL for the one format whose decode is pure
  * arithmetic: uncompressed BMP ([[decodeBmp]] parses the actual
  * little-endian BITMAPINFOHEADER bytes; [[bmpBlob]] builds spec-valid
  * 24bpp files so the parser is exercised against genuine payloads, and the
  * oracle states ground-truth dimensions independently — a parse bug
  * hash-mismatches). Compressed formats (JPEG/PNG/MP3/H.264) need codec
  * libraries this environment does not ship; a production deployment adds
  * them as an Arrow-batched `mapInPartitions` stage with the same
  * `struct<width:int, height:int, channels:int>` output schema — every
  * other operator here (blob plumbing, metadata resize, frame slicing,
  * byte profiling) is format-agnostic and unchanged by that swap.
  */
object MultimodalOps {

  /** Opaque media bytes. The test corpus has no binary table, so documents'
    * UTF-8 bytes stand in as the payload column. */
  def asBlob(text: Column): Column = encode(text, "UTF-8")

  // ---------------------------------------------------------------------
  // Byte access for the pixel/sample readers below. Two rules keep every
  // reader LINEAR in the payload (the round-10 perceptual hashes violated
  // both and went quadratic — 80% of an entire 152-query bench):
  //
  //   1. Any subtree referenced from inside a HOF lambda is re-evaluated
  //      PER ELEMENT by interpreted lambda evaluation, and lambda-bearing
  //      subtrees are excluded from subexpression elimination
  //      (SPARK-35410) — so a multiply-referenced array/aggregate must
  //      flow through [[bindOnce]], never be repeated inline.
  //   2. `substr` on a STRING costs O(position) per read (UTF8String walks
  //      bytes to find char offsets), so per-sample reads over `hex(bin)`
  //      are quadratic in the payload. `substr` on the BINARY itself is
  //      direct byte addressing — O(1) per single-byte read — so readers
  //      bind the blob once and slice bytes out of it directly (no hex
  //      pass, no materialized array at all).
  //
  // The production swap for large compressed media remains the
  // `mapPartitions` byte decoder named in the header.
  // ---------------------------------------------------------------------

  /** Expression-level let binding: evaluate `bound` ONCE per row and hand
    * it to `body` as a lambda variable (an O(1) slot read at every
    * reference). `element_at(transform(array(x), f), 1)` is the identity
    * wrapper that creates the binding scope. */
  private def bindOnce(bound: Column, body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)

  /** Payload byte count of the bound blob — O(1) (`length` of a binary
    * column is its byte count). */
  private def byteLen(b: Column): Column = length(b).cast("long")

  /** Byte value at 0-based offset `off` of the bound blob — NULL past the
    * end or outside [0, 2^30) (callers apply their format's fill rule).
    * The range guard matters because corrupt headers evaluate eagerly
    * under [[bindOnce]]: an unguarded wrapped position would read from
    * the blob END (substr's negative-position convention) instead of
    * returning the out-of-bounds NULL. O(1): a one-byte binary slice,
    * hexed (2 chars) and parsed. */
  private def byteAtN(b: Column, off: Column): Column = {
    val safe = when(off >= 0 && off < (1L << 30), off)
    conv(hex(b.substr((safe + 1).cast("int"), lit(1))), 16, 10).cast("long")
  }

  /** Little-endian unsigned integer of `n` bytes at fixed offset `off`
    * (NULL if any byte is out of bounds). */
  private def leUN(nb: Column, off: Int, n: Int): Column =
    (0 until n).map(i =>
      byteAtN(nb, lit(off + i)) * lit(1L << (8 * i)))
      .reduce(_ + _)

  private val BmpMagic  = 0x4D42L       // "BM"   as LE u16
  private val RiffMagic = 0x46464952L   // "RIFF" as LE u32
  private val WaveMagic = 0x45564157L   // "WAVE" as LE u32
  private val FmtMagic  = 0x20746D66L   // "fmt " as LE u32
  private val DataMagic = 0x61746164L   // "data" as LE u32

  /** BMP header fields parsed ONCE per row — callers bind the struct
    * before any lattice lambda references it (a field read on the bound
    * struct is O(1); re-deriving one is a ~30-node little-endian parse
    * PER LATTICE ELEMENT, which was half the remaining per-row cost).
    *
    * NULL (no struct at all) unless the blob passes the basic 24bpp
    * checks AND claims w, h < 2^22. The dimension bound lives HERE, not
    * in [[bmpOk]], because [[bindOnce]] evaluates eagerly: lattice
    * arithmetic like `rs·(h−1−y)` runs for EVERY ≥ 26-byte blob before
    * any `when(ok, …)` gates the result, and with unbounded header
    * fields (w up to 2^32 → rs up to ~3·2^32, h up to 2^32) the product
    * overflows long — an ANSI-mode error that fails the whole job on one
    * corrupt-but-magic-valid payload. With w, h < 2^22 every downstream
    * product is ≤ 2^46 + 2^32, comfortably inside long, and a NULL
    * struct propagates NULL positions into [[byteAtN]]'s range guard
    * (→ NULL byte → the callers' zero-fill) with no arithmetic error. */
  private def bmpHeader(b: Column): Column = {
    val w = leUN(b, 18, 4)
    val h = leUN(b, 22, 4)
    when(byteLen(b) >= 54 && leUN(b, 0, 2) === BmpMagic &&
        leUN(b, 14, 4) === 40 && leUN(b, 28, 2) === 24 &&
        w < (1L << 22) && h < (1L << 22),
      struct(w.as("w"), h.as("h"), leUN(b, 10, 4).as("o"),
        (floor((w * 3 + lit(3)) / 4).cast("long") * 4).as("rs")))
  }

  /** 24bpp-BMP validity over a bound (already basic-checked, possibly
    * NULL) header: the claimed pixel array must sit inside guard-
    * addressable byte positions (< 2^30) — an absurd-but-well-formed
    * header REJECTS as undecodable instead of reading aliased positions.
    * No overflow risk: [[bmpHeader]] bounds w, h < 2^22, so
    * o + rs·h < 2^32 + 2^46. A NULL header yields NULL (→ false under
    * `when`). */
  private def bmpOk(hd: Column): Column =
    hd.getField("o") + hd.getField("rs") * hd.getField("h") < (1L << 30)

  /** 8-bit mono PCM WAV validity over a bound blob: RIFF/WAVE/fmt/data
    * magics, PCM mono 8-bit format fields, and a claimed sample count
    * inside guard-addressable positions (< 2^30 — an oversize header
    * REJECTS instead of silently nulling samples past the int range,
    * the round-10 advice item). */
  private def wavOk8(b: Column): Column =
    byteLen(b) >= 44 &&
      leUN(b, 0, 4) === RiffMagic && leUN(b, 8, 4) === WaveMagic &&
      leUN(b, 12, 4) === FmtMagic && leUN(b, 36, 4) === DataMagic &&
      leUN(b, 20, 2) === 1 && leUN(b, 22, 2) === 1 && leUN(b, 34, 2) === 8 &&
      leUN(b, 40, 4) < (1L << 30)

  /** Little-endian hex of the low `nBytes` bytes of a non-negative
    * integral column — the BMP header's field encoding. */
  private def leHex(v: Column, nBytes: Int): Column =
    concat((0 until nBytes).map(i =>
      lpad(hex(pmod(shiftright(v.cast("long"), 8 * i), lit(256))), 2, "0")): _*)

  /** A spec-valid uncompressed 24bpp BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, bottom-up row order): `width`×`height` pixels, pixel
    * data from `payload` bytes truncated/zero-padded to the 4-byte-aligned
    * image size. Pure column arithmetic — the fixture generator that lets
    * [[decodeBmp]] be gated against real files without a codec library.
    * Dimensions must be >= 1; payload rows are NOT aligned to pixel
    * boundaries (the fill is an opaque byte stream, which is all a header
    * parser cares about). */
  def bmpBlob(width: Column, height: Column, payload: Column): Column = {
    val w = width.cast("long")
    val h = height.cast("long")
    val rowSize = floor((w * 3 + lit(3)) / 4).cast("long") * 4
    val imgSize = rowSize * h
    val hdr = concat(
      lit("424D"),                 // magic "BM"
      leHex(imgSize + 54, 4),      // file size
      lit("00000000"),             // reserved
      lit("36000000"),             // pixel data offset = 54
      lit("28000000"),             // BITMAPINFOHEADER size = 40
      leHex(w, 4), leHex(h, 4),    // width, height (i32 LE)
      lit("0100"),                 // planes = 1
      lit("1800"),                 // bpp = 24
      lit("00000000"),             // compression = BI_RGB
      leHex(imgSize, 4),           // image size
      lit("130B0000"),             // x ppm = 2835 (72 dpi)
      lit("130B0000"),             // y ppm
      lit("00000000"),             // palette colors = 0
      lit("00000000"))             // important colors = 0
    val pixLen = (imgSize * 2).cast("int")
    val truncated = hex(payload).substr(lit(1), pixLen)
    val pixHex = concat(truncated,
      call_function("repeat", lit("0"), pixLen - length(truncated)))
    unhex(concat(hdr, pixHex))
  }

  /** REAL image decode for uncompressed BMP: validates the "BM" magic and
    * the BITMAPINFOHEADER marker, then parses width / height / channels out
    * of the little-endian header bytes (plain arithmetic over `hex(bin)` —
    * no codec). Returns `struct<width:int, height:int, channels:int>`, or
    * NULL for anything that is not a BMP (the corrupt-payload /
    * wrong-modality guard a curation filter keys on). A negative stored
    * height (top-down row order) decodes to its magnitude — row order is a
    * layout detail, not a dimension.
    *
    * ACCEPTANCE DIVERGENCE vs the featurizer paths (deliberate): this
    * header parse has no downstream position arithmetic, so it imposes NO
    * dimension bound — an extreme-aspect BMP (say h=1, w ≈ 2^28) decodes
    * to its metadata here while [[bmpPixelGridSum]]/[[bmpAHash]] return
    * NULL for the same blob ([[bmpHeader]] bounds w, h < 2^22 to keep the
    * eagerly-evaluated lattice products inside long — see its scaladoc).
    * Metadata-only consumers keep the wider acceptance; pixel consumers
    * treat past-bound dimensions as undecodable. */
  def decodeBmp(bin: Column): Column = {
    val hx = hex(bin)
    def byteAt(off: Int) = hx.substr(lit(off * 2 + 1), lit(2)) // off 0-based
    def leU(off: Int, n: Int): Column =
      conv(concat((0 until n).reverse.map(i => byteAt(off + i)): _*), 16, 10)
        .cast("long")
    def leI32(off: Int): Column = {
      val u = leU(off, 4)
      when(u > 2147483647L, u - 4294967296L).otherwise(u)
    }
    val ok = length(bin) >= 54 && hx.substr(1, 4) === "424D" &&
      leU(14, 4) === 40
    when(ok, struct(
      leI32(18).cast("int").as("width"),
      abs(leI32(22)).cast("int").as("height"),
      (leU(28, 2) / 8).cast("int").as("channels")))
  }

  /** A spec-valid PCM WAV file (RIFF + fmt + data chunks): `payload` bytes
    * as the sample data, header fields from the given format. The audio
    * twin of [[bmpBlob]] — the fixture generator for [[decodeWav]]. */
  def wavBlob(sampleRate: Column, channels: Column, bitsPerSample: Column,
              payload: Column): Column = {
    val ch = channels.cast("long")
    val sr = sampleRate.cast("long")
    val bits = bitsPerSample.cast("long")
    val blockAlign = ch * (bits / 8)
    val dataSize = length(payload).cast("long")
    val hdr = concat(
      lit("52494646"),             // "RIFF"
      leHex(dataSize + 36, 4),     // chunk size = file size - 8
      lit("57415645"),             // "WAVE"
      lit("666D7420"),             // "fmt "
      lit("10000000"),             // fmt chunk size = 16
      lit("0100"),                 // audio format = 1 (PCM)
      leHex(ch, 2),
      leHex(sr, 4),
      leHex(sr * blockAlign, 4),   // byte rate
      leHex(blockAlign, 2),
      leHex(bits, 2),
      lit("64617461"),             // "data"
      leHex(dataSize, 4))
    unhex(concat(hdr, hex(payload)))
  }

  /** REAL audio decode for PCM WAV: validates the RIFF/WAVE magic and the
    * leading fmt chunk, then parses the format fields out of the
    * little-endian header — `struct<sample_rate:int, channels:int,
    * bits:int, n_frames:long, duration_ms:long>` (duration in integer
    * milliseconds: n_frames · 1000 / rate, floor — oracle-exact), or NULL
    * for anything that is not such a WAV. Like [[decodeBmp]], pure column
    * arithmetic over `hex(bin)` — no codec library. Assumes the data chunk
    * directly follows fmt (the layout [[wavBlob]] writes and the common
    * canonical file shape; extension chunks would need a scan loop, which
    * a `mapInPartitions` decoder handles in production). */
  def decodeWav(bin: Column): Column = {
    val hx = hex(bin)
    def byteAt(off: Int) = hx.substr(lit(off * 2 + 1), lit(2)) // off 0-based
    def leU(off: Int, n: Int): Column =
      conv(concat((0 until n).reverse.map(i => byteAt(off + i)): _*), 16, 10)
        .cast("long")
    val ok = length(bin) >= 44 &&
      hx.substr(1, 8) === "52494646" &&           // "RIFF"
      hx.substr(17, 16) === "57415645666D7420" && // "WAVE" + "fmt "
      hx.substr(73, 8) === "64617461" &&          // "data"
      leU(20, 2) === 1 &&                         // PCM
      leU(32, 2) > 0 &&                           // sane block align
      leU(24, 4) > 0                              // sane sample rate (a zero
                                                  // rate must REJECT, not
                                                  // decode with null duration)
    val ch = leU(22, 2)
    val sr = leU(24, 4)
    val bits = leU(34, 2)
    val blockAlign = leU(32, 2)
    val dataSize = leU(40, 4)
    val frames = floor(dataSize / blockAlign).cast("long")
    when(ok, struct(
      sr.cast("int").as("sample_rate"),
      ch.cast("int").as("channels"),
      bits.cast("int").as("bits"),
      frames.as("n_frames"),
      floor(frames * 1000 / sr).cast("long").as("duration_ms")))
  }

  /** PIXEL-LEVEL access into an uncompressed 24bpp bottom-up BMP: the sum
    * of all channel bytes over a `grid`×`grid` nearest-neighbor sample
    * lattice (xᵢ = ⌊i·(w−1)/(grid−1)⌋, same for y) — the downsample-
    * and-featurize step after [[decodeBmp]]'s header parse, and the gate
    * that proves the ROW ADDRESSING is right: every sampled byte goes
    * through the 4-byte-aligned row stride, the bottom-up row flip, and
    * the 3-byte pixel offset, so a stride or orientation bug changes the
    * sum. Returns `struct<pix_sum:long, n_bytes:long>`, NULL for
    * non-BMPs; bytes addressed beyond a truncated pixel array count 0
    * (the [[bmpBlob]] zero-fill contract). Pure unrolled column
    * arithmetic — 3·grid² byte reads per row, no codec, no UDF. */
  def bmpPixelGridSum(bin: Column, grid: Int): Column = {
    require(grid >= 2 && grid <= 16, s"grid out of range: $grid")
    graft.plans.GraftFunctions.registerCurrent()
    // The whole lattice comes from ONE native byte loop
    // ([[graft.plans.BmpCells]] — bit-for-bit the former per-byte
    // `byteAtN` column fold, whose interpreted lambda tree cost
    // ~0.3 ms/row; null exactly where the header gate / bmpOk rejected):
    // pix_sum is the sum of the grid² cell sums, a grid²-element fold.
    bindOnce(call_function(
        graft.plans.GraftFunctions.BmpCellsName, bin, lit(grid)), cs =>
      when(cs.isNotNull, struct(
        aggregate(cs, lit(0L), _ + _).as("pix_sum"),
        lit(3L * grid * grid).as("n_bytes"))))
  }

  /** aHash-style PERCEPTUAL image hash over a `grid`×`grid` nearest-
    * neighbor downsample: each cell's brightness is the 3-channel byte sum
    * at its sampled pixel, a cell sets bit (j·grid + i) iff its brightness
    * exceeds the image mean (integer cross-multiplied: b·grid² > Σb), and
    * the hash is the bit sum — the classic average-hash near-dup signature
    * (images differing by noise/re-encode land on equal or near-equal
    * hashes; grouping by the hash IS the image-dedup blocking key, the
    * binary-modality twin of SimHash buckets on text).
    *
    * Same header/stride/zero-fill contract as [[bmpPixelGridSum]]. Cost
    * shape: LINEAR by construction — the blob, the cell array,
    * and the cell total are each bound once ([[bindOnce]]) before any
    * lambda references them, and the threshold bits unroll over
    * `element_at` reads of the bound cells (grid ≤ 7 keeps the unroll
    * small). The round-10 form repeated the cell/total subtrees inline
    * inside a zip_with lambda, which re-evaluated the whole lattice —
    * including a blob re-hex — once per output bit. Output struct:
    * (ahash, lum_sum) — null for non-BMP payloads. */
  def bmpAHash(bin: Column, grid: Int): Column = {
    require(grid >= 2 && grid <= 7, s"grid out of range: $grid")
    graft.plans.GraftFunctions.registerCurrent()
    // Cell sums from the native [[graft.plans.BmpCells]] loop (null
    // exactly where the header gate / bmpOk rejected — the former `ok`
    // condition); only the grid²-element threshold fold stays in column
    // land.
    bindOnce(call_function(
        graft.plans.GraftFunctions.BmpCellsName, bin, lit(grid)), cs =>
      bindOnce(aggregate(cs, lit(0L), _ + _), total => {
        val hash = (0 until grid * grid).map(k =>
          when(element_at(cs, k + 1) * lit(grid.toLong * grid) > total,
            lit(1L << k)).otherwise(lit(0L))).reduce(_ + _)
        when(cs.isNotNull, struct(hash.as("ahash"), total.as("lum_sum")))
      }))
  }

  /** WINDOWED PCM ENERGY over an 8-bit mono WAV ([[wavBlob]] layout): per
    * full window of `win` samples, Σ (sample − 128)² — the
    * silence/clipping localization signal an audio curation pass keys on
    * (8-bit PCM is unsigned, 128 = zero amplitude). Partial tail windows
    * are dropped, so the windowing itself is under test, not just the
    * total. Returns `struct<n_windows:long, sum_energy:long,
    * max_energy:long>` (max 0 when no full window), NULL for anything
    * that is not 8-bit mono PCM.
    *
    * Cost shape: the blob binds once and each sample is an O(1) binary
    * `substr` byte read off it (the string-substr form walked
    * O(position) bytes per read — quadratic in the clip). Headers whose
    * claimed sample count exceeds int-addressable positions (≥ 2^30)
    * REJECT as undecodable instead of aliasing through the int index
    * cast. A production decoder for compressed codecs runs the same
    * windowing over raw bytes in `mapInPartitions` — the documented swap
    * point. */
  def wavWindowEnergy8(bin: Column, win: Int): Column = {
    require(win >= 1 && win <= 65536, s"win out of range: $win")
    // The bound sample count is GATED AND CLAMPED, not the raw header
    // read: bindOnce evaluates eagerly, before any `when(ok, …)` can gate
    // the result, so a garbage ≥ 44-byte blob claiming ~2^30 samples
    // would otherwise drive sequence()/transform() into a multi-GB
    // allocation (or 'sequence too long' error) for a payload the reader
    // is about to REJECT anyway. Gating (NULL for non-WAVs → NULL nWin →
    // the empty-array branch) kills that; the byteLen−44 clamp
    // additionally bounds the lattice by the bytes that actually exist,
    // so even a magic-valid header over a truncated file costs O(actual
    // bytes). [[wavBlob]] writes dataSize = |payload| exactly, so the
    // clamp is an identity on every well-formed file.
    graft.plans.GraftFunctions.registerCurrent()
    bindOnce(bin, nb => bindOnce(
        when(wavOk8(nb), least(leUN(nb, 40, 4), byteLen(nb) - 44)), nSamp => {
      // nSamp bound once: 8-bit mono has 1 byte per sample, data at 44.
      val ok = nSamp.isNotNull
      val nWin = floor(nSamp / win).cast("long")
      // Per-window energies from ONE native byte loop
      // ([[graft.plans.WavWinEnergies]] — bit-for-bit the former
      // per-window aggregate columns, whose per-SAMPLE lambda tree ran
      // interpreted; the wavFingerprint8 fix). Null on a rejected blob —
      // gated by `ok` exactly as before.
      val energies = call_function(
        graft.plans.GraftFunctions.WavWinEnergiesName, nb, lit(win))
      bindOnce(energies, es =>
        when(ok, struct(
          nWin.as("n_windows"),
          coalesce(aggregate(es, lit(0L), _ + _), lit(0L)).as("sum_energy"),
          coalesce(array_max(es), lit(0L)).as("max_energy"))))
    }))
  }

  /** aHash-style PERCEPTUAL audio fingerprint over `segs` equal time
    * segments: segment s covers samples [s·n div segs, (s+1)·n div segs),
    * its energy is the Σ(v−128)² PCM sum, a segment sets bit s iff its
    * energy exceeds the per-segment mean (integer cross-multiplied:
    * e·segs > Σe), and the hash is the bit sum — the audio twin of
    * [[bmpAHash]] (recordings differing by light noise/re-encode land on
    * equal or near-equal fingerprints; the hash is the audio-dedup
    * blocking key). Requires n ≥ segs samples (shorter clips yield a null
    * fingerprint inside the struct — not enough signal to segment).
    *
    * Same 8-bit mono RIFF contract as [[wavWindowEnergy8]], same linear
    * cost shape as [[bmpAHash]]: blob, segment-energy array, and
    * energy total each bound once before any lambda references them, and
    * the threshold bits unroll over `element_at` reads of the bound
    * energies (segs ≤ 32). The round-10 form referenced the total — an
    * aggregate over per-sample folds — inside a zip_with lambda, which
    * re-ran the ENTIRE per-sample energy pass once per output bit:
    * O(clip²) per document, 113 s alone at sf0.1 (now well under a
    * second). Output struct: (fp, energy_sum) — null for non-WAV
    * payloads. */
  def wavFingerprint8(bin: Column, segs: Int): Column = {
    require(segs >= 2 && segs <= 32, s"segs out of range: $segs")
    // Column builders carry no session; register the native function on
    // the active one so call_function resolves regardless of which
    // operator ran first in the session (the graft_* entry-point rule).
    graft.plans.GraftFunctions.registerCurrent()
    // Per-segment energies come from ONE native byte loop
    // ([[graft.plans.WavEnergies]] — bit-for-bit the former per-segment
    // aggregate(sequence(lo, hi), …) columns, whose per-SAMPLE lambda
    // tree ran interpreted: the LshBuckets/CellDists failure mode, ~1 ms
    // per row at fixture blob sizes). The O(1) header reads (the ok gate
    // and the nSamp ≥ segs guard) stay in column land; the remaining
    // higher-order work is over the segs-element energies array only.
    bindOnce(bin, nb => bindOnce(
        when(wavOk8(nb), least(leUN(nb, 40, 4), byteLen(nb) - 44)), nSamp => {
      val ok = nSamp.isNotNull
      val energies = call_function(
        graft.plans.GraftFunctions.WavEnergiesName, nb, lit(segs))
      bindOnce(energies, es =>
        bindOnce(aggregate(es, lit(0L), _ + _), total => {
          val fp = (0 until segs).map(s =>
            when(element_at(es, s + 1) * lit(segs.toLong) > total,
              lit(1L << s)).otherwise(lit(0L))).reduce(_ + _)
          when(ok, struct(
            when(nSamp >= segs, fp).as("fp"),
            when(nSamp >= segs, total).as("energy_sum")))
        }))
    }))
  }

  /** Aspect-preserving fit of decoded metadata into a boxW×boxH bounding
    * box, integer milli-scale arithmetic (no floats → exact oracles). */
  def resizeFit(meta: Column, boxW: Int, boxH: Int): Column = {
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

  /** FEATURE EXTRACTION (real, codec-free): the 8-bin byte-value histogram
    * of the payload, the standard modality-agnostic cheap feature for
    * corrupt-payload / wrong-modality detection (text concentrates in bins
    * 1–3, compressed media is near-uniform). Bin = byte >> 5, read off the
    * HIGH hex nibble at `hex(bin)`'s odd positions.
    *
    * Cost shape: the payload is hex-decoded ONCE per row — `split`'s child
    * is an ordinary argument (evaluated once), and the counting runs as a
    * single `aggregate` fold over that array with an 8-slot accumulator.
    * (The previous shape fanned out 8 independent `size(filter(...))`
    * expressions, each re-expanding the hex/transform subtree.) Callers
    * that fan the result out per-bin should project it to a named column
    * first — an 8-reference non-cheap projection is kept materialized by
    * CollapseProject, so the fold also runs once. Returns array<long> of
    * 8 counts. */
  def byteProfile(bin: Column): Column = {
    // split(hex, "") yields one element per hex char plus a trailing "";
    // high nibble of byte i sits at even 0-based index 2i. Non-high or
    // empty elements map to -1 and are dropped before the fold.
    val bins = filter(
      transform(split(hex(bin), ""), (c, i) => {
        val d = ascii(c)
        when(i % 2 === 0 && c =!= "",
          ((when(d <= 57, d - 48).otherwise(d - 55)) / 2).cast("int"))
          .otherwise(lit(-1))
      }),
      b => b >= 0)
    aggregate(bins, array_repeat(lit(0L), 8),
      (acc, b) => transform(acc, (v, j) => when(j === b, v + 1L).otherwise(v)))
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

  // ---------------------------------------------------------------------
  // Partition-map decode: the PRODUCTION swap point named in the header,
  // exercised end-to-end. Compressed formats (JPEG/PNG/MP3/H.264) need a
  // codec library call per blob — imperative code no column expression
  // can express — so the deployment shape is a per-partition map over the
  // blob column emitting the SAME metadata schema the expression path
  // emits. In Scala the swap is `Dataset.mapPartitions` (one iterator per
  // partition: codec contexts amortize across the partition's blobs, and
  // the operator composes with the surrounding plan at a codegen
  // boundary); a Python codec would be `mapInArrow`/`mapInPandas` with
  // the identical output schema. Everything downstream (resizeFit, frame
  // slicing, pairing, clustering) is schema-driven and cannot tell the
  // two paths apart — MultimodalOpsSpec pins exact parity between this
  // decoder and [[decodeBmp]] on valid, corrupt, and wrong-format blobs.
  // ---------------------------------------------------------------------

  /** JVM-side BMP header parse with [[decodeBmp]]'s exact contract
    * (None ⇔ the expression path's NULL). */
  private[operators] def parseBmpBytes(b: Array[Byte])
      : Option[(Int, Int, Int)] = {
    def u8(off: Int): Int = b(off) & 0xFF
    def leU(off: Int, n: Int): Long =
      (0 until n).map(i => u8(off + i).toLong << (8 * i)).sum
    def leI32(off: Int): Int = leU(off, 4).toInt // wraps exactly like the
                                                 // expression path's
                                                 // u − 2^32 branch
    if (b == null || b.length < 54) None
    else if (!(u8(0) == 0x42 && u8(1) == 0x4D)) None // "BM"
    else if (leU(14, 4) != 40L) None                 // BITMAPINFOHEADER
    else Some((leI32(18), math.abs(leI32(22)), (leU(28, 2) / 8).toInt))
  }

  /** The decode swap EXERCISED: BMP metadata via a per-partition map over
    * the blob column instead of column expressions. Output rows
    * (<idCol>, meta struct<width:int, height:int, channels:int>), meta
    * null for non-BMPs — bit-identical to
    * `df.select(idCol, decodeBmp(blobCol))`. The body is where a
    * production build calls its codec (one instance per PARTITION, not
    * per row — the reason this is the swap shape for libjpeg-style
    * stateful decoders). */
  def decodeBmpPartitions(df: org.apache.spark.sql.DataFrame, idCol: String,
                          blobCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // Per-partition setup lands HERE (codec init, scratch buffers).
        it.map { case (id, blob) =>
          (id, parseBmpBytes(blob).map { case (w, h, c) => DecodedMeta(w, h, c) })
        }
      }
      .toDF(idCol, "meta")
  }

  /** Decoded-metadata record for the partition-map path — same field
    * names/types as [[decodeBmp]]'s output struct. */
  final case class DecodedMeta(width: Int, height: Int, channels: Int)
}
