package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native audio-header probe: `audio_meta(blob)` →
  * `struct<fmt: string, channels: int, sample_rate: int, bits: int,
  * n_frames: bigint, duration_ms: bigint>`, NULL when the payload
  * matches no known signature.
  *
  * Parses REAL container formats from the leading bytes of a binary
  * column without touching sample data:
  *  - WAV (RIFF little-endian): walks the chunk list — `fmt ` for
  *    channels/rate/bits, `data` for payload size → frame count.
  *    Chunk WALKING is the point: real WAV files carry LIST/INFO/fact
  *    chunks between `fmt ` and `data`, so offset-hardcoding breaks.
  *  - AIFF (IFF big-endian): `COMM` chunk, including the sample rate's
  *    80-bit IEEE-754 extended-precision float (sign/15-bit exponent/
  *    64-bit explicit-leading-bit mantissa) — decoded exactly for the
  *    integral rates real files carry.
  *
  * Same design as [[ImageDims]] (the non-stubbed half of the
  * multimodal seam, SURVEY §2C): metadata extraction over a 100 TB
  * media corpus stays a codegen'd per-row projection reading only each
  * blob's leading bytes; sample DECODING remains behind the documented
  * stub in graft.operators.Multimodal.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = AudioMeta.schema

  override def nullable: Boolean = true

  override def prettyName: String = "audio_meta"

  override protected def nullSafeEval(input: Any): Any =
    AudioMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // parse may return null (unknown/corrupt format) — propagate to isNull
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AudioMeta.parse($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

object AudioMeta {

  val schema: StructType = StructType(Seq(
    StructField("fmt", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def tag(b: Array[Byte], o: Int, t: String): Boolean =
    b(o) == t.charAt(0) && b(o + 1) == t.charAt(1) &&
      b(o + 2) == t.charAt(2) && b(o + 3) == t.charAt(3)

  /** 80-bit IEEE extended float at offset `o`, for the non-negative
    * integral values audio sample rates actually are; -1 on anything
    * else (negative, fractional, out of int range). */
  private def extended80(b: Array[Byte], o: Int): Long = {
    val sign = (b(o) & 0x80) != 0
    val exp = ((b(o) & 0x7f) << 8) | (b(o + 1) & 0xff)
    var mant = 0L
    var i = 0
    while (i < 8) { mant = (mant << 8) | (b(o + 2 + i) & 0xffL); i += 1 }
    if (sign || mant == 0L) return if (mant == 0L && !sign) 0L else -1L
    // value = mant * 2^(exp - 16383 - 63); integral ⇔ shift ≥ 0 after
    // cancelling mantissa trailing zeros
    val shift = exp - 16383 - 63
    if (shift >= 0) {
      if (shift > 16) return -1L // > 2^80 — not a sample rate
      mant << shift
    } else {
      val s = -shift
      if (s > 63 || (mant & ((1L << s) - 1)) != 0L) return -1L // fractional
      mant >>> s
    }
  }

  private def row(fmt: String, ch: Int, rate: Long, bits: Int,
      frames: Long): InternalRow = {
    if (ch <= 0 || rate <= 0 || rate > Int.MaxValue || bits <= 0 ||
      frames < 0) return null
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), ch,
      rate.toInt, bits, frames, frames * 1000L / rate))
  }

  /** null ⇔ no known signature / structurally corrupt header.
    * Called from generated code. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    // ---- WAV: RIFF(le) container, walk chunks for `fmt ` + `data` ----
    // The walk offset is a LONG advanced AFTER the chunk is consumed: a
    // declared chunk size is an unsigned 32-bit value up to ~4 GiB, so
    // an Int offset would wrap negative on an adversarial/corrupt size
    // and index out of bounds. A size running past the buffer simply
    // ends the walk (headers are routinely probed from a truncated
    // prefix of the blob — the trailing `data` payload is not present);
    // whether that yields a row or NULL is decided by what was parsed.
    if (tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) {
      var off = 12L
      var ch = -1; var rate = -1L; var bits = -1; var align = -1
      var dataSize = -1L
      while (off + 8 <= b.length && (ch < 0 || dataSize < 0)) {
        val o = off.toInt // safe: off + 8 <= b.length <= Int.MaxValue
        val size = le32(b, o + 4)
        if (tag(b, o, "fmt ") && off + 8 + 16 <= b.length) {
          ch = le16(b, o + 10)
          rate = le32(b, o + 12)
          align = le16(b, o + 20)
          bits = le16(b, o + 22)
        } else if (tag(b, o, "data")) {
          dataSize = size
        }
        // chunks are word-aligned: odd sizes carry a pad byte
        off += 8L + size + (size & 1L)
      }
      if (ch <= 0 || align <= 0 || dataSize < 0) return null
      return row("wav", ch, rate, bits, dataSize / align)
    }
    // ---- AIFF: FORM(be) container, COMM chunk ------------------------
    if (tag(b, 0, "FORM") && tag(b, 8, "AIFF")) {
      var off = 12L
      while (off + 8 <= b.length) {
        val o = off.toInt
        val size = be32(b, o + 4)
        if (tag(b, o, "COMM") && off + 8 + 18 <= b.length) {
          val ch = be16(b, o + 8)
          val frames = be32(b, o + 10)
          val bits = be16(b, o + 14)
          val rate = extended80(b, o + 16)
          return row("aiff", ch, rate, bits, frames)
        }
        off += 8L + size + (size & 1L)
      }
      return null
    }
    null
  }
}

/** Native PCM sample statistics: `wav_pcm_stats(blob)` →
  * `struct<n_samples: bigint, sum_dev2: bigint, peak_dev: int>`, NULL
  * unless the payload is a WAV holding 8-bit mono PCM.
  *
  * This is REAL sample decoding, not a stub: 8-bit PCM stores raw
  * unsigned samples biased at 128 — the one mainstream audio encoding
  * that needs no codec library (the BMP-pixel story's audio twin).
  * The expression chunk-walks the RIFF list (LIST/fact chunks between
  * `fmt ` and `data` are skipped, same robustness contract as
  * audio_meta), then folds the data chunk once: Σ(s−128)² and
  * max|s−128| — the loudness/clipping signals an audio-corpus quality
  * gate runs (silence ⇔ sum_dev2 ≈ 0, clipping ⇔ peak_dev = 127+).
  * All-integer outputs, so the fold replays exactly in plain SQL; RMS
  * itself is √(sum_dev2/n), one deterministic double downstream. One
  * O(bytes) pass per row, codegen'd, no shuffle. */
/** Fixture generator: `planted_wav(doc_id)` → a complete 8-bit mono
  * 8 kHz PCM WAV with n = 64 + d mod 192 planted samples
  * s(t) = (d·31 + 13t + t² mod 97) mod 256, a LIST/INFO chunk
  * interposed between `fmt ` and `data` for every d mod 10 = 4 (the
  * walk-robustness contract). GENERATION ONLY — shares no code with
  * [[AudioMeta]] / [[WavPcmStats]]; exists because the declarative
  * transform/hex synthesis ran in the interpreted HOF path and
  * dominated the mm_audio_rms measurement. */
case class PlantedWav(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects bigint, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false

  override def prettyName: String = "planted_wav"

  override protected def nullSafeEval(input: Any): Any =
    PlantedWav.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PlantedWav.compute($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): PlantedWav =
    copy(child = newChild)
}

object PlantedWav {

  private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
  }

  private def putTag(b: Array[Byte], o: Int, t: String): Unit = {
    var i = 0
    while (i < 4) { b(o + i) = t.charAt(i).toByte; i += 1 }
  }

  /** Called from generated code. */
  def compute(d: Long): Array[Byte] = {
    val n = (64 + d % 192).toInt
    val list = if (d % 10 == 4) 12 else 0
    val out = new Array[Byte](44 + list + n)
    putTag(out, 0, "RIFF"); putLe32(out, 4, 4 + 24 + list + 8 + n)
    putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); putLe32(out, 16, 16)
    out(20) = 1; out(22) = 1 // PCM, mono
    putLe32(out, 24, 8000); putLe32(out, 28, 8000) // rate, byte rate
    out(32) = 1; out(34) = 8 // align, bits
    var o = 36
    if (list > 0) {
      putTag(out, o, "LIST"); putLe32(out, o + 4, 4)
      putTag(out, o + 8, "INFO"); o += 12
    }
    putTag(out, o, "data"); putLe32(out, o + 4, n)
    var t = 0
    while (t < n) {
      out(o + 8 + t) = ((d * 31 + t * 13 + (t * t) % 97) % 256).toByte
      t += 1
    }
    out
  }
}

case class WavPcmStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = WavPcmStats.schema

  override def nullable: Boolean = true

  override def prettyName: String = "wav_pcm_stats"

  override protected def nullSafeEval(input: Any): Any =
    WavPcmStats.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WavPcmStats.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): WavPcmStats =
    copy(child = newChild)
}

object WavPcmStats {

  val schema: StructType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_dev2", LongType, nullable = false),
    StructField("peak_dev", IntegerType, nullable = false)))

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], o: Int, t: String): Boolean =
    b(o) == t.charAt(0) && b(o + 1) == t.charAt(1) &&
      b(o + 2) == t.charAt(2) && b(o + 3) == t.charAt(3)

  /** null ⇔ not a RIFF/WAVE with PCM(1ch, 8-bit) fmt and a complete
    * data chunk. Called from generated code. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 44 ||
        !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var off = 12L
    var ok = false
    var dataOff = -1L
    var dataSize = -1L
    while (off + 8 <= b.length) {
      val o = off.toInt
      val size = le32(b, o + 4)
      if (tag(b, o, "fmt ") && off + 8 + 16 <= b.length) {
        // PCM, mono, 8-bit — the codec-free decode contract
        ok = le16(b, o + 8) == 1 && le16(b, o + 10) == 1 &&
          le16(b, o + 22) == 8
      } else if (tag(b, o, "data")) {
        dataOff = off + 8
        dataSize = size
      }
      off += 8L + size + (size & 1L)
    }
    if (!ok || dataOff < 0 || dataSize < 0 ||
        dataOff + dataSize > b.length) return null
    var i = 0L
    var ss = 0L
    var peak = 0
    while (i < dataSize) {
      val dev = (b((dataOff + i).toInt) & 0xff) - 128
      ss += dev.toLong * dev
      if (math.abs(dev) > peak) peak = math.abs(dev)
      i += 1
    }
    new GenericInternalRow(Array[Any](dataSize, ss, peak))
  }
}

/** Per-window PCM energy: `wav_window_energy(blob)` →
  * `array<bigint>` of sum-of-squared-deviations over consecutive
  * 16-sample windows of an 8-bit mono PCM WAV (the last window may be
  * short), NULL when the payload is not that contract — the front end
  * of energy-gated voice-activity detection ([[WavPcmStats]] folds the
  * whole clip; VAD needs the time axis).
  *
  * Same scale posture as the other audio expressions: the blob is
  * consumed INSIDE the codegen'd projection — only the (n_windows)-
  * sized integer array leaves the row, so audio bytes never reach an
  * exchange. Window width 16 at the fixture's 8 kHz-ish scale stands
  * in for the usual 10–30 ms frame; the arithmetic is integral, so
  * the downstream gate/segment logic is exactly SQL-replayable. */
case class WavWindowEnergy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "wav_window_energy"

  override protected def nullSafeEval(input: Any): Any =
    WavWindowEnergy.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WavWindowEnergy.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): WavWindowEnergy =
    copy(child = newChild)
}

object WavWindowEnergy {

  val WindowSamples = 16

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], o: Int, t: String): Boolean =
    b(o) == t.charAt(0) && b(o + 1) == t.charAt(1) &&
      b(o + 2) == t.charAt(2) && b(o + 3) == t.charAt(3)

  /** null ⇔ not a RIFF/WAVE with PCM(1ch, 8-bit) fmt and a complete
    * data chunk (the [[WavPcmStats]] contract). Called from generated
    * code. */
  def compute(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (b == null || b.length < 44 ||
        !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var off = 12L
    var ok = false
    var dataOff = -1L
    var dataSize = -1L
    while (off + 8 <= b.length) {
      val o = off.toInt
      val size = le32(b, o + 4)
      if (tag(b, o, "fmt ") && off + 8 + 16 <= b.length) {
        ok = le16(b, o + 8) == 1 && le16(b, o + 10) == 1 &&
          le16(b, o + 22) == 8
      } else if (tag(b, o, "data")) {
        dataOff = off + 8
        dataSize = size
      }
      off += 8L + size + (size & 1L)
    }
    if (!ok || dataOff < 0 || dataSize < 0 ||
        dataOff + dataSize > b.length) return null
    val n = dataSize.toInt
    val nWin = (n + WindowSamples - 1) / WindowSamples
    val out = new Array[Long](nWin)
    var i = 0
    while (i < n) {
      val dev = (b(dataOff.toInt + i) & 0xff) - 128
      out(i / WindowSamples) += dev.toLong * dev
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}
