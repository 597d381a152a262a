package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Header-level image dimension extraction — REAL container parsing,
  * no codec dependency: PNG dimensions live in the IHDR chunk (fixed
  * offsets behind an 8-byte signature) and JPEG dimensions in the
  * first SOFn frame header (a linear marker-segment scan), so both are
  * pure byte arithmetic over the first bytes of the payload. This is
  * the non-stub half of the E5 decode surface (Multimodal.FakeDecoder
  * remains the documented stand-in for full-frame decode and for
  * audio/video containers).
  *
  * One static kernel shared verbatim by the interpreted eval, the
  * generated code, and the typed mapPartitions path
  * (Multimodal.HeaderDecoder) — the differential spec's parity is the
  * same function, not two implementations.
  */
object MediaHeaders {

  /** True pixel dimensions `[width, height]` of a real PNG or JPEG
    * payload; null when the bytes are not a recognized container (the
    * caller falls back to the deterministic stub). */
  def imageDims(b: Array[Byte]): Array[Int] = {
    if (b == null) return null
    val png = pngDims(b)
    if (png != null) png else jpegDims(b)
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG: 8-byte signature, then the IHDR chunk is REQUIRED first
    * (PNG spec §5.6): length(4) "IHDR"(4) width(4 BE) height(4 BE). */
  private def pngDims(b: Array[Byte]): Array[Int] = {
    if (b.length < 24) return null
    var i = 0
    while (i < 8) { if (u8(b, i) != PngSig(i)) return null; i += 1 }
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return null
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
    Array(w.toInt, h.toInt)
  }

  /** True audio header fields `[sample_rate, channels,
    * bits_per_sample, n_samples]` of a real RIFF/WAVE payload; null
    * when the bytes are not a walkable WAV container (the caller
    * falls back to the deterministic stub). Like the image kernels
    * this is pure byte arithmetic — WAV is the one mainstream audio
    * container whose fields need no codec at all. */
  def wavInfo(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 44) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return null
    // RIFF chunk walk (PCM or not): the REQUIRED "fmt " chunk carries
    // channels at +2, sample rate at +4, block align at +12, bits per
    // sample at +14 (all LE); the "data" chunk's size over block align
    // is the per-channel sample count. Chunks are word-aligned: odd
    // sizes carry a pad byte (RIFF spec) — skipping it keeps the walk
    // aligned through odd-sized LIST/fact chunks.
    // the walk index is a Long: a declared chunk size is an unsigned
    // 32-bit value, so Int index arithmetic can wrap NEGATIVE on a
    // crafted/corrupt size and read a negative array index — with a
    // Long index the oversized advance simply walks past the buffer
    // and the loop exits (null, stub fallback), never throws
    var i = 12L
    var rate = -1; var ch = -1; var bits = -1; var align = -1
    var dataLen = -1L
    while (i + 8 <= b.length && (rate < 0 || dataLen < 0)) {
      val at = i.toInt // safe: i + 8 <= b.length <= Int.MaxValue
      val size = le32(b, at + 4)
      if (b(at) == 'f' && b(at + 1) == 'm' && b(at + 2) == 't' && b(at + 3) == ' ') {
        if (size < 16 || i + 8 + 16 > b.length) return null
        ch = le16(b, at + 10)
        rate = le32(b, at + 12).toInt
        align = le16(b, at + 20)
        bits = le16(b, at + 22)
      } else if (b(at) == 'd' && b(at + 1) == 'a' && b(at + 2) == 't' && b(at + 3) == 'a') {
        dataLen = size
      }
      if (rate >= 0 && dataLen >= 0) i = b.length // done — no further walk
      else i += 8L + size + (size & 1L)
    }
    if (rate <= 0 || ch <= 0 || bits <= 0 || align <= 0 || dataLen < 0) return null
    val samples = dataLen / align
    if (samples > Int.MaxValue) return null
    Array(rate, ch, bits, samples.toInt)
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** True movie-header fields `[timescale, duration_units, n_frames]`
    * of a real ISO BMFF (MP4/MOV) payload; null when the bytes are not
    * a walkable container. The third of the three real header kernels:
    * top-level box walk to `moov`, child walk to `mvhd`, whose
    * version-0/1 layouts put timescale and duration at fixed offsets —
    * byte arithmetic only, no codec. duration_units / timescale is the
    * duration in seconds. n_frames is the FIRST video track's sample
    * count — the trak → mdia(hdlr = 'vide') → minf → stbl → stts
    * descent, frame count = Σ stts sample_counts — or -1 when the
    * movie carries no walkable video sample table (header-only files,
    * audio-only movies, fragmented streams whose samples live in moof
    * runs): a header probe reports what the bytes declare, it never
    * invents a count. */
  def mp4Info(b: Array[Byte]): Array[Long] = {
    if (b == null || b.length < 16) return null
    // a real BMFF file starts with a well-formed box whose type is
    // printable FourCC; insist the FIRST box is one of the standard
    // top-level starters so text bytes never accidentally "walk"
    val first = fourcc(b, 4)
    if (first != "ftyp" && first != "moov" && first != "mdat" &&
        first != "free" && first != "wide" && first != "skip") return null
    val moov = findBox(b, 0, b.length.toLong, "moov")
    if (moov < 0) return null
    val moovEnd = boxEnd(b, moov)
    // children start after moov's header — 16 bytes when it carries a
    // 64-bit largesize (size == 1), 8 otherwise; starting the child
    // walk inside the largesize field would misparse it as a box
    val childStart = moov + headerLen(b, moov)
    val mvhd = findBox(b, childStart, moovEnd, "mvhd")
    if (mvhd < 0 || mvhd + 12 > b.length) return null
    val ver = u8(b, mvhd + 8)
    val frames = videoFrameCount(b, childStart, moovEnd)
    // v0: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4)
    // v1: ver/flags(4) ctime(8) mtime(8) timescale(4) duration(8)
    if (ver == 0) {
      if (mvhd + 24 + 4 > b.length) return null
      val ts = be32(b, mvhd + 20)
      val dur = be32(b, mvhd + 24)
      if (ts <= 0) return null
      Array(ts, dur, frames)
    } else if (ver == 1) {
      if (mvhd + 32 + 8 > b.length) return null
      val ts = be32(b, mvhd + 28)
      val dur = (be32(b, mvhd + 32) << 32) | be32(b, mvhd + 36)
      // reject implausible 64-bit durations: downstream duration math
      // multiplies by 1000, and a near-Long.Max value from a hostile
      // header would wrap it. 9e15 units is ~3000 years at 90 kHz —
      // anything beyond is garbage, not a movie.
      if (ts <= 0 || dur < 0 || dur > 9000000000000000L) return null
      Array(ts, dur, frames)
    } else null
  }

  /** Header length of the box at `at`: 16 when it carries a 64-bit
    * largesize (size == 1), 8 otherwise. */
  private def headerLen(b: Array[Byte], at: Int): Int =
    if (be32(b, at) == 1L) 16 else 8

  /** Frame count of the first video track among moov's children, or -1
    * when none is walkable. Same discipline as the WAV chunk walk:
    * Long walk index (declared sizes are unsigned 32-bit), every
    * descent bounded by the parent box's own declared end, malformed
    * anything → -1, never a throw. */
  private def videoFrameCount(b: Array[Byte], moovChildStart: Int, moovEnd: Long): Long = {
    var i = moovChildStart.toLong
    val max = math.min(moovEnd, b.length.toLong)
    while (i + 8 <= max) {
      val at = i.toInt
      if (fourcc(b, at + 4) == "trak") {
        val n = trakFrameCount(b, at)
        if (n >= 0) return n
      }
      val sz0 = be32(b, at)
      val adv =
        if (sz0 == 0) return -1 // last box (extends to end), not a video trak
        else if (sz0 == 1) {
          if (i + 16 > max) return -1
          (be32(b, at + 8) << 32) | be32(b, at + 12)
        } else sz0
      if (adv < 8) return -1 // malformed: box cannot cover its own header
      i += adv
    }
    -1
  }

  /** Sample count of the trak at `at` IF its media handler is 'vide',
    * else -1: mdia → hdlr (ver/flags 4, pre_defined 4, handler_type 4)
    * to gate on the handler, then mdia → minf → stbl → stts, whose
    * payload is ver/flags(4) entry_count(4) then entry_count ×
    * (sample_count(4), sample_delta(4)). entry_count is bounded by the
    * stts box's own declared size, so a hostile count can never drive
    * the sum loop past the buffer. */
  private def trakFrameCount(b: Array[Byte], trak: Int): Long = {
    val trakEnd = boxEnd(b, trak)
    val mdia = findBox(b, trak + headerLen(b, trak), trakEnd, "mdia")
    if (mdia < 0) return -1
    val mdiaEnd = boxEnd(b, mdia)
    val mdiaKids = mdia + headerLen(b, mdia)
    val hdlr = findBox(b, mdiaKids, mdiaEnd, "hdlr")
    if (hdlr < 0 || fourcc(b, hdlr + headerLen(b, hdlr) + 8) != "vide") return -1
    val minf = findBox(b, mdiaKids, mdiaEnd, "minf")
    if (minf < 0) return -1
    val stbl = findBox(b, minf + headerLen(b, minf), boxEnd(b, minf), "stbl")
    if (stbl < 0) return -1
    val stts = findBox(b, stbl + headerLen(b, stbl), boxEnd(b, stbl), "stts")
    if (stts < 0) return -1
    val hl = headerLen(b, stts)
    val sttsEnd = boxEnd(b, stts) // clamped to the buffer
    if (stts + hl + 8 > sttsEnd) return -1
    val n = be32(b, stts + hl + 4) // unsigned 32-bit entry count, as Long
    if (stts + hl + 8 + n * 8 > sttsEnd) return -1
    var sum = 0L
    var k = 0L
    while (k < n) {
      sum += be32(b, (stts + hl + 8 + k * 8).toInt)
      k += 1
    }
    // same plausibility bound as the mvhd duration: downstream frame
    // math must never overflow on a hostile table
    if (sum > 9000000000000000L) -1 else sum
  }

  private def fourcc(b: Array[Byte], i: Int): String = {
    if (i + 4 > b.length) return ""
    var j = 0
    while (j < 4) {
      val c = b(i + j) & 0xff
      if (c < 0x20 || c > 0x7e) return ""
      j += 1
    }
    new String(b, i, 4, "US-ASCII")
  }

  /** Offset of the first `typ` box in [from, limit), or -1. Walks
    * sibling boxes only (callers descend by re-calling inside a
    * container's bounds). Handles 64-bit largesize (size == 1). */
  private def findBox(b: Array[Byte], from: Int, limit: Long, typ: String): Int = {
    var i = from.toLong
    val max = math.min(limit, b.length.toLong)
    while (i + 8 <= max) {
      val sz0 = be32(b, i.toInt)
      if (fourcc(b, i.toInt + 4) == typ) return i.toInt
      val adv =
        if (sz0 == 0) return -1 // box extends to EOF and is not `typ`
        else if (sz0 == 1) {
          if (i + 16 > max) return -1
          (be32(b, i.toInt + 8) << 32) | be32(b, i.toInt + 12)
        } else sz0
      if (adv < 8) return -1 // malformed: box cannot cover its own header
      i += adv
    }
    -1
  }

  /** Exclusive end offset of the box at `at` (clamped to the buffer —
    * a truncated read still bounds the child walk). */
  private def boxEnd(b: Array[Byte], at: Int): Long = {
    val sz0 = be32(b, at)
    val end =
      if (sz0 == 0) b.length.toLong
      else if (sz0 == 1 && at + 16 <= b.length)
        at + ((be32(b, at + 8) << 32) | be32(b, at + 12))
      else at + sz0
    math.min(end, b.length.toLong)
  }

  /** JPEG: SOI marker, then a marker-segment walk to the first SOFn
    * frame header (C0–CF minus the non-frame C4/C8/CC), which carries
    * lines at +5 and samples-per-line at +7 (both BE u16). Fill bytes
    * (repeated FF) and standalone markers (RSTn/TEM) are skipped;
    * hitting SOS or EOI without a SOF, or any misaligned byte, means
    * "not a (baseline-walkable) JPEG" → null. */
  private def jpegDims(b: Array[Byte]): Array[Int] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return null
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return null
      var m = u8(b, i + 1)
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      // the fill-byte skip advanced i without the loop-head bounds
      // check: a truncated payload ending in fill bytes must fall back
      // to null here, not read a length field past the buffer
      if (i + 3 >= b.length) return null
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        i += 2 // standalone marker, no length field
      } else if (m == 0xd9 || m == 0xda) {
        return null // EOI / start-of-scan before any frame header
      } else {
        val len = be16(b, i + 2)
        if (len < 2) return null
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (i + 8 >= b.length) return null
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          if (w <= 0 || h <= 0) return null
          return Array(w, h)
        }
        i += 2 + len
      }
    }
    null
  }
}

/** Native Catalyst expression over MediaHeaders.imageDims: BINARY →
  * ARRAY<INT> `[width, height]`, NULL when the payload is not a real
  * PNG/JPEG container. Stays inside whole-stage codegen (the generated
  * code calls the static kernel — no UDF boxing on the payload scan). */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_dims requires BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "image_dims"

  override protected def nullSafeEval(input: Any): Any = {
    val d = MediaHeaders.imageDims(input.asInstanceOf[Array[Byte]])
    if (d == null) null else UnsafeArrayData.fromPrimitiveArray(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val dims = ctx.freshName("dims")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          int[] $dims = graft.functions.MediaHeaders.imageDims(${childGen.value});
          if ($dims != null) {
            ${ev.isNull} = false;
            ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
              .fromPrimitiveArray($dims);
          }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): ImageDims =
    copy(child = newChild)
}

object ImageDims {
  /** Column-API entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(ImageDims(ColumnBridge.expression(c)))
}

/** Native Catalyst expression over MediaHeaders.wavInfo: BINARY →
  * ARRAY<INT> `[sample_rate, channels, bits_per_sample, n_samples]`,
  * NULL when the payload is not a real RIFF/WAVE container. Same
  * single-static-kernel discipline as ImageDims: interpreted eval and
  * generated code call the one function. */
case class WavInfo(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_info requires BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "wav_info"

  override protected def nullSafeEval(input: Any): Any = {
    val d = MediaHeaders.wavInfo(input.asInstanceOf[Array[Byte]])
    if (d == null) null else UnsafeArrayData.fromPrimitiveArray(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val info = ctx.freshName("wavinfo")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          int[] $info = graft.functions.MediaHeaders.wavInfo(${childGen.value});
          if ($info != null) {
            ${ev.isNull} = false;
            ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
              .fromPrimitiveArray($info);
          }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): WavInfo =
    copy(child = newChild)
}

object WavInfo {
  /** Column-API entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(WavInfo(ColumnBridge.expression(c)))
}

/** Native Catalyst expression over MediaHeaders.mp4Info: BINARY →
  * ARRAY<BIGINT> `[timescale, duration_units, n_frames]` (n_frames is
  * -1 when the movie has no walkable video sample table), NULL when
  * the payload is not a real ISO BMFF container. Same
  * single-static-kernel discipline as ImageDims/WavInfo. */
case class Mp4Info(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mp4_info requires BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mp4_info"

  override protected def nullSafeEval(input: Any): Any = {
    val d = MediaHeaders.mp4Info(input.asInstanceOf[Array[Byte]])
    if (d == null) null else UnsafeArrayData.fromPrimitiveArray(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val info = ctx.freshName("mp4info")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          long[] $info = graft.functions.MediaHeaders.mp4Info(${childGen.value});
          if ($info != null) {
            ${ev.isNull} = false;
            ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
              .fromPrimitiveArray($info);
          }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): Mp4Info =
    copy(child = newChild)
}

object Mp4Info {
  /** Column-API entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(Mp4Info(ColumnBridge.expression(c)))
}
