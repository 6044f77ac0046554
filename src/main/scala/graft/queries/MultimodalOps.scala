package graft.queries

import graft.Tables
import graft.ops.Multimodal
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multimodal-column queries. The testdata has no real media files, so
  * the decode gate SYNTHESIZES valid PNG/GIF/JPEG/BMP containers from
  * each document's attributes (pure column algebra: hex-string assembly
  * → unhex), then runs the REAL header parser
  * ([[graft.ops.Multimodal.decodeImageMeta]]) over the binary payloads.
  * The DuckDB oracle computes the expected (format, width, height)
  * independently from the same attributes — so any byte-layout error in
  * builder OR parser breaks the match, and the parser itself is
  * additionally pinned against hand-written golden headers (including
  * adversarial truncations) in its spec.
  */
object MultimodalOps {
  import Catalog.{Entry, Q}

  private val meta: Q = (s, dir) =>
    Multimodal.binaryMeta(Tables.load(s, dir, "documents"), "doc_id", "text")
  private val metaSql =
    """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  md5(text) AS digest
      |FROM documents""".stripMargin

  // --- hex assembly helpers (widths fit in 16 bits) -------------------
  private def he8(n: Column) = lpad(conv(n.cast("string"), 10, 16), 2, "0")
  private def he16(n: Column) = lpad(conv(n.cast("string"), 10, 16), 4, "0")
  private def he32(n: Column) = lpad(conv(n.cast("string"), 10, 16), 8, "0")
  private def le16(n: Column) =
    concat(he8(pmod(n, lit(256))), he8((n.cast("long") / 256).cast("int")))
  private def le32(n: Column) =
    concat(le16(pmod(n, lit(65536))), le16((n.cast("long") / 65536).cast("int")))

  /** The synthesized container payloads (see object doc), shared by the
    * decode and resize-plan gates: (doc_id, payload binary).
    */
  private def synthPayloads(docs: org.apache.spark.sql.DataFrame) = {
    val w = (lit(16) + pmod(col("doc_id"), lit(101))).cast("int")
    val h = (lit(16) + pmod(col("doc_id") * 7, lit(97))).cast("int")
    // 16 opaque payload bytes after each header, from the doc text.
    val body = coalesce(md5(col("text")), lit("00"))
    // PNG: signature, IHDR length 13, "IHDR", BE32 dims, bit depth 8,
    // RGBA, no interlace, (unchecked) CRC.
    val png = concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      he32(w), he32(h), lit("0806000000" + "00000000"), body)
    // GIF89a: LE16 logical screen descriptor.
    val gif = concat(lit("474946383961"), le16(w), le16(h), lit("F70000"), body)
    // JPEG: SOI, APP0/JFIF (16 bytes), a COM segment of VARIABLE length
    // (forces the parser to genuinely walk segments), SOF0 (dims), EOI.
    val pad = (pmod(col("doc_id"), lit(7)) + 1).cast("int")
    val jpeg = concat(
      lit("FFD8" + "FFE00010" + "4A46494600" + "0101" + "00" + "0001" + "0001" + "0000"),
      // padding length MUST reuse `pad`'s pmod, not SQL '%': for a
      // negative doc_id the sign-of-dividend '%' yields a negative
      // substring length (empty padding) while the declared COM length
      // above stays positive — an internally corrupt segment
      lit("FFFE"), he16(pad + 2),
      expr("substring('00000000000000', 1, (CAST(pmod(doc_id, 7) AS INT) + 1) * 2)"),
      lit("FFC0" + "000B" + "08"), he16(h), he16(w), lit("01" + "011100"),
      lit("FFD9"), body)
    // BMP: "BM", file size, data offset 54, BITMAPINFOHEADER (40 bytes)
    // with LE32 signed dims, 24bpp, zero-filled tail fields.
    val bmp = concat(lit("424D"), le32(lit(70)), lit("00000000"), le32(lit(54)),
      le32(lit(40)), le32(w), le32(h), lit("0100" + "1800"), lit("00" * 24), body)
    val payloadHex = when(pmod(col("doc_id"), lit(4)) === 0, png)
      .when(pmod(col("doc_id"), lit(4)) === 1, gif)
      .when(pmod(col("doc_id"), lit(4)) === 2, jpeg)
      .otherwise(bmp)
    docs.select(col("doc_id"), unhex(payloadHex).as("payload"))
  }

  private val decode: Q = (s, dir) => {
    Multimodal.decodeImageMeta(
        synthPayloads(Tables.load(s, dir, "documents")), "doc_id", "payload")
      .toDF()
      .select(col("id").as("doc_id"), col("format"), col("width"), col("height"))
  }
  private val decodeSql =
    """SELECT doc_id,
      |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
      |                  WHEN 2 THEN 'jpeg' ELSE 'bmp' END AS format,
      |  CAST(16 + doc_id % 101 AS INTEGER) AS width,
      |  CAST(16 + (doc_id * 7) % 97 AS INTEGER) AS height
      |FROM documents""".stripMargin

  // Resize PLAN over the same synthesized containers: longest side
  // capped at 64, integer `div` scaling, no upscale — the oracle
  // derives the plan from the same attribute math as decodeSql.
  private val resize: Q = (s, dir) =>
    Multimodal.resizePlan(
        synthPayloads(Tables.load(s, dir, "documents")), "doc_id", "payload",
        maxDim = 64)
      .withColumnRenamed("id", "doc_id")

  private val resizeSql =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
      |                    WHEN 2 THEN 'jpeg' ELSE 'bmp' END AS format,
      |    CAST(16 + doc_id % 101 AS INTEGER) AS width,
      |    CAST(16 + (doc_id * 7) % 97 AS INTEGER) AS height
      |  FROM documents)
      |SELECT doc_id, format, width, height,
      |  CASE WHEN GREATEST(width, height) <= 64 THEN width
      |       ELSE GREATEST(1, CAST((CAST(width AS BIGINT) * 64)
      |                             // GREATEST(width, height) AS INTEGER)) END AS out_w,
      |  CASE WHEN GREATEST(width, height) <= 64 THEN height
      |       ELSE GREATEST(1, CAST((CAST(height AS BIGINT) * 64)
      |                             // GREATEST(width, height) AS INTEGER)) END AS out_h
      |FROM m""".stripMargin

  // Frame sampling over an md5-synthesized "video" payload (variable
  // frame count per doc): every 2nd 8-byte frame, replayed in SQL by
  // hex-string slicing.
  private val frames: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val hexPayload = concat(
      md5(col("text")),
      md5(concat(col("text"), lit("x"))),
      md5(concat(col("text"), lit("y"))),
      expr("repeat(md5(concat(text, 'z')), CAST(doc_id % 3 AS INT))"))
    Multimodal.frameSample(
        docs.select(col("doc_id"), unhex(hexPayload).as("payload")),
        "doc_id", "payload", frameBytes = 8, every = 2)
      .select(col("doc_id"), col("frame_idx"), col("byte_start"),
        lower(hex(col("frame"))).as("frame_hex"))
  }

  private val framesSql =
    """WITH p AS (
      |  SELECT doc_id,
      |    md5(text) || md5(text || 'x') || md5(text || 'y')
      |      || repeat(md5(text || 'z'), CAST(doc_id % 3 AS INT)) AS hx
      |  FROM documents WHERE text IS NOT NULL),
      |f AS (
      |  SELECT doc_id, hx,
      |    unnest(range(0, 6 + 2 * (doc_id % 3), 2)) AS frame_idx
      |  FROM p)
      |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
      |  CAST(frame_idx * 8 AS BIGINT) AS byte_start,
      |  substr(hx, CAST(frame_idx * 16 + 1 AS INTEGER), 16) AS frame_hex
      |FROM f""".stripMargin

  // Audio metadata over synthesized WAVs whose rate/channels/bits
  // derive from doc attributes; a LIST chunk of varying (sometimes
  // odd, hence padded) size sits before fmt so the REAL chunk walk is
  // exercised. The oracle derives the expected fields independently.
  private val audio: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val ch = (lit(1) + pmod(col("doc_id"), lit(2))).cast("int")
    val bits = (lit(8) + pmod(col("doc_id"), lit(3)) * 8).cast("int")
    val rate = (lit(8000) + pmod(col("doc_id"), lit(5)) * lit(8000)).cast("int")
    val blockAlign = (ch * bits / lit(8)).cast("int")
    val listLen = (pmod(col("doc_id"), lit(5)) + 1).cast("int")
    val listHex = concat(
      // pmod, not SQL '%': the declared LIST size above is pmod-based,
      // and a negative doc_id under '%' would emit fewer body bytes
      // than declared, desyncing the chunk walk
      expr("repeat('00', CAST(pmod(doc_id, 5) AS INT) + 1)"),
      when(pmod(listLen, lit(2)) === 1, lit("00")).otherwise(lit("")))
    val body = coalesce(md5(col("text")), lit("00112233445566778899aabbccddeeff"))
    val wav = concat(
      lit("52494646"), le32(lit(100)), lit("57415645"),
      lit("4C495354"), le32(listLen), listHex,
      lit("666D7420"), le32(lit(16)), le16(lit(1)), le16(ch),
      le32(rate), le32(rate * blockAlign), le16(blockAlign), le16(bits),
      lit("64617461"), le32(lit(16)), body)
    Multimodal.decodeAudioMeta(
        docs.select(col("doc_id"), unhex(wav).as("payload")),
        "doc_id", "payload")
      .toDF()
      .select(col("id").as("doc_id"), col("format"), col("sample_rate"),
        col("channels"), col("bits"), col("n_samples"))
  }

  private val audioSql =
    """SELECT doc_id, 'wav' AS format,
      |  CAST(8000 + (doc_id % 5) * 8000 AS INTEGER) AS sample_rate,
      |  CAST(1 + doc_id % 2 AS INTEGER) AS channels,
      |  CAST(8 + (doc_id % 3) * 8 AS INTEGER) AS bits,
      |  CAST(16 // ((1 + doc_id % 2) * (8 + (doc_id % 3) * 8) // 8) AS BIGINT)
      |    AS n_samples
      |FROM documents""".stripMargin

  // ---- mm_audio_stats: integer-exact PCM sample statistics
  // (Multimodal.pcmStats) over synthesized mono PCM16 WAVs whose 8
  // samples are pure attribute math (u_j = (doc_id*31 + j*97) mod
  // 65536, decoded signed), so the oracle derives peak/energy/
  // clipping/zero-crossings independently — a byte-order, sign or
  // offset error on either side breaks the hash. Every 9th doc gets
  // a non-WAV payload, pinning the malformed path at the gate.
  private val audioStats: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val samples = concat((0 until 8).map { j =>
      le16(pmod(col("doc_id") * 31 + lit(j * 97), lit(65536)))
    }: _*)
    val wav = concat(
      lit("52494646"), le32(lit(52)), lit("57415645"),
      lit("666D7420"), le32(lit(16)), le16(lit(1)), le16(lit(1)),
      le32(lit(8000)), le32(lit(16000)), le16(lit(2)), le16(lit(16)),
      lit("64617461"), le32(lit(16)), samples)
    val payload =
      when(pmod(col("doc_id"), lit(9)) === 0, lit("DEADBEEF")).otherwise(wav)
    Multimodal.pcmStats(
        docs.select(col("doc_id"), unhex(payload).as("payload")),
        "doc_id", "payload")
      .toDF()
      .select(col("id").as("doc_id"), col("format"), col("n_samples"),
        col("peak_abs"), col("energy"), col("n_clipped"),
        col("zero_crossings"))
  }
  private val audioStatsSql =
    """WITH e AS (SELECT doc_id, unnest(range(0, 8)) AS j FROM documents),
      |s AS (SELECT doc_id, j,
      |  CASE WHEN (doc_id * 31 + j * 97) % 65536 >= 32768
      |       THEN (doc_id * 31 + j * 97) % 65536 - 65536
      |       ELSE (doc_id * 31 + j * 97) % 65536 END AS v FROM e),
      |w AS (SELECT doc_id, j, v,
      |  lag(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv FROM s),
      |g AS (SELECT doc_id,
      |  max(abs(v)) AS peak_abs, sum(v * v) AS energy,
      |  sum(CASE WHEN v IN (-32768, 32767) THEN 1 ELSE 0 END) AS n_clipped,
      |  sum(CASE WHEN pv IS NOT NULL AND ((v < 0) <> (pv < 0))
      |      THEN 1 ELSE 0 END) AS zero_crossings
      |  FROM w GROUP BY doc_id)
      |SELECT doc_id,
      |  CASE WHEN doc_id % 9 = 0 THEN 'unknown' ELSE 'wav' END AS format,
      |  CAST(CASE WHEN doc_id % 9 = 0 THEN -1 ELSE 8 END AS BIGINT)
      |    AS n_samples,
      |  CAST(CASE WHEN doc_id % 9 = 0 THEN -1 ELSE peak_abs END AS BIGINT)
      |    AS peak_abs,
      |  CAST(CASE WHEN doc_id % 9 = 0 THEN -1 ELSE energy END AS BIGINT)
      |    AS energy,
      |  CAST(CASE WHEN doc_id % 9 = 0 THEN -1 ELSE n_clipped END AS BIGINT)
      |    AS n_clipped,
      |  CAST(CASE WHEN doc_id % 9 = 0 THEN -1 ELSE zero_crossings END
      |    AS BIGINT) AS zero_crossings
      |FROM g""".stripMargin

  // MP4 sample-table frame index over SYNTHESIZED minimal MP4s:
  // ftyp + mdat (variable frame count/sizes from doc attributes) +
  // moov/trak/mdia(hdlr=vide)/minf/stbl with genuine stsz (per-sample
  // sizes), stsc (TWO chunk runs when nFrames > 2), and stco — or co64
  // on every 5th doc, so both offset widths parse. Every 7th doc gets
  // a NON-MP4 payload instead, exercising the fixed-stride fallback.
  // The oracle derives (frame_idx, byte_start, size, bytes)
  // independently from the same attribute math — any byte-layout error
  // in builder OR parser breaks the hash.
  private def he64(n: Column) = lpad(conv(n.cast("string"), 10, 16), 16, "0")

  private val mp4: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents").filter(col("text").isNotNull)
    val n = (lit(2) + pmod(col("doc_id"), lit(3))).cast("int") // 2..4 frames
    def sz(i: Int): Column = (lit(6) + pmod(col("doc_id") + i, lit(4))).cast("int")
    def frameHex(i: Int): Column =
      // pmod to match sz(i) above — '%' on a negative doc_id would emit
      // frame bytes shorter than the declared stsz sizes
      expr(s"substring(md5(concat(text, 'f$i')), 1, " +
        s"CAST((6 + pmod(doc_id + $i, 4)) * 2 AS INT))")
    val total = sz(0) + sz(1) +
      when(n >= 3, sz(2)).otherwise(lit(0)) +
      when(n >= 4, sz(3)).otherwise(lit(0))
    val mdatHex = concat(frameHex(0), frameHex(1),
      when(n >= 3, frameHex(2)).otherwise(lit("")),
      when(n >= 4, frameHex(3)).otherwise(lit("")))
    // chunking: chunk 1 = first 2 samples, chunk 2 = the rest (n > 2)
    val chunks = when(n > 2, lit(2)).otherwise(lit(1))
    val runs = chunks // one stsc run per chunk here
    val useCo64 = pmod(col("doc_id"), lit(5)) === 0
    val stszSize = lit(20) + n * 4
    val stscSize = lit(16) + runs * 12
    val stcoSize = lit(16) + when(useCo64, chunks * 8).otherwise(chunks * 4)
    val stblSize = lit(8) + stszSize + stscSize + stcoSize
    val minfSize = lit(8) + stblSize
    val mdiaSize = lit(8) + lit(33) + minfSize
    val trakSize = lit(8) + mdiaSize
    val moovSize = lit(8) + trakSize
    val stszHex = concat(he32(stszSize), lit("7374737A" + "00000000" + "00000000"),
      he32(n), he32(sz(0)), he32(sz(1)),
      when(n >= 3, he32(sz(2))).otherwise(lit("")),
      when(n >= 4, he32(sz(3))).otherwise(lit("")))
    val stscHex = concat(he32(stscSize), lit("73747363" + "00000000"), he32(runs),
      he32(lit(1)), he32(least(n, lit(2))), he32(lit(1)),
      when(n > 2, concat(he32(lit(2)), he32(n - 2), he32(lit(1)))).otherwise(lit("")))
    val chunk2Off = lit(24) + sz(0) + sz(1)
    val stcoHex = when(useCo64,
        concat(he32(stcoSize), lit("636F3634" + "00000000"), he32(chunks),
          he64(lit(24)),
          when(chunks === 2, he64(chunk2Off)).otherwise(lit(""))))
      .otherwise(
        concat(he32(stcoSize), lit("7374636F" + "00000000"), he32(chunks),
          he32(lit(24)),
          when(chunks === 2, he32(chunk2Off)).otherwise(lit(""))))
    val hdlrHex = lit("00000021" + "68646C72" + "00000000" + "00000000" +
      "76696465" + "00" * 12 + "00") // 33 bytes, handler 'vide'
    val moovHex = concat(he32(moovSize), lit("6D6F6F76"),
      he32(trakSize), lit("7472616B"),
      he32(mdiaSize), lit("6D646961"), hdlrHex,
      he32(minfSize), lit("6D696E66"),
      he32(stblSize), lit("7374626C"), stszHex, stscHex, stcoHex)
    val mp4Hex = concat(
      lit("00000010" + "66747970" + "69736F6D" + "00000000"),
      he32(lit(8) + total), lit("6D646174"), mdatHex,
      moovHex)
    // every 7th doc: a bare 16-byte payload → the stride fallback path
    val payloadHex = when(pmod(col("doc_id"), lit(7)) === 3, md5(col("text")))
      .otherwise(mp4Hex)
    Multimodal.frameSampleMp4(
        docs.select(col("doc_id"), unhex(payloadHex).as("payload")),
        "doc_id", "payload", every = 1, fallbackFrameBytes = 8)
      .select(col("doc_id"), col("frame_idx"), col("byte_start"),
        col("frame_size"), lower(hex(col("frame"))).as("frame_hex"),
        col("source"))
  }

  private val mp4Sql =
    """WITH f AS (
      |  SELECT doc_id, text,
      |    unnest(range(0, CASE WHEN doc_id % 7 = 3 THEN 2
      |                         ELSE 2 + doc_id % 3 END)) AS fi
      |  FROM documents WHERE text IS NOT NULL),
      |s AS (
      |  SELECT doc_id, text, CAST(fi AS INTEGER) AS frame_idx,
      |    doc_id % 7 = 3 AS stride,
      |    CAST(CASE WHEN doc_id % 7 = 3 THEN 8
      |              ELSE 6 + (doc_id + fi) % 4 END AS BIGINT) AS frame_size
      |  FROM f)
      |SELECT doc_id, frame_idx,
      |  CAST(CASE WHEN stride THEN frame_idx * 8
      |       ELSE 24 + COALESCE(SUM(frame_size) OVER (
      |         PARTITION BY doc_id ORDER BY frame_idx
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |       END AS BIGINT) AS byte_start,
      |  frame_size,
      |  CASE WHEN stride
      |    THEN substr(md5(text), frame_idx * 16 + 1, 16)
      |    ELSE substr(md5(text || 'f' || frame_idx), 1,
      |      CAST(frame_size * 2 AS INTEGER)) END AS frame_hex,
      |  CASE WHEN stride THEN 'stride' ELSE 'mp4' END AS source
      |FROM s""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("mm_binary_meta", meta, Some(metaSql)),
    Entry("mm_decode", decode, Some(decodeSql)),
    Entry("mm_resize_plan", resize, Some(resizeSql)),
    Entry("mm_frame_sample", frames, Some(framesSql)),
    Entry("mm_audio_meta", audio, Some(audioSql)),
    Entry("mm_audio_stats", audioStats, Some(audioStatsSql)),
    Entry("mm_mp4_index", mp4, Some(mp4Sql)),
  )
}
