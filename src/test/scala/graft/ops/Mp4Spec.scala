package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MP4 (ISO BMFF) sample-table parsing: golden hand-built containers,
  * both chunk-offset widths, multi-run stsc, non-video track skipping,
  * and the adversarial truncations/lying sizes every other sniffer in
  * [[Multimodal]] is pinned against.
  */
class Mp4Spec extends SparkSpec {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val ftyp = "00000010 66747970 69736F6D 00000000"
  // 15 payload bytes: sample0 = AA×4, sample1 = BB×5, sample2 = CC×6
  private val mdat = "00000017 6D646174 AAAAAAAA BBBBBBBBBB CCCCCCCCCCCC"
  private val hdlrVide = "00000021 68646C72 00000000 00000000 76696465" +
    "00" * 12 + "00"
  private val stszVar = "00000020 7374737A 00000000 00000000 00000003" +
    "00000004 00000005 00000006"
  // two runs: chunk 1 carries 2 samples, chunks ≥ 2 carry 1
  private val stscTwoRuns = "00000028 73747363 00000000 00000002" +
    "00000001 00000002 00000001" + "00000002 00000001 00000001"
  private val stcoTwo = "00000018 7374636F 00000000 00000002 00000018 00000021"

  private def boxed(size: Int, typeHex: String, bodyHex: String) =
    f"$size%08X" + typeHex + bodyHex

  /** Wrap stbl children into moov/trak/mdia(hdlr)/minf/stbl. */
  private def mp4Of(stblChildren: String, hdlr: String = hdlrVide,
      extraTrak: String = ""): Array[Byte] = {
    val stblBody = stblChildren.replaceAll("\\s", "")
    val stbl = boxed(8 + stblBody.length / 2, "7374626C", stblBody)
    val minf = boxed(8 + stbl.length / 2, "6D696E66", stbl)
    val h = hdlr.replaceAll("\\s", "")
    val mdia = boxed(8 + h.length / 2 + minf.length / 2, "6D646961", h + minf)
    val trak = boxed(8 + mdia.length / 2, "7472616B", mdia)
    val extra = extraTrak.replaceAll("\\s", "")
    val moov = boxed(8 + extra.length / 2 + trak.length / 2, "6D6F6F76",
      extra + trak)
    hex(ftyp + mdat + moov)
  }

  private val canonical = mp4Of(stszVar + stscTwoRuns + stcoTwo)

  test("mp4 sample table: stsz sizes + stsc runs + stco compose to (offset, size)") {
    val idx = Multimodal.mp4FrameIndex(canonical).get
    assert(idx.toSeq == Seq(
      Multimodal.Mp4Frame(0, 24L, 4L),
      Multimodal.Mp4Frame(1, 28L, 5L),
      Multimodal.Mp4Frame(2, 33L, 6L)))
  }

  test("mp4: co64 64-bit chunk offsets parse identically") {
    val co64 = "00000020 636F3634 00000000 00000002" +
      "0000000000000018" + "0000000000000021"
    val idx = Multimodal.mp4FrameIndex(mp4Of(stszVar + stscTwoRuns + co64)).get
    assert(idx.map(f => (f.offset, f.size)).toSeq == Seq((24L, 4L), (28L, 5L), (33L, 6L)))
  }

  test("mp4: fixed sample_size stsz (no per-sample list)") {
    val stszFixed = "00000014 7374737A 00000000 00000004 00000003"
    val stscOne = "0000001C 73747363 00000000 00000001 00000001 00000003 00000001"
    val stcoOne = "00000014 7374636F 00000000 00000001 00000018"
    val idx = Multimodal.mp4FrameIndex(mp4Of(stszFixed + stscOne + stcoOne)).get
    assert(idx.map(f => (f.offset, f.size)).toSeq ==
      Seq((24L, 4L), (28L, 4L), (32L, 4L)))
  }

  test("mp4: a non-video track is skipped; the vide track behind it is used") {
    // a sound trak with hdlr 'soun' and no stbl sits FIRST in moov
    val hdlrSoun = "00000021 68646C72 00000000 00000000 736F756E" +
      "00" * 12 + "00"
    val sounMdia = boxed(8 + hdlrSoun.replaceAll("\\s", "").length / 2,
      "6D646961", hdlrSoun.replaceAll("\\s", ""))
    val sounTrak = boxed(8 + sounMdia.length / 2, "7472616B", sounMdia)
    val idx = Multimodal.mp4FrameIndex(
      mp4Of(stszVar + stscTwoRuns + stcoTwo, extraTrak = sounTrak))
    assert(idx.get.length == 3)
  }

  test("mp4: adversarial inputs return None, never throw or hang") {
    val full = canonical
    // truncation at EVERY byte boundary must be survivable (either a
    // parse of a self-contained prefix or None — never an exception)
    (0 until full.length).foreach { cut =>
      Multimodal.mp4FrameIndex(java.util.Arrays.copyOfRange(full, 0, cut))
    }
    assert(Multimodal.mp4FrameIndex(null).isEmpty)
    assert(Multimodal.mp4FrameIndex(hex("00" * 40)).isEmpty)
    // no ftyp → not an MP4 (bare moov rejected)
    assert(Multimodal.mp4FrameIndex(
      java.util.Arrays.copyOfRange(full, 16, full.length)).isEmpty)
    // stsc runs that do not start at chunk 1 → None
    val badRun = "0000001C 73747363 00000000 00000001 00000002 00000001 00000001"
    assert(Multimodal.mp4FrameIndex(mp4Of(stszVar + badRun + stcoTwo)).isEmpty)
    // zero samples-per-chunk → None
    val zeroSpc = "0000001C 73747363 00000000 00000001 00000001 00000000 00000001"
    assert(Multimodal.mp4FrameIndex(mp4Of(stszVar + zeroSpc + stcoTwo)).isEmpty)
    // a lying 32-bit sample count cannot allocate: bounded by maxSamples
    val hugeCount = "00000014 7374737A 00000000 00000004 7FFFFFFF"
    val stscOne = "0000001C 73747363 00000000 00000001 00000001 00000003 00000001"
    assert(Multimodal.mp4FrameIndex(
      mp4Of(hugeCount + stscOne + stcoTwo)).isEmpty)
  }

  test("mp4: a corrupt FIRST vide track is None — no fallthrough to a later video track") {
    // trak 1: vide with a lying stsz count (unparseable); trak 2: the
    // canonical valid vide trak. The documented contract is FIRST
    // video track or None — returning trak 2's frames would hand the
    // caller offsets from the wrong track.
    val hugeCount = "00000014 7374737A 00000000 00000004 7FFFFFFF"
    val stscOne = "0000001C 73747363 00000000 00000001 00000001 00000003 00000001"
    val badStbl = (hugeCount + stscOne + stcoTwo).replaceAll("\\s", "")
    val stbl = boxed(8 + badStbl.length / 2, "7374626C", badStbl)
    val minf = boxed(8 + stbl.length / 2, "6D696E66", stbl)
    val h = hdlrVide.replaceAll("\\s", "")
    val mdia = boxed(8 + h.length / 2 + minf.length / 2, "6D646961", h + minf)
    val badVideTrak = boxed(8 + mdia.length / 2, "7472616B", mdia)
    assert(Multimodal.mp4FrameIndex(
      mp4Of(stszVar + stscTwoRuns + stcoTwo, extraTrak = badVideTrak)).isEmpty)
  }

  test("mp4: samples outrunning chunks is None (chunk walk can't place them)") {
    // 3 samples, ONE chunk declared, but the single stsc run carries
    // only 2 samples per chunk → sample 2 has no chunk
    val stscTwoPer = "0000001C 73747363 00000000 00000001 00000001 00000002 00000001"
    val stcoOne = "00000014 7374636F 00000000 00000001 00000018"
    assert(Multimodal.mp4FrameIndex(mp4Of(stszVar + stscTwoPer + stcoOne)).isEmpty)
  }

  test("frameSampleMp4: indexed rows, stride fallback, every/maxFrames, out-of-range slices") {
    val garbage = hex("00" * 16)
    val df = Seq((1L, canonical), (2L, garbage)).toDF("id", "payload")
    val out = Multimodal.frameSampleMp4(df, "id", "payload",
        every = 1, fallbackFrameBytes = 8)
      .orderBy("id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        Option(r.getAs[Array[Byte]](4)).map(_.toSeq), r.getString(5)))
    assert(out.toSeq == Seq(
      (1L, 0, 24L, 4L, Some(Seq.fill(4)(0xAA.toByte)), "mp4"),
      (1L, 1, 28L, 5L, Some(Seq.fill(5)(0xBB.toByte)), "mp4"),
      (1L, 2, 33L, 6L, Some(Seq.fill(6)(0xCC.toByte)), "mp4"),
      (2L, 0, 0L, 8L, Some(Seq.fill(8)(0x00.toByte)), "stride"),
      (2L, 1, 8L, 8L, Some(Seq.fill(8)(0x00.toByte)), "stride")))

    // fallback disabled → unparseable payloads vanish
    assert(Multimodal.frameSampleMp4(df, "id", "payload", every = 1)
      .filter(col("id") === 2).count() == 0)

    // every=2 keeps frames 0 and 2; maxFrames=1 keeps only frame 0
    val sampled = Multimodal.frameSampleMp4(df, "id", "payload", every = 2)
      .filter(col("id") === 1).select("frame_idx").as[Int].collect().sorted
    assert(sampled.toSeq == Seq(0, 2))
    assert(Multimodal.frameSampleMp4(df, "id", "payload", every = 1, maxFrames = 1)
      .filter(col("id") === 1).count() == 1)

    // offsets past the buffer (mdat stored elsewhere / prefix-only
    // payload): the index rows survive with NULL frames — same
    // declared-size trust stance as sniffWav
    val remoteMdat = mp4Of(stszVar + stscTwoRuns +
      "00000018 7374636F 00000000 00000002 00001000 00001010")
    val pOut = Multimodal.frameSampleMp4(
        Seq((9L, remoteMdat)).toDF("id", "payload"), "id", "payload")
      .orderBy("frame_idx")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.isNullAt(4)))
    assert(pOut.toSeq == Seq((0, 4096L, true), (1, 4100L, true), (2, 4112L, true)))
  }
}
