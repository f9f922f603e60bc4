package graft

import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, Similarity}

/** The four media operations (decode / frame-sample / resize /
  * feature-extract): codecs are stubbed, the Spark plumbing under test —
  * schemas, per-partition batching, 1:N fan-out, composition with the
  * similarity operators — is real. */
class MultimodalSpec extends SparkTestBase {
  import testImplicits._

  private def media = Multimodal.asBinary(
    Seq(
      (1L, "x" * 300),
      (2L, "x" * 300),  // byte-identical to doc 1
      (3L, "z" * 520),
      (4L, "")          // empty blob
    ).toDF("doc_id", "text"), "text")

  test("decodeMeta fallback: typed metadata, deterministic, null-safe") {
    val meta = Multimodal.decodeMeta(media, "doc_id", "media").collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes == 300 && meta(1L).format == "png")
    assert(meta(1L).width == meta(2L).width)
    assert(meta(4L).n_bytes == 0 && meta(4L).first_byte == 0)
  }

  // real container fixtures, built byte-for-byte from the specs
  private def pngBytes(width: Int, height: Int): Array[Byte] = {
    def u32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      u32(13) ++ "IHDR".getBytes("US-ASCII") ++
      u32(width.toLong) ++ u32(height.toLong) ++
      Array[Byte](8, 2, 0, 0, 0) ++ u32(0) // bit depth…interlace + (unchecked) CRC
  }
  private def jpegBytes(width: Int, height: Int): Array[Byte] = {
    def u16(v: Int) = Array((v >> 8).toByte, v.toByte)
    Array(0xff, 0xd8).map(_.toByte) ++                         // SOI
      Array(0xff, 0xe0).map(_.toByte) ++ u16(6) ++
      "JFIF".getBytes("US-ASCII") ++                           // APP0 to skip over
      Array(0xff, 0xc2).map(_.toByte) ++ u16(11) ++            // SOF2 (progressive)
      Array[Byte](8) ++ u16(height) ++ u16(width) ++
      Array[Byte](1, 1, 0x11, 0) ++
      Array(0xff, 0xd9).map(_.toByte)                          // EOI
  }

  test("decodeMeta parses real PNG IHDR and JPEG SOF headers") {
    val imgs = Seq(
      (10L, pngBytes(640, 480)),
      (11L, jpegBytes(1920, 1080)),
      (12L, "not an image at all".getBytes("US-ASCII"))
    ).toDF("doc_id", "media")
    val meta = Multimodal.decodeMeta(imgs, "doc_id", "media").collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta(10L).format == "png" && meta(10L).width == 640 && meta(10L).height == 480)
    assert(meta(11L).format == "jpeg" && meta(11L).width == 1920 && meta(11L).height == 1080)
    // non-image bytes take the deterministic fallback, never a mis-parse
    assert(meta(12L).width == meta(12L).n_bytes % 512 + 1)
  }

  private def gifBytes(width: Int, height: Int, sig: String = "GIF89a"): Array[Byte] = {
    def u16le(v: Int) = Array(v.toByte, (v >> 8).toByte)
    sig.getBytes("US-ASCII") ++ u16le(width) ++ u16le(height) ++
      Array[Byte](0, 0, 0) // packed fields, bg color, aspect ratio
  }
  private def u24le(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte)
  private def u32le(v: Long) =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def riff(chunk: String, payload: Array[Byte]): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ u32le(4 + 8 + payload.length) ++
      "WEBP".getBytes("US-ASCII") ++ chunk.getBytes("US-ASCII") ++
      u32le(payload.length) ++ payload
  private def webpVp8x(width: Int, height: Int): Array[Byte] =
    riff("VP8X", Array[Byte](0, 0, 0, 0) ++ u24le(width - 1L) ++ u24le(height - 1L))
  private def webpVp8(width: Int, height: Int): Array[Byte] =
    riff("VP8 ", Array[Byte](0, 0, 0) ++ // frame tag
      Array(0x9d, 0x01, 0x2a).map(_.toByte) ++
      Array(width.toByte, (width >> 8).toByte, height.toByte, (height >> 8).toByte))
  private def webpVp8l(width: Int, height: Int): Array[Byte] = {
    val bits = (width - 1L) | ((height - 1L) << 14)
    riff("VP8L", Array(0x2f.toByte) ++ u32le(bits))
  }

  test("decodeMeta parses real GIF and WebP (VP8/VP8L/VP8X) headers") {
    val imgs = Seq(
      (20L, gifBytes(320, 200)),
      (21L, gifBytes(12, 7, sig = "GIF87a")),
      (22L, webpVp8x(1024, 768)),
      (23L, webpVp8(800, 600)),
      (24L, webpVp8l(333, 77)),
      (25L, riff("ANMF", Array.fill(12)(0.toByte))) // RIFF/WEBP, unknown first chunk
    ).toDF("doc_id", "media")
    val meta = Multimodal.decodeMeta(imgs, "doc_id", "media").collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta(20L).format == "gif" && meta(20L).width == 320 && meta(20L).height == 200)
    assert(meta(21L).format == "gif" && meta(21L).width == 12 && meta(21L).height == 7)
    assert(meta(22L).format == "webp" && meta(22L).width == 1024 && meta(22L).height == 768)
    assert(meta(23L).format == "webp" && meta(23L).width == 800 && meta(23L).height == 600)
    assert(meta(24L).format == "webp" && meta(24L).width == 333 && meta(24L).height == 77)
    // unknown chunk type → fallback arm, never a mis-parse
    assert(meta(25L).width == meta(25L).n_bytes % 512 + 1)
  }

  test("parseImageHeader rejects truncated and desynced containers") {
    assert(Multimodal.parseImageHeader(null) == None)
    assert(Multimodal.parseImageHeader(pngBytes(9, 9).take(20)) == None)
    assert(Multimodal.parseImageHeader(jpegBytes(9, 9).take(6)) == None)
    // JPEG SOI followed by garbage (no FF marker alignment) → None
    assert(Multimodal.parseImageHeader(
      Array(0xff, 0xd8, 0x00, 0x01, 0x02, 0x03).map(_.toByte)) == None)
    assert(Multimodal.parseImageHeader(gifBytes(9, 9).take(8)) == None)
    assert(Multimodal.parseImageHeader(webpVp8(9, 9).take(24)) == None)
    // VP8 lossy without the 9D 01 2A start code → None
    val badVp8 = webpVp8(9, 9); badVp8(23) = 0
    assert(Multimodal.parseImageHeader(badVp8) == None)
  }

  test("frameSampleStub: 1:N fan-out with stride, inside the partition") {
    val frames = Multimodal.frameSampleStub(media, "doc_id", "media",
      frameBytes = 64, stride = 2).collect()
    val byDoc = frames.groupBy(_.doc_id)
    // doc 1: 300/64 = 4 frames, stride 2 → frames 0 and 2
    assert(byDoc(1L).map(_.frame_idx).sorted.toSeq == Seq(0L, 2L))
    assert(byDoc(1L).forall(_.frame.length == 64))
    // doc 3: 520/64 = 8 frames, stride 2 → 4 sampled
    assert(byDoc(3L).length == 4)
    // empty blob → no frames, no error
    assert(!byDoc.contains(4L))
  }

  test("featureExtractStub → Similarity: media embeddings drive ANN end-to-end") {
    val emb = Multimodal.featureExtractStub(media, "doc_id", "media", dim = 8)
      .toDF("vec_id", "embedding")
    val corpus = Similarity.withNorm(emb, "vec_id", "embedding")
      .filter(col("nrm") > 0) // empty blob has a zero vector
    val q = corpus.filter(col("vec_id") === 1L)
    val nn = Similarity.bruteForceTopK(corpus, q, k = 1).collect()
    // doc 2 is byte-identical to doc 1 → cosine exactly 1.0
    assert(nn.length == 1)
    assert(nn.head.getAs[Long]("neighbor_id") == 2L)
    assert(nn.head.getAs[Double]("cos") == 1.0)
  }

  test("parseWavHeader round-trips the canonical header wavHeader builds") {
    val hdr = Multimodal.wavHeader(
      sampleRate = 44100, channels = 2, bitsPerSample = 16, nSamples = 1000)
    assert(Multimodal.parseWavHeader(hdr).contains((44100L, 2L, 16L, 1000L)))
    // mono 8-bit: blockAlign 1
    val mono = Multimodal.wavHeader(8000, 1, 8, 123)
    assert(Multimodal.parseWavHeader(mono).contains((8000L, 1L, 8L, 123L)))
  }

  test("parseWavHeader walks past LIST metadata chunks to fmt/data") {
    val base = Multimodal.wavHeader(16000, 1, 16, 50)
    // splice a LIST chunk (tag + u32le size + payload) between WAVE and fmt
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII")
    val spliced = base.take(12) ++ list ++ base.drop(12)
    // RIFF size field is now stale, which real tooling tolerates; the
    // parser must still find fmt and data by the chunk walk
    assert(Multimodal.parseWavHeader(spliced).contains((16000L, 1L, 16L, 50L)))
  }

  test("parseWavHeader rejects non-WAV and truncated bytes") {
    assert(Multimodal.parseWavHeader(null).isEmpty)
    assert(Multimodal.parseWavHeader("RIFFxxxxAVI LIST".getBytes).isEmpty)
    assert(Multimodal.parseWavHeader(
      Multimodal.wavHeader(8000, 1, 16, 10).take(20)).isEmpty)
    // data chunk before any fmt chunk: no format info, must not guess.
    // 12-byte RIFF/WAVE preamble + 8-byte data chunk header declaring a
    // 24-byte payload + the payload = 44 bytes, past the length precheck
    // so the walk itself must hit the fmt-less data branch
    val dataFirst = "RIFF".getBytes("US-ASCII") ++ Array[Byte](36, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "data".getBytes("US-ASCII") ++
      Array[Byte](24, 0, 0, 0) ++ Array.fill(24)(0.toByte)
    assert(dataFirst.length == 44)
    assert(Multimodal.parseWavHeader(dataFirst).isEmpty)
    // a corrupt chunk size that would wrap a 32-bit cursor negative (or
    // stall it at zero advance) must classify as malformed, not hang
    val corrupt = "RIFF".getBytes("US-ASCII") ++ Array[Byte](36, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "junk".getBytes("US-ASCII") ++
      Array[Byte](-8, -1, -1, -1) ++ Array.fill(24)(0.toByte)
    assert(Multimodal.parseWavHeader(corrupt).isEmpty)
  }

  test("decodeAudioMeta: real parse for WAV, stub fallback elsewhere") {
    val rows = Seq(
      (1L, Multimodal.wavHeader(22050, 2, 16, 2205)),
      (2L, "not audio at all".getBytes)
    ).toDF("doc_id", "media")
    val out = Multimodal.decodeAudioMeta(rows, "doc_id", "media")
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).sample_rate == 22050L && out(1L).channels == 2L)
    assert(out(1L).n_samples == 2205L)
    assert(out(1L).duration_ms == 100L) // 2205 * 1000 / 22050 exactly
    assert(out(2L).sample_rate == 8000L) // honest deterministic fallback
  }

  test("parseFlacHeader round-trips flacHeader across the packed bit fields") {
    // edge values: 8-channel 32-bit at a rate needing all 20 bits,
    // and a 36-bit-straddling sample count
    val cases = Seq(
      (44100L, 2L, 16L, 441000L),
      ((1L << 20) - 1, 8L, 32L, (1L << 36) - 1),
      (8000L, 1L, 4L, 0L))
    cases.foreach { case (r, c, b, n) =>
      assert(Multimodal.parseFlacHeader(Multimodal.flacHeader(r, c, b, n))
        .contains((r, c, b, n)), s"round-trip failed for ($r,$c,$b,$n)")
    }
  }

  test("parseFlacHeader rejects non-FLAC, truncated, and misordered blocks") {
    assert(Multimodal.parseFlacHeader(null).isEmpty)
    assert(Multimodal.parseFlacHeader("fLaC".getBytes).isEmpty) // truncated
    assert(Multimodal.parseFlacHeader("not flac at all, but long enough to index"
      .getBytes).isEmpty)
    // first block is not STREAMINFO (type 4 = VORBIS_COMMENT): reject
    val wrongType = Multimodal.flacHeader(44100, 2, 16, 100)
    wrongType(4) = (0x80 | 4).toByte
    assert(Multimodal.parseFlacHeader(wrongType).isEmpty)
  }

  test("decodeAudioMeta: FLAC parses as real audio alongside WAV") {
    val rows = Seq(
      (1L, Multimodal.wavHeader(22050, 2, 16, 2205)),
      (2L, Multimodal.flacHeader(48000, 6, 24, 96000))
    ).toDF("doc_id", "media")
    val out = Multimodal.decodeAudioMeta(rows, "doc_id", "media")
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).sample_rate == 22050L)
    assert(out(2L).sample_rate == 48000L && out(2L).channels == 6L &&
      out(2L).bits_per_sample == 24L && out(2L).n_samples == 96000L &&
      out(2L).duration_ms == 2000L)
  }

  test("parseMp4Header round-trips mp4Header for both mvhd versions") {
    assert(Multimodal.parseMp4Header(
      Multimodal.mp4Header("isom", 600, 1200, version = 0))
      .contains(("isom", 600L, 1200L)))
    // v1: a duration only u64 can hold
    val big = 5_000_000_000L
    assert(Multimodal.parseMp4Header(
      Multimodal.mp4Header("mp42", 90000, big, version = 1))
      .contains(("mp42", 90000L, big)))
  }

  test("MP4 track walk: build→parse round trip, seek-table arithmetic, corrupt indices") {
    import Multimodal._
    val spec = Seq(
      Mp4TrackSpec(1, 320, 240, 90000, 620, Seq((3L, 100L), (2L, 160L)),
        Seq(1L, 3L, 5L)),
      Mp4TrackSpec(2, 0, 0, 8000, 448, Seq((7L, 64L)), Nil))
    val bytes = mp4WithTracks("isom", 600, 6000, spec)
    val parsed = parseMp4Tracks(bytes).get
    assert(parsed == Seq(
      Mp4Track(1, 320, 240, 90000, 620, Seq((3L, 100L), (2L, 160L)),
        Seq(1L, 3L, 5L)),
      Mp4Track(2, 0, 0, 8000, 448, Seq((7L, 64L)), Nil)))
    // the shallow walk agrees on the same skeleton
    assert(parseMp4Header(bytes).contains(("isom", 600L, 6000L)))

    // seek table: t(s) = Σ deltas of samples before s, across run bounds
    // (samples 1-3 at Δ100, 4-5 at Δ160 → t(1)=0, t(3)=200, t(5)=460)
    val kf = mp4KeyframeIndex(
      Seq((9L, bytes)).toDF("doc_id", "media"), "doc_id", "media")
      .collect().map(k => k.sample_number -> k.t_units).toMap
    assert(kf == Map(1L -> 0L, 3L -> 200L, 5L -> 460L))
    val tm = mp4TrackMeta(
      Seq((9L, bytes)).toDF("doc_id", "media"), "doc_id", "media")
      .collect().map(t => t.track_id ->
        (t.width, t.height, t.n_samples, t.total_units, t.n_keyframes)).toMap
    assert(tm == Map(
      1L -> ((320L, 240L, 5L, 620L, 3L)),
      2L -> ((0L, 0L, 7L, 448L, 0L))))

    // a sync sample beyond the sample count is dropped, not mis-timed
    val corruptSync = mp4WithTracks("isom", 600, 0, Seq(
      Mp4TrackSpec(1, 16, 16, 1000, 300, Seq((3L, 100L)), Seq(1L, 99L))))
    val kf2 = mp4KeyframeIndex(
      Seq((1L, corruptSync)).toDF("doc_id", "media"), "doc_id", "media")
      .collect().map(_.sample_number).toSeq
    assert(kf2 == Seq(1L))

    // a huge stss entry_count in a small box reads nothing (no throw,
    // track survives with zero keyframes)
    val evil = mp4WithTracks("isom", 600, 0, Seq(spec.head))
    val stssAt = {
      val s = new String(evil.map(b => (b & 0xff).toChar))
      s.indexOf("stss")
    }
    assert(stssAt > 0)
    evil(stssAt + 8) = 0x7f.toByte // entry_count high byte
    val survived = parseMp4Tracks(evil).get.head
    assert(survived.stss.isEmpty && survived.stts == spec.head.stts)
    // truncations never throw
    (0 to bytes.length by 7).foreach(cut => parseMp4Tracks(bytes.take(cut)))
  }

  test("MP4 sample map: stsz/stsc/stco resolve every sample's byte extent") {
    import Multimodal._
    // 7 samples over chunks of (3, 3, 1): stsc needs TWO runs — chunks
    // 1-2 take 3 samples, chunk 3 takes 1 (the real muxer tail shape)
    val sizes = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L)
    val spec = Mp4TrackSpec(1, 16, 16, 1000, 700, Seq((7L, 100L)), Nil,
      sampleSizes = sizes, stsc = Seq((1L, 3L), (3L, 1L)),
      chunkOffsets = Seq(1000L, 2000L, 3000L))
    val bytes = mp4WithTracks("isom", 600, 0, Seq(spec))
    val parsed = parseMp4Tracks(bytes).get.head
    assert(parsed.sampleSizes == sizes)
    assert(parsed.stsc == Seq((1L, 3L), (3L, 1L)))
    assert(parsed.chunkOffsets == Seq(1000L, 2000L, 3000L))
    val map = mp4SampleMap(
      Seq((5L, bytes)).toDF("doc_id", "media"), "doc_id", "media")
      .collect().map(s => s.sample_number -> (s.chunk_number, s.byte_offset, s.size))
      .toMap
    assert(map == Map(
      1L -> ((1L, 1000L, 10L)), 2L -> ((1L, 1010L, 20L)),
      3L -> ((1L, 1030L, 30L)), 4L -> ((2L, 2000L, 40L)),
      5L -> ((2L, 2040L, 50L)), 6L -> ((2L, 2090L, 60L)),
      7L -> ((3L, 3000L, 70L))))

    // inconsistent tables (stsz shorter than the chunks imply) drop the
    // whole track — no partially wrong seek map
    val bad = mp4WithTracks("isom", 600, 0, Seq(spec.copy(
      sampleSizes = sizes.take(5))))
    assert(mp4SampleMap(Seq((1L, bad)).toDF("doc_id", "media"),
      "doc_id", "media").collect().isEmpty)
    // and a track without the tables contributes nothing (q328 fixture)
    val plain = mp4WithTracks("isom", 600, 0,
      Seq(Mp4TrackSpec(1, 16, 16, 1000, 300, Seq((3L, 100L)), Seq(1L))))
    assert(mp4SampleMap(Seq((1L, plain)).toDF("doc_id", "media"),
      "doc_id", "media").collect().isEmpty)
  }

  test("TIFF: lossless ImageIO round trip, header dims both byte orders, hash collapse") {
    import Multimodal._
    val img = smooth(9, 7)
    val tiff = encodeTiff(img)
    // sniffer: dims from the IFD walk (ImageIO emits little-endian)
    assert(parseImageHeader(tiff).contains(("tiff", 9L, 7L)))
    // lossless: decode ∘ encode = identity on pixels (the q310 PNG law)
    val back = decodeImage(tiff).get
    assert(back.width == 9 && back.height == 7)
    assert(back.rgb.toSeq == img.rgb.toSeq)
    // big-endian header parse: hand-build an MM header with dims only
    val be = java.nio.ByteBuffer.allocate(8 + 2 + 24 + 4)
    be.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
      .putShort(2) // two IFD entries
      .putShort(256).putShort(3).putInt(1).putShort(640).putShort(0)
      .putShort(257).putShort(4).putInt(1).putInt(480)
      .putInt(0)
    assert(parseImageHeader(be.array()).contains(("tiff", 640L, 480L)))
    // same pixels as TIFF and PNG collapse to one aHash (q314's law)
    val hashes = imageAHash(
      Seq((1L, tiff), (2L, encodePng(img))).toDF("doc_id", "media"),
      "doc_id", "media").collect().map(_.ahash).toSet
    assert(hashes.size == 1, "TIFF and PNG of the same pixels hash apart")
    // corrupt: IFD offset past the end → None, no throw
    val evil = tiff.clone()
    if (evil(0) == 'I') { evil(4) = 0x7f.toByte; evil(5) = 0x7f.toByte }
    parseImageHeader(evil) // must not throw
    (0 to tiff.length by 13).foreach(cut => parseImageHeader(tiff.take(cut)))
  }

  test("FLAC codec: lossless round trip across signal shapes, frames, and predictors") {
    import Multimodal._
    def roundTrip(rate: Long, samples: Array[Short], block: Int = 4096): Unit = {
      val flac = flacEncode(rate, samples, block)
      val (r, out) = flacDecode(flac).get
      assert(r == rate)
      assert(out.toSeq == samples.toSeq,
        s"lossy at n=${samples.length}, block=$block")
    }
    // constant (order-1/2 zero residuals), ramp, alternating extremes,
    // pseudo-noise, negatives — and block sizes that force multi-frame
    // encodes with a short final frame
    roundTrip(8000L, Array.fill(100)(1234.toShort))
    roundTrip(44100L, Array.tabulate(300)(i => (i * 7 - 900).toShort), 64)
    roundTrip(16000L, Array.tabulate(257)(i =>
      (if (i % 2 == 0) Short.MaxValue else Short.MinValue)), 32)
    roundTrip(22050L, Array.tabulate(1000)(i =>
      ((i * 31 + (i * i) % 997) % 2003 - 1001).toShort), 128)
    roundTrip(8000L, Array[Short](-1, -2, -3))
    // compression is real on smooth signals: a ramp's order-2 residuals
    // are zeros, so FLAC must beat the raw 2-byte/sample payload
    val smoothSig = Array.tabulate(4000)(i => (i % 3000).toShort)
    assert(flacEncode(8000L, smoothSig).length < smoothSig.length * 2)

    // cross-codec collapse: the SAME samples through WAV and FLAC land
    // on identical stats/fingerprints (the q330/q331 law, locally)
    val sig = Array.tabulate(500)(i => ((i * 131) % 1999 - 999).toShort)
    val both = Seq((1L, pcm16Wav(8000L, sig)), (2L, flacEncode(8000L, sig, 100)))
      .toDF("doc_id", "media")
    val st = pcmStats(both, "doc_id", "media").collect()
      .map(s => (s.n_samples, s.peak, s.sum_abs, s.mean_sq)).toSet
    assert(st.size == 1, s"WAV and FLAC stats diverge: ${st.toSeq}")
    val fps = audioFingerprint(both, "doc_id", "media").collect().map(_.afp).toSet
    assert(fps.size == 1)

    // corrupt frame CRC-16 → whole-file None (no silent wrong samples)
    val flac = flacEncode(8000L, sig, 100)
    val bad = flac.clone(); bad(bad.length - 1) = (bad(bad.length - 1) ^ 1).toByte
    assert(flacDecode(bad).isEmpty)
    // header-only (no frames, n>0 promised) → None; truncations total
    assert(flacDecode(flacHeader(8000L, 1, 16, 10)).isEmpty)
    (0 to flac.length by 11).foreach(cut => flacDecode(flac.take(cut)))
    // stereo STREAMINFO: honest refusal
    assert(flacDecode(flacHeader(8000L, 2, 16, 0)).isEmpty)
  }

  test("FLAC coded frame number: full multi-byte form across the 36-bit range") {
    import Multimodal._
    // reference decode mirroring flacDecodeFrames' reader: lead-byte
    // class → continuation count, 6 payload bits per continuation
    def decode(bytes: Array[Byte]): Long = {
      val b0 = bytes(0) & 0xff
      val extra =
        if ((b0 & 0x80) == 0) 0
        else if ((b0 & 0xe0) == 0xc0) 1
        else if ((b0 & 0xf0) == 0xe0) 2
        else if ((b0 & 0xf8) == 0xf0) 3
        else if ((b0 & 0xfc) == 0xf8) 4
        else if ((b0 & 0xfe) == 0xfc) 5
        else if (b0 == 0xfe) 6
        else fail(s"invalid lead byte: $b0")
      assert(bytes.length == 1 + extra)
      val leadPayload =
        if (extra == 0) b0 & 0x7f else b0 & ((1 << (6 - extra)) - 1)
      bytes.drop(1).foldLeft(leadPayload.toLong) { (acc, b) =>
        assert((b & 0xc0) == 0x80, "bad continuation byte")
        (acc << 6) | (b & 0x3f)
      }
    }
    // boundary values of every byte-length class + interior samples;
    // the old writer silently corrupted everything >= 0x10000
    val cases = Seq(0L, 1L, 0x7fL, 0x80L, 0x7ffL, 0x800L, 0xffffL,
      0x10000L, 0x1fffffL, 0x200000L, 0x3ffffffL, 0x4000000L,
      0x7fffffffL, 0x80000000L, (1L << 36) - 1, 123456789012L % (1L << 36))
    cases.foreach { fn =>
      assert(decode(flacCodedNumberBytes(fn)) == fn, s"round trip failed at $fn")
    }
    // out of range: fail loudly, never emit an undecodable stream
    intercept[IllegalArgumentException](flacCodedNumberBytes(1L << 36))
    intercept[IllegalArgumentException](flacCodedNumberBytes(-1L))
    // fixed-blocksize strategy (what flacFrame writes) caps the FRAME
    // number at 31 bits (RFC 9639 §9.1.5) — the wire carries up to 36,
    // but external decoders may reject frames past 2^31; the writer must
    // refuse, not emit
    assert(decode(flacCodedNumberBytes((1L << 31) - 1, maxBits = 31))
      == (1L << 31) - 1)
    intercept[IllegalArgumentException](
      flacCodedNumberBytes(1L << 31, maxBits = 31))
  }

  test("FLAC stereo: all four channel assignments round-trip exactly; downmix ≡ WAV") {
    import Multimodal._
    val n = 500
    val left = Array.tabulate(n)(i => ((i * 131) % 1999 - 999).toShort)
    val right = Array.tabulate(n)(i => ((i * 37 + 7) % 1777 - 888).toShort)
    for (mode <- Seq("independent", "left-side", "right-side", "mid-side")) {
      val flac = flacEncodeStereo(16000L, left, right, 96, mode)
      val (rate, l, r) = flacDecodeStereo(flac).get
      assert(rate == 16000L)
      assert(l.toSeq == left.toSeq, s"left channel lossy under $mode")
      assert(r.toSeq == right.toSeq, s"right channel lossy under $mode")
      // the mono wrapper refuses stereo; the stereo wrapper is exact
      assert(flacDecode(flac).isEmpty)
    }
    // extremes through the decorrelated modes: the 17-bit side channel
    // must carry L−R spans up to ±65534 without wrap
    val lx = Array.tabulate(64)(i =>
      (if (i % 2 == 0) Short.MaxValue else Short.MinValue))
    val rx = Array.tabulate(64)(i =>
      (if (i % 2 == 0) Short.MinValue else Short.MaxValue))
    for (mode <- Seq("left-side", "right-side", "mid-side")) {
      val (_, l2, r2) = flacDecodeStereo(
        flacEncodeStereo(8000L, lx, rx, 32, mode)).get
      assert(l2.toSeq == lx.toSeq && r2.toSeq == rx.toSeq,
        s"extreme side channel lossy under $mode")
    }
    // downmix: FLAC stereo lands on exactly the WAV stereo answer
    val both = Seq(
      (1L, pcm16WavStereo(16000L, left, right)),
      (2L, flacEncodeStereo(16000L, left, right, 128, "mid-side")))
      .toDF("doc_id", "media")
    val mixed = pcmDownmix(both, "doc_id", "media").collect()
      .map(d => d.doc_id -> d.media.toSeq).toMap
    assert(mixed(1L) == mixed(2L),
      "downmix diverges between WAV and FLAC stereo")
    // mono FLAC refuses the stereo decode path and vice versa
    assert(flacDecodeStereo(flacEncode(8000L, left, 128)).isEmpty)
  }

  test("FLAC decoder: hand-crafted LPC subframe with 5-bit-rice residuals") {
    import Multimodal._
    // order-1 LPC, coefficient 1, shift 0 → prediction = previous sample,
    // numerically identical to FIXED order 1 — so expected output is easy
    // to state while the LPC/5-bit-rice decode paths do the work
    val samples = Array[Short](100, 110, 95, 130, 130, 90)
    val res = samples.toSeq.sliding(2).map(p => p(1) - p(0)).toSeq // 5 residuals
    val w = new java.io.ByteArrayOutputStream
    var cur = 0; var nb = 0
    def put(v: Long, n: Int): Unit = (n - 1 to 0 by -1).foreach { i =>
      cur = (cur << 1) | ((v >>> i) & 1L).toInt; nb += 1
      if (nb == 8) { w.write(cur); cur = 0; nb = 0 }
    }
    def putUnary(q: Long): Unit = { (0L until q).foreach(_ => put(0, 1)); put(1, 1) }
    def align(): Unit = if (nb > 0) put(0, 8 - nb)
    // frame header: sync, fixed strategy, blocksize=16-bit-at-end,
    // rate=STREAMINFO, mono, 16-bit, frame 0, blocksize-1
    put(0x3ffe, 14); put(0, 2); put(0x7, 4); put(0x0, 4)
    put(0x0, 4); put(0x4, 3); put(0, 1)
    put(0, 8) // frame number 0
    put(samples.length - 1L, 16)
    align()
    val headBytes = w.toByteArray
    // subframe: pad 0, type 100000 (LPC order 1), no wasted bits
    put(0, 1); put(0x20, 6); put(0, 1)
    put(samples(0).toLong & 0xffff, 16) // warmup
    put(3, 4) // precision-1 → 4-bit coefficients
    put(0, 5) // shift 0
    put(1, 4) // coefficient +1
    put(1, 2) // residual method 01: 5-bit rice
    put(0, 4) // partition order 0
    val k = 2
    put(k, 5)
    res.foreach { e =>
      val u = (e.toLong << 1) ^ (e.toLong >> 63)
      putUnary(u >>> k); put(u & ((1L << k) - 1), k)
    }
    align()
    val all = new java.io.ByteArrayOutputStream
    val streaminfo = flacHeader(8000L, 1, 16, samples.length.toLong)
    all.write(streaminfo)
    val frameNoCrc = w.toByteArray
    // splice the CRC-8 after the header bytes
    val crc8 = {
      var c = 0
      headBytes.foreach { b =>
        c ^= b & 0xff
        (0 until 8).foreach(_ => c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff)
      }
      c
    }
    val frame = headBytes ++ Array(crc8.toByte) ++ frameNoCrc.drop(headBytes.length)
    val crc16 = {
      var c = 0
      frame.foreach { b =>
        c ^= (b & 0xff) << 8
        (0 until 8).foreach(_ => c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff)
      }
      c
    }
    all.write(frame)
    all.write(crc16 >> 8); all.write(crc16 & 0xff)
    val decoded = flacDecode(all.toByteArray)
    assert(decoded.isDefined, "LPC frame did not decode")
    assert(decoded.get._2.toSeq == samples.toSeq)
  }

  test("parseMp3Header: syncsafe tag skip, version tables, reject bad sync/layer") {
    // mpeg1 idx 9 → 128 kbps, rate idx 0 → 44100; big tag exercises syncsafe
    assert(Multimodal.parseMp3Header(Multimodal.mp3Header(
      mpeg1 = true, bitrateIndex = 9, sampleRateIndex = 0, tagBytes = 300))
      .contains(("mpeg1", 3L, 128L, 44100L)))
    assert(Multimodal.parseMp3Header(Multimodal.mp3Header(
      mpeg1 = false, bitrateIndex = 14, sampleRateIndex = 2, tagBytes = 0))
      .contains(("mpeg2", 3L, 160L, 16000L)))
    assert(Multimodal.parseMp3Header(null).isEmpty)
    assert(Multimodal.parseMp3Header("no sync here at all".getBytes).isEmpty)
    // valid sync but Layer I (bits 11): honest refusal, not a wrong table
    val l1 = Multimodal.mp3Header(mpeg1 = true, 9, 0, 0)
    l1(11) = (l1(11) | 0x06).toByte
    assert(Multimodal.parseMp3Header(l1).isEmpty)
  }

  test("parseOpusHead: page walk to OpusHead, reject non-Ogg and truncated pages") {
    assert(Multimodal.parseOpusHead(Multimodal.opusHeader(6, 312, 48000))
      .contains((6L, 312L, 48000L)))
    assert(Multimodal.parseOpusHead(null).isEmpty)
    assert(Multimodal.parseOpusHead("OggS but then garbage that is long enough"
      .getBytes).isEmpty)
    assert(Multimodal.parseOpusHead(
      Multimodal.opusHeader(2, 0, 48000).take(30)).isEmpty)
  }

  test("parseMp4Header rejects corrupt boxes and non-BMFF bytes") {
    assert(Multimodal.parseMp4Header(null).isEmpty)
    assert(Multimodal.parseMp4Header("RIFF not bmff but plenty long".getBytes).isEmpty)
    // declared box size overruns the file: scan must stop, not crash
    val overrun = Multimodal.mp4Header("isom", 600, 1200)
    overrun(16) = 0x7f.toByte // moov size high byte → absurdly large
    assert(Multimodal.parseMp4Header(overrun).isEmpty)
    // ftyp alone (no moov/mvhd): structurally valid but incomplete
    assert(Multimodal.parseMp4Header(
      Multimodal.mp4Header("isom", 600, 0).take(16)).isEmpty)
  }

  test("imageAHash: identical content → identical hash at any resolution; near-dup differs in few bits") {
    import Multimodal.{DecodedImage, encodeBmp}
    // the same 2x2 gradient content upscaled to 16x16 and 24x24 must
    // sample to the same 8x8 grid → identical aHash
    def gradient(w: Int, h: Int, flipOne: Boolean): DecodedImage = {
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val v = if (x < w / 2 ^ y < h / 2) 200 else 20
        val vv = if (flipOne && x == 0 && y == 0) 255 else v
        val i = (y * w + x) * 3
        rgb(i) = vv.toByte; rgb(i + 1) = vv.toByte; rgb(i + 2) = vv.toByte
      }
      DecodedImage(w, h, rgb)
    }
    val df = Seq(
      (1L, encodeBmp(gradient(16, 16, flipOne = false))),
      (2L, encodeBmp(gradient(24, 24, flipOne = false))),
      (3L, encodeBmp(gradient(16, 16, flipOne = true))),
      (4L, "not an image".getBytes)).toDF("doc_id", "media")
    val hashes = Multimodal.imageAHash(df, "doc_id", "media")
      .collect().map(a => a.doc_id -> a.ahash).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L))
    assert(hashes(1L).length == 64 && hashes(1L).forall(c => c == '0' || c == '1'))
    assert(hashes(1L) == hashes(2L), "same content, different resolution")
    val hamming = hashes(1L).zip(hashes(3L)).count { case (a, b) => a != b }
    assert(hamming >= 1 && hamming <= 4, s"one flipped corner pixel ≈ 1 grid cell, got $hamming")
  }

  test("imageWHash: resolution-invariant, non-BMP dropped, DC bit reflects brightness") {
    import Multimodal.{DecodedImage, encodeBmp}
    def flat(w: Int, h: Int, v: Int): DecodedImage = {
      val rgb = Array.fill((w * h * 3))(v.toByte)
      DecodedImage(w, h, rgb)
    }
    def gradient(w: Int, h: Int): DecodedImage = {
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val v = if (x < w / 2) 200 else 20
        val i = (y * w + x) * 3
        rgb(i) = v.toByte; rgb(i + 1) = v.toByte; rgb(i + 2) = v.toByte
      }
      DecodedImage(w, h, rgb)
    }
    val df = Seq(
      (1L, encodeBmp(gradient(16, 16))),
      (2L, encodeBmp(gradient(24, 24))),   // same content, other resolution
      (3L, encodeBmp(flat(8, 8, 100))),    // flat bright: only DC positive
      (4L, "not an image".getBytes)).toDF("doc_id", "media")
    val hashes = Multimodal.imageWHash(df, "doc_id", "media")
      .collect().map(a => a.doc_id -> a.whash).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L))
    assert(hashes(1L) == hashes(2L), "same content, different resolution")
    // flat image: every non-DC Hadamard coefficient is exactly 0 (not >0)
    assert(hashes(3L).head == '1' && hashes(3L).tail.forall(_ == '0'),
      s"flat image must be DC-only: ${hashes(3L)}")
    // the left/right step excites x-frequency coefficients beyond DC
    assert(hashes(1L).count(_ == '1') > 1)
  }

  test("pcmStats: exact integer stats from a real PCM payload; non-PCM rejected") {
    val samples = Array[Short](0, 100, -200, 300, -1024, 1023)
    val df = Seq(
      (1L, Multimodal.pcm16Wav(8000L, samples)),
      (2L, Multimodal.wavHeader(8000L, 2, 16, 4)), // stereo header, no data
      (3L, "plain text".getBytes)).toDF("doc_id", "media")
    val out = Multimodal.pcmStats(df, "doc_id", "media")
      .collect().map(p => p.doc_id -> p).toMap
    assert(out.keySet == Set(1L))
    val p = out(1L)
    assert(p.n_samples == 6L)
    assert(p.peak == 1024L)
    assert(p.sum_abs == samples.map(s => math.abs(s.toLong)).sum)
    assert(p.mean_sq == samples.map(s => s.toLong * s).sum / 6)
  }

  test("Y4M: header parse, strided frame walk with exact luma stats, rejects") {
    import Multimodal.{parseY4mHeader, y4mFrameStats, y4mMono}
    val f0 = Array.fill(4 * 2)(10.toByte)
    val f1 = Array.tabulate(4 * 2)(i => (i * 20).toByte)
    val f2 = Array.fill(4 * 2)(200.toByte)
    val stream = y4mMono(4, 2, Seq(f0, f1, f2))
    assert(parseY4mHeader(stream).map(t => (t._1, t._2, t._3)) ==
      Some((4, 2, "mono")))
    val df = Seq(
      (1L, stream),
      (2L, "YUV4MPEG2 W0 H2 Cmono\n".getBytes),   // bad geometry
      (3L, "just text".getBytes)).toDF("doc_id", "media")
    // stride 2 keeps frames 0 and 2 only
    val out = y4mFrameStats(df, "doc_id", "media", stride = 2).collect()
      .map(s => (s.doc_id, s.frame_idx) -> (s.mean_y, s.peak_y)).toMap
    assert(out.keySet == Set((1L, 0L), (1L, 2L)))
    assert(out((1L, 0L)) == (10L, 10L))
    assert(out((1L, 2L)) == (200L, 200L))
    // stride 1 sees the gradient frame too: mean ⌊(0+20+..+140)/8⌋ = 70
    val all = y4mFrameStats(df, "doc_id", "media").collect()
      .map(s => s.frame_idx -> s.mean_y).toMap
    assert(all(1L) == 70L)
    // truncated payload: the incomplete trailing frame is not emitted
    val cut = y4mFrameStats(
      Seq((9L, stream.dropRight(3))).toDF("doc_id", "media"),
      "doc_id", "media").collect()
    assert(cut.map(_.frame_idx).toSet == Set(0L, 1L))
  }

  test("TAR: write/walk round trip, checksum gate, system-tar interop, rejects") {
    import Multimodal.{parseTarMembers, tarArchive}
    val members = Seq(
      "a/one.txt" -> "hello world".getBytes("US-ASCII"),
      "a/two.bin" -> Array.tabulate(700)(i => (i % 251).toByte), // >1 block
      "empty.txt" -> Array.empty[Byte])
    val tar = tarArchive(members)
    val back = parseTarMembers(tar)
    assert(back.map(_._1) == members.map(_._1))
    assert(back.zip(members).forall { case ((_, b), (_, exp)) =>
      b.sameElements(exp) })
    // a corrupted header checksum stops the walk at the corruption point
    val corrupt = tar.clone()
    corrupt(0) = 'x'.toByte // name change invalidates the checksum
    assert(parseTarMembers(corrupt).isEmpty)
    val corrupt2 = tar.clone()
    val secondHdr = 512 + 512 // after one-block member "a/one.txt"
    corrupt2(secondHdr) = 'x'.toByte
    assert(parseTarMembers(corrupt2).map(_._1) == Seq("a/one.txt"))
    assert(parseTarMembers("not a tar at all".getBytes).isEmpty)
    // interop: the REAL tar lists exactly our members (proves the ustar
    // layout, not just our own round trip)
    val f = java.nio.file.Files.createTempFile("graft-tar", ".tar")
    java.nio.file.Files.write(f, tar)
    try {
      val p = new ProcessBuilder("tar", "-tf", f.toString).start()
      val listed = new String(p.getInputStream.readAllBytes(), "US-ASCII")
        .linesIterator.toSeq
      if (p.waitFor() == 0)
        assert(listed == members.map(_._1), s"system tar disagrees: $listed")
    } catch { case _: java.io.IOException => () } // no tar binary: skip
    finally java.nio.file.Files.deleteIfExists(f)
  }

  test("gunzip: real DEFLATE round trip, magic gate, corrupt stream, size cap") {
    import Multimodal.gunzip
    val payload = ("some shard bytes " * 100).getBytes("US-ASCII")
    val gz = {
      val b = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.GZIPOutputStream(b)
      z.write(payload); z.close(); b.toByteArray
    }
    assert(gunzip(gz).get.sameElements(payload))
    assert(gunzip(payload).isEmpty)                 // no gzip magic
    assert(gunzip(gz.take(10)).isEmpty)             // truncated stream
    assert(gunzip(gz, maxBytes = 100).isEmpty)      // decompression bomb cap
    // tarMembers transparently walks a gzipped archive
    val tgz = {
      val b = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.GZIPOutputStream(b)
      z.write(Multimodal.tarArchive(Seq("m.txt" -> "hi".getBytes)))
      z.close(); b.toByteArray
    }
    val out = Multimodal.tarMembers(
      Seq((7L, tgz)).toDF("doc_id", "media"), "doc_id", "media").collect()
    assert(out.length == 1 && out.head.member_name == "m.txt" &&
      out.head.n_bytes == 2L)
  }

  test("ZIP: real INFLATE round trip, magic gate, bomb cap, sniffed by tarMembers") {
    import Multimodal.{parseZipMembers, zipArchive}
    val members = Seq(
      "s/a.txt" -> "alpha".getBytes("US-ASCII"),
      "s/b.bin" -> Array.tabulate(5000)(i => (i % 97).toByte))
    val zip = zipArchive(members)
    val back = parseZipMembers(zip)
    assert(back.map(_._1) == members.map(_._1))
    assert(back.zip(members).forall { case ((_, b), (_, e)) => b.sameElements(e) })
    assert(parseZipMembers("no archive here".getBytes).isEmpty)
    assert(parseZipMembers(zip, maxBytes = 100).size <= 1) // bomb cap
    // tarMembers sniffs PK and walks zip entries through the same path
    val out = Multimodal.tarMembers(
      Seq((3L, zip)).toDF("doc_id", "media"), "doc_id", "media")
      .collect().map(m => m.member_name -> m.n_bytes).toMap
    assert(out == Map("s/a.txt" -> 5L, "s/b.bin" -> 5000L))
  }

  test("BMP codec: encode/decode identity, padding, top-down rows, rejects") {
    import Multimodal.{DecodedImage, decodeBmp, encodeBmp}
    // 3x2 (row stride 9 → padded to 12): identity through the round trip
    val rgb = Array.tabulate(3 * 2 * 3)(i => ((i * 37 + 5) % 256).toByte)
    val img = DecodedImage(3, 2, rgb)
    val back = decodeBmp(encodeBmp(img)).get
    assert(back.width == 3 && back.height == 2)
    assert(back.rgb.sameElements(rgb))
    // top-down variant (negative height) decodes to the same raster
    val enc = encodeBmp(img)
    val topDown = enc.clone()
    // height = -2 as s32le at offset 22; rows must then be stored top-down,
    // so rebuild pixel data in top-down row order
    val rowBytes = (3 * 3 + 3) & ~3
    val bottomUpRows = (0 until 2).map(r => enc.slice(54 + r * rowBytes, 54 + (r + 1) * rowBytes))
    val swapped = bottomUpRows.reverse.flatten.toArray
    System.arraycopy(swapped, 0, topDown, 54, swapped.length)
    val neg = -2
    topDown(22) = (neg & 0xff).toByte; topDown(23) = ((neg >> 8) & 0xff).toByte
    topDown(24) = ((neg >> 16) & 0xff).toByte; topDown(25) = ((neg >> 24) & 0xff).toByte
    assert(decodeBmp(topDown).get.rgb.sameElements(rgb))
    // rejects: wrong magic, truncated pixel data, unsupported depth
    assert(decodeBmp("not a bitmap at all, just text".getBytes).isEmpty)
    assert(decodeBmp(enc.take(53)).isEmpty)
    assert(decodeBmp(enc.dropRight(1)).isEmpty)
    val depth16 = enc.clone(); depth16(28) = 16.toByte
    assert(decodeBmp(depth16).isEmpty)
  }

  test("resampleNearest: integer source sampling; imageFeatures exact means") {
    import Multimodal.{DecodedImage, resampleNearest}
    // 4x2 image downsampled to 2x1: output (x,0) samples source (2x, 0)
    val rgb = Array.tabulate(4 * 2 * 3)(i => (i + 1).toByte)
    val small = resampleNearest(DecodedImage(4, 2, rgb), 2, 1)
    assert(small.rgb.toSeq == Seq(rgb(0), rgb(1), rgb(2), rgb(6), rgb(7), rgb(8)))
    // upsample replicates pixels — 1x1 to 2x2
    val one = DecodedImage(1, 1, Array[Byte](10, 20, 30))
    assert(resampleNearest(one, 2, 2).rgb.toSeq ==
      Seq[Byte](10, 20, 30, 10, 20, 30, 10, 20, 30, 10, 20, 30))
    // imageFeatures: uniform image → means equal the pixel values; the
    // non-BMP row is dropped, the real BMP row survives
    val flat = DecodedImage(5, 4, Array.fill(5 * 4 * 3)(0.toByte))
    for (i <- 0 until 5 * 4) {
      flat.rgb(i * 3) = 100.toByte; flat.rgb(i * 3 + 1) = 150.toByte
      flat.rgb(i * 3 + 2) = 250.toByte
    }
    val df = Seq(
      (1L, Multimodal.encodeBmp(flat)),
      (2L, "plain text, not an image".getBytes)).toDF("doc_id", "media")
    val feats = Multimodal.imageFeatures(df, "doc_id", "media", 3, 3)
      .collect().map(f => f.doc_id -> (f.mean_r, f.mean_g, f.mean_b)).toMap
    assert(feats.keySet == Set(1L))
    assert(feats(1L) == ((100.0, 150.0, 250.0)))
    // resizeImage: BMP gets REAL pixels back out (decodable, right size)
    val resized = Multimodal.resizeImage(df, "doc_id", "media", 3, 3).collect()
      .map(r => r.doc_id -> r.media).toMap
    val r1 = Multimodal.decodeBmp(resized(1L)).get
    assert(r1.width == 3 && r1.height == 3)
    assert(r1.rgb.grouped(3).forall(px =>
      (px(0) & 0xff) == 100 && (px(1) & 0xff) == 150 && (px(2) & 0xff) == 250))
    assert(!resized.contains(2L)) // undecodable blobs DROP (honesty)
  }

  test("imageDHash: gradient bits, uniform-shift invariance, local-edit sensitivity") {
    import testImplicits._
    def bmp(id: Long, shift: Int, spike: Boolean): (Long, Array[Byte]) = {
      val w = 18; val h = 16
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val i = (y * w + x) * 3
        // values bounded so +shift never clamps
        val base = (7 * x + 3 * y) % 150
        val v = if (spike && x == 4) 200 else base + shift
        rgb(i) = v.toByte; rgb(i + 1) = v.toByte; rgb(i + 2) = v.toByte
      }
      (id, Multimodal.encodeBmp(Multimodal.DecodedImage(w, h, rgb)))
    }
    val df = Seq(bmp(1, 0, false), bmp(2, 40, false), bmp(3, 0, true))
      .toDF("doc_id", "media")
    val out = Multimodal.imageDHash(df, "doc_id", "media")
      .collect().map(d => d.doc_id -> d.dhash).toMap
    assert(out(1L).length == 64 && out(1L).exists(_ == '1') &&
      out(1L).exists(_ == '0'), "non-degenerate bit pattern")
    // adjacent-difference structure is invariant to a uniform shift
    assert(out(2L) == out(1L))
    // a bright column edit flips bits around it
    assert(out(3L) != out(1L))
    // undecodable input contributes no row
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
    assert(Multimodal.imageDHash(bad, "doc_id", "media").count() == 0)
  }

  test("pcmFrameStats: frame boundaries exact, short last frame, junk rejected") {
    import testImplicits._
    // 10 samples framed at 4 -> frames of 4, 4, 2
    val samples = Array[Short](10, -20, 30, -40, 5, 5, 5, 5, 100, -100)
    val df = Seq((1L, Multimodal.pcm16Wav(16000L, samples)))
      .toDF("doc_id", "media")
    val out = Multimodal.pcmFrameStats(df, "doc_id", "media", frameSize = 4)
      .collect().sortBy(_.frame_idx)
      .map(f => (f.frame_idx, f.n_samples, f.peak, f.sum_abs, f.energy))
    assert(out.toSeq == Seq(
      (0L, 4L, 40L, 100L, 100L + 400L + 900L + 1600L),
      (1L, 4L, 5L, 20L, 100L),
      (2L, 2L, 100L, 200L, 20000L)))
    // non-WAV bytes produce nothing
    val junk = Seq((2L, Array[Byte](0, 1, 2, 3, 4, 5, 6, 7)))
      .toDF("doc_id", "media")
    assert(Multimodal.pcmFrameStats(junk, "doc_id", "media", 4).count() == 0)
  }

  // ------------------------------------------------------------- ImageIO
  // Laws for the JDK-reader pixel path (decodeImageIO). PNG is lossless:
  // decode ∘ encode must be the identity on pixels (that exactness is
  // what q310's arithmetic oracle rides). JPEG decode is NOT
  // bit-specified across libraries, so its laws are tolerances: bounded
  // per-pixel error on re-encode, bounded hash flips across quality
  // levels, resolution invariance of the sampled hash grid.

  /** Smooth deterministic test image — JPEG-friendly (no hard edges, so
    * quality-level error stays small and hash bits stay put). */
  private def smooth(w: Int, h: Int): Multimodal.DecodedImage = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      rgb(i) = (40 + (160 * x) / w).toByte
      rgb(i + 1) = (40 + (160 * y) / h).toByte
      rgb(i + 2) = (40 + (80 * (x + y)) / (w + h)).toByte
    }
    Multimodal.DecodedImage(w, h, rgb)
  }

  test("PNG codec law: decodeImage ∘ encodePng = identity on pixels") {
    val img = smooth(23, 17) // odd dims exercise row strides
    val bytes = Multimodal.encodePng(img)
    // sniffs as a real PNG with the right canvas
    assert(Multimodal.parseImageHeader(bytes).contains(("png", 23L, 17L)))
    val back = Multimodal.decodeImage(bytes).get
    assert(back.width == 23 && back.height == 17)
    assert(back.rgb.sameElements(img.rgb), "PNG is lossless — exact pixels")
  }

  test("GIF decode: palette image round-trips through the JDK reader") {
    // few distinct colors → the GIF writer's palette holds them exactly
    val w = 16; val h = 12
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if ((x / 4 + y / 4) % 2 == 0) 220 else 30
      val i = (y * w + x) * 3
      rgb(i) = v.toByte; rgb(i + 1) = v.toByte; rgb(i + 2) = v.toByte
    }
    val img = Multimodal.DecodedImage(w, h, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(
      new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB) {
        for (y <- 0 until h; x <- 0 until w) {
          val i = (y * w + x) * 3
          setRGB(x, y, ((rgb(i) & 0xff) << 16) |
            ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
        }
      }, "gif", out)
    val bytes = out.toByteArray
    assert(Multimodal.parseImageHeader(bytes).exists(_._1 == "gif"))
    val back = Multimodal.decodeImage(bytes).get
    assert(back.width == w && back.height == h)
    assert(back.rgb.sameElements(img.rgb), "2-color GIF decodes exactly")
  }

  test("JPEG laws: bounded re-encode error, hash stability across quality, sniff gate") {
    val img = smooth(64, 48)
    val q90 = Multimodal.encodeJpeg(img, 0.9f)
    assert(Multimodal.parseImageHeader(q90).contains(("jpeg", 64L, 48L)))
    val back = Multimodal.decodeImage(q90).get
    assert(back.width == 64 && back.height == 48)
    // re-encode tolerance: smooth content at q90 stays within a tight
    // per-pixel band (JPEG error is bounded, not bit-exact)
    val maxErr = img.rgb.indices.map { i =>
      math.abs((img.rgb(i) & 0xff) - (back.rgb(i) & 0xff))
    }.max
    assert(maxErr <= 16, s"q90 smooth-gradient error should be small: $maxErr")

    // hash stability across quality levels: aHash/dHash flip at most a
    // few of 64 bits between q95 and q75 of the SAME image
    def hashes(bytes: Array[Byte]) = {
      val df = Seq((1L, bytes)).toDF("doc_id", "media")
      (Multimodal.imageAHash(df, "doc_id", "media").head().ahash,
        Multimodal.imageDHash(df, "doc_id", "media").head().dhash)
    }
    val (a95, d95) = hashes(Multimodal.encodeJpeg(img, 0.95f))
    val (a75, d75) = hashes(Multimodal.encodeJpeg(img, 0.75f))
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(hamming(a95, a75) <= 6, s"aHash across quality: ${hamming(a95, a75)} bits")
    assert(hamming(d95, d75) <= 6, s"dHash across quality: ${hamming(d95, d75)} bits")

    // resolution invariance: the same content JPEG'd at 2x resolution
    // lands within a few bits of the base hash (sampling grid dominates)
    val (aBig, _) = hashes(Multimodal.encodeJpeg(smooth(128, 96), 0.9f))
    val (aBase, _) = hashes(q90)
    assert(hamming(aBig, aBase) <= 6, s"aHash across resolution: ${hamming(aBig, aBase)}")
  }

  test("decodeImageIO: refuses junk, truncation, and WebP; caps the canvas") {
    assert(Multimodal.decodeImageIO(null).isEmpty)
    assert(Multimodal.decodeImageIO("plain text".getBytes).isEmpty)
    // a real PNG truncated mid-stream must return None, not throw
    val png = Multimodal.encodePng(smooth(32, 32))
    assert(Multimodal.decodeImageIO(png.take(png.length / 2)).isEmpty)
    // WebP has no JDK reader — refused at the sniff, never probed
    val vp8x = {
      def u24le(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte)
      val payload = "WEBP".getBytes ++ "VP8X".getBytes ++
        Array.fill(8)(0.toByte) ++ u24le(15) ++ u24le(15) ++ Array.fill(2)(0.toByte)
      "RIFF".getBytes ++ Array[Byte](
        (payload.length & 0xff).toByte, 0, 0, 0) ++ payload
    }
    assert(Multimodal.parseImageHeader(vp8x).exists(_._1 == "webp"))
    assert(Multimodal.decodeImageIO(vp8x).isEmpty)
    // a PNG whose IHDR claims a >64 MPix canvas is rejected from the
    // header, before any pixel allocation (decompression-bomb guard):
    // doctor the canvas fields of a real PNG — the reader reads
    // dimensions from IHDR without validating the CRC first
    val bomb = png.clone()
    def putU32(off: Int, v: Long): Unit = {
      bomb(off) = (v >> 24).toByte; bomb(off + 1) = (v >> 16).toByte
      bomb(off + 2) = (v >> 8).toByte; bomb(off + 3) = v.toByte
    }
    putU32(16, 1 << 14); putU32(20, 1 << 14) // 268 MPix claimed
    assert(Multimodal.decodeImageIO(bomb).isEmpty)
  }

  test("AVI-MJPEG: writer/parser round trip, honesty gate, malformed rejects") {
    val frames = Seq(
      "first frame payload".getBytes,   // odd length → exercises padding
      "second".getBytes,
      "third frame".getBytes)
    val avi = Multimodal.aviMjpeg(64, 48, frames)
    val (w, h, back) = Multimodal.parseAviMjpegFrames(avi).get
    assert(w == 64 && h == 48 && back.length == 3)
    frames.zip(back).foreach { case (a, b) => assert(a.sameElements(b)) }
    // non-MJPG vids stream refused: flip the strh handler and strf codec
    val notMjpg = avi.clone()
    def patch(needle: String, repl: String): Unit = {
      val n = needle.getBytes("US-ASCII")
      val idx = notMjpg.indices.find(i => i + n.length <= notMjpg.length &&
        n.indices.forall(j => notMjpg(i + j) == n(j)))
      idx.foreach(i => repl.getBytes("US-ASCII").zipWithIndex
        .foreach { case (b, j) => notMjpg(i + j) = b })
    }
    patch("MJPG", "H264"); patch("MJPG", "H264")
    assert(Multimodal.parseAviMjpegFrames(notMjpg).isEmpty,
      "a non-MJPG stream must be refused, not mis-demuxed")
    // junk, truncation, and a RIFF that is not AVI
    assert(Multimodal.parseAviMjpegFrames(null).isEmpty)
    assert(Multimodal.parseAviMjpegFrames("not a container".getBytes).isEmpty)
    assert(Multimodal.parseAviMjpegFrames(avi.take(40)).isEmpty)
    assert(Multimodal.parseAviMjpegFrames(
      Multimodal.pcm16Wav(8000L, Array[Short](1, 2, 3))).isEmpty)
  }

  test("frameSample: real AVI demux with stride, Y4M plane walk, stub fallback") {
    val frames = (0 until 5).map(i => s"frame-$i-payload".getBytes.asInstanceOf[Array[Byte]])
    val y4m = Multimodal.y4mMono(4, 3, Seq(
      Array.fill(12)(10.toByte), Array.fill(12)(20.toByte), Array.fill(12)(30.toByte)))
    val df = Seq(
      (1L, Multimodal.aviMjpeg(16, 16, frames)),
      (2L, y4m),
      (3L, Array.fill(256)(7.toByte))).toDF("doc_id", "media")
    val out = Multimodal.frameSample(df, "doc_id", "media", frameBytes = 64, stride = 2)
      .collect().groupBy(_.doc_id)
    // AVI: frames 0, 2, 4 with exact payloads
    val avi = out(1L).sortBy(_.frame_idx)
    assert(avi.map(_.frame_idx).toSeq == Seq(0L, 2L, 4L))
    assert(avi(1).frame.sameElements(frames(2)))
    // Y4M mono: planes 0 and 2, raw luma bytes
    val y = out(2L).sortBy(_.frame_idx)
    assert(y.map(_.frame_idx).toSeq == Seq(0L, 2L))
    assert(y(0).frame.forall(_ == 10.toByte) && y(0).frame.length == 12)
    assert(y(1).frame.forall(_ == 30.toByte))
    // unknown container: documented stub slicing (256/64 = 4 frames, stride 2)
    assert(out(3L).map(_.frame_idx).sorted.toSeq == Seq(0L, 2L))
  }

  test("mjpegFrameStats: end-to-end video pixels — demux + JPEG decode per frame") {
    // three REAL JPEG frames of distinct brightness; per-frame means must
    // track the source brightness within JPEG tolerance
    def flat(v: Int) = {
      val rgb = Array.fill(32 * 24 * 3)(v.toByte)
      Multimodal.DecodedImage(32, 24, rgb)
    }
    val jpegs = Seq(60, 120, 200).map(v => Multimodal.encodeJpeg(flat(v), 0.9f))
    val df = Seq((9L, Multimodal.aviMjpeg(32, 24, jpegs))).toDF("doc_id", "media")
    val stats = Multimodal.mjpegFrameStats(df, "doc_id", "media")
      .collect().sortBy(_.frame_idx)
    assert(stats.length == 3)
    assert(stats.forall(s => s.width == 32 && s.height == 24))
    stats.zip(Seq(60, 120, 200)).foreach { case (s, v) =>
      assert(math.abs(s.mean_r - v) <= 3.0 &&
        math.abs(s.mean_g - v) <= 3.0 && math.abs(s.mean_b - v) <= 3.0,
        s"frame ${s.frame_idx} mean (${s.mean_r},${s.mean_g},${s.mean_b}) vs $v")
    }
    // stride keeps every other frame
    assert(Multimodal.mjpegFrameStats(df, "doc_id", "media", stride = 2)
      .collect().map(_.frame_idx).sorted.toSeq == Seq(0L, 2L))
  }

  test("imageEmbedding: exact integer dims, cross-codec equality, undecodable dropped") {
    val img = smooth(17, 13)
    val df = Seq(
      (1L, Multimodal.encodeBmp(img)),
      (2L, Multimodal.encodePng(img)),
      (3L, "not an image".getBytes)).toDF("doc_id", "media")
    val embs = Multimodal.imageEmbedding(df, "doc_id", "media", grid = 4)
      .collect().map(e => e.doc_id -> e.embedding).toMap
    assert(embs.keySet == Set(1L, 2L), "undecodable blobs must be dropped")
    assert(embs(1L).length == 48)
    assert(embs(1L).forall(v => v == v.floor && v >= 0f && v <= 255f),
      "every dimension is an exact integer 0-255")
    assert(embs(1L).sameElements(embs(2L)),
      "the same pixels through BMP and PNG must embed identically")
    // dims are the resampled cells, row-major r/g/b
    val r = Multimodal.resampleNearest(img, 4, 4)
    assert(embs(1L).sameElements(r.rgb.map(b => (b & 0xff).toFloat)))
  }

  test("audioFingerprint: duration invariance, local-edit sensitivity, rejects") {
    val base = Array.tabulate(320)(i => (((i * 37) % 1600) - 800).toShort)
    // same envelope at 2x duration: every sample repeated twice buckets
    // into the same 64 frames with identical integer means
    val doubled = base.flatMap(s => Array(s, s))
    // a click at the head flips only the frame-0 bit neighborhood
    val clicked = base.clone(); clicked(0) = (clicked(0) + 900).toShort
    val df = Seq(
      (1L, Multimodal.pcm16Wav(16000L, base)),
      (2L, Multimodal.pcm16Wav(16000L, doubled)),
      (3L, Multimodal.pcm16Wav(16000L, clicked)),
      (4L, "not audio".getBytes),
      (5L, Multimodal.pcm16Wav(16000L, Array.tabulate(10)(_.toShort))))
      .toDF("doc_id", "media")
    val fps = Multimodal.audioFingerprint(df, "doc_id", "media")
      .collect().map(f => f.doc_id -> f.afp).toMap
    assert(fps.keySet == Set(1L, 2L, 3L),
      "junk and sub-64-sample blobs must be dropped")
    assert(fps(1L).length == 64 && fps(1L).forall(c => c == '0' || c == '1'))
    assert(fps(1L) == fps(2L), "same envelope at 2x duration must collapse")
    val hamming = fps(1L).zip(fps(3L)).count { case (a, b) => a != b }
    assert(hamming >= 1 && hamming <= 6,
      s"a single click is a near-dup, not a different recording: $hamming")
  }

  test("pcmResample/pcmTrimSilence: real WAV round trips, edge semantics, rejects") {
    val base = Array[Short](0, 0, 0, 100, -200, 0, 300, 0, 0)
    val wav = Multimodal.pcm16Wav(8000L, base)
    val df = Seq((1L, wav), (2L, "junk".getBytes),
      (3L, Multimodal.pcm16Wav(8000L, Array[Short](0, 0, 0))))
      .toDF("doc_id", "media")
    // trim at 0: head 3 zeros, tail 2 zeros, keep [100,-200,0,300]
    val tr = Multimodal.pcmTrimSilence(df, "doc_id", "media", 0L).collect()
    assert(tr.map(_.doc_id).toSet == Set(1L),
      "junk and fully-silent clips must be dropped")
    val t = tr.head
    assert(t.n_samples == 4L && t.n_trimmed_head == 3L && t.n_trimmed_tail == 2L)
    // the trimmed payload is a REAL WAV carrying exactly the kept samples
    val st = Multimodal.pcmStats(
      Seq((1L, t.media)).toDF("doc_id", "media"), "doc_id", "media").head()
    assert(st.n_samples == 4L && st.peak == 300L && st.sum_abs == 600L)
    // interior silence is preserved — trim touches only head/tail
    assert(st.mean_sq == (100L * 100 + 200L * 200 + 0L + 300L * 300) / 4)

    // resample: upsample 4 -> 8 repeats each sample twice (j*4/8 = j/2)
    val up = Multimodal.pcmResample(
      Seq((1L, Multimodal.pcm16Wav(8000L, Array[Short](10, -20, 30, -40))))
        .toDF("doc_id", "media"), "doc_id", "media", targetN = 8).head()
    assert(up.n_samples == 8L)
    val upStats = Multimodal.pcmStats(
      Seq((1L, up.media)).toDF("doc_id", "media"), "doc_id", "media").head()
    assert(upStats.n_samples == 8L && upStats.sum_abs == 2L * (10 + 20 + 30 + 40))
    // downsample 4 -> 2 keeps samples 0 and 2
    val down = Multimodal.pcmResample(
      Seq((1L, Multimodal.pcm16Wav(8000L, Array[Short](10, -20, 30, -40))))
        .toDF("doc_id", "media"), "doc_id", "media", targetN = 2).head()
    val downStats = Multimodal.pcmStats(
      Seq((1L, down.media)).toDF("doc_id", "media"), "doc_id", "media").head()
    assert(downStats.sum_abs == 40L && downStats.peak == 30L)
  }

  test("EXIF: APP1 round trip, orientation algebra, oriented decode, rejects") {
    import Multimodal.{DecodedImage, orientImage}
    val img = smooth(7, 5) // asymmetric dims catch any w/h mixup
    // APP1 write → parse round trip for all 8 values, on a REAL JPEG
    for (o <- 1 to 8) {
      val bytes = Multimodal.jpegWithExif(img, o)
      assert(Multimodal.parseExifOrientation(bytes).contains(o))
      // still a valid JPEG after the splice
      assert(Multimodal.decodeImage(bytes).isDefined)
      assert(Multimodal.parseImageHeader(bytes).exists(_._1 == "jpeg"))
    }
    // no EXIF → None; junk → None; PNG → None
    assert(Multimodal.parseExifOrientation(Multimodal.encodeJpeg(img)).isEmpty)
    assert(Multimodal.parseExifOrientation("junk".getBytes).isEmpty)
    assert(Multimodal.parseExifOrientation(Multimodal.encodePng(img)).isEmpty)

    // adversarial: an IFD0 offset >= 2^31 must stay in Long inside the
    // parser — a .toInt wrap would turn it negative, slip past the
    // upper-bound guard, and index the array at a negative offset.
    // jpegWithExif layout: SOI(2) + APP1 marker/len(4) + "Exif\0\0"(6)
    // puts the TIFF base at byte 12; the u32 IFD0 offset is at base+4.
    val evil = Multimodal.jpegWithExif(img, 1)
    evil(16) = 0xff.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xf0.toByte
    assert(Multimodal.parseExifOrientation(evil).isEmpty) // no AIOOBE

    // orientation algebra on exact pixels
    def px(i: DecodedImage, x: Int, y: Int): (Byte, Byte, Byte) = {
      val s = (y * i.width + x) * 3
      (i.rgb(s), i.rgb(s + 1), i.rgb(s + 2))
    }
    val r90 = orientImage(img, 6)
    assert(r90.width == 5 && r90.height == 7)
    // rotate 90 CW: source (x, y) lands at (h-1-y, x)
    assert(px(r90, 4, 0) == px(img, 0, 0))
    val r180 = orientImage(img, 3)
    assert(px(r180, 6, 4) == px(img, 0, 0))
    // inverses: 6 (90 CW) then 8 (90 CCW) = identity; 3∘3 = identity;
    // every transform is a bijection that self-inverts or pairs up
    assert(orientImage(r90, 8).rgb.sameElements(img.rgb))
    assert(orientImage(r180, 3).rgb.sameElements(img.rgb))
    assert(orientImage(orientImage(img, 2), 2).rgb.sameElements(img.rgb))
    assert(orientImage(orientImage(img, 5), 5).rgb.sameElements(img.rgb))

    // oriented decode: a 90CW-tagged JPEG lands upright (dims swapped)
    val tagged = Multimodal.jpegWithExif(img, 6)
    val up = Multimodal.decodeImageOriented(tagged).get
    assert(up.width == 5 && up.height == 7)
    // untagged blobs pass through the plain decode
    val plain = Multimodal.decodeImageOriented(Multimodal.encodePng(img)).get
    assert(plain.width == 7 && plain.height == 5)
  }

  test("pcmDownmix: exact stereo mix, truncating negatives, routing honesty") {
    val left = Array[Short](100, -3, 0, 32767)
    val right = Array[Short](200, 0, -5, 32767)
    val df = Seq(
      (1L, Multimodal.pcm16WavStereo(8000L, left, right)),
      (2L, Multimodal.pcm16Wav(8000L, left)), // mono: not downmixable
      (3L, "junk".getBytes)).toDF("doc_id", "media")
    val out = Multimodal.pcmDownmix(df, "doc_id", "media").collect()
    assert(out.map(_.doc_id).toSet == Set(1L),
      "mono and junk must be dropped — route on channel count")
    // (L+R)/2 truncating: 150, -1 (not -2), -2, 32767
    val st = Multimodal.pcmStats(
      Seq((1L, out.head.media)).toDF("doc_id", "media"), "doc_id", "media")
      .head()
    assert(st.n_samples == 4L && st.peak == 32767L)
    assert(st.sum_abs == 150L + 1L + 2L + 32767L)
  }

  test("imageHashes: the fused pass is bit-identical to the three standalone ops") {
    val imgs = Seq(
      (1L, Multimodal.encodeBmp(smooth(17, 11))),
      (2L, Multimodal.encodePng(smooth(24, 16))),
      (3L, "not an image".getBytes)).toDF("doc_id", "media")
    val fused = Multimodal.imageHashes(imgs, "doc_id", "media")
      .collect().map(h => h.doc_id -> (h.ahash, h.dhash, h.whash)).toMap
    assert(fused.keySet == Set(1L, 2L))
    val a = Multimodal.imageAHash(imgs, "doc_id", "media")
      .collect().map(h => h.doc_id -> h.ahash).toMap
    val d = Multimodal.imageDHash(imgs, "doc_id", "media")
      .collect().map(h => h.doc_id -> h.dhash).toMap
    val w = Multimodal.imageWHash(imgs, "doc_id", "media")
      .collect().map(h => h.doc_id -> h.whash).toMap
    fused.foreach { case (id, (fa, fd, fw)) =>
      assert(fa == a(id) && fd == d(id) && fw == w(id),
        s"fused hashes diverge from standalone ops for doc $id")
    }
  }

  test("imageFeatures rides the ImageIO path: PNG means match the BMP means") {
    val img = smooth(40, 30)
    val df = Seq(
      (1L, Multimodal.encodeBmp(img)),
      (2L, Multimodal.encodePng(img))).toDF("doc_id", "media")
    val rows = Multimodal.imageFeatures(df, "doc_id", "media", 8, 8)
      .collect().map(f => f.doc_id -> (f.mean_r, f.mean_g, f.mean_b)).toMap
    assert(rows(1L) == rows(2L),
      "the same pixels through BMP and PNG must produce identical features")
  }
}
