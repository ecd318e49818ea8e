package graft

import graft.operators.Multimodal
import graft.tools.MakeMediaFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal operators over the COMMITTED true-binary fixture
  * (src/test/resources/media_fixture.parquet): payloads include an empty
  * array, NUL, all-0xFF, and invalid UTF-8 — none of which survive a
  * string round-trip, so these tests pin that the whole path stays
  * byte-level. Expected values are recomputed from the fixture
  * generator's deterministic byte streams, which also verifies the
  * committed file hasn't drifted from the generator.
  */
class MultimodalFixtureSpec extends AnyFunSuite {
  lazy val spark = Tables.session(4)

  private val fixturePath = "src/test/resources/media_fixture.parquet"
  private lazy val fixture = spark.read.parquet(fixturePath).cache()
  private lazy val expected = MakeMediaFixture.rows.map(r => r._1 -> r).toMap
  // operator tests compute expectations from the COMMITTED payload bytes
  // (fixture integrity is the first test's job) — so they stay valid even
  // if a future JDK's PNG encoder emits different-but-equivalent bytes
  private lazy val committed: Map[Long, Array[Byte]] =
    fixture.orderBy("media_id").collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("bytes")).toMap

  private def sha256(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map("%02x".format(_)).mkString

  test("committed fixture matches its deterministic generator (20 rows, true binary)") {
    val got = fixture.orderBy("media_id").collect()
    assert(got.length == 20)
    got.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val (_, mime, bytes) = expected(id)
      assert(r.getAs[String]("mime") == mime)
      if (id < 16)
        assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("bytes"), bytes),
          s"payload drift at media_id $id")
      else {
        // PNG rows: encoded bytes are NOT spec-stable across JDK encoders,
        // but decode is lossless — integrity means the committed bytes
        // decode to exactly the generator's pixel formula
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bytes")))
        val want = MakeMediaFixture.pngImage(id.toInt)
        assert(img != null, s"PNG row $id no longer decodes")
        assert(img.getWidth == want.getWidth && img.getHeight == want.getHeight,
          s"PNG row $id dimensions drifted")
        val drift = (for (y <- 0 until want.getHeight; x <- 0 until want.getWidth)
          yield (img.getRGB(x, y) & 0xffffff) == (want.getRGB(x, y) & 0xffffff))
          .count(!_)
        assert(drift == 0, s"PNG row $id: $drift pixels drifted from the generator formula")
      }
    }
    // non-UTF8 coverage: several payloads must fail strict UTF-8 decoding
    def validUtf8(b: Array[Byte]): Boolean =
      try {
        java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .decode(java.nio.ByteBuffer.wrap(b)); true
      } catch { case _: java.nio.charset.CharacterCodingException => false }
    val invalid = got.map(_.getAs[Array[Byte]]("bytes")).count(b => !validUtf8(b))
    assert(invalid >= 2, s"fixture must contain non-UTF8 payloads (got $invalid)")
  }

  test("binarize metadata is byte-exact on non-UTF8 payloads") {
    val meta = Multimodal.binarize(fixture, "media_id", "bytes", mime = "x/fixture")
      .select(col("media_id"), col("media_meta.n_bytes").as("n"),
        col("media_meta.sha256").as("sha"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    committed.foreach { case (id, bytes) =>
      assert(meta(id)._1 == bytes.length, s"n_bytes wrong for $id")
      assert(meta(id)._2 == sha256(bytes), s"sha256 wrong for $id")
    }
  }

  test("decodeFeatures runs the codec stub on raw bytes (empty -> zeros)") {
    val feats = Multimodal.decodeFeatures(fixture, "media_id", "bytes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    committed.foreach { case (id, bytes) =>
      val want = Multimodal.FakeCodec.decode(bytes).toSeq
      assert(feats(id) == want, s"features diverge for $id")
    }
    assert(feats(0L).forall(_ == 0.0))
    // 0xFF byte must reach the feature unmangled: 255/255 = 1.0
    assert(feats(2L).forall(_ == 1.0))
  }

  test("resizeBytes preserves byte values >= 0x80 (no UTF-8 mangling)") {
    val resized = Multimodal.resizeBytes(fixture, "media_id", "bytes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    committed.foreach { case (id, bytes) =>
      val want = (0 until 16).map { i =>
        if (bytes.isEmpty) 0
        else bytes((i * bytes.length) / 16) & 0xff
      }
      assert(resized(id) == want, s"resize diverges for $id: ${resized(id)} vs $want")
    }
    // the all-0xFF payload resizes to sixteen 255s — the value the old
    // string round-trip rewrote to the replacement char
    assert(resized(2L).forall(_ == 255))
  }

  test("ImageCodec decodes the committed true-PNG rows to pixel-derived features") {
    val out = Multimodal.decodeImageFeatures(fixture, "media_id", "bytes")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getSeq[Double](2))).toMap
    // rows 16..19 are genuine PNGs: decoded features must equal the
    // statistics of the generator's pixel formula (PNG is lossless, the
    // committed bytes round-trip the exact pixels)
    (16 to 19).foreach { i =>
      val (ok, feats) = out(i.toLong)
      assert(ok, s"PNG row $i failed to decode")
      val want = Multimodal.ImageCodec.features(MakeMediaFixture.pngImage(i)).toSeq
      assert(feats == want, s"pixel features diverge for row $i: $feats vs $want")
      // sanity on the feature semantics themselves
      assert(feats(0) == 8.0 + (i - 16) * 4 && feats(1) == 6.0 + (i - 16) * 2,
        s"width/height wrong for row $i")
      assert((2 to 5).forall(j => feats(j) >= 0.0 && feats(j) <= 1.0))
      assert(feats(6) > 0.0, "deterministic gradient image has non-zero luma spread")
    }
    // non-image payloads (empty, NUL, 0xFF run, invalid UTF-8, random
    // bytes) must survive as decoded=false zero vectors, never throw
    (0 to 15).foreach { i =>
      val (ok, feats) = out(i.toLong)
      assert(!ok, s"row $i is not an image but decoded")
      assert(feats.forall(_ == 0.0))
    }
  }

  test("dHash: pixel-determined, invariant under re-encode/aligned-resize/brightness, flips under edits") {
    import Multimodal.ImageCodec
    def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    // grid-aligned textured image (w % 9 == 0, h % 8 == 0)
    def base(): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        27, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
      // channels bounded to 200 so the +24 brightness case stays
      // clip-free (difference hashes are shift-invariant only unclipped)
      for (y <- 0 until 24; x <- 0 until 27)
        img.setRGB(x, y, ((x * 41 + y * 13) % 200 << 16) |
          ((y * 67 + x) % 200 << 8) | ((x * y + 5) % 200))
      img
    }
    val h0 = ImageCodec.dhash64(base())
    // decode(encode(img)) reproduces the hash (PNG lossless)
    assert(ImageCodec.decodeDHash(encode(base())).contains(h0))
    // re-encode under ARGB: different bytes, identical pixels, same hash
    val argb = new java.awt.image.BufferedImage(
      27, 24, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 24; x <- 0 until 27)
      argb.setRGB(x, y, 0xff000000 | (base().getRGB(x, y) & 0xffffff))
    assert(!java.util.Arrays.equals(encode(argb), encode(base())),
      "re-encode should change bytes")
    assert(ImageCodec.decodeDHash(encode(argb)).contains(h0))
    // 2x nearest-neighbor upscale with aligned grid: identical hash
    val up = new java.awt.image.BufferedImage(
      54, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 54)
      up.setRGB(x, y, base().getRGB(x / 2, y / 2))
    assert(ImageCodec.dhash64(up) == h0)
    // +24 global brightness (clip-free range by construction of the
    // comparison being difference-based): hash unchanged
    val bright = new java.awt.image.BufferedImage(
      27, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 27) {
      val p = base().getRGB(x, y)
      def c(v: Int) = math.min(v + 24, 255)
      bright.setRGB(x, y,
        (c((p >> 16) & 0xff) << 16) | (c((p >> 8) & 0xff) << 8) | c(p & 0xff))
    }
    assert(ImageCodec.dhash64(bright) == h0)
    // a genuinely different image has a far hash
    val other = new java.awt.image.BufferedImage(
      27, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 27)
      other.setRGB(x, y, ((255 - x * 9 % 256) << 16) | ((y * 91) % 256 << 8))
    assert(java.lang.Long.bitCount(ImageCodec.dhash64(other) ^ h0) > 3,
      "distinct textures must not collide within the banding radius")
    // non-image payloads refuse quietly
    assert(ImageCodec.decodeDHash(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageCodec.decodeDHash(Array.emptyByteArray).isEmpty)
    // the committed fixture PNGs hash deterministically
    (16 to 19).foreach { i =>
      assert(ImageCodec.decodeDHash(MakeMediaFixture.payload(i))
        .contains(ImageCodec.dhash64(MakeMediaFixture.pngImage(i))))
    }
  }

  test("sampleChunks fingerprints byte slices") {
    val chunks = Multimodal.sampleChunks(fixture.filter(col("media_id") >= 4),
        "media_id", "bytes", n = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    committed.filter(_._1 >= 4).foreach { case (id, bytes) =>
      (0 until 4).foreach { i =>
        val start = (i * bytes.length) / 4
        val len = math.max(bytes.length / 4, 1)
        val slice = bytes.slice(start, start + len)
        assert(chunks((id, i)) == sha256(slice), s"chunk $i diverges for $id")
      }
    }
  }

  test("AudioCodec: WAV roundtrip, metadata-chunk skip, stereo fold, refusals") {
    import graft.operators.Multimodal.AudioCodec
    val samples = Array.tabulate(2048)(i =>
      2 * math.round(3000.0 * StrictMath.sin(2.0 * StrictMath.PI * 3 / 32.0 * i)).toInt)
    // roundtrip: encode -> decode returns the exact samples + rate
    val wav = AudioCodec.encodeWav(samples, 8000)
    val Some((back, rate)) = AudioCodec.decodeWav(wav)
    assert(rate == 8000 && back.sameElements(samples))
    // a LIST/INFO metadata chunk changes the bytes, not the samples
    val reenc = AudioCodec.encodeWav(samples, 8000, extraChunk = true)
    assert(!java.util.Arrays.equals(reenc, wav))
    val Some((back2, _)) = AudioCodec.decodeWav(reenc)
    assert(back2.sameElements(samples))
    // stereo folds to the truncated integer channel mean
    val st = java.nio.ByteBuffer.allocate(44 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    st.put("RIFF".getBytes, 0, 4).putInt(36 + 8)
    st.put("WAVE".getBytes, 0, 4)
    st.put("fmt ".getBytes, 0, 4).putInt(16)
    st.putShort(1.toShort).putShort(2.toShort) // PCM, stereo
    st.putInt(8000).putInt(8000 * 4).putShort(4.toShort).putShort(16.toShort)
    st.put("data".getBytes, 0, 4).putInt(8)
    Seq(100, 200, -51, 50).foreach(v => st.putShort(v.toShort))
    val Some((mono, _)) = AudioCodec.decodeWav(st.array())
    assert(mono.sameElements(Array(150, 0)), mono.toSeq) // (-51+50)/2 -> 0 truncated
    // refusals: garbage, truncated, non-PCM format
    assert(AudioCodec.decodeWav("not a wav at all".getBytes).isEmpty)
    assert(AudioCodec.decodeWav(wav.take(40)).isEmpty)
    val f = wav.clone(); f(20) = 3 // fmt audioFormat -> IEEE float
    assert(AudioCodec.decodeWav(f).isEmpty)
    assert(AudioCodec.decodeAfp(null).isEmpty)
  }

  test("afp64: sample-determined, invariant under re-encode and power-of-two gain, flips under real edits") {
    import graft.operators.Multimodal.AudioCodec
    def clip(seed: Int, n: Int = 2048): Array[Int] = Array.tabulate(n) { i =>
      2 * math.round(
        3000.0 * StrictMath.sin(2.0 * StrictMath.PI * (1 + seed % 5) / 32.0 * i) +
        1500.0 * StrictMath.sin(2.0 * StrictMath.PI * (2 + seed % 7) / 32.0 * i + 0.7)).toInt
    }
    val a = clip(1)
    val sig = AudioCodec.afp64(a)
    assert(sig != 0L)
    // container re-encode: identical samples -> identical fingerprint
    assert(AudioCodec.decodeAfp(AudioCodec.encodeWav(a, 8000)).get ==
      AudioCodec.decodeAfp(AudioCodec.encodeWav(a, 8000, extraChunk = true)).get)
    // power-of-two gain: exact energy scaling, every comparison preserved
    assert(AudioCodec.afp64(a.map(_ / 2)) == sig)
    assert(AudioCodec.afp64(a.map(_ * 4)) == sig)
    // a genuinely different clip lands far away
    val other = AudioCodec.afp64(clip(3))
    assert(java.lang.Long.bitCount(sig ^ other) > 3,
      s"distinct clips must separate: ${java.lang.Long.bitCount(sig ^ other)}")
    // a real edit (splice noise into the middle window) flips bits
    val edited = a.clone()
    (900 until 1100).foreach(i => edited(i) = (i * 2654435761L % 8192).toInt - 4096)
    assert(AudioCodec.afp64(edited) != sig)
    // banding reuse: planted copies land at Hamming 0 through the SAME
    // signaturePairs join the image/dHash path uses
    import spark.implicits._
    val rows = Seq((1L, AudioCodec.encodeWav(a, 8000)),
      (1000001L, AudioCodec.encodeWav(a, 8000, extraChunk = true)),
      (2000001L, AudioCodec.encodeWav(a.map(_ / 2), 8000)),
      (3L, AudioCodec.encodeWav(clip(3), 8000)),
      (4L, "garbage".getBytes)).toDF("media_id", "bytes")
    val hashed = graft.operators.Multimodal
      .decodeAudioFingerprint(rows, "media_id", "bytes")
    assert(hashed.filter(col("decoded")).count() == 4)
    val pairs = graft.operators.Dedup.signaturePairs(
      hashed.filter(col("decoded")), "media_id", "afp")
      .filter(col("hamming") === 0)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 1000001L)) && pairs.contains((1L, 2000001L)),
      s"planted audio copies must land at Hamming 0: $pairs")
  }


  test("VideoCodec: multi-frame GIF roundtrip, even sampling, re-encode/trim invariances, refusals") {
    import graft.operators.Multimodal.{ImageCodec, VideoCodec}
    // 7 palette entries (prime) so distinct seeds cannot alias through
    // the modulus (seed 5 == seed 1 mod 4 was pixel-identical)
    val palette = Array(0x1b2838, 0xc84b31, 0x346751, 0xecdbba,
      0x2d4263, 0x91c483, 0xffe162)
    def frame(seed: Int, f: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(45, 40,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 40; x <- 0 until 45)
        img.setRGB(x, y, 0xff000000 |
          palette((x * (3 + seed) + y * 7 + f * 11 + (x * y % 13)) % palette.length))
      img
    }
    val frames = (0 until 12).map(frame(1, _))
    val gif = VideoCodec.encodeGif(frames)
    // roundtrip: every frame decodes to the hash of its source image
    val Some(hs) = VideoCodec.decodeFrameHashes(gif, maxFrames = 16)
    assert(hs.length == 12)
    assert(hs.toSeq == frames.map(ImageCodec.dhash64),
      "decoded frame hashes must equal the source frames' hashes")
    // container re-encode (different frame delay): bytes differ,
    // decoded frame hashes identical
    val reenc = VideoCodec.encodeGif(frames, delayCs = 50)
    assert(!java.util.Arrays.equals(reenc, gif))
    assert(VideoCodec.decodeFrameHashes(reenc, 16).get.toSeq == hs.toSeq)
    // trimmed clip: hash sequence is the exact prefix
    val trimmed = VideoCodec.encodeGif(frames.dropRight(3))
    assert(VideoCodec.decodeFrameHashes(trimmed, 16).get.toSeq ==
      hs.take(9).toSeq)
    // even sampling: maxFrames 4 over 12 frames reads 0, 3, 6, 9
    val Some(s4) = VideoCodec.decodeFrameHashes(gif, maxFrames = 4)
    assert(s4.toSeq == Seq(hs(0), hs(3), hs(6), hs(9)))
    // refusals: garbage and null survive as None, never a throw
    assert(VideoCodec.decodeFrameHashes("not a gif".getBytes, 16).isEmpty)
    assert(VideoCodec.decodeFrameHashes(null, 16).isEmpty)
    // clip-level dedup through the containment family: the trimmed
    // clip's frame-trigrams are a subset of the source's
    import spark.implicits._
    val rows = Seq((1L, gif), (1000001L, reenc), (2000001L, trimmed),
      (9L, VideoCodec.encodeGif((0 until 12).map(frame(5, _))))).toDF("media_id", "bytes")
    val hashed = graft.operators.Multimodal
      .decodeVideoFrameHashes(rows, "media_id", "bytes")
    val clipDocs = hashed.filter(col("decoded"))
      .select(col("media_id"), expr(
        "array_join(transform(frame_hashes, h -> CAST(h AS STRING)), ' ')").as("text"))
    val pairs = graft.operators.Dedup
      .containmentJoin(clipDocs, "media_id", "text", tau = 0.9, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs.contains((1L, 1000001L, 1.0)) && pairs.contains((1000001L, 1L, 1.0)),
      s"re-encoded clip must be containment-1.0 both ways: $pairs")
    assert(pairs.contains((2000001L, 1L, 1.0)),
      s"trimmed clip -> source must be containment 1.0: $pairs")
    assert(!pairs.exists(p => p._1 == 9L || p._2 == 9L),
      s"an unrelated clip must not pair at tau 0.9: $pairs")
  }

  test("VideoCodec disposal compositing: a delta-frame re-encode of the same animation fingerprints identically (all three disposal methods)") {
    import graft.operators.Multimodal.VideoCodec
    val palette = Array(0x1b2838, 0xc84b31, 0x346751, 0xecdbba,
      0x2d4263, 0x91c483, 0xffe162)
    def base(): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(45, 40,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 40; x <- 0 until 45)
        img.setRGB(x, y, 0xff000000 |
          palette((x * 5 + y * 7 + (x * y % 13)) % palette.length))
      img
    }
    def withPatch(src: java.awt.image.BufferedImage, px: Int, py: Int,
                  pw: Int, ph: Int, seed: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(45, 40,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics(); g.drawImage(src, 0, 0, null); g.dispose()
      for (y <- py until py + ph; x <- px until px + pw)
        img.setRGB(x, y, 0xff000000 | palette((x + y * 3 + seed) % palette.length))
      img
    }
    def patchOf(img: java.awt.image.BufferedImage, px: Int, py: Int,
                pw: Int, ph: Int): java.awt.image.BufferedImage = {
      val p = new java.awt.image.BufferedImage(pw, ph,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = p.createGraphics()
      g.drawImage(img, -px, -py, null); g.dispose()
      p
    }
    val s0 = base()
    val s1 = withPatch(s0, 12, 8, 16, 12, 3)   // patch A applied
    val s2 = withPatch(s1, 20, 20, 14, 10, 5)  // patch B applied on top
    // --- doNotDispose deltas: full-frame encode vs patch-rect encode
    val full = VideoCodec.encodeGif(Seq(s0, s1, s2))
    val delta = VideoCodec.encodeGifFrames(Seq(
      (s0, 0, 0, "doNotDispose"),
      (patchOf(s1, 12, 8, 16, 12), 12, 8, "doNotDispose"),
      (patchOf(s2, 20, 20, 14, 10), 20, 20, "none")))
    assert(!java.util.Arrays.equals(full, delta))
    val Some(hFull) = VideoCodec.decodeFrameHashes(full, 16)
    val Some(hDelta) = VideoCodec.decodeFrameHashes(delta, 16)
    assert(hFull.toSeq == hDelta.toSeq,
      "delta-frame re-encode must composite to identical fingerprints")
    // --- restoreToPrevious: a blink animation (S0, S0+patch, S0)
    val onePix = patchOf(s0, 0, 0, 1, 1)
    val blinkFull = VideoCodec.encodeGif(Seq(s0, s1, s0))
    val blinkDelta = VideoCodec.encodeGifFrames(Seq(
      (s0, 0, 0, "doNotDispose"),
      (patchOf(s1, 12, 8, 16, 12), 12, 8, "restoreToPrevious"),
      (onePix, 0, 0, "none")))
    assert(VideoCodec.decodeFrameHashes(blinkFull, 16).get.toSeq ==
      VideoCodec.decodeFrameHashes(blinkDelta, 16).get.toSeq,
      "restoreToPrevious must rewind the canvas to the pre-draw screen")
    // --- restoreToBackgroundColor: the patch rect clears to the
    // opaque-black canvas ground after its frame
    val s2bg = {
      val img = new java.awt.image.BufferedImage(45, 40,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.drawImage(s0, 0, 0, null)
      g.setColor(java.awt.Color.BLACK)
      g.fillRect(12, 8, 16, 12)
      g.dispose()
      img
    }
    val bgFull = VideoCodec.encodeGif(Seq(s0, s1, s2bg))
    val bgDelta = VideoCodec.encodeGifFrames(Seq(
      (s0, 0, 0, "doNotDispose"),
      (patchOf(s1, 12, 8, 16, 12), 12, 8, "restoreToBackgroundColor"),
      (onePix, 0, 0, "none")))
    assert(VideoCodec.decodeFrameHashes(bgFull, 16).get.toSeq ==
      VideoCodec.decodeFrameHashes(bgDelta, 16).get.toSeq,
      "restoreToBackgroundColor must clear the frame rect to the ground")
    // the banded signature join lands the doNotDispose pair at Hamming 0
    // on every sampled frame (fold the per-frame hashes through xor of
    // first frame as a quick signature stand-in is NOT needed — frame 0
    // is already identical; assert the full sequences matched above)
  }
}
