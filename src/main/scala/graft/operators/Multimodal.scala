package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and a partition-wise
  * decode/feature-extract stage.
  *
  * The Spark-side shape is real and tested: schema (bytes + metadata
  * struct), partitioning (decode is a mapPartitions stage so a real codec
  * can amortize per-partition init, exactly like an image library handle),
  * and batch signature. Two codecs share the shape:
  *  - [[FakeCodec]], a deterministic byte-derived stand-in that a DuckDB
  *    oracle can reproduce (q43's hashed row) and that covers audio/video
  *    mimes this container has no decoder for;
  *  - [[ImageCodec]] (round 8), a REAL image decoder on the JDK's
  *    javax.imageio — actual PNG bytes in, pixel-statistics features out
  *    ([[decodeImageFeatures]]), pinned on the committed true-PNG fixture
  *    rows in MultimodalFixtureSpec.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct derived from a string
    * column (the testdata has no true binary column; the engine surface
    * treats it as opaque bytes from here on). */
  def binarize(df: DataFrame, idCol: String, payloadCol: String,
               mime: String = "application/octet-stream"): DataFrame =
    df.select(
      col(idCol),
      col(payloadCol).cast("binary").as("bytes"),
      struct(
        lit(mime).as("mime"),
        octet_length(col(payloadCol).cast("binary")).as("n_bytes"),
        sha2(col(payloadCol).cast("binary"), 256).as("sha256")).as("media_meta"))

  /** STUB decoder: stands in for an image/audio codec. Deterministic:
    * feature i = byte[(i * 31) mod len] / 255. A real implementation
    * would decode the payload and pool pixel/sample statistics here. */
  object FakeCodec {
    val dim = 8
    def decode(bytes: Array[Byte]): Array[Double] = {
      if (bytes == null || bytes.isEmpty) Array.fill(dim)(0.0)
      else Array.tabulate(dim)(i => (bytes((i * 31) % bytes.length) & 0xff) / 255.0)
    }
  }

  /** Partition-wise decode/feature-extract: one codec "handle" per
    * partition (the `iter =>` prologue is where a real codec would init),
    * rows streamed through it. Returns (id, features). */
  def decodeFeatures(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      // NO spread (round 16): measured neutral-to-negative on every media
      // row (q43/q130/q136/q137/q117) — the exchange moves the payload
      // BYTES to feed a cheap per-row decode (guide SS8: don't shuffle
      // heavy opaque payloads for light work); a production-scale scan
      // arrives wide and never needed it
      df.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
    ds.mapPartitions { iter =>
      // real codec init would happen here, once per partition
      iter.map { case (id, bytes) => (id, FakeCodec.decode(bytes)) }
    }.toDF(idCol, "features")
  }

  /** REAL image codec (round 8): decodes actual image bytes via the
    * JDK's `javax.imageio` (PNG/JPEG/GIF/BMP readers ship with the JRE —
    * no external library) and pools pixel statistics into a fixed-size
    * feature vector. Feature layout (dim = 8):
    *   [width, height, meanR, meanG, meanB, lumaMean, lumaStd, brightFrac]
    * with channel means normalized to [0,1], luma = Rec.601
    * (0.299R + 0.587G + 0.114B)/255, lumaStd the population std-dev, and
    * brightFrac the fraction of pixels with luma > 0.5. Accumulation is
    * a fixed row-major loop, so features are deterministic for given
    * pixels — and PNG is lossless, so decode(encode(img)) reproduces the
    * source pixels exactly (pinned in MultimodalFixtureSpec against the
    * committed true-PNG fixture rows). Undecodable payloads (empty,
    * truncated, not an image) return None — no exceptions escape a task. */
  object ImageCodec {
    val dim = 8
    def features(img: java.awt.image.BufferedImage): Array[Double] = {
      val w = img.getWidth
      val h = img.getHeight
      var sr, sg, sb, sl, sl2 = 0.0
      var nb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val r = (p >> 16) & 0xff
          val g = (p >> 8) & 0xff
          val b = p & 0xff
          val l = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
          sr += r; sg += g; sb += b; sl += l; sl2 += l * l
          if (l > 0.5) nb += 1
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      val lm = sl / n
      Array(w.toDouble, h.toDouble, sr / (255.0 * n), sg / (255.0 * n),
        sb / (255.0 * n), lm,
        math.sqrt(math.max(sl2 / n - lm * lm, 0.0)), nb / n)
    }
    def decode(bytes: Array[Byte]): Option[Array[Double]] = {
      if (bytes == null || bytes.isEmpty) None
      else try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        Option(img).map(features)
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** 64-bit difference hash (dHash) — the perceptual fingerprint image
      * corpora dedup on the way text dedups on MinHash: downsample the
      * luma plane to a 9×8 grid by exact integer box sums, bit (gx, gy)
      * = cell (gx, gy) brighter than its right neighbor. Comparisons
      * cross-multiply the integer sums (sum_a·n_b > sum_b·n_a) so no
      * division rounding enters — the hash is a pure function of the
      * pixels. Identical pixels (lossless re-encode, container/color-
      * type changes) give the SAME hash; clean k× resampling with the
      * grid aligned (width a multiple of 9, height of 8) preserves
      * every cell mean exactly; a global brightness shift preserves
      * every difference (up to clipping). Mild lossy edits land within
      * a few bits — the Hamming ≤ 3 banding tier's territory
      * ([[Dedup.signaturePairs]]).
      *
      * Images past 256 MP are refused (None upstream): the cross-
      * multiplied cell sums are Long-exact only below that bound, and a
      * crawl image that size is itself suspect. */
    def dhash64(img: java.awt.image.BufferedImage): Long = {
      val w = img.getWidth
      val h = img.getHeight
      val gw = 9
      val gh = 8
      val sums = Array.ofDim[Long](gw, gh)
      val cnts = Array.ofDim[Long](gw, gh)
      var gy = 0
      while (gy < gh) {
        val y0 = gy * h / gh
        val y1 = math.min(math.max((gy + 1) * h / gh, y0 + 1), h)
        var gx = 0
        while (gx < gw) {
          val x0 = gx * w / gw
          val x1 = math.min(math.max((gx + 1) * w / gw, x0 + 1), w)
          var s = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val p = img.getRGB(x, y)
              // Rec.601 luma scaled by 1000 — integer, exact
              s += 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
                114L * (p & 0xff)
              x += 1
            }
            y += 1
          }
          sums(gx)(gy) = s
          cnts(gx)(gy) = (y1 - y0).toLong * (x1 - x0)
          gx += 1
        }
        gy += 1
      }
      var sig = 0L
      gy = 0
      while (gy < gh) {
        var gx = 0
        while (gx < gw - 1) {
          if (sums(gx)(gy) * cnts(gx + 1)(gy) > sums(gx + 1)(gy) * cnts(gx)(gy))
            sig |= 1L << (gy * 8 + gx)
          gx += 1
        }
        gy += 1
      }
      sig
    }

    /** Decode + dHash; None for undecodable or oversized payloads. */
    def decodeDHash(bytes: Array[Byte]): Option[Long] = {
      if (bytes == null || bytes.isEmpty) None
      else try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          .filter(i => i.getWidth.toLong * i.getHeight <= 268435456L)
          .map(dhash64)
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** [[decodeFeatures]] with the REAL codec: same mapPartitions shape
    * (per-partition codec init amortized in the prologue — here the
    * ImageIO disk-cache disable, which otherwise writes a temp file per
    * image on executors), rows streamed through `ImageIO.read`. Returns
    * (id, decoded boolean, features); undecodable payloads survive as
    * decoded=false with a zero vector rather than failing the task —
    * at 100 TB a corrupt crawl image must never kill a partition. */
  def decodeImageFeatures(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      // NO spread (round 16): measured neutral-to-negative on every media
      // row (q43/q130/q136/q137/q117) — the exchange moves the payload
      // BYTES to feed a cheap per-row decode (guide SS8: don't shuffle
      // heavy opaque payloads for light work); a production-scale scan
      // arrives wide and never needed it
      df.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
    ds.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition
      iter.map { case (id, bytes) =>
        ImageCodec.decode(bytes) match {
          case Some(f) => (id, true, f)
          case None    => (id, false, Array.fill(ImageCodec.dim)(0.0))
        }
      }
    }.toDF(idCol, "decoded", "features")
  }

  /** REAL audio codec (round 15 — the verdict's audio-tier task): a
    * WAV/RIFF PCM parser (pure JVM byte walking, no external library)
    * plus a 64-bit SPECTRAL fingerprint — the audio twin of
    * [[ImageCodec.dhash64]], feeding the same
    * [[Dedup.signaturePairs]] banded near-dup join unchanged.
    *
    * Decode: RIFF/WAVE container, chunk walk (word-aligned sizes, so
    * metadata chunks — LIST/INFO tags, padding — are skipped exactly
    * as a player would), `fmt ` must be PCM (format 1) 16-bit;
    * interleaved channels fold to mono by truncated integer mean.
    * Undecodable payloads return None — a corrupt crawl clip must
    * never kill a partition.
    *
    * Fingerprint `afp64`: 8 time windows × 8 frequency bands. Band
    * energies come from Goertzel filters at fixed FRACTIONS of the
    * sample rate (f_b = (b+1)/32 · fs, so the coefficients are
    * constants and the fingerprint is a pure function of the sample
    * array); bit (w, b) = E(w, b) > E(w, (b+1) mod 8) — adjacent-band
    * comparisons, the dHash trick in frequency space. Invariances that
    * make it a DEDUP key rather than a checksum:
    *   - container re-encoding (metadata chunks added, chunk order,
    *     byte-identical samples) → identical samples → identical hash;
    *   - uniform power-of-two gain (the exact volume change a mastering
    *     step applies): Goertzel is linear and scaling doubles by 2^k
    *     is exact, so every energy scales by exactly 2^2k and every
    *     strict comparison is preserved — Hamming 0 (pinned in
    *     MultimodalFixtureSpec and the q136 planted classes);
    *   - mild lossy edits land within a few bits — the Hamming ≤ 3
    *     banding tier's territory. */
  object AudioCodec {

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Parse a RIFF/WAVE PCM-16 payload to (mono samples, sample rate).
      * None on anything that is not a well-formed PCM-16 WAV. */
    def decodeWav(bytes: Array[Byte]): Option[(Array[Int], Int)] = {
      if (bytes == null || bytes.length < 44) return None
      try {
        if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
        var off = 12
        var channels = -1
        var rate = -1
        var bits = -1
        var samples: Array[Int] = null
        while (off + 8 <= bytes.length) {
          val id = tag(bytes, off)
          val size = le32(bytes, off + 4)
          if (size < 0 || off + 8 + size > bytes.length) return None
          if (id == "fmt ") {
            if (size < 16 || le16(bytes, off + 8) != 1) return None // PCM only
            channels = le16(bytes, off + 10)
            rate = le32(bytes, off + 12)
            bits = le16(bytes, off + 22)
          } else if (id == "data") {
            if (channels <= 0 || bits != 16) return None // fmt must precede data
            val n = size / (2 * channels)
            val out = new Array[Int](n)
            var i = 0
            while (i < n) {
              var acc = 0
              var c = 0
              while (c < channels) {
                acc += le16(bytes, off + 8 + (i * channels + c) * 2).toShort.toInt
                c += 1
              }
              out(i) = acc / channels // truncated integer mean
              i += 1
            }
            samples = out
          }
          off += 8 + size + (size & 1) // RIFF chunks are word-aligned
        }
        if (samples == null || rate <= 0) None else Some((samples, rate))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** 64-bit spectral fingerprint of a mono sample array — see the
      * object scaladoc. Pure function of the samples (the band
      * frequencies are fixed fractions of the sample rate, so the rate
      * itself cancels out of the coefficients). */
    def afp64(samples: Array[Int]): Long = {
      val n = samples.length
      if (n == 0) return 0L
      val nw = 8
      val nb = 8
      val e = Array.ofDim[Double](nw, nb)
      var w = 0
      while (w < nw) {
        val s0 = w * n / nw
        val s1 = math.max((w + 1) * n / nw, s0 + 1).min(n)
        var b = 0
        while (b < nb) {
          // Goertzel at f = (b+1)/32 of the sample rate
          val coeff = 2.0 * StrictMath.cos(2.0 * StrictMath.PI * (b + 1) / 32.0)
          var q1 = 0.0
          var q2 = 0.0
          var i = s0
          while (i < s1) {
            val q0 = coeff * q1 - q2 + samples(i)
            q2 = q1
            q1 = q0
            i += 1
          }
          e(w)(b) = q1 * q1 + q2 * q2 - coeff * q1 * q2
          b += 1
        }
        w += 1
      }
      var sig = 0L
      w = 0
      while (w < nw) {
        var b = 0
        while (b < nb) {
          if (e(w)(b) > e(w)((b + 1) % nb)) sig |= 1L << (w * 8 + b)
          b += 1
        }
        w += 1
      }
      sig
    }

    /** Decode + fingerprint; None for undecodable payloads or clips
      * past 2^26 samples (the fingerprint is a dedup key for clip-sized
      * media; an hour-plus "clip" is itself suspect — and the bound
      * keeps the per-row Goertzel cost predictable). */
    def decodeAfp(bytes: Array[Byte]): Option[Long] =
      decodeWav(bytes).filter(_._1.length <= 67108864)
        .map { case (s, _) => afp64(s) }

    /** Minimal WAV/PCM-16 mono encoder — the fixture/test writer (the
      * ImageIO-encode analog for q136's planted copy classes). With
      * `extraChunk` an INFO LIST metadata chunk precedes the data: the
      * bytes and sha256 change, the samples do not — the container
      * re-encode class. */
    def encodeWav(samples: Array[Int], sampleRate: Int,
                  extraChunk: Boolean = false): Array[Byte] = {
      val extra =
        if (!extraChunk) Array.empty[Byte]
        else {
          val txt = "graft-reencode".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          val pad = txt.length & 1
          val b = java.nio.ByteBuffer.allocate(8 + 4 + 8 + txt.length + pad)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          b.put("LIST".getBytes, 0, 4).putInt(4 + 8 + txt.length + pad)
          b.put("INFO".getBytes, 0, 4)
          b.put("ICMT".getBytes, 0, 4).putInt(txt.length).put(txt)
          if (pad == 1) b.put(0.toByte)
          b.array()
        }
      val dataSize = samples.length * 2
      val riffSize = 4 + (8 + 16) + extra.length + (8 + dataSize)
      val b = java.nio.ByteBuffer.allocate(8 + riffSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes, 0, 4).putInt(riffSize)
      b.put("WAVE".getBytes, 0, 4)
      b.put("fmt ".getBytes, 0, 4).putInt(16)
      b.putShort(1.toShort).putShort(1.toShort) // PCM, mono
      b.putInt(sampleRate).putInt(sampleRate * 2)
      b.putShort(2.toShort).putShort(16.toShort)
      b.put(extra)
      b.put("data".getBytes, 0, 4).putInt(dataSize)
      samples.foreach(s => b.putShort(s.toShort))
      b.array()
    }
  }

  /** REAL video codec (round 15 — modality breadth beyond images and
    * audio): multi-frame animated-GIF decode on the JDK's ImageIO
    * (`ImageReader.read(i)` over `getNumImages` — no external library;
    * GIF is the one genuinely multi-frame container the JRE decodes),
    * sampling up to `maxFrames` evenly spaced frames and fingerprinting
    * each with the image tier's [[ImageCodec.dhash64]].
    *
    * The CLIP-level dedup needs no new join machinery: a clip is its
    * SEQUENCE of frame fingerprints, and rendering them as a
    * space-joined token string turns clip dedup into the containment
    * family's problem verbatim — [[Dedup.containmentJoin]] over
    * frame-hash n-grams. A container re-encode (same frames, different
    * metadata/delays) has the identical token string (containment 1.0
    * both ways); a TRIMMED clip's frame-trigrams are a subset of its
    * source's (contiguous n-grams of a frame prefix), so the trim →
    * source direction scores exactly 1.0 — the quote/excerpt detector
    * applied to video (q137).
    *
    * GIF frames are COMPOSITED per the disposal model before hashing
    * (round 16 — closing round 15's stated raw-frame limitation): a
    * logical-screen canvas accumulates each frame at its descriptor
    * offset, the sampled frames hash the COMPOSITED screen, and the
    * frame's disposal method is applied afterward ("none"/
    * "doNotDispose" leave the canvas — the renderer convention for
    * unspecified disposal; "restoreToBackgroundColor" clears the
    * frame's rect to the opaque-black canvas ground;
    * "restoreToPrevious" restores the pre-draw canvas). A delta-frame
    * re-encode of the same animation (full frames vs patch rects)
    * therefore fingerprints IDENTICALLY — MultimodalFixtureSpec plants
    * exactly that pair at Hamming 0. Non-GIF multi-frame containers
    * (no disposal model) hash frames as decoded. */
  object VideoCodec {

    private def gifAttr(tree: org.w3c.dom.Node, node: String,
                        attr: String, default: String): String = {
      var c = tree.getFirstChild
      while (c != null) {
        if (c.getNodeName == node) {
          val a = c.getAttributes.getNamedItem(attr)
          return if (a == null) default else a.getNodeValue
        }
        c = c.getNextSibling
      }
      default
    }

    /** Decode up to `maxFrames` evenly sampled frames' dHashes —
      * composited per disposal for GIF (see object doc). None when the
      * payload is not a decodable multi-frame image. */
    def decodeFrameHashes(bytes: Array[Byte],
                          maxFrames: Int = 16): Option[Array[Long]] = {
      if (bytes == null || bytes.isEmpty) return None
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return None
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val isGif = reader.getFormatName.equalsIgnoreCase("gif")
            val n = reader.getNumImages(true)
            if (n <= 0) return None
            val take = math.min(n, maxFrames)
            // evenly spaced sample indices (integer stride arithmetic,
            // deterministic; take == n covers every frame in order)
            val sample = Array.tabulate(take)(j => (j.toLong * n / take).toInt)
            if (!isGif) {
              val out = new Array[Long](take)
              var j = 0
              while (j < take) {
                val img = reader.read(sample(j))
                if (img == null || img.getWidth.toLong * img.getHeight > 268435456L)
                  return None
                out(j) = ImageCodec.dhash64(img)
                j += 1
              }
              return Some(out)
            }
            // GIF: sequential composite up to the last sampled frame
            val gifFmt = "javax_imageio_gif_image_1.0"
            val (sw, sh) = {
              val st = Option(reader.getStreamMetadata)
                .map(_.getAsTree("javax_imageio_gif_stream_1.0"))
              val w = st.map(t => gifAttr(t, "LogicalScreenDescriptor",
                "logicalScreenWidth", "0").toInt).getOrElse(0)
              val h = st.map(t => gifAttr(t, "LogicalScreenDescriptor",
                "logicalScreenHeight", "0").toInt).getOrElse(0)
              if (w > 0 && h > 0) (w, h)
              else { // degenerate stream metadata: frame-0 extent
                val t0 = reader.getImageMetadata(0).getAsTree(gifFmt)
                val f0 = reader.read(0)
                (gifAttr(t0, "ImageDescriptor", "imageLeftPosition", "0").toInt
                  + f0.getWidth,
                 gifAttr(t0, "ImageDescriptor", "imageTopPosition", "0").toInt
                  + f0.getHeight)
              }
            }
            if (sw.toLong * sh > 268435456L || sw <= 0 || sh <= 0) return None
            var canvas = new java.awt.image.BufferedImage(sw, sh,
              java.awt.image.BufferedImage.TYPE_INT_RGB) // opaque black ground
            val out = new Array[Long](take)
            var j = 0
            var idx = 0
            while (idx <= sample(take - 1)) {
              val img = reader.read(idx)
              if (img == null || img.getWidth.toLong * img.getHeight > 268435456L)
                return None
              val tree = reader.getImageMetadata(idx).getAsTree(gifFmt)
              val left = gifAttr(tree, "ImageDescriptor", "imageLeftPosition", "0").toInt
              val top = gifAttr(tree, "ImageDescriptor", "imageTopPosition", "0").toInt
              val disposal = gifAttr(tree, "GraphicControlExtension",
                "disposalMethod", "none")
              val before =
                if (disposal == "restoreToPrevious") {
                  val cp = new java.awt.image.BufferedImage(sw, sh,
                    java.awt.image.BufferedImage.TYPE_INT_RGB)
                  val g = cp.createGraphics()
                  g.drawImage(canvas, 0, 0, null); g.dispose()
                  cp
                } else null
              val g = canvas.createGraphics()
              g.drawImage(img, left, top, null)
              g.dispose()
              if (j < take && sample(j) == idx) {
                out(j) = ImageCodec.dhash64(canvas)
                j += 1
              }
              disposal match {
                case "restoreToBackgroundColor" =>
                  val g2 = canvas.createGraphics()
                  g2.setColor(java.awt.Color.BLACK)
                  g2.fillRect(left, top, img.getWidth, img.getHeight)
                  g2.dispose()
                case "restoreToPrevious" => canvas = before
                case _ => () // none / doNotDispose: canvas persists
              }
              idx += 1
            }
            Some(out)
          } finally reader.dispose()
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Minimal animated-GIF encoder on ImageIO's sequence writer — the
      * fixture/test writer (the encodeWav analog). `delayCs` rides in
      * each frame's GraphicControlExtension: a different delay is a
      * CONTAINER re-encode (bytes differ, decoded pixels identical). */
    def encodeGif(frames: Seq[java.awt.image.BufferedImage],
                  delayCs: Int = 10): Array[Byte] =
      encodeGifFrames(frames.map(f => (f, 0, 0, "none")), delayCs)

    /** The disposal-aware fixture writer (round 16): each frame rides
      * with its descriptor offset and disposal method, so a spec can
      * plant a DELTA-FRAME re-encode (patch rects over a persisting
      * canvas) of the same visual animation a full-frame encode shows
      * — the pair the compositing decoder must fingerprint
      * identically. */
    def encodeGifFrames(frames: Seq[(java.awt.image.BufferedImage, Int, Int, String)],
                        delayCs: Int = 10): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach { case (img, left, top, disposal) =>
          val ty = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
          val meta = writer.getDefaultImageMetadata(ty, writer.getDefaultWriteParam)
          val fmt = meta.getNativeMetadataFormatName
          val root = meta.getAsTree(fmt)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val gce = new javax.imageio.metadata.IIOMetadataNode(
            "GraphicControlExtension")
          gce.setAttribute("disposalMethod", disposal)
          gce.setAttribute("userInputFlag", "FALSE")
          gce.setAttribute("transparentColorFlag", "FALSE")
          gce.setAttribute("delayTime", delayCs.toString)
          gce.setAttribute("transparentColorIndex", "0")
          root.appendChild(gce)
          if (left != 0 || top != 0) {
            // offset rides in the ImageDescriptor node (created if the
            // default tree lacks one; the GIF writer honors it)
            var desc: javax.imageio.metadata.IIOMetadataNode = null
            var c = root.getFirstChild
            while (c != null && desc == null) {
              if (c.getNodeName == "ImageDescriptor")
                desc = c.asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
              c = c.getNextSibling
            }
            if (desc == null) {
              desc = new javax.imageio.metadata.IIOMetadataNode("ImageDescriptor")
              desc.setAttribute("imageWidth", img.getWidth.toString)
              desc.setAttribute("imageHeight", img.getHeight.toString)
              desc.setAttribute("interlaceFlag", "FALSE")
              root.appendChild(desc)
            }
            desc.setAttribute("imageLeftPosition", left.toString)
            desc.setAttribute("imageTopPosition", top.toString)
          }
          meta.setFromTree(fmt, root)
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, meta),
            writer.getDefaultWriteParam)
        }
        writer.endWriteSequence()
      } finally {
        writer.dispose()
        ios.close()
      }
      baos.toByteArray
    }
  }

  /** [[decodeImageDHash]]'s video twin: decode multi-frame payloads via
    * the real codec and emit the sampled frame-fingerprint sequence —
    * feed `array_join(transform(frame_hashes, CAST as STRING), ' ')` to
    * [[Dedup.containmentJoin]] for clip-level dedup (see
    * [[VideoCodec]]). Same mapPartitions shape; undecodable payloads
    * survive as decoded=false with an empty sequence. */
  def decodeVideoFrameHashes(df: DataFrame, idCol: String, bytesCol: String,
                             maxFrames: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      // NO spread (round 16): measured neutral-to-negative on every media
      // row (q43/q130/q136/q137/q117) — the exchange moves the payload
      // BYTES to feed a cheap per-row decode (guide SS8: don't shuffle
      // heavy opaque payloads for light work); a production-scale scan
      // arrives wide and never needed it
      df.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
    ds.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition
      iter.map { case (id, bytes) =>
        VideoCodec.decodeFrameHashes(bytes, maxFrames) match {
          case Some(hs) => (id, true, hs)
          case None     => (id, false, Array.empty[Long])
        }
      }
    }.toDF(idCol, "decoded", "frame_hashes")
  }

  /** [[decodeImageDHash]]'s audio twin: decode WAV/PCM payloads via the
    * real codec and emit the 64-bit spectral fingerprint
    * ([[AudioCodec.afp64]]) — the input to [[Dedup.signaturePairs]]'
    * banded near-dup join, unchanged. Same mapPartitions shape;
    * undecodable payloads survive as decoded=false / afp=0. */
  def decodeAudioFingerprint(df: DataFrame, idCol: String,
                             bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      // NO spread (round 16): measured 1.5 -> 1.1 s without it — the WAV
      // synth bytes would shuffle to feed a cheap Goertzel pass
      df.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
    ds.mapPartitions { iter =>
      // codec init would go here; the WAV walker needs none
      iter.map { case (id, bytes) =>
        AudioCodec.decodeAfp(bytes) match {
          case Some(sig) => (id, true, sig)
          case None      => (id, false, 0L)
        }
      }
    }.toDF(idCol, "decoded", "afp")
  }

  /** [[decodeImageFeatures]]'s perceptual-hash twin: decode via the real
    * codec and emit the 64-bit dHash ([[ImageCodec.dhash64]]) — the
    * input to [[Dedup.signaturePairs]]' banded near-dup join. Same
    * mapPartitions shape (per-partition codec init); undecodable or
    * oversized payloads survive as decoded=false / dhash=0. */
  def decodeImageDHash(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      // NO spread (round 16): measured neutral-to-negative on every media
      // row (q43/q130/q136/q137/q117) — the exchange moves the payload
      // BYTES to feed a cheap per-row decode (guide SS8: don't shuffle
      // heavy opaque payloads for light work); a production-scale scan
      // arrives wide and never needed it
      df.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
    ds.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition
      iter.map { case (id, bytes) =>
        ImageCodec.decodeDHash(bytes) match {
          case Some(sig) => (id, true, sig)
          case None      => (id, false, 0L)
        }
      }
    }.toDF(idCol, "decoded", "dhash")
  }

  /** Resize analog (image-thumbnail stand-in): stride-resample the
    * payload down to a fixed-length vector of byte values —
    * out[i] = byte[(i * len) div target]. A real implementation would
    * decode and bilinear-resample pixels; the Spark-side shape (fixed
    * output width, pure expression, codegen) is what carries to 100 TB.
    * Integer `div` keeps the offsets oracle-safe (cross-engine CAST
    * rounding differs). */
  def resizeBytes(df: DataFrame, idCol: String, bytesCol: String,
                  target: Int = 16): DataFrame =
    // byte value via hex/conv, NOT CAST(bytes AS STRING)+ascii: the string
    // round-trip assumes valid UTF-8 and rewrites bytes >= 0x80 to the
    // replacement char (identical outputs on ASCII payloads, wrong on real
    // media bytes — caught by the committed binary fixture). Empty payload
    // resizes to zeros (conv('') is NULL -> coalesce).
    df.select(col(idCol),
      expr(s"transform(sequence(0, ${target - 1}), i -> " +
        s"coalesce(CAST(conv(hex(substring($bytesCol, " +
        s"CAST((i * octet_length($bytesCol)) div $target AS INT) + 1, 1)), 16, 10) AS INT), 0))")
        .as("resized"))

  /** Frame-sampling analog: slice the payload into `n` evenly spaced
    * chunks (as a video frame-sampler would) and fingerprint each. Pure
    * expression — stays in codegen. */
  def sampleChunks(df: DataFrame, idCol: String, bytesCol: String, n: Int = 4): DataFrame =
    // integer `div` for offsets/lengths: a double division + CAST here
    // would truncate in Spark but round in DuckDB — not oracle-safe
    df.select(col(idCol), posexplode(expr(
      s"transform(sequence(0, ${n - 1}), i -> " +
        s"sha2(substring($bytesCol, CAST((i * octet_length($bytesCol)) div $n AS INT) + 1, " +
        s"CAST(greatest(octet_length($bytesCol) div $n, 1) AS INT)), 256))"))
      .as(Seq("chunk_idx", "chunk_sha")))
}
