package graft.tools

import org.apache.spark.sql.SaveMode

/** One-off generator for the committed binary media fixture
  * (src/test/resources/media_fixture.parquet): 20 rows with a TRUE binary
  * column — empty payload, single NUL, all-0xFF, an invalid-UTF-8
  * sequence, seeded random bytes, and (rows 16-19, round 8) GENUINE PNG
  * images encoded via the JDK's javax.imageio from a deterministic pixel
  * formula — so the multimodal operators are exercised both on payloads
  * that are NOT valid text and on bytes a real decoder accepts. The byte
  * stream is deterministic (seed 7; PNG is a deterministic encode of
  * deterministic pixels on this JDK); MultimodalFixtureSpec regenerates
  * it and verifies the committed file matches, guarding fixture
  * integrity.
  */
object MakeMediaFixture {

  val mimes = Seq("image/png", "audio/wav", "video/mp4", "application/octet-stream")

  /** Deterministic synthetic image for fixture index i (16..19): size and
    * per-pixel RGB are pure functions of (i, x, y), so the decode-side
    * feature expectations can be recomputed from this formula without
    * touching the encoded bytes (PNG decode is lossless). */
  def pngImage(i: Int): java.awt.image.BufferedImage = {
    val w = 8 + (i - 16) * 4
    val h = 6 + (i - 16) * 2
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 37 + i * 11) % 256
      val g = (y * 53 + i * 7) % 256
      val b = ((x + y) * 29 + i * 3) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  /** Deterministic payloads; index i of 20. */
  def payload(i: Int): Array[Byte] = i match {
    case 0 => Array.emptyByteArray
    case 1 => Array[Byte](0)
    case 2 => Array.fill[Byte](16)(0xff.toByte)
    case 3 => Array[Byte](0xc3.toByte, 0x28.toByte, 0xa0.toByte, 0xa1.toByte,
      0xe2.toByte, 0x28.toByte, 0xa1.toByte) // invalid UTF-8 sequences
    case i if i >= 16 => // true PNG bytes (decodable by ImageCodec)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(pngImage(i), "png", baos)
      baos.toByteArray
    case _ =>
      val rng = new java.util.Random(7L + i)
      val len = 32 + rng.nextInt(300)
      val b = new Array[Byte](len)
      rng.nextBytes(b)
      b
  }

  def rows: Seq[(Long, String, Array[Byte])] =
    (0 until 20).map(i =>
      (i.toLong, if (i >= 16) "image/png" else mimes(i % mimes.length), payload(i)))

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/media_fixture_out")
    val spark = graft.Tables.session(1)
    import spark.implicits._
    rows.toDF("media_id", "mime", "bytes")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(out)
    println(s"[fixture] wrote $out — copy the single part file to " +
      "src/test/resources/media_fixture.parquet")
    spark.stop()
  }
}
