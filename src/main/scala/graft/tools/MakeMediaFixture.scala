package graft.tools

import org.apache.spark.sql.SaveMode

/** One-off generator for the committed binary media fixture
  * (src/test/resources/media_fixture.parquet): 16 rows with a TRUE binary
  * column — empty payload, single NUL, all-0xFF, an invalid-UTF-8
  * sequence, and seeded random bytes — so the multimodal operators are
  * exercised on payloads that are NOT valid text. The byte stream is
  * deterministic (seed 7); MultimodalFixtureSpec regenerates it and
  * verifies the committed file matches, guarding fixture integrity.
  */
object MakeMediaFixture {

  val mimes = Seq("image/png", "audio/wav", "video/mp4", "application/octet-stream")

  /** Deterministic payloads; index i of 16. */
  def payload(i: Int): Array[Byte] = i match {
    case 0 => Array.emptyByteArray
    case 1 => Array[Byte](0)
    case 2 => Array.fill[Byte](16)(0xff.toByte)
    case 3 => Array[Byte](0xc3.toByte, 0x28.toByte, 0xa0.toByte, 0xa1.toByte,
      0xe2.toByte, 0x28.toByte, 0xa1.toByte) // invalid UTF-8 sequences
    case _ =>
      val rng = new java.util.Random(7L + i)
      val len = 32 + rng.nextInt(300)
      val b = new Array[Byte](len)
      rng.nextBytes(b)
      b
  }

  def rows: Seq[(Long, String, Array[Byte])] =
    (0 until 16).map(i => (i.toLong, mimes(i % mimes.length), payload(i)))

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
