package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** E2 real-codec unit coverage: the BMP encode → ImageIO decode
  * roundtrip must return the exact pixels the synthesis formulas wrote
  * (`q_media_decode`'s oracle checks aggregate statistics; this spec
  * checks every pixel on a sample of ids, so a compensating-error pair
  * in the stats can't hide a codec bug).
  */
class MultimodalSpec extends AnyFunSuite {

  private def expectedPixel(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((7 * id + 3L * x + 5L * y) % 256).toInt,
    ((11 * id + x + 2L * y) % 256).toInt,
    ((13 * id + 2L * x + y) % 256).toInt)

  test("encodeBmp produces a real BMP that ImageIO decodes pixel-exactly") {
    for (id <- Seq(0L, 1L, 7L, 42L, 12345L)) {
      val bytes = Multimodal.encodeBmp(id)
      assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte, "BMP magic")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO must decode the payload")
      assert(img.getWidth == 8 + (id % 16).toInt && img.getHeight == 8 + (id % 8).toInt)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        val got = ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
        assert(got == expectedPixel(id, x, y), s"pixel ($x,$y) of media $id")
      }
    }
  }

  test("decodeFeatures dispatches on magic: BMP gets real dimensions, GRFT keeps the fallback") {
    val spark = TestSpark.spark
    val sfDir = "/root/testdata/sf0.001"
    // BMP branch: width/height read from the decoded image
    val bmp = Multimodal.decodeFeatures(Multimodal.synthesizeBmp(spark, sfDir))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(bmp.nonEmpty)
    bmp.foreach { case (id, (w, h)) =>
      assert(w == 8 + (id % 16).toInt && h == 8 + (id % 8).toInt)
    }
    // GRFT branch: unchanged header-parse contract
    val grft = Multimodal.decodeFeatures(Multimodal.synthesizeMedia(spark, sfDir))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(grft.nonEmpty)
    grft.foreach { case (id, (w, h)) =>
      assert(w == 16 + (id % 16).toInt && h == 16 + (id % 8).toInt)
    }
  }

  test("encodeWav produces a real RIFF/WAVE file that AudioSystem decodes sample-exactly") {
    for (id <- Seq(0L, 7L, 123L)) {
      val bytes = Multimodal.encodeWav(id)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16)
      assert(fmt.getSampleRate.toLong == 8000 + (id % 5) * 2000)
      val raw = ais.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(raw).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = raw.length / 2
      assert(n == (48 + id % 96).toInt)
      for (t <- 0 until n) {
        val expected = ((id * 37 + t.toLong * t * 7 + t.toLong * 11) % 4096) - 2048
        assert(bb.getShort().toLong == expected, s"sample $t of media $id")
      }
    }
  }
}
