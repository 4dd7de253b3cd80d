package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** EXIF writer/parser round-trip plus the malformed-input contract
  * (a probe over arbitrary bytes must never throw).
  */
class ExifSpec extends AnyFunSuite {

  private def jpeg(): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("little- and big-endian TIFF round-trip all fields") {
    for (be <- Seq(false, true)) {
      val app1 = MediaOps.exifApp1(6, "graft", "cam42",
        "2024:03:09 08:30:00", 640, 480, bigEndian = be)
      val m = MediaMeta.exifMeta(MediaOps.withExif(jpeg(), app1))
        .getOrElse(fail(s"no exif parsed (be=$be)"))
      assert(m.orientation == 6)
      assert(m.make == "graft" && m.model == "cam42")
      assert(m.dateTime == "2024:03:09 08:30:00")
      assert(m.pixelX == 640 && m.pixelY == 480, s"dims: $m")
    }
  }

  test("jpeg without APP1 and non-jpeg bytes parse to None") {
    assert(MediaMeta.exifMeta(jpeg()).isEmpty)
    assert(MediaMeta.exifMeta("not an image at all".getBytes).isEmpty)
    assert(MediaMeta.exifMeta(Array[Byte]()).isEmpty)
  }

  test("malformed and truncated EXIF never throws") {
    val good = MediaOps.withExif(jpeg(),
      MediaOps.exifApp1(1, "graft", "cam00", "2024:01:01 00:00:00", 32, 24))
    for (cut <- Seq(1, 3, 5, 11, 17, 23, 31, 47, 63, good.length - 1)) {
      MediaMeta.exifMeta(good.take(cut)) // must not throw
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val junk = Array.fill(rnd.nextInt(128))(rnd.nextInt().toByte)
      MediaMeta.exifMeta(junk) // must not throw
      // corrupt a good payload at a random position
      val broken = good.clone()
      broken(rnd.nextInt(broken.length)) = rnd.nextInt().toByte
      MediaMeta.exifMeta(broken)
    }
  }
}
