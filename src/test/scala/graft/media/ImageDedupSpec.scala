package graft.media

import org.scalatest.funsuite.AnyFunSuite

class ImageDedupSpec extends AnyFunSuite {

  private def decode(png: Array[Byte]) =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))

  private def gray(v: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    img
  }

  test("identical content hashes identically through the PNG round trip") {
    val a = ImageDedup.dhashBands(decode(MediaOps.syntheticPng(0, "same text")))
    val b = ImageDedup.dhashBands(decode(MediaOps.syntheticPng(0, "same text")))
    assert(a.sameElements(b))
  }

  test("flat images hash to all-zero bands regardless of brightness") {
    // dHash is a gradient-sign hash: a constant image has no gradients,
    // at ANY global brightness — the invariance the hash is chosen for
    assert(ImageDedup.dhashBands(gray(0)).forall(_ == 0))
    assert(ImageDedup.dhashBands(gray(128)).forall(_ == 0))
    assert(ImageDedup.dhashBands(gray(255)).forall(_ == 0))
  }

  test("a single strong vertical edge sets exactly two bits per row") {
    // left half bright, right half dark, edge at x=16: the 9-column
    // grid box [14,17) straddles the edge (mean 170), so each of the 8
    // grid rows carries exactly two positive gradients — 255>170 into
    // the straddling box and 170>0 out of it
    val img = new java.awt.image.BufferedImage(
      32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32) {
      val v = if (x < 16) 255 else 0
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bands = ImageDedup.dhashBands(img)
    val popcount = bands.map(Integer.bitCount).sum
    assert(popcount == 16, s"expected two gradient bits per grid row, got $popcount")
  }

  test("band values stay within 16 unsigned bits") {
    val bands = ImageDedup.dhashBands(decode(MediaOps.syntheticPng(0, "abcdef")))
    assert(bands.length == 4)
    assert(bands.forall(b => b >= 0 && b <= 0xffff))
  }
}
