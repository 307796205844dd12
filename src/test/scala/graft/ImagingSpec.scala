package graft

import org.scalatest.funsuite.AnyFunSuite

class ImagingSpec extends AnyFunSuite {

  private def img(seed: Long, w: Int = 64, h: Int = 64) = Fixtures.renderBase(seed, w, h)

  test("png round-trip is lossless: psnr exact, phash stable") {
    val b = Imaging.encodePng(img(1))
    assert(Imaging.psnr(b, b) == Imaging.PsnrExact)
    assert(Imaging.phash(b) == Imaging.phash(b))
  }

  test("jpeg reencode of smooth fixture image keeps PSNR >= 40dB") {
    val i = img(2)
    val png = Imaging.encodePng(i)
    val jpg = Imaging.encodeJpeg(i, 0.92f)
    val p = Imaging.psnr(png, jpg)
    assert(p >= 40.0, s"psnr=$p")
  }

  test("different images have low PSNR and far phash") {
    val a = Imaging.encodePng(img(3))
    val b = Imaging.encodePng(img(4))
    assert(Imaging.psnr(a, b) < 30.0)
    val hd = java.lang.Long.bitCount(Imaging.phash(a) ^ Imaging.phash(b))
    assert(hd > 8, s"hamming=$hd")
  }

  test("phash is robust to jpeg re-encode (few bits flip)") {
    val i = img(5)
    val png = Imaging.encodePng(i)
    val jpg = Imaging.encodeJpeg(i, 0.9f)
    val hd = java.lang.Long.bitCount(Imaging.phash(png) ^ Imaging.phash(jpg))
    assert(hd <= 6, s"hamming=$hd")
  }

  test("dimension mismatch → psnr -1 (never a dup)") {
    val a = Imaging.encodePng(img(6, 64, 64))
    val b = Imaging.encodePng(img(6, 32, 32))
    assert(Imaging.psnr(a, b) == -1.0)
  }

  test("psnr matches hand-computed MSE on a 1x1 pair") {
    val x = new java.awt.image.BufferedImage(1, 1, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    x.setRGB(0, 0, 0x646464)
    val y = new java.awt.image.BufferedImage(1, 1, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    y.setRGB(0, 0, 0x656464) // one channel off by 1 → mse = 1/3
    val expected = 10.0 * math.log10(255.0 * 255.0 / (1.0 / 3.0))
    val got = Imaging.psnr(Imaging.encodePng(x), Imaging.encodePng(y))
    assert(math.abs(got - expected) < 1e-6, s"got=$got expected=$expected")
  }
}
