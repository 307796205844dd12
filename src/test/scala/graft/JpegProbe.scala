package graft

/** scratch probe: what PSNR does the JDK JPEG encoder reach on various
  * fixture styles? run: sbt "Test/runMain graft.JpegProbe"
  */
object JpegProbe {
  def main(args: Array[String]): Unit = {
    import java.awt.image.BufferedImage
    val rng = new java.util.SplittableRandom(1)

    def gradient(sat: Double, shapes: Boolean, soft: Boolean): BufferedImage = {
      val w = 64; val h = 64
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      val base = 60 + rng.nextInt(120)
      val amp = (80 * sat).toInt
      val c0 = Array(base + rng.nextInt(amp + 1), base + rng.nextInt(amp + 1), base + rng.nextInt(amp + 1))
      val c1 = Array(base + rng.nextInt(amp + 1), base + rng.nextInt(amp + 1), base + rng.nextInt(amp + 1))
      for (y <- 0 until h; x <- 0 until w) {
        val t = (x + y).toDouble / (w + h)
        val r = (c0(0) + (c1(0) - c0(0)) * t).toInt
        val g = (c0(1) + (c1(1) - c0(1)) * t).toInt
        val b = (c0(2) + (c1(2) - c0(2)) * t).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      if (shapes) {
        val gfx = img.createGraphics()
        if (soft) gfx.setRenderingHint(java.awt.RenderingHints.KEY_ANTIALIASING,
          java.awt.RenderingHints.VALUE_ANTIALIAS_ON)
        for (_ <- 0 until 3) {
          val cr = base + rng.nextInt(amp + 1)
          gfx.setColor(new java.awt.Color(cr, cr + rng.nextInt(20) - 10 max 0, cr))
          gfx.fillOval(rng.nextInt(40), rng.nextInt(40), 16, 16)
        }
        gfx.dispose()
      }
      img
    }

    for (style <- Seq(("gray-soft", 0.15, true), ("muted", 0.4, true), ("plain-gradient", 0.4, false));
         q <- Seq(0.85f, 0.9f, 0.95f, 0.98f, 1.0f)) {
      val (name, sat, shapes) = style
      val img = gradient(sat, shapes, soft = true)
      val png = Imaging.encodePng(img)
      val jpg = Imaging.encodeJpeg(img, q)
      val p = Imaging.psnr(png, jpg)
      val hd = java.lang.Long.bitCount(Imaging.phash(png) ^ Imaging.phash(jpg))
      println(f"$name%-15s q=$q%4.2f psnr=$p%6.2f phash_hd=$hd%2d size=${jpg.length}%6d")
    }
  }
}
