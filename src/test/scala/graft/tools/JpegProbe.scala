package graft

/** Dev probe: decode fixture-style JPEGs with graft.operators.Jpeg
  * and with javax.imageio, print per-image max abs channel error.
  */
object JpegProbe {
  def main(args: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    var worst = 0
    var worstId = -1L
    var fails = 0
    (1L until 200L by 2).foreach { id =>
      val w = 16 + (id % 32).toInt
      val h = 8 + (id % 16).toInt
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((id * 31 + x * 7 + y) & 0xffffff).toInt)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val bytes = bos.toByteArray
      val (dw, dh, px) = graft.operators.Jpeg.decodePixels(bytes)
      if (dw != w || dh != h) { fails += 1; println(s"id=$id FAIL dims $dw x $dh vs $w x $h") }
      else {
        val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        var maxd = 0
        for (y <- 0 until h; x <- 0 until w) {
          val a = px(y * w + x); val b = ref.getRGB(x, y) & 0xffffff
          val d = math.max(math.max(math.abs(((a >> 16) & 255) - ((b >> 16) & 255)),
            math.abs(((a >> 8) & 255) - ((b >> 8) & 255))),
            math.abs((a & 255) - (b & 255)))
          if (d > maxd) maxd = d
        }
        if (maxd > worst) { worst = maxd; worstId = id }
        if (maxd > 0 && id < 20) println(s"id=$id maxdiff=$maxd")
      }
    }
    println(s"done: worst=$worst at id=$worstId, dimFails=$fails")
    // calibrate: |decoded channel sum - analytic channel sum| / npixels
    var worstMean = 0.0
    (1L until 2000L by 2).foreach { id =>
      val w = 16 + (id % 32).toInt
      val h = 8 + (id % 16).toInt
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((id * 31 + x * 7 + y) & 0xffffff).toInt)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val (dw, dh, px) = graft.operators.Jpeg.decodePixels(bos.toByteArray)
      var dr = 0L; var dg = 0L; var db = 0L; var ar = 0L; var ag = 0L; var ab = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val d = px(y * w + x); val a = ((id * 31 + x * 7 + y) & 0xffffff).toInt
        dr += (d >> 16) & 255; dg += (d >> 8) & 255; db += d & 255
        ar += (a >> 16) & 255; ag += (a >> 8) & 255; ab += a & 255
      }
      val n = (w * h).toDouble
      val m = math.max(math.abs(dr - ar) / n, math.max(math.abs(dg - ag) / n, math.abs(db - ab) / n))
      if (m > worstMean) { worstMean = m; println(f"id=$id mean-abs-sum-err=$m%.3f") }
    }
    println(f"calibration worstMean=$worstMean%.3f")
  }
}
