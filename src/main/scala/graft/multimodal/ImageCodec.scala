package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image codec binding — JDK-bundled `javax.imageio` (PNG/JPEG/BMP/
  * GIF), no external libraries. Pure byte-in/byte-out helpers called from
  * the `mapPartitions` batch shape in [[Media]]; audio/video remain
  * capability stubs (no JDK codec exists for them).
  *
  * All raster work is headless-safe (BufferedImage + Graphics2D never touch
  * a display). `ImageIO.setUseCache(false)` is set once per partition by
  * callers so decodes stay in-memory instead of spilling temp files. */
object ImageCodec {

  /** Decode any ImageIO-supported container; None on undecodable bytes
    * (callers fall back to the deterministic stub or drop the row). */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Aspect-ignoring smooth resize to exactly (w, h). */
  def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_SMOOTH),
      0, 0, null)
    g.dispose()
    out
  }

  /** 64-bit average hash (aHash): bit i set iff the i-th cell of the 8×8
    * mean-luminance grid is above the grid mean — the classic perceptual
    * image fingerprint (robust to re-encode / resize / mild noise; hamming
    * distance ≤ ~6 ⇒ visually the same image). Reuses [[embedding]], so the
    * hash is deterministic wherever the embedding is. */
  def aHash(img: BufferedImage): Long = {
    val cells = embedding(img, 8)
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += cells(i); i += 1 }
    mean /= 64.0
    var h = 0L
    i = 0
    while (i < 64) { if (cells(i) > mean) h |= (1L << i); i += 1 }
    h
  }

  /** grid×grid mean-luminance embedding in [-1, 1] (row-major, grid²
    * dims) — the classic pixel-statistics baseline; deterministic, so
    * near-dup detection over it is reproducible. */
  def embedding(img: BufferedImage, grid: Int): Array[Float] = {
    val out = new Array[Float](grid * grid)
    val w = img.getWidth; val h = img.getHeight
    var gy = 0
    while (gy < grid) {
      val y0 = (h.toLong * gy / grid).toInt
      val y1 = math.max((h.toLong * (gy + 1) / grid).toInt, y0 + 1).min(h)
      var gx = 0
      while (gx < grid) {
        val x0 = (w.toLong * gx / grid).toInt
        val x1 = math.max((w.toLong * (gx + 1) / grid).toInt, x0 + 1).min(w)
        var sum = 0.0; var n = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            val lum = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            sum += lum; n += 1
            x += 1
          }
          y += 1
        }
        out(gy * grid + gx) =
          (if (n == 0) 0.0f else ((sum / n) / 127.5 - 1.0).toFloat)
        gx += 1
      }
      gy += 1
    }
    out
  }
}
