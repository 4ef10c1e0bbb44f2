package graft.media

import java.awt.image.BufferedImage

/** Real image decode/transform on the JDK's built-in ImageIO
  * (PNG/JPEG/GIF/BMP — no external codec jars needed, headless-safe).
  * Non-image payloads are rejected cheaply by a magic-bytes prescreen, so
  * the multimodal operators can run one pipeline over mixed corpora: real
  * decode for real images, the deterministic fallback for everything else.
  */
object ImageCodec {

  locally { System.setProperty("java.awt.headless", "true") }

  /** magic-bytes prescreen: PNG / JPEG / GIF / BMP. */
  def isImage(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 && {
      val b0 = bytes(0) & 0xFF; val b1 = bytes(1) & 0xFF
      (b0 == 0x89 && b1 == 'P') ||                  // PNG
        (b0 == 0xFF && b1 == 0xD8) ||               // JPEG
        (b0 == 'G' && b1 == 'I' && bytes(2) == 'F') || // GIF
        (b0 == 'B' && b1 == 'M')                    // BMP
    }

  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    if (!isImage(bytes)) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Throwable => None }

  /** (width, height) of a decodable image payload. */
  def decodeDims(bytes: Array[Byte]): Option[(Int, Int)] =
    decode(bytes).map(img => (img.getWidth, img.getHeight))

  /** aspect-preserving fit into a box (never upscales) — the same
    * arithmetic the mm_resize operator applies to dims. */
  def fitBox(w: Int, h: Int, box: Int): (Int, Int) = {
    val scale = math.min(1.0, math.min(box.toDouble / w, box.toDouble / h))
    (math.max(1, math.floor(w * scale).toInt), math.max(1, math.floor(h * scale).toInt))
  }

  /** real pixel resize (bilinear) of an image payload into the box,
    * re-encoded as PNG; None when the payload isn't a decodable image. */
  def resizePng(bytes: Array[Byte], box: Int): Option[Array[Byte]] =
    decode(bytes).map { img =>
      val (nw, nh) = fitBox(img.getWidth, img.getHeight, box)
      val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, nw, nh, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
}
