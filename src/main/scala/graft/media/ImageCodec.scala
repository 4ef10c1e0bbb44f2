package graft.media

import java.awt.image.BufferedImage

/** Real image decode/transform on the JDK's built-in ImageIO
  * (PNG/JPEG/GIF/BMP — no external codec jars needed, headless-safe).
  * Non-image payloads are rejected cheaply by a magic-bytes prescreen, so
  * the multimodal operators can run one pipeline over mixed corpora: real
  * decode for real images, the deterministic fallback for everything else.
  */
object ImageCodec {

  locally {
    System.setProperty("java.awt.headless", "true")
    // Inputs are in-memory byte arrays: a disk-backed FileCacheImageInputStream
    // would leave a temp file per decode reclaimed only at JVM shutdown —
    // unbounded handle/disk growth on long-running executors.
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** magic-bytes prescreen: PNG / JPEG / GIF / BMP. */
  def isImage(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 && {
      val b0 = bytes(0) & 0xFF; val b1 = bytes(1) & 0xFF
      (b0 == 0x89 && b1 == 'P') ||                  // PNG
        (b0 == 0xFF && b1 == 0xD8) ||               // JPEG
        (b0 == 'G' && b1 == 'I' && bytes(2) == 'F') || // GIF
        (b0 == 'B' && b1 == 'M')                    // BMP
    }

  /** Pixel-count cap: header-claimed dimensions drive the decode
    * allocation BEFORE any pixel data validates, so a 40-byte payload
    * claiming 60000×60000 would OOM the task. ~67M px ≈ 256 MB ARGB. */
  val MaxPixels: Long = 1L << 26

  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    if (!isImage(bytes)) None
    else
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis, true, true)
              // dims come from the header — check them before decoding pixels
              val (w, h) = (r.getWidth(0), r.getHeight(0))
              if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) None
              else Option(r.read(0))
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case _: Throwable => None }

  /** (width, height) of a decodable image payload. */
  def decodeDims(bytes: Array[Byte]): Option[(Int, Int)] =
    decode(bytes).map(img => (img.getWidth, img.getHeight))

  /** aspect-preserving fit into a box (never upscales) — the same
    * arithmetic the mm_resize operator applies to dims. */
  def fitBox(w: Int, h: Int, box: Int): (Int, Int) = {
    val scale = math.min(1.0, math.min(box.toDouble / w, box.toDouble / h))
    (math.max(1, math.floor(w * scale).toInt), math.max(1, math.floor(h * scale).toInt))
  }

  /** Frames of a multi-frame (animated) GIF, composited progressively:
    * each frame draws at its descriptor offset over the running canvas —
    * an over-composite approximation of GIF disposal modes, which is what
    * frame SAMPLING needs (full frames, not deltas). Returns Nil for
    * non-GIF payloads and for single-frame GIFs (those are plain images;
    * the caller's still-image path handles them). */
  def gifFrames(bytes: Array[Byte]): Seq[BufferedImage] = {
    if (bytes == null || bytes.length < 6 ||
      bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F') return Nil
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Nil
        val reader = readers.next()
        try {
          reader.setInput(iis, false, false)
          val n = reader.getNumImages(true)
          if (n <= 1) return Nil
          // Canvas = GIF logical screen (stream metadata), widened to cover
          // every frame's descriptor rectangle (offset + dims) — a first
          // frame smaller than the screen must not clip later frames.
          val ls = logicalScreen(reader)
          var cw = ls.map(_._1).getOrElse(0)
          var ch = ls.map(_._2).getOrElse(0)
          val offs = new Array[(Int, Int)](n)
          var i = 0
          while (i < n) {
            val (x, y) = frameOffset(reader.getImageMetadata(i))
            offs(i) = (x, y)
            cw = math.max(cw, x + reader.getWidth(i))
            ch = math.max(ch, y + reader.getHeight(i))
            i += 1
          }
          // header-claimed dims gate the canvas allocation (see MaxPixels)
          if (cw <= 0 || ch <= 0 || cw.toLong * ch > MaxPixels) return Nil
          val canvas = new BufferedImage(cw, ch, BufferedImage.TYPE_INT_RGB)
          (0 until n).map { i =>
            val frame = reader.read(i)
            val (x, y) = offs(i)
            val g = canvas.createGraphics()
            try g.drawImage(frame, x, y, null) finally g.dispose()
            val copy = new BufferedImage(cw, ch, BufferedImage.TYPE_INT_RGB)
            val g2 = copy.createGraphics()
            try g2.drawImage(canvas, 0, 0, null) finally g2.dispose()
            copy
          }
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Throwable => Nil }
  }

  /** (width, height) of the GIF logical screen from stream metadata. */
  private def logicalScreen(reader: javax.imageio.ImageReader): Option[(Int, Int)] =
    try {
      val root = reader.getStreamMetadata.getAsTree("javax_imageio_gif_stream_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val lsd = root.getElementsByTagName("LogicalScreenDescriptor")
      if (lsd.getLength == 0) None
      else {
        val e = lsd.item(0).asInstanceOf[org.w3c.dom.Element]
        Some((e.getAttribute("logicalScreenWidth").toInt,
          e.getAttribute("logicalScreenHeight").toInt))
      }
    } catch { case _: Throwable => None }

  /** (left, top) of a GIF frame from its image-descriptor metadata. */
  private def frameOffset(md: javax.imageio.metadata.IIOMetadata): (Int, Int) =
    try {
      val root = md.getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val desc = root.getElementsByTagName("ImageDescriptor")
      if (desc.getLength == 0) (0, 0)
      else {
        val e = desc.item(0).asInstanceOf[org.w3c.dom.Element]
        (e.getAttribute("imageLeftPosition").toInt, e.getAttribute("imageTopPosition").toInt)
      }
    } catch { case _: Throwable => (0, 0) }

  /** deterministic fingerprint of a frame's composited pixels. */
  def framePixelFingerprint(img: BufferedImage): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(4)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        buf.clear(); buf.putInt(img.getRGB(x, y))
        md.update(buf.array())
        x += 1
      }
      y += 1
    }
    md.digest().take(4).map("%02x".format(_)).mkString
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
