package graft

import graft.media.ImageCodec
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Real image decode through the multimodal operators: generated PNGs run
  * the SAME distributed functions as the mm_* ops and must yield true
  * dimensions and pixels — the hash fallback only fires for non-image
  * payloads.
  */
class MediaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("codec: decode dims, magic prescreen, aspect-fit, pixel resize") {
    val bytes = png(64, 48, 0xCC2200)
    assert(ImageCodec.isImage(bytes))
    assert(ImageCodec.decodeDims(bytes).contains((64, 48)))
    assert(!ImageCodec.isImage("plain text".getBytes("UTF-8")))
    assert(ImageCodec.decodeDims("plain text".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.fitBox(64, 48, 32) == ((32, 24)))
    assert(ImageCodec.fitBox(10, 8, 32) == ((10, 8))) // never upscale
    // real pixel resize: solid color survives, dims are the fit box
    val resized = ImageCodec.resizePng(bytes, 32).get
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(back.getWidth == 32 && back.getHeight == 24)
    assert((back.getRGB(5, 5) & 0xFFFFFF) == 0xCC2200)
  }

  test("audio codec: real WAV metadata + PCM samples (JDK javax.sound)") {
    import graft.media.AudioCodec
    // 0.5 s of a 440 Hz sine at 8 kHz mono 16-bit PCM, encoded as WAV
    val rate = 8000f
    val n = 4000
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * 12000).toShort
      pcm(i * 2) = (s & 0xFF).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    assert(AudioCodec.isAudio(wav))
    val meta = AudioCodec.decodeMeta(wav).get
    assert(meta.sampleRate == 8000f && meta.channels == 1 && meta.frames == n)
    assert(math.abs(meta.durationSec - 0.5) < 1e-6)
    val samples = AudioCodec.decodeSamples(wav).get
    assert(samples.length == n)
    // the decoded waveform is the sine we wrote (sample 0 ≈ 0; peak ≈ 12000/32768)
    assert(math.abs(samples(0)) < 0.01)
    assert(math.abs(samples.max - 12000.0 / 32768.0) < 0.01)
    // non-audio payloads are rejected by the prescreen
    assert(!AudioCodec.isAudio("plain text payload".getBytes("UTF-8")))
    assert(AudioCodec.decodeMeta(png(8, 8, 0)).isEmpty)
  }

  test("mm ops decode REAL images distributed; fallback only for non-images") {
    import spark.implicits._
    val payloads = Seq(
      (1L, png(64, 48, 0x00FF00)),
      (2L, png(20, 100, 0x123456)),
      (3L, "not an image at all".getBytes("UTF-8"))).toDS()
    val meta = graft.ops.Ops.binaryMeta(payloads).orderBy("doc_id").collect()
    assert(meta(0).getAs[Int]("width") == 64 && meta(0).getAs[Int]("height") == 48)
    assert(meta(1).getAs[Int]("width") == 20 && meta(1).getAs[Int]("height") == 100)
    // the non-image payload takes the deterministic fallback (1..64 range)
    val fw = meta(2).getAs[Int]("width")
    assert(fw >= 1 && fw <= 64)
    val rs = graft.ops.Ops.resizeDims(payloads).orderBy("doc_id").collect()
    assert(rs(0).getAs[Int]("new_w") == 32 && rs(0).getAs[Int]("new_h") == 24)
    assert(rs(1).getAs[Int]("new_w") == 6 && rs(1).getAs[Int]("new_h") == 32)
  }

  /** animated GIF with one solid-color full frame per rgb value. */
  private def animatedGif(w: Int, h: Int, rgbs: Seq[Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    rgbs.foreach { rgb =>
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) } finally g.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("gif frames larger than the first are not clipped (canvas = max extents)") {
    // first frame 8x8, second 16x16: the canvas must cover the larger
    // descriptor rectangle, not the first frame's dims
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    Seq((8, 0xFF0000), (16, 0x0000FF)).foreach { case (dim, rgb) =>
      val img = new java.awt.image.BufferedImage(dim, dim, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, dim, dim) } finally g.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val frames = ImageCodec.gifFrames(bos.toByteArray)
    assert(frames.size == 2)
    assert(frames.forall(f => f.getWidth == 16 && f.getHeight == 16))
    // the second frame's pixels beyond 8x8 survived (blue, quantized)
    val c = frames(1).getRGB(12, 12) & 0xFFFFFF
    assert((c & 0xFF) > 0x80 && (c >> 16) < 0x40)
  }

  test("mm_audio_meta kernel: real WAV decode; fallback for non-audio") {
    // 0.25 s of 16-bit mono PCM at 8 kHz in a RIFF/WAVE container
    val n = 2000
    val pcm = new Array[Byte](n * 2)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val wav = out.toByteArray
    assert(graft.ops.Ops.audioMetaOf(wav) == ((8000, 1, n.toLong)))
    // non-audio payloads: deterministic hash fallback in the op's ranges
    val (rate, ch, frames) = graft.ops.Ops.audioMetaOf("plain prose".getBytes("UTF-8"))
    assert(rate >= 8000 && rate <= 48000 && rate % 8000 == 0)
    assert(ch == 1 || ch == 2)
    assert(frames == "plain prose".getBytes("UTF-8").length / 4)
  }

  test("decode rejects header-claimed giant dimensions (no OOM allocation)") {
    // hand-built PNG header claiming 60000x60000 from a 50-byte payload
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write("IHDR".getBytes)
    def be32(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    ihdr.write(be32(60000)); ihdr.write(be32(60000))
    ihdr.write(Array[Byte](8, 2, 0, 0, 0))
    val body = ihdr.toByteArray
    val crc = new java.util.zip.CRC32(); crc.update(body)
    out.write(be32(13)); out.write(body); out.write(be32(crc.getValue.toInt))
    val giant = out.toByteArray
    assert(ImageCodec.isImage(giant)) // passes the magic prescreen...
    assert(ImageCodec.decode(giant).isEmpty) // ...but the dims gate refuses
    // mm ops degrade to the deterministic fallback instead of OOMing
    import spark.implicits._
    val meta = graft.ops.Ops.binaryMeta(Seq((9L, giant)).toDS()).collect()
    assert(meta.head.getAs[Int]("width") <= 64)
  }

  test("gif frame decode: real composited frames; fallback for stills") {
    val gif = animatedGif(16, 12, Seq(0xFF0000, 0x00FF00, 0x0000FF))
    val frames = ImageCodec.gifFrames(gif)
    assert(frames.size == 3)
    assert(frames.forall(f => f.getWidth == 16 && f.getHeight == 12))
    // GIF is palettized, so colors are quantized — frames must be solid
    // and pairwise different, and fingerprints deterministic
    val fps = frames.map(ImageCodec.framePixelFingerprint)
    assert(fps.distinct.size == 3)
    assert(fps == frames.map(ImageCodec.framePixelFingerprint))
    // single-frame GIFs are stills: not the animation path
    assert(ImageCodec.gifFrames(animatedGif(8, 8, Seq(0x123456))).isEmpty)
    assert(ImageCodec.gifFrames(png(8, 8, 0)).isEmpty)

    // the frame-sample kernel routes animated GIFs through real decode
    val real = graft.ops.Ops.frameSamples(gif, 4)
    assert(real.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(real.map(_._2) == Seq(0L, 0L, 1L, 2L)) // k=4 over 3 frames
    assert(real.map(_._3).toSet == fps.toSet)
    // non-gif payloads keep the deterministic byte-slice fallback
    val fb = graft.ops.Ops.frameSamples("some plain narrative text payload".getBytes("UTF-8"), 4)
    assert(fb.size == 4 && fb.map(_._2) == fb.map(_._2).sorted)
  }
}
