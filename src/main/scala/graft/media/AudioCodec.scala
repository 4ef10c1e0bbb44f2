package graft.media

/** Real audio metadata extraction on the JDK's built-in javax.sound
  * (WAV/AIFF/AU — PCM formats, no external jars). Same mixed-corpus
  * contract as ImageCodec: magic-prescreen, real decode when the payload
  * is actual audio, None otherwise so callers can fall back.
  */
object AudioCodec {

  final case class AudioMeta(
      sampleRate: Float,
      channels: Int,
      frames: Long,
      durationSec: Double)

  /** magic-bytes prescreen: RIFF/WAVE, AIFF (FORM), AU (.snd). */
  def isAudio(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 && {
      val riff = bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'
      val form = bytes(0) == 'F' && bytes(1) == 'O' && bytes(2) == 'R' && bytes(3) == 'M'
      val snd = bytes(0) == '.' && bytes(1) == 's' && bytes(2) == 'n' && bytes(3) == 'd'
      riff || form || snd
    }

  def decodeMeta(bytes: Array[Byte]): Option[AudioMeta] =
    if (!isAudio(bytes)) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          val frames = in.getFrameLength
          val dur = if (f.getFrameRate > 0 && frames >= 0) frames / f.getFrameRate.toDouble else -1.0
          Some(AudioMeta(f.getSampleRate, f.getChannels, frames, dur))
        } finally in.close()
      } catch { case _: Throwable => None }

  /** decode PCM samples of channel 0 as doubles in [-1, 1] (16-bit PCM) —
    * the feature-extraction entry point (e.g. for embeddings/fingerprints). */
  def decodeSamples(bytes: Array[Byte], maxSamples: Int = 1 << 20): Option[Array[Double]] =
    if (!isAudio(bytes)) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          if (f.getSampleSizeInBits != 16) None
          else {
            val frameSize = f.getFrameSize
            val buf = in.readAllBytes()
            val n = math.min(buf.length / frameSize, maxSamples)
            val out = new Array[Double](n)
            val le = !f.isBigEndian
            var i = 0
            while (i < n) {
              val off = i * frameSize
              val s =
                if (le) ((buf(off + 1) << 8) | (buf(off) & 0xFF)).toShort
                else ((buf(off) << 8) | (buf(off + 1) & 0xFF)).toShort
              out(i) = s / 32768.0
              i += 1
            }
            Some(out)
          }
        } finally in.close()
      } catch { case _: Throwable => None }
}
