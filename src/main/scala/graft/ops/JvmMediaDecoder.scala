package graft.ops

import java.io.ByteArrayInputStream

import MultimodalOps.{MediaDecoder, MediaMeta}

/** A REAL media decoder with zero external dependencies: the JDK itself
  * decodes PNG / JPEG / BMP / GIF (`javax.imageio.ImageIO`, pure-Java
  * readers in `java.desktop`) and WAV / AIFF / AU PCM audio
  * (`javax.sound.sampled.AudioSystem`). This replaces the deterministic
  * [[MultimodalOps.StubDecoder]] wherever genuine payloads flow — same
  * [[MediaDecoder]] seam, so pipelines swap one injected object.
  *
  * Semantics:
  *  - images: `mediaType = "image"`, width/height are the decoded pixel
  *    dimensions; features = mean luminance over `dims` equal-width
  *    vertical bands (a real, content-dependent signature — two images
  *    differing anywhere in a band differ in the vector);
  *  - audio: `mediaType = "audio"`, width = sample rate (Hz), height =
  *    channel count (the meta record is shaped for images; audio reuses
  *    the two slots, documented here); features = RMS energy over
  *    `dims` equal-length sample windows of the first channel;
  *  - anything else: `mediaType = "binary"`, zero dimensions, features
  *    fall back to the stub's byte-fold — unknown formats stay usable
  *    for dedup/fingerprinting rather than failing the partition.
  *
  * Decoding is headless-safe (no display needed) and per-row inputs are
  * self-contained byte arrays, so the decoder is a stateless singleton —
  * `open()` has nothing to initialize. */
object JvmMediaDecoder extends MediaDecoder {

  private def sha256Hex(payload: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(payload)
      .map("%02x".format(_)).mkString

  private def isImage(p: Array[Byte]): Boolean =
    p.length >= 8 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte) ||               // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
      (p(0) == 'B' && p(1) == 'M'))

  private def isAudio(p: Array[Byte]): Boolean =
    p.length >= 12 && (
      (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') ||
      (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M') || // AIFF
      (p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'))   // AU

  override def decode(payload: Array[Byte]): MediaMeta = {
    val sha = sha256Hex(payload)
    if (isImage(payload)) {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      if (img != null)
        return MediaMeta("image", payload.length.toLong, sha,
          img.getWidth, img.getHeight)
    } else if (isAudio(payload)) {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        return MediaMeta("audio", payload.length.toLong, sha,
          fmt.getSampleRate.toInt, fmt.getChannels)
      } finally in.close()
    }
    MediaMeta("binary", payload.length.toLong, sha, 0, 0)
  }

  override def features(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    if (isImage(payload)) {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
      if (img != null) return imageBands(img, dims)
    } else if (isAudio(payload)) {
      val samples = pcmSamples(payload)
      if (samples.length > 0) return rmsWindows(samples, dims)
    }
    MultimodalOps.StubDecoder.features(payload, dims)
  }

  /** Mean luminance (ITU-R 601 weights) per vertical band. */
  private def imageBands(img: java.awt.image.BufferedImage,
      dims: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Float](dims)
    val counts = new Array[Long](dims)
    var x = 0
    while (x < w) {
      val band = math.min(dims - 1, x * dims / w)
      var y = 0
      while (y < h) {
        val rgb = img.getRGB(x, y)
        val lum = 0.299f * ((rgb >> 16) & 0xff) +
          0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)
        out(band) += lum / 255.0f
        counts(band) += 1
        y += 1
      }
      x += 1
    }
    var i = 0
    while (i < dims) {
      if (counts(i) > 0) out(i) /= counts(i)
      i += 1
    }
    out
  }

  /** First-channel PCM samples normalized to [−1, 1]. */
  private def pcmSamples(payload: Array[Byte]): Array[Float] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      val bytes = in.readAllBytes()
      val frame = fmt.getFrameSize
      val bits = fmt.getSampleSizeInBits
      if (frame <= 0 || (bits != 8 && bits != 16)) return Array.empty
      val n = bytes.length / frame
      val out = new Array[Float](n)
      val le = !fmt.isBigEndian
      var i = 0
      while (i < n) {
        val off = i * frame
        out(i) =
          if (bits == 8) ((bytes(off) & 0xff) - 128) / 128.0f
          else {
            val (lo, hi) = if (le) (bytes(off), bytes(off + 1))
              else (bytes(off + 1), bytes(off))
            ((hi << 8) | (lo & 0xff)).toShort / 32768.0f
          }
        i += 1
      }
      out
    } finally in.close()
  }

  /** RMS energy per equal-length window. */
  private def rmsWindows(samples: Array[Float], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    val counts = new Array[Long](dims)
    var i = 0
    while (i < samples.length) {
      val w = math.min(dims - 1, i * dims / samples.length)
      out(w) += samples(i) * samples(i)
      counts(w) += 1
      i += 1
    }
    var j = 0
    while (j < dims) {
      if (counts(j) > 0) out(j) = math.sqrt(out(j) / counts(j)).toFloat
      j += 1
    }
    out
  }
}
