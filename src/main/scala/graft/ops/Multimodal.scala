package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (driver contract: treat image/audio/video as
  * opaque binary columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run as batch kernels over partitions).
  *
  * Decode kernels: PPM/BMP/WAV are REAL pure-JVM codecs, JPEG/PNG/GIF
  * decode through the JDK's own `javax.imageio`, and RIFF/AVI video
  * DEMUX ([[MediaKernels.demuxAvi]]) is a real container walk — all real
  * header-parse + pixel/PCM/chunk walks with no third-party
  * dependencies, and IMA ADPCM ([[MediaKernels.decodeImaAdpcm]]) gives
  * compressed audio a real integer-DSP decode path. Only perceptual
  * video-frame codecs (H.264-class) and resampling remain deterministic
  * stand-ins (this container ships no such libraries); a production
  * deployment swaps those in [[MediaKernels]] and nothing else changes.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRecord(media_id: Long, mime: String, bytes: Array[Byte],
                               width: Int, height: Int, duration_ms: Long)

  /** Extracted features: fixed-dim embedding + scalar stats. */
  final case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
                                 checksum: String, feature: Array[Float])

  /** A decoded raster image: interleaved channel samples, row-major. */
  final case class DecodedImage(width: Int, height: Int, maxVal: Int,
                                pixels: Array[Byte])

  /** Decoded PCM audio. */
  final case class DecodedAudio(sampleRate: Int, numChannels: Int,
                                bitsPerSample: Int, samples: Array[Short])

  /** Codec kernels. PPM (binary P6), BMP (24-bit), WAV (RIFF PCM16) and
    * the RIFF/AVI container demux ([[muxAvi]]/[[demuxAvi]]) are REAL
    * hand-rolled pure-JVM implementations; JPEG/PNG/GIF are REAL via
    * the JDK's `javax.imageio` ([[decodeImage]]/[[encodeImage]], zero new
    * deps); IMA ADPCM ([[decodeImaAdpcm]]/[[encodeImaAdpcm]]) is a REAL
    * compressed-audio codec pair. Only perceptual video-frame codecs and
    * resampling remain deterministic byte-level stand-ins. All kernels are partition-local
    * and stateless, so a production deployment swaps the remaining
    * stand-ins without touching the operators. */
  object MediaKernels {

    // Executor-side hygiene for the ImageIO path: never touch a display
    // (headless), and keep the decode pipeline in-memory — ImageIO's
    // default disk-backed stream cache would add a temp-file write per
    // decoded image, pure churn for a 100 TB scan.
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)

    /** Decode a binary PPM (P6) image: `P6 <ws> width <ws> height <ws>
      * maxval <single-ws> raw-RGB-triples`. Full netpbm header grammar —
      * `#` comments and arbitrary whitespace runs between tokens are
      * accepted. Returns None for anything that is not a well-formed P6
      * payload (wrong magic, truncated raster, maxval > 255). */
    def decodePpm(bytes: Array[Byte]): Option[DecodedImage] = {
      if (bytes == null || bytes.length < 2 ||
          bytes(0) != 'P' || bytes(1) != '6') return None
      var pos = 2
      def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
      // netpbm: a comment runs from '#' to end-of-line and counts as ws
      def skipWs(): Unit = {
        var more = true
        while (more && pos < bytes.length) {
          if (isWs(bytes(pos))) pos += 1
          else if (bytes(pos) == '#') {
            while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          } else more = false
        }
      }
      def readInt(): Int = {
        skipWs()
        var v = 0L
        var seen = false
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          // saturate instead of wrapping: absurd digit strings must read
          // as invalid, not alias a small positive dimension
          if (v <= Int.MaxValue) v = v * 10 + (bytes(pos) - '0')
          pos += 1; seen = true
        }
        if (!seen || v > Int.MaxValue) -1 else v.toInt
      }
      val w = readInt(); val h = readInt(); val maxVal = readInt()
      if (w <= 0 || h <= 0 || maxVal <= 0 || maxVal > 255) return None
      // exactly ONE whitespace byte separates maxval from the raster
      if (pos >= bytes.length || !isWs(bytes(pos))) return None
      pos += 1
      // dims validated in Long space: a hostile header like 46341×46341
      // would wrap w*h*3 in Int (negative or zero), slipping past the
      // length guard and breaking the malformed→None contract
      val nL = w.toLong * h.toLong * 3L
      if (nL > bytes.length.toLong - pos) return None
      val n = nL.toInt
      Some(DecodedImage(w, h, maxVal,
        java.util.Arrays.copyOfRange(bytes, pos, pos + n)))
    }

    /** Encode an interleaved-RGB raster as binary PPM (P6) — the writer
      * half of the codec; round-trips through [[decodePpm]]. */
    def encodePpm(img: DecodedImage): Array[Byte] = {
      val header = s"P6\n${img.width} ${img.height}\n${img.maxVal}\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + img.pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
      out
    }

    /** Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER or longer):
      * `BM` magic, pixel rows BGR-interleaved and padded to 4-byte
      * boundaries, bottom-up by default (negative height = top-down, per
      * the spec). Returns a top-down RGB [[DecodedImage]] — the row
      * reversal, per-row padding walk, and BGR→RGB swap are exactly the
      * bugs a checksum can't see, which is why q87's oracle checks an
      * order-sensitive functional of the decoded raster. None for
      * non-BMP, compressed, non-24-bit, or truncated payloads; dimension
      * arithmetic in Long space like [[decodePpm]]. */
    def decodeBmp(bytes: Array[Byte]): Option[DecodedImage] = {
      if (bytes == null || bytes.length < 54 ||
          bytes(0) != 'B' || bytes(1) != 'M') return None
      def u16(off: Int) = (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
      def u32(off: Int): Long =
        (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
        ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
      val dataOff = u32(10)
      val hdrSize = u32(14)
      if (hdrSize < 40L) return None // BITMAPCOREHEADER not supported
      val w = u32(18).toInt // i32: width must be positive anyway
      val hRaw = u32(22).toInt // i32: negative = top-down row order
      val planes = u16(26); val bpp = u16(28); val comp = u32(30)
      if (w <= 0 || hRaw == 0 || planes != 1 || bpp != 24 || comp != 0L) return None
      val topDown = hRaw < 0
      val h = math.abs(hRaw)
      val rowL = ((w.toLong * 3L + 3L) / 4L) * 4L // padded row stride
      val pixL = w.toLong * h.toLong * 3L
      if (pixL > Int.MaxValue.toLong) return None
      if (dataOff < 14L + hdrSize || dataOff + rowL * h > bytes.length.toLong) return None
      val rowSize = rowL.toInt
      val pixels = new Array[Byte](pixL.toInt)
      var r = 0
      while (r < h) {
        val srcRow = if (topDown) r else h - 1 - r
        val base = dataOff.toInt + srcRow * rowSize
        var x = 0
        while (x < w) {
          val d = 3 * (r * w + x)
          pixels(d) = bytes(base + 3 * x + 2)     // R (stored as BGR)
          pixels(d + 1) = bytes(base + 3 * x + 1) // G
          pixels(d + 2) = bytes(base + 3 * x)     // B
          x += 1
        }
        r += 1
      }
      Some(DecodedImage(w, h, 255, pixels))
    }

    /** Encode a top-down RGB raster as a standard bottom-up 24-bit BMP
      * (54-byte headers, BGR, 4-byte-padded rows) — the writer half;
      * round-trips through [[decodeBmp]]. */
    def encodeBmp(img: DecodedImage): Array[Byte] = {
      val w = img.width; val h = img.height
      val rowSize = ((w * 3 + 3) / 4) * 4
      val dataLen = rowSize * h
      val out = java.nio.ByteBuffer.allocate(54 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
        .putInt(0).putInt(54)
        .putInt(40).putInt(w).putInt(h) // positive height: bottom-up
        .putShort(1).putShort(24).putInt(0).putInt(dataLen)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      val arr = out.array()
      var r = 0
      while (r < h) {
        val dstBase = 54 + (h - 1 - r) * rowSize // bottom-up
        var x = 0
        while (x < w) {
          val s = 3 * (r * w + x)
          arr(dstBase + 3 * x) = img.pixels(s + 2)     // B
          arr(dstBase + 3 * x + 1) = img.pixels(s + 1) // G
          arr(dstBase + 3 * x + 2) = img.pixels(s)     // R
          x += 1
        }
        r += 1
      }
      arr
    }

    /** Decode any container the JDK's `javax.imageio` registry reads —
      * JPEG, PNG, GIF, and (via the JDK plugin) BMP/WBMP — to the same
      * top-down interleaved-RGB [[DecodedImage]] the hand-rolled codecs
      * produce. Alpha is dropped (composited against black by the ARGB
      * read), 16-bit and palette formats are normalized to 8-bit RGB by
      * the color model. Returns None for unrecognized or corrupt
      * payloads instead of throwing, matching the other decoders. */
    def decodeImage(bytes: Array[Byte]): Option[DecodedImage] = {
      if (bytes == null || bytes.length < 4) return None
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) return None
        val w = img.getWidth; val h = img.getHeight
        // 3-channel output must fit an Array[Byte]; reject absurd dims
        if (w <= 0 || h <= 0 || w.toLong * h.toLong * 3L > Int.MaxValue.toLong)
          return None
        // bulk ARGB read: one sample-model conversion pass, not per-pixel
        // getRGB calls — this is the partition-local hot loop
        val argb = img.getRGB(0, 0, w, h, null, 0, w)
        val px = new Array[Byte](w * h * 3)
        var i = 0
        while (i < argb.length) {
          val v = argb(i)
          px(3 * i) = ((v >> 16) & 0xFF).toByte
          px(3 * i + 1) = ((v >> 8) & 0xFF).toByte
          px(3 * i + 2) = (v & 0xFF).toByte
          i += 1
        }
        Some(DecodedImage(w, h, 255, px))
      } catch { case _: Exception => None } // corrupt stream → None, not crash
    }

    /** Encode a top-down RGB raster via `javax.imageio` to any writer the
      * JDK registers (`"png"`, `"jpg"`, `"gif"`, `"bmp"`). PNG/GIF/BMP
      * round-trip [[decodeImage]] pixel-exact; JPEG is lossy by nature,
      * so only dimensions round-trip exactly (content within quantization
      * error — spec'd with a tolerance, oracled on dims). */
    def encodeImage(img: DecodedImage, format: String): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(img.width, img.height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val argb = new Array[Int](img.width * img.height)
      var i = 0
      while (i < argb.length) {
        argb(i) = ((img.pixels(3 * i) & 0xFF) << 16) |
          ((img.pixels(3 * i + 1) & 0xFF) << 8) | (img.pixels(3 * i + 2) & 0xFF)
        i += 1
      }
      bi.setRGB(0, 0, img.width, img.height, argb, 0, img.width)
      val bos = new java.io.ByteArrayOutputStream()
      val ok = javax.imageio.ImageIO.write(bi, format, bos)
      require(ok, s"no ImageIO writer for format '$format'")
      bos.toByteArray
    }

    /** Decode a RIFF/WAVE container with a PCM (format 1) `fmt ` chunk and
      * 8- or 16-bit samples. Walks the chunk list (chunks are word-aligned:
      * odd-size chunks carry a pad byte), so extra chunks like LIST/INFO
      * are skipped, as the RIFF spec requires. 16-bit samples are
      * little-endian signed; 8-bit samples are unsigned, shifted to signed
      * (centered at 0) for a uniform return type. */
    def decodeWav(bytes: Array[Byte]): Option[DecodedAudio] = {
      if (bytes == null || bytes.length < 12) return None
      def tag(off: Int) = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      def u16(off: Int) = (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
      def u32(off: Int): Long =
        (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
        ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var pos = 12
      var sampleRate = -1; var numCh = -1; var bits = -1
      var dataOff = -1; var dataLen = -1
      while (pos + 8 <= bytes.length && (dataOff < 0 || sampleRate < 0)) {
        val id = tag(pos)
        val sz = u32(pos + 4)
        if (sz < 0 || pos + 8 + sz > bytes.length) return None
        val szi = sz.toInt
        id match {
          case "fmt " =>
            if (szi < 16) return None
            val audioFormat = u16(pos + 8)
            if (audioFormat != 1) return None // PCM only
            numCh = u16(pos + 10)
            sampleRate = u32(pos + 12).toInt
            bits = u16(pos + 22)
          case "data" => dataOff = pos + 8; dataLen = szi
          case _ => () // LIST/INFO/fact/... skipped
        }
        pos += 8 + szi + (szi & 1) // word alignment: odd chunks pad a byte
      }
      if (sampleRate <= 0 || numCh <= 0 || dataOff < 0) return None
      bits match {
        case 16 =>
          val n = dataLen / 2
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = ((bytes(dataOff + 2 * i) & 0xFF) |
              (bytes(dataOff + 2 * i + 1) << 8)).toShort
            i += 1
          }
          Some(DecodedAudio(sampleRate, numCh, 16, samples))
        case 8 =>
          val samples = new Array[Short](dataLen)
          var i = 0
          while (i < dataLen) {
            samples(i) = ((bytes(dataOff + i) & 0xFF) - 128).toShort
            i += 1
          }
          Some(DecodedAudio(sampleRate, numCh, 8, samples))
        case _ => None
      }
    }

    /** Encode mono/stereo PCM16 as a minimal RIFF/WAVE file — the writer
      * half; round-trips through [[decodeWav]]. */
    def encodeWav(audio: DecodedAudio): Array[Byte] = {
      require(audio.bitsPerSample == 16, "writer emits PCM16 only")
      val dataLen = audio.samples.length * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      out.put("RIFF".getBytes(ascii)).putInt(36 + dataLen)
        .put("WAVE".getBytes(ascii))
        .put("fmt ".getBytes(ascii)).putInt(16)
        .putShort(1).putShort(audio.numChannels.toShort)
        .putInt(audio.sampleRate)
        .putInt(audio.sampleRate * audio.numChannels * 2)
        .putShort((audio.numChannels * 2).toShort).putShort(16)
        .put("data".getBytes(ascii)).putInt(dataLen)
      audio.samples.foreach(out.putShort)
      out.array()
    }

    /** Image features shared by every raster decode path: per-channel
      * mean/std of decoded pixel values (6 dims) + aspect + normalized
      * maxval. */
    private def imageFeatures(img: DecodedImage, dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      val sums = new Array[Double](3); val sqs = new Array[Double](3)
      var i = 0
      while (i < img.pixels.length) {
        val v = (img.pixels(i) & 0xFF).toDouble / img.maxVal
        sums(i % 3) += v; sqs(i % 3) += v * v
        i += 1
      }
      val nPix = math.max(1, img.width * img.height)
      var c = 0
      while (c < 3 && 2 * c + 1 < dim) {
        val mean = sums(c) / nPix
        out(2 * c) = mean.toFloat
        out(2 * c + 1) = math.sqrt(math.max(0, sqs(c) / nPix - mean * mean)).toFloat
        c += 1
      }
      if (dim > 6) out(6) = img.width.toFloat / math.max(1, img.height)
      if (dim > 7) out(7) = img.maxVal / 255.0f
      out
    }

    /** Decode+featurize. Recognized containers get REAL decoded features:
      * PPM/BMP (hand-rolled) and JPEG/PNG/GIF (ImageIO) → per-channel
      * mean/std of decoded pixel values (6 dims) + aspect + normalized
      * maxval; WAV → mean/RMS/zero-cross-rate/peak over decoded samples +
      * rate/channels/duration. Unrecognized payloads fall back to
      * byte-histogram moments (deterministic stand-in for the remaining
      * codec-less formats, e.g. video containers). */
    def featurize(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      if (bytes == null || bytes.isEmpty) return out
      // cheap hand-rolled magics first (no ImageIO registry probe cost),
      // then the ImageIO registry for compressed formats
      decodePpm(bytes).orElse(decodeBmp(bytes)).orElse(decodeImage(bytes)) match {
        case Some(img) => return imageFeatures(img, dim)
        case None => ()
      }
      decodeWav(bytes) match {
        case Some(a) =>
          // a VALID but empty-data WAV is still audio: emit zeroed signal
          // stats with the real metadata dims, never the byte-histogram
          // fallback (which would embed 44 header bytes as if they were
          // arbitrary binary content)
          var sum = 0.0; var sq = 0.0; var zc = 0; var peak = 0.0
          var i = 0
          while (i < a.samples.length) {
            val v = a.samples(i).toDouble / 32768.0
            sum += v; sq += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            if (i > 0 && (a.samples(i) >= 0) != (a.samples(i - 1) >= 0)) zc += 1
            i += 1
          }
          val n = math.max(1, a.samples.length)
          if (dim > 0) out(0) = (sum / n).toFloat
          if (dim > 1) out(1) = math.sqrt(sq / n).toFloat
          if (dim > 2) out(2) = zc.toFloat / n
          if (dim > 3) out(3) = peak.toFloat
          if (dim > 4) out(4) = a.sampleRate / 48000.0f
          if (dim > 5) out(5) = a.numChannels.toFloat
          if (dim > 6) out(6) = a.samples.length.toFloat /
            math.max(1, a.sampleRate * a.numChannels)
          return out
        case None => ()
      }
      // fallback: byte-histogram moments (unrecognized container)
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xFF) / 255.0f
        i += 1
      }
      out.map(x => x / bytes.length * dim)
    }

    /** STUB frame-sample: byte offsets of evenly spaced "frames".
      * (Real: demux video, decode every k-th keyframe — see
      * [[demuxAvi]] for the real container walk.) */
    def framePositions(nBytes: Long, nFrames: Int): Seq[Long] =
      if (nBytes <= 0 || nFrames <= 0) Nil
      else (0 until nFrames).map(i => i * nBytes / nFrames)

    /** A demuxed video: container metadata + raw per-frame payloads
      * (codec bytes — decoding them is the codec's job, splitting them
      * out of the container is the demuxer's, and only the latter is
      * needed for frame sampling / shard packing / per-frame routing). */
    final case class DemuxedVideo(width: Int, height: Int, usPerFrame: Int,
                                  frames: Array[Array[Byte]])

    /** REAL RIFF/AVI video-container mux: writes a minimal standard AVI —
      * LIST hdrl (avih main header + one 'vids' stream with strh/strf
      * BITMAPINFOHEADER) and LIST movi holding one '00dc' chunk per
      * frame, word-aligned per the RIFF rule. Round-trips through
      * [[demuxAvi]]. */
    def muxAvi(width: Int, height: Int, usPerFrame: Int,
               frames: Array[Array[Byte]]): Array[Byte] = {
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val moviPayload = frames.map(f => 8 + f.length + (f.length & 1)).sum + 4
      val hdrlPayload = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40)))
      val riffPayload = 4 + (8 + hdrlPayload) + (8 + moviPayload)
      val out = java.nio.ByteBuffer.allocate(8 + riffPayload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(s: String): Unit = out.put(s.getBytes(ascii))
      fourcc("RIFF"); out.putInt(riffPayload); fourcc("AVI ")
      fourcc("LIST"); out.putInt(hdrlPayload); fourcc("hdrl")
      // avih: MainAVIHeader (56 bytes)
      fourcc("avih"); out.putInt(56)
      out.putInt(usPerFrame).putInt(0).putInt(0).putInt(0) // usPerFrame, maxBps, pad, flags
      out.putInt(frames.length).putInt(0).putInt(1)        // totalFrames, initial, streams
      out.putInt(frames.map(_.length).foldLeft(0)(math.max))
      out.putInt(width).putInt(height)
      out.putInt(0).putInt(0).putInt(0).putInt(0)          // reserved[4]
      // LIST strl: strh + strf
      fourcc("LIST"); out.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
      fourcc("strh"); out.putInt(56)
      fourcc("vids"); fourcc("DIB ")
      out.putInt(0).putInt(0).putInt(0)                    // flags, prio+lang, initial
      out.putInt(usPerFrame).putInt(1000000)               // scale, rate (fps = rate/scale)
      out.putInt(0).putInt(frames.length)                  // start, length
      out.putInt(frames.map(_.length).foldLeft(0)(math.max))
      out.putInt(-1).putInt(0)                             // quality, sampleSize
      out.putShort(0).putShort(0)
        .putShort(width.toShort).putShort(height.toShort)  // rcFrame
      fourcc("strf"); out.putInt(40)                       // BITMAPINFOHEADER
      out.putInt(40).putInt(width).putInt(height)
      out.putShort(1).putShort(24)
      out.putInt(0).putInt(width * height * 3)
      out.putInt(0).putInt(0).putInt(0).putInt(0)
      // LIST movi: one 00dc chunk per frame
      fourcc("LIST"); out.putInt(moviPayload); fourcc("movi")
      frames.foreach { f =>
        fourcc("00dc"); out.putInt(f.length); out.put(f)
        if ((f.length & 1) == 1) out.put(0.toByte) // RIFF word alignment
      }
      out.array()
    }

    /** REAL RIFF/AVI video-container demux: validates the RIFF/'AVI '
      * envelope, walks the chunk tree (honoring the odd-size pad rule),
      * reads width/height/usPerFrame out of the avih main header and
      * splits every '..dc'/'..db' frame chunk out of LIST movi. This is
      * the container half of video decode — the part frame sampling and
      * per-frame routing need; codec payloads pass through opaque. */
    def demuxAvi(bytes: Array[Byte]): Option[DemuxedVideo] = {
      if (bytes == null || bytes.length < 12) return None
      def tag(off: Int) = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      def u32(off: Int): Long =
        (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
        ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
      if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
      var width = -1; var height = -1; var usPerFrame = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(from: Int, until: Int): Boolean = {
        var pos = from
        while (pos + 8 <= until) {
          val id = tag(pos)
          val sz = u32(pos + 4)
          if (sz < 0 || pos + 8 + sz > until) return false
          val szi = sz.toInt
          id match {
            case "LIST" =>
              if (szi < 4) return false
              // recurse into the list body past its subtype fourcc
              if (!walk(pos + 12, pos + 8 + szi)) return false
            case "avih" =>
              if (szi < 56) return false
              usPerFrame = u32(pos + 8).toInt
              width = u32(pos + 8 + 32).toInt
              height = u32(pos + 8 + 36).toInt
            case _ if id.endsWith("dc") || id.endsWith("db") =>
              frames += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + szi)
            case _ => () // strh/strf/idx1/JUNK… skipped
          }
          pos += 8 + szi + (szi & 1) // word alignment
        }
        true
      }
      if (!walk(12, bytes.length)) return None
      if (width <= 0 || height <= 0 || usPerFrame <= 0) return None
      Some(DemuxedVideo(width, height, usPerFrame, frames.toArray))
    }

    /** IMA ADPCM quantizer step table (the published 89-entry table). */
    private val imaStepTable: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
      41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
      190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
      724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
      2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
      6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
      16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

    /** IMA ADPCM step-index adjustment per nibble magnitude. */
    private val imaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

    /** REAL compressed-audio decode: IMA ADPCM (DVI4) — one 4-bit nibble
      * per sample, decoded through the published step-table state
      * machine. Pure integer DSP (predictor/index clamps, step >> k
      * accumulation), so decode is bit-exact on any platform. One nibble
      * per input byte (low 4 bits) — the caller unpacks packed bytes if
      * its container stores two nibbles per byte. */
    def decodeImaAdpcm(nibbles: Array[Byte], initPredictor: Int = 0,
                       initIndex: Int = 0): Array[Short] = {
      var pred = math.max(-32768, math.min(32767, initPredictor))
      var idx = math.max(0, math.min(88, initIndex))
      val out = new Array[Short](if (nibbles == null) 0 else nibbles.length)
      var i = 0
      while (i < out.length) {
        val n = nibbles(i) & 0xF
        val step = imaStepTable(idx)
        var diff = step >> 3
        if ((n & 4) != 0) diff += step
        if ((n & 2) != 0) diff += step >> 1
        if ((n & 1) != 0) diff += step >> 2
        pred = if ((n & 8) != 0) pred - diff else pred + diff
        pred = math.max(-32768, math.min(32767, pred))
        idx = math.max(0, math.min(88, idx + imaIndexTable(n & 7)))
        out(i) = pred.toShort
        i += 1
      }
      out
    }

    /** IMA ADPCM encode — the matching compressor (nibble chosen so the
      * decoder's reconstruction tracks the input). Lossy by design;
      * AviDemux/AdpcmSpec bounds the reconstruction error instead of
      * asserting byte equality. */
    def encodeImaAdpcm(samples: Array[Short], initPredictor: Int = 0,
                       initIndex: Int = 0): Array[Byte] = {
      var pred = math.max(-32768, math.min(32767, initPredictor))
      var idx = math.max(0, math.min(88, initIndex))
      val out = new Array[Byte](if (samples == null) 0 else samples.length)
      var i = 0
      while (i < out.length) {
        val step = imaStepTable(idx)
        var delta = samples(i) - pred
        var n = 0
        if (delta < 0) { n = 8; delta = -delta }
        if (delta >= step) { n |= 4; delta -= step }
        if (delta >= (step >> 1)) { n |= 2; delta -= step >> 1 }
        if (delta >= (step >> 2)) n |= 1
        // run the decoder's reconstruction so encoder state tracks it
        var diff = step >> 3
        if ((n & 4) != 0) diff += step
        if ((n & 2) != 0) diff += step >> 1
        if ((n & 1) != 0) diff += step >> 2
        pred = if ((n & 8) != 0) pred - diff else pred + diff
        pred = math.max(-32768, math.min(32767, pred))
        idx = math.max(0, math.min(88, idx + imaIndexTable(n & 7)))
        out(i) = n.toByte
        i += 1
      }
      out
    }

    /** Target dims preserving aspect ratio (the planning half of resize;
      * [[resizeBilinear]] is the real resampler). */
    def resizeDims(w: Int, h: Int, maxSide: Int): (Int, Int) =
      if (w <= 0 || h <= 0 || math.max(w, h) <= maxSide) (w, h)
      else if (w >= h) (maxSide, math.max(1, math.round(h.toFloat * maxSide / w)))
      else (math.max(1, math.round(w.toFloat * maxSide / h)), maxSide)

    /** REAL bilinear resample in 8.8 fixed point — the integer-exact
      * formulation image pipelines use on hardware without reliable fp:
      * source coordinate sx = x*(srcW-1)*256/(dstW-1) (rounded down),
      * neighbor weights are the 8-bit fractional parts, and each output
      * sample is (v00*(256-fx)*(256-fy) + v10*fx*(256-fy) +
      * v01*(256-fx)*fy + v11*fx*fy + 32768) >> 16. Every step is integer
      * arithmetic, so the resample is bit-exact on any platform (and
      * SQL-replayable — q113's oracle recomputes it closed-form).
      * Degenerate 1-wide/1-tall targets pin the coordinate to 0. */
    def resizeBilinear(img: DecodedImage, dstW: Int, dstH: Int): Option[DecodedImage] = {
      if (img == null || dstW <= 0 || dstH <= 0 ||
          img.width <= 0 || img.height <= 0 ||
          img.pixels.length < img.width * img.height * 3) return None
      val out = new Array[Byte](dstW * dstH * 3)
      val sw = img.width; val sh = img.height
      var y = 0
      while (y < dstH) {
        val syFix = if (dstH == 1) 0 else y.toLong * (sh - 1) * 256L / (dstH - 1)
        val sy = (syFix >> 8).toInt
        val fy = (syFix & 0xFF).toInt
        val sy1 = math.min(sh - 1, sy + 1)
        var x = 0
        while (x < dstW) {
          val sxFix = if (dstW == 1) 0 else x.toLong * (sw - 1) * 256L / (dstW - 1)
          val sx = (sxFix >> 8).toInt
          val fx = (sxFix & 0xFF).toInt
          val sx1 = math.min(sw - 1, sx + 1)
          var c = 0
          while (c < 3) {
            val v00 = img.pixels(3 * (sy * sw + sx) + c) & 0xFF
            val v10 = img.pixels(3 * (sy * sw + sx1) + c) & 0xFF
            val v01 = img.pixels(3 * (sy1 * sw + sx) + c) & 0xFF
            val v11 = img.pixels(3 * (sy1 * sw + sx1) + c) & 0xFF
            val v = (v00.toLong * (256 - fx) * (256 - fy)
              + v10.toLong * fx * (256 - fy)
              + v01.toLong * (256 - fx) * fy
              + v11.toLong * fx * fy + 32768L) >> 16
            out(3 * (y * dstW + x) + c) = v.toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      Some(DecodedImage(dstW, dstH, img.maxVal, out))
    }
  }

  /** Batch feature extraction: partition-local iterator transform — the
    * exact shape a codec-backed kernel needs (amortize model/codec init
    * per partition, stream batches, never collect to the driver). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init (codec handles, model weights — here the digest;
      // digest() resets the instance, so one per partition suffices)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val bytes = if (m.bytes == null) Array.empty[Byte] else m.bytes
        MediaFeatures(m.media_id, m.mime, bytes.length.toLong,
          md.digest(bytes).map("%02x".format(_)).mkString,
          MediaKernels.featurize(bytes))
      }
    }
  }

  /** One row of image+audio payloads to decode together. */
  final case class MediaPair(media_id: Long, ppm: Array[Byte], wav: Array[Byte])

  /** Stats computed from DECODED content (not byte checksums): image dims
    * and per-channel pixel sums from the PPM raster; sample count, Σ|s|
    * and non-negative count from the WAV PCM data. Integer-exact, so a
    * SQL oracle that regenerates the expected samples can hash-match. */
  final case class DecodedStats(media_id: Long, img_w: Int, img_h: Int,
                                r_sum: Long, g_sum: Long, b_sum: Long,
                                wav_sr: Int, wav_n: Int,
                                wav_sum_abs: Long, wav_n_nonneg: Long)

  /** Decode PPM + WAV payloads and emit content-derived stats — the real
    * decode path (header parse + raster/PCM walk in [[MediaKernels]]),
    * partition-local like [[extractFeatures]]. Malformed payloads surface
    * as -1 dims rather than dropping rows, so corrupt inputs are visible
    * downstream instead of silently filtered. */
  def decodePairStats(pairs: Dataset[MediaPair]): Dataset[DecodedStats] = {
    import pairs.sparkSession.implicits._
    pairs.mapPartitions { it =>
      it.map { p =>
        val (iw, ih, rs, gs, bs) = MediaKernels.decodePpm(p.ppm) match {
          case Some(img) =>
            val s = new Array[Long](3)
            var i = 0
            while (i < img.pixels.length) { s(i % 3) += img.pixels(i) & 0xFF; i += 1 }
            (img.width, img.height, s(0), s(1), s(2))
          case None => (-1, -1, -1L, -1L, -1L)
        }
        val (sr, n, sa, nn) = MediaKernels.decodeWav(p.wav) match {
          case Some(a) =>
            var sumAbs = 0L; var nonneg = 0L
            var i = 0
            while (i < a.samples.length) {
              sumAbs += math.abs(a.samples(i).toLong)
              if (a.samples(i) >= 0) nonneg += 1
              i += 1
            }
            (a.sampleRate, a.samples.length, sumAbs, nonneg)
          case None => (-1, -1, -1L, -1L)
        }
        DecodedStats(p.media_id, iw, ih, rs, gs, bs, sr, n, sa, nn)
      }
    }
  }

  /** Synthesize a media table from the documents table (the container has
    * no real media fixtures): payload = UTF-8 bytes of the text. Keeps
    * every declared query runnable on driver testdata. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        lit("text/plain").as("mime"),
        encode(col("text"), "UTF-8").as("bytes"),
        lit(0).as("width"), lit(0).as("height"), lit(0L).as("duration_ms"))
      .as[MediaRecord]
  }

  // ---- perceptual-hash image near-dup (the image twin of SimHash) ----------

  /** pHash DCT size (input downsample target) and the retained low-
    * frequency block (top-left LowDim×LowDim of the spectrum → 64 bits). */
  private val PhashDim = 32
  private val PhashLowDim = 8

  /** DCT-II basis in 2^20 fixed point, built from [[StrictMath.cos]] —
    * StrictMath (fdlibm) is specified bit-identical on every JVM/platform,
    * unlike Math.cos (allowed 1–2 ulp latitude), so the hash below is a
    * pure deterministic function of the pixels ANYWHERE it runs: the
    * property that lets a committed fixture oracle gate it and lets two
    * clusters dedup against each other's hashes. */
  private lazy val phashBasis: Array[Array[Long]] =
    Array.tabulate(PhashLowDim, PhashDim) { (k, x) =>
      Math.round(StrictMath.cos(StrictMath.PI * (2 * x + 1) * k
        / (2.0 * PhashDim)) * (1L << 20))
    }

  /** 64-bit perceptual hash (pHash, DCT method) of a decoded image —
    * INTEGER-EXACT end to end:
    *
    *   1. integer luma (77·R + 151·G + 28·B) >> 8;
    *   2. nearest-neighbor downsample to 32×32 by integer index mapping
    *      (sx = x·w div 32 — no float resample in the hash path);
    *   3. 2-D DCT-II of the 32×32 gray plane through the fixed-point
    *      basis (all-Long accumulation: |coef| ≤ 2^58, no overflow);
    *   4. keep the top-left 8×8 low-frequency block, EXCLUDING the DC
    *      term from the median — a uniform brightness shift moves ONLY
    *      DC, so brightness variants hash identically (spec-pinned);
    *   5. bit (k·8+l) set iff coefficient > median of the 63 AC terms.
    *
    * Near-duplicate images (re-encodes, light noise, brightness edits)
    * land within a few bits of Hamming distance; unrelated images are
    * ~32 bits apart (spec-pinned bounds). */
  def phash64(img: DecodedImage): Long = {
    val w = img.width; val h = img.height
    if (w <= 0 || h <= 0) return 0L // degenerate raster: fixed sentinel hash
    // gray 32×32 plane (row-major), values 0..255
    val gray = new Array[Long](PhashDim * PhashDim)
    var y = 0
    while (y < PhashDim) {
      val sy = y * h / PhashDim
      var x = 0
      while (x < PhashDim) {
        val sx = x * w / PhashDim
        val p = (sy * w + sx) * 3
        val r = img.pixels(p) & 0xFF
        val g = img.pixels(p + 1) & 0xFF
        val b = img.pixels(p + 2) & 0xFF
        gray(y * PhashDim + x) = (77 * r + 151 * g + 28 * b) >> 8
        x += 1
      }
      y += 1
    }
    // row pass: tmp(k)(y) = Σ_x basis(k)(x) · gray(y)(x)
    val tmp = Array.ofDim[Long](PhashLowDim, PhashDim)
    var k = 0
    while (k < PhashLowDim) {
      val bk = phashBasis(k)
      var yy = 0
      while (yy < PhashDim) {
        var s = 0L
        var x = 0
        while (x < PhashDim) { s += bk(x) * gray(yy * PhashDim + x); x += 1 }
        tmp(k)(yy) = s
        yy += 1
      }
      k += 1
    }
    // column pass: coef(k)(l) = Σ_y basis(l)(y) · tmp(k)(y)
    val coef = new Array[Long](PhashLowDim * PhashLowDim)
    k = 0
    while (k < PhashLowDim) {
      var l = 0
      while (l < PhashLowDim) {
        val bl = phashBasis(l)
        var s = 0L
        var yy = 0
        while (yy < PhashDim) { s += bl(yy) * tmp(k)(yy); yy += 1 }
        coef(k * PhashLowDim + l) = s
        l += 1
      }
      k += 1
    }
    // median of the 63 AC coefficients (DC at index 0 excluded)
    val ac = java.util.Arrays.copyOfRange(coef, 1, coef.length)
    java.util.Arrays.sort(ac)
    val med = ac(31) // exact middle of 63
    var hash = 0L
    var i = 1
    while (i < coef.length) {
      if (coef(i) > med) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** pHash of a PPM payload; None for undecodable bytes. */
  def phashPpm(bytes: Array[Byte]): Option[Long] =
    MediaKernels.decodePpm(bytes).map(phash64)

  /** Perceptual near-duplicate image pairs over an (id, ppm-bytes) frame:
    * decode + hash partition-local (the corpus-sized CPU work — one pass,
    * no shuffle), then block on 8 exact 8-bit bands of the hash and
    * verify candidates by exact Hamming distance. By pigeonhole, any pair
    * within Hamming ≤ 7 agrees on at least one full band, so for
    * `maxHamming ≤ 7` the banded join is a LOSSLESS candidate generator —
    * the returned pair set equals the brute-force scan's (spec-pinned) at
    * a per-bucket cost of Σ|bucket|² instead of n².
    *
    * Scale shape: identical to [[graft.ops.Dedup.simhashPairs]] — the
    * self-join shuffles on (band, value) only; 8 rows per image cross the
    * exchange (the 8-byte hash, never pixels); no corpus broadcast. */
  def phashPairs(media: DataFrame, idCol: String, bytesCol: String,
                 maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 7,
      "8x8-bit banding is only a lossless candidate generator for maxHamming <= 7")
    val spark = media.sparkSession
    import spark.implicits._
    // materialize (id, hash) ONCE — 16 bytes/image: without this both
    // self-join sides replay the decode+hash pass, and at scale the
    // decode is the expensive half (the q126/q130 postings discipline)
    val hashed = media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        phashPpm(bytes).map(h => (id, h))
      })
      .toDF("mid", "ph")
      .localCheckpoint()
    val banded = hashed.select(col("mid"), col("ph"),
        explode(array((0 until 8).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("ph"), b * 8).bitwiseAND(lit(0xFFL)).as("bval"))): _*)).as("bb"))
      .select(col("mid"), col("ph"), col("bb.band"), col("bb.bval"))
      // pin exchange parallelism before the self-join: AQE sizes the
      // exchange by INPUT bytes (16 B/image survives the checkpoint) and is
      // blind to the candidate-pair explosion a duplicate-heavy corpus
      // produces — the q126/q130 coalescing hazard, compounded here because
      // localCheckpoint pinned the pre-join partitioning (round-12 ADVICE)
      .repartition(spark.sessionState.conf.numShufflePartitions,
        col("band"), col("bval"))
    val popcount = udf((x: Long) => java.lang.Long.bitCount(x))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.mid") < col("b.mid"))
      .select(col("a.mid").as("d1"), col("b.mid").as("d2"),
        popcount(col("a.ph").bitwiseXOR(col("b.ph"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
