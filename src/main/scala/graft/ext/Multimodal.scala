package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video ride through the engine as
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample are per-partition batch transforms.
  *
  * Decode is REAL for the formats the JVM ships codecs for — PNG / JPEG /
  * BMP / GIF via `javax.imageio` ([[ImageCodec]]), PCM WAV via a RIFF
  * parser ([[WavCodec]]), and MJPEG-in-AVI video via a RIFF walk +
  * per-frame imageio JPEG decode ([[AviMjpegCodec]]) — and falls back to
  * the loudly-labeled [[FakeCodec]] byte-statistics stub for formats
  * whose codecs this container lacks (inter-frame video codecs etc.).
  * Codec dispatch is per row by format tag; adding a modality is one
  * [[MediaCodec]] implementation, every plan shape stays identical.
  */
object Multimodal {

  /** Decode image bytes through an explicitly MEMORY-backed
    * `ImageInputStream`. `ImageIO.read(InputStream)` under the default
    * `useCache=true` wraps every decode in a `FileCacheImageInputStream`
    * — a temp file CREATED AND DELETED PER DECODE, so a media scan pays
    * millions of filesystem metadata ops that contend across executor
    * threads (measured: the ×100 video-dedup spot probe read ×15.9 wall
    * for ×10 work; memory-cached decode restored the media family's
    * linear decade curve — PERF.md round 18). Frames here are small
    * byte arrays already in memory; a heap-backed stream is strictly
    * better. Scoped PER CALL rather than the process-global
    * `ImageIO.setUseCache(false)` so an embedding application's own
    * large file/network decodes keep their default disk-backed caching
    * (review r18 — a library must not mutate JVM-global decode policy). */
  private[ext] def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // ImageIO.read(ImageInputStream) closes the stream itself whenever
    // a reader was found (success or decode failure) but NOT on the
    // no-reader null path — close ourselves and swallow the
    // double-close, which ImageInputStreamImpl reports as IOException
    // "closed" (a throw from finally here would DESTROY a successful
    // decode)
    try javax.imageio.ImageIO.read(iis)
    finally try iis.close()
    catch { case _: java.io.IOException => () }
  }

  /** Encode an image to bytes through an explicitly MEMORY-backed
    * `ImageOutputStream` — the write-side twin of [[readImage]]:
    * `ImageIO.write(img, fmt, OutputStream)` under the default
    * `useCache=true` buffers every encode in a
    * `FileCacheImageOutputStream` temp file, the same per-call
    * filesystem tax the decode side measured (PERF.md round 18). */
  private[graft] def writeImage(img: java.awt.image.RenderedImage,
      fmt: String): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(buf)
    // the ImageOutputStream overload leaves the stream caller-owned;
    // close() also flushes the cache into buf — must precede toByteArray
    try {
      if (!javax.imageio.ImageIO.write(img, fmt, ios))
        throw new java.io.IOException(s"no ImageIO writer for '$fmt'")
    } finally ios.close()
    buf.toByteArray
  }

  case class MediaRow(media_id: Long, media: Array[Byte], format: String,
      n_bytes: Long)
  case class MediaFeatures(media_id: Long, format: String, n_bytes: Long,
      content_md5: String, n_frames: Int, features: Array[Double])

  /** One modality's decoder: bytes → (frame count, 3 features). */
  trait MediaCodec extends Serializable {
    def decode(media: Array[Byte]): (Int, Array[Double])
  }

  /** Real still-image decode on the JDK's own `javax.imageio` (PNG, JPEG,
    * BMP, GIF). Features: width, height, mean luminance (BT.601). */
  object ImageCodec extends MediaCodec {
    private[ext] def meanLuminance(img: java.awt.image.BufferedImage): Double = {
      val (w, h) = (img.getWidth, img.getHeight)
      var lum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          lum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      lum / (w.toLong * h)
    }

    def decode(media: Array[Byte]): (Int, Array[Double]) = {
      val img = readImage(media)
      if (img == null) return (0, Array(0.0, 0.0, 0.0))
      (1, Array(img.getWidth.toDouble, img.getHeight.toDouble,
        meanLuminance(img)))
    }
  }

  /** Real VIDEO decode for the one container a bare JVM can fully parse:
    * MJPEG-in-AVI — a RIFF walk to the `movi` list, where every `##dc`/
    * `##db` chunk is a complete JPEG frame `javax.imageio` decodes.
    * (MJPEG is exactly "a JPEG per frame"; no inter-frame codec state,
    * which is why it needs no native library.) Other video codecs keep
    * the labeled [[FakeCodec]] stub.
    *
    * Features mirror [[ImageCodec]]: width, height (from the first
    * decodable frame), mean BT.601 luminance averaged over ALL decodable
    * frames; `n_frames` is the CONTAINER's video-chunk count, so a
    * frame whose JPEG payload is corrupt still counts (loud in the
    * luminance denominator, never silently dropped). Malformed RIFF —
    * wrong signature, crafted negative lengths, truncation — degrades to
    * the zero-feature fallback instead of throwing or looping
    * (the same hostile-bytes posture as [[WavCodec]]).
    *
    * Per-row work is linear in frame count × pixels — the mapPartitions
    * batch shape bounds memory to one video at a time per task; a
    * 100 TB corpus distributes by rows as usual. */
  object AviMjpegCodec extends MediaCodec {
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def fourcc(b: Array[Byte], i: Int): String =
      if (i + 4 <= b.length) new String(b, i, 4, "US-ASCII") else ""

    /** Raw JPEG bytes of every video frame chunk, in container order —
      * the exact-frame-bytes surface the spec pins. Walks top-level RIFF
      * chunks to the `movi` LIST, then its sub-chunks (recursing into
      * `rec ` LISTs, where interleaved AVIs nest frames); `##dc`/`##db`
      * chunks are video frames, `##wb` audio is skipped. */
    def frames(media: Array[Byte]): IndexedSeq[Array[Byte]] = {
      if (media.length < 12 || fourcc(media, 0) != "RIFF" ||
        fourcc(media, 8) != "AVI ") return Vector.empty
      val out = Vector.newBuilder[Array[Byte]]
      def isFrameId(id: String): Boolean =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.substring(2) == "dc" || id.substring(2) == "db")
      // walk chunks in [pos, end); returns false on a malformed length
      // (negative, or failing to advance) so crafted bytes can't loop
      def walk(start: Int, end: Int, inMovi: Boolean): Boolean = {
        var pos = start
        while (pos + 8 <= end) {
          val id = fourcc(media, pos)
          val len = le32(media, pos + 4)
          if (len < 0) return false
          val body = pos + 8
          val avail = math.max(0, math.min(len, end - body))
          if (id == "LIST" && body + 4 <= end) {
            val listType = fourcc(media, body)
            if (listType == "movi" || (inMovi && listType == "rec "))
              walk(body + 4, body + avail, inMovi = true)
          } else if (inMovi && isFrameId(id)) {
            out += java.util.Arrays.copyOfRange(media, body, body + avail)
          }
          val next = body + len + (len & 1) // chunks are word-aligned
          if (next <= pos) return false
          pos = next
        }
        true
      }
      walk(12, media.length, inMovi = false)
      out.result()
    }

    /** idx1-seek frame index: (payload offset, length) per video chunk,
      * WITHOUT touching movi — the O(sampled) path for frame sampling
      * over long videos (the full [[frames]] walk copies every frame to
      * sample three). Returns None — callers fall back to the walk —
      * whenever the index is absent, empty of video entries, or
      * INCONSISTENT with the actual chunk headers: every entry is
      * verified against the bytes it points at, so a lying index can
      * never substitute wrong frames, only cost the fallback.
      * Handles both offset conventions in the wild (movi-relative per
      * the spec, absolute from sloppy writers) by probing which base
      * resolves the first entry to a matching chunk header. */
    def frameIndex(media: Array[Byte]): Option[IndexedSeq[(Int, Int)]] = {
      if (media.length < 12 || fourcc(media, 0) != "RIFF" ||
        fourcc(media, 8) != "AVI ") return None
      var pos = 12
      var moviPos = -1 // position of the "movi" type fourcc
      var idxOff = -1; var idxLen = 0
      while (pos + 8 <= media.length) {
        val id = fourcc(media, pos)
        val len = le32(media, pos + 4)
        if (len < 0) return None
        if (id == "LIST" && pos + 12 <= media.length &&
          fourcc(media, pos + 8) == "movi") moviPos = pos + 8
        else if (id == "idx1") {
          idxOff = pos + 8
          idxLen = math.min(len, media.length - idxOff)
        }
        val next = pos + 8 + len + (len & 1)
        if (next <= pos) return None
        pos = next
      }
      if (moviPos < 0 || idxOff < 0) return None
      def isFrameId(id: String): Boolean =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.substring(2) == "dc" || id.substring(2) == "db")
      val entries = Vector.newBuilder[(Int, Int)]
      var base = -1
      var i = idxOff
      while (i + 16 <= idxOff + idxLen) {
        val id = fourcc(media, i)
        if (isFrameId(id)) {
          val off = le32(media, i + 8)
          val sz = le32(media, i + 12)
          if (off < 0 || sz < 0) return None
          if (base < 0)
            base = if (fourcc(media, moviPos + off) == id) moviPos
            else if (fourcc(media, off) == id) 0
            else return None
          val hdr = base + off
          if (hdr + 8 > media.length || fourcc(media, hdr) != id ||
            le32(media, hdr + 4) != sz || hdr + 8 + sz > media.length)
            return None
          entries += ((hdr + 8, sz))
        }
        i += 16
      }
      val out = entries.result()
      if (out.isEmpty) None else Some(out)
    }

    def decode(media: Array[Byte]): (Int, Array[Double]) = {
      val fs = frames(media)
      if (fs.isEmpty) return (0, Array(0.0, 0.0, 0.0))
      var w = 0.0; var h = 0.0
      var lumSum = 0.0; var decoded = 0
      fs.foreach { f =>
        val img =
          try readImage(f)
          catch { case _: java.io.IOException | _: RuntimeException => null }
        if (img != null) {
          if (decoded == 0) { w = img.getWidth; h = img.getHeight }
          lumSum += ImageCodec.meanLuminance(img)
          decoded += 1
        }
      }
      (fs.length, Array(w, h, lumSum / fs.length))
    }
  }

  /** Real PCM WAV decode: RIFF header walk (no external codec needed).
    * Features: sample rate, channels, RMS amplitude of the 16-bit samples
    * (normalized to [0,1]); frame count = per-channel sample count. */
  object WavCodec extends MediaCodec {
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

    /** RIFF header walk shared by [[decode]] and [[AudioHash]]:
      * (sampleRate, channels, bits, dataOff, dataLen) — zeroed/−1
      * fields when absent, same hostile-bytes posture as the original
      * inline walk (corrupt lengths stop the walk, never loop). */
    private[ext] def header(media: Array[Byte]): (Int, Int, Int, Int, Int) = {
      if (media.length < 44 ||
        new String(media, 0, 4, "US-ASCII") != "RIFF" ||
        new String(media, 8, 4, "US-ASCII") != "WAVE")
        return (0, 0, 0, -1, 0)
      var pos = 12
      var channels = 0; var sampleRate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      var walking = true
      while (walking && pos + 8 <= media.length &&
        (dataOff < 0 || channels == 0)) {
        val id = new String(media, pos, 4, "US-ASCII")
        val len = le32(media, pos + 4)
        if (len < 0) {
          // corrupt/crafted 32-bit length — stop rather than loop forever
          walking = false
        } else {
          if (id == "fmt ") {
            // fields live at pos+8..pos+24; a truncated fmt chunk degrades
            // to the zero-feature fallback instead of throwing
            if (pos + 24 <= media.length) {
              channels = le16(media, pos + 10)
              sampleRate = le32(media, pos + 12)
              bits = le16(media, pos + 22)
            } else walking = false
          } else if (id == "data") {
            dataOff = pos + 8
            dataLen = math.max(0, math.min(len, media.length - dataOff))
          }
          val next = pos + 8 + len + (len & 1) // chunks are word-aligned
          if (next <= pos) walking = false // overflow guard: must advance
          else pos = next
        }
      }
      (sampleRate, channels, bits, dataOff, dataLen)
    }

    def decode(media: Array[Byte]): (Int, Array[Double]) = {
      val (sampleRate, channels, bits, dataOff, dataLen) = header(media)
      if (channels == 0 && sampleRate == 0 && dataOff < 0 &&
        (media.length < 44 ||
          new String(media, 0, 4, "US-ASCII") != "RIFF" ||
          new String(media, 8, 4, "US-ASCII") != "WAVE"))
        return (0, Array(0.0, 0.0, 0.0))
      if (channels == 0 || bits != 16 || dataOff < 0)
        return (0, Array(sampleRate.toDouble, channels.toDouble, 0.0))
      val nSamples = dataLen / 2
      var sumSq = 0.0
      var i = 0
      while (i < nSamples) {
        val s = le16(media, dataOff + i * 2).toShort / 32768.0
        sumSq += s * s
        i += 1
      }
      val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
      (nSamples / channels, Array(sampleRate.toDouble, channels.toDouble, rms))
    }
  }

  /** ====== STUB ====== deterministic fake decoder standing in for codecs
    * this container lacks (non-MJPEG video, proprietary audio). Features
    * are byte statistics — stable, engine-independent, and obviously
    * fake. */
  object FakeCodec extends MediaCodec {
    val FrameBytes = 1024

    def decode(media: Array[Byte]): (Int, Array[Double]) =
      (frameCount(media.length.toLong), features(media))

    def features(media: Array[Byte]): Array[Double] = {
      if (media.isEmpty) return Array(0.0, 0.0, 0.0)
      val sum = media.foldLeft(0L)((a, b) => a + (b & 0xff))
      Array(
        media.length.toDouble,
        sum.toDouble / media.length,          // mean byte value
        (media.head & 0xff).toDouble          // "header" byte
      )
    }

    def frameCount(nBytes: Long): Int =
      math.ceil(nBytes.toDouble / FrameBytes).toInt
  }

  /** Per-format codec dispatch; unknown formats take the labeled stub. */
  def codecFor(format: String): MediaCodec = format.toLowerCase match {
    case "png" | "jpeg" | "jpg" | "bmp" | "gif" => ImageCodec
    case "wav" => WavCodec
    case "avi" | "mjpeg" => AviMjpegCodec
    case _ => FakeCodec
  }

  /** Wrap a text/binary source column as a media column with metadata —
    * the ingestion shape for any opaque-blob modality. */
  def attach(df: DataFrame, idCol: String, binCol: String,
      format: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(binCol).cast("binary").as("media"),
      lit(format).as("format"),
      length(col(binCol).cast("binary")).cast("long").as("n_bytes"))

  /** Per-partition batch decode: one codec instance per partition, rows
    * streamed through it — the mapPartitions shape a real decoder needs
    * (amortized init, bounded memory). */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // codec instances are per-partition (amortized init, bounded memory)
      rows.map { r =>
        val (nFrames, feats) = codecFor(r.format).decode(r.media)
        MediaFeatures(
          media_id = r.media_id,
          format = r.format,
          n_bytes = r.n_bytes,
          content_md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(r.media).map("%02x".format(_)).mkString,
          n_frames = nFrames,
          features = feats)
      }
    }
  }

  case class ResizedMedia(media_id: Long, width: Int, height: Int,
      media: Array[Byte])

  /** Real image resize, per-partition: decode via `javax.imageio`,
    * NEAREST-NEIGHBOR rescale, re-encode PNG. Nearest-neighbor is
    * deliberate: it is exact integer arithmetic
    * (`src = (2·dst+1)·srcDim / (2·dstDim)` — pixel-center mapping,
    * floor division), so the sampled pixels are bit-deterministic on any
    * JVM/platform, where bilinear/bicubic filtering is implementation-
    * defined. Undecodable rows — unrecognized bytes (read returns null)
    * AND recognized-but-corrupt streams (the PNG/JPEG readers THROW on
    * truncation/bad CRC) — yield a 0×0 marker with empty bytes: loud,
    * never silently dropped, never a task failure. Re-encoded PNG bytes
    * are deterministic within a JDK; cross-engine checks should compare
    * DECODED pixels or dimensions, not encoder output. */
  def resizeImages(media: Dataset[MediaRow], width: Int,
      height: Int): Dataset[ResizedMedia] = {
    require(width >= 1 && height >= 1, "target dims must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img =
          try readImage(r.media)
          catch { case _: java.io.IOException | _: RuntimeException => null }
        if (img == null) ResizedMedia(r.media_id, 0, 0, Array.emptyByteArray)
        else {
          val out = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < height) {
            // Long arithmetic: (2·dst+1)·srcDim overflows Int for large
            // dimension products (e.g. 40 k × 30 k)
            val sy = (((2L * y + 1) * img.getHeight) / (2L * height)).toInt
            var x = 0
            while (x < width) {
              val sx = (((2L * x + 1) * img.getWidth) / (2L * width)).toInt
              out.setRGB(x, y, img.getRGB(sx, sy))
              x += 1
            }
            y += 1
          }
          ResizedMedia(r.media_id, width, height, writeImage(out, "png"))
        }
      }
    }
  }

  /** The WRITE side of the audio face: mux 16-bit PCM samples
    * (interleaved by channel) into a standard RIFF WAVE container —
    * exact inverse of [[WavCodec]]'s read path (spec-pinned round
    * trip), the audio twin of [[muxMjpegAvi]]. Single-clip scope;
    * assembled in one buffer, keep per-clip size within task memory. */
  def muxPcmWav(samples: Array[Short], sampleRate: Int,
      channels: Int): Array[Byte] = {
    require(sampleRate >= 1 && channels >= 1,
      "sampleRate and channels must be >= 1")
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  case class VideoFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** The WRITE side of the video face: mux JPEG frames into a standard
    * MJPEG-AVI container (RIFF: hdrl with filled avih/strh/strf, movi
    * with one `00dc` chunk per frame, and an idx1 keyframe index — a
    * playable file, not just something [[AviMjpegCodec]] accepts).
    * Exact inverse of the read path: `AviMjpegCodec.frames(mux(fs)) ≡
    * fs` byte-for-byte (spec-pinned). Single-video scope — callers mux
    * per row inside mapPartitions; the container is assembled in one
    * byte buffer, so keep per-video size within task memory. */
  def muxMjpegAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 25): Array[Byte] = {
    require(fps >= 1, "fps must be >= 1")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer
        .allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    def list(tpe: String, children: Array[Byte]*): Array[Byte] =
      chunk("LIST", tpe.getBytes("US-ASCII") ++ children.toArray.flatten)
    def le(fields: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(fields.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fields.foreach(bb.putInt)
      bb.array()
    }
    val maxBytes = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = chunk("avih", le(
      1000000 / fps, maxBytes * fps, 0, 0x10 /*HASINDEX*/, frames.length,
      0, 1, maxBytes, width, height, 0, 0, 0, 0))
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
        le(0, 0, 0, 1 /*scale*/, fps /*rate*/, 0, frames.length, maxBytes,
          -1 /*quality*/, 0) ++ le(0, 0) /*rcFrame*/)
    val strf = chunk("strf", le(40, width, height) ++
      Array[Byte](1, 0, 24, 0) /*planes=1, bitCount=24*/ ++
      "MJPG".getBytes("US-ASCII") ++
      le(width * height * 3, 0, 0, 0, 0))
    val movi = list("movi", frames.map(chunk("00dc", _)): _*)
    // idx1 offsets are relative to the position of 'movi' (the list's
    // type fourcc); the first chunk header starts 4 bytes after it
    val idxEntries = frames.foldLeft((4, Vector.empty[Array[Byte]])) {
      case ((off, acc), f) =>
        (off + 8 + f.length + (f.length & 1),
          acc :+ ("00dc".getBytes("US-ASCII") ++
            le(0x10 /*KEYFRAME*/, off, f.length)))
    }._2
    val idx1 = chunk("idx1", idxEntries.toArray.flatten)
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++
      list("hdrl", avih, list("strl", strh, strf)) ++ movi ++ idx1)
  }

  /** REAL evenly-spaced video frame sampling for MJPEG-AVI: extracts k
    * frames per video as standalone JPEG byte arrays (each is decodable
    * by [[ImageCodec]] / feedable to [[resizeImages]]). Frame choice is
    * the same exact pixel-center integer mapping as [[resizeImages]]
    * (`idx = (2i+1)·n / (2k)`), so the sample is bit-deterministic.
    *
    * Indexed containers (idx1 present and verified —
    * [[AviMjpegCodec.frameIndex]]) take the SEEK path: only the k
    * sampled frames are copied, O(sample) instead of O(video) — the
    * difference between touching 3 frames and 100 000 on an hour-long
    * clip. Unindexed or index-inconsistent files fall back to the movi
    * walk with identical output (spec-pinned equality).
    * Unparseable containers yield no rows — audit by anti-joining ids,
    * same posture as the 0×0 resize marker. */
  def aviFrameSample(media: Dataset[MediaRow], nFrames: Int): Dataset[VideoFrame] = {
    require(nFrames >= 1, "nFrames must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        def pick(n: Int): Seq[Int] = {
          val k = math.min(nFrames, n)
          (0 until k).map(i => (((2L * i + 1) * n) / (2L * k)).toInt)
        }
        AviMjpegCodec.frameIndex(r.media) match {
          case Some(es) => pick(es.length).iterator.map { idx =>
            val (off, sz) = es(idx)
            VideoFrame(r.media_id, idx,
              java.util.Arrays.copyOfRange(r.media, off, off + sz))
          }
          case None =>
            val fs = AviMjpegCodec.frames(r.media)
            pick(fs.length).iterator.map(idx =>
              VideoFrame(r.media_id, idx, fs(idx)))
        }
      }
    }
  }

  /** Evenly-spaced frame sampling as pure column logic over the binary:
    * frame i = bytes [i*frameBytes, (i+1)*frameBytes). */
  def frameSample(df: DataFrame, nFrames: Int,
      frameBytes: Int = FakeCodec.FrameBytes): DataFrame =
    // empty media must yield no frames: a bare sequence(0, -1) is Spark's
    // DESCENDING [0, -1] and would emit two junk rows per empty blob
    df.withColumn("frame_idx", explode(expr(
        s"case when n_bytes > 0 then " +
          s"sequence(0, int(least(ceil(n_bytes / $frameBytes), $nFrames)) - 1) " +
          s"else array() end")))
      .withColumn("frame",
        expr(s"substring(media, frame_idx * $frameBytes + 1, $frameBytes)"))
}
