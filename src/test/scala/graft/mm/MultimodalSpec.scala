package graft.mm

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec

/** Multimodal plumbing: binary payload schema, REAL image decode via
  * the JDK's javax.imageio, and the byte-level path for undecodable
  * formats — all through the distributed mapPartitions surface. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic 8x6 PNG: left half solid red, right half solid
    * blue — hand-checkable luminance (red -> 76, blue -> 29). */
  private def testPng(w: Int = 8, h: Int = 6): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0xff0000 else 0x0000ff)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("asMedia produces (id, payload binary, format)") {
    val df = Seq((1L, "hello")).toDF("doc_id", "text")
    val m = Multimodal.asMedia(df, "doc_id", "text").collect().head
    assert(m.getLong(0) == 1L)
    assert(new String(m.getAs[Array[Byte]](1), "UTF-8") == "hello")
    assert(m.getString(2) == "text/plain")
  }

  test("image/png payloads decode for real: dimensions, thumbnail, row bands") {
    val png = testPng()
    val ds = Seq(Multimodal.MediaRecord(42L, png, "image/png")).toDS()
    val f = Multimodal.extractFeatures(ds, frameStep = 2, thumbSide = 4)
      .collect().head
    assert(f.id == 42L)
    assert(f.nBytes == png.length.toLong, "nBytes is the ENCODED size")
    assert(f.width == 8L && f.height == 6L, "decoded dimensions")
    // 4x4 nearest-neighbor gray thumb: columns 0,1 sample red (lum 76),
    // columns 2,3 sample blue (lum 29) — row-major.
    val expectRow = Seq[Byte](76, 76, 29, 29)
    assert(f.thumb.toSeq == (1 to 4).flatMap(_ => expectRow))
    // Rows 0, 2, 4 sampled; every row is half red half blue ->
    // mean lum = (4*76 + 4*29) / 8 = 52.
    assert(f.frames.toSeq == Seq(52L, 52L, 52L))
  }

  /** Deterministic mono 16-bit PCM WAV: a 440 Hz sine at 8 kHz. */
  private def testWav(nFrames: Int = 800): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val v = (math.sin(2 * math.Pi * 440 * i / 8000d) * 16000).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio/wav payloads decode for real: frames, channels, amplitude bands") {
    val wav = testWav()
    val ds = Seq(Multimodal.MediaRecord(9L, wav, "audio/wav")).toDS()
    val f = Multimodal.extractFeatures(ds, frameStep = 100, thumbSide = 4)
      .collect().head
    assert(f.nBytes == wav.length.toLong)
    assert(f.width == 800L && f.height == 1L, "decoded frame/channel counts")
    assert(f.frames.length == 8, "one band per 100-frame block")
    // Mean |amplitude| of a full-scale-16000 sine is ~2/pi * 16000 ~ 10186;
    // 100 frames cover 5.5 periods, so every band sits near that.
    assert(f.frames.forall(b => b > 9000L && b < 11000L),
      s"sine amplitude bands: ${f.frames.toSeq}")
    assert(f.thumb.length == 16)
  }

  test("corrupt audio payloads yield the declared error row, not a crash") {
    val junk = Array[Byte](82, 73, 70, 70, 1, 2, 3) // "RIFF" then garbage
    val ds = Seq(Multimodal.MediaRecord(8L, junk, "audio/wav")).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head
    assert(f.width == -1L && f.height == -1L)
    assert(f.thumb.isEmpty && f.frames.isEmpty)
  }

  test("corrupt image payloads yield the declared error row, not a crash") {
    val junk = Array[Byte](1, 2, 3, 4, 5)
    val ds = Seq(Multimodal.MediaRecord(7L, junk, "image/png")).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head
    assert(f.nBytes == 5L && f.width == -1L && f.height == -1L)
    assert(f.thumb.isEmpty && f.frames.isEmpty)
  }

  test("non-image formats take the byte-level path") {
    val df = Seq((7L, "abcdefghij" * 10)).toDF("doc_id", "text") // 100 bytes
    val ds = Multimodal.asMedia(df, "doc_id", "text").as[Multimodal.MediaRecord]
    val f = Multimodal.extractFeatures(ds, thumbBytes = 4, frameStep = 25)
      .collect().head
    assert(f.nBytes == 100L && f.width == 0L && f.height == 0L)
    assert(new String(f.thumb, "UTF-8") == "abcd")
    assert(f.frames.toSeq == Seq('a'.toLong, 'f'.toLong, 'a'.toLong, 'f'.toLong))
  }

  /** Deterministic solid-gray JPEG frame. */
  private def jpegFrame(gray: Int, w: Int = 16, h: Int = 16): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Assemble a minimal standards-shaped MJPEG AVI: RIFF('AVI ') with
    * a dummy hdrl LIST (the walker must skip it) and a movi LIST of
    * '00dc' frame chunks, word-aligned. */
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def cc(s: String) = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit =
      out.write(Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte,
        (v >> 24).toByte))
    val hdrlJunk = Array.fill[Byte](32)(0x7f)
    val moviBody = {
      val b = new ByteArrayOutputStream()
      frames.foreach { f =>
        b.write("00dc".getBytes("US-ASCII"))
        b.write(Array[Byte](f.length.toByte, (f.length >> 8).toByte,
          (f.length >> 16).toByte, (f.length >> 24).toByte))
        b.write(f)
        if ((f.length & 1) == 1) b.write(0) // word alignment pad
      }
      b.toByteArray
    }
    val riffSize = 4 + (8 + 4 + hdrlJunk.length) + (8 + 4 + moviBody.length)
    cc("RIFF"); le32(riffSize); cc("AVI ")
    cc("LIST"); le32(4 + hdrlJunk.length); cc("hdrl"); out.write(hdrlJunk)
    cc("LIST"); le32(4 + moviBody.length); cc("movi"); out.write(moviBody)
    out.toByteArray
  }

  test("video/avi MJPEG payloads decode for real: temporal frame sampling") {
    // 5 frames with increasing gray level; frameStep=2 samples 0,2,4.
    val grays = Seq(40, 80, 120, 160, 200)
    val avi = mjpegAvi(grays.map(jpegFrame(_)))
    val ds = Seq(Multimodal.MediaRecord(9L, avi, "video/avi")).toDS()
    val f = Multimodal.extractFeatures(ds, frameStep = 2, thumbSide = 2)
      .collect().head
    assert(f.nBytes == avi.length.toLong)
    assert(f.width == 16L && f.height == 16L, "first frame dimensions")
    assert(f.frames.length == 3, "every 2nd frame of 5 -> 3 samples")
    // JPEG is lossy but a solid frame round-trips within a few levels;
    // the sampled sequence must track the true temporal gradient.
    f.frames.zip(Seq(40L, 120L, 200L)).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 4, s"frame mean $got vs $want")
    }
    assert(f.frames.toSeq.sliding(2).forall(p => p(0) < p(1)),
      "temporal ordering preserved")
    // Thumb comes from the first sampled frame (solid gray ~40).
    assert(f.thumb.length == 4 &&
      f.thumb.forall(b => math.abs((b & 0xff) - 40) <= 4))
  }

  test("adversarial chunk size near Int.MaxValue is an error row, not a crash") {
    // A frame chunk claiming size 0x7FFFFFF0: in Int arithmetic
    // off + 8 + size wraps negative and slips past the truncation
    // guard, emitting an out-of-bounds (offset, length) that blows up
    // Arrays.copyOfRange and fails the whole task. The walker must do
    // its bounds math in Long and treat the payload as truncated.
    val out = new ByteArrayOutputStream()
    def cc(s: String) = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit =
      out.write(Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte,
        (v >> 24).toByte))
    cc("RIFF"); le32(100); cc("AVI ")
    cc("00dc"); le32(0x7FFFFFF0) // declared far past the payload end
    out.write(Array.fill[Byte](32)(0x11))
    val evil = Multimodal.MediaRecord(7L, out.toByteArray, "video/avi")
    val f = Multimodal.extractFeatures(Seq(evil).toDS()).collect().head
    assert(f.width == -1L && f.height == -1L && f.frames.isEmpty,
      "oversized-chunk payload must classify as corrupt data")
  }

  test("non-RIFF and empty-movi video payloads yield the declared error row") {
    val junk = Multimodal.MediaRecord(1L, Array.fill[Byte](64)(3), "video/avi")
    val noFrames = Multimodal.MediaRecord(2L, mjpegAvi(Seq.empty), "video/avi")
    val fs = Multimodal.extractFeatures(Seq(junk, noFrames).toDS())
      .collect().sortBy(_.id)
    fs.foreach { f =>
      assert(f.width == -1L && f.height == -1L && f.frames.isEmpty)
    }
  }

  test("extraction is deterministic across reruns and partitionings") {
    val textRecs = (1L to 20L).map(i =>
      Multimodal.MediaRecord(i, s"payload-$i-${"x" * i.toInt}".getBytes("UTF-8"),
        "text/plain"))
    val pngRecs = (21L to 24L).map(i =>
      Multimodal.MediaRecord(i, testPng(w = 4 + i.toInt % 3, h = 5), "image/png"))
    val ds = (textRecs ++ pngRecs).toDS()
    def run(d: org.apache.spark.sql.Dataset[Multimodal.MediaRecord]) =
      Multimodal.extractFeatures(d).collect()
        .map(f => (f.id, f.nBytes, f.width, f.height, f.thumb.toSeq,
          f.frames.toSeq)).sortBy(_._1).toSeq
    assert(run(ds) == run(ds.repartition(5)))
  }
}
