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
