package graft.mm

import graft.SparkSpec

/** Multimodal plumbing: binary payload schema + partition-local stub
  * decode (deterministic fake in place of a real media codec). */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("asMedia produces (id, payload binary, format)") {
    val df = Seq((1L, "hello")).toDF("doc_id", "text")
    val m = Multimodal.asMedia(df, "doc_id", "text").collect().head
    assert(m.getLong(0) == 1L)
    assert(new String(m.getAs[Array[Byte]](1), "UTF-8") == "hello")
    assert(m.getString(2) == "text/plain")
  }

  test("extractFeatures: byte length, thumbnail, sampled frames") {
    val df = Seq((7L, "abcdefghij" * 10)).toDF("doc_id", "text") // 100 bytes
    val ds = Multimodal.asMedia(df, "doc_id", "text").as[Multimodal.MediaRecord]
    val f = Multimodal.extractFeatures(ds, thumbBytes = 4, frameStep = 25)
      .collect().head
    assert(f.nBytes == 100L)
    assert(new String(f.thumb, "UTF-8") == "abcd")
    assert(f.frames.toSeq == Seq('a'.toLong, 'f'.toLong, 'a'.toLong, 'f'.toLong))
  }

  test("extraction is deterministic across reruns and partitionings") {
    val df = (1L to 20L).map(i => (i, s"payload-$i-" + "x" * i.toInt))
      .toDF("doc_id", "text")
    val ds = Multimodal.asMedia(df, "doc_id", "text").as[Multimodal.MediaRecord]
    val a = Multimodal.extractFeatures(ds).collect().map(f => (f.id, f.nBytes,
      f.thumb.toSeq, f.frames.toSeq)).sortBy(_._1)
    val b = Multimodal.extractFeatures(ds.repartition(5)).collect()
      .map(f => (f.id, f.nBytes, f.thumb.toSeq, f.frames.toSeq)).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }
}
