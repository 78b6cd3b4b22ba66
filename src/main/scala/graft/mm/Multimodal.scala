package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media travel as opaque `binary` payloads with typed
  * metadata, and per-record decoding runs partition-local so a real
  * codec would be initialized once per partition, not once per row.
  *
  * The decode itself is STUBBED here (this environment has no media
  * libraries): [[FakeCodec]] derives deterministic pseudo-features from
  * the bytes. Everything around it — the schema, the Dataset encoders,
  * the mapPartitions batch shape, the partition-local codec lifecycle —
  * is the real production plumbing and is what the tests cover.
  */
object Multimodal {

  /** A media record as it would arrive from ingestion. */
  case class MediaRecord(id: Long, payload: Array[Byte], format: String)

  /** Extracted features: byte length, a fixed-size "thumbnail" (head
    * bytes), and one sampled "frame feature" per `frameStep` bytes. */
  case class MediaFeatures(id: Long, nBytes: Long, thumb: Array[Byte],
      frames: Array[Long])

  /** STUB decoder — stands in for an image/audio library. Deterministic
    * by construction so tests and reruns agree. */
  object FakeCodec {
    def thumbnail(payload: Array[Byte], size: Int): Array[Byte] =
      payload.take(size)
    /** "Frame sampling": one feature per step-th byte (unsigned). */
    def sampleFrames(payload: Array[Byte], step: Int): Array[Long] =
      payload.indices.by(step).map(i => (payload(i) & 0xff).toLong).toArray
  }

  /** Wrap a string column as a binary media payload (the ingestion
    * shape; with real media the bytes would come in directly). */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("text/plain").as("format"))

  /** Partition-local feature extraction. The codec is instantiated per
    * partition (here trivially, but that is where a real decoder's
    * expensive init belongs), then streamed over the rows — constant
    * memory, no driver collect. */
  def extractFeatures(ds: Dataset[MediaRecord], thumbBytes: Int = 8,
      frameStep: Int = 32): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val codec = FakeCodec // real codec init would happen here, once
      it.map { r =>
        MediaFeatures(r.id, r.payload.length.toLong,
          codec.thumbnail(r.payload, thumbBytes),
          codec.sampleFrames(r.payload, frameStep))
      }
    }
  }
}
