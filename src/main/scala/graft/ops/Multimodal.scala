package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in batched `mapPartitions`.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * container): [[StubDecoder]] produces a deterministic fake feature
  * vector from the bytes. Everything Spark-side is real and tested —
  * schema, batching shape, partitioning, and the seam where a real
  * decoder (JNI/ONNX session per executor) would drop in.
  *
  * Scale notes: payloads stay opaque binary until the decode stage
  * (no driver collect); the decoder is constructed once per PARTITION
  * (the expensive session-init amortizes across the batch, exactly like
  * broadcast model weights in the extract kernel); decode output is
  * columnar-friendly fixed-width vectors.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)
  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Int, byte_sum: Long, checksum: Long, features: Array[Float])

  /** The seam a real codec implements. */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte], width: Int, height: Int): Array[Float]
  }

  /** Deterministic stand-in: 8 features from byte statistics. A real
    * implementation would decode pixels/samples here. */
  object StubDecoder extends Decoder {
    def decode(payload: Array[Byte], width: Int, height: Int): Array[Float] = {
      var sum = 0L; var sq = 0L; var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        sum += b; sq += b.toLong * b; i += 1
      }
      val n = math.max(payload.length, 1)
      Array(
        payload.length.toFloat, width.toFloat, height.toFloat,
        sum.toFloat / n, sq.toFloat / n,
        (sum % 251).toFloat, (sq % 509).toFloat,
        (width.toLong * height).toFloat)
    }
  }

  /** Synthesize a deterministic media table from the documents table:
    * payload = utf-8 bytes of the text (an opaque blob as far as the
    * pipeline is concerned), kind/dims derived from doc_id. */
  def mediaTable(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val kinds = Array("image", "audio", "video")
        MediaRow(id, kinds((id % 3).toInt), text.getBytes("UTF-8"),
          (32 + id % 97).toInt, (32 + id % 71).toInt)
    }
  }

  /** Batched decode: one decoder per partition, iterator-to-iterator
    * (no per-row session setup, no full-partition materialization). */
  def decodeFeatures(media: Dataset[MediaRow],
      mkDecoder: () => Decoder = () => StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val dec = mkDecoder()
      it.map { m =>
        val f = dec.decode(m.payload, m.width, m.height)
        var crc = 1469598103934665603L // FNV-1a over payload
        var bsum = 0L // integer byte sum: SQL-checkable integrity stat
        var i = 0
        while (i < m.payload.length) {
          val b = m.payload(i) & 0xffL
          crc ^= b; crc *= 1099511628211L; bsum += b; i += 1
        }
        MediaFeatures(m.media_id, m.kind, m.payload.length, bsum, crc, f)
      }
    }
  }
}
