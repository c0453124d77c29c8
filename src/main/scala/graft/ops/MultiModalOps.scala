package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media rides as an opaque `binary` column with
  * typed metadata; decode / feature-extract run as typed per-partition maps
  * over batches of payloads. The actual media codecs are STUBBED (this
  * container has no image/audio libraries) behind [[FakeCodec]] — the
  * Spark-side contract (schema, binary transport, partition-local batch
  * decode, deterministic output) is real and oracle-checked.
  */
object MultiModalOps {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
                             height: Long, n_frames: Long)

  /** STUB media decoder: a deterministic function of the payload bytes in
    * place of a real image/video decode. Swap for a JNI/javacv decode with
    * the same signature when codecs are available. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Long, Long, Long) = {
      val len = payload.length.toLong
      (len % 640 + 16, (len * 7) % 480 + 16, len / 256 + 1) // (w, h, frames)
    }
  }

  /** Attach a binary payload column (here: the utf-8 text bytes standing in
    * for media bytes — testdata has no real media). */
  def asMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")).as[MediaRow]
  }

  /** Decode metadata per media row — a narrow typed map; at scale this is the
    * partition-parallel decode stage (batch shape = Spark partition). */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    asMedia(spark, docs).mapPartitions(_.map { m =>
      val (w, h, f) = FakeCodec.decode(m.payload)
      MediaMeta(m.doc_id, m.payload.length.toLong, w, h, f)
    })
  }

  final case class MediaEmbedding(vec_id: Long, embedding: Array[Float])

  /** STUB feature extractor: a deterministic payload → dense-vector function
    * standing in for a real vision/audio encoder (same partition-batch shape;
    * swap the body for an ONNX/JNI model call). Output plugs straight into
    * [[VectorOps]] — buckets, verify, IVF — closing the media → embedding →
    * ANN-dedup pipeline. */
  def extractEmbeddings(spark: SparkSession, docs: DataFrame,
                        dim: Int = 64): Dataset[MediaEmbedding] = {
    import spark.implicits._
    asMedia(spark, docs).mapPartitions(_.map { m =>
      val v = new Array[Float](dim)
      var h = 1125899906842597L // deterministic rolling hash of the payload
      var i = 0
      while (i < m.payload.length) { h = h * 31 + m.payload(i); i += 1 }
      var j = 0
      while (j < dim) {
        val x = h * (2654435761L + 2L * j) + 97531L
        val m2 = x ^ (x >>> 29)
        v(j) = ((((m2 % 1024L) + 1024L) % 1024L).toFloat / 512f) - 1f
        j += 1
      }
      MediaEmbedding(m.doc_id, v)
    })
  }
}
