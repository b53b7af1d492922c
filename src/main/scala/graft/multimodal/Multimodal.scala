package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Multimodal decode plumbing: media arrives as opaque `binary` columns;
  * decode/feature-extraction runs per partition in bounded batches.
  *
  * The actual codec is STUBBED (this container ships no image/audio
  * libraries): `decodeStub` produces a deterministic fake feature vector
  * from the payload bytes. Everything around it — schema, encoder,
  * partition-wise batching, null handling — is the real production
  * shape: swap `decodeStub` for a JNI/codec call and nothing else moves.
  *
  * Scale: mapPartitions keeps the decode zero-shuffle and streaming
  * (one batch of `batchSize` payloads in memory per task, never the
  * whole partition).
  */
object Multimodal {

  val featureDim = 8
  val batchSize = 64

  /** STUB decoder — deterministic fake features derived from the bytes.
    * Replace with a real codec (??? in production terms); the signature
    * `Array[Byte] => Array[Float]` is the real contract. */
  private[multimodal] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    var i = 0
    while (i < payload.length) {
      out(i % featureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  val outputSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Batched decode of (doc_id: long, payload: binary) → features.
    * Batches bound memory; grouped iterator keeps the stream lazy. */
  def decodeFeatures(df: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(outputSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          Row(id, payload.length.toLong, decodeStub(payload))
        }
      }
    }(enc)
  }
}
