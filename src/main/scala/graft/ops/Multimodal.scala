package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media (image/audio/video) as opaque `binary`
  * columns plus typed metadata extracted by a partition-wise decode.
  *
  * The decode itself is STUBBED (this container has no image/audio codecs):
  * [[decodeStub]] derives deterministic fake metadata from the raw bytes.
  * What is REAL — and what this operator exists to exercise — is the Spark
  * plumbing a production decoder needs:
  *   - media travels as `binary`, never materialized driver-side;
  *   - the decoder runs `mapPartitions` over a typed Dataset, i.e. one
  *     JVM-side batch per partition (the Scala analogue of `mapInPandas`'s
  *     batch iterator), so a real codec would amortize init per partition;
  *   - output is a declared case-class schema, keeping Catalyst able to
  *     prune/push around the opaque stage.
  *
  * At 100 TB: partition count is driven by
  * `spark.sql.files.maxPartitionBytes` on the blob column; decode
  * parallelism equals partitions; nothing here shuffles.
  */
object Multimodal {

  /** Typed metadata a decoder would emit. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      width: Long,
      height: Long,
      first_byte: Int
  )

  /** Attach a binary "media" column derived from text (the test corpus has
    * no real blobs; production would read them from the lake directly). */
  def asBinary(df: DataFrame, textCol: String, as: String = "media"): DataFrame =
    df.withColumn(as, col(textCol).cast("binary"))

  /** Partition-wise decode stub: deterministic fake format/dimensions from
    * byte length. A real implementation replaces ONLY the body of the map —
    * signature, batching, and schema are production-shaped. */
  def decodeStub(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would go here (codec handles, model weights…)
        rows.map { case (id, bytes) =>
          val n = if (bytes == null) 0L else bytes.length.toLong
          val fmt = (n % 3) match {
            case 0 => "png"
            case 1 => "jpeg"
            case _ => "webp"
          }
          val first = if (bytes == null || bytes.isEmpty) 0 else bytes(0) & 0xff
          MediaMeta(id, n, fmt, n % 512 + 1, (n / 7) % 512 + 1, first)
        }
      }
  }
}
