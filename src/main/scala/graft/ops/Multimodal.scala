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

  /** One sampled frame of a video blob. */
  final case class Frame(doc_id: Long, frame_idx: Long, frame: Array[Byte])

  /** Frame sampling: video binary → one row per sampled frame (every
    * `stride`-th chunk of `frameBytes`). The 1:N fan-out happens inside
    * the partition iterator (`flatMap`), so no shuffle and no driver
    * involvement — output size scales with frames kept, not source size.
    * The "frame" is a deterministic byte slice standing in for a decoded
    * frame; a real demuxer replaces the slicing only. */
  def frameSampleStub(
      df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int = 64, stride: Int = 4
  ): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val nFrames = b.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            Frame(id, f.toLong, b.slice(f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }
  }

  /** Resized media. */
  final case class Resized(doc_id: Long, width: Long, height: Long, media: Array[Byte])

  /** Resize plumbing: binary in, binary out with target dimensions carried
    * in the schema. The stub truncates/pads bytes proportionally to the
    * pixel-count ratio — a real scaler replaces the array arithmetic. */
  def resizeStub(
      df: DataFrame, idCol: String, binCol: String,
      width: Int, height: Int
  ): Dataset[Resized] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val target = math.max(1, (width.toLong * height / 64).toInt)
          val out =
            if (b.length >= target) b.take(target)
            else b ++ Array.fill(target - b.length)(0.toByte)
          Resized(id, width.toLong, height.toLong, out)
        }
      }
  }

  /** Media embedding row — feeds [[Similarity]] directly. */
  final case class MediaEmbedding(doc_id: Long, embedding: Array[Float])

  /** Feature extraction: binary → fixed-`dim` float vector. The stub is a
    * deterministic byte-bucket histogram (L1-normalized) — a real encoder
    * (CLIP, audio embedder…) replaces the histogram; per-partition model
    * init amortizes exactly where the comment sits. Output is the same
    * `array<float>` shape the similarity/ANN operators consume, so
    * `frameSampleStub → featureExtractStub → Similarity.withNorm →
    * ivfTopK` is a complete media-dedup pipeline. */
  def featureExtractStub(
      df: DataFrame, idCol: String, binCol: String, dim: Int = 16
  ): Dataset[MediaEmbedding] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition model load would go here
        rows.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val hist = new Array[Float](dim)
          b.foreach(x => hist((x & 0xff) % dim) += 1f)
          val total = math.max(1f, b.length.toFloat)
          MediaEmbedding(id, hist.map(_ / total))
        }
      }
  }
}
