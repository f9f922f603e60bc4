package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Classifier, TextAnalysis, WebGraph}

/** Streaming curation for a document feed — the incremental twin of the
  * batch curation decision (q45): each micro-batch of arriving documents
  * is quality-scored and language-gated with the SAME codegen'd
  * expressions the batch path uses (stateless, no shuffle), then exact
  * near-dup re-deliveries are dropped by content fingerprint within the
  * watermark horizon.
  *
  * State is one row per fingerprint, partitioned by fingerprint, expiring
  * with the watermark — bounded by (ingest rate × watermark), not stream
  * history. A full MinHash near-dup pass stays batch-side (its candidate
  * join needs the corpus index; see Dedup.incrementalMinhash for the
  * batch-incremental variant) — this stream gate is the cheap first
  * filter in front of it, which is how production feeds layer the two.
  */
object DocumentStreams {

  /** Gate + dedup an arriving document stream. Expects columns
    * (`ts` timestamp, `text`, `lang`); emits the surviving rows with
    * `quality` and `fp` attached. */
  def curateStream(
      docs: DataFrame,
      minQuality: Double,
      langs: Seq[String],
      watermark: String = "1 hour"
  ): DataFrame =
    docs
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .filter(col("quality") >= minQuality && col("lang").isInCollection(langs))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming data-quality audit — the incremental twin of the batch
    * [[graft.ops.Audit]] report (q118): per tumbling window, how many
    * arriving rows violate each declared contract. This is the monitor a
    * feed runs CONTINUOUSLY (alert when a delivery's violation rate
    * jumps), in front of the batch audit that gates publication.
    *
    * Supported check families and their streaming shapes:
    *   - row checks (NotNull / InRange / Satisfies): stateless violation
    *     flags folded into the ONE windowed aggregate — identical
    *     expressions to the batch path;
    *   - RefIntegrity: a stream-static left join against the (static)
    *     dimension's distinct keys — broadcast, stateless per batch —
    *     with the orphan flag feeding the same aggregate.
    *   - UniqueKey is deliberately NOT supported here: cross-batch
    *     uniqueness needs unbounded state; within-watermark duplicate
    *     policing belongs to `dropDuplicatesWithinWatermark` (see
    *     [[curateStream]]) and full-history uniqueness to the batch audit.
    *
    * Output: one row per closed window — `window_start`, `rows_checked`,
    * and a `v::<check name>` violation count per check (wide, not
    * exploded: a monitor reads one row per window; the batch report shape
    * is one explode away). Append mode via the watermark. */
  def auditStream(
      rows: DataFrame,
      checks: Seq[graft.ops.Audit.Check],
      tsCol: String = "ts",
      windowDur: String = "1 hour",
      watermark: String = "1 hour"
  ): DataFrame = {
    import graft.ops.Audit._
    require(checks.nonEmpty, "auditStream needs at least one check")
    require(!checks.exists(_.isInstanceOf[UniqueKey]),
      "UniqueKey is batch-only (unbounded state); use " +
        "dropDuplicatesWithinWatermark for in-horizon duplicate policing")
    // attach one violation flag per check; FK checks join the static dim
    val (flagged, flagCols) = checks.foldLeft((rows, Seq.empty[(String, String)])) {
      case ((df, acc), c) =>
        val flagCol = s"__viol_${acc.size}"
        val withFlag = c match {
          case NotNull(c0) => df.withColumn(flagCol, col(c0).isNull)
          case InRange(c0, lo, hi) => df.withColumn(flagCol,
            coalesce(col(c0) < lit(lo) || col(c0) > lit(hi), lit(false)))
          case Satisfies(_, p) => df.withColumn(flagCol, coalesce(!p, lit(false)))
          case RefIntegrity(c0, dim, dimCol, _) =>
            val marker = s"__dim_${acc.size}"
            df.join(
              broadcast(dim.select(col(dimCol).as(c0)).distinct()
                .withColumn(marker, lit(1))),
              Seq(c0), "left")
              .withColumn(flagCol, col(c0).isNotNull && col(marker).isNull)
              .drop(marker)
          case u: UniqueKey => throw new IllegalArgumentException(u.name)
        }
        (withFlag, acc :+ (c.name, flagCol))
    }
    val aggs = flagCols.map { case (name, f) =>
      sum(when(col(f), 1L).otherwise(0L)).as(s"v::$name")
    } :+ count(lit(1)).as("rows_checked")
    flagged
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("window_start") +:
        col("rows_checked") +:
        flagCols.map { case (name, _) => col(s"`v::$name`") }: _*)
  }

  /** Streaming media ingestion — the multimodal arm's incremental twin:
    * watch a landing directory with Spark's `binaryFile` source and run
    * the SAME real decode the batch path uses
    * ([[graft.ops.Multimodal.imageFeatures]] →
    * [[graft.ops.Multimodal.decodeImage]]: BMP bit-exact, PNG/JPEG/GIF
    * via the JDK ImageIO readers → resample → exact channel means) on
    * every arriving blob. Stateless per batch (pure partition-wise
    * decode, no watermark, no state store), so throughput is read-bound;
    * `doc_id` is the digits of the file name (the lake convention for
    * media drops: `<id>.<ext>`). Undecodable blobs are dropped by the
    * decode, exactly like the batch operator — a StreamingSpec test pins
    * stream ≡ batch on the same files, across codecs. */
  def imageFeatureStream(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      width: Int,
      height: Int,
      maxFilesPerTrigger: Int = 0 // 0 = unlimited; >0 rate-limits ingest
  ): DataFrame = {
    // streaming sources need the schema declared up front; binaryFile's
    // is fixed by the format (path, modificationTime, length, content)
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val reader = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.{bmp,png,jpg,jpeg,gif}")
    val limited =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      else reader
    val raw = limited.load(dir)
      // nullif before the cast: a glob-matching file with no digit
      // prefix (cover.png) extracts "" and an ANSI cast of "" would
      // kill the whole streaming query; null-id files drop like
      // undecodable blobs instead
      .select(
        nullif(regexp_extract(col("path"), "(\\d+)\\.[a-z]+$", 1), lit(""))
          .cast("long").as("doc_id"),
        col("content").as("media"))
      .filter(col("doc_id").isNotNull)
    graft.ops.Multimodal.imageFeatures(raw, "doc_id", "media", width, height)
      .toDF()
  }

  /** Streaming media near-dup probe — the arrival-time half of
    * [[graft.ops.Dedup.simhashIncremental]]: every image landing in the
    * directory is aHash-fingerprinted ([[graft.ops.Multimodal.imageAHash]]
    * over the real decode) and Hamming-checked against a STATIC
    * fingerprint index, emitting (doc_id, index_id, hamming ≤ max) —
    * the "is this upload a duplicate?" gate at ingest.
    *
    * Shape contract, stated honestly: the index is BROADCAST and the
    * check is a stateless nested-loop Hamming probe — exact, no
    * streaming state, no duplicate emissions — which is the right
    * serving shape while the index fits an executor (a hot-set of
    * recent fingerprints; 32 bytes/doc ≈ 30M docs/GB). An unbounded
    * corpus index rides the batch [[graft.ops.Dedup.simhashIncremental]]
    * on a schedule instead (its banded join never materializes the
    * cross product); new-new pairs within a micro-batch are likewise
    * the batch compactor's job. StreamingSpec pins stream ≡ the batch
    * probe on the same files. */
  def mediaDedupStream(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      indexFp: DataFrame,
      maxHamming: Int = 4
  ): DataFrame = {
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val raw = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.{bmp,png,jpg,jpeg,gif}")
      .load(dir)
      // nullif before the cast: a glob-matching file with no digit
      // prefix (cover.png) extracts "" and an ANSI cast of "" would
      // kill the whole streaming query; null-id files drop like
      // undecodable blobs instead
      .select(
        nullif(regexp_extract(col("path"), "(\\d+)\\.[a-z]+$", 1), lit(""))
          .cast("long").as("doc_id"),
        col("content").as("media"))
      .filter(col("doc_id").isNotNull)
    val bandNames = (0 until 4).map(b => s"b$b")
    val fp = graft.ops.Multimodal.imageAHash(raw, "doc_id", "media").toDF()
      .select(col("doc_id") +: (0 until 4).map(b =>
        conv(substring(col("ahash"), b * 16 + 1, 16), 2, 10)
          .cast("long").as(s"b$b")): _*)
    val idx = indexFp.withColumnsRenamed(
      (("doc_id" -> "index_id") +: bandNames.map(n => n -> s"i_$n")).toMap)
    val hamming = bandNames.map(n =>
      bit_count(col(n).bitwiseXOR(col(s"i_$n")))).reduce(_ + _)
    fp.join(broadcast(idx), hamming <= maxHamming)
      .select(col("doc_id"), col("index_id"), hamming.as("hamming"))
  }

  /** Streaming audio intake — the incremental twin of
    * [[graft.ops.Multimodal.pcmStats]] over a `.wav`/`.flac` landing
    * directory: every drop is decoded through the SAME
    * [[graft.ops.Multimodal.decodePcm16Mono]] normalization the batch
    * path uses (WAV chunk walk or the real FLAC frame decode) and
    * reduced to exact integer statistics. Stateless per batch;
    * undecodable or stereo drops vanish exactly like the batch
    * operator, digit-less filenames drop on their null doc_id.
    * StreamingSpec pins stream ≡ batch across BOTH containers. */
  def audioStatsStream(
      spark: org.apache.spark.sql.SparkSession,
      dir: String
  ): DataFrame = {
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val raw = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.{wav,flac}")
      .load(dir)
      .select(
        nullif(regexp_extract(col("path"), "(\\d+)\\.[a-z]+$", 1), lit(""))
          .cast("long").as("doc_id"),
        col("content").as("media"))
      .filter(col("doc_id").isNotNull)
    graft.ops.Multimodal.pcmStats(raw, "doc_id", "media").toDF()
  }

  /** Streaming video frame statistics — the incremental twin of
    * [[graft.ops.Multimodal.mjpegFrameStats]]: watch a landing directory
    * for `.avi` drops and run the SAME demux + per-frame JPEG decode the
    * batch path uses (RIFF walk with the MJPG honesty gate, JDK ImageIO
    * per frame, exact channel means). Stateless per batch — the 1:N
    * frame fan-out happens inside the partition iterator, so a
    * micro-batch's output scales with frames kept, not files seen.
    * Non-AVI-MJPEG drops and undecodable frames vanish exactly like the
    * batch operator; StreamingSpec pins stream ≡ batch. */
  def frameStatsStream(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      stride: Int = 1
  ): DataFrame = {
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val raw = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.avi")
      .load(dir)
      .select(
        nullif(regexp_extract(col("path"), "(\\d+)\\.avi$", 1), lit(""))
          .cast("long").as("doc_id"),
        col("content").as("media"))
      .filter(col("doc_id").isNotNull)
    graft.ops.Multimodal.mjpegFrameStats(raw, "doc_id", "media", stride)
      .toDF()
  }

  /** Streaming PII scrub — the incremental twin of the batch redaction
    * pass (q58), using the SAME codegen'd expressions. Stateless (pure
    * map, no watermark, no state store): a scrub belongs at the front of
    * the feed, before anything stateful sees — or persists — raw text.
    * Emits the redacted text in place plus `n_pii` (total patterns
    * found) so a monitor can alert on PII-rate shifts in the feed. */
  def scrubStream(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import TextAnalysis.{EmailPattern, Ipv4Pattern, PhonePattern}
    docs
      .withColumn("n_pii",
        TextAnalysis.countMatches(col(textCol), EmailPattern) +
          TextAnalysis.countMatches(col(textCol), PhonePattern) +
          TextAnalysis.countMatches(col(textCol), Ipv4Pattern))
      .withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
  }

  /** Streaming classifier gate — the incremental twin of the q68
    * hashed-linear quality scorer. The model is a pure expression
    * (integer-tenths weights addressed by md5 of the token — see
    * ops.Classifier), so the streaming form is stateless and
    * shuffle-free: score and gate each micro-batch at read speed,
    * BEFORE anything stateful (dedup state stores, sinks) pays for a
    * document the gate would drop. Batch ≡ streaming by construction —
    * StreamingSpec asserts the equality on the same rows. */
  def classifyStream(
      docs: DataFrame,
      textCol: String = "text",
      dim: Int = 64,
      biasTenths: Int = 0,
      keepOnly: Boolean = true
  ): DataFrame = {
    val scored = Classifier.hashedLinearScore(docs, textCol, dim, biasTenths)
    if (keepOnly) scored.filter(col("keep")) else scored
  }

  /** Streaming Gopher-rule gate — the incremental twin of q159's
    * structural quality pre-filter. Every rule is a stateless map-side
    * expression over the token array ([[graft.ops.Curation.gopherRules]]),
    * so the streaming form is shuffle-free and sits naturally as the
    * FIRST gate on a document feed: structurally-broken docs die before
    * the classifier, the dedup state stores, or any sink pays for them.
    * Batch ≡ streaming by construction; StreamingSpec asserts the
    * equality on the same rows. */
  def gopherStream(
      docs: DataFrame,
      textCol: String = "text",
      cfg: graft.ops.Curation.GopherConfig = graft.ops.Curation.GopherConfig(),
      keepOnly: Boolean = true
  ): DataFrame = {
    val flagged = graft.ops.Curation.gopherRules(docs, textCol, cfg)
    if (keepOnly) flagged.filter(col("keep")) else flagged
  }

  /** Streaming crawl-frontier dedup — the incremental twin of q84's
    * canonical identity: arriving URLs (`ts`, `url`) canonicalize with
    * the SAME expression chain the batch path uses, then re-seen
    * canonical keys drop within the watermark horizon. This is the gate
    * in front of a fetcher: per-visit noise (tracking params, casing,
    * fragments) stops re-queueing the same resource. State is one row
    * per canonical URL, expiring with the watermark — bounded by
    * (frontier rate × horizon), not crawl history; the full dedup
    * against the historical fetch log is the batch join this stream
    * gate sits in front of (the curateStream/incrementalMinhash
    * layering). */
  def frontierStream(
      urls: DataFrame,
      watermark: String = "1 hour"
  ): DataFrame =
    urls
      .withColumn("canonical_url", WebGraph.canonicalizeUrl(col("url")))
      .filter(col("canonical_url") =!= "")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("canonical_url")

  /** Streaming link-graph build — the incremental twin of the q82 batch
    * edge aggregate: pages arrive as (`ts`, `src_host`, `html`), links
    * extract with the SAME zero-shuffle expressions
    * ([[graft.ops.WebGraph.extractLinks]]/`hostOf`), and edges count
    * into event-time windows. State is one row per
    * (window, src_host, dst_host), expiring with the watermark — the
    * hourly edge deltas a nightly [[graft.ops.WebGraph.hostRank]] batch
    * folds into the full graph, which is how a crawl keeps its authority
    * signal fresh without re-scanning history. */
  def linkEdgesStream(
      pages: DataFrame,
      watermark: String = "1 hour",
      windowLength: String = "1 hour"
  ): DataFrame =
    pages
      .select(col("ts"), col("src_host"),
        explode(WebGraph.extractLinks(col("html"))).as("url"))
      .select(col("ts"), col("src_host"),
        WebGraph.hostOf(col("url")).as("dst_host"))
      .filter(col("dst_host") =!= "")
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))
      .select(col("window.start").as("window_start"),
        col("src_host"), col("dst_host"), col("n_links"))
}
