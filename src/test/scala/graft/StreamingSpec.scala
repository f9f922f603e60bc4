package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class StreamingSpec extends SparkTestBase {
  import testImplicits._

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("hourlyRollup: incremental windowed counts match the batch shape") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.hourlyRollup(input.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("rollup")
      .outputMode("update").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(7), 2, "view", 3.0))
      q.processAllAvailable()
      val out = spark.table("rollup")
        .groupBy("window_start", "event_type")
        .agg(max("n").as("n"), max("sum_value").as("sum_value"))
        .orderBy("event_type").collect()
      assert(out.length == 2)
      assert(out.head.getAs[Long]("n") == 2) // two clicks in the window
      assert(out.head.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("sketchStream: per-window CMS cells equal the batch sketch on the same rows") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sketchStream(input.toDF(), "event_type",
      watermark = "10 minutes", depth = 2, width = 32)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("update").start()
    try {
      val rows = Seq(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(7), 2, "view", 3.0),
        Event(4, ts(9), 3, "click", 4.0))
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamCells = spark.table("cms_stream")
        .groupBy("cms_row", "cms_col").agg(max("cnt").as("cnt"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batchCells = graft.ops.Sketches.cmsBuild(
        rows.toDF(), "event_type", depth = 2, width = 32)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamCells == batchCells)
      // the streamed cells serve estimates exactly like a batch sketch
      val est = graft.ops.Sketches.cmsEstimate(
        Seq("click", "view", "ghost").toDF("item"),
        spark.table("cms_stream")
          .groupBy("cms_row", "cms_col").agg(max("cnt").as("cnt")),
        "item", depth = 2, width = 32)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est("click") >= 3L && est("view") >= 1L)
    } finally q.stop()
  }

  test("slidingRollup: an event lands in every window covering it") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.slidingRollup(input.toDF(),
      watermark = "10 minutes", windowLength = "1 hour", slide = "30 minutes")
      .writeStream.format("memory").queryName("sliding")
      .outputMode("update").start()
    try {
      input.addData(Event(1, ts(40), 1, "click", 2.0)) // minute 40
      q.processAllAvailable()
      // covered by the windows starting at minute 0 and minute 30
      val starts = spark.table("sliding").collect()
        .map(_.getAs[java.sql.Timestamp]("window_start")).distinct
      assert(starts.length == 2)
    } finally q.stop()
  }

  test("sessionWindows (built-in): gap merge closes one session per burst") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionWindows(input.toDS().toDF(), gap = "10 minutes")
      .writeStream.format("memory").queryName("swin")
      .outputMode("complete").start()
    try {
      input.addData(
        Event(1, ts(0), 7, "click", 1.0),
        Event(2, ts(5), 7, "view", 2.0),  // merges: gap < 10m
        Event(3, ts(40), 7, "click", 4.0)) // new session
      q.processAllAvailable()
      val out = spark.table("swin").orderBy("session_start").collect()
      assert(out.length == 2)
      assert(out.head.getAs[Long]("n_events") == 2 &&
        out.head.getAs[Double]("sum_value") == 3.0)
      assert(out.last.getAs[Long]("n_events") == 1)
    } finally q.stop()
  }

  test("dedupStream: re-delivered event_id within the watermark is dropped") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.dedupStream(input.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 1.0), // same id re-delivered
        Event(2, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(1, ts(3), 1, "click", 1.0)) // still within watermark
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }

  test("enrichStream: stream-static broadcast lookup attaches dim columns") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val dim = Seq(("click", "interaction"), ("view", "passive"))
      .toDF("event_type", "category")
    val q = EventStreams.enrichStream(input.toDF(), dim, "event_type")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 2, "purchase", 5.0)) // no dim row → null category
      q.processAllAvailable()
      val out = spark.table("enriched").orderBy("event_id").collect()
      assert(out(0).getAs[String]("category") == "interaction")
      assert(out(1).getAs[String]("category") == null)
    } finally q.stop()
  }

  test("asofEnrich: streamed output equals batch asofJoin on an in-order feed") {
    implicit val sc = spark.sqlContext
    // status changes are event_type == "status"; three batches delivered
    // in event-time order per key (the CDC-feed contract), with an
    // intra-batch shuffle (batch 2 arrives fact-before-change at the
    // same instant) to exercise the changes-first tie sort
    val b1 = Seq(
      Event(1, ts(0), 7, "click", 1.0),            // pre-first-change → null
      Event(100, ts(5), 7, "status", 10.0),
      Event(2, ts(6), 7, "click", 1.0))            // → 10.0
    val b2 = Seq(
      Event(3, ts(8), 7, "click", 1.0),            // → 10.0 (state crossed batches)
      Event(4, ts(9), 8, "click", 1.0),            // other key, no change yet → null
      Event(5, ts(10), 7, "click", 1.0),           // same instant as change ↓ → 20.0
      Event(101, ts(10), 7, "status", 20.0))
    val b3 = Seq(
      Event(102, ts(11), 8, "status", 30.0),
      Event(6, ts(12), 8, "click", 1.0),           // → 30.0
      Event(7, ts(13), 7, "click", 1.0))           // → 20.0 still
    val input = MemoryStream[Event]
    val q = EventStreams.asofEnrich(input.toDS(), _.event_type == "status")
      .writeStream.format("memory").queryName("asof").outputMode("append").start()
    try {
      Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("asof")
        .select("event_id", "status_ts", "status_value").collect()
        .map(r => (r.getLong(0),
          Option(r.getAs[Timestamp]("status_ts")),
          Option(r.getAs[java.lang.Double]("status_value")).map(_.doubleValue))).toSet

      val all = (b1 ++ b2 ++ b3).toDS()
      val batch = graft.ops.Joins.asofJoin(
        all.filter(col("event_type") =!= "status").toDF(),
        all.filter(col("event_type") === "status")
          .select(col("user_id"), col("ts"), col("value").as("status_value")),
        Seq("user_id"), "ts", Seq("status_value"))
        .select("event_id", "__matched_ts", "status_value").collect()
        .map(r => (r.getLong(0),
          Option(r.getAs[Timestamp]("__matched_ts")),
          Option(r.getAs[java.lang.Double]("status_value")).map(_.doubleValue))).toSet

      assert(streamed == batch)
      assert(streamed.size == 7)
      // spot-check the tie rule and the null-before-first-change rows
      val byId = streamed.map(t => t._1 -> t._3).toMap
      assert(byId(1L).isEmpty && byId(4L).isEmpty)
      assert(byId(5L).contains(20.0))
    } finally q.stop()
  }

  test("sinkToGold: availableNow drains the backlog to parquet and stops") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 2, "view", 2.0))
    val out = java.nio.file.Files.createTempDirectory("goldstream")
    val q = EventStreams.sinkToGold(
      input.toDF(), s"$out/events", s"$out/ckpt")
    q.awaitTermination(60000) // AvailableNow stops after draining
    assert(!q.isActive)
    assert(spark.read.parquet(s"$out/events").count() == 2)
    // restart with more data: checkpoint resumes, no reprocessing
    input.addData(Event(3, ts(2), 3, "click", 3.0))
    val q2 = EventStreams.sinkToGold(
      input.toDF(), s"$out/events", s"$out/ckpt")
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$out/events").count() == 3)
  }

  test("silver readStream: incremental silver→gold over arriving extraction files") {
    val root = java.nio.file.Files.createTempDirectory("silverstream")
    val dir = root.resolve("2022/students")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("students_0.json"),
      """[{"studentUniqueId": "s1", "firstName": "Ana", "lastSurname": "Lopez"}]""")
    val reader = graft.core.SilverReader(spark, root.toString, "2022")
    val out = java.nio.file.Files.createTempDirectory("goldinc")
    def drain(): Unit = {
      val q = EventStreams.sinkToGold(
        reader.readStream("students")
          .select("studentUniqueId", "firstName", "lastSurname"),
        s"$out/students", s"$out/ckpt")
      q.awaitTermination(60000)
    }
    drain()
    assert(spark.read.parquet(s"$out/students").count() == 1)
    // a new extraction drop becomes the next incremental batch
    java.nio.file.Files.writeString(dir.resolve("students_1.json"),
      """[{"studentUniqueId": "s2", "firstName": "Bo", "lastSurname": "Chen"}]""")
    drain()
    assert(spark.read.parquet(s"$out/students").count() == 2)
  }

  test("deletes feed end-to-end: stub ODS /deletes → silver → gold reflects removals") {
    // the full incremental loop the reference never closes (it extracts
    // /deletes but never consumes it): extract base + deletes twin from
    // a stub ODS, land silver, build gold, apply the deletes feed, and
    // audit the removal with diffSummary
    import graft.ingest._
    val t = new HttpTransport {
      def get(url: String, headers: Map[String, String]): (Int, String) = {
        if (!url.contains("offset="))          // root doc: version gate
          return (200, """{"dataModels": [{"name": "Ed-Fi", "version": "4.0.0"}]}""")
        val offset = "offset=(\\d+)".r.findFirstMatchIn(url)
          .map(_.group(1).toInt).getOrElse(0)
        if (offset > 0) (200, "[]")
        else if (url.contains("/deletes"))
          (200, """[{"id": "g2", "changeVersion": 9},
                    {"id": "g4", "changeVersion": 11}]""")
        else (200, (1 to 5).map(i =>
          s"""{"id": "g$i", "studentUniqueId": "s$i", "firstName": "F$i",
              "lastSurname": "L"}""").mkString("[", ", ", "]"))
      }
      def post(url: String, headers: Map[String, String],
          form: Map[String, String]): (Int, String) =
        (200, """{"access_token": "tok-1"}""")
    }
    val client = new EdFiClient(t, "http://api", "k", "s")
    val silver = java.nio.file.Files.createTempDirectory("silver-del")
    client.extractAll(Seq("students"), silver, "2022", parallelism = 1)
    val reader = graft.core.SilverReader(spark, silver.toString, "2022")
    val goldDir = java.nio.file.Files.createTempDirectory("gold-del").toString
    reader.read("students").write.mode("overwrite").parquet(s"$goldDir/students")
    val gold1 = spark.read.parquet(s"$goldDir/students")
    val gold2 = graft.ops.Snapshot.applyDeletes(
      gold1, reader.read("students_deletes"), "id")
    assert(gold2.select("id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("g1", "g3", "g5"))
    val audit = graft.ops.Snapshot.diffSummary(gold1, gold2, "id",
      Seq("studentUniqueId", "firstName", "lastSurname"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(audit == Map("removed" -> 2L))
  }

  test("curateStream: quality/language gates + fingerprint dedup on a doc feed") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "lang", "text")
    val q = graft.streaming.DocumentStreams
      .curateStream(docs, minQuality = 0.2, langs = Seq("en"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      val good = "the quick brown fox jumps over the lazy dog and then sleeps " * 5
      input.addData(
        (1L, ts(0), "en", good),
        (2L, ts(1), "en", "Good; punctuation!!! ;;; ### $$$ %%% @@@ !!! ??? &&& ***"),
        (3L, ts(2), "de", good),                 // language-gated
        (4L, ts(3), "en", good.toUpperCase))     // same fingerprint as 1 → deduped
      q.processAllAvailable()
      val kept = spark.table("curated").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(kept.contains(1L))
      assert(!kept.contains(3L)) // wrong language
      assert(!(kept.contains(1L) && kept.contains(4L))) // fp dedup kept one
      assert(kept.size == (if (kept.contains(2L)) 2 else 1))
    } finally q.stop()
  }

  test("auditStream: per-window violation counts equal the batch audit on the same rows") {
    import graft.ops.Audit
    implicit val sc = spark.sqlContext
    val dim = Seq(1L, 2L, 3L).toDF("id")
    val checks = Seq(
      Audit.NotNull("fk"),
      Audit.InRange("v", 0.0, 10.0),
      Audit.RefIntegrity("fk", dim, "id"))
    val input = MemoryStream[(Long, Timestamp, java.lang.Long, java.lang.Double)]
    val rows = input.toDF().toDF("row_id", "ts", "fk", "v")
    val q = graft.streaming.DocumentStreams
      .auditStream(rows, checks, windowDur = "10 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("audited")
      .outputMode("append").start()
    try {
      // window 1 (t+0..9): one orphan fk, one range violation, one null fk
      // window 2 (t+10..19): clean
      def row(id: Long, t: Timestamp, fk: java.lang.Long, v: java.lang.Double) =
        (id, t, fk, v)
      input.addData(
        row(1L, ts(0), 1L, 5.0),
        row(2L, ts(1), 9L, 5.0),                   // fk orphan
        row(3L, ts(2), 2L, -1.0),                  // range violation
        row(4L, ts(3), null, 5.0),                 // null fk
        row(5L, ts(11), 3L, 7.0))
      input.addData((6L, ts(25), java.lang.Long.valueOf(1L),
        java.lang.Double.valueOf(1.0)))            // advances watermark
      q.processAllAvailable()
      val out = spark.table("audited").collect()
        .map(r => r.getAs[java.sql.Timestamp]("window_start") ->
          (r.getAs[Long]("rows_checked"), r.getAs[Long]("v::not_null:fk"),
            r.getAs[Long]("v::range:v"), r.getAs[Long]("v::fk:fk"))).toMap
      assert(out.nonEmpty, "first window should have closed")
      val w1 = out.minBy(_._1.getTime)._2
      assert(w1 == (4L, 1L, 1L, 1L))
      // twin law: the batch audit over the same first-window rows agrees
      val batchRows = Seq(
        (1L, Option(1L), Option(5.0)), (2L, Option(9L), Option(5.0)),
        (3L, Option(2L), Option(-1.0)), (4L, Option.empty[Long], Option(5.0)))
        .toDF("row_id", "fk", "v")
      val batch = Audit.audit(batchRows, checks).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(batch("not_null:fk") == w1._2)
      assert(batch("range:v") == w1._3)
      assert(batch("fk:fk") == w1._4)
    } finally q.stop()
  }

  test("auditStream refuses UniqueKey (unbounded state) with a clear message") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val rows = input.toDF().toDF("k", "ts")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.DocumentStreams.auditStream(
        rows, Seq(graft.ops.Audit.UniqueKey(Seq("k"))))
    }
    assert(e.getMessage.contains("batch-only"))
  }

  test("imageFeatureStream: binaryFile landing dir decodes like the batch path") {
    import graft.ops.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("media-land")
    def bmp(id: Long): Array[Byte] = {
      val w = 6; val h = 4
      val rgb = Array.tabulate(w * h * 3)(i => ((id * 7 + i) % 256).toByte)
      Multimodal.encodeBmp(Multimodal.DecodedImage(w, h, rgb))
    }
    def png(id: Long): Array[Byte] = {
      val w = 6; val h = 4
      val rgb = Array.tabulate(w * h * 3)(i => ((id * 7 + i) % 256).toByte)
      Multimodal.encodePng(Multimodal.DecodedImage(w, h, rgb))
    }
    java.nio.file.Files.write(dir.resolve("101.bmp"), bmp(101))
    java.nio.file.Files.write(dir.resolve("102.bmp"), bmp(102))
    java.nio.file.Files.write(dir.resolve("103.png"), png(103))
    java.nio.file.Files.writeString(dir.resolve("readme.txt"), "not media")
    // glob-matching but digit-less name: must DROP (ANSI cast of the
    // "" regexp_extract would otherwise kill the whole streaming query)
    java.nio.file.Files.write(dir.resolve("cover.png"), png(999))
    val q = graft.streaming.DocumentStreams
      .imageFeatureStream(spark, dir.toString, 3, 3)
      .writeStream.format("memory").queryName("media_feats")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val streamed = spark.table("media_feats").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Double]("mean_r"), r.getAs[Double]("mean_g"),
            r.getAs[Double]("mean_b"))).toMap
      // twin law: identical to the batch operator over the same bytes
      val batch = Multimodal.imageFeatures(
        Seq((101L, bmp(101)), (102L, bmp(102)), (103L, png(103)))
          .toDF("doc_id", "media"),
        "doc_id", "media", 3, 3)
        .collect().map(f => f.doc_id -> (f.mean_r, f.mean_g, f.mean_b)).toMap
      assert(streamed == batch)
      // the .txt never enters; the digit-less cover.png drops on its
      // null doc_id; the PNG decodes through ImageIO like batch
      assert(streamed.keySet == Set(101L, 102L, 103L))
    } finally q.stop()
  }

  test("imageFeatureStream: checkpointed kill/restart is exactly-once on the file sink") {
    import graft.ops.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("media-ckpt-land")
    val sink = java.nio.file.Files.createTempDirectory("media-ckpt-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("media-ckpt-log").toString
    def bmp(id: Long): Array[Byte] = {
      val w = 6; val h = 4
      Multimodal.encodeBmp(Multimodal.DecodedImage(w, h,
        Array.tabulate(w * h * 3)(i => ((id * 11 + i) % 256).toByte)))
    }
    (201L to 204L).foreach(id =>
      java.nio.file.Files.write(dir.resolve(s"$id.bmp"), bmp(id)))
    def start() = graft.streaming.DocumentStreams
      .imageFeatureStream(spark, dir.toString, 3, 3, maxFilesPerTrigger = 1)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", sink)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

    // run 1 — KILL mid-stream: with one file per micro-batch, stop the
    // query after some (not all) batches committed; the checkpoint +
    // file-sink commit log are now a partially-processed state
    val q1 = start()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (q1.isActive &&
        q1.recentProgress.map(_.numInputRows).sum < 2 &&
        System.nanoTime() < deadline)
      Thread.sleep(25)
    q1.stop()
    // run 2 — resume from the SAME checkpoint: drains the remainder
    val q2 = start(); try q2.awaitTermination(60000) finally q2.stop()
    // late arrivals, then a third resume: only the new file processes
    java.nio.file.Files.write(dir.resolve("205.bmp"), bmp(205L))
    val q3 = start(); try q3.awaitTermination(60000) finally q3.stop()

    // exactly-once: reading the sink THROUGH its _spark_metadata commit
    // log (spark.read does this automatically for file-sink dirs) shows
    // every doc exactly once — no losses from the kill, no duplicates
    // from the replay of the in-flight batch
    val got = spark.read.parquet(sink)
      .groupBy("doc_id").count().collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
    assert(got.keySet == (201L to 205L).toSet,
      s"lost or phantom docs after restart: ${got.keySet.toSeq.sorted}")
    assert(got.values.forall(_ == 1L),
      s"duplicate emissions after restart: $got")
    // and the values match the batch operator (the twin law, post-crash)
    val batch = Multimodal.imageFeatures(
      (201L to 205L).map(id => (id, bmp(id))).toDF("doc_id", "media"),
      "doc_id", "media", 3, 3)
      .collect().map(f => f.doc_id -> (f.mean_r, f.mean_g, f.mean_b)).toMap
    val streamed = spark.read.parquet(sink).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("mean_r"), r.getAs[Double]("mean_g"),
          r.getAs[Double]("mean_b"))).toMap
    assert(streamed == batch)
  }

  test("frameStatsStream: arriving AVI-MJPEG videos decode like the batch path") {
    import graft.ops.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("video-land")
    def flat(v: Int) = Multimodal.DecodedImage(16, 12,
      Array.fill(16 * 12 * 3)(v.toByte))
    def avi(id: Long): Array[Byte] = Multimodal.aviMjpeg(16, 12,
      Seq(40 + id.toInt, 120, 200).map(v =>
        Multimodal.encodeJpeg(flat(v), 0.9f)))
    java.nio.file.Files.write(dir.resolve("7.avi"), avi(7))
    java.nio.file.Files.write(dir.resolve("8.avi"), avi(8))
    java.nio.file.Files.writeString(dir.resolve("notes.txt"), "not media")
    val q = graft.streaming.DocumentStreams
      .frameStatsStream(spark, dir.toString, stride = 2)
      .writeStream.format("memory").queryName("video_feats")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val streamed = spark.table("video_feats").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx")) ->
          (r.getAs[Double]("mean_r"), r.getAs[Double]("mean_g"),
            r.getAs[Double]("mean_b"))).toMap
      val batch = Multimodal.mjpegFrameStats(
        Seq((7L, avi(7)), (8L, avi(8))).toDF("doc_id", "media"),
        "doc_id", "media", stride = 2)
        .collect().map(f => (f.doc_id, f.frame_idx) ->
          (f.mean_r, f.mean_g, f.mean_b)).toMap
      assert(streamed == batch)
      // stride 2 keeps frames 0 and 2 of each 3-frame video
      assert(streamed.keySet ==
        Set((7L, 0L), (7L, 2L), (8L, 0L), (8L, 2L)))
    } finally q.stop()
  }

  test("audioStatsStream: WAV and FLAC drops decode like the batch path") {
    import graft.ops.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("audio-land")
    def sig(id: Long): Array[Short] =
      Array.tabulate(300)(i => (((id * 31 + i * 17) % 2003) - 1001).toShort)
    java.nio.file.Files.write(dir.resolve("301.wav"),
      Multimodal.pcm16Wav(16000L, sig(301)))
    java.nio.file.Files.write(dir.resolve("302.flac"),
      Multimodal.flacEncode(16000L, sig(302), 64))
    java.nio.file.Files.write(dir.resolve("303.flac"),
      Multimodal.flacEncodeStereo(16000L, sig(303), sig(304), 64)) // stereo: drops
    java.nio.file.Files.writeString(dir.resolve("304.wav"), "junk") // undecodable
    java.nio.file.Files.write(dir.resolve("intro.flac"),
      Multimodal.flacEncode(8000L, sig(9), 64)) // digit-less name: drops
    val q = graft.streaming.DocumentStreams
      .audioStatsStream(spark, dir.toString)
      .writeStream.format("memory").queryName("audio_stats")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val streamed = spark.table("audio_stats").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_samples"), r.getAs[Long]("peak"),
            r.getAs[Long]("sum_abs"), r.getAs[Long]("mean_sq"))).toMap
      val batch = Multimodal.pcmStats(
        Seq((301L, Multimodal.pcm16Wav(16000L, sig(301))),
          (302L, Multimodal.flacEncode(16000L, sig(302), 64)))
          .toDF("doc_id", "media"),
        "doc_id", "media")
        .collect().map(s => s.doc_id ->
          (s.n_samples, s.peak, s.sum_abs, s.mean_sq)).toMap
      assert(streamed == batch)
      assert(streamed.keySet == Set(301L, 302L))
      // same content, either container: identical stats
      assert(streamed(301L)._2 == batch(301L)._2)
    } finally q.stop()
  }

  test("mediaDedupStream: arrivals Hamming-probe the static index like batch") {
    import graft.ops.{Dedup, Multimodal}
    val dir = java.nio.file.Files.createTempDirectory("media-dedup-land")
    def img(k: Long, flip: Boolean): Multimodal.DecodedImage = {
      val w = 16; val h = 16
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val v = if (x < w / 2 ^ y < h / 2) 200 else 20
        val vv = if (flip && x == 0 && y == 0) 255
                 else (v + k * 3).min(255).toInt
        val i = (y * w + x) * 3
        rgb(i) = vv.toByte; rgb(i + 1) = vv.toByte; rgb(i + 2) = vv.toByte
      }
      Multimodal.DecodedImage(w, h, rgb)
    }
    def fpOf(pairs: Seq[(Long, Array[Byte])]) =
      Multimodal.imageAHash(pairs.toDF("doc_id", "media"), "doc_id", "media")
        .toDF()
        .select(col("doc_id") +: (0 until 4).map(b =>
          conv(substring(col("ahash"), b * 16 + 1, 16), 2, 10)
            .cast("long").as(s"b$b")): _*)
    // index: fingerprints of three corpus images
    val corpus = Seq(
      (100L, Multimodal.encodeBmp(img(0, flip = false))),
      (101L, Multimodal.encodeBmp(img(1, flip = false))),
      (102L, Multimodal.encodeBmp(img(40, flip = false))))
    val index = fpOf(corpus)
    index.persist().count()
    // arrivals: an exact dup of 100 (as PNG), a near-dup (flipped corner),
    // and junk that never decodes
    java.nio.file.Files.write(dir.resolve("1.png"),
      Multimodal.encodePng(img(0, flip = false)))
    java.nio.file.Files.write(dir.resolve("2.png"),
      Multimodal.encodePng(img(0, flip = true)))
    java.nio.file.Files.write(dir.resolve("3.png"), "junk".getBytes)
    val q = graft.streaming.DocumentStreams
      .mediaDedupStream(spark, dir.toString, index, maxHamming = 4)
      .writeStream.format("memory").queryName("media_dedup")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val streamed = spark.table("media_dedup").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("index_id"),
          r.getAs[Number]("hamming").longValue)).toSet
      // batch twin: same probe over the same decodable files
      val arrivals = fpOf(Seq(
        (1L, Multimodal.encodePng(img(0, flip = false))),
        (2L, Multimodal.encodePng(img(0, flip = true)))))
      val bandNames = (0 until 4).map(b => s"b$b")
      val idx = index.withColumnsRenamed(
        (("doc_id" -> "index_id") +: bandNames.map(n => n -> s"i_$n")).toMap)
      val hamming = bandNames.map(n =>
        bit_count(col(n).bitwiseXOR(col(s"i_$n")))).reduce(_ + _)
      val batch = arrivals.join(idx, hamming <= 4)
        .select(col("doc_id"), col("index_id"), hamming.cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch)
      // the exact dup must hit its source at hamming 0
      assert(streamed.contains((1L, 100L, 0L)))
      // the near-dup hits with a small positive distance
      assert(streamed.exists { case (d, i, h) => d == 2L && i == 100L && h >= 0L })
      // junk never decodes, never probes
      assert(!streamed.exists(_._1 == 3L))
    } finally { q.stop(); index.unpersist() }
  }

  test("scrubStream: in-flight PII redaction matches the batch expressions row for row") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.DocumentStreams.scrubStream(docs)
      .writeStream.format("memory").queryName("scrubbed")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "mail me at a.b@example.org from 10.1.2.3"),
        (2L, "call 555-123-4567 twice"),
        (3L, "nothing sensitive here"))
      q.processAllAvailable()
      val out = spark.table("scrubbed").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("text"), r.getAs[Long]("n_pii"))).toMap
      assert(out(1L) == ("mail me at <EMAIL> from <IP>", 2L))
      assert(out(2L) == ("call <PHONE> twice", 1L))
      assert(out(3L) == ("nothing sensitive here", 0L))
    } finally q.stop()
  }

  test("classifyStream: streamed scores equal the batch classifier row for row") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.DocumentStreams
      .classifyStream(docs, keepOnly = false)
      .writeStream.format("memory").queryName("classified")
      .outputMode("append").start()
    try {
      val rows = Seq(
        (1L, "spark join fast table scan"),
        (2L, "slow merge batch window stream"),
        (3L, "a"))
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("classified")
        .select("doc_id", "score", "keep").orderBy("doc_id").collect().toSeq
      val batch = graft.ops.Classifier
        .hashedLinearScore(rows.toDF("doc_id", "text"), "text", dim = 64)
        .select("doc_id", "score", "keep").orderBy("doc_id").collect().toSeq
      assert(streamed == batch)
      // the gating form keeps exactly the keep=true rows
      assert(graft.streaming.DocumentStreams.classifyStream(
        rows.toDF("doc_id", "text")).count() ==
        batch.count(_.getAs[Boolean]("keep")))
    } finally q.stop()
  }

  test("sessionTimeoutStream: event-time timers close sessions as the watermark passes") {
    implicit val sc = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    import org.apache.spark.sql.functions.{col => fcol}
    val watermarked = input.toDS()
      .withWatermark("ts", "0 seconds")
      .as[Event](org.apache.spark.sql.Encoders.product[Event])
    val q = EventStreams.sessionTimeoutStream(watermarked, gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("timed_sessions")
      .outputMode("append").start()
    try {
      def e(id: Long, u: Long, t: String) =
        Event(id, Timestamp.valueOf(t), u, "view", 1.0)
      // burst 1 for u1 (2 events, 10 min apart)
      input.addData(
        e(1, 1, "2024-01-01 10:00:00"), e(2, 1, "2024-01-01 10:10:00"))
      q.processAllAvailable()
      assert(spark.table("timed_sessions").count() == 0,
        "session must stay open until the watermark passes lastSeen+gap")
      // an event far in the future advances the watermark past the horizon
      input.addData(e(3, 2, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      // one more batch so the new watermark fires the timer
      input.addData(e(4, 2, "2024-01-01 12:01:00"))
      q.processAllAvailable()
      val closed = spark.table("timed_sessions")
        .select("user_id", "n_events").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(closed.get(1L).contains(2L),
        s"u1's burst must have closed with 2 events, got $closed")
    } finally {
      q.stop()
      before match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("driftStream: windowed TVD against a frozen baseline, hand-checked") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    // baseline: values of magnitude bucket 1 (v=1) and 2 (v=2..3), 50/50
    val baseline = Map(1L -> 0.5, 2L -> 0.5)
    val q = EventStreams.driftStream(input.toDF(), "value", baseline,
        windowDur = "1 hour", watermark = "1 hour")
      .writeStream.format("memory").queryName("drift")
      .outputMode("update").start()
    try {
      def e(id: Long, v: Double) =
        Event(id, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "x", v)
      // window: 4 events, buckets: v=1 -> b1 (x2), v=2 -> b2 (x1), v=8 -> b4 (x1)
      input.addData(e(1, 1.0), e(2, 1.0), e(3, 2.0), e(4, 8.0))
      q.processAllAvailable()
      val r = spark.table("drift").orderBy(col("n_rows").desc).collect().head
      assert(r.getAs[Long]("n_rows") == 4L)
      // shares: b1=0.5, b2=0.25, b4=0.25 vs baseline b1=0.5, b2=0.5
      // tvd = 0.5 * (|0.5-0.5| + |0.25-0.5| + |0.25-0|) = 0.25
      assert(math.abs(r.getAs[Double]("tvd") - 0.25) < 1e-12)
    } finally q.stop()
  }

  test("quotaGate (transformWithState): counter survives micro-batches, RocksDB store") {
    implicit val sc = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = EventStreams.quotaGate(input.toDS(), maxPerKey = 3)
      .writeStream.format("memory").queryName("quota")
      .outputMode("append").start()
    try {
      def e(id: Long, u: Long) =
        Event(id, Timestamp.valueOf(s"2024-01-01 10:00:0$id"), u, "view", 1.0)
      // batch 1: u1 gets 2 admitted, u2 gets 1
      input.addData(e(1, 1), e(2, 1), e(3, 2))
      q.processAllAvailable()
      // batch 2: u1 may admit ONE more (counter persisted), then drops
      input.addData(e(4, 1), e(5, 1), e(6, 1), e(7, 2))
      q.processAllAvailable()
      val out = spark.table("quota")
        .select("event_id", "user_id", "admitted_n").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set(
        (1L, 1L, 1L), (2L, 1L, 2L), (4L, 1L, 3L),   // u1 capped at 3
        (3L, 2L, 1L), (7L, 2L, 2L)))                // u2 under quota
    } finally {
      q.stop()
      before match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("ewmaStream (transformWithState): last emission equals batch ewmaLast across micro-batches") {
    implicit val sc = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = EventStreams.ewmaStream(input.toDS(), window = 3)
      .writeStream.format("memory").queryName("ewma")
      .outputMode("append").start()
    try {
      def e(id: Long, u: Long, v: Double) =
        Event(id, Timestamp.valueOf(s"2024-01-01 10:00:0$id"), u, "view", v)
      // the window-3 buffer must carry values ACROSS the batch boundary
      input.addData(e(1, 1, 1.0), e(2, 1, 2.0), e(3, 2, 5.0))
      q.processAllAvailable()
      input.addData(e(4, 1, 3.0), e(5, 1, 4.0))
      q.processAllAvailable()
      val lastPerKey = spark.table("ewma")
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      // batch twin over the identical full feed
      val all = Seq((1L, 1L, 1L, 1.0), (2L, 2L, 1L, 2.0), (3L, 3L, 2L, 5.0),
        (4L, 4L, 1L, 3.0), (5L, 5L, 1L, 4.0))
        .toDF("event_id", "t", "user_id", "value")
      val batch = graft.ops.Series
        .ewmaLast(all, "user_id", "t", "event_id", "value", window = 3)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))).toMap
      assert(lastPerKey == batch)
      // hand value: u1 (4 events) last-3 = (4,3,2) ->
      // num = 400*4 + 300*2 + 200*1 = 2400, den = 7
      assert(lastPerKey(1L) == ((4L, 2400L, 7L, 2400.0 / 7.0 / 100.0)))
    } finally {
      q.stop()
      before match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("intervalJoinStream: stream-stream matches within horizon, batch equality") {
    implicit val sc = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp, String)]
    val buys = MemoryStream[(Long, Timestamp, String)]
    val l = views.toDF().toDF("user_id", "ts", "page")
    val r = buys.toDF().toDF("user_id", "ts", "item")
    val q = EventStreams.intervalJoinStream(l, r, "user_id", "ts",
        horizon = "10 minutes", watermark = "30 minutes")
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      views.addData(
        (1L, t("2024-01-01 10:00:00"), "home"),
        (1L, t("2024-01-01 11:00:00"), "pricing"),
        (2L, t("2024-01-01 10:00:00"), "home"))
      buys.addData(
        (1L, t("2024-01-01 10:05:00"), "basic"),   // within 10m of home only
        (1L, t("2024-01-01 11:09:00"), "pro"),     // within 10m of pricing
        (2L, t("2024-01-01 10:30:00"), "late"),    // outside every horizon
        (3L, t("2024-01-01 10:00:00"), "orphan"))  // no view at all
      q.processAllAvailable()
      val streamed = spark.table("attributed")
        .select("user_id", "page", "item").collect()
        .map(r0 => (r0.getLong(0), r0.getString(1), r0.getString(2))).toSet
      assert(streamed == Set(
        (1L, "home", "basic"), (1L, "pricing", "pro")))
      // batch twin: identical join condition over the same rows
      val lb = Seq((1L, t("2024-01-01 10:00:00"), "home"),
        (1L, t("2024-01-01 11:00:00"), "pricing"),
        (2L, t("2024-01-01 10:00:00"), "home")).toDF("user_id", "ts", "page")
      val rb = Seq((1L, t("2024-01-01 10:05:00"), "basic"),
        (1L, t("2024-01-01 11:09:00"), "pro"),
        (2L, t("2024-01-01 10:30:00"), "late"),
        (3L, t("2024-01-01 10:00:00"), "orphan")).toDF("user_id", "ts", "item")
      val batch = lb.join(rb.withColumnRenamed("ts", "r_ts"), Seq("user_id"))
        .filter(col("r_ts") >= col("ts") &&
          col("r_ts") <= col("ts") + expr("interval 10 minutes"))
        .select("user_id", "page", "item").collect()
        .map(r0 => (r0.getLong(0), r0.getString(1), r0.getString(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("gopherStream: streamed rule flags equal the batch gopherRules row for row") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val cfg = graft.ops.Curation.GopherConfig(
      minWords = 5, stopwords = Seq("a", "the"), minStopHits = 1)
    val q = graft.streaming.DocumentStreams
      .gopherStream(docs, cfg = cfg, keepOnly = false)
      .writeStream.format("memory").queryName("gophered")
      .outputMode("append").start()
    try {
      val rows = Seq(
        (1L, "the quick brown fox jumps over a lazy dog"),
        (2L, "too short"),
        (3L, "value table row line scan merge batch sort"))
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("gophered")
        .select("doc_id", "n_words", "g_word_count", "g_stopwords", "keep")
        .orderBy("doc_id").collect().toSeq
      val batch = graft.ops.Curation.gopherRules(rows.toDF("doc_id", "text"), "text", cfg)
        .select("doc_id", "n_words", "g_word_count", "g_stopwords", "keep")
        .orderBy("doc_id").collect().toSeq
      assert(streamed == batch)
      assert(streamed.map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
        == Map(1L -> true, 2L -> false, 3L -> false))
    } finally q.stop()
  }

  test("frontierStream: per-visit URL noise dedups to one fetch per resource") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val urls = input.toDF().toDF("req_id", "ts", "url")
    val q = graft.streaming.DocumentStreams
      .frontierStream(urls, watermark = "10 minutes")
      .writeStream.format("memory").queryName("frontier")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts(0), "HTTP://EX.com:80/p?utm_source=a#top"), // canonical: http://ex.com/p
        (2L, ts(1), "http://ex.com/p?gclid=z"),             // same resource, re-seen → drop
        (3L, ts(2), "http://ex.com/q"),                      // distinct resource
        (4L, ts(3), "not a url"))                            // filtered, never queued
      q.processAllAvailable()
      input.addData((5L, ts(4), "http://ex.com/p"))          // still within horizon → drop
      q.processAllAvailable()
      val kept = spark.table("frontier").collect().map(_.getAs[Long]("req_id")).toSet
      assert(kept == Set(1L, 3L))
      val canon = spark.table("frontier").collect()
        .map(_.getAs[String]("canonical_url")).toSet
      assert(canon == Set("http://ex.com/p", "http://ex.com/q"))
    } finally q.stop()
  }

  test("linkEdgesStream: windowed edge counts equal the batch hostEdges aggregate") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, String)]
    val pages = input.toDF().toDF("page_id", "ts", "src_host", "html")
    val q = graft.streaming.DocumentStreams
      .linkEdgesStream(pages, watermark = "10 minutes", windowLength = "1 hour")
      .writeStream.format("memory").queryName("linkedges")
      .outputMode("update").start()
    try {
      val rows = Seq(
        (1L, ts(0), "a.ex", """<a href="http://b.ex/1">x</a><A HREF="HTTP://B.EX/2">y</A>"""),
        (2L, ts(3), "b.ex", """<a href="http://a.ex/1">z</a><a href="/rel">r</a>"""),
        (3L, ts(5), "a.ex", """<a href="https://b.ex/3">w</a>"""))
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*) // same window: the a.ex→b.ex count grows
      q.processAllAvailable()
      // update mode re-emits a key's row per batch: latest state = max n
      val streamed = spark.table("linkedges")
        .groupBy("src_host", "dst_host").agg(max("n_links").as("n_links"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = graft.ops.WebGraph
        .hostEdges(rows.toDF("page_id", "ts", "src_host", "html"),
          col("src_host"), col("html"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
      assert(batch == Map(("a.ex", "b.ex") -> 3L, ("b.ex", "a.ex") -> 1L))
    } finally q.stop()
  }

  test("end-to-end incremental lake: silver stream → view → gold == batch pipeline") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("lake")
    val silver = root.resolve("silver")
    val gold = root.resolve("gold").toString
    val ckpt = root.resolve("ckpt").toString

    val descriptorsJson = """[
      {"gradingPeriodDescriptorId": 123, "codeValue": "First Six Weeks"},
      {"gradingPeriodDescriptorId": 124, "codeValue": "Second Six Weeks"}
    ]"""
    def gpJson(school: Long, code: String, begin: String, seq: Int) =
      s"""[{"schoolReference": {"schoolId": $school},
            "schoolYearTypeReference": {"schoolYear": 2022},
            "gradingPeriodDescriptor": "uri://ed-fi.org/GradingPeriodDescriptor#$code",
            "beginDate": "$begin", "endDate": "2022-06-30",
            "totalInstructionalDays": 29, "periodSequence": $seq}]"""
    def drop(n: Int, json: String): Unit = {
      val dir = silver.resolve("2022/gradingPeriods")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(s"gradingPeriods_$n.json"), json)
    }
    val dDir = silver.resolve("2022/gradingPeriodDescriptors")
    Files.createDirectories(dDir)
    Files.writeString(dDir.resolve("gradingPeriodDescriptors_1.json"), descriptorsJson)

    // the REAL view builder over a ctx whose fact endpoint is the stream
    // and whose descriptor endpoint is the static silver read — the
    // incremental silver→gold path from SilverReader's scaladoc
    val reader = graft.core.SilverReader(spark, silver.toString, "2022")
    def runIncrement(): Unit = {
      lazy val ctx: graft.views.ViewContext = graft.views.ViewContext(
        spark,
        endpoint = n =>
          if (n == "gradingPeriods") reader.readStream(n) else reader.read(n),
        view = n => graft.runner.AmtRegistry.byName(n).build(ctx))
      val q = EventStreams.sinkToGold(
        graft.views.base.GradingPeriodDim.build(ctx), gold, ckpt)
      q.awaitTermination(120000)
    }

    drop(1, gpJson(101, "First Six Weeks", "2021-08-23", 1))
    runIncrement() // backlog batch 1
    drop(2, gpJson(102, "Second Six Weeks", "2021-10-04", 2))
    runIncrement() // ONLY the new file — the checkpoint remembers drop 1
    graft.core.Compaction.compact(spark, gold, targetMB = 512)

    val streamed = spark.read.parquet(gold)
    val batch = new graft.runner.AmtPipeline(spark, silver.toString, "2022")
      .view("gradingPeriodDim")
    assert(streamed.count() == 2)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  // the 0.565-style 2-dp honeypot became moot when the state widened to
  // 12 dp; the 5e-13 value below plays the same role at the new scale
  test("runningStats: latest emitted state equals batch partialStats after every batch") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.runningStats(input.toDS())
      .writeStream.format("memory").queryName("runstats")
      .outputMode("update").start()
    try {
      // 5e-13 is the quantization honeypot at the state's 12-dp scale:
      // its decimal string is exactly 0.0000000000005 (rounds UP to
      // 1e-12 under HALF_UP) while its binary expansion is
      // 4.9999…e-13 (rounds DOWN to 0) — the streaming state must use
      // the decimal-string path like Spark's cast, and this value
      // catches a regression to exact-binary rounding
      val b1 = Seq(Event(1, ts(0), 7, "a", 5e-13), Event(2, ts(1), 7, "b", 2.0),
        Event(3, ts(2), 8, "a", -1.25))
      // NaN mirrors the batch semantics: no sum contribution (cast →
      // null), counted in n_v, and sorts LARGEST for min/max
      val b2 = Seq(Event(4, ts(3), 7, "a", 10.111),
        Event(5, ts(4), 8, "b", 0.004), Event(6, ts(5), 8, "a", Double.NaN))
      def batchStats(rows: Seq[Event]) = {
        import graft.ops.Stats
        Stats.partialStats(
          rows.toDF(), Seq("user_id"), "value")
          .collect().map(r => r.getAs[Long]("user_id") ->
            (r.getAs[Long]("cnt"), r.getAs[java.math.BigDecimal]("sum_v"),
              r.getAs[Double]("min_v"), r.getAs[Double]("max_v"))).toMap
      }
      def latestStreamed(): Map[Long, (Long, java.math.BigDecimal, Double, Double)] =
        spark.table("runstats").collect()
          .map(r => r.getAs[Long]("user_id") ->
            (r.getAs[Long]("cnt"), r.getAs[java.math.BigDecimal]("sum_v"),
              r.getAs[Double]("min_v"), r.getAs[Double]("max_v")))
          .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
      // NaN == NaN is false under ==; Double.compare treats them equal
      def dEq(a: Double, b: Double) = java.lang.Double.compare(a, b) == 0
      input.addData(b1: _*); q.processAllAvailable()
      val afterB1 = latestStreamed()
      batchStats(b1).foreach { case (k, (cnt, sum, mn, mx)) =>
        val (scnt, ssum, smn, smx) = afterB1(k)
        assert(scnt == cnt && ssum.compareTo(sum) == 0)
        assert(dEq(smn, mn) && dEq(smx, mx))
      }
      input.addData(b2: _*); q.processAllAvailable()
      val afterB2 = latestStreamed()
      batchStats(b1 ++ b2).foreach { case (k, (cnt, sum, mn, mx)) =>
        val (scnt, ssum, smn, smx) = afterB2(k)
        assert(scnt == cnt, s"key $k cnt $scnt != $cnt")
        assert(ssum.compareTo(sum) == 0, s"key $k sum $ssum != $sum")
        assert(dEq(smn, mn) && dEq(smx, mx), s"key $k min/max $smn/$smx != $mn/$mx")
      }
    } finally q.stop()
  }

  test("sessionize: gap closes a session and emits its summary") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapMs = 10 * 60000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // session 1: minutes 0-5; then 30min silence; session 2: minute 40
      input.addData(
        Event(1, ts(0), 7, "click", 1.0),
        Event(2, ts(5), 7, "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(40), 7, "click", 1.0))
      q.processAllAvailable()
      // advance the watermark so the first session's event-time timeout fires
      input.addData(Event(4, ts(90), 8, "view", 1.0))
      q.processAllAvailable()
      val out = spark.table("sessions").orderBy("session_start").collect()
      assert(out.nonEmpty)
      val s1 = out.head
      assert(s1.getAs[Long]("user_id") == 7L)
      assert(s1.getAs[Long]("n_events") == 2L)
      assert(s1.getAs[Timestamp]("session_end") == ts(5))
    } finally q.stop()
  }

  test("transitionPairs: aggregated stream pairs equal the batch transition matrix") {
    implicit val sc = spark.sqlContext
    // per-user in-order feed across THREE batches (state must carry the
    // chain head over batch boundaries); batch 2 delivers a same-instant
    // tie out of order to exercise the (ts, event_id) sort
    val b1 = Seq(
      Event(1, ts(0), 7, "view", 0.0),
      Event(2, ts(1), 7, "click", 0.0),
      Event(3, ts(0), 8, "view", 0.0))
    val b2 = Seq(
      Event(5, ts(2), 7, "purchase", 0.0), // same instant, higher id → second
      Event(4, ts(2), 7, "click", 0.0),
      Event(6, ts(3), 8, "error", 0.0))
    val b3 = Seq(
      Event(7, ts(9), 7, "view", 0.0),
      Event(8, ts(10), 9, "signup", 0.0))
    val input = MemoryStream[Event]
    val q = EventStreams.transitionPairs(input.toDS())
      .writeStream.format("memory").queryName("trans").outputMode("append").start()
    try {
      Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("trans")
        .groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val batch = graft.ops.Behavior.transitions(
        (b1 ++ b2 ++ b3).toDS().toDF(), "user_id", "ts", "event_id", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
      // the cross-batch chain: u7's batch-3 view follows batch-2's purchase
      assert(streamed.contains(("purchase", "view", 1L)))
      // the intra-batch tie resolved by event_id: click(4) before purchase(5)
      assert(streamed.contains(("click", "purchase", 1L)))
      assert(streamed.contains(("(start)", "view", 2L)))
    } finally q.stop()
  }

  test("funnelTimes: incremental step times equal the batch funnel on an in-order feed") {
    implicit val sc = spark.sqlContext
    val hourUs = 3600L * 1000000
    // u7 completes across three batches; u8's purchase precedes its
    // click (ordered semantics must hold it back); u9 converts too late
    // for the 1h window
    val b1 = Seq(
      Event(1, ts(0), 7, "view", 0.0),
      Event(2, ts(1), 8, "view", 0.0),
      Event(3, ts(2), 8, "purchase", 0.0), // out of funnel order
      Event(4, ts(0), 9, "view", 0.0))
    val b2 = Seq(
      Event(5, ts(10), 7, "click", 0.0),
      Event(6, ts(11), 8, "click", 0.0))
    val b3 = Seq(
      Event(7, ts(20), 7, "purchase", 0.0),
      Event(8, ts(70), 9, "click", 0.0)) // 70min after the view: outside 1h
    val steps = Seq("view", "click", "purchase")
    val input = MemoryStream[Event]
    val q = EventStreams.funnelTimes(input.toDS(), steps, Some(hourUs))
      .writeStream.format("memory").queryName("funnel").outputMode("update").start()
    try {
      Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
      // emissions improve monotonically; fold per user by keeping each
      // slot's value once set
      // Option[Long] encodes as a nullable bigint array element — read
      // raw and re-wrap
      val streamed = spark.table("funnel")
        .collect().map(r => (r.getLong(0),
          r.getSeq[Any](1).map(v => Option(v).map(_.asInstanceOf[Long]))))
        .groupBy(_._1).map { case (u, rows) =>
          u -> (0 until steps.size).map(i =>
            rows.flatMap(_._2(i)).headOption).toSeq
        }
      val batch = graft.ops.Behavior.funnelUserTimes(
        (b1 ++ b2 ++ b3).toDS().toDF(), "user_id", "ts", "event_type",
        steps, Some(hourUs))
        .collect().map { r =>
          r.getLong(0) -> (1 to steps.size).map(i =>
            Option(r.getTimestamp(i)).map(_.getTime * 1000L)).toSeq
        }.toMap
      // batch emits a row per user with events; streaming only emits on
      // funnel progress — compare on streaming's users, and confirm the
      // batch rows for missing users carry no step times at all
      streamed.foreach { case (u, times) => assert(batch(u) == times,
        s"user $u: streamed $times vs batch ${batch(u)}") }
      (batch.keySet -- streamed.keySet).foreach { u =>
        assert(batch(u).forall(_.isEmpty), s"user $u reached steps but never streamed")
      }
      // the held-back purchase and the window miss, pinned explicitly
      assert(streamed(8L)(2).isEmpty && streamed(9L)(1).isEmpty)
      assert(streamed(7L)(2).contains(ts(20).getTime * 1000L))
    } finally q.stop()
  }
}
