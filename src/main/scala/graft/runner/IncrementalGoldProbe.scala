package graft.runner

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.ops.IncrementalGold
import graft.views.ViewContext

/** Scale evidence for [[IncrementalGold]] (VERDICT r9 item 1, r11
  * item 1): the EWS fact advanced by a FIXED-SIZE change-version batch
  * against a student corpus at 1× and 10×, three arms —
  *
  *   - `full`: the reference's behavior (schedule.py:8-10) — recompute
  *     the whole view over the post-CDC endpoint state; cost grows with
  *     the corpus;
  *   - `incr`: [[IncrementalGold.refreshView]] — CDC-apply the batch,
  *     rebuild only the affected students' slice, broadcast-anti-merge
  *     into the parquet-backed old gold; shuffle-free but SCAN-BOUND
  *     (every corpus parquet still read whole each batch);
  *   - `pruned`: the fully pruned loop — gold AND endpoint snapshots
  *     scope-partitioned ([[IncrementalGold.writeGoldPartitioned]] /
  *     [[IncrementalGold.writeEndpointPartitioned]]), delete-scope
  *     recovery off the id-bucketed keymap sidecar
  *     ([[IncrementalGold.batchScopesPruned]]), the merge reading only
  *     affected buckets ([[IncrementalGold.prunedMerge]] +
  *     [[IncrementalGold.postCdcSlicePruned]]).
  *
  * Bucket counts follow the CONSTANT-BUCKET-SIZE rule (object scaladoc):
  * B = corpus/400 students per layout, so B grows 10× with the corpus
  * and a fixed-k delta touches ≈ B·(1−(1−1/B)^k) buckets — a FALLING
  * fraction of the corpus as it grows. The probe prints the touched
  * bucket count per scale so the recorded numbers carry their own
  * prune-factor evidence; run it at deltaStudents=1000 (k comparable to
  * B at 1× — prune useless there, real at ×10) AND deltaStudents=100
  * (k ≪ B both scales) to see both regimes.
  *
  * Old gold + endpoint snapshots + keymap are parquet-backed and UNTIMED
  * (they are the standing lake state); every arm ends in a noop write of
  * the gold frame it materializes — full/incr produce the whole view,
  * pruned produces the affected buckets' merged slice (exactly what its
  * dynamic-partition-overwrite write would land).
  *
  * Fixture: students i enrolled at school i%25 (no exit), a 31-day
  * January-1995 calendar over 25 schools (every 5th day a holiday), 4
  * attendance events per student. The batch upserts 4 fresh events for
  * `deltaStudents` fixed students and deletes 200 enrollments via the
  * `/deletes` id feed — the delta-delivery norm.
  *
  * Run: `graft.runner.IncrementalGoldProbe [students1x] [deltaStudents]
  * [targetBucketKB] [deleteCount]`.
  *
  * `targetBucketKB` (r13, VERDICT r12 item 6) switches the layout to the
  * bucket-size-by-BYTES rule: B = layoutBytes / targetBucketBytes
  * (measured off the written plain-parquet layouts, per layout), so the
  * sandbox exercises PRODUCTION-SHAPED files — the r12 honest negative
  * was that one-file-per-bucket at B=corpus/400 makes KB-sized files
  * whose open overhead swamps the prune at local scale. 0 (default)
  * keeps the legacy constant-students rule so r12 numbers stay
  * reproducible. The probe prints the measured layout bytes and per-file
  * sizes alongside the arm times. `deleteCount` (default 200) sizes the
  * enrollment-delete feed — at bytes-sized B the prune factor is set by
  * k = deltaStudents + deleteCount vs B, so small-delta regimes need it
  * adjustable.
  *
  * Measured results live in IncrementalGold's scaladoc and BENCH_NOTES.md.
  */
object IncrementalGoldProbe {
  def main(args: Array[String]): Unit = {
    val n1x = if (args.length > 0) args(0).toLong else 100000L
    val deltaStudents = if (args.length > 1) args(1).toLong else 1000L
    val targetBucketKB = if (args.length > 2) args(2).toLong else 0L
    val deleteCount = if (args.length > 3) args(3).toLong else 200L
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-incr-gold-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def ssaRows(from: Long, until: Long): DataFrame =
      spark.range(from, until).select(
        col("id").cast("string").as("id"),
        struct((col("id") % 25).as("schoolId")).as("schoolReference"),
        struct(lit(1995L).as("schoolYear")).as("schoolYearTypeReference"),
        struct(col("id").cast("string").as("studentUniqueId")).as("studentReference"),
        lit("1995-01-05").as("entryDate"),
        lit(null).cast("string").as("exitWithdrawDate"))

    // 4 events per student; `gen` disjoints delta event ids from initial
    def attRows(students: DataFrame, gen: Long): DataFrame =
      students.select(col("id"), explode(sequence(lit(0L), lit(3L))).as("j"))
        .select(
          concat(lit(s"g$gen-"), col("id"), lit("-"), col("j")).as("id"),
          struct((col("id") % 25).as("schoolId")).as("schoolReference"),
          struct(col("id").cast("string").as("studentUniqueId")).as("studentReference"),
          concat(lit("1995-01-"),
            lpad(((col("id") + col("j") + gen) % 20 + 6).cast("string"), 2, "0"))
            .as("eventDate"),
          concat(lit("uri://ed-fi.org/AttendanceEventCategoryDescriptor#"),
            element_at(
              array(lit("In Attendance"), lit("Tardy"),
                lit("Excused Absence"), lit("Unexcused Absence")),
              ((col("id") + col("j")) % 4 + 1).cast("int")))
            .as("attendanceEventCategoryDescriptor"))

    val cal = spark.range(1, 32).crossJoin(
        spark.range(0, 25).toDF("school"))
      .select(
        struct(col("school").as("schoolId"), lit(1995L).as("schoolYear"))
          .as("calendarReference"),
        concat(lit("1995-01-"), lpad(col("id").cast("string"), 2, "0")).as("date"),
        array(struct(
          when(col("id") % 5 =!= 0,
            "uri://ed-fi.org/CalendarEventDescriptor#Instructional day")
            .otherwise("uri://ed-fi.org/CalendarEventDescriptor#Holiday")
            .as("calendarEventDescriptor"))).as("calendarEvents"))

    def emptyEndpoint(name: String): DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], graft.core.EndpointCatalog.schema(name))
    def ctxOver(eps: Map[String, DataFrame]): ViewContext =
      ViewContext(spark,
        endpoint = n => eps.getOrElse(n, emptyEndpoint(n)),
        view = n => sys.error(s"unexpected view dep: $n"))

    val tmp = java.nio.file.Files.createTempDirectory("graft-igold").toString
    graft.core.SilverWriter.deleteOnExit(tmp)
    val view = graft.views.ews.StudentEarlyWarningFact

    val scope = IncrementalGold.ewsFactScope
    val studentOf = (df: DataFrame) => df("studentReference.studentUniqueId")

    def dirBytes(path: String): Long = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .getContentSummary(p).getLength
    }

    val results = Seq(1 -> n1x, 10 -> n1x * 10).map { case (scale, n) =>
      // ---- untimed: the standing lake state at this corpus size
      ssaRows(0L, n).write.mode("overwrite").parquet(s"$tmp/ssa_$scale")
      attRows(spark.range(0L, n).toDF("id"), 0L).write.mode("overwrite")
        .parquet(s"$tmp/att_$scale")
      val ssa = spark.read.parquet(s"$tmp/ssa_$scale")
      val att = spark.read.parquet(s"$tmp/att_$scale")
      ctxOver(Map("studentSchoolAssociations" -> ssa, "calendarDates" -> cal,
        "studentSchoolAttendanceEvents" -> att))
        .let(view.build).write.mode("overwrite").parquet(s"$tmp/gold_$scale")
      val oldGold = spark.read.parquet(s"$tmp/gold_$scale")
      // bucket count: constant-students rule (legacy, B = n/400) or the
      // bytes rule (r13) — B sized so one bucket file lands near
      // targetBucketKB, measured off the LARGEST layout (gold dominates;
      // one shared B keeps every layout's bucket column aligned)
      val layoutBytes = Seq(s"$tmp/ssa_$scale", s"$tmp/att_$scale",
        s"$tmp/gold_$scale").map(dirBytes)
      val nBuckets =
        if (targetBucketKB <= 0L) math.max(64L, n / 400L).toInt
        else math.max(4L, layoutBytes.max / (targetBucketKB * 1024L)).toInt
      // the pruned arm's standing layouts: scope-partitioned gold and
      // endpoints + the ssa keymap (delete-scope recovery without a
      // corpus scan)
      IncrementalGold.writeEndpointPartitioned(
        ssa, studentOf, s"$tmp/ssa_p_$scale", nBuckets)
      IncrementalGold.writeEndpointPartitioned(
        att, studentOf, s"$tmp/att_p_$scale", nBuckets)
      IncrementalGold.writeKeyMap(ssa, studentOf, s"$tmp/km_$scale", nBuckets)
      IncrementalGold.writeGoldPartitioned(
        oldGold, scope, s"$tmp/gold_p_$scale", nBuckets)

      // ---- the fixed-size CDC batch (same absolute size at every scale)
      val attUpserts = attRows(spark.range(0L, deltaStudents).toDF("id"), 1L)
      val ssaDelIds = spark.range(n - deleteCount, n)
        .select(col("id").cast("string").as("id"))
      val attBatch = IncrementalGold.CdcBatch(attUpserts, att.select(col("id")).limit(0))
      val ssaBatch = IncrementalGold.CdcBatch(ssa.limit(0), ssaDelIds)

      def runFull(): Unit = {
        val newSsa = IncrementalGold.applyCdc(
          ssa, IncrementalGold.CdcBatch(ssa.limit(0), ssaDelIds))
        val newAtt = IncrementalGold.applyCdc(
          att, IncrementalGold.CdcBatch(attUpserts, att.select(col("id")).limit(0)))
        noop(ctxOver(Map("studentSchoolAssociations" -> newSsa,
          "calendarDates" -> cal, "studentSchoolAttendanceEvents" -> newAtt))
          .let(view.build))
      }
      def runIncr(): Unit = {
        val newSsa = IncrementalGold.applyCdc(
          ssa, IncrementalGold.CdcBatch(ssa.limit(0), ssaDelIds))
        val newAtt = IncrementalGold.applyCdc(
          att, IncrementalGold.CdcBatch(attUpserts, att.select(col("id")).limit(0)))
        val affected = IncrementalGold.affectedScopes(Seq(
            (attUpserts, (df: DataFrame) => df("studentReference.studentUniqueId"))),
            spark)
          .unionByName(IncrementalGold.deleteScopes(
            ssa, ssaDelIds, df => df("studentReference.studentUniqueId")))
          .distinct()
        noop(IncrementalGold.refreshView(
          IncrementalGold.ewsFactScope, oldGold,
          newEndpoint = Map("studentSchoolAssociations" -> newSsa,
            "calendarDates" -> cal, "studentSchoolAttendanceEvents" -> newAtt)
            .orElse { case other => emptyEndpoint(other) },
          affected = affected))
      }
      def runPruned(): Unit = {
        val affected = attUpserts
          .select(studentOf(attUpserts).cast("string").as("scope"))
          .unionByName(IncrementalGold.batchScopesPruned(
            spark, s"$tmp/km_$scale", nBuckets, ssaBatch, studentOf))
          .distinct()
        noop(IncrementalGold.prunedMerge(
          scope, s"$tmp/gold_p_$scale", nBuckets,
          newEndpoint = Map(
            "calendarDates" -> cal)
            .orElse {
              case "studentSchoolAssociations" =>
                IncrementalGold.postCdcSlicePruned(
                  spark, s"$tmp/ssa_p_$scale", nBuckets, ssaBatch, affected)
              case "studentSchoolAttendanceEvents" =>
                IncrementalGold.postCdcSlicePruned(
                  spark, s"$tmp/att_p_$scale", nBuckets, attBatch, affected)
              case other => emptyEndpoint(other)
            },
          affected = affected))
      }

      runFull(); runIncr(); runPruned() // warm plan paths
      def time(run: () => Unit): Double = (1 to 3).map { _ =>
        dropCaches()
        val t0 = System.nanoTime(); run()
        (System.nanoTime() - t0) / 1e9
      }.min
      val fu = time(() => runFull())
      val in = time(() => runIncr())
      val pr = time(() => runPruned())
      // the prune-factor evidence: how many of B buckets this delta hits
      val touched = attUpserts
        .select(studentOf(attUpserts).cast("string").as("s"))
        .unionByName(IncrementalGold.lookupScopes(
          spark, s"$tmp/km_$scale", nBuckets, ssaDelIds).toDF("s"))
        .select(IncrementalGold.scopeBucket(col("s"), nBuckets))
        .distinct().count()
      val prunedBytes = Seq(s"$tmp/ssa_p_$scale", s"$tmp/att_p_$scale",
        s"$tmp/gold_p_$scale").map(dirBytes)
      f""""x$scale":{"students":$n,"nBuckets":$nBuckets,"touchedBuckets":$touched,"layout_mb":[${layoutBytes.map(b => f"${b / 1e6}%.1f").mkString(",")}],"bucket_file_kb":[${prunedBytes.map(b => f"${b / 1024.0 / nBuckets}%.1f").mkString(",")}],"full":$fu%.3f,"incr":$in%.3f,"pruned":$pr%.3f}"""
    }
    println(s"""{"probe":"incremental-gold","deltaStudents":$deltaStudents,"deleteCount":$deleteCount,"targetBucketKB":$targetBucketKB,${results.mkString(",")}}""")
    spark.stop()
  }

  /** Tiny pipe helper so the fixture reads top-down. */
  private implicit class Let[A](private val a: A) extends AnyVal {
    def let[B](f: A => B): B = f(a)
  }
}
