package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit}

import graft.views.{AmtView, ViewContext}

/** Incremental gold-view maintenance — the delta-batch merge path that
  * replaces the reference's rebuild-everything-every-hour ceiling
  * (reference dagster_config/schedules/schedule.py:8-10: the hourly job
  * re-extracts and fully recomputes all 41 views even when the ODS
  * advanced by one resource).
  *
  * The ingest layer already tracks change-version windows
  * ([[graft.ingest.ChangeVersionStore]], mirroring the reference's
  * api/changeVersion.py:57-94) and lands each window as an upsert batch
  * plus a `/deletes` twin (resource ids, api/api.py:133-136). This
  * operator consumes those batches at the GOLD layer:
  *
  *  1. [[applyCdc]] — advance an endpoint snapshot by one batch: rows
  *     whose `id` appears in the batch (upserted or deleted) are dropped
  *     from the snapshot, then the upserts are appended. The snapshot
  *     side never shuffles: the touched-id set is delta-sized and
  *     broadcast, so the corpus path is scan → broadcast anti-join →
  *     union → write.
  *  2. [[refreshView]] — advance a VIEW by rebuilding only the slice the
  *     delta can reach. A view is eligible when it has a SCOPE KEY
  *     (the [[Scope]] contract): every output row carries a scope value
  *     that is a pure function of the source rows sharing that value in
  *     the view's scoped endpoints (student-keyed endpoints for the
  *     student-grain facts, the school resource itself for schoolDim);
  *     the remaining endpoints are shared dimensions (calendars,
  *     descriptors, org chain) any drift in which triggers the
  *     [[graft.runner.AmtLoop]] full-rebuild path instead — the policy
  *     stays honest rather than silently wrong.
  *
  * Equivalence (the q340/q341 hash gates): for a scope-partitionable
  * view, semi-filtering the scoped endpoints to the affected scope set S
  * rebuilds exactly the output rows with scope ∈ S, so
  * `oldGold ⊳ S  ∪  rebuilt(S)` is row-identical to a full recompute
  * over the post-CDC snapshot. Deletes participate through
  * [[deleteScopes]]: the `/deletes` feed carries only resource ids, so
  * the scope values they vacate are recovered from the PRE-delta
  * snapshot (the only place those rows still exist).
  *
  * Scale shape (PlanSpec "incremental gold" pin): the gold corpus and
  * every scoped-endpoint corpus cross ZERO exchanges — each is scanned
  * once into a broadcast (anti/semi) hash join against the delta-sized
  * key set; all shuffles in the refresh plan are delta-sized (the
  * rebuilt slice's own aggregations).
  *
  * Measured (graft.runner.IncrementalGoldProbe, local[32], min of 3,
  * cold caches, fixed 1k-student delta; BENCH_NOTES.md): the
  * shuffle-free [[refreshView]] is SCAN-BOUND, not flat — at ×10 corpus
  * (100k → 1M students) the full rebuild grows 1.840 → 8.169 s (4.4×)
  * while the incremental refresh grows 1.879 → 4.232 s (2.25×): every
  * corpus parquet is still read whole into the broadcast semi/anti
  * joins each batch, so the win is ~2× at ×10 and the cost still tracks
  * corpus size. True flatness needs the SCAN pruned, not just the
  * shuffle: [[writeGoldPartitioned]] lays gold out hash-partitioned on
  * the scope key so [[refreshViewPruned]]'s merge reads ONLY the
  * affected buckets (partition-pruned scan, PlanSpec-pinned) and
  * rewrites only those partitions (dynamic partition overwrite) — the
  * probe's `pruned` arm holds near-flat at ×10 while both scan-bound
  * arms grow.
  */
object IncrementalGold {

  /** Scoped-endpoint contract for one view: how to read the scope key
    * off each driving endpoint's rows, and the gold column that carries
    * it in the view output. Endpoints NOT listed are shared dimensions —
    * a change there invalidates every scope, and the caller must fall
    * back to a full rebuild ([[AmtLoop.affectedViews]] already routes
    * that case). */
  final case class Scope(
      view: AmtView,
      goldScopeCol: String,
      scopedEndpoints: Map[String, DataFrame => Column])

  /** One endpoint's CDC batch: full upserted resources plus the
    * `/deletes` twin's ids (reference api/api.py:133-136 saves exactly
    * these two streams per change-version window). */
  final case class CdcBatch(upserts: DataFrame, deleteIds: DataFrame)

  /** Advance an endpoint snapshot by one CDC batch. Ed-Fi resource `id`s
    * are unique per endpoint, so upsert = delete-then-insert on `id`.
    * The snapshot (corpus-sized) is never shuffled: the touched-id set
    * is broadcast into a left-anti hash join. */
  def applyCdc(snapshot: DataFrame, batch: CdcBatch, idCol: String = "id"): DataFrame = {
    val touched = batch.upserts.select(col(idCol))
      .unionByName(batch.deleteIds.select(col(idCol)))
      .distinct()
    snapshot.join(broadcast(touched), Seq(idCol), "left_anti")
      .unionByName(batch.upserts)
  }

  /** Scope values vacated by a `/deletes` feed: the feed carries only
    * resource ids, so join them back to the PRE-delta snapshot (the only
    * surviving copy of the deleted rows) to learn which scope keys they
    * occupied. Delta-sized output; the snapshot side is a broadcast
    * semi-join — no corpus shuffle. */
  def deleteScopes(
      snapshot: DataFrame, deleteIds: DataFrame,
      scopeOf: DataFrame => Column, idCol: String = "id"): DataFrame = {
    val hit = snapshot.join(
      broadcast(deleteIds.select(col(idCol))), Seq(idCol), "left_semi")
    hit.select(scopeOf(hit).cast("string").as("scope"))
  }

  /** Union of scope keys touched by a set of per-endpoint deltas —
    * upsert rows contribute their own scope, delete ids contribute
    * through [[deleteScopes]] against the pre-delta snapshot.
    *
    * NOTE: this reads only the NEW scope off each upsert row. If an
    * upsert can RE-KEY a resource (same `id`, new scope value — Ed-Fi
    * key changes do this to studentUniqueId/schoolId), the vacated OLD
    * scope must be invalidated too: use [[batchScopes]], which recovers
    * it from the pre-delta snapshot. */
  def affectedScopes(
      perEndpoint: Seq[(DataFrame, DataFrame => Column)],
      spark: SparkSession): DataFrame = {
    val parts = perEndpoint.map { case (df, scopeOf) =>
      df.select(scopeOf(df).cast("string").as("scope"))
    }
    if (parts.isEmpty) {
      import spark.implicits._
      Seq.empty[String].toDF("scope")
    } else parts.reduce(_ unionByName _).distinct()
  }

  /** FULL affected-scope set for one endpoint's CDC batch, including the
    * pre-delta scopes VACATED by the batch: an upsert that re-keys a
    * resource (same `id`, new scope value) abandons its old scope exactly
    * the way a delete does, and the stale gold rows there must be rebuilt
    * or they survive the merge with now-wrong aggregates. New scopes come
    * off the upsert rows themselves; vacated scopes — of upserted AND
    * deleted ids — are recovered from the PRE-delta snapshot (the only
    * surviving copy of the old rows) via the same broadcast semi-join as
    * [[deleteScopes]]. Delta-sized output, no corpus shuffle. */
  def batchScopes(
      snapshot: DataFrame, batch: CdcBatch,
      scopeOf: DataFrame => Column, idCol: String = "id"): DataFrame = {
    val touched = batch.upserts.select(col(idCol))
      .unionByName(batch.deleteIds.select(col(idCol)))
    batch.upserts
      .select(scopeOf(batch.upserts).cast("string").as("scope"))
      .unionByName(deleteScopes(snapshot, touched, scopeOf, idCol))
      .distinct()
  }

  /** Rebuild only the affected slice of `scope.view` over the POST-CDC
    * endpoint state and merge it into the old gold snapshot.
    *
    *  - `newEndpoint` resolves every endpoint to its post-CDC full
    *    state (unscoped dimensions pass through whole);
    *  - scoped endpoints are semi-filtered to `affected` (broadcast —
    *    their corpus never shuffles), so the view builder only does
    *    delta-scoped work;
    *  - the merge drops the affected scopes from old gold via a
    *    broadcast anti-join (corpus scanned, never shuffled) and
    *    appends the rebuilt slice.
    *
    * View-on-view dependencies resolve through a local memoized context
    * over the SAME scoped endpoints, mirroring AmtPipeline's DAG
    * semantics for the rebuilt slice. */
  def refreshView(
      scope: Scope,
      oldGold: DataFrame,
      newEndpoint: String => DataFrame,
      affected: DataFrame): DataFrame = {
    val aff = normalizedScopes(affected)
    oldGold.join(broadcast(aff),
        col(scope.goldScopeCol).cast("string") === col("__scope"), "left_anti")
      .unionByName(rebuildSlice(scope, newEndpoint, aff))
  }

  /** Rebuild the view restricted to the affected scope set: scoped
    * endpoints are broadcast-semi-filtered (their corpus never shuffles),
    * shared dimensions pass through whole, and view-on-view dependencies
    * resolve through a local memoized context over the SAME scoped
    * endpoints — AmtPipeline's DAG semantics for the rebuilt slice. */
  private def rebuildSlice(
      scope: Scope,
      newEndpoint: String => DataFrame,
      aff: DataFrame): DataFrame = {
    val memo = mutable.Map.empty[String, DataFrame]
    lazy val ctx: ViewContext = ViewContext(
      aff.sparkSession,
      endpoint = name => {
        val full = newEndpoint(name)
        scope.scopedEndpoints.get(name) match {
          case Some(scopeOf) =>
            full.join(broadcast(aff),
              scopeOf(full).cast("string") === col("__scope"), "left_semi")
          case None => full
        }
      },
      view = n => memo.getOrElseUpdate(n,
        graft.runner.AmtRegistry.byName(n).build(ctx)))
    scope.view.build(ctx)
  }

  private def normalizedScopes(affected: DataFrame): DataFrame = affected
    .select(col(affected.columns.head).cast("string").as("__scope"))
    .distinct()

  /** Partition column [[writeGoldPartitioned]] appends: a stable hash
    * bucket of the scope key. A VALUE, not raw scope, so the lake holds
    * `nBuckets` directories regardless of scope cardinality. */
  val BucketCol = "scope_bucket"

  /** `xxhash64(scope) mod n` as a non-negative bucket id. INT, not long:
    * parquet partition-value inference reads the directory names back as
    * int, and the pruning literals must match that type exactly or the
    * cast around the partition column defeats the prune. */
  def scopeBucket(scopeCol: Column, nBuckets: Int): Column =
    org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.xxhash64(scopeCol.cast("string")),
      lit(nBuckets.toLong)).cast("int")

  /** Lay a gold view out hash-partitioned on its scope key so a delta
    * refresh can PRUNE the merge scan (the scan-bound ceiling of
    * [[refreshView]], measured in the object scaladoc): one directory per
    * scope bucket, and [[refreshViewPruned]] reads/rewrites only the
    * buckets the delta touches. */
  def writeGoldPartitioned(
      gold: DataFrame, scope: Scope, path: String, nBuckets: Int): Unit =
    gold.withColumn(BucketCol, scopeBucket(col(scope.goldScopeCol), nBuckets))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(path)

  /** [[refreshView]] against a [[writeGoldPartitioned]] layout, with the
    * corpus SCAN pruned, not just the shuffle: the delta's distinct
    * bucket ids (an O(nBuckets)-bounded collect — the only driver-side
    * set here, capped by the layout constant, never by data size) prune
    * the old-gold read to the affected partitions, the merge anti-join
    * runs over that delta-sized slice only, and the write rewrites ONLY
    * those partitions via dynamic partition overwrite. Untouched buckets
    * are never read and never rewritten — refresh cost is delta-sized,
    * independent of corpus size (IncrementalGoldProbe `pruned` arm).
    *
    * The merged slice is staged to `stagingPath` first: Spark refuses to
    * overwrite a path that feeds the same plan, and the stage also makes
    * the gold rewrite all-or-nothing per run. Both writes are
    * delta-sized. */
  def refreshViewPruned(
      scope: Scope,
      goldPath: String,
      stagingPath: String,
      nBuckets: Int,
      newEndpoint: String => DataFrame,
      affected: DataFrame): Unit = {
    val spark = affected.sparkSession
    val merged = prunedMerge(scope, goldPath, nBuckets, newEndpoint, affected)
    merged.write.mode("overwrite").parquet(stagingPath)

    spark.read.parquet(stagingPath)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BucketCol)
      .parquet(goldPath)
  }

  /** The pruned merge frame [[refreshViewPruned]] materializes — exposed
    * so PlanSpec can pin the physical property directly: the old-gold
    * scan under this frame carries a partition filter on [[BucketCol]]
    * and lists only the affected buckets' files. */
  def prunedMerge(
      scope: Scope,
      goldPath: String,
      nBuckets: Int,
      newEndpoint: String => DataFrame,
      affected: DataFrame): DataFrame = {
    val spark = affected.sparkSession
    val aff = normalizedScopes(affected)
    val buckets = aff
      .select(scopeBucket(col("__scope"), nBuckets).as("b"))
      .distinct().collect().map(_.getInt(0))

    val oldSlice = spark.read.parquet(goldPath)
      .filter(col(BucketCol).isin(buckets: _*))
    oldSlice
      .join(broadcast(aff),
        col(scope.goldScopeCol).cast("string") === col("__scope"), "left_anti")
      .unionByName(
        rebuildSlice(scope, newEndpoint, aff)
          .withColumn(BucketCol, scopeBucket(col(scope.goldScopeCol), nBuckets)))
  }

  /** The per-view scope contracts for the incrementally-maintainable
    * views proven by the q340/q341 gates. schoolDim is scoped by the
    * school resource itself (the org-chain joins are broadcast
    * dimensions); the EWS fact is scoped by the student across all five
    * student-keyed endpoints (the calendar is the shared spine
    * dimension). */
  val schoolDimScope: Scope = Scope(
    graft.views.base.SchoolDim,
    goldScopeCol = "SchoolKey",
    scopedEndpoints = Map(
      "schools" -> (df => df("schoolId"))))

  val ewsFactScope: Scope = Scope(
    graft.views.ews.StudentEarlyWarningFact,
    goldScopeCol = "StudentKey",
    scopedEndpoints = Map(
      "studentSchoolAssociations" ->
        (df => df("studentReference.studentUniqueId")),
      "studentSectionAssociations" ->
        (df => df("studentReference.studentUniqueId")),
      "studentSchoolAttendanceEvents" ->
        (df => df("studentReference.studentUniqueId")),
      "studentSectionAttendanceEvents" ->
        (df => df("studentReference.studentUniqueId")),
      "studentDisciplineIncidentBehaviorAssociations" ->
        (df => df("studentReference.studentUniqueId"))))

  /** chrab fact: same student grain as the EWS fact — every output row's
    * StudentKey is a pure function of the student-keyed endpoint rows
    * sharing it (enrollment spine + both attendance-event crosstabs);
    * the calendar is the shared spine dimension. Gated by q344. */
  val chrabFactScope: Scope = Scope(
    graft.views.chrab.ChronicAbsenteeismAttendanceFact,
    goldScopeCol = "StudentKey",
    scopedEndpoints = Map(
      "studentSchoolAssociations" ->
        (df => df("studentReference.studentUniqueId")),
      "studentSectionAssociations" ->
        (df => df("studentReference.studentUniqueId")),
      "studentSchoolAttendanceEvents" ->
        (df => df("studentReference.studentUniqueId")),
      "studentSectionAttendanceEvents" ->
        (df => df("studentReference.studentUniqueId"))))

  /** studentSectionGradeFact: grades is the single scoped endpoint (one
    * output row per qualifying grade row, keyed by its student);
    * gradingPeriods and the descriptor lookup are shared broadcast
    * dimensions. Gated by q345. */
  val sectionGradeFactScope: Scope = Scope(
    graft.views.ews.StudentSectionGradeFact,
    goldScopeCol = "StudentKey",
    scopedEndpoints = Map(
      "grades" ->
        (df => df("studentSectionAssociationReference.studentUniqueId"))))
}
