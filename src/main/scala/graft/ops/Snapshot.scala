package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — CDC for a keyed lake table: given yesterday's and
  * today's snapshots, classify every key as `added`, `removed`, or
  * `changed` (content hash differs), omitting the unchanged majority.
  * This is the primitive behind incremental downstream work: a daily
  * 100 TB corpus refresh re-deduplicates / re-scores / re-embeds ONLY
  * the diff (compose with [[Dedup.incrementalMinhash]] and the
  * streaming gates), never the full table.
  *
  * Scale shape: each side folds its content columns to one md5
  * map-side, so the full-outer join shuffles (key, 16-byte hash) —
  * narrow rows regardless of how wide the content is. One shuffle on
  * the key; the unchanged filter drops the bulk before anything
  * downstream materializes. The `` separator makes the fold
  * injective for text-free-of- content; production tables with
  * binary columns would hash a struct instead.
  *
  * Measured (runner.TextScaleProbe, sf0.1 -> 10x = 50k docs,
  * local[32]): 0.14 s -> 0.22 s for 10x data - hash fold + narrow
  * shuffle, nothing content-width-sized survives to the exchange.
  */
object Snapshot {

  /** Row-level diff: (key, change_type) plus each side's content hash
    * (null on the missing side). `contentCols` defines row identity —
    * columns outside it do not trigger `changed`. */
  def diff(
      prev: DataFrame,
      curr: DataFrame,
      idCol: String,
      contentCols: Seq[String]
  ): DataFrame = {
    def hashed(df: DataFrame, as: String) =
      df.select(
        col(idCol),
        // each column folds to "v<value>" or "n" BEFORE the separator
        // join: concat_ws alone silently drops NULL columns (and their
        // separator), which would hash (a="x", b=NULL) and (a=NULL,
        // b="x") identically and classify a changed row as unchanged
        md5(concat_ws("", contentCols.map(c =>
          coalesce(concat(lit("v"), col(c).cast("string")), lit("n"))): _*))
          .as(as))
    val p = hashed(prev, "prev_hash")
    val c = hashed(curr, "curr_hash")
    p.join(c, Seq(idCol), "full_outer")
      .withColumn("change_type",
        when(col("prev_hash").isNull, "added")
          .when(col("curr_hash").isNull, "removed")
          .when(col("prev_hash") =!= col("curr_hash"), "changed")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
  }

  /** Apply a deletes feed to a keyed gold table: drop every row whose
    * key appears in `deletes` — the consumption step for the Ed-Fi
    * `/deletes` twin the reference extracts but never applies
    * (api/api.py:133-136; silver captures the feed, gold still carries
    * the ghosts). Composes with the change-version window: a daily
    * incremental run upserts the delta batch and THEN removes this
    * feed's keys; [[diffSummary]] against the previous gold audits both.
    *
    * One left_anti hash join on the key. The deletes batch is one day's
    * removals — tiny against the table — so AQE broadcasts it and the
    * pass costs a scan of gold, no shuffle of the big side. */
  def applyDeletes(curr: DataFrame, deletes: DataFrame, idCol: String): DataFrame =
    curr.join(deletes.select(col(idCol)).distinct(), Seq(idCol), "left_anti")

  /** The audit summary a daily refresh logs: one row per change type. */
  def diffSummary(
      prev: DataFrame,
      curr: DataFrame,
      idCol: String,
      contentCols: Seq[String]
  ): DataFrame =
    diff(prev, curr, idCol, contentCols)
      .groupBy("change_type").agg(count(lit(1)).as("n"))
}
