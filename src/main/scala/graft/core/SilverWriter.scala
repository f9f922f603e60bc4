package graft.core

import org.apache.spark.sql.DataFrame

/** Writes the "silver" layer: JSON-array files per endpoint directory, the
  * layout [[SilverReader]] scans (reference helper/helper.py:35-47 saves a
  * pretty-printed JSON array per extraction drop).
  *
  * Distributed by construction: each task serializes its partition to ONE
  * JSON array string and the text sink writes one file per partition — no
  * driver collect, so a 100 TB endpoint fans out across executors and the
  * file count tracks the partition count (pair with
  * [[Compaction]] if an incremental extractor drips small files).
  */
object SilverWriter {

  /** Write `df` as silver-layout JSON under `dir` (one array file per
    * non-empty partition). Round-trips through [[SilverReader.read]]'s
    * multiLine scan: `read(write(df)) == df` modulo the endpoint schema's
    * column set. */
  def write(df: DataFrame, dir: String): Unit = {
    import df.sparkSession.implicits._
    df.toJSON
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else Iterator(it.mkString("[\n", ",\n", "\n]"))
      }
      .write.mode("overwrite").text(dir)
  }
}
