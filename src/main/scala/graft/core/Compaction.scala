package graft.core

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet directories — the maintenance pass a
  * filesystem lake needs once incremental writers exist: the streaming
  * gold sink and per-run batch appends each land a file per partition per
  * trigger, and at 100 TB a table read eventually spends more time opening
  * files than scanning bytes.
  *
  * Strategy: size the target partition count from the directory's actual
  * bytes (not file count), rewrite into a sibling `.compacting` directory,
  * then swap via rename — atomic on POSIX filesystems; on object stores
  * swap this step for the store's atomic-commit primitive. The rewrite is
  * a plain scan+repartition, so it distributes like any other job.
  */
object Compaction {

  private def dirBytes(dir: Path): Long = {
    val s = Files.walk(dir)
    try s.filter(p => Files.isRegularFile(p)).mapToLong(p => Files.size(p)).sum()
    finally s.close()
  }

  private def deleteRecursively(dir: Path): Unit = {
    val s = Files.walk(dir)
    try s.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.delete(p))
    finally s.close()
  }

  /** Rewrite `path` into files of ~`targetMB` each. Returns the resulting
    * partition count. Row order within the table is not preserved (parquet
    * directories carry no order contract); row CONTENT is, verified by the
    * caller's reads.
    *
    * The swap is rename-aside-then-rename-in, never delete-then-rename:
    * the old directory moves to `.old` in one rename, the rewrite moves
    * into place in a second, and only then is `.old` deleted — a crash
    * between the renames leaves either the old or the new table at `path`
    * (plus a recoverable sibling), never a window with NO table, which
    * delete-first would open. */
  def compact(spark: SparkSession, path: String, targetMB: Int = 512): Int = {
    val dir = Paths.get(path)
    require(Files.isDirectory(dir), s"not a directory: $path")
    val parts = math.max(1L, dirBytes(dir) / (targetMB.toLong * 1024 * 1024)).toInt
    val tmp = Paths.get(path + ".compacting")
    val old = Paths.get(path + ".old")
    if (Files.exists(tmp)) deleteRecursively(tmp)
    if (Files.exists(old)) deleteRecursively(old)
    spark.read.parquet(path)
      .repartition(parts)
      .write.mode("overwrite").parquet(tmp.toString)
    Files.move(dir, old)
    Files.move(tmp, dir)
    deleteRecursively(old)
    parts
  }
}
