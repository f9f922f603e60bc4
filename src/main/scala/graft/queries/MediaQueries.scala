package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.ops.Multimodal

/** Round-7 multimodal additions beyond the q125–q128 image/audio/video
  * family: q230 difference-hash fingerprinting on real decoded pixels —
  * the gradient twin of q126's average hash. */
object MediaQueries {

  // --------------------------------------------------------------- q230
  /** 64-bit dHash per generated BMP (the q126 fixture: content keyed on
    * doc_id % 50, so each content class collapses to one hash) plus the
    * per-hash duplicate count. The oracle restates the 9×8 sampling, the
    * ⌊/3⌋ grayscale, and the lead()-neighbor compare in SQL — every step
    * integer. */
  private val q230 = Q(
    "q230_image_dhash",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val bmps = Lake(s, dir).documents
        .filter(col("doc_id") < 400)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val k = id % 50
          val w = (8 + k % 9).toInt
          val h = (6 + k % 7).toInt
          val rgb = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val i = (y * w + x) * 3
              rgb(i) = ((k + x + 2L * y) % 256).toByte
              rgb(i + 1) = ((2L * k + 3L * x + y) % 256).toByte
              rgb(i + 2) = ((k + 5L * x + 7L * y) % 256).toByte
              x += 1
            }
            y += 1
          }
          (id, Multimodal.encodeBmp(Multimodal.DecodedImage(w, h, rgb)))
        })
        .toDF("doc_id", "media")
      Multimodal.imageDHash(bmps, "doc_id", "media").toDF()
        .withColumn("dup_count",
          count(lit(1)).over(Window.partitionBy("dhash")))
        .orderBy("doc_id")
    },
    Some("""
      WITH ids AS (
        SELECT doc_id, doc_id % 50 AS k,
          8 + (doc_id % 50) % 9 AS w, 6 + (doc_id % 50) % 7 AS h
        FROM documents WHERE doc_id < 400),
      grid AS (
        SELECT doc_id, k, w, h, t1.x, t2.y,
          (x * w) // 9 AS sx, (y * h) // 8 AS sy
        FROM ids,
          unnest(generate_series(0, 8)) AS t1(x),
          unnest(generate_series(0, 7)) AS t2(y)),
      gray AS (
        SELECT doc_id, x, y,
          ((k + sx + 2 * sy) % 256 + (2 * k + 3 * sx + sy) % 256
            + (k + 5 * sx + 7 * sy) % 256) // 3 AS g
        FROM grid),
      bits AS (
        SELECT doc_id, x, y, g,
          lead(g) OVER (PARTITION BY doc_id, y ORDER BY x) AS gn
        FROM gray),
      hashed AS (
        SELECT doc_id,
          string_agg(CASE WHEN gn > g THEN '1' ELSE '0' END, ''
                     ORDER BY y, x) AS dhash
        FROM bits WHERE x < 8
        GROUP BY doc_id)
      SELECT doc_id, dhash,
        COUNT(*) OVER (PARTITION BY dhash) AS dup_count
      FROM hashed ORDER BY doc_id""")
  )

  val all: Seq[Q] = Seq(q230)
}
