package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.ops.{Dedup, Linkage}

/** Set-similarity JOIN coverage: the two classic candidate-generation
  * strategies the dedup family ([[graft.ops.Dedup]]) did not yet expose as
  * first-class operators —
  *   - q215: AllPairs/PPJoin prefix filtering ([[Dedup.prefixFilterPairs]]),
  *     the EXACT-Jaccard scale path (no df cap, no recall loss) whose
  *     candidates come only from each doc's rarest tokens;
  *   - q216: multi-pass sorted-neighborhood ([[Linkage.sortedNeighborhood]]),
  *     the order-based blocking that survives error models hash blocking
  *     cannot (the reference's dedup is byte-exact `drop_duplicates`;
  *     SURVEY §2.5 A10 — these are the scale-grade generalizations).
  *
  * Both oracles are structural, not samples: q215's is the brute-force
  * inverted-index Jaccard (so the prefix filter must be COMPLETE — any
  * pruned true pair hash-mismatches), q216's replays the identical
  * block/boundary window construction in SQL.
  */
object SimJoinQueries {

  // --------------------------------------------------------------- q215
  /** 3-gram shingles at t = 0.75 — a LOOSER threshold than q31's 0.8 (so
    * the two gates differ) on the realistic token-granularity for the
    * operator's design domain: word trigrams give a large sparse token
    * universe where rarest-token prefixes discriminate. The degenerate
    * tiny-vocabulary regime (where every token is hot and token-based
    * candidate generation is inherently the wrong tool) is covered by the
    * PropertySpec law on random small-vocab corpora, not by this gate. */
  private val Shingles3Cte = """
    w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        AS shingle
      FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i))"""

  private val q215 = Q(
    "q215_prefix_filter_pairs",
    (s, dir) => {
      val sh = Dedup.shingles(Lake(s, dir).documents, "doc_id", "text", 3)
      Dedup.prefixFilterPairs(sh, 0.75).orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH $Shingles3Cte,
      cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, n_common, ca.n AS n_a, cb.n AS n_b,
        CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) AS jaccard
      FROM common
      JOIN cnt ca ON doc_a = ca.doc_id
      JOIN cnt cb ON doc_b = cb.doc_id
      WHERE CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) >= 0.75
      ORDER BY doc_a, doc_b""")
  )

  // --------------------------------------------------------------- q216
  /** Two passes over the documents table: the raw 24-char text prefix and
    * the first-two-words SWAPPED (the classic transposition key — records
    * whose leading words are exchanged sort far apart under pass 0 but
    * adjacent under pass 1). Window 4, 2-char blocks. */
  private val SnmWindow = 4

  /** Per-pass SQL: replays block ranking, `window−1` leads in-block, and
    * the tail+head boundary stitch — textually the same construction as
    * [[Linkage.sortedNeighborhood]]. */
  private def passSql(p: Int, keyExpr: String): String = {
    val leads = (1 until SnmWindow).map(o =>
      s"lead(id, $o) OVER wsp_$p AS i$o, lead(blk, $o) OVER wsp_$p AS b$o")
      .mkString(",\n               ")
    val sleads = (1 until SnmWindow).map(o =>
      s"lead(id, $o) OVER wg_$p AS i$o, lead(blk, $o) OVER wg_$p AS b$o")
      .mkString(",\n               ")
    val unrollIn = (1 until SnmWindow).map(o =>
      s"SELECT id, i$o AS i FROM ld_$p").mkString(" UNION ALL ")
    val unrollBnd = (1 until SnmWindow).map(o =>
      s"SELECT id, blk, i$o AS i, b$o AS b FROM sld_$p")
      .mkString(" UNION ALL ")
    val w1 = SnmWindow - 1
    s"""
      base_$p AS (SELECT id, $keyExpr AS k, substr($keyExpr, 1, 2) AS blk
                  FROM recs),
      rk_$p AS (SELECT id, k, blk,
               row_number() OVER (PARTITION BY blk ORDER BY k, id) AS r,
               count(*) OVER (PARTITION BY blk) AS cnt
             FROM base_$p),
      br_$p AS (SELECT blk, row_number() OVER (ORDER BY blk) AS br
             FROM (SELECT DISTINCT blk FROM base_$p)),
      ld_$p AS (SELECT id, blk,
               $leads
             FROM rk_$p WINDOW wsp_$p AS (PARTITION BY blk ORDER BY k, id)),
      inb_$p AS (SELECT least(id, i) AS doc_a, greatest(id, i) AS doc_b
              FROM ($unrollIn) WHERE i IS NOT NULL),
      st_$p AS (SELECT id, k, blk, br AS grp
             FROM rk_$p JOIN br_$p USING (blk) WHERE r > cnt - $w1
             UNION ALL
             SELECT id, k, blk, br - 1 AS grp
             FROM rk_$p JOIN br_$p USING (blk) WHERE r <= $w1 AND br > 1),
      sld_$p AS (SELECT id, blk,
               $sleads
             FROM st_$p WINDOW wg_$p AS (PARTITION BY grp ORDER BY k, id)),
      bnd_$p AS (SELECT least(id, i) AS doc_a, greatest(id, i) AS doc_b
              FROM ($unrollBnd) WHERE i IS NOT NULL AND b <> blk),
      pairs_$p AS (SELECT doc_a, doc_b FROM inb_$p
               UNION ALL SELECT doc_a, doc_b FROM bnd_$p)"""
  }

  private val q216 = Q(
    "q216_sorted_neighborhood",
    (s, dir) => {
      val d = Lake(s, dir).documents
      val ws = split(col("text"), " ")
      val k0 = lower(substring(col("text"), 1, 24))
      val k1 = lower(concat(
        coalesce(element_at(ws, 2), lit("")), lit(" "),
        coalesce(element_at(ws, 1), lit(""))))
      Linkage.sortedNeighborhood(d, "doc_id", Seq(k0, k1),
          window = SnmWindow, blockChars = 2)
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH $SnmCtes
      SELECT doc_a, doc_b, CAST(COUNT(DISTINCT pass) AS BIGINT) AS n_passes
      FROM allp WHERE doc_a <> doc_b
      GROUP BY doc_a, doc_b
      ORDER BY doc_a, doc_b""")
  )

  /** Shared q216/q233 oracle chain: the two pass keys, both block/
    * boundary pass constructions, and the unioned `allp` pair set. */
  private lazy val SnmCtes: String = s"""recs AS (
        SELECT doc_id AS id,
               lower(substr(text, 1, 24)) AS k0,
               lower(coalesce(string_split(text, ' ')[2], '') || ' ' ||
                     coalesce(string_split(text, ' ')[1], '')) AS k1
        FROM documents),
      ${passSql(0, "k0").stripLeading()},
      ${passSql(1, "k1").stripLeading()},
      allp AS (SELECT doc_a, doc_b, 0 AS pass FROM pairs_0
               UNION ALL SELECT doc_a, doc_b, 1 AS pass FROM pairs_1)"""

  /** The q216 Spark-side pass keys, shared with q233. */
  private[queries] def snmKeys(
  ): Seq[org.apache.spark.sql.Column] = {
    val ws = split(col("text"), " ")
    Seq(
      lower(substring(col("text"), 1, 24)),
      lower(concat(coalesce(element_at(ws, 2), lit("")), lit(" "),
        coalesce(element_at(ws, 1), lit("")))))
  }

  // --------------------------------------------------------------- q233
  /** The SNM family closed end-to-end: sorted-neighborhood candidates
    * (q216's two passes) verified by edit distance on the 24-char name
    * key and kept at distance ≤ 8 — candidate generation by ORDER, match
    * decision by string similarity, the full Hernández–Stolfo merge
    * pipeline. The distance join touches only candidate pairs (never a
    * cross join); the oracle replays the identical pass CTEs plus the
    * levenshtein verify. */
  private val q233 = Q(
    "q233_snm_linkage",
    (s, dir) => {
      val d = Lake(s, dir).documents
      val cands = Linkage.sortedNeighborhood(d, "doc_id", snmKeys(),
        window = SnmWindow, blockChars = 2)
      val named = d.select(col("doc_id"),
        lower(substring(col("text"), 1, 24)).as("__nm"))
      cands
        .join(named.withColumnsRenamed(
          Map("doc_id" -> "doc_a", "__nm" -> "__na")), "doc_a")
        .join(named.withColumnsRenamed(
          Map("doc_id" -> "doc_b", "__nm" -> "__nb")), "doc_b")
        .withColumn("distance", levenshtein(col("__na"), col("__nb")))
        .filter(col("distance") <= 8)
        .select("doc_a", "doc_b", "n_passes", "distance")
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH $SnmCtes,
      snm AS (SELECT doc_a, doc_b,
                CAST(COUNT(DISTINCT pass) AS BIGINT) AS n_passes
              FROM allp WHERE doc_a <> doc_b
              GROUP BY doc_a, doc_b)
      SELECT s.doc_a, s.doc_b, s.n_passes,
             CAST(levenshtein(lower(substr(da.text, 1, 24)),
                              lower(substr(db.text, 1, 24))) AS INTEGER)
               AS distance
      FROM snm s
      JOIN documents da ON s.doc_a = da.doc_id
      JOIN documents db ON s.doc_b = db.doc_id
      WHERE levenshtein(lower(substr(da.text, 1, 24)),
                        lower(substr(db.text, 1, 24))) <= 8
      ORDER BY s.doc_a, s.doc_b""")
  )

  val all: Seq[Q] = Seq(q215, q216, q233)
}
