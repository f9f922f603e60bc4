package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.ops.WebGraph

/** Graph-topology coverage beyond reachability and rank: exact triangle
  * counting / clustering coefficients (q135) and k-core decomposition by
  * iterative peeling (q136) — the two classic "how dense is this
  * neighborhood" signals a crawl-curation pipeline layers on top of
  * PageRank-family scores (link farms are triangle-dense and survive deep
  * cores; organic hub-and-spoke link-graphs are neither).
  *
  * Both run on deterministic synthetic host graphs derived from `doc_id`
  * arithmetic (the q108 convention): the structure is chosen so the
  * interesting machinery is actually exercised — the triangle fixture has
  * real triangles at every cluster, the k-core fixture has a pendant
  * fringe AND a chain whose peel takes multiple rounds.
  */
object GraphQueries {

  // --------------------------------------------------------------- q135
  /** Two deterministic intra-cluster edge families over 5×7 hosts:
    * i → (3i+1) mod 7 and i → (2i+3) mod 7 inside cluster doc_id mod 5.
    * The union contains triangles (e.g. h1–h4–h6) but is far from
    * complete, so the degree-ordered orientation's exactly-once emission
    * is genuinely load-bearing. */
  private def triangleEdges(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = Lake(s, dir).documents
    def host(expr: org.apache.spark.sql.Column) =
      concat(lit("c"), pmod(col("doc_id"), lit(5)), lit("h"), expr)
    d.select(host(pmod(col("doc_id"), lit(7))).as("src_host"),
        host(pmod(col("doc_id") * 3 + 1, lit(7))).as("dst_host"))
      .union(
        d.select(host(pmod(col("doc_id"), lit(7))).as("src_host"),
          host(pmod(col("doc_id") * 2 + 3, lit(7))).as("dst_host")))
  }

  private val q135 = Q(
    "q135_host_triangles",
    (s, dir) =>
      WebGraph.triangles(triangleEdges(s, dir))
        .orderBy("host"),
    Some("""
      WITH raw AS (
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR) AS s,
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 3 + 1) % 7 AS VARCHAR) AS d
        FROM documents
        UNION ALL
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR),
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 2 + 3) % 7 AS VARCHAR)
        FROM documents),
      und AS (
        SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
        FROM raw WHERE s <> d),
      deg AS (
        SELECT host, COUNT(*) AS degree FROM (
          SELECT a AS host FROM und UNION ALL SELECT b FROM und)
        GROUP BY host),
      tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
      per_host AS (
        SELECT host, COUNT(*) AS triangles FROM (
          SELECT x AS host FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
        GROUP BY host)
      SELECT deg.host, deg.degree,
        COALESCE(per_host.triangles, 0) AS triangles,
        CASE WHEN deg.degree < 2 THEN CAST(0.0 AS DOUBLE)
             ELSE CAST(COALESCE(per_host.triangles, 0) * 2 AS DOUBLE)
                  / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
        END AS clustering_coeff
      FROM deg LEFT JOIN per_host USING (host)
      ORDER BY deg.host""")
  )

  // --------------------------------------------------------------- q136
  /** k=2 core over a graph built to make the peel WORK for its answer:
    * a 10-cycle (the core that must survive untouched), 17 pendant
    * hosts hanging off it (one peel round), and a 6-host chain attached
    * at one end (peels one host per round — the multi-round case that
    * distinguishes iterative peeling from a single degree filter).
    * Expected output: exactly the 10 cycle hosts, core_degree 2 each —
    * which is also why the oracle is expressible without recursion: the
    * fixed point is known to be the cycle, but the ORACLE still derives
    * it by simulating enough peel rounds (8, ≥ the 7-deep chain) with
    * an unrolled round per CTE, so the gate checks the algorithm, not
    * the construction. */
  private def kcoreEdges(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = Lake(s, dir).documents
    val cycle = d.select(
      concat(lit("n"), pmod(col("doc_id"), lit(10))).as("src_host"),
      concat(lit("n"), pmod(col("doc_id") + 1, lit(10))).as("dst_host"))
    val pendants = d.filter(col("doc_id") < 17).select(
      concat(lit("p"), pmod(col("doc_id"), lit(17))).as("src_host"),
      concat(lit("n"), pmod(col("doc_id"), lit(10))).as("dst_host"))
    val chain = d.filter(col("doc_id") >= 17 && col("doc_id") < 22).select(
      concat(lit("x"), col("doc_id") - 17).as("src_host"),
      concat(lit("x"), col("doc_id") - 16).as("dst_host"))
    val attach = d.filter(col("doc_id") === 17).select(
      concat(lit("x"), lit(0)).as("src_host"),
      lit("n0").as("dst_host"))
    cycle.union(pendants).union(chain).union(attach)
  }

  /** One unrolled peel round in SQL: from edge set `prev`, keep only
    * edges whose BOTH endpoints have degree ≥ k in `prev`. MATERIALIZED
    * is load-bearing: DuckDB inlines plain CTEs at every reference, and
    * each round references its predecessor ~6× — an 8-round unroll
    * would otherwise expand into ~6⁸ scans of the base table. */
  private def peelRound(prev: String, next: String, k: Int): String = s"""
      ${next}_deg AS MATERIALIZED (
        SELECT host, COUNT(*) AS dg FROM (
          SELECT a AS host FROM $prev UNION ALL SELECT b FROM $prev)
        GROUP BY host),
      $next AS MATERIALIZED (
        SELECT a, b FROM $prev
        WHERE a IN (SELECT host FROM ${next}_deg WHERE dg >= $k)
          AND b IN (SELECT host FROM ${next}_deg WHERE dg >= $k))"""

  private val kcoreOracle: String = {
    val rounds = (0 until 8)
      .map(i => peelRound(if (i == 0) "e0" else s"e$i", s"e${i + 1}", 2))
      .mkString(",")
    s"""
      WITH raw AS (
        SELECT 'n' || CAST(doc_id % 10 AS VARCHAR) AS s,
               'n' || CAST((doc_id + 1) % 10 AS VARCHAR) AS d
        FROM documents
        UNION ALL
        SELECT 'p' || CAST(doc_id % 17 AS VARCHAR),
               'n' || CAST(doc_id % 10 AS VARCHAR)
        FROM documents WHERE doc_id < 17
        UNION ALL
        SELECT 'x' || CAST(doc_id - 17 AS VARCHAR),
               'x' || CAST(doc_id - 16 AS VARCHAR)
        FROM documents WHERE doc_id >= 17 AND doc_id < 22
        UNION ALL
        SELECT 'x0', 'n0' FROM documents WHERE doc_id = 17),
      e0 AS MATERIALIZED (
        SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
        FROM raw WHERE s <> d),$rounds
      SELECT host, COUNT(*) AS core_degree FROM (
        SELECT a AS host FROM e8 UNION ALL SELECT b FROM e8)
      GROUP BY host ORDER BY host"""
  }

  private val q136 = Q(
    "q136_host_kcore",
    (s, dir) =>
      WebGraph.kCore(kcoreEdges(s, dir), k = 2)
        .orderBy("host"),
    Some(kcoreOracle)
  )

  // --------------------------------------------------------------- q166
  /** Deterministic random-walk corpus ([[graft.ops.WebGraph.randomWalks]])
    * — the DeepWalk/node2vec skip-gram input: 2 walks of 4 steps from
    * every host of a 10-node synthetic graph (doc_id arithmetic, q135
    * convention; every node keeps out-degree ≥ 1 so no dead ends), next
    * hop chosen by an md5-indexed draw over the sorted neighbor list.
    * The oracle unrolls the 4 steps as MATERIALIZED CTEs and replays the
    * identical nibble arithmetic, so the full path strings hash-match. */
  private val q166 = {
    val drawSql = (t: Int) => PipelineQueries.hexSql(
      s"md5(w.cur || '#' || CAST(w.walker AS VARCHAR) || '#$t')", 8)
    // each step emits (start_node, walker, cur, path); the output alias
    // `cur` is not visible inside its own SELECT, so the draw's `w.cur`
    // is unambiguous
    val stepSql = (t: Int) => s"""
      s${t + 1} AS MATERIALIZED (
        SELECT w.start_node, w.walker,
               n.ns[CAST(${drawSql(t)} % len(n.ns) AS INT) + 1] AS cur,
               w.path || ' ' || n.ns[CAST(${drawSql(t)} % len(n.ns) AS INT) + 1]
                 AS path
        FROM s$t w JOIN nbrs n ON w.cur = n.node)"""
    Q(
      "q166_random_walks",
      (s, dir) => {
        val d = Lake(s, dir).documents
        def host(e: org.apache.spark.sql.Column) =
          concat(lit("h"), pmod(e, lit(10)))
        val edges = d.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 3 + 1).as("dst"))
          .union(d.select(host(col("doc_id")).as("src"),
            host(col("doc_id") * 7 + 3).as("dst")))
        WebGraph.randomWalks(edges, "src", "dst", length = 4, walkers = 2)
      },
      Some(s"""
      WITH raw AS (
        SELECT 'h' || CAST(doc_id % 10 AS VARCHAR) AS s,
               'h' || CAST((doc_id * 3 + 1) % 10 AS VARCHAR) AS d
        FROM documents
        UNION ALL
        SELECT 'h' || CAST(doc_id % 10 AS VARCHAR),
               'h' || CAST((doc_id * 7 + 3) % 10 AS VARCHAR)
        FROM documents),
      e AS (SELECT DISTINCT s, d FROM raw WHERE s <> d),
      nbrs AS MATERIALIZED (
        SELECT s AS node, list(d ORDER BY d) AS ns FROM e GROUP BY s),
      s0 AS (
        SELECT node AS start_node, CAST(j.w AS BIGINT) AS walker,
               node AS cur, node AS path
        FROM nbrs, (SELECT unnest(generate_series(0, 1)) AS w) j),
      ${stepSql(0).stripLeading()},
      ${stepSql(1).stripLeading()},
      ${stepSql(2).stripLeading()},
      ${stepSql(3).stripLeading()}
      SELECT start_node, walker, path FROM s4
      ORDER BY start_node, walker""")
    )
  }

  // --------------------------------------------------------------- q219
  /** Three 8-host clusters (doc_id CRT arithmetic gives every (cluster,
    * slot) combo) with two intra-cluster edge families i→i+1, i→i+3 and a
    * single bridge ring c0h0→c1h0→c2h0→c0h0: connected components would
    * fuse all 24 hosts into one blob; the LPA frequency vote must keep
    * the dense clusters separate across the sparse bridges. Oracle
    * unrolls the 3 synchronous rounds as MATERIALIZED CTEs with the
    * identical count → (count desc, label) argmax. */
  /** The q219/q227 fixture: three 8-host clusters with two intra-cluster
    * edge families and a single h0 bridge ring (see q219 doc). */
  private def communityEdges(s: org.apache.spark.sql.SparkSession,
      dir: String) = {
    val d = Lake(s, dir).documents
    val cl = pmod(col("doc_id"), lit(3))
    val slot = pmod(col("doc_id"), lit(8))
    def h(c: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      concat(lit("c"), c, lit("h"), i)
    val intra1 = d.select(h(cl, slot).as("src_host"),
      h(cl, pmod(col("doc_id") + 1, lit(8))).as("dst_host"))
    val intra2 = d.select(h(cl, slot).as("src_host"),
      h(cl, pmod(col("doc_id") + 3, lit(8))).as("dst_host"))
    val bridge = d.select(h(cl, lit(0)).as("src_host"),
      h(pmod(col("doc_id") + 1, lit(3)), lit(0)).as("dst_host"))
    intra1.union(intra2).union(bridge)
  }

  private def lpaStep(r: Int): String = s"""
      l$r AS MATERIALIZED (
        SELECT host, nl AS label FROM (
          SELECT e.a AS host, l.label AS nl, COUNT(*) AS c,
                 row_number() OVER (PARTITION BY e.a
                   ORDER BY COUNT(*) DESC, l.label) AS rn
          FROM und e JOIN l${r - 1} l ON e.b = l.host
          GROUP BY e.a, l.label)
        WHERE rn = 1)"""

  private val q219 = {
    Q(
      "q219_host_communities",
      (s, dir) =>
        WebGraph.labelPropagation(communityEdges(s, dir), rounds = 3)
          .orderBy("host"),
      Some(s"""
      WITH $LpaCtes
      SELECT host, label AS community FROM l3 ORDER BY host""")
    )
  }

  /** Shared q219/q227 oracle chain: fixture edges, the undirected frame,
    * and three unrolled LPA rounds ending at `l3`. */
  private lazy val LpaCtes: String = s"""raw AS (
        SELECT 'c' || CAST(doc_id % 3 AS VARCHAR) ||
               'h' || CAST(doc_id % 8 AS VARCHAR) AS a,
               'c' || CAST(doc_id % 3 AS VARCHAR) ||
               'h' || CAST((doc_id + 1) % 8 AS VARCHAR) AS b
        FROM documents
        UNION ALL
        SELECT 'c' || CAST(doc_id % 3 AS VARCHAR) ||
               'h' || CAST(doc_id % 8 AS VARCHAR),
               'c' || CAST(doc_id % 3 AS VARCHAR) ||
               'h' || CAST((doc_id + 3) % 8 AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT 'c' || CAST(doc_id % 3 AS VARCHAR) || 'h0',
               'c' || CAST((doc_id + 1) % 3 AS VARCHAR) || 'h0'
        FROM documents),
      und AS MATERIALIZED (
        SELECT DISTINCT a, b FROM (
          SELECT a, b FROM raw WHERE a <> b
          UNION ALL
          SELECT b, a FROM raw WHERE a <> b)),
      l0 AS (SELECT DISTINCT a AS host, a AS label FROM und),
      ${lpaStep(1).stripLeading()},
      ${lpaStep(2).stripLeading()},
      ${lpaStep(3).stripLeading()}"""

  // --------------------------------------------------------------- q220
  /** Bellman-Ford over a 10-host directed graph with two deterministic
    * edge families carrying different weight arithmetic (parallel edges
    * collapse to MIN weight); seeds h0/h1, 4 relaxation rounds. The
    * oracle min-folds the identical rounds as MATERIALIZED CTEs —
    * [[GraphQueries]]' q103 BFS discipline, weighted. */
  private val q220 = {
    def bfStep(r: Int): String = s"""
      d$r AS MATERIALIZED (
        SELECT host, MIN(cost) AS cost FROM (
          SELECT host, cost FROM d${r - 1}
          UNION ALL
          SELECT e.dst AS host, d.cost + e.w AS cost
          FROM e JOIN d${r - 1} d ON e.src = d.host)
        GROUP BY host)"""
    Q(
      "q220_weighted_paths",
      (s, dir) => {
        import s.implicits._
        val d = Lake(s, dir).documents
        def h(e: org.apache.spark.sql.Column) = concat(lit("h"), pmod(e, lit(10)))
        val edges = d.select(h(col("doc_id")).as("src_host"),
            h(col("doc_id") * 3 + 1).as("dst_host"),
            (pmod(col("doc_id"), lit(4)) + 1).as("weight"))
          .union(d.select(h(col("doc_id")).as("src_host"),
            h(col("doc_id") * 7 + 3).as("dst_host"),
            (pmod(col("doc_id"), lit(5)) + 1).as("weight")))
        val seeds = Seq("h0", "h1").toDF("host")
        WebGraph.weightedPaths(edges, seeds, rounds = 4).orderBy("host")
      },
      Some(s"""
      WITH raw AS (
        SELECT 'h' || CAST(doc_id % 10 AS VARCHAR) AS src,
               'h' || CAST((doc_id * 3 + 1) % 10 AS VARCHAR) AS dst,
               doc_id % 4 + 1 AS w
        FROM documents
        UNION ALL
        SELECT 'h' || CAST(doc_id % 10 AS VARCHAR),
               'h' || CAST((doc_id * 7 + 3) % 10 AS VARCHAR),
               doc_id % 5 + 1
        FROM documents),
      e AS MATERIALIZED (
        SELECT src, dst, CAST(MIN(w) AS BIGINT) AS w
        FROM raw WHERE src <> dst GROUP BY src, dst),
      d0 AS (SELECT h AS host, CAST(0 AS BIGINT) AS cost FROM (
               SELECT DISTINCT src AS h FROM e
               UNION SELECT DISTINCT dst FROM e)
             WHERE h IN ('h0', 'h1')),
      ${bfStep(1).stripLeading()},
      ${bfStep(2).stripLeading()},
      ${bfStep(3).stripLeading()},
      ${bfStep(4).stripLeading()}
      SELECT host, CAST(cost AS BIGINT) AS cost FROM d4 ORDER BY host""")
    )
  }

  // --------------------------------------------------------------- q227
  /** Community-aware crawl sharding — the q219 composition: shard = LPA
    * community, scored by edge locality (intra-shard edges over all edges
    * touching the shard). A crawl scheduler placing politeness state and
    * frontier queues by community instead of by hash keeps the fraction
    * `locality` of link traversals shard-local; the bridge ring shows up
    * as exactly the inter-edge mass. Canonical undirected edges, integer
    * counts, one final exact-long division. */
  private val q227 = Q(
    "q227_community_sharding",
    (s, dir) => {
      val edges = communityEdges(s, dir)
      val comm = WebGraph.labelPropagation(edges, rounds = 3)
      val canon = edges
        .select(col("src_host").cast("string").as("a"),
          col("dst_host").cast("string").as("b"))
        .filter(col("a") =!= "" && col("b") =!= "" && col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("ea"),
          greatest(col("a"), col("b")).as("eb"))
        .distinct()
      val tagged = canon
        .join(comm.select(col("host").as("ea"), col("community").as("ca")),
          "ea")
        .join(comm.select(col("host").as("eb"), col("community").as("cb")),
          "eb")
      val cross = tagged.filter(col("ca") =!= col("cb"))
      val intra = tagged.filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("community"))
        .agg(count(lit(1)).as("intra_edges"))
      val inter = cross.select(col("ca").as("community"))
        .union(cross.select(col("cb").as("community")))
        .groupBy("community").agg(count(lit(1)).as("inter_edges"))
      comm.groupBy("community").agg(count(lit(1)).as("n_hosts"))
        .join(intra, Seq("community"), "left")
        .join(inter, Seq("community"), "left")
        .na.fill(0L, Seq("intra_edges", "inter_edges"))
        .withColumn("locality",
          col("intra_edges").cast("double") /
            (col("intra_edges") + col("inter_edges")).cast("double"))
        .orderBy("community")
    },
    Some(s"""
      WITH $LpaCtes,
      cedges AS (SELECT DISTINCT least(a, b) AS ea, greatest(a, b) AS eb
                 FROM raw WHERE a <> b),
      tagged AS (SELECT e.ea, e.eb, la.label AS ca, lb.label AS cb
                 FROM cedges e
                 JOIN l3 la ON e.ea = la.host
                 JOIN l3 lb ON e.eb = lb.host),
      intra AS (SELECT ca AS community, CAST(COUNT(*) AS BIGINT)
                  AS intra_edges
                FROM tagged WHERE ca = cb GROUP BY ca),
      inter AS (SELECT community, CAST(COUNT(*) AS BIGINT) AS inter_edges
                FROM (SELECT ca AS community FROM tagged WHERE ca <> cb
                      UNION ALL
                      SELECT cb FROM tagged WHERE ca <> cb)
                GROUP BY community),
      nh AS (SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_hosts
             FROM l3 GROUP BY label)
      SELECT nh.community, nh.n_hosts,
             CAST(COALESCE(intra.intra_edges, 0) AS BIGINT) AS intra_edges,
             CAST(COALESCE(inter.inter_edges, 0) AS BIGINT) AS inter_edges,
             CAST(COALESCE(intra.intra_edges, 0) AS DOUBLE) /
               CAST(COALESCE(intra.intra_edges, 0) +
                    COALESCE(inter.inter_edges, 0) AS DOUBLE) AS locality
      FROM nh
      LEFT JOIN intra USING (community)
      LEFT JOIN inter USING (community)
      ORDER BY nh.community""")
  )

  // --------------------------------------------------------------- q228
  /** Newman modularity of the LPA partition — the quality score for
    * q219/q227: Q = (Σ_c intra_c)/m − (Σ_c deg_c²)/(4m²) over the
    * canonical undirected edge set. Every ingredient is an exact long
    * (edge count, intra count, per-community degree sums and their
    * squares); the score is two exact-long divisions and one subtraction,
    * the identical op tree in both engines. Self-loops are excluded with
    * the edges (the [[WebGraph.labelPropagation]] filter). */
  private val q228 = Q(
    "q228_partition_modularity",
    (s, dir) => {
      val edges = communityEdges(s, dir)
      val comm = WebGraph.labelPropagation(edges, rounds = 3)
      val canon = edges
        .select(col("src_host").cast("string").as("a"),
          col("dst_host").cast("string").as("b"))
        .filter(col("a") =!= "" && col("b") =!= "" && col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("ea"),
          greatest(col("a"), col("b")).as("eb"))
        .distinct()
      val tagged = canon
        .join(comm.select(col("host").as("ea"), col("community").as("ca")),
          "ea")
        .join(comm.select(col("host").as("eb"), col("community").as("cb")),
          "eb")
      val base = tagged.agg(count(lit(1)).as("m"),
        sum(when(col("ca") === col("cb"), 1L).otherwise(0L)).as("si"))
      val degC = canon.select(col("ea").as("host"))
        .union(canon.select(col("eb").as("host")))
        .join(comm, "host")
        .groupBy("community").agg(count(lit(1)).as("__d"))
      val sds = degC.agg(sum(col("__d") * col("__d")).as("sds"))
      base.crossJoin(sds).select(col("m"), col("si"), col("sds"),
        (col("si").cast("double") / col("m").cast("double") -
          col("sds").cast("double") /
            (lit(4L) * col("m") * col("m")).cast("double"))
          .as("modularity"))
    },
    Some(s"""
      WITH $LpaCtes,
      cedges AS (SELECT DISTINCT least(a, b) AS ea, greatest(a, b) AS eb
                 FROM raw WHERE a <> b),
      tagged AS (SELECT e.ea, e.eb, la.label AS ca, lb.label AS cb
                 FROM cedges e
                 JOIN l3 la ON e.ea = la.host
                 JOIN l3 lb ON e.eb = lb.host),
      base AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT)
                   AS si
               FROM tagged),
      degc AS (SELECT l3.label AS community, CAST(COUNT(*) AS BIGINT) AS d
               FROM (SELECT ea AS host FROM cedges
                     UNION ALL SELECT eb FROM cedges) h
               JOIN l3 ON h.host = l3.host
               GROUP BY l3.label),
      s2 AS (SELECT CAST(SUM(d * d) AS BIGINT) AS sds FROM degc)
      SELECT m, si, sds,
             CAST(si AS DOUBLE) / CAST(m AS DOUBLE) -
               CAST(sds AS DOUBLE) / CAST(4 * m * m AS DOUBLE) AS modularity
      FROM base CROSS JOIN s2""")
  )

  // --------------------------------------------------------------- q252
  /** Strongly-connected components on a directed fixture where weak and
    * strong components genuinely differ: inside each cluster doc_id%5
    * the functional edge i → (3i+1) mod 7 forms one 6-cycle
    * {h0,h1,h2,h4,h5,h6} plus the self-loop h3; one-way cross edges
    * c → c+1 (c < 4) chain the clusters WEAKLY (q108 would see one
    * component) but never strongly — so the expected answer is ten
    * SCCs: five 6-cycles and five singletons, each labeled by its
    * largest member (the Orzan pivot). The oracle states the
    * mathematical spec — mutual reachability over the recursive
    * closure — which the coloring decomposition must land on exactly. */
  private val q252 = Q(
    "q252_host_scc",
    (s, dir) => {
      val d = Lake(s, dir).documents
      def host(c: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column) =
        concat(lit("c"), c, lit("h"), h)
      val c = pmod(col("doc_id"), lit(5))
      val h = pmod(col("doc_id"), lit(7))
      val intra = d.select(host(c, h).as("src_host"),
        host(c, pmod(col("doc_id") * 3 + 1, lit(7))).as("dst_host"))
      val cross = d.filter(c < 4).select(host(c, h).as("src_host"),
        host(c + 1, h).as("dst_host"))
      WebGraph.stronglyConnectedComponents(intra.union(cross))
        .orderBy("host")
    },
    Some("""
      WITH RECURSIVE raw AS (
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR) AS src,
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 3 + 1) % 7 AS VARCHAR) AS dst
        FROM documents
        UNION ALL
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR),
               'c' || CAST(doc_id % 5 + 1 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR)
        FROM documents WHERE doc_id % 5 < 4),
      e AS (SELECT DISTINCT src, dst FROM raw),
      nodes AS (SELECT DISTINCT host FROM
                 (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),
      ed AS MATERIALIZED (SELECT * FROM e WHERE src <> dst),
      reach AS (
        SELECT src AS a, dst AS b FROM ed
        UNION
        SELECT r.a, e2.dst FROM reach r JOIN ed e2 ON r.b = e2.src),
      mutual AS (SELECT r1.a AS host, r1.b AS other
                 FROM reach r1 JOIN reach r2
                   ON r1.a = r2.b AND r1.b = r2.a),
      lab AS (SELECT host, MAX(other) AS m FROM mutual GROUP BY host)
      SELECT n.host, greatest(COALESCE(l.m, n.host), n.host) AS scc
      FROM nodes n LEFT JOIN lab l ON n.host = l.host
      ORDER BY n.host""")
  )

  // --------------------------------------------------------------- q254
  /** Link reciprocity per host — the classic webgraph mutuality signal
    * (organic communities reciprocate; farms and scrapers point one
    * way). Fixture = q135's two intra-cluster families, which reciprocate
    * at exactly one pair per cluster (i → 3i+1 and i → 2i+3 invert only
    * at {h5, h6}: 3·5+1 ≡ 6, 2·6+3 ≡ 5 mod 7), so the ratio is sparse
    * but provably nonzero. Self-loops are excluded; the reverse-edge
    * probe is a self-join of the deduped directed edge list on the
    * swapped key — one shuffle, candidates only. */
  private val q254 = Q(
    "q254_link_reciprocity",
    (s, dir) => {
      val e = triangleEdges(s, dir)
        .select(col("src_host").as("src"), col("dst_host").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val rev = e.select(col("dst").as("src"), col("src").as("dst"))
        .withColumn("has_rev", lit(1L))
      e.join(rev, Seq("src", "dst"), "left")
        .groupBy(col("src").as("host"))
        .agg(
          count(lit(1)).as("out_deg"),
          sum(coalesce(col("has_rev"), lit(0L))).as("reciprocated"))
        .withColumn("reciprocity",
          col("reciprocated").cast("double") / col("out_deg").cast("double"))
        .orderBy("host")
    },
    Some("""
      WITH raw AS (
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR) AS src,
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 3 + 1) % 7 AS VARCHAR) AS dst
        FROM documents
        UNION ALL
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR),
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 2 + 3) % 7 AS VARCHAR)
        FROM documents),
      e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)
      SELECT e.src AS host, COUNT(*) AS out_deg,
             CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS reciprocated,
             CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
               AS DOUBLE) / COUNT(*) AS reciprocity
      FROM e LEFT JOIN e r ON e.src = r.dst AND e.dst = r.src
      GROUP BY e.src
      ORDER BY host""")
  )

  // --------------------------------------------------------------- q255
  /** Two-hop reach per host — the crawl-frontier sizing signal (how many
    * hosts does one more hop unlock?) and the friend-of-friend
    * denominator for link-recommendation. Distinct hosts reachable in
    * ≤ 2 directed hops, self excluded: one self-join of the edge list
    * (dst = second's src), union with the 1-hop frontier, one distinct —
    * candidates only, never an all-pairs frame. Same fixture as q254. */
  private val q255 = Q(
    "q255_two_hop_reach",
    (s, dir) => {
      val e = triangleEdges(s, dir)
        .select(col("src_host").as("src"), col("dst_host").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val twoHop = e.as("a")
        .join(e.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
      e.union(twoHop)
        .filter(col("src") =!= col("dst"))
        .distinct()
        .groupBy(col("src").as("host"))
        .agg(count(lit(1)).as("reach2"))
        .orderBy("host")
    },
    Some("""
      WITH raw AS (
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR) AS src,
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 3 + 1) % 7 AS VARCHAR) AS dst
        FROM documents
        UNION ALL
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR),
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 2 + 3) % 7 AS VARCHAR)
        FROM documents),
      e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
      hops AS (
        SELECT src, dst FROM e
        UNION
        SELECT a.src, b.dst FROM e a JOIN e b ON a.dst = b.src)
      SELECT src AS host, COUNT(*) AS reach2
      FROM (SELECT DISTINCT src, dst FROM hops WHERE src <> dst)
      GROUP BY src
      ORDER BY host""")
  )

  // --------------------------------------------------------------- q258
  /** Degree assortativity of the directed host graph — Newman's "do
    * hubs link to hubs?" coefficient: the Pearson correlation between
    * source out-degree and destination in-degree over the edge list.
    * Disassortative graphs (hubs feeding leaves) are the organic-web
    * signature; assortative cores are link exchanges. The q154
    * discipline end to end: degrees are exact counts, the five moments
    * are DECIMAL(38,0)/HUGEINT sums over the edges, and the coefficient
    * is assembled in doubles with the IDENTICAL op tree on both engines
    * (×, −, ÷, √ only). Two degree aggregates + two key joins — the
    * edge list never self-joins. */
  private val q258 = Q(
    "q258_degree_assortativity",
    (s, dir) => {
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val e = triangleEdges(s, dir)
        .select(col("src_host").as("src"), col("dst_host").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val outd = e.groupBy("src").agg(count(lit(1)).as("od"))
      val ind = e.groupBy("dst").agg(count(lit(1)).as("id"))
      val m = e.join(outd, "src").join(ind, "dst")
        .agg(
          count(lit(1)).as("n_edges"),
          sum(dec(col("od"))).as("s_x"),
          sum(dec(col("id"))).as("s_y"),
          sum(dec(col("od")) * dec(col("od"))).as("ss_x"),
          sum(dec(col("id")) * dec(col("id"))).as("ss_y"),
          sum(dec(col("od")) * dec(col("id"))).as("s_xy"))
      m.select(
        col("n_edges"),
        col("s_x").cast("long").as("s_x"),
        col("s_y").cast("long").as("s_y"),
        ((d(col("n_edges")) * d(col("s_xy")) - d(col("s_x")) * d(col("s_y"))) /
          (sqrt(d(col("n_edges")) * d(col("ss_x")) - d(col("s_x")) * d(col("s_x"))) *
            sqrt(d(col("n_edges")) * d(col("ss_y")) - d(col("s_y")) * d(col("s_y")))))
          .as("assortativity"))
    },
    Some("""
      WITH raw AS (
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR) AS src,
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 3 + 1) % 7 AS VARCHAR) AS dst
        FROM documents
        UNION ALL
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR),
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 2 + 3) % 7 AS VARCHAR)
        FROM documents),
      e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
      outd AS (SELECT src, CAST(COUNT(*) AS HUGEINT) AS od FROM e GROUP BY src),
      ind AS (SELECT dst, CAST(COUNT(*) AS HUGEINT) AS id FROM e GROUP BY dst),
      m AS (
        SELECT COUNT(*) AS n_edges,
               SUM(od) AS s_x, SUM(id) AS s_y,
               SUM(od * od) AS ss_x, SUM(id * id) AS ss_y,
               SUM(od * id) AS s_xy
        FROM e JOIN outd USING (src) JOIN ind USING (dst))
      SELECT n_edges,
             CAST(s_x AS BIGINT) AS s_x,
             CAST(s_y AS BIGINT) AS s_y,
             (CAST(n_edges AS DOUBLE) * CAST(s_xy AS DOUBLE)
                - CAST(s_x AS DOUBLE) * CAST(s_y AS DOUBLE)) /
             (sqrt(CAST(n_edges AS DOUBLE) * CAST(ss_x AS DOUBLE)
                - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE)) *
              sqrt(CAST(n_edges AS DOUBLE) * CAST(ss_y AS DOUBLE)
                - CAST(s_y AS DOUBLE) * CAST(s_y AS DOUBLE)))
               AS assortativity
      FROM m""")
  )

  // --------------------------------------------------------------- q271
  /** 4-truss decomposition ([[graft.ops.WebGraph.kTruss]]) on a
    * three-family fixture (i → 3i+1, 2i+3, i+1 per cluster) built so the
    * peel genuinely CASCADES: initial supports are mixed {1,2,3},
    * removing the support-1 edges drops some survivors below 2, and the
    * fixpoint (support uniformly 2, 6 edges/cluster) arrives after two
    * productive peels — a single-pass "filter by support" would return
    * the wrong answer, which is exactly what the gate is for. The oracle
    * unrolls three MATERIALIZED rounds of the wedge-join support count +
    * peel and emits the fixpoint edges with final supports. */
  private val q271 = Q(
    "q271_host_ktruss",
    (s, dir) => {
      val d = Lake(s, dir).documents
      def host(expr: org.apache.spark.sql.Column) =
        concat(lit("c"), pmod(col("doc_id"), lit(5)), lit("h"), expr)
      val fams = Seq(
        pmod(col("doc_id") * 3 + 1, lit(7)),
        pmod(col("doc_id") * 2 + 3, lit(7)),
        pmod(col("doc_id") + 1, lit(7)))
      val edges = fams.map(f =>
          d.select(host(pmod(col("doc_id"), lit(7))).as("src_host"),
            host(f).as("dst_host")))
        .reduce(_.union(_))
      WebGraph.kTruss(edges, k = 4)
        .select(col("a"), col("b"), col("sup"))
        .orderBy("a", "b")
    },
    Some {
      val gen = """
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR) AS s,
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 3 + 1) % 7 AS VARCHAR) AS d
        FROM documents
        UNION ALL
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR),
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 2 + 3) % 7 AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR),
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id + 1) % 7 AS VARCHAR)
        FROM documents"""
      def round(r: Int): String = s"""
      tri$r AS MATERIALIZED (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e$r e1 JOIN e$r e2 ON e1.a = e2.a AND e1.b < e2.b
        JOIN e$r e3 ON e3.a = e1.b AND e3.b = e2.b),
      sup$r AS MATERIALIZED (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS sup FROM (
          SELECT x AS a, y AS b FROM tri$r
          UNION ALL SELECT x, z FROM tri$r
          UNION ALL SELECT y, z FROM tri$r)
        GROUP BY a, b),
      e${r + 1} AS MATERIALIZED (
        SELECT e.a, e.b FROM e$r e
        JOIN sup$r s ON e.a = s.a AND e.b = s.b
        WHERE s.sup >= 2)"""
      s"""
      WITH raw AS ($gen),
      e0 AS MATERIALIZED (
        SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
        FROM raw WHERE s <> d),
      ${round(0)},
      ${round(1)},
      ${round(2)}
      SELECT a, b, sup FROM sup2
      JOIN e3 USING (a, b)
      ORDER BY a, b"""
    }
  )

  // --------------------------------------------------------------- q277
  /** Rich-club coefficient — do the high-degree hosts link to EACH
    * OTHER? φ(k) = edges among degree-≥k nodes / (n_rich choose 2), the
    * club-formation signal that complements q258's assortativity (a
    * correlation over all edges) with a subgraph density at the top of
    * the degree distribution. Everything is exact integers — edge and
    * node counts, the possible-pairs denominator n(n−1)/2 — and φ is
    * one double division at the end. Two aggregates + two semi-joins;
    * the club subgraph is degree-filtered before any pairing. */
  private val q277 = Q(
    "q277_rich_club",
    (s, dir) => {
      val und = triangleEdges(s, dir)
        .select(col("src_host").as("s"), col("dst_host").as("d"))
        .filter(col("s") =!= col("d"))
        .select(least(col("s"), col("d")).as("a"),
          greatest(col("s"), col("d")).as("b"))
        .distinct()
      val deg = und.select(col("a").as("host"))
        .union(und.select(col("b").as("host")))
        .groupBy("host").agg(count(lit(1)).as("degree"))
      val rich = deg.filter(col("degree") >= 3).select("host")
      val clubEdges = und
        .join(rich.withColumnRenamed("host", "a"), Seq("a"), "left_semi")
        .join(rich.withColumnRenamed("host", "b"), Seq("b"), "left_semi")
        .agg(count(lit(1)).as("edges_among"))
      val clubSize = rich.agg(count(lit(1)).as("n_rich"))
      clubEdges.crossJoin(broadcast(clubSize))
        .select(
          lit(3L).as("degree_threshold"),
          col("n_rich"), col("edges_among"),
          (col("n_rich") * (col("n_rich") - 1) / 2).cast("long")
            .as("possible"),
          (col("edges_among").cast("double") /
            ((col("n_rich") * (col("n_rich") - 1) / 2).cast("double")))
            .as("phi"))
    },
    Some("""
      WITH raw AS (
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR) AS s,
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 3 + 1) % 7 AS VARCHAR) AS d
        FROM documents
        UNION ALL
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR),
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 2 + 3) % 7 AS VARCHAR)
        FROM documents),
      und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
              FROM raw WHERE s <> d),
      deg AS (SELECT host, COUNT(*) AS degree FROM (
                SELECT a AS host FROM und
                UNION ALL SELECT b FROM und)
              GROUP BY host),
      rich AS (SELECT host FROM deg WHERE degree >= 3),
      ce AS (SELECT CAST(COUNT(*) AS BIGINT) AS edges_among
             FROM und
             WHERE a IN (SELECT host FROM rich)
               AND b IN (SELECT host FROM rich)),
      cs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rich FROM rich)
      SELECT CAST(3 AS BIGINT) AS degree_threshold, n_rich, edges_among,
             CAST(n_rich * (n_rich - 1) / 2 AS BIGINT) AS possible,
             CAST(edges_among AS DOUBLE)
               / CAST(n_rich * (n_rich - 1) / 2 AS DOUBLE) AS phi
      FROM ce CROSS JOIN cs""")
  )

  // --------------------------------------------------------------- q284
  /** Average neighbor degree per host (k_nn) — q258's assortativity
    * decomposed to the node level: for each host, the mean degree of
    * its undirected neighbors as the exact fraction
    * Σ deg(neighbor) / deg(host) (numerator and denominator exact
    * longs, one division). A host with degree 2 and knn 6 is a leaf
    * hanging off hubs; degree 6 and knn 2 is the hub itself — the
    * per-node view the single assortativity scalar averages away. One
    * degree aggregate, one join of the symmetric edge list back onto
    * it. */
  private val q284 = Q(
    "q284_avg_neighbor_degree",
    (s, dir) => {
      val und = triangleEdges(s, dir)
        .select(col("src_host").as("s"), col("dst_host").as("d"))
        .filter(col("s") =!= col("d"))
        .select(least(col("s"), col("d")).as("a"),
          greatest(col("s"), col("d")).as("b"))
        .distinct()
      val sym = und.select(col("a").as("host"), col("b").as("nbr"))
        .union(und.select(col("b").as("host"), col("a").as("nbr")))
      val deg = sym.groupBy("host").agg(count(lit(1)).as("degree"))
      sym.join(deg.select(col("host").as("nbr"), col("degree").as("nd")),
          Seq("nbr"))
        .groupBy("host")
        .agg(count(lit(1)).as("degree"), sum(col("nd")).as("nbr_deg_sum"))
        .withColumn("knn",
          col("nbr_deg_sum").cast("double") / col("degree").cast("double"))
        .orderBy("host")
    },
    Some("""
      WITH raw AS (
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR) AS s,
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 3 + 1) % 7 AS VARCHAR) AS d
        FROM documents
        UNION ALL
        SELECT 'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST(doc_id % 7 AS VARCHAR),
               'c' || CAST(doc_id % 5 AS VARCHAR) || 'h'
                 || CAST((doc_id * 2 + 3) % 7 AS VARCHAR)
        FROM documents),
      und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
              FROM raw WHERE s <> d),
      sym AS (SELECT a AS host, b AS nbr FROM und
              UNION ALL SELECT b, a FROM und),
      deg AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS degree
              FROM sym GROUP BY host)
      SELECT sym.host, CAST(COUNT(*) AS BIGINT) AS degree,
             CAST(SUM(nd.degree) AS BIGINT) AS nbr_deg_sum,
             CAST(SUM(nd.degree) AS DOUBLE) / COUNT(*) AS knn
      FROM sym JOIN deg nd ON sym.nbr = nd.host
      GROUP BY sym.host
      ORDER BY sym.host""")
  )

  val all: Seq[Q] = Seq(q135, q136, q166, q219, q220, q227, q228, q252,
    q254, q255, q258, q271, q277, q284)
}
