package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.{DateKeys, Dedup, Joins, OrderedAgg}

/** Property-based invariants over randomized inputs — the laws the engine
  * depends on but example tests can't pin: order-independence of the
  * deterministic aggregations, the pigeonhole equality behind banded
  * SimHash, salted-join equivalence, date-key totality. Iteration counts
  * stay small (each case runs Spark jobs); generators use fixed scalacheck
  * seeds per run, which is plenty to catch law violations. */
class PropertySpec extends SparkTestBase {
  import testImplicits._

  private def holds(p: Prop, n: Int = 5): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("stringAgg is invariant to input row order") {
    val rows = Gen.listOfN(12,
      Gen.zip(Gen.choose(0, 3), Gen.choose(0, 5), Gen.alphaLowerStr.map(_.take(4))))
    holds(Prop.forAll(rows) { data =>
      def agg(d: Seq[(Int, Int, String)]): Map[Int, String] =
        d.toDF("g", "k", "v")
          .groupBy("g")
          .agg(OrderedAgg.stringAgg(col("v"), ",", col("k")).as("s"))
          .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      agg(data) == agg(scala.util.Random.shuffle(data))
    })
  }

  test("simhashPairs equals the all-pairs spec for any fingerprints (pigeonhole)") {
    val fps = Gen.listOfN(10, Gen.listOfN(4, Gen.choose(0, 0xFFFF)))
      .map(_.zipWithIndex.map { case (bs, i) => (i.toLong, bs(0), bs(1), bs(2), bs(3)) })
    holds(Prop.forAll(fps) { rows =>
      val fp = rows.toDF("doc_id", "b0", "b1", "b2", "b3")
      val banded = Dedup.simhashPairs(fp, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val byId = rows.map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
      val spec = (for {
        a <- byId.keys; b <- byId.keys if a < b
        h = byId(a).zip(byId(b)).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
        if h <= 3
      } yield (a, b, h)).toSet
      banded == spec
    })
  }

  test("saltedJoin equals the plain join for any data and salt factor") {
    val gen = Gen.zip(
      Gen.listOfN(40, Gen.choose(0L, 4L)),
      Gen.choose(1, 8))
    holds(Prop.forAll(gen) { case (keys, saltFactor) =>
      val left = keys.zipWithIndex.toDF("k", "payload")
      val right = Seq((0L, "a"), (2L, "b"), (4L, "c")).toDF("k", "tag")
      val salted = Joins.saltedJoin(left, right, Seq("k"), saltFactor)
        .select("k", "payload", "tag").collect().map(_.toSeq).toSet
      val plain = left.join(right, Seq("k"))
        .select("k", "payload", "tag").collect().map(_.toSeq).toSet
      salted == plain
    })
  }

  test("dateKey: total on any input — valid dates to 8 digits, junk to ''") {
    val valid = Gen.zip(Gen.choose(1900, 2100), Gen.choose(1, 12), Gen.choose(1, 28))
    val junk = Gen.oneOf(Gen.alphaStr.map(_.take(10)), Gen.const(""), Gen.const("99-99"))
    holds(Prop.forAll(valid, junk) { case ((y, m, d), bad) =>
      val iso = f"$y%04d-$m%02d-$d%02d"
      val out = Seq(iso, bad).toDF("s")
        .select(DateKeys.dateKey(col("s"))).collect().map(_.getString(0))
      out(0) == f"$y%04d$m%02d$d%02d" &&
        (out(1) == "" || out(1).matches("\\d{8}")) // junk → ''; parseable stays a key
    })
  }

  test("descriptor-constant lookup is case-insensitive in both key parts") {
    val entryGen = Gen.oneOf(graft.ops.DescriptorMap.entries)
    val gen = Gen.zip(entryGen, Gen.long)
    holds(Prop.forAll(gen) { case ((constant, descriptor, codeValue), seed) =>
      // randomize the casing of every letter with the seed
      val rnd = new scala.util.Random(seed)
      def mix(s: String) = s.map(c => if (rnd.nextBoolean()) c.toUpper else c.toLower)
      val uri = s"uri://ed-fi.org/${mix(descriptor)}#${mix(codeValue)}"
      val out = graft.ops.DescriptorMap.withConstant(
        Seq(uri).toDF("d"), "d")
        .collect().map(_.getAs[String]("d_constantName")).toSet
      out.contains(constant) // multi-mapped entries fan out; ours must be there
    })
  }

  test("redactPii: no pattern survives redaction, clean text passes untouched") {
    import graft.ops.TextAnalysis
    // random interleavings of words, PII shapes, and near-miss fragments
    val fragment = Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(6)),
      Gen.zip(Gen.alphaLowerStr.map(_.take(4) + "x"), Gen.alphaLowerStr.map(_.take(4) + "x"))
        .map { case (u, h) => s"$u@$h.org" },
      Gen.choose(100, 999).map(n => s"$n-555-0123"),
      Gen.listOfN(4, Gen.choose(0, 255)).map(_.mkString(".")),
      Gen.const("a@b"), Gen.const("1.2.3"), Gen.const("12-34-56")) // near misses
    val text = Gen.listOfN(6, fragment).map(_.mkString(" "))
    holds(Prop.forAll(text) { t =>
      val out = Seq(t).toDF("text").select(
        TextAnalysis.redactPii(col("text")).as("r"))
        .withColumn("e", TextAnalysis.countMatches(col("r"), TextAnalysis.EmailPattern))
        .withColumn("p", TextAnalysis.countMatches(col("r"), TextAnalysis.PhonePattern))
        .withColumn("i", TextAnalysis.countMatches(col("r"), TextAnalysis.Ipv4Pattern))
        .collect().head
      // THE scrub guarantee: zero detectable PII after redaction — and
      // redaction is idempotent (placeholders carry no @, digits, or dots)
      out.getAs[Long]("e") == 0 && out.getAs[Long]("p") == 0 &&
        out.getAs[Long]("i") == 0
    })
  }

  test("mixWeights: rates capped at 1, binding stratum exactly 1, keeps proportional to targets") {
    import graft.ops.Sampling
    val gen = Gen.zip(
      Gen.choose(2, 5),                       // strata
      Gen.listOfN(5, Gen.choose(1, 200)),     // counts
      Gen.listOfN(5, Gen.choose(1, 9)))       // integer weights
    holds(Prop.forAll(gen) { case (k, counts, weights) =>
      val rows = (0 until k).flatMap(s =>
        (1 to counts(s)).map(i => (s.toLong * 1000 + i, s"s$s")))
      val wMap = (0 until k).map(s => s"s$s" -> weights(s).toDouble).toMap
      val out = Sampling.mixWeights(rows.toDF("k", "s"), "s", wMap)
        .collect().map(r => r.getAs[String]("s") ->
          (r.getAs[Long]("n_docs"), r.getAs[Double]("target_share"),
            r.getAs[Double]("keep_rate"), r.getAs[Double]("n_keep"))).toMap
      val eps = 1e-9
      val ratios = out.values.map { case (_, t, _, keep) => keep / t }
      out.values.forall { case (n, _, rate, keep) =>
        rate <= 1.0 && keep <= n + eps } &&
        out.values.exists { case (_, _, rate, _) => rate >= 1.0 - eps } &&
        (ratios.max - ratios.min) < 1e-6 // keeps ∝ targets: same scale everywhere
    })
  }

  test("chunkDocuments: every word covered, no redundant chunk, adjacent overlap exact") {
    import graft.ops.Packing
    val gen = Gen.zip(
      Gen.choose(1, 30),                         // words in the doc
      Gen.choose(2, 8),                          // chunkTokens
      Gen.choose(0, 6))                          // raw overlap (clamped below)
    holds(Prop.forAll(gen) { case (n, c, rawO) =>
      val o = math.min(rawO, c - 1)
      val words = (1 to n).map(i => s"w$i")
      val chunks = Packing.chunkDocuments(
        Seq((1L, words.mkString(" "))).toDF("doc_id", "text"), "doc_id", "text", c, o)
        .orderBy("chunk_idx").collect()
        .map(r => r.getAs[String]("chunk_text").split(" ").toSeq).toSeq
      val covered = chunks.flatten.toSet
      val noRedundant = chunks.sliding(2).forall {
        case Seq(a, b) => !b.forall(a.contains); case _ => true
      }
      val overlapExact = chunks.sliding(2).forall {
        case Seq(a, b) => a.toSet.intersect(b.toSet).size == o; case _ => true
      }
      covered == words.toSet && noRedundant && overlapExact
    })
  }

  test("vocabOov: head vocab by (freq desc, word asc), rate = oov tokens / tokens") {
    // corpus frequencies: x 4, y 3, b 2, a 2 — vocabSize 2 takes {x, y};
    // the a/b tie at freq 2 checks the word-asc tiebreak does NOT admit
    // either (both lose to y), and doc 3 checks duplicates count per-token
    val docs = Seq(
      (1L, "x y x a"),
      (2L, "x y b b"),
      (3L, "x y a z z")
    ).toDF("doc_id", "text")
    val out = graft.ops.Vocabulary.oovStats(docs, "text", vocabSize = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_rate"))).toMap
    assert(out(1L) == (4L, 1L, 0.25))      // a
    assert(out(2L) == (4L, 2L, 0.5))       // b b
    assert(out(3L) == (5L, 3L, 0.6))       // a z z
  }

  test("rangeJoin equals the naive inequality join for any bin size") {
    val gen = Gen.zip(
      Gen.listOfN(10, Gen.choose(0, 40)),          // fact minutes
      Gen.listOfN(5, Gen.zip(Gen.choose(0, 40), Gen.choose(1, 20))),
      Gen.oneOf(60L, 300L, 1800L))                 // bin sizes (seconds)
    holds(Prop.forAll(gen) { case (factMins, intervalRaw, binSeconds) =>
      def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
      val facts = factMins.zipWithIndex
        .map { case (m, i) => (i.toLong, ts(m)) }
      val intervals = intervalRaw.zipWithIndex
        .map { case ((s, len), i) => (i.toLong, ts(s), ts(s + len)) }
      val out = Joins.rangeJoin(
        facts.toDF("fact_id", "ts"),
        "ts",
        intervals.toDF("interval_id", "w_start", "w_end"),
        "w_start", "w_end", binSeconds)
        .select("fact_id", "interval_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val spec = (for {
        (fid, fts) <- facts
        (iid, s, e) <- intervals
        if !fts.before(s) && fts.before(e)
      } yield (fid, iid)).toSet
      out == spec
    })
  }

  test("asofJoin equals the naive latest-at-or-before spec for any data") {
    val gen = Gen.zip(
      Gen.listOfN(12, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0, 20))),
      Gen.listOfN(8, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0, 20),
        Gen.choose(1, 99))))
    holds(Prop.forAll(gen) { case (leftRaw, rightRaw) =>
      def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
      val left = leftRaw.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t)) }
      // unique (key, ts) on the right — the operator's documented
      // precondition (a real change stream is unique there)
      val right = rightRaw.distinctBy(r => (r._1, r._2))
        .map { case (k, t, v) => (k, ts(t), v.toDouble) }
      val out = Joins.asofJoin(
        left.toDF("row_id", "k", "ts"),
        right.toDF("k", "ts", "v"),
        Seq("k"), "ts", Seq("v"))
        .collect()
        .map(r => r.getAs[Long]("row_id") ->
          Option(r.get(r.fieldIndex("v"))).map(_.asInstanceOf[Double]))
        .toMap
      left.forall { case (id, k, lts) =>
        val expect = right
          .filter(r => r._1 == k && !r._2.after(lts))
          .sortBy(_._2.getTime).lastOption.map(_._3)
        out(id) == expect
      }
    })
  }

  test("mergeStats(partial(A), partial(B)) == partial(A ∪ B) for any split") {
    import graft.ops.Stats
    val gen = Gen.zip(
      Gen.listOfN(20, Gen.zip(Gen.oneOf("x", "y", "z"), Gen.choose(-50, 50))),
      Gen.choose(0, 20))
    holds(Prop.forAll(gen) { case (rows0, cut) =>
      val rows = rows0.map { case (g, v) => (g, v / 4.0) }
      rows.isEmpty || {
        val (a, b) = rows.splitAt(cut)
        def partial(d: Seq[(String, Double)]) =
          Stats.partialStats(d.toDF("g", "v"), Seq("g"), "v")
        val merged = Stats.mergeStats(
          Seq(a, b).filter(_.nonEmpty).map(partial), Seq("g"))
        val full = partial(rows)
        merged.orderBy("g").collect().map(_.toSeq).toSeq ==
          full.orderBy("g").collect().map(_.toSeq).toSeq
      }
    })
  }

  test("spanDedup reconstruction law: kept + dropped spans rebuild the doc") {
    val docs = Gen.listOfN(6, Gen.zip(
      Gen.choose(1L, 50L),
      Gen.listOfN(7, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
      .map(_.distinctBy(_._1))
    holds(Prop.forAll(docs) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("doc_id", "text")
        val out = Dedup.spanDedup(df, "doc_id", "text", span = 3)
          .collect().map(r => r.getAs[Long]("doc_id") ->
            (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dropped"),
              r.getAs[String]("clean_text"))).toMap
        rows.forall { case (id, text) =>
          val (nSpans, nDropped, clean) = out(id)
          val words = text.split(" ")
          // span accounting is total and clean_text is a subsequence of
          // the original built from whole spans
          nSpans == (words.length + 2) / 3 &&
          nDropped >= 0 && nDropped <= nSpans &&
          (clean.isEmpty ||
            clean.split(" ").grouped(3).forall(chunk =>
              text.contains(chunk.mkString(" "))))
        }
      }
    })
  }

  test("canonicalizeUrl is idempotent: a canonical URL is its own canonical form") {
    // the defining law of a canonicalization: applying it twice changes
    // nothing — generated URLs mix case, ports, fragments, tracking and
    // real params in every order
    import graft.ops.WebGraph
    val scheme = Gen.oneOf("http", "HTTP", "https", "HTTPS")
    val host = Gen.oneOf("Ex.COM", "www.ex.com", "A.b.C")
    val port = Gen.oneOf("", ":80", ":443", ":8080")
    val path = Gen.oneOf("", "/", "/A/b", "/p")
    val params = Gen.someOf(
      Seq("utm_source=x", "gclid=1", "id=2", "q=a+b", "xgclid=keep", "fbclid=f"))
      .map(ps => if (ps.isEmpty) "" else "?" + ps.mkString("&"))
    val frag = Gen.oneOf("", "#top", "#a=b")
    val urls = Gen.listOfN(8,
      Gen.zip(scheme, host, port, path, params, frag)
        .map { case (s, h, po, pa, q, f) => s"$s://$h$po$pa$q$f" })
    holds(Prop.forAll(urls) { us =>
      val df = us.toDF("url")
      val once = df.select(WebGraph.canonicalizeUrl(col("url")).as("c"))
      val twice = once.select(col("c"),
        WebGraph.canonicalizeUrl(col("c")).as("cc"))
      twice.collect().forall(r => r.getString(0) == r.getString(1))
    })
  }

  test("resolveUrl laws: absolute hrefs ignore the base; resolution is idempotent") {
    // two laws over generated (base, href) pairs with bounded dot depth
    // (the documented pass bounds):
    //   1. an absolute http(s) href resolves identically under ANY base
    //      — the base only matters for relative references;
    //   2. re-resolving a non-empty resolved URL (against any base) is
    //      the identity — resolved output is absolute and canonical, so
    //      a frontier can re-feed it without drift.
    import graft.ops.WebGraph
    val bases = Gen.oneOf(
      "http://a.ex/b/c/d?q=1", "HTTPS://B.EX:443/x/", "http://c.ex",
      "not a url")
    val seg = Gen.oneOf("p", "q2", ".", "..", "a.b")
    val rel = Gen.listOfN(3, seg).map(_.mkString("/"))
    val hrefs = Gen.oneOf(
      rel,
      rel.map("/" + _),
      rel.map("../" + _),
      rel.map("./" + _),
      Gen.oneOf("https://abs.ex/p/../q?id=2", "HTTP://ABS.EX:80/r", "//pr.ex/x",
        "?only=q", "#frag", "", "mailto:a@b.c"))
    val pairs = Gen.listOfN(8, Gen.zip(bases, hrefs))
    holds(Prop.forAll(pairs) { ps =>
      ps.isEmpty || {
        val df = ps.toDF("base", "href")
        val out = df
          .select(
            col("base"), col("href"),
            WebGraph.resolveUrl(col("base"), col("href")).as("r"),
            WebGraph.resolveUrl(lit("http://other.ex/z/w"), col("href"))
              .as("r_other"))
          // law 2 in the same pass: a resolved URL re-resolved against
          // itself must be itself ('' short-circuits: not a link)
          .withColumn("rr", WebGraph.resolveUrl(col("r"), col("r")))
        out.collect().forall { row =>
          val (href, r, rOther, rr) = (row.getString(1), row.getString(2),
            row.getString(3), row.getString(4))
          val absolute = href.matches("(?i)^https?://.*")
          (!absolute || r == rOther) && (r.isEmpty || rr == r)
        }
      }
    }, n = 6)
  }

  test("hostRank mass laws: every host earns at least teleport, total never exceeds unit") {
    import graft.ops.WebGraph
    val edges = Gen.listOfN(12,
      Gen.zip(Gen.choose(0, 5), Gen.choose(0, 5))
        .map { case (a, b) => (s"h$a", s"h$b") })
    holds(Prop.forAll(edges) { es =>
      es.isEmpty || {
        val ranks = WebGraph.hostRank(es.toDF("src_host", "dst_host"))
          .collect().map(_.getLong(1))
        ranks.isEmpty || {
          val n = ranks.length
          val tp = 15L * (1000000000000L / n) / 100
          ranks.forall(_ >= tp) && ranks.sum <= 1000000000000L
        }
      }
    }, n = 4)
  }

  test("exact dedup: canonical id is the min doc_id of each text group") {
    val docs = Gen.listOfN(15, Gen.zip(Gen.choose(1L, 100L), Gen.choose(0, 3)))
      .map(_.distinctBy(_._1).map { case (id, t) => (id, s"text $t") })
    holds(Prop.forAll(docs) { rows =>
      rows.isEmpty || {
        val out = Dedup.exact(rows.toDF("doc_id", "text"), "doc_id", "text")
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        val expect = rows.groupBy(_._2).values.flatMap { g =>
          val m = g.map(_._1).min; g.map(r => r._1 -> m)
        }.toMap
        out == expect
      }
    })
  }

  test("behavior laws: funnel counts non-increasing; scd2 partitions the log; paths count exact") {
    import graft.ops.{Behavior, Snapshot}
    val types = Gen.oneOf("view", "click", "purchase", "error")
    val evs = Gen.listOfN(25,
      Gen.zip(Gen.choose(1L, 5L), Gen.choose(0, 2000), types))
    holds(Prop.forAll(evs) { raw =>
      raw.isEmpty || {
        val rows = raw.zipWithIndex.map { case ((u, m, t), i) =>
          (u, new java.sql.Timestamp(1700000000000L + m * 60000L), t, i.toLong)
        }
        val df = rows.toDF("user_id", "ts", "event_type", "event_id")
        // funnel law: each step's reach is <= the previous step's
        val reach = Behavior.funnel(df, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
          .orderBy("step").collect().map(_.getLong(2))
        val monotone = reach.sliding(2).forall(w => w.length < 2 || w(0) >= w(1))
        // scd2 law: ranges PARTITION the log — per-key n_obs sums to the
        // key's row count, and valid_to chains to the next valid_from
        val ranges = Snapshot.scd2(df, "user_id", "ts", "event_id", "event_type")
          .orderBy("user_id", "version").collect()
          .map(r => (r.getLong(0), r.getTimestamp(2),
            Option(r.getTimestamp(3)), r.getLong(4)))
        val partitions = ranges.groupBy(_._1).forall { case (u, rs) =>
          rs.map(_._4).sum == rows.count(_._1 == u) &&
            rs.sliding(2).forall(w => w.length < 2 ||
              w(0)._3.contains(w(1)._2)) &&
            rs.last._3.isEmpty
        }
        // paths law: total windows = Σ_user max(0, n_events - len + 1)
        val nPaths = Behavior.paths(df, "user_id", "ts", "event_id",
          "event_type", 3).agg(sum("n")).head.get(0)
        val expectPaths = raw.groupBy(_._1).values
          .map(g => math.max(0, g.size - 2)).sum
        val pathsOk = (if (nPaths == null) 0L else nPaths.asInstanceOf[Long]) == expectPaths
        monotone && partitions && pathsOk
      }
    }, n = 4)
  }

  test("interval coverage laws: bounded by span, exact on disjoint closed blocks") {
    val gen = Gen.listOfN(15, Gen.zip(
      Gen.choose(0, 2), Gen.choose(0L, 40L), Gen.choose(0L, 15L)))
    holds(Prop.forAll(gen) { raw =>
      val rows = raw.map { case (k, s, len) => (s"k$k", s, s + len) }
      if (rows.isEmpty) true
      else {
        val out = graft.ops.Intervals.coverage(
          rows.toDF("k", "s", "e"), Seq("k"), "s", "e")
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
        rows.groupBy(_._1).forall { case (k, g) =>
          val (blocks, covered) = out(k)
          val span = g.map(_._3).max - g.map(_._2).min + 1
          // union measure: covered within [max single block, whole span],
          // block count within [1, #intervals]; exact vs a brute-force
          // point-set union (small domains make it affordable)
          val points = g.flatMap { case (_, s, e) => s to e }.toSet
          covered == points.size && blocks >= 1 && blocks <= g.size &&
            covered <= span
        }
      }
    }, n = 5)
  }

  test("rollup law: subtotals and grand total are consistent for any data") {
    val gen = Gen.listOfN(12, Gen.zip(
      Gen.oneOf("a", "b", "c"), Gen.oneOf("x", "y"), Gen.choose(-50L, 50L)))
    holds(Prop.forAll(gen) { raw =>
      if (raw.isEmpty) true
      else {
        val df = raw.toDF("d1", "d2", "v")
        val out = graft.ops.MultiDim.rollupAgg(df, Seq("d1", "d2"),
          Seq(sum(col("v")).as("total")))
          .collect().map(r =>
            (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        val grand = raw.map(_._3).sum
        val perD1 = raw.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
        out(("ALL", "ALL")) == grand &&
          perD1.forall { case (d1, s) => out((d1, "ALL")) == s } &&
          // leaf rows reproduce the plain groupBy
          raw.groupBy(t => (t._1, t._2)).forall { case ((d1, d2), g) =>
            out((d1, d2)) == g.map(_._3).sum
          }
      }
    }, n = 5)
  }

  test("winsorize laws: idempotent, count-preserving, clipped into data range") {
    val gen = Gen.listOfN(20, Gen.choose(-1000, 1000).map(_.toDouble))
    holds(Prop.forAll(gen) { vs =>
      if (vs.isEmpty) true
      else {
        val df = vs.map(("g", _)).toDF("k", "v")
        val once = graft.ops.Stats.winsorize(df, Seq("k"), "v", 0.1, 0.9)
        val clipped = once.select("v_clipped").collect().map(_.getDouble(0))
        val again = graft.ops.Stats.winsorize(
          once.select(col("k"), col("v_clipped").as("v")), Seq("k"), "v", 0.1, 0.9)
          .select("v_clipped").collect().map(_.getDouble(0))
        // thresholds are data points → output ⊆ input values; re-clipping
        // at the same percentiles is a no-op; row count preserved
        clipped.length == vs.length &&
          clipped.forall(vs.contains) &&
          clipped.sorted.sameElements(again.sorted)
      }
    }, n = 5)
  }

  test("audit law: violations never exceed rows_checked; clean data reports zero") {
    val gen = Gen.listOfN(15, Gen.zip(Gen.choose(0L, 8L), Gen.choose(-5.0, 15.0)))
    holds(Prop.forAll(gen) { raw =>
      if (raw.isEmpty) true
      else {
        val df = raw.toDF("k", "v")
        val out = graft.ops.Audit.audit(df, Seq(
          graft.ops.Audit.NotNull("k"),
          graft.ops.Audit.InRange("v", 0.0, 10.0),
          graft.ops.Audit.UniqueKey(Seq("k"))))
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        val expectedRange = raw.count { case (_, v) => v < 0.0 || v > 10.0 }
        val expectedDup = raw.groupBy(_._1).values
          .filter(_.size > 1).map(_.size).sum
        out.forall { case (_, (viol, rows)) =>
          viol >= 0 && viol <= rows && rows == raw.length
        } &&
          out.toMap.apply("range:v")._1 == expectedRange.toLong &&
          out.toMap.apply("unique:k")._1 == expectedDup.toLong
      }
    }, n = 5)
  }

  test("applyChanges batches fold associatively when versions partition") {
    // applying two change batches sequentially == applying their union,
    // provided versions are globally ordered (batch2 > batch1 > base)
    val base = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L), (4L, "d", 0L))
      .toDF("k", "state", "version")
    holds(Prop.forAll(
      Gen.listOfN(4, Gen.zip(Gen.choose(1L, 5L), Gen.oneOf("U", "D"))),
      Gen.listOfN(4, Gen.zip(Gen.choose(1L, 5L), Gen.oneOf("U", "D")))
    ) { (b1, b2) =>
      // de-dup keys within a batch (one delivery per key per batch)
      val c1 = b1.distinctBy(_._1).zipWithIndex
        .map { case ((k, op), i) => (k, s"s1_$i", 10L + k, op) }
      val c2 = b2.distinctBy(_._1).zipWithIndex
        .map { case ((k, op), i) => (k, s"s2_$i", 20L + k, op) }
      val d1 = c1.toDF("k", "state", "version", "op")
      val d2 = c2.toDF("k", "state", "version", "op")
      import graft.ops.Snapshot.applyChanges
      val seq2 = applyChanges(
        applyChanges(base, d1, "k", "version", "op"), d2, "k", "version", "op")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val once = applyChanges(base, d1.unionByName(d2), "k", "version", "op")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      seq2 == once
    }, n = 5)
  }

  test("rrfFuse: a doc present in more lists never scores below its single-list self") {
    // adding a second ranker's contribution can only RAISE a doc's score
    holds(Prop.forAll(Gen.listOfN(6, Gen.choose(1, 20))) { ranks =>
      val docs = ranks.distinct.take(4)
      if (docs.size < 2) true
      else {
        val a = docs.zipWithIndex.map { case (d, i) =>
          (1L, d.toLong, i + 1) }.toDF("query_id", "doc", "rank")
        val b = docs.reverse.zipWithIndex.map { case (d, i) =>
          (1L, d.toLong, i + 1) }.toDF("query_id", "doc", "rank")
        val both = graft.ops.Index.rrfFuse(Seq("a" -> a, "b" -> b), 60, 100)
          .collect().map(r => r.getAs[Long]("doc") ->
            (r.getAs[Long]("n_lists"), r.getAs[Double]("rrf_score"))).toMap
        val solo = graft.ops.Index.rrfFuse(
            Seq("a" -> a, "b" -> b.filter(lit(false))), 60, 100)
          .collect().map(r => r.getAs[Long]("doc") ->
            r.getAs[Double]("rrf_score")).toMap
        both.forall { case (d, (nl, sc)) =>
          nl == 2 && sc > solo(d)
        }
      }
    }, n = 5)
  }

  test("intervalOverlapJoin is symmetric: swapping sides preserves pairs and overlap") {
    import graft.ops.Joins.intervalOverlapJoin
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    holds(Prop.forAll(
      Gen.listOfN(4, Gen.zip(Gen.choose(0L, 200L), Gen.choose(1L, 100L))),
      Gen.listOfN(4, Gen.zip(Gen.choose(0L, 200L), Gen.choose(1L, 100L)))
    ) { (ls, rs) =>
      def frame(xs: List[(Long, Long)], id: String, sc: String, ec: String) =
        xs.zipWithIndex.map { case ((off, len), i) =>
          (s"$id$i", new java.sql.Timestamp(t0 + off * 3600000L),
            new java.sql.Timestamp(t0 + (off + len) * 3600000L))
        }.toDF(id, sc, ec)
      val l = frame(ls, "lid", "ls", "le")
      val r = frame(rs, "rid", "rs", "re")
      val ab = intervalOverlapJoin(l, "ls", "le", r, "rs", "re", 86400L)
        .collect().map(x => (x.getAs[String]("lid"), x.getAs[String]("rid"),
          x.getAs[Long]("overlap_us"))).toSet
      val ba = intervalOverlapJoin(r, "rs", "re", l, "ls", "le", 86400L)
        .collect().map(x => (x.getAs[String]("lid"), x.getAs[String]("rid"),
          x.getAs[Long]("overlap_us"))).toSet
      ab == ba
    }, n = 5)
  }

  test("prefixFilterPairs equals jaccardPairs for any corpus and threshold") {
    val vocab = Seq("red", "blue", "green", "fox", "dog", "cat", "runs",
      "jumps", "sleeps", "fast")
    val gen = Gen.zip(
      Gen.listOfN(8, Gen.chooseNum(4, 10).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))),
      Gen.oneOf(0.5, 0.7, 0.8))
    holds(Prop.forAll(gen) { case (texts, t) =>
      val docs = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      val sh = Dedup.shingles(docs, "doc_id", "text", 2)
      val brute = Dedup.jaccardPairs(sh, t)
        .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
      val pf = Dedup.prefixFilterPairs(sh, t)
        .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
      pf == brute
    })
  }

  test("sortedNeighborhood: widening the window only ADDS candidate pairs") {
    import graft.ops.Linkage
    val gen = Gen.listOfN(14, Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString))
    holds(Prop.forAll(gen) { keys =>
      val recs = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("doc_id", "k")
      def pairs(w: Int) = Linkage.sortedNeighborhood(
          recs, "doc_id", Seq(col("k")), window = w, blockChars = 1)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val p2 = pairs(2)
      val p3 = pairs(3)
      p2.subsetOf(p3)
    })
  }

  test("weightedPaths: one more relaxation round never worsens any cost") {
    import graft.ops.WebGraph
    val gen = Gen.listOfN(12,
      Gen.zip(Gen.choose(0, 6), Gen.choose(0, 6), Gen.choose(1L, 9L)))
    holds(Prop.forAll(gen) { triples =>
      val edges = triples.map { case (a, b, w) => (s"n$a", s"n$b", w) }
        .toDF("src_host", "dst_host", "weight")
      val seeds = Seq("n0").toDF("host")
      def dist(r: Int) = WebGraph.weightedPaths(edges, seeds, rounds = r)
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      val d2 = dist(2)
      val d3 = dist(3)
      d2.forall { case (h, c) => d3.get(h).exists(_ <= c) }
    })
  }

  test("SCC equals brute-force mutual reachability on random digraphs") {
    import graft.ops.WebGraph
    val gen = Gen.listOfN(14, Gen.zip(Gen.choose(0, 7), Gen.choose(0, 7)))
    holds(Prop.forAll(gen) { pairs =>
      val edges = pairs.map { case (a, b) => (s"n$a", s"n$b") }
        .toDF("src_host", "dst_host")
      val out = WebGraph.stronglyConnectedComponents(edges)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      // brute-force reference: Floyd-Warshall closure over ≤ 8 nodes
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
      val idx = nodes.zipWithIndex.toMap
      val n = nodes.size
      val reach = Array.fill(n, n)(false)
      pairs.foreach { case (a, b) => reach(idx(a))(idx(b)) = true }
      for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
        if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
      val expected = nodes.map { v =>
        val i = idx(v)
        val mutual = nodes.filter(u =>
          u == v || (reach(i)(idx(u)) && reach(idx(u))(i)))
        s"n$v" -> s"n${mutual.max}"
      }.toMap
      out == expected
    })
  }

  test("asofJoinForward mirrors asofJoin under time reversal") {
    import graft.ops.Joins
    val gen = Gen.zip(
      Gen.listOfN(10, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 50L))),
      Gen.listOfN(4, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 50L))))
    holds(Prop.forAll(gen) { case (lrows, rrows) =>
      // distinct (key, ts) on the right: which same-instant row wins is
      // unspecified by contract, so the law only quantifies over unique ts
      val rr = rrows.distinctBy(x => (x._1, x._2))
      val left = lrows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("event_id", "k", "ts")
      val right = rr.map { case (k, t) => (k, t, s"v$k-$t") }
        .toDF("k", "ts", "tier")
      val fwd = Joins.asofJoinForward(left, right, Seq("k"), "ts", Seq("tier"))
        .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("tier"))).toMap
      // reverse time on both sides: forward-in-reversed == backward
      val leftR = lrows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, 1000L - t) }
        .toDF("event_id", "k", "ts")
      val rightR = rr.map { case (k, t) => (k, 1000L - t, s"v$k-$t") }
        .toDF("k", "ts", "tier")
      val bwd = Joins.asofJoin(leftR, rightR, Seq("k"), "ts", Seq("tier"))
        .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("tier"))).toMap
      fwd == bwd
    })
  }

  test("series laws: constant values give ewma == value and cusum_num == 0") {
    import graft.ops.Series
    val gen = Gen.zip(Gen.choose(1, 12), Gen.choose(1L, 500L))
    holds(Prop.forAll(gen) { case (n, cents) =>
      val v = cents / 100.0
      val ev = (1 to n).map(i => ("u", i.toLong, i.toLong, v))
        .toDF("k", "t", "id", "value")
      val e = Series.ewmaLast(ev, "k", "t", "id", "value", window = 5)
        .collect().head
      val c = Series.cusumChangepoint(ev, "k", "t", "id", "value")
        .collect().head
      e.getAs[Double]("ewma") == v && c.getAs[Long]("cusum_num") == 0L
    })
  }

  test("PNG codec: decodeImage ∘ encodePng = identity for ANY pixels/dims") {
    import graft.ops.Multimodal
    val gen = for {
      w <- Gen.choose(1, 24)
      h <- Gen.choose(1, 24)
      px <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
    } yield (w, h, px.map(_.toByte).toArray)
    holds(Prop.forAll(gen) { case (w, h, rgb) =>
      val img = Multimodal.DecodedImage(w, h, rgb)
      val back = Multimodal.decodeImage(Multimodal.encodePng(img)).get
      back.width == w && back.height == h && back.rgb.sameElements(rgb)
    }, n = 20)
  }

  test("BMP/PNG cross-codec: identical pixels hash and embed identically") {
    import graft.ops.Multimodal
    val gen = for {
      w <- Gen.choose(8, 20)
      h <- Gen.choose(8, 20)
      px <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
    } yield (w, h, px.map(_.toByte).toArray)
    holds(Prop.forAll(gen) { case (w, h, rgb) =>
      val img = Multimodal.DecodedImage(w, h, rgb)
      val df = Seq(
        (1L, Multimodal.encodeBmp(img)),
        (2L, Multimodal.encodePng(img))).toDF("doc_id", "media")
      val a = Multimodal.imageAHash(df, "doc_id", "media")
        .collect().map(r => r.doc_id -> r.ahash).toMap
      val e = Multimodal.imageEmbedding(df, "doc_id", "media")
        .collect().map(r => r.doc_id -> r.embedding.toSeq).toMap
      a(1L) == a(2L) && e(1L) == e(2L)
    }, n = 10)
  }

  test("pcmResample to the same length is the identity; resample preserves peak bound") {
    import graft.ops.Multimodal
    val gen = for {
      n <- Gen.choose(1, 200)
      ss <- Gen.listOfN(n, Gen.choose(-32768, 32767))
    } yield ss.map(_.toShort).toArray
    holds(Prop.forAll(gen) { samples =>
      val wav = Multimodal.pcm16Wav(8000L, samples)
      val df = Seq((1L, wav)).toDF("doc_id", "media")
      val same = Multimodal.pcmResample(df, "doc_id", "media",
        targetN = samples.length).head()
      val idOk = Multimodal.pcmStats(
        Seq((1L, same.media)).toDF("doc_id", "media"), "doc_id", "media")
        .head() == Multimodal.pcmStats(df, "doc_id", "media").head()
      // any resample only SELECTS source samples: peak can never grow
      val down = Multimodal.pcmResample(df, "doc_id", "media",
        targetN = math.max(1, samples.length / 2)).head()
      val peakSrc = Multimodal.pcmStats(df, "doc_id", "media").head().peak
      val peakDown = Multimodal.pcmStats(
        Seq((1L, down.media)).toDF("doc_id", "media"), "doc_id", "media")
        .head().peak
      idOk && peakDown <= peakSrc
    }, n = 10)
  }

  private def smooth(w: Int, h: Int): graft.ops.Multimodal.DecodedImage = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      rgb(i) = (40 + (160 * x) / w).toByte
      rgb(i + 1) = (40 + (160 * y) / h).toByte
      rgb(i + 2) = (40 + (80 * (x + y)) / (w + h)).toByte
    }
    graft.ops.Multimodal.DecodedImage(w, h, rgb)
  }

  test("every byte parser is total: arbitrary bytes never throw, truncations never throw") {
    import graft.ops.Multimodal
    // the containers' totality contract — a web-scale lake WILL deliver
    // garbage, and a parser that throws kills the whole partition task.
    val parsers: Seq[(String, Array[Byte] => Any)] = Seq(
      ("parseImageHeader", Multimodal.parseImageHeader _),
      ("decodeImageIO", Multimodal.decodeImageIO _),
      ("decodeBmp", Multimodal.decodeBmp _),
      ("decodeImage", Multimodal.decodeImage _),
      ("decodeImageOriented", Multimodal.decodeImageOriented _),
      ("parseExifOrientation", Multimodal.parseExifOrientation _),
      ("parseAviMjpegFrames", Multimodal.parseAviMjpegFrames _),
      ("parseWavHeader", Multimodal.parseWavHeader _),
      ("parseY4mHeader", Multimodal.parseY4mHeader _),
      ("parseFlacHeader", Multimodal.parseFlacHeader _),
      ("flacDecode", Multimodal.flacDecode _),
      ("flacDecodeStereo", Multimodal.flacDecodeStereo _),
      ("decodePcm16Mono", Multimodal.decodePcm16Mono _),
      ("decodePcm16Stereo", Multimodal.decodePcm16Stereo _),
      ("parseMp3Header", Multimodal.parseMp3Header _),
      ("parseOpusHead", Multimodal.parseOpusHead _),
      ("parseMp4Header", Multimodal.parseMp4Header _),
      ("parseMp4Tracks", Multimodal.parseMp4Tracks _),
      ("parseTarMembers", Multimodal.parseTarMembers _),
      ("gunzip", (b: Array[Byte]) => Multimodal.gunzip(b)),
      ("parseZipMembers", (b: Array[Byte]) => Multimodal.parseZipMembers(b)))
    val junk = Gen.oneOf(
      Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray),
      // magic-prefixed junk: right signature, garbage body
      Gen.zip(
        Gen.oneOf("RIFF", "BM", "PNG", "ÿØÿ", "GIF89a",
          "YUV4MPEG2", "PK", "fLaC", "OggS", ""),
        Gen.listOf(Gen.choose(0, 255))).map { case (m, tail) =>
        m.getBytes("ISO-8859-1") ++ tail.map(_.toByte) })
    holds(Prop.forAll(junk) { bytes =>
      parsers.forall { case (name, p) =>
        try { p(bytes); p(null); true }
        catch { case e: Throwable =>
          println(s"$name threw ${e.getClass.getSimpleName} on ${bytes.take(20).toSeq}")
          false
        }
      }
    }, n = 60)
    // real containers truncated at EVERY prefix length must not throw
    val real = Seq(
      Multimodal.encodePng(smooth(9, 7)),
      Multimodal.encodeJpeg(smooth(9, 7)),
      Multimodal.jpegWithExif(smooth(9, 7), 6),
      Multimodal.encodeBmp(smooth(9, 7)),
      Multimodal.aviMjpeg(8, 8, Seq("frame".getBytes)),
      Multimodal.pcm16Wav(8000L, Array[Short](1, -2, 3)),
      Multimodal.encodeTiff(smooth(9, 7)),
      Multimodal.tarArchive(Seq(("a.txt", "hello".getBytes))),
      Multimodal.mp4WithTracks("isom", 600, 1200, Seq(
        Multimodal.Mp4TrackSpec(1, 32, 16, 1000, 300,
          Seq((3L, 100L)), Seq(1L, 3L)))),
      Multimodal.flacEncode(8000L,
        Array.tabulate(200)(i => ((i * 37) % 995 - 497).toShort), 64),
      Multimodal.flacEncodeStereo(8000L,
        Array.tabulate(120)(i => ((i * 31) % 801 - 400).toShort),
        Array.tabulate(120)(i => ((i * 53) % 601 - 300).toShort),
        48, "mid-side"))
    real.foreach { full =>
      (0 to full.length by math.max(1, full.length / 23)).foreach { cut =>
        val b = full.take(cut)
        parsers.foreach { case (_, p) => p(b) }
      }
    }
  }

  test("AVI-MJPEG demux is the inverse of the writer for ANY frame payloads") {
    import graft.ops.Multimodal
    val gen = for {
      nf <- Gen.choose(0, 6)
      frames <- Gen.listOfN(nf, Gen.nonEmptyListOf(Gen.choose(0, 255))
        .map(_.map(_.toByte).toArray))
    } yield frames
    holds(Prop.forAll(gen) { frames =>
      val avi = Multimodal.aviMjpeg(32, 24, frames)
      Multimodal.parseAviMjpegFrames(avi) match {
        case Some((32, 24, back)) =>
          back.length == frames.length &&
            frames.zip(back).forall { case (a, b) => a.sameElements(b) }
        case _ => false
      }
    }, n = 20)
  }
}
