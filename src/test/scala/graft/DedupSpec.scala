package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity, TextAnalysis}

class DedupSpec extends SparkTestBase {
  import testImplicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup of 1
    (4L, "completely different content with other words here entirely")
  ).toDF("doc_id", "text")

  test("exact: dup docs share canonical id = min doc_id") {
    val out = Dedup.exact(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L, 3L, 4L))
  }

  test("shingles: n-3 + 1 distinct word trigrams, short docs yield none") {
    val sh = Dedup.shingles(docs.limit(1), "doc_id", "text", 3)
    assert(sh.count() == 7) // 9 words -> 7 trigrams, all distinct
    val short = Seq((9L, "two words")).toDF("doc_id", "text")
    assert(Dedup.shingles(short, "doc_id", "text", 3).count() == 0)
  }

  test("jaccardPairs: identical docs → jaccard 1.0; near dups found; unrelated absent") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val pairs = Dedup.jaccardPairs(sh, 0.0).orderBy("doc_a", "doc_b").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) > 0.3 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.contains((1L, 4L))) // no shared shingle at all
  }

  test("capDocFrequency drops hot shingles") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val capped = Dedup.capDocFrequency(sh, 1)
    // shingles shared by docs 1,2,3 (df 2-3) are gone; distinct ones stay
    assert(capped.count() < sh.count())
    assert(capped.groupBy("shingle").count().agg(max("count")).head().getLong(0) == 1L)
  }

  test("jaccardDedup (production, capped): boilerplate shingle can't create pairs, true dups survive") {
    // two real near-dups + two unrelated docs sharing only a boilerplate footer
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon COPYRIGHT ACME CORP"),
      (2L, "alpha beta gamma delta zeta COPYRIGHT ACME CORP"),
      (3L, "one two three four five six COPYRIGHT ACME CORP"),
      (4L, "seven eight nine ten eleven twelve COPYRIGHT ACME CORP")
    ).toDF("doc_id", "text")
    // uncapped: the footer trigram links everything
    val uncapped = Dedup.jaccardDedup(corpus, "doc_id", "text", threshold = 0.0, maxDf = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((3L, 4L))) // boilerplate-only pair
    // capped at df<=2: footer shingles (df=4) drop; the near-dup pair remains
    val capped = Dedup.jaccardDedup(corpus, "doc_id", "text", threshold = 0.0, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((1L, 2L)))
    assert(!capped.contains((3L, 4L)))
  }

  test("minhashDedupCapped: end-to-end over raw docs") {
    val out = Dedup.minhashDedupCapped(docs, "doc_id", "text", threshold = 0.3, maxDf = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)))
  }

  test("minhashDedup: finds exact+near dup pairs above threshold") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val out = Dedup.minhashDedup(sh, 0.3).orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L))) // identical signature: always a candidate
  }

  test("simhash64Bands: four 16-bit bands, identical text → identical fingerprint") {
    val fp = Dedup.simhash64Bands(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getInt)).toMap
    assert(fp.values.forall(_.forall(b => b >= 0 && b <= 0xFFFF)))
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(4L))
  }

  test("simhashPairs: banding finds every pair within maxHamming (pigeonhole)") {
    val fp = Dedup.simhash64Bands(docs, "doc_id", "text")
    val pairs = Dedup.simhashPairs(fp, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // identical docs 1/2: hamming 0, must surface through a shared band
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
    // equivalence vs the all-pairs spec at maxHamming <= bands-1 = 3
    val raw = fp.collect().map(r => r.getLong(0) -> (1 to 4).map(r.getInt)).toMap
    val all = (for {
      a <- raw.keys; b <- raw.keys if a < b
      h = raw(a).zip(raw(b)).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      if h <= 3
    } yield (a, b, h)).toSet
    assert(pairs == all)
  }

  test("simhash16: identical text → identical fingerprint, 16 bits") {
    val fp = Dedup.simhash16(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp.values.forall(s => s.length == 16 && s.forall(c => c == '0' || c == '1')))
    assert(fp(1L) != fp(4L)) // different content: different fingerprint
  }

  test("blockedNearDupPairs: identical vectors cosine ~ 1 within block") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f), 0), (4L, Seq(1.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val pairs = Similarity.blockedNearDupPairs(emb, "vec_id", "embedding", "label", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L))) // 3 orthogonal; 4 in another block
  }

  test("PII: counts find each pattern, redaction order keeps placeholders clean") {
    val df = Seq(
      (1L, "reach me at jo.doe+spam@mail-host.org or 555-123-4567"),
      (2L, "server 192.168.0.1 and 10.0.0.255 no phone"),
      (3L, "clean text without any identifiers at all")
    ).toDF("doc_id", "text")
    val out = df.select(
      col("doc_id"),
      TextAnalysis.countMatches(col("text"), TextAnalysis.EmailPattern).as("e"),
      TextAnalysis.countMatches(col("text"), TextAnalysis.PhonePattern).as("p"),
      TextAnalysis.countMatches(col("text"), TextAnalysis.Ipv4Pattern).as("i"),
      TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 1 && out(1L)._3 == 0)
    assert(out(1L)._4 == "reach me at <EMAIL> or <PHONE>")
    assert(out(2L)._3 == 2)
    assert(out(2L)._4 == "server <IP> and <IP> no phone")
    assert(out(3L)._4 == "clean text without any identifiers at all")
  }

  test("semanticDedup: within-cluster near-dups canonicalize to the min id, clusters isolate") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),  // centroid 0 (x-axis)
      (1L, Seq(0.0f, 1.0f)),  // centroid 1 (y-axis)
      (10L, Seq(0.99f, 0.01f)), (11L, Seq(0.98f, 0.02f)), // x cluster near-dups
      (20L, Seq(0.3f, 0.95f)),  // y cluster, below threshold of everything
      (21L, Seq(0.9f, 0.44f))   // x cluster but NOT near-dup of anything
    ).toDF("vec_id", "embedding")
    val corpus = Similarity.withNorm(emb, "vec_id", "embedding")
    val centroids = corpus.filter(col("vec_id") < 2)
    val out = Similarity.semanticDedup(corpus, centroids, threshold = 0.995)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("canonical_id"), r.getAs[Boolean]("is_kept"))).toMap
    // 0/10/11 are mutual near-dups in the x cluster: all canonicalize to 0
    assert(out(10L) == (0L, false) && out(11L) == (0L, false))
    assert(out(0L) == (0L, true))
    // 20 shares a cluster with 1 but sits below threshold -> kept
    assert(out(20L) == (20L, true) && out(1L) == (1L, true))
    // 21 is in the x cluster but not within threshold of its members
    assert(out(21L) == (21L, true))
    // total map over the corpus
    assert(out.size == 6)
  }

  test("fingerprint: normalization collapses case/punct/whitespace") {
    val df = Seq("Hello,  World!", "hello world").toDF("t")
      .select(TextAnalysis.fingerprint(col("t")).as("f"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("repetitionMetrics: duplicate words and repeated bigrams flagged") {
    val df = Seq(
      (1L, "spam spam spam spam"),          // degenerate repetition
      (2L, "all words here are different"), // clean text
      (3L, "one")                           // < 2 words: no bigram
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup_word_frac"), r.getAs[Double]("top_bigram_frac"))).toMap
    assert(m(1L) == (0.75, 1.0)) // 1 distinct of 4; "spam spam" fills all 3 slots
    assert(m(2L) == (0.0, 0.25))
    assert(m(3L) == (0.0, 0.0))  // total operator: short docs still present
  }

  test("incrementalMinhash: new-batch pairs only, corpus-internal dups not re-emitted") {
    val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
    val long = "the quick brown fox jumps over the lazy dog again and again today"
    // corpus holds an internal dup pair (6,7) that must NOT re-surface
    val dupText = "an old corpus internal duplicate sentence sitting quietly in the archive"
    val corpus = mk(Seq(1L -> long, 2L -> "completely different words here entirely",
      6L -> dupText, 7L -> dupText))
    val corpusSh = Dedup.shingles(corpus, "doc_id", "text", 3)
    val index = Dedup.lshBands(Dedup.minhashSignatures(corpusSh, 16), 4, 4)
    // new batch: 10 dups corpus doc 1; 11/12 are new-new dups; 13 is novel
    val newSh = Dedup.shingles(mk(Seq(10L -> long, 11L -> "brand new content never seen before in this corpus at all",
      12L -> "brand new content never seen before in this corpus at all",
      13L -> "nothing shared with anything else whatsoever in any way")), "doc_id", "text", 3)
    val pairs = Dedup.incrementalMinhash(index, corpusSh, newSh, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 10L), (11L, 12L))) // (6,7) absent: O(batch), not O(corpus)

    // the bucketed exchange-free serving path lands on the same answer
    // through the write/read round trip of BOTH persisted artifacts
    val wh = java.nio.file.Files.createTempDirectory("minhash-bucketed")
    Dedup.writeMinhashIndexBucketed(index, "t_mbidx", s"$wh/i", 4)
    Dedup.writeShingleStoreBucketed(corpusSh, "t_mbsh", s"$wh/s", 4)
    try {
      val bucketed = Dedup
        .incrementalMinhashBucketed(spark, "t_mbidx", "t_mbsh", newSh, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bucketed == pairs,
        "bucketed incremental minhash diverged from the shuffled path")
    } finally {
      spark.sql("DROP TABLE t_mbidx")
      spark.sql("DROP TABLE t_mbsh")
    }
  }

  test("contamination: overlap threshold flags docs sharing benchmark shingles") {
    val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
    val bench = Dedup.shingles(
      mk(Seq(1L -> "what is the capital of france paris obviously")), "doc_id", "text", 3)
    val corpus = Dedup.shingles(mk(Seq(
      10L -> "trivia time what is the capital of france everyone knows", // 4 shared
      11L -> "the capital of germany is berlin not paris",               // 1 shared
      12L -> "entirely unrelated sentence with no benchmark overlap")),  // 0 shared
      "doc_id", "text", 3)
    val flagged = Dedup.contamination(corpus, bench, minOverlap = 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_overlap")).toMap
    assert(flagged.keySet == Set(10L))
    assert(flagged(10L) == 4L) // "what is the", "is the capital", "the capital of", "capital of france"
  }

  test("connectedComponents: chains merge transitively, singletons self-label") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // 1-2-3 is a CHAIN (diameter 2): label 1 must reach 3 through 2,
    // proving the loop iterates past the first round
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(nodes, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("connectedComponents: fails loudly instead of returning non-converged labels") {
    val nodes = (1L to 8L).toDF("doc_id")
    val chain = (1L to 7L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException](
      Dedup.connectedComponents(nodes, chain, maxIter = 2).collect())
    // ...and converges fine when maxIter covers the diameter
    val ok = Dedup.connectedComponents(nodes, chain, maxIter = 10).collect()
    assert(ok.forall(_.getAs[Long]("cluster_id") == 1L))
  }

  test("connectedComponents: pointer jumping closes a diameter-64 chain in O(log d) rounds") {
    // 65-node path graph, diameter 64. Plain min-label propagation needs
    // ~64 rounds (label 1 crawls one hop per round); pointer jumping doubles
    // the reach per round, so convergence must land in ~log2(64)+2 = 8
    // rounds. The bound (<=9, one round of slack over the measured 8) is the
    // regression tripwire for dropping the jump join: without it this graph
    // blows straight past maxIter.
    val nodes = (1L to 65L).toDF("doc_id")
    val chain = (1L to 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(nodes, chain, maxIter = 12)
    assert(labels.collect().forall(_.getAs[Long]("cluster_id") == 1L))
    assert(rounds <= 9, s"pointer jump regressed: $rounds rounds for diameter 64")
  }

  test("dupClusters: total map over the corpus with cluster sizes") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.dupClusters(nodes, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"))).toMap
    assert(out(3L) == (1L, 3L) && out(5L) == (4L, 2L) && out(6L) == (6L, 1L))
    // the curation keep-rule: exactly one canonical doc per cluster
    assert(out.count { case (id, (cl, _)) => id == cl } == 3)
  }

  test("keepCanonical: best-by-score survives, ties break by doc_id, singletons kept") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val clusters = Dedup.dupClusters(nodes, pairs)
    // cluster {1,2,3}: doc 3 has the best score (NOT the min-id member);
    // cluster {4,5}: tie on score → smaller doc_id 4 wins; 6 is a singleton
    val scores = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 7L), (5L, 7L),
      (6L, 1L)).toDF("doc_id", "quality")
    val out = Dedup.keepCanonical(clusters, scores, "quality").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Long]("n_dropped"))).toMap
    assert(out.keySet == Set(3L, 4L, 6L))
    assert(out(3L) == (1L, 3L, 2L))
    assert(out(4L) == (4L, 2L, 1L))
    assert(out(6L) == (6L, 1L, 0L))
  }

  test("degenerate LSH geometry fails loudly, never silently goes all-pairs") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    // bands > numHashes → rowsPerBand 0 → every band key identical →
    // the corpus-squared candidate join; must be rejected at plan time
    intercept[IllegalArgumentException] {
      Dedup.minhashDedup(sh, 0.8, numHashes = 16, bands = 32)
    }
    // non-divisible geometry would silently drop trailing hashes
    intercept[IllegalArgumentException] {
      Dedup.minhashDedup(sh, 0.8, numHashes = 16, bands = 5)
    }
  }

  test("spanDedup: shared spans drop from every doc, unique spans survive in order") {
    // Docs 1 and 2 share the span "x y z" (boilerplate); doc 3 is clean.
    val docs = Seq(
      (1L, "x y z a b c"),
      (2L, "x y z d e f"),
      (3L, "g h i j k l")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", span = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_dropped"), r.getAs[String]("clean_text")))
    assert(out(0) == ((1L, 2L, 1L, "a b c")))
    assert(out(1) == ((2L, 2L, 1L, "d e f")))
    assert(out(2) == ((3L, 2L, 0L, "g h i j k l")))
  }

  test("spanDedup: a doc made entirely of shared spans empties to ''") {
    val docs = Seq(
      (1L, "x y z"), (2L, "x y z"), (3L, "x y z p q")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", span = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean_text") == "")
    assert(out(1).getAs[String]("clean_text") == "")
    // doc 3's tail span "p q" (partial) is unique and survives
    assert(out(2).getAs[String]("clean_text") == "p q")
  }

  test("spanDedup: within-doc repetition alone is not cross-doc duplication") {
    // The same span twice in ONE doc: n_docs = 1 < minDocs, kept.
    val docs = Seq((1L, "x y z x y z"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", span = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_dropped") == 0L)
    assert(out(0).getAs[String]("clean_text") == "x y z x y z")
  }

  test("spanDedup: total over the corpus, invariant to partitioning") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Dedup.spanDedup(docs, "doc_id", "text", span = 3)
      .orderBy("doc_id").collect()
    val b = Dedup.spanDedup(docs.repartition(7), "doc_id", "text", span = 3)
      .orderBy("doc_id").collect()
    assert(a.length == docs.count())
    assert(a.toSeq == b.toSeq)
  }

  test("sharedSpans: planted run localized, length includes shingle width") {
    // docs 1 and 2 share the 5-word run "p q r s t" (3 shared 3-gram
    // starts -> one span of 3+2 = 5 tokens); doc 3 shares nothing
    val docs = Seq(
      (1L, "a b p q r s t c d"),
      (2L, "x y z p q r s t w"),
      (3L, "m n o u v k j h g")
    ).toDF("doc_id", "text")
    val out = graft.ops.Dedup.sharedSpans(docs, "doc_id", "text", n = 3, maxDf = 10)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("n_shared") == 3L)
    assert(r.getAs[Long]("n_spans") == 1L)
    assert(r.getAs[Long]("longest_span_tokens") == 5L)
    // two DISJOINT planted runs -> two spans
    val two = Seq(
      (1L, "p q r x x x s t u"),
      (2L, "p q r y y y s t u")
    ).toDF("doc_id", "text")
    val r2 = graft.ops.Dedup.sharedSpans(two, "doc_id", "text", 3, 10)
      .collect().head
    assert(r2.getAs[Long]("n_spans") == 2L)
    assert(r2.getAs[Long]("longest_span_tokens") == 3L)
  }

  test("prefixFilterPairs: identical output to jaccardPairs at every threshold") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the sleepy dog"),
      (4L, "a quick brown fox leaps over the lazy dog"),
      (5L, "completely different content with other words here entirely"),
      (6L, "different content with other words here entirely now")
    ).toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.7, 0.8, 1.0); n <- Seq(2, 3)) {
      val sh = Dedup.shingles(corpus, "doc_id", "text", n)
      val brute = Dedup.jaccardPairs(sh, t).orderBy("doc_a", "doc_b")
        .collect().map(_.toSeq).toSeq
      val pf = Dedup.prefixFilterPairs(sh, t).orderBy("doc_a", "doc_b")
        .collect().map(_.toSeq).toSeq
      assert(pf == brute, s"threshold $t shingle-$n: prefix filter diverged")
    }
  }

  test("prefixFilterPairs: prefix index is smaller than the full inverted index") {
    // at t=0.8 each doc indexes only ~20% of its tokens + 1 — the whole
    // point of the operator; assert the pruning actually happens
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val full = sh.count()
    // re-derive the prefix length bound: every doc with n shingles
    // contributes n - ceil(0.8 n) + 1 prefix rows
    val exp = sh.groupBy("doc_id").count().collect()
      .map(r => r.getLong(1) - math.ceil(0.799999 * r.getLong(1)).toLong + 1)
      .sum
    assert(exp < full, "fixture too small to demonstrate pruning")
  }

  test("lshRecallSampled: frac=1 converges to the exact full-audit recall") {
    // the q309 convergence law: with the stratum = the whole corpus the
    // sampled estimator must reproduce q302's exact counts bit-for-bit
    val real = graft.core.Lake(spark, sfDir).documents
    val sh = Dedup.shingles(real, "doc_id", "text", 3)
    val truth = Dedup.jaccardPairs(sh, 0.8).select("doc_a", "doc_b")
    val cand = Dedup.lshCandidates(
      Dedup.lshBands(Dedup.minhashSignatures(sh), 4, 4))
    val nTruth = truth.count()
    val nHit = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi").count()
    assert(nTruth > 0, "fixture has no truth pairs — law would be vacuous")
    val r = Dedup.lshRecallSampled(real, "doc_id", "text", frac = 1.0,
      threshold = 0.8, salt = "audit").head()
    assert(r.getAs[Long]("n_stratum_docs") == real.count())
    assert(r.getAs[Long]("n_truth") == nTruth)
    assert(r.getAs[Long]("n_hit") == nHit)
    assert(r.getAs[Double]("recall") == nHit.toDouble / nTruth)
  }

  /** 10 disjoint-vocabulary base docs (20 words each) + a last-word
    * variant of each: the pair's shingle Jaccard is 17/19 ≈ 0.895 ≥ 0.8
    * (the last word lives in exactly one trigram), and no cross-base
    * pair shares a shingle — exactly 10 truth pairs. */
  private def missCorpus = {
    val rows = (0 until 10).flatMap { b =>
      val words = (0 until 20).map(i => s"w${b}_$i")
      Seq((b * 2L, words.mkString(" ")),
        (b * 2L + 1L, (words.init :+ s"alt$b").mkString(" ")))
    }
    rows.toDF("doc_id", "text")
  }

  test("lshRecallSampled: misses are measured, CI ordered, output deterministic") {
    // one band of 16 rows = candidates need the FULL signature equal;
    // at jaccard 0.895 most truth pairs miss — the estimator must SAY so
    val r = Dedup.lshRecallSampled(missCorpus, "doc_id", "text", frac = 1.0,
      threshold = 0.8, numHashes = 16, bands = 1, rowsPerBand = 16).head()
    assert(r.getAs[Long]("n_truth") == 10L)
    val hit = r.getAs[Long]("n_hit")
    assert(r.getAs[Long]("n_missed") == 10L - hit)
    assert(hit < 10L, "harsh geometry expected to miss at least one pair")
    assert(r.getAs[Double]("recall") == hit.toDouble / 10.0)
    val lo = r.getAs[Double]("boot_lo")
    val hi = r.getAs[Double]("boot_hi")
    assert(lo >= 0.0 && lo <= hi && hi <= 1.0)
    // bootstrap draws are md5-indexed — a rerun is bit-identical
    val again = Dedup.lshRecallSampled(missCorpus, "doc_id", "text",
      frac = 1.0, threshold = 0.8, numHashes = 16, bands = 1,
      rowsPerBand = 16).head()
    assert(again.toSeq == r.toSeq)
  }

  test("contaminationRateSampled: frac=1 equals the exact flag census; CI ordered; empty → 0") {
    val docs = graft.core.Lake(spark, sfDir).documents
    val corpus = docs.filter(col("doc_id") >= 20)
    val bench = docs.filter(col("doc_id") < 20)
    // exact census via the production operator
    val nCorpus = corpus.count()
    val nFlagged = Dedup.contamination(
      Dedup.shingles(corpus, "doc_id", "text", 3),
      Dedup.shingles(bench, "doc_id", "text", 3), minOverlap = 2).count()
    val r = Dedup.contaminationRateSampled(
      corpus, bench, "doc_id", "text", frac = 1.0).head()
    assert(r.getAs[Long]("n_stratum_docs") == nCorpus)
    assert(r.getAs[Long]("n_flagged") == nFlagged)
    assert(r.getAs[Double]("contamination_rate") == nFlagged.toDouble / nCorpus)
    val lo = r.getAs[Double]("boot_lo"); val hi = r.getAs[Double]("boot_hi")
    assert(lo >= 0.0 && lo <= hi && hi <= 1.0)
    // determinism: bit-identical rerun
    val again = Dedup.contaminationRateSampled(
      corpus, bench, "doc_id", "text", frac = 1.0).head()
    assert(again.toSeq == r.toSeq)
    // sub-unit stratum audits a strict subset
    val half = Dedup.contaminationRateSampled(
      corpus, bench, "doc_id", "text", frac = 0.5, salt = "s2").head()
    val nd = half.getAs[Long]("n_stratum_docs")
    assert(nd > 0L && nd < nCorpus)
    // empty corpus: rate convention 0.0, CI collapses to 0.0
    val empty = Dedup.contaminationRateSampled(
      corpus.filter(col("doc_id") < 0), bench, "doc_id", "text", frac = 0.5)
      .head()
    assert(empty.getAs[Long]("n_stratum_docs") == 0L)
    assert(empty.getAs[Double]("contamination_rate") == 0.0)
    assert(empty.getAs[Double]("boot_lo") == 0.0)
    assert(empty.getAs[Double]("boot_hi") == 0.0)
  }

  test("tuningReport: census monotone in the cutoff, recall bounded, arms consistent") {
    val docs = graft.core.Lake(spark, sfDir).documents
    val rows = Dedup.tuningReport(docs, "doc_id", "text", frac = 1.0,
      thresholdPcts = Seq(70, 80, 90))
      .orderBy("threshold_pct").collect()
    assert(rows.length == 3)
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    val dups = rows.map(_.getAs[Long]("docs_in_dups"))
    val maxSz = rows.map(_.getAs[Long]("max_cluster_size"))
    // raising the cutoff can only REMOVE edges
    assert(pairs.sliding(2).forall(p => p(0) >= p(1)), s"pairs not monotone: ${pairs.toSeq}")
    assert(dups.sliding(2).forall(p => p(0) >= p(1)), s"dups not monotone: ${dups.toSeq}")
    assert(maxSz.sliding(2).forall(p => p(0) >= p(1)), s"max size not monotone: ${maxSz.toSeq}")
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_pairs"))
    }
    // the fused frame must agree with the standalone recall audit at the
    // same geometry/stratum: tuningReport's 80-arm vs lshRecallSampled
    val r80 = rows.find(_.getAs[Long]("threshold_pct") == 80L).get
    val solo = Dedup.lshRecallSampled(docs, "doc_id", "text", frac = 1.0,
      threshold = 0.8).head()
    assert(r80.getAs[Long]("n_pairs") == solo.getAs[Long]("n_truth"))
    assert(r80.getAs[Long]("n_hit") == solo.getAs[Long]("n_hit"))

    // empty stratum: the one-row-per-cutoff contract holds with explicit
    // zeros (not NULLs), mirroring the lshRecallSampled /
    // contaminationRateSampled empty-case conventions
    val emptyRows = Dedup.tuningReport(
      docs.filter(col("doc_id") < 0), "doc_id", "text", frac = 0.5,
      thresholdPcts = Seq(70, 90)).orderBy("threshold_pct").collect()
    assert(emptyRows.length == 2)
    emptyRows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == 0L)
      assert(r.getAs[Long]("docs_in_dups") == 0L)
      assert(r.getAs[Long]("n_clusters") == 0L)
      assert(r.getAs[Long]("max_cluster_size") == 0L)
      assert(r.getAs[Long]("n_hit") == 0L)
      assert(r.getAs[Double]("recall") == 1.0) // 0-of-0: vacuous recall
    }
  }

  test("simhashIncremental equals the full recompute restricted to new-involving pairs") {
    // random-ish 4x16-bit fingerprints with planted collisions: ids
    // sharing id % 9 share a fingerprint class; some classes perturbed
    def fp(ids: Seq[Long]) = ids.map { id =>
      val k = id % 9
      val base = Array.tabulate(4)(b => (k * 7919L + b * 104729L) % 65536L)
      // even docs flip one low bit in band 2 → hamming-1 neighbors exist
      // within a class (9 is odd, so id % 9 classes mix both parities)
      if (id % 2 == 0) base(2) = base(2) ^ 1L
      (id, base(0), base(1), base(2), base(3))
    }.toDF("doc_id", "b0", "b1", "b2", "b3")
    val index = fp(40L until 140L)
    val fresh = fp(0L until 40L)
    val inc = Dedup.simhashIncremental(fresh, index, maxHamming = 2)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Dedup.simhashPairs(fresh.unionByName(index), maxHamming = 2)
      .filter(col("doc_a") < 40 || col("doc_b") < 40)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == full, "incremental path diverged from the full recompute")
    assert(inc.nonEmpty, "fixture must produce pairs or the law is vacuous")
    // no corpus-internal pair leaks through
    assert(inc.forall { case (a, b, _) => a < 40 || b < 40 })
    // both exact (hamming 0) and near (hamming >= 1) pairs occur
    assert(inc.exists(_._3 == 0L) && inc.exists(_._3 >= 1L))

    // the bucketed exchange-free serving path lands on the SAME answer
    // through the write/read round trip (PlanSpec pins the plan shape)
    val wh = java.nio.file.Files.createTempDirectory("dedup-bucketed")
    Dedup.writeSimhashIndexBucketed(index, "t_bidx", s"$wh/i", 4)
    Dedup.writeSimhashIndexBucketed(fresh, "t_bbat", s"$wh/b", 4)
    try {
      val bucketed = Dedup
        .simhashIncrementalBucketed(spark, "t_bbat", "t_bidx", maxHamming = 2)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(bucketed == full,
        "bucketed incremental path diverged from the full recompute")
    } finally {
      spark.sql("DROP TABLE t_bidx")
      spark.sql("DROP TABLE t_bbat")
    }
  }

  test("lshRecallSampled: sub-unit stratum audits a strict subset") {
    val r = Dedup.lshRecallSampled(missCorpus, "doc_id", "text", frac = 0.5,
      threshold = 0.8, salt = "s1").head()
    val nd = r.getAs[Long]("n_stratum_docs")
    assert(nd > 0L && nd < 20L)
    // truth pairs need BOTH endpoints sampled — at most the full 10
    assert(r.getAs[Long]("n_truth") <= 10L)
    // empty-stratum degenerate form: recall convention 1.0, CI collapses
    val empty = Dedup.lshRecallSampled(
      missCorpus.filter(col("doc_id") < 0), "doc_id", "text", frac = 0.5)
      .head()
    assert(empty.getAs[Long]("n_truth") == 0L)
    assert(empty.getAs[Double]("recall") == 1.0)
    assert(empty.getAs[Double]("boot_lo") == 1.0)
    assert(empty.getAs[Double]("boot_hi") == 1.0)
  }
}
