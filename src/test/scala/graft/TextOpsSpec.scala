package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.{Classifier, Curation, Index, LanguageModel, TextAnalysis}

/** Unit tests for the round-4 text operators: inverted index, hashed
  * linear classifier, Unicode normalization, bigram LM scoring. */
class TextOpsSpec extends SparkTestBase {
  import testImplicits._

  // ------------------------------------------------------------ Index

  test("Index.postings: one row per (term, doc) with the term frequency") {
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val p = Index.postings(docs, "doc_id", "text")
      .orderBy("term", "doc")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(p.toSeq == Seq(("a", 1L, 2L), ("b", 1L, 1L), ("b", 2L, 1L),
      ("c", 2L, 1L)))
  }

  test("Index.invertedIndex: df/cf and tf-ranked posting heads, doc tiebreak") {
    val docs = Seq(
      (1L, "x x x y"), (2L, "x y y"), (3L, "x"), (4L, "x x")
    ).toDF("doc_id", "text")
    val idx = Index.invertedIndex(docs, "doc_id", "text", k = 2)
      .orderBy("term")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // x: tf 3(d1), 1(d2), 1(d3), 2(d4) → top2 = 1,4; y: tf 1(d1), 2(d2)
    assert(idx.toSeq == Seq(
      ("x", 4L, 7L, "1,4"),
      ("y", 2L, 3L, "2,1")))
  }

  test("Index.invertedIndex: ties rank by ascending doc id") {
    val docs = Seq((5L, "t"), (3L, "t"), (9L, "t")).toDF("doc_id", "text")
    val idx = Index.invertedIndex(docs, "doc_id", "text", k = 2).collect()
    assert(idx.head.getString(3) == "3,5")
  }

  // ------------------------------------------------------- Classifier

  test("Classifier: margin is an exact integer-tenths sum, keep at >= 0") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta")).toDF("doc_id", "text")
    val out = Classifier.hashedLinearScore(docs, "text", dim = 64, biasTenths = 0)
      .select("doc_id", "score", "keep").orderBy("doc_id").collect()
    out.foreach { r =>
      val score = r.getDouble(1)
      // every score is an integer number of tenths
      assert((score * 10).round / 10.0 == score)
      assert(r.getBoolean(2) == (score >= 0))
    }
  }

  test("Classifier: score is invariant to repartitioning and stable across runs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Classifier.hashedLinearScore(docs, "text", dim = 64)
      .select("doc_id", "score").orderBy("doc_id").collect()
    val b = Classifier.hashedLinearScore(docs.repartition(13), "text", dim = 64)
      .select("doc_id", "score").orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("Classifier: bucketing collides tokens into dim buckets (hashing trick)") {
    // with dim=1 every token shares one bucket → margin = n_tokens * w0 + bias
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val one = Classifier.hashedLinearScore(docs, "text", dim = 1, biasTenths = 0)
      .select("score").head().getDouble(0)
    val single = Classifier.hashedLinearScore(
      Seq((1L, "a")).toDF("doc_id", "text"), "text", dim = 1, biasTenths = 0)
      .select("score").head().getDouble(0)
    assert(math.abs(one - 4 * single) < 1e-9)
  }

  // --------------------------------------------- UnicodeNormalize (q69)

  test("unicode nfc: decomposed composes, composed unchanged, idempotent") {
    val decomposed = "café Å"
    val composed = "café Å"
    val df = Seq((decomposed, composed)).toDF("d", "c").select(
      TextFunctions.nfc(col("d")).as("nd"),
      TextFunctions.nfc(col("c")).as("nc"),
      TextFunctions.nfc(TextFunctions.nfc(col("d"))).as("ndd"))
    val r = df.head()
    assert(r.getString(0) == composed)
    assert(r.getString(1) == composed)
    assert(r.getString(2) == composed)
  }

  test("unicode nfkc: compatibility forms fold (ligature, fullwidth)") {
    val df = Seq("ﬁ Ａ").toDF("s") // ﬁ ligature, fullwidth A
      .select(TextFunctions.nfkc(col("s")).as("n"))
    assert(df.head().getString(0) == "fi A")
  }

  test("unicode nfc: null survives; interpreted and codegen paths agree") {
    val df = Seq(Option("é"), None).toDF("s")
    val out = df.select(TextFunctions.nfc(col("s")).as("n")).collect()
    assert(out(0).getString(0) == "é")
    assert(out(1).isNullAt(0))
    // force the interpreted path through a filter on the same expression
    val n = df.filter(TextFunctions.nfc(col("s")) === "é").count()
    assert(n == 1)
  }

  test("strip accents: marks drop (Mn/Mc/Me), non-decomposables survive, Hangul recomposes") {
    val cases = Seq(
      "\u00e9" -> "e",            // composed e-acute: decomposes, mark drops
      "e\u0301" -> "e",           // already-decomposed e + combining acute
      "\u0915\u093e" -> "\u0915", // ka + spacing (Mc) matra
      "a\u20dd" -> "a",           // a + enclosing (Me) circle
      "\u00df\u00f8" -> "\u00df\u00f8", // eszett, o-slash: not canonically decomposable
      "\ufb01" -> "\ufb01",        // fi ligature: compat-only, NFKC's job
      "\ud55c" -> "\ud55c",        // Hangul syllable: decomposes to Jamo,
                                   // recomposes - NOT left decomposed
      "plain ascii 42" -> "plain ascii 42")
    val out = cases.map(_._1).toDF("s")
      .select(col("s"), TextFunctions.stripAccents(col("s")).as("f"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(out(in) == want,
        s"for ${in.map(c => "%04x".format(c.toInt)).mkString(",")}")
    }
  }

  test("strip accents: null survives; interpreted and codegen paths agree") {
    val df = Seq(Option("caf\u00e9"), None).toDF("s")
    val out = df.select(TextFunctions.stripAccents(col("s")).as("f")).collect()
    assert(out(0).getString(0) == "cafe")
    assert(out(1).isNullAt(0))
    // force the interpreted path through a filter on the same expression
    assert(df.filter(TextFunctions.stripAccents(col("s")) === "cafe").count() == 1)
  }

  test("strip accents: composed, decomposed, and plain spellings share one match key") {
    val docs = Seq((1L, "caf\u00e9"), (2L, "cafe\u0301"), (3L, "cafe"))
      .toDF("doc_id", "text")
    val keys = docs.select(TextFunctions.stripAccents(col("text")).as("k"))
      .distinct().count()
    assert(keys == 1)
  }

  test("wordConcentration: hand-computed Simpson, separates equal distinct ratios") {
    import graft.ops.TextAnalysis
    val df = Seq("a a b b", "a a a b", "x y z", "x x x x")
      .toDF("text")
      .select(col("text"), TextAnalysis.wordConcentration(col("text")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(df("a a b b") == 0.5)    // (4+4)/16
    assert(df("a a a b") == 0.625)  // (9+1)/16 — same distinct ratio, higher
    assert(df("x y z") == 1.0 / 3)  // all distinct → 1/n
    assert(df("x x x x") == 1.0)    // degenerate repetition
  }

  test("unicode nfc: normalization unifies exact-dedup hashes") {
    val docs = Seq((1L, "café"), (2L, "café")).toDF("doc_id", "text")
    val distinctRaw = docs.select(md5(col("text"))).distinct().count()
    val distinctNfc = docs.select(md5(TextFunctions.nfc(col("text"))))
      .distinct().count()
    assert(distinctRaw == 2 && distinctNfc == 1)
  }

  // ------------------------------------------------- LanguageModel (q70)

  test("LanguageModel.bigrams: map-side bigram strings, empty below 2 tokens") {
    val df = Seq("a b c", "solo").toDF("t")
      .select(LanguageModel.bigrams(col("t")).as("bg"))
    val rows = df.collect().map(_.getSeq[String](0).toList)
    assert(rows(0) == List("a b", "b c"))
    assert(rows(1) == Nil)
  }

  test("LanguageModel.bigramScore: hand-computed add-one smoothed mean") {
    // corpus: "a b" ×2, "a c" ×1 → c(a b)=2, c(a c)=1, c1(a)=3, V={a,b,c}=3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = LanguageModel.bigramScore(docs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "mean_condp").orderBy("doc_id").collect()
    val pAB = 3.0 / 6.0 // (2+1)/(3+3)
    val pAC = 2.0 / 6.0 // (1+1)/(3+3)
    assert(out(0).getLong(1) == 1L && out(0).getDouble(2) == pAB)
    assert(out(2).getLong(1) == 1L && out(2).getDouble(2) == pAC)
  }

  test("LanguageModel.bigramScore: single-token doc gets 0 bigrams, null score") {
    val docs = Seq((1L, "a b"), (2L, "x")).toDF("doc_id", "text")
    val out = LanguageModel.bigramScore(docs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "mean_condp").orderBy("doc_id").collect()
    assert(out(1).getLong(1) == 0L)
    assert(out(1).isNullAt(2))
  }

  test("LanguageModel.bigramScore: score is partitioning-invariant") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val a = LanguageModel.bigramScore(docs, "doc_id", "text")
      .select("doc_id", "mean_condp").orderBy("doc_id").collect()
    val b = LanguageModel.bigramScore(docs.repartition(7), "doc_id", "text")
      .select("doc_id", "mean_condp").orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  // ------------------------------------------------------------- BM25

  test("Index.bm25TopK: rare-term doc outranks common-term frequency") {
    // 'rare' appears in one doc; 'common' in all four. The rare-term
    // match must beat any pile-up of common-term tf.
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common rare"),
      (3L, "common common common"),
      (4L, "common")
    ).toDF("doc_id", "text")
    val queries = Seq(("q", "rare"), ("q", "common")).toDF("query_id", "term")
    val top = Index.bm25TopK(docs, "doc_id", "text", queries, k = 4)
      .orderBy("rank").collect()
    assert(top.head.getLong(1) == 2L) // doc 2 holds the only 'rare'
    assert(top.head.getLong(2) == 2L) // matched both terms
  }

  test("Index.bm25TopK: terms absent from the corpus contribute nothing") {
    val docs = Seq((1L, "a b"), (2L, "a")).toDF("doc_id", "text")
    val qWith = Seq(("q", "a"), ("q", "zz_missing")).toDF("query_id", "term")
    val qBare = Seq(("q", "a")).toDF("query_id", "term")
    val a = Index.bm25TopK(docs, "doc_id", "text", qWith, k = 5)
      .select("doc", "score").orderBy("doc").collect()
    val b = Index.bm25TopK(docs, "doc_id", "text", qBare, k = 5)
      .select("doc", "score").orderBy("doc").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("Index.bm25TopK: k bounds every query's results; rank is dense from 1") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val queries = Seq(("q1", "spark"), ("q1", "join"), ("q2", "scan"))
      .toDF("query_id", "term")
    val out = Index.bm25TopK(docs, "doc_id", "text", queries, k = 3)
      .select("query_id", "rank").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted.toSeq)
    out.foreach { case (_, ranks) =>
      assert(ranks == (1L to ranks.size).toSeq && ranks.size <= 3)
    }
  }

  test("Index.bm25TopK and LanguageModel.bigramScore leave no cached frames registered") {
    // the unpersist discipline: the persisted postings/bigram frames
    // release before return (results materialize via localCheckpoint),
    // so a session serving many query batches accumulates nothing
    spark.catalog.clearCache()
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "c d")).toDF("doc_id", "text")
    val queries = Seq(("q", "a"), ("q", "c")).toDF("query_id", "term")
    val bm = Index.bm25TopK(docs, "doc_id", "text", queries, k = 3)
    val lm = graft.ops.LanguageModel.bigramScore(docs, "doc_id", "text")
    assert(spark.sharedState.cacheManager.isEmpty,
      "cached frames left registered after bm25TopK/bigramScore")
    assert(bm.count() > 0 && lm.count() == 3)
  }

  test("Index.bm25TopK: score is invariant to repartitioning") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val queries = Seq(("q", "hash"), ("q", "dup")).toDF("query_id", "term")
    val a = Index.bm25TopK(docs, "doc_id", "text", queries, k = 10)
      .select("doc", "score").orderBy("doc").collect()
    val b = Index.bm25TopK(docs.repartition(13), "doc_id", "text", queries, k = 10)
      .select("doc", "score").orderBy("doc").collect()
    assert(a.toSeq == b.toSeq)
  }

  // ------------------------------------------------- extractText

  test("extractText: script/style content removed, tags to spaces, entities decoded") {
    import graft.ops.TextAnalysis
    val html = Seq((1L,
      "<html><head><style>p{x}</style></head><body><h1>Hi</h1>" +
        "<p>a &lt;b&gt; c</p><script>var secret = 1;</script></body></html>"
    )).toDF("doc_id", "html")
    val out = html.select(TextAnalysis.extractText(col("html")).as("t"))
      .collect().head.getString(0)
    assert(out == "Hi a <b> c")
    assert(!out.contains("secret") && !out.contains("p{x}"))
  }

  test("extractText: double-encoded entities decode exactly one level") {
    import graft.ops.TextAnalysis
    val df = Seq((1L, "<p>&amp;lt; and &amp;amp; and &amp;</p>")).toDF("id", "h")
    val out = df.select(TextAnalysis.extractText(col("h")).as("t"))
      .collect().head.getString(0)
    // &amp;lt; → &lt; (NOT <): the &amp; decode runs last and once
    assert(out == "&lt; and &amp; and &")
  }

  test("extractText: whitespace collapses across removed block boundaries") {
    import graft.ops.TextAnalysis
    val df = Seq((1L,
      "<div>  one\n\n<script a=b>x</script>\ttwo  </div>")).toDF("id", "h")
    val out = df.select(TextAnalysis.extractText(col("h")).as("t"))
      .collect().head.getString(0)
    assert(out == "one two")
  }

  test("extractText: crawl hazards — casing, truncation, spaced close, comments") {
    import graft.ops.TextAnalysis
    def extract(h: String): String =
      Seq((1L, h)).toDF("id", "h")
        .select(TextAnalysis.extractText(col("h")).as("t"))
        .collect().head.getString(0)
    // uppercase/mixed-case blocks vanish with their content
    assert(extract("<SCRIPT>var secret = 1;</SCRIPT>ok") == "ok")
    assert(extract("<Style>p{x}</stYle>ok") == "ok")
    // a truncated record ending mid-script drops the dangling body
    assert(extract("before<script>var a = 1; var b") == "before")
    // spec-legal whitespace before the close bracket
    assert(extract("<script>x</script >after") == "after")
    // comments are blocks: a '>' inside must not leak the remainder
    assert(extract("a<!-- nav > menu -->b") == "a b")
    assert(extract("a<!-- unclosed comment") == "a")
  }

  // --------------------------------------------------------- Curation

  test("Curation.curate: first-failing decision, total over the corpus") {
    import graft.ops.Curation
    val docs = Seq(
      (1L, "en", "alpha beta gamma"),
      (2L, "en", "alpha beta gamma"),  // dup of 1 → 'duplicate' wins
      (3L, "xx", "alpha beta gamma delta"), // bad lang
      (4L, "en", "unique words here entirely")
    ).toDF("doc_id", "lang", "text")
    // huge positive bias: classifier passes everything, isolating the
    // dedup/lang stages; rate 1.0 disables sampling
    val out = Curation.curate(docs, "doc_id", "text", "lang",
      Curation.Config(langs = Seq("en"), classifierBiasTenths = 10000,
        sampleRate = 1.0))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("decision"), r.getAs[Boolean]("kept"))).toMap
    assert(out.size == 4) // auditable: nothing silently dropped
    assert(out(1L) == ("keep", true))
    assert(out(2L) == ("duplicate", false))
    assert(out(3L) == ("lang", false))
    assert(out(4L) == ("keep", true))

    // a null lang (lang-ID failure) must be gated, not fall through the
    // three-valued NOT IN to 'keep'
    val withNull = Seq((9L, null.asInstanceOf[String], "totally novel text"))
      .toDF("doc_id", "lang", "text")
    val nullOut = Curation.curate(withNull, "doc_id", "text", "lang",
      Curation.Config(langs = Seq("en"), classifierBiasTenths = 10000,
        sampleRate = 1.0)).collect().head
    assert(nullOut.getAs[String]("decision") == "lang")

    // classifier failure outranks the language gate but not dedup
    val strict = Curation.curate(docs, "doc_id", "text", "lang",
      Curation.Config(langs = Seq("en"), classifierBiasTenths = -10000,
        sampleRate = 1.0))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("decision")).toMap
    assert(strict(2L) == "duplicate")
    assert(strict(1L) == "classifier" && strict(3L) == "classifier")
  }

  test("Curation.curate: scrub precedes fingerprinting (PII-only diffs collapse)") {
    import graft.ops.Curation
    val docs = Seq(
      (1L, "en", "reach me at aa@x.org thanks"),
      (2L, "en", "reach me at bb@y.org thanks") // differs only in the email
    ).toDF("doc_id", "lang", "text")
    val out = Curation.curate(docs, "doc_id", "text", "lang",
      Curation.Config(langs = Seq("en"), classifierBiasTenths = 10000,
        sampleRate = 1.0))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("decision"), r.getAs[String]("text"))).toMap
    assert(out(1L)._1 == "keep")
    assert(out(2L)._1 == "duplicate") // same doc after redaction
    assert(out(1L)._2 == "reach me at <EMAIL> thanks")
  }

  test("Curation.curate plans exactly one shuffle (the fp window)") {
    import graft.ops.Curation
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val plan = Curation.curate(docs, "doc_id", "text", "lang",
      Curation.Config(sampleRate = 0.5))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"curation pipeline should shuffle once (fp window):\n$plan")
  }

  test("Index.keywords: rare terms beat stopwords; rank ties break on term") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the dog ran"),
      (3L, "the cat ran"))
      .toDF("doc_id", "text")
    val out = Index.keywords(docs, "doc_id", "text", 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(5)) -> ((r.getString(1), r.getDouble(4))))
      .toMap
    // doc 1: sat df=1 → score 3; cat df=2 → 1.5; the df=3 → 1
    assert(out((1L, 1)) == (("sat", 3.0)))
    assert(out((1L, 2)) == (("cat", 1.5)))
    // doc 3: cat and ran both df=2 score 1.5 → lexicographic tiebreak
    assert(out((3L, 1)) == (("cat", 1.5)))
    assert(out((3L, 2)) == (("ran", 1.5)))
  }

  test("Index.collocations: lift ranks the glued pair above frequent-word noise") {
    // "new york" always co-occur; "the" is everywhere — lift must rank
    // (new, york) far above any pair involving "the"
    val docs = Seq.tabulate(10)(i =>
      Tuple1(s"the city of new york has the best bagels $i"))
      .toDF("text")
    val named = Index.collocations(docs, "text", minCount = 5, topK = 3)
      .select("w1", "w2", "n_ab", "lift").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getDouble(3)))
    val lifts = named.map(x => x._1 -> x._3).toMap
    // every retained pair occurs 10 times; (new, york) involves two
    // singleton-unigram words → maximal lift among them
    assert(named.forall(_._2 == 10L))
    assert(lifts.keySet.contains(("new", "york")))
    assert(lifts(("new", "york")) == lifts.values.max)
  }

  test("Bpe.learn: the Sennrich corpus yields the hand-computed merge table") {
    import graft.ops.Bpe
    // the classic fixture: low*5 lower*2 newest*6 widest*3 — every merge
    // and tiebreak below is hand-derived (count desc, then (l, r) asc)
    val corpus = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val m = Bpe.learn(corpus, "text", numMerges = 8)
      .map(x => (x.rank, x.left, x.right, x.n))
    assert(m == Seq(
      (1, "e", "s", 9L),      // ties (e,s)=(s,t)=9 → lexicographic
      (2, "es", "t", 9L),
      (3, "l", "o", 7L),      // ties (l,o)=(o,w)=7
      (4, "lo", "w", 7L),
      (5, "e", "w", 6L),      // ties (e,w)=(n,e)=(w,est)=6
      (6, "ew", "est", 6L),   // "ew" < "n"
      (7, "n", "ewest", 6L),
      (8, "d", "est", 3L)))   // "d" < "i" < "w"
  }

  test("Bpe.tokenize: learned merges generalize to unseen words; overlap is greedy") {
    import graft.ops.Bpe
    val corpus = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val merges = Bpe.learn(corpus, "text", 8)
    val toks = Seq("newest low lowest").toDF("t")
      .select(Bpe.tokenize(col("t"), merges).as("toks"))
      .head.getSeq[String](0)
    // "lowest" never appeared in training, still decomposes on the table
    assert(toks == Seq("newest", "low", "low", "est"))
    // greedy left-to-right overlap: merge (a,a) over "aaaa" → [aa, aa]
    val aa = Seq("aaaa").toDF("t")
      .select(Bpe.tokenize(col("t"),
        Seq(Bpe.Merge(1, "a", "a", 99L))).as("toks"))
      .head.getSeq[String](0)
    assert(aa == Seq("aa", "aa"))
  }

  test("TextAnalysis.sentences: terminator runs split, blanks drop, edge spaces trim") {
    val df = Seq("one two. three!  four five?? six...", "no terminator at all")
      .toDF("t")
      .select(TextAnalysis.sentenceWordCounts(col("t")).as("w"))
    val out = df.collect().map(_.getSeq[Int](0).toSeq).toSeq
    assert(out == Seq(Seq(2, 1, 2, 1), Seq(4)))
  }

  test("TextAnalysis.vowelGroups: maximal vowel runs, y counts") {
    val out = Seq("strength", "aeiou x y", "zzz").toDF("t")
      .select(TextAnalysis.vowelGroups(col("t")).as("v"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L, 0L))
  }

  test("Curation.gopherRules: each rule has a planted failure; keep is the conjunction") {
    val good = ("g", ("the quick value " * 20).trim)          // 60 words, stops
    val short = ("s", "the a b")                              // fails word count
    val nostop = ("n", ("value table row line " * 15).trim)   // fails stopwords
    val thin = ("t", ("a a the " * 20).trim)                  // mean word len < 3
    val docs = Seq(good, short, nostop, thin).toDF("id", "text")
    val out = Curation.gopherRules(docs, "text",
        Curation.GopherConfig(minWords = 30, stopwords = Seq("a", "the"),
          minStopHits = 2))
      .collect().map(r => r.getAs[String]("id") ->
        (r.getAs[Boolean]("g_word_count"), r.getAs[Boolean]("g_mean_word_len"),
         r.getAs[Boolean]("g_stopwords"), r.getAs[Boolean]("keep"))).toMap
    assert(out("g") == ((true, true, true, true)))
    assert(out("s")._1 == false && out("s")._4 == false)
    assert(out("n")._3 == false && out("n")._4 == false)
    assert(out("t")._2 == false && out("t")._4 == false)
  }

  test("scriptCensus: eight scripts, confusable fires on in-word adjacency only") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "hello p\u0430ypal"),          // Latin + in-word Cyrillic \u0430
      (2L, "hello \u043c\u0438\u0440"), // space-separated scripts: clean
      (3L, "test\u03ba"),                 // Latin directly followed by Greek
      (4L, "\u0915\u0916 \uac00\uac01 \u0e01\u0e02"), // Dev/Hangul/Thai
      (5L, "plain ascii only")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scriptCensus(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("confusable") == 1L)
    assert(out(2L).getAs[Long]("confusable") == 0L)
    assert(out(2L).getAs[Long]("n_cyrillic") == 3L)
    assert(out(3L).getAs[Long]("confusable") == 1L)
    assert(out(4L).getAs[Long]("confusable") == 0L)
    assert(out(4L).getAs[Long]("n_devanagari") == 2L)
    assert(out(4L).getAs[Long]("n_hangul") == 2L)
    assert(out(4L).getAs[Long]("n_thai") == 2L)
    assert(out(4L).getAs[String]("dominant_script") == "Devanagari") // tie: earlier wins
    assert(out(5L).getAs[String]("dominant_script") == "Latin")
    assert(out(5L).getAs[Long]("confusable") == 0L)
  }
}
