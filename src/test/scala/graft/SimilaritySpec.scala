package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

class SimilaritySpec extends SparkTestBase {
  import testImplicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("cosine: parallel → 1, orthogonal → 0, opposite → -1") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(2.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 3.0)),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0))
    ).toDF("a", "b").select(Similarity.cosine(col("a"), col("b")).as("c"))
    val cs = df.collect().map(_.getDouble(0))
    assert(math.abs(cs(0) - 1.0) < 1e-12)
    assert(math.abs(cs(1)) < 1e-12)
    assert(math.abs(cs(2) + 1.0) < 1e-12)
  }

  test("bruteForceTopK: nearest first, self excluded, k respected") {
    val corpus = Similarity.withNorm(emb(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0f, 1f)), (3L, Seq(-1f, 0f))),
      "vec_id", "embedding")
    val out = Similarity.bruteForceTopK(corpus, corpus.filter(col("vec_id") === 0), 2)
      .orderBy("rank").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L))
  }

  test("ivfAssign: every vector lands on its nearest centroid") {
    val corpus = Similarity.withNorm(emb(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),
      (10L, Seq(0.99f, 0.01f)), (11L, Seq(0.01f, 0.99f))),
      "vec_id", "embedding")
    val centroids = corpus.filter(col("vec_id") < 2)
    val out = Similarity.ivfAssign(corpus, centroids).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(out(10L) == 0L && out(11L) == 1L)
    assert(out(0L) == 0L && out(1L) == 1L)
  }

  test("ivfTopK: finds in-cluster neighbors") {
    val corpus = Similarity.withNorm(emb(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)),
      (10L, Seq(0.99f, 0.01f)), (11L, Seq(0.98f, 0.02f)), (12L, Seq(0.01f, 0.99f))),
      "vec_id", "embedding")
    val centroids = corpus.filter(col("vec_id") < 2)
    val queries = corpus.filter(col("vec_id") === 10)
    val out = Similarity.ivfTopK(corpus, centroids, queries, k = 2, nProbe = 1)
      .orderBy("rank").collect()
    // probe=1 → only cluster 0 searched: neighbors are 0 and 11, never 12
    assert(out.map(_.getAs[Long]("neighbor_id")).toSet == Set(0L, 11L))
  }
}
