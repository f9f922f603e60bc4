package graft

import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, Similarity}

/** The four media operations (decode / frame-sample / resize /
  * feature-extract): codecs are stubbed, the Spark plumbing under test —
  * schemas, per-partition batching, 1:N fan-out, composition with the
  * similarity operators — is real. */
class MultimodalSpec extends SparkTestBase {
  import testImplicits._

  private def media = Multimodal.asBinary(
    Seq(
      (1L, "x" * 300),
      (2L, "x" * 300),  // byte-identical to doc 1
      (3L, "z" * 520),
      (4L, "")          // empty blob
    ).toDF("doc_id", "text"), "text")

  test("decodeStub: typed metadata, deterministic, null-safe") {
    val meta = Multimodal.decodeStub(media, "doc_id", "media").collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes == 300 && meta(1L).format == "png")
    assert(meta(1L).width == meta(2L).width)
    assert(meta(4L).n_bytes == 0 && meta(4L).first_byte == 0)
  }

  test("frameSampleStub: 1:N fan-out with stride, inside the partition") {
    val frames = Multimodal.frameSampleStub(media, "doc_id", "media",
      frameBytes = 64, stride = 2).collect()
    val byDoc = frames.groupBy(_.doc_id)
    // doc 1: 300/64 = 4 frames, stride 2 → frames 0 and 2
    assert(byDoc(1L).map(_.frame_idx).sorted.toSeq == Seq(0L, 2L))
    assert(byDoc(1L).forall(_.frame.length == 64))
    // doc 3: 520/64 = 8 frames, stride 2 → 4 sampled
    assert(byDoc(3L).length == 4)
    // empty blob → no frames, no error
    assert(!byDoc.contains(4L))
  }

  test("resizeStub: output carries target dims, byte budget scales with pixels") {
    val out = Multimodal.resizeStub(media, "doc_id", "media", 32, 16).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out(1L).width == 32 && out(1L).height == 16)
    assert(out(1L).media.length == 32 * 16 / 64)
    assert(out(4L).media.length == 32 * 16 / 64) // padded from empty
  }

  test("featureExtractStub → Similarity: media embeddings drive ANN end-to-end") {
    val emb = Multimodal.featureExtractStub(media, "doc_id", "media", dim = 8)
      .toDF("vec_id", "embedding")
    val corpus = Similarity.withNorm(emb, "vec_id", "embedding")
      .filter(col("nrm") > 0) // empty blob has a zero vector
    val q = corpus.filter(col("vec_id") === 1L)
    val nn = Similarity.bruteForceTopK(corpus, q, k = 1).collect()
    // doc 2 is byte-identical to doc 1 → cosine exactly 1.0
    assert(nn.length == 1)
    assert(nn.head.getAs[Long]("neighbor_id") == 2L)
    assert(nn.head.getAs[Double]("cos") == 1.0)
  }
}
