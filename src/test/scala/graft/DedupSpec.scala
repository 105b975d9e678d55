package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("wordShingles produces distinct word 3-grams; short docs degrade") {
    val df = docs((1L, "a b c d"), (2L, "x y"))
      .select(col("doc_id"),
        TextFunctions.wordShingles(TextFunctions.words(col("text")), 3)
          .as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L).toSet == Set("a b c", "b c d"))
    assert(m(2L) == Seq("x y"))
  }

  test("exact dedup groups identical normalized content") {
    val df = docs(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "different text"))
    val out = Dedup.exact(df, "doc_id", "text").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out(1L) == 2L) // docs 1,2 collapse; keeper = min id
    assert(out(3L) == 1L)
  }

  test("minhashPairs finds a near-dup pair and skips dissimilar docs") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " CHANGED"
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val out = Dedup.minhashPairs(
        docs((1L, base), (2L, nearDup), (3L, other)),
        "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 2L)))
  }

  test("jaccardPairsExact computes the exact pair similarity") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " CHANGED"
    val out = Dedup.jaccardPairsExact(
        docs((1L, base), (2L, nearDup)), "doc_id", "text", threshold = 0.5)
      .collect()
    assert(out.length == 1)
    val j = out.head.getDouble(2)
    // 38 shared shingles of 38+2 vs 38+2 → j = 36/42? compute directly:
    // doc1: 38 shingles, doc2: 38 shingles, shared: 36 → 36/40 = 0.9
    assert(j > 0.85 && j <= 1.0)
  }

  test("minhash agrees with exact jaccard on the sf0.001 corpus") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val lsh = Dedup.minhashPairs(d, "doc_id", "text", threshold = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardPairsExact(d, "doc_id", "text", threshold = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // at j≥0.8 with 6 bands × 2 rows the LSH miss probability is ~1e-3
    assert(lsh == exact)
  }

  test("simhashPairs: identical docs at distance 0, unrelated docs absent") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val out = Dedup.simhashPairs(
        docs((1L, a), (2L, a), (3L, "totally different words here now")),
        "doc_id", "text", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(out.keySet == Set((1L, 2L)))
    assert(out((1L, 2L)) == 0)
  }

  test("embeddingPairs finds high-cosine pairs only") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.1f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Dedup.embeddingPairs(df, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 2L)))
  }
}
