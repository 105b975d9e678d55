package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Decontam, Packing, Quality, Sampling}

/** Round-3 curation operators: decontamination, Gopher rules, sequence
  * packing, weighted mixing, PII redaction, quantization, stratified
  * caps.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("decontamination flags benchmark n-gram overlap with exact counts") {
    // corpus doc 1 shares the 3-gram "c d e" (and "b c d") with the
    // benchmark; doc 2 is clean
    val corpus = docs((1L, "a b c d e f"), (2L, "p q r s t"))
    val bench = docs((100L, "x b c d e y"))
    val out = Decontam.overlap(corpus, bench, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // doc 1 has 4 distinct 3-grams, 2 of them contaminated
    assert(out == List((1L, 4L, 2L)))
  }

  test("decontamination on a clean corpus returns empty") {
    val corpus = docs((1L, "a b c d e"))
    val bench = docs((2L, "v w x y z"))
    assert(Decontam.overlap(corpus, bench, "doc_id", "text", 3).count() == 0)
  }

  test("decontamination broadcasts the benchmark side even when size " +
      "estimates forbid it") {
    // the benchmark side sits behind a distinct aggregate whose size
    // ESTIMATE can blow past autoBroadcastJoinThreshold — the explicit
    // hint must keep the corpus map-side regardless, so assert the
    // broadcast survives with automatic broadcasting fully disabled
    val corpus = docs((1L, "a b c d e f"), (2L, "p q r s t"))
    val bench = docs((100L, "x b c d e y"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Decontam.overlap(corpus, bench, "doc_id", "text", 3)
      assert(out.queryExecution.sparkPlan.toString
        .contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("packing offsets are contiguous per stream and chunk = offset/budget") {
    val df = (1L to 200L).map(i => (i, "t " * (i % 13 + 1).toInt))
      .toDF("doc_id", "text")
    val out = Packing.packOffsets(df, "doc_id",
        size(TextFunctions.words(col("text"))), budget = 20L, streams = 4)
      .collect()
      .map(r => (r.getInt(2), r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4)))
    // per stream: offsets start at 0 and advance by exactly the doc's
    // tokens in doc_id order; chunk is the integer offset/budget
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      var expect = 0L
      sorted.foreach { case (_, _, tokens, offset, chunk) =>
        assert(offset == expect)
        assert(chunk == offset / 20L)
        expect += tokens
      }
    }
    // deterministic: a different partitioning yields the same layout
    val again = Packing.packOffsets(df.repartition(7), "doc_id",
        size(TextFunctions.words(col("text"))), budget = 20L, streams = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet
    assert(again == out.map(t => (t._2, t._1, t._4)).toSet)
  }

  test("mixSources honors 0/100 extremes and is salt-deterministic") {
    val df = (1L to 300L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val out = Sampling.mixSources(df, "doc_id", "source",
      Map("src0" -> 0, "src1" -> 100), defaultPct = 50)
    val kept = out.filter(col("kept")).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("src0"))
    assert(kept("src1") == 100L)
    // default rate applies to unlisted src2, roughly half kept
    assert(kept("src2") > 20L && kept("src2") < 80L)
    val again = Sampling.mixSources(df.repartition(5), "doc_id", "source",
        Map("src0" -> 0, "src1" -> 100), defaultPct = 50)
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again ==
      out.filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet)
    // null source → defaultPct decision, never a null `kept` (which
    // would silently vanish from both kept and rejected audit filters)
    val withNull = Seq((1L, null: String), (2L, null: String))
      .toDF("doc_id", "source")
    val nullOut = Sampling.mixSources(withNull, "doc_id", "source",
      Map("src1" -> 100), defaultPct = 100)
    assert(nullOut.filter(col("kept").isNull).count() == 0)
    assert(nullOut.filter(col("kept")).count() == 2)
  }

  test("stratifiedCap keeps at most cap rows per group, layout-independent") {
    val df = (1L to 500L).map(i => (i, s"g${i % 5}")).toDF("id", "grp")
    val out = Sampling.stratifiedCap(df, "id", "grp", cap = 7)
    val sizes = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ == 7L))
    val ids1 = out.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedCap(df.repartition(13), "id", "grp", cap = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // a group smaller than the cap survives whole
    val small = Sampling.stratifiedCap(
      df.filter(col("id") <= 3), "id", "grp", cap = 7)
    assert(small.count() == 3)
  }

  test("incrementalNearDups flags batch docs against the corpus only") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " CHANGED"
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val corpus = docs((1L, base), (2L, other))
    // batch docs 10 (≈ corpus doc 1) and 11 (novel); 10 and 11 are NOT
    // compared against each other — only against the corpus
    val batch = docs((10L, nearDup), (11L, (200 to 240).map(i => s"u$i")
      .mkString(" ")))
    val out = graft.operators.Dedup
      .incrementalNearDups(batch, corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2))))
      .toMap
    assert(out.keySet == Set(10L, 11L)) // one row per batch doc
    assert(out(10L) == ((true, 1L)))
    assert(out(11L) == ((false, 0L)))
    // overlapping id spaces would corrupt the verification index -> refused
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.incrementalNearDups(
        docs((1L, base)), corpus, "doc_id", "text", threshold = 0.5)
    }
    assert(e.getMessage.contains("disjoint"))
    // checkDisjoint=false (structurally-disjoint production ingest)
    // skips the eager id probe but must return the identical routing
    val unchecked = graft.operators.Dedup
      .incrementalNearDups(batch, corpus, "doc_id", "text", threshold = 0.5,
        checkDisjoint = false)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2))))
      .toMap
    assert(unchecked == out)
  }

  test("incrementalNearDups agrees with minhashPairs across the split") {
    // same bands, same verification: the incremental batch×corpus run
    // must flag exactly the docs whose q36-style pair crosses the split
    val all = Tables.documents(spark, "/root/testdata/sf0.01")
    val batch = all.filter(pmod(col("doc_id"), lit(4)) === 0)
    val corpus = all.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val pairs = graft.operators.Dedup
      .minhashPairs(all, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.flatMap { case (a, b) =>
      if (a % 4 == 0 && b % 4 != 0) Some(a)
      else if (b % 4 == 0 && a % 4 != 0) Some(b)
      else None
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(expected.nonEmpty, "fixture has no crossing pairs — vacuous")
    val inc = graft.operators.Dedup
      .incrementalNearDups(batch, corpus, "doc_id", "text", threshold = 0.8)
      .collect().filter(_.getBoolean(1))
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(inc == expected)
  }

  test("gopherFlags rules fire on constructed degenerate documents") {
    val good = ((1 to 50).map(i => s"word$i") ++
      Seq("the", "of", "and")).mkString(" ")
    val tooShort = "just a few little words here"
    val repetitive = (Seq.fill(50)("spam") ++ Seq("the", "of")).mkString(" ")
    val noStops = (1 to 50).map(i => s"token$i").mkString(" ")
    val out = Quality.gopherFlags(
        docs((1L, good), (2L, tooShort), (3L, repetitive), (4L, noStops)),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
          r.getBoolean(9))).toMap
    assert(out(1L)._5) // keep
    assert(!out(2L)._1 && !out(2L)._5) // r_words fails
    assert(!out(3L)._3 && !out(3L)._5) // r_rep fails
    assert(!out(4L)._4 && !out(4L)._5) // r_stop fails
  }

  test("PII redaction replaces e-mails, phones, and IPs with placeholders") {
    val df = Seq((1L,
      "write bob.smith+x@mail.example.org or call +44-207-9460 " +
        "from 192.168.1.254 today")).toDF("doc_id", "text")
    val out = df.select(
        TextFunctions.redactPii(col("text")).as("red"),
        TextFunctions.piiCount(col("text"), TextFunctions.emailPattern).as("e"),
        TextFunctions.piiCount(col("text"), TextFunctions.phonePattern).as("p"),
        TextFunctions.piiCount(col("text"), TextFunctions.ipPattern).as("i"))
      .head()
    assert(out.getString(0) ==
      "write [EMAIL] or call [PHONE] from [IP] today")
    assert(out.getInt(1) == 1 && out.getInt(2) == 1 && out.getInt(3) == 1)
  }

  test("int8 quantization error is bounded by half a quantization step") {
    // per element |x - q·s| ≤ s/2, so mse ≤ (s/2)²
    val emb = Seq((1L, Array(0.9f, -0.5f, 0.127f, -0.001f, 0.0f)))
      .toDF("vec_id", "embedding")
    val m = 0.9
    val s = m / 127.0
    val row = emb.select(
      aggregate(col("embedding"), lit(0.0), (acc, x) =>
        acc + pow(x.cast("double") -
          floor(x.cast("double") / s + 0.5) * s, lit(2.0)))
        .as("sse")).head()
    assert(row.getDouble(0) / 5.0 <= (s / 2) * (s / 2) + 1e-15)
  }

  test("mixtureWeights: alpha endpoints — natural proportions vs uniform") {
    // source a: 3 docs × 2 tokens; source b: 1 doc × 2 tokens
    val docs = Seq(("a", "x y"), ("a", "x y"), ("a", "x y"), ("b", "x y"))
      .toDF("source", "text")
    def w(alpha: Double) = Sampling
      .mixtureWeights(docs, "source", "text", alpha, budget = 1000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    val nat = w(1.0) // weights 6/8 and 2/8
    assert(nat("a") == ((6L, 0.75, 750L)))
    assert(nat("b") == ((2L, 0.25, 250L)))
    val uni = w(0.0) // n^0 = 1 each → 50/50
    assert(uni("a")._2 == 0.5 && uni("b")._2 == 0.5)
    // temperature 0.5 sits strictly between
    val mid = w(0.5)
    assert(mid("a")._2 < 0.75 && mid("a")._2 > 0.5)
  }

  test("mixtureWeights: epochs = allocation over corpus size") {
    val docs = Seq(("s", "a b c d")).toDF("source", "text")
    val r = Sampling.mixtureWeights(docs, "source", "text", 0.5, 400L)
      .collect()(0)
    assert(r.getLong(2) == 4L)      // tokens
    assert(r.getDouble(3) == 1.0)   // single source takes all weight
    assert(r.getLong(4) == 400L && r.getDouble(5) == 100.0)
  }

  test("q275 embargo split: purged band zeroes the horizon leak the " +
      "counterfeit shows") {
    // days 0..20 -> cut = 16; embargo purges [16,19); horizon 3.
    // counterfeit leak = train days with day+2 >= 16: {14,15,15} = 3
    def ts(dayN: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(1990, 1, 1).plusDays(dayN).atStartOfDay())
    val ev = Seq(
      (1L, ts(0), 1L), (2L, ts(15), 1L), (3L, ts(16), 1L),
      (4L, ts(19), 1L), (5L, ts(14), 2L), (6L, ts(15), 2L),
      (7L, ts(20), 2L)
    ).map { case (id, t, u) => (id, t, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_embargo_fixture").toString
    ev.write.parquet(s"$dir/events.parquet")
    val rows = graft.SparkEntry.queries("q275_embargo_split")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      ("0_counterfeit_no_embargo", 4L, 2L, 0L, 15L, 3L),
      ("1_train", 4L, 2L, 0L, 15L, 0L),
      ("2_purged", 1L, 1L, 16L, 16L, 0L),
      ("3_test", 2L, 2L, 19L, 20L, 0L)), rows.toSeq.toString)
  }
}
