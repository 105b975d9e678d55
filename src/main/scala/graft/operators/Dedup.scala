package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
// cross-engine deterministic rounding shadows functions.round
import graft.functions.Rounding.{roundTo => round}

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication operators for the training-data pipeline
  * (SURVEY.md §2.11): exact, MinHash+LSH, SimHash, exact n-gram
  * Jaccard (inverted index), and embedding-cosine near-dup.
  *
  * Scale posture (100 TB): every variant reduces candidate generation
  * to an equi-join on a derived key (content hash, LSH band key,
  * simhash band, shingle, LSH bucket) — never an all-pairs comparison —
  * so the expensive step is a key-partitioned shuffle that AQE can
  * re-balance, and per-key fan-out is bounded by band/bucket width.
  *
  * Cache lifecycle: operators persist (MEMORY_AND_DISK) intermediates
  * that their plans reference multiple times; the handles are owned by
  * the session, not returned. Long-lived sessions issuing many dedup
  * calls should `spark.catalog.clearCache()` between logical jobs —
  * the Verify and Bench harnesses do.
  */
object Dedup {

  /** The heavy per-row work below (md5 minhash lattices, simhash bit
    * lattices, dot products) runs in higher-order-function expressions,
    * which Spark evaluates interpreted — so parallelism is everything.
    * Small parquet inputs arrive as a single partition; spread them
    * across the cluster before the expensive projection. The explicit
    * partition count is preserved (AQE does not re-coalesce
    * user-specified repartitions).
    */
  private def widen(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // only WIDEN: a large input already partitioned finer than the
    // core count must not be funneled down to defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, col(key))
    else df
  }

  /** Normalized content hash: lowercase + collapsed whitespace → md5. */
  def contentHash(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Exact dedup: one surviving row (min id) per normalized-content
    * group, with the group size. A single hash-partitioned aggregation.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), contentHash(col(textCol)).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("group_size"))

  /** Shingle sets per document: `(id, sh: array<string>)`. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                  shingleN: Int): DataFrame =
    widen(docs, idCol).select(col(idCol).as("id"),
      wordShingles(words(col(textCol)), shingleN).as("sh"))

  /** Distinct word-n-gram shingles as ROWS `(id, s)` — same set as
    * [[shingleSets]] (including the whole-text fallback for docs with
    * fewer than n words), built with posexplode + window `lead`s
    * instead of array lambdas. Everything here is codegen'd; the array
    * formulation runs interpreted per shingle, which dominated the
    * dedup queries.
    */
  /** Word n-gram shingles as ROWS `(id, s)`, possibly with duplicate
    * shingles per doc (multiset). Built with posexplode + window
    * `lead`s — fully codegen'd, unlike the array-lambda formulation.
    * Sufficient wherever multiset semantics coincide with set
    * semantics (minhash minima, min-fingerprints); [[shingleRows]]
    * adds the distinct + persist for exact set operations.
    */
  def shingleRowsRaw(docs: DataFrame, idCol: String,
                     textCol: String, n: Int): DataFrame = {
    val base = widen(docs, idCol).select(col(idCol).as("id"),
      words(col(textCol)).as("w"))
    val exploded = base.filter(size(col("w")) >= n)
      .select(col("id"), posexplode(col("w")).as(Seq("pos", "w0")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    val withLeads = (1 until n).foldLeft(exploded) { (df, i) =>
      df.withColumn(s"w$i", lead(col("w0"), i).over(win))
    }
    val grams = withLeads
      .filter(col(s"w${n - 1}").isNotNull)
      .select(col("id"),
        concat_ws(" ", (0 until n).map(i => col(s"w$i")): _*).as("s"))
    val short = base.filter(size(col("w")) < n)
      .select(col("id"), concat_ws(" ", col("w")).as("s"))
    grams.unionByName(short)
  }

  /** [[shingleRowsRaw]] deduplicated to set semantics, persisted: the
    * exact all-pairs path references it 3× (both join sides + sizes),
    * and without persistence Spark re-executes the
    * explode+window+distinct subtree per reference. MEMORY_AND_DISK
    * spills at scale; recomputing a corpus-sized shuffle 3× is
    * strictly worse.
    */
  private def shingleRows(docs: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame =
    shingleRowsRaw(docs, idCol, textCol, n).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** MinHash + banded LSH near-dup pairs, verified by exact Jaccard.
    *
    * tokenize → shingle → K minhashes → B band keys → equi-join on
    * (band, key) → distinct candidate pairs → re-join shingle sets →
    * exact Jaccard ≥ threshold. The only shuffles are the band-key
    * join and the two id-keyed verification joins; candidate volume is
    * controlled by (bands, rowsPerBand), not corpus size².
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double, shingleN: Int = 3, k: Int = 12,
                   bands: Int = 6, rowsPerBand: Int = 2): DataFrame = {
    require(bands * rowsPerBand == k, "signature must split evenly into bands")
    require(threshold > 0.0,
      "threshold must be positive: zero-similarity candidate pairs drop " +
        "out of the verification join and cannot be reported")
    // Signatures run over the RAW (non-distinct) shingle rows — min
    // over a multiset equals min over its set, so the corpus-wide
    // distinct shuffle is skipped entirely; exact set semantics are
    // only materialized later, restricted to candidate documents.
    // ONE md5 per (doc, shingle) row → K min aggregates: Catalyst
    // expression trees are not DAGs, so computing the signature inside
    // nested array lambdas would re-hash every shingle once per seed;
    // the row formulation hashes once and the K minima are codegen'd
    // partial aggregates (map-side combine — the shape that scales).
    val hashed = shingleRowsRaw(docs, idCol, textCol, shingleN)
      .withColumn("h", token60(col("s")) % MinhashP)
    val minCols = (0 until k).map(i =>
      min(pmod(col("h") * (2 * i + 1) + lit(7919L * i), lit(MinhashP)))
        .as(s"m$i"))
    val sigs = hashed.groupBy("id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("id"),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
    // self-joined below → persist so the signature aggregation runs once
    val banded = sigs.select(col("id"),
      posexplode(lshBandKeys(col("sig"), bands, rowsPerBand))
        .as(Seq("band", "key")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
      // referenced 3x below (two id-unions + the verification join)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Exact-Jaccard verification needs distinct shingle SETS, but only
    // for documents that appear in a candidate pair — a tiny fraction
    // of the corpus at any scale.
    val candIds = cand.select(col("doc_a").as("cid"))
      .unionByName(cand.select(col("doc_b").as("cid"))).distinct()
    val candShingles = shingleRowsRaw(
        docs.join(candIds, col(idCol) === col("cid"), "left_semi"),
        idCol, textCol, shingleN)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    jaccardOfPairs(cand, candShingles, threshold)
  }

  /** Exact n-gram Jaccard pairs via an inverted shingle index — the
    * ground-truth counterpart of [[minhashPairs]]. Pair candidates come
    * from co-occurrence on a shingle (equi-join on the shingle string);
    * intersection sizes fall out of the pair group count, so shingle
    * sets are only re-joined for |A|,|B|.
    */
  def jaccardPairsExact(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, shingleN: Int = 3): DataFrame = {
    require(threshold > 0.0,
      "threshold must be positive: zero-similarity pairs never co-occur " +
        "in the inverted index and cannot be reported")
    val inv = shingleRows(docs, idCol, textCol, shingleN)
    val sizes = inv.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = inv.as("a")
      .join(inv.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.id"))
      .withColumn("jaccard", round(
        col("inter").cast("double") /
          (col("sa.n") + col("sb.n") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Exact Jaccard for given candidate pairs over a shingle-row table:
    * |A∩B| from the pair-restricted shingle join, |A|,|B| from per-doc
    * counts. Pairs sharing zero shingles drop out of the join — their
    * Jaccard is 0, below any positive threshold.
    */
  private def jaccardOfPairs(cand: DataFrame, inv: DataFrame,
                             threshold: Double): DataFrame = {
    val sizes = inv.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(inv.as("ia"), col("doc_a") === col("ia.id"))
      .join(inv.as("ib"),
        col("doc_b") === col("ib.id") && col("ia.s") === col("ib.s"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.id"))
      .withColumn("jaccard", round(
        col("inter").cast("double") /
          (col("sa.n") + col("sb.n") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash near-dup pairs: 60-bit simhash over distinct tokens,
    * banded into 4×15-bit segments (pigeonhole: hamming ≤ 3 ⇒ at least
    * one identical segment), candidates from the segment equi-join,
    * verified by exact Hamming distance.
    *
    * The banded join runs over DISTINCT simhash values, not documents:
    * on corpora where many documents share a fingerprint (dup-heavy, or
    * small vocabularies), this collapses the quadratic candidate
    * explosion to the number of distinct fingerprints; surviving value
    * pairs are expanded back to document pairs by two equi-joins.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "the 4x15-bit banding guarantees candidate recall only for " +
        "hamming <= 3 (pigeonhole); larger radii would silently drop pairs")
    // Fingerprints via explode → ONE md5 per (doc, token) row → 60
    // codegen'd conditional-sum aggregates → recombine bits. The array
    // formulation (TextFunctions.simhash) re-evaluates its token-hash
    // argument twice per bit — 120 interpreted re-hashes per document —
    // because Catalyst expression trees are not DAGs.
    val toks = widen(docs, idCol)
      .select(col(idCol).as("id"),
        explode(array_distinct(words(col(textCol)))).as("t"))
      .withColumn("h", token60(col("t")))
    val bitSums = (0 until 60).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(lit(1L))).as(s"b$i"))
    // referenced 5x downstream (distinct values, both expansion joins,
    // both sides of the same-fingerprint join) → persist, or the
    // explode + 60-aggregate subtree runs five times
    val sims = toks.groupBy("id")
      .agg(count(lit(1)).as("n"), bitSums: _*)
      .select(col("id"),
        (0 until 60).map(i =>
          when(col(s"b$i") * 2 > col("n"), lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uniq = sims.select("sim").distinct()
    val banded = uniq.select(col("sim"),
      posexplode(transform(sequence(lit(0), lit(3)), b =>
        shiftrightByCol(col("sim"), b * 15) % 32768))
        .as(Seq("band", "seg")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.seg") === col("b.seg") &&
          col("a.sim") < col("b.sim"))
      .select(col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .distinct()
      .withColumn("hamming_dist",
        hamming(col("sim_a"), col("sim_b")).cast("int"))
      .filter(col("hamming_dist") <= maxHamming)
    val crossPairs = cand
      .join(sims.as("x"), col("sim_a") === col("x.sim"))
      .join(sims.as("y"), col("sim_b") === col("y.sim"))
      .select(least(col("x.id"), col("y.id")).as("doc_a"),
              greatest(col("x.id"), col("y.id")).as("doc_b"),
              col("hamming_dist"))
    val samePairs = sims.as("x")
      .join(sims.as("y"),
        col("x.sim") === col("y.sim") && col("x.id") < col("y.id"))
      .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"),
              lit(0).cast("int").as("hamming_dist"))
    crossPairs.unionByName(samePairs)
  }

  private def shiftrightByCol(e: Column, n: Column): Column =
    call_function("shiftright", e, n)

  /** Embedding-cosine near-dup pairs. Brute force all-pairs — correct
    * baseline at test scale; the 100 TB path is
    * [[Similarity.knnLsh]]-style bucketing where candidates come from
    * an equi-join on the LSH bucket instead of a cross join.
    */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
                     threshold: Double): DataFrame = {
    // norms are precomputed per vector so each pair costs ONE dot
    // product instead of three full array traversals
    val v = widen(emb, idCol).select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.norm(col(vecCol)).as("nrm"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cosine", round(
        VectorFunctions.dot(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"), col("cosine"))
  }
}
