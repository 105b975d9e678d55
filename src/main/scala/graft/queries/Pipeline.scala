package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
// cross-engine deterministic rounding shadows functions.round
import graft.functions.Rounding.{roundTo => round}

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.{Dedup, MediaFile, Multimodal, Sampling, Similarity}

/** Training-data pipeline surface (SURVEY.md §2.11): text analysis,
  * dedup (exact / MinHash+LSH / SimHash / exact n-gram Jaccard /
  * embedding-cosine), ANN similarity search, and multimodal plumbing.
  *
  * Oracle notes: every hash function used cross-engine is md5 (hex
  * strings compare identically), every computed double is rounded, and
  * every computed integer is cast so Spark and DuckDB output types
  * agree. Queries without an oracle (LSH ANN — plane literals live in
  * Scala) get the driver's rows-only check plus ScalaTest coverage.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q30
  /** Corpus statistics per (lang, source). */
  private def q30(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_tokens", size(words(col("text"))))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
           round(avg("n_chars"), 4).as("avg_chars"),
           round(avg("n_tokens"), 4).as("avg_tokens"),
           sum("n_tokens").cast("long").as("sum_tokens"))
      .orderBy("lang", "source")

  private val q30Sql =
    """SELECT lang, source, count(*) AS n_docs,
       round(avg(n_chars),4) AS avg_chars,
       round(avg(len(regexp_split_to_array(trim(text),'\s+'))),4) AS avg_tokens,
       CAST(sum(len(regexp_split_to_array(trim(text),'\s+'))) AS BIGINT)
         AS sum_tokens
       FROM documents GROUP BY lang, source ORDER BY lang, source"""

  // ---------------------------------------------------------------- q31
  /** Token counting: whitespace + BPE-ish regex tokenizer. */
  private def q31(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_ws_tokens"),
        bpeishTokenCount(col("text")).cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")

  private val q31Sql =
    """SELECT doc_id,
       len(regexp_split_to_array(trim(text),'\s+')) AS n_ws_tokens,
       len(regexp_extract_all(text,'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
         AS n_bpe_tokens
       FROM documents ORDER BY doc_id"""

  // ---------------------------------------------------------------- q32
  /** Quality scoring: length / punctuation / stopword-density mix. */
  private def q32(s: SparkSession, d: String): DataFrame = {
    val w = words(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        round(punctRatio(col("text")), 4).as("punct_ratio"),
        round(stopwordRatio(w), 4).as("stopword_ratio"),
        round(qualityScore(col("text"), w), 4).as("quality"))
      .orderBy("doc_id")
  }

  private val q32Sql =
    """SELECT doc_id,
       round(length(regexp_replace(text,'[^.!?,;:]','','g'))::DOUBLE
             / length(text), 4) AS punct_ratio,
       round(len(list_filter(w, t ->
               list_contains(['the','a','of','and','to','in'], t)))::DOUBLE
             / len(w), 4) AS stopword_ratio,
       round(
         LEAST(length(text)/400.0, 1.0) * 0.4
         + (1.0 - LEAST(length(regexp_replace(text,'[^.!?,;:]','','g'))::DOUBLE
                        / length(text) * 10.0, 1.0)) * 0.3
         + LEAST(len(list_filter(w, t ->
               list_contains(['the','a','of','and','to','in'], t)))::DOUBLE
             / len(w) * 5.0, 1.0) * 0.3, 4) AS quality
       FROM (SELECT doc_id, text,
               regexp_split_to_array(trim(text),'\s+') AS w
             FROM documents) t
       ORDER BY doc_id"""

  // ---------------------------------------------------------------- q33
  /** Marker-word language ID vs the labeled lang (confusion counts). */
  private def q33(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), predictedLang(words(col("text"))).as("pred_lang"))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")

  private val q33Sql =
    """SELECT lang, pred_lang, count(*) AS n FROM (
         SELECT lang,
           CASE WHEN greatest(s_en,s_fr,s_es,s_de,s_zh) = 0 THEN 'und'
                WHEN s_zh = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'zh'
                WHEN s_fr = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'fr'
                WHEN s_es = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'es'
                WHEN s_en = greatest(s_en,s_fr,s_es,s_de,s_zh) THEN 'en'
                ELSE 'de' END AS pred_lang
         FROM (
           SELECT lang,
             len(list_filter(w, t -> list_contains(['the','a','of','and','is'], t))) s_en,
             len(list_filter(w, t -> list_contains(['le','la','et','les','des'], t))) s_fr,
             len(list_filter(w, t -> list_contains(['el','los','las','es','una'], t))) s_es,
             len(list_filter(w, t -> list_contains(['der','die','und','das','ist'], t))) s_de,
             len(list_filter(w, t -> list_contains(['的','是','了'], t))) s_zh
           FROM (SELECT lang, regexp_split_to_array(trim(text),'\s+') w
                 FROM documents) a) b) c
       GROUP BY lang, pred_lang ORDER BY lang, pred_lang"""

  // ---------------------------------------------------------------- q34
  /** Document fingerprinting: normalized content hash + min shingle
    * hash (winnowing-lite). */
  private def q34(s: SparkSession, d: String): DataFrame = {
    // min over the shingle MULTISET equals min over the set, so the
    // codegen'd shingle-row path + a min aggregate replaces the
    // interpreted array-lambda formulation (7s -> sub-second at sf0.1)
    val mins = Dedup.shingleRowsRaw(Tables.documents(s, d),
        "doc_id", "text", 3)
      .groupBy("id").agg(min(md5(col("s"))).as("min_shingle_hash"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        Dedup.contentHash(col("text")).as("content_hash"))
      .join(mins, col("doc_id") === col("id"))
      .select("doc_id", "content_hash", "min_shingle_hash")
      .orderBy("doc_id")
  }

  private val q34Sql =
    """SELECT doc_id,
       md5(lower(regexp_replace(trim(text),'\s+',' ','g'))) AS content_hash,
       list_min(list_transform(
         CASE WHEN len(w) >= 3
              THEN list_distinct(list_transform(range(1, len(w)-1),
                     i -> array_to_string(w[i:i+2], ' ')))
              ELSE [array_to_string(w, ' ')] END,
         s -> md5(s))) AS min_shingle_hash
       FROM (SELECT doc_id, text,
               regexp_split_to_array(trim(text),'\s+') AS w
             FROM documents) t
       ORDER BY doc_id"""

  // ---------------------------------------------------------------- q35
  /** Exact dedup by normalized content hash. */
  private def q35(s: SparkSession, d: String): DataFrame =
    // Dedup.exact's aggregation over the session fingerprint store
    // (graft.Kernels.docContentHash) — the text is hashed once per
    // (application, dir), shared with q200's exact stage
    graft.Kernels.docContentHash(s, d)
      .groupBy("content_hash")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("group_size"))
      .orderBy("keep_id")

  private val q35Sql =
    """SELECT md5(lower(regexp_replace(trim(text),'\s+',' ','g')))
         AS content_hash,
       min(doc_id) AS keep_id, count(*) AS group_size
       FROM documents GROUP BY 1 ORDER BY keep_id"""

  // shared oracle CTE: word shingles exactly as TextFunctions.wordShingles
  private[queries] val shingleCte =
    """WITH wa AS (SELECT doc_id, regexp_split_to_array(trim(text),'\s+') w
                   FROM documents),
       sh AS (SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct(list_transform(range(1, len(w)-1),
                     i -> array_to_string(w[i:i+2], ' ')))
              ELSE [array_to_string(w, ' ')] END AS sh
         FROM wa)"""

  // ---------------------------------------------------------------- q36
  /** MinHash + banded LSH near-dup pairs, Jaccard-verified. */
  private def q36(s: SparkSession, d: String): DataFrame =
    graft.Kernels.minhashPairs(s, d, threshold = 0.8)
      .orderBy("doc_a", "doc_b")

  // minhash signature + band-key CTEs exactly as Dedup.bandedKeys —
  // shared by q36/q71 (self-join pairs) and q84 (incremental batch ×
  // corpus), so the implementations can never drift apart
  private[queries] val minhashBandCtes = shingleCte +
    """,
       hv AS (SELECT doc_id, sh,
         list_transform(sh, s ->
           (('0x' || substr(md5(s),1,15))::BIGINT) % 2147483647) AS hs
         FROM sh),
       sig AS (SELECT doc_id, sh,
         list_transform(range(0, 12), k ->
           list_min(list_transform(hs, h ->
             ((k*2+1) * h + k*7919) % 2147483647))) AS sig
         FROM hv),
       bands AS (SELECT doc_id,
         b, md5(b::VARCHAR || '|' || array_to_string(sig[b*2+1:b*2+2], '|'))
           AS key
         FROM sig, range(0, 6) t(b))"""

  // the q36 pipeline WITHOUT the final ORDER BY — reused verbatim as
  // the pair source of the clustering oracle (q71), so the two queries
  // can never drift apart; threshold-parameterized since round 10 so
  // q315's planner can read the SAME kernel at a wider net (0.5)
  private[queries] def q36CoreAt(threshold: Double): String =
    minhashBandCtes +
    s""",
       cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                FROM bands a JOIN bands b
                  ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
       SELECT da AS doc_a, db AS doc_b,
         round(len(list_intersect(x.sh, y.sh))::DOUBLE /
           (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 4)
           AS jaccard
       FROM cand JOIN sh x ON x.doc_id = da JOIN sh y ON y.doc_id = db
       WHERE round(len(list_intersect(x.sh, y.sh))::DOUBLE /
           (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 4)
         >= $threshold"""

  private[queries] val q36Core = q36CoreAt(0.8)

  private val q36Sql = q36Core + "\n       ORDER BY doc_a, doc_b"

  // ---------------------------------------------------------------- q37
  /** SimHash near-dup pairs (60-bit, 4×15-bit bands, hamming ≤ 3). */
  private def q37(s: SparkSession, d: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 3)
      .withColumn("hamming_dist", col("hamming_dist").cast("int"))
      .orderBy("doc_a", "doc_b")

  private val q37Sql =
    """WITH toks AS (SELECT doc_id,
         list_distinct(regexp_split_to_array(trim(text),'\s+')) w
         FROM documents),
       th AS (SELECT doc_id,
         list_transform(w, t -> ('0x' || substr(md5(t),1,15))::BIGINT) AS th
         FROM toks),
       sims AS (SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 60), i ->
           CASE WHEN len(list_filter(th, h -> ((h >> i) & 1) = 1)) * 2
                     > len(th)
                THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS sim
         FROM th),
       banded AS (SELECT doc_id, sim, b, (sim >> (15*b)) & 32767 AS seg
                  FROM sims, range(0, 4) t(b)),
       cand AS (SELECT DISTINCT a.doc_id AS da, a.sim AS sa,
                       b.doc_id AS db, b.sim AS sb
                FROM banded a JOIN banded b
                  ON a.b = b.b AND a.seg = b.seg AND a.doc_id < b.doc_id)
       SELECT da AS doc_a, db AS doc_b,
         CAST(bit_count(xor(sa, sb)) AS INT) AS hamming_dist
       FROM cand WHERE bit_count(xor(sa, sb)) <= 3
       ORDER BY doc_a, doc_b"""

  // ---------------------------------------------------------------- q38
  /** Exact n-gram Jaccard dedup via the frequency-capped inverted
    * shingle index: candidates from co-occurrence on shingles with
    * document frequency ≤ 16; reported Jaccard from the FULL shingle
    * sets of candidate docs (the cap bounds fan-out, never distorts a
    * value). The cap is part of the oracled contract below; at sf0.01
    * the max shingle df is 7, so the cap is exercised structurally here
    * and in the binding regime by DedupSpec's capped-corpus cases.
    */
  private def q38(s: SparkSession, d: String): DataFrame =
    // candidate generation + verification run per call; the df-capped
    // index itself comes from the session's persisted-index kernel
    // (graft.Kernels) — the production split for a stable corpus
    Dedup.jaccardPairsExact(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.8, maxShingleDf = 16,
        precomputed = Some(graft.Kernels.cappedShingleIndex(s, d,
          shingleN = 3, maxShingleDf = 16)))
      .orderBy("doc_a", "doc_b")

  private val q38Sql = shingleCte +
    """,
       inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       pairable AS (SELECT s FROM (
           SELECT s, count(*) AS df FROM inv GROUP BY s) t
         WHERE df BETWEEN 2 AND 16),
       cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                FROM inv a JOIN inv b
                  ON a.s = b.s AND a.doc_id < b.doc_id
                WHERE a.s IN (SELECT s FROM pairable))
       SELECT da AS doc_a, db AS doc_b,
         round(len(list_intersect(x.sh, y.sh))::DOUBLE /
           (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 4)
           AS jaccard
       FROM cand JOIN sh x ON x.doc_id = da JOIN sh y ON y.doc_id = db
       WHERE round(len(list_intersect(x.sh, y.sh))::DOUBLE /
           (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 4) >= 0.8
       ORDER BY doc_a, doc_b"""

  // ---------------------------------------------------------------- q39
  /** Embedding-cosine near-dup pairs (brute-force baseline). */
  private def q39(s: SparkSession, d: String): DataFrame =
    Dedup.embeddingPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.45)
      .orderBy("vec_a", "vec_b")

  private val q39Sql =
    """SELECT vec_a, vec_b, cosine FROM (
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
             4) AS cosine
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t
       WHERE cosine >= 0.45
       ORDER BY vec_a, vec_b"""

  // --------------------------------------------------------------- q273
  /** Unicode-normalization audit — the canonicalization pre-flight the
    * dedup/fingerprint family assumes: decomposed sequences ("e" +
    * U+0301) are byte-different from their precomposed forms ("é"), so
    * un-normalized text silently defeats exact-dup, MinHash and
    * fingerprint kernels. Per language: documents whose text is not
    * NFC and how many combining marks composition removes. The
    * synthetic corpus is pure ASCII, so (q77/q88 convention) the query
    * deterministically APPENDS two decomposed sequences to every 5th
    * document — injection keeps the oracle non-vacuous. Engine side is
    * the native codegen'd [[graft.functions.expressions.NfcNormalize]]
    * (Spark has no NFC builtin); DuckDB mirrors with `nfc_normalize`
    * (both UAX#15). Map-only over the corpus + one |langs|-row
    * aggregation. */
  private def q273(s: SparkSession, d: String): DataFrame = {
    val inj = "cafe\u0301 nai\u0308ve" // decomposed: e+U+0301, i+U+0308
    val docs = Tables.documents(s, d)
      .select(col("lang"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(col("text"), lit(" " + inj)))
          .otherwise(col("text")).as("text"))
    val norm = graft.functions.TextFunctions.nfc(col("text"))
    docs.select(col("lang"),
        (col("text") =!= norm).as("denorm"),
        (length(col("text")) - length(norm)).cast("long").as("delta"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("denorm"), 1L).otherwise(0L)).as("n_denormalized"),
        sum("delta").as("marks_composed"))
      .orderBy("lang")
  }

  private val q273Sql = {
    val inj = "cafe\u0301 nai\u0308ve"
    s"""WITH inj AS (SELECT lang,
           CASE WHEN doc_id % 5 = 0 THEN text || ' $inj'
                ELSE text END AS text
         FROM documents),
       n AS (SELECT lang, text, nfc_normalize(text) AS nt FROM inj)
       SELECT lang, count(*) AS n_docs,
         CAST(sum(CASE WHEN text != nt THEN 1 ELSE 0 END) AS BIGINT)
           AS n_denormalized,
         CAST(sum(length(text) - length(nt)) AS BIGINT)
           AS marks_composed
       FROM n GROUP BY lang ORDER BY lang"""
  }

  // --------------------------------------------------------------- q275
  /** Embargoed temporal split (purged walk-forward, de Prado) — the
    * time-series counterpart of q69's hash split and q264's
    * cluster-safe split: train = days before the 80%-of-range cut,
    * test = days from cut + 3 on, and the 3-day embargo band between
    * them is PURGED, so a 3-day forward label window computed on any
    * train row can never overlap test. Graded next to the counterfeit
    * no-embargo baseline (the q264 convention): under a plain cut the
    * same horizon leaks from the last 2 train days — the row shows
    * exactly what the embargo prevents. All day arithmetic is exact
    * integers; min/max day are two driver scalars (the reference's
    * reduce-to-driver pattern); ONE conditional aggregation pass. */
  private def q275(s: SparkSession, d: String): DataFrame = {
    val horizon = 3L // forward label window: days t .. t+2
    val embargo = 3L
    val day = datediff(to_date(col("ts")),
      lit("1990-01-01").cast("date")).cast("long")
    val ev = Tables.events(s, d)
      .select(col("user_id"), day.as("day"))
    val r = ev.agg(min("day"), max("day")).head()
    val (d0, d1) = (r.getLong(0), r.getLong(1))
    val cut = d0 + (d1 - d0) * 8L / 10L
    def split(name: String, pred: org.apache.spark.sql.Column,
              leakPred: org.apache.spark.sql.Column): DataFrame =
      ev.filter(pred).agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min("day").as("d_min"), max("day").as("d_max"),
        coalesce(sum(when(leakPred, 1L).otherwise(0L)), lit(0L))
          .as("horizon_leaks"))
        .select(lit(name).as("split"), col("n_events"), col("n_users"),
          col("d_min"), col("d_max"), col("horizon_leaks"))
    // embargoed: test starts at cut+3, so train day + 2 < cut + 3 ⇒ 0
    val train = split("1_train", col("day") < cut,
      col("day") + (horizon - 1L) >= cut + embargo)
    val purged = split("2_purged",
      col("day") >= cut && col("day") < cut + embargo, lit(false))
    val test = split("3_test", col("day") >= cut + embargo, lit(false))
    // counterfeit: plain cut (no embargo) — the same horizon leaks
    val counterfeit = split("0_counterfeit_no_embargo", col("day") < cut,
      col("day") + (horizon - 1L) >= cut)
    counterfeit.unionByName(train).unionByName(purged).unionByName(test)
      .orderBy("split")
  }

  private val q275Sql =
    """WITH ev AS (SELECT user_id,
           datediff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS day
         FROM events),
       b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
       c AS (SELECT d0 + (d1 - d0) * 8 // 10 AS cut FROM b)
       SELECT * FROM (
         SELECT '0_counterfeit_no_embargo' AS split, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           min(day) AS d_min, max(day) AS d_max,
           CAST(sum(CASE WHEN day + 2 >= cut THEN 1 ELSE 0 END) AS BIGINT)
             AS horizon_leaks
         FROM ev, c WHERE day < cut
         UNION ALL
         SELECT '1_train', count(*), count(DISTINCT user_id),
           min(day), max(day),
           CAST(sum(CASE WHEN day + 2 >= cut + 3 THEN 1 ELSE 0 END)
             AS BIGINT)
         FROM ev, c WHERE day < cut
         UNION ALL
         SELECT '2_purged', count(*), count(DISTINCT user_id),
           min(day), max(day), 0::BIGINT
         FROM ev, c WHERE day >= cut AND day < cut + 3
         UNION ALL
         SELECT '3_test', count(*), count(DISTINCT user_id),
           min(day), max(day), 0::BIGINT
         FROM ev, c WHERE day >= cut + 3)
       ORDER BY split"""

  // --------------------------------------------------------------- q274
  /** Reciprocal best match (mutual nearest neighbor) between two
    * embedding sets — the alignment primitive under bilingual-lexicon
    * induction / dataset linking / SemDeDup variants: a pair (a, b)
    * aligns only if b is a's top-1 in set B AND a is b's top-1 back in
    * set A (one-directional best matches are notoriously hub-polluted;
    * the round-trip test is the standard filter). Sets = the even /
    * odd vec_id halves; graded for the q40-convention sampled query
    * set. Scale shape: the sampled A queries broadcast against one B
    * scan, then ONLY their ≤\|sample\| best matches broadcast back
    * against one A scan — never half×half. Ranking is the
    * [[Similarity.knnBruteForce]] kernel (4-dp-rounded cosine, id
    * tie-break), so the oracle replays both directions exactly. */
  private def q274(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val a = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val b = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val fwd = Similarity.knnBruteForce(b, a.filter(col("vec_id") < 32),
        "vec_id", "embedding", k = 1)
      .select(col("query_id").as("a_id"), col("neighbor_id").as("b_id"),
        col("cosine"))
    val backQ = fwd.select(col("b_id").as("vec_id")).distinct()
      .join(emb, "vec_id")
    val back = Similarity.knnBruteForce(a, backQ, "vec_id", "embedding",
        k = 1)
      .select(col("query_id").as("b_id"),
        col("neighbor_id").as("back_id"))
    fwd.join(back, "b_id")
      .select(col("a_id"), col("b_id"), col("cosine"),
        (col("back_id") === col("a_id")).as("mutual"))
      .orderBy("a_id")
  }

  private val q274Sql =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       a AS (SELECT * FROM e WHERE vec_id % 2 = 0),
       b AS (SELECT * FROM e WHERE vec_id % 2 = 1),
       fwd AS (SELECT * FROM (
           SELECT q.vec_id AS a_id, c.vec_id AS b_id,
             round(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))), 4) AS cosine,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               round(list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))), 4) DESC,
               c.vec_id ASC) AS rn
           FROM a q JOIN b c ON q.vec_id != c.vec_id
           WHERE q.vec_id < 32) t WHERE rn = 1),
       bq AS (SELECT DISTINCT b_id FROM fwd),
       back AS (SELECT * FROM (
           SELECT q.vec_id AS b_id, c.vec_id AS back_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               round(list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))), 4) DESC,
               c.vec_id ASC) AS rn
           FROM (SELECT e.* FROM bq JOIN e ON e.vec_id = bq.b_id) q
           JOIN a c ON q.vec_id != c.vec_id) t WHERE rn = 1)
       SELECT fwd.a_id, fwd.b_id, fwd.cosine,
         back.back_id = fwd.a_id AS mutual
       FROM fwd JOIN back ON back.b_id = fwd.b_id
       ORDER BY a_id"""

  // --------------------------------------------------------------- q269
  /** Exact Local Outlier Factor over the embedding corpus for the
    * q40 sampled query set ([[Similarity.lof]], k = 5) — the
    * density-adaptive curation signal a global distance threshold
    * can't give (a point in a sparse-but-uniform region scores ~1, a
    * point whose neighbors are mutually tight scores ≫1). Three
    * bounded-broadcast kNN rounds (queries → neighbors → their
    * k-distances); every post-kNN step is integer arithmetic (see the
    * operator Scaladoc), and the oracle replays the identical
    * neighbor expansion in SQL. */
  private def q269(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.lof(emb, "vec_id", "embedding", k = 5, col("vec_id") < 5)
  }

  private val q269Sql = {
    def knn(src: String): String =
      s"""SELECT * FROM (
           SELECT p.pid, c.vec_id AS nid,
             CAST(floor((list_dot_product(p.pv, p.pv)
               + list_dot_product(c.v, c.v)
               - 2 * list_dot_product(p.pv, c.v)) * 1e6 + 0.5)
               AS BIGINT) AS du,
             row_number() OVER (PARTITION BY p.pid ORDER BY
               CAST(floor((list_dot_product(p.pv, p.pv)
                 + list_dot_product(c.v, c.v)
                 - 2 * list_dot_product(p.pv, c.v)) * 1e6 + 0.5)
                 AS BIGINT) ASC, c.vec_id ASC) AS rn
           FROM $src p JOIN e c ON c.vec_id != p.pid) t
         WHERE rn <= 5"""
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       q0 AS (SELECT vec_id AS pid, v AS pv FROM e WHERE vec_id < 5),
       n1 AS (${knn("q0")}),
       q1 AS (SELECT DISTINCT n1.nid AS pid, e.v AS pv
              FROM n1 JOIN e ON e.vec_id = n1.nid),
       n2 AS (${knn("q1")}),
       q2 AS (SELECT DISTINCT n2.nid AS pid, e.v AS pv
              FROM n2 JOIN e ON e.vec_id = n2.nid),
       n3 AS (${knn("q2")}),
       kd1 AS (SELECT pid AS nid, max(du) AS kd FROM n2 GROUP BY pid),
       kd2 AS (SELECT pid AS nid, max(du) AS kd FROM n3 GROUP BY pid),
       ilq AS (SELECT n1.pid,
                 greatest(CAST(sum(greatest(n1.du, kd1.kd)) AS BIGINT), 1)
                   AS ilrd
               FROM n1 JOIN kd1 ON kd1.nid = n1.nid GROUP BY n1.pid),
       ils AS (SELECT n2.pid,
                 greatest(CAST(sum(greatest(n2.du, kd2.kd)) AS BIGINT), 1)
                   AS ilrd
               FROM n2 JOIN kd2 ON kd2.nid = n2.nid GROUP BY n2.pid),
       ri AS (SELECT pid AS nid,
                (2000000000000000000 + ilrd) // (2 * ilrd) AS rinv
              FROM ils),
       agg AS (SELECT n1.pid, CAST(sum(ri.rinv) AS BIGINT) AS rsum,
                 max(n1.du) AS kdu
               FROM n1 JOIN ri ON ri.nid = n1.nid GROUP BY n1.pid)
       SELECT agg.pid AS query_id,
         floor((kdu::DOUBLE / 1e6) * 1e6 + 0.5) / 1e6 AS kdist_sq,
         floor(((ilq.ilrd::HUGEINT * agg.rsum::HUGEINT)::DOUBLE / 5e18)
               * 1e6 + 0.5) / 1e6 AS lof
       FROM agg JOIN ilq ON ilq.pid = agg.pid
       ORDER BY query_id"""
  }

  // ---------------------------------------------------------------- q40
  /** Exact cosine top-k (ANN brute-force baseline). */
  private def q40(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.knnBruteForce(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 5)
      .withColumn("rank", col("rank").cast("int"))
      .orderBy("query_id", "rank")
  }

  private val q40Sql =
    """SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank FROM (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
             / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
             4) AS cosine,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
               / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
               4) DESC, c.vec_id ASC) AS rn
         FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
         WHERE q.vec_id < 5) t
       WHERE rn <= 5
       ORDER BY query_id, rank"""

  // ---------------------------------------------------------------- q41
  /** LSH-bucketed multi-probe ANN (scale path). The oracle SQL is
    * GENERATED: the deterministic ±1 hyperplane matrix is rendered
    * into DuckDB literals, so even the LSH bucketing is value-checked
    * end to end (bucket bits, hamming-1 probes, in-bucket ranking). */
  private def q41(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.knnLsh(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 5)
      .withColumn("rank", col("rank").cast("int"))
      .orderBy("query_id", "rank")
  }

  /** DuckDB rendering of the deterministic sign-LSH bucketing
    * ([[graft.functions.VectorFunctions.lshBucket]] with the fixed-seed
    * plane matrix): returns (bucketExpr over an `embedding` column,
    * probe-list expr over a `bucket` column). Shared by the q41/q53
    * GENERATED oracles, so the LSH layer itself — bucket bits and
    * hamming-1 probes — is value-checked end to end in both.
    */
  /** One rendering of a ±1 hyperplane as a DuckDB list literal, shared
    * by every generated-oracle LSH query — a format change must hit
    * q41 and q53 together or their oracles diverge. */
  private def planeLit(p: Seq[Double]): String =
    p.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  private[queries] def lshBucketSql(numPlanes: Int,
                                    dim: Int): (String, String) = {
    val planes = graft.functions.VectorFunctions.randomPlanes(numPlanes, dim)
    // Spark's lshBucket folds acc*2 + sign, so plane i lands at bit
    // (numPlanes-1-i)
    val bucketExpr = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ${planeLit(p)}) > 0 " +
        s"THEN ${1L << (numPlanes - 1 - i)} ELSE 0 END)"
    }.mkString("(", " + ", ")")
    val probeList = ("bucket" +: (0 until numPlanes)
      .map(i => s"xor(bucket, ${1L << i})")).mkString("[", ", ", "]")
    (bucketExpr, probeList)
  }

  /** DuckDB rendering of [[Dedup.embeddingPairsBucketed]]'s banded
    * key family: band b's key is `b·2^P + bucket_b` where bucket_b
    * packs the P sign bits of plane slice [bP, (b+1)P) exactly like
    * `lshBucket` (plane j within the band lands at bit P−1−j).
    * Returns a DuckDB list literal of the per-band key expressions
    * over an `embedding` column.
    */
  private def lshBandKeysSql(planesPerBand: Int, bands: Int,
                             dim: Int): String = {
    val planes = graft.functions.VectorFunctions
      .randomPlanes(planesPerBand * bands, dim)
    (0 until bands).map { b =>
      val bits = (0 until planesPerBand).map { j =>
        val p = planes(b * planesPerBand + j)
        s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), " +
          s"${planeLit(p)}) > 0 " +
          s"THEN ${1L << (planesPerBand - 1 - j)} ELSE 0 END)"
      }.mkString(" + ")
      s"(${b.toLong << planesPerBand} + $bits)"
    }.mkString("[", ", ", "]")
  }

  private val q41Sql: String = {
    val (bucketExpr, probeList) = lshBucketSql(6, 64)
    s"""WITH c AS (SELECT vec_id, embedding, $bucketExpr AS bucket,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
         FROM embeddings),
       q AS (SELECT vec_id, embedding, bucket, nrm FROM c WHERE vec_id < 5),
       probes AS (SELECT vec_id, embedding, nrm,
                    unnest($probeList) AS pb FROM q),
       cand AS (SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                  round(list_dot_product(CAST(p.embedding AS DOUBLE[]),
                                         CAST(c.embedding AS DOUBLE[]))
                        / (p.nrm * c.nrm), 4) AS cosine
                FROM probes p JOIN c
                  ON c.bucket = p.pb AND c.vec_id != p.vec_id),
       ranked AS (SELECT query_id, neighbor_id, cosine,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id ASC) AS rn
                  FROM cand)
       SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
       FROM ranked WHERE rn <= 5
       ORDER BY query_id, rank"""
  }

  // ---------------------------------------------------------------- q53
  /** Banded sign-LSH embedding near-dup — the scale-safe DEFAULT path
    * for embedding dedup (q39 brute force is its ground-truth baseline
    * and recall yardstick, see DedupSpec). Same threshold as q39 so
    * the two result sets are directly comparable. The oracle is
    * GENERATED with the plane literals (like q41), so band keys,
    * candidate de-dup AND cosine verification are all value-checked.
    */
  private def q53(s: SparkSession, d: String): DataFrame =
    Dedup.embeddingPairsBucketed(Tables.embeddings(s, d), "vec_id",
        "embedding", threshold = 0.45)
      .orderBy("vec_a", "vec_b")

  /** q53's pair pipeline as a reusable CTE chain (ends in `ep`):
    * shared with q96's clustering oracle exactly like `q36Core` is
    * shared with q71's. */
  private[queries] val q53PairsCte: String = {
    val keyList = lshBandKeysSql(planesPerBand = 4, bands = 12, dim = 64)
    s"""v AS (SELECT vec_id, embedding,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
         FROM embeddings),
       banded AS (SELECT vec_id, unnest($keyList) AS key FROM v),
       cand AS (SELECT DISTINCT a.vec_id AS ida, b.vec_id AS idb
                FROM banded a JOIN banded b
                  ON b.key = a.key AND a.vec_id < b.vec_id),
       ep AS (SELECT ida AS vec_a, idb AS vec_b,
         round(list_dot_product(CAST(x.embedding AS DOUBLE[]),
                                CAST(y.embedding AS DOUBLE[]))
           / (x.nrm * y.nrm), 4) AS cosine
       FROM cand JOIN v x ON x.vec_id = ida JOIN v y ON y.vec_id = idb
       WHERE round(list_dot_product(CAST(x.embedding AS DOUBLE[]),
                                    CAST(y.embedding AS DOUBLE[]))
           / (x.nrm * y.nrm), 4) >= 0.45)"""
  }

  private val q53Sql: String =
    s"""WITH $q53PairsCte
       SELECT vec_a, vec_b, cosine FROM ep ORDER BY vec_a, vec_b"""

  // ---------------------------------------------------------------- q42
  /** Multimodal frame-sampling plumbing over binary payloads. */
  private def q42(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.fromDocuments(Tables.documents(s, d)))
      .orderBy("media_id", "frame_idx")

  private val q42Sql =
    """SELECT media_id, mime, CAST(n_bytes AS INT) AS n_bytes,
       CAST(f AS INT) AS frame_idx,
       CAST((n_bytes*31 + f) % 997 AS INT) AS frame_signature
       FROM (SELECT doc_id AS media_id, 'text/plain' AS mime,
               octet_length(CAST(text AS BLOB)) AS n_bytes,
               unnest(range(0, octet_length(CAST(text AS BLOB)) % 3 + 1)) AS f
             FROM documents) t
       ORDER BY media_id, frame_idx"""

  // ---------------------------------------------------------------- q43
  /** Multimodal decode plumbing: binary payload → typed features via
    * the partition-iterator stub decoder. Oracle caveat: Spark sums the
    * first 16 payload BYTES while the DuckDB mirror sums the first 16
    * code points — equivalent because this corpus is ASCII (verified);
    * a non-ASCII regeneration would need an octet-level oracle. */
  private def q43(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.fromDocuments(Tables.documents(s, d))
      .select(col("media_id"), col("payload"), col("meta.mime").as("mime"))
      .as[MediaFile]
    Multimodal.decodeFeatures(media).toDF()
      .withColumn("brightness", round(col("brightness"), 4))
      .orderBy("media_id")
  }

  private val q43Sql =
    """SELECT media_id, mime, CAST(n_bytes AS INT) AS n_bytes,
       CAST(64 + n_bytes % 64 AS INT) AS width,
       CAST(64 + (n_bytes // 2) % 64 AS INT) AS height,
       round((list_sum(list_transform(range(1, LEAST(16, n_bytes)+1),
           i -> ascii(substr(text, i, 1)))) % 256) / 255.0, 4) AS brightness
       FROM (SELECT doc_id AS media_id, 'text/plain' AS mime,
               octet_length(CAST(text AS BLOB)) AS n_bytes, text
             FROM documents) t
       ORDER BY media_id"""

  // ---------------------------------------------------------------- q59
  /** REAL-codec multimodal path: documents encoded as genuine binary
    * PPM (P6) images, then DECODED by a real header parser
    * ([[graft.operators.MediaCodec]]) — dimensions and brightness come
    * from the parsed file. The oracle reconstructs the deterministic
    * encoding arithmetic from the text (ASCII corpus, like q43):
    * raster = UTF-8 bytes zero-padded to 8×h×3, brightness = byte
    * mean / 255. */
  private def q59(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.decodeImageFeatures(
        Multimodal.toPpmMedia(Tables.documents(s, d))).toDF()
      .withColumn("brightness", round(col("brightness"), 4))
      .orderBy("media_id")
  }

  private val q59Sql =
    """SELECT media_id, mime,
       CAST(length('P6' || chr(10) || '8 ' || h || chr(10) ||
              '255' || chr(10)) + 24 * h AS INT) AS n_bytes,
       CAST(8 AS INT) AS width, CAST(h AS INT) AS height,
       round(coalesce(list_sum(list_transform(range(1, length(text) + 1),
           i -> ascii(substr(text, i, 1)))), 0)
         / (24 * h * 255.0), 4) AS brightness
       FROM (SELECT doc_id AS media_id,
               'image/x-portable-pixmap' AS mime, text,
               octet_length(CAST(text AS BLOB)) // 24 + 1 AS h
             FROM documents) t
       ORDER BY media_id"""

  // --------------------------------------------------------------- q257
  /** Multimodal RESIZE — the fourth verb of the image-pipeline set
    * (decode q59 / feature-extract q43 / frame-sample q42/q155):
    * nearest-neighbor 2× downsample through
    * [[graft.operators.Multimodal.resizeImageFeatures]], which
    * decodes the real PPM, samples (2x, 2y), RE-ENCODES and
    * RE-DECODES so the result certifies a valid resized artifact.
    * The oracle reconstructs the sampled-byte arithmetic from the
    * text (ASCII corpus, q59's convention): kept raster positions are
    * those whose pixel has even x and even y; zero padding beyond the
    * text contributes nothing.
    */
  private def q257(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.resizeImageFeatures(
        Multimodal.toPpmMedia(Tables.documents(s, d)), factor = 2).toDF()
      .withColumn("brightness", round(col("brightness"), 4))
      .orderBy("media_id")
  }

  private val q257Sql =
    """SELECT media_id, mime,
       CAST(length('P6' || chr(10) || '4 ' || nh || chr(10) ||
              '255' || chr(10)) + 12 * nh AS INT) AS n_bytes,
       CAST(4 AS INT) AS width, CAST(nh AS INT) AS height,
       round(coalesce(list_sum(list_transform(range(1, length(text) + 1),
           i -> CASE WHEN ((i - 1) // 3) % 8 % 2 = 0
                      AND (((i - 1) // 3) // 8) % 2 = 0
                     THEN ascii(substr(text, i, 1)) ELSE 0 END)), 0)
         / (12 * nh * 255.0), 4) AS brightness
       FROM (SELECT doc_id AS media_id,
               'image/x-portable-pixmap' AS mime, text,
               (octet_length(CAST(text AS BLOB)) // 24 + 1 + 1) // 2 AS nh
             FROM documents) t
       ORDER BY media_id"""

  // --------------------------------------------------------------- q142
  /** COMPRESSED-codec multimodal path: documents encoded as genuine
    * PNG files ([[graft.operators.MediaCodec.encodePng]] — IHDR/IDAT/
    * IEND, zlib deflate, per-chunk CRC-32), then DECODED for real
    * (CRC verification, inflate, scanline-filter reversal). The raster
    * arithmetic matches q59's PPM path by construction, so the oracle
    * replays it from the text; the compressed byte size is a deflate
    * artifact and deliberately NOT part of the result — what the query
    * certifies is that dimensions and brightness survive a real
    * compress/decompress roundtrip. */
  private def q142(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.decodeImageFeatures(
        Multimodal.toPngMedia(Tables.documents(s, d))).toDF()
      .withColumn("brightness", round(col("brightness"), 4))
      .select("media_id", "mime", "width", "height", "brightness")
      .orderBy("media_id")
  }

  private val q142Sql =
    """SELECT media_id, mime, CAST(8 AS INT) AS width,
       CAST(h AS INT) AS height,
       round(coalesce(list_sum(list_transform(range(1, length(text) + 1),
           i -> ascii(substr(text, i, 1)))), 0)
         / (24 * h * 255.0), 4) AS brightness
       FROM (SELECT doc_id AS media_id, 'image/png' AS mime, text,
               octet_length(CAST(text AS BLOB)) // 24 + 1 AS h
             FROM documents) t
       ORDER BY media_id"""

  // --------------------------------------------------------------- q146
  /** LOSSY-codec multimodal path: documents encoded as genuine baseline
    * JPEGs ([[graft.operators.JpegCodec]] — DCT, quality-90 Annex-K
    * quantization, Huffman entropy coding, JFIF markers), then DECODED
    * for real (marker walk, Huffman decode, dequantize, IDCT, YCbCr→
    * RGB). Unlike PNG (q142) the roundtrip is lossy, so decoded
    * brightness carries quantization error; the query certifies the
    * q45/q133 error CONTRACT instead of the raw value — dimensions
    * exact, plus a `bright_ok` flag that the decoded brightness lies
    * within ±0.02 of the deterministic raster brightness the oracle
    * recomputes from the text. A decode failure drops the row and
    * fails the rows gate — silent garbage cannot pass.
    */
  private def q146(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val feats = Multimodal.decodeImageFeatures(
        Multimodal.toJpegMedia(Tables.documents(s, d))).toDF()
      .select("media_id", "mime", "width", "height", "brightness")
    val expected = Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      (expr("aggregate(transform(sequence(1, char_length(text)), " +
          "i -> ascii(substr(text, i, 1))), 0, (a, x) -> a + x)")
          .cast("double") /
        ((expr("octet_length(text) div 24") + 1) * 24 * 255.0))
        .as("expected_raw"))
    feats.join(expected, "media_id")
      .select(col("media_id"), col("mime"), col("width"), col("height"),
        round(col("expected_raw"), 4).as("expected_brightness"),
        (abs(col("brightness") - col("expected_raw")) < 0.02)
          .as("bright_ok"))
      .orderBy("media_id")
  }

  private val q146Sql =
    """SELECT media_id, mime, CAST(8 AS INT) AS width,
       CAST(h AS INT) AS height,
       round(coalesce(list_sum(list_transform(range(1, length(text) + 1),
           i -> ascii(substr(text, i, 1)))), 0)
         / (24 * h * 255.0), 4) AS expected_brightness,
       TRUE AS bright_ok
       FROM (SELECT doc_id AS media_id, 'image/jpeg' AS mime, text,
               octet_length(CAST(text AS BLOB)) // 24 + 1 AS h
             FROM documents) t
       ORDER BY media_id"""

  // --------------------------------------------------------------- q147
  /** COMPRESSED-audio multimodal path: documents rendered as a
    * deterministic 16 kHz ramp signal ([[graft.operators.Multimodal
    * .toAdpcmMedia]] — byte j targets level `(b_j-128)*256`, 16
    * samples ramping linearly from the previous level), genuinely
    * compressed with mono IMA ADPCM (4 bits/sample, WAV tag 0x0011)
    * and then DECODED for real ([[graft.operators.MediaCodec
    * .decodeWavAdpcm]] — RIFF walk, block-header seeding, nibble
    * reconstruction, fact-chunk trim). ADPCM is lossy, so the query
    * certifies the q146-style error CONTRACT: sample count, rate and
    * duration exact; decoded mean absolute amplitude within ±0.01 of
    * the signal's closed-form mean `-(16·Σp + 7.5·(p₁-pₙ)) /
    * (16n·32768)`, which the oracle recomputes from the text (ASCII
    * corpus — every level is negative, so |mean| = -mean; same
    * ASCII-reliance caveat as q43/q59). A decode failure drops the
    * row and fails the rows gate.
    */
  private def q147(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val feats = Multimodal.decodeAudioFeatures(
        Multimodal.toAdpcmMedia(Tables.documents(s, d))).toDF()
      .select("media_id", "mime", "sample_rate", "n_samples",
        "duration_sec", "mean_abs")
    val n = char_length(col("text"))
    val sumA = expr("aggregate(transform(sequence(1, char_length(text)), " +
        "i -> ascii(substr(text, i, 1))), 0, (a, x) -> a + x)")
      .cast("double")
    val a1 = ascii(substring(col("text"), 1, 1)).cast("double")
    val an = ascii(expr(
      "substr(text, char_length(text), 1)")).cast("double")
    val expected = Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      when(n === 0, 0.0).otherwise(
        -(lit(4096.0) * (sumA - lit(128.0) * n) +
            lit(1920.0) * (a1 - an)) / (lit(524288.0) * n))
        .as("expected_raw"))
    feats.join(expected, "media_id")
      .select(col("media_id"), col("mime"), col("sample_rate"),
        col("n_samples"), round(col("duration_sec"), 4).as("duration_sec"),
        round(col("expected_raw"), 4).as("expected_mean_abs"),
        (abs(col("mean_abs") - col("expected_raw")) < 0.01).as("amp_ok"))
      .orderBy("media_id")
  }

  private val q147Sql =
    """SELECT media_id, mime, CAST(16000 AS INT) AS sample_rate,
       CAST(16 * n AS INT) AS n_samples,
       round(16 * n / 16000.0, 4) AS duration_sec,
       round(CASE WHEN n = 0 THEN 0 ELSE
         -(4096.0 * (list_sum(list_transform(range(1, n + 1),
               i -> ascii(substr(text, i, 1)))) - 128.0 * n)
           + 1920.0 * (ascii(substr(text, 1, 1))
                       - ascii(substr(text, n, 1))))
         / (524288.0 * n) END, 4) AS expected_mean_abs,
       TRUE AS amp_ok
       FROM (SELECT doc_id AS media_id, 'audio/x-adpcm' AS mime, text,
               octet_length(CAST(text AS BLOB)) AS n
             FROM documents) t
       ORDER BY media_id"""

  // --------------------------------------------------------------- q155
  /** VIDEO multimodal path, closing the last stubbed media family:
    * documents rendered as genuine YUV4MPEG2 streams
    * ([[graft.operators.Multimodal.toY4mMedia]] — bytes [f·64,f·64+64)
    * become frame f's 8×8 luma plane; real stream header, FRAME
    * markers, 4:2:0 chroma), then DECODED for real
    * ([[graft.operators.MediaCodec.decodeY4m]] — tag walk, marker
    * check, exact plane lengths) with every-2nd FRAME SAMPLING inside
    * the partition iterator. Per-frame luma sums are exact integers,
    * so the per-doc aggregate is order-independent and the oracle
    * recomputes the sampled-frame statistics in closed form from the
    * text (even 64-byte windows; ASCII-corpus caveat as q59). A
    * decode failure drops the row and fails the rows gate.
    */
  private def q155(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.sampleVideoFrames(
        Multimodal.toY4mMedia(Tables.documents(s, d)), every = 2).toDF()
      .groupBy("media_id", "mime", "width", "height", "n_frames")
      .agg(count(lit(1)).as("n_sampled"),
        round(sum("luma_sum") / (count(lit(1)) * 16320.0), 4)
          .as("avg_luma"),
        round(sum(when(col("frame_idx") === 0, col("luma_sum")))
          / 16320.0, 4).as("first_luma"),
        round(max(struct(col("frame_idx"), col("luma_sum")))
          .getField("luma_sum") / 16320.0, 4).as("last_luma"))
      .orderBy("media_id")
  }

  private val q155Sql =
    """SELECT media_id, mime, CAST(8 AS INT) AS width,
       CAST(8 AS INT) AS height, CAST(nf AS INT) AS n_frames,
       CAST((nf + 1) // 2 AS BIGINT) AS n_sampled,
       round(evensum / (((nf + 1) // 2) * 16320.0), 4) AS avg_luma,
       round(firstsum / 16320.0, 4) AS first_luma,
       round(lastsum / 16320.0, 4) AS last_luma
       FROM (SELECT media_id, mime, nf,
         coalesce(list_sum(list_transform(
           list_filter(range(1, length(text) + 1),
                       i -> ((i - 1) // 64) % 2 = 0),
           i -> ascii(substr(text, i, 1)))), 0) AS evensum,
         coalesce(list_sum(list_transform(
           range(1, least(64, length(text)) + 1),
           i -> ascii(substr(text, i, 1)))), 0) AS firstsum,
         coalesce(list_sum(list_transform(
           range(((nf - 1) // 2) * 2 * 64 + 1,
                 least(((nf - 1) // 2) * 2 * 64 + 64, length(text)) + 1),
           i -> ascii(substr(text, i, 1)))), 0) AS lastsum
         FROM (SELECT doc_id AS media_id, 'video/x-yuv4mpeg' AS mime,
                 text,
                 greatest((octet_length(CAST(text AS BLOB)) - 1) // 64
                          + 1, 1) AS nf
               FROM documents) b) t
       ORDER BY media_id"""

  // ---------------------------------------------------------------- q44
  /** Per-label embedding centroids (first 8 dims) — the building block
    * for IVF-style partitioned ANN. */
  private def q44(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(slice(col("embedding"), 1, 8))
        .as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round(avg(col("v").cast("double")), 4).as("centroid"),
           count(lit(1)).as("n"))
      .withColumn("pos", col("pos").cast("int"))
      .orderBy("label", "pos")

  private val q44Sql =
    """SELECT label, CAST(i-1 AS INT) AS pos,
       round(avg(CAST(embedding[i] AS DOUBLE)), 4) AS centroid,
       count(*) AS n
       FROM embeddings, range(1, 9) t(i)
       GROUP BY label, i ORDER BY label, pos"""

  // ---------------------------------------------------------------- q52
  /** IVF-style ANN: label cells as the coarse quantizer, centroid
    * probing (nprobe=2), in-cell exact ranking. Complements the LSH
    * variant (q41) as the second scale path for similarity search. */
  private def q52(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.knnIvf(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", "label", k = 5, nprobe = 2)
      .withColumn("rank", col("rank").cast("int"))
      .orderBy("query_id", "rank")
  }

  private val q52Sql =
    """WITH cent AS (
         SELECT cell, list(c ORDER BY i) AS cvec FROM (
           SELECT label AS cell, i, avg(CAST(embedding[i] AS DOUBLE)) AS c
           FROM embeddings, range(1, 65) t(i)
           GROUP BY label, i) a
         GROUP BY cell),
       q AS (SELECT vec_id AS query_id, embedding AS qv,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS qn
             FROM embeddings WHERE vec_id < 5),
       probes AS (
         SELECT query_id, qv, qn, cell FROM (
           SELECT q.query_id, q.qv, q.qn, cent.cell,
             row_number() OVER (PARTITION BY q.query_id ORDER BY
               round(list_dot_product(CAST(q.qv AS DOUBLE[]), cvec)
                 / (q.qn * sqrt(list_dot_product(cvec, cvec))), 4) DESC,
               cent.cell ASC) AS crank
           FROM q, cent) p
         WHERE crank <= 2),
       cand AS (
         SELECT p.query_id, e.vec_id AS neighbor_id,
           round(list_dot_product(CAST(p.qv AS DOUBLE[]),
                                  CAST(e.embedding AS DOUBLE[]))
             / (p.qn * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                             CAST(e.embedding AS DOUBLE[])))),
             4) AS cosine
         FROM probes p JOIN embeddings e
           ON e.label = p.cell AND e.vec_id != p.query_id)
       SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank FROM (
         SELECT query_id, neighbor_id, cosine,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id ASC) AS rn
         FROM cand) r
       WHERE rn <= 5 ORDER BY query_id, rank"""

  // ---------------------------------------------------------------- q60
  /** TF-IDF term weighting — the classic corpus-statistics building
    * block (retrieval filtering, keyword extraction) and a pure
    * shuffle-agg pipeline: per-(doc, term) counts → per-term document
    * frequency (a map-side-combinable second agg over the FIRST agg's
    * output, never re-exploding the corpus) → idf join → top-3 terms
    * per doc. Ranking uses the 4-decimal-rounded weight + term as
    * tie-break so both engines rank identically.
    */
  private def q60(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docsDf = Tables.documents(s, d)
    val nDocs = docsDf.count()
    // referenced twice (tf side + df derivation) — without the persist
    // the corpus explode+aggregate subtree executes once per reference
    val tf = docsDf
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(desc("tfidf"), asc("term"))
    val result = tf.join(dfreq, "term")
      .withColumn("tfidf",
        round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 4))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= 3)
      .select("doc_id", "term", "tf", "df", "tfidf", "rnk")
      .orderBy("doc_id", "rnk")
    graft.operators.Exec.owned(result, Seq(tf))
  }

  private val q60Sql =
    """WITH t AS (SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS term
         FROM documents),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
       dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       n AS (SELECT count(*) AS n FROM documents),
       scored AS (SELECT doc_id, term, tf, df,
           round(tf * ln(n.n / df), 4) AS tfidf
         FROM tf JOIN dfreq USING (term), n)
       SELECT doc_id, term, tf, df, tfidf, CAST(rnk AS INT) AS rnk FROM (
         SELECT doc_id, term, tf, df, tfidf,
           row_number() OVER (PARTITION BY doc_id
             ORDER BY tfidf DESC, term ASC) AS rnk
         FROM scored) z
       WHERE rnk <= 3
       ORDER BY doc_id, rnk"""

  // ---------------------------------------------------------------- q47
  /** Rabin–Karp rolling-hash fingerprints (raw + normalized text) via
    * the native codegen'd RollingHash expression; DuckDB mirrors the
    * fold with list_reduce. */
  private def q47(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        rollingHash(col("text")).as("fp"),
        rollingHash(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
          .as("fp_norm"))
      .orderBy("doc_id")

  private val q47Sql =
    """SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT,
           list_transform(range(1, length(text)+1),
             i -> ascii(substr(text, i, 1))::BIGINT)),
         (acc, c) -> (acc * 31 + c) % 2147483647) AS fp,
       list_reduce(list_prepend(0::BIGINT,
           list_transform(range(1, length(n)+1),
             i -> ascii(substr(n, i, 1))::BIGINT)),
         (acc, c) -> (acc * 31 + c) % 2147483647) AS fp_norm
       FROM (SELECT doc_id, text,
               lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS n
             FROM documents) t
       ORDER BY doc_id"""

  // ---------------------------------------------------------------- q69
  /** Deterministic train/val/test split
    * ([[graft.operators.Sampling.split]], 80/10/10 under salt "v1"):
    * split membership is a pure function of (salt, doc_id) — same
    * assignment on any cluster or engine, which is what makes a
    * training set auditable. The oracle recomputes the md5 bucket
    * arithmetic exactly. */
  private def q69(s: SparkSession, d: String): DataFrame =
    Sampling.split(Tables.documents(s, d), "doc_id", "v1",
        trainPct = 80, valPct = 10)
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
           sum("n_chars").cast("long").as("sum_chars"))
      .orderBy("split", "lang")

  private val q69Sql =
    """SELECT split, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
       FROM (SELECT lang, n_chars,
         CASE WHEN b < 80 THEN 'train'
              WHEN b < 90 THEN 'val'
              ELSE 'test' END AS split
         FROM (SELECT lang, n_chars,
           ('0x' || substr(md5('v1' || doc_id::VARCHAR), 1, 15))::BIGINT
             % 100 AS b
           FROM documents) t) u
       GROUP BY split, lang ORDER BY split, lang"""

  // ---------------------------------------------------------------- q70
  /** Corpus cleanup + repetition signal: URL/e-mail/control-char
    * stripping with whitespace collapse
    * ([[graft.functions.TextFunctions.cleanText]]) and the
    * distinct-word repetition ratio — both pure codegen'd regex/array
    * expressions inside the scan projection, both mirrored exactly in
    * the oracle. */
  private def q70(s: SparkSession, d: String): DataFrame = {
    val clean = cleanText(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_raw"),
        length(clean).cast("long").as("n_chars_clean"),
        // repetition measured on the CLEANED text: control chars are
        // already normalized away, so both engines tokenize identically
        round(repetitionRatio(words(clean)), 4).as("rep_ratio"))
      .orderBy("doc_id")
  }

  private val q70Sql =
    """SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_raw,
       CAST(length(clean) AS BIGINT) AS n_chars_clean,
       round(1.0 -
         len(list_distinct(regexp_split_to_array(clean, '\s+')))::DOUBLE
           / len(regexp_split_to_array(clean, '\s+')), 4) AS rep_ratio
       FROM (SELECT doc_id, text,
               trim(regexp_replace(regexp_replace(regexp_replace(
                 regexp_replace(text,
                   '[\x00-\x1f\x7f]', ' ', 'g'),
                   'https?://\S+|www\.\S+', ' ', 'g'),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     ' ', 'g'),
                   '\s+', ' ', 'g')) AS clean
             FROM documents) t
       ORDER BY doc_id"""

  // ---------------------------------------------------------------- q71
  /** Near-dup CLUSTERS: the transitive closure of the minhash pair
    * list ([[Dedup.connectedComponents]] — iterative min-label
    * propagation to an exact fixpoint), the step that turns pairwise
    * similarity into deduplication (A≈B≈C collapse to one survivor
    * even when A and C aren't directly similar). Oracle: the SAME q36
    * pair pipeline fed into a recursive-CTE reachability closure with
    * min-label per node. */
  private def q71(s: SparkSession, d: String): DataFrame =
    graft.Kernels.minhashComponents(s, d, threshold = 0.8)
      .orderBy("id")

  private val q71Sql =
    s"""WITH RECURSIVE p AS ($q36Core),
       edges AS (SELECT doc_a AS a, doc_b AS b FROM p
                 UNION ALL SELECT doc_b, doc_a FROM p),
       nodes AS (SELECT DISTINCT a AS id FROM edges),
       reach AS (SELECT id, id AS r FROM nodes
                 UNION
                 SELECT e.a, reach.r FROM edges e
                 JOIN reach ON e.b = reach.id)
       SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
       ORDER BY id"""

  // --------------------------------------------------------------- q264
  /** CLUSTER-SAFE dataset split — the constructive counterpart to
    * q213's leakage AUDIT: near-dup documents must land in the SAME
    * train/val/test split or evaluation is contaminated by training
    * twins. Every document splits by the hash of its near-dup CLUSTER
    * representative (q36 banded pairs → q71 exact closure; singletons
    * represent themselves), so cross-split near-dup pairs are ZERO by
    * construction — emitted as a graded value next to the counterfeit
    * baseline (`naive_cross_pairs`: the same pairs under a doc-level
    * hash split, the number a cluster-blind pipeline would leak).
    * Corpus work = the q36/q71 kernels + one stats aggregation; the
    * pair table re-attaches by id join, never corpus².
    */
  private def q264(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // shared memoized kernels — both already materialized, so the
    // multi-branch reuse below (pair splits + assignment stats) costs
    // no recompute and needs no query-local persist
    val pairs = graft.Kernels.minhashPairs(s, d, threshold = 0.8)
    val comp = graft.Kernels.minhashComponents(s, d, threshold = 0.8)
    val rep = docs.select(col("doc_id"), words(col("text")).as("w"))
      .join(comp.select(col("id").as("doc_id"),
        col("cluster_id")), Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"),
        coalesce(col("cluster_id"), col("doc_id")).as("rep"))
    def bucket(c: Column, salt: String) =
      Sampling.hashBucket(c, salt, 10)
    def splitOf(b: Column) = when(b <= 7, "train")
      .when(b === 8, "val").otherwise("test")
    val assigned = rep
      .withColumn("split", splitOf(bucket(col("rep"), "split")))
      .withColumn("naive", splitOf(bucket(col("doc_id"), "split")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sides = assigned.select(col("doc_id"), col("split"), col("naive"))
    val pairSplits = pairs
      .join(sides.select(col("doc_id").as("doc_a"),
        col("split").as("sa"), col("naive").as("na")), "doc_a")
      .join(sides.select(col("doc_id").as("doc_b"),
        col("split").as("sb"), col("naive").as("nb")), "doc_b")
      .agg(
        sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L))
          .as("cross_split_pairs"),
        sum(when(col("na") =!= col("nb"), 1L).otherwise(0L))
          .as("naive_cross_pairs"))
    val result = assigned.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("rep")).as("n_clusters"),
        sum(col("n_tokens")).as("n_tokens"))
      .crossJoin(broadcast(pairSplits))
      .orderBy("split")
    graft.operators.Exec.owned(result, Seq(assigned))
  }

  private val q264Sql =
    s"""WITH RECURSIVE p AS ($q36Core),
       edges AS (SELECT doc_a AS a, doc_b AS b FROM p
                 UNION ALL SELECT doc_b, doc_a FROM p),
       nodes AS (SELECT DISTINCT a AS id FROM edges),
       reach AS (SELECT id, id AS r FROM nodes
                 UNION
                 SELECT e.a, reach.r FROM edges e
                 JOIN reach ON e.b = reach.id),
       comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
       rep AS (SELECT d.doc_id,
               len(regexp_split_to_array(trim(d.text), '\\s+'))::BIGINT
                 AS n_tokens,
               coalesce(c.cluster_id, d.doc_id) AS rep
             FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
       asg AS (SELECT doc_id, n_tokens, rep,
               CASE WHEN ('0x' || substr(md5('split' || rep::VARCHAR),
                     1, 15))::BIGINT % 10 <= 7 THEN 'train'
                    WHEN ('0x' || substr(md5('split' || rep::VARCHAR),
                     1, 15))::BIGINT % 10 = 8 THEN 'val'
                    ELSE 'test' END AS split,
               CASE WHEN ('0x' || substr(md5('split' || doc_id::VARCHAR),
                     1, 15))::BIGINT % 10 <= 7 THEN 'train'
                    WHEN ('0x' || substr(md5('split' || doc_id::VARCHAR),
                     1, 15))::BIGINT % 10 = 8 THEN 'val'
                    ELSE 'test' END AS naive
             FROM rep),
       px AS (SELECT
               CAST(sum(CASE WHEN a1.split != a2.split THEN 1 ELSE 0 END)
                 AS BIGINT) AS cross_split_pairs,
               CAST(sum(CASE WHEN a1.naive != a2.naive THEN 1 ELSE 0 END)
                 AS BIGINT) AS naive_cross_pairs
             FROM p JOIN asg a1 ON a1.doc_id = p.doc_a
                    JOIN asg a2 ON a2.doc_id = p.doc_b)
       SELECT split, count(*)::BIGINT AS n_docs,
         CAST(count(DISTINCT rep) AS BIGINT) AS n_clusters,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         px.cross_split_pairs, px.naive_cross_pairs
       FROM asg, px
       GROUP BY split, px.cross_split_pairs, px.naive_cross_pairs
       ORDER BY split"""

  // --------------------------------------------------------------- q291
  /** Dedup-discounted source mixing — the mixture-weight correction
    * that stops duplicated content from voting twice: each document
    * weighs 1/|near-dup cluster| (q36 banded pairs → q71 exact
    * closure; singletons weigh 1), so a source whose volume is
    * copy-paste inflation loses share while unique content keeps it.
    * Per source: raw vs effective (discounted) token counts and the
    * mixture shares both ways — the delta IS the duplication subsidy.
    * Corpus work = the shared q36/q71 kernels + one token-count scan;
    * the cluster-size table re-attaches by a rep-key join (cluster
    * cardinality ≤ docs, never corpus²).
    */
  private def q291(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val comp = graft.Kernels.minhashComponents(s, d, threshold = 0.8)
    val base = docs
      .select(col("doc_id"), col("source"),
        size(words(col("text"))).cast("long").as("tok"))
      .join(comp.select(col("id").as("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
    val csize = base.groupBy("rep").agg(count(lit(1)).as("csz"))
    val perSource = base.join(csize, Seq("rep"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("csz") > 1, 1L).otherwise(0L)).as("n_clustered"),
        sum("tok").as("raw_tokens"),
        sum(col("tok").cast("double") / col("csz").cast("double"))
          .as("eff"))
    val tot = perSource.agg(sum("raw_tokens").as("tr"),
      sum("eff").as("te"))
    perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_clustered"),
        col("raw_tokens"),
        round(col("raw_tokens").cast("double") /
          col("tr").cast("double"), 6).as("raw_share"),
        round(col("eff"), 4).as("eff_tokens"),
        round(col("eff") / col("te"), 6).as("eff_share"))
      .orderBy("source")
  }

  private val q291Sql =
    s"""WITH RECURSIVE p AS ($q36Core),
       edges AS (SELECT doc_a AS a, doc_b AS b FROM p
                 UNION ALL SELECT doc_b, doc_a FROM p),
       nodes AS (SELECT DISTINCT a AS id FROM edges),
       reach AS (SELECT id, id AS r FROM nodes
                 UNION
                 SELECT e.a, reach.r FROM edges e
                 JOIN reach ON e.b = reach.id),
       comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
       base AS (SELECT d.doc_id, d.source,
               len(regexp_split_to_array(trim(d.text), '\\s+'))::BIGINT
                 AS tok,
               coalesce(c.cluster_id, d.doc_id) AS rep
             FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
       csize AS (SELECT rep, CAST(count(*) AS BIGINT) AS csz
                 FROM base GROUP BY rep),
       src AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN csz > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_clustered,
               CAST(sum(tok) AS BIGINT) AS raw_tokens,
               sum(tok::DOUBLE / csz::DOUBLE) AS eff
             FROM base JOIN csize USING (rep) GROUP BY source),
       tot AS (SELECT CAST(sum(raw_tokens) AS BIGINT) AS tr,
               sum(eff) AS te FROM src)
       SELECT source, n_docs, n_clustered, raw_tokens,
         round(raw_tokens::DOUBLE / tr::DOUBLE, 6) AS raw_share,
         round(eff, 4) AS eff_tokens,
         round(eff / te, 6) AS eff_share
       FROM src, tot ORDER BY source"""

  // --------------------------------------------------------------- q315
  /** LSH parameter planner — turns MinHash tuning into a query: for
    * each (bands, rows) factorization of the k=12 signature, the
    * S-curve threshold s* = (1/b)^(1/r) and the EXPECTED candidate
    * catch probability 1−(1−s^r)^b averaged over the corpus's OWN
    * observed pair-similarity distribution (the q36 kernel verified
    * at a wider 0.5 net, so the curve is evaluated where this
    * corpus's near-dups actually live, not on a synthetic prior).
    * `exp_recall_08` — the same expectation restricted to pairs at
    * the production 0.8 threshold — is the number that says what
    * recall each cheaper banding would trade away. Per-pair terms
    * quantize to 1e-9-unit LONGs summed in DECIMAL (pair counts are
    * corpus-scale); the grid is 6 broadcast rows.
    */
  private def q315(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val pairs = graft.Kernels.minhashPairs(s, d, threshold = 0.5)
    val grid = Seq((12, 1), (6, 2), (4, 3), (3, 4), (2, 6), (1, 12))
      .toDF("b", "r")
    val bD = col("b").cast("double")
    val rD = col("r").cast("double")
    val catchP = lit(1.0) -
      pow(lit(1.0) - pow(col("jaccard"), rD), bD)
    val tu = floor(catchP * lit(1e9) + lit(0.5))
      .cast("decimal(38,0)")
    val agg = pairs.crossJoin(broadcast(grid))
      .groupBy("b", "r")
      .agg(count(lit(1)).as("n_pairs"), sum(tu).as("cu"),
        sum(when(col("jaccard") >= 0.8, 1L).otherwise(0L)).as("n08"),
        sum(when(col("jaccard") >= 0.8, tu)
          .otherwise(lit(0).cast("decimal(38,0)"))).as("cu08"))
    val safe8 = greatest(col("n08").cast("double"), lit(1e-12))
    agg.select(col("b").cast("long").as("b"),
        col("r").cast("long").as("r"),
        round(pow(lit(1.0) / bD, lit(1.0) / rD), 4).as("s_star"),
        col("n_pairs"), col("n08").as("n_pairs_08"),
        round((col("cu").cast("double") / lit(1e9)) /
          col("n_pairs").cast("double"), 6).as("exp_catch_all"),
        round((col("cu08").cast("double") / lit(1e9)) / safe8, 6)
          .as("exp_recall_08"))
      .orderBy(col("b").desc)
  }

  private val q315Sql =
    s"""WITH p0 AS (${q36CoreAt(0.5)}),
       grid AS (SELECT * FROM (VALUES (12, 1), (6, 2), (4, 3), (3, 4),
                  (2, 6), (1, 12)) g(b, r)),
       terms AS (SELECT grid.b, grid.r, jaccard,
           CAST(floor((1.0 - pow(1.0 - pow(jaccard, r::DOUBLE),
             b::DOUBLE)) * 1e9 + 0.5) AS HUGEINT) AS tu
         FROM p0 CROSS JOIN grid),
       agg AS (SELECT b, r, CAST(count(*) AS BIGINT) AS n_pairs,
           sum(tu) AS cu,
           CAST(sum(CASE WHEN jaccard >= 0.8 THEN 1 ELSE 0 END)
             AS BIGINT) AS n08,
           sum(CASE WHEN jaccard >= 0.8 THEN tu
               ELSE 0::HUGEINT END) AS cu08
         FROM terms GROUP BY b, r)
       SELECT CAST(b AS BIGINT) AS b, CAST(r AS BIGINT) AS r,
         round(pow(1.0 / b::DOUBLE, 1.0 / r::DOUBLE), 4) AS s_star,
         n_pairs, n08 AS n_pairs_08,
         round((cu::DOUBLE / 1e9) / n_pairs::DOUBLE, 6)
           AS exp_catch_all,
         round((cu08::DOUBLE / 1e9)
           / greatest(n08::DOUBLE, 1e-12), 6) AS exp_recall_08
       FROM agg ORDER BY b DESC"""

  // ---------------------------------------------------------------- q72
  /** Unigram log-probability quality score — the simplest language
    * model filter (a KenLM-lite): corpus-wide MLE unigram frequencies,
    * each document scored by the mean log-probability of its tokens.
    * Low scores flag boilerplate/garbage vocabularies. Two aggregation
    * passes over the token table (frequencies, then per-doc means via
    * a frequency join) — the token table is persisted once and
    * released via the owned-result pattern. */
  private def q72(s: SparkSession, d: String): DataFrame = {
    val docsDf = Tables.documents(s, d)
    val toks = docsDf
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = toks.count()
    val freq = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
    val result = toks.join(freq, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
           round(avg(log(col("cnt").cast("double") / total.toDouble)), 4)
             .as("avg_logprob"))
      .orderBy("doc_id")
    graft.operators.Exec.owned(result, Seq(toks))
  }

  private val q72Sql =
    """WITH toks AS (SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS w
         FROM documents),
       freq AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
       total AS (SELECT count(*) AS n FROM toks)
       SELECT doc_id, count(*) AS n_tokens,
         round(avg(ln(cnt::DOUBLE / total.n)), 4) AS avg_logprob
       FROM toks JOIN freq USING (w), total
       GROUP BY doc_id
       ORDER BY doc_id"""

  // --------------------------------------------------------------- q249
  /** Readability scoring (Flesch reading ease) — the classic
    * complexity lens next to the Gopher lexical gates (q74) and
    * perplexity filter (q212): score = 206.835 − 1.015·(words/
    * sentences) − 84.6·(syllables/word), with syllables approximated
    * as vowel-group count (a vowelless token counts 1 — 'xkcd' is one
    * spoken unit, not zero). The synthetic corpus carries no sentence
    * punctuation, so sentences = max(1, terminator runs) makes each
    * document one sentence — the words/sentence leg then measures
    * document length, which is exactly what it should measure on this
    * corpus (documented convention, not an accident). Per-doc scores
    * quantize to 1e-4-unit LONGs before the per-source mean — ONE
    * map-only corpus pass + a |sources|-row aggregation.
    */
  private def q249(s: SparkSession, d: String): DataFrame = {
    val w = size(words(col("text")))
    val vg = regexp_count(lower(col("text")), lit("[aeiouy]+"))
    val nv = size(filter(words(lower(col("text"))),
      x => !x.rlike("[aeiouy]")))
    val sent = greatest(lit(1), regexp_count(col("text"), lit("[.!?]+")))
    val perDoc = Tables.documents(s, d)
      .select(col("source"), w.cast("long").as("w"),
        (vg + nv).cast("long").as("syl"), sent.cast("long").as("sent"))
      .filter(col("w") > 0)
      .withColumn("flesch_u",
        floor((lit(206.835) -
          lit(1.015) * col("w").cast("double") / col("sent").cast("double") -
          lit(84.6) * col("syl").cast("double") / col("w").cast("double")) *
          lit(1e4) + lit(0.5)).cast("long"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("n_words"), sum(col("syl")).as("n_syllables"),
        sum(col("flesch_u")).as("fu"))
      .select(col("source"), col("n_docs"), col("n_words"),
        round(col("n_syllables").cast("double") /
          col("n_words").cast("double"), 6).as("syll_per_word"),
        round(col("fu").cast("double") /
          col("n_docs").cast("double") / lit(1e4), 4).as("flesch_mean"))
      .orderBy("source")
  }

  private val q249Sql =
    """WITH perdoc AS (SELECT source,
           len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS w,
           (len(regexp_extract_all(lower(text), '[aeiouy]+'))
            + len(list_filter(regexp_split_to_array(trim(lower(text))
                , '\s+'),
                x -> NOT regexp_matches(x, '[aeiouy]'))))::BIGINT AS syl,
           greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
             AS sent
         FROM documents),
       scored AS (SELECT source, w, syl,
           CAST(floor((206.835 - 1.015 * w::DOUBLE / sent::DOUBLE
               - 84.6 * syl::DOUBLE / w::DOUBLE) * 1e4 + 0.5)
             AS BIGINT) AS flesch_u
         FROM perdoc WHERE w > 0)
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(w) AS BIGINT) AS n_words,
         round(CAST(sum(syl) AS DOUBLE) / CAST(sum(w) AS DOUBLE), 6)
           AS syll_per_word,
         round(CAST(sum(flesch_u) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) / 1e4, 4) AS flesch_mean
       FROM scored GROUP BY source ORDER BY source"""

  // ----------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q269_lof_outliers" -> (q269 _),
    "q273_nfc_audit" -> (q273 _),
    "q274_mutual_nn" -> (q274 _),
    "q275_embargo_split" -> (q275 _),
    "q249_readability" -> (q249 _),
    "q257_multimodal_resize" -> (q257 _),
    "q264_cluster_safe_split" -> (q264 _),
    "q291_dedup_discounted_mix" -> (q291 _),
    "q315_lsh_planner" -> (q315 _),
    "q30_text_stats" -> (q30 _),
    "q31_token_counts" -> (q31 _),
    "q32_quality_score" -> (q32 _),
    "q33_lang_id" -> (q33 _),
    "q34_fingerprint" -> (q34 _),
    "q35_dedup_exact" -> (q35 _),
    "q36_dedup_minhash" -> (q36 _),
    "q37_dedup_simhash" -> (q37 _),
    "q38_ngram_jaccard" -> (q38 _),
    "q39_embedding_neardup" -> (q39 _),
    "q40_knn_bruteforce" -> (q40 _),
    "q41_knn_lsh" -> (q41 _),
    "q42_multimodal_frames" -> (q42 _),
    "q43_multimodal_decode" -> (q43 _),
    "q44_embedding_centroids" -> (q44 _),
    "q47_rolling_fingerprint" -> (q47 _),
    "q52_knn_ivf" -> (q52 _),
    "q53_embedding_neardup_lsh" -> (q53 _),
    "q59_multimodal_ppm" -> (q59 _),
    "q142_multimodal_png" -> (q142 _),
    "q146_multimodal_jpeg" -> (q146 _),
    "q147_multimodal_adpcm" -> (q147 _),
    "q155_multimodal_y4m" -> (q155 _),
    "q60_tfidf" -> (q60 _),
    "q69_dataset_split" -> (q69 _),
    "q70_text_cleanup" -> (q70 _),
    "q71_dedup_clusters" -> (q71 _),
    "q72_unigram_logprob" -> (q72 _))

  val oracles: Map[String, String] = Map(
    "q269_lof_outliers" -> q269Sql,
    "q273_nfc_audit" -> q273Sql,
    "q274_mutual_nn" -> q274Sql,
    "q275_embargo_split" -> q275Sql,
    "q249_readability" -> q249Sql,
    "q257_multimodal_resize" -> q257Sql,
    "q264_cluster_safe_split" -> q264Sql,
    "q291_dedup_discounted_mix" -> q291Sql,
    "q315_lsh_planner" -> q315Sql,
    "q30_text_stats" -> q30Sql,
    "q31_token_counts" -> q31Sql,
    "q32_quality_score" -> q32Sql,
    "q33_lang_id" -> q33Sql,
    "q34_fingerprint" -> q34Sql,
    "q35_dedup_exact" -> q35Sql,
    "q36_dedup_minhash" -> q36Sql,
    "q37_dedup_simhash" -> q37Sql,
    "q38_ngram_jaccard" -> q38Sql,
    "q39_embedding_neardup" -> q39Sql,
    "q40_knn_bruteforce" -> q40Sql,
    "q41_knn_lsh" -> q41Sql,
    "q42_multimodal_frames" -> q42Sql,
    "q43_multimodal_decode" -> q43Sql,
    "q44_embedding_centroids" -> q44Sql,
    "q47_rolling_fingerprint" -> q47Sql,
    "q52_knn_ivf" -> q52Sql,
    "q53_embedding_neardup_lsh" -> q53Sql,
    "q59_multimodal_ppm" -> q59Sql,
    "q142_multimodal_png" -> q142Sql,
    "q146_multimodal_jpeg" -> q146Sql,
    "q147_multimodal_adpcm" -> q147Sql,
    "q155_multimodal_y4m" -> q155Sql,
    "q60_tfidf" -> q60Sql,
    "q69_dataset_split" -> q69Sql,
    "q70_text_cleanup" -> q70Sql,
    "q71_dedup_clusters" -> q71Sql,
    "q72_unigram_logprob" -> q72Sql)
}
