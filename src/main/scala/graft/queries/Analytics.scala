package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
// cross-engine deterministic rounding shadows functions.round
import graft.functions.Rounding.{roundTo => round}

import graft.Tables
import graft.operators.{Quality, Rank, Sampling, Sketch}

/** Round-5 corpus-analytics operators: BM25 lexical retrieval,
  * character-entropy quality scoring, deterministic weighted sampling,
  * Count-Min frequency sketching, and MAD-based robust outlier
  * detection. Oracle discipline matches [[Pipeline]] / [[Scale]]
  * (shared md5 hash kernel, shared rounding kernel, integer casts,
  * unique-key ordering).
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q97
  /** BM25 retrieval ([[Rank.bm25]]): score every document against a
    * 5-term keyword query, top 50. Term matching is a codegen'd isin
    * in the scan projection; df/idf tables are term-count-sized
    * broadcasts; corpus shuffles are the two doc-id aggregations. */
  private val bmTerms = Seq("spark", "vector", "stream", "window", "hash")

  private def q97(s: SparkSession, d: String): DataFrame =
    Rank.bm25(Tables.documents(s, d), "doc_id", "text", bmTerms,
        k1 = 1.2, b = 0.75)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(50)

  private val q97Sql =
    s"""WITH toks AS (SELECT doc_id,
           regexp_split_to_array(trim(text),'\\s+') AS w FROM documents),
       dl AS (SELECT doc_id, len(w)::DOUBLE AS dl FROM toks),
       st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
       tf AS (SELECT doc_id, t AS tok, count(*)::DOUBLE AS tf
              FROM (SELECT doc_id, unnest(w) AS t FROM toks) u
              WHERE t IN (${bmTerms.map(t => s"'$t'").mkString(",")})
              GROUP BY doc_id, t),
       idf AS (SELECT tok,
                 ln(1 + (st.n_docs - count(*)::DOUBLE + 0.5)
                      / (count(*)::DOUBLE + 0.5)) AS idf
               FROM tf, st GROUP BY tok, st.n_docs),
       sc AS (SELECT tf.doc_id,
                CAST(count(*) AS BIGINT) AS n_matched,
                round(sum(idf.idf * (tf.tf * 2.2)
                  / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))), 4)
                  AS score
              FROM tf JOIN idf USING (tok) JOIN dl USING (doc_id), st
              GROUP BY tf.doc_id)
       SELECT doc_id, n_matched, score FROM sc
       ORDER BY score DESC, doc_id LIMIT 50"""

  // ---------------------------------------------------------------- q98
  /** Character-entropy quality signal ([[Quality.charEntropy]]): the
    * per-character explode collapses map-side to per-document
    * histograms; the shuffle carries (doc, char) counts, not
    * characters. Split-semantics note: Spark's split on '' appends a
    * trailing '' element (Java limit -1), DuckDB's does not — the
    * operator's histogram ignores empty-string entries, making the two
    * engines agree character-for-character. */
  private def q98(s: SparkSession, d: String): DataFrame =
    Quality.charEntropy(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  private val q98Sql =
    """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
           FROM documents WHERE text IS NOT NULL AND length(text) > 0),
       cnt AS (SELECT doc_id, ch, count(*)::DOUBLE AS c
               FROM ch WHERE ch <> '' GROUP BY doc_id, ch),
       e AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars_split,
               round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4)
                 AS entropy
             FROM cnt GROUP BY doc_id)
       SELECT doc_id, n_chars_split, entropy FROM e ORDER BY doc_id"""

  // ---------------------------------------------------------------- q99
  /** Deterministic weighted sampling ([[Sampling.weightedSample]]):
    * 25 documents drawn without replacement, selection probability
    * proportional to n_chars, reproducible on any engine — the A-ES
    * key is a pure function of (salt, doc_id, weight) through the
    * shared md5 kernel, and top-k plans as TakeOrderedAndProject. */
  private def q99(s: SparkSession, d: String): DataFrame =
    Sampling.weightedSample(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 25, salt = "es")
      .select(col("doc_id"), col("n_chars"),
        round(col("es_key"), 6).as("es_key"))
      .orderBy(col("es_key").desc, col("doc_id"))

  private val q99Sql =
    """WITH keyed AS (SELECT doc_id, n_chars,
           ln((('0x' || substr(md5('es' || doc_id::VARCHAR), 1, 15))::BIGINT
               + 1)::DOUBLE / 1152921504606846977.0)
             / n_chars::DOUBLE AS k
         FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
       top AS (SELECT doc_id, n_chars, k FROM keyed
               ORDER BY k DESC, doc_id LIMIT 25)
       SELECT doc_id, n_chars, round(k, 6) AS es_key
       FROM top ORDER BY es_key DESC, doc_id"""

  // --------------------------------------------------------------- q100
  /** Count-Min frequency estimates ([[Sketch.countMin]] +
    * [[Sketch.estimate]]): a 3×1024 sketch over the corpus token
    * stream, probed for five common tokens and two absent ones,
    * against the exact counts. Collisions are part of the contract —
    * the oracle replays the double-hashed grid set-theoretically, so
    * both engines must agree on every overcount. */
  private val cmsProbes = Seq("spark", "table", "the", "vector", "stream",
    "warehouse", "zeppelin")
  private val cmsDepth = 3
  private val cmsWidth = 1024

  private def q100(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.words
    val toks = Tables.documents(s, d)
      .select(explode(words(col("text"))).as("tok"))
    val sketch = Sketch.countMin(toks, "tok", cmsDepth, cmsWidth)
    val probes = s.createDataFrame(
      cmsProbes.map(Tuple1(_))).toDF("word")
    val exact = toks.groupBy(col("tok").as("word"))
      .agg(count(lit(1)).as("true_cnt"))
    Sketch.estimate(sketch, probes, "word", cmsDepth, cmsWidth)
      .join(exact, Seq("word"), "left")
      .select(col("word"),
        coalesce(col("true_cnt"), lit(0L)).as("true_cnt"),
        col("cms_est"),
        (col("cms_est") - coalesce(col("true_cnt"), lit(0L)))
          .as("overcount"))
      .orderBy("word")
  }

  private val q100Sql =
    s"""WITH toks AS (SELECT unnest(regexp_split_to_array(trim(text),'\\s+'))
           AS w FROM documents),
       th AS (SELECT w, ('0x' || substr(md5(w),1,15))::BIGINT AS h FROM toks),
       buck AS (SELECT i,
                  (h % $cmsWidth + i * (1 + h % ${cmsWidth - 1})) % $cmsWidth
                    AS p,
                  count(*) AS c
                FROM th, range(0, $cmsDepth) t(i) GROUP BY i, p),
       probes(pw) AS (VALUES ${cmsProbes.map(p => s"('$p')").mkString(",")}),
       ph AS (SELECT pw, ('0x' || substr(md5(pw),1,15))::BIGINT AS h
              FROM probes),
       pe AS (SELECT pw,
                i, (h % $cmsWidth + i * (1 + h % ${cmsWidth - 1})) % $cmsWidth
                  AS p
              FROM ph, range(0, $cmsDepth) t(i)),
       est AS (SELECT pw, min(coalesce(buck.c, 0)) AS cms
               FROM pe LEFT JOIN buck USING (i, p) GROUP BY pw),
       cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY w)
       SELECT pw AS word,
         CAST(coalesce(cnt.c, 0) AS BIGINT) AS true_cnt,
         CAST(est.cms AS BIGINT) AS cms_est,
         CAST(est.cms - coalesce(cnt.c, 0) AS BIGINT) AS overcount
       FROM est LEFT JOIN cnt ON est.pw = cnt.w
       ORDER BY word"""

  // --------------------------------------------------------------- q101
  /** Robust outlier detection ([[Quality.madOutliers]]): per-source
    * median/MAD of document length and the count of 3-robust-sigma
    * outliers — the quantile tables are group-count-sized broadcasts,
    * the flag pass is map-only. */
  private def q101(s: SparkSession, d: String): DataFrame =
    Quality.madOutliers(
        Tables.documents(s, d).select(col("source"), col("n_chars")),
        "n_chars", "source", c = 3.0)
      .orderBy("source")

  private val q101Sql =
    """WITH med AS (SELECT source, quantile_cont(n_chars, 0.5) AS med
           FROM documents GROUP BY source),
       dev AS (SELECT d.source, d.n_chars, med.med,
                 abs(d.n_chars::DOUBLE - med.med) AS dev
               FROM documents d JOIN med USING (source)),
       mad AS (SELECT source, quantile_cont(dev, 0.5) AS mad
               FROM dev GROUP BY source)
       SELECT dev.source, count(*) AS n,
         round(any_value(dev.med), 4) AS med,
         round(any_value(mad.mad), 4) AS mad,
         CAST(count(*) FILTER (dev.dev > 3.0 * 1.4826 * mad.mad) AS BIGINT)
           AS n_outliers
       FROM dev JOIN mad USING (source)
       GROUP BY dev.source ORDER BY dev.source"""

  // ----------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q97_bm25" -> (q97 _),
    "q98_char_entropy" -> (q98 _),
    "q99_weighted_sample" -> (q99 _),
    "q100_cms_freq" -> (q100 _),
    "q101_mad_outliers" -> (q101 _))

  val oracles: Map[String, String] = Map(
    "q97_bm25" -> q97Sql,
    "q98_char_entropy" -> q98Sql,
    "q99_weighted_sample" -> q99Sql,
    "q100_cms_freq" -> q100Sql,
    "q101_mad_outliers" -> q101Sql)
}
