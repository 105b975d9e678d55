package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
// cross-engine deterministic rounding shadows functions.round
import graft.functions.Rounding.{roundTo => round}

import graft.Tables
import graft.engine.Logistic
import graft.operators.{Assoc, Chunks, Dedup, Experiment, Fuzzy, Graph,
  History, Quality, Rank, Series, Similarity, Sketch}

/** Round-5 behavioral / linkage operators: blocked sorted-neighborhood
  * record linkage, weekly retention cohorts, and rolling z-score
  * anomaly detection over event volumes. Oracle discipline matches
  * [[Analytics]] (shared rounding kernel, integer-exact window moments,
  * unique-key ordering).
  */
object Insights {
  type Q = (SparkSession, String) => DataFrame

  // --------------------------------------------------------------- q112
  /** Blocked sorted-neighborhood linkage ([[Fuzzy.sortedNeighborhoodPairs]]):
    * DISTINCT part names (min-partkey representative) plus, for every
    * 7th representative, a deterministically injected two-character
    * typo twin BEYOND the 4-char blocking prefix (q104-style injection
    * keeps the oracle non-vacuous while exercising the maxDist = 2
    * regime SymSpell's distance-1 scheme cannot reach). Candidates are
    * rank-adjacent rows within each block's (name, id) sort — never
    * corpus². */
  private def q112(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy("p_name").agg(min(col("p_partkey").cast("long")).as("pk"))
      .select(col("pk"), col("p_name"))
      .filter(length(col("p_name")) >= 7)
    val pos = (lit(5) + pmod(col("pk"), length(col("p_name")) - 5))
      .cast("int")
    val typos = names.filter(pmod(col("pk"), lit(7)) === 0)
      .select((col("pk") + 1000000L).as("pk"),
        concat(col("p_name").substr(lit(1), pos - 1), lit("qz"),
          col("p_name").substr(pos + 2, length(col("p_name"))))
          .as("p_name"))
    Fuzzy.sortedNeighborhoodPairs(names.unionByName(typos), "pk", "p_name",
        blockLen = 4, window = 3, maxDist = 2)
      .withColumn("dist", col("dist").cast("int"))
      .orderBy("id_a", "id_b")
  }

  private val q112Sql =
    """WITH base AS (SELECT min(CAST(p_partkey AS BIGINT)) AS pk, p_name
           FROM part GROUP BY p_name HAVING length(p_name) >= 7),
       typo AS (SELECT pk + 1000000 AS pk,
           substr(p_name, 1, pos - 1) || 'qz' || substr(p_name, pos + 2)
             AS p_name
         FROM (SELECT pk, p_name,
                 5 + CAST(pk % (length(p_name) - 5) AS INT) AS pos
               FROM base WHERE pk % 7 = 0)),
       all_rows AS (SELECT pk, p_name FROM base
                    UNION ALL SELECT pk, p_name FROM typo),
       ranked AS (SELECT pk, p_name,
                    row_number() OVER (PARTITION BY substr(p_name, 1, 4)
                      ORDER BY p_name, pk) AS rn,
                    substr(p_name, 1, 4) AS blk
                  FROM all_rows),
       cand AS (SELECT least(a.pk, b.pk) AS id_a,
                  greatest(a.pk, b.pk) AS id_b,
                  CASE WHEN a.pk < b.pk THEN a.p_name
                       ELSE b.p_name END AS str_a,
                  CASE WHEN a.pk < b.pk THEN b.p_name
                       ELSE a.p_name END AS str_b
                FROM ranked a JOIN ranked b
                  ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 3)
       SELECT DISTINCT id_a, id_b, str_a, str_b,
         CAST(levenshtein(str_a, str_b) AS INT) AS dist
       FROM cand WHERE levenshtein(str_a, str_b) <= 2
       ORDER BY id_a, id_b"""

  // --------------------------------------------------------------- q160
  /** Jaro-Winkler linkage ([[Fuzzy.jaroWinklerPairs]]): q112's
    * injected-typo-twin setup scored by the native codegen'd
    * [[graft.functions.expressions.JaroWinkler]] instead of an edit-
    * distance cap — the graded prefix-weighted metric record linkage
    * ranks by. Similarity rounds to 4 decimals BEFORE the 0.88
    * threshold so the cut is engine-exact; the oracle scores the same
    * SNM candidates with DuckDB's own `jaro_winkler_similarity`, so
    * the expression must match it bit-for-bit. */
  private def q160(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy("p_name").agg(min(col("p_partkey").cast("long")).as("pk"))
      .select(col("pk"), col("p_name"))
      .filter(length(col("p_name")) >= 7)
    val pos = (lit(5) + pmod(col("pk"), length(col("p_name")) - 5))
      .cast("int")
    val typos = names.filter(pmod(col("pk"), lit(7)) === 0)
      .select((col("pk") + 1000000L).as("pk"),
        concat(col("p_name").substr(lit(1), pos - 1), lit("qz"),
          col("p_name").substr(pos + 2, length(col("p_name"))))
          .as("p_name"))
    Fuzzy.jaroWinklerPairs(names.unionByName(typos), "pk", "p_name",
        blockLen = 4, window = 3, minSim = 0.88)
      .orderBy("id_a", "id_b")
  }

  private val q160Sql =
    """WITH base AS (SELECT min(CAST(p_partkey AS BIGINT)) AS pk, p_name
           FROM part GROUP BY p_name HAVING length(p_name) >= 7),
       typo AS (SELECT pk + 1000000 AS pk,
           substr(p_name, 1, pos - 1) || 'qz' || substr(p_name, pos + 2)
             AS p_name
         FROM (SELECT pk, p_name,
                 5 + CAST(pk % (length(p_name) - 5) AS INT) AS pos
               FROM base WHERE pk % 7 = 0)),
       all_rows AS (SELECT pk, p_name FROM base
                    UNION ALL SELECT pk, p_name FROM typo),
       ranked AS (SELECT pk, p_name,
                    row_number() OVER (PARTITION BY substr(p_name, 1, 4)
                      ORDER BY p_name, pk) AS rn,
                    substr(p_name, 1, 4) AS blk
                  FROM all_rows),
       cand AS (SELECT least(a.pk, b.pk) AS id_a,
                  greatest(a.pk, b.pk) AS id_b,
                  CASE WHEN a.pk < b.pk THEN a.p_name
                       ELSE b.p_name END AS str_a,
                  CASE WHEN a.pk < b.pk THEN b.p_name
                       ELSE a.p_name END AS str_b
                FROM ranked a JOIN ranked b
                  ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + 3)
       SELECT DISTINCT id_a, id_b, str_a, str_b,
         round(jaro_winkler_similarity(str_a, str_b), 4) AS jw
       FROM cand
       WHERE round(jaro_winkler_similarity(str_a, str_b), 4) >= 0.88
       ORDER BY id_a, id_b"""

  // --------------------------------------------------------------- q113
  /** Weekly retention cohorts ([[Series.retentionCohorts]]): users
    * bucketed by first-event week (integer weeks from a fixed epoch —
    * never engine `date_trunc` week boundaries), tracked across
    * return-week offsets with the cohort-share retention rate. */
  private def q113(s: SparkSession, d: String): DataFrame =
    Series.retentionCohorts(Tables.events(s, d), "user_id", "ts")
      .orderBy("cohort_week", "week_offset")

  private val q113Sql =
    """WITH uw AS (SELECT DISTINCT user_id AS u,
           CAST(floor(datediff('day', DATE '1990-01-01', CAST(ts AS DATE))
             / 7) AS BIGINT) AS week
         FROM events),
       coh AS (SELECT u, min(week) AS cohort_week FROM uw GROUP BY u),
       sizes AS (SELECT cohort_week, count(*) AS sz
                 FROM coh GROUP BY cohort_week),
       r AS (SELECT coh.cohort_week, uw.week - coh.cohort_week
               AS week_offset, count(*) AS n_users
             FROM uw JOIN coh USING (u)
             GROUP BY coh.cohort_week, week_offset)
       SELECT r.cohort_week, r.week_offset, r.n_users,
         round(r.n_users::DOUBLE / sizes.sz::DOUBLE, 4) AS retention
       FROM r JOIN sizes USING (cohort_week)
       ORDER BY cohort_week, week_offset"""

  // --------------------------------------------------------------- q114
  /** Rolling z-score anomalies ([[Series.rollingAnomalies]]): per-type
    * daily event volumes on the gap-filled day grid (silent days score
    * as cnt = 0) against the trailing 7-calendar-day baseline (current
    * day excluded); moments from integer-exact window sums so both
    * engines agree bit-for-bit. */
  private def q114(s: SparkSession, d: String): DataFrame =
    Series.rollingAnomalies(Tables.events(s, d), "event_type", "ts",
        lookback = 7, zThresh = 3.0, minBase = 3)
      .orderBy("event_type", "day")

  private val q114Sql =
    """WITH obs AS (SELECT event_type, CAST(ts AS DATE) AS day,
           count(*) AS cnt
         FROM events GROUP BY event_type, day),
       span AS (SELECT min(day) AS d0, max(day) AS d1 FROM obs),
       days AS (SELECT CAST(unnest(generate_series(d0, d1,
                  INTERVAL 1 DAY)) AS DATE) AS day FROM span),
       daily AS (SELECT t.event_type, days.day,
                   coalesce(obs.cnt, 0) AS cnt
                 FROM (SELECT DISTINCT event_type FROM obs) t
                 CROSS JOIN days
                 LEFT JOIN obs ON obs.event_type = t.event_type
                              AND obs.day = days.day),
       m AS (SELECT event_type, day, cnt,
               count(cnt) OVER w AS n_base,
               sum(cnt::DOUBLE) OVER w AS sx,
               sum(cnt::DOUBLE * cnt::DOUBLE) OVER w AS sxx
             FROM daily
             WINDOW w AS (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
       s AS (SELECT event_type, day, cnt, n_base, sx / n_base AS mean,
               CASE WHEN n_base >= 2 THEN
                 sqrt(greatest((sxx / n_base - (sx / n_base) * (sx / n_base))
                   * n_base / (n_base - 1.0), 0.0)) END AS sd
             FROM m)
       SELECT event_type, day, cnt, n_base,
         CASE WHEN n_base >= 1 THEN round(mean, 4) END AS base_mean,
         round(sd, 4) AS base_sd,
         CASE WHEN n_base >= 3 AND sd > 0
              THEN round((cnt - mean) / sd, 4) END AS z,
         coalesce(CASE WHEN n_base >= 3 AND sd > 0
                       THEN abs(round((cnt - mean) / sd, 4)) >= 3.0 END,
                  false) AS is_anomaly
       FROM s ORDER BY event_type, day"""

  // --------------------------------------------------------------- q115
  /** Hybrid retrieval via reciprocal-rank fusion ([[Rank.rrfFuse]]):
    * the BM25 lexical top-50 (q97's scorer) fused with the embedding
    * cosine top-50 for query vector 0 (q40's ranker) — scores from the
    * two retrievers are incomparable, ranks fuse. Both candidate lists
    * are top-k-sized; the fusion itself never touches the corpus. */
  private val rrfTerms = Seq("spark", "vector", "stream", "window", "hash")

  private def q115(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // top-k FIRST (TakeOrdered — distributed partial top-k, no global
    // single-partition window over the scored corpus), THEN rank the
    // 50 survivors; same rows, same ranks, scale-safe plan
    val lex = Rank.bm25(Tables.documents(s, d), "doc_id", "text", rrfTerms)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(50)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
      .select("doc_id", "rank")
    val emb = Tables.embeddings(s, d)
    val sem = Similarity.knnBruteForce(emb,
        emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 50)
      .select(col("neighbor_id").as("doc_id"), col("rank"))
    Rank.rrfFuse(Seq(lex, sem), "doc_id", "rank", k0 = 60)
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(20)
  }

  private val q115Sql =
    s"""WITH toks AS (SELECT doc_id,
           regexp_split_to_array(trim(text),'\\s+') AS w FROM documents),
       dl AS (SELECT doc_id, len(w)::DOUBLE AS dl FROM toks),
       st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
       tf AS (SELECT doc_id, t AS tok, count(*)::DOUBLE AS tf
              FROM (SELECT doc_id, unnest(w) AS t FROM toks) u
              WHERE t IN (${rrfTerms.map(t => s"'$t'").mkString(",")})
              GROUP BY doc_id, t),
       idf AS (SELECT tok,
                 ln(1 + (st.n_docs - count(*)::DOUBLE + 0.5)
                      / (count(*)::DOUBLE + 0.5)) AS idf
               FROM tf, st GROUP BY tok, st.n_docs),
       sc AS (SELECT tf.doc_id,
                round(sum(idf.idf * (tf.tf * 2.2)
                  / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))), 4)
                  AS score
              FROM tf JOIN idf USING (tok) JOIN dl USING (doc_id), st
              GROUP BY tf.doc_id),
       lex AS (SELECT doc_id,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS rank
               FROM sc ORDER BY rank LIMIT 50),
       sem AS (SELECT c.vec_id AS doc_id,
                 row_number() OVER (ORDER BY
                   round(list_dot_product(q.embedding::DOUBLE[],
                       c.embedding::DOUBLE[])
                     / (sqrt(list_dot_product(q.embedding::DOUBLE[],
                          q.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(c.embedding::DOUBLE[],
                            c.embedding::DOUBLE[]))), 4) DESC,
                   c.vec_id) AS rank
               FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
               WHERE q.vec_id = 0
               ORDER BY rank LIMIT 50),
       u AS (SELECT doc_id, rank FROM lex
             UNION ALL SELECT doc_id, rank FROM sem)
       SELECT doc_id, round(sum(1.0 / (60 + rank)), 6) AS rrf_score,
         count(*) AS n_lists, min(rank) AS best_rank
       FROM u GROUP BY doc_id
       ORDER BY rrf_score DESC, doc_id LIMIT 20"""

  // --------------------------------------------------------------- q116
  /** Sliding-window RAG chunking ([[Chunks.slidingChunks]]): 32-word
    * chunks advancing by 24 (8-word overlap), fingerprinted — the
    * map-only segmentation pass in front of a chunk index; fan-out
    * happens inside the scan projection with zero shuffle. */
  private def q116(s: SparkSession, d: String): DataFrame =
    Chunks.slidingChunks(Tables.documents(s, d), "doc_id", "text",
        size = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx")

  private val q116Sql =
    """WITH w AS (SELECT doc_id,
           regexp_split_to_array(trim(text), '\s+') AS ws
         FROM documents WHERE text IS NOT NULL),
       n AS (SELECT doc_id, ws,
               1 + CAST(floor((greatest(len(ws) - 32, 0) + 23) / 24.0)
                 AS INT) AS nchunks
             FROM w),
       c AS (SELECT doc_id, ws, CAST(unnest(range(0, nchunks)) AS INT)
               AS chunk_idx
             FROM n),
       s AS (SELECT doc_id, chunk_idx,
               list_slice(ws, chunk_idx * 24 + 1, chunk_idx * 24 + 32)
                 AS cw
             FROM c)
       SELECT doc_id, chunk_idx, CAST(len(cw) AS INT) AS n_words,
         md5(array_to_string(cw, ' ')) AS chunk_fp
       FROM s ORDER BY doc_id, chunk_idx"""

  // --------------------------------------------------------------- q117
  /** Equi-depth histogram ([[Quality.equiDepthHistogram]]): 8 equal-
    * count bins over order totals — boundaries from one exact-quantile
    * aggregation, bin assignment a map-only fold over the broadcast
    * boundary array, ties-on-boundary to the lower bin in both
    * engines. */
  private val edhK = 8
  private val edhFracs = (1 until edhK).map(_.toDouble / edhK)

  private def q117(s: SparkSession, d: String): DataFrame =
    Quality.equiDepthHistogram(
        Tables.orders(s, d).select(col("o_totalprice")),
        "o_totalprice", k = edhK)
      .orderBy("bin")

  private val q117Sql =
    s"""WITH b AS (SELECT quantile_cont(o_totalprice,
           [${edhFracs.mkString(", ")}]) AS bounds FROM orders),
       a AS (SELECT CAST(len(list_filter(b.bounds, x -> o_totalprice > x))
               AS INT) AS bin,
               o_totalprice AS x
             FROM orders, b WHERE o_totalprice IS NOT NULL)
       SELECT bin, count(*) AS n_rows, min(x) AS lo, max(x) AS hi
       FROM a GROUP BY bin ORDER BY bin"""

  // --------------------------------------------------------------- q118
  /** Triangle counting ([[Graph.triangleCounts]]) over the part
    * co-occurrence graph (parts sharing an order): the engine orients
    * edges by (degree, id) — wedge fan-out capped near arboricity, the
    * form that survives power-law graphs — while the oracle uses plain
    * id order; any total-order orientation finds the same triangle
    * set, so the per-node counts must agree exactly. Edges are
    * support-thresholded (co-occurrence in ≥ 2 orders) — see the
    * inline note. */
  private def q118(s: SparkSession, d: String): DataFrame = {
    // support-thresholded affinity edges: pairs must co-occur in >= 2
    // distinct orders — the standard densification cut (incidental
    // single-order co-occurrence makes the raw graph quadratic-dense;
    // the threshold is what keeps Sum(deg^2), and so the wedge join,
    // bounded on a 100 TB basket stream). Built by the shared
    // [[graft.Kernels.partCoEdges]] kernel (q118/q123/q128/q161/q163
    // all analyze this same graph — the wedge join runs once per
    // session, not once per query).
    val edges = graft.Kernels.partCoEdges(s, d)
    Graph.triangleCounts(edges, "a", "b")
      .orderBy(col("n_triangles").desc, col("node"))
      .limit(20)
  }

  private val q118Sql =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       e AS (SELECT x.pk AS u, y.pk AS v
             FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
             GROUP BY x.pk, y.pk
             HAVING count(DISTINCT x.ok) >= 2),
       tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
               FROM e e1 JOIN e e2 ON e1.v = e2.u
               JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
       SELECT node, count(*) AS n_triangles
       FROM (SELECT a AS node FROM tri
             UNION ALL SELECT b FROM tri
             UNION ALL SELECT c FROM tri) n
       GROUP BY node
       ORDER BY n_triangles DESC, node LIMIT 20"""

  // --------------------------------------------------------------- q161
  /** k-hop BFS ([[Graph.bfsHops]]): 3-hop neighborhood growth from the
    * smallest node of q118's support-thresholded part co-occurrence
    * graph — per-distance reach counts. The engine's frontier-only
    * expansion must produce exactly the oracle's unrolled min-dist
    * closure. */
  private def q161(s: SparkSession, d: String): DataFrame = {
    // the co-occurrence graph comes from the shared (memoized,
    // already-materialized) kernel — BOTH the source pick and the BFS
    // consume it without re-running the wedge join
    val edges = graft.Kernels.partCoEdges(s, d)
    val src = edges.agg(min(col("a")).as("node"))
    val dist = Graph.bfsHops(edges, "a", "b", src, "node", hops = 3)
    dist.groupBy("dist")
      .agg(count(lit(1)).as("n_nodes"), min("node").as("min_node"),
        max("node").as("max_node"))
      .orderBy("dist")
  }

  private val q161Sql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem),
       e AS (SELECT x.pk AS u, y.pk AS v
             FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
             GROUP BY x.pk, y.pk HAVING count(*) >= 2),
       und AS (SELECT u AS s, v AS d FROM e
               UNION SELECT v AS s, u AS d FROM e),
       src AS (SELECT min(u) AS node FROM e),
       d0 AS (SELECT node, 0 AS dist FROM src),
       d1 AS (SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM d0
           UNION ALL
           SELECT und.d, 1 FROM d0 JOIN und ON d0.node = und.s
           WHERE d0.dist = 0) t GROUP BY node),
       d2 AS (SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM d1
           UNION ALL
           SELECT und.d, 2 FROM d1 JOIN und ON d1.node = und.s
           WHERE d1.dist = 1) t GROUP BY node),
       d3 AS (SELECT node, min(dist) AS dist FROM (
           SELECT node, dist FROM d2
           UNION ALL
           SELECT und.d, 3 FROM d2 JOIN und ON d2.node = und.s
           WHERE d2.dist = 2) t GROUP BY node)
       SELECT CAST(dist AS INT) AS dist, count(*) AS n_nodes,
         min(node) AS min_node, max(node) AS max_node
       FROM d3 GROUP BY dist ORDER BY dist"""

  // --------------------------------------------------------------- q119
  /** Self-join size forecast ([[Quality.selfJoinForecast]]): exact
    * Σf² for lineitem⋈lineitem on partkey next to the 1-in-10
    * deterministic key-sample extrapolation — the planner probe run
    * before committing the shuffle. */
  private def q119(s: SparkSession, d: String): DataFrame =
    Quality.selfJoinForecast(Tables.lineitem(s, d), "l_partkey",
      sampleMod = 10, salt = "sjf")

  private val q119Sql =
    """WITH c AS (SELECT l_partkey AS key, count(*) AS cnt
           FROM lineitem GROUP BY l_partkey),
       s AS (SELECT CAST(sum(cnt * cnt) AS BIGINT) AS exact_pairs,
               CAST(10 * sum(CASE WHEN ('0x' ||
                   substr(md5('sjf' || key::VARCHAR), 1, 15))::BIGINT
                   % 10 = 0 THEN cnt * cnt ELSE 0 END) AS BIGINT)
                 AS est_pairs,
               CAST(sum(cnt) AS BIGINT) AS n_rows,
               count(*) AS n_keys,
               CAST(max(cnt) AS BIGINT) AS max_key_cnt
             FROM c)
       SELECT exact_pairs, est_pairs,
         round((est_pairs - exact_pairs)::DOUBLE / exact_pairs::DOUBLE, 4)
           AS rel_err,
         n_rows, n_keys, max_key_cnt
       FROM s"""

  // --------------------------------------------------------------- q120
  /** Welch A/B readout ([[Experiment.welchAb]]): users split into two
    * deterministic hash arms (unit = user, never the event), per-type
    * means/variances from one conditional aggregation, Welch z on the
    * difference. */
  private def q120(s: SparkSession, d: String): DataFrame =
    Experiment.welchAb(Tables.events(s, d), "user_id", "value",
        "event_type", salt = "ab")
      .orderBy("event_type")

  private val q120Sql =
    """WITH b AS (SELECT event_type, value::DOUBLE AS x,
           ('0x' || substr(md5('ab' || user_id::VARCHAR), 1, 15))::BIGINT
             % 2 AS arm
         FROM events WHERE value IS NOT NULL),
       m AS (SELECT event_type,
               CAST(count(*) FILTER (arm = 0) AS BIGINT) AS n_a,
               CAST(count(*) FILTER (arm = 1) AS BIGINT) AS n_b,
               sum(x) FILTER (arm = 0) AS sa,
               sum(x) FILTER (arm = 1) AS sb,
               sum(x * x) FILTER (arm = 0) AS saa,
               sum(x * x) FILTER (arm = 1) AS sbb
             FROM b GROUP BY event_type
             HAVING n_a >= 2 AND n_b >= 2),
       t AS (SELECT event_type, n_a, n_b,
               sa / n_a AS ma, sb / n_b AS mb,
               greatest((saa / n_a - (sa / n_a) * (sa / n_a))
                 * n_a / (n_a - 1.0), 0.0) AS va,
               greatest((sbb / n_b - (sb / n_b) * (sb / n_b))
                 * n_b / (n_b - 1.0), 0.0) AS vb
             FROM m)
       SELECT event_type, n_a, n_b,
         round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
         round(ma - mb, 4) AS diff,
         round(sqrt(va / n_a + vb / n_b), 6) AS se,
         CASE WHEN va / n_a + vb / n_b > 0
              THEN round((ma - mb) / sqrt(va / n_a + vb / n_b), 4)
         END AS z
       FROM t ORDER BY event_type"""

  // --------------------------------------------------------------- q121
  /** Hard-negative mining ([[Similarity.hardNegatives]]): for each of
    * the first 5 embedding queries, the 10 most-cosine-similar vectors
    * with a DIFFERENT label — the contrastive-training near-misses.
    * Same broadcast shape as q40; the label-mismatch predicate kills
    * disqualified corpus rows map-side. */
  private def q121(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", "label", k = 10)
      .withColumn("rank", col("rank").cast("int"))
      .orderBy("query_id", "rank")
  }

  private val q121Sql =
    """SELECT query_id, neighbor_id, query_label, neighbor_label, cosine,
         CAST(rn AS INT) AS rank FROM (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           q.label AS query_label, c.label AS neighbor_label,
           round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
             / (sqrt(list_dot_product(q.embedding::DOUBLE[],
                  q.embedding::DOUBLE[]))
                * sqrt(list_dot_product(c.embedding::DOUBLE[],
                    c.embedding::DOUBLE[]))), 4) AS cosine,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
               / (sqrt(list_dot_product(q.embedding::DOUBLE[],
                    q.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.embedding::DOUBLE[],
                      c.embedding::DOUBLE[]))), 4) DESC,
             c.vec_id ASC) AS rn
         FROM embeddings q JOIN embeddings c ON q.label != c.label
         WHERE q.vec_id < 5) t
       WHERE rn <= 10
       ORDER BY query_id, rank"""

  // --------------------------------------------------------------- q122
  /** Keyed snapshot diff ([[History.snapshotDiff]]): per-customer
    * order activity before vs from 2000-01-01, reconciled in one full
    * outer join — added / removed / changed / unchanged with the
    * changed-column list. */
  private def q122(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    def snap(pred: org.apache.spark.sql.Column) = orders.filter(pred)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 4).as("total"))
    val split = lit("2000-01-01").cast("date")
    History.snapshotDiff(
        snap(col("o_orderdate") < split),
        snap(col("o_orderdate") >= split),
        "o_custkey", Seq("n_orders", "total"))
      .orderBy("o_custkey")
  }

  private val q122Sql =
    """WITH o AS (SELECT o_custkey AS k, count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total
         FROM orders WHERE o_orderdate < DATE '2000-01-01'
         GROUP BY o_custkey),
       n AS (SELECT o_custkey AS k, count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS total
         FROM orders WHERE o_orderdate >= DATE '2000-01-01'
         GROUP BY o_custkey),
       j AS (SELECT coalesce(o.k, n.k) AS o_custkey,
               o.k IS NOT NULL AS in_old, n.k IS NOT NULL AS in_new,
               concat_ws(',',
                 CASE WHEN o.n_orders IS DISTINCT FROM n.n_orders
                      THEN 'n_orders' END,
                 CASE WHEN o.total IS DISTINCT FROM n.total
                      THEN 'total' END) AS cc
             FROM o FULL OUTER JOIN n ON o.k = n.k)
       SELECT o_custkey,
         CASE WHEN NOT in_old THEN 'added'
              WHEN NOT in_new THEN 'removed'
              WHEN cc <> '' THEN 'changed'
              ELSE 'unchanged' END AS status,
         CASE WHEN in_old AND in_new THEN cc END AS changed_cols
       FROM j ORDER BY o_custkey"""

  // --------------------------------------------------------------- q123
  /** Label-propagation communities ([[Graph.labelPropagation]]): three
    * synchronous frequency-voting sweeps over the q118 affinity graph
    * — deterministic (min tie-break), oracle unrolled round by
    * round. */
  private def q123(s: SparkSession, d: String): DataFrame = {
    val edges = graft.Kernels.partCoEdges(s, d)
    Graph.labelPropagation(edges, "a", "b", rounds = 3)
      .orderBy("node")
  }

  private def lpaRound(lIn: String, cPre: String, lOut: String): String =
    s"""$cPre AS (SELECT e.src AS node, l.lbl, count(*) AS c
         FROM e JOIN $lIn l ON e.dst = l.node
         GROUP BY e.src, l.lbl),
       $lOut AS (SELECT node, lbl FROM (
           SELECT node, lbl,
             row_number() OVER (PARTITION BY node
               ORDER BY c DESC, lbl) AS rn
           FROM $cPre) t
         WHERE rn = 1)"""

  private val q123Sql =
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem),
       und AS (SELECT x.pk AS u, y.pk AS v
               FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
               GROUP BY x.pk, y.pk HAVING count(*) >= 2),
       e AS (SELECT u AS src, v AS dst FROM und
             UNION SELECT v, u FROM und),
       l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
       ${lpaRound("l0", "c1", "l1")},
       ${lpaRound("l1", "c2", "l2")},
       ${lpaRound("l2", "c3", "l3")}
       SELECT node, lbl AS community FROM l3 ORDER BY node"""

  // --------------------------------------------------------------- q124
  /** PSI drift report ([[Quality.psiDrift]]): order-total distribution
    * before vs from 2000-01-01, binned by the REFERENCE period's
    * equi-depth boundaries, Laplace-smoothed shares — the headline PSI
    * is the sum of psi_term. Two independent scans; only the k-row bin
    * tables meet. */
  private def q124(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val split = lit("2000-01-01").cast("date")
    Quality.psiDrift(
        orders.filter(col("o_orderdate") < split),
        orders.filter(col("o_orderdate") >= split),
        "o_totalprice", k = edhK)
      .orderBy("bin")
  }

  private val q124Sql =
    s"""WITH b AS (SELECT quantile_cont(o_totalprice,
           [${edhFracs.mkString(", ")}]) AS bounds
         FROM orders WHERE o_orderdate < DATE '2000-01-01'),
       rb AS (SELECT CAST(len(list_filter(b.bounds, x -> o_totalprice > x))
                AS INT) AS bin, count(*) AS n_ref
              FROM orders, b
              WHERE o_orderdate < DATE '2000-01-01'
                AND o_totalprice IS NOT NULL
              GROUP BY bin),
       cb AS (SELECT CAST(len(list_filter(b.bounds, x -> o_totalprice > x))
                AS INT) AS bin, count(*) AS n_cur
              FROM orders, b
              WHERE o_orderdate >= DATE '2000-01-01'
                AND o_totalprice IS NOT NULL
              GROUP BY bin),
       j AS (SELECT g.bin, coalesce(rb.n_ref, 0) AS n_ref,
               coalesce(cb.n_cur, 0) AS n_cur
             FROM (SELECT CAST(range AS INT) AS bin
                   FROM range(0, $edhK)) g
             LEFT JOIN rb USING (bin) LEFT JOIN cb USING (bin)),
       t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j)
       SELECT bin, n_ref, n_cur,
         round((n_ref + 0.5) / (tr + ${0.5 * edhK}), 6) AS p_ref,
         round((n_cur + 0.5) / (tc + ${0.5 * edhK}), 6) AS p_cur,
         round(((n_cur + 0.5) / (tc + ${0.5 * edhK})
                - (n_ref + 0.5) / (tr + ${0.5 * edhK}))
           * ln(((n_cur + 0.5) / (tc + ${0.5 * edhK}))
                / ((n_ref + 0.5) / (tr + ${0.5 * edhK}))), 6) AS psi_term
       FROM j, t ORDER BY bin"""

  // --------------------------------------------------------------- q158
  /** Exact two-sample KS drift ([[Quality.ksDrift]]): event-value
    * distribution in the first half of the corpus window vs the rest —
    * the binning-free companion to q124's PSI. The engine's two-level
    * bucketed prefix sum must agree with the oracle's single global
    * cumsum on the statistic, its location and the exact decimal
    * cross-product tie-break. */
  private def q158(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val split = lit("2024-01-16").cast("date")
    Quality.ksDrift(
      ev.filter(to_date(col("ts")) < split),
      ev.filter(to_date(col("ts")) >= split),
      "value", buckets = 32)
  }

  private val q158Sql =
    """WITH r AS (SELECT value AS v, count(*) AS nr FROM events
           WHERE CAST(ts AS DATE) < DATE '2024-01-16'
             AND value IS NOT NULL GROUP BY v),
       c AS (SELECT value AS v, count(*) AS nc FROM events
           WHERE CAST(ts AS DATE) >= DATE '2024-01-16'
             AND value IS NOT NULL GROUP BY v),
       u AS (SELECT coalesce(r.v, c.v) AS v, coalesce(nr, 0) AS nr,
               coalesce(nc, 0) AS nc
             FROM r FULL OUTER JOIN c ON r.v = c.v),
       m AS (SELECT v, sum(nr) OVER (ORDER BY v) AS cr,
               sum(nc) OVER (ORDER BY v) AS cc FROM u),
       t AS (SELECT sum(nr) AS tr, sum(nc) AS tc FROM u),
       d AS (SELECT v,
               abs(cr::HUGEINT * tc::HUGEINT - cc::HUGEINT * tr::HUGEINT)
                 AS diff, tr, tc FROM m, t)
       SELECT CAST(tr AS BIGINT) AS n_ref, CAST(tc AS BIGINT) AS n_cur,
         round(diff::DOUBLE / (tr::DOUBLE * tc::DOUBLE), 6) AS ks_stat,
         v AS ks_at
       FROM d ORDER BY diff DESC, v ASC LIMIT 1"""

  // --------------------------------------------------------------- q125
  /** Top user journeys ([[Series.topPaths]]): the 20 most frequent
    * 3-step event-type sequences — transitionMatrix's conditionals one
    * order up; one key-sorted window pass, map-side-collapsing path
    * aggregation, TakeOrderedAndProject top-N. */
  private def q125(s: SparkSession, d: String): DataFrame =
    Series.topPaths(Tables.events(s, d), "user_id", "ts", "event_type",
      "event_id", len = 3, topN = 20)

  private val q125Sql =
    """WITH seq AS (SELECT event_type AS s0,
           lead(event_type, 1) OVER w AS s1,
           lead(event_type, 2) OVER w AS s2
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       paths AS (SELECT s0 || '>' || s1 || '>' || s2 AS path, count(*) AS n
                 FROM seq
                 WHERE s1 IS NOT NULL AND s2 IS NOT NULL
                 GROUP BY path)
       SELECT path, n FROM paths ORDER BY n DESC, path LIMIT 20"""

  // --------------------------------------------------------------- q126
  /** Sample-ratio-mismatch guardrail ([[Experiment.srmCheck]]): the
    * pre-readout sanity check on q120's arms — distinct users per arm
    * per event type, 1-dof equal-split chi-square, alarm at p < 0.01. */
  private def q126(s: SparkSession, d: String): DataFrame =
    Experiment.srmCheck(Tables.events(s, d), "user_id", "event_type",
        salt = "ab")
      .orderBy("event_type")

  private val q126Sql =
    """WITH units AS (SELECT DISTINCT event_type, user_id FROM events),
       c AS (SELECT event_type,
               CAST(sum(CASE WHEN ('0x' ||
                   substr(md5('ab' || user_id::VARCHAR), 1, 15))::BIGINT
                   % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN ('0x' ||
                   substr(md5('ab' || user_id::VARCHAR), 1, 15))::BIGINT
                   % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
             FROM units GROUP BY event_type)
       SELECT event_type, n_a, n_b,
         round((n_a - n_b)::DOUBLE * (n_a - n_b) / (n_a + n_b), 4)
           AS chi2,
         round((n_a - n_b)::DOUBLE * (n_a - n_b) / (n_a + n_b), 4)
           > 6.635 AS srm_suspect
       FROM c ORDER BY event_type"""

  // --------------------------------------------------------------- q127
  /** Containment near-dup ([[Dedup.containmentPairs]]): asymmetric
    * quote/subset detection at containment ≥ 0.9 over the df-capped
    * inverted index — every 25th document gets an injected
    * first-half twin (prefix shingles ⇒ containment 1.0), keeping the
    * oracle non-vacuous alongside any natural subsets. */
  private def q127(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.words
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val ws = words(col("text"))
    val synth = docs
      .filter(pmod(col("doc_id"), lit(25)) === 0 &&
        org.apache.spark.sql.functions.size(ws) >= 6)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(ws, lit(1),
          floor(org.apache.spark.sql.functions.size(ws) / lit(2.0))
            .cast("int")), " ").as("text"))
    // cap 8 (vs q38's 16): containment candidates skew toward short
    // inner docs, so the index's df tail costs ~6x more pair fan-out
    // here — and a subset relationship always shares the inner doc's
    // RARE shingles, which is what the capped index keeps. The index
    // over docs ∪ synth is a pure function of the dir (the injection
    // is deterministic), so it comes from the session's persisted-
    // index kernel like q38's.
    val input = docs.unionByName(synth)
    Dedup.containmentPairs(input, "doc_id", "text",
        threshold = 0.9, shingleN = 3, maxShingleDf = 8,
        precomputed = Some(graft.Kernels.cappedShingleIndexOf(
          s, ("q127", d, 3, 8))(input, "doc_id", "text", 3, 8)))
      .orderBy("inner_doc", "outer_doc")
  }

  // --------------------------------------------------------------- q152
  /** Alignment-free repeated-passage detection ([[Spans
    * .repeatedPassages]]): 8-word sliding windows at every offset,
    * corpus-wide recurrence, per-document maximal-run merge. Every
    * 20th document gets an injected half-twin (its first half under a
    * new id — q127's construction), so cross-document passages exist
    * at known places and the whole pipeline — window hashing,
    * occurrence counting, run merging — is value-checked against the
    * oracle's window-text replay. */
  private def q152(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.words
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val ws = words(col("text"))
    val synth = docs
      .filter(pmod(col("doc_id"), lit(20)) === 0 &&
        org.apache.spark.sql.functions.size(ws) >= 16)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        array_join(slice(ws, lit(1),
          floor(org.apache.spark.sql.functions.size(ws) / lit(2.0))
            .cast("int")), " ").as("text"))
    graft.operators.Spans.repeatedPassages(
        docs.unionByName(synth), "doc_id", "text", k = 8)
      .orderBy("doc_id")
  }

  private val q152Sql =
    """WITH wa0 AS (SELECT doc_id, regexp_split_to_array(trim(text),'\s+') w
           FROM documents),
       synth AS (SELECT doc_id + 2000000 AS doc_id,
           w[1:CAST(floor(len(w) / 2.0) AS INT)] AS w
         FROM wa0 WHERE doc_id % 20 = 0 AND len(w) >= 16),
       wa AS (SELECT doc_id, w FROM wa0 UNION ALL
              SELECT doc_id, w FROM synth),
       win AS (SELECT doc_id, unnest(range(1, len(w) - 6)) AS pos, w
               FROM wa WHERE len(w) >= 8),
       wt AS (SELECT doc_id, pos,
                array_to_string(w[pos:pos+7], ' ') AS t FROM win),
       rep AS (SELECT t FROM wt GROUP BY t HAVING count(*) > 1),
       flag AS (SELECT doc_id, pos FROM wt
                WHERE t IN (SELECT t FROM rep)),
       seg AS (SELECT doc_id, pos,
                pos - row_number() OVER (PARTITION BY doc_id
                                         ORDER BY pos) AS g
               FROM flag),
       sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
              FROM seg GROUP BY doc_id, g)
       SELECT doc_id, count(*) AS n_passages,
         CAST(sum(e - s + 1) AS BIGINT) AS rep_words,
         CAST(max(e - s + 1) AS BIGINT) AS longest
       FROM sp GROUP BY doc_id ORDER BY doc_id"""

  private val q127Sql =
    """WITH wa0 AS (SELECT doc_id, regexp_split_to_array(trim(text),'\s+') w
           FROM documents),
       synth AS (SELECT doc_id + 1000000 AS doc_id,
           array_to_string(w[1:CAST(floor(len(w) / 2.0) AS INT)], ' ')
             AS text
         FROM wa0 WHERE doc_id % 25 = 0 AND len(w) >= 6),
       alldocs AS (SELECT doc_id, text FROM documents
                   UNION ALL SELECT doc_id, text FROM synth),
       wa AS (SELECT doc_id, regexp_split_to_array(trim(text),'\s+') w
              FROM alldocs),
       sh AS (SELECT doc_id,
           CASE WHEN len(w) >= 3
                THEN list_distinct(list_transform(range(1, len(w)-1),
                       i -> array_to_string(w[i:i+2], ' ')))
                ELSE [array_to_string(w, ' ')] END AS sh
         FROM wa),
       inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       dfT AS (SELECT s, count(*) AS df FROM inv GROUP BY s),
       idx AS (SELECT inv.doc_id, inv.s FROM inv JOIN dfT USING (s)
               WHERE df BETWEEN 2 AND 8),
       cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                FROM idx a JOIN idx b
                  ON a.s = b.s AND a.doc_id < b.doc_id),
       pairs AS (SELECT da, db,
                   len(list_intersect(x.sh, y.sh))::DOUBLE AS inter,
                   len(x.sh)::DOUBLE AS sa, len(y.sh)::DOUBLE AS sb
                 FROM cand JOIN sh x ON x.doc_id = da
                 JOIN sh y ON y.doc_id = db)
       SELECT inner_doc, outer_doc, containment FROM (
         SELECT da AS inner_doc, db AS outer_doc,
           round(inter / sa, 4) AS containment FROM pairs
         UNION ALL
         SELECT db, da, round(inter / sb, 4) FROM pairs) u
       WHERE containment >= 0.9
       ORDER BY inner_doc, outer_doc"""

  // --------------------------------------------------------------- q128
  /** Graph negative sampling ([[Graph.negativeSample]]): deterministic
    * candidate non-edges for the q118 affinity graph — hash-bucket
    * adjacency pairing, real edges anti-joined away; a pure function
    * of (nodes, salt) the oracle replays. */
  private def q128(s: SparkSession, d: String): DataFrame = {
    val edges = graft.Kernels.partCoEdges(s, d)
    Graph.negativeSample(edges, "a", "b", buckets = 64, salt = "neg")
      .orderBy("u", "v")
  }

  private val q128Sql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem),
       e AS (SELECT x.pk AS u, y.pk AS v
             FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
             GROUP BY x.pk, y.pk HAVING count(*) >= 2),
       nodes AS (SELECT DISTINCT node,
                   ('0x' || substr(md5('neg' || node::VARCHAR), 1, 15))
                     ::BIGINT AS h
                 FROM (SELECT u AS node FROM e
                       UNION ALL SELECT v FROM e) t),
       nb AS (SELECT node, h, h % 64 AS b FROM nodes),
       cand AS (SELECT least(node, nxt) AS u, greatest(node, nxt) AS v
                FROM (SELECT node, b,
                        lead(node, 1) OVER (PARTITION BY b
                          ORDER BY h, node) AS nxt
                      FROM nb) t
                WHERE nxt IS NOT NULL)
       SELECT cand.u, cand.v FROM cand
       LEFT JOIN e ON e.u = cand.u AND e.v = cand.v
       WHERE e.u IS NULL
       ORDER BY cand.u, cand.v"""

  // --------------------------------------------------------------- q129
  /** PMI association mining ([[Assoc.pmiPairs]]): the 20 part pairs
    * whose order co-occurrence most exceeds what their individual
    * popularity predicts (min support 3) — counts rank ubiquitous
    * pairs first, PMI surfaces the informative ones. */
  private def q129(s: SparkSession, d: String): DataFrame =
    Assoc.pmiPairs(
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", minSupport = 3L, topN = 20)

  private val q129Sql =
    """WITH bi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
           FROM lineitem),
       tot AS (SELECT count(DISTINCT bk)::DOUBLE AS n_bk FROM bi),
       ic AS (SELECT it, count(*) AS cnt FROM bi GROUP BY it),
       p AS (SELECT x.it AS item_a, y.it AS item_b, count(*) AS n_pairs
             FROM bi x JOIN bi y ON x.bk = y.bk AND x.it < y.it
             GROUP BY x.it, y.it HAVING count(*) >= 3)
       SELECT item_a, item_b, n_pairs, a.cnt AS n_a, b.cnt AS n_b,
         round(ln(n_pairs::DOUBLE * tot.n_bk
           / (a.cnt::DOUBLE * b.cnt::DOUBLE)), 4) AS pmi
       FROM p JOIN ic a ON p.item_a = a.it JOIN ic b ON p.item_b = b.it,
            tot
       ORDER BY pmi DESC, item_a, item_b LIMIT 20"""

  // --------------------------------------------------------------- q130
  /** Day-of-week seasonality ([[Series.weekdayProfile]]): per-type
    * weekday shares and seasonality indices, with `dow` as epoch-mod-7
    * integer days (0 = Monday) — engine `dayofweek()` numbering is the
    * cross-engine trap. */
  private def q130(s: SparkSession, d: String): DataFrame =
    Series.weekdayProfile(Tables.events(s, d), "event_type", "ts")
      .orderBy("event_type", "dow")

  private val q130Sql =
    """WITH daily AS (SELECT event_type,
           CAST(datediff('day', DATE '1990-01-01', CAST(ts AS DATE)) % 7
             AS INT) AS dow,
           count(*) AS n
         FROM events GROUP BY event_type, dow)
       SELECT event_type, dow, n,
         round(n::DOUBLE / sum(n) OVER (PARTITION BY event_type), 6)
           AS share,
         round(n::DOUBLE * 7.0 / sum(n) OVER (PARTITION BY event_type), 4)
           AS season_idx
       FROM daily ORDER BY event_type, dow"""

  // --------------------------------------------------------------- q131
  /** Skip-gram PMI ([[Assoc.skipgramPmi]]): the 20 window-3 token
    * pairs whose co-occurrence most exceeds their unigram rates — the
    * statistic word2vec factorizes; co-occurrence via `window`
    * (doc, pos+k) equi-joins, never a range join. */
  private def q131(s: SparkSession, d: String): DataFrame =
    Assoc.skipgramPmi(Tables.documents(s, d), "doc_id", "text",
      window = 3, minCount = 5L, topN = 20)

  private val q131Sql =
    """WITH toks AS (SELECT doc_id AS d,
           CAST(generate_subscripts(w, 1) - 1 AS INT) AS pos,
           unnest(w) AS w
         FROM (SELECT doc_id, regexp_split_to_array(trim(text),'\s+') w
               FROM documents) t),
       ntok AS (SELECT count(*)::DOUBLE AS n_tok FROM toks),
       tc AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
       praw AS (SELECT least(a.w, b.w) AS tok_a, greatest(a.w, b.w)
                  AS tok_b
                FROM toks a, range(1, 4) o(k)
                JOIN toks b ON b.d = a.d AND b.pos = a.pos + k),
       pc AS (SELECT tok_a, tok_b, count(*) AS n_ab FROM praw
              GROUP BY tok_a, tok_b),
       npairs AS (SELECT sum(n_ab)::DOUBLE AS n_pairs FROM pc)
       SELECT tok_a, tok_b, n_ab, a.cnt AS n_a, b.cnt AS n_b,
         round(ln((n_ab::DOUBLE / npairs.n_pairs) /
           ((a.cnt::DOUBLE / ntok.n_tok) * (b.cnt::DOUBLE / ntok.n_tok))),
           4) AS pmi
       FROM pc JOIN tc a ON pc.tok_a = a.w JOIN tc b ON pc.tok_b = b.w,
            npairs, ntok
       WHERE n_ab >= 5
       ORDER BY pmi DESC, tok_a, tok_b LIMIT 20"""

  // --------------------------------------------------------------- q132
  /** Vocabulary coverage / OOV ([[Quality.vocabCoverage]]): per-doc
    * share of tokens outside the top-500 corpus vocabulary — the
    * gibberish/wrong-language flag and the tokenizer-vocab sizing
    * number. */
  private def q132(s: SparkSession, d: String): DataFrame =
    Quality.vocabCoverage(Tables.documents(s, d), "doc_id", "text",
        topK = 500)
      .orderBy("doc_id")

  private val q132Sql =
    """WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(
           trim(text),'\s+')) AS w FROM documents),
       vocab AS (SELECT w FROM (SELECT w, count(*) AS cnt FROM toks
                                GROUP BY w
                                ORDER BY cnt DESC, w LIMIT 500) v),
       flagged AS (SELECT t.doc_id, vocab.w IS NOT NULL AS inv
                   FROM toks t LEFT JOIN vocab ON t.w = vocab.w)
       SELECT doc_id, count(*) AS n_tokens,
         CAST(sum(CASE WHEN inv THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
         round(sum(CASE WHEN inv THEN 0 ELSE 1 END)::DOUBLE / count(*), 4)
           AS oov_rate
       FROM flagged GROUP BY doc_id ORDER BY doc_id"""

  // --------------------------------------------------------------- q133
  /** Deterministic HyperLogLog ([[Sketch.hllEstimate]]): distinct
    * part keys in lineitem from 256 registers on the shared md5
    * kernel, next to the exact count — registers, scaled harmonic sum,
    * and estimate all replayed by the oracle (the value-checkable
    * counterpart of q45's engine-internal approx_count_distinct). */
  private def q133(s: SparkSession, d: String): DataFrame = {
    val keys = Tables.lineitem(s, d)
      .select(col("l_partkey").cast("string").as("k"))
    val exact = keys.agg(countDistinct(col("k")).as("true_distinct"))
    Sketch.hllEstimate(keys, "k", p = 8)
      .crossJoin(exact)
      .withColumn("rel_err",
        round((col("hll_estimate") - col("true_distinct"))
          / col("true_distinct").cast("double"), 4))
  }

  private val q133Sql =
    """WITH h AS (SELECT ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))
           ::BIGINT AS h
         FROM lineitem),
       r AS (SELECT h % 256 AS bucket,
               max(CASE WHEN (h >> 8) = 0 THEN 53
                        ELSE 53 - length(bin(h >> 8)) END) AS mreg
             FROM h GROUP BY bucket),
       a AS (SELECT count(*) AS used,
               CAST(sum(1::BIGINT << CAST(53 - mreg AS INT)) AS BIGINT)
                 AS sum_present
             FROM r),
       st AS (SELECT used, 256 - used AS zeros,
                sum_present + (256 - used) * (1::BIGINT << 53)
                  AS sum_scaled
              FROM a),
       e AS (SELECT used, zeros, sum_scaled,
               (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
                 * 9007199254740992.0 / sum_scaled::DOUBLE AS raw
             FROM st),
       f AS (SELECT CAST(256 AS INT) AS m, used, zeros, sum_scaled,
               round(CASE WHEN raw <= 640.0 AND zeros > 0
                          THEN 256.0 * ln(256.0 / zeros::DOUBLE)
                          ELSE raw END, 4) AS hll_estimate
             FROM e),
       t AS (SELECT count(DISTINCT l_partkey) AS true_distinct
             FROM lineitem)
       SELECT f.m, f.used, f.zeros, f.sum_scaled, f.hll_estimate,
         t.true_distinct,
         round((f.hll_estimate - t.true_distinct)
           / t.true_distinct::DOUBLE, 4) AS rel_err
       FROM f, t"""

  // --------------------------------------------------------------- q134
  /** Grouped ridge regression ([[graft.engine.Ols.fitRidgeGrouped]]):
    * price-vs-quantity per return flag with λ = 100 — the one-line
    * regularized extension of the reference's closed-form OLS kernel,
    * still one sufficient-statistics aggregation. */
  private def q134(s: SparkSession, d: String): DataFrame =
    graft.engine.Ols.fitRidgeGrouped(Tables.lineitem(s, d),
        "l_quantity", "l_extendedprice", "l_returnflag", lambda = 100.0)
      .orderBy("l_returnflag")

  private val q134Sql =
    """WITH s AS (SELECT l_returnflag, count(*) AS n_rows,
           sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
           sum(x * y) AS sxy
         FROM (SELECT l_returnflag, l_quantity AS x,
                 l_extendedprice AS y
               FROM lineitem
               WHERE l_quantity IS NOT NULL
                 AND l_extendedprice IS NOT NULL) t
         GROUP BY l_returnflag),
       r AS (SELECT l_returnflag, n_rows, n_rows::DOUBLE AS n,
               sx / n_rows::DOUBLE AS xm, sy / n_rows::DOUBLE AS ym,
               sxx, sxy
             FROM s),
       w AS (SELECT l_returnflag, n_rows, xm, ym,
               (sxy - n * xm * ym) / ((sxx - n * xm * xm) + 100.0) AS w1
             FROM r)
       SELECT l_returnflag, CAST(n_rows AS BIGINT) AS n_rows,
         round(ym - w1 * xm, 6) AS w0, round(w1, 6) AS w1
       FROM w ORDER BY l_returnflag"""

  // --------------------------------------------------------------- q135
  /** Daily percentile bands: p10/p50/p90 of event values per day —
    * the banded time-series view every metrics dashboard draws; exact
    * interpolated quantiles, one grouped aggregation (same
    * `percentile` ↔ `quantile_cont` contract as q48/q95). */
  private def q135(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("value"))
      .filter(col("value").isNotNull)
      .groupBy("day")
      .agg(count(lit(1)).as("n"),
        expr("percentile(value, array(0.1, 0.5, 0.9))").as("q"))
      .select(col("day"), col("n"),
        round(element_at(col("q"), 1), 4).as("p10"),
        round(element_at(col("q"), 2), 4).as("p50"),
        round(element_at(col("q"), 3), 4).as("p90"))
      .orderBy("day")

  private val q135Sql =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, value FROM events
         WHERE value IS NOT NULL),
       g AS (SELECT day, count(*) AS n,
               quantile_cont(value, [0.1, 0.5, 0.9]) AS q
             FROM d GROUP BY day)
       SELECT day, n, round(q[1], 4) AS p10, round(q[2], 4) AS p50,
         round(q[3], 4) AS p90
       FROM g ORDER BY day"""

  // --------------------------------------------------------------- q136
  /** RFM customer segmentation: per-customer recency (days before the
    * corpus's last order date), frequency, and monetary total, each
    * scored 1–4 against its own quartile boundaries (exact order
    * statistics per metric via the narrowing kernel, folded back as
    * literals — the equi-depth bin pattern, never a global ntile
    * window). Ties on a boundary go to
    * the lower bin in both engines; recency scores INVERT (recent =
    * better). */
  private def q136(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val maxDay = orders.agg(max(to_date(col("o_orderdate"))).as("d1"))
    // referenced by the boundary aggregation AND the scoring pass —
    // persist so the customer aggregation shuffle runs once
    val rfm = orders
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("frequency"),
        round(sum(col("o_totalprice")), 4).as("monetary"))
      .crossJoin(broadcast(maxDay))
      .select(col("o_custkey"),
        datediff(col("d1"), col("last_day")).cast("long").as("recency"),
        col("frequency"), col("monetary"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // quartile boundaries as exact order statistics (k = ceil(q·n),
    // the q182 contract) — the customer table is one group, and a
    // single-group exact `percentile` buffers its whole multiset
    val qs3 = graft.engine.OrderStat.quantileRanks(Seq(0.25, 0.5, 0.75)) _
    // all nine (metric, quantile) tasks advance through ONE wide
    // histogram aggregation per narrowing round
    // bins=512 (vs the 32 default): monetary is a 1e-4-grid double
    // with a ~6e9-step range, so 32-bin narrowing needs ~6 rounds —
    // each a full job over the cached table; 512 bins converge in ~2.
    // Shuffled state stays 9 tasks × 512 longs — still trivial.
    val Seq((_, rb), (_, fb), (_, mb)) = graft.engine.OrderStat
      .multiQuantiles(rfm,
        Seq("recency" -> qs3, "frequency" -> qs3, "monetary" -> qs3),
        bins = 512)
    def above(v: org.apache.spark.sql.Column, bs: Seq[Double]) =
      bs.foldLeft(lit(0))((acc, x) =>
        acc + when(v.cast("double") > lit(x), 1).otherwise(0))
    val result = rfm
      .select(col("o_custkey"), col("recency"), col("frequency"),
        col("monetary"),
        (lit(4) - above(col("recency"), rb)).as("r_score"),
        (lit(1) + above(col("frequency"), fb)).as("f_score"),
        (lit(1) + above(col("monetary"), mb)).as("m_score"))
      .withColumn("segment", concat(col("r_score"), col("f_score"),
        col("m_score")))
      .orderBy("o_custkey")
    graft.operators.Exec.owned(result, Seq(rfm))
  }

  private val q136Sql =
    """WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
       rfm AS (SELECT o_custkey,
                 CAST(datediff('day', max(CAST(o_orderdate AS DATE)),
                   (SELECT d1 FROM mx)) AS BIGINT) AS recency,
                 count(*) AS frequency,
                 round(sum(o_totalprice), 4) AS monetary
               FROM orders GROUP BY o_custkey),
       -- quartiles as exact order statistics (k = ceil(q*n)),
       -- mirroring the engine's iterative k-th-smallest kernel
       nn AS (SELECT count(*) AS c FROM rfm),
       ks AS (SELECT q, greatest(1, CAST(ceil(q * c) AS BIGINT)) AS k
              FROM (SELECT unnest([0.25, 0.5, 0.75]) AS q), nn),
       rr AS (SELECT recency::DOUBLE AS x,
              row_number() OVER (ORDER BY recency) AS rn FROM rfm),
       fr AS (SELECT frequency::DOUBLE AS x,
              row_number() OVER (ORDER BY frequency) AS rn FROM rfm),
       mr AS (SELECT monetary::DOUBLE AS x,
              row_number() OVER (ORDER BY monetary) AS rn FROM rfm),
       b AS (SELECT
               (SELECT list(r.x ORDER BY ks.q) FROM ks
                  JOIN rr r ON r.rn = ks.k) AS rb,
               (SELECT list(r.x ORDER BY ks.q) FROM ks
                  JOIN fr r ON r.rn = ks.k) AS fb,
               (SELECT list(r.x ORDER BY ks.q) FROM ks
                  JOIN mr r ON r.rn = ks.k) AS mb),
       sc AS (SELECT o_custkey, recency, frequency, monetary,
                4 - len(list_filter(b.rb, x -> recency::DOUBLE > x))
                  AS r_score,
                1 + len(list_filter(b.fb, x -> frequency::DOUBLE > x))
                  AS f_score,
                1 + len(list_filter(b.mb, x -> monetary::DOUBLE > x))
                  AS m_score
              FROM rfm, b)
       SELECT o_custkey, recency, frequency, monetary,
         CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
         CAST(m_score AS INT) AS m_score,
         r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR
           AS segment
       FROM sc ORDER BY o_custkey"""

  // --------------------------------------------------------------- q137
  /** Dedup evaluation harness — "measure, don't guess" as a query:
    * banded-minhash pairs (q36's operator) scored against the exact
    * capped-index Jaccard ground truth (q38's operator) at the same
    * 0.8 threshold: one row `(n_exact, n_lsh, n_common, recall,
    * precision)`. LSH recall < 1 comes from banding; precision < 1
    * from the exact path's df-cap contract — this query watches both
    * numbers so neither degrades silently. */
  private def q137(s: SparkSession, d: String): DataFrame = {
    // eval sample: recall/precision are MEASUREMENTS — a fixed-size
    // deterministic sample is how an eval harness runs at corpus
    // scale (the full-corpus dedup itself is graded by q36/q38)
    // both pair frames are session kernels (graft.Kernels): pure
    // functions of (dir, sample bound, params), memoized and pinned —
    // the eval harness posture where the sample's pair ground truth is
    // computed once per corpus snapshot and every measurement reads it
    val lsh = graft.Kernels.sampleMinhashPairs(s, d, idBelow = 2500L,
        threshold = 0.8)
      .select("doc_a", "doc_b")
    val exact = graft.Kernels.sampleJaccardPairs(s, d, idBelow = 2500L,
        threshold = 0.8, maxShingleDf = 16)
      .select("doc_a", "doc_b")
    val common = lsh.join(exact, Seq("doc_a", "doc_b"), "left_semi")
    val stats = lsh.agg(count(lit(1)).as("n_lsh"))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .crossJoin(common.agg(count(lit(1)).as("n_common")))
    // 1-row result, materialized eagerly; the memoized kernels are the
    // session's to keep (Kernels.clear releases them)
    graft.operators.Exec.owned(
      stats.select(col("n_exact"), col("n_lsh"), col("n_common"),
        round(col("n_common").cast("double") /
          col("n_exact").cast("double"), 4).as("recall"),
        round(col("n_common").cast("double") /
          col("n_lsh").cast("double"), 4).as("precision")),
      Nil)
  }

  // the shared band CTEs scoped to the same eval sample: the one
  // corpus scan in minhashBandCtes is its `wa` CTE — patch its FROM
  // (and fail loudly at init if the shared string ever changes shape)
  private val q137Ctes = {
    val patched = Pipeline.minhashBandCtes.replace(
      "FROM documents)", "FROM documents WHERE doc_id < 2500)")
    require(patched != Pipeline.minhashBandCtes,
      "q137 oracle: minhashBandCtes no longer contains the expected scan")
    patched
  }

  private val q137Sql = q137Ctes +
    s""",
       lshcand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                   FROM bands a JOIN bands b
                     ON a.b = b.b AND a.key = b.key
                     AND a.doc_id < b.doc_id),
       lsh AS (SELECT da AS doc_a, db AS doc_b
               FROM lshcand JOIN sh x ON x.doc_id = da
               JOIN sh y ON y.doc_id = db
               WHERE round(len(list_intersect(x.sh, y.sh))::DOUBLE /
                 (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))),
                 4) >= 0.8),
       inv AS (SELECT doc_id, unnest(sh) AS s FROM sh),
       dfT AS (SELECT s, count(*) AS df FROM inv GROUP BY s),
       idx AS (SELECT inv.doc_id, inv.s FROM inv JOIN dfT USING (s)
               WHERE df BETWEEN 2 AND 16),
       ecand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                 FROM idx a JOIN idx b
                   ON a.s = b.s AND a.doc_id < b.doc_id),
       ex AS (SELECT da AS doc_a, db AS doc_b
              FROM ecand JOIN sh x ON x.doc_id = da
              JOIN sh y ON y.doc_id = db
              WHERE round(len(list_intersect(x.sh, y.sh))::DOUBLE /
                (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))),
                4) >= 0.8),
       c AS (SELECT count(*) AS n_common
             FROM lsh WHERE EXISTS (SELECT 1 FROM ex
               WHERE ex.doc_a = lsh.doc_a AND ex.doc_b = lsh.doc_b))
       SELECT (SELECT count(*) FROM ex) AS n_exact,
         (SELECT count(*) FROM lsh) AS n_lsh,
         c.n_common,
         round(c.n_common::DOUBLE / (SELECT count(*) FROM ex), 4)
           AS recall,
         round(c.n_common::DOUBLE / (SELECT count(*) FROM lsh), 4)
           AS precision
       FROM c"""

  // --------------------------------------------------------------- q138
  /** Interpolated trigram LM score — the model order past q72
    * (unigram) and q81 (bigram), with Jelinek-Mercer interpolation
    * `P = 0.1·P(w₃) + 0.3·P(w₃|w₂) + 0.6·P(w₃|w₁w₂)` so rare contexts
    * back off smoothly instead of spiking. Denominators are plain
    * occurrence counts (every conditional is ≤ 1; edge positions make
    * them not exactly normalized — the standard scoring convention).
    * Per document: trigram count and mean interpolated log-prob.
    *
    * Scale: trigram/bigram/unigram rows all come from the native
    * shingle expression inside the scan projection; the three count
    * tables are ngram-cardinality and join back by ngram key; N is a
    * one-row broadcast. No window, no self-join.
    */
  private def q138(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.words
    import graft.operators.Dedup.shingleRowsRaw
    val docs = Tables.documents(s, d)
      .filter(org.apache.spark.sql.functions.size(words(col("text"))) >= 3)
    val tri = shingleRowsRaw(docs, "doc_id", "text", 3)
      .withColumnRenamed("id", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = docs.select(col("doc_id"),
      explode(words(col("text"))).as("t"))
    val c1 = uni.groupBy("t").agg(count(lit(1)).as("c1"))
    val c2 = shingleRowsRaw(docs, "doc_id", "text", 2)
      .groupBy("s").agg(count(lit(1)).as("c2"))
    val c3 = tri.groupBy("s").agg(count(lit(1)).as("c3"))
    val nTok = uni.agg(count(lit(1)).cast("double").as("n_tok"))
    val keyed = tri.select(col("doc_id"), col("s"),
      substring_index(col("s"), " ", 2).as("b12"),
      substring_index(col("s"), " ", -2).as("b23"),
      substring_index(substring_index(col("s"), " ", 2), " ", -1)
        .as("w2"),
      substring_index(col("s"), " ", -1).as("w3"))
    val scored = keyed
      .join(c3, "s")
      .join(c2.select(col("s").as("b12"), col("c2").as("c2_12")), "b12")
      .join(c2.select(col("s").as("b23"), col("c2").as("c2_23")), "b23")
      .join(c1.select(col("t").as("w2"), col("c1").as("c1_2")), "w2")
      .join(c1.select(col("t").as("w3"), col("c1").as("c1_3")), "w3")
      .crossJoin(broadcast(nTok))
      .select(col("doc_id"),
        log(lit(0.1) * (col("c1_3").cast("double") / col("n_tok")) +
          lit(0.3) * (col("c2_23").cast("double") /
            col("c1_2").cast("double")) +
          lit(0.6) * (col("c3").cast("double") /
            col("c2_12").cast("double"))).as("l"))
    val result = scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        round(avg(col("l")), 4).as("avg_interp_logprob"))
      .orderBy("doc_id")
    graft.operators.Exec.owned(result, Seq(tri))
  }

  private val q138Sql =
    """WITH wa AS (SELECT doc_id, regexp_split_to_array(trim(text),'\s+') w
           FROM documents),
       w3a AS (SELECT doc_id, w FROM wa WHERE len(w) >= 3),
       tri AS (SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
         FROM w3a),
       bi AS (SELECT doc_id,
           unnest(list_transform(range(1, len(w)),
             i -> w[i] || ' ' || w[i+1])) AS s
         FROM w3a),
       uni AS (SELECT doc_id, unnest(w) AS t FROM w3a),
       c1 AS (SELECT t, count(*) AS c1 FROM uni GROUP BY t),
       c2 AS (SELECT s, count(*) AS c2 FROM bi GROUP BY s),
       c3 AS (SELECT s, count(*) AS c3 FROM tri GROUP BY s),
       ntok AS (SELECT count(*)::DOUBLE AS n_tok FROM uni),
       keyed AS (SELECT doc_id, s,
           split_part(s, ' ', 1) || ' ' || split_part(s, ' ', 2) AS b12,
           split_part(s, ' ', 2) || ' ' || split_part(s, ' ', 3) AS b23,
           split_part(s, ' ', 2) AS w2, split_part(s, ' ', 3) AS w3
         FROM tri),
       scored AS (SELECT doc_id,
           ln(0.1 * (f1.c1::DOUBLE / ntok.n_tok)
            + 0.3 * (g23.c2::DOUBLE / f2.c1::DOUBLE)
            + 0.6 * (c3.c3::DOUBLE / g12.c2::DOUBLE)) AS l
         FROM keyed
         JOIN c3 ON keyed.s = c3.s
         JOIN c2 g12 ON keyed.b12 = g12.s
         JOIN c2 g23 ON keyed.b23 = g23.s
         JOIN c1 f2 ON keyed.w2 = f2.t
         JOIN c1 f1 ON keyed.w3 = f1.t, ntok)
       SELECT doc_id, count(*) AS n_trigrams,
         round(avg(l), 4) AS avg_interp_logprob
       FROM scored GROUP BY doc_id ORDER BY doc_id"""

  // --------------------------------------------------------------- q139
  /** Label-centroid similarity matrix: pairwise cosine between the
    * per-label mean embeddings — the confusability diagnostic read
    * before trusting labels as IVF cells (q52) or contrastive
    * negatives (q121): two labels whose centroids sit at cosine ≈ 1
    * are one class wearing two names. |labels|² output; the corpus is
    * touched once by the centroid aggregation.
    *
    * Determinism: the centroid mean is NOT a double avg() — distributed
    * Spark and sequential DuckDB would sum in different orders and the
    * round-to-4 could flip on a boundary. Instead each float is scaled
    * by 2^24 and rounded to a LONG (exact: a power-of-two scale of a
    * 24-bit-mantissa float just shifts the exponent), the sum is
    * integer-exact in any order, and the mean divides once — the
    * integer-exact-moment discipline of q114/q120. The ~6e-8
    * quantization is 3 orders below the rounded output. */
  private def q139(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorFunctions.{dot, norm}
    val scale = (1L << 24).toDouble
    val cent = Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg((sum(round(col("v").cast("double") * scale, 0).cast("long"))
              .cast("double") / (count(lit(1)) * scale)).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cvec"))
    cent.as("a").join(cent.as("b"), col("a.label") < col("b.label"))
      .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
        round(dot(col("a.cvec"), col("b.cvec")) /
          (norm(col("a.cvec")) * norm(col("b.cvec"))), 4).as("cosine"))
      .orderBy("label_a", "label_b")
  }

  private val q139Sql =
    """WITH c AS (SELECT label, i,
           sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 16777216.0)
                 AS BIGINT))::DOUBLE
             / (count(*) * 16777216.0) AS v
           FROM embeddings, range(1, 65) t(i)
           GROUP BY label, i),
       vec AS (SELECT label, array_agg(v ORDER BY i) AS cvec
               FROM c GROUP BY label)
       SELECT a.label AS label_a, b.label AS label_b,
         round(list_dot_product(a.cvec, b.cvec)
           / (sqrt(list_dot_product(a.cvec, a.cvec))
              * sqrt(list_dot_product(b.cvec, b.cvec))), 4) AS cosine
       FROM vec a JOIN vec b ON a.label < b.label
       ORDER BY label_a, label_b"""

  // --------------------------------------------------------------- q140
  /** Two-feature ridge ([[graft.engine.Ols.fitRidge2Plan]]): q83's
    * normal-equation plan with λ = 50 on the feature diagonal — same
    * single sufficient-statistics aggregation, Cramer solve on the
    * penalized system, oracle term-for-term. */
  private def q140(s: SparkSession, d: String): DataFrame =
    graft.engine.Ols.fitRidge2Plan(Tables.lineitem(s, d),
        "l_quantity", "l_discount", "l_extendedprice", lambda = 50.0)
      .select(round(col("w0"), 4).as("w0"), round(col("w1"), 4).as("w1"),
        round(col("w2"), 4).as("w2"))

  private val q140Sql =
    """WITH a AS (SELECT count(*)::DOUBLE AS n,
         sum(l_quantity) AS s1, sum(l_discount) AS s2,
         sum(l_quantity*l_quantity) + 50.0 AS r11,
         sum(l_discount*l_discount) + 50.0 AS r22,
         sum(l_quantity*l_discount) AS s12,
         sum(l_extendedprice) AS sy,
         sum(l_quantity*l_extendedprice) AS s1y,
         sum(l_discount*l_extendedprice) AS s2y
       FROM lineitem
       WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
         AND l_extendedprice IS NOT NULL),
       b AS (SELECT
         n*(r11*r22 - s12*s12) - s1*(s1*r22 - s12*s2)
           + s2*(s1*s12 - r11*s2) AS det,
         sy*(r11*r22 - s12*s12) - s1*(s1y*r22 - s12*s2y)
           + s2*(s1y*s12 - r11*s2y) AS d0,
         n*(s1y*r22 - s12*s2y) - sy*(s1*r22 - s12*s2)
           + s2*(s1*s2y - s1y*s2) AS d1,
         n*(r11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
           + sy*(s1*s12 - r11*s2) AS d2,
         n*r11*r22 AS diag
       FROM a)
       SELECT
         CASE WHEN det IS NULL OR abs(det) <= 1e-12 * abs(diag)
              THEN 'NaN'::DOUBLE ELSE round(d0/det, 4) END AS w0,
         CASE WHEN det IS NULL OR abs(det) <= 1e-12 * abs(diag)
              THEN 'NaN'::DOUBLE ELSE round(d1/det, 4) END AS w1,
         CASE WHEN det IS NULL OR abs(det) <= 1e-12 * abs(diag)
              THEN 'NaN'::DOUBLE ELSE round(d2/det, 4) END AS w2
       FROM b"""

  // --------------------------------------------------------------- q141
  /** Per-source corpus report card — the dashboard a curation run
    * reads per ingest source: document count, exact-dup rate (distinct
    * normalized content hashes vs rows — q35's kernel aggregated one
    * level up), size profile (mean + exact median chars), and mean
    * token count. One grouped aggregation over one corpus scan; every
    * output row is a source. */
  private def q141(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFunctions.words
    Tables.documents(s, d)
      .select(col("source"), col("n_chars"),
        Dedup.contentHash(col("text")).as("ch"),
        org.apache.spark.sql.functions.size(words(col("text")))
          .cast("double").as("ntok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("ch")).as("n_distinct"),
        round(lit(1.0) - countDistinct(col("ch")).cast("double")
          / count(lit(1)).cast("double"), 4).as("dup_rate"),
        round(avg(col("n_chars").cast("double")), 4).as("avg_chars"),
        round(expr("percentile(n_chars, 0.5)"), 4).as("p50_chars"),
        round(avg(col("ntok")), 4).as("avg_tokens"))
      .orderBy("source")
  }

  private val q141Sql =
    """SELECT source, count(*) AS n_docs,
       count(DISTINCT md5(lower(regexp_replace(trim(text),'\s+',' ','g'))))
         AS n_distinct,
       round(1.0 - count(DISTINCT md5(lower(regexp_replace(trim(text),
           '\s+',' ','g'))))::DOUBLE / count(*)::DOUBLE, 4) AS dup_rate,
       round(avg(n_chars::DOUBLE), 4) AS avg_chars,
       round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
       round(avg(len(regexp_split_to_array(trim(text),'\s+'))::DOUBLE), 4)
         AS avg_tokens
       FROM documents GROUP BY source ORDER BY source"""

  // --------------------------------------------------------------- q176
  /** Personalized PageRank ([[Graph.personalizedPagerank]]): q92's
    * customer–supplier bipartite graph seen from customers 1–5 —
    * teleport mass on the seeds, two damped diffusion rounds, top 30.
    * Same long-encoded nodes (2c / 2s+1) decoded at the edge. */
  private def q176(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("cn"),
        (col("l_suppkey").cast("long") * 2 + 1).as("sn"))
      .distinct()
    val edges = pairs.select(col("cn").as("src"), col("sn").as("dst"))
      .unionByName(pairs.select(col("sn").as("src"), col("cn").as("dst")))
    val seeds = Tables.orders(s, d).filter(col("o_custkey") < 6)
      .select((col("o_custkey").cast("long") * 2).as("node"))
    Graph.personalizedPagerank(edges, seeds, "node",
        damping = 0.85, iters = 2)
      .select(
        when(pmod(col("node"), lit(2L)) === 0,
          concat(lit("c"), (col("node") / 2).cast("long")))
          .otherwise(concat(lit("s"), ((col("node") - 1) / 2).cast("long")))
          .as("node"),
        col("rank"))
      .orderBy(col("rank").desc, col("node"))
      .limit(30)
  }

  private val q176Sql =
    """WITH ed0 AS (SELECT DISTINCT 'c' || o_custkey::VARCHAR AS cn,
           's' || l_suppkey::VARCHAR AS sn
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       ed AS (SELECT cn AS src, sn AS dst FROM ed0
              UNION ALL SELECT sn, cn FROM ed0),
       nodes AS (SELECT src AS node FROM ed
                 UNION SELECT dst FROM ed),
       deg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src),
       wed AS (SELECT e.src, e.dst, 1.0::DOUBLE / d.deg AS w
               FROM ed e JOIN deg d USING (src)),
       s AS (SELECT DISTINCT 'c' || o_custkey::VARCHAR AS node
             FROM orders WHERE o_custkey < 6),
       ns AS (SELECT count(*)::DOUBLE AS n FROM s),
       tele AS (SELECT nodes.node,
                  CASE WHEN s.node IS NOT NULL THEN 1.0 / ns.n
                       ELSE 0.0 END AS p
                FROM nodes CROSS JOIN ns
                LEFT JOIN s ON nodes.node = s.node),
       r0 AS (SELECT node, round(p, 9) AS rank FROM tele),
       r1 AS (SELECT t.node,
                round((1 - 0.85) * t.p + 0.85 * coalesce(m.mass, 0), 9)
                  AS rank
              FROM tele t
              LEFT JOIN (SELECT w.dst, sum(r.rank * w.w) AS mass
                         FROM r0 r JOIN wed w ON r.node = w.src
                         GROUP BY w.dst) m ON t.node = m.dst),
       r2 AS (SELECT t.node,
                round((1 - 0.85) * t.p + 0.85 * coalesce(m.mass, 0), 9)
                  AS rank
              FROM tele t
              LEFT JOIN (SELECT w.dst, sum(r.rank * w.w) AS mass
                         FROM r1 r JOIN wed w ON r.node = w.src
                         GROUP BY w.dst) m ON t.node = m.dst)
       SELECT node, rank FROM r2 ORDER BY rank DESC, node LIMIT 30"""

  // --------------------------------------------------------------- q175
  /** Rolling 7-day distinct users from daily HLL registers
    * ([[Sketch.hllRegistersBy]] + [[Sketch.hllRollup]]): each day's
    * 2^p-row register table contributes to the 7 window positions it
    * covers (a bounded ×7 explode of SKETCH rows, never key rows),
    * then one register-max merge per window end — "rolling uniques"
    * at 100 TB without touching raw keys twice. Windows clipped to
    * full coverage of the corpus span. */
  private def q175(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id").cast("string").as("k"),
        to_date(col("ts")).as("day"))
    val daily = Sketch.hllRegistersBy(ev, "k", "day", p = 8)
    val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val contrib = daily
      .select(col("grp"), col("bucket"), col("mreg"),
        explode(sequence(col("grp"), date_add(col("grp"), 6)))
          .as("win_end"))
      .crossJoin(broadcast(span))
      .filter(col("win_end") <= col("d1") &&
        col("win_end") >= date_add(col("d0"), 6))
      .select(col("win_end"), col("bucket"), col("mreg"))
    Sketch.hllRollup(contrib.withColumnRenamed("win_end", "grp"),
        col("grp"), p = 8)
      .withColumnRenamed("grp", "win_end")
      .orderBy("win_end")
  }

  private val q175Sql =
    """WITH h AS (SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))
           ::BIGINT AS h, CAST(ts AS DATE) AS day
         FROM events),
       span AS (SELECT min(day) AS d0, max(day) AS d1 FROM h),
       drg AS (SELECT day, h % 256 AS bucket,
                 max(CASE WHEN (h >> 8) = 0 THEN 53
                          ELSE 53 - length(bin(h >> 8)) END) AS mreg
               FROM h GROUP BY day, bucket),
       contrib AS (SELECT CAST(unnest(generate_series(day, day +
                     INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE)
                     AS win_end, bucket, mreg
                   FROM drg),
       wrg AS (SELECT win_end, bucket, max(mreg) AS mreg
               FROM contrib, span
               WHERE win_end <= d1 AND win_end >= d0 + INTERVAL 6 DAY
               GROUP BY win_end, bucket),
       a AS (SELECT win_end, count(*) AS used,
               CAST(sum(1::BIGINT << CAST(53 - mreg AS INT)) AS BIGINT)
                 AS sum_present
             FROM wrg GROUP BY win_end),
       st AS (SELECT win_end, used, 256 - used AS zeros,
                sum_present + (256 - used) * (1::BIGINT << 53)
                  AS sum_scaled
              FROM a),
       e AS (SELECT win_end, used, zeros, sum_scaled,
               (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
                 * 9007199254740992.0 / sum_scaled::DOUBLE AS raw
             FROM st)
       SELECT win_end, CAST(256 AS INT) AS m, used, zeros, sum_scaled,
         round(CASE WHEN raw <= 640.0 AND zeros > 0
                    THEN 256.0 * ln(256.0 / zeros::DOUBLE)
                    ELSE raw END, 4) AS hll_estimate
       FROM e ORDER BY win_end"""

  // --------------------------------------------------------------- q174
  /** Holt linear-trend forecast ([[Series.holtForecast]]): per-type
    * weekly volumes smoothed with level+trend (α = β = 1/2), next
    * week forecast — the recurrence folds inside Catalyst over the
    * calendar-bounded week array; the oracle replays it as a
    * recursive CTE, bit-for-bit. */
  private def q174(s: SparkSession, d: String): DataFrame =
    Series.holtForecast(Tables.events(s, d), "event_type", "ts")
      .orderBy("event_type")

  private val q174Sql =
    """WITH RECURSIVE obs AS (SELECT event_type AS k,
           CAST(floor(datediff('day', DATE '1990-01-01', CAST(ts AS DATE))
             / 7) AS BIGINT) AS w,
           count(*) AS cnt
         FROM events GROUP BY k, w),
       span AS (SELECT min(w) AS w0, max(w) AS w1 FROM obs),
       weeks AS (SELECT unnest(generate_series(w0, w1)) AS w FROM span),
       grid AS (SELECT t.k, weeks.w, coalesce(obs.cnt, 0)::DOUBLE AS x
                FROM (SELECT DISTINCT k FROM obs) t
                CROSS JOIN weeks
                LEFT JOIN obs ON obs.k = t.k AND obs.w = weeks.w),
       idx AS (SELECT k, x,
                 row_number() OVER (PARTITION BY k ORDER BY w) AS i
               FROM grid),
       n AS (SELECT k, max(i) AS n FROM idx GROUP BY k),
       rec AS (
         SELECT i1.k, CAST(1 AS BIGINT) AS i, i1.x AS l,
           i2.x - i1.x AS b
         FROM idx i1 JOIN idx i2 ON i1.k = i2.k AND i1.i = 1 AND i2.i = 2
         UNION ALL
         SELECT r.k, r.i + 1,
           0.5*w.x + 0.5*(r.l + r.b),
           0.5*((0.5*w.x + 0.5*(r.l + r.b)) - r.l) + 0.5*r.b
         FROM rec r
         JOIN idx w ON w.k = r.k AND w.i = r.i + 1
         JOIN n ON n.k = r.k
         WHERE r.i < n.n)
       SELECT rec.k AS event_type, n.n AS n_weeks,
         round(l, 4) AS level, round(b, 4) AS trend,
         round(l + b, 4) AS forecast
       FROM rec JOIN n ON rec.k = n.k
       WHERE rec.i = n.n
       ORDER BY event_type"""

  // --------------------------------------------------------------- q173
  /** Feature ranking by stump ([[graft.engine.Stump.featureRanking]]):
    * which lineitem column best predicts a return — the best
    * `x <= t` split per feature from ONE melted corpus pass, ranked
    * by exact weighted Gini (lower = more predictive). */
  private def q173(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    graft.engine.Stump.featureRanking(li,
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), "y")
      .orderBy("feature")
  }

  private val q173Sql =
    """WITH long AS (
         SELECT 'l_quantity' AS f, l_quantity AS v,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
         FROM lineitem WHERE l_quantity IS NOT NULL
         UNION ALL
         SELECT 'l_extendedprice', l_extendedprice,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
         FROM lineitem WHERE l_extendedprice IS NOT NULL
         UNION ALL
         SELECT 'l_discount', l_discount,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
         FROM lineitem WHERE l_discount IS NOT NULL
         UNION ALL
         SELECT 'l_tax', l_tax,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
         FROM lineitem WHERE l_tax IS NOT NULL),
       per AS (SELECT f, v, count(*) AS c, CAST(sum(y) AS BIGINT) AS p
               FROM long GROUP BY f, v),
       tot AS (SELECT f, CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(p) AS BIGINT) AS pos
               FROM per GROUP BY f),
       cum AS (SELECT f, v, CAST(sum(c) OVER w AS BIGINT) AS nl,
                 CAST(sum(p) OVER w AS BIGINT) AS pl
               FROM per WINDOW w AS (PARTITION BY f ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       cand AS (SELECT cum.f, v, nl, pl, nl - pl AS ql, n - nl AS nr,
                  pos - pl AS pr, (n - nl) - (pos - pl) AS qr, n
                FROM cum JOIN tot ON cum.f = tot.f WHERE nl < n),
       sc AS (SELECT f, v, nl, pl, nr, pr,
                ((nl::DOUBLE - (pl::DOUBLE*pl::DOUBLE
                     + ql::DOUBLE*ql::DOUBLE)/nl::DOUBLE)
                 + (nr::DOUBLE - (pr::DOUBLE*pr::DOUBLE
                     + qr::DOUBLE*qr::DOUBLE)/nr::DOUBLE)) / n::DOUBLE AS g
              FROM cand),
       pick AS (SELECT *, row_number() OVER (PARTITION BY f
                  ORDER BY g, v) AS rn
                FROM sc)
       SELECT f AS feature, v AS threshold, nl AS n_left, pl AS pos_left,
         nr AS n_right, pr AS pos_right, round(g, 6) AS gini
       FROM pick WHERE rn = 1 ORDER BY feature"""

  // --------------------------------------------------------------- q172
  /** Rolling correlation ([[Series.rollingCorrelation]]): trailing
    * 7-day Pearson r between click and purchase daily volumes on the
    * gap-filled grid — window moments in frame order, fixed-shape
    * correlation, NULL on zero variance. */
  private def q172(s: SparkSession, d: String): DataFrame =
    Series.rollingCorrelation(Tables.events(s, d), "event_type", "ts",
        "click", "purchase", window = 7)
      .orderBy("day")

  private val q172Sql =
    """WITH obs AS (SELECT event_type AS k, CAST(ts AS DATE) AS day,
           count(*) AS cnt
         FROM events WHERE event_type IN ('click', 'purchase')
         GROUP BY k, day),
       span AS (SELECT min(day) AS d0, max(day) AS d1 FROM obs),
       days AS (SELECT CAST(unnest(generate_series(d0, d1,
                  INTERVAL 1 DAY)) AS DATE) AS day FROM span),
       g AS (SELECT days.day, coalesce(a.cnt, 0) AS ca,
               coalesce(b.cnt, 0) AS cb
             FROM days
             LEFT JOIN (SELECT day, cnt FROM obs WHERE k = 'click') a
               ON days.day = a.day
             LEFT JOIN (SELECT day, cnt FROM obs WHERE k = 'purchase') b
               ON days.day = b.day),
       m AS (SELECT day, ca, cb,
               row_number() OVER (ORDER BY day) AS rn,
               sum(ca::DOUBLE) OVER w AS sx, sum(cb::DOUBLE) OVER w AS sy,
               sum(ca::DOUBLE * cb::DOUBLE) OVER w AS sxy,
               sum(ca::DOUBLE * ca::DOUBLE) OVER w AS sxx,
               sum(cb::DOUBLE * cb::DOUBLE) OVER w AS syy
             FROM g WINDOW w AS (ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
       SELECT day, ca AS cnt_a, cb AS cnt_b,
         CASE WHEN (7.0*sxx - sx*sx) > 0.0 AND (7.0*syy - sy*sy) > 0.0
              THEN round((7.0*sxy - sx*sy)
                / sqrt((7.0*sxx - sx*sx) * (7.0*syy - sy*sy)), 4)
         END AS corr
       FROM m WHERE rn >= 7 ORDER BY day"""

  // --------------------------------------------------------------- q171
  /** Cross-source duplication matrix ([[Dedup.sourceOverlap]]): every
    * 7th document re-attributed to an injected 'mirror' source, then
    * the pairwise shared-content-hash counts and containment ratios —
    * the mirror shows up against every original source, natural
    * sources stay disjoint. */
  private def q171(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("source"))
    val dirty = docs.unionByName(docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"), lit("mirror").as("source")))
    Dedup.sourceOverlap(dirty, "text", "source")
      .orderBy("source_a", "source_b")
  }

  private val q171Sql =
    """WITH d AS (SELECT text, source FROM documents
         UNION ALL
         SELECT text, 'mirror' FROM documents WHERE doc_id % 7 = 0),
       h AS (SELECT DISTINCT
               md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
                 AS h, source AS src
             FROM d),
       tot AS (SELECT src, count(*) AS n FROM h GROUP BY src),
       p AS (SELECT a.src AS source_a, b.src AS source_b,
               count(*) AS n_shared
             FROM h a JOIN h b ON a.h = b.h AND a.src < b.src
             GROUP BY 1, 2)
       SELECT source_a, source_b, n_shared, ta.n AS n_a, tb.n AS n_b,
         round(n_shared::DOUBLE / least(ta.n, tb.n)::DOUBLE, 4)
           AS containment
       FROM p JOIN tot ta ON p.source_a = ta.src
       JOIN tot tb ON p.source_b = tb.src
       ORDER BY source_a, source_b"""

  // --------------------------------------------------------------- q170
  /** Exact lower median by iterative range narrowing
    * ([[graft.engine.OrderStat.lowerMedian]]): the k=(n+1)/2 order
    * statistic of event values found in ~log₆₄(range) histogram
    * rounds with `bins`-long shuffle state per round — never a global
    * sort. The oracle simply sorts: the iterative answer must equal
    * the true order statistic to the bit. */
  private def q170(s: SparkSession, d: String): DataFrame = {
    val (n, k, v) = graft.engine.OrderStat.lowerMedian(
      Tables.events(s, d), "value")
    s.range(1).select(lit(n).as("n"), lit(k).as("k"),
      lit(v).as("kth_value"))
  }

  private val q170Sql =
    """WITH v AS (SELECT value AS v FROM events WHERE value IS NOT NULL),
       n AS (SELECT count(*) AS n FROM v),
       r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v)
       SELECT n.n, (n.n + 1) // 2 AS k, r.v AS kth_value
       FROM r, n WHERE r.rn = (n.n + 1) // 2"""

  // --------------------------------------------------------------- q169
  /** Temperature-scaled mixture weights
    * ([[graft.operators.Sampling.mixtureWeights]]): per-source
    * `n_tokens^0.5` sampling weights with a 1B-token budget allocated
    * pro rata — the data-mixing policy table (weights quantized before
    * the normalizing sum, so the k-source shares are engine-exact). */
  private def q169(s: SparkSession, d: String): DataFrame =
    graft.operators.Sampling.mixtureWeights(Tables.documents(s, d),
        "source", "text", alpha = 0.5, budget = 1000000000L)
      .orderBy("source")

  private val q169Sql =
    """WITH per AS (SELECT source, count(*) AS n_docs,
           CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
             AS BIGINT) AS n_tokens
         FROM documents GROUP BY source),
       t AS (SELECT *, CAST(round(power(n_tokens::DOUBLE, 0.5)
                 * 16777216.0) AS BIGINT) AS wq
             FROM per),
       tot AS (SELECT CAST(sum(wq) AS BIGINT) AS twq FROM t)
       SELECT source, n_docs, n_tokens,
         round(wq::DOUBLE / twq::DOUBLE, 6) AS weight,
         CAST(floor(wq::DOUBLE / twq::DOUBLE * 1000000000.0) AS BIGINT)
           AS alloc_tokens,
         round(wq::DOUBLE / twq::DOUBLE * 1000000000.0
           / n_tokens::DOUBLE, 4) AS epochs
       FROM t, tot ORDER BY source"""

  // --------------------------------------------------------------- q168
  /** CUSUM changepoint ([[Series.cusumChangepoint]]): per event type,
    * the day where cumulative volume deviates most from a constant
    * rate — all-long prefix arithmetic on the gap-filled day grid,
    * argmax tied to the earliest day, one normalizing division after
    * the cut. */
  private def q168(s: SparkSession, d: String): DataFrame =
    Series.cusumChangepoint(Tables.events(s, d), "event_type", "ts")
      .orderBy("event_type")

  private val q168Sql =
    """WITH obs AS (SELECT event_type AS k, CAST(ts AS DATE) AS day,
           count(*) AS cnt
         FROM events GROUP BY k, day),
       span AS (SELECT min(day) AS d0, max(day) AS d1 FROM obs),
       days AS (SELECT CAST(unnest(generate_series(d0, d1,
                  INTERVAL 1 DAY)) AS DATE) AS day FROM span),
       daily AS (SELECT t.k, days.day, coalesce(obs.cnt, 0) AS cnt
                 FROM (SELECT DISTINCT k FROM obs) t
                 CROSS JOIN days
                 LEFT JOIN obs ON obs.k = t.k AND obs.day = days.day),
       cum AS (SELECT k, day, cnt,
                 CAST(row_number() OVER (PARTITION BY k ORDER BY day)
                   AS BIGINT) AS t,
                 CAST(sum(cnt) OVER (PARTITION BY k ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS s
               FROM daily),
       tot AS (SELECT k, count(*) AS n_days,
                 CAST(sum(cnt) AS BIGINT) AS total
               FROM daily GROUP BY k),
       dev AS (SELECT cum.k, cum.day,
                 abs(tot.n_days * cum.s - cum.t * tot.total) AS dv,
                 tot.n_days, tot.total,
                 row_number() OVER (PARTITION BY cum.k
                   ORDER BY abs(tot.n_days * cum.s - cum.t * tot.total)
                     DESC, cum.day ASC) AS rn
               FROM cum JOIN tot ON cum.k = tot.k)
       SELECT k AS event_type, n_days, total, day AS cp_day,
         round(dv::DOUBLE / (n_days::DOUBLE * total::DOUBLE), 6) AS cusum
       FROM dev WHERE rn = 1 ORDER BY event_type"""

  // --------------------------------------------------------------- q167
  /** SemDeDup ([[Similarity.semDedup]]): embeddings polluted with an
    * exact twin for every 25th vector, assigned to the 16 smallest-id
    * centroid vectors, near-dups (rounded cosine ≥ 0.95) pruned
    * within cells only — per-cell member/dropped/kept counts. The
    * twins land in their original's cell and are dropped; the corpus
    * is never compared all-pairs. */
  private def q167(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id").cast("long").as("id"), col("embedding"))
    val dirty = base.unionByName(
      base.filter(col("id") % 25 === 0)
        .select((col("id") + 100000L).as("id"), col("embedding")))
    Similarity.semDedup(dirty, "id", "embedding", k = 16, tau = 0.95)
      .orderBy("cell")
  }

  private val q167Sql =
    """WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
           FROM embeddings ORDER BY vec_id LIMIT 16),
       v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec
             FROM embeddings
             UNION ALL
             SELECT vec_id + 100000, embedding::DOUBLE[]
             FROM embeddings WHERE vec_id % 25 = 0),
       sim AS (SELECT id, cid,
                 round(list_dot_product(vec, cvec)
                   / (sqrt(list_dot_product(vec, vec))
                      * sqrt(list_dot_product(cvec, cvec))), 6) AS s
               FROM v, c),
       asg AS (SELECT id, cid AS cell FROM (
                 SELECT id, cid, row_number() OVER (PARTITION BY id
                   ORDER BY s DESC, cid ASC) AS rn
                 FROM sim) t
               WHERE rn = 1),
       av AS (SELECT asg.id, asg.cell, v.vec
              FROM asg JOIN v ON asg.id = v.id),
       p AS (SELECT a.cell, b.id AS ib
             FROM av a JOIN av b ON a.cell = b.cell AND a.id < b.id
             WHERE round(list_dot_product(a.vec, b.vec)
                 / (sqrt(list_dot_product(a.vec, a.vec))
                    * sqrt(list_dot_product(b.vec, b.vec))), 4) >= 0.95),
       m AS (SELECT cell, count(*) AS n_members FROM asg GROUP BY cell),
       dr AS (SELECT cell, count(DISTINCT ib) AS n_dropped
              FROM p GROUP BY cell)
       SELECT m.cell, m.n_members,
         coalesce(dr.n_dropped, CAST(0 AS BIGINT)) AS n_dropped,
         m.n_members - coalesce(dr.n_dropped, CAST(0 AS BIGINT)) AS n_kept
       FROM m LEFT JOIN dr USING (cell) ORDER BY cell"""

  // --------------------------------------------------------------- q166
  /** Golden-record survivorship ([[graft.operators.Golden.goldenRecords]]):
    * customers polluted with deterministic duplicate rows (every 10th
    * gets a lower-balance twin, every 20th a second one), linked by
    * shared phone, clustered by transitive closure, then merged —
    * min-id golden key, max-balance survivor supplies the payload.
    * The oracle replays the closure as a recursive CTE (q71 pattern)
    * and the survivorship rules as plain aggregates. */
  private def q166(s: SparkSession, d: String): DataFrame = {
    // ek (the original custkey, carried unchanged by the injected
    // twins) stands in for the shared natural key — phone/SSN/email —
    // that real blocking would produce
    val base = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("id"), col("c_name").as("name"),
      col("c_custkey").cast("long").as("ek"),
      col("c_acctbal").cast("double").as("bal"))
    def twin(mod: Int, off: Long, drop: Double, tag: String) =
      base.filter(col("id") % mod === 0).select(
        (col("id") + off).as("id"),
        concat(col("name"), lit(tag)).as("name"),
        col("ek"), (col("bal") - drop).as("bal"))
    val dirty = base
      .unionByName(twin(10, 1000000L, 50.0, " (dup)"))
      .unionByName(twin(20, 2000000L, 100.0, " (dup2)"))
    val pairs = dirty.as("a").join(dirty.as("b"),
        col("a.ek") === col("b.ek") && col("a.id") < col("b.id"))
      .select(col("a.id").as("ida"), col("b.id").as("idb"))
    graft.operators.Golden.goldenRecords(dirty, "id", "bal",
        Seq("name", "ek"), pairs, "ida", "idb")
      .orderBy("cluster_id")
  }

  private val q166Sql =
    """WITH RECURSIVE base AS (SELECT c_custkey AS id, c_name AS name,
           c_custkey AS ek, CAST(c_acctbal AS DOUBLE) AS bal
         FROM customer),
       dirty AS (SELECT * FROM base
         UNION ALL
         SELECT id + 1000000, name || ' (dup)', ek, bal - 50.0
         FROM base WHERE id % 10 = 0
         UNION ALL
         SELECT id + 2000000, name || ' (dup2)', ek, bal - 100.0
         FROM base WHERE id % 20 = 0),
       p AS (SELECT a.id AS ida, b.id AS idb
             FROM dirty a JOIN dirty b
               ON a.ek = b.ek AND a.id < b.id),
       edges AS (SELECT ida AS a, idb AS b FROM p
                 UNION ALL SELECT idb, ida FROM p),
       nodes AS (SELECT DISTINCT a AS id FROM edges),
       reach AS (SELECT id, id AS r FROM nodes
                 UNION
                 SELECT e.a, reach.r FROM edges e
                 JOIN reach ON e.b = reach.id),
       cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
       mem AS (SELECT cl.cluster_id, d.id, d.name, d.ek, d.bal
               FROM dirty d JOIN cl ON d.id = cl.id),
       agg AS (SELECT cluster_id, count(*) AS n_members,
                 min(id) AS golden_id, max(bal) AS best_bal
               FROM mem GROUP BY cluster_id),
       surv AS (SELECT m.cluster_id, min(m.id) AS sid
                FROM mem m JOIN agg ON m.cluster_id = agg.cluster_id
                  AND m.bal = agg.best_bal
                GROUP BY m.cluster_id)
       SELECT agg.cluster_id, agg.n_members, agg.golden_id, agg.best_bal,
         r.name AS rep_name, r.ek AS rep_ek
       FROM agg JOIN surv ON agg.cluster_id = surv.cluster_id
       JOIN mem r ON r.id = surv.sid
       ORDER BY agg.cluster_id"""

  // --------------------------------------------------------------- q165
  /** Mergeable-sketch rollup ([[Sketch.hllRegistersBy]] +
    * [[Sketch.hllRollup]]): per-DAY HLL register tables of active
    * users merged to per-epoch-week distinct estimates by register
    * MAX — the pre-aggregation discipline that answers "weekly
    * uniques" at 100 TB from 2^p-row day states without ever
    * re-scanning keys. The oracle replays daily registers, the
    * max-merge, and the harmonic estimate bit-for-bit, next to the
    * exact weekly distinct. */
  private def q165(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id").cast("string").as("k"),
        to_date(col("ts")).as("day"))
    val daily = Sketch.hllRegistersBy(ev, "k", "day", p = 8)
    val toWeek = floor(datediff(col("grp"),
      lit("1990-01-01").cast("date")) / 7).cast("long")
    val weekly = Sketch.hllRollup(daily, toWeek, p = 8)
      .withColumnRenamed("grp", "wk")
    val exact = Tables.events(s, d)
      .groupBy(floor(datediff(to_date(col("ts")),
          lit("1990-01-01").cast("date")) / 7).cast("long").as("wk"))
      .agg(countDistinct(col("user_id")).as("true_distinct"))
    weekly.join(exact, "wk")
      .withColumn("rel_err",
        round((col("hll_estimate") - col("true_distinct"))
          / col("true_distinct").cast("double"), 4))
      .orderBy("wk")
  }

  private val q165Sql =
    """WITH h AS (SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))
           ::BIGINT AS h, CAST(ts AS DATE) AS day
         FROM events),
       drg AS (SELECT day, h % 256 AS bucket,
                 max(CASE WHEN (h >> 8) = 0 THEN 53
                          ELSE 53 - length(bin(h >> 8)) END) AS mreg
               FROM h GROUP BY day, bucket),
       wrg AS (SELECT CAST(floor(datediff('day', DATE '1990-01-01', day)
                   / 7) AS BIGINT) AS wk,
                 bucket, max(mreg) AS mreg
               FROM drg GROUP BY wk, bucket),
       a AS (SELECT wk, count(*) AS used,
               CAST(sum(1::BIGINT << CAST(53 - mreg AS INT)) AS BIGINT)
                 AS sum_present
             FROM wrg GROUP BY wk),
       st AS (SELECT wk, used, 256 - used AS zeros,
                sum_present + (256 - used) * (1::BIGINT << 53)
                  AS sum_scaled
              FROM a),
       e AS (SELECT wk, used, zeros, sum_scaled,
               (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
                 * 9007199254740992.0 / sum_scaled::DOUBLE AS raw
             FROM st),
       f AS (SELECT wk, CAST(256 AS INT) AS m, used, zeros, sum_scaled,
               round(CASE WHEN raw <= 640.0 AND zeros > 0
                          THEN 256.0 * ln(256.0 / zeros::DOUBLE)
                          ELSE raw END, 4) AS hll_estimate
             FROM e),
       t AS (SELECT CAST(floor(datediff('day', DATE '1990-01-01',
                   CAST(ts AS DATE)) / 7) AS BIGINT) AS wk,
               count(DISTINCT user_id) AS true_distinct
             FROM events GROUP BY wk)
       SELECT f.wk, f.m, f.used, f.zeros, f.sum_scaled, f.hll_estimate,
         t.true_distinct,
         round((f.hll_estimate - t.true_distinct)
           / t.true_distinct::DOUBLE, 4) AS rel_err
       FROM f JOIN t USING (wk) ORDER BY wk"""

  // --------------------------------------------------------------- q279
  /** Gradient-boosted regression stumps, 2 rounds, EXACT — extends
    * q164's single classification stump to the boosting loop: round 1
    * fits the SSE-optimal `day ≤ t` stump to daily revenue (split
    * maximizing `S_L²/n_L + S_R²/n_R`, the exact argmax of SSE
    * reduction), round 2 fits the same stump kernel to the RESIDUALS.
    * Exactness discipline: y is milli-cent LONGs, so leaf predictions
    * are the integer round-half-away mean `sign·(2·|S|+n) DIV (2·n)`
    * (computed driver-side in BigInt from the 1-row argmax — never a
    * DECIMAL division whose scale-6 rounding could cross the floor)
    * and round-2 residual sums derive EXACTLY per day as
    * `s₂ = s₁ − c·pred(day)` — no row-level recompute, no FP
    * residuals. The split score is one fixed-shape FP expression of
    * the exact cumulative DECIMAL sums (ties → smaller day). Scale:
    * ONE corpus aggregation to the bounded per-day table; both rounds'
    * windows and argmaxes run on that table only. */
  private def q279(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = s
    import spark.implicits._
    val dec = "decimal(38,0)"
    val day = datediff(to_date(col("o_orderdate")),
      lit("1990-01-01").cast("date")).cast("long")
    val per = Tables.orders(s, d)
      .select(day.as("day"),
        round(col("o_totalprice") * 100, 0).cast("long").as("yc"))
      .groupBy("day")
      .agg(count(lit(1)).as("c"), (sum("yc") * 1000L).as("sm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def rha(sl: BigInt, n: BigInt): Long = // round-half-away mean
      ((sl.abs * 2 + n) / (n * 2) * sl.signum).toLong
    // fit the SSE-optimal stump on a (day, c, sm) frame; returns
    // (t, nL, nR, predL, predR) with preds exact via driver BigInt
    def fit(frame: DataFrame): (Long, Long, Long, Long, Long) = {
      val tot = frame.agg(sum("c"), sum(col("sm").cast(dec))).head()
      val (n, st) = (tot.getLong(0), BigInt(tot.getDecimal(1).toBigInteger))
      val cand = frame
        .withColumn("nl", sum("c").over(w))
        .withColumn("sl", sum(col("sm").cast(dec)).over(w))
        .filter(col("nl") < n)
      val slD = col("sl").cast("double")
      val srD = (lit(st.toString).cast(dec) - col("sl")).cast("double")
      val nlD = col("nl").cast("double")
      val nrD = (lit(n) - col("nl")).cast("double")
      val best = cand
        .withColumn("score", slD * slD / nlD + srD * srD / nrD)
        .orderBy(col("score").desc, col("day").asc)
        .select("day", "nl", "sl").limit(1).head()
      val (t, nl) = (best.getLong(0), best.getLong(1))
      val slB = BigInt(best.getDecimal(2).toBigInteger)
      (t, nl, n - nl, rha(slB, nl), rha(st - slB, n - nl))
    }
    val (t1, nl1, nr1, pl1, pr1) = fit(per)
    val per2 = per.select(col("day"), col("c"),
      (col("sm") - col("c") *
        when(col("day") <= t1, pl1).otherwise(pr1)).as("sm"))
    val (t2, nl2, nr2, pl2, pr2) = fit(per2)
    per.unpersist(blocking = false)
    Seq((1, t1, nl1, nr1, pl1, pr1), (2, t2, nl2, nr2, pl2, pr2))
      .toDF("round", "threshold_day", "n_left", "n_right",
        "pred_left_mc", "pred_right_mc")
      .orderBy("round")
  }

  private val q279Sql = {
    def fitSql(src: String, out: String): String =
      s"""${out}tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(sm) AS HUGEINT) AS st FROM $src),
       ${out}cand AS (SELECT day, nl, sl,
             (sl::DOUBLE * sl::DOUBLE) / nl::DOUBLE
               + ((st - sl)::DOUBLE * (st - sl)::DOUBLE)
                 / (n - nl)::DOUBLE AS score
           FROM (SELECT day,
                   CAST(sum(c) OVER win AS BIGINT) AS nl,
                   CAST(sum(sm) OVER win AS HUGEINT) AS sl
                 FROM $src WINDOW win AS (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) t,
                ${out}tot
           WHERE nl < n),
       ${out}best AS (SELECT day AS t, nl, sl FROM ${out}cand
           ORDER BY score DESC, day ASC LIMIT 1),
       ${out}fit AS (SELECT t, nl, n - nl AS nr,
             CAST((CASE WHEN sl < 0 THEN -1 ELSE 1 END) *
               ((2 * abs(sl) + nl) // (2 * nl)) AS BIGINT) AS pl,
             CAST((CASE WHEN st - sl < 0 THEN -1 ELSE 1 END) *
               ((2 * abs(st - sl) + (n - nl)) // (2 * (n - nl)))
               AS BIGINT) AS pr
           FROM ${out}best, ${out}tot)"""
    s"""WITH per AS MATERIALIZED (SELECT
           datediff('day', DATE '1990-01-01', o_orderdate::DATE) AS day,
           count(*) AS c,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT)
             * 1000 AS sm
         FROM orders GROUP BY day),
       ${fitSql("per", "a")},
       per2 AS MATERIALIZED (SELECT per.day, per.c,
           per.sm - per.c * (CASE WHEN per.day <= afit.t THEN afit.pl
                                  ELSE afit.pr END) AS sm
         FROM per, afit),
       ${fitSql("per2", "b")}
       SELECT 1 AS round, t AS threshold_day,
         CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
         pl AS pred_left_mc, pr AS pred_right_mc FROM afit
       UNION ALL
       SELECT 2, t, CAST(nl AS BIGINT), CAST(nr AS BIGINT), pl, pr
       FROM bfit
       ORDER BY round"""
  }

  // --------------------------------------------------------------- q164
  /** Exact decision stump ([[graft.engine.Stump.bestSplits]]): the 5
    * best `value <= t` splits separating purchase events from the
    * rest, ranked by exact weighted Gini — per-value counts, two-level
    * bucketed prefix sum (never a global value sort), IEEE-fixed-shape
    * impurity on exact longs so the oracle's global-window replay
    * lands on the identical cut. */
  private def q164(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("value"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    graft.engine.Stump.bestSplits(ev, "value", "y", buckets = 32, topK = 5)
  }

  private val q164Sql =
    """WITH pts AS (SELECT value AS v,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         FROM events WHERE value IS NOT NULL),
       per AS (SELECT v, count(*) AS c, CAST(sum(y) AS BIGINT) AS p
               FROM pts GROUP BY v),
       tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(p) AS BIGINT) AS pos FROM per),
       cum AS (SELECT v, CAST(sum(c) OVER w AS BIGINT) AS nl,
                 CAST(sum(p) OVER w AS BIGINT) AS pl
               FROM per WINDOW w AS (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       cand AS (SELECT v, nl, pl, nl - pl AS ql, n - nl AS nr,
                  pos - pl AS pr, (n - nl) - (pos - pl) AS qr, n
                FROM cum, tot WHERE nl < n),
       sc AS (SELECT v, nl, pl, nr, pr,
                ((nl::DOUBLE - (pl::DOUBLE*pl::DOUBLE
                     + ql::DOUBLE*ql::DOUBLE)/nl::DOUBLE)
                 + (nr::DOUBLE - (pr::DOUBLE*pr::DOUBLE
                     + qr::DOUBLE*qr::DOUBLE)/nr::DOUBLE)) / n::DOUBLE AS g
              FROM cand)
       SELECT v AS threshold, nl AS n_left, pl AS pos_left, nr AS n_right,
         pr AS pos_right, round(g, 6) AS gini
       FROM sc ORDER BY g, v LIMIT 5"""

  // --------------------------------------------------------------- q163
  /** Adamic-Adar link prediction ([[Graph.adamicAdar]]): top missing
    * links of q118/q161's support-thresholded part co-occurrence graph
    * — non-edge pairs ranked by Σ 1/ln(deg) over shared neighbors,
    * hub middles (deg > 64) excluded before the wedge join. Ranked by
    * the exact quantized long so the top-25 cut is engine-identical. */
  private def q163(s: SparkSession, d: String): DataFrame = {
    val edges = graft.Kernels.partCoEdges(s, d)
    Graph.adamicAdar(edges, "a", "b", maxMidDegree = 64, topK = 25)
  }

  private val q163Sql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem),
       e AS (SELECT x.pk AS u, y.pk AS v
             FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
             GROUP BY x.pk, y.pk HAVING count(*) >= 2),
       adj AS (SELECT u AS s, v AS d FROM e
               UNION ALL SELECT v AS s, u AS d FROM e),
       deg AS (SELECT s AS node, count(*) AS dg FROM adj GROUP BY s),
       mid AS (SELECT adj.s, adj.d,
                 CAST(round(16777216.0 / ln(dg::DOUBLE)) AS BIGINT) AS wq
               FROM adj JOIN deg ON adj.s = deg.node
               WHERE dg BETWEEN 2 AND 64),
       c AS (SELECT n1.d AS a, n2.d AS b, count(*) AS common_neighbors,
               CAST(sum(n1.wq) AS BIGINT) AS score_q
             FROM mid n1 JOIN mid n2 ON n1.s = n2.s AND n1.d < n2.d
             GROUP BY n1.d, n2.d),
       ne AS (SELECT c.* FROM c LEFT JOIN e
               ON c.a = e.u AND c.b = e.v WHERE e.u IS NULL)
       SELECT a, b, common_neighbors, score_q,
         round(score_q::DOUBLE / 16777216.0, 4) AS score
       FROM ne ORDER BY score_q DESC, a, b LIMIT 25"""

  // --------------------------------------------------------------- q162
  /** Distributed logistic-regression trainer ([[Logistic.fitGd]]): a
    * binary quality-classifier head (label < 5) on two embedding
    * coordinates, 3 full-batch GD rounds at lr = 1/2. Each round is one
    * distributed aggregation of 2^24-quantized gradient longs (the
    * q139 integer-exact discipline), so the oracle can unroll all three
    * rounds and land on bit-identical weights; train accuracy reads the
    * final margin sign (no transcendentals at predict time). */
  private def q162(s: SparkSession, d: String): DataFrame = {
    val pts = Tables.embeddings(s, d).select(
      col("embedding").getItem(0).cast("double").as("x1"),
      col("embedding").getItem(1).cast("double").as("x2"),
      when(col("label") < 5, 1.0).otherwise(0.0).as("y"))
    val w = Logistic.fitGd(pts, Seq("x1", "x2"), "y", lr = 0.5, rounds = 3)
    val z = Logistic.margin(w, Seq(col("x1"), col("x2")))
    pts.agg(
      count(lit(1)).as("n"),
      round(lit(w(0)), 6).as("w0"),
      round(lit(w(1)), 6).as("w1"),
      round(lit(w(2)), 6).as("w2"),
      round(sum(when((z > lit(0.0)) === (col("y") === lit(1.0)), 1L)
          .otherwise(0L)).cast("double") / count(lit(1)), 4)
        .as("train_acc"))
  }

  // the GD replay CTEs (pts → w3) shared by q162 and q190: three
  // quantized-gradient rounds, each gradient component summed as a
  // 2^24-scaled LONG so the replay is order-independent and engine-exact
  private val logregCtes =
    """WITH pts AS (SELECT CAST(embedding[1] AS DOUBLE) AS x1,
           CAST(embedding[2] AS DOUBLE) AS x2,
           CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y
         FROM embeddings),
       g1 AS (SELECT count(*) AS n,
           sum(CAST(round((1.0/(1.0+exp(-((0.0 + 0.0*x1) + 0.0*x2))) - y)
                 * 16777216.0) AS BIGINT)) AS s0,
           sum(CAST(round(((1.0/(1.0+exp(-((0.0 + 0.0*x1) + 0.0*x2))) - y)
                 * x1) * 16777216.0) AS BIGINT)) AS s1,
           sum(CAST(round(((1.0/(1.0+exp(-((0.0 + 0.0*x1) + 0.0*x2))) - y)
                 * x2) * 16777216.0) AS BIGINT)) AS s2
         FROM pts),
       w1 AS (SELECT n,
           0.0 - 0.5*(s0::DOUBLE/(n::DOUBLE*16777216.0)) AS a0,
           0.0 - 0.5*(s1::DOUBLE/(n::DOUBLE*16777216.0)) AS a1,
           0.0 - 0.5*(s2::DOUBLE/(n::DOUBLE*16777216.0)) AS a2
         FROM g1),
       g2 AS (SELECT n, a0, a1, a2,
           sum(CAST(round((1.0/(1.0+exp(-((a0 + a1*x1) + a2*x2))) - y)
                 * 16777216.0) AS BIGINT)) AS s0,
           sum(CAST(round(((1.0/(1.0+exp(-((a0 + a1*x1) + a2*x2))) - y)
                 * x1) * 16777216.0) AS BIGINT)) AS s1,
           sum(CAST(round(((1.0/(1.0+exp(-((a0 + a1*x1) + a2*x2))) - y)
                 * x2) * 16777216.0) AS BIGINT)) AS s2
         FROM pts, w1 GROUP BY n, a0, a1, a2),
       w2 AS (SELECT n,
           a0 - 0.5*(s0::DOUBLE/(n::DOUBLE*16777216.0)) AS b0,
           a1 - 0.5*(s1::DOUBLE/(n::DOUBLE*16777216.0)) AS b1,
           a2 - 0.5*(s2::DOUBLE/(n::DOUBLE*16777216.0)) AS b2
         FROM g2),
       g3 AS (SELECT n, b0, b1, b2,
           sum(CAST(round((1.0/(1.0+exp(-((b0 + b1*x1) + b2*x2))) - y)
                 * 16777216.0) AS BIGINT)) AS s0,
           sum(CAST(round(((1.0/(1.0+exp(-((b0 + b1*x1) + b2*x2))) - y)
                 * x1) * 16777216.0) AS BIGINT)) AS s1,
           sum(CAST(round(((1.0/(1.0+exp(-((b0 + b1*x1) + b2*x2))) - y)
                 * x2) * 16777216.0) AS BIGINT)) AS s2
         FROM pts, w2 GROUP BY n, b0, b1, b2),
       w3 AS (SELECT n,
           b0 - 0.5*(s0::DOUBLE/(n::DOUBLE*16777216.0)) AS w0,
           b1 - 0.5*(s1::DOUBLE/(n::DOUBLE*16777216.0)) AS w1,
           b2 - 0.5*(s2::DOUBLE/(n::DOUBLE*16777216.0)) AS w2
         FROM g3)"""

  private val q162Sql = logregCtes +
    """,
       fin AS (SELECT count(*) AS n,
           sum(CASE WHEN (((w0 + w1*x1) + w2*x2) > 0.0) = (y = 1.0)
                 THEN 1 ELSE 0 END) AS ok,
           max(w0) AS w0, max(w1) AS w1, max(w2) AS w2
         FROM pts, w3)
       SELECT n, round(w0, 6) AS w0, round(w1, 6) AS w1,
         round(w2, 6) AS w2, round(ok::DOUBLE / n::DOUBLE, 4) AS train_acc
       FROM fin"""

  // --------------------------------------------------------------- q190
  /** Model calibration (reliability diagram) for q162's GD logistic
    * model: predictions bucketed into fixed 0.1-wide probability bins,
    * per-bin count, mean predicted probability and observed positive
    * rate — "does a 0.7 score mean 70%". Scores are TEMPERATURE-SCALED
    * (T=200 on the margin: three small-step GD rounds leave a weak
    * margin whose raw sigmoid hugs 0.5, and an overconfident rescale is
    * precisely what a reliability diagram exists to expose — the
    * per-bin frac_pos shows how little the sharpened scores earn their
    * confidence). The mean prediction is graded micro-unit (×10⁶)
    * LONG-summed (order-independent); the oracle replays the full
    * quantized-gradient training (shared CTE chain with q162) and then
    * the binning, so weights, sigmoid scores, bin edges and rates are
    * all engine-exact. */
  /** q190's reliability table, shared with q238's ECE/MCE summary:
    * temperature-scaled GD-logistic scores binned into fixed 0.1-wide
    * probability bins with micro-unit-summed mean predictions. */
  private def calibrationBins(s: SparkSession, d: String): DataFrame = {
    val pts = Tables.embeddings(s, d).select(
      col("embedding").getItem(0).cast("double").as("x1"),
      col("embedding").getItem(1).cast("double").as("x2"),
      when(col("label") < 5, 1.0).otherwise(0.0).as("y"))
    val w = Logistic.fitGd(pts, Seq("x1", "x2"), "y", lr = 0.5, rounds = 3)
    val p = lit(1.0) / (lit(1.0) +
      exp(-(lit(200.0) * Logistic.margin(w, Seq(col("x1"), col("x2"))))))
    pts
      .withColumn("p", p)
      .withColumn("bin",
        least(floor(col("p") * 10).cast("long"), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(round(col("p") * 1e6, 0).cast("long")).as("p_micro_sum"),
        sum(col("y")).cast("long").as("n_pos"))
      .select(col("bin"), col("n"), col("p_micro_sum"), col("n_pos"),
        round(col("p_micro_sum").cast("double") / col("n") / 1e6, 6)
          .as("mean_pred"),
        round(col("n_pos").cast("double") / col("n"), 6).as("frac_pos"))
  }

  private def q190(s: SparkSession, d: String): DataFrame =
    calibrationBins(s, d).orderBy("bin")

  // --------------------------------------------------------------- q338
  /** Murphy decomposition of the (binned) Brier score — WHY is the
    * scorer miscalibrated? q238's ECE gives one gap number; Murphy
    * splits the binned Brier into reliability (calibration error,
    * lower better), resolution (discrimination, higher better) and
    * the irreducible base-rate uncertainty, with the identity
    * Brier_binned = REL − RES + UNC. Shares [[calibrationBins]]
    * verbatim with q190/q238 (the three readouts cannot drift);
    * per-bin terms quantize to 1e-9-unit LONGs over the ≤10-bin
    * table, the base rate is an exact integer ratio.
    */
  private def q338(s: SparkSession, d: String): DataFrame = {
    val bins = calibrationBins(s, d)
    val tot = bins.agg(sum("n").as("nn"), sum("n_pos").as("np"))
    val t = bins.crossJoin(broadcast(tot))
    val obar = col("np").cast("double") / col("nn").cast("double")
    val relU = floor(col("n").cast("double") *
      (col("mean_pred") - col("frac_pos")) *
      (col("mean_pred") - col("frac_pos")) * lit(1e9) + lit(0.5))
      .cast("long")
    val resU = floor(col("n").cast("double") *
      (col("frac_pos") - obar) * (col("frac_pos") - obar) * lit(1e9) +
      lit(0.5)).cast("long")
    val agg = t.groupBy("nn", "np")
      .agg(count(lit(1)).as("n_bins"),
        sum(relU).as("su_rel"), sum(resU).as("su_res"))
    val nnD = col("nn").cast("double")
    val ob = col("np").cast("double") / nnD
    val rel = col("su_rel").cast("double") / 1e9 / nnD
    val res = col("su_res").cast("double") / 1e9 / nnD
    val unc = ob * (lit(1.0) - ob)
    agg.select(col("nn").as("n_points"), col("n_bins"),
      round(ob, 6).as("base_rate"),
      round(rel, 9).as("reliability"),
      round(res, 9).as("resolution"),
      round(unc, 9).as("uncertainty"),
      round(rel - res + unc, 9).as("brier_binned"))
  }

  private val q338Sql = logregCtes +
    """,
       scored AS (SELECT y,
           1.0/(1.0+exp(-(200.0 * ((w0 + w1*x1) + w2*x2)))) AS p
         FROM pts, w3),
       binned AS (SELECT y, p,
           least(CAST(floor(p * 10) AS INT), 9) AS bin
         FROM scored),
       bins AS (SELECT bin, count(*)::BIGINT AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           round(sum(CAST(round(p * 1000000) AS BIGINT))::DOUBLE
             / count(*) / 1000000, 6) AS mean_pred,
           round(CAST(sum(y) AS BIGINT)::DOUBLE / count(*), 6)
             AS frac_pos
         FROM binned GROUP BY bin),
       tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(n_pos) AS BIGINT) AS np FROM bins),
       agg AS (SELECT nn, np, CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(CAST(floor(n::DOUBLE
               * (mean_pred - frac_pos) * (mean_pred - frac_pos)
               * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS su_rel,
           CAST(sum(CAST(floor(n::DOUBLE
               * (frac_pos - np::DOUBLE / nn::DOUBLE)
               * (frac_pos - np::DOUBLE / nn::DOUBLE)
               * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS su_res
         FROM bins, tot GROUP BY nn, np)
       SELECT nn AS n_points, n_bins,
         round(np::DOUBLE / nn::DOUBLE, 6) AS base_rate,
         round(su_rel::DOUBLE / 1e9 / nn::DOUBLE, 9) AS reliability,
         round(su_res::DOUBLE / 1e9 / nn::DOUBLE, 9) AS resolution,
         round((np::DOUBLE / nn::DOUBLE)
           * (1.0 - np::DOUBLE / nn::DOUBLE), 9) AS uncertainty,
         round(su_rel::DOUBLE / 1e9 / nn::DOUBLE
           - su_res::DOUBLE / 1e9 / nn::DOUBLE
           + (np::DOUBLE / nn::DOUBLE)
             * (1.0 - np::DOUBLE / nn::DOUBLE), 9) AS brier_binned
       FROM agg"""

  // --------------------------------------------------------------- q238
  /** Expected / maximum calibration error — the one-number summary of
    * q190's reliability diagram (the table a dashboard plots; ECE is
    * the number an alert thresholds): ECE = Σ (n_b/N)·|mean_pred −
    * frac_pos|, MCE = max gap. Per-bin gaps quantize to exact
    * micro-units (both inputs are 1e-6-rounded, so the difference
    * recovers an exact integer), the weighted sum is an exact LONG
    * Σ n·gap over ≤10 bins, and the single division closes it —
    * engine-independent by construction, oracle shares q190's full
    * GD-replay CTE chain. */
  private def q238(s: SparkSession, d: String): DataFrame = {
    val gu = floor(abs(col("mean_pred") - col("frac_pos")) * lit(1e6) +
      lit(0.5)).cast("long")
    calibrationBins(s, d)
      .select(col("n"), gu.as("gu"))
      .agg(sum(col("n")).as("n_points"),
        count(lit(1)).as("n_bins"),
        sum(col("n") * col("gu")).as("wsum"),
        max(col("gu")).as("maxgu"))
      .select(col("n_points"), col("n_bins").cast("int").as("n_bins"),
        round(col("wsum").cast("double") /
          (col("n_points").cast("double") * lit(1e6)), 9).as("ece"),
        round(col("maxgu").cast("double") / lit(1e6), 6).as("mce"))
  }

  private val q238Sql = logregCtes +
    """,
       scored AS (SELECT y,
           1.0/(1.0+exp(-(200.0 * ((w0 + w1*x1) + w2*x2)))) AS p
         FROM pts, w3),
       binned AS (SELECT y, p,
           least(CAST(floor(p * 10) AS INT), 9) AS bin
         FROM scored),
       bins AS (SELECT bin, count(*)::BIGINT AS n,
           round(sum(CAST(round(p * 1000000) AS BIGINT))::DOUBLE
             / count(*) / 1000000, 6) AS mean_pred,
           round(CAST(sum(y) AS BIGINT)::DOUBLE / count(*), 6)
             AS frac_pos
         FROM binned GROUP BY bin),
       g AS (SELECT n,
           CAST(floor(abs(mean_pred - frac_pos) * 1e6 + 0.5) AS BIGINT)
             AS gu
         FROM bins)
       SELECT CAST(sum(n) AS BIGINT) AS n_points,
         CAST(count(*) AS INT) AS n_bins,
         round(CAST(sum(n * gu) AS DOUBLE)
           / (CAST(sum(n) AS DOUBLE) * 1e6), 9) AS ece,
         round(max(gu)::DOUBLE / 1e6, 6) AS mce
       FROM g"""

  private val q190Sql = logregCtes +
    """,
       scored AS (SELECT y,
           1.0/(1.0+exp(-(200.0 * ((w0 + w1*x1) + w2*x2)))) AS p
         FROM pts, w3),
       binned AS (SELECT y, p,
           least(CAST(floor(p * 10) AS INT), 9) AS bin
         FROM scored)
       SELECT bin, count(*) AS n,
         CAST(sum(CAST(round(p * 1000000) AS BIGINT)) AS BIGINT)
           AS p_micro_sum,
         CAST(sum(y) AS BIGINT) AS n_pos,
         round(sum(CAST(round(p * 1000000) AS BIGINT))::DOUBLE
           / count(*) / 1000000, 6) AS mean_pred,
         round(CAST(sum(y) AS BIGINT)::DOUBLE / count(*), 6) AS frac_pos
       FROM binned GROUP BY bin ORDER BY bin"""

  // --------------------------------------------------------------- q178
  /** HITS hubs & authorities ([[Graph.hits]]) on the customer→part
    * purchase bipartite graph (distinct (custkey, partkey) pairs via
    * orders⋈lineitem): 2 mutual-reinforcement rounds, each half-step
    * L1-normalized and 9-dp quantized, so the oracle unrolls the exact
    * recurrence CTE by CTE. Top 15 per side by (score, node) — the
    * "which catalog items anchor the heavy buyers" ranking. */
  private def q178(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val edges = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_partkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
    val scored = Graph.hits(edges, "cust", "part", iters = 2)
    val w = Window.partitionBy("side")
      .orderBy(col("score").desc, col("node"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 15)
      .select("side", "rn", "node", "score")
      .orderBy("side", "rn")
  }

  private val q178Sql =
    """WITH e AS (SELECT DISTINCT o.o_custkey AS a, l.l_partkey AS b
             FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       -- scores are 1e9-scaled BIGINT units between half-rounds (the
       -- engine's exact-integer-sum discipline): sums are exact adds,
       -- the normalize divide is the only FP op per half-round
       h0 AS (SELECT a AS node,
              CAST(round(1000000000.0 /
                (SELECT count(DISTINCT a) FROM e)) AS BIGINT) AS u
              FROM (SELECT DISTINCT a FROM e)),
       a1r AS (SELECT e.b AS node, CAST(sum(h.u) AS BIGINT) AS u
               FROM e JOIN h0 h ON e.a = h.node GROUP BY e.b),
       a1 AS (SELECT node,
              CAST(round(u::DOUBLE * 1000000000.0 /
                (SELECT sum(u) FROM a1r)::DOUBLE) AS BIGINT) AS u
              FROM a1r),
       h1r AS (SELECT e.a AS node, CAST(sum(x.u) AS BIGINT) AS u
               FROM e JOIN a1 x ON e.b = x.node GROUP BY e.a),
       h1 AS (SELECT node,
              CAST(round(u::DOUBLE * 1000000000.0 /
                (SELECT sum(u) FROM h1r)::DOUBLE) AS BIGINT) AS u
              FROM h1r),
       a2r AS (SELECT e.b AS node, CAST(sum(h.u) AS BIGINT) AS u
               FROM e JOIN h1 h ON e.a = h.node GROUP BY e.b),
       a2 AS (SELECT node,
              CAST(round(u::DOUBLE * 1000000000.0 /
                (SELECT sum(u) FROM a2r)::DOUBLE) AS BIGINT) AS u
              FROM a2r),
       h2r AS (SELECT e.a AS node, CAST(sum(x.u) AS BIGINT) AS u
               FROM e JOIN a2 x ON e.b = x.node GROUP BY e.a),
       h2 AS (SELECT node,
              CAST(round(u::DOUBLE * 1000000000.0 /
                (SELECT sum(u) FROM h2r)::DOUBLE) AS BIGINT) AS u
              FROM h2r),
       scored AS (SELECT 'hub' AS side, node,
                    round(u::DOUBLE / 1000000000.0, 9) AS score FROM h2
                  UNION ALL SELECT 'auth' AS side, node,
                    round(u::DOUBLE / 1000000000.0, 9) AS score FROM a2),
       ranked AS (SELECT side, node, score,
                  row_number() OVER (PARTITION BY side
                    ORDER BY score DESC, node) AS rn
                  FROM scored)
       SELECT side, rn, node, score FROM ranked
       WHERE rn <= 15 ORDER BY side, rn"""

  // --------------------------------------------------------------- q179
  /** Last-touch attribution ([[graft.operators.AsOf.asofJoin]] as the
    * kernel): every purchase attributes to the user's most recent click
    * at-or-before it within a 7-day lookback — the marketing-pipeline
    * question "which conversions did a click precede". The as-of shape
    * (union → one sort per user → running max-struct window) is the
    * plan that survives 100 TB of events; a range join here would plan
    * a per-key nested loop. Daily rollup grades attribution counts and
    * integer-cent revenue splits. */
  private def q179(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val tolUs = 7L * 24L * 3600L * 1000000L
    val attributed = graft.operators.AsOf
      .asofJoin(purchases, clicks, "user_id", "ts", "event_id", tolUs)
      .select(col("left_id").as("event_id"), lit(1L).as("attr"))
    val cents = round(col("value") * 100, 0).cast("long")
    purchases.join(attributed, Seq("event_id"), "left")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(coalesce(col("attr"), lit(0L))).as("n_attributed"),
        sum(cents).as("value_cents"),
        sum(when(col("attr") === 1L, cents).otherwise(0L))
          .as("attr_value_cents"))
      .orderBy("day")
  }

  private val q179Sql =
    """WITH p AS (SELECT event_id, user_id, ts, value FROM events
                  WHERE event_type = 'purchase'),
       a AS (SELECT p.event_id,
               (SELECT max(c.ts) FROM events c
                 WHERE c.event_type = 'click' AND c.user_id = p.user_id
                   AND c.ts <= p.ts
                   AND c.ts >= p.ts - INTERVAL 7 DAY) AS click_ts
             FROM p)
       SELECT CAST(p.ts AS DATE) AS day, count(*) AS n_purchases,
         CAST(sum(CASE WHEN a.click_ts IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_attributed,
         CAST(sum(CAST(round(p.value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents,
         CAST(sum(CASE WHEN a.click_ts IS NOT NULL
              THEN CAST(round(p.value * 100) AS BIGINT) ELSE 0 END)
           AS BIGINT) AS attr_value_cents
       FROM p JOIN a ON p.event_id = a.event_id
       GROUP BY day ORDER BY day"""

  // --------------------------------------------------------------- q180
  /** Sketch-algebra set intersection: distinct users doing BOTH click
    * and purchase, estimated by HLL inclusion-exclusion
    * (|A∩B| ≈ Ê(A) + Ê(B) − Ê(A∪B)) — at 100 TB each side keeps only
    * its 2^p-register table and the intersection costs three register
    * merges, never a shuffle of raw keys. Graded q45/q133-style: the
    * oracle recomputes the EXACT intersection and the estimate must
    * land within the summed 3σ=3·1.04/√m contract (inclusion-exclusion
    * compounds the three estimates' errors additively). */
  private def q180(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = 12
    val ev = Tables.events(s, d)
    def keys(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id").cast("string").as("k"))
    val a = keys("click")
    val b = keys("purchase")
    def est(df: DataFrame): Double = Sketch.hllRollup(
        Sketch.hllRegisters(df, "k", p).withColumn("g", lit(1)),
        col("g"), p)
      .select(col("hll_estimate")).head().getDouble(0)
    val (eA, eB, eU) = (est(a), est(b), est(a.unionByName(b)))
    val inter = eA + eB - eU
    val bound = 3.0 * 1.04 / math.sqrt((1 << p).toDouble) * (eA + eB + eU)
    val exact = a.intersect(b).count()
    Seq((exact, math.abs(inter - exact) <= bound))
      .toDF("n_exact", "within_bounds")
  }

  private val q180Sql =
    """SELECT CAST(count(*) AS BIGINT) AS n_exact, TRUE AS within_bounds
       FROM (SELECT user_id FROM events WHERE event_type = 'click'
             INTERSECT
             SELECT user_id FROM events WHERE event_type = 'purchase')"""

  // --------------------------------------------------------------- q177
  /** STREAMING distinct-count monitor, oracle-graded (SURVEY §2.10):
    * the events table replayed as a FILE STREAM through
    * [[Sketch.hllRegisters]] as a streaming aggregation (complete
    * mode — state bounded at 2^p register rows no matter how many
    * events stream past), sunk via `foreachBatch` into an idempotent
    * parquet overwrite: the production "live distinct-users gauge"
    * loop. Grading: (a) the FINAL streamed register table must equal
    * the batch sketch over the same rows register-for-register (HLL
    * merge is exact, so streamed max-fold ≡ batch max — the
    * StreamingSpec equality run as a driver-checked query); (b) the
    * estimate read off it must land within the 3σ=3·1.04/√m error
    * contract of the true distinct count, which DuckDB recomputes
    * exactly. */
  private def q177(s: SparkSession, d: String): DataFrame = {
    val p = 10
    val batchEvents = Tables.events(s, d)
    val rawSchema = s.read.parquet(s"$d/events.parquet").schema
    val outDir = graft.operators.Exec
      .scratchTempDir("graft_stream_hll").toString
    val ckpt = graft.operators.Exec
      .scratchTempDir("graft_stream_hll_ckpt").toString
    // the events table ships in two layouts (the q204 branch): a
    // single events.parquet FILE (driver testdata — stream the parent
    // dir with a glob, FileStreamSource's basePath must be a
    // directory) or an events.parquet DIRECTORY of part files
    // (synthesized scale dirs — stream it directly; the glob-on-parent
    // would match no leaf file and the sink would stay empty)
    val evPath = s"$d/events.parquet"
    val reader = s.readStream.schema(rawSchema)
    val stream =
      if (Tables.isDirectory(s, evPath)) reader.parquet(evPath)
      else reader.option("pathGlobFilter", "events.parquet").parquet(d)
    val regs = Sketch.hllRegisters(
      stream.select(col("user_id").cast("string").as("k")), "k", p)
    // stream-scoped conf, restored for the batch rollup below (the
    // q211/q272 treatment): the streamed state is bounded at 2^p
    // register rows NO MATTER the corpus (the query's own contract),
    // so a narrow state exchange is scale-safe by construction and a
    // complete-mode batch pays one state-store commit per partition —
    // 32 commits for 1024 rows was pure fixed cost. The trailing
    // no-data micro-batch only re-emits the identical register table
    // (complete mode, no watermark): skip its commit+rewrite round.
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNd = s.conf.get(ndKey)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set(ndKey, "false")
    try {
      val q = regs.writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.coalesce(1).write.mode("overwrite").parquet(outDir)
        }
        .start()
      try { q.processAllAvailable() } finally q.stop()
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.conf.set(ndKey, prevNd)
    }
    val streamed = s.read.parquet(outDir)
    // the batch reference registers are a session kernel — the stream
    // under test is what runs per call
    val batchRegs = graft.Kernels.eventsHllRegisters(s, d, p)
    val nMismatch = streamed.join(batchRegs, Seq("bucket"), "full_outer")
      .filter(streamed("mreg").isNull || batchRegs("mreg").isNull ||
        streamed("mreg") =!= batchRegs("mreg"))
      .count()
    val est = Sketch.hllRollup(streamed.withColumn("g", lit(1)),
        col("g"), p)
      .select(col("hll_estimate"))
    val result = batchEvents
      .agg(countDistinct(col("user_id")).as("n_exact"))
      .crossJoin(broadcast(est))
      .select(col("n_exact"),
        lit(nMismatch == 0L).as("stream_eq_batch"),
        (abs(col("hll_estimate") - col("n_exact")) / col("n_exact") <=
          lit(3.0 * 1.04 / math.sqrt((1 << p).toDouble)))
          .as("within_bounds"))
    // the 1-row result is checkpointed eagerly so the stream's scratch
    // (sink parquet + checkpoint log) can be deleted before returning
    graft.operators.Exec.detachFromScratch(result, Seq(outDir, ckpt))
  }

  private val q177Sql =
    """SELECT count(DISTINCT user_id) AS n_exact,
       TRUE AS stream_eq_batch, TRUE AS within_bounds
       FROM events"""

  // --------------------------------------------------------------- q243
  /** Benford first-digit audit — the forensic data-quality lens next
    * to q68's rule checks: synthetic or tampered monetary columns
    * betray themselves by a first-significant-digit distribution far
    * from log₁₀(1+1/d). Digit extraction is string-exact (first char
    * of the integer part — no FP log near power-of-ten boundaries);
    * expected frequencies quantize to 1e-9-unit LONGs, each digit's
    * χ² contribution to 1e-6-unit LONGs, and the family statistic is
    * a window sum over the 9-row digit table. ONE map-only corpus
    * pass + a 9-group aggregation; the verdict on TPC-H's uniform
    * price generator is honestly "not Benford" — the audit's point is
    * the measurement, not a pass.
    */
  private def q243(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digit = substring(
      floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
      .cast("int")
    val counts = Tables.orders(s, d)
      .filter(col("o_totalprice") >= 1.0)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy()
    // exp_u: log10(1+1/d) in 1e-9 units — quantized BEFORE any
    // arithmetic so cross-engine libm ulps die at the grid
    val expU = floor(
      log10(lit(1.0) + lit(1.0) / col("digit").cast("double")) * lit(1e9)
        + lit(0.5)).cast("long")
    val n = col("n").cast("double")
    val tot = col("tot").cast("double")
    val expF = col("exp_u").cast("double") / lit(1e9)
    val termU = floor((n / tot - expF) * (n / tot - expF) / expF * tot *
      lit(1e6) + lit(0.5)).cast("long")
    counts
      .withColumn("tot", sum(col("n")).over(wAll))
      .withColumn("exp_u", expU)
      .withColumn("t_u", termU)
      .select(col("digit"), col("n"),
        round(n / tot, 6).as("obs_freq"),
        round(expF, 6).as("exp_freq"),
        round(sum(col("t_u")).over(wAll).cast("double") / lit(1e6), 6)
          .as("chi2_family"))
      .orderBy("digit")
  }

  private val q243Sql =
    """WITH c AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice)
             AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
           count(*)::BIGINT AS n
         FROM orders WHERE o_totalprice >= 1.0 GROUP BY 1),
       e AS (SELECT digit, n,
               CAST(sum(n) OVER () AS BIGINT) AS tot,
               CAST(floor(log10(1.0 + 1.0 / digit::DOUBLE) * 1e9 + 0.5)
                 AS BIGINT) AS exp_u
             FROM c),
       t AS (SELECT digit, n, tot, exp_u,
               CAST(floor((n::DOUBLE / tot::DOUBLE - exp_u::DOUBLE / 1e9)
                   * (n::DOUBLE / tot::DOUBLE - exp_u::DOUBLE / 1e9)
                   / (exp_u::DOUBLE / 1e9) * tot::DOUBLE * 1e6 + 0.5)
                 AS BIGINT) AS t_u
             FROM e)
       SELECT digit, n,
         round(n::DOUBLE / tot::DOUBLE, 6) AS obs_freq,
         round(exp_u::DOUBLE / 1e9, 6) AS exp_freq,
         round(CAST(sum(t_u) OVER () AS DOUBLE) / 1e6, 6) AS chi2_family
       FROM t ORDER BY digit"""

  // --------------------------------------------------------------- q250
  /** Theil–Sen robust trend — the median-based slope estimator that
    * shrugs off the outlier days that wreck q06's least-squares
    * forecast: over a 90-day revenue window, slope = lower median of
    * all pairwise slopes, intercept = lower median of the per-day
    * residual offsets at that slope. The pair table is
    * calendar-bounded (days², ≤ ~4k rows — NEVER corpus²; the corpus
    * collapses to integer-cent daily revenue in ONE aggregation), so
    * the single-partition median windows run on bounded state.
    * Slopes quantize to 1e-6-unit LONGs via fixed-shape IEEE division
    * of exact cent/day integers (identical ops both engines);
    * intercept units stay DECIMAL(38,0) exact.
    */
  private def q250(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val day = datediff(col("l_shipdate").cast("date"),
      lit("1996-01-01").cast("date")).cast("long")
    val daily = Tables.lineitem(s, d)
      .filter(col("l_shipdate").cast("date") >= lit("1996-01-01") &&
        col("l_shipdate").cast("date") < lit("1996-04-01"))
      .select(day.as("dd"),
        floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")
          .as("cents"))
      .groupBy("dd").agg(sum(col("cents")).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = daily.select(col("dd").as("d1"), col("c").as("c1"))
    val b = daily.select(col("dd").as("d2"), col("c").as("c2"))
    val slopes = a.join(b, col("d1") < col("d2"))
      .select(floor((col("c2") - col("c1")).cast("double") * lit(1e6) /
        (col("d2") - col("d1")).cast("double") + lit(0.5)).cast("long")
        .as("s_u"))
    val wAll = Window.partitionBy()
    val wS = Window.orderBy(col("s_u"))
    // lower median rank = (n+1) DIV 2 — Spark's `/` is FP division
    // ((10+1)/2 = 5.5 matches no row_number), so floor it explicitly;
    // DuckDB's `//` in the oracle is the same integer division
    val slopeMed = slopes
      .withColumn("rn", row_number().over(wS))
      .withColumn("np", count(lit(1)).over(wAll))
      .filter(col("rn") === floor((col("np") + lit(1)) / lit(2)))
      .select(col("s_u").as("slope_u"), col("np").as("n_pairs"))
    val resid = daily.crossJoin(broadcast(slopeMed))
      .select(col("slope_u"), col("n_pairs"),
        (col("c").cast(dec) * lit(1000000L).cast(dec) -
          col("slope_u").cast(dec) * col("dd").cast(dec)).as("b_u"))
    val wB = Window.orderBy(col("b_u"))
    val result = resid
      .withColumn("rn", row_number().over(wB))
      .withColumn("nd", count(lit(1)).over(wAll))
      .filter(col("rn") === floor((col("nd") + lit(1)) / lit(2)))
      .select(col("nd").as("n_days"), col("n_pairs"),
        round(col("slope_u").cast("double") / lit(1e6), 6)
          .as("slope_cents_per_day"),
        round(col("b_u").cast("double") / lit(1e6), 4)
          .as("intercept_cents"))
    graft.operators.Exec.owned(result, Seq(daily))
  }

  private val q250Sql =
    """WITH daily AS (SELECT
           datediff('day', DATE '1996-01-01', CAST(l_shipdate AS DATE))
             AS dd,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5)
             AS BIGINT)) AS BIGINT) AS c
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
         GROUP BY 1),
       slopes AS (SELECT CAST(floor((b.c - a.c)::DOUBLE * 1e6
             / (b.dd - a.dd)::DOUBLE + 0.5) AS BIGINT) AS s_u
           FROM daily a JOIN daily b ON a.dd < b.dd),
       sm AS (SELECT s_u AS slope_u, np AS n_pairs
              FROM (SELECT s_u,
                      row_number() OVER (ORDER BY s_u) AS rn,
                      CAST(count(*) OVER () AS BIGINT) AS np
                    FROM slopes)
              WHERE rn = (np + 1) // 2),
       resid AS (SELECT sm.slope_u, sm.n_pairs,
               c::HUGEINT * 1000000 - sm.slope_u::HUGEINT * dd AS b_u
             FROM daily, sm)
       SELECT nd AS n_days, n_pairs,
         round(slope_u::DOUBLE / 1e6, 6) AS slope_cents_per_day,
         round(b_u::DOUBLE / 1e6, 4) AS intercept_cents
       FROM (SELECT *,
               row_number() OVER (ORDER BY b_u) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS nd
             FROM resid)
       WHERE rn = (nd + 1) // 2"""

  // --------------------------------------------------------------- q254
  /** Exact weighted quantiles — "the typical price a SOLD UNIT
    * carries" (quantity-weighted), not the typical row: p50/p90/p99
    * of line-item price in integer cents weighted by integer
    * quantity, through [[graft.operators.Quality.weightedQuantiles]]
    * (per-value weight sums → q158 two-level bucketed prefix — no
    * global sort; rational-fraction target ranks so ceil(p·W/q) is
    * exact integer arithmetic, never an FP ceil off-by-one).
    */
  private def q254(s: SparkSession, d: String): DataFrame = {
    val cents = floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
      .cast("long")
    val base = Tables.lineitem(s, d)
      .select(cents.as("cents"), col("l_quantity").cast("long").as("w"))
    graft.operators.Quality.weightedQuantiles(base, "cents", "w",
      Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
  }

  private val q254Sql =
    """WITH b AS (SELECT
           CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS v,
           CAST(l_quantity AS BIGINT) AS w
         FROM lineitem WHERE CAST(l_quantity AS BIGINT) > 0),
       vals AS (SELECT v, CAST(sum(w) AS BIGINT) AS wv
                FROM b GROUP BY v),
       cum AS (SELECT v, sum(wv) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
               FROM vals),
       tot AS (SELECT sum(wv)::HUGEINT AS tw FROM vals),
       fr AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
                ('p99', 99, 100)) f(frac, p, q)),
       t AS (SELECT frac, (p * tw + q - 1) // q AS target FROM fr, tot)
       SELECT t.frac, CAST(t.target AS BIGINT) AS target_rank,
         min(c.v) AS value
       FROM t JOIN cum c ON c.cw >= t.target
       GROUP BY t.frac, t.target ORDER BY t.frac"""

  // --------------------------------------------------------------- q255
  /** Durbin–Watson residual-autocorrelation diagnostic — the test
    * that says whether q06-style least squares can be TRUSTED: a DW
    * far from 2 means serially correlated residuals (momentum /
    * seasonality the line didn't capture) and understated standard
    * errors. OLS over 1996 daily revenue from exact integer moments
    * (Σd, Σc, Σdc, Σd² in DECIMAL(38,0) — the kernel.cu:62-63
    * closed form), residuals on the calendar-bounded day table,
    * quantized to 1e-6-unit LONGs before the lag-difference sums so
    * the fold is order-independent; DW = Σ(eₜ−eₜ₋₁)²/Σeₜ².
    */
  private def q255(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val day = datediff(col("l_shipdate").cast("date"),
      lit("1996-01-01").cast("date")).cast("long")
    val daily = Tables.lineitem(s, d)
      .filter(col("l_shipdate").cast("date") >= lit("1996-01-01") &&
        col("l_shipdate").cast("date") < lit("1997-01-01"))
      .select(day.as("dd"),
        floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")
          .as("cents"))
      .groupBy("dd").agg(sum(col("cents")).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = daily.agg(count(lit(1)).as("n"),
      sum(col("dd")).as("sd"), sum(col("c")).as("sc"),
      sum(col("dd").cast(dec) * col("c").cast(dec)).as("sdc"),
      sum(col("dd").cast(dec) * col("dd").cast(dec)).as("sdd"))
    val nd = col("n").cast("double")
    val slope = (nd * col("sdc").cast("double") -
        col("sd").cast("double") * col("sc").cast("double")) /
      (nd * col("sdd").cast("double") -
        col("sd").cast("double") * col("sd").cast("double"))
    val icept = (col("sc").cast("double") - slope *
      col("sd").cast("double")) / nd
    val fitted = daily.crossJoin(broadcast(
      m.select(col("n"), slope.as("b"), icept.as("a"))))
    val eU = floor((col("c").cast("double") -
      (col("a") + col("b") * col("dd").cast("double"))) / lit(100.0) *
      lit(1e6) + lit(0.5)).cast("long")
    val wD = Window.orderBy("dd")
    val resid = fitted.select(col("n"), col("b"), col("dd"), eU.as("eu"))
      .withColumn("lagged", lag(col("eu"), 1).over(wD))
    val result = resid.groupBy("n", "b")
      .agg(
        sum(when(col("lagged").isNotNull,
          (col("eu") - col("lagged")).cast(dec) *
            (col("eu") - col("lagged")).cast(dec))).as("num"),
        sum(col("eu").cast(dec) * col("eu").cast(dec)).as("den"))
      .select(col("n").as("n_days"),
        round(col("b") / lit(100.0), 6).as("slope_dollars_per_day"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("dw"),
        round(lit(1.0) - col("num").cast("double") /
          col("den").cast("double") / lit(2.0), 6).as("rho_approx"))
    graft.operators.Exec.owned(result, Seq(daily))
  }

  private val q255Sql =
    """WITH daily AS (SELECT
           datediff('day', DATE '1996-01-01', CAST(l_shipdate AS DATE))
             AS dd,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5)
             AS BIGINT)) AS BIGINT) AS c
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
         GROUP BY 1),
       m AS (SELECT count(*)::BIGINT AS n,
               CAST(sum(dd) AS BIGINT) AS sd,
               CAST(sum(c) AS BIGINT) AS sc,
               sum(dd::HUGEINT * c) AS sdc,
               sum(dd::HUGEINT * dd) AS sdd
             FROM daily),
       f AS (SELECT n,
               (n::DOUBLE * sdc::DOUBLE - sd::DOUBLE * sc::DOUBLE)
                 / (n::DOUBLE * sdd::DOUBLE - sd::DOUBLE * sd::DOUBLE)
                 AS b
             FROM m),
       f2 AS (SELECT f.n, f.b,
               (m.sc::DOUBLE - f.b * m.sd::DOUBLE) / m.n::DOUBLE AS a
             FROM f, m),
       resid AS (SELECT f2.n, f2.b, daily.dd,
               CAST(floor((daily.c::DOUBLE
                   - (f2.a + f2.b * daily.dd::DOUBLE)) / 100.0 * 1e6
                 + 0.5) AS BIGINT) AS eu
             FROM daily, f2),
       lagd AS (SELECT n, b, eu,
               lag(eu) OVER (ORDER BY dd) AS lagged
             FROM resid)
       SELECT n AS n_days,
         round(b / 100.0, 6) AS slope_dollars_per_day,
         round(CAST(sum(CASE WHEN lagged IS NOT NULL
               THEN (eu - lagged)::HUGEINT * (eu - lagged) END) AS DOUBLE)
             / CAST(sum(eu::HUGEINT * eu) AS DOUBLE), 6) AS dw,
         round(1.0 - CAST(sum(CASE WHEN lagged IS NOT NULL
               THEN (eu - lagged)::HUGEINT * (eu - lagged) END) AS DOUBLE)
             / CAST(sum(eu::HUGEINT * eu) AS DOUBLE) / 2.0, 6)
           AS rho_approx
       FROM lagd GROUP BY n, b"""

  // --------------------------------------------------------------- q256
  /** Johnson–Lindenstrauss random-projection audit — the cheapest
    * embedding compressor next to PQ (q156) and int8 (q79): project
    * 64-dim vectors to k=8 with a DETERMINISTIC ±1 sign matrix
    * (md5-parity, generated driver-side and rendered as literals into
    * BOTH engines — the q41/q53 generated-oracle pattern) and grade
    * how well scaled projected distances track true distances on the
    * every-20th consecutive pair set. All arithmetic is exact:
    * micro-unit LONG components, integer dot products and squared
    * distances, per-pair ratios quantized to 1e-6 before the summary.
    * Projection is map-only over the corpus; the pair join is an
    * equi-join on vec_id+1.
    */
  private lazy val jlSigns: IndexedSeq[IndexedSeq[Int]] =
    (0 until 8).map { j =>
      (0 until 64).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"jl:$i:$j".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1 else -1
      }
    }

  private def q256(s: SparkSession, d: String): DataFrame = {
    val xu = transform(col("embedding"), e =>
      floor(abs(e.cast("double")) * lit(1e6) + lit(0.5)).cast("long") *
        when(e < 0, -1L).otherwise(1L))
    val projected = Tables.embeddings(s, d)
      .select(Seq(col("vec_id"), xu.as("xu")) ++
        (0 until 8).map { j =>
          aggregate(
            zip_with(xu, typedLit(jlSigns(j)), (a, sg) => a * sg),
            lit(0L), (acc, t) => acc + t).as(s"y$j")
        }: _*)
    val a = projected.select(
      Seq(col("vec_id").as("ida"), col("xu").as("xa")) ++
        (0 until 8).map(j => col(s"y$j").as(s"ya$j")): _*)
      .filter(pmod(col("ida"), lit(20)) === 0)
    val b = projected.select(
      Seq(col("vec_id").as("idb"), col("xu").as("xb")) ++
        (0 until 8).map(j => col(s"y$j").as(s"yb$j")): _*)
    val dx2 = aggregate(zip_with(col("xa"), col("xb"),
      (p, q) => (p - q) * (p - q)), lit(0L), (acc, t) => acc + t)
    val dy2 = (0 until 8).map { j =>
      (col(s"ya$j") - col(s"yb$j")) * (col(s"ya$j") - col(s"yb$j"))
    }.reduce(_ + _)
    val pairs = a.join(b, col("idb") === col("ida") + 1)
      .select(dx2.as("dx2"), dy2.as("dy2"))
      .filter(col("dx2") > 0)
      .select(floor(col("dy2").cast("double") / lit(8.0) /
        col("dx2").cast("double") * lit(1e6) + lit(0.5)).cast("long")
        .as("ru"))
    pairs.agg(count(lit(1)).as("n_pairs"),
        sum(col("ru")).as("sr"), min(col("ru")).as("mnr"),
        max(col("ru")).as("mxr"),
        sum(when(col("ru") >= 300000L && col("ru") <= 1700000L, 1L)
          .otherwise(0L)).as("nin"))
      .select(col("n_pairs"),
        round(col("sr").cast("double") / col("n_pairs").cast("double") /
          lit(1e6), 6).as("mean_ratio"),
        round(col("mnr").cast("double") / lit(1e6), 6).as("min_ratio"),
        round(col("mxr").cast("double") / lit(1e6), 6).as("max_ratio"),
        round(col("nin").cast("double") / col("n_pairs").cast("double"), 6)
          .as("frac_within_70pct"))
  }

  private val q256Sql = {
    val signRows = (0 until 8).flatMap { j =>
      (0 until 64).map(i => s"($i, $j, ${jlSigns(j)(i)})")
    }.mkString(", ")
    s"""WITH signs AS (SELECT * FROM (VALUES $signRows) s(i, j, sg)),
       xu AS (SELECT vec_id, CAST(r.range AS INT) AS i,
               CAST(floor(abs(embedding[CAST(r.range AS INT) + 1]::DOUBLE)
                   * 1e6 + 0.5) AS BIGINT)
                 * (CASE WHEN embedding[CAST(r.range AS INT) + 1] < 0
                     THEN -1 ELSE 1 END) AS u
             FROM embeddings, range(0, 64) r),
       y AS (SELECT vec_id, j, CAST(sum(u * sg) AS BIGINT) AS yv
             FROM xu JOIN signs USING (i) GROUP BY vec_id, j),
       dx AS (SELECT a.vec_id AS ida,
               CAST(sum((a.u - b.u) * (a.u - b.u)) AS BIGINT) AS dx2
             FROM xu a JOIN xu b
               ON b.vec_id = a.vec_id + 1 AND b.i = a.i
             WHERE a.vec_id % 20 = 0 GROUP BY a.vec_id),
       dy AS (SELECT a.vec_id AS ida,
               CAST(sum((a.yv - b.yv) * (a.yv - b.yv)) AS BIGINT) AS dy2
             FROM y a JOIN y b
               ON b.vec_id = a.vec_id + 1 AND b.j = a.j
             WHERE a.vec_id % 20 = 0 GROUP BY a.vec_id),
       r AS (SELECT CAST(floor(dy.dy2::DOUBLE / 8.0 / dx.dx2::DOUBLE
               * 1e6 + 0.5) AS BIGINT) AS ru
             FROM dx JOIN dy USING (ida) WHERE dx.dx2 > 0)
       SELECT count(*)::BIGINT AS n_pairs,
         round(CAST(sum(ru) AS DOUBLE) / count(*)::DOUBLE / 1e6, 6)
           AS mean_ratio,
         round(min(ru)::DOUBLE / 1e6, 6) AS min_ratio,
         round(max(ru)::DOUBLE / 1e6, 6) AS max_ratio,
         round(CAST(sum(CASE WHEN ru BETWEEN 300000 AND 1700000
             THEN 1 ELSE 0 END) AS DOUBLE) / count(*)::DOUBLE, 6)
           AS frac_within_70pct
       FROM r"""
  }

  // --------------------------------------------------------------- q258
  /** Rolling-origin forecast backtest — the harness that says whether
    * q174/q181's Holt forecasts can be TRUSTED: for every origin day
    * o in [8, 29], fit level+trend on days 1..o of the January daily
    * series (the q174 α=β=0.5 exact-halving fold, SAME init
    * convention: l=x₁, b=x₂−x₁, fold x₂..x_o) and grade the one-step
    * forecast against day o+1, next to the naive carry-forward
    * baseline. MAE and the skill ratio per type — a skill ≥ 1 means
    * the model adds nothing over persistence. ALL origins evaluate
    * inside ONE Catalyst expression (transform over the origin array,
    * fold per origin — the corpus collapses to 5 series arrays first);
    * errors quantize to 1e-4-unit LONGs; the oracle replays every
    * (origin, step) pair through a recursive CTE.
    */
  private def q258(s: SparkSession, d: String): DataFrame = {
    val dd = datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
    val obs = Tables.events(s, d)
      .select(col("event_type").as("k"), dd.as("dd"))
      .filter(col("dd") >= 0 && col("dd") < 30)
      .groupBy("k", "dd").agg(count(lit(1)).as("cnt"))
    val spark = s
    import spark.implicits._
    val grid = obs.select("k").distinct()
      .crossJoin(broadcast((0 until 30).toDF("dd")))
      .join(obs, Seq("k", "dd"), "left")
      .select(col("k"), col("dd"),
        coalesce(col("cnt"), lit(0L)).cast("double").as("x"))
    val series = grid.groupBy("k")
      .agg(transform(array_sort(collect_list(struct(col("dd"), col("x")))),
        t => t.getField("x")).as("xs"))
    val a = lit(0.5)
    val b = lit(0.5)
    def foldTo(xs: org.apache.spark.sql.Column,
               o: org.apache.spark.sql.Column) =
      aggregate(
        slice(xs, lit(2), o - 1),
        struct(element_at(xs, 1).as("l"),
          (element_at(xs, 2) - element_at(xs, 1)).as("b")),
        (acc, x) => {
          val l2 = a * x + (lit(1.0) - a) *
            (acc.getField("l") + acc.getField("b"))
          struct(l2.as("l"),
            (b * (l2 - acc.getField("l")) +
              (lit(1.0) - b) * acc.getField("b")).as("b"))
        })
    val errs = series.select(col("k"),
      transform(sequence(lit(8), lit(29)), o => {
        val st = foldTo(col("xs"), o)
        val pred = st.getField("l") + st.getField("b")
        val actual = element_at(col("xs"), o + 1)
        val naive = element_at(col("xs"), o)
        struct(
          floor(abs(pred - actual) * lit(1e4) + lit(0.5)).cast("long")
            .as("he"),
          floor(abs(naive - actual) * lit(1e4) + lit(0.5)).cast("long")
            .as("ne"))
      }).as("es"))
    errs.select(col("k").as("event_type"),
        size(col("es")).cast("long").as("n_origins"),
        aggregate(col("es"), lit(0L), (s0, e) => s0 + e.getField("he"))
          .as("sh"),
        aggregate(col("es"), lit(0L), (s0, e) => s0 + e.getField("ne"))
          .as("sn"))
      .select(col("event_type"), col("n_origins"),
        round(col("sh").cast("double") / col("n_origins").cast("double") /
          lit(1e4), 4).as("mae_holt"),
        round(col("sn").cast("double") / col("n_origins").cast("double") /
          lit(1e4), 4).as("mae_naive"),
        when(col("sn") > 0,
          round(col("sh").cast("double") / col("sn").cast("double"), 6))
          .as("skill"))
      .orderBy("event_type")
  }

  private val q258Sql =
    """WITH RECURSIVE obs AS (SELECT event_type AS k,
           datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dd,
           count(*)::DOUBLE AS x
         FROM events
         WHERE datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) >= 0
           AND datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) < 30
         GROUP BY 1, 2),
       ks AS (SELECT DISTINCT k FROM obs),
       xs AS (SELECT ks.k, CAST(r.range AS INT) + 1 AS t,
               coalesce(obs.x, 0) AS x
             FROM ks CROSS JOIN range(0, 30) r
             LEFT JOIN obs ON obs.k = ks.k AND obs.dd = r.range),
       og AS (SELECT CAST(range AS INT) AS o FROM range(8, 30)),
       rec AS (
         SELECT x1.k, og.o, 1 AS t, x1.x AS l, x2.x - x1.x AS b
         FROM og, xs x1 JOIN xs x2 ON x2.k = x1.k AND x2.t = 2
         WHERE x1.t = 1
         UNION ALL
         SELECT r.k, r.o, r.t + 1,
           0.5 * x.x + 0.5 * (r.l + r.b),
           0.5 * ((0.5 * x.x + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
         FROM rec r JOIN xs x ON x.k = r.k AND x.t = r.t + 1
         WHERE r.t < r.o),
       e AS (SELECT r.k,
               CAST(floor(abs(r.l + r.b - xt.x) * 1e4 + 0.5) AS BIGINT)
                 AS he,
               CAST(floor(abs(xo.x - xt.x) * 1e4 + 0.5) AS BIGINT) AS ne
             FROM rec r
             JOIN xs xt ON xt.k = r.k AND xt.t = r.o + 1
             JOIN xs xo ON xo.k = r.k AND xo.t = r.o
             WHERE r.t = r.o)
       SELECT k AS event_type, count(*)::BIGINT AS n_origins,
         round(CAST(sum(he) AS DOUBLE) / count(*)::DOUBLE / 1e4, 4)
           AS mae_holt,
         round(CAST(sum(ne) AS DOUBLE) / count(*)::DOUBLE / 1e4, 4)
           AS mae_naive,
         CASE WHEN sum(ne) > 0 THEN
           round(CAST(sum(he) AS DOUBLE) / CAST(sum(ne) AS DOUBLE), 6)
         END AS skill
       FROM e GROUP BY k ORDER BY k"""

  // ----------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q279_boosted_stumps" -> (q279 _),
    "q258_forecast_backtest" -> (q258 _),
    "q243_benford_audit" -> (q243 _),
    "q250_theil_sen" -> (q250 _),
    "q254_weighted_quantiles" -> (q254 _),
    "q255_durbin_watson" -> (q255 _),
    "q256_jl_projection" -> (q256 _),
    "q177_streaming_hll" -> (q177 _),
    "q178_hits" -> (q178 _),
    "q179_attribution" -> (q179 _),
    "q180_hll_intersection" -> (q180 _),
    "q190_calibration" -> (q190 _),
    "q338_brier_decomposition" -> (q338 _),
    "q238_calibration_error" -> (q238 _),
    "q162_logreg_gd" -> (q162 _),
    "q163_adamic_adar" -> (q163 _),
    "q164_decision_stump" -> (q164 _),
    "q165_hll_rollup" -> (q165 _),
    "q166_golden_record" -> (q166 _),
    "q167_semdedup" -> (q167 _),
    "q168_cusum_changepoint" -> (q168 _),
    "q169_mixture_weights" -> (q169 _),
    "q170_iterative_median" -> (q170 _),
    "q171_source_overlap" -> (q171 _),
    "q172_rolling_corr" -> (q172 _),
    "q173_feature_ranking" -> (q173 _),
    "q174_holt_forecast" -> (q174 _),
    "q175_rolling_uniques" -> (q175 _),
    "q176_personalized_pagerank" -> (q176 _),
    "q112_snm_linkage" -> (q112 _),
    "q113_retention_cohorts" -> (q113 _),
    "q114_rolling_anomaly" -> (q114 _),
    "q115_rrf_fusion" -> (q115 _),
    "q116_rag_chunks" -> (q116 _),
    "q117_equidepth_hist" -> (q117 _),
    "q118_triangle_count" -> (q118 _),
    "q119_selfjoin_forecast" -> (q119 _),
    "q120_welch_ab" -> (q120 _),
    "q121_hard_negatives" -> (q121 _),
    "q122_snapshot_diff" -> (q122 _),
    "q123_label_propagation" -> (q123 _),
    "q124_psi_drift" -> (q124 _),
    "q158_ks_drift" -> (q158 _),
    "q160_jw_linkage" -> (q160 _),
    "q161_bfs_hops" -> (q161 _),
    "q125_top_paths" -> (q125 _),
    "q126_srm_check" -> (q126 _),
    "q127_containment" -> (q127 _),
    "q152_repeated_passages" -> (q152 _),
    "q128_negative_sample" -> (q128 _),
    "q129_pmi_pairs" -> (q129 _),
    "q130_seasonality" -> (q130 _),
    "q131_skipgram_pmi" -> (q131 _),
    "q132_vocab_coverage" -> (q132 _),
    "q133_hll_distinct" -> (q133 _),
    "q134_ridge_regression" -> (q134 _),
    "q135_percentile_bands" -> (q135 _),
    "q136_rfm_segmentation" -> (q136 _),
    "q137_dedup_eval" -> (q137 _),
    "q138_trigram_interp" -> (q138 _),
    "q139_centroid_similarity" -> (q139 _),
    "q140_ridge_two_feature" -> (q140 _),
    "q141_source_report" -> (q141 _))

  val oracles: Map[String, String] = Map(
    "q258_forecast_backtest" -> q258Sql,
    "q243_benford_audit" -> q243Sql,
    "q250_theil_sen" -> q250Sql,
    "q254_weighted_quantiles" -> q254Sql,
    "q255_durbin_watson" -> q255Sql,
    "q256_jl_projection" -> q256Sql,
    "q177_streaming_hll" -> q177Sql,
    "q178_hits" -> q178Sql,
    "q179_attribution" -> q179Sql,
    "q180_hll_intersection" -> q180Sql,
    "q190_calibration" -> q190Sql,
    "q338_brier_decomposition" -> q338Sql,
    "q238_calibration_error" -> q238Sql,
    "q162_logreg_gd" -> q162Sql,
    "q163_adamic_adar" -> q163Sql,
    "q164_decision_stump" -> q164Sql,
    "q279_boosted_stumps" -> q279Sql,
    "q165_hll_rollup" -> q165Sql,
    "q166_golden_record" -> q166Sql,
    "q167_semdedup" -> q167Sql,
    "q168_cusum_changepoint" -> q168Sql,
    "q169_mixture_weights" -> q169Sql,
    "q170_iterative_median" -> q170Sql,
    "q171_source_overlap" -> q171Sql,
    "q172_rolling_corr" -> q172Sql,
    "q173_feature_ranking" -> q173Sql,
    "q174_holt_forecast" -> q174Sql,
    "q175_rolling_uniques" -> q175Sql,
    "q176_personalized_pagerank" -> q176Sql,
    "q112_snm_linkage" -> q112Sql,
    "q113_retention_cohorts" -> q113Sql,
    "q114_rolling_anomaly" -> q114Sql,
    "q115_rrf_fusion" -> q115Sql,
    "q116_rag_chunks" -> q116Sql,
    "q117_equidepth_hist" -> q117Sql,
    "q118_triangle_count" -> q118Sql,
    "q119_selfjoin_forecast" -> q119Sql,
    "q120_welch_ab" -> q120Sql,
    "q121_hard_negatives" -> q121Sql,
    "q122_snapshot_diff" -> q122Sql,
    "q123_label_propagation" -> q123Sql,
    "q124_psi_drift" -> q124Sql,
    "q158_ks_drift" -> q158Sql,
    "q160_jw_linkage" -> q160Sql,
    "q161_bfs_hops" -> q161Sql,
    "q125_top_paths" -> q125Sql,
    "q126_srm_check" -> q126Sql,
    "q127_containment" -> q127Sql,
    "q152_repeated_passages" -> q152Sql,
    "q128_negative_sample" -> q128Sql,
    "q129_pmi_pairs" -> q129Sql,
    "q130_seasonality" -> q130Sql,
    "q131_skipgram_pmi" -> q131Sql,
    "q132_vocab_coverage" -> q132Sql,
    "q133_hll_distinct" -> q133Sql,
    "q134_ridge_regression" -> q134Sql,
    "q135_percentile_bands" -> q135Sql,
    "q136_rfm_segmentation" -> q136Sql,
    "q137_dedup_eval" -> q137Sql,
    "q138_trigram_interp" -> q138Sql,
    "q139_centroid_similarity" -> q139Sql,
    "q140_ridge_two_feature" -> q140Sql,
    "q141_source_report" -> q141Sql)
}
