package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
// cross-engine deterministic rounding shadows functions.round
import graft.functions.Rounding.{roundTo => round}

import graft.Tables
import graft.operators.{Fuzzy, Series}

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
    * daily event volumes scored against the trailing 7-day baseline
    * (current day excluded); moments from integer-exact window sums so
    * both engines agree bit-for-bit. */
  private def q114(s: SparkSession, d: String): DataFrame =
    Series.rollingAnomalies(Tables.events(s, d), "event_type", "ts",
        lookback = 7, zThresh = 3.0, minBase = 3)
      .orderBy("event_type", "day")

  private val q114Sql =
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
           count(*) AS cnt
         FROM events GROUP BY event_type, day),
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

  // ----------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q112_snm_linkage" -> (q112 _),
    "q113_retention_cohorts" -> (q113 _),
    "q114_rolling_anomaly" -> (q114 _))

  val oracles: Map[String, String] = Map(
    "q112_snm_linkage" -> q112Sql,
    "q113_retention_cohorts" -> q113Sql,
    "q114_rolling_anomaly" -> q114Sql)
}
