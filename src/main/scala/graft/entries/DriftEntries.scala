package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distribution-drift queries: KS/PSI over stored sketch blobs, drift series,
  * rank normalization, corpus profile drift.
  *
  * Split from SparkEntry (r15): entries and oracle SQL verbatim, combined
  * by [[SparkEntry.queries]] / [[SparkEntry.oracleSql]]. */
private[graft] trait DriftEntries extends EntryInfra {

  protected def driftQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- sketch-native distribution drift: KLL two-sample KS between the
    //    click and view value distributions via datasketch_kll_ks, with
    //    the exact distributed KS (two-level prefix scan — never a
    //    global window) as in-query truth; ok = sketch within the two
    //    sketches' summed normalized rank error of exact ---------------
    "q91_kll_drift" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val ev = spark.table("events")
        .filter(col("event_type").isin("click", "view"))
      val isA = col("event_type") === "click"
      operators.DriftOps.sketchKs(ev, "value", isA, k = 200)
        .crossJoin(operators.DriftOps.exactKs(ev, "value", isA)) // both 1 row
        .select(lit("kll_ks_click_vs_view").as("metric"),
          floor(col("ks_exact") * 1e6).cast("long").as("ks_exact_u"),
          (abs(col("ks_sketch") - col("ks_exact")) <= col("eps")).as("ok"))
    },

    // -- PSI drift between the same two slices: exact equi-width-bin
    //    PSI (bins-bounded aggregation, hash-checked) + the sketch-PMF
    //    form a dashboard computes from stored blobs (band-checked) ----
    "q93_psi_drift" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val ev = spark.table("events")
        .filter(col("event_type").isin("click", "view"))
      val isA = col("event_type") === "click"
      operators.DriftOps.sketchPsi(ev, "value", isA, bins = 10, k = 200)
        .crossJoin(operators.DriftOps.exactPsi(ev, "value", isA, bins = 10)) // 1 row each
        .select(lit("psi_click_vs_view").as("metric"),
          floor(col("psi_exact") * 1e6).cast("long").as("psi_exact_u"),
          (abs(col("psi_sketch") - col("psi_exact")) <= 0.05).as("ok"))
    },

    // -- hour-over-hour drift series: one KLL blob per window, KS probed
    //    between consecutive windows via window-lag over the BLOBS —
    //    the production monitoring shape (sketches stored once, drift a
    //    scalar probe; no re-scan per question). The exact per-pair KS
    //    (parallel per-pair windows) is hash-checked; the sketch KS is
    //    band-checked within summed rank error + one combined ECDF step
    //    (the library's merge-walk evaluation grain) ------------------
    "q94_drift_series" -> qd { spark =>
      import org.apache.spark.sql.functions._
      operators.DriftOps.ksSeries(spark.table("events"), "ts", "value", k = 200)
        .select(col("h").cast("long").as("window_start_s"),
          floor(col("ks_exact") * 1e6).cast("long").as("ks_exact_u"),
          (abs(col("ks_sketch") - col("ks_exact")) <= col("eps")).as("ok"))
        .orderBy("window_start_s")
    },

    // -- snapshot profile drift: exact row/null counts per column are
    //    hash-checked; HLL distinct estimates band-checked against exact
    //    distincts (computed in-query, 3σ ≈ 5% at lgK=12); KLL KS
    //    band-checked as a same-distribution sanity (both slices
    //    interleave the same generator). Two aggregation passes total
    //    for the profile regardless of column count. -------------------
    "q96_profile_drift" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val ev = spark.table("events")
      val sa = ev.filter(col("user_id") % 2 === 0)
      val sb = ev.filter(col("user_id") % 2 === 1)
      val cols = Seq("value", "user_id", "event_type")
      val prof = operators.Profiler.profileDrift(sa, sb, cols)
      // bounded pulls: one exact-distinct row per side (oracle-harness
      // exactness; a deployment reads the HLL fields instead)
      def exact(df: org.apache.spark.sql.DataFrame) = {
        val r = df.agg(countDistinct(col(cols.head)),
          cols.tail.map(c => countDistinct(col(c))): _*).head()
        cols.indices.map(i => cols(i) -> r.getLong(i)).toMap
      }
      val (ea, eb) = (exact(sa), exact(sb))
      def litFor(m: Map[String, Long]) = cols.foldLeft(lit(null).cast("double")) {
        case (acc, c) => when(col("column") === c, lit(m(c).toDouble)).otherwise(acc)
      }
      prof
        .withColumn("xa", litFor(ea)).withColumn("xb", litFor(eb))
        .select(col("column").as("col_name"),
          col("n_a"), col("n_b"), col("null_a"), col("null_b"),
          (abs(col("approx_distinct_a") - col("xa")) <= col("xa") * 0.05).as("distinct_a_ok"),
          (abs(col("approx_distinct_b") - col("xb")) <= col("xb") * 0.05).as("distinct_b_ok"),
          (col("ks").isNull || col("ks") < 0.1).as("ks_ok"))
        .orderBy("col_name")
    },

    // -- quantile-rank normalization (sketch-as-broadcast-model): one
    //    KLL pass builds the model, the transform is a per-row codegen'd
    //    probe of the 1-row broadcast blob. Five anchor rows are checked
    //    against their EXACT global ranks (conditional-count aggregates,
    //    one scan for all five): exact rank hash-matches DuckDB, sketch
    //    rank band-checked at 2× normalized rank error ----------------
    "q95_rank_normalize" -> qd { spark =>
      import org.apache.spark.sql.functions._
      val ev = spark.table("events").filter(col("value").isNotNull)
      val ranked = operators.RangeBounds
        .rankTransform(ev, "value", "r", kllK = 400)
        .filter(col("event_id") < 5)
        .select(col("event_id"), col("r"))
      // bounded driver pull: the 5 anchor values
      val anchors = ev.filter(col("event_id") < 5)
        .select(col("event_id"), col("value")).collect()
        .map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1)
      val cnts = ev.agg(count(lit(1)).as("n"),
        anchors.map { case (id, v) =>
          sum(when(col("value") <= v, 1L).otherwise(0L)).as(s"c$id") }: _*).head()
      val n = cnts.getLong(0).toDouble
      val exact = anchors.indices
        .map(i => (anchors(i)._1, cnts.getLong(i + 1) / n)).toMap
      val exactCol = anchors.foldLeft(lit(null).cast("double")) { case (acc, (id, _)) =>
        when(col("event_id") === id, lit(exact(id))).otherwise(acc) }
      val nre = org.apache.datasketches.kll.KllSketch
        .getNormalizedRankError(400, false)
      ranked.withColumn("exact", exactCol)
        .select(col("event_id"),
          floor(col("exact") * 1e6).cast("long").as("exact_rank_u"),
          (abs(col("r") - col("exact")) <= nre * 2).as("ok"))
        .orderBy("event_id")
    },
  )

  protected def driftOracle: Map[String, String] = Map(
    // exact two-sample KS: integer cumulative counts per distinct value
    // (ties exact), only the final divisions are doubles — bit-stable, so
    // the exact side hash-matches and the sketch side is a literal-true
    // band check (the q39 pattern)
    "q91_kll_drift" ->
      """WITH vals AS (SELECT value AS v,
        |                     CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
        |              FROM events
        |              WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
        |d AS (SELECT v, CAST(sum(ia) AS BIGINT) AS da,
        |             CAST(sum(1 - ia) AS BIGINT) AS db
        |      FROM vals GROUP BY v),
        |c AS (SELECT v, sum(da) OVER (ORDER BY v) AS ca,
        |             sum(db) OVER (ORDER BY v) AS cb FROM d),
        |n AS (SELECT CAST(sum(da) AS DOUBLE) AS na,
        |             CAST(sum(db) AS DOUBLE) AS nb FROM d)
        |SELECT 'kll_ks_click_vs_view' AS metric,
        |       CAST(floor(max(abs(CAST(ca AS DOUBLE) / na
        |                          - CAST(cb AS DOUBLE) / nb)) * 1000000) AS BIGINT)
        |         AS ks_exact_u,
        |       true AS ok
        |FROM c CROSS JOIN n""".stripMargin,

    // exact per-column row/null counts; the sketch estimates are the
    // literal-true band columns
    "q96_profile_drift" ->
      """WITH a AS (SELECT * FROM events WHERE user_id % 2 = 0),
        |b AS (SELECT * FROM events WHERE user_id % 2 = 1),
        |rows_ab AS (
        |  SELECT 'event_type' AS col_name,
        |         (SELECT count(*) FROM a WHERE event_type IS NULL) AS null_a,
        |         (SELECT count(*) FROM b WHERE event_type IS NULL) AS null_b
        |  UNION ALL
        |  SELECT 'user_id',
        |         (SELECT count(*) FROM a WHERE user_id IS NULL),
        |         (SELECT count(*) FROM b WHERE user_id IS NULL)
        |  UNION ALL
        |  SELECT 'value',
        |         (SELECT count(*) FROM a WHERE value IS NULL),
        |         (SELECT count(*) FROM b WHERE value IS NULL))
        |SELECT col_name,
        |       (SELECT count(*) FROM a) AS n_a,
        |       (SELECT count(*) FROM b) AS n_b,
        |       null_a, null_b,
        |       true AS distinct_a_ok, true AS distinct_b_ok, true AS ks_ok
        |FROM rows_ab ORDER BY col_name""".stripMargin,

    // exact inclusive rank count(v' <= v)/n for the 5 anchors; the
    // sketch-probe rank is the literal-true band column
    "q95_rank_normalize" ->
      """WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM events
        |           WHERE value IS NOT NULL)
        |SELECT p.event_id,
        |       CAST(floor((SELECT count(*) FROM events e
        |                   WHERE e.value IS NOT NULL AND e.value <= p.value)
        |                  / n.n * 1000000) AS BIGINT) AS exact_rank_u,
        |       true AS ok
        |FROM (SELECT event_id, value FROM events WHERE event_id < 5) p
        |CROSS JOIN n ORDER BY p.event_id""".stripMargin,

    // exact PSI: equi-width bins over the pooled [min,max] range, integer
    // bin counts, 1e-4 zero-clip, contributions summed in bin order (the
    // Spark fold's order); the sketch-PMF side is the literal-true band
    "q93_psi_drift" ->
      """WITH vals AS (SELECT value AS v,
        |                     CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
        |              FROM events
        |              WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
        |mm AS (SELECT min(v) AS lo, max(v) AS hi FROM vals),
        |b AS (SELECT least(CAST(floor((v - lo) / ((hi - lo) / 10)) AS BIGINT),
        |                   9) AS bin, ia
        |      FROM vals CROSS JOIN mm),
        |c AS (SELECT bin, CAST(sum(ia) AS BIGINT) AS ca,
        |             CAST(sum(1 - ia) AS BIGINT) AS cb FROM b GROUP BY bin),
        |n AS (SELECT CAST(sum(ca) AS DOUBLE) AS na,
        |             CAST(sum(cb) AS DOUBLE) AS nb FROM c),
        |x AS (SELECT bin, greatest(ca / na, 0.0001) AS p,
        |             greatest(cb / nb, 0.0001) AS q
        |      FROM c CROSS JOIN n),
        |l AS (SELECT list((p - q) * ln(p / q) ORDER BY bin) AS arr FROM x)
        |SELECT 'psi_click_vs_view' AS metric,
        |       CAST(floor(list_sum(arr) * 1000000) AS BIGINT) AS psi_exact_u,
        |       true AS ok
        |FROM l""".stripMargin,

    // exact per-consecutive-hour-pair two-sample KS (integer ECDF counts,
    // ties exact, pure IEEE divisions — hash-stable); the sketch-probe
    // side is the literal-true band column
    "q94_drift_series" ->
      """WITH e AS (SELECT date_trunc('hour', ts) AS h, value AS v FROM events),
        |hrs AS (SELECT DISTINCT h FROM e),
        |pairs AS (SELECT h, lag(h) OVER (ORDER BY h) AS ph FROM hrs),
        |p AS (SELECT h, ph FROM pairs WHERE ph IS NOT NULL),
        |m AS (SELECT p.h AS h, e.v,
        |             CASE WHEN e.h = p.ph THEN 1 ELSE 0 END AS ia
        |      FROM p JOIN e ON e.h = p.ph OR e.h = p.h),
        |d AS (SELECT h, v, CAST(sum(ia) AS BIGINT) AS da,
        |             CAST(sum(1 - ia) AS BIGINT) AS db FROM m GROUP BY h, v),
        |c AS (SELECT h, v, sum(da) OVER (PARTITION BY h ORDER BY v) AS ca,
        |             sum(db) OVER (PARTITION BY h ORDER BY v) AS cb FROM d),
        |n AS (SELECT h, CAST(sum(da) AS DOUBLE) AS na,
        |             CAST(sum(db) AS DOUBLE) AS nb FROM d GROUP BY h)
        |SELECT epoch_us(c.h) // 1000000 AS window_start_s,
        |       CAST(floor(max(abs(CAST(ca AS DOUBLE) / na
        |                          - CAST(cb AS DOUBLE) / nb)) * 1000000) AS BIGINT)
        |         AS ks_exact_u,
        |       true AS ok
        |FROM c JOIN n USING (h)
        |GROUP BY c.h ORDER BY window_start_s""".stripMargin,
  )
}
