package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Stable

/** Round-9 product-analytics wave (declared surface, SURVEY §2 Part B
  * continuation) — the three classic event-stream analytics shapes every
  * OLAP engine ships and the `events` table was built to exercise, none
  * of which the catalog named yet:
  *
  *   - q148 ordered funnel: how many users reach each stage of
  *          view → click → purchase IN ORDER (a later-stage event only
  *          counts if it happens strictly after the user's earliest
  *          completion of the previous stage) — the conversion query.
  *   - q149 retention cohorts: group users by first-activity week, then
  *          report what fraction of each cohort is still active N weeks
  *          later — the cohort-triangle query.
  *   - q150 event transitions: the first-order Markov matrix of the
  *          event stream — for each event type, where users go next and
  *          with what probability (per-user orderings made total by an
  *          event_id tie-break).
  *
  * Oracle discipline as in [[Queries]]: BIGINT casts everywhere, r4
  * rounding of the one terminal division, deterministic ORDER BY over a
  * unique key, integer (or raw-timestamp-comparison) arithmetic for
  * everything the hash gate sums.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- q148: ordered funnel ------------------------------------------------

  /** Strictly-ordered three-stage funnel over the event stream. Stage
    * timestamps chain per user: t1 = earliest 'view'; t2 = earliest
    * 'click' strictly after t1; t3 = earliest 'purchase' strictly after
    * t2 — the standard "did the user do these IN THIS ORDER" semantics
    * (a purchase before any view does not convert). Output: one row per
    * stage with the user count and the r4 conversion rate vs stage 1.
    *
    * Scale shape: ONE user-keyed window exchange. The three chained
    * stage minima are three Window projections over the SAME
    * partitioning, which Catalyst collapses onto a single exchange +
    * sort; the per-user rollup reuses that clustering, and the final
    * stage pivot runs on a 1-row aggregate. No self-joins — the naive
    * formulation (stage-k table joined back to events k times) ships the
    * event stream k times; this one ships it once. Timestamp comparisons
    * stay in raw microsecond precision, so the chain is engine- and
    * partitioning-invariant. */
  def q148Funnel(s: SparkSession, dir: String): DataFrame =
    funnel(t(s, dir, "events"), Seq("view", "click", "purchase"))

  /** Per-user chained stage-completion times over any (user_id,
    * event_type, ts) frame: one row per user with columns t1..tn — the
    * strict-after chained minima both [[funnel]] (q148) and
    * [[q167ConversionLatency]] consume, kept in ONE place so a fix to
    * the chaining semantics cannot leave a second copy divergent. */
  def stageTimes(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "a funnel needs at least one stage")
    val w = Window.partitionBy("user_id")
    // Chain stage minima left to right; each references the previous
    // stage's window column, so each gets its own projection (same
    // exchange underneath).
    val staged = stages.zipWithIndex.foldLeft(events) { case (df, (st, i)) =>
      val prev = if (i == 0) lit(true) else col(s"t$i").isNotNull && col("ts") > col(s"t$i")
      df.withColumn(s"t${i + 1}",
        min(when(col("event_type") === st && prev, col("ts"))).over(w))
    }
    val stageMaxes = stages.indices.map(i => max(col(s"t${i + 1}")).as(s"t${i + 1}"))
    staged.groupBy("user_id").agg(stageMaxes.head, stageMaxes.tail: _*)
  }

  /** Core of q148 over any (user_id, event_type, ts) frame and ordered
    * stage list — spec/library entry point. */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    val perUser = stageTimes(events, stages)
    val counts = perUser.agg(
      count(col("t1")).as("n1"),
      stages.indices.drop(1).map(i => count(col(s"t${i + 1}")).as(s"n${i + 1}")): _*)
    val stageStructs = stages.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1L).as("idx"), lit(f"${i + 1}%d_$st").as("stage"),
        col(s"n${i + 1}").as("users"))
    }
    counts
      .select(explode(array(stageStructs: _*)).as("s"), col("n1"))
      // order by the NUMERIC stage index, not the label — with 10+ stages
      // the lexicographic label order would interleave ('10_x' < '2_y')
      .select(col("s.idx").as("_idx"), col("s.stage").as("stage"),
        col("s.users").as("users"),
        // an empty stage-1 leaves conversion undefined (NULL), not ÷0 —
        // found by the FourthWavePropertySpec random-stream sweep
        when(col("n1") === 0L, lit(null).cast("double"))
          .otherwise(Stable.r4(col("s.users").cast("double") / col("n1").cast("double")))
          .as("conv"))
      .orderBy("_idx").drop("_idx")
  }

  /** Verbatim-ANSI twin: the same chained window minima, stage pivot via
    * UNION ALL. */
  val q148Oracle: String =
    """WITH w1 AS (SELECT user_id, event_type, ts,
           min(CASE WHEN event_type = 'view' THEN ts END)
             OVER (PARTITION BY user_id) AS t1
         FROM events),
       w2 AS (SELECT user_id, event_type, ts, t1,
           min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
             OVER (PARTITION BY user_id) AS t2
         FROM w1),
       w3 AS (SELECT user_id, t1, t2,
           min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
             OVER (PARTITION BY user_id) AS t3
         FROM w2),
       pu AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
              FROM w3 GROUP BY user_id),
       n AS (SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3 FROM pu),
       st AS (SELECT '1_view' AS stage, n1 AS users, n1 FROM n
              UNION ALL SELECT '2_click', n2, n1 FROM n
              UNION ALL SELECT '3_purchase', n3, n1 FROM n)
       SELECT stage, users,
         floor(CAST(users AS DOUBLE) / CAST(n1 AS DOUBLE) * 10000.0 + 0.5)
           / 10000.0 AS conv
       FROM st ORDER BY stage"""

  // ---- q149: retention cohorts ---------------------------------------------

  /** Weekly retention cohorts: users grouped by the week (integer days
    * since 2024-01-01, div 7 — deliberately calendar-free so both
    * engines agree without any week-truncation convention) of their
    * first event; for each (cohort, weeks-since-cohort) cell, the number
    * of distinct active users and the r4 retained fraction of the
    * cohort. Offset 0 always reports retention 1.0 by construction — a
    * cheap self-check the spec pins.
    *
    * Scale shape: a user-keyed first-week aggregate, a distinct over
    * (user, week) — both map-side combinable — and a user-keyed join
    * between them (users × their active weeks, the minimal pairing any
    * cohort query needs). Cohort sizes are a |cohorts|-row aggregate
    * joined back broadcast-size. Nothing is ever keyed by the hot cohort
    * week alone until the final catalog-sized rollup. */
  def q149RetentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val wk = expr("CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7 AS INT)")
    val base = t(s, dir, "events").select(col("user_id"), wk.as("wk"))
    val first = base.groupBy("user_id").agg(min(col("wk")).as("cohort"))
    val active = base.distinct()
    val cells = active.join(first, "user_id")
      .groupBy(col("cohort"), (col("wk") - col("cohort")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_users"))
    cells.join(broadcast(sizes), "cohort")
      .select(col("cohort").cast("long").as("cohort"),
        col("week_offset").cast("long").as("week_offset"),
        col("n_active").cast("long").as("n_active"),
        col("n_users").cast("long").as("n_users"),
        Stable.r4(col("n_active").cast("double") / col("n_users").cast("double"))
          .as("retention"))
      .orderBy("cohort", "week_offset")
  }

  /** DuckDB twin — `datediff('day', a, b)` spelling is the one dialect
    * difference (front-door patch swaps the argument order form). */
  val q149Oracle: String =
    """WITH base AS (SELECT user_id,
           CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS INT) AS wk
         FROM events),
       fu AS (SELECT user_id, min(wk) AS cohort FROM base GROUP BY user_id),
       act AS (SELECT DISTINCT user_id, wk FROM base),
       cells AS (SELECT f.cohort, a.wk - f.cohort AS week_offset,
                   count(DISTINCT a.user_id) AS n_active
                 FROM act a JOIN fu f ON a.user_id = f.user_id
                 GROUP BY 1, 2),
       sz AS (SELECT cohort, count(*) AS n_users FROM fu GROUP BY cohort)
       SELECT CAST(c.cohort AS BIGINT) AS cohort,
         CAST(c.week_offset AS BIGINT) AS week_offset,
         CAST(c.n_active AS BIGINT) AS n_active,
         CAST(s.n_users AS BIGINT) AS n_users,
         floor(CAST(c.n_active AS DOUBLE) / CAST(s.n_users AS DOUBLE)
           * 10000.0 + 0.5) / 10000.0 AS retention
       FROM cells c JOIN sz s ON c.cohort = s.cohort
       ORDER BY cohort, week_offset"""

  // ---- q150: event-type transition matrix ----------------------------------

  /** First-order Markov transitions of the event stream: for each user,
    * events ordered by (ts, event_id) — event_id breaks timestamp ties,
    * so the sequence (and therefore every count below) is a total order
    * both engines reproduce bit-identically — paired with their
    * successor via LEAD; per (src, dst) pair the count and the r4 row
    * probability.
    *
    * Scale shape: ONE user-keyed window exchange (the LEAD), then a
    * |types|²-bounded aggregate with map-side combine; the row
    * normalization runs as a window over that catalog-sized table, never
    * the stream. */
  def q150EventTransitions(s: SparkSession, dir: String): DataFrame = {
    val seq = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = t(s, dir, "events")
      .select(col("user_id"), col("event_type").as("src"),
        lead(col("event_type"), 1).over(seq).as("dst"))
      .where(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy("src")
    pairs
      .select(col("src"), col("dst"), col("n").cast("long").as("n"),
        Stable.r4(col("n").cast("double") / sum(col("n")).over(tot).cast("double"))
          .as("p"))
      .orderBy("src", "dst")
  }

  /** Verbatim-ANSI twin. */
  val q150Oracle: String =
    """WITH pr AS (SELECT user_id, event_type AS src,
           lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
         FROM events),
       cnt AS (SELECT src, dst, count(*) AS n
               FROM pr WHERE dst IS NOT NULL GROUP BY src, dst)
       SELECT src, dst, CAST(n AS BIGINT) AS n,
         floor(CAST(n AS DOUBLE)
           / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE) * 10000.0 + 0.5)
           / 10000.0 AS p
       FROM cnt ORDER BY src, dst"""

  // ---- q155: frequent event paths (3-step sequence mining) ------------------

  /** Top-10 most frequent 3-event paths: each user's event stream in
    * (ts, event_id) total order yields its consecutive event-type
    * triples via double LEAD; triples aggregate globally and the top 10
    * report count and corpus share — the "what do users actually do"
    * path-mining query one order above q150's first-order transitions
    * (a 2nd-order Markov estimate: common funnels fall out of the data
    * instead of being declared as in q148).
    *
    * Scale shape: the SAME single user-keyed window exchange as q150
    * (both LEADs ride one sort); the triple aggregate is map-side
    * combinable into a |types|³-bounded table, the share denominator is
    * a 1-row broadcast (the q147 pattern — no unpartitioned window even
    * over the bounded table), and top-10 is a TakeOrdered, never a
    * global sort. Ties at the cut break on the path string, so the
    * result is a total order both engines reproduce. */
  def q155EventPaths(s: SparkSession, dir: String): DataFrame = {
    val seq = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val tri = t(s, dir, "events")
      .select(col("user_id"), col("event_type").as("e1"),
        lead(col("event_type"), 1).over(seq).as("e2"),
        lead(col("event_type"), 2).over(seq).as("e3"))
      .where(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
    val total = tri.agg(sum(col("n")).as("tot"))
    tri.crossJoin(broadcast(total))
      .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"),
        col("n").cast("long").as("n"),
        Stable.r4(col("n").cast("double") / col("tot").cast("double")).as("share"))
      .orderBy(col("n").desc, col("path")).limit(10)
  }

  /** Verbatim-shape twin (double LEAD, 1-row comma cross join). */
  val q155Oracle: String =
    """WITH pr AS (SELECT user_id, event_type AS e1,
           lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
           lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
         FROM events),
       cnt AS (SELECT e1, e2, e3, count(*) AS n
               FROM pr WHERE e2 IS NOT NULL AND e3 IS NOT NULL
               GROUP BY e1, e2, e3),
       tot AS (SELECT SUM(n) AS tot FROM cnt)
       SELECT concat(e1, '>', e2, '>', e3) AS path, CAST(n AS BIGINT) AS n,
         floor(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) * 10000.0 + 0.5)
           / 10000.0 AS share
       FROM cnt, tot ORDER BY n DESC, path LIMIT 10"""

  // ---- q158: last-touch attribution ----------------------------------------

  /** Last-touch revenue attribution: every purchase credits the channel
    * of the user's MOST RECENT preceding click (channel synthesized from
    * the click's JSON props, the q19/q93 pattern); per channel the
    * attributed purchase count and revenue. Purchases with no preceding
    * click fall into an explicit '(none)' bucket, so the revenue total
    * is conserved — an invariant the spec pins.
    *
    * Exactness contract: the carried channel rides a last_value IGNORE
    * NULLS window under the (ts, event_id) total order — deterministic
    * in both engines; revenue sums as DECIMAL(18,4) (the q02 dsum
    * recipe) so the per-channel totals are order-free exact.
    *
    * Scale shape: ONE user-keyed window exchange (the carry-forward),
    * then a |channels|-bounded aggregate with map-side combine. The
    * naive formulation — per-purchase as-of join against the click
    * stream — shuffles both streams and sorts per key anyway; the
    * carry-forward does it in the window machinery with no join at
    * all. */
  def q158LastTouchAttribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val channel = concat(lit("ch"),
      (get_json_object(col("props"), "$.k").cast("long") % 4).cast("string"))
    t(s, dir, "events")
      .withColumn("click_ch", when(col("event_type") === "click", channel))
      .withColumn("last_ch", last(col("click_ch"), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .groupBy(coalesce(col("last_ch"), lit("(none)")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy("channel")
  }

  /** DuckDB twin — `last_value(x IGNORE NULLS)` is the one spelling fork
    * (Spark puts IGNORE NULLS after the call; front-door patch). */
  val q158Oracle: String =
    """WITH e AS (SELECT user_id, event_type, ts, event_id, value,
           CASE WHEN event_type = 'click'
                THEN concat('ch', CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS STRING))
           END AS click_ch
         FROM events),
       c AS (SELECT event_type, value,
           last_value(click_ch IGNORE NULLS) OVER (PARTITION BY user_id
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_ch
         FROM e)
       SELECT COALESCE(last_ch, '(none)') AS channel,
         COUNT(*) AS n_purchases,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM c WHERE event_type = 'purchase'
       GROUP BY 1 ORDER BY channel"""

  // ---- q159: trailing-window anomaly detection ------------------------------

  /** Hourly event-volume anomaly flags: bucket events into hours, then
    * score each hour against the mean/variance of the TRAILING 24 hours
    * (RANGE frame over the integer hour key, so gap hours shrink the
    * baseline instead of silently shifting it); |n − mean| > 3σ flags
    * the hour. The +1 variance floor keeps σ > 0 on constant baselines.
    * Hours with an EMPTY trailing baseline (the corpus's first hour, or
    * the first after a gap longer than the window) are DROPPED — there
    * is nothing to score them against, and a fabricated unflagged row
    * would hide exactly the coverage hole a monitor wants to see.
    *
    * Exactness contract: hourly counts, trailing sums and sums of
    * squares are exact BIGINTs; mean and σ come from ONE double
    * division / sqrt with identical operands in both engines; the flag
    * compares those doubles directly and z is r4'd for display.
    *
    * Scale shape: the corpus-sized work is one map-side-combinable
    * (hour) count aggregate; the trailing window runs over the
    * HOURS-CATALOG-sized table (the q147 bounded-window argument — 8.8k
    * rows/year), never the event stream. */
  def q159VolumeAnomalies(s: SparkSession, dir: String): DataFrame = {
    val hourly = t(s, dir, "events")
      .groupBy(expr("unix_seconds(ts) div 3600").as("hr"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy("hr").rangeBetween(-24, -1)
    hourly
      .withColumn("bn", count(col("n")).over(w))
      .withColumn("bsum", sum(col("n")).over(w))
      .withColumn("bsq", sum(col("n") * col("n")).over(w))
      .where(col("bn") > 0)
      .withColumn("mean", col("bsum").cast("double") / col("bn").cast("double"))
      .withColumn("sigma", sqrt(
        (col("bsq").cast("double") - col("bsum").cast("double") * col("bsum").cast("double")
          / col("bn").cast("double")) / col("bn").cast("double") + lit(1.0)))
      .select(col("hr"), col("n"),
        Stable.r4(col("mean")).as("mean24"),
        Stable.r4((col("n").cast("double") - col("mean")) / col("sigma")).as("z"),
        (abs(col("n").cast("double") - col("mean")) > lit(3.0) * col("sigma")).as("flagged"))
      .orderBy("hr")
  }

  /** Verbatim-shape twin (integer RANGE frame, the q79 precedent). */
  val q159Oracle: String =
    """WITH h AS (SELECT epoch_ms(ts) // 3600000 AS hr, COUNT(*) AS n
                  FROM events GROUP BY 1),
       b AS (SELECT hr, n,
           COUNT(n) OVER w AS bn, SUM(n) OVER w AS bsum, SUM(n * n) OVER w AS bsq
         FROM h
         WINDOW w AS (ORDER BY hr RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
       SELECT hr, CAST(n AS BIGINT) AS n,
         floor(CAST(bsum AS DOUBLE) / CAST(bn AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS mean24,
         floor((CAST(n AS DOUBLE) - CAST(bsum AS DOUBLE) / CAST(bn AS DOUBLE))
           / sqrt((CAST(bsq AS DOUBLE) - CAST(bsum AS DOUBLE) * CAST(bsum AS DOUBLE)
                   / CAST(bn AS DOUBLE)) / CAST(bn AS DOUBLE) + 1.0)
           * 10000.0 + 0.5) / 10000.0 AS z,
         abs(CAST(n AS DOUBLE) - CAST(bsum AS DOUBLE) / CAST(bn AS DOUBLE))
           > 3.0 * sqrt((CAST(bsq AS DOUBLE) - CAST(bsum AS DOUBLE) * CAST(bsum AS DOUBLE)
                   / CAST(bn AS DOUBLE)) / CAST(bn AS DOUBLE) + 1.0) AS flagged
       FROM b WHERE bn > 0
       ORDER BY hr"""

  // ---- q161: SCD2 history construction ---------------------------------------

  /** Slowly-changing-dimension (type 2) history build — the warehouse
    * step that turns an event stream of attribute OBSERVATIONS into
    * validity intervals: per user, consecutive runs of the same
    * attribute value (a tier synthesized from the event's JSON props,
    * the q19/q158 pattern) collapse to one versioned row with
    * [valid_from, valid_to) in epoch millis; the current row's valid_to
    * is NULL. Change detection is LAG under the (ts, event_id) total
    * order, so the history is engine- and partitioning-exact.
    *
    * Scale shape: ONE user-keyed window exchange carries all three
    * window passes (LAG change detection, then version numbering and
    * LEAD interval close over the kept rows — the filter preserves both
    * the partitioning and the sort, so no re-shuffle and no re-sort;
    * plan-pinned). The classic MERGE-based SCD2 load (q108's shape)
    * touches a dimension table per batch; this one rebuilds history
    * from the log in a single pass — the backfill/repair form. */
  def q161Scd2History(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val attr = concat(lit("tier"),
      (get_json_object(col("props"), "$.k").cast("long") % 3).cast("string"))
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), attr.as("attr"))
      .withColumn("prev", lag(col("attr"), 1).over(ord))
      .where(col("prev").isNull || col("attr") =!= col("prev"))
      .withColumn("version", row_number().over(ord).cast("long"))
      .withColumn("from_ms", expr("unix_millis(ts)"))
      .withColumn("to_ms", lead(col("from_ms"), 1).over(ord))
      .select(col("user_id"), col("version"), col("attr"),
        col("from_ms"), col("to_ms"))
      .orderBy("user_id", "version")
  }

  /** DuckDB twin (epoch_ms / json_extract_string are the only dialect
    * spellings; both rename mechanically). */
  val q161Oracle: String =
    """WITH a AS (SELECT user_id, ts, event_id,
           concat('tier', CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 AS STRING)) AS attr
         FROM events),
       m AS (SELECT user_id, ts, event_id, attr,
           lag(attr, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         FROM a),
       k AS (SELECT user_id, ts, event_id, attr
             FROM m WHERE prev IS NULL OR attr <> prev)
       SELECT user_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
         attr,
         epoch_ms(ts) AS from_ms,
         lead(epoch_ms(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_ms
       FROM k
       ORDER BY user_id, version"""

  // ---- q163: triangle counting (degree-ordered orientation) ------------------

  /** Per-node triangle counts over an undirected graph — the clustering
    * primitive PageRank (q105) and connected components (q81) left
    * uncovered. The graph is synthesized deterministically from doc_id
    * (the q93/q151 pattern: 50 nodes, structured chords so real
    * triangles exist at every SF).
    *
    * Algorithm: the degree-ordered ORIENTATION method — every
    * undirected edge directs from its lower-(degree, id) endpoint to the
    * higher one, turning the graph into a DAG whose max out-degree is
    * O(√m); wedges join oriented edges head-to-tail and a semi-join
    * against the oriented edge set closes them. This is THE scalable
    * triangle algorithm: the naive wedge join fans out Σdeg(v)² (a hot
    * celebrity node explodes it); orientation bounds the fan-out by
    * Σoutdeg(v)² ≤ O(m^1.5) regardless of skew.
    *
    * Scale shape: two edge-keyed equi-joins (wedge build + closure
    * semi-join) over the oriented edge list, then an explode of each
    * triangle to its three vertices and a node-keyed count — no window,
    * no cartesian; every exchange keys on node ids. Output: node,
    * degree, triangle count (nodes with zero triangles keep their rows
    * via the left join — the clustering-coefficient denominator needs
    * them). */
  def q163TriangleCount(s: SparkSession, dir: String): DataFrame = {
    val a = (col("doc_id") % 50).cast("long")
    val b = ((col("doc_id") % 50) + (col("doc_id") % 7) + 1L) % 50L
    val edges = t(s, dir, "documents")
      .select(least(a, b).as("u"), greatest(a, b).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    triangleCounts(edges)
  }

  /** Core of q163 over any undirected (u, v) edge frame (u < v assumed
    * canonical) — spec/library entry point. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val nodes = edges.select(col("u").as("node"))
      .union(edges.select(col("v").as("node")))
    val deg = nodes.groupBy("node").agg(count(lit(1)).as("degree"))
    // orient each edge toward the higher (degree, id) endpoint
    val du = deg.select(col("node").as("u"), col("degree").as("du"))
    val dv = deg.select(col("node").as("v"), col("degree").as("dv"))
    // plain equi-joins: the degree table is node-count-sized, so a forced
    // broadcast would OOM a genuinely large graph — AQE broadcasts small
    // builds (q163's 50-node catalog included) on its own
    val oriented = edges.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
    // wedges src→x, x→y close into triangles when src→y is an edge
    val e1 = oriented.select(col("src").as("x"), col("dst").as("y1"))
    val e2 = oriented.select(col("src").as("y1"), col("dst").as("y2"))
    val closure = oriented.select(col("src").as("x"), col("dst").as("y2"))
    val tris = e1.join(e2, "y1")
      .join(closure, Seq("x", "y2"), "left_semi")
      .select(col("x"), col("y1"), col("y2"))
    val perNode = tris
      .select(explode(array(col("x"), col("y1"), col("y2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree").cast("long").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).cast("long").as("n_triangles"))
      .orderBy("node")
  }

  /** Verbatim-shape twin (same orientation algebra; EXISTS closes the
    * wedge). */
  val q163Oracle: String =
    """WITH e AS (SELECT DISTINCT
           LEAST(doc_id % 50, ((doc_id % 50) + (doc_id % 7) + 1) % 50) AS u,
           GREATEST(doc_id % 50, ((doc_id % 50) + (doc_id % 7) + 1) % 50) AS v
         FROM documents
         WHERE doc_id % 50 <> ((doc_id % 50) + (doc_id % 7) + 1) % 50),
       deg AS (SELECT node, COUNT(*) AS degree FROM (
                 SELECT u AS node FROM e UNION ALL SELECT v FROM e)
               GROUP BY node),
       o AS (SELECT
           CASE WHEN du.degree < dv.degree
                  OR (du.degree = dv.degree AND e.u < e.v)
                THEN e.u ELSE e.v END AS src,
           CASE WHEN du.degree < dv.degree
                  OR (du.degree = dv.degree AND e.u < e.v)
                THEN e.v ELSE e.u END AS dst
         FROM e
         JOIN deg du ON e.u = du.node
         JOIN deg dv ON e.v = dv.node),
       t AS (SELECT a.src AS x, a.dst AS y1, b.dst AS y2
             FROM o a JOIN o b ON a.dst = b.src
             WHERE EXISTS (SELECT 1 FROM o c
                           WHERE c.src = a.src AND c.dst = b.dst)),
       pn AS (SELECT node, COUNT(*) AS n_triangles FROM (
                SELECT x AS node FROM t
                UNION ALL SELECT y1 FROM t
                UNION ALL SELECT y2 FROM t)
              GROUP BY node)
       SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
         CAST(COALESCE(pn.n_triangles, 0) AS BIGINT) AS n_triangles
       FROM deg d LEFT JOIN pn ON d.node = pn.node
       ORDER BY d.node"""

  // ---- q164: market-basket association rules ---------------------------------

  /** Association-rule mining over order baskets — support, both
    * directional confidences and lift for every co-purchased BRAND pair
    * (brands, not part keys, so pairs repeat enough at every SF for the
    * metrics to mean something; the part→brand lookup is a broadcast).
    * Pairs below 2% basket support are dropped — the standard min-supp
    * prune, applied on exact integer counts so the cut is
    * engine-invariant.
    *
    * Exactness contract: all counts are exact BIGINTs off distinct
    * (order, brand) pairs; support/confidence are r4'd divisions of
    * those integers; lift multiplies BIGINTs inside DECIMAL(38) before
    * its one division, so no intermediate overflows at corpus scale.
    *
    * Scale shape: one distinct (order, brand) exchange — baskets bound
    * the per-order fan-out (≤ |lines|² per basket, never corpus²); the
    * pair aggregate is map-side combinable into a |brands|²-bounded
    * table; brand marginals and the basket total broadcast back (1-row
    * + catalog-sized builds, plan-pinned). The apriori-style lattice
    * above pairs would iterate this same shape per level. */
  def q164AssociationRules(s: SparkSession, dir: String): DataFrame = {
    val brands = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    val ob = t(s, dir, "lineitem")
      .join(broadcast(brands), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct()
    val nBaskets = ob.select(countDistinct(col("okey")).as("n_baskets"))
    val brandCnt = ob.groupBy("brand").agg(count(lit(1)).as("cnt"))
    // pair expansion is ROW-LOCAL off the collected basket (sorted, so
    // b1 < b2 by construction) — one basket-keyed exchange instead of the
    // basket self-join, whose per-key sort the aggregate form avoids
    val pairCnt = ob.groupBy("okey")
      .agg(sort_array(collect_set(col("brand"))).as("bs"))
      .select(explode(expr(
        """flatten(transform(bs, (x, i) ->
             transform(slice(bs, i + 2, size(bs)),
               y -> struct(x AS b1, y AS b2))))""")).as("p"))
      .groupBy(col("p.b1").as("b1"), col("p.b2").as("b2"))
      .agg(count(lit(1)).as("cnt_ab"))
    val c1 = brandCnt.select(col("brand").as("b1"), col("cnt").as("cnt_a"))
    val c2 = brandCnt.select(col("brand").as("b2"), col("cnt").as("cnt_b"))
    pairCnt
      .join(broadcast(c1), "b1").join(broadcast(c2), "b2")
      .crossJoin(broadcast(nBaskets))
      .where(col("cnt_ab") * 50L >= col("n_baskets")) // support >= 2%
      .select(col("b1"), col("b2"), col("cnt_ab").cast("long").as("cnt_ab"),
        Stable.r4(col("cnt_ab").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        Stable.r4(col("cnt_ab").cast("double") / col("cnt_a").cast("double"))
          .as("conf_ab"),
        Stable.r4(col("cnt_ab").cast("double") / col("cnt_b").cast("double"))
          .as("conf_ba"),
        Stable.r4(
          (col("cnt_ab").cast("decimal(38,0)") * col("n_baskets").cast("decimal(38,0)"))
            .cast("double")
            / (col("cnt_a").cast("decimal(38,0)") * col("cnt_b").cast("decimal(38,0)"))
              .cast("double")).as("lift"))
      .orderBy("b1", "b2")
  }

  /** Verbatim-shape twin (integer min-supp cut, DECIMAL lift products). */
  val q164Oracle: String =
    """WITH ob AS (SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
       n AS (SELECT COUNT(DISTINCT okey) AS n_baskets FROM ob),
       bc AS (SELECT brand, COUNT(*) AS cnt FROM ob GROUP BY brand),
       pc AS (SELECT a.brand AS b1, b.brand AS b2, COUNT(*) AS cnt_ab
              FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
              GROUP BY 1, 2)
       SELECT pc.b1, pc.b2, CAST(pc.cnt_ab AS BIGINT) AS cnt_ab,
         floor(CAST(pc.cnt_ab AS DOUBLE) / CAST(n.n_baskets AS DOUBLE)
           * 10000.0 + 0.5) / 10000.0 AS support,
         floor(CAST(pc.cnt_ab AS DOUBLE) / CAST(ca.cnt AS DOUBLE)
           * 10000.0 + 0.5) / 10000.0 AS conf_ab,
         floor(CAST(pc.cnt_ab AS DOUBLE) / CAST(cb.cnt AS DOUBLE)
           * 10000.0 + 0.5) / 10000.0 AS conf_ba,
         floor(CAST(CAST(pc.cnt_ab AS DECIMAL(38,0)) * CAST(n.n_baskets AS DECIMAL(38,0)) AS DOUBLE)
           / CAST(CAST(ca.cnt AS DECIMAL(38,0)) * CAST(cb.cnt AS DECIMAL(38,0)) AS DOUBLE)
           * 10000.0 + 0.5) / 10000.0 AS lift
       FROM pc
       JOIN bc ca ON pc.b1 = ca.brand
       JOIN bc cb ON pc.b2 = cb.brand
       CROSS JOIN n
       WHERE pc.cnt_ab * 50 >= n.n_baskets
       ORDER BY pc.b1, pc.b2"""

  // ---- q165: k-anonymity audit ----------------------------------------------

  /** k-anonymity audit over quasi-identifiers — the privacy check that
    * pairs with q116's PII redaction: rows group into equivalence
    * classes by (market segment, nation, account-balance band), and the
    * audit reports the CLASS-SIZE DISTRIBUTION — for each size, how many
    * classes, how many rows, and the r4 share of all rows sitting in
    * classes of AT MOST that size (the cumulative re-identification
    * exposure: the k=1 row is the uniquely identifiable population, and
    * the release rule "suppress classes smaller than k" reads its
    * threshold straight off this table).
    *
    * Exactness contract: class sizes and counts are exact BIGINTs; the
    * cumulative share is one r4'd division of exact integers; the
    * balance band floors a single double division (identical operands
    * both engines, exact on negative balances too).
    *
    * Scale shape: one quasi-identifier exchange with map-side combine
    * (the class table), then a class-SIZE aggregate bounded by the
    * largest class, and a cumulative window over that bounded
    * distribution — the corpus is touched once; the audit output is
    * catalog-sized at any scale. */
  def q165KAnonymity(s: SparkSession, dir: String): DataFrame = {
    val classes = t(s, dir, "customer")
      .groupBy(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).as("bal_band"))
      .agg(count(lit(1)).as("class_size"))
    val dist = classes.groupBy("class_size")
      .agg(count(lit(1)).as("n_classes"),
        (count(lit(1)) * col("class_size")).as("n_rows"))
    val w = Window.orderBy("class_size")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = dist.agg(sum(col("n_rows")).as("n_total"))
    dist.crossJoin(broadcast(total))
      .withColumn("cum_rows", sum(col("n_rows")).over(w))
      .select(col("class_size").cast("long").as("class_size"),
        col("n_classes").cast("long").as("n_classes"),
        col("n_rows").cast("long").as("n_rows"),
        Stable.r4(col("cum_rows").cast("double") / col("n_total").cast("double"))
          .as("cum_share"))
      .orderBy("class_size")
  }

  /** Verbatim-shape twin. */
  val q165Oracle: String =
    """WITH cls AS (SELECT c_mktsegment, c_nationkey,
           floor(c_acctbal / 1000.0) AS bal_band, COUNT(*) AS class_size
         FROM customer GROUP BY 1, 2, 3),
       dist AS (SELECT class_size, COUNT(*) AS n_classes,
                  COUNT(*) * class_size AS n_rows
                FROM cls GROUP BY class_size),
       tot AS (SELECT SUM(n_rows) AS n_total FROM dist)
       SELECT CAST(d.class_size AS BIGINT) AS class_size,
         CAST(d.n_classes AS BIGINT) AS n_classes,
         CAST(d.n_rows AS BIGINT) AS n_rows,
         floor(CAST(SUM(d.n_rows) OVER (ORDER BY d.class_size
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST(t.n_total AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS cum_share
       FROM dist d CROSS JOIN tot t
       ORDER BY class_size"""

  // ---- q167: funnel time-to-convert distribution ------------------------------

  /** Time-to-convert distribution for the q148 funnel: per fully
    * converting user, the view→purchase latency in whole hours, bucketed
    * into a fixed-bin integer histogram whose summary row reports count,
    * min/max, mean (r4) and the interpolated p50/p90 — the "how long
    * does conversion take" KPI next to q148's "how many convert".
    *
    * Exactness contract: stage times chain in raw microseconds (q148's
    * recipe); latencies floor to integer hours; the histogram is exact
    * integer counts over ≤ 16 fixed bins and the quantile interpolation
    * is the q120 recipe — cumulative window over the bounded bin table,
    * one r4'd terminal division per estimate (DuckDB replays the
    * identical interpolation).
    *
    * Scale shape: the q148 single user-keyed window exchange, then a
    * per-user 1-row projection and a ≤16-key aggregate with map-side
    * combine; quantiles run over the bin catalog, never the users. */
  def q167ConversionLatency(s: SparkSession, dir: String): DataFrame = {
    val lat = stageTimes(t(s, dir, "events"), Seq("view", "click", "purchase"))
      .where(col("t3").isNotNull)
      .select(col("user_id"),
        expr("(unix_micros(t3) - unix_micros(t1)) div 3600000000").as("hrs"))
    val bins = lat
      .select(least(expr("hrs div 24"), lit(15L)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val cum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats = lat.agg(count(lit(1)).as("n_users"),
      min(col("hrs")).as("min_hrs"), max(col("hrs")).as("max_hrs"),
      sum(col("hrs")).as("sum_hrs"))
    def quantile(q: Double): org.apache.spark.sql.Column = {
      // THE covering bin: cumulative count reaches q·n here and had not
      // before — exactly one bin satisfies both sides, so the MIN
      // aggregates a singleton (a one-sided condition would also admit
      // every later bin, whose negative interpolation offset can undercut
      // the true value); interpolate within the bin's 24-hour width
      val qn = lit(q) * col("n_users").cast("double")
      min(when(col("cn").cast("double") >= qn &&
               (col("cn") - col("n")).cast("double") < qn,
        col("bin").cast("double") * 24.0
          + (qn - (col("cn") - col("n")).cast("double"))
            / col("n").cast("double") * 24.0))
    }
    bins.withColumn("cn", sum(col("n")).over(cum))
      .crossJoin(broadcast(stats))
      .agg(min(col("n_users")).as("n_users"),
        min(col("min_hrs")).cast("long").as("min_hrs"),
        min(col("max_hrs")).cast("long").as("max_hrs"),
        Stable.r4(min(col("sum_hrs")).cast("double")
          / min(col("n_users")).cast("double")).as("mean_hrs"),
        Stable.r4(quantile(0.5)).as("p50_hrs"),
        Stable.r4(quantile(0.9)).as("p90_hrs"))
  }

  /** DuckDB twin — the same chained minima, hour floor, 24h bins and
    * interpolation algebra. */
  val q167Oracle: String =
    """WITH w1 AS (SELECT user_id, event_type, ts,
           min(CASE WHEN event_type = 'view' THEN ts END)
             OVER (PARTITION BY user_id) AS t1
         FROM events),
       w2 AS (SELECT user_id, event_type, ts, t1,
           min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
             OVER (PARTITION BY user_id) AS t2
         FROM w1),
       w3 AS (SELECT user_id, t1, t2,
           min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
             OVER (PARTITION BY user_id) AS t3
         FROM w2),
       pu AS (SELECT user_id, max(t1) AS t1, max(t3) AS t3
              FROM w3 GROUP BY user_id),
       lat AS (SELECT user_id,
                 (epoch_us(t3) - epoch_us(t1)) // 3600000000 AS hrs
               FROM pu WHERE t3 IS NOT NULL),
       bins AS (SELECT LEAST(hrs // 24, 15) AS bin, COUNT(*) AS n
                FROM lat GROUP BY 1),
       stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(MIN(hrs) AS BIGINT) AS min_hrs,
                   CAST(MAX(hrs) AS BIGINT) AS max_hrs,
                   CAST(SUM(hrs) AS BIGINT) AS sum_hrs FROM lat),
       c AS (SELECT bin, n,
               SUM(n) OVER (ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
             FROM bins)
       SELECT MIN(s.n_users) AS n_users,
         MIN(s.min_hrs) AS min_hrs, MIN(s.max_hrs) AS max_hrs,
         floor(CAST(MIN(s.sum_hrs) AS DOUBLE) / CAST(MIN(s.n_users) AS DOUBLE)
           * 10000.0 + 0.5) / 10000.0 AS mean_hrs,
         floor(MIN(CASE WHEN CAST(cn AS DOUBLE) >= 0.5 * s.n_users
                        AND CAST(cn - n AS DOUBLE) < 0.5 * s.n_users
           THEN bin * 24.0 + (0.5 * s.n_users - (cn - n)) / n * 24.0 END)
           * 10000.0 + 0.5) / 10000.0 AS p50_hrs,
         floor(MIN(CASE WHEN CAST(cn AS DOUBLE) >= 0.9 * s.n_users
                        AND CAST(cn - n AS DOUBLE) < 0.9 * s.n_users
           THEN bin * 24.0 + (0.9 * s.n_users - (cn - n)) / n * 24.0 END)
           * 10000.0 + 0.5) / 10000.0 AS p90_hrs
       FROM c CROSS JOIN stats s"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q148_funnel" -> (q148Funnel _),
    "q149_retention_cohorts" -> (q149RetentionCohorts _),
    "q150_event_transitions" -> (q150EventTransitions _),
    "q155_event_paths" -> (q155EventPaths _),
    "q158_last_touch_attribution" -> (q158LastTouchAttribution _),
    "q159_volume_anomalies" -> (q159VolumeAnomalies _),
    "q161_scd2_history" -> (q161Scd2History _),
    "q163_triangle_count" -> (q163TriangleCount _),
    "q164_association_rules" -> (q164AssociationRules _),
    "q165_k_anonymity" -> (q165KAnonymity _),
    "q167_conversion_latency" -> (q167ConversionLatency _))

  val oracles: Map[String, String] = Map(
    "q148_funnel" -> q148Oracle,
    "q149_retention_cohorts" -> q149Oracle,
    "q150_event_transitions" -> q150Oracle,
    "q155_event_paths" -> q155Oracle,
    "q158_last_touch_attribution" -> q158Oracle,
    "q159_volume_anomalies" -> q159Oracle,
    "q161_scd2_history" -> q161Oracle,
    "q163_triangle_count" -> q163Oracle,
    "q164_association_rules" -> q164Oracle,
    "q165_k_anonymity" -> q165Oracle,
    "q167_conversion_latency" -> q167Oracle)
}
