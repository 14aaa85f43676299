package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.{Dedup, TextAnalysis}

/** Third relational batch (round 3): distribution window functions, map
  * higher-order functions, CSV source/sink round-trip, oracle-checked
  * salted skew aggregation, and the native `session_window` operator on
  * batch input. Oracle discipline as in [[Queries]] (decimal sums,
  * BIGINT casts, Stable.r4, deterministic ORDER BY over a unique key).
  */
object ExtraQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Scratch dir for write-then-read round-trip queries: keyed by query
    * name + sfDir (so repeated Verify/Bench calls in one session reuse one
    * directory, mode=overwrite) AND the Spark applicationId — two
    * concurrent runs on one machine must not race overwrite-vs-read on a
    * shared path. */
  private def sessionTmp(s: SparkSession, name: String, dir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      name + "_" + s.sparkContext.applicationId + "_" +
        dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString

  // ---- distribution window functions (ntile / percent_rank / cume_dist) -----

  /** B11/B12 completion: the distribution-function class. Ordering is made
    * unique with the key tie-break so rank-family values are identical in
    * both engines; percent_rank/cume_dist are exact rationals of the same
    * integers, rounded by the shared Stable.r4 formula. */
  def q63WindowDistribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .where(col("o_orderdate").between(lit("1995-01-01"), lit("1995-03-31")))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("tile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", graft.Stable.r4(percent_rank().over(w)))
      .withColumn("cdist", graft.Stable.r4(cume_dist().over(w)))
      .withColumn("top_key", first(col("o_orderkey")).over(w))
      .orderBy("o_orderkey")
  }

  val q63Oracle: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
       CAST(ntile(4) OVER w AS BIGINT) AS tile,
       floor((percent_rank() OVER w) * 10000.0 + 0.5) / 10000.0 AS pct_rank,
       floor((cume_dist() OVER w) * 10000.0 + 0.5) / 10000.0 AS cdist,
       first_value(o_orderkey) OVER w AS top_key
       FROM orders
       WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
       WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
       ORDER BY o_orderkey"""

  // ---- map higher-order functions -------------------------------------------

  /** B18 completion: the map-function class (map_from_arrays, map_keys,
    * map_values, map_filter, element_at, aggregate-over-values) over the
    * distinct-token map of each document. All outputs are order-insensitive
    * set summaries, so list_distinct order differences are immaterial. */
  def q64MapFuncs(s: SparkSession, dir: String): DataFrame = {
    val toks = array_distinct(split(col("text"), " "))
    val m = map_from_arrays(toks, transform(toks, tk => length(tk)))
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(map_keys(m)).cast("long").as("n_keys"),
        element_at(m, array_min(map_keys(m))).cast("long").as("min_tok_len"),
        size(map_keys(map_filter(m, (_, v) => v > 5))).cast("long").as("n_long"),
        aggregate(map_values(m), lit(0), (acc, v) => acc + v).cast("long").as("sum_len"))
      .orderBy("doc_id")
  }

  val q64Oracle: String =
    """WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
                  FROM documents)
       SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_keys,
         CAST(length(list_min(toks)) AS BIGINT) AS min_tok_len,
         CAST(len(list_filter(toks, x -> length(x) > 5)) AS BIGINT) AS n_long,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_len
       FROM d ORDER BY doc_id"""

  // ---- CSV source/sink round-trip --------------------------------------------

  /** A2-adjacent source/sink surface: write orders to headered CSV, read it
    * back with an explicit schema (never inferred), aggregate. Doubles
    * round-trip exactly through Java's shortest-round-trippable text form;
    * the oracle aggregates the original parquet, so any sink/source
    * fidelity loss fails the hash. */
  def q65CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = sessionTmp(s, "graft_csv_roundtrip", dir)
    t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").option("header", "true").csv(tmp)
    s.read
      .schema("o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, " +
        "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING")
      .option("header", "true").csv(tmp)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"),
        max(col("o_orderdate")).as("last_date"))
      .orderBy("o_orderpriority")
  }

  val q65Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
       MAX(o_orderdate) AS last_date
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- ORC source/sink round-trip --------------------------------------------

  /** Same contract as [[q65CsvRoundtrip]] for the ORC columnar format
    * (Spark-native source/sink): write part, read back, aggregate; the
    * oracle aggregates the original parquet, so a fidelity loss in the
    * aggregated columns (p_brand, p_retailprice, p_size) fails the hash —
    * the other written columns ride along unchecked. */
  def q69OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = sessionTmp(s, "graft_orc_roundtrip", dir)
    t(s, dir, "part")
      .select("p_partkey", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        dsum(col("p_retailprice")).as("total_price"),
        max(col("p_size")).as("max_size"))
      .orderBy("p_brand")
  }

  val q69Oracle: String =
    """SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
       MAX(p_size) AS max_size
       FROM part GROUP BY p_brand ORDER BY p_brand"""

  // ---- salted two-stage aggregation (skew path, oracle-checked) --------------

  /** The skew-mitigation scale path as a declared query: lineitem grouped
    * by the 3-value (maximally hot) returnflag key through
    * [[graft.ops.Skew.saltedCountSum]] — stage 1 fans each hot key over 16
    * salt buckets, stage 2 merges partials. The oracle is the plain GROUP
    * BY, so the equivalence that makes salting safe is hash-checked. */
  def q66SaltedAgg(s: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.saltedCountSum(t(s, dir, "lineitem"),
        key = col("l_returnflag"),
        uniqueId = concat_ws("#", col("l_orderkey"), col("l_linenumber")),
        valueCol = col("l_extendedprice"),
        saltBuckets = 16)
      .orderBy("k")

  val q66Oracle: String =
    """SELECT l_returnflag AS k, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
       FROM lineitem GROUP BY l_returnflag ORDER BY k"""

  // ---- native session_window on batch input ----------------------------------

  /** B26/B28 bridge: Spark's built-in `session_window` generator run on
    * batch input (the same transform `streaming/Events.sessionCounts`
    * serves from a stream). Spark merges session windows that touch OR
    * overlap, so a gap of exactly 30 min stays in the SAME session and a
    * new session starts only when the gap is strictly greater (pinned by
    * the boundary spec in StreamingSpec); the oracle's lag/cumsum form
    * replicates that boundary exactly. */
  def q67SessionWindow(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Events.sessionCounts(t(s, dir, "events"))
      .orderBy("user_id", "session_start_s")

  val q67Oracle: String =
    """WITH e AS (
         SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events),
       flagged AS (
         SELECT user_id, event_id, ts_us,
           CASE WHEN LAG(ts_us) OVER w IS NULL
                  OR ts_us - LAG(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       sessed AS (
         SELECT user_id, ts_us,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM flagged)
       SELECT user_id,
         CAST(MIN(ts_us) // 1000000 AS BIGINT) AS session_start_s,
         COUNT(*) AS n_ev
       FROM sessed GROUP BY user_id, sid
       ORDER BY user_id, session_start_s"""

  // ---- exact distributed quantiles (q68) -------------------------------------

  /** EXACT per-group quantiles at scale — q68's round-10 body, retiring
    * the engine's last no-oracle row. [[graft.ops.ExactQuantiles]]
    * binary-searches the IEEE-754 bit domain of each value column with
    * ≤4 passes of map-side-combinable bucket counts (order-free, so the
    * result is bit-reproducible at any partitioning and hash-matches
    * DuckDB `quantile_disc` exactly) — no per-group full sort, no
    * sketch error. [[q68ApproxPercentile]] remains the documented
    * mergeable-sketch alternative (GK; rank-error-bounded against this
    * exact form in `PlanDisciplineSpec`). */
  def q68ExactQuantile(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.ExactQuantiles.Req
    graft.ops.ExactQuantiles.quantileDisc(
      t(s, dir, "lineitem"), "l_returnflag", Seq(
        Req("l_quantity", 0.5, "median_qty"),
        Req("l_quantity", 0.9, "p90_qty"),
        Req("l_extendedprice", 0.25, "p25_price")))
      .orderBy("l_returnflag")
  }

  val q68Oracle: String =
    """SELECT l_returnflag,
         quantile_disc(l_quantity, 0.5) AS median_qty,
         quantile_disc(l_quantity, 0.9) AS p90_qty,
         quantile_disc(l_extendedprice, 0.25) AS p25_price
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Sketch-quantile counterpart to q68's exact selection:
    * `approx_percentile` (Greenwald-Khanna) with accuracy 10000. The
    * sketch is mergeable, so it scales as a partial+final aggregation;
    * its merge is not commutative-exact, which is why the DECLARED q68
    * is the exact binary-search form. GK's guarantee is a RANK error
    * bound, and the spec asserts its observable value consequence
    * against the exact quantiles with slack for the
    * element-vs-interpolated gap. */
  def q68ApproxPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(graft.Stable.r4(expr("approx_percentile(l_quantity, 0.5, 10000)").cast("double")).as("median_qty"),
        graft.Stable.r4(expr("approx_percentile(l_quantity, 0.9, 10000)").cast("double")).as("p90_qty"),
        graft.Stable.r4(expr("approx_percentile(l_extendedprice, 0.25, 10000)").cast("double")).as("p25_price"))
      .orderBy("l_returnflag")

  // ---- unpivot (melt — the reshape inverse of q48's pivot) -------------------

  /** Wide-to-long reshape via `Dataset.unpivot` (Catalyst `Unpivot` node):
    * per-priority status counts melted into (priority, status, n) rows.
    * DuckDB's UNPIVOT checks the same semantics. */
  def q70Unpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(expr("count_if(o_orderstatus = 'F')").as("F"),
        expr("count_if(o_orderstatus = 'O')").as("O"),
        expr("count_if(o_orderstatus = 'P')").as("P"))
    wide.unpivot(Array(col("o_orderpriority")),
        Array(col("F"), col("O"), col("P")), "status", "n")
      .orderBy("o_orderpriority", "status")
  }

  val q70Oracle: String =
    """WITH agg AS (SELECT o_orderpriority,
         CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS F,
         CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS O,
         CAST(count_if(o_orderstatus = 'P') AS BIGINT) AS P
       FROM orders GROUP BY o_orderpriority)
       SELECT o_orderpriority, status, n FROM agg
       UNPIVOT (n FOR status IN (F, O, P))
       ORDER BY o_orderpriority, status"""

  // ---- date-series gap fill ---------------------------------------------------

  /** Zero-filled daily series: generate the calendar with
    * `sequence(start, stop, interval 1 day)` + explode, left-join real
    * daily aggregates, coalesce gaps to zero — the standard time-series
    * densification pattern (a generator join, no driver loop). */
  def q71GapFill(s: SparkSession, dir: String): DataFrame = {
    val days = s.range(1).select(explode(sequence(
        lit(java.sql.Date.valueOf("1995-01-01")),
        lit(java.sql.Date.valueOf("1995-03-31")),
        expr("interval 1 day"))).as("day"))
    val daily = t(s, dir, "orders")
      .where(col("o_orderdate").between(lit("1995-01-01"), lit("1995-03-31")))
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
    days.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total_price"), lit(0.0)).as("total_price"))
      .orderBy("day")
  }

  val q71Oracle: String =
    """WITH days AS (
         SELECT CAST(d AS DATE) AS day
         FROM generate_series(DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY) t(d)),
       daily AS (
         SELECT o_orderdate AS day, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
         FROM orders
         WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
         GROUP BY o_orderdate)
       SELECT days.day,
         CAST(COALESCE(daily.n_orders, 0) AS BIGINT) AS n_orders,
         COALESCE(daily.total_price, 0.0) AS total_price
       FROM days LEFT JOIN daily ON days.day = daily.day
       ORDER BY days.day"""

  // ---- multimodal resize + frame-sample kernels (oracle-checked) -------------

  /** The remaining [[graft.ops.Multimodal.MediaKernels]] stubs under the
    * oracle: aspect-preserving resize dims (synthetic w=n_chars,
    * h=n_chars÷2, maxSide 256) and evenly-spaced frame byte offsets.
    * Both kernels are pure integer/float arithmetic the oracle replicates
    * (round-half-up == DuckDB round for positive values); empty payloads
    * yield null frame offsets on both sides. */
  def q72MediaResizeFrames(s: SparkSession, dir: String): DataFrame = {
    val resizeUdf = udf((w: Int, h: Int) => {
      val (rw, rh) = graft.ops.Multimodal.MediaKernels.resizeDims(w, h, 256)
      Seq(rw, rh)
    })
    val framesUdf = udf((n: Long) =>
      graft.ops.Multimodal.MediaKernels.framePositions(n, 4))
    t(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        col("n_chars").cast("int").as("w"),
        expr("CAST(n_chars DIV 2 AS INT)").as("h"),
        length(encode(col("text"), "UTF-8")).cast("long").as("nb"))
      .withColumn("rs", resizeUdf(col("w"), col("h")))
      .withColumn("fr", framesUdf(col("nb")))
      .select(col("media_id"),
        element_at(col("rs"), 1).as("rw"),
        element_at(col("rs"), 2).as("rh"),
        expr("try_element_at(fr, 1)").as("f0"),
        expr("try_element_at(fr, 2)").as("f1"),
        expr("try_element_at(fr, 3)").as("f2"),
        expr("try_element_at(fr, 4)").as("f3"))
      .orderBy("media_id")
  }

  val q72Oracle: String =
    """WITH m AS (
         SELECT doc_id AS media_id, CAST(n_chars AS INT) AS w,
           CAST(n_chars // 2 AS INT) AS h,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS nb
         FROM documents)
       SELECT media_id,
         CASE WHEN w <= 0 OR h <= 0 OR greatest(w, h) <= 256 THEN w
              WHEN w >= h THEN 256
              ELSE CAST(greatest(1, round(CAST(w AS DOUBLE) * 256 / h)) AS INT) END AS rw,
         CASE WHEN w <= 0 OR h <= 0 OR greatest(w, h) <= 256 THEN h
              WHEN w >= h THEN CAST(greatest(1, round(CAST(h AS DOUBLE) * 256 / w)) AS INT)
              ELSE 256 END AS rh,
         CASE WHEN nb <= 0 THEN NULL ELSE CAST(0 AS BIGINT) END AS f0,
         CASE WHEN nb <= 0 THEN NULL ELSE CAST(nb // 4 AS BIGINT) END AS f1,
         CASE WHEN nb <= 0 THEN NULL ELSE CAST(2 * nb // 4 AS BIGINT) END AS f2,
         CASE WHEN nb <= 0 THEN NULL ELSE CAST(3 * nb // 4 AS BIGINT) END AS f3
       FROM m ORDER BY media_id"""

  // ---- real media decode (PPM + WAV kernels under the oracle) ----------------

  /** [[graft.ops.Multimodal.MediaKernels]] REAL decoders end-to-end: per
    * document, synthesize an actual binary PPM image (w×h deterministic in
    * the id, pixel i = (id·31 + i·7) mod 256) and an actual RIFF/WAVE PCM16
    * clip (sample i = (id·131 + i·17) mod 65536 − 32768), run them through
    * encode → decode → content stats. The oracle regenerates the expected
    * pixels/samples arithmetically in SQL, so any header-parse or
    * payload-walk bug in the decoders diverges the hash — this checks
    * DECODED CONTENT, not byte checksums. */
  def q74MediaDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.Multimodal
    import graft.ops.Multimodal.MediaKernels
    val ids = t(s, dir, "documents").select(col("doc_id").cast("long")).as[Long]
    val pairs = ids.mapPartitions { it =>
      it.map { id =>
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        val px = Array.tabulate[Byte](w * h * 3)(i => ((id * 31 + i.toLong * 7) % 256).toByte)
        val ppm = MediaKernels.encodePpm(Multimodal.DecodedImage(w, h, 255, px))
        val n = (16 + id % 16).toInt
        val smp = Array.tabulate[Short](n)(i => ((id * 131 + i.toLong * 17) % 65536 - 32768).toShort)
        val wav = MediaKernels.encodeWav(Multimodal.DecodedAudio(8000, 1, 16, smp))
        Multimodal.MediaPair(id, ppm, wav)
      }
    }
    Multimodal.decodePairStats(pairs).toDF().orderBy("media_id")
  }

  /** q168: perceptual-hash image near-duplicate pairs — the IMAGE twin of
    * q35's SimHash text near-dup, closing the multimodal×dedup cell: a
    * deduped 100-TB image corpus needs exactly this (re-encodes and light
    * edits share a pHash within a few bits; LAION-class pipelines dedup
    * on perceptual/embedding hashes before training). Images are
    * synthesized deterministically from doc_id (the q74 recipe): 64
    * "scenes" of 32×32 texture; each doc renders its scene with a
    * per-variant perturbation — odd variants add a uniform +10 brightness
    * (moves ONLY the DCT DC term ⇒ hash-identical by construction) and
    * v%3 pixels get deterministic noise (a few Hamming bits). Same-scene
    * variants are near-dups the operator must find; different scenes are
    * unrelated. Deterministic end to end (StrictMath fixed-point DCT) ⇒
    * committed-fixture oracle, like the ANN/BPE set; the lossless-banding
    * and brute-force-equality contracts live in PhashSpec.
    *
    * Scale shape: decode+hash is ONE partition-local pass (pixels never
    * shuffle); the self-join shuffles 8 (band, byte) rows per image and
    * the pair space is Σ per-bucket |bucket|² — the q35 blocking bound. */
  /** The q168 scene/variant PPM for one id — shared with the streaming
    * twin's spec so stream and batch are fed byte-identical payloads. */
  def sceneVariantPpm(id: Long): Array[Byte] = {
    import graft.ops.Multimodal
    import graft.ops.Multimodal.MediaKernels
    val scene = id % 64
    val v = id / 64
    val px = Array.tabulate[Byte](32 * 32 * 3) { i =>
      val pix = i / 3; val c = i % 3
      (((scene * 31 + pix.toLong * (3 + scene) + c * 13) % 200)
        + (if (v % 2 == 1) 10 else 0)).toByte
    }
    var i = 0
    while (i < v % 3) { // deterministic few-pixel noise
      val pix = ((scene * 17 + v * 29 + i * 53) % 1024).toInt
      val c = ((v + i) % 3).toInt
      val p = pix * 3 + c
      px(p) = (((px(p) & 0xFF) + 55) % 200).toByte
      i += 1
    }
    MediaKernels.encodePpm(Multimodal.DecodedImage(32, 32, 255, px))
  }

  def q168PhashNeardup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.Multimodal
    val ids = t(s, dir, "documents").select(col("doc_id").cast("long")).as[Long]
    val media = ids.mapPartitions(_.map(id => (id, sceneVariantPpm(id))))
      .toDF("media_id", "ppm")
    Multimodal.phashPairs(media, "media_id", "ppm", maxHamming = 6)
      .orderBy("d1", "d2")
  }

  val q74Oracle: String =
    """WITH ids AS (
         SELECT doc_id AS media_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
                16 + doc_id % 16 AS n
         FROM documents),
       pix AS (
         SELECT media_id,
           CAST(SUM(CASE WHEN i % 3 = 0 THEN (media_id*31 + i*7) % 256 END) AS BIGINT) AS r_sum,
           CAST(SUM(CASE WHEN i % 3 = 1 THEN (media_id*31 + i*7) % 256 END) AS BIGINT) AS g_sum,
           CAST(SUM(CASE WHEN i % 3 = 2 THEN (media_id*31 + i*7) % 256 END) AS BIGINT) AS b_sum
         FROM (SELECT media_id, unnest(generate_series(0, w*h*3 - 1)) AS i FROM ids)
         GROUP BY media_id),
       wav AS (
         SELECT media_id,
           CAST(SUM(abs((media_id*131 + i*17) % 65536 - 32768)) AS BIGINT) AS wav_sum_abs,
           CAST(count_if((media_id*131 + i*17) % 65536 - 32768 >= 0) AS BIGINT) AS wav_n_nonneg
         FROM (SELECT media_id, unnest(generate_series(0, n - 1)) AS i FROM ids)
         GROUP BY media_id)
       SELECT ids.media_id, CAST(w AS INT) AS img_w, CAST(h AS INT) AS img_h,
         r_sum, g_sum, b_sum,
         CAST(8000 AS INT) AS wav_sr, CAST(n AS INT) AS wav_n,
         wav_sum_abs, wav_n_nonneg
       FROM ids JOIN pix USING (media_id) JOIN wav USING (media_id)
       ORDER BY media_id"""

  // ---- lateral correlated subquery (B-extra) ----------------------------------

  /** LATERAL derived-table join (Spark 3.2+ / SQL:1999): per nation, the
    * top-2 customers by account balance via a correlated ORDER BY/LIMIT
    * subquery in FROM — the "top-n per outer row" idiom that otherwise
    * needs a window + filter. Catalyst rewrites the lateral into a
    * ranked join, so it scales like q11's window form. */
  def q78LateralTopn(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("graft_nation")
    t(s, dir, "customer").createOrReplaceTempView("graft_customer")
    s.sql(
      """SELECT n.n_name, t.c_custkey, CAST(t.c_acctbal AS DOUBLE) AS acctbal
         FROM graft_nation n,
         LATERAL (SELECT c_custkey, c_acctbal FROM graft_customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
         ORDER BY n.n_name, t.c_custkey""")
  }

  val q78Oracle: String =
    """SELECT n.n_name, t.c_custkey, CAST(t.c_acctbal AS DOUBLE) AS acctbal
       FROM nation n,
       LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                WHERE c.c_nationkey = n.n_nationkey
                ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
       ORDER BY n.n_name, t.c_custkey"""

  // ---- RANGE window frame (B-extra; q12 covers ROWS frames) -------------------

  /** Value-range moving aggregate: spend per customer over the trailing
    * 30 DAYS (RANGE frame over a day-number ordering), vs q12's
    * row-count frame. RANGE includes all ordering peers symmetrically in
    * both engines, so tie days need no extra tie-break to stay
    * deterministic. */
  def q79RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("o_custkey")
      .orderBy(col("day_num"))
      .rangeBetween(-30, 0)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
          .cast("long").as("day_num"),
        col("o_totalprice"))
      .withColumn("trailing_30d_spend",
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(order)
          .cast("double"))
      .select("o_custkey", "o_orderkey", "day_num", "trailing_30d_spend")
      .orderBy("o_custkey", "o_orderkey")
  }

  val q79Oracle: String =
    """WITH t AS (
         SELECT o_custkey, o_orderkey,
           datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day_num,
           o_totalprice
         FROM orders)
       SELECT o_custkey, o_orderkey, day_num,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY day_num
           RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d_spend
       FROM t ORDER BY o_custkey, o_orderkey"""

  // ---- edit-distance scalar (fuzzy-dedup surface) -----------------------------

  /** Levenshtein distance between neighboring documents' 80-char
    * prefixes — the fuzzy-match scalar of the dedup toolbox (exact =
    * q21, set-based = q23, sketch = q34/q35; edit distance covers the
    * typo/OCR class those miss). Prefix-capped because Levenshtein is
    * O(len²) per pair: at scale this runs AFTER candidate pruning
    * (LSH/minhash), never on the full pair space. */
  def q80EditDistance(s: SparkSession, dir: String): DataFrame = {
    // ASCII-projected before the distance: DuckDB's levenshtein counts
    // BYTES while Spark's counts code points, so any non-ASCII character
    // in the prefix would diverge the oracle (café vs cafe: Spark 1,
    // DuckDB 2). The [ -~] strip is the identical projection in both
    // engines; the multilingual fuzzy path stays with the parity-scored
    // kernels (q23/q34), which never cross engines.
    val docs = t(s, dir, "documents").select(col("doc_id"),
      regexp_replace(col("text"), "[^ -~]", "").as("ascii_text"))
    docs.as("a").join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        levenshtein(substring(col("a.ascii_text"), 1, 80),
          substring(col("b.ascii_text"), 1, 80)).as("edit_dist"))
      .orderBy("d1")
  }

  val q80Oracle: String =
    """WITH d AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS ascii_text
                  FROM documents)
       SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(levenshtein(substring(a.ascii_text, 1, 80),
                          substring(b.ascii_text, 1, 80)) AS INT) AS edit_dist
       FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
       ORDER BY d1"""

  // ---- dedup clustering (transitive closure over near-dup pairs) --------------

  /** End-to-end dedup clustering: exact Jaccard pairs (the q23 operator)
    * → connected components (transitive closure: A~B, B~C ⇒ one cluster
    * even though A,C never matched) → per-doc cluster id, cluster size,
    * and a deterministic representative flag (min doc_id keeps). This is
    * the step a real corpus dedup needs BETWEEN pair generation and
    * filtering — dropping only pairwise matches leaves chains of near-dups
    * in the corpus. Singleton docs keep themselves (cluster = own id).
    *
    * Oracle: same pair CTE as q23, then a recursive CTE computes min
    * reachable id per vertex — DuckDB's closure form of the Hash-Min
    * fixpoint [[graft.ops.Dedup.connectedComponents]] runs distributed. */
  def q81DedupClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id").cast("long").as("doc_id"))
    val pairs = Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
      n = 3, tau = 0.8).select("d1", "d2")
    val comp = Dedup.connectedComponents(pairs, "d1", "d2")
    val labeled = docs
      .join(comp.select(col("id").as("doc_id"), col("cluster")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster_id"))
    val sizes = labeled.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).cast("int").as("keep"))
      .orderBy("doc_id")
  }

  val q81Oracle: String =
    """WITH RECURSIVE toks AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
         FROM documents),
       sh AS (
         SELECT doc_id, tok || ' ' || lead(tok) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
         FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       dt AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL),
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM dt GROUP BY doc_id),
       pr AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
         FROM dt a JOIN dt b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id),
       np AS (
         SELECT d1, d2 FROM pr
         JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
         WHERE inter * 1.0 / (s1.sz + s2.sz - inter) >= 0.8),
       edges AS (SELECT d1 AS src, d2 AS dst FROM np
                 UNION SELECT d2 AS src, d1 AS dst FROM np),
       reach(id, lbl) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst),
       comp AS (SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
       cs AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
              FROM comp GROUP BY cluster_id)
       SELECT c.doc_id, c.cluster_id, cs.cluster_size,
              CAST(c.doc_id = c.cluster_id AS INT) AS keep
       FROM comp c JOIN cs USING (cluster_id)
       ORDER BY c.doc_id"""

  // ---- corpus prep: token-budget shard packing --------------------------------

  /** End-to-end training-corpus prep: exact dedup (keep min doc_id per
    * normalized-text group) → whitespace token count → pack each
    * language's documents into ~4000-token shards by cumulative position
    * (a doc lands in the shard where it BEGINS — the greedy sequential
    * packing a shard writer does). Composition of the dedup, text-stats
    * and window surfaces into the pipeline step that actually materializes
    * training shards.
    *
    * Scale: dedup is one shuffle on the text hash; the packing window is
    * one shuffle on lang + in-partition sort — per-language state only,
    * no global sort until the final (declared-output) ORDER BY. Long-
    * integer `div` arithmetic end-to-end: no fp in the oracle hash. */
  def q82ShardPack(s: SparkSession, dir: String): DataFrame = {
    val dd = Dedup.exactKeepFirst(
        t(s, dir, "documents").withColumn("_k", md5(lower(col("text")))),
        Seq("_k"), Seq(col("doc_id")))
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dd.withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr("(cum - n_tokens) div 4000").as("shard_id"))
      .orderBy("doc_id")
  }

  val q82Oracle: String =
    """WITH dd AS (
         SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
         FROM documents
         QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(lower(text)) ORDER BY doc_id) = 1),
       c AS (
         SELECT doc_id, lang, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         FROM dd)
       SELECT doc_id, lang, n_tokens,
              CAST((cum - n_tokens) // 4000 AS BIGINT) AS shard_id
       FROM c ORDER BY doc_id"""

  // ---- deterministic stratified sampling (mixture weighting) ------------------

  /** Training-mixture sampling: per-language keep rates applied via a
    * DETERMINISTIC hash bucket — `(doc_id * 40503) % 65536` (16-bit
    * Fibonacci hashing) < rate·65536. Unlike `df.sample`, the kept set is
    * a pure function of the row, so it is reproducible across engines,
    * partitionings, and reruns (and hence oracle-checkable). Map-only:
    * no shuffle until the declared-output ORDER BY; at 100 TB this is a
    * single scan with the filter evaluated in the scan stage. The
    * multiplier product stays < 2^56 for ids up to 2^40 — no BIGINT
    * overflow in either engine (DuckDB's checked arithmetic would throw,
    * not wrap). Rates: en 50%, zh 30%, rest 10%. */
  def q83StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(col("doc_id") * lit(40503L), lit(65536L))
    val thr = when(col("lang") === "en", lit(32768L))
      .when(col("lang") === "zh", lit(19661L))
      .otherwise(lit(6554L))
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .where(col("bucket") < thr)
      .orderBy("doc_id")
  }

  val q83Oracle: String =
    """SELECT doc_id, lang, (doc_id * 40503) % 65536 AS bucket
       FROM documents
       WHERE (doc_id * 40503) % 65536 <
         CASE WHEN lang = 'en' THEN 32768 WHEN lang = 'zh' THEN 19661 ELSE 6554 END
       ORDER BY doc_id"""

  // ---- int8 embedding quantization (vector-store compression) -----------------

  /** Symmetric max-abs int8 quantization over the embeddings table — the
    * compression step that serves a float corpus from int8 codes + one
    * scale per vector (8× memory; the codes are what an ANN scan like
    * q75/q76 would stream at 100 TB). Declared outputs are the per-vector
    * scale (r4) plus two pure-integer functionals of the full code array
    * (sum, zero count) so the oracle hash checks every code with no
    * fp-sum-order hazard. Map-only scan; kernel documented in
    * [[graft.ops.Similarity.int8QuantStats]]. */
  def q84Int8Quant(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        graft.ops.Similarity.int8QuantStatsUdf(
          col("embedding").cast("array<double>")).as("st"))
      .select(col("vec_id"), graft.Stable.r4(col("st._1")).as("max_abs"),
        col("st._2").as("code_sum"), col("st._3").as("n_zero"))
      .orderBy("vec_id")

  val q84Oracle: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       m AS (SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
       c AS (SELECT vec_id, maxabs,
               list_transform(v, x -> CAST(floor(
                 x * (CASE WHEN maxabs = 0 THEN 0 ELSE 127.0 / maxabs END)
                 + 0.5) AS BIGINT)) AS codes
             FROM m)
       SELECT vec_id,
         floor(COALESCE(maxabs, 0) * 10000.0 + 0.5) / 10000.0 AS max_abs,
         CAST(COALESCE(list_aggregate(codes, 'sum'), 0) AS BIGINT) AS code_sum,
         CAST(COALESCE(len(list_filter(codes, x -> x = 0)), 0) AS BIGINT) AS n_zero
       FROM c ORDER BY vec_id"""

  // ---- Bloom-filter incremental ingestion dedup -------------------------------

  /** Ingestion-time dedup of a new batch against an existing corpus
    * ([[graft.ops.Dedup.incrementalDedup]]): corpus = docs with
    * `doc_id % 3 != 0`, batch = the rest, key = normalized-text md5. The
    * Bloom pre-filter is result-transparent (false positives are exactly
    * verified, false negatives impossible), so the DuckDB oracle is the
    * plain NOT EXISTS anti-join — the hash check proves the sketch path
    * changes nothing while removing the anti-join shuffle for the
    * definitely-new majority. */
  def q85IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), md5(lower(col("text"))).as("text_hash"))
    val corpus = docs.where(pmod(col("doc_id"), lit(3)) =!= 0)
    val batch = docs.where(pmod(col("doc_id"), lit(3)) === 0)
    Dedup.incrementalDedup(corpus.select("text_hash"), batch, "text_hash")
      .select("doc_id", "lang", "text_hash")
      .orderBy("doc_id")
  }

  val q85Oracle: String =
    """WITH d AS (SELECT doc_id, lang, md5(lower(text)) AS text_hash FROM documents)
       SELECT b.doc_id, b.lang, b.text_hash
       FROM d b
       WHERE b.doc_id % 3 = 0
         AND NOT EXISTS (SELECT 1 FROM d c
                         WHERE c.doc_id % 3 <> 0 AND c.text_hash = b.text_hash)
       ORDER BY b.doc_id"""

  // ---- shingle novelty (contamination / memorization check) -------------------

  /** Per-document novelty: the fraction of a doc's distinct 3-gram
    * shingles NOT already present in any earlier document (first
    * occurrence ordered by doc_id — in a dated corpus this is ingestion
    * order). Low novelty flags boilerplate and train/test contamination —
    * the decontamination signal run over candidate training corpora.
    *
    * Shape: explode distinct shingles, min-over-shingle window (ONE
    * shuffle on the shingle — a groupBy+join twin would pay two), then
    * re-aggregate per doc. String shingles here so the DuckDB oracle can
    * reproduce them; the 100-TB path works in the 64-bit hash domain like
    * [[graft.ops.Dedup.jaccardPairs]] (4× smaller exchanges, same
    * counts). Docs under 3 tokens have no shingles and are absent, in
    * both engines. */
  def q86ShingleNovelty(s: SparkSession, dir: String): DataFrame = {
    val sh = t(s, dir, "documents")
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
    val w = Window.partitionBy("sh")
    sh.withColumn("first_doc", min("doc_id").over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L)).as("n_seen"))
      .withColumn("novelty", graft.Stable.r4(
        lit(1.0) - col("n_seen").cast("double") / col("n_shingles")))
      .orderBy("doc_id")
  }

  val q86Oracle: String =
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
         FROM documents),
       sh AS (
         SELECT doc_id, tok || ' ' || lead(tok) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
         FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       dt AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL),
       f AS (SELECT doc_id, shingle,
               MIN(doc_id) OVER (PARTITION BY shingle) AS first_doc FROM dt)
       SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
         floor((1.0 - CAST(SUM(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS novelty
       FROM f GROUP BY doc_id ORDER BY doc_id"""

  // ---- BMP media decode (third real codec, order-sensitive oracle) ------------

  /** BMP twin of [[q74MediaDecode]]: per doc, synthesize a top-down RGB
    * raster (pixel i = (id·31 + i·7) mod 256, widths 3-6 so the 4-byte
    * row padding is hit in every phase), encode as standard bottom-up BGR
    * BMP, decode back, emit content stats. `weighted_sum` (Σ i·pixel[i])
    * is ORDER-sensitive: a row-reversal or BGR-swap bug that preserves
    * per-channel sums still diverges the oracle hash. */
  def q87BmpDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.Multimodal
    import graft.ops.Multimodal.MediaKernels
    val ids = t(s, dir, "documents").select(col("doc_id").cast("long")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val w = (3 + id % 4).toInt
        val h = (2 + id % 3).toInt
        val px = Array.tabulate[Byte](w * h * 3)(i => ((id * 31 + i.toLong * 7) % 256).toByte)
        val img = MediaKernels.decodeBmp(
          MediaKernels.encodeBmp(Multimodal.DecodedImage(w, h, 255, px))).get
        var rs = 0L; var gs = 0L; var bs = 0L; var ws = 0L
        var i = 0
        while (i < img.pixels.length) {
          val v = img.pixels(i) & 0xFF
          (i % 3: @annotation.switch) match {
            case 0 => rs += v
            case 1 => gs += v
            case _ => bs += v
          }
          ws += i.toLong * v
          i += 1
        }
        (id, img.width, img.height, rs, gs, bs, ws)
      }
    }.toDF("media_id", "img_w", "img_h", "r_sum", "g_sum", "b_sum", "weighted_sum")
      .orderBy("media_id")
  }

  val q87Oracle: String =
    """WITH ids AS (
         SELECT doc_id AS media_id, 3 + doc_id % 4 AS w, 2 + doc_id % 3 AS h
         FROM documents),
       v AS (
         SELECT media_id, i, (media_id*31 + i*7) % 256 AS val
         FROM (SELECT media_id, unnest(generate_series(0, w*h*3 - 1)) AS i FROM ids)),
       agg AS (
         SELECT media_id,
           CAST(SUM(CASE WHEN i % 3 = 0 THEN val END) AS BIGINT) AS r_sum,
           CAST(SUM(CASE WHEN i % 3 = 1 THEN val END) AS BIGINT) AS g_sum,
           CAST(SUM(CASE WHEN i % 3 = 2 THEN val END) AS BIGINT) AS b_sum,
           CAST(SUM(i * val) AS BIGINT) AS weighted_sum
         FROM v GROUP BY media_id)
       SELECT ids.media_id, CAST(w AS INT) AS img_w, CAST(h AS INT) AS img_h,
              r_sum, g_sum, b_sum, weighted_sum
       FROM ids JOIN agg USING (media_id)
       ORDER BY ids.media_id"""

  // ---- partitioned write + partition-pruned read ------------------------------

  /** Hive-style partitioned layout round-trip: write documents
    * partitioned by `lang`, read back with a lang predicate, aggregate.
    * At 100 TB this is THE storage-layout lever — the lang filter prunes
    * whole directories before any I/O (the plan shows it under
    * `PartitionFilters`, pinned in PlanDisciplineSpec), so a two-language
    * query reads 2/5 of the corpus instead of scanning and filtering.
    * The oracle aggregates the ORIGINAL parquet with the same predicate:
    * any fidelity or pruning-semantics bug diverges the hash. */
  def q88PartitionedPrune(s: SparkSession, dir: String): DataFrame = {
    val tmp = sessionTmp(s, "graft_part_docs", dir)
    t(s, dir, "documents")
      .select("doc_id", "lang", "source", "n_chars")
      .write.mode("overwrite").partitionBy("lang").parquet(tmp)
    s.read.parquet(tmp)
      .where(col("lang").isin("en", "zh"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("lang", "source")
  }

  val q88Oracle: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS first_doc
       FROM documents
       WHERE lang IN ('en', 'zh')
       GROUP BY lang, source
       ORDER BY lang, source"""

  // ---- vocabulary coverage (OOV-rate analysis) --------------------------------

  /** Corpus-derived vocabulary + per-document out-of-vocabulary rate: the
    * top-1000 tokens by frequency (deterministic tie-break: freq desc,
    * token asc) form the vocab; each doc reports how much of it falls
    * outside — the coverage signal that sizes a tokenizer's vocab against
    * a corpus. Shape: one explode+groupBy builds the vocab (TakeOrdered,
    * no global sort), then the tiny vocab BROADCASTS back onto the token
    * stream — the derived-small-table join pattern; per-doc re-agg is the
    * only other shuffle. */
  def q89VocabOov(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
    val vocab = tok.groupBy("tk").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tk")).limit(1000)
      .select(col("tk"), lit(true).as("iv"))
    tok.join(broadcast(vocab), Seq("tk"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", graft.Stable.r4(
        col("n_oov").cast("double") / col("n_tokens")))
      .orderBy("doc_id")
  }

  val q89Oracle: String =
    """WITH tok AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
       vocab AS (
         SELECT tk FROM (
           SELECT tk, COUNT(*) AS n FROM tok GROUP BY tk
           ORDER BY n DESC, tk LIMIT 1000)),
       j AS (SELECT t.doc_id, (v.tk IS NOT NULL) AS iv
             FROM tok t LEFT JOIN vocab v USING (tk))
       SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(count_if(NOT iv) AS BIGINT) AS n_oov,
         floor((CAST(count_if(NOT iv) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5)
           / 10000.0 AS oov_rate
       FROM j GROUP BY doc_id ORDER BY doc_id"""

  // ---- compressed-image decode (JPEG/PNG via javax.imageio) -------------------

  /** Compressed twin of [[q87BmpDecode]]: per doc, synthesize a known RGB
    * raster (pixel i = (id·37 + i·11) mod 256, widths 3-7 / heights 2-5),
    * encode it as REAL PNG through `javax.imageio`, decode it back with
    * [[MediaKernels.decodeImage]], and emit content stats. PNG is
    * lossless, so the decoded per-channel sums and the ORDER-sensitive
    * `weighted_sum` (Σ i·pixel[i]) must equal the closed form the oracle
    * computes — a channel-order, row-order, or color-model bug in the
    * ImageIO plumbing diverges the hash. The same raster also round-trips
    * a SMOOTH (solid-color) raster also round-trips JPEG (lossy):
    * dimensions decode exactly and, because a solid color is pure DC, the
    * mean absolute error vs the original must stay within DC-quantization
    * range (≤ 8/255) — surfaced as `jpg_ok` so a stand-in (or broken)
    * decode fails the oracle. Decode is partition-local mapPartitions —
    * the 100 TB shape. */
  def q90ImageioDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.Multimodal
    import graft.ops.Multimodal.MediaKernels
    val ids = t(s, dir, "documents").select(col("doc_id").cast("long")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val w = (3 + id % 5).toInt
        val h = (2 + id % 4).toInt
        val px = Array.tabulate[Byte](w * h * 3)(i => ((id * 37 + i.toLong * 11) % 256).toByte)
        val src = Multimodal.DecodedImage(w, h, 255, px)
        val png = MediaKernels.decodeImage(MediaKernels.encodeImage(src, "png")).get
        var rs = 0L; var gs = 0L; var bs = 0L; var ws = 0L
        var i = 0
        while (i < png.pixels.length) {
          val v = png.pixels(i) & 0xFF
          (i % 3: @annotation.switch) match {
            case 0 => rs += v
            case 1 => gs += v
            case _ => bs += v
          }
          ws += i.toLong * v
          i += 1
        }
        // JPEG leg on a solid color (id-derived): pure-DC content, so a
        // real codec decodes within tight quantization error
        val solid = Array.tabulate[Byte](w * h * 3)(k => (k % 3 match {
          case 0 => (id * 37) % 256
          case 1 => (id * 91) % 256
          case _ => (id * 53) % 256
        }).toByte)
        val jpg = MediaKernels.decodeImage(
          MediaKernels.encodeImage(Multimodal.DecodedImage(w, h, 255, solid), "jpg"))
        val jpgOk = jpg.exists { j =>
          var err = 0L
          var k = 0
          while (k < j.pixels.length) {
            err += math.abs((j.pixels(k) & 0xFF) - (solid(k) & 0xFF)); k += 1
          }
          j.width == w && j.height == h && err / j.pixels.length <= 8
        }
        (id, png.width, png.height, rs, gs, bs, ws, jpgOk)
      }
    }.toDF("media_id", "img_w", "img_h", "r_sum", "g_sum", "b_sum",
        "weighted_sum", "jpg_ok")
      .orderBy("media_id")
  }

  val q90Oracle: String =
    """WITH ids AS (
         SELECT doc_id AS media_id, 3 + doc_id % 5 AS w, 2 + doc_id % 4 AS h
         FROM documents),
       v AS (
         SELECT media_id, i, (media_id*37 + i*11) % 256 AS val
         FROM (SELECT media_id, unnest(generate_series(0, w*h*3 - 1)) AS i FROM ids)),
       agg AS (
         SELECT media_id,
           CAST(SUM(CASE WHEN i % 3 = 0 THEN val END) AS BIGINT) AS r_sum,
           CAST(SUM(CASE WHEN i % 3 = 1 THEN val END) AS BIGINT) AS g_sum,
           CAST(SUM(CASE WHEN i % 3 = 2 THEN val END) AS BIGINT) AS b_sum,
           CAST(SUM(i * val) AS BIGINT) AS weighted_sum
         FROM v GROUP BY media_id)
       SELECT ids.media_id, CAST(w AS INT) AS img_w, CAST(h AS INT) AS img_h,
              r_sum, g_sum, b_sum, weighted_sum, TRUE AS jpg_ok
       FROM ids JOIN agg USING (media_id)
       ORDER BY ids.media_id"""

  // ---- compressed text source (gzip JSONL) ------------------------------------

  /** The compressed-text ingestion path every web-corpus pipeline hits
    * first: write documents as GZIP-compressed JSONL, read back with an
    * EXPLICIT schema (inference on 100 TB of text is a second full scan),
    * aggregate per lang including a content functional (Σ length(text))
    * so any round-trip mojibake/escaping loss diverges the oracle, which
    * aggregates the ORIGINAL parquet. Gzip is splittable-per-file (not
    * within a file), so at scale the writer's task count — not file size
    * — sets read parallelism; the spec pins the .json.gz layout. */
  def q92GzipJsonl(s: SparkSession, dir: String): DataFrame = {
    val tmp = sessionTmp(s, "graft_gz_jsonl", dir)
    t(s, dir, "documents")
      .select("doc_id", "lang", "source", "n_chars", "text")
      .write.mode("overwrite").option("compression", "gzip").json(tmp)
    s.read
      .schema("doc_id LONG, lang STRING, source STRING, n_chars LONG, text STRING")
      .json(tmp)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        sum(length(col("text"))).cast("long").as("total_text_len"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("lang")
  }

  val q92Oracle: String =
    """SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(length(text)) AS BIGINT) AS total_text_len,
       MIN(doc_id) AS first_doc
       FROM documents GROUP BY lang ORDER BY lang"""

  // ---- URL parsing / per-domain analytics -------------------------------------

  /** Web-corpus provenance analytics: synthesize a deterministic URL per
    * doc (closed form of doc_id), dissect it with Spark's native
    * `parse_url` (HOST / PATH / per-key QUERY — codegen'd, no UDF), and
    * aggregate per host. The oracle recomputes every extracted component
    * from the same closed form, so a parse_url semantics drift (host
    * casing, query-key extraction, path boundaries) fails the hash. Shape:
    * pure projection + one agg shuffle — the per-domain crawl-stats job. */
  def q93UrlParse(s: SparkSession, dir: String): DataFrame = {
    val host = element_at(
      array(lit("alpha.example.com"), lit("beta.example.org"),
        lit("gamma.example.net"), lit("delta.example.io")),
      (col("doc_id") % 4 + 1).cast("int"))
    val url = concat(lit("https://"), host,
      lit("/docs/"), (col("doc_id") % 50).cast("string"),
      lit("/view?rank="), (col("doc_id") % 7).cast("string"),
      lit("&shard="), (col("doc_id") % 13).cast("string"))
    t(s, dir, "documents")
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("rank")).cast("int").as("rank"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("path")).as("n_paths"),
        sum(col("rank")).cast("long").as("rank_sum"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("host")
  }

  val q93Oracle: String =
    """WITH u AS (
         SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'alpha.example.com'
                           WHEN 1 THEN 'beta.example.org'
                           WHEN 2 THEN 'gamma.example.net'
                           ELSE 'delta.example.io' END AS host,
           '/docs/' || CAST(doc_id % 50 AS STRING) || '/view' AS path,
           CAST(doc_id % 7 AS INT) AS rank
         FROM documents)
       SELECT host, COUNT(*) AS n_urls,
         CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
         CAST(SUM(rank) AS BIGINT) AS rank_sum,
         MIN(doc_id) AS first_doc
       FROM u GROUP BY host ORDER BY host"""

  // ---- benchmark decontamination ----------------------------------------------

  /** The GPT-3-style decontamination pass: an eval/benchmark slice (here
    * the deterministic doc_id % 97 == 0 subset standing in for a held-out
    * benchmark file) contributes its distinct 5-gram shingles; every
    * TRAINING doc reports how many of its own distinct 5-grams collide
    * and a contaminated flag. Shape: the eval shingle table is tiny by
    * construction, so Spark broadcasts it into the join against the
    * exploded training shingles (no corpus shuffle — checked by the
    * broadcast() hint being valid); per-doc re-agg is the only shuffle.
    * At 100 TB the eval set stays fixed-size, so the plan is a map-side
    * membership probe plus one aggregation — the cheapest possible
    * full-corpus pass. */
  def q94Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val evalSh = docs.where(col("doc_id") % 97 === 0)
      .select(explode(Dedup.shingles(col("text"), 5)).as("shingle"))
      .distinct()
    val trainSh = docs.where(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 5)).as("shingle"))
    trainSh
      .join(broadcast(evalSh.withColumn("_hit", lit(1))), Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_hit").isNotNull, 1L).otherwise(0L)).as("n_contaminated"))
      .withColumn("contaminated", (col("n_contaminated") > 0).cast("int"))
      .orderBy("doc_id")
  }

  val q94Oracle: String =
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
         FROM documents),
       sh AS (
         SELECT doc_id, tok || ' ' || lead(tok) OVER w || ' ' || lead(tok, 2) OVER w
                || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w AS shingle
         FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       dt AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL),
       ev AS (SELECT DISTINCT shingle FROM dt WHERE doc_id % 97 = 0),
       tr AS (SELECT * FROM dt WHERE doc_id % 97 <> 0)
       SELECT tr.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
         CAST(MAX(CASE WHEN ev.shingle IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS contaminated
       FROM tr LEFT JOIN ev ON tr.shingle = ev.shingle
       GROUP BY tr.doc_id ORDER BY tr.doc_id"""

  // ---- dedup rewrite: quality-based cluster representative --------------------

  /** The step AFTER clustering that actually rewrites the corpus: within
    * each near-dup cluster (q81's connected components over exact-Jaccard
    * pairs) keep the highest-quality member — here the longest text, the
    * standard keep-the-most-complete-version heuristic — with min doc_id
    * as the deterministic tie-break. Output is per-doc provenance (every
    * doc, its cluster, its quality, kept flag) so the rewrite is
    * auditable, not a silent filter. One extra shuffle over q81 (the
    * per-cluster argmax window). */
  def q95DedupRewrite(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), length(col("text")).as("quality"))
    val pairs = Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
      n = 3, tau = 0.8).select("d1", "d2")
    val comp = Dedup.connectedComponents(pairs, "d1", "d2")
    val labeled = docs
      .join(comp.select(col("id").as("doc_id"), col("cluster")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality"),
        coalesce(col("cluster"), col("doc_id")).as("cluster_id"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality").desc, col("doc_id"))
    labeled.withColumn("kept", (row_number().over(w) === 1).cast("int"))
      .select("doc_id", "cluster_id", "quality", "kept")
      .orderBy("doc_id")
  }

  val q95Oracle: String =
    """WITH RECURSIVE toks AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
         FROM documents),
       sh AS (
         SELECT doc_id, tok || ' ' || lead(tok) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
         FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       dt AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE shingle IS NOT NULL),
       sizes AS (SELECT doc_id, COUNT(*) AS sz FROM dt GROUP BY doc_id),
       pr AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
         FROM dt a JOIN dt b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id),
       np AS (
         SELECT d1, d2 FROM pr
         JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
         WHERE inter * 1.0 / (s1.sz + s2.sz - inter) >= 0.8),
       edges AS (SELECT d1 AS src, d2 AS dst FROM np
                 UNION SELECT d2 AS src, d1 AS dst FROM np),
       reach(id, lbl) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.id = e.dst),
       comp AS (SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
       q AS (SELECT doc_id, length(text) AS quality FROM documents)
       SELECT q.doc_id, comp.cluster_id, CAST(q.quality AS INT) AS quality,
         CAST(ROW_NUMBER() OVER (PARTITION BY comp.cluster_id
                ORDER BY q.quality DESC, q.doc_id) = 1 AS INT) AS kept
       FROM q JOIN comp USING (doc_id)
       ORDER BY q.doc_id"""

  // ---- sequence packing (concat-and-chunk) ------------------------------------

  /** The concat-and-chunk step that turns a document stream into
    * fixed-length training sequences (L = 512 tokens): per language, each
    * doc's exclusive cumulative token offset places it in the packed
    * stream; the query emits which sequence the doc STARTS in, which it
    * ENDS in, and how many sequences it spans — the document-boundary
    * bookkeeping an attention-mask/packing writer needs (q82 is the
    * shard-assignment sibling; this is the within-shard chunker). All
    * arithmetic is BIGINT (`DIV`), so the oracle hash is fp-free. Shape:
    * one window shuffle on lang (in-partition running sum), no joins. */
  def q96SequencePack(s: SparkSession, dir: String): DataFrame = {
    val L = 512L
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    tok.withColumn("off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("seq_first", expr(s"off DIV $L"))
      .withColumn("seq_last", expr(s"(off + n_tok - 1) DIV $L"))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("off"),
        col("seq_first"), col("seq_last"),
        (col("seq_last") - col("seq_first") + 1L).as("n_seqs"))
      .orderBy("doc_id")
  }

  val q96Oracle: String =
    """WITH tok AS (
         SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         FROM documents),
       o AS (
         SELECT doc_id, lang, n_tok,
           CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         FROM tok)
       SELECT doc_id, lang, n_tok, off,
         off // 512 AS seq_first,
         (off + n_tok - 1) // 512 AS seq_last,
         (off + n_tok - 1) // 512 - off // 512 + 1 AS n_seqs
       FROM o ORDER BY doc_id"""

  // ---- sketch-routed exact heavy hitters --------------------------------------

  /** Corpus heavy hitters (tokens with freq ≥ 200) by the sketch-route-
    * then-verify pattern q85 uses for Bloom: one treeAggregate pass builds
    * a Count-Min sketch (bounded memory at ANY corpus size), the
    * broadcast sketch prunes the token stream map-side to candidates —
    * CMS only OVERestimates, so the candidate set is a guaranteed
    * superset and the final exact count over survivors makes the result
    * oracle-able against a plain GROUP BY ... HAVING. At 100 TB the
    * long-tail vocabulary (the expensive part of a naive full groupBy)
    * never reaches the shuffle; only near-threshold tokens do. */
  def q97HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val threshold = 200L
    val tok = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tk"))
    // eps 5e-4 → ~5.4k counters/row, 5 rows (~220 KB broadcast); over-
    // estimate bounded by eps·N keeps the candidate superset tight
    val cms = tok.stat.countMinSketch("tk", eps = 0.0005, confidence = 0.99, seed = 42)
    val cmsB = s.sparkContext.broadcast(cms)
    val isCand = udf((tk: String) => cmsB.value.estimateCount(tk) >= threshold)
    tok.where(isCand(col("tk")))
      .groupBy("tk").agg(count(lit(1)).as("freq"))
      .where(col("freq") >= threshold)
      .orderBy(col("freq").desc, col("tk"))
  }

  val q97Oracle: String =
    """SELECT tk, COUNT(*) AS freq
       FROM (SELECT unnest(string_split(text, ' ')) AS tk FROM documents)
       GROUP BY tk HAVING COUNT(*) >= 200
       ORDER BY freq DESC, tk"""

  // ---- XML source/sink round-trip ---------------------------------------------

  /** Same contract as [[q65CsvRoundtrip]]/[[q69OrcRoundtrip]] for Spark 4's
    * NATIVE XML source (the spark-xml donation — no extra jars): write
    * supplier as row-tagged XML, read back with an explicit schema (XML
    * inference is a full extra scan at corpus scale), aggregate per
    * nation. The oracle aggregates the original parquet, so any
    * serialization fidelity loss (escaping, numeric text forms) fails the
    * hash — doubles survive because Spark writes the shortest
    * round-trippable decimal text. Completes the source/sink matrix:
    * parquet, JSONL, gzip-JSONL, CSV, ORC, XML, partitioned, bucketed. */
  def q98XmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = sessionTmp(s, "graft_xml_roundtrip", dir)
    t(s, dir, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite")
      .option("rootTag", "suppliers").option("rowTag", "supplier").xml(tmp)
    s.read
      .schema("s_suppkey LONG, s_name STRING, s_nationkey INT, s_acctbal DOUBLE")
      .option("rowTag", "supplier").xml(tmp)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"),
        dsum(col("s_acctbal")).as("total_acctbal"),
        min(col("s_name")).as("first_name"))
      .orderBy("s_nationkey")
  }

  val q98Oracle: String =
    """SELECT s_nationkey, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal,
       MIN(s_name) AS first_name
       FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""

  // ---- registry ---------------------------------------------------------------

  // ---- q160: schema-evolution (mergeSchema) round-trip -----------------------

  /** Schema evolution across parquet generations — the storage contract
    * every long-lived ingestion pipeline depends on: generation 1 writes
    * the original narrow schema, generation 2 adds a column (`o_rank`),
    * and a single `mergeSchema` read unions both — generation-1 rows
    * surface NULL for the evolved column. The declared aggregate pins
    * exactly that: `n_evolved` counts non-null evolved values (must
    * equal the generation-2 row count per group) and `rank_sum` sums
    * them; the oracle recomputes both from the SOURCE table (the
    * q65/q69/q98 round-trip-fidelity pattern — any merge/NULL-fill
    * defect fails the hash).
    *
    * Scale shape: two partitioned writes + one merged scan + one
    * map-side-combinable aggregate; mergeSchema's footer union is a
    * driver-side metadata operation over file footers, not data. */
  def q160SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val tmp = sessionTmp(s, "graft_schema_evo", dir)
    val orders = t(s, dir, "orders")
    orders.where(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(tmp + "/gen1")
    orders.where(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        (col("o_orderkey") % 5).cast("long").as("o_rank"))
      .write.mode("overwrite").parquet(tmp + "/gen2")
    s.read.option("mergeSchema", "true").parquet(tmp + "/gen1", tmp + "/gen2")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_rank")).as("n_evolved"),
        sum(col("o_rank")).cast("long").as("rank_sum"),
        dsum(col("o_totalprice")).as("total_price"))
      .orderBy("o_orderpriority")
  }

  /** Verbatim-ANSI twin over the source table. */
  val q160Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS n_rows,
         CAST(COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS BIGINT) AS n_evolved,
         CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN o_orderkey % 5 END) AS BIGINT) AS rank_sum,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_window_distribution" -> (q63WindowDistribution _),
    "q64_map_funcs" -> (q64MapFuncs _),
    "q65_csv_roundtrip" -> (q65CsvRoundtrip _),
    "q66_salted_agg" -> (q66SaltedAgg _),
    "q67_session_window" -> (q67SessionWindow _),
    "q68_exact_quantile" -> (q68ExactQuantile _),
    "q69_orc_roundtrip" -> (q69OrcRoundtrip _),
    "q70_unpivot" -> (q70Unpivot _),
    "q71_gap_fill" -> (q71GapFill _),
    "q72_media_resize_frames" -> (q72MediaResizeFrames _),
    "q74_media_decode" -> (q74MediaDecode _),
    "q168_phash_neardup" -> (q168PhashNeardup _),
    "q78_lateral_topn" -> (q78LateralTopn _),
    "q79_range_frame" -> (q79RangeFrame _),
    "q80_edit_distance" -> (q80EditDistance _),
    "q81_dedup_clusters" -> (q81DedupClusters _),
    "q82_shard_pack" -> (q82ShardPack _),
    "q83_stratified_sample" -> (q83StratifiedSample _),
    "q84_int8_quant" -> (q84Int8Quant _),
    "q85_incremental_dedup" -> (q85IncrementalDedup _),
    "q86_shingle_novelty" -> (q86ShingleNovelty _),
    "q87_bmp_decode" -> (q87BmpDecode _),
    "q88_partitioned_prune" -> (q88PartitionedPrune _),
    "q89_vocab_oov" -> (q89VocabOov _),
    "q90_imageio_decode" -> (q90ImageioDecode _),
    "q92_gzip_jsonl" -> (q92GzipJsonl _),
    "q93_url_parse" -> (q93UrlParse _),
    "q94_decontaminate" -> (q94Decontaminate _),
    "q95_dedup_rewrite" -> (q95DedupRewrite _),
    "q96_sequence_pack" -> (q96SequencePack _),
    "q97_heavy_hitters" -> (q97HeavyHitters _),
    "q98_xml_roundtrip" -> (q98XmlRoundtrip _),
    "q160_schema_evolution" -> (q160SchemaEvolution _),
  )

  val oracles: Map[String, String] = Map(
    "q63_window_distribution" -> q63Oracle,
    "q64_map_funcs" -> q64Oracle,
    "q65_csv_roundtrip" -> q65Oracle,
    "q66_salted_agg" -> q66Oracle,
    "q67_session_window" -> q67Oracle,
    "q68_exact_quantile" -> q68Oracle,
    "q69_orc_roundtrip" -> q69Oracle,
    "q70_unpivot" -> q70Oracle,
    "q71_gap_fill" -> q71Oracle,
    "q72_media_resize_frames" -> q72Oracle,
    "q74_media_decode" -> q74Oracle,
    "q168_phash_neardup" -> DataQueries.fixtureOracle("q168_phash_neardup"),
    "q78_lateral_topn" -> q78Oracle,
    "q79_range_frame" -> q79Oracle,
    "q80_edit_distance" -> q80Oracle,
    "q81_dedup_clusters" -> q81Oracle,
    "q82_shard_pack" -> q82Oracle,
    "q83_stratified_sample" -> q83Oracle,
    "q84_int8_quant" -> q84Oracle,
    "q85_incremental_dedup" -> q85Oracle,
    "q86_shingle_novelty" -> q86Oracle,
    "q87_bmp_decode" -> q87Oracle,
    "q88_partitioned_prune" -> q88Oracle,
    "q89_vocab_oov" -> q89Oracle,
    "q90_imageio_decode" -> q90Oracle,
    "q92_gzip_jsonl" -> q92Oracle,
    "q93_url_parse" -> q93Oracle,
    "q94_decontaminate" -> q94Oracle,
    "q95_dedup_rewrite" -> q95Oracle,
    "q96_sequence_pack" -> q96Oracle,
    "q97_heavy_hitters" -> q97Oracle,
    "q98_xml_roundtrip" -> q98Oracle,
    "q160_schema_evolution" -> q160Oracle,
  )
}
