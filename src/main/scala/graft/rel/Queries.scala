package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Declared relational surface (SURVEY §2 Part B, B1–B20 + B26/B27): the
  * general-purpose operator battery the engine exposes beyond the RC-RAG
  * reference's own pipeline (the reference has none of these — SURVEY §2
  * Part B establishes absence per class). Every query here is Spark-first
  * declarative DataFrame code: Catalyst gets full visibility for predicate
  * pushdown, column pruning, and join planning; small dims are broadcast
  * explicitly; aggregations are single hash-agg shapes that scale by
  * adding executors.
  *
  * Oracle discipline (SURVEY §2 Part B preamble): deterministic trailing
  * ORDER BY over a key in every query; no raw timestamps in output (dates,
  * epoch-second/µs integers, or strings instead — the driver testdata is
  * TIMESTAMP(NANOS) parquet which Spark reads floored to µs while DuckDB
  * reads natively, see [[Tables]]); monetary aggregates are summed as
  * DECIMAL(18,4) (exact, associative — identical across engines and
  * partitionings, unlike double sums whose error grows with the reduction
  * tree) and cast back to double for a stable comparable schema.
  */
object Queries {

  // ---- shared helpers -----------------------------------------------------

  /** Exact-decimal sum of a double expression: per-row round-to-decimal is
    * deterministic from the identical double on both engines; the decimal
    * sum is exact and order-independent, so it survives any partitioning —
    * the property that makes these queries hash-stable at any scale. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  private def davg(c: Column): Column =
    graft.Stable.r4(sum(c.cast(DecimalType(18, 4))).cast("double") / count(lit(1)))

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Epoch microseconds as long — the only timestamp representation both
    * engines agree on bit-exactly (testdata has zero sub-µs nanos). */
  private def us(c: Column): Column = unix_micros(c)

  // ---- B1 scan + filter + projection -------------------------------------

  def q01ScanFilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
        col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4)).cast("double").as("revenue"),
        col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")

  val q01Oracle: String =
    """SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
       l_quantity
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
         AND l_discount > 0.05
       ORDER BY l_orderkey, l_linenumber"""

  // ---- B2 TPC-H Q1-shape hash aggregation ---------------------------------

  def q02PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        // Triple product: multiply exact decimal FACTORS, never cast the
        // double product (its 5-decimal expansion hits round-half ties that
        // Spark [string-based HALF_UP] and DuckDB [exact-binary] resolve
        // differently). Each factor is a clean 2-decimal value, so the
        // per-factor casts are unambiguous and the decimal product exact.
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))) *
            (lit(1).cast(DecimalType(4, 2)) + col("l_tax").cast(DecimalType(4, 2))))
          .cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q02Oracle: String =
    """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       floor((CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
       floor((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS avg_price,
       floor((CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
       COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2000-09-02'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  // ---- B3 multi-way join: broadcast dims, shuffle fact --------------------

  /** region⋈nation⋈customer⋈orders⋈lineitem revenue by nation. The two
    * tiny dims are broadcast (no shuffle); customer is small enough that
    * AQE broadcasts it at sf0.1 too; only orders⋈lineitem shuffles on the
    * join key — the shape that scales linearly with the fact table. */
  def q03Join5Way(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region").where(col("r_name").isin("ASIA", "EUROPE"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("r_name", "n_name")
  }

  val q03Oracle: String =
    """SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name IN ('ASIA', 'EUROPE')
       GROUP BY r_name, n_name
       ORDER BY r_name, n_name"""

  // ---- B4 semi / anti join ------------------------------------------------

  def q04SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders").select("o_custkey")
    val withOrders = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("with_orders").as("tag"))
    val noOrders = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_orders").as("tag"))
    withOrders.unionByName(noOrders).orderBy("tag", "c_custkey")
  }

  val q04Oracle: String =
    """SELECT c_custkey, 'with_orders' AS tag FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders)
       UNION ALL
       SELECT c_custkey, 'no_orders' AS tag FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
       ORDER BY tag, c_custkey"""

  // ---- B5 left outer join + aggregation -----------------------------------

  def q05OuterJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey", "c_name")
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("o_totalprice").cast(DecimalType(18, 4))).cast("double"), lit(0.0)).as("total_spend"))
      .orderBy("c_custkey")
  }

  val q05Oracle: String =
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
       COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS total_spend
       FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey, c_name
       ORDER BY c_custkey"""

  // ---- B6 range (theta) join ----------------------------------------------

  /** Pairs of events by the same user within 5 minutes. Equi on user_id
    * (shuffle key) + range residual — at scale this is a sort-merge join
    * on user_id with the range as a post-join filter, never a cartesian. */
  def q06RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select("event_id", "user_id", "ts")
    val a = e.select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"))
    val b = e.select(col("event_id").as("b_id"), col("user_id").as("user_id_b"), col("ts").as("b_ts"))
    a.join(b, col("user_id") === col("user_id_b") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("user_id"), col("a_id"), col("b_id"),
        ((us(col("b_ts")) - us(col("a_ts"))).cast("long")).as("gap_us"))
      .orderBy("user_id", "a_id", "b_id")
  }

  val q06Oracle: String =
    """SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       (epoch_ns(b.ts) - epoch_ns(a.ts)) // 1000 AS gap_us
       FROM events a JOIN events b
         ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
       ORDER BY a.user_id, a_id, b_id"""

  // ---- B7 as-of: latest order per customer at a cutoff --------------------

  def q07AsofLatestOrder(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t(s, dir, "orders")
      .where(col("o_orderdate") <= lit("1998-01-01").cast("timestamp"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("asof_date"), col("o_totalprice"))
      .orderBy("o_custkey")
  }

  val q07Oracle: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS asof_date, o_totalprice
       FROM orders
       WHERE o_orderdate <= TIMESTAMP '1998-01-01'
       QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
       ORDER BY o_custkey"""

  // ---- B8 exact distinct aggregation --------------------------------------

  def q08DistinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(col("o_orderstatus")).as("n_statuses"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  val q08Oracle: String =
    """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs,
       COUNT(DISTINCT o_orderstatus) AS n_statuses, COUNT(*) AS n_orders
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- B9 approximate distinct (HLL sketch) — no-oracle -------------------

  /** `approx_count_distinct` is HyperLogLog++; numerically engine-specific,
    * so declared no-oracle (driver records a rows-only check). The spec
    * asserts the estimate is within 5% of exact. */
  def q09ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  // ---- B10 rollup / grouping sets -----------------------------------------

  def q10Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("revenue"), col("n_rows"))
      .orderBy("returnflag", "linestatus")

  val q10Oracle: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
       FROM lineitem
       GROUP BY ROLLUP(l_returnflag, l_linestatus)
       ORDER BY returnflag, linestatus"""

  // ---- B10b cube / grouping sets -------------------------------------------

  def q43Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n_rows"))
      .orderBy("returnflag", "linestatus")

  val q43Oracle: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
       FROM lineitem
       GROUP BY CUBE(l_returnflag, l_linestatus)
       ORDER BY returnflag, linestatus"""

  // ---- B11 ranking window functions ---------------------------------------

  def q11WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"), col("rnk"), col("drnk"))
      .orderBy("o_custkey", "rn")
  }

  val q11Oracle: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS drnk
         FROM orders) WHERE rn <= 3
       ORDER BY o_custkey, rn"""

  // ---- B12 analytic window + frame ----------------------------------------

  def q12WindowFrame(s: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val frame = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(frame).cast("double").as("running_spend"),
        lag(col("o_totalprice"), 1).over(order).as("prev_price"),
        lead(col("o_totalprice"), 1).over(order).as("next_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q12Oracle: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
       LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
       FROM orders
       ORDER BY o_custkey, o_orderkey"""

  // ---- B13 global sort + limit (top-k) ------------------------------------

  /** Catalyst plans orderBy+limit as TakeOrderedAndProject: per-partition
    * top-k then a k-row driver merge — no global sort at any scale. */
  def q13TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .limit(100)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))

  val q13Oracle: String =
    """SELECT p_partkey, p_name, p_retailprice FROM part
       ORDER BY p_retailprice DESC, p_partkey LIMIT 100"""

  // ---- B14 set operators ---------------------------------------------------

  def q14SetOps(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val segA = cust.where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val segB = cust.where(col("c_acctbal") > 5000.0).select("c_custkey")
    val u = segA.union(segB).distinct().select(col("c_custkey"), lit("union").as("op"))
    val i = segA.intersect(segB).select(col("c_custkey"), lit("intersect").as("op"))
    val e = segA.except(segB).select(col("c_custkey"), lit("except").as("op"))
    u.unionByName(i).unionByName(e).orderBy("op", "c_custkey")
  }

  val q14Oracle: String =
    """WITH sega AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
            segb AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
       SELECT c_custkey, 'union' AS op FROM (SELECT * FROM sega UNION SELECT * FROM segb)
       UNION ALL
       SELECT c_custkey, 'intersect' AS op FROM (SELECT * FROM sega INTERSECT SELECT * FROM segb)
       UNION ALL
       SELECT c_custkey, 'except' AS op FROM (SELECT * FROM sega EXCEPT SELECT * FROM segb)
       ORDER BY op, c_custkey"""

  // ---- B15 string functions ------------------------------------------------

  def q15StringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"),
        substring(col("p_name"), 1, 5).as("sub5"),
        upper(col("p_name")).as("uname"),
        lower(col("p_type")).as("ltype"),
        lpad(col("p_brand"), 12, "*").as("padded_brand"),
        concat_ws("|", col("p_type"), col("p_name")).as("joined"),
        col("p_name").like("%red%").as("is_red"),
        col("p_name").rlike("bolt|ring").as("has_shape"),
        regexp_replace(col("p_name"), " ", "_").as("underscored"),
        length(col("p_name")).as("name_len"),
        trim(lit("  pad  ")).as("trimmed"))
      .orderBy("p_partkey")

  val q15Oracle: String =
    """SELECT p_partkey,
       substr(p_name, 1, 5) AS sub5,
       upper(p_name) AS uname,
       lower(p_type) AS ltype,
       lpad(p_brand, 12, '*') AS padded_brand,
       concat_ws('|', p_type, p_name) AS joined,
       (p_name LIKE '%red%') AS is_red,
       regexp_matches(p_name, 'bolt|ring') AS has_shape,
       replace(p_name, ' ', '_') AS underscored,
       length(p_name) AS name_len,
       trim('  pad  ') AS trimmed
       FROM part ORDER BY p_partkey"""

  // ---- B16 date functions ---------------------------------------------------

  def q16DateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        weekday(col("o_orderdate")).as("wd"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_y2k"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
        last_day(col("o_orderdate").cast("date")).as("month_end"))
      .orderBy("o_orderkey")

  val q16Oracle: String =
    """SELECT o_orderkey,
       year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
       (isodow(o_orderdate) - 1) AS wd,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
       last_day(CAST(o_orderdate AS DATE)) AS month_end
       FROM orders ORDER BY o_orderkey"""

  // ---- B17 math functions ----------------------------------------------------

  def q17MathFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.Stable.r4(log(col("l_extendedprice"))).as("ln_price"),
        graft.Stable.r4(exp(col("l_discount"))).as("exp_disc"),
        graft.Stable.r4(sqrt(col("l_quantity"))).as("sqrt_qty"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        graft.Stable.r4(abs(col("l_discount") - 0.05)).as("abs_disc_delta"),
        ceil(col("l_extendedprice") / 1000.0).as("price_k_ceil"),
        floor(col("l_extendedprice") / 1000.0).as("price_k_floor"),
        // round(-2) is exempt from the Stable.r4 rule: its ties require the
        // 2-decimal price to be ≡ 50.00 mod 100 EXACTLY, i.e. an integer —
        // binary-exact, so both engines see the same tie and round half-up
        round(col("l_extendedprice"), -2).as("price_h"))
      .orderBy("l_orderkey", "l_linenumber")

  val q17Oracle: String =
    """SELECT l_orderkey, l_linenumber,
       floor((ln(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS ln_price,
       floor((exp(l_discount)) * 10000.0 + 0.5) / 10000.0 AS exp_disc,
       floor((sqrt(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS sqrt_qty,
       pow(l_quantity, 2) AS qty_sq,
       floor((abs(l_discount - 0.05)) * 10000.0 + 0.5) / 10000.0 AS abs_disc_delta,
       CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
       CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k_floor,
       round(l_extendedprice, -2) AS price_h
       FROM lineitem ORDER BY l_orderkey, l_linenumber"""

  // ---- B18 array / map higher-order functions --------------------------------

  def q18ArrayFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .withColumn("toks", split(col("p_name"), " "))
      .select(col("p_partkey"),
        size(col("toks")).as("n_toks"),
        element_at(col("toks"), 1).as("first_tok"),
        array_contains(col("toks"), "bolt").as("has_bolt"),
        array_join(transform(col("toks"), x => upper(x)), "+").as("upper_joined"),
        size(filter(col("toks"), x => length(x) > 4)).as("n_long_toks"),
        aggregate(col("toks"), lit(0), (acc, x) => acc + length(x)).as("total_chars"),
        array_join(sort_array(col("toks")), ",").as("sorted_toks"),
        // dedupe keys first: map_from_arrays throws DUPLICATED_MAP_KEY
        // under the default EXCEPTION policy on a repeated token
        size(map_from_arrays(array_distinct(col("toks")),
          transform(array_distinct(col("toks")), x => length(x)))).as("n_map_keys"))
      .orderBy("p_partkey")

  val q18Oracle: String =
    """SELECT p_partkey,
       len(string_split(p_name, ' ')) AS n_toks,
       string_split(p_name, ' ')[1] AS first_tok,
       list_contains(string_split(p_name, ' '), 'bolt') AS has_bolt,
       array_to_string(list_transform(string_split(p_name, ' '), x -> upper(x)), '+') AS upper_joined,
       len(list_filter(string_split(p_name, ' '), x -> length(x) > 4)) AS n_long_toks,
       CAST(length(replace(p_name, ' ', '')) AS INT) AS total_chars,
       array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_toks,
       len(list_distinct(string_split(p_name, ' '))) AS n_map_keys
       FROM part ORDER BY p_partkey"""

  // ---- B19 JSON functions -----------------------------------------------------

  def q19JsonFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_path"),
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType)).getItem("k").as("k_map"))
      .orderBy("event_id")

  val q19Oracle: String =
    """SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_map
       FROM events ORDER BY event_id"""

  // ---- B19b semi-structured VARIANT (Spark 4) ---------------------------------

  /** The Spark 4 semi-structured path: `parse_json` into a VARIANT,
    * typed extraction with `variant_get`, and a parse→serialize
    * round-trip. VARIANT is the engine-native form for schema-on-read
    * JSON at scale (binary-encoded, shredded-ready) — the modern
    * replacement for string-typed `get_json_object` chains (q19).
    * The oracle extracts the same paths with DuckDB's JSON functions;
    * the round-trip re-serialization is normalized identically by both
    * engines for this single-key integer payload. */
  def q77VariantJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k_int"),
        expr("variant_get(parse_json(props), '$.k', 'string')").as("k_str"),
        expr("variant_get(parse_json(props), '$.missing', 'int')").as("k_missing"),
        expr("to_json(parse_json(props))").as("roundtrip"))
      .orderBy("event_id")

  val q77Oracle: String =
    """SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       json_extract_string(props, '$.k') AS k_str,
       CAST(NULL AS INT) AS k_missing,
       '{"k":' || json_extract_string(props, '$.k') || '}' AS roundtrip
       FROM events ORDER BY event_id"""

  // ---- B20 generators: explode / posexplode -----------------------------------

  def q20ExplodeTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .where(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .orderBy("doc_id", "pos")

  val q20Oracle: String =
    """SELECT doc_id,
       unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
       unnest(string_split(text, ' ')) AS tok
       FROM documents WHERE doc_id < 50
       ORDER BY doc_id, pos"""

  // ---- B26 sessionization (batch; gap = 30 min) -------------------------------

  /** Gap-based sessions via lag + running sum — one shuffle on user_id,
    * then two partition-local aggregations. The streaming twin is
    * `session_window` (graft.streaming.Events). */
  def q26Sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = 30L * 60 * 1000000
    val sessions = t(s, dir, "events")
      .withColumn("prev_us", lag(us(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || us(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_ev"), (max(us(col("ts"))) - min(us(col("ts")))).as("dur_us"))
    sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        // integer floor division (`div`), never double `/`: the µs sum
        // exceeds 2^53 at scale and double rounding could shift the floor
        expr("sum(dur_us) div 1000000").as("total_dur_s"),
        max(col("n_ev")).as("max_session_events"))
      .orderBy("user_id")
  }

  val q26Oracle: String =
    """WITH flagged AS (
         SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
           LAG(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         FROM events),
       sessed AS (
         SELECT user_id, ts_us,
           SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
         FROM flagged),
       sessions AS (
         SELECT user_id, sess_id, COUNT(*) AS n_ev, MAX(ts_us) - MIN(ts_us) AS dur_us
         FROM sessed GROUP BY user_id, sess_id)
       SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_ev) AS BIGINT) AS n_events,
         CAST(SUM(dur_us) // 1000000 AS BIGINT) AS total_dur_s, MAX(n_ev) AS max_session_events
       FROM sessions GROUP BY user_id ORDER BY user_id"""

  // ---- B27 tumbling time buckets (batch) ---------------------------------------

  def q27TumblingWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(unix_seconds(date_trunc("hour", col("ts"))).as("bucket_s"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        davg(col("value")).as("avg_value"))
      .orderBy("bucket_s", "event_type")

  val q27Oracle: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_s, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
       floor((CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS avg_value
       FROM events GROUP BY bucket_s, event_type ORDER BY bucket_s, event_type"""

  // ---- registry ---------------------------------------------------------------

  /** name -> query fn, for SparkEntry.queries. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_project" -> (q01ScanFilterProject _),
    "q02_pricing_summary" -> (q02PricingSummary _),
    "q03_join_5way" -> (q03Join5Way _),
    "q04_semi_anti" -> (q04SemiAnti _),
    "q05_outer_join_agg" -> (q05OuterJoinAgg _),
    "q06_range_join" -> (q06RangeJoin _),
    "q07_asof_latest_order" -> (q07AsofLatestOrder _),
    "q08_distinct_agg" -> (q08DistinctAgg _),
    "q09_approx_distinct" -> (q09ApproxDistinct _),
    "q10_rollup" -> (q10Rollup _),
    "q11_window_rank" -> (q11WindowRank _),
    "q12_window_frame" -> (q12WindowFrame _),
    "q13_topk" -> (q13TopK _),
    "q14_set_ops" -> (q14SetOps _),
    "q15_string_funcs" -> (q15StringFuncs _),
    "q16_date_funcs" -> (q16DateFuncs _),
    "q17_math_funcs" -> (q17MathFuncs _),
    "q18_array_funcs" -> (q18ArrayFuncs _),
    "q19_json_funcs" -> (q19JsonFuncs _),
    "q77_variant_json" -> (q77VariantJson _),
    "q20_explode_tokens" -> (q20ExplodeTokens _),
    "q26_sessionize" -> (q26Sessionize _),
    "q27_tumbling_window" -> (q27TumblingWindow _),
    "q43_cube" -> (q43Cube _),
  )

  /** name -> DuckDB oracle SQL, for SparkEntry.oracleSql (q09 is declared
    * no-oracle: HLL estimates are engine-specific). */
  val oracles: Map[String, String] = Map(
    "q01_scan_filter_project" -> q01Oracle,
    "q02_pricing_summary" -> q02Oracle,
    "q03_join_5way" -> q03Oracle,
    "q04_semi_anti" -> q04Oracle,
    "q05_outer_join_agg" -> q05Oracle,
    "q06_range_join" -> q06Oracle,
    "q07_asof_latest_order" -> q07Oracle,
    "q08_distinct_agg" -> q08Oracle,
    // HLL register merge is commutative, so the sketch output is exactly
    // reproducible — fixture-pinned at the gate SF (DataQueries scaladoc)
    "q09_approx_distinct" -> DataQueries.fixtureOracle("q09_approx_distinct"),
    "q10_rollup" -> q10Oracle,
    "q11_window_rank" -> q11Oracle,
    "q12_window_frame" -> q12Oracle,
    "q13_topk" -> q13Oracle,
    "q14_set_ops" -> q14Oracle,
    "q15_string_funcs" -> q15Oracle,
    "q16_date_funcs" -> q16Oracle,
    "q17_math_funcs" -> q17Oracle,
    "q18_array_funcs" -> q18Oracle,
    "q19_json_funcs" -> q19Oracle,
    "q77_variant_json" -> q77Oracle,
    "q20_explode_tokens" -> q20Oracle,
    "q26_sessionize" -> q26Oracle,
    "q27_tumbling_window" -> q27Oracle,
    "q43_cube" -> q43Oracle,
  )
}
