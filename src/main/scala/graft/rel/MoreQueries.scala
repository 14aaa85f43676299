package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second relational batch: grouping sets, pivot, exact percentiles,
  * moment statistics, conditional/ordered-string aggregates, union-by-name
  * schema evolution, and correlated subqueries (decorrelated by Catalyst
  * into joins — asserted by the same oracle results). Oracle discipline as
  * in [[Queries]].
  */
object MoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- grouping sets (B10 third form) ---------------------------------------

  def q47GroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("li_gs")
    s.sql(
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
         FROM li_gs
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY returnflag, linestatus""")
  }

  val q47Oracle: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
       ORDER BY returnflag, linestatus"""

  // ---- pivot (conditional-aggregation form) ---------------------------------

  def q48Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double"))
      .orderBy("o_orderpriority")

  val q48Oracle: String =
    """SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- exact percentiles -----------------------------------------------------

  def q49Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(graft.Stable.r4(expr("percentile(l_quantity, 0.5)")).as("median_qty"),
        graft.Stable.r4(expr("percentile(l_quantity, 0.9)")).as("p90_qty"),
        graft.Stable.r4(expr("percentile(l_extendedprice, 0.25)")).as("p25_price"))
      .orderBy("l_returnflag")

  val q49Oracle: String =
    """SELECT l_returnflag,
       floor((quantile_cont(l_quantity, 0.5)) * 10000.0 + 0.5) / 10000.0 AS median_qty,
       floor((quantile_cont(l_quantity, 0.9)) * 10000.0 + 0.5) / 10000.0 AS p90_qty,
       floor((quantile_cont(l_extendedprice, 0.25)) * 10000.0 + 0.5) / 10000.0 AS p25_price
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---- moment statistics -----------------------------------------------------

  def q50Stats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(graft.Stable.r4(stddev_samp(col("l_quantity"))).as("sd_qty"),
        graft.Stable.r4(var_samp(col("l_quantity"))).as("var_qty"),
        graft.Stable.r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qty_price"),
        graft.Stable.r2(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("cov_qty_price"))
      .orderBy("l_returnflag")

  val q50Oracle: String =
    """SELECT l_returnflag,
       floor((stddev_samp(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS sd_qty,
       floor((var_samp(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS var_qty,
       floor((corr(l_quantity, l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS corr_qty_price,
       floor((covar_samp(l_quantity, l_extendedprice)) * 100.0 + 0.5) / 100.0 AS cov_qty_price
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---- conditional aggregates ------------------------------------------------

  def q51ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(expr("count_if(o_totalprice > 200000)").as("n_big"),
        expr("bool_and(o_totalprice > 1000)").as("all_over_1k"),
        expr("bool_or(o_totalprice > 450000)").as("any_over_450k"))
      .orderBy("o_orderpriority")

  val q51Oracle: String =
    """SELECT o_orderpriority,
       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_totalprice > 450000) AS any_over_450k
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---- ordered string aggregation -------------------------------------------

  def q52StringAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy("p_type")
      .agg(array_join(array_sort(collect_set(col("p_brand"))), ",").as("brands"),
        countDistinct(col("p_brand")).as("n_brands"))
      .orderBy("p_type")

  val q52Oracle: String =
    """SELECT p_type, string_agg(b, ',' ORDER BY b) AS brands, COUNT(*) AS n_brands
       FROM (SELECT DISTINCT p_type, p_brand AS b FROM part)
       GROUP BY p_type ORDER BY p_type"""

  // ---- union-by-name schema evolution ----------------------------------------

  def q53UnionByName(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val a = cust.where(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_acctbal"), lit("even").as("src"))
    val b = cust.where(col("c_custkey") % 2 === 1)
      .select(col("c_custkey"), col("c_nationkey"), lit("odd").as("src"))
    a.unionByName(b, allowMissingColumns = true)
      .orderBy("c_custkey")
  }

  val q53Oracle: String =
    """SELECT * FROM (
         SELECT c_custkey, c_acctbal, 'even' AS src FROM customer WHERE c_custkey % 2 = 0
         UNION ALL BY NAME
         SELECT c_custkey, c_nationkey, 'odd' AS src FROM customer WHERE c_custkey % 2 = 1)
       ORDER BY c_custkey"""

  // ---- correlated subqueries (Catalyst decorrelation) ------------------------

  def q54CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer_sq")
    t(s, dir, "orders").createOrReplaceTempView("orders_sq")
    s.sql(
      """SELECT c_custkey,
           (SELECT COUNT(*) FROM orders_sq o WHERE o.o_custkey = c.c_custkey) AS n_orders
         FROM customer_sq c
         WHERE EXISTS (SELECT 1 FROM orders_sq o2
                       WHERE o2.o_custkey = c.c_custkey AND o2.o_totalprice > 400000)
         ORDER BY c_custkey""")
  }

  val q54Oracle: String =
    """SELECT c_custkey,
       (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o2
                     WHERE o2.o_custkey = c.c_custkey AND o2.o_totalprice > 400000)
       ORDER BY c_custkey"""

  // ---- null-safety / conditional scalar battery ------------------------------

  def q56NullSafety(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        expr("try_divide(o_totalprice, o_custkey % 3)").as("safe_div"), // /0 -> null (ANSI-safe)
        nullif(col("o_orderstatus"), lit("O")).as("status_nz"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("none")).as("status_filled"),
        expr("try_cast(o_orderpriority AS INT)").as("prio_num"),
        least(col("o_totalprice"), lit(200000.0)).as("capped"),
        greatest(col("o_totalprice"), lit(200000.0)).as("floored"),
        when(col("o_totalprice") > 300000.0, "big")
          .when(col("o_totalprice") > 100000.0, "mid")
          .otherwise("small").as("bucket"))
      .orderBy("o_orderkey")

  val q56Oracle: String =
    """SELECT o_orderkey,
       o_totalprice / (o_custkey % 3) AS safe_div,
       nullif(o_orderstatus, 'O') AS status_nz,
       coalesce(nullif(o_orderstatus, 'O'), 'none') AS status_filled,
       try_cast(o_orderpriority AS INT) AS prio_num,
       least(o_totalprice, 200000.0) AS capped,
       greatest(o_totalprice, 200000.0) AS floored,
       CASE WHEN o_totalprice > 300000.0 THEN 'big'
            WHEN o_totalprice > 100000.0 THEN 'mid'
            ELSE 'small' END AS bucket
       FROM orders ORDER BY o_orderkey"""

  // ---- registry ---------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_grouping_sets" -> (q47GroupingSets _),
    "q48_pivot" -> (q48Pivot _),
    "q49_percentiles" -> (q49Percentiles _),
    "q50_stats" -> (q50Stats _),
    "q51_conditional_agg" -> (q51ConditionalAgg _),
    "q52_string_agg" -> (q52StringAgg _),
    "q53_union_by_name" -> (q53UnionByName _),
    "q54_correlated_subquery" -> (q54CorrelatedSubquery _),
    "q56_null_safety" -> (q56NullSafety _),
  )

  val oracles: Map[String, String] = Map(
    "q47_grouping_sets" -> q47Oracle,
    "q48_pivot" -> q48Oracle,
    "q49_percentiles" -> q49Oracle,
    "q50_stats" -> q50Oracle,
    "q51_conditional_agg" -> q51Oracle,
    "q52_string_agg" -> q52Oracle,
    "q53_union_by_name" -> q53Oracle,
    "q54_correlated_subquery" -> q54Oracle,
    "q56_null_safety" -> q56Oracle,
  )
}
