package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table access for the driver test tables (TESTDATA.md).
  *
  * The driver's generator has written its timestamp columns two ways
  * across rounds, and this loader normalizes BOTH to the same session-UTC
  * `TIMESTAMP` so every downstream consumer (DataFrame queries and the
  * `spark.sql` twins alike) sees one stable type:
  *
  *   - TIMESTAMP(NANOS) parquet, which Spark's vectorized reader rejects
  *     by default: read nanos as longs
  *     (`spark.sql.legacy.parquet.nanosAsLong`) and floor-convert to
  *     microsecond timestamps with integer division (never double
  *     division — epoch-nanos exceed 2^52 and would lose precision);
  *   - timestamp[us] with isAdjustedToUTC=false (the round-9
  *     regeneration), which Spark reads as TIMESTAMP_NTZ: cast to
  *     TIMESTAMP — an identity on the stored micros under the UTC
  *     session timezone this engine pins, and required by the
  *     `unix_micros`/`unix_seconds` family the SQL twins use (those
  *     reject NTZ inputs).
  *
  * DuckDB reads the same files natively, so oracle-checked queries must
  * only emit values at granularities where both engines agree (dates,
  * hour buckets, epoch millis) — see Queries.
  */
object Tables {

  private val nsCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    var df = spark.read.parquet(s"$dir/$name.parquet")
    for (c <- nsCols.getOrElse(name, Nil)) df.schema(c).dataType match {
      case LongType =>
        df = df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df = df.withColumn(c, col(c).cast("timestamp"))
      case _ => ()
    }
    df
  }

  /** Spread an unsplittably-narrow source before CPU-heavy per-row
    * expansion (shingling, tokenization, media decode). Parquet splits at
    * ROW-GROUP granularity, and the driver test tables are
    * single-row-group files — so without this, a scan feeds its whole
    * corpus to ONE task and the expansion runs serial no matter how many
    * cores the cluster has. When the source already yields at least
    * `parts` splits (any production-scale table), this is a NO-OP — no
    * exchange enters the plan; the explicit-width round-robin repartition
    * (whose shuffle is, by construction, sized by the undersized input)
    * is paid only in the pathological few-split case: tiny files, gzip
    * JSONL, a single `repartition(1)`'d upstream.
    *
    * TWO CONTRACT LIMITS. (1) Apply ONLY directly above a source scan
    * (narrow plan): for a plan containing an exchange, `df.rdd` under
    * AQE materializes every upstream shuffle stage just to read the
    * partition count, and the repartitioned result is a new
    * QueryExecution that cannot reuse them — the upstream pipeline would
    * run twice. On a scan-only plan the partition count is pure split
    * planning; no job runs. (2) The guard keys on SPLIT count, not row
    * distribution: a multi-GB file with ONE row group plans into many
    * byte-range splits (≥ target, so this no-ops) yet decodes every row
    * in the single task owning the row-group start — that case needs
    * footer inspection (row-group count), which this helper deliberately
    * does not do.
    *
    * USE SPARINGLY, AND ONLY WITH A MEASUREMENT. A round-11 suite-wide
    * A/B applied this before every CPU-heavy map in the engine (dedup
    * shingling, ANN encode scans, k-means/MMR pools, token explodes) and
    * REGRESSED the sf0.1 suite 71.9 → 90.3 s at width 32 (canary-equal
    * boxes) and still lost at width 8 on 10 of 12 targeted queries: at
    * driver test scale the serial phase is sub-second, while the added
    * exchange plus an extra stage's scheduling (55–65 % of a local job's
    * wall is driver-side gap — see bench_attrib_r11.json) costs more
    * than the parallelism recovers. The one measured keeper is q130's
    * 8-gram explode (1.99 → 1.69 s at width 8, the suite's heaviest
    * one-task stage). The genuine target is a production anti-pattern
    * this testbed only simulates: a multi-GB gzip member (or any truly
    * few-SPLIT source — see contract limit 2 above for why a mega row
    * group is NOT detected), where the serial phase is minutes, not
    * milliseconds. */
  def spread(df: DataFrame, parts: Int = 0): DataFrame = {
    val target =
      if (parts > 0) parts else df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
