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
}
