package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table access for the driver test tables (TESTDATA.md).
  *
  * The driver's generator writes TIMESTAMP(NANOS) parquet, which Spark's
  * vectorized reader rejects by default; we read nanos as longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and floor-convert to
  * microsecond timestamps with integer division (never double division —
  * epoch-nanos exceed 2^52 and would lose precision). DuckDB reads the
  * same files natively at nanosecond precision, so oracle-checked queries
  * must only emit values at granularities where floor(ns) == floor(us)
  * agree (dates, hour buckets, epoch millis) — see Queries.
  */
object Tables {

  private val nsCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    var df = spark.read.parquet(s"$dir/$name.parquet")
    for (c <- nsCols.getOrElse(name, Nil) if df.schema(c).dataType == LongType)
      df = df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
    df
  }
}
