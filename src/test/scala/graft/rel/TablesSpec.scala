package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.SparkTestBase

/** The driver's generator has shipped timestamps two ways across rounds
  * (TIMESTAMP(NANOS), which Spark surfaces as LongType under
  * `nanosAsLong`, and timestamp[us] isAdjustedToUTC=false, which it
  * surfaces as TIMESTAMP_NTZ). `Tables.load` normalizes BOTH to
  * session-UTC TIMESTAMP; this pins each branch with a written parquet
  * file so a regeneration in either historical format cannot silently
  * break the 8 event-table queries again (the round-9 incident). */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def tempDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("tables_enc").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("nanos-as-long encoding: ts floors to microsecond TIMESTAMP") {
    val dir = tempDir()
    val ns = 1700000000123456789L // 2023-11-14T22:13:20.123456789Z
    spark.range(1)
      .select(lit(ns).as("ts"), lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    // integer-division floor, never double rounding
    assert(df.select(unix_micros(col("ts"))).head.getLong(0) == ns / 1000)
  }

  test("timestamp[us] NTZ encoding: cast is micros-identity under the UTC session") {
    val dir = tempDir()
    spark.range(1)
      .select(expr("make_timestamp_ntz(2026, 2, 3, 4, 5, 6.789012)").as("ts"),
        lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // written file really is NTZ-typed before the loader touches it
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      == org.apache.spark.sql.types.TimestampNTZType)
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    // the same wall-clock instant read as UTC: unix_micros must agree
    // with the literal's UTC epoch micros
    val expected = java.time.LocalDateTime
      .of(2026, 2, 3, 4, 5, 6, 789012000)
      .toInstant(java.time.ZoneOffset.UTC)
    val got = df.select(unix_micros(col("ts"))).head.getLong(0)
    assert(got == expected.getEpochSecond * 1000000L + expected.getNano / 1000L)
  }

  test("non-timestamp tables and already-TIMESTAMP columns pass through untouched") {
    val dir = tempDir()
    spark.range(3).select(col("id").as("doc_id"), lit("x").as("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Tables.load(spark, dir, "documents")
    assert(df.count() == 3 && df.columns.toSeq == Seq("doc_id", "text"))
  }

  test("spread: widens a narrow source, no-ops an already-wide one, " +
    "preserves the row multiset") {
    val narrow = spark.range(100).toDF("id").coalesce(1)
    assert(narrow.rdd.getNumPartitions == 1)
    val wide = Tables.spread(narrow, 8)
    assert(wide.rdd.getNumPartitions == 8)
    assert(wide.select(sum(col("id"))).head.getLong(0) == 4950L
      && wide.count() == 100)
    // already at/above target: the SAME plan comes back - no exchange
    val already = spark.range(100).repartition(16).toDF("id")
    assert(Tables.spread(already, 8) eq already)
    // parts = 0 targets defaultParallelism
    val auto = Tables.spread(narrow)
    assert(auto.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }
}
