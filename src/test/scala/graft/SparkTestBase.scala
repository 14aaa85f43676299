package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for specs (one JVM-wide session; Spark
  * sessions are expensive and getOrCreate dedupes across suites). */
object SparkTestBase {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Smallest driver test-table dir (TESTDATA.md). */
  val Sf0001 = "/root/testdata/sf0.001"

  /** Committed reference-shaped fixture (FIXTURES.md §B2). */
  val FixtureJsonl = "src/test/resources/rag_results.jsonl"
}
