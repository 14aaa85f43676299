package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for specs (one JVM-wide session; Spark
  * sessions are expensive and getOrCreate dedupes across suites). */
object SparkTestBase {
  // hermetic per-JVM ModelStore: spec fits (many with unique nanoTime
  // corpus keys) land in a temp dir deleted on exit, not in the
  // world-shared default store
  locally {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-modelstore-test").toFile
    graft.ops.ModelStore.overrideDir = Some(tmp.getAbsolutePath)
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(tmp)
    }
  }

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
