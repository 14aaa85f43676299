package graft.rel

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Storage-layout scale features: bucketed co-located joins (shuffle
  * elimination) and partition-pruned reads — the two layout levers a
  * 100-TB deployment uses so repeated fact-fact joins and selective scans
  * don't pay full-shuffle/full-scan cost. Asserted on the executed plans,
  * not just results. */
class ScaleStorageSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("bucketed tables join without a shuffle exchange") {
    // managed tables land in ./spark-warehouse (gitignored); dropped below
    val li = Tables.load(spark, SparkTestBase.Sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, SparkTestBase.Sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("q"), max(col("o_totalprice")).as("p"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located buckets: the join itself requires no shuffle of either side
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 0, s"expected shuffle-free bucketed join, got:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE ord_bucketed")
  }

  test("round-trip queries write to session-scoped scratch dirs (no cross-run races)") {
    // two concurrent runs on one machine must not race overwrite-vs-read:
    // the scratch path embeds the Spark applicationId
    ExtraQueries.q65CsvRoundtrip(spark, SparkTestBase.Sf0001).count()
    val appId = spark.sparkContext.applicationId
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val mine = tmp.listFiles().map(_.getName)
      .filter(n => n.startsWith("graft_csv_roundtrip_") && n.contains(appId))
    assert(mine.nonEmpty, s"expected a graft_csv_roundtrip_*$appId* dir in $tmp")
  }

  test("q92 writes genuinely gzip-compressed JSONL part files") {
    ExtraQueries.q92GzipJsonl(spark, SparkTestBase.Sf0001).count()
    val appId = spark.sparkContext.applicationId
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val outDir = tmp.listFiles()
      .find(f => f.getName.startsWith("graft_gz_jsonl_") && f.getName.contains(appId))
      .getOrElse(fail("no gzip JSONL output dir"))
    val parts = outDir.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".json.gz")),
      s"expected .json.gz parts, got ${parts.map(_.getName).toSeq}")
    // gzip magic: the compression option must actually compress
    val in = new java.io.FileInputStream(parts.head)
    val magic = try { val b = new Array[Byte](2); in.read(b); b } finally in.close()
    assert((magic(0) & 0xFF) == 0x1F && (magic(1) & 0xFF) == 0x8B, "missing gzip magic")
  }

  test("partitioned layout prunes non-matching partitions at scan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    Tables.load(spark, SparkTestBase.Sf0001, "events")
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val read = spark.read.parquet(dir).where(col("event_type") === "click")
    val plan = read.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    // only the click partition's rows are read
    val expected = Tables.load(spark, SparkTestBase.Sf0001, "events")
      .where(col("event_type") === "click").count()
    assert(read.count() == expected)
  }

  test("q160: the mergeSchema read unions generations and NULL-fills the " +
       "evolved column exactly on pre-evolution rows") {
    val dir = SparkTestBase.Sf0001
    val orders = Tables.load(spark, dir, "orders").collect()
      .map(r => (r.getLong(0), r.getString(5)))
    // run the declared query once so the generations exist on disk
    val out = ExtraQueries.q160SchemaEvolution(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = orders.groupBy(_._2).toSeq.map { case (prio, rows) =>
      val evolved = rows.filter(_._1 % 2 == 1)
      (prio, rows.length.toLong, evolved.length.toLong,
        evolved.map(_._1 % 5).sum)
    }.sortBy(_._1)
    assert(out.toSeq == expected)
    // and the merged scan itself: schema carries the evolved column,
    // nullable, with nulls exactly on the generation-1 (even-key) rows
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_schema_evo_"))
      .maxBy(_.lastModified).toString
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(tmp + "/gen1", tmp + "/gen2")
    assert(merged.schema.fieldNames.contains("o_rank"))
    assert(merged.where(col("o_rank").isNull).collect()
      .forall(_.getLong(0) % 2 == 0))
  }
}
