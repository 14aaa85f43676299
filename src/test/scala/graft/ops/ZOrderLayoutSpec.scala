package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkTestBase
import graft.rel.Tables

/** Production Z-order write path (`ZOrderLayout`) vs the declared q101
  * NTILE form: same cluster property, no global-sort window. Asserted on
  * PHYSICAL parquet footer statistics, not recomputed data — the footer is
  * what a scan planner prunes on, so this is the end-to-end claim. */
class ZOrderLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val NFiles = 16

  /** Same projection as q101 (events → bounded x/y buckets). */
  private def base = Tables.load(spark, SparkTestBase.Sf0001, "events")
    .select(col("event_id"),
      (col("user_id") % 256).cast("long").as("x"),
      least(lit(255L), floor(col("value") / 2.2).cast("long")).as("y"))

  private lazy val outDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString + "/events_z"
    ZOrderLayout.zorderWrite(base, "x", "y", bits = 8, nFiles = NFiles, outDir = dir)
    dir
  }
  private lazy val bounds = ZOrderLayout.footerBounds(spark, outDir, "x", "y")

  test("range-partitioned write lands nFiles files with disjoint z ranges, no row lost") {
    assert(bounds.size == NFiles, s"expected $NFiles files, got ${bounds.size}")
    assert(bounds.map(_.rows).sum == base.count())
    // repartitionByRange keeps equal keys together → file z ranges are
    // strictly disjoint once sorted; this IS the clustering property
    val sorted = bounds.sortBy(_.minZ)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a.maxZ < b.minZ,
        s"overlapping z ranges: ${a.file} [${a.minZ},${a.maxZ}] vs ${b.file} [${b.minZ},${b.maxZ}]")
      case _ =>
    }
  }

  test("footer min/max agree with the data (the stats a pruner would trust)") {
    val byFile = spark.read.parquet(outDir)
      .withColumn("f", element_at(split(input_file_name(), "/"), -1))
      .groupBy("f")
      .agg(min("x").as("mnx"), max("x").as("mxx"),
           min("y").as("mny"), max("y").as("mxy"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    bounds.foreach { b =>
      val (mnx, mxx, mny, mxy) = byFile(b.file)
      assert((b.minX, b.maxX, b.minY, b.maxY) == (mnx, mxx, mny, mxy),
        s"footer stats disagree with data for ${b.file}")
    }
  }

  test("production range-sampled split prunes like the declared NTILE split") {
    // declared twin: exact global-sort NTILE file assignment (q101 shape)
    val declared = base
      .withColumn("z", ZOrderLayout.mortonZ(col("x"), col("y"), 8))
      .withColumn("file_id", ntile(NFiles).over(Window.orderBy(col("z"), col("event_id"))))
      .groupBy("file_id")
      .agg(min("x").as("minX"), max("x").as("maxX"),
           min("y").as("minY"), max("y").as("maxY"))
      .collect().map(r => ZOrderLayout.FileBounds("", 0,
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), 0, 0)).toSeq
    // probe grid: quarter-range boxes in both dims — the two-sided
    // predicates z-ordering exists to serve
    val probes = for (xi <- 0 until 4; yi <- 0 until 4)
      yield (xi * 64L, xi * 64L + 63L, yi * 64L, yi * 64L + 63L)
    val (prodHits, declHits) = probes.map { case (a, b, c, d) =>
      (ZOrderLayout.filesHit(bounds, a, b, c, d),
       ZOrderLayout.filesHit(declared, a, b, c, d))
    }.unzip
    // sampled range boundaries ≈ exact quantile boundaries: each probe
    // may differ by a file or two, the aggregate pruning power must match
    probes.indices.foreach { i =>
      assert(prodHits(i) <= declHits(i) + 2,
        s"probe ${probes(i)}: production hits ${prodHits(i)} vs declared ${declHits(i)}")
    }
    assert(prodHits.sum <= declHits.sum * 12 / 10,
      s"aggregate pruning regressed: production ${prodHits.sum} vs declared ${declHits.sum}")
  }

  test("z-order beats a linear single-key sort on the trailing dimension") {
    // linear layout: range-cluster by x only — the classic ORDER BY layout
    val linDir = java.nio.file.Files.createTempDirectory("graft-linear").toString + "/events_lin"
    base.repartitionByRange(NFiles, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)
    // y is unclustered in the linear layout → stats are useless for y-only
    // probes; reuse footerBounds with y in both slots (z column absent)
    val linBounds = {
      import scala.jdk.CollectionConverters._
      val conf = spark.sparkContext.hadoopConfiguration
      new java.io.File(linDir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
          try {
            val blocks = reader.getFooter.getBlocks.asScala.toSeq
            def st(name: String) = blocks.map(_.getColumns.asScala
              .find(_.getPath.toDotString == name).get.getStatistics
              .asInstanceOf[org.apache.parquet.column.statistics.LongStatistics])
            ZOrderLayout.FileBounds(f.getName, blocks.map(_.getRowCount).sum,
              st("x").map(_.getMin).min, st("x").map(_.getMax).max,
              st("y").map(_.getMin).min, st("y").map(_.getMax).max, 0, 0)
          } finally reader.close()
        }
    }
    // y-band probes over the full x range: linear layout cannot skip
    val yProbes = Seq((0L, 255L, 0L, 31L), (0L, 255L, 96L, 127L), (0L, 255L, 224L, 255L))
    val zHits = yProbes.map { case (a, b, c, d) => ZOrderLayout.filesHit(bounds, a, b, c, d) }
    val linHits = yProbes.map { case (a, b, c, d) => ZOrderLayout.filesHit(linBounds, a, b, c, d) }
    assert(zHits.sum < linHits.sum,
      s"z-order should skip y-band files the linear layout cannot: z=$zHits linear=$linHits")
  }
}
