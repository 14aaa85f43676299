package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) write-time layout clustering — the production twin of
  * the declared q101 form (`rel/CurationQueries.q101ZorderLayout`).
  *
  * q101's declared shape assigns files with `ntile` over a GLOBAL z sort so
  * the file split is a closed form both engines reproduce exactly — correct
  * for the oracle, but a single-partition window is a scale killer: at
  * 100 TB one task would sort the corpus. The production write here is
  * `repartitionByRange(nFiles, $"z")` + `sortWithinPartitions` + parquet:
  * range boundaries come from a distributed reservoir sample (Spark's
  * RangePartitioner), every partition sorts locally, and the cluster
  * property that matters — each FILE covers a narrow z range, hence a
  * narrow range of BOTH interleaved dimensions — lands in the parquet
  * footer min/max statistics where any engine's scan pruning (Spark
  * row-group skipping, Delta/Iceberg file skipping) picks it up.
  *
  * Reference scope: the reference has no storage layer at all (JSONL
  * append, `utils.py:361-365`); this operator is part of the declared
  * training-data-pipeline surface (SURVEY §2 Part B, q101 row).
  */
object ZOrderLayout {

  /** Morton-interleave two bounded long columns (`bits` low bits each) —
    * x in even positions, y in odd. Same closed form as the q101 oracle's
    * `>>`/`&` arithmetic, shared by the declared and production paths. */
  def mortonZ(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Production write: z-cluster `df` into ~`nFiles` parquet files under
    * `outDir`. No global sort, no window — one range shuffle, local sorts.
    * Returns the written z column name for the caller's read path. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, bits: Int,
                  nFiles: Int, outDir: String): Unit = {
    val zed = df.withColumn("z", mortonZ(col(xCol), col(yCol), bits))
    zed.repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Per-file column bounds as physically recorded in parquet footers —
    * NOT recomputed from data. This is exactly the metadata a scan
    * planner prunes on, so asserting it proves the layout claim
    * end-to-end: write path → footer stats → prunable file set. */
  final case class FileBounds(file: String, rows: Long,
                              minX: Long, maxX: Long,
                              minY: Long, maxY: Long,
                              minZ: Long, maxZ: Long)

  def footerBounds(spark: SparkSession, dir: String,
                   xCol: String, yCol: String): Seq[FileBounds] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    parts.toSeq.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        def bound(name: String, max: Boolean): Long = blocks.flatMap { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == name).map { c =>
            val st = c.getStatistics
              .asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
            if (max) st.getMax else st.getMin
          }
        }.reduce((a, b) => if (max) math.max(a, b) else math.min(a, b))
        FileBounds(f.getName, blocks.map(_.getRowCount).sum,
          bound(xCol, max = false), bound(xCol, max = true),
          bound(yCol, max = false), bound(yCol, max = true),
          bound("z", max = false), bound("z", max = true))
      } finally reader.close()
    }
  }

  /** Files a range predicate `x BETWEEN xLo AND xHi AND y BETWEEN yLo AND
    * yHi` cannot skip, given footer bounds — the planner's interval-
    * overlap test. Fewer surviving files = better layout for that probe. */
  def filesHit(bounds: Seq[FileBounds],
               xLo: Long, xHi: Long, yLo: Long, yHi: Long): Int =
    bounds.count(b => b.maxX >= xLo && b.minX <= xHi &&
                      b.maxY >= yLo && b.minY <= yHi)
}
