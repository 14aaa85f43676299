package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Shared TTL-arm harness for ProcessingTime-mode `transformWithState`
  * specs (StreamingStateSizeSpec, NearDupStreamSpec): feeds batches as
  * successive short-lived query INCARNATIONS over a JSON file source →
  * parquet sink on one checkpoint, sleeping between incarnations so
  * wall-clock TTL horizons pass.
  *
  * Why incarnations and polling: a ProcessingTime-mode
  * transformWithState query schedules micro-batches continuously to
  * advance its clock, so BOTH `Trigger.AvailableNow` termination and
  * `processAllAvailable()`'s no-new-data signal never fire (observed:
  * >1000 empty batches). The robust completion signal is the PROGRESS
  * log — poll `recentProgress` until the incarnation's appended rows
  * show as committed input, then stop. The 250 ms trigger throttles the
  * clock spin while polling. TTL expiry is wall-clock, so it fires
  * across incarnations just as it would across triggers of one
  * long-running query. */
object TtlIncarnations {

  /** Run each batch as one incarnation of `pipeline`, sleeping
    * `waitBetweenMs` before every incarnation after the first; returns
    * the parquet sink path (absent/schema-less if no row was ever
    * emitted — callers handle the empty-sink read). */
  def feed[T <: Product](spark: SparkSession, batches: Seq[Seq[T]],
                         waitBetweenMs: Long,
                         pipeline: Dataset[T] => Dataset[_])
                        (implicit enc: Encoder[T]): String = {
    val src = java.nio.file.Files.createTempDirectory("graft-ttl-src").toString
    val out = java.nio.file.Files.createTempDirectory("graft-ttl-out").toString + "/data"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ttl-ckpt").toString
    def incarnation(batch: Seq[T]): Unit = {
      spark.createDataset(batch)(enc).toDF().coalesce(1)
        .write.mode("append").json(src)
      val q = pipeline(spark.readStream.schema(enc.schema).json(src).as[T](enc))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(250))
        .start()
      val deadline = System.currentTimeMillis + 60000
      def seen: Long = q.recentProgress.map(_.numInputRows).sum
      while (seen < batch.length && System.currentTimeMillis < deadline)
        Thread.sleep(100)
      val ok = seen >= batch.length
      q.stop()
      assert(ok, s"incarnation did not commit its ${batch.length} rows in 60 s")
    }
    batches.zipWithIndex.foreach { case (b, i) =>
      if (i > 0) Thread.sleep(waitBetweenMs)
      incarnation(b)
    }
    out
  }
}
