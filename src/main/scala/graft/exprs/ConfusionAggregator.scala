package graft.exprs

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** B30: the typed-UDAF tier of the extension surface — the reference's
  * `count_fold` (`our_method.py:33-41`) as an `Aggregator`: one pass,
  * map-side partial merge (the buffer is 4 longs, so the shuffle carries
  * one tiny row per partition regardless of input size).
  *
  * [[graft.pipeline.Stages.confusion]] keeps the conditional-sum form for
  * declared queries (plain aggregates optimize/oracle-check better); this
  * is the typed API for `Dataset[(label, pred)]` users and the documented
  * UDAF example.
  */
object ConfusionAggregator {

  final case class Counts(AK: Long, AD: Long, UK: Long, UD: Long) {
    def +(that: Counts): Counts =
      Counts(AK + that.AK, AD + that.AD, UK + that.UK, UD + that.UD)
  }

  val instance: Aggregator[(String, String), Counts, Counts] =
    new Aggregator[(String, String), Counts, Counts] {
      override def zero: Counts = Counts(0, 0, 0, 0)
      override def reduce(b: Counts, a: (String, String)): Counts = a match {
        case ("keep", "keep")       => b.copy(AK = b.AK + 1)
        case ("keep", "discard")    => b.copy(AD = b.AD + 1)
        case ("discard", "keep")    => b.copy(UK = b.UK + 1)
        case ("discard", "discard") => b.copy(UD = b.UD + 1)
        case _                      => b // the reference counts nothing else
      }
      override def merge(b1: Counts, b2: Counts): Counts = b1 + b2
      override def finish(reduction: Counts): Counts = reduction
      override def bufferEncoder: Encoder[Counts] = Encoders.product[Counts]
      override def outputEncoder: Encoder[Counts] = Encoders.product[Counts]
    }
}
