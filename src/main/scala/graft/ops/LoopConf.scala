package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-conf scoping for ITERATIVE operator loops (round 17).
  *
  * Driver-loop operators (NN-descent, beam walks, Hash-Min connected
  * components) execute one checkpoint action per round. Under adaptive
  * query execution every shuffle inside that action materializes as its
  * own query-stage JOB, so a 4-round loop with 6 in-round exchanges pays
  * ~25 driver-gap-separated jobs where one per round suffices — the
  * measured reason the whole kNN-graph family sat flat from 8 to 32
  * cores at bench SFs (wall ≈ jobs × per-job driver gap).
  *
  * Disabling AQE inside a loop is only correct when the loop has nothing
  * left for AQE to decide. The callers here qualify because their round
  * bodies make every decision explicitly:
  *   - join strategies are chosen by the operator (broadcast hints on
  *     query-batch- or model-sized sides, size-gated from an
  *     already-counted n where data-dependent);
  *   - exchange widths are pinned (`repartition(N, …)`) or inherited
  *     from the session conf, with N raised analytically when a round's
  *     known candidate mass outgrows the §2.2 partition-size band;
  *   - skew is structurally bounded (degree caps, map-side-combinable
  *     partial aggregates that collapse hot keys before the exchange).
  * Corpus-scale one-off stages (graph symmetrization, clique init, edge
  * materialization) stay OUTSIDE the scope: AQE's runtime sizing and
  * skew handling measurably help there (q177 init: +0.6 s when folded
  * in by mistake).
  */
private[graft] object LoopConf {

  /** Run `body` with AQE disabled, restoring the session setting after. */
  def withAqeOff[T](spark: SparkSession)(body: => T): T =
    withLoopConf(spark, shuffleWidth = -1)(body)

  /** [[withAqeOff]] plus an optional shuffle-partition pin for the
    * enclosed actions (`shuffleWidth > 0`). Callers derive the width
    * FROM THE DATA ([[widthForBytes]]) so it scales past any static
    * conf instead of replacing one constant with another. */
  def withLoopConf[T](spark: SparkSession, shuffleWidth: Int)
                     (body: => T): T = {
    val aqeKey = "spark.sql.adaptive.enabled"
    val spKey = "spark.sql.shuffle.partitions"
    val prevAqe = spark.conf.getOption(aqeKey)
    val prevSp = spark.conf.getOption(spKey)
    spark.conf.set(aqeKey, "false")
    if (shuffleWidth > 0) spark.conf.set(spKey, shuffleWidth.toString)
    try body
    finally {
      prevAqe match {
        case Some(v) => spark.conf.set(aqeKey, v)
        case None => spark.conf.unset(aqeKey)
      }
      if (shuffleWidth > 0) prevSp match {
        case Some(v) => spark.conf.set(spKey, v)
        case None => spark.conf.unset(spKey)
      }
    }
  }

  /** Exchange width for a loop stage moving ~`bytes` of shuffle data:
    * the guide §2.2 partition-sizing rule (100 MB–1 GB per partition,
    * 256 MB target) as a formula. Callers floor it at their configured
    * parallelism — shrinking below the core count was measured 1.8×
    * slower on compute-parallel rounds (it serializes the distance
    * kernel and heap cuts, not just task overhead). */
  def widthForBytes(bytes: Double): Int =
    math.max(1L, math.min(math.ceil(bytes / (256L << 20)).toLong,
      2000000L)).toInt
}
