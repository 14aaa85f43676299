package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (driver contract: "skewed keys → salting
  * or AQE skew-join"). AQE handles skewed *joins* automatically; these
  * helpers cover skewed *aggregations*, where one hot grouping key would
  * otherwise serialize into a single reducer task.
  */
object Skew {

  /** Two-stage salted aggregation: spread each key over `saltBuckets`
    * partial groups (stage 1 runs on key+salt — hot keys fan out across
    * reducers), then merge partials per key (stage 2 touches only
    * `saltBuckets` rows per key). Correct for any commutative re-mergeable
    * aggregate; count and sum are provided.
    *
    * The salt column must be deterministic per row (not rand()) so
    * re-executed tasks land rows in the same bucket — here a hash of the
    * whole row's unique id expression.
    */
  def saltedCountSum(df: DataFrame, key: Column, uniqueId: Column,
                     valueCol: Column, saltBuckets: Int): DataFrame =
    df.groupBy(key.as("k"), pmod(hash(uniqueId), lit(saltBuckets)).as("_salt"))
      .agg(count(lit(1)).as("_pc"), sum(valueCol.cast("decimal(18,4)")).as("_ps"))
      .groupBy(col("k"))
      .agg(sum(col("_pc")).as("n"), sum(col("_ps")).cast("double").as("total"))

  /** Plain single-stage version (for equivalence testing and as the
    * baseline shape the salted form must match). */
  def plainCountSum(df: DataFrame, key: Column, valueCol: Column): DataFrame =
    df.groupBy(key.as("k"))
      .agg(count(lit(1)).as("n"),
        sum(valueCol.cast("decimal(18,4)")).cast("double").as("total"))
}
