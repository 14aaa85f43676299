package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.{Vectors, VectorUDT}

/** Vector similarity search over an embedding column (SURVEY B23).
  * No counterpart in the reference; required by the driver contract's
  * LLM-data-pipeline surface.
  *
  * Scale design: the brute-force form broadcasts the (small) query set so
  * the candidate scan is a map-side pipeline — no shuffle until the final
  * per-query top-k, which is a TakeOrdered-shaped window over k·|Q| rows.
  * The LSH form buckets candidates so the pair space is pruned before any
  * distance is computed; at 100 TB only the bucketed path is viable.
  */
object Similarity {

  /** Cosine similarity of two double-array columns as a codegen'd
    * higher-order-function chain (left-fold dot and norms — the exact
    * sequential order DuckDB's list_cosine_similarity uses, which makes
    * the brute-force query oracle-checkable bit-for-bit before rounding).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Brute-force cosine top-k: for each query vector (id in `queryIds`),
    * the k nearest candidates by cosine. Ranking uses the 4-decimal
    * rounded score with candidate-id tie-break so the order is stable
    * across engines and partitionings. */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryIds: Seq[Long], k: Int): DataFrame = {
    val asDouble = emb.select(col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("v"))
    val queries = asDouble.where(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("v").as("qv"))
    val scored = asDouble.join(broadcast(queries), col("vid") =!= col("qid"))
      .select(col("qid"), col("vid").as("cand"),
        graft.Stable.r4(cosine(col("qv"), col("v"))).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cand"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("qid", "cand", "cos", "rn")
  }

  /** ANN via random-hyperplane LSH (the scale path): normalize vectors so
    * euclidean distance is monotone in cosine (d² = 2·(1−cos)), bucket
    * with BucketedRandomProjectionLSH, and take per-query top-k among
    * bucket-mates only. Recall vs [[cosineTopK]] is asserted in the spec.
    */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryIds: Seq[Long], k: Int,
              bucketLength: Double = 1.0, numHashTables: Int = 4): DataFrame = {
    val toVec = udf((a: Seq[Double]) => {
      val n = math.sqrt(a.map(x => x * x).sum)
      Vectors.dense(a.map(x => if (n == 0) 0.0 else x / n).toArray)
    })
    val normed = emb.select(col(idCol).as("vid"),
      toVec(col(vecCol).cast("array<double>")).as("v"))
    val lsh = new BucketedRandomProjectionLSH().setInputCol("v").setOutputCol("h")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(normed)
    val queries = normed.where(col("vid").isin(queryIds: _*))
    val joined = model.approxSimilarityJoin(queries, normed, 2.0, "dist")
      .where(col("datasetA.vid") =!= col("datasetB.vid"))
      .select(col("datasetA.vid").as("qid"), col("datasetB.vid").as("cand"),
        graft.Stable.r4(lit(1.0) - col("dist") * col("dist") / 2.0).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cand"))
    joined.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("qid", "cand", "cos", "rn")
  }
}
