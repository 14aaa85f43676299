package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}

/** Deduplication operators for large-scale training-data pipelines.
  * No counterpart in the reference (SURVEY §2 Part B: B21/B22) — these are
  * the engine-capability extensions the driver contract requires.
  *
  * Scale design: every operator shuffles only on its dedup/bucket key —
  * exact dedup is one hash-partition pass; near-dup never goes all-pairs
  * (the exact-Jaccard form prunes by shared shingle, the MinHash form by
  * LSH band bucket), so cost tracks candidate pairs, not n².
  */
object Dedup {

  /** Exact dedup: keep one deterministic representative per key group
    * (smallest `keepBy` tuple). `dropDuplicates` picks an arbitrary row;
    * at scale (and for oracle checks) determinism matters, so this is the
    * row_number()=1 form — one shuffle on the key columns.
    */
  def exactKeepFirst(df: DataFrame, keys: Seq[String], keepBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(keepBy: _*)
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  /** Group-level exact dedup summary over a normalized-text hash:
    * md5 (engine-portable) of the normalized text, representative id,
    * duplicate count. */
  def exactByTextHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(lower(col(textCol))).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Word n-gram shingles of a whitespace-tokenized text column, distinct.
    * Pure column expression (codegen-friendly, no UDF): 0-based array
    * indexing over a generated position sequence. */
  def shingles(textCol: Column, n: Int): Column = {
    val toks = split(textCol, " ")
    // guard: sequence(0, negative) would flip to a descending range
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => toks(i + lit(j))): _*))))
  }

  /** Exact n-gram-Jaccard near-duplicate pairs (declared oracle-checkable
    * form, SURVEY B22): explode distinct shingles, self-join on shingle
    * (the join key prunes non-overlapping pairs), count intersections,
    * Jaccard = |∩| / (|A|+|B|-|∩|) >= tau. At 100 TB this exact form is
    * only viable after LSH candidate pruning — see [[minhashCandidates]];
    * the declared query runs it on the documents table where the shingle
    * join is selective.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, tau: Double): DataFrame = {
    val sh = df.select(col(idCol).as("doc"), explode(shingles(col(textCol), n)).as("shingle"))
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("sz"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc", "d1").withColumnRenamed("sz", "sz1"), "d1")
      .join(sizes.withColumnRenamed("doc", "d2").withColumnRenamed("sz", "sz2"), "d2")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")), 4))
      .where(col("jaccard") >= tau)
      .select("d1", "d2", "jaccard")
  }

  /** MinHash+LSH near-dup candidates (the 100-TB path): shingle → sparse
    * term-frequency vector (HashingTF, fixed seed-free hashing) →
    * MinHashLSH banded join at the given Jaccard-distance threshold.
    * Returns (d1, d2, minhash_dist). Deterministic for a fixed seed.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        n: Int, tau: Double, numHashTables: Int = 8): DataFrame = {
    val withShingles = df.select(col(idCol).as("doc"), shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feats = tf.transform(withShingles)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(feats)
    model.approxSimilarityJoin(feats, feats, 1.0 - tau, "dist")
      .where(col("datasetA.doc") < col("datasetB.doc"))
      .select(col("datasetA.doc").as("d1"), col("datasetB.doc").as("d2"),
        round(col("dist"), 4).as("minhash_dist"))
  }

  /** 64-bit SimHash of a token array: per-token 64-bit hash votes on each
    * bit, weighted +1/-1; the sign of each bit's vote total forms the
    * fingerprint. Near-dups have small Hamming distance. Pure Scala kernel
    * (FNV-1a token hash — stable across JVMs, unlike String.hashCode for
    * non-ASCII surrogates... FNV is also what public simhash impls use).
    */
  def simhash64(tokens: Seq[String]): Long = {
    if (tokens == null) return 0L
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
      var i = 0
      while (i < t.length) { h ^= t.charAt(i); h *= 0x100000001b3L; i += 1 }
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  val simhashUdf = udf((toks: Seq[String]) => simhash64(toks))

  /** SimHash near-dup pairs via 4×16-bit band blocking: by pigeonhole, any
    * pair within Hamming distance 3 shares at least one exact 16-bit band,
    * so the self-join key is (band_idx, band_value) — never all-pairs. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol).as("doc"),
      simhashUdf(split(col(textCol), " ")).as("sig"))
    val banded = hashed.select(col("doc"), col("sig"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("band"),
            shiftrightunsigned(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL)).as("bval"))): _*)).as("bb"))
      .select(col("doc"), col("sig"), col("bb.band"), col("bb.bval"))
    val popcount = udf((x: Long) => java.lang.Long.bitCount(x))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"),
        popcount(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
