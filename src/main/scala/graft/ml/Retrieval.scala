package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.{SparseVector, Vectors}

/** MLlib batch retrieval scoring (SURVEY B29, driver north star): TF-IDF
  * document scoring against query term sets, and a logistic model over the
  * embeddings table. Batch inference only — fit once, `transform` is an
  * embarrassingly parallel projection that scales with executors.
  */
object Retrieval {

  final case class TfIdfModel(tf: HashingTF, idf: IDFModel)

  /** One tokenizer for BOTH fit and serve: if these ever diverged, a
    * cached model would score tokens hashed differently than it was
    * fitted on, silently. */
  private def tokenized(docs: DataFrame): DataFrame =
    docs.withColumn("toks", split(col("text"), " "))

  /** Fit TF-IDF over whitespace-tokenized document text. */
  def fitTfIdf(docs: DataFrame, numFeatures: Int = 1 << 16): (TfIdfModel, DataFrame) = {
    val tf = new HashingTF().setInputCol("toks").setOutputCol("tf")
      .setNumFeatures(numFeatures)
    val withTf = tf.transform(tokenized(docs))
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(withTf)
    (TfIdfModel(tf, idf), idf.transform(withTf))
  }

  /** Fitted TF-IDF models keyed by corpus: the IDF fit is the only action
    * in the pipeline (one corpus scan); serving must not conflate fit with
    * score, so repeated scoring against the same (immutable) corpus reuses
    * the fitted document frequencies and pays only the lazy map-side
    * transform. The model is small (one double per hashed feature). */
  private val tfIdfCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, (Long, String)), TfIdfModel]()

  /** Drop every fitted TF-IDF model. With content-fingerprint keys
    * staleness self-invalidates; this remains the blunt hook for
    * reclaiming memory or forcing refits wholesale. */
  def clearCache(): Unit = tfIdfCache.clear()

  /** Fit-once / transform-many entry: fit (or fetch) the TF-IDF model for
    * `corpusKey`, then lazily transform `docs` with it — the returned
    * DataFrame is a pure projection with no fitting action in its lineage.
    * The corpus CONTENT fingerprint (row count + xxhash64 digest,
    * [[graft.ops.ModelStore.fingerprint]]) is folded into the cache key:
    * regenerated data under a reused caller key — including an in-place
    * rewrite at unchanged cardinality — refits instead of silently
    * scoring with stale document frequencies.
    * Get-then-putIfAbsent rather than computeIfAbsent: the IDF fit is a
    * distributed job and must not run under a CHM bin lock (worst case is
    * a rare duplicate fit, not a cross-corpus stall).
    */
  def tfIdfFor(docs: DataFrame, corpusKey: String,
               numFeatures: Int = 1 << 16): (TfIdfModel, DataFrame) = {
    // fingerprint ONLY the column the fit consumes (the model is a pure
    // function of the text bag): unrelated-column rewrites must not
    // refit, and a caller's wide frame must not pay extra hash I/O
    val fp = graft.ops.ModelStore.fingerprint(
      docs.select(org.apache.spark.sql.functions.col("text")),
      org.apache.spark.sql.functions.col("text"))
    val key = (corpusKey, numFeatures, fp)
    val model = {
      val cached = tfIdfCache.get(key)
      if (cached != null) cached
      else {
        // L2: an IDF fit published by an earlier JVM (MLlib native
        // persistence — the idf vector round-trips through parquet
        // doubles exactly; HashingTF is stateless and rebuilt from
        // numFeatures). The dir only appears via ModelStore's atomic
        // rename, so existence implies a complete model.
        val diskKey = s"$corpusKey|$numFeatures|n=${fp._1}|h=${fp._2}"
        val fromDisk = graft.ops.ModelStore.dirLoc("tfidf", diskKey)
        def fitAndPublish(): TfIdfModel = {
          val f = fitTfIdf(docs, numFeatures)._1
          fromDisk.foreach { dir =>
            try {
              val tmp = graft.ops.ModelStore.staging(dir)
              f.idf.write.overwrite().save(tmp.spark)
              graft.ops.ModelStore.publish(tmp, dir)
            } catch { case scala.util.control.NonFatal(_) =>
              // cache publish is best-effort: an unwritable store costs
              // the amortization, never the query
              ()
            }
          }
          f
        }
        val fitted = fromDisk match {
          case Some(dir) if dir.exists =>
            try {
              val tf = new HashingTF().setInputCol("toks").setOutputCol("tf")
                .setNumFeatures(numFeatures)
              TfIdfModel(tf, IDFModel.load(dir.spark))
            } catch { case scala.util.control.NonFatal(_) =>
              // corrupt or format-incompatible persisted model (the
              // Version salt guards OUR fit algorithm, not Spark's
              // MLlib on-disk layout): drop it and refit, so the store
              // heals instead of failing q42 in every later process
              graft.ops.ModelStore.drop(dir)
              fitAndPublish()
            }
          case _ => fitAndPublish()
        }
        val prev = tfIdfCache.putIfAbsent(key, fitted)
        if (prev != null) prev else fitted
      }
    }
    (model, model.idf.transform(model.tf.transform(tokenized(docs))))
  }

  /** Score every document against a query (bag of terms) by sparse dot
    * product of TF-IDF vectors — the BM25-ish batch retrieval shape:
    * a broadcast query vector against a map-side-only document scan. */
  def scoreQuery(spark: SparkSession, model: TfIdfModel, docsTfIdf: DataFrame,
                 queryTerms: Seq[String], k: Int): DataFrame = {
    import spark.implicits._
    val qDf = Seq(Tuple1(queryTerms)).toDF("toks")
    val qVec = model.idf.transform(model.tf.transform(qDf))
      .select("tfidf").collect()(0).getAs[SparseVector](0)
    val qB = spark.sparkContext.broadcast(qVec)
    val dot = udf((v: SparseVector) => {
      val q = qB.value
      var s = 0.0
      var i = 0
      while (i < v.indices.length) {
        val qi = java.util.Arrays.binarySearch(q.indices, v.indices(i))
        if (qi >= 0) s += v.values(i) * q.values(qi)
        i += 1
      }
      s
    })
    docsTfIdf
      .select(col("doc_id"), graft.Stable.r4(dot(col("tfidf"))).as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Multinomial logistic regression over the embeddings table (label
    * 0-9), fixed seed / deterministic LBFGS: fit on all rows, return
    * per-row predictions. */
  def fitPredictEmbeddings(embs: DataFrame): DataFrame = {
    val toVec = udf((a: Seq[Double]) => Vectors.dense(a.toArray))
    val data = embs.select(col("vec_id"), col("label").cast("double").as("label"),
      toVec(col("embedding").cast("array<double>")).as("features"))
    val lr = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setElasticNetParam(0.0)
      .setFamily("multinomial")
    val m = lr.fit(data)
    m.transform(data)
      .select(col("vec_id"), col("label").cast("int").as("label"),
        col("prediction").cast("int").as("prediction"))
  }
}
