package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming BM25 posting-index maintenance — the LEXICAL twin of
  * [[IndexMaintenance]]: a CDC stream of document inserts/deletes keeps
  * the published posting table (q178, [[graft.ops.Lexical]]) current
  * without rebuilding it whole on every corpus change. Same versioned
  * parquet state, same pointer-swap commit, same delta-log recipe, same
  * writer fencing — all through the shared [[StateProtocol]] seam, so
  * both index families harden together.
  *
  * Layout per version (stateDir/v<id>/):
  *  - BASE (init, full mode, every compaction):
  *      postings/  (tb, term, doc_id, tf, dl) PARTITIONED BY tb — the
  *                 q178 artifact verbatim, so serving keeps the
  *                 listing-level PartitionFilters prune;
  *      doclen/    (doc_id, dl) — one narrow row per document, the
  *                 compact side table the contract checks and the stats
  *                 fold read instead of scanning postings;
  *      stats/     1 row (n_docs, sum_dl) — SUM, not mean: integers
  *                 fold additively under insert/delete with no float
  *                 drift, and avgdl = sum_dl / n_docs reproduces
  *                 Spark's avg(dl) bit-for-bit because every quantity
  *                 is an integer-valued double.
  *  - DELTA (`compactEvery = m > 0`, non-compacting commits):
  *      pdelta/    the INSERTED documents' posting rows, UNpartitioned
  *                 — a delta is batch-sized, so the listing-level prune
  *                 only matters on the base (and an empty tb-partitioned
  *                 write — a delete-only batch — would be unreadable:
  *                 partitioned parquet stores no schema with zero rows);
  *                 tb rides along as a data column and the (tb, term)
  *                 predicate still row-group-prunes the small files;
  *      dldelta/   (op, doc_id, dl) — inserts with their length,
  *                 deletes as null-dl tombstones;
  *      stats/     the folded 1-row stats (always per-version: a serve
  *                 never folds stats, it reads its version's row).
  *
  * Reads resolve the newest base at-or-below the version and fold the
  * delta chain order-aware (last op per doc wins — delete-then-reinsert
  * across batches resolves to the REINSERTED document's postings, keyed
  * by the winning delta version so a doc inserted at v5 and reinserted
  * at v9 serves v9's rows only). The touched-doc anti-join is unhinted:
  * AQE broadcasts the small chain (the common case) and falls back to a
  * shuffled join when it would blow the broadcast limit.
  *
  * Scale: per batch the WRITE is O(batch tokens) in delta mode
  * (amortized O(corpus / m) for compactions) versus the whole-index
  * rebuild q178 pays today on any change; the contract checks and the
  * stats fold read the O(n_docs)-row doclen side table, never the
  * O(total tokens) postings. Serving stays proportional to the query
  * terms' posting lists: the tb filter prunes the BASE at the listing
  * level (the q178 guarantee) and row-group-prunes the batch-sized
  * deltas; the fold's anti-join side is chain-sized.
  *
  * Contract: rows are (op, doc_id, text) with op ∈ {"I", "D"}; delete
  * ids must exist, insert ids must be new, one batch must not carry one
  * doc twice (CDC compaction upstream owns the collapse). A delete
  * batch is model-sized (it broadcasts into the anti-joins), exactly
  * q175's documented posture. */
object PostingsMaintenance {

  import StateProtocol.{StateDir, stateFs, committedVersions}

  type WriterLease = StateProtocol.WriterLease

  /** Acquire the writer lease for `stateDir` (fencing any previous
    * holder) — see [[StateProtocol.acquireWriter]]. */
  def acquireWriter(stateDir: String): WriterLease =
    StateProtocol.acquireWriter(stateDir)

  private def isBase(sd: StateDir, v: Long): Boolean =
    sd.isDir(s"v$v/postings")

  /** The committed version id, or None before [[init]]. */
  def latestVersion(stateDir: String): Option[Long] =
    StateProtocol.latestVersion(stateFs(stateDir))

  private def dlExpr = size(split(col("text"), " ")).cast("double").as("dl")

  /** Resolve the (doc_id, dl) side table AS OF version `v` — the exact
    * shape [[IndexMaintenance.resolveCorpus]] gives the vector corpus,
    * with the document length in the vector's place. */
  /** The version's resolution chain `[base, d1, …, v]`: the committed
    * chain FILE when present (listing-independent, the lagging-listing
    * guarantee — [[StateProtocol.chainOf]]), else listing discovery for
    * pre-chain-file state dirs. */
  private def chainFor(sd: StateDir, v: Long): Seq[Long] =
    StateProtocol.chainOf(sd, v).getOrElse {
      val vs = committedVersions(sd).filter(_ <= v)
      val b = vs.filter(isBase(sd, _)).maxOption.getOrElse(
        sys.error(s"version $v of ${sd.rootPath} has no base snapshot at or " +
          "below it — the reader lags past the GC window (raise " +
          "keepVersions on the writer, or pin earlier)"))
      b +: vs.filter(_ > b)
    }

  private def resolveDoclen(spark: SparkSession, sd: StateDir,
                            v: Long): DataFrame = {
    if (isBase(sd, v))
      return spark.read.parquet(sd.sparkPath(s"v$v/doclen"))
    val chain = chainFor(sd, v)
    val base = spark.read.parquet(sd.sparkPath(s"v${chain.head}/doclen"))
    val last = lastOpPerDoc(spark, sd, chain.tail)
    base.join(last.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(last.where(col("op") === "I")
        .select(col("doc_id"), col("dl")))
  }

  /** The chain's last op per doc: (op, doc_id, dl, _ver) with exactly
    * one row per touched doc. Ties inside one version cannot happen
    * (applyBatch guards both-ops-same-doc), but a hand-written delta
    * still resolves deterministically — "D" before "I", the
    * conservative side. */
  private def lastOpPerDoc(spark: SparkSession, sd: StateDir,
                           chain: Seq[Long]): DataFrame = {
    val deltas = chain.map { dv =>
      spark.read.parquet(sd.sparkPath(s"v$dv/dldelta"))
        .withColumn("_ver", lit(dv))
    }.reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("_ver").desc, col("op").asc)
    deltas.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }

  /** Resolve the POSTING table AS OF version `v`: base postings minus
    * every touched doc, plus the pdelta rows of each live insert keyed
    * by its WINNING version (a reinserted doc serves only its newest
    * rows). Predicates on (tb, term) push through the anti-join's
    * preserved side and the union into both parquet scans, so the
    * listing-level prune survives the fold. */
  private def resolvePostings(spark: SparkSession, sd: StateDir,
                              v: Long): DataFrame = {
    // same tb normalization as the delta path below: the base's tb is
    // partition-inferred int, every other producer writes long — one
    // type at every exit so no consumer leans on set-op coercion
    if (isBase(sd, v))
      return spark.read.parquet(sd.sparkPath(s"v$v/postings"))
        .withColumn("tb", col("tb").cast("long"))
    val full = chainFor(sd, v)
    val b = full.head
    val chain = full.tail
    // the base's tb comes back as the partition-inferred integer type;
    // the deltas carry the written long — normalize so the union never
    // leans on set-operation coercion (the cast is evaluable per
    // partition value, so the listing-level prune survives it)
    val base = spark.read.parquet(sd.sparkPath(s"v$b/postings"))
      .withColumn("tb", col("tb").cast("long"))
    val last = lastOpPerDoc(spark, sd, chain)
    val pchain = chain.map { dv =>
      spark.read.parquet(sd.sparkPath(s"v$dv/pdelta"))
        .withColumn("_ver", lit(dv))
    }.reduce(_ unionByName _)
    val live = last.where(col("op") === "I").select("doc_id", "_ver")
    base.join(last.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(pchain.join(live, Seq("doc_id", "_ver"))
        .select("tb", "term", "doc_id", "tf", "dl"))
  }

  /** Read the committed (postings, stats) pair — `stats` in the
    * (n_docs, avgdl) shape [[graft.ops.Lexical.bm25TopK]] consumes,
    * derived from the stored additive (n_docs, sum_dl). Lazy scans,
    * same GC-lag contract as [[IndexMaintenance.readState]]. */
  def readPostings(spark: SparkSession,
                   stateDir: String): (DataFrame, DataFrame) = {
    val sd = stateFs(stateDir)
    val v = latestVersion(stateDir).getOrElse(
      sys.error(s"no committed posting state under $stateDir"))
    if (!sd.isDir(s"v$v"))
      sys.error(s"posting state $stateDir points at version $v but " +
        s"v$v is gone — the pointer and the GC disagree (corrupt stateDir?)")
    val stats = spark.read.parquet(sd.sparkPath(s"v$v/stats"))
      .select(col("n_docs"), (col("sum_dl") / col("n_docs")).as("avgdl"))
    (resolvePostings(spark, sd, v), stats)
  }

  /** BM25 top-k straight off the maintained state — q104's exact IEEE
    * expression over the folded postings ([[graft.ops.Lexical.bm25TopK]]
    * — df re-derived on the pruned slice, so served scores carry
    * q104's full hash oracle verbatim). */
  def bm25Serve(spark: SparkSession, stateDir: String,
                terms: Seq[String], k: Int): DataFrame = {
    val (postings, stats) = readPostings(spark, stateDir)
    graft.ops.Lexical.bm25TopK(postings, stats, terms, k)
  }

  private def writeBase(tmp: graft.ops.ModelStore.Loc, postings: DataFrame,
                        doclen: DataFrame, stats: DataFrame): Unit = {
    postings.write.mode("overwrite").partitionBy("tb")
      .parquet(tmp.child("postings"))
    doclen.write.mode("overwrite").parquet(tmp.child("doclen"))
    stats.write.mode("overwrite").parquet(tmp.child("stats"))
  }

  /** Seed the state from a (idCol, textCol) corpus frame (version -1).
    * Refuses to re-seed a live stateDir — same posture and reasons as
    * [[IndexMaintenance.init]]. */
  def init(stateDir: String, docs: DataFrame, idCol: String,
           textCol: String): Unit = {
    require(latestVersion(stateDir).isEmpty,
      s"$stateDir already holds committed posting state (version " +
        s"${latestVersion(stateDir).get}); refusing to re-seed — point new " +
        "corpora at a fresh stateDir")
    val sd = stateFs(stateDir)
    sd.mkdirs()
    val d = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val postings = graft.ops.Lexical.buildPostings(d, "doc_id", "text")
    val doclen = d.select(col("doc_id"), dlExpr)
    val stats = doclen.agg(count(lit(1)).cast("double").as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    StateProtocol.commitVersion(sd, -1L, 2, isBase(sd, _), None,
      chain = Seq(-1L)) { tmp =>
      writeBase(tmp, postings, doclen, stats)
    }
  }

  /** Apply one CDC micro-batch of (op, doc_id, text) rows. Idempotent
    * under checkpoint replay by the batch-id-as-version recipe;
    * contract breaches fail fast; `lease` enforces single-writer.
    * Mirrors [[IndexMaintenance.applyBatch]] clause for clause. */
  def applyBatch(batch: DataFrame, batchId: Long, stateDir: String,
                 keepVersions: Int = 2, compactEvery: Int = 0,
                 lease: Option[WriterLease] = None): Unit = {
    val spark = batch.sparkSession
    val sd = stateFs(stateDir)
    StateProtocol.checkWriter(sd, lease, "batch entry")
    val latest = latestVersion(stateDir).getOrElse(
      sys.error(s"posting state not initialized under $stateDir"))
    if (batchId <= latest) return
    val rows = batch.select(col("op"), col("doc_id").cast("long").as("doc_id"),
      col("text")).localCheckpoint()
    val badOps = rows.where(col("op") =!= "I" && col("op") =!= "D")
      .select("op").distinct().collect().map(_.getString(0))
    require(badOps.isEmpty,
      s"batch $batchId carries unsupported ops ${badOps.mkString(",")} — " +
        "the CDC contract is op IN ('I','D')")
    val delIdsRaw = rows.where(col("op") === "D").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val dupDel = delIdsRaw.groupBy(identity)
      .collect { case (id, v) if v.sizeIs > 1 => id }.toSeq.sorted.take(5)
    require(dupDel.isEmpty,
      s"batch $batchId carries duplicate delete ids (CDC compaction " +
        s"upstream owns the collapse): ${dupDel.mkString(",")}")
    val delIds = delIdsRaw.sorted
    val insDocs = rows.where(col("op") === "I").select("doc_id", "text")
    val dupIns = insDocs.groupBy("doc_id").count().where(col("count") > 1)
      .select("doc_id").limit(5).collect().map(_.getLong(0))
    require(dupIns.isEmpty,
      s"batch $batchId carries duplicate insert ids (CDC compaction " +
        s"upstream owns the collapse): ${dupIns.mkString(",")}")
    // the doclen fold is evaluated several times below (checks, stats,
    // full-mode rewrite) — materialize it once per batch, exactly the
    // IndexMaintenance chain-fold posture; a base resolves to a plain
    // scan and is left alone
    val doclen0 = resolveDoclen(spark, sd, latest)
    val doclen =
      if (!isBase(sd, latest)) doclen0.localCheckpoint() else doclen0
    if (delIds.nonEmpty) {
      val live = doclen.where(col("doc_id").isin(delIds: _*))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val missing = delIds.filterNot(live)
      require(missing.isEmpty,
        s"batch $batchId deletes ids absent from the live corpus: " +
          s"${missing.take(5).mkString(",")}")
    }
    val clash = insDocs.join(doclen, Seq("doc_id"), "left_semi")
      .select("doc_id").limit(5).collect().map(_.getLong(0))
    require(clash.isEmpty,
      s"batch $batchId inserts ids already live (checkpoint-reset " +
        s"double-apply?): ${clash.mkString(",")}")
    // the batch's own artifacts: posting rows + lengths of the inserts
    val insPost = graft.ops.Lexical.buildPostings(insDocs, "doc_id", "text")
      .localCheckpoint()
    val insDl = insDocs.select(col("doc_id"), dlExpr)
    // additive stats fold — all integer-valued doubles, so the driver
    // arithmetic is exact and avgdl = sum_dl / n_docs is bit-identical
    // to a from-scratch avg over the resolved corpus
    val prev = spark.read.parquet(sd.sparkPath(s"v$latest/stats"))
      .select("n_docs", "sum_dl").first()
    val insAgg = insDl.agg(count(lit(1)).cast("double"),
      coalesce(sum(col("dl")), lit(0.0))).first()
    val delSum =
      if (delIds.isEmpty) 0.0
      else doclen.where(col("doc_id").isin(delIds: _*))
        .agg(coalesce(sum(col("dl")), lit(0.0))).first().getDouble(0)
    val stats = spark.range(1).select(
      lit(prev.getDouble(0) + insAgg.getDouble(0) - delIds.size).as("n_docs"),
      lit(prev.getDouble(1) + insAgg.getDouble(1) - delSum).as("sum_dl"))
    // delta vs compaction from the pointer version's own chain: a pure
    // function of COMMITTED state, so a checkpoint replay makes the
    // same call — the IndexMaintenance recipe verbatim
    lazy val prevChain = chainFor(sd, latest)
    val asDelta = compactEvery > 0 && prevChain.length < compactEvery
    val chain =
      if (asDelta) prevChain :+ batchId else Seq(batchId)
    StateProtocol.commitVersion(sd, batchId, keepVersions, isBase(sd, _),
      lease, chain) { tmp =>
      if (asDelta) {
        insPost.write.mode("overwrite").parquet(tmp.child("pdelta"))
        // tombstones don't carry a length: the fold reads dl only for
        // op = I, so a null keeps the delta honest about what it knows
        rows.select(col("op"), col("doc_id"),
            when(col("op") === "I",
              size(split(col("text"), " ")).cast("double")).as("dl"))
          .write.mode("overwrite").parquet(tmp.child("dldelta"))
        stats.write.mode("overwrite").parquet(tmp.child("stats"))
      } else {
        val touched = delIds
        val oldPost = resolvePostings(spark, sd, latest)
        val newPost =
          (if (touched.isEmpty) oldPost
           else oldPost.where(!col("doc_id").isin(touched: _*)))
            .unionByName(insPost)
        val newDoclen =
          (if (touched.isEmpty) doclen
           else doclen.where(!col("doc_id").isin(touched: _*)))
            .unionByName(insDl)
        writeBase(tmp, newPost, newDoclen, stats)
      }
    }
  }

  /** Attach the maintenance sink to a streaming (op, doc_id, text)
    * frame — acquires the WRITER lease at attach time, same trigger
    * contract as [[IndexMaintenance.graphMaintenanceStream]]. */
  def postingsMaintenanceStream(cdc: DataFrame, stateDir: String,
                                checkpointDir: String,
                                trigger: Trigger = Trigger.AvailableNow(),
                                keepVersions: Int = 2,
                                compactEvery: Int = 0): StreamingQuery = {
    val lease = acquireWriter(stateDir)
    cdc.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) =>
        applyBatch(b, id, stateDir, keepVersions = keepVersions,
          compactEvery = compactEvery, lease = Some(lease)))
      .trigger(trigger)
      .start()
  }
}
