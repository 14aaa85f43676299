package graft.ops

import java.io.{DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.nio.file.{Files, StandardCopyOption}

/** Disk persistence for the cached-fit model family (IVF coarse centers,
  * PQ codebooks, BPE merge tables, served kNN graphs) — the L2 under the
  * per-JVM ConcurrentHashMap L1s in [[Similarity]] / [[graft.ml.Retrieval]].
  *
  * Why it exists: the in-memory caches amortize a fit WITHIN one JVM, but
  * every new driver (a fresh Verify/Bench/serving process) pays the cold
  * fit again — measured at 0.9–1.5 s locally (bench `cold` column: q55
  * 1.51 s, q76 1.48 s) and far more at production model sizes. Persisting
  * the fitted artifact keyed by the SAME corpus-fingerprint string the L1
  * uses turns "the fit amortizes" from a per-JVM accident into a
  * mechanism: first process fits and publishes, every later process loads.
  *
  * Bit-fidelity contract: models are written as raw IEEE-754 bits
  * (`writeDouble`/`readDouble` round-trip doubles exactly) plus exact
  * ints/longs/UTF strings, so a model served from disk produces output
  * BYTE-IDENTICAL to the in-memory fit — ModelStoreSpec pins the
  * round-trip and the serve-path equality; the committed ANN fixtures
  * (q55/q75/q76) would catch any drift at the correctness gate.
  *
  * Publication protocol: write to a process-unique `*.tmp` sibling, then
  * atomic rename into place — concurrent fitters race benignly (last
  * rename wins with identical bytes; readers only ever see a complete
  * file). Staleness: the key embeds the corpus row count (the same
  * fingerprint, and the same residual same-count-rewrite hazard, as the
  * L1 caches — [[clear]] is the explicit invalidation hook, the
  * clearCaches analog).
  *
  * Location: `SPARK_GRAFT_MODEL_DIR` (default `/tmp/graft_models`); set
  * it to the empty string to disable persistence entirely (every fit
  * stays in-process — the prior rounds' behavior). Filesystem contract:
  * a POSIX path; the `.bin` models are driver-side artifacts of bounded
  * size (centers: nCells·d doubles; PQ: m·ks·dsub doubles; merges:
  * nMerges rows), while DIR artifacts (the q172 graph parquet, MLlib
  * model dirs) are written by Spark tasks under a pinned `file:` scheme
  * ([[sparkPath]]) — so on a multi-node cluster the store must be a
  * mount visible to driver and executors at the same path (NFS/Lustre);
  * an HDFS/S3-backed store needs a FileSystem-API publish in place of
  * the java.io rename. Every store failure is BEST-EFFORT degraded:
  * an unwritable store costs the amortization, a corrupt artifact is
  * dropped and refit — the store can slow a query, never fail it. */
object ModelStore {

  /** Test seam: when set, takes precedence over SPARK_GRAFT_MODEL_DIR.
    * The test harness points this at a per-JVM temp dir (deleted on
    * exit) so suites stay hermetic — unique-keyed spec fits would
    * otherwise accumulate in the world-shared default dir forever. */
  @volatile var overrideDir: Option[String] = None

  /** Resolved base dir, or None when disabled. Lazily created. */
  def baseDir: Option[File] = {
    val raw = overrideDir.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_MODEL_DIR", "/tmp/graft_models"))
    if (raw.isEmpty) None
    else {
      val f = new File(raw)
      f.mkdirs()
      Some(f)
    }
  }

  /** Remove every persisted model — the disk analog of
    * [[Similarity.clearCaches]], for same-count in-place rewrites. */
  def clear(): Unit = baseDir.foreach { d =>
    Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isDirectory) deleteRecursively(f) else f.delete()
    }
  }

  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  /** Format/algorithm version folded into every key: the store outlives
    * the process, so a change to any FIT algorithm (k-means recipe, BPE
    * argmax order, graph build) must bump this or stale disk models would
    * silently mask the code change across rounds. */
  private val Version = "v1"

  /** Stable filename for a cache key: readable kind prefix + SHA-256 of
    * the full key string (keys embed filesystem paths and `|` separators,
    * so they are hashed rather than sanitized). */
  private def fileFor(kind: String, key: String): Option[File] = baseDir.map { d =>
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s"$Version|$key".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(32)
    new File(d, s"$kind-$hex.bin")
  }

  /** Directory path for a persisted directory-shaped artifact (the q172
    * served-graph parquet, MLlib model dirs); None when the store is
    * disabled. The directory only ever APPEARS via [[publishParquet]]'s
    * atomic rename of a fully-written temp dir, so existence implies
    * completeness (a crashed writer leaves only its temp dir behind). */
  def dirFor(kind: String, key: String): Option[(File, Boolean)] =
    fileFor(kind, key).map { f =>
      val dir = new File(f.getParentFile, f.getName.stripSuffix(".bin"))
      (dir, dir.isDirectory)
    }

  /** Best-effort recursive removal of a persisted dir artifact — the
    * invalidation hook for a corrupt or format-incompatible model dir
    * (e.g. an MLlib persistence layout a newer Spark cannot load): drop
    * it so this and every later process refits instead of tripping on
    * the same bytes forever. */
  def dropDir(dir: File): Unit =
    try deleteRecursively(dir)
    catch { case scala.util.control.NonFatal(_) => () }

  /** Spark path for a [[dirFor]] artifact, pinned to the `file:` scheme
    * so the Spark reader/writer and the java.io rename in
    * [[publishParquet]] agree on ONE filesystem regardless of
    * `fs.defaultFS`. Contract: the store lives on a path visible to
    * driver AND executors alike (local mode, or a shared NFS/Lustre
    * mount on a cluster); an HDFS/S3-backed store needs a
    * FileSystem-API publish in place of the java.io rename. */
  def sparkPath(dir: File): String = "file:" + dir.getAbsolutePath

  /** Process-unique sibling temp dir for staging a [[dirFor]] artifact. */
  def tmpSibling(dest: File): File =
    new File(dest.getParentFile,
      dest.getName + s".tmp-${ProcessHandle.current().pid()}-${Thread.currentThread().getId}")

  /** Atomically publish a fully-written directory artifact at `tmp` to
    * `dest` (rename; a concurrent winner's identical output is kept). */
  def publishParquet(tmp: File, dest: File): Unit = {
    if (!tmp.renameTo(dest) && !dest.isDirectory)
      throw new java.io.IOException(s"cannot publish $tmp -> $dest")
    if (tmp.exists()) deleteRecursively(tmp)
  }

  private def atomicWrite(dest: File)(body: DataOutputStream => Unit): Unit = {
    val tmp = new File(dest.getParentFile,
      dest.getName + s".tmp-${ProcessHandle.current().pid()}-${Thread.currentThread().getId}")
    try {
      val out = new DataOutputStream(new java.io.BufferedOutputStream(new FileOutputStream(tmp)))
      try { body(out) } finally out.close()
      try Files.move(tmp.toPath, dest.toPath, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.io.IOException =>
        // a concurrent fitter won the rename with identical bytes
        tmp.delete()
      }
    } catch { case scala.util.control.NonFatal(_) =>
      // the disk cache is OPPORTUNISTIC: an unwritable store (read-only
      // /tmp, foreign-owned dir, full disk) must cost the amortization,
      // never the query — the fit that was about to be cached is still
      // in hand and in the L1
      tmp.delete(); ()
    }
  }

  /** Sanity bound on a length prefix read from disk: a torn or corrupt
    * file must land in the refit path, not in NegativeArraySizeException
    * or an OOM-sized allocation (both escape an IOException-only catch). */
  private def chk(n: Int): Int =
    if (n < 0 || n > (1 << 27))
      throw new java.io.IOException(s"implausible length prefix $n")
    else n

  private def read[A](f: File)(body: DataInputStream => A): Option[A] =
    if (!f.isFile) None
    else {
      try {
        val in = new DataInputStream(new java.io.BufferedInputStream(new FileInputStream(f)))
        try Some(body(in)) finally in.close()
      } catch { case scala.util.control.NonFatal(_) =>
        // torn/corrupt file: DELETE it so the next process refits
        // cleanly instead of tripping on the same bytes forever
        f.delete(); None
      }
    }

  // ---- centers: Array[Array[Double]] (IVF coarse quantizer) -----------

  def saveCenters(key: String, centers: Array[Array[Double]]): Unit =
    fileFor("centers", key).foreach { f =>
      atomicWrite(f) { out =>
        out.writeInt(centers.length)
        centers.foreach { row =>
          out.writeInt(row.length)
          row.foreach(out.writeDouble)
        }
      }
    }

  def loadCenters(key: String): Option[Array[Array[Double]]] =
    fileFor("centers", key).flatMap(read(_) { in =>
      Array.fill(chk(in.readInt()))(Array.fill(chk(in.readInt()))(in.readDouble()))
    })

  // ---- PQ codebooks ---------------------------------------------------

  def savePq(key: String, pq: Similarity.PqModel): Unit =
    fileFor("pq", key).foreach { f =>
      atomicWrite(f) { out =>
        out.writeInt(pq.m); out.writeInt(pq.ks); out.writeInt(pq.dsub)
        pq.codebooks.foreach { book =>
          out.writeInt(book.length)
          book.foreach { row =>
            out.writeInt(row.length)
            row.foreach(out.writeDouble)
          }
        }
      }
    }

  def loadPq(key: String): Option[Similarity.PqModel] =
    fileFor("pq", key).flatMap(read(_) { in =>
      val m = in.readInt(); val ks = in.readInt(); val dsub = in.readInt()
      val books = Array.fill(m)(
        Array.fill(chk(in.readInt()))(Array.fill(chk(in.readInt()))(in.readDouble())))
      Similarity.PqModel(m, ks, dsub, books)
    })

  // ---- BPE merge tables ----------------------------------------------

  def saveMerges(key: String, merges: Seq[Bpe.Merge]): Unit =
    fileFor("bpe", key).foreach { f =>
      atomicWrite(f) { out =>
        out.writeInt(merges.length)
        merges.foreach { m =>
          out.writeInt(m.rank); out.writeUTF(m.left); out.writeUTF(m.right)
          out.writeLong(m.pair_count)
        }
      }
    }

  def loadMerges(key: String): Option[Seq[Bpe.Merge]] =
    fileFor("bpe", key).flatMap(read(_) { in =>
      Seq.fill(chk(in.readInt()))(
        Bpe.Merge(in.readInt(), in.readUTF(), in.readUTF(), in.readLong()))
    })
}
