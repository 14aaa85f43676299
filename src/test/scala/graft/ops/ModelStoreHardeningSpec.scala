package graft.ops

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.rel.Tables

/** Round-14 ModelStore hardening: the Hadoop-FileSystem backend (the
  * HDFS/S3 publish seam, exercised here through a `file:`-scheme
  * FileSystem instance), the foreign-owned-dir refusal (local-user
  * poisoning guard), and the corrupt-length-prefix allocation bound
  * (a poisoned small file must land in the delete-and-refit path, not
  * in a multi-GB Array.fill). */
class ModelStoreHardeningSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def uniq(prefix: String) = s"$prefix-${System.nanoTime()}"

  /** Run `body` with the store pointed at a fresh location, restoring
    * the suite-wide override afterwards (suites run sequentially in the
    * forked test JVM, so the swap is race-free). */
  private def withStore[A](location: String)(body: => A): A = {
    val saved = ModelStore.overrideDir
    ModelStore.overrideDir = Some(location)
    try body finally ModelStore.overrideDir = saved
  }

  private def freshLocalDir(): File =
    java.nio.file.Files.createTempDirectory("graft-ms-hardening").toFile

  test("FileSystem backend (file: scheme): bin models round-trip raw " +
    "IEEE-754 bits and a dir artifact publishes via fs.rename") {
    val root = freshLocalDir()
    withStore("file:" + root.getAbsolutePath) {
      assert(ModelStore.enabled)
      // bin artifact through fs.create + fs.rename
      val key = uniq("fs-centers")
      val centers = Array(
        Array(1.0, -0.0, math.Pi, 1e-308, Double.MinPositiveValue),
        Array(0.1 + 0.2, -1e300, 4.9e-324, 123456.789, 2.0 / 3.0))
      ModelStore.saveCenters(key, centers)
      val back = ModelStore.loadCenters(key).get
      for (i <- centers.indices)
        assert(back(i).map(java.lang.Double.doubleToRawLongBits).toSeq ==
          centers(i).map(java.lang.Double.doubleToRawLongBits).toSeq)
      // dir artifact: stage, publish, read back through the same scheme
      val loc = ModelStore.dirLoc("spec", uniq("fs-dir")).get
      assert(!loc.exists)
      val tmp = ModelStore.staging(loc)
      spark.range(5).toDF("id").write.mode("overwrite")
        .parquet(tmp.child("part"))
      ModelStore.publish(tmp, loc)
      assert(loc.exists, "published dir artifact must exist")
      assert(spark.read.parquet(loc.child("part")).count() == 5)
      // a second publisher racing in loses benignly — and must NOT nest
      // its staging copy inside the live artifact (Hadoop rename onto an
      // existing dir has POSIX-mv move-INTO semantics; the publish path
      // guards it)
      val tmp2 = ModelStore.staging(loc)
      spark.range(5).toDF("id").write.mode("overwrite")
        .parquet(tmp2.child("part"))
      ModelStore.publish(tmp2, loc)
      assert(spark.read.parquet(loc.child("part")).count() == 5)
      val artifactDir = new File(root,
        loc.spark.stripPrefix("file:").split('/').last)
      val nested = Option(artifactDir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.contains(".tmp-"))
      assert(nested.isEmpty,
        s"losing publisher nested its staging copy: ${nested.mkString(",")}")
      ModelStore.drop(loc)
      assert(!loc.exists)
    }
  }

  test("FileSystem backend end-to-end: servedGraphFor publishes through " +
    "a file:-scheme store and serves the identical edge table") {
    val root = freshLocalDir()
    withStore("file:" + root.getAbsolutePath) {
      val emb = Tables.load(spark, dir, "embeddings")
      val served = graft.rel.PipelineQueries
        .servedGraphFor(spark, uniq("fs-graph"), emb, k = 3)
        .orderBy("vid", "rk").collect().map(_.toSeq).toSeq
      val inline = Similarity.knnGraphAuto(emb, "vec_id", "embedding", k = 3)
        .orderBy("vid", "rk").collect().map(_.toSeq).toSeq
      assert(served == inline,
        "graph served off the FileSystem store must match the inline build")
      // the artifact really lives under the scheme store
      val published = Option(root.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("graph-"))
      assert(published.nonEmpty, "no published graph dir under the fs store")
    }
  }

  test("a POSIX store dir not owned by the current user is refused " +
    "(poisoning guard): the store degrades to disabled, never serves") {
    val foreign = freshLocalDir()
    val lookup = foreign.toPath.getFileSystem
      .getUserPrincipalLookupService
    val other =
      try Some(lookup.lookupPrincipalByName("daemon"))
      catch { case scala.util.control.NonFatal(_) => None }
    assume(other.isDefined, "no 'daemon' principal on this box")
    try java.nio.file.Files.setOwner(foreign.toPath, other.get)
    catch { case scala.util.control.NonFatal(_) =>
      cancel("cannot chown (not privileged) — guard untestable here")
    }
    withStore(foreign.getAbsolutePath) {
      assert(!ModelStore.enabled, "foreign-owned dir must disable the store")
      ModelStore.saveCenters(uniq("foreign"), Array(Array(1.0)))
      assert(Option(foreign.listFiles()).getOrElse(Array.empty).isEmpty,
        "nothing may be written into a foreign-owned dir")
    }
  }

  test("a SYMLINKED store path is refused before being followed: an " +
    "attacker-planted link cannot redirect writes (or clear()'s delete)") {
    val target = freshLocalDir() // victim-owned real dir
    val link = new File(freshLocalDir(), "graft_models_link")
    try java.nio.file.Files.createSymbolicLink(link.toPath, target.toPath)
    catch { case scala.util.control.NonFatal(_) =>
      cancel("filesystem does not support symlinks here")
    }
    withStore(link.getAbsolutePath) {
      assert(!ModelStore.enabled, "symlinked store path must disable the store")
      ModelStore.saveCenters(uniq("sym"), Array(Array(1.0)))
      assert(Option(target.listFiles()).getOrElse(Array.empty).isEmpty,
        "nothing may be written through the symlink")
      ModelStore.clear()
      assert(target.isDirectory, "clear() must not reach through the symlink")
    }
  }

  test("corrupt length prefix: a small poisoned file cannot drive a " +
    "multi-GB allocation — the read fails, the file is deleted, refit wins") {
    val root = freshLocalDir()
    withStore(root.getAbsolutePath) {
      val key = uniq("poison")
      ModelStore.saveCenters(key, Array(Array(1.0, 2.0), Array(3.0, 4.0)))
      val f = Option(root.listFiles()).get
        .find(_.getName.startsWith("centers-")).get
      // overwrite the outer length prefix with a huge value: the file
      // stays ~50 bytes, so the implied 2^30-element allocation must be
      // rejected by the byte-length cross-check (Array.fill allocates
      // BEFORE EOF could fire — pre-fix this was an OOM, an Error that
      // escapes the NonFatal delete-and-refit catch)
      val raf = new java.io.RandomAccessFile(f, "rw")
      try { raf.seek(0); raf.writeInt(1 << 30) } finally raf.close()
      assert(ModelStore.loadCenters(key).isEmpty,
        "poisoned artifact must read as absent")
      assert(!f.exists, "poisoned artifact must be deleted for clean refit")
      // ...and the slot refills on the next save
      ModelStore.saveCenters(key, Array(Array(9.0)))
      assert(ModelStore.loadCenters(key).get.head.toSeq == Seq(9.0))
    }
  }

  test("fingerprint memo refuses mixed file+in-memory frames: a content " +
    "change in a non-file leaf is always observed (round-16 ADVICE)") {
    import spark.implicits._
    // same file inputs, same canonicalized plan SHAPE, same row count —
    // only the LocalRelation's row data differs. A memo keyed on (plan ×
    // file state) alone would serve frame A's digest for frame B; the
    // file-leaf guard must force both calls through the real scan.
    val file = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id").cast("long").as("k"))
    val a = file.union(Seq(100L).toDF("k"))
    val b = file.union(Seq(999L).toDF("k"))
    val fa = ModelStore.fingerprint(a, col("k"))
    val fb = ModelStore.fingerprint(b, col("k"))
    assert(fa._1 == fb._1, "row counts must match (the test isolates the digest)")
    assert(fa._2 != fb._2,
      "digest must reflect the in-memory leaf's content — the memo may " +
        "only fire when every plan leaf is a file-source relation")
    // and pure file-backed frames still memoize coherently (same value
    // from the memo as from the scan)
    val f1 = ModelStore.fingerprint(file, col("k"))
    val f2 = ModelStore.fingerprint(file, col("k"))
    assert(f1 == f2)
  }

  test("default store location is per-user (0700), not a world-shared " +
    "path: the predictable-key poisoning surface of a shared /tmp dir") {
    val saved = ModelStore.overrideDir
    ModelStore.overrideDir = None
    try {
      assume(sys.env.get("SPARK_GRAFT_MODEL_DIR").isEmpty,
        "env overrides the default in this JVM")
      val d = ModelStore.baseDir.get
      val user = sys.props("user.name")
      assert(d.getName == s"graft_models-$user",
        s"default dir ${d.getName} is not per-user")
      val perms = java.nio.file.Files.getPosixFilePermissions(d.toPath)
      import java.nio.file.attribute.PosixFilePermission._
      assert(!perms.contains(GROUP_WRITE) && !perms.contains(OTHERS_WRITE),
        s"default store dir is group/other-writable: $perms")
    } finally ModelStore.overrideDir = saved
  }
}
