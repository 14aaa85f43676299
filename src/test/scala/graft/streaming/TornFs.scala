package graft.streaming

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileUtil, RawLocalFileSystem,
  Path => HPath}

/** A test FileSystem simulating OBJECT-STORE storage semantics on local
  * disk, for the [[ObjectStoreContractSpec]] contract tests:
  *
  *  - `rename` is COPY-THEN-DELETE (S3A-class), never atomic — with an
  *    injectable crash mid-copy ([[TornFs.crashWhenRenamingTo]]) that
  *    leaves an observable torn destination, exactly the window the
  *    protocol documents for copy-rename schemes;
  *  - `listStatus` can LAG ([[TornFs.hideFromListing]]): just-written
  *    entries are invisible to listings while remaining readable by
  *    direct path — the list-after-write inconsistency the chain-file
  *    read path exists to survive.
  *
  * Registered under the `torn:` scheme via `fs.torn.impl` (FileSystem
  * API) and `fs.AbstractFileSystem.torn.impl` (FileContext pointer
  * swaps). Flags are process-global: the FileSystem cache hands every
  * caller the same semantics. */
class TornFs extends RawLocalFileSystem {
  override def getScheme: String = "torn"
  override def getUri: URI = TornFs.NAME

  override def listStatus(p: HPath): Array[FileStatus] = {
    val raw = super.listStatus(p)
    val hide = TornFs.hideFromListing
    if (hide.isEmpty) raw
    else raw.filterNot(s => hide.contains(s.getPath.getName))
  }

  override def rename(src: HPath, dst: HPath): Boolean = {
    val st = getFileStatus(src) // throws FileNotFoundException like real FS
    val crash = TornFs.crashWhenRenamingTo.exists(_(dst.getName))
    if (st.isDirectory) {
      mkdirs(dst)
      val kids = super.listStatus(src) // unfiltered: lag is read-side only
      val n = if (crash) kids.length / 2 else kids.length
      kids.take(n).foreach { k =>
        FileUtil.copy(this, k.getPath, this,
          new HPath(dst, k.getPath.getName), false, getConf)
      }
      if (crash) {
        TornFs.crashWhenRenamingTo = None // one-shot
        throw new java.io.IOException(
          s"TornFs: simulated crash mid-rename to $dst (torn window)")
      }
      delete(src, true)
      true
    } else {
      FileUtil.copy(this, src, this, dst, false, true, getConf)
      if (crash) {
        TornFs.crashWhenRenamingTo = None
        throw new java.io.IOException(
          s"TornFs: simulated crash renaming file to $dst")
      }
      delete(src, false)
      true
    }
  }
}

object TornFs {
  val NAME: URI = URI.create("torn:///")

  /** When set, the next rename whose DESTINATION name matches copies
    * only half the entries, throws, and clears itself (one-shot). */
  @volatile var crashWhenRenamingTo: Option[String => Boolean] = None

  /** Child names invisible to listStatus (still readable directly). */
  @volatile var hideFromListing: Set[String] = Set.empty

  def reset(): Unit = { crashWhenRenamingTo = None; hideFromListing = Set.empty }

  /** Install the torn: scheme into `conf` (idempotent). */
  def install(conf: Configuration): Unit = {
    conf.set("fs.torn.impl", classOf[TornFs].getName)
    conf.set("fs.AbstractFileSystem.torn.impl", classOf[TornAbstractFs].getName)
  }
}

/** FileContext-side delegate so the protocol's pointer swaps
  * (FileContext rename OVERWRITE) also route through [[TornFs]]. */
class TornAbstractFs(uri: URI, conf: Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new TornFs, conf, "torn", false)
