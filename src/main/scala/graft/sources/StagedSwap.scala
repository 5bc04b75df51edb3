package graft.sources

/** Atomic-ish directory swap shared by the index compactions: rename
  * the live index aside, move the freshly-written layout into place,
  * then delete the old tree — readers never observe a half-compacted
  * index directory.
  */
object StagedSwap {
  /** Recursive delete — the one shared copy (compactions, tombstone
    * clearing, re-save hygiene all need it).
    */
  private[sources] def rmRf(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmRf)); f.delete(); ()
  }

  def swap(path: String, tmp: String): Unit = {
    val dir = new java.io.File(path)
    val bak = new java.io.File(path + ".old")
    require(dir.renameTo(bak), s"could not stage $path for swap")
    require(new java.io.File(tmp).renameTo(dir), s"could not swap $tmp into $path")
    rmRf(bak)
  }

  /** [[swap]] with a between-renames hook: `carry(bak)` runs after the
    * live dir is staged aside and before the new dir lands, so sidecar
    * files can move from the old tree into `tmp` with no window where
    * the path exists but lacks them.
    */
  def swapCarrying(path: String, tmp: String)(carry: java.io.File => Unit): Unit = {
    val dir = new java.io.File(path)
    val bak = new java.io.File(path + ".old")
    require(dir.renameTo(bak), s"could not stage $path for swap")
    carry(bak)
    require(new java.io.File(tmp).renameTo(dir), s"could not swap $tmp into $path")
    rmRf(bak)
  }
}
