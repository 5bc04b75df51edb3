package graft.sources

/** Atomic-ish directory swap shared by the index compactions: rename
  * the live index aside, move the freshly-written layout into place,
  * then delete the old tree — readers never observe a half-compacted
  * index directory.
  */
object StagedSwap {
  def swap(path: String, tmp: String): Unit = {
    val dir = new java.io.File(path)
    val bak = new java.io.File(path + ".old")
    def rmRf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmRf)); f.delete(); ()
    }
    require(dir.renameTo(bak), s"could not stage $path for swap")
    require(new java.io.File(tmp).renameTo(dir), s"could not swap $tmp into $path")
    rmRf(bak)
  }
}
