package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo of *fixture table* reads.
  *
  * Every `spark.read.parquet(path)` pays ~100 ms of driver-side work
  * (file listing + footer schema inference) before any plan exists —
  * measured at sf0.1: 0.09–0.12 s per call, every call, versus 0.015 s
  * with a known schema. Across a 264-query bench sweep reading 1–3
  * fixture tables each, that inference tax alone is tens of seconds of
  * pure driver time (guide §6: file listing is meant to be cached per
  * session; Spark only does so for catalog tables, not path reads).
  *
  * This memo returns the SAME analyzed DataFrame for repeated reads of
  * an unchanged directory within one session. It caches *plans*, never
  * data: every action on the returned frame still scans the parquet
  * files (no persist, no result reuse — a noop-sink rerun recomputes
  * everything from disk).
  *
  * Staleness safety: the key includes a signature of the directory's
  * file names, lengths and mtimes (cheap java.io metadata, ~µs for the
  * flat fixture dirs). A fixture that is regenerated or overwritten in
  * place gets a new signature and a fresh read — so tests that write,
  * read, rewrite and re-read the same temp path stay correct. Derived /
  * mutable engine outputs (catalog tiles, vector & text indexes, dedup
  * signature stores) do NOT go through this memo — their lifecycles
  * are owned by their own sources with explicit invalidation.
  *
  * Sessions are weak keys: a stopped session's entries become garbage
  * with it (tests create dozens of sessions per JVM).
  */
object Tables {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[(String, Long), DataFrame]]

  /** Order-independent signature of a file tree's (name, length, mtime)
    * triples — one level deep plus nested dirs, which is all a parquet
    * fixture dir contains. Missing path signs as 0 and stays uncached.
    */
  private def signature(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) {
        val kids = f.listFiles()
        if (kids == null) 0L
        else kids.foldLeft(1000003L)((acc, k) => acc ^ walk(k))
      } else f.getName.hashCode.toLong * 1000000007L ^
        java.lang.Long.rotateLeft(f.length(), 17) ^
        java.lang.Long.rotateLeft(f.lastModified(), 31)
    walk(new java.io.File(path))
  }

  /** Memoized `s.read.parquet(path)` for immutable fixture tables. */
  def parquet(s: SparkSession, path: String): DataFrame = {
    val m = bySession.synchronized {
      var t = bySession.get(s)
      if (t == null) { t = scala.collection.concurrent.TrieMap.empty; bySession.put(s, t) }
      t
    }
    m.getOrElseUpdate((path, signature(path)), s.read.parquet(path))
  }

  /** Memoize an arbitrary fixture-derived frame under the same
    * session + directory-signature discipline — for loaders that do
    * more than a bare read (the events ts-layout probe reads every
    * part footer before deciding how to read the file).
    */
  def memo(s: SparkSession, path: String)(build: => DataFrame): DataFrame = {
    val m = bySession.synchronized {
      var t = bySession.get(s)
      if (t == null) { t = scala.collection.concurrent.TrieMap.empty; bySession.put(s, t) }
      t
    }
    m.getOrElseUpdate(("memo:" + path, signature(path)), build)
  }
}
