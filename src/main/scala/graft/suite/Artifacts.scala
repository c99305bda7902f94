package graft.suite

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped corpus-index artifact cache — the generalized form of
  * the dedup shared-index memo, shared by every suite that builds a
  * read-many index over a test table (dedup pair graph/labels over
  * `documents`, IVF distance frame over `embeddings`).
  *
  * Keying: (session, dir, input table, content fingerprint, kind). The
  * fingerprint (size+mtime of every input file, the
  * [[graft.operators.Bucketing]] scheme) makes data regenerated AT THE
  * SAME PATH rebuild the artifact instead of serving the previous
  * corpus's index; a rebuild unpersists the superseded frame, and a
  * session-end listener drops the session's entries.
  *
  * Builds run under a plain reentrant lock, NOT computeIfAbsent: build
  * lambdas may memoize their own dependencies, and ConcurrentHashMap
  * forbids recursive updates from inside a mapping function.
  */
object Artifacts {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String, Long, String), DataFrame]()
  private val cleanupHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  private def fingerprint(s: SparkSession, dir: String, table: String): Long =
    graft.operators.Bucketing.contentFingerprint(Registry.tbl(s, dir, table))

  /** Drop (and unpersist) every cached artifact belonging to `s`. */
  def clear(s: SparkSession): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        try e.getValue.unpersist(blocking = false) catch { case _: Throwable => () }
        it.remove()
      }
    }
  }

  /** Re-pin every cached artifact of `s` after a session-wide cache
    * clear (bench between-lap maintenance).
    */
  def rewarmAll(s: SparkSession): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) { e.getValue.persist(); e.getValue.count() }
    }
  }

  def memo(s: SparkSession, dir: String, table: String, key: String)(
      build: => DataFrame): DataFrame = {
    val fp = fingerprint(s, dir, table)
    val k = (s, dir, table, fp, key)
    val hit = cache.get(k)
    if (hit ne null) return hit
    cache.synchronized {
      val again = cache.get(k)
      if (again ne null) return again
      if (cleanupHooked.add(s))
        s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            clear(s)
        })
      // evict artifacts built from a previous generation of this input
      val it = cache.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if ((e.getKey._1 eq s) && e.getKey._2 == dir && e.getKey._3 == table &&
            e.getKey._4 != fp) {
          try e.getValue.unpersist(blocking = false) catch { case _: Throwable => () }
          it.remove()
        }
      }
      val df = build.persist()
      df.count()
      cache.put(k, df)
      df
    }
  }
}
