package graft.operators

import org.apache.spark.sql.SparkSession

/** Staleness token for the driver-local serve caches (IVF/HNSW/PQ/FTS).
  *
  * The r15 guard was a one-level root listing (child name:len:mtime). That
  * is sufficient on local filesystems, where a directory's mtime moves when
  * files inside it are rewritten — but on object stores "directories" are
  * virtual entries with length 0 and mtime 0, so a rebuild that only
  * rewrites files NESTED under e.g. `postings/` or `vectors/__ivf_pid=N/`
  * can leave the root listing string unchanged and the serve LRU answering
  * from the dead index (ADVICE r15 #4).
  *
  * Fix: fold the nested content into the token with a bounded recursive
  * listing — every file at any depth contributes `path:len:mtime`, every
  * directory contributes its name. Depth and entry count are capped so the
  * guard stays a metadata-sized operation: a serve-scale index holds
  * O(nlist) partition directories with a handful of part files each, far
  * under the caps; if a pathological tree exceeds them, the remainder is
  * summarized as `…+N` (the count itself still moves on add/drop, and any
  * in-cap file rewrite moves the token).
  *
  * Granularity caveat (unchanged from r15): a rebuild completing within the
  * same millisecond with identical file names and lengths at every depth is
  * indistinguishable; real rebuilds rewrite part files over many ms.
  */
private[operators] object ServeEpoch {
  private val MaxDepth = 3
  private val MaxEntries = 4096

  /** Recompute throttle: the deep listing costs one listStatus per
    * directory (O(nlist) for a partitioned IVF index), which at serve
    * latencies would dominate every query — RecallProbe measured the
    * unthrottled r16 deep check at ~300 ms/query on an nlist=512 index.
    * Within the TTL the cached token is reused, so a warm query pays
    * ZERO filesystem calls (cheaper than the r15 per-query root listing);
    * a rebuild is noticed at most TTL later — same order as the
    * ms-granularity caveat the token already carries. `serveUnpersist`
    * (via [[invalidate]]) forces an immediate recheck; set 0 to recheck
    * every query (specs pin staleness behavior with this). */
  val TtlKey = "spark.graft.serve.epoch.ttl.ms"
  val DefaultTtlMs = 1000L
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, String)]()

  /** Drop the cached token so the next [[of]] relists immediately. */
  def invalidate(path: String): Unit = memo.remove(path)

  def of(spark: SparkSession, path: String): String = {
    val ttlMs = scala.util.Try(
      spark.conf.get(TtlKey, DefaultTtlMs.toString).toLong)
      .getOrElse(DefaultTtlMs)
    val now = System.nanoTime()
    val hit = memo.get(path)
    if (hit != null && ttlMs > 0 && (now - hit._1) < ttlMs * 1000000L)
      return hit._2
    val ep = compute(spark, path)
    memo.put(path, (now, ep))
    ep
  }

  private def compute(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return "absent"
    val entries = scala.collection.mutable.ArrayBuffer[String]()
    var overflow = 0L
    def walk(dir: org.apache.hadoop.fs.Path, prefix: String, depth: Int): Unit = {
      val kids = fs.listStatus(dir).sortBy(_.getPath.getName)
      kids.foreach { s =>
        val name = s"$prefix${s.getPath.getName}"
        if (entries.size >= MaxEntries) overflow += 1
        else if (s.isDirectory) {
          entries += name
          if (depth < MaxDepth) walk(s.getPath, s"$name/", depth + 1)
          else overflow += 1 // depth-capped subtree: count it so adds still move the token
        } else entries += s"$name:${s.getLen}:${s.getModificationTime}"
      }
    }
    walk(p, "", 1)
    val body = entries.mkString(";")
    if (overflow == 0) body else s"$body;…+$overflow"
  }
}

/** Shared epoch-staleness guard for a family's driver-local serve caches —
  * the one piece of serve plumbing every family (IVF/HNSW/PQ/SQ/RQ/
  * hamming/FTS) previously re-implemented: an epoch map keyed by index
  * path, compared against [[ServeEpoch.of]] on every serve entry point,
  * purging the family's resident state (the `purge` hook) on mismatch.
  * `forget` drops the remembered epoch AND the [[ServeEpoch]] memo so the
  * next query relists immediately (the serveUnpersist contract). */
private[operators] final class ServeFreshness(purge: String => Unit) {
  private val epochs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Purge the family's resident state for `indexPath` if its on-disk
    * epoch moved since the last check. */
  def ensure(spark: SparkSession, indexPath: String): Unit = {
    val ep = ServeEpoch.of(spark, indexPath)
    val prev = epochs.put(indexPath, ep)
    if (prev != null && prev != ep) purge(indexPath)
  }

  /** Forget an index entirely (serveUnpersist): next check relists. */
  def forget(indexPath: String): Unit = {
    epochs.remove(indexPath)
    ServeEpoch.invalidate(indexPath)
  }
}
