package graft.operators

import org.apache.spark.sql.SparkSession

/** Driver-resident per-partition code cache shared by the quantized
  * single-query serve paths ([[PqIndex]], [[SqIndex]]): an access-order
  * LRU of (indexPath, pid) → (id, codes) arrays with the serve-cache
  * contract the float twins established — conf-driven budget, immediate
  * shrink eviction (ADVICE r14), hit/miss counters for cache_stats, and
  * per-index purge for the epoch staleness guard. Codes are m (PQ), d
  * (SQ) or d/8 (RQ/binary) bytes per vector — the 4–32× ratio that makes
  * a quantized index the serve-scale resident set. The Float slot carries
  * RQ's residual norm (0 for the other families). */
private[operators] final class ServeCodesCache(val budgetKey: String,
                                               defaultCapacity: Int) {
  @volatile private var capacity = defaultCapacity
  def currentCapacity: Int = capacity
  val hits = new java.util.concurrent.atomic.AtomicLong(0)
  val misses = new java.util.concurrent.atomic.AtomicLong(0)
  private val rows =
    new java.util.LinkedHashMap[(String, Int), Array[(Long, Array[Byte], Float)]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Int), Array[(Long, Array[Byte], Float)]]): Boolean =
        size() > capacity
    }

  def size: Int = rows.synchronized(rows.size())

  /** Re-read the budget conf; shrinking evicts LRU-first immediately. */
  def refresh(spark: SparkSession): Int = {
    val cap = math.max(1, scala.util.Try(
      spark.conf.get(budgetKey, defaultCapacity.toString).toInt)
      .getOrElse(defaultCapacity))
    if (cap < capacity) rows.synchronized {
      capacity = cap
      val it = rows.entrySet().iterator() // access-order: LRU first
      while (rows.size() > cap && it.hasNext) { it.next(); it.remove() }
    } else capacity = cap
    cap
  }

  /** Drop one index's resident partitions. */
  def purge(indexPath: String): Unit = rows.synchronized {
    val it = rows.keySet().iterator()
    while (it.hasNext) if (it.next()._1 == indexPath) it.remove()
  }

  /** Resident rows for (indexPath, pid), loading with `load` on a miss.
    * The cold load runs OUTSIDE the lock (a racing duplicate load is
    * benign, a blocked warm query is not). */
  def getOrLoad(spark: SparkSession, indexPath: String, pid: Int)
               (load: => Array[(Long, Array[Byte], Float)]): Array[(Long, Array[Byte], Float)] = {
    refresh(spark)
    rows.synchronized {
      val hit = rows.get((indexPath, pid))
      if (hit != null) { hits.incrementAndGet(); return hit }
    }
    misses.incrementAndGet()
    val loaded = load
    rows.synchronized { rows.put((indexPath, pid), loaded) }
    loaded
  }
}
