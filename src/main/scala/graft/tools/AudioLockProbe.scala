package graft.tools

/** Scratch harness (r17): reproduce the javax.sound per-call provider-lock
  * contention without Spark — N threads each encode+decode WAV fixtures in
  * a loop; a watcher thread samples stacks and prints the hottest
  * lock-owner frames. Usage: runMain graft.tools.AudioLockProbe [threads] [rows]
  */
object AudioLockProbe {
  def main(args: Array[String]): Unit = {
    val nThreads = args.lift(0).map(_.toInt).getOrElse(32)
    val rows = args.lift(1).map(_.toInt).getOrElse(500)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    // sampler: every 50 ms, tally frames of BLOCKED threads
    val tally = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val sampler = new Thread(() => {
      while (!done.get()) {
        Thread.getAllStackTraces.forEach { (t, st) =>
          if (t.getState == Thread.State.BLOCKED && st.nonEmpty) {
            val key = st.take(3).mkString(" <- ")
            tally.merge(key, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
          }
        }
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true); sampler.start()
    val t0 = System.nanoTime()
    val futs = (0 until nThreads).map { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          var i = 0
          while (i < rows) {
            val id = t * rows + i
            val n = 200 + (id % 50)
            val amp = ((id % 100) * 300).toShort
            val wav = graft.operators.Multimodal.encodeWav(8000, Array.fill(n)(amp))
            graft.operators.Multimodal.audioFeaturesProbe(wav, 4)
            i += 1
          }
        }
      })
    }
    futs.foreach(_.get())
    done.set(true)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"AUDIOPROBE threads=$nThreads rows=${nThreads * rows} secs=$secs%.3f")
    import scala.jdk.CollectionConverters._
    tally.asScala.toSeq.sortBy(-_._2).take(5).foreach { case (k, v) =>
      println(s"BLOCKED x$v: $k")
    }
    pool.shutdown()
  }
}
