package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable

/** Multi-writer chaos: concurrent appends, deletes, and compactions racing
  * on the CAS commit loop with the r8 rewrite-rebase rules. The invariants
  * a storage format must hold under contention, checked at the end:
  * every appended row is present exactly once, every deleted id is gone,
  * and `validate()` reports zero problems. */
class ConcurrencyChaosSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_chaos_").toString + "/t"

  /** Retry an op that may abort on a genuine commit conflict. */
  private def withRetry[A](maxAttempts: Int = 12)(body: => A): A = {
    var last: Throwable = null
    for (_ <- 1 to maxAttempts) {
      try return body
      catch {
        case e: IllegalStateException if e.getMessage != null &&
            e.getMessage.contains("conflict") =>
          last = e; Thread.sleep(20)
      }
    }
    throw last
  }

  test("4 appenders + deleter + compactor: no lost rows, validate clean") {
    val t = tmp()
    GraftTable.write(Seq((0L, "seed")).toDF("id", "v"), t, "overwrite")
    val perWriter = 5 // batches per appender
    val appenders = 4
    SparkSession.setActiveSession(spark)
    val pool = Executors.newFixedThreadPool(appenders + 2)
    val start = new CountDownLatch(1)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // each appender owns a disjoint id range: writer w batch b appends ids
    // [base, base+10)
    def submit(body: => Unit): Unit = pool.submit(new Runnable {
      override def run(): Unit = {
        SparkSession.setActiveSession(spark)
        start.await()
        try body catch { case e: Throwable => errors.add(e) }
      }
    })
    for (w <- 0 until appenders) submit {
      for (b <- 0 until perWriter) {
        val base = 1000L * (w * perWriter + b + 1)
        GraftTable.write((base until base + 10)
          .map(i => (i, s"w$w-b$b")).toDF("id", "v"), t, "append")
      }
    }
    // deleter: repeatedly deletes a fixed predicate (ids ending in 3 within
    // committed data) — deletes rebase over appends via guardStagedBase
    submit {
      for (_ <- 1 to 6) {
        withRetry() { GraftTable.delete(spark, t, "id % 1000 = 3") }
        Thread.sleep(30)
      }
    }
    // compactor: full compactions that rebase over concurrent appends and
    // abort (then retry) when a delete landed mid-flight
    submit {
      for (_ <- 1 to 3) {
        withRetry() { GraftTable.compact(spark, t, targetRows = 500) }
        Thread.sleep(50)
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "chaos run timed out")
    assert(errors.isEmpty, s"writer errors: ${errors.toArray.mkString("; ")}")

    // final delete makes the deleted-set deterministic regardless of
    // append/delete interleaving
    withRetry() { GraftTable.delete(spark, t, "id % 1000 = 3") }

    val got = GraftTable.read(spark, t).select("id").as[Long].collect().sorted
    val expected = (Seq(0L) ++ (for {
      w <- 0 until appenders; b <- 0 until perWriter
      base = 1000L * (w * perWriter + b + 1)
      i <- base until base + 10
    } yield i)).filterNot(_ % 1000 == 3).sorted
    assert(got.length == expected.length,
      s"row count: got ${got.length}, expected ${expected.length}")
    assert(got.toSeq == expected, "exact id set after chaos")
    assert(GraftTable.validate(spark, t).isEmpty, "validate() clean")
  }
}
