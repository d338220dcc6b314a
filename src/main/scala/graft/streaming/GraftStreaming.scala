package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import graft.format.GraftTable

/** Structured Streaming integration for graft tables (SURVEY §2.10).
  *
  * The reference has no streaming engine; its incremental story is
  * version-per-commit + `delta.rs` version diffs. The Spark-native mapping:
  *
  *  - **sink**: one micro-batch = one `append` commit ([[foreachBatchSink]]),
  *    idempotent under Spark's batch replay because the last committed
  *    batchId per query is recorded in the manifest config and replays are
  *    skipped — the same recipe Delta's idempotent sinks use.
  *  - **source**: [[readChanges]] reads the rows a version range appended
  *    (fragments carry `addedVersion`), i.e. the reference's
  *    `dataset.delta` capability.
  *
  * Watermarks, windows and stateful operators then compose upstream of the
  * sink for free — a superset of the reference at no extra cost.
  */
object GraftStreaming {

  private def batchKey(queryId: String) = s"streaming.$queryId.lastBatchId"

  /** Exactly-once micro-batch commit, shared by [[foreachBatchSink]] and
    * `writeStream.format("graft")` ([[graft.format.GraftDataSource]]'s
    * sink): batch data + batch id land in ONE CAS commit, so a batch id at
    * or below the recorded high-water mark is a replay and skips. */
  def commitBatch(tablePath: String, batch: DataFrame, batchId: Long,
                  queryId: String = "default"): Unit = {
    val spark = batch.sparkSession
    val last = GraftTable.latestVersion(spark, tablePath)
      .map(_ => GraftTable.loadManifest(spark, tablePath))
      .flatMap(_.config.get(batchKey(queryId)).map(_.toLong))
    if (last.forall(_ < batchId)) {
      GraftTable.write(batch, tablePath, "append",
        configUpdates = Map(batchKey(queryId) -> batchId.toString))
    } // else: replayed batch, already committed — skip
  }

  /** Use as `stream.writeStream.foreachBatch(GraftStreaming.foreachBatchSink(path)).start()`. */
  def foreachBatchSink(tablePath: String, queryId: String = "default"):
      (Dataset[Row], Long) => Unit = { (batch, batchId) =>
    commitBatch(tablePath, batch.toDF(), batchId, queryId)
  }

  /** Rows appended in versions (fromVersion, toVersion]. */
  def readChanges(spark: SparkSession, tablePath: String,
                  fromVersion: Long, toVersion: Long): DataFrame = {
    val m = GraftTable.loadManifest(spark, tablePath, Some(toVersion))
    val newFrags = m.fragments.filter(f => f.addedVersion > fromVersion && f.addedVersion <= toVersion)
    GraftTable.readFragments(spark, tablePath, m, newFrags)
  }

  /** Streaming exact-dedup with custom state (`flatMapGroupsWithState`): the
    * first row per key passes, every later duplicate — within a batch or
    * across batches — is dropped. Keys are content digests (e.g.
    * `xxhash64(text)`), so state per key is one boolean; at scale, state is
    * hash-partitioned by key across executors and checkpointed by Spark.
    * This is the streaming leg of the dedup family in `operators/Dedup` —
    * dedup-at-ingest before rows ever reach the table. */
  /** Streaming gap-based sessionization: the Structured Streaming twin of
    * `operators/Sessionize` (whose spec proves the batch labeling equals
    * this aggregate's windows). Native `session_window` + a watermark —
    * Spark's SessionWindowStateStore merges windows per key as events
    * arrive and EMITS a session only once the watermark passes its close
    * (Append mode), so late events inside the lateness bound still extend
    * their session. State is keyed by (keys..., window) and
    * hash-partitioned across executors; per-key open-session state is
    * O(open sessions), never O(events). */
  def sessionizeStream(df: DataFrame, keys: Seq[String], tsCol: String,
                       gapSeconds: Long, watermarkDelay: String): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keys.nonEmpty, "sessionizeStream needs at least one key column")
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), s"$gapSeconds seconds") +:
        keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .select(keys.map(col) :+ col("session_start") :+
        col("session_end") :+ col("n_events"): _*)
  }

  def dedupStream[K, V](ds: Dataset[V], key: V => K)(
      implicit ke: org.apache.spark.sql.Encoder[K],
      ve: org.apache.spark.sql.Encoder[V]): Dataset[V] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    implicit val boolEnc: org.apache.spark.sql.Encoder[Boolean] =
      org.apache.spark.sql.Encoders.scalaBoolean
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, V](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: K, rows: Iterator[V], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // key already emitted in a past batch
          else {
            state.update(true)
            rows.take(1) // first occurrence within this batch
          }
      }
  }
}
