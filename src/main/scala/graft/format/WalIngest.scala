package graft.format

import java.util.UUID
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Commit-batched write-ahead ingest — the Spark-native shape of the
  * reference's experimental MemWAL (`rust/lance-index/src/mem_wal.rs`:
  * per-region WAL with generations, Open → Sealed → Flushed → Merged
  * states, owner fencing; manifest op `UpdateMemWal`,
  * `transaction.rs:267`).
  *
  * The problem both solve: a manifest CAS commit per tiny append melts
  * under high-frequency ingest — N writers × M batches/sec all contend on
  * one commit point. Here an append writes parquet batches into a
  * region's generation directory with NO manifest commit (unique file
  * names — concurrent appends to the same or different regions never
  * conflict), and `flush` folds everything the generation holds into the
  * table in ONE commit via the zero-copy [[GraftTable.commitFiles]] import
  * (in-place rename to fragment naming + one CAS). N·M appends become 1
  * commit: commit batching, not a low-latency single-row serving path —
  * the part of MemWAL that matters for a Spark batch/streaming engine.
  * (A memtable serving un-flushed rows to point reads is a serving-system
  * concern; here un-flushed rows are visible through [[readWithWal]]'s
  * union instead.)
  *
  * Layout (under the table root, so multi-base path resolution and
  * `cleanupOldVersions` — which sweeps only data/deletes/columns — are
  * unaffected):
  * {{{
  *   _wal/<region>/gen-<g>.json              state: {state, owner}
  *   _wal/<region>/gen-<g>/batch-*.parquet   appended batches (PHYSICAL schema)
  * }}}
  *
  * Fencing and crash-safety:
  *  - one Open generation per region; `open` creates the state file with
  *    create-no-overwrite (atomic on HDFS/local, the same primitive the
  *    manifest CAS relies on), so two writers cannot both own a generation.
  *  - `append`/`seal`/`flush` verify the caller's `owner` against the
  *    state file — the reference's `owner_id` fence. Like the reference's
  *    (experimental) design this is cooperative fencing, not byzantine.
  *  - a crash mid-append leaves files under `_tmp-*` staging dirs only —
  *    never listed as batches; re-append is safe.
  *  - a crash mid-flush can leave batches already frag-renamed by
  *    `commitFiles` but uncommitted; re-flush picks them up again because
  *    the flush list is (batch-*.parquet ∪ frag-*.parquet not referenced
  *    by the manifest) — idempotent resume, no duplicates (a committed
  *    frag IS referenced and is never re-imported).
  *  - flushed fragments keep living in the generation directory
  *    (zero-copy); a later compaction rewrites them into `data/` like any
  *    fragment, after which [[cleanupMerged]] marks the generation Merged
  *    and removes the leftovers.
  *
  * At 100 TB: appends are O(batch) with zero coordination; flush is one
  * footer-stat pass over the new files (executor-parallel) + one CAS;
  * nothing here scales with table size.
  */
object WalIngest {

  case class GenState(generation: Long, state: String, owner: String)

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def regionDir(table: String, region: String) = {
    require(region.nonEmpty && region.matches("[A-Za-z0-9_\\-]+"),
      s"region must be alphanumeric/_/-, got '$region'")
    new Path(s"$table/_wal/$region")
  }

  private def stateFile(table: String, region: String, gen: Long) =
    new Path(regionDir(table, region), s"gen-$gen.json")

  private def genDir(table: String, region: String, gen: Long) =
    new Path(regionDir(table, region), s"gen-$gen")

  private def readState(fs: FileSystem, f: Path): Option[GenState] =
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      val s = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
      def field(k: String) =
        s""""$k"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))
      val gen = "\"generation\"\\s*:\\s*(\\d+)".r
        .findFirstMatchIn(s).map(_.group(1).toLong)
      Some(GenState(gen.getOrElse(-1L),
        field("state").getOrElse("?"), field("owner").getOrElse("")))
    }

  private def writeState(fs: FileSystem, f: Path, st: GenState,
                         exclusive: Boolean): Unit = {
    val json =
      s"""{"generation": ${st.generation}, "state": "${st.state}", "owner": "${st.owner}"}"""
    if (exclusive) {
      // create-no-overwrite: the open() fence
      val out = fs.create(f, false)
      try out.write(json.getBytes("UTF-8")) finally out.close()
    } else {
      // state transition: temp + rename (single owner writes, so the
      // last-writer-wins rename is within-protocol)
      val tmp = new Path(f.getParent, s".${f.getName}.${UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, true)
      try out.write(json.getBytes("UTF-8")) finally out.close()
      fs.delete(f, false)
      if (!fs.rename(tmp, f)) throw new IllegalStateException(s"state write lost: $f")
    }
  }

  /** All generations of a region, ascending. */
  def generations(spark: SparkSession, table: String, region: String): Seq[GenState] = {
    val dir = regionDir(table, region)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).map(_.getPath.getName).collect {
      case n if n.matches("gen-\\d+\\.json") =>
        n.stripPrefix("gen-").stripSuffix(".json").toLong
    }.sorted.toSeq.flatMap(g => readState(fs, stateFile(table, region, g)))
  }

  private def currentOpen(spark: SparkSession, table: String,
                          region: String): Option[GenState] =
    generations(spark, table, region).find(_.state == "Open")

  /** Open the region's next generation, fenced to `owner`. Errors if an
    * Open generation exists (one writer per region, like the reference's
    * single MemWAL owner per region-generation). */
  def open(spark: SparkSession, table: String, region: String,
           owner: String): Long = {
    GraftTable.loadManifest(spark, table) // table must exist
    val gens = generations(spark, table, region)
    gens.find(_.state == "Open").foreach { g =>
      throw new IllegalStateException(
        s"region '$region' generation ${g.generation} is already Open " +
          s"(owner ${g.owner}); seal or flush it first")
    }
    val next = gens.lastOption.map(_.generation + 1).getOrElse(0L)
    val dir = regionDir(table, region)
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    writeState(fs, stateFile(table, region, next),
      GenState(next, "Open", owner), exclusive = true)
    next
  }

  private def requireOwned(spark: SparkSession, table: String, region: String,
                           owner: String, wantState: String): GenState = {
    val g = currentOpen(spark, table, region)
      .orElse(generations(spark, table, region).lastOption)
      .getOrElse(throw new IllegalStateException(s"region '$region' has no generation — open() first"))
    require(g.state == wantState,
      s"region '$region' generation ${g.generation} is ${g.state}, need $wantState")
    require(g.owner == owner,
      s"region '$region' generation ${g.generation} is owned by '${g.owner}', not '$owner'")
    g
  }

  /** Append a batch to the region's Open generation — NO manifest commit.
    * The batch is written in the table's PHYSICAL column layout (so flush
    * imports it untouched) through a staging dir + renames: a crash leaves
    * only `_tmp-*` debris, never a half-visible batch. Returns the number
    * of batch files added. */
  def append(spark: SparkSession, table: String, region: String,
             owner: String, df: DataFrame): Int = {
    val g = requireOwned(spark, table, region, owner, "Open")
    val m = GraftTable.loadManifest(spark, table)
    // fail fast on schema drift (flush would reject it much later)
    val want = m.schema.fieldNames.toSet
    val got = df.columns.toSet
    require(got == want,
      s"WAL append schema mismatch: got ${got.toSeq.sorted.mkString(",")}, " +
        s"table has ${want.toSeq.sorted.mkString(",")}")
    val dest = genDir(table, region, g.generation)
    val fs = fsOf(spark, dest)
    val tmp = new Path(dest, s"_tmp-${UUID.randomUUID().toString.take(12)}")
    GraftTable.toPhysical(df, m).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val parts = fs.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet"))
    val id = UUID.randomUUID().toString.take(12)
    parts.zipWithIndex.foreach { case (p, i) =>
      val to = new Path(dest, s"batch-$id-$i.parquet")
      if (!fs.rename(p.getPath, to))
        throw new IllegalStateException(s"WAL batch rename failed: ${p.getPath} -> $to")
    }
    fs.delete(tmp, true)
    parts.length
  }

  /** Open → Sealed: no further appends; the generation is flushable. */
  def seal(spark: SparkSession, table: String, region: String, owner: String): Unit = {
    val g = requireOwned(spark, table, region, owner, "Open")
    val fs = fsOf(spark, regionDir(table, region))
    writeState(fs, stateFile(table, region, g.generation),
      g.copy(state = "Sealed"), exclusive = false)
  }

  /** Fold every batch the generation holds into the table in ONE commit
    * (zero-copy [[GraftTable.commitFiles]] append), then mark Flushed.
    * Seals first if still Open. Idempotent across crashes: the flush list
    * is batch files ∪ frag-renamed-but-unreferenced files (a commitFiles
    * attempt that died between rename and CAS), and committed fragments
    * are never re-imported. Returns rows flushed. */
  def flush(spark: SparkSession, table: String, region: String,
            owner: String): Long = {
    val gens = generations(spark, table, region)
    val g = gens.find(g => g.state == "Open" || g.state == "Sealed")
      .getOrElse(throw new IllegalStateException(
        s"region '$region' has no Open/Sealed generation to flush"))
    require(g.owner == owner,
      s"region '$region' generation ${g.generation} is owned by '${g.owner}', not '$owner'")
    val fs = fsOf(spark, regionDir(table, region))
    if (g.state == "Open")
      writeState(fs, stateFile(table, region, g.generation),
        g.copy(state = "Sealed"), exclusive = false)
    val dir = genDir(table, region, g.generation)
    val referenced = GraftTable.loadManifest(spark, table)
      .fragments.map(_.path).toSet
    val files =
      if (!fs.exists(dir)) Nil
      else fs.listStatus(dir).map(_.getPath).filter { p =>
        val n = p.getName
        n.matches("batch-.*\\.parquet") ||
          // crashed-flush resume: frag-renamed but never committed
          (n.matches("frag-\\d+\\.parquet") && !referenced.contains(p.toString))
      }.map(_.toString).toSeq.sorted
    val rows =
      if (files.isEmpty) 0L
      else {
        val m = GraftTable.commitFiles(spark, table, files, "append")
        m.opStats.getOrElse("num_inserted_rows", 0L)
      }
    writeState(fs, stateFile(table, region, g.generation),
      g.copy(state = "Flushed"), exclusive = false)
    rows
  }

  /** The table's rows PLUS the un-flushed WAL tail of `regions` (every
    * Open/Sealed generation's batches), logical column names restored —
    * what the reference serves from the memtable, expressed as a union.
    * WAL rows carry no `_rowid`/`_rowaddr` (they are not committed yet). */
  def readWithWal(spark: SparkSession, table: String,
                  regions: Seq[String]): DataFrame = {
    val m = GraftTable.loadManifest(spark, table)
    val batches = regions.flatMap { r =>
      generations(spark, table, r)
        .filter(g => g.state == "Open" || g.state == "Sealed")
        .flatMap { g =>
          val dir = genDir(table, r, g.generation)
          val fs = fsOf(spark, dir)
          if (!fs.exists(dir)) Nil
          else fs.listStatus(dir).map(_.getPath)
            .filter(_.getName.matches("batch-.*\\.parquet")).map(_.toString)
        }
    }
    val base = GraftTable.read(spark, table)
    if (batches.isEmpty) base
    else {
      val phys = spark.read.schema(m.physicalSchema).parquet(batches: _*)
      val byPhys = m.schema.fields.map(f => m.physicalName(f) -> f).toMap
      val logical = phys.select(phys.columns.toSeq.map { c =>
        byPhys.get(c) match {
          case Some(f) if SchemaPaths.hasNestedIndirection(f.dataType) =>
            col(c).cast(SchemaPaths.nullableAll(SchemaPaths.cleanType(f.dataType))).as(f.name)
          case Some(f) => col(c).as(f.name)
          case None => col(c)
        }
      }: _*)
      base.unionByName(logical, allowMissingColumns = false)
    }
  }

  /** Mark Flushed generations whose fragments a later compaction rewrote
    * out of the WAL directory as Merged, deleting their leftover files.
    * A Flushed generation whose files are still live fragments is left
    * alone (its files ARE the table data — zero-copy flush). */
  def cleanupMerged(spark: SparkSession, table: String, region: String): Int = {
    val m = GraftTable.loadManifest(spark, table)
    val referenced = m.fragments.map(_.path).toSet
    val fs = fsOf(spark, regionDir(table, region))
    var merged = 0
    generations(spark, table, region).filter(_.state == "Flushed").foreach { g =>
      val dir = genDir(table, region, g.generation)
      val live = fs.exists(dir) && fs.listStatus(dir).exists(p =>
        referenced.contains(p.getPath.toString))
      if (!live) {
        if (fs.exists(dir)) fs.delete(dir, true)
        writeState(fs, stateFile(table, region, g.generation),
          g.copy(state = "Merged"), exclusive = false)
        merged += 1
      }
    }
    merged
  }
}
