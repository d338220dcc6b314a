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
  * one commit point. Here an append writes a parquet batch DIRECTORY into
  * a region's generation with NO manifest commit (unique names —
  * concurrent appends never conflict), and `flush` folds everything the
  * generation holds into the table in ONE commit via the zero-copy
  * [[GraftTable.commitFiles]] import. N·M appends become 1 commit:
  * commit batching, not a low-latency single-row serving path — the part
  * of MemWAL that matters for a Spark batch/streaming engine. (A memtable
  * serving un-flushed rows to point reads is a serving-system concern;
  * here un-flushed rows are visible through [[readWithWal]]'s union.)
  *
  * Layout (under the table root, so multi-base path resolution and
  * `cleanupOldVersions` — which sweeps only data/deletes/columns — are
  * unaffected):
  * {{{
  *   _wal/<region>/gen-<g>.s0.json          Open marker {generation, owner, base}
  *   _wal/<region>/gen-<g>.s1.json          Sealed marker (presence = state)
  *   _wal/<region>/gen-<g>.s2.json          Flushed marker
  *   _wal/<region>/gen-<g>.s3.json          Merged marker
  *   _wal/<region>/gen-<g>/batch-<id>/ part files   one DIRECTORY per batch
  * }}}
  *
  * Fencing and crash-safety (each invariant carries its mechanism):
  *  - one Open generation per region: `open` creates the `.s0` marker
  *    through the session's [[CommitHandler]] — the same CAS primitive
  *    the manifest commit uses (FS atomic create, or the external-KV
  *    claim on object stores without one) — so two writers cannot both
  *    own a generation.
  *  - state transitions NEVER delete or rewrite a marker: each transition
  *    is an exclusive create of the NEXT `.sN` file and the current state
  *    is the highest marker present. There is no window where a
  *    generation's state vanishes, and a generation number can never be
  *    reused: markers survive until the generation is Merged, after
  *    which the region's `hw-<G>.json` high water (create-only,
  *    ratchets up) stands in for every compacted generation ≤ G.
  *  - a batch becomes visible by ONE `_BATCH_READY` marker create inside
  *    its directory, through the commit handler, AFTER all part files are
  *    durable (no atomic directory rename anywhere — object stores have
  *    none): a crash mid-append leaves an unready directory that nothing
  *    reads and a retry overwrites; never a torn batch.
  *  - a crash mid-flush can leave batch files already frag-renamed by
  *    `commitFiles` (possibly into nested `import-*` collision subdirs)
  *    but uncommitted; re-flush lists the generation RECURSIVELY and
  *    re-imports every parquet file the manifest does not reference —
  *    idempotent resume, no loss, no duplicates.
  *  - `open` stamps the table version; `flush`/`readWithWal` check for an
  *    OVERWRITE or RESTORE committed since and refuse/skip a fenced
  *    generation (its rows predate a truncation that was supposed to
  *    remove them) — [[discard]] is the explicit escape hatch.
  *  - flushed fragments keep living in the generation directory
  *    (zero-copy); a later compaction rewrites them into `data/` like any
  *    fragment, after which [[cleanupMerged]] marks the generation Merged
  *    and removes the leftovers.
  *
  * At 100 TB: appends are O(batch) with zero coordination; flush is one
  * footer-stat pass over the new files (executor-parallel) + one CAS;
  * the fence check walks only the manifests committed SINCE the
  * generation opened. Nothing here scales with table size.
  */
object WalIngest {

  private val States = Array("Open", "Sealed", "Flushed", "Merged")

  case class GenState(generation: Long, state: String, owner: String,
                      base: Long) {
    private[WalIngest] def seq: Int = States.indexOf(state)
  }

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def regionDir(table: String, region: String) = {
    require(region.nonEmpty && region.matches("[A-Za-z0-9_\\-]+"),
      s"region must be alphanumeric/_/-, got '$region'")
    new Path(s"$table/_wal/$region")
  }

  private def marker(table: String, region: String, gen: Long, seq: Int) =
    new Path(regionDir(table, region), s"gen-$gen.s$seq.json")

  private def genDir(table: String, region: String, gen: Long) =
    new Path(regionDir(table, region), s"gen-$gen")

  /** Advance a generation to `seq` by exclusive create of the next marker
    * — never deletes, never rewrites, so state can only move forward and
    * is never transiently absent. A marker that already exists is fine
    * (the transition happened; callers re-verify what they need). Goes
    * through the session's [[CommitHandler]]: racing advancers of the
    * same generation write byte-identical content, so even a lost race
    * is semantics-preserving, but the handler keeps the create safe on
    * stores without atomic create. */
  private def advance(spark: SparkSession, fs: FileSystem, table: String,
                      region: String, g: GenState, seq: Int): Unit = {
    val f = marker(table, region, g.generation, seq)
    if (fs.exists(f)) return
    val json =
      s"""{"generation": ${g.generation}, "owner": "${g.owner}", "base": ${g.base}}"""
    CommitHandler.forSession(spark).commit(fs, f, json.getBytes("UTF-8"))
  }

  /** Immutable `.s0` payloads (owner/base never change once written),
    * cached per (table, region, generation): a long-lived region's
    * listing costs one marker read per NEW generation, not one per
    * historical generation per call. */
  private val s0Cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Long), (String, Long)]()

  /** (live generations ascending, merged-through high water). Generations
    * at or below the high water are Merged with their markers compacted
    * away ([[cleanupMerged]]) and are NOT listed — the `hw-<G>.json` file
    * is committed BEFORE any marker deletion and only superseded by a
    * higher one, so no listing can ever see a partially-deleted
    * generation without also seeing a high water that covers it. */
  private def listRegion(spark: SparkSession, table: String,
                         region: String): (Seq[GenState], Long) = {
    val dir = regionDir(table, region)
    val fs = fsOf(spark, dir)
    // surface markers an external handler won but crashed before writing
    CommitHandler.forSession(spark).recover(fs, dir)
    if (!fs.exists(dir)) return (Nil, -1L)
    val names = fs.listStatus(dir).map(_.getPath.getName)
    val hw = names.collect { case n if n.matches("hw-\\d+\\.json") =>
      n.stripPrefix("hw-").stripSuffix(".json").toLong }
      .foldLeft(-1L)(math.max)
    val markers = names.collect {
      case n if n.matches("gen-\\d+\\.s[0-3]\\.json") =>
        val core = n.stripSuffix(".json")
        val gen = core.substring(4, core.lastIndexOf('.')).toLong
        val seq = core.substring(core.length - 1).toInt
        (gen, seq)
    }
    val gens = markers.filter(_._1 > hw).groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (gen, ms) =>
        val seq = ms.map(_._2).max
        val (owner, base) = s0Cache.computeIfAbsent((table, region, gen), _ => {
          val f = marker(table, region, gen, 0)
          val in = fs.open(f)
          val s = try new String(
            org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
          ("\"owner\"\\s*:\\s*\"([^\"]*)\"".r
            .findFirstMatchIn(s).map(_.group(1)).getOrElse(""),
            "\"base\"\\s*:\\s*(\\d+)".r
              .findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L))
        })
        GenState(gen, States(seq), owner, base)
      }
    // compacted generations never list again — release their cached .s0
    // payloads so a long-lived session's cache stays O(live generations),
    // not O(every generation ever opened)
    if (hw >= 0) {
      val it = s0Cache.keySet().iterator()
      while (it.hasNext) {
        val k = it.next()
        if (k._1 == table && k._2 == region && k._3 <= hw) it.remove()
      }
    }
    (gens, hw)
  }

  /** All live generations of a region, ascending; state = highest marker.
    * Merged generations whose markers were compacted are omitted. */
  def generations(spark: SparkSession, table: String, region: String): Seq[GenState] =
    listRegion(spark, table, region)._1

  /** Open the region's next generation, fenced to `owner`. Errors if an
    * Open generation exists (one writer per region, like the reference's
    * single MemWAL owner per region-generation). Concurrent opens race on
    * the exclusive `.s0` create — exactly one wins. */
  def open(spark: SparkSession, table: String, region: String,
           owner: String): Long = {
    val base = GraftTable.loadManifest(spark, table).version
    val (gens, hw) = listRegion(spark, table, region)
    gens.find(_.state == "Open").foreach { g =>
      throw new IllegalStateException(
        s"region '$region' generation ${g.generation} is already Open " +
          s"(owner ${g.owner}); seal or flush it first")
    }
    // the high water counts: compacted Merged generations have no markers
    // left, and a generation number must never be reused
    val next = math.max(gens.lastOption.map(_.generation).getOrElse(-1L), hw) + 1
    val dir = regionDir(table, region)
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    val f = marker(table, region, next, 0)
    val json = s"""{"generation": $next, "owner": "$owner", "base": $base}"""
    // exclusive create through the commit handler: the ownership fence —
    // the second of the format's two CAS points (see [[CommitHandler]])
    if (!CommitHandler.forSession(spark).commit(fs, f, json.getBytes("UTF-8")))
      throw new IllegalStateException(
        s"region '$region' generation $next was opened concurrently by " +
          "another writer; retry open() to take the next generation")
    next
  }

  private def requireOwned(gens: Seq[GenState], region: String,
                           owner: String, wantState: String): GenState = {
    val g = gens.find(_.state == wantState)
      .orElse(gens.lastOption)
      .getOrElse(throw new IllegalStateException(
        s"region '$region' has no generation — open() first"))
    require(g.state == wantState,
      s"region '$region' generation ${g.generation} is ${g.state}, need $wantState")
    require(g.owner == owner,
      s"region '$region' generation ${g.generation} is owned by '${g.owner}', not '$owner'")
    g
  }

  /** True when the table was OVERWRITTEN or RESTORED after the generation
    * opened — its rows predate a truncation and must not flush into the
    * new table contents. Walks only the manifests committed since `base`
    * (O(delta), never O(table)). An unreadable intermediate version is
    * non-fencing BY ENFORCEMENT, not assumption:
    * [[GraftTable.cleanupOldVersions]] retains every overwrite/restore
    * manifest newer than any live generation's base (see its WAL
    * retention), so the only versions cleanup can drop here are
    * non-fencing ones. */
  private def fencedOut(spark: SparkSession, table: String,
                        g: GenState): Boolean = {
    val latest = GraftTable.loadManifest(spark, table)
    if (latest.version <= g.base) return false
    (g.base + 1 to latest.version).exists { v =>
      val op = scala.util.Try(
        GraftTable.loadManifest(spark, table, Some(v)).operation)
        .getOrElse("")
      op == "overwrite" || op == "restore"
    }
  }

  /** How much manifest history live WAL generations pin, for
    * [[GraftTable.cleanupOldVersions]]'s retention: `_1` = base below
    * which FULL history must stay readable (Open/Sealed generations —
    * their crashed-flush recovery distinguishes dead copies from
    * import material by whether any manifest since base referenced a
    * file, and their fence check must see every operation); `_2` = base
    * below which overwrite/restore FENCE manifests must stay readable
    * (any non-Merged generation — Flushed ones still fence their
    * straggler sweeps). One `_wal` listing + one listing per region. */
  def retentionBases(spark: SparkSession, table: String): (Option[Long], Option[Long]) = {
    val walRoot = new Path(s"$table/_wal")
    val fs = fsOf(spark, walRoot)
    if (!fs.exists(walRoot)) return (None, None)
    val regions = fs.listStatus(walRoot).filter(_.isDirectory).map(_.getPath.getName)
    val live = regions.toSeq.flatMap(r => generations(spark, table, r))
      .filter(_.state != "Merged")
    val openSealed = live.filter(g => g.state == "Open" || g.state == "Sealed")
    (openSealed.map(_.base).minOption, live.map(_.base).minOption)
  }

  /** Batch visibility marker inside a `batch-`/`adhoc-` directory. A
    * batch EXISTS when this file does — created through the session's
    * [[CommitHandler]] AFTER every part file is durable, so visibility
    * needs no atomic directory rename (object stores have none: rename =
    * copy+delete there). A dir without it is an in-flight or crashed
    * append: invisible to flush/reads, overwritten by a retry, and never
    * blocking reclamation. */
  private[format] val ReadyMarker = "_BATCH_READY"

  private def isReady(fs: FileSystem, dir: Path): Boolean =
    try fs.exists(new Path(dir, ReadyMarker))
    catch { case _: java.io.FileNotFoundException => false }

  private def isBatchDir(name: String): Boolean =
    name.startsWith("batch-") || name.startsWith("adhoc-")

  /** Append a batch to the region's Open generation — NO manifest commit.
    * The batch is written in the table's PHYSICAL column layout (so flush
    * imports it untouched) directly into its `batch-`/`adhoc-` directory
    * and made visible by ONE [[ReadyMarker]] create through the commit
    * handler: a crash leaves an unready directory (invisible everywhere,
    * reclaimed or overwritten later), never a torn batch — and nothing
    * here needs an atomic rename, so the path is object-store-safe like
    * the manifest commit. Returns the number of part files in the batch.
    *
    * `batchTag` makes the append IDEMPOTENT for replayed writers
    * (Structured Streaming's micro-batch replay): a tagged batch leaves a
    * region-level `done-<tag>` marker after its ready marker, and a
    * re-append of the same tag is a no-op (returns 0) — the marker
    * survives flush, generation turnover, and [[cleanupMerged]], so a
    * replay can never duplicate rows whatever state its original
    * generation reached. */
  def append(spark: SparkSession, table: String, region: String,
             owner: String, df: DataFrame,
             batchTag: Option[String] = None): Int = {
    batchTag.foreach(t => require(t.matches("[A-Za-z0-9_\\-\\.]+"),
      s"batchTag must be alphanumeric/_/-/., got '$t'"))
    val rfs = fsOf(spark, regionDir(table, region))
    val doneMarker = batchTag.map(t => new Path(regionDir(table, region), s"done-$t"))
    if (doneMarker.exists(rfs.exists)) return 0 // replayed batch
    val g = requireOwned(generations(spark, table, region), region, owner, "Open")
    val m = GraftTable.loadManifest(spark, table)
    // fail fast on schema drift (flush would reject it much later)
    val want = m.schema.fieldNames.toSet
    val got = df.columns.toSet
    require(got == want,
      s"WAL append schema mismatch: got ${got.toSeq.sorted.mkString(",")}, " +
        s"table has ${want.toSeq.sorted.mkString(",")}")
    val dest = genDir(table, region, g.generation)
    val fs = fsOf(spark, dest)
    val id = batchTag.getOrElse(UUID.randomUUID().toString.take(12))
    // taggedness is recorded in the directory name: only `batch-` dirs are
    // replay-protected and get `done-` markers; an UNTAGGED append (SQL
    // INSERT route) is `adhoc-` — flush must never stamp a permanent
    // marker for it (the region would grow one file per INSERT forever)
    val dst = new Path(dest,
      if (batchTag.isDefined) s"batch-$id" else s"adhoc-$id")
    if (isReady(fs, dst)) {
      // tagged append that crashed between its ready marker and its done
      // marker: the rows ARE durably staged — close the replay window
      doneMarker.foreach(mk =>
        CommitHandler.forSession(spark).commit(rfs, mk, Array.emptyByteArray))
      return 0
    }
    // Overwrite clears any crashed attempt's partial files in the dir
    GraftTable.toPhysical(df, m).write.mode(SaveMode.Overwrite).parquet(dst.toString)
    // Spark's job-commit leaves only part files + _SUCCESS; drop the marker
    // so the batch dir holds exactly its parquet parts + the ready marker
    fs.delete(new Path(dst, "_SUCCESS"), false)
    val n = fs.listStatus(dst).count(_.getPath.getName.endsWith(".parquet"))
    CommitHandler.forSession(spark).commit(fs,
      new Path(dst, ReadyMarker), Array.emptyByteArray)
    doneMarker.foreach(mk =>
      CommitHandler.forSession(spark).commit(rfs, mk, Array.emptyByteArray))
    n
  }

  /** Batches sitting in a generation directory (READY `batch-`/`adhoc-`
    * dirs — one listing plus a marker probe per batch dir, no data IO).
    * The SQL route's auto-flush trigger. */
  def batchCount(spark: SparkSession, table: String, region: String,
                 gen: Long): Int = {
    val dir = genDir(table, region, gen)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).count(s =>
      isBatchDir(s.getPath.getName) && isReady(fs, s.getPath))
  }

  /** Open → Sealed: no further appends; the generation is flushable. */
  def seal(spark: SparkSession, table: String, region: String, owner: String): Unit = {
    val g = requireOwned(generations(spark, table, region), region, owner, "Open")
    advance(spark, fsOf(spark, regionDir(table, region)), table, region, g, 1)
  }

  /** Every parquet file a generation holds that the manifest does NOT
    * reference: fresh batches plus anything a crashed flush already
    * frag-renamed (commitFiles renames in place, possibly into nested
    * `import-*` collision subdirs — hence the RECURSIVE walk). */
  private def unreferencedFiles(fs: FileSystem, dir: Path,
                                referenced: Set[String]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    // manual walk, NOT fs.listFiles(recursive=true): the bulk iterator
    // descends into concurrent writers' `_tmp-*` staging dirs, whose
    // `_temporary` innards vanish mid-listing (a live Spark write job) —
    // skip staging subtrees entirely and tolerate entries that disappear
    // between list and stat
    def walk(d: Path): Unit = {
      val entries =
        try fs.listStatus(d)
        catch { case _: java.io.FileNotFoundException => return }
      entries.foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory) {
          // skip live Spark write jobs' innards AND batch dirs whose ready
          // marker is absent — an in-flight or crashed append is not batch
          // material until its marker commits (and never blocks reclaim)
          if (!n.startsWith("_tmp-") && !n.startsWith("_temporary") &&
              (!isBatchDir(n) || isReady(fs, st.getPath)))
            walk(st.getPath)
        } else if (n.endsWith(".parquet") &&
            !referenced.contains(st.getPath.toString))
          out += st.getPath.toString
      }
    }
    if (fs.exists(dir)) walk(dir)
    out.toSeq.sorted
  }

  /** Fold every batch the generation holds into the table in ONE commit
    * (zero-copy [[GraftTable.commitFiles]] append), then mark Flushed.
    * Seals first if still Open. Idempotent across crashes (see object doc)
    * and FENCED: a generation opened before a later OVERWRITE/RESTORE
    * refuses to flush — [[discard]] it instead. Returns rows flushed.
    *
    * STRAGGLERS: an append that verified `Open` just before the seal can
    * land its batch after the flush listing (its write job takes time).
    * flush therefore re-lists after each commit and imports what appeared,
    * and sweeps every earlier Flushed generation THE CALLER OWNS for
    * stragglers — so calling flush again always converges. The sweep
    * imports only NON-frag-named files: a frag-named unreferenced file in
    * a FLUSHED generation is a dead copy a compaction superseded (its rows
    * already live in the table), never import material. A straggler that
    * arrives after the final flush is never lost: [[cleanupMerged]]
    * refuses to reclaim a generation holding un-imported batches, and the
    * next flush imports them. Before importing, flush also stamps each
    * batch directory's `done-` marker (tagged batches), closing the
    * replay window of an append that crashed between its rename and its
    * marker and whose generation was then flushed. */
  def flush(spark: SparkSession, table: String, region: String,
            owner: String): Long = {
    val fs = fsOf(spark, regionDir(table, region))
    // a tagged batch dir that reached flush IS durably ingested — ensure
    // its replay marker exists even if the appender died before writing it
    def stampMarkers(dir: Path): Unit = {
      val entries = try fs.listStatus(dir)
        catch { case _: java.io.FileNotFoundException => return }
      entries.foreach { st =>
        val n = st.getPath.getName
        // READY only: a crashed (unready) tagged append must keep its
        // replay window open so the retry can land the rows
        if (st.isDirectory && n.startsWith("batch-") && isReady(fs, st.getPath)) {
          val mk = new Path(regionDir(table, region), s"done-${n.stripPrefix("batch-")}")
          if (!fs.exists(mk))
            CommitHandler.forSession(spark).commit(fs, mk, Array.emptyByteArray)
        }
      }
    }
    def drain(g: GenState, stragglersOnly: Boolean): Long = {
      val dir = genDir(table, region, g.generation)
      // An unreferenced FRAG-NAMED file in the generation is one of two
      // things: a crashed flush's rename that never made its commit
      // (import material — its rows exist nowhere else), or a copy some
      // commit DID reference that a later compaction superseded (dead —
      // its rows live in the compacted fragments, and importing it would
      // duplicate the whole generation). The current manifest cannot tell
      // them apart; HISTORY can: a file is dead iff any manifest since
      // the generation's base ever referenced it. The walk is lazy (only
      // a frag-named sighting pays it) and O(delta since base) — the
      // WAL-aware retention in [[GraftTable.cleanupOldVersions]] keeps
      // those manifests readable while the generation is Open/Sealed.
      lazy val referencedSinceBase: Set[String] = {
        val latest = GraftTable.loadManifest(spark, table).version
        (g.base + 1 to latest).iterator.flatMap(v =>
          scala.util.Try(GraftTable.loadManifest(spark, table, Some(v))
            .fragments.map(_.path)).getOrElse(Nil)).toSet
      }
      var committedByUs = Set.empty[String] // commits from THIS drain loop
      def deadCopy(p: String): Boolean =
        committedByUs.contains(p) || referencedSinceBase.contains(p)
      var total = 0L
      var drained = false
      while (!drained) {
        stampMarkers(dir)
        val referenced = GraftTable.loadManifest(spark, table)
          .fragments.map(_.path).toSet
        val files = unreferencedFiles(fs, dir, referenced).filter { p =>
          val fragNamed = new Path(p).getName.matches("frag-\\d+\\.parquet")
          // Flushed-generation sweep imports only non-frag stragglers; a
          // Sealed re-flush imports frag-named files ONLY when no commit
          // since base ever referenced them (crashed-pre-commit renames)
          if (stragglersOnly) !fragNamed
          else !fragNamed || !deadCopy(p)
        }
        if (files.isEmpty) drained = true
        else {
          val mNew = GraftTable.commitFiles(spark, table, files, "append")
          committedByUs ++= mNew.fragments.map(_.path)
          total += mNew.opStats.getOrElse("num_inserted_rows", 0L)
        }
      }
      total
    }
    val gens = generations(spark, table, region)
    val target = gens.find(g => g.state == "Open" || g.state == "Sealed")
    val ownedFlushed = gens.filter(g =>
      g.state == "Flushed" && g.owner == owner && !fencedOut(spark, table, g))
    if (target.isEmpty && ownedFlushed.isEmpty)
      throw new IllegalStateException(
        s"region '$region' has no Open/Sealed/Flushed generation owned by " +
          s"'$owner' to flush")
    var total = 0L
    target.foreach { g =>
      require(g.owner == owner,
        s"region '$region' generation ${g.generation} is owned by '${g.owner}', not '$owner'")
      if (fencedOut(spark, table, g))
        throw new IllegalStateException(
          s"region '$region' generation ${g.generation} opened at table " +
            s"version ${g.base}, and the table was OVERWRITTEN or RESTORED " +
            "since — flushing would resurrect pre-truncation rows. " +
            "wal_discard the generation (or re-ingest into a fresh one).")
      advance(spark, fs, table, region, g, 1) // seal
      total += drain(g, stragglersOnly = false)
      advance(spark, fs, table, region, g, 2) // flushed
    }
    // straggler sweep over the caller's OWN earlier Flushed generations
    // (O(flushed-gens) metadata walks until compaction + cleanupMerged
    // retires them). Fast path: ONE manifest load + one walk per gen; the
    // drain loop (with its per-commit manifest reloads) only runs for a
    // generation that actually holds stragglers.
    if (ownedFlushed.nonEmpty) {
      val referenced0 = GraftTable.loadManifest(spark, table)
        .fragments.map(_.path).toSet
      ownedFlushed.foreach { g =>
        val hasStragglers = unreferencedFiles(fs,
            genDir(table, region, g.generation), referenced0)
          .exists(p => !new Path(p).getName.matches("frag-\\d+\\.parquet"))
        if (hasStragglers) total += drain(g, stragglersOnly = true)
      }
    }
    // bound the replay-marker population: markers more than MarkerRetention
    // batch ids below the query's high-water can never be replayed (Spark
    // restarts at the last checkpointed epoch, not at zero — a checkpoint
    // RESET must use a fresh queryId, like any idempotent-sink appId)
    pruneMarkers(spark, fs, table, region)
    total
  }

  /** Replay markers retained per queryId below its high-water mark. Spark
    * replays at most the last uncommitted epoch; thousands of slack ids
    * make the prune unconditionally safe while keeping region listings
    * bounded for long-lived streams. */
  private val MarkerRetention = 10000L

  /** Hand-tagged (non-sink-shaped) replay markers expire after this long:
    * an at-least-once retry replays within its pipeline's horizon; a
    * replay of a custom tag weeks later is a pipeline bug, not a retry —
    * without a TTL every custom tag is a permanent region file. */
  private val MarkerTtlMillis = 7L * 24 * 3600 * 1000

  private def pruneMarkers(spark: SparkSession, fs: FileSystem,
                           table: String, region: String): Unit = {
    val handler = CommitHandler.forSession(spark)
    val dir = regionDir(table, region)
    val done = try fs.listStatus(dir)
      .filter(_.getPath.getName.startsWith("done-"))
      catch { case _: java.io.FileNotFoundException => return }
    // tags of the sink shape q<query>-b<batchId>: prune per query prefix
    val tagged = done.flatMap { st =>
      val t = st.getPath.getName.stripPrefix("done-")
      val i = t.lastIndexOf("-b")
      if (i > 0 && t.substring(i + 2).forall(_.isDigit))
        Some((t.substring(0, i), t.substring(i + 2).toLong, st.getPath))
      else None
    }
    tagged.groupBy(_._1).foreach { case (_, ms) =>
      val hw = ms.map(_._2).max
      ms.filter(_._2 < hw - MarkerRetention).foreach { m =>
        fs.delete(m._3, false); handler.forget(m._3)
      }
    }
    // custom tags carry no ordering to prune by — age them out instead
    val shaped = tagged.map(_._3.getName).toSet
    val now = System.currentTimeMillis()
    done.filterNot(st => shaped.contains(st.getPath.getName))
      .filter(st => now - st.getModificationTime > MarkerTtlMillis)
      .foreach { st => fs.delete(st.getPath, false); handler.forget(st.getPath) }
  }

  /** Abandon an Open/Sealed generation WITHOUT importing it: deletes its
    * batches and marks it Merged. The escape hatch for a generation fenced
    * out by a table overwrite/restore. */
  def discard(spark: SparkSession, table: String, region: String,
              owner: String): Long = {
    val gens = generations(spark, table, region)
    val g = gens.find(g => g.state == "Open" || g.state == "Sealed")
      .getOrElse(throw new IllegalStateException(
        s"region '$region' has no Open/Sealed generation to discard"))
    require(g.owner == owner,
      s"region '$region' generation ${g.generation} is owned by '${g.owner}', not '$owner'")
    val fs = fsOf(spark, regionDir(table, region))
    val dir = genDir(table, region, g.generation)
    if (fs.exists(dir)) fs.delete(dir, true)
    advance(spark, fs, table, region, g, 1)
    advance(spark, fs, table, region, g, 2)
    advance(spark, fs, table, region, g, 3)
    g.generation
  }

  /** The table's rows PLUS the un-flushed WAL tail of `regions` (every
    * Open/Sealed generation's batches), logical column names restored —
    * what the reference serves from the memtable, expressed as a union.
    * Generations fenced out by an overwrite/restore are SKIPPED (their
    * rows predate the truncation). WAL rows carry no `_rowid`/`_rowaddr`
    * (they are not committed yet). */
  def readWithWal(spark: SparkSession, table: String,
                  regions: Seq[String]): DataFrame = {
    val m = GraftTable.loadManifest(spark, table)
    val referenced = m.fragments.map(_.path).toSet
    val batches = regions.flatMap { r =>
      generations(spark, table, r)
        .filter(g => g.state == "Open" || g.state == "Sealed")
        .filterNot(g => fencedOut(spark, table, g))
        .flatMap { g =>
          val dir = genDir(table, r, g.generation)
          unreferencedFiles(fsOf(spark, dir), dir, referenced)
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
      val all = unreferencedFiles(fs, dir, Set.empty)
      val live = all.exists(referenced.contains)
      // a non-frag-named parquet is an UN-IMPORTED straggler batch (every
      // imported file was frag-renamed by commitFiles): refuse to reclaim —
      // the next flush imports it. Dead frag-named copies a compaction
      // superseded are safe to drop.
      val stragglers = all.exists(p =>
        !new Path(p).getName.matches("frag-\\d+\\.parquet"))
      if (!live && !stragglers) {
        if (fs.exists(dir)) fs.delete(dir, true)
        advance(spark, fs, table, region, g, 3)
        merged += 1
      }
    }
    compactMarkers(spark, fs, table, region)
    merged
  }

  /** Retire the markers of the contiguous Merged prefix: commit the
    * region's merged-through high water (`hw-<G>.json`, create-only, so
    * it can only ratchet up), THEN delete the covered `gen-*.s*` markers
    * and superseded hw files. Without this a long-lived region pays one
    * listing entry per generation it EVER had; with it, listing cost is
    * O(live generations). Readers never see a torn window: the covering
    * hw file exists before any deletion starts ([[listRegion]]). */
  private def compactMarkers(spark: SparkSession, fs: FileSystem,
                             table: String, region: String): Unit = {
    val (gens, hw) = listRegion(spark, table, region)
    var through = hw
    gens.foreach { g =>
      if (g.generation == through + 1 && g.state == "Merged") through += 1
    }
    if (through > hw)
      CommitHandler.forSession(spark).commit(fs,
        new Path(regionDir(table, region), s"hw-$through.json"),
        s"""{"merged_through": $through}""".getBytes("UTF-8"))
    // sweep everything a present hw file covers (also catches litter from
    // a prior partially-failed sweep)
    if (through >= 0) {
      val dir = regionDir(table, region)
      val names = try fs.listStatus(dir).map(_.getPath.getName)
        catch { case _: java.io.FileNotFoundException => return }
      val handler = CommitHandler.forSession(spark)
      def drop(n: String): Unit = {
        val p = new Path(dir, n)
        fs.delete(p, false); handler.forget(p)
      }
      names.foreach {
        case n if n.matches("gen-\\d+\\.s[0-3]\\.json") =>
          val gen = n.stripSuffix(".json").substring(4).takeWhile(_ != '.').toLong
          if (gen <= through) drop(n)
        case n if n.matches("hw-\\d+\\.json") =>
          val g = n.stripPrefix("hw-").stripSuffix(".json").toLong
          if (g < through) drop(n)
        case _ =>
      }
    }
  }
}
