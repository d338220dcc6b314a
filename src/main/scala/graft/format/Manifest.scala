package graft.format

import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Table-format metadata, one manifest per committed version.
  *
  * Capability mirror of the reference's manifest
  * (`rust/lance-table/src/format/manifest.rs:35-104`): schema, fragment list,
  * deletion files, version lineage — serialized as JSON under `_manifests/`.
  * Fragment data files are plain parquet; a fragment is the unit of
  * parallelism (one fragment ⇄ one Spark scan split group, reference
  * `fragment.rs:276-303`).
  */
/** Per-fragment, per-column zone statistics (reference ZONEMAP,
  * `rust/lance-index/src/scalar/zonemap.rs`): min/max serialized as strings,
  * interpreted through the schema's type; nullCount enables IsNull/IsNotNull
  * pruning. `kind` ∈ long | double | string. */
case class ColumnStat(kind: String, min: String, max: String, nullCount: Long)

case class FragmentMeta(
    id: Long,
    path: String, // relative to table root
    rows: Long,
    sizeBytes: Long,
    addedVersion: Long,
    stats: Map[String, ColumnStat] = Map.empty,
    /** Stable-row-id sequence (reference `RowIdSequence`,
      * `rust/lance-table/src/rowids.rs:55`, segments `rowids/segment.rs:35`).
      * Freshly written fragments hold a CONTIGUOUS id range
      * `[rowIdStart, rowIdStart + rows)` — the manifest's `nextRowId`
      * high-water mark at commit — so `_rowid` derives from the scan's
      * row_index with zero per-row storage (the reference's "range" segment
      * encoding). Compaction rewrites scramble row order, so rewritten
      * fragments persist `_rowid` as a physical parquet column instead
      * (`rowIdStored`, the "general" segment encoding); footer min/max stats
      * of that column keep take-by-id pruning manifest-level.
      * `rowIdStart = -1 && !rowIdStored` marks a pre-rowid legacy fragment. */
    rowIdStart: Long = -1L,
    rowIdStored: Boolean = false,
    /** Rewrite provenance (reference `defer_index_remap` +
      * FragReuseIndex, `rust/lance/src/dataset/optimize.rs:155-166`): a
      * content-preserving rewrite (compaction / layout clustering) records
      * the source fragment ids it consumed, and `oldAddrStored` marks that
      * the files persist each row's PRE-rewrite `_rowaddr` as a physical
      * `__old_addr` column. Together they let an index whose coverage the
      * rewrite retired keep SERVING at the old addresses: only the
      * deletion-sized exclusion sets ([[srcDvFiles]], post-rewrite DVs
      * mapped backward through `__old_addr`) touch the old address space,
      * until `optimize_index` remaps permanently. Value-changing rewrites
      * (update/merge) never set these. */
    srcFragIds: Seq[Long] = Nil,
    oldAddrStored: Boolean = false,
    /** DV files (old-address parquet, table-relative paths) the rewrite
      * MATERIALIZED while producing this fragment: the rows they address
      * existed in `srcFragIds` but were dropped from the output. Deferred
      * index serving anti-joins candidates against this deletion-sized set
      * instead of scanning the corpus to discover missing translations;
      * [[graft.format.GraftTable.cleanupOldVersions]] keeps the files
      * referenced while any live fragment lists them. */
    srcDvFiles: Seq[String] = Nil,
    /** ROOT provenance for ID-keyed deferred serving (FTS): the original
      * fragment ids this content descends from through content-preserving
      * rewrites only (a source that was itself a rewrite output
      * contributes ITS roots). Addresses don't survive a second rewrite
      * (`__old_addr` holds single-hop addresses), but doc IDS do — an FTS
      * index covering every root keeps serving from its postings across
      * rewrite GENERATIONS. Value-changing rewrites reset the chain. */
    rootFragIds: Seq[Long] = Nil,
    /** true iff this fragment's content diverged from what an index may
      * have seen: a content-preserving lineage that materialized deletions
      * (postings can carry ids whose rows no longer exist anywhere), or a
      * VALUE-CHANGING rewrite (update / merge-matched / cast — ids live on
      * with different content, so posting-derived matches may be stale).
      * Id-keyed serving masks against the servable-fragment id set when
      * any live uncovered fragment carries this
      * ([[graft.format.GraftCatalog.ftsServableMask]]) — per-generation DV
      * sidecars can't say it once intermediate generations are gone. */
    lossyLineage: Boolean = false) {
  def hasRowIds: Boolean = rowIdStored || rowIdStart >= 0L
}

/** Supplemental column dataset from a no-rewrite `add_columns` commit
  * (reference: a fragment holds ≥1 DataFile so columns can be added without
  * rewriting, `fragment.rs:27-50`; `schema_evolution.rs:58-71`). Parquet
  * keyed by `addr` (= `_rowaddr`) carrying ONLY the added columns; reads
  * merge it back with an addr equi-join — the Spark-native analogue of the
  * reference's positional column-file zip. */
case class ColumnFileMeta(path: String, columns: Seq[String])

/** Index metadata committed INTO the manifest (reference
  * `rust/lance-table/src/format/index.rs` — `IndexMetadata` with
  * `fragment_bitmap`): the optimizer reads index inventory from the manifest
  * it already holds, so planning needs no filesystem probing and builds are
  * visible across sessions/processes the moment their commit lands.
  *
  *  - `name`: the index directory name under `<table>/_indices/`.
  *  - `indexType`: BTREE | BLOOMFILTER | LABEL_LIST | JSON (informational;
  *    the name encodes type + column).
  *  - `column`: the indexed column's PHYSICAL (on-file) identity at build
  *    time — the rule vetoes an entry whose identity differs from the
  *    filtered column (rename-chain defense, ADVICE r4).
  *  - `indexedVersion` / `fragmentIds`: the covered snapshot (the
  *    reference's `fragment_bitmap`); usable iff fragmentIds ⊆ the reading
  *    snapshot's live fragments.
  *  - `uuid`: content identity of the build, also written into the dir's
  *    marker (the reference names index dirs by UUID). A reader verifies
  *    entry.uuid == marker.uuid ONCE (memoized) before first use: an old
  *    manifest entry pointing at a dir that was later REBUILT (new uuid),
  *    or a cloned manifest whose dirs did not travel, vetoes cleanly
  *    instead of serving another build's rows. Incremental optimize APPENDS
  *    under the same uuid — supersets are harmless (rows of fragments
  *    outside the snapshot never survive the scan semi-join). */
case class IndexMeta(
    name: String,
    indexType: String,
    column: String,
    indexedVersion: Long,
    fragmentIds: Seq[Long],
    uuid: String,
    /** Family-specific build parameters needed to MAINTAIN the index
      * without the caller restating them — e.g. `idCol` for vector
      * families, `path` for JSON-path indexes — so
      * `CALL g.system.optimize_index(table, name)` can dispatch from the
      * manifest alone. */
    params: Map[String, String] = Map.empty)

case class GraftManifest(
    version: Long,
    operation: String,
    schemaJson: String,
    fragments: Seq[FragmentMeta],
    /** Deletion-vector files (relative paths; parquet with a single `addr`
      * long column = fragId<<32 | position — reference `fragment.rs:185-208`,
      * address scheme `rowids.rs`). Cumulative for the snapshot. */
    dvFiles: Seq[String],
    numDeleted: Long,
    config: Map[String, String],
    parent: Long,
    /** Supplemental column datasets (no-rewrite schema evolution). Missing in
      * round-1 manifests → defaults to empty. */
    columnFiles: Seq[ColumnFileMeta] = Nil,
    /** Stable-row-id high-water mark (reference manifest `next_row_id`):
      * every id ever assigned is < nextRowId, so ids are never reused even
      * across overwrites. 0 on legacy manifests. */
    nextRowId: Long = 0L,
    /** Wall-clock commit time stamped at CAS-commit (reference: the manifest
      * carries its own timestamp). `TIMESTAMP AS OF` resolves from this, not
      * file mtimes — mtimes change on copy/rsync/migration. 0 on legacy
      * manifests (readers fall back to mtime). */
    commitTsMillis: Long = 0L,
    /** Committed index inventory (see [[IndexMeta]]). Empty on legacy
      * manifests and on tables whose indexes predate manifest commits —
      * [[GraftManifest.indicesAuthoritative]] tells the two apart. */
    indices: Seq[IndexMeta] = Nil,
    /** Schema-level key-value metadata (reference `dataset/metadata.rs`
      * `replace_schema_metadata` / UpdateMap — the Arrow schema metadata).
      * Missing in pre-r8 manifests → defaults to empty. */
    schemaMetadata: Map[String, String] = Map.empty,
    /** Registered multi-base storage locations, name → URI (reference
      * `manifest.rs:103` `base_paths` / `BasePath` `manifest.rs:562`,
      * Python `add_bases`): writes may target a named base; such fragments
      * record ABSOLUTE paths (same resolution rule shallow clones use), so
      * a 100 TB table can spread across buckets / storage classes while
      * staying one logical table. Missing in pre-r8 manifests → empty. */
    bases: Map[String, String] = Map.empty,
    /** Operation statistics stamped into the commit (reference DML results:
      * `merge_insert` returns `num_inserted_rows`/`num_updated_rows`/
      * `num_deleted_rows`, `update` returns `rows_updated` —
      * `python/python/lance/dataset.py:91-138,2046`). Derived from metadata
      * the commit already holds (staged fragment row counts, DV deltas) —
      * zero extra jobs — and surfaced through the SQL DML command results
      * and `CALL g.system.history`. Missing in pre-r9 manifests → empty. */
    opStats: Map[String, Long] = Map.empty,
    /** User-supplied commit annotations (reference `write_dataset`'s
      * `commit_message` / `transaction_properties` — free-form provenance a
      * pipeline stamps on its commits: job id, git sha, batch watermark).
      * The conventional message key is `message`. Like [[opStats]], they
      * describe ONE commit and are cleared before the next. Surfaced by
      * `CALL g.system.history`. Missing in pre-r9 manifests → empty. */
    txnProperties: Map[String, String] = Map.empty) {
  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]

  /** True once any index build has committed metadata into this lineage:
    * from then on the manifest is the single source of truth for index
    * inventory (zero FS probing for ABSENT indexes too). False = legacy
    * table — readers fall back to directory markers. The flag lives in
    * `config` so it survives overwrite (which correctly clears `indices`:
    * replaced data invalidates every index). */
  def indicesAuthoritative: Boolean =
    config.get(GraftManifest.IndicesCommittedKey).contains("true")
  def maxFragmentId: Long = if (fragments.isEmpty) -1L else fragments.map(_.id).max
  def liveRows: Long = fragments.map(_.rows).sum - numDeleted
  def hasRowIds: Boolean = fragments.forall(_.hasRowIds)

  /** Physical (on-file) name of a schema field: `alter_columns` renames are
    * metadata-only (reference `schema_evolution.rs:451` — field ids keep data
    * files valid across renames), recorded as `graft.physical` field metadata;
    * fragment parquet files always carry physical names. */
  def physicalName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(GraftManifest.PhysicalKey))
      f.metadata.getString(GraftManifest.PhysicalKey)
    else f.name

  /** logical-name → physical-name pairs for TOP-LEVEL fields that were
    * renamed (nested renames live in [[indirectionPairs]]). */
  def renames: Seq[(String, String)] =
    schema.fields.toSeq.collect {
      case f if physicalName(f) != f.name => (f.name, physicalName(f))
    }

  /** (logical dotted path → physical name) at EVERY depth — the full rename
    * indirection fingerprint (nested renames included). */
  def indirectionPairs: Seq[(String, String)] = SchemaPaths.indirectionPairs(schema)

  /** Any rename indirection at any depth? (Gates the restore projection on
    * reads and the physical projection on writes.) */
  def hasIndirection: Boolean = indirectionPairs.nonEmpty

  /** Schema with on-file (physical) names at every depth — what fragment
    * parquet actually stores; rename metadata stripped. */
  def physicalSchema: StructType =
    StructType(schema.fields.map { f =>
      org.apache.spark.sql.types.StructField(
        physicalName(f), SchemaPaths.physicalType(f.dataType), f.nullable)
    })

  /** Logical name currently mapped to physical name `p` (identity if never
    * renamed). */
  def logicalName(p: String): String =
    schema.fields.find(f => physicalName(f) == p).map(_.name).getOrElse(p)
}

object GraftManifest {
  /** StructField-metadata key recording a renamed column's on-file name. */
  val PhysicalKey = "graft.physical"

  /** Config key: set to "true" by the first index-metadata commit. */
  val IndicesCommittedKey = "graft.indices.committed"

  implicit private val formats: Formats = DefaultFormats

  def toJson(m: GraftManifest): String = Serialization.writePretty(m)
  def fromJson(s: String): GraftManifest = JsonMethods.parse(s).extract[GraftManifest]
}
