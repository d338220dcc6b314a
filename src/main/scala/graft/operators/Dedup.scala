package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.functions.TextHashFunctions._
import graft.functions.VectorFunctions._

/** Deduplication operators for corpus-scale pipelines.
  *
  * Scale design (the 100 TB story):
  *  - exact: hash-groupBy on content digest — one shuffle keyed by digest;
  *    map-side partial aggregation collapses duplicates before the wire.
  *  - minhash LSH: per-doc signature (one pass), explode to (band, bucket)
  *    keys — the ONLY shuffle is on band buckets, whose fan-in is bounded by
  *    collision rate, never all-pairs. Candidates are then exact-verified
  *    with true jaccard, so precision is 1 and recall is the LSH band
  *    probability (128 perms, r=2, b=64 → recall ≈ 1 - (1-s²)⁶⁴; > 0.9999
  *    at s = 0.8).
  *  - simhash: 64-bit sketch; near-dup = hamming ≤ k via banded blocking on
  *    16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk equal).
  *  - embedding cosine: blocked self-join baseline (see Knn/IVF for the ANN
  *    scale path).
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical content. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Degenerate-bucket guard (the BigCode/RefinedWeb-pipeline skip device):
    * an LSH band bucket holding more than this many DISTINCT signatures is
    * skipped. Identical signatures are grouped BEFORE banding, so the usual
    * degenerate corpus — N exact copies of one page — never trips the cap
    * (they collapse to one representative and pair exactly); the cap only
    * fires on > [[DefaultMaxBucket]] genuinely different documents whose
    * band slice collides, which at r=2 over 64-bit minhashes is either a
    * near-dup storm (pairs still found via their other 31 bands) or an
    * adversarial/pathological slice. Recall semantics: a pair is missed
    * only if EVERY band where it collides is over-cap. */
  val DefaultMaxBucket = 5000

  /** Band a precomputed `sig: array<long>` column into (id, band, bucket)
    * LSH rows — the unit both the batch self-join and the persisted
    * incremental store are made of. */
  private def bandSignatures(sigDf: DataFrame, idCol: String,
                             numPerms: Int, bandRows: Int): DataFrame = {
    val numBands = numPerms / bandRows
    sigDf.select(
      col(idCol),
      explode(transform(sequence(lit(0), lit(numBands - 1)),
        b => struct(b.as("band"), xxhash64(slice(col("sig"), b * bandRows + 1, lit(bandRows))).as("bucket"))))
        .as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  private def bandedBuckets(df: DataFrame, idCol: String, shingleCol: String,
                            numPerms: Int, bandRows: Int): DataFrame =
    bandSignatures(
      df.select(col(idCol), minhashSignature(col(shingleCol), numPerms).as("sig")),
      idCol, numPerms, bandRows)

  /** Signature-identity grouping + capped representative bands — the shape
    * that makes LSH safe on dirty corpora. Docs with IDENTICAL signatures
    * collapse to one representative (min id) before banding, so the bucket
    * self-join fans in on DISTINCT signatures only; a corpus of N exact
    * duplicates contributes ONE row per band, not N (the simhash
    * distinct-sketch device, applied to minhash). Buckets still holding
    * more than `maxBucket` distinct signatures are skipped ([[DefaultMaxBucket]]).
    *
    * Returns (sig, members, repBanded):
    *  - sig: (idCol, sig) for every doc (checkpointed — signatures compute once);
    *  - members: (idCol, __rep) group membership;
    *  - repBanded: capped (idCol=rep, band, bucket) rows, one per band per
    *    distinct signature.
    * Signature identity is judged by xxhash64 over the sig array — two
    * different signatures colliding (p ≈ n²/2⁶⁴) would merge groups, the
    * same error class the exact-verify step downstream already bounds. */
  private def groupedBands(df: DataFrame, idCol: String, shingleCol: String,
                           numPerms: Int, bandRows: Int, maxBucket: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // ONE pass, ONE checkpoint for signatures + group structure (r16, guide
    // §2.4): the group-min window already leaves every row carrying both its
    // signature and its representative, so the r15 shape's separate members
    // checkpoint and the sig⋈reps join-back to recover rep signatures were
    // pure overhead — members and repSigs are now projections/filters of the
    // same checkpointed result. localCheckpoint (NOT persist): several
    // subtrees below read this and the signature computation is the
    // expensive part, but a bare persist leaks storage for the session
    // lifetime on a lazily returned result — the eager checkpoint
    // materializes once and its blocks are reclaimed automatically when the
    // plan is dropped.
    val sig = df.select(col(idCol), minhashSignature(col(shingleCol), numPerms).as("sig"))
      .withColumn("__sk", xxhash64(col("sig")))
      .withColumn("__rep", min(col(idCol)).over(Window.partitionBy(col("__sk"))))
      .localCheckpoint()
    val members = sig.select(col(idCol), col("__rep"))
    val repSigs = sig.filter(col(idCol) === col("__rep"))
    val repBanded = bandSignatures(repSigs, idCol, numPerms, bandRows)
      .withColumn("__bs", count(lit(1)).over(
        Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("__bs") <= maxBucket)
      .drop("__bs")
      .localCheckpoint()
    (sig, members, repBanded)
  }

  /** Representative-level candidate pairs from the capped band self-join:
    * fan-in bounded by distinct-signature collisions, never doc count. */
  private def repPairs(repBanded: DataFrame, idCol: String): DataFrame = {
    val l = repBanded.select(col("band"), col("bucket"), col(idCol).as("a_rep"))
    val r = repBanded.select(col("band"), col("bucket"), col(idCol).as("b_rep"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a_rep") < col("b_rep"))
      .select(col("a_rep"), col("b_rep"))
      .distinct()
  }

  /** Expand rep-level pairs to doc pairs, plus within-group pairs
    * (identical signatures are certain candidates). Output is exactly the
    * candidate pair set, a_id < b_id, provably duplicate-free WITHOUT a
    * final output-sized distinct: each doc belongs to exactly one group, so
    * a doc pair arises from exactly one (groupA, groupB) combination (and
    * repPairs is distinct at rep level), within-group pairs are unique by
    * construction, and cross ∩ within = ∅ (different vs same group). */
  private def expandPairs(rp: DataFrame, members: DataFrame, idCol: String): DataFrame = {
    val ma = members.select(col("__rep").as("a_rep"), col(idCol).as("a_id"))
    val mb = members.select(col("__rep").as("b_rep"), col(idCol).as("b_id"))
    val cross = rp.join(ma, "a_rep").join(mb, "b_rep")
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"))
    val within = ma.join(mb.withColumnRenamed("b_rep", "a_rep"), "a_rep")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
    cross.union(within)
  }

  /** Candidate pairs sharing at least one MinHash LSH band bucket.
    * Output: (a_id, b_id) distinct, a_id < b_id. Identical-signature docs
    * are grouped before banding and buckets are capped at `maxBucket`
    * distinct signatures (see [[DefaultMaxBucket]]) — candidate volume is
    * O(output pairs), never O(N²·bands), even when the corpus is N copies
    * of one document. */
  def minhashCandidates(df: DataFrame, idCol: String, shingleCol: String,
                        numPerms: Int = 64, bandRows: Int = 2,
                        maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val (_, members, repBanded) =
      groupedBands(df, idCol, shingleCol, numPerms, bandRows, maxBucket)
    expandPairs(repPairs(repBanded, idCol), members, idCol)
  }

  /** MinHash LSH near-duplicate pairs, exact-verified: candidates from
    * banding, then true jaccard over the shingle sets ≥ threshold.
    * The (id, shingles) projection is materialized ONCE (localCheckpoint —
    * leak-free, see [[minhashCandidates]]) and feeds both the signature
    * computation and the verify join — the shingle extraction subtree (the
    * expensive part) is evaluated a single time.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, shingleCol: String,
                          threshold: Double, numPerms: Int = 64, bandRows: Int = 2,
                          maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val sets = df.select(col(idCol), col(shingleCol)).localCheckpoint()
    val cands = minhashCandidates(sets, idCol, shingleCol, numPerms, bandRows, maxBucket)
    val a = sets.select(col(idCol).as("a_id"), col(shingleCol).as("a_sh"))
    val b = sets.select(col(idCol).as("b_id"), col(shingleCol).as("b_sh"))
    cands.join(a, "a_id").join(b, "b_id")
      .withColumn("jaccard", TextAnalysis.jaccard(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Candidate-id inlining bound for [[minhashIncremental]]'s verify scan:
    * at or under it the ids ship as a pushed-down `IN` (parquet row-group
    * pruning); above it (a collision storm) the semi-join fallback keeps
    * the plan correct at full-scan cost. */
  private val InlineKeyLimit = 10000

  /** Persist a corpus's LSH bucket store — the standing index the
    * incremental dedup path probes (the ingest-time regime: CCNet /
    * RefinedWeb-scale pipelines dedup each ARRIVING batch against the
    * already-indexed corpus without rescanning it). The store is a graft
    * table of `(id, band, bucket)` — numBands rows per doc, a few hundred
    * bytes; shingle sets are NOT stored (exact verification reads only the
    * candidate docs). */
  def minhashIndexBuild(docs: DataFrame, idCol: String, shingleCol: String,
                        storePath: String, numPerms: Int = 64,
                        bandRows: Int = 2, mode: String = "overwrite"): Unit =
    graft.format.GraftTable.write(
      bandedBuckets(docs, idCol, shingleCol, numPerms, bandRows),
      storePath, mode)

  /** Incremental MinHash-LSH near-dup: exact-verified pairs touching the
    * NEW batch — (old, new) via the persisted store, (new, new) within the
    * batch — then ONE append commit of the batch's buckets so the next
    * batch sees this one.
    *
    * Scale shape: the old corpus is touched only at (1) the store join on
    * (band, bucket) — store rows are numBands/doc of metadata, never
    * documents — and (2) the exact-verify join, whose old side is
    * candidate-pruned (a semi-join by candidate id before shingles travel;
    * candidates are collision-bounded like the batch path). The arriving
    * batch, not the corpus, is the unit of work — the property that makes
    * dedup-at-ingest viable at 100 TB.
    *
    * Pair identity: `a_id` is the existing/batch-mate doc, `b_id` the new
    * doc (numeric order only when old ids precede new ones). Same
    * recall/precision contract as [[minhashNearDupPairs]]: exact verify ⇒
    * precision 1; banding recall at the 0.8 threshold is 1 − (1−s²)^b. */
  def minhashIncremental(newDocs: DataFrame, idCol: String, shingleCol: String,
                         oldDocs: DataFrame, storePath: String,
                         threshold: Double, numPerms: Int = 64,
                         bandRows: Int = 2,
                         maxBucket: Int = DefaultMaxBucket): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = newDocs.sparkSession
    val newSets = newDocs.select(col(idCol), col(shingleCol)).localCheckpoint()
    val (sig, members, repBanded) =
      groupedBands(newSets, idCol, shingleCol, numPerms, bandRows, maxBucket)
    // Store probe: restrict the store FIRST to the batch's (band, bucket)
    // keys — the distinct batch bucket set is batch-sized and broadcast, so
    // the corpus-sized store is never shuffled; then SAMPLE degenerate
    // store buckets down to maxBucket rows per (band, bucket) (the store
    // holds one row per historical doc per band, so N copies of one
    // boilerplate page keep every one of its buckets N rows fat — without
    // the bound each future probe of that page fans out by the full
    // historical population). A bounded row_number sample, NOT a skip: a
    // new copy must still PAIR with history (one verified link is enough
    // for survivor-group connectivity), it just pairs with at most
    // maxBucket bucket-mates per band. Deterministic: lowest ids kept.
    val store = graft.format.GraftTable.read(spark, storePath)
      .select(col("band"), col("bucket"), col(idCol).as("a_id"))
      .join(broadcast(repBanded.select(col("band"), col("bucket")).distinct()),
        Seq("band", "bucket"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("band"), col("bucket")).orderBy(col("a_id"))))
      .filter(col("__rn") <= maxBucket)
      .drop("__rn")
    // probe at rep level, expand to batch members; a_id =!= b_id guards the
    // re-ingested-id case (a doc id already in the store probing itself)
    val oldNew = repBanded.join(store, Seq("band", "bucket"))
      .select(col("a_id"), col(idCol).as("b_rep")).distinct()
      .join(members.select(col("__rep").as("b_rep"), col(idCol).as("b_id")), "b_rep")
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"))
    val newNew = expandPairs(repPairs(repBanded, idCol), members, idCol)
    // An id present in BOTH the store and the batch yields the same pair in
    // both orientations (store leg (x,y) + batch leg (min,max)) — collapse
    // on the unordered key, keeping one orientation (either verifies: aSets
    // covers old ∪ new, bSets the batch, and an id in both is in both sides).
    val cands = oldNew.union(newNew)
      .withColumn("__ka", least(col("a_id"), col("b_id")))
      .withColumn("__kb", greatest(col("a_id"), col("b_id")))
      .dropDuplicates("__ka", "__kb")
      .select(col("a_id"), col("b_id"))
      .localCheckpoint()
    // exact verify: the old side prunes to candidate ids BEFORE its shingle
    // sets (or even its text) are touched. A semi join alone is not enough
    // — the join condition sits ABOVE the text scan, so parquet would still
    // read every old doc's text column. Candidate sets are collision-
    // bounded (batch-sized), so inline them as an `isin` that parquet
    // PUSHES DOWN (row-group pruning on an id-clustered corpus — the same
    // `MergeInlineKeyLimit` trick the indexed merge uses); only an unusual
    // collision storm falls back to the semi join.
    // no checkpoint: `cands` above is already checkpointed, so the distinct
    // is one cheap pass over it — an eager materialization here was a whole
    // extra job on the common (inlined) path (r16)
    val candAIds = cands.select(col("a_id")).distinct()
    val inlined = candAIds.limit(InlineKeyLimit + 1).collect().map(_.get(0))
    val oldPruned =
      if (inlined.length <= InlineKeyLimit)
        oldDocs.filter(col(idCol).isin(inlined.toSeq: _*))
      else oldDocs.join(candAIds.withColumnRenamed("a_id", idCol),
        Seq(idCol), "left_semi")
    // an id in BOTH oldDocs and the batch keeps the batch copy (latest
    // content) — without the anti-join it would join twice and emit
    // duplicate verified pairs
    val aSets = newSets.select(col(idCol).as("a_id"), col(shingleCol).as("a_sh"))
      .unionByName(
        oldPruned.select(col(idCol).as("a_id"), col(shingleCol).as("a_sh"))
          .join(newSets.select(col(idCol).as("a_id")), Seq("a_id"), "left_anti"))
    val bSets = newSets.select(col(idCol).as("b_id"), col(shingleCol).as("b_sh"))
    val out = cands.join(aSets, "a_id").join(bSets, "b_id")
      .withColumn("jaccard", TextAnalysis.jaccard(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .localCheckpoint() // materialize BEFORE the store grows
    // append EVERY batch doc's bands (not just representatives): the store's
    // contract is one row per (doc, band) so future batches pair against
    // every historical id; degenerate store buckets are handled at probe
    // time by the cap above. Signatures reuse the checkpointed `sig`.
    graft.format.GraftTable.write(
      bandSignatures(sig, idCol, numPerms, bandRows), storePath, "append")
    out
  }

  /** SimHash near-duplicate pairs: block on 16-bit chunks (hamming ≤ 3 over
    * 64 bits ⇒ at least one of 4 chunks identical), verify hamming ≤ maxDist.
    *
    * Two devices keep the chunk self-join off the quadratic cliff at corpus
    * scale (the same pair [[groupedBands]] applies to minhash):
    *  - pairing runs over DISTINCT sketches, then expands back to doc pairs —
    *    near-identical corpora collapse many docs onto one sketch;
    *  - each (chunk, key) bucket is capped at `maxBucket` DISTINCT sketches
    *    and skipped when over-cap. At 10⁹⁺ distinct sketches a 16-bit chunk
    *    bucket holds ~N/65536 sketches organically — without the cap that is
    *    10⁸⁺ comparisons per bucket. Recall semantics under the cap: a
    *    cross-sketch pair is missed only if EVERY chunk on which the two
    *    sketches agree is over-cap; identical-sketch doc pairs (hamming 0)
    *    never pass through the chunk join and are always emitted.
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, shingleCol: String,
                          maxDist: Int = 3,
                          maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val sh = df.select(col(idCol), simhash64(col(shingleCol)).as("sim")).localCheckpoint()
    simhashPairsFromSketches(sh, idCol, maxDist, maxBucket)
  }

  /** Sketch-level entry for [[simhashNearDupPairs]]: `sh` is (idCol,
    * sim: long). Exposed so probes/specs can exercise the capped chunk join
    * on constructed sketch distributions. */
  def simhashPairsFromSketches(sh: DataFrame, idCol: String, maxDist: Int,
                               maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val sketchPairs = simhashSketchCandidates(
      sh.select(col("sim")).distinct(), maxBucket)
      .withColumn("hamming",
        bit_count(col("a_sim").bitwiseXOR(col("b_sim"))))
      .filter(col("hamming") <= maxDist)
    // symmetrize before expansion: doc id order is independent of sketch order
    val sym = sketchPairs.union(
      sketchPairs.select(col("b_sim").as("a_sim"), col("a_sim").as("b_sim"),
        col("hamming")))
    val da = sh.select(col("sim").as("a_sim"), col(idCol).as("a_id"))
    val db = sh.select(col("sim").as("b_sim"), col(idCol).as("b_id"))
    val cross = sym.join(da, "a_sim").join(db, "b_sim")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("hamming"))
    // identical-sketch pairs: certain duplicates (hamming 0), emitted
    // unconditionally via a sketch-keyed self-join — fan-in is group size,
    // i.e. exactly the output size, never bucket collisions
    val same = sh.select(col("sim"), col(idCol).as("a_id"))
      .join(sh.select(col("sim"), col(idCol).as("b_id")), Seq("sim"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        lit(0).cast(IntegerType).as("hamming"))
    cross.union(same).distinct()
  }

  /** Capped candidate sketch pairs (a_sim < b_sim, pre-hamming-verify) from
    * the 16-bit-chunk self-join over DISTINCT sketches. Buckets holding more
    * than `maxBucket` sketches are skipped ([[DefaultMaxBucket]] semantics —
    * see [[simhashNearDupPairs]]). Public so ScaleProbe can require the
    * candidate count stays bounded on dense-bucket sketch distributions. */
  def simhashSketchCandidates(sketches: DataFrame, maxBucket: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunked = sketches.select(col("sim"),
      explode(array((0 until 4).map(c => struct(
        lit(c).as("chunk"),
        shiftrightunsigned(col("sim"), c * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*))
        .as("ck"))
      .select(col("sim"), col("ck.chunk"), col("ck.key"))
      .withColumn("__bs", count(lit(1)).over(
        Window.partitionBy(col("chunk"), col("key"))))
      .filter(col("__bs") <= maxBucket)
      .drop("__bs")
      .localCheckpoint()
    val l = chunked.select(col("chunk"), col("key"), col("sim").as("a_sim"))
    val r = chunked.select(col("chunk"), col("key"), col("sim").as("b_sim"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("a_sim") < col("b_sim"))
      .select(col("a_sim"), col("b_sim"))
      .distinct()
  }

  /** Exact n-gram jaccard near-dup pairs within a blocking key, via
    * prefix-filtered set-similarity join (AllPairs/PPJoin).
    *
    * Result-identical to the all-pairs baseline, but never materializes the
    * quadratic pair space:
    *  - shingles are xxh64'd to longs and sorted — a global total order;
    *  - prefix filtering principle (PPJoin): jaccard(A,B) ≥ t ⇒ the first
    *    ⌊(1-t)·|A|⌋+1 elements of A and first ⌊(1-t)·|B|⌋+1 of B share a
    *    token. Candidates come from an inverted-index self-join on prefix
    *    tokens only — the shuffle is keyed by (block, token), fan-in bounded
    *    by prefix-token collision rate, never all-pairs;
    *  - length prefilter at candidate time (jaccard ≥ t ⇒ t·|B| ≤ |A|);
    *  - candidates then exact-verified with true jaccard over the full sets
    *    (hash-collision-exact w.h.p. 1 - n²/2⁶⁴).
    * At 100 TB the same plan holds: one shuffle on prefix tokens, one
    * candidate-keyed verify join — no per-block quadratic stage.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, shingleCol: String,
                        blockCol: String, threshold: Double): DataFrame = {
    val hashed = df.select(col(blockCol).as("blk"), col(idCol),
      array_sort(array_distinct(transform(col(shingleCol), s => xxhash64(s)))).as("hs"))
      .withColumn("sz", size(col("hs")))
      .localCheckpoint()
    // PPJoin prefix: first |X| - ⌈t·|X|⌉ + 1 = ⌊(1-t)·|X|⌋ + 1 tokens
    val pfxLen = (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
    val pfx = hashed.select(col("blk"), col(idCol), col("sz"),
      explode(slice(col("hs"), lit(1), pfxLen)).as("tok"))
    val aTok = pfx.select(col("blk"), col("tok"), col(idCol).as("a_id"), col("sz").as("a_sz"))
    val bTok = pfx.select(col("blk"), col("tok"), col(idCol).as("b_id"), col("sz").as("b_sz"))
    val cands = aTok.join(bTok, Seq("blk", "tok"))
      .filter(col("a_id") < col("b_id") &&
        col("a_sz") >= lit(threshold) * col("b_sz") &&
        col("b_sz") >= lit(threshold) * col("a_sz"))
      .select(col("blk"), col("a_id"), col("b_id"))
      .distinct()
    val a = hashed.select(col("blk"), col(idCol).as("a_id"), col("hs").as("a_sh"))
    val b = hashed.select(col("blk"), col(idCol).as("b_id"), col("hs").as("b_sh"))
    cands.join(a, Seq("blk", "a_id")).join(b, Seq("blk", "b_id"))
      .withColumn("jaccard", TextAnalysis.jaccard(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Connected components over a near-duplicate pair list — the step that
    * turns pairwise dedup output into survivor groups (keep one doc per
    * component, the standard corpus-dedup recipe; e.g. the near-dedup
    * stage in BigCode/The-Stack style pipelines runs exactly
    * minhash-LSH → connected components → keep-one).
    *
    * Min-label propagation: every vertex starts as its own label; each
    * round takes the min over its neighbors' labels, until a fixpoint.
    * Rounds = component diameter — near-dup clusters are dense and
    * shallow (duplicates of one source document all pair with each
    * other), so this converges in a handful of rounds; each round is ONE
    * shuffle keyed by vertex id, never materializing anything bigger than
    * the edge list. The convergence check is a `limit(1)` probe, not a
    * full count. Returns (idCol, component) for every vertex that appears
    * in a pair; component = smallest id in the component.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    // localCheckpoint truncates lineage by pinning blocks in the block
    // manager; without explicit release, every round's full vertex-label
    // set stays resident until the context dies — up to maxIter copies on
    // a 100 TB-corpus dedup. Checkpoint through an EXPLICIT RDD handle
    // (rdd.localCheckpoint + materialize, DataFrame rebuilt over it) so
    // the previous round's blocks can be released precisely — never by
    // diffing the context-global persistent-RDD set, which would unpersist
    // RDDs a concurrent job on the shared context just checkpointed.
    def checkpointRdd(df: DataFrame)
        : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val rdd = df.rdd
      rdd.localCheckpoint()
      rdd.count() // materialize before anyone depends on it
      (spark.createDataFrame(rdd, df.schema), rdd)
    }
    val edges = pairs.select(col(aCol).as("__u"), col(bCol).as("__v"))
      .union(pairs.select(col(bCol).as("__u"), col(aCol).as("__v")))
      .distinct().localCheckpoint()
    var (labels, labelsRdd) = checkpointRdd(
      edges.select(col("__u")).distinct().withColumn("__lbl", col("__u")))
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("__u").as("__v"), col("__lbl")), "__v")
        .groupBy(col("__u")).agg(min(col("__lbl")).as("__nlbl"))
      // neighbor-min plus PATH HALVING (label-of-label shortcut): rounds
      // needed drop from O(diameter) to O(log diameter), so a 10k-long
      // gradual-drift duplicate chain converges in ~14 rounds instead of
      // aborting at the cap
      val hop = labels.select(col("__u").as("__h_u"), col("__lbl").as("__h_lbl"))
      val (next, nextRdd) = checkpointRdd(
        labels.join(nbrMin, Seq("__u"), "left_outer")
          .select(col("__u"),
            least(col("__lbl"), coalesce(col("__nlbl"), col("__lbl"))).as("__lbl0"))
          .join(hop, col("__lbl0") === col("__h_u"), "left_outer")
          .select(col("__u"),
            least(col("__lbl0"), coalesce(col("__h_lbl"), col("__lbl0"))).as("__lbl")))
      val changed = next
        .join(labels.select(col("__u"), col("__lbl").as("__old")), "__u")
        .filter(col("__lbl") =!= col("__old")).limit(1).count()
      labelsRdd.unpersist(false) // this round's reads are done; release it
      labelsRdd = nextRdd
      labels = next
      converged = changed == 0L
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    lastConvergenceRounds.set(it)
    labels.select(col("__u").as(aCol), col("__lbl").as("component"))
  }

  /** Rounds the last [[connectedComponents]] call took to converge —
    * spec instrumentation for the O(log diameter) claim (a diameter-d
    * chain must finish in ⌈log₂ d⌉ + 1 rounds: each round's neighbor-min
    * + label-of-label shortcut doubles the propagated distance, and the
    * final round only verifies no change). */
  val lastConvergenceRounds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Benchmark decontamination (the GPT-3 recipe, arXiv:2005.14165
    * appendix C: flag training documents that share any word 13-gram with
    * an evaluation set; `n` configurable — The Pile and C4 pipelines use
    * the same shape with different n): returns `(idCol, n_hits)` for
    * documents whose word-n-gram set intersects the benchmark's, with
    * `n_hits` = the count of DISTINCT shared grams.
    *
    * Scale shape: the benchmark gram set is `distinct()` + broadcast —
    * eval suites are bounded (millions of grams at most), never
    * corpus-sized — so the corpus side is ONE scan with a map-side hash
    * probe; the only shuffle is the per-document hit-count aggregation
    * (map-side partial). At 100 TB the cost is a linear pass over the
    * text column. */
  def contaminationFlags(docs: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchTextCol: String,
                         n: Int = 13, minHits: Int = 1): DataFrame = {
    def grams(c: Column): Column = {
      val words = split(lower(trim(c)), "\\s+")
      val cnt = size(words) - (n - 1)
      when(cnt >= 1, array_distinct(transform(sequence(lit(1), cnt),
        i => concat_ws(" ", slice(words, i, lit(n))))))
        .otherwise(typedLit(Array.empty[String]))
    }
    val bg = bench.select(explode(grams(col(benchTextCol))).as("g")).distinct()
    docs.select(col(idCol), explode(grams(col(textCol))).as("g"))
      .join(broadcast(bg), "g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** Corpus-level exact LINE deduplication (the RefinedWeb / CCNet
    * line-dedup stage, arXiv:2306.01116 §3.2 / arXiv:1911.00359: a line
    * appearing in ≥ `minDocs` distinct documents is boilerplate — nav
    * bars, cookie banners, license headers — and is removed from EVERY
    * document, keeping the documents themselves). Operates on a
    * pre-split `linesCol: array<string>` so the caller owns the line
    * discipline (real corpora split on '\n'; fixtures may window words).
    *
    * Returns one row per document with ≥1 line: `(idCol, n_lines,
    * n_dup_lines, cleaned)` — `cleaned` re-joins the surviving lines in
    * order with a single space, NULL when every line was boilerplate.
    *
    * Scale shape: one (line, doc)-keyed partial-agg shuffle collapses
    * per-doc repeats, one line-keyed count finds the corpus-duplicated
    * lines (a tiny fraction — AQE broadcasts it into the flag join when
    * small), one doc-keyed shuffle reassembles. No stage is quadratic
    * and nothing is ever keyed by the full corpus — the same plan holds
    * at 100 TB. */
  def lineDedup(df: DataFrame, idCol: String, linesCol: String,
                minDocs: Int = 2): DataFrame = {
    val lines = df.select(col(idCol), posexplode(col(linesCol)).as(Seq("idx", "line")))
    // distinct-doc frequency as two explicit partial aggs (never a
    // count(distinct) expand over the corpus)
    val dup = lines.select(col("line"), col(idCol)).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("line"), lit(true).as("__dup"))
    lines.join(dup, Seq("line"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dup_lines"),
        // collect_list drops nulls, so only surviving lines travel;
        // sort_array on (idx, line) structs restores document order
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__dup").isNull,
            struct(col("idx"), col("line"))))),
          x => x.getField("line"))).as("cleaned"))
      .withColumn("cleaned",
        when(col("n_dup_lines") === col("n_lines"), lit(null)
          .cast("string")).otherwise(col("cleaned")))
  }

  /** Exact-substring duplicate spans (Lee et al. 2021, arXiv:2107.06499
    * §4.1 ExactSubstr: remove substrings of ≥ k tokens that occur more
    * than once in the corpus — the dedup family document-level methods
    * miss, e.g. boilerplate paragraphs pasted into otherwise-unique
    * pages). The paper builds a single-machine suffix array; the
    * distributed formulation here is the k-token sliding-window
    * equivalence: a token belongs to a duplicated substring of length
    * ≥ k iff some k-window containing it occurs ≥ 2 times corpus-wide.
    *
    * Returns `(idCol, span_start, span_end)` — 0-based token offsets,
    * end exclusive, overlapping/adjacent windows merged into maximal
    * spans.
    *
    * Scale shape: windows stream as (xxhash64(window), doc, start) —
    * never the window text; the duplicate-hash set comes from ONE
    * map-side-combined count (shuffle keyed on the 8-byte hash, linear
    * in corpus tokens — the honest cost of EXACT substring matching;
    * the sub-linear paths are the document/paragraph families above);
    * the span merge is one doc-keyed window (partitioned, bounded by
    * doc length). Collisions: two distinct windows sharing an xxhash64
    * value could merge spans spuriously at p ≈ n²/2⁶⁵ — the paper's
    * own Bloom-filter variant accepts the same class of error. */
  def exactSubstringSpans(df: DataFrame, idCol: String, textCol: String,
                          k: Int): DataFrame = {
    require(k >= 2, s"window must be at least 2 tokens, got $k")
    val words = split(col(textCol), " ")
    val nwin = size(words) - (k - 1)
    val wins = df.select(col(idCol), posexplode(
        when(nwin >= 1, transform(sequence(lit(1), nwin),
          i => xxhash64(concat_ws(" ", slice(words, i, lit(k))))))
          .otherwise(typedLit(Array.empty[Long]))))
      .toDF(idCol, "__start", "__h")
    // "more than once in the corpus" includes twice within one document
    val dup = wins.groupBy(col("__h")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).select(col("__h"))
    val hits = wins.join(dup, "__h").select(col(idCol), col("__start"))
    // gaps-and-islands over sorted starts: equal-length spans sort by end
    // too, so the running "previous end" IS lag(start) + k; start beyond
    // it opens a new island (adjacent windows merge — they tile one
    // contiguous duplicated region)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__start"))
    hits
      .withColumn("__new", when(col("__start") >
        coalesce(lag(col("__start"), 1).over(w) + lit(k), lit(Int.MinValue)),
        1L).otherwise(0L))
      .withColumn("__isle", sum(col("__new")).over(w))
      .groupBy(col(idCol), col("__isle"))
      .agg(min(col("__start")).cast("long").as("span_start"),
        (max(col("__start")) + lit(k)).cast("long").as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /** Companion scrub: the document texts with every [[exactSubstringSpans]]
    * token removed (the paper's removal policy; spans rarely cut mid-
    * sentence at k ≥ 50). Docs without duplicated spans pass through
    * untouched; a fully-duplicated doc scrubs to null (drop candidate). */
  def exactSubstringScrub(df: DataFrame, idCol: String, textCol: String,
                          k: Int): DataFrame = {
    val spans = exactSubstringSpans(df, idCol, textCol, k)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    val words = split(col(textCol), " ")
    val kept = filter(words, (_, i) =>
      !exists(col("__spans"), sp =>
        i >= sp.getField("span_start") && i < sp.getField("span_end")))
    df.join(spans, Seq(idCol), "left_outer")
      .select(col(idCol),
        when(col("__spans").isNull, col(textCol))
          .otherwise(when(size(kept) === 0, lit(null).cast("string"))
            .otherwise(concat_ws(" ", kept))).as("cleaned"))
  }

  /** A brute-force block larger than this refuses (≈ 3×10⁷ pairs): the
    * within-block join is all-pairs BY CONTRACT, so block size is the one
    * knob standing between "baseline" and "accidental cartesian". */
  val DefaultMaxBlock = 8192

  /** Embedding cosine near-dup pairs within a blocking key (brute-force
    * baseline; IVF/LSH bucketing is the scale path — see [[semanticDedup]]
    * and [[minhashNearDupPairs]]).
    *
    * Each block is joined ALL-PAIRS, so a low-cardinality `blockCol` is a
    * quadratic hazard: any block holding more than `maxBlock` rows fails the
    * job at execution time (a distributed per-block count guard — no extra
    * driver pass) with a pointer at the scale paths. Raise `maxBlock`
    * explicitly to accept the quadratic cost. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            blockCol: String, minSim: Double,
                            maxBlock: Int = DefaultMaxBlock): DataFrame = {
    val base = df.select(col(blockCol).as("blk"), col(idCol), col(vecCol))
    // the guard rides the join input as a filter over assert_true, so it
    // cannot be pruned away and adds no extra job. Block sizes come from
    // a groupBy (map-side partial agg — one block-count row per block,
    // NOT a window sort over the corpus: the first formulation's window
    // cost quadrupled the gate) joined back on blk, the key the pair
    // join shuffles on anyway.
    val counts = base.groupBy(col("blk")).agg(count(lit(1)).as("__bn"))
    val guarded = base.join(counts, Seq("blk"))
      .filter(assert_true(col("__bn") <= maxBlock, concat(
        lit("embeddingNearDupPairs: block "), col("blk").cast("string"),
        lit(" holds "), col("__bn").cast("string"),
        lit(s" rows > maxBlock=$maxBlock; the within-block join is the " +
          "all-pairs brute baseline — use semanticDedup (IVF-blocked) or " +
          "minhashNearDupPairs at this scale, or raise maxBlock explicitly")))
        .isNull)
      .drop("__bn")
    val a = guarded.select(col("blk"), col(idCol).as("a_id"), col(vecCol).as("a_vec"))
    val b = guarded.select(col("blk"), col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", lit(1.0) - cosineDistance(col("a_vec"), col("b_vec")))
      .filter(col("sim") >= minSim)
      .select(col("a_id"), col("b_id"), col("sim"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    * k-means clustering + within-cluster cosine pruning — the standard
    * recipe for stripping semantic (not just lexical) duplicates from a
    * training corpus.
    *
    *  - cluster the embeddings (deterministic distributed Lloyd's —
    *    [[IvfIndex.train]] — so the result is reproducible);
    *  - within each cluster, a row is PRUNED when some ranked-ahead row of
    *    the same cluster has cosine similarity ≥ `tau`. Rank follows the
    *    paper: ASCENDING similarity to the cluster centroid (ties by id) —
    *    the kept representative of a duplicate neighborhood is the one
    *    farthest from the centroid, preserving diversity at the cluster
    *    edge.
    *
    * Pruning is DOMINANCE-based — a row is removed when ANY ranked-ahead
    * row is τ-similar, whether or not that row itself survives. Slightly
    * more aggressive than a sequential keep-list sweep, and in exchange
    * embarrassingly parallel (one pair-join, no ordered iteration) — the
    * property that matters at corpus scale. Invariant either way: two KEPT
    * rows of one cluster always have sim < `tau` (else the ranked-ahead one
    * would have pruned the other).
    *
    * Scale shape: clustering is the [[IvfIndex.train]] sample + assign
    * passes; the quadratic term is BLOCKED by cluster (the paper's own
    * device) — one shuffle on cluster id, per-cluster pairs bounded by
    * (n/k)², with k chosen so n/k is a few thousand. No stage is all-pairs
    * over the corpus. Returns (id, cluster, centroid_sim, kept).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    nClusters: Int, tau: Double): DataFrame = {
    val spark = df.sparkSession
    val model = IvfIndex.train(df, idCol, vecCol, nClusters)
    val cents = spark.createDataFrame(
      model.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq)
      .toDF("__pid", "__cent")
    val scored = df
      .withColumn("__pid", org.apache.spark.sql.graftshim.ColumnBridge.column(
        IvfAssign(org.apache.spark.sql.graftshim.ColumnBridge.expression(col(vecCol)),
          model.centroids)))
      .join(broadcast(cents), "__pid")
      .withColumn("__csim", lit(1.0) - cosineDistance(col(vecCol), col("__cent")))
      .select(col("__pid"), col(idCol), col(vecCol), col("__csim"))
      .localCheckpoint() // one assignment pass feeds both join sides
    val a = scored.select(col("__pid"), col(idCol).as("a_id"),
      col(vecCol).as("a_vec"), col("__csim").as("a_r"))
    val b = scored.select(col("__pid"), col(idCol).as("b_id"),
      col(vecCol).as("b_vec"), col("__csim").as("b_r"))
    val pruned = a.join(b, Seq("__pid"))
      .filter(col("b_r") < col("a_r") ||
        (col("b_r") === col("a_r") && col("b_id") < col("a_id"))) // b ranks ahead
      .filter(lit(1.0) - cosineDistance(col("a_vec"), col("b_vec")) >= tau)
      .select(col("a_id")).distinct()
    scored
      .join(pruned.withColumn("__pruned", lit(true)),
        scored(idCol) === pruned("a_id"), "left_outer")
      .select(col(idCol), col("__pid").as("cluster"),
        col("__csim").as("centroid_sim"),
        not(coalesce(col("__pruned"), lit(false))).as("kept"))
  }
}
