package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
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

  /** Candidate pairs sharing at least one MinHash LSH band bucket.
    * Output: (a_id, b_id) distinct, a_id < b_id.
    */
  def minhashCandidates(df: DataFrame, idCol: String, shingleCol: String,
                        numPerms: Int = 128, bandRows: Int = 2): DataFrame = {
    val numBands = numPerms / bandRows
    val sig = df.select(col(idCol), minhashSignature(col(shingleCol), numPerms).as("sig"))
    // (band, bucketHash(bandSlice)) per doc; slice = sig[band*r .. band*r+r)
    val banded = sig.select(
      col(idCol),
      explode(transform(sequence(lit(0), lit(numBands - 1)),
        b => struct(b.as("band"), xxhash64(slice(col("sig"), b * bandRows + 1, lit(bandRows))).as("bucket"))))
        .as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
    val l = banded.select(col("band"), col("bucket"), col(idCol).as("a_id"))
    val r = banded.select(col("band"), col("bucket"), col(idCol).as("b_id"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** MinHash LSH near-duplicate pairs, exact-verified: candidates from
    * banding, then true jaccard over the shingle sets ≥ threshold.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, shingleCol: String,
                          threshold: Double, numPerms: Int = 128, bandRows: Int = 2): DataFrame = {
    val cands = minhashCandidates(df, idCol, shingleCol, numPerms, bandRows)
    val a = df.select(col(idCol).as("a_id"), col(shingleCol).as("a_sh"))
    val b = df.select(col(idCol).as("b_id"), col(shingleCol).as("b_sh"))
    cands.join(a, "a_id").join(b, "b_id")
      .withColumn("jaccard", TextAnalysis.jaccard(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs: block on 16-bit chunks (hamming ≤ 3 over
    * 64 bits ⇒ at least one of 4 chunks identical), verify hamming ≤ maxDist.
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, shingleCol: String,
                          maxDist: Int = 3): DataFrame = {
    val sh = df.select(col(idCol), simhash64(col(shingleCol)).as("sim"))
    val chunked = sh.select(col(idCol), col("sim"),
      explode(array((0 until 4).map(c => struct(
        lit(c).as("chunk"),
        shiftrightunsigned(col("sim"), c * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*))
        .as("ck"))
      .select(col(idCol), col("sim"), col("ck.chunk"), col("ck.key"))
    val l = chunked.select(col("chunk"), col("key"), col(idCol).as("a_id"), col("sim").as("a_sim"))
    val r = chunked.select(col("chunk"), col("key"), col(idCol).as("b_id"), col("sim").as("b_sim"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Brute-force n-gram jaccard near-dup pairs within a blocking key
    * (correctness baseline; LSH is the scale path). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, shingleCol: String,
                        blockCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(blockCol).as("blk"), col(idCol).as("a_id"), col(shingleCol).as("a_sh"))
    val b = df.select(col(blockCol).as("blk"), col(idCol).as("b_id"), col(shingleCol).as("b_sh"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("jaccard", TextAnalysis.jaccard(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Embedding cosine near-dup pairs within a blocking key (brute-force
    * baseline; IVF/LSH bucketing is the scale path). */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            blockCol: String, minSim: Double): DataFrame = {
    val a = df.select(col(blockCol).as("blk"), col(idCol).as("a_id"), col(vecCol).as("a_vec"))
    val b = df.select(col(blockCol).as("blk"), col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", lit(1.0) - cosineDistance(col("a_vec"), col("b_vec")))
      .filter(col("sim") >= minSim)
      .select(col("a_id"), col("b_id"), col("sim"))
  }
}
