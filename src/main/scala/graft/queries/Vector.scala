package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.{BinaryIvfIndex, Dedup, IvfIndex, Knn, PackSignBits}
import org.apache.spark.sql.graftshim.ColumnBridge

/** Vector search coverage (SURVEY §2.5): flat KNN over l2/cosine/dot and an
  * embedding-cosine near-duplicate self-join. Oracles use DuckDB's
  * list_distance / list_cosine_similarity / list_inner_product, both sides
  * computing in float64.
  */
object Vector {
  type Q = (SparkSession, String) => DataFrame

  /** Query vector = embedding of vec_id 0 (driver-side query parameter, as in
    * the reference's `Query` struct — `rust/lance-index/src/vector.rs:72-116`). */
  private def queryVec(s: SparkSession, d: String): Array[Float] =
    Tables.embeddings(s, d).filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  /** In-gate recall floor (VERDICT r12 #4): the approximate rows-only
    * gates assert recall@10 against the flat-search truth over `corpus`,
    * so a quality regression fails the gate instead of sliding through a
    * shape-only check. Floors sit BELOW the measured sf0.01/sf0.1 values
    * with slack for corpus regeneration, not at them; the tight curve
    * lives in tools/RecallProbe + the per-index recall specs. */
  private def requireRecall(corpus: DataFrame, q: Array[Float],
                            got: DataFrame, floor: Double,
                            gate: String): DataFrame = {
    val truth = Knn.flatSearch(corpus, "embedding", q, 10, "l2",
        tieBreakers = Seq(col("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ids = got.select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = truth.count(ids.contains).toDouble / truth.size
    require(recall >= floor,
      f"$gate recall@10 = $recall%.2f below floor $floor%.2f")
    got
  }

  // one shared IVF / IVF_PQ index per sfDir per JVM
  private val builtIvf = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val builtPq = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def pqIndexFor(s: SparkSession, d: String): String =
    builtPq.computeIfAbsent(d, { _ =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gate/ivfpq_${d.hashCode.toHexString}"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      graft.operators.PqIndex.build(Tables.embeddings(s, d), "vec_id", "embedding",
        dir, nlist = 8, m = 8, k = 16)
      dir
    })

  private val builtPq4 = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def pq4IndexFor(s: SparkSession, d: String): String =
    builtPq4.computeIfAbsent(d, { _ =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gate/ivfpq4_${d.hashCode.toHexString}"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      graft.operators.PqIndex.build(Tables.embeddings(s, d), "vec_id", "embedding",
        dir, nlist = 8, m = 8, k = 16, numBits = 4)
      dir
    })

  private val builtSq = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def sqIndexFor(s: SparkSession, d: String): String =
    builtSq.computeIfAbsent(d, { _ =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gate/ivfsq_${d.hashCode.toHexString}"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      graft.operators.SqIndex.build(Tables.embeddings(s, d), "vec_id", "embedding",
        dir, nlist = 8)
      dir
    })

  private val builtRq = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def rqIndexFor(s: SparkSession, d: String): String =
    builtRq.computeIfAbsent(d, { _ =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gate/ivfrq_${d.hashCode.toHexString}"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      graft.operators.RqIndex.build(Tables.embeddings(s, d), "vec_id", "embedding",
        dir, nlist = 8)
      dir
    })

  private val builtHnsw = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def hnswIndexFor(s: SparkSession, d: String): String =
    builtHnsw.computeIfAbsent(d, { _ =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gate/hnsw_${d.hashCode.toHexString}"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      graft.operators.HnswIndex.build(
        Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", dir, nlist = 4, m = 16, efConstruction = 64)
      dir
    })

  private val builtHnswSq = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Table-backed IVF_HNSW_SQ with a post-build append + DELTA optimize
    * (VERDICT r6 #2): 7/8 of the corpus is indexed by the build, the last
    * 1/8 arrives as an appended fragment and is folded in by
    * [[graft.operators.HnswIndex.optimizeForTable]] as a delta sub-graph —
    * the gate then searches indexed-only (fast_search), so a hash match
    * proves the delta generation is traversed. Returns (table, index). */
  private def hnswSqIndexFor(s: SparkSession, d: String): (String, String) =
    builtHnswSq.computeIfAbsent(d, { _ =>
      import graft.format.GraftTable
      val t = freshDir(s, s"hnswsq_tbl_${d.hashCode.toHexString}")
      val idx = freshDir(s, s"hnswsq_idx_${d.hashCode.toHexString}")
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cut = math.floor(e.count() * 7.0 / 8.0).toLong
      GraftTable.write(e.filter(col("vec_id") < cut)
        .repartitionByRange(4, col("vec_id")), t, "overwrite")
      graft.operators.HnswIndex.buildForTable(s, t, "vec_id", "embedding",
        idx, nlist = 4, m = 16, efConstruction = 64, storage = "sq")
      GraftTable.write(e.filter(col("vec_id") >= cut), t, "append")
      graft.operators.HnswIndex.optimizeForTable(s, t, "vec_id", "embedding", idx)
      (t, idx)
    })

  private val builtHnswPq = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def hnswPqIndexFor(s: SparkSession, d: String): String =
    builtHnswPq.computeIfAbsent(d, { _ =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gate/hnswpq_${d.hashCode.toHexString}"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      graft.operators.HnswIndex.build(
        Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", dir, nlist = 4, m = 16, efConstruction = 64,
        storage = "pq", pqM = 8, pqK = 16)
      dir
    })

  private val builtMultivecAnn = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Table + IVF index over the q_multivector corpus (vec_id > 1), for the
    * multivector-over-ANN gate. Returns (table, index). */
  private def multivecAnnFor(s: SparkSession, d: String): (String, String) =
    builtMultivecAnn.computeIfAbsent(d, { _ =>
      import graft.format.GraftTable
      val t = freshDir(s, s"multivec_ann_tbl_${d.hashCode.toHexString}")
      val idx = freshDir(s, s"multivec_ann_idx_${d.hashCode.toHexString}")
      GraftTable.write(Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") > 1L)
        .repartitionByRange(4, col("vec_id")), t, "overwrite")
      IvfIndex.buildForTable(s, t, "vec_id", "embedding", idx, nlist = 8)
      (t, idx)
    })

  private val builtIvfF16 = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ivfF16IndexFor(s: SparkSession, d: String): String =
    builtIvfF16.computeIfAbsent(d, { _ =>
      import graft.functions.F16Functions._
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gate/ivff16_${d.hashCode.toHexString}"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      IvfIndex.build(Tables.embeddings(s, d)
        .select(col("vec_id"), f16Pack(col("embedding")).as("emb_f16")),
        "vec_id", "emb_f16", dir, nlist = 8)
      dir
    })

  private def freshDir(s: SparkSession, name: String): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gate/$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    dir
  }

  private val builtIvfPretrained =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Precomputed-model build (reference `create_index(ivf_centroids=...,
    * train=False)`): train → save → load → build under the saved model,
    * so the gate exercises the whole persist/reuse round trip. */
  private def pretrainedIvfFor(s: SparkSession, d: String): String =
    builtIvfPretrained.computeIfAbsent(d, { _ =>
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_gate/ivfpre_${d.hashCode.toHexString}"
      val p = new org.apache.hadoop.fs.Path(base)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      val emb = Tables.embeddings(s, d)
      IvfIndex.saveModelTo(s, s"$base/model",
        IvfIndex.train(emb, "vec_id", "embedding", nlist = 8))
      IvfIndex.build(emb, "vec_id", "embedding", s"$base/idx", nlist = 8,
        precomputed = Some(IvfIndex.loadModel(s, s"$base/model")))
      s"$base/idx"
    })

  private def ivfIndexFor(s: SparkSession, d: String): String =
    builtIvf.computeIfAbsent(d, { _ =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_gate/ivf_${d.hashCode.toHexString}"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      IvfIndex.build(Tables.embeddings(s, d), "vec_id", "embedding", dir, nlist = 8)
      dir
    })

  /** One-time index builds, exposed so Bench can time them separately from
    * the queries that reuse them (builds dominate first-query wall time and
    * would otherwise be misattributed — VERDICT r2 perf note). */
  val builds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "build_ivf" -> ((s, d) => { ivfIndexFor(s, d); () }),
    "build_ivf_pretrained" -> ((s, d) => { pretrainedIvfFor(s, d); () }),
    "build_ivfpq" -> ((s, d) => { pqIndexFor(s, d); () }),
    "build_ivfsq" -> ((s, d) => { sqIndexFor(s, d); () }),
    "build_ivfrq" -> ((s, d) => { rqIndexFor(s, d); () }),
    // warm() books the graph shuffle+persist here so q_ann_hnsw measures
    // query cost, not one-time cache materialization (VERDICT r4 #10)
    "build_hnsw" -> ((s, d) => {
      graft.operators.HnswIndex.warm(s, hnswIndexFor(s, d)) }),
    "build_hnsw_sq" -> ((s, d) => {
      graft.operators.HnswIndex.warm(s, hnswSqIndexFor(s, d)._2) }),
    "build_hnsw_pq" -> ((s, d) => {
      graft.operators.HnswIndex.warm(s, hnswPqIndexFor(s, d)) })
  )

  /** Queries that write/mutate temp tables and build throwaway indexes —
    * Bench runs these AFTER the read-only queries with cleanup in between,
    * so their session debris (shuffle files, cached blocks) cannot pollute
    * unrelated timings (VERDICT r4 What's-wrong #2). */
  val mutating: Set[String] = Set(
    "q_ann_after_compact", "q_ann_prefilter_combined", "q_ann_hnsw_after_compact",
    "q_ann_remap", "q_ann_defer")

  val queries: Map[String, Q] = Map(
    "q_knn_l2" -> { (s, d) =>
      val q = queryVec(s, d)
      Knn.flatSearch(
          Tables.embeddings(s, d).filter(col("vec_id") =!= 0L),
          "embedding", q, 10, "l2", tieBreakers = Seq(col("vec_id")))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    "q_knn_cosine" -> { (s, d) =>
      val q = queryVec(s, d)
      Knn.flatSearch(
          Tables.embeddings(s, d).filter(col("vec_id") =!= 0L),
          "embedding", q, 10, "cosine", tieBreakers = Seq(col("vec_id")))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    "q_knn_dot" -> { (s, d) =>
      val q = queryVec(s, d)
      Knn.flatSearch(
          Tables.embeddings(s, d).filter(col("vec_id") =!= 0L),
          "embedding", q, 10, "dot", tieBreakers = Seq(col("vec_id")))
        .select(col("vec_id"), round(-col(Knn.DistanceCol), 4).as("ip"))
    },

    // Half-precision search (reference `_cast_list_f16` storage + f16
    // kernels): the f16 pass ranks PACKED bytes (half the IO), the f32
    // refine recovers exact top-k — so the gate hash-matches the exact
    // oracle, proving both the pack/decode round and the refine pattern.
    "q_knn_f16" -> { (s, d) =>
      import graft.functions.F16Functions._
      val q = queryVec(s, d)
      val packed = Tables.embeddings(s, d).filter(col("vec_id") =!= 0L)
        .withColumn("emb_f16", f16Pack(col("embedding")))
      Knn.flatSearchF16(packed, "emb_f16", q, 10, "l2",
          tieBreakers = Seq(col("vec_id")),
          refineWith = Some("embedding"), refineFactor = 4)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // bf16 twin (reference lance.arrow.BFloat16Array + bf16 kernels): the
    // coarser mantissa (8 bits) needs a wider refine than f16 to recover
    // the exact top-10; the refined result must equal the f32 oracle.
    "q_knn_bf16" -> { (s, d) =>
      import graft.functions.Bf16Functions._
      val q = queryVec(s, d)
      val packed = Tables.embeddings(s, d).filter(col("vec_id") =!= 0L)
        .withColumn("emb_bf16", bf16Pack(col("embedding")))
      Knn.flatSearchBf16(packed, "emb_bf16", q, 10, "l2",
          tieBreakers = Seq(col("vec_id")),
          refineWith = Some("embedding"), refineFactor = 8)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // f16 storage round trip: pack → graft table (BINARY column at rest,
    // 2 bytes/element) → read → verify precision in-gate (quantization
    // error within the binary16 bound; re-pack idempotent), emit per-row
    // byte sizes the oracle recomputes from the f32 table.
    "q_f16_storage" -> { (s, d) =>
      import graft.functions.F16Functions._
      import graft.format.GraftTable
      val t = freshDir(s, s"f16_tbl_${d.hashCode.toHexString}")
      GraftTable.write(Tables.embeddings(s, d)
        .select(col("vec_id"), f16Pack(col("embedding")).as("emb_f16"))
        .repartitionByRange(4, col("vec_id")), t, "overwrite")
      val back = GraftTable.read(s, t)
      // quantization bound: |unpack(pack(x)) - x| <= 2^-10 * max(|x|, 2^-14)
      // (binary16 rel. precision 2^-11 + RNE rounding; subnormal floor)
      val err = back.join(Tables.embeddings(s, d), "vec_id")
        .select(aggregate(
          zip_with(f16Unpack(col("emb_f16")), col("embedding"),
            (u, o) => abs(u - o) / greatest(abs(o), lit(0.00006103515625f))),
          lit(0.0), (acc, x) => greatest(acc, x.cast("double"))).as("maxrel"))
        .agg(max(col("maxrel"))).head().getDouble(0)
      require(err <= 0.0009765625, // 2^-10
        s"f16 round-trip error $err exceeds the binary16 bound")
      // idempotence: pack(unpack(b)) == b, byte-exact
      val nonIdem = back.filter(
        f16Pack(f16Unpack(col("emb_f16"))) =!= col("emb_f16")).count()
      require(nonIdem == 0L, s"$nonIdem rows re-pack differently")
      back.select(col("vec_id"), length(col("emb_f16")).cast("long").as("f16_bytes"))
        .orderBy(col("vec_id"))
    },

    // Distance-bounded search (reference `distance_range`, scanner.rs:1087).
    "q_knn_range" -> { (s, d) =>
      val q = queryVec(s, d)
      Knn.withDistance(Tables.embeddings(s, d), "embedding", q, "l2")
        .filter(col(Knn.DistanceCol) > lit(0.0) && col(Knn.DistanceCol) < lit(1.2))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
        .orderBy(col("dist"), col("vec_id"))
    },

    // IVF-indexed ANN with nprobes = nlist: must EXACTLY equal flat search,
    // which makes the whole build+probe+search machinery oracle-checkable.
    "q_ann_ivf_exact" -> { (s, d) =>
      val q = queryVec(s, d)
      val idx = ivfIndexFor(s, d)
      IvfIndex.search(s, idx, "vec_id", "embedding", q, k = 10, nprobes = 8)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // Precomputed-model build (reference create_index(ivf_centroids=...,
    // train=False), dataset.py:2525-2541): the index was built under a
    // SAVED model with training skipped; full probe must still equal flat
    // search — which proves the persisted centroids round-trip and the
    // no-train assignment pass end to end.
    "q_ann_ivf_pretrained" -> { (s, d) =>
      val q = queryVec(s, d)
      val idx = pretrainedIvfFor(s, d)
      IvfIndex.search(s, idx, "vec_id", "embedding", q, k = 10, nprobes = 8)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // IVF over PACKED f16 storage (half the index IO): full-probe f16
    // ranking over-fetches 4k, the f32 refine recovers exact top-k — the
    // whole pack → assign-through-decode → f16-kernel-serve chain is
    // oracle-checked exactly.
    "q_ann_ivf_f16" -> { (s, d) =>
      import graft.functions.F16Functions._
      val q = queryVec(s, d)
      val idx = ivfF16IndexFor(s, d)
      val cands = IvfIndex.search(s, idx, "vec_id", "emb_f16", q,
        k = 40, nprobes = 8).select(col("vec_id"))
      Knn.flatSearch(
          Tables.embeddings(s, d).join(cands, Seq("vec_id"), "left_semi"),
          "embedding", q, 10, "l2", tieBreakers = Seq(col("vec_id")))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // Hamming-metric binary-vector ANN (reference DistanceType::Hamming,
    // vector.rs:124, distance/hamming.rs): sign-bit-packed embeddings,
    // k-majority IVF, FULL probe == flat hamming scan. The oracle computes
    // the identical distance as the count of sign disagreements (packing
    // pads with zero bits on both sides, so popcount(xor) is exactly that).
    "q_ann_hamming" -> { (s, d) =>
      val dir = freshDir(s, "ann_hamming")
      val packed = Tables.embeddings(s, d)
        .withColumn("bvec",
          ColumnBridge.column(PackSignBits(ColumnBridge.expression(col("embedding")))))
        .select(col("vec_id"), col("bvec"))
      BinaryIvfIndex.build(packed, "vec_id", "bvec", dir, nlist = 8)
      val q = packed.filter(col("vec_id") === 0L).head().getAs[Array[Byte]](1)
      BinaryIvfIndex.search(s, dir, "vec_id", "bvec", q, k = 10, nprobes = 8)
        .select(col("vec_id"), col(Knn.DistanceCol).as("dist"))
    },

    // IVF_HNSW: per-partition navigable-small-world sub-index — rows-only
    // gate entry (graph search is approximate); HnswSpec gates recall ≥ 0.9.
    "q_ann_hnsw" -> { (s, d) =>
      val q = queryVec(s, d)
      val idx = hnswIndexFor(s, d)
      requireRecall(Tables.embeddings(s, d), q,
        graft.operators.HnswIndex.search(s, idx, q, k = 10, nprobes = 4, ef = 64)
          .select(col("id").as("vec_id"), round(col(Knn.DistanceCol), 4).as("dist")),
        floor = 0.9, gate = "q_ann_hnsw") // measured 1.00 @ both SFs; HnswSpec gates >=0.9 too
    },

    // Prefiltered ANN (reference prefilter.rs + scanner.rs:2254-2278): the
    // predicate is applied BEFORE the top-k cut, so exactly k rows of the
    // filtered set come back. nprobes = nlist ⇒ oracle-exact.
    "q_ann_prefilter" -> { (s, d) =>
      val q = queryVec(s, d)
      val idx = ivfIndexFor(s, d)
      IvfIndex.search(s, idx, "vec_id", "embedding", q, k = 10, nprobes = 8,
          prefilter = Some(col("label") === 3 && col("vec_id") =!= 0L))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // Compaction-safety end-to-end (VERDICT r2 #1): build IVF over a graft
    // table → DV-delete a slab → partial compaction rewrites the indebted
    // fragments (materializing the DVs, retiring their fragment ids) →
    // searchCombined must drop dead-fragment index rows and flat-search the
    // rewritten fragments. nprobes = nlist ⇒ exact over live rows.
    "q_ann_after_compact" -> { (s, d) =>
      import graft.format.GraftTable
      val t = freshDir(s, "ann_after_compact")
      val idx = freshDir(s, "ann_after_compact_idx")
      val e = Tables.embeddings(s, d)
      val q = queryVec(s, d)
      val cut = math.floor(e.count() / 8.0).toLong
      GraftTable.write(e.repartitionByRange(4, col("vec_id")), t, "overwrite")
      IvfIndex.buildForTable(s, t, "vec_id", "embedding", idx, nlist = 8)
      GraftTable.delete(s, t, s"vec_id < $cut")
      GraftTable.compactFiles(s, t, targetRows = 250, materializeDeletions = 0.1)
      IvfIndex.searchCombined(s, t, idx, "vec_id", "embedding", q, k = 10, nprobes = 8)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // Deferred-remap serving end-to-end (reference `defer_index_remap` +
    // FragReuseIndex, `rust/lance/src/dataset/optimize.rs:155-166`): build
    // IVF → pure compaction retires every covered fragment id → WITHOUT
    // optimize_index the search serves the whole corpus from the index's
    // old addresses (the rewrite outputs' `__old_addr` column is touched
    // only to map deletions backward — none here) — the in-gate require
    // proves the flat leg is EMPTY, so the hash-match is evidence for the
    // deferred path alone. nprobes = nlist ⇒ exact vs brute force.
    "q_ann_defer" -> { (s, d) =>
      import graft.format.GraftTable
      val t = freshDir(s, "ann_defer")
      // TABLE-LOCAL index path: provenance stamping is gated on the
      // manifest actually carrying an index (deferUseful), which needs
      // the IndexMeta commit only table-local builds perform
      val idx = s"$t/_indices/ivf_embedding"
      val e = Tables.embeddings(s, d)
      val q = queryVec(s, d)
      GraftTable.write(e.repartitionByRange(4, col("vec_id")), t, "overwrite")
      IvfIndex.buildForTable(s, t, "vec_id", "embedding", idx, nlist = 8)
      // full compact: UNCONDITIONAL rewrite (compactFiles' debt heuristic
      // can legally no-op at some scale factors, which would let the
      // requires below pass vacuously on the plain covered path)
      GraftTable.compact(s, t)
      val m = GraftTable.loadManifest(s, t)
      val cov = graft.index.ScalarIndex.readCoverage(s, idx).get.fragmentIds.toSet
      val (translatable, fresh) = IvfIndex.deferServing(m, cov)
      require(translatable.nonEmpty && translatable.forall(f => !cov.contains(f.id)),
        "the rewrite must RETIRE coverage into translatable outputs — " +
          s"got translatable=${translatable.map(_.id)} covered=$cov")
      require(fresh.isEmpty, "pure compaction outputs must serve deferred; " +
        s"flat leg got ${fresh.map(_.id)}")
      IvfIndex.searchCombined(s, t, idx, "vec_id", "embedding", q, k = 10, nprobes = 8)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // Post-compaction index REMAP end-to-end ([[graft.operators.IndexRemap]]):
    // build IVF → DV-delete a slab → partial compaction materializes the DVs
    // and retires the indebted fragment ids → optimize_index REMAPS the
    // dataset rows to their new addresses (zero rows re-encoded — asserted
    // in-line) → `fast_search` must then serve the whole live corpus from
    // the index alone. nprobes = nlist ⇒ exact, hash-gated vs brute force.
    "q_ann_remap" -> { (s, d) =>
      import graft.format.GraftTable
      val t = freshDir(s, "ann_remap")
      val idx = freshDir(s, "ann_remap_idx")
      val e = Tables.embeddings(s, d)
      val q = queryVec(s, d)
      val cut = math.floor(e.count() / 8.0).toLong
      GraftTable.write(e.repartitionByRange(4, col("vec_id")), t, "overwrite")
      IvfIndex.buildForTable(s, t, "vec_id", "embedding", idx, nlist = 8)
      GraftTable.delete(s, t, s"vec_id < $cut")
      GraftTable.compactFiles(s, t, targetRows = 250, materializeDeletions = 0.1)
      val reEncoded = IvfIndex.optimizeForTable(s, t, "vec_id", "embedding", idx)
      require(reEncoded == 0L,
        s"pure compaction must remap, not re-encode — got $reEncoded rows")
      IvfIndex.searchCombined(s, t, idx, "vec_id", "embedding", q, k = 10,
          nprobes = 8, fastSearch = true)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // Prefiltered cosine ANN over a LIVE table (VERDICT r3 #5): post-build
    // append (fresh fragment → flat leg) AND delete (DV → indexed leg), with
    // metric + prefilter threaded through searchCombined's both legs.
    // nprobes = nlist ⇒ exact over the filtered live set.
    "q_ann_prefilter_combined" -> { (s, d) =>
      import graft.format.GraftTable
      val t = freshDir(s, "ann_prefilter_combined")
      val idx = freshDir(s, "ann_prefilter_combined_idx")
      val e = Tables.embeddings(s, d)
      val q = queryVec(s, d)
      val n = e.count()
      val appendCut = math.floor(n * 7.0 / 8.0).toLong
      val delLo = math.floor(n / 4.0).toLong
      val delHi = math.floor(n * 3.0 / 8.0).toLong
      GraftTable.write(e.filter(col("vec_id") < appendCut)
        .repartitionByRange(4, col("vec_id")), t, "overwrite")
      IvfIndex.buildForTable(s, t, "vec_id", "embedding", idx, nlist = 8)
      GraftTable.write(e.filter(col("vec_id") >= appendCut), t, "append")
      GraftTable.delete(s, t, s"vec_id >= $delLo AND vec_id < $delHi")
      IvfIndex.searchCombined(s, t, idx, "vec_id", "embedding", q, k = 10,
          nprobes = 8, metric = "cosine",
          prefilter = Some(col("label") === 3 && col("vec_id") =!= 0L))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // IVF_HNSW compaction/delete safety end-to-end (VERDICT r3 #1), rows-only
    // (graph search is approximate): build over a graft table → DV-delete →
    // partial compaction retires fragment ids → searchCombined must mark
    // dead/deleted nodes routing-only and flat-search rewritten fragments.
    // HnswSpec asserts the returned ids exclude every deleted id.
    "q_ann_hnsw_after_compact" -> { (s, d) =>
      import graft.format.GraftTable
      val t = freshDir(s, "hnsw_after_compact")
      val idx = freshDir(s, "hnsw_after_compact_idx")
      val e = Tables.embeddings(s, d)
      val q = queryVec(s, d)
      val cut = math.floor(e.count() / 8.0).toLong
      GraftTable.write(e.repartitionByRange(4, col("vec_id")), t, "overwrite")
      graft.operators.HnswIndex.buildForTable(s, t, "vec_id", "embedding", idx, nlist = 4)
      GraftTable.delete(s, t, s"vec_id < $cut")
      GraftTable.compactFiles(s, t, targetRows = 250, materializeDeletions = 0.1)
      requireRecall(e.filter(col("vec_id") >= cut), q,
        graft.operators.HnswIndex.searchCombined(s, t, idx, "vec_id", "embedding", q,
            k = 10, nprobes = 4)
          .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist")),
        floor = 0.9, gate = "q_ann_hnsw_after_compact") // measured 1.00 @ both SFs
    },

    // IVF_RQ binary quantization (reference vector/bq/ — RaBitQ-style
    // sign-of-residual codes at 1 bit/dim, 32x compression): full probes +
    // wide exact refine == flat, so the oracle matches exactly; realistic
    // configs are gated by RqSpec recall.
    "q_ann_ivfrq_exact" -> { (s, d) =>
      val q = queryVec(s, d)
      val idx = rqIndexFor(s, d)
      graft.operators.RqIndex.search(s, idx, "vec_id", "embedding", q,
          kNeighbors = 10, nprobes = 8, refineFactor = 100)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // IVF_HNSW_SQ (reference IVF_HNSW_SQ, lib.rs:98-130 — hnsw/ over sq/
    // storage): the cached graph carries int8 codes only; beam on asymmetric
    // SQ distance, exact refine on survivors. Full probes + exhaustive beam
    // (ef = corpus size) + wide refine == flat search — the oracle-checked
    // HNSW family (VERDICT r5 task #2; q_ann_hnsw stays rows-only).
    "q_ann_hnsw_sq" -> { (s, d) =>
      val q = queryVec(s, d)
      val (t, idx) = hnswSqIndexFor(s, d)
      val n = Tables.embeddings(s, d).count().toInt
      // fast_search: indexed data ONLY — the appended 1/8 must surface
      // through the delta sub-graph, not the flat fresh-fragment leg
      graft.operators.HnswIndex.searchCombined(s, t, idx, "vec_id",
          "embedding", q, k = 10, nprobes = 4, ef = n, refineFactor = 100,
          fastSearch = true)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // IVF_HNSW_PQ (reference IVF_HNSW_PQ, lib.rs:98-130 — hnsw/ over pq/
    // storage): same quantized-node contract as q_ann_hnsw_sq but the graph
    // carries pqM-byte PQ codes (d/pqM× smaller); beam on ADC table lookups,
    // exact refine. Full probes + exhaustive beam + wide refine == flat.
    "q_ann_hnsw_pq" -> { (s, d) =>
      val q = queryVec(s, d)
      val idx = hnswPqIndexFor(s, d)
      val n = Tables.embeddings(s, d).count().toInt
      graft.operators.HnswIndex.search(s, idx, q, k = 10, nprobes = 4,
          ef = n, refineFactor = 100)
        .select(col("id").as("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // Approximate probe (nprobes=2 of 8) — rows-only gate entry; quality is
    // asserted by the recall spec instead.
    "q_ann_ivf_probe" -> { (s, d) =>
      val q = queryVec(s, d)
      val idx = ivfIndexFor(s, d)
      requireRecall(Tables.embeddings(s, d), q,
        IvfIndex.search(s, idx, "vec_id", "embedding", q, k = 10, nprobes = 2)
          .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist")),
        floor = 0.5, gate = "q_ann_ivf_probe") // measured 0.60 @ sf0.01/sf0.1 (nprobes=2/8 truncation)
    },

    // IVF_PQ with full probes + refine covering the corpus == flat search
    // (gates the train/encode/ADC/refine machinery exactly).
    "q_ann_ivfpq_exact" -> { (s, d) =>
      val q = queryVec(s, d)
      val idx = pqIndexFor(s, d)
      graft.operators.PqIndex.search(s, idx, "vec_id", "embedding", q,
          kNeighbors = 10, nprobes = 8, refineFactor = 100)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // 4-bit PQ (reference num_bits, vector/pq.rs:44): nibble-packed codes,
    // half the code bytes at equal m. Full probes + large refine == flat,
    // so the whole pack/unpack/ADC chain is oracle-checked exactly.
    "q_ann_ivfpq4_exact" -> { (s, d) =>
      val q = queryVec(s, d)
      val idx = pq4IndexFor(s, d)
      graft.operators.PqIndex.search(s, idx, "vec_id", "embedding", q,
          kNeighbors = 10, nprobes = 8, refineFactor = 100)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // IVF_SQ (reference vector/sq.rs): int8 scalar quantization; full
    // probes + large refine == flat, so the oracle matches exactly
    "q_ann_ivfsq_exact" -> { (s, d) =>
      val q = queryVec(s, d)
      val idx = sqIndexFor(s, d)
      graft.operators.SqIndex.search(s, idx, "vec_id", "embedding", q,
          kNeighbors = 10, nprobes = 8, refineFactor = 100)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // realistic lossy config — rows-only; quality gated by SqSpec recall
    "q_ann_ivfsq_probe" -> { (s, d) =>
      val q = queryVec(s, d)
      val idx = sqIndexFor(s, d)
      requireRecall(Tables.embeddings(s, d), q,
        graft.operators.SqIndex.search(s, idx, "vec_id", "embedding", q,
            kNeighbors = 10, nprobes = 2, refineFactor = 5)
          .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist")),
        floor = 0.5, gate = "q_ann_ivfsq_probe") // measured 0.60 @ both SFs
    },

    // realistic lossy config — rows-only; quality gated by PqSpec recall
    "q_ann_ivfpq_probe" -> { (s, d) =>
      val q = queryVec(s, d)
      val idx = pqIndexFor(s, d)
      requireRecall(Tables.embeddings(s, d), q,
        graft.operators.PqIndex.search(s, idx, "vec_id", "embedding", q,
            kNeighbors = 10, nprobes = 2, refineFactor = 5)
          .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist")),
        floor = 0.4, gate = "q_ann_ivfpq_probe") // measured 0.60/0.50 (PQ loss atop truncation)
    },

    // Multivector (late-interaction) search: two query vectors, per-row
    // summed cosine similarity. overfetch covers the sf0.01 corpus, so the
    // oracle (full sum over both queries) matches exactly.
    "q_multivector" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q0 = queryVec(s, d)
      val q1 = e.filter(col("vec_id") === 1L).select(col("embedding"))
        .head().getSeq[Float](0).toArray
      graft.operators.Knn.multivectorSearch(
          e.filter(col("vec_id") > 1L), "vec_id", "embedding",
          Seq(q0, q1), k = 10, overfetch = 50)
        .select(col("vec_id"), round(col("_score"), 4).as("_score"))
    },

    // distance_range through the INDEXED path (reference distance_range,
    // scanner.rs:1087): bounds applied before the top-k cut on both the
    // indexed and fresh legs of the combined skeleton. Full probes ⇒ the
    // result is the true top-k of the in-range set == flat range oracle.
    "q_ann_range" -> { (s, d) =>
      val q = queryVec(s, d)
      val (t, idx) = multivecAnnFor(s, d)
      IvfIndex.searchCombined(s, t, idx, "vec_id", "embedding", q, k = 10,
          nprobes = 8, distanceRange = Some((0.5, 1.2)))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("dist"))
    },

    // Multivector over ANN (reference multivec_ann, scanner.rs:3471-3552):
    // each query vector runs a COMBINED IVF search (delete-safe skeleton)
    // with k·overfetch; the shared XTR aggregation scores the union.
    // nprobes = nlist ⇒ per-vector candidates are exact, so the result
    // hash-matches the flat multivector oracle.
    "q_multivector_ann" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      val q0 = queryVec(s, d)
      val q1 = e.filter(col("vec_id") === 1L).select(col("embedding"))
        .head().getSeq[Float](0).toArray
      val (t, idx) = multivecAnnFor(s, d)
      graft.operators.Knn.multivectorSearchWith("vec_id", Seq(q0, q1),
          k = 10, overfetch = 50) { (q, kk) =>
        IvfIndex.searchCombined(s, t, idx, "vec_id", "embedding", q, kk,
          nprobes = 8, metric = "cosine")
      }.select(col("vec_id"), round(col("_score"), 4).as("_score"))
    },

    // Per-label norm stats: distance expr inside an aggregation pipeline.
    "q_vector_norms" -> { (s, d) =>
      val e = Tables.embeddings(s, d)
      e.withColumn("nrm", sqrt(dotProduct(col("embedding"), col("embedding"))))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), round(avg(col("nrm")), 4).as("avg_norm"))
        .orderBy(col("label"))
    },

    // Embedding-cosine near-duplicate pairs, label-blocked self-join
    // (brute-force baseline of the LSH-bucketed scale path; blocking keeps
    // the pair count linear-ish and mirrors how the LSH variant buckets).
    "q_embed_near_dup" -> { (s, d) =>
      val e = Tables.embeddings(s, d).select(
        col("vec_id"), col("label"), col("embedding"))
      graft.operators.Dedup.embeddingNearDupPairs(e, "vec_id", "embedding", "label", 0.8)
        .filter(col("sim") > 0.8)
        .select(col("a_id"), col("b_id"), round(col("sim"), 4).as("sim"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // SemDeDup (cluster-then-prune semantic dedup, Dedup.semanticDedup).
    // k-means clustering is not SQL-expressible → rows-only gate by
    // declared design (DedupSemanticSpec proves the invariants); output is
    // the per-cluster keep/prune tally, deterministic by construction.
    "q_semantic_dedup" -> { (s, d) =>
      Dedup.semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
          nClusters = 8, tau = 0.8)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy(col("cluster"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q_knn_l2" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    // f16 + f32-refine recovers the EXACT top-k — same oracle as flat l2
    "q_knn_f16" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    // bf16 with f32 refine recovers the exact top-k — same oracle shape
    "q_knn_bf16" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    // packed f16 is exactly 2 bytes per element
    "q_f16_storage" ->
      """SELECT vec_id, CAST(2 * len(embedding) AS BIGINT) AS f16_bytes
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_knn_cosine" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(1 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY 1 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    "q_knn_dot" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS ip
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) DESC, e.vec_id
        |LIMIT 10""".stripMargin,
    "q_knn_range" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q
        |WHERE list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) > 0.0
        |  AND list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) < 1.2
        |ORDER BY dist, e.vec_id""".stripMargin,
    "q_ann_ivf_exact" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    // precomputed-model build: full probe == flat, same oracle shape
    "q_ann_ivf_pretrained" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    // f16-IVF + f32 refine recovers the exact top-k — same oracle shape
    "q_ann_ivf_f16" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    "q_ann_hamming" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  CAST(list_sum(list_transform(range(len(e.embedding)),
        |    i -> CASE WHEN (e.embedding[i+1] >= 0) <> (q.qv[i+1] >= 0)
        |         THEN 1 ELSE 0 END)) AS BIGINT) AS dist
        |FROM embeddings e, q
        |ORDER BY dist, e.vec_id
        |LIMIT 10""".stripMargin,
    "q_ann_ivfsq_exact" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    "q_ann_ivfrq_exact" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    "q_ann_hnsw_sq" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    "q_ann_hnsw_pq" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    "q_ann_ivfpq_exact" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    "q_ann_ivfpq4_exact" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    "q_ann_prefilter" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q WHERE e.label = 3 AND e.vec_id <> 0
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    "q_ann_prefilter_combined" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |     c AS (SELECT CAST(floor(count(*) / 4.0) AS BIGINT) AS dlo,
        |                  CAST(floor(count(*) * 3.0 / 8.0) AS BIGINT) AS dhi FROM embeddings)
        |SELECT e.vec_id,
        |  round(1 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q, c
        |WHERE e.label = 3 AND e.vec_id <> 0 AND NOT (e.vec_id >= c.dlo AND e.vec_id < c.dhi)
        |ORDER BY 1 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    "q_ann_after_compact" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |     c AS (SELECT CAST(floor(count(*) / 8.0) AS BIGINT) AS cut FROM embeddings)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q, c WHERE e.vec_id >= c.cut
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    "q_ann_defer" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    "q_ann_remap" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |     c AS (SELECT CAST(floor(count(*) / 8.0) AS BIGINT) AS cut FROM embeddings)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q, c WHERE e.vec_id >= c.cut
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    "q_ann_range" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])),4) AS dist
        |FROM embeddings e, q
        |WHERE e.vec_id > 1
        |  AND list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) >= 0.5
        |  AND list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) < 1.2
        |ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])), e.vec_id
        |LIMIT 10""".stripMargin,
    "q_multivector_ann" ->
      """WITH q0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |     q1 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q0.qv AS DOUBLE[]))
        |      + list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q1.qv AS DOUBLE[])),4) AS _score
        |FROM embeddings e, q0, q1 WHERE e.vec_id > 1
        |ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q0.qv AS DOUBLE[]))
        |      + list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q1.qv AS DOUBLE[])) DESC, e.vec_id
        |LIMIT 10""".stripMargin,
    "q_multivector" ->
      """WITH q0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |     q1 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q0.qv AS DOUBLE[]))
        |      + list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q1.qv AS DOUBLE[])),4) AS _score
        |FROM embeddings e, q0, q1 WHERE e.vec_id > 1
        |ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q0.qv AS DOUBLE[]))
        |      + list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q1.qv AS DOUBLE[])) DESC, e.vec_id
        |LIMIT 10""".stripMargin,
    "q_vector_norms" ->
      """SELECT label, count(*) AS n,
        |  round(avg(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))),4) AS avg_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "q_embed_near_dup" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])),4) AS sim
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) > 0.8
        |ORDER BY a_id, b_id""".stripMargin
  )
}
