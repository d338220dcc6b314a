package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.format.GraftTable
import graft.index.ScalarIndex

/** Randomized model equivalence for merge_insert: every clause combination
  * (update-all with/without matched condition, insert-all,
  * by-source-delete with/without condition, indexed vs full-scan target,
  * pre-existing DV deletes) must produce exactly the table a trivial
  * in-memory reference model predicts. Seeded — failures reproduce. */
class MergeEquivalenceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft_meq_").toString + "/t"

  test("update + delete chains match the reference model across 16 scenarios") {
    val rnd = new scala.util.Random(77)
    for (scenario <- 1 to 16) {
      val n = 30 + rnd.nextInt(70)
      var model = (0L until n.toLong).map(i => i -> rnd.nextInt(100).toLong).toMap
      val t = fresh()
      GraftTable.write(model.toSeq.toDF("id", "v")
        .repartitionByRange(3, col("id")), t, "overwrite")
      // random 3-step mutation chain: each step an update or a delete with
      // a random predicate; the model applies the same semantics
      for (_ <- 1 to 3) {
        val m = 2 + rnd.nextInt(5)
        val r = rnd.nextInt(m)
        if (rnd.nextBoolean()) {
          val mm = GraftTable.update(spark, t,
            Map("v" -> "v + 1000"), Some(s"id % $m = $r"))
          val hits = model.count(_._1 % m == r)
          assert(mm.opStats == Map("num_updated_rows" -> hits.toLong))
          model = model.map { case (id, v) =>
            id -> (if (id % m == r) v + 1000 else v) }
        } else {
          val mm = GraftTable.delete(spark, t, s"id % $m = $r")
          val hits = model.count(_._1 % m == r)
          assert(mm.opStats == Map("num_deleted_rows" -> hits.toLong),
            s"scenario $scenario: ${mm.opStats} vs $hits")
          model = model.filterNot(_._1 % m == r)
        }
      }
      val got = GraftTable.read(spark, t)
        .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
      assert(got == model, s"scenario $scenario mismatch")
      // the metadata fast path agrees with the physical row count
      assert(GraftTable.countRows(spark, t) == model.size.toLong,
        s"scenario $scenario countRows")
    }
  }

  test("merge_insert matches the reference model across 24 random scenarios") {
    val rnd = new scala.util.Random(420)
    for (scenario <- 1 to 24) {
      val nTarget = 20 + rnd.nextInt(60)
      val target0 = (0L until nTarget.toLong).map(i => i -> rnd.nextInt(100).toLong).toMap
      val preDeleted = target0.keys.filter(_ => rnd.nextDouble() < 0.1).toSet
      val target = target0 -- preDeleted
      // source: some overlapping ids, some fresh; unique ids (the engine
      // rejects ambiguous multi-matches by design)
      val srcIds = rnd.shuffle(target0.keys.toSeq).take(rnd.nextInt(15)) ++
        (1000L until 1000L + rnd.nextInt(10).toLong)
      val source = srcIds.distinct.map(i => i -> (200L + rnd.nextInt(100))).toMap

      val updateAll = rnd.nextBoolean()
      val insertAll = rnd.nextBoolean()
      val bySrcDelete = rnd.nextBoolean()
      val matchedCond = if (updateAll && rnd.nextBoolean()) Some("v % 2 = 0") else None
      val deleteCond = if (bySrcDelete && rnd.nextBoolean()) Some("v >= 50") else None
      val withIndex = rnd.nextBoolean()

      // ---- reference model ----
      def matchedCondOk(v: Long) = matchedCond.forall(_ => v % 2 == 0)
      def deleteCondOk(v: Long) = deleteCond.forall(_ => v >= 50)
      val expected = scala.collection.mutable.Map[Long, Long]()
      target.foreach { case (id, v) =>
        if (source.contains(id)) {
          if (updateAll && matchedCondOk(v)) expected(id) = source(id)
          else expected(id) = v
        } else if (bySrcDelete && deleteCondOk(v)) () // deleted
        else expected(id) = v
      }
      if (insertAll) source.foreach { case (id, v) =>
        if (!target.contains(id)) expected(id) = v
      }

      // ---- engine ----
      val t = fresh()
      GraftTable.write(target0.toSeq.toDF("id", "v")
        .repartitionByRange(3, col("id")), t, "overwrite")
      if (withIndex) ScalarIndex.buildBtree(spark, t, "id", s"$t/_indices")
      if (preDeleted.nonEmpty)
        GraftTable.delete(spark, t, s"id IN (${preDeleted.mkString(",")})")
      val m = GraftTable.mergeInsert(spark, t, source.toSeq.toDF("id", "v"),
        Seq("id"),
        whenMatchedUpdateAll = updateAll,
        matchedCondition = matchedCond,
        whenNotMatchedInsertAll = insertAll,
        whenNotMatchedBySourceDelete = bySrcDelete,
        deleteCondition = deleteCond)
      val got = GraftTable.read(spark, t)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ctx = s"scenario $scenario (updateAll=$updateAll cond=$matchedCond " +
        s"insertAll=$insertAll bySrc=$bySrcDelete delCond=$deleteCond idx=$withIndex)"
      assert(got == expected.toMap, s"$ctx\n got=${got.toSeq.sorted}\n exp=${expected.toSeq.sorted}")
      // the stamped stats agree with the model's row classes
      val expUpd = target.count { case (id, v) =>
        source.contains(id) && updateAll && matchedCondOk(v) }
      val expIns = if (insertAll) source.count(s => !target.contains(s._1)) else 0
      val expDel = target.count { case (id, v) =>
        !source.contains(id) && bySrcDelete && deleteCondOk(v) }
      assert(m.opStats("num_updated_rows") == expUpd.toLong, ctx)
      assert(m.opStats("num_inserted_rows") == expIns.toLong, ctx)
      assert(m.opStats("num_deleted_rows") == expDel.toLong, ctx)
    }
  }

  test("matched condition comparing source and target (newer-wins upsert)") {
    val t = fresh()
    GraftTable.write(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"),
      t, "overwrite")
    val src = Seq((1L, 99L), (2L, 5L), (9L, 1L)).toDF("id", "v")
    // reference when_matched_update_all("source.v > target.v"): only rows
    // whose source value is newer update; failing matched rows stay put
    // (they never become inserts or deletes)
    val m = GraftTable.mergeInsert(spark, t, src, Seq("id"),
      matchedCondition = Some("source.v > target.v"))
    val got = GraftTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 99L, 2L -> 20L, 3L -> 30L, 9L -> 1L), got.toString)
    assert(m.opStats("num_updated_rows") == 1L)
    assert(m.opStats("num_inserted_rows") == 1L)
    assert(m.opStats("num_deleted_rows") == 0L)
  }

  test("merge condition qualifiers: case-insensitive and string-literal-safe") {
    val t = fresh()
    GraftTable.write(Seq((1L, "see target.v2"), (2L, "b")).toDF("id", "v"),
      t, "overwrite")
    val src = Seq((1L, "upd"), (2L, "upd")).toDF("id", "v")
    // a literal CONTAINING "target." must survive the qualifier rewrite;
    // TARGET./Source. must resolve regardless of case
    val m = GraftTable.mergeInsert(spark, t, src, Seq("id"),
      whenNotMatchedInsertAll = false,
      matchedCondition = Some("TARGET.v = 'see target.v2' AND Source.v = 'upd'"))
    val got = GraftTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "upd", 2L -> "b"), got.toString)
    assert(m.opStats("num_updated_rows") == 1L)
  }

  test("a table column literally named source/target wins over the qualifier rewrite") {
    val t = fresh()
    // `source` here is a STRUCT COLUMN of the target table, not the merge's
    // source relation: `source.flag` must resolve as that struct's field.
    // (The SQL route depends on this — GraftExtensions serializes resolved
    // struct accesses as dotted paths, which must not be re-qualified.)
    GraftTable.write(
      Seq((1L, 10L, true), (2L, 20L, false)).toDF("id", "v", "flag")
        .select(col("id"), col("v"), struct(col("flag")).as("source")),
      t, "overwrite")
    val src = Seq((1L, 99L, false), (2L, 88L, false)).toDF("id", "v", "flag")
      .select(col("id"), col("v"), struct(col("flag")).as("source"))
    val m = GraftTable.mergeInsert(spark, t, src, Seq("id"),
      whenNotMatchedInsertAll = false,
      matchedCondition = Some("source.flag"))
    // only the TARGET row whose source.flag struct field is true updates —
    // a (mis)rewrite to the source relation's __s_ column would update both
    val got = GraftTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 99L, 2L -> 20L), got.toString)
    assert(m.opStats("num_updated_rows") == 1L)
  }
}
