package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, NearDup}
import graft.sources.Versioned

/** Incremental curation: batch-at-a-time ingestion must reproduce the
  * one-shot full recompute EXACTLY — including the retroactive cases
  * (a new doc's near-dup cluster absorbing an old survivor), and state
  * versions must time-travel to any batch boundary.
  */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[(Long, Boolean)] =
    df.select("doc_id", "is_train").as[(Long, Boolean)].collect().sortBy(_._1).toSeq

  test("incremental over two appended batches ≡ full recompute") {
    val state = java.nio.file.Files.createTempDirectory("curation_spec").toString
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)

    assert(Curation.curateBatch(b1, state) == 0L)
    val after1 = ids(Curation.survivors(spark, state))
    assert(after1 == ids(Curation.fullCurate(b1)),
      "batch-1-only incremental state diverged from full recompute of batch 1")

    assert(Curation.curateBatch(b2, state) == 1L)
    val after2 = ids(Curation.survivors(spark, state))
    assert(after2 == ids(Curation.fullCurate(docs)),
      "incremental after append diverged from full recompute of the whole corpus")

    // time travel: version 0 still answers with the batch-1 state
    assert(ids(Curation.survivors(spark, state, asOf = Some(0L))) == after1)

    // the state tables commit in lockstep, one version per batch
    assert(Versioned.latestVersion(spark, s"$state/candidates") == 1L)
    assert(Versioned.latestVersion(spark, s"$state/pairs") == 1L)
  }

  test("a bridging doc in a later batch merges old clusters and evicts an old survivor") {
    // Synthetic corpus engineered so batch 2 contains a doc that is a
    // near-dup of TWO batch-1 docs which are NOT near-dups of each
    // other: the accumulated CC must merge the three into one cluster
    // and retroactively drop batch-1's second representative.
    val shared = (1 to 30).map(i => s"tok$i").mkString(" ")
    val aTail = (1 to 14).map(i => s"ua$i").mkString(" ")
    val bTail = (1 to 14).map(i => s"ub$i").mkString(" ")
    val a = s"alpha the of and to in is a $shared $aTail"
    val b = s"bravo the of and to in is a $shared $bTail"
    def mk(id: Long, text: String) = (id, text, text.length.toLong)
    val batch1 = Seq(mk(1, a), mk(2, b)).toDF("doc_id", "text", "n_chars")

    val state = java.nio.file.Files.createTempDirectory("curation_bridge").toString
    Curation.curateBatch(batch1, state): Unit
    val s1 = ids(Curation.survivors(spark, state)).map(_._1)
    // a and b share the 35 interior shingles of 50 each:
    // jaccard = 35/65 ≈ 0.54 < 0.6 → both survive batch 1
    assert(s1 == Seq(1L, 2L), s"expected both batch-1 docs to survive, got $s1")

    // the bridge: a's head + half of each tail → jaccard 0.75 with a,
    // 0.67 with b — a near-dup of BOTH, but a and b are not of each other
    val bridge = s"alpha the of and to in is a $shared " +
      (1 to 7).map(i => s"ua$i").mkString(" ") + " " +
      (8 to 14).map(i => s"ub$i").mkString(" ")
    val batch2 = Seq(mk(10, bridge)).toDF("doc_id", "text", "n_chars")
    Curation.curateBatch(batch2, state): Unit

    val s2 = ids(Curation.survivors(spark, state)).map(_._1)
    val full = ids(Curation.fullCurate(batch1.unionByName(batch2))).map(_._1)
    assert(s2 == full, s"incremental $s2 diverged from full recompute $full")
    assert(s2 == Seq(1L),
      s"bridge must merge {1,2,10} into one cluster keeping min id 1, got $s2")
  }

  test("exact-dedup keeper never moves: a later duplicate is dropped against state") {
    val t = "the of and to in is a " + (1 to 40).map(i => s"w$i").mkString(" ")
    val batch1 = Seq((5L, t, t.length.toLong)).toDF("doc_id", "text", "n_chars")
    val batch2 = Seq((50L, t, t.length.toLong), // exact dup of state doc 5
                     (51L, t.toUpperCase, t.length.toLong)) // normalized dup too
      .toDF("doc_id", "text", "n_chars")
    val state = java.nio.file.Files.createTempDirectory("curation_norm").toString
    Curation.curateBatch(batch1, state): Unit
    Curation.curateBatch(batch2, state): Unit
    val got = ids(Curation.survivors(spark, state)).map(_._1)
    assert(got == Seq(5L), s"norm keeper must stay doc 5, got $got")
  }

  test("crash between the two state commits read-repairs: pairs recomputed from stored shingles") {
    val state = java.nio.file.Files.createTempDirectory("curation_heal").toString
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    Curation.curateBatch(b1, state): Unit

    // simulate the crash: commit batch 2's CANDIDATES exactly as
    // curateBatch would, but die before the pairs commit
    val f3 = Curation.rowLocal(b2)
    val keepers = graft.operators.Ranking.topPerGroup(
      f3, Seq(col("norm_fp")), Seq(col("doc_id").asc), 1)
    val orphan = keepers
      .join(Versioned.read(spark, s"$state/candidates").select("norm_fp"),
        Seq("norm_fp"), "left_anti")
      .select(col("doc_id"), col("norm_fp"),
        NearDup.shingleHashes3(col("text")).as("sh"))
    Versioned.append(orphan, s"$state/candidates"): Unit
    assert(Versioned.latestVersion(spark, s"$state/candidates") == 1L)
    assert(Versioned.latestVersion(spark, s"$state/pairs") == 0L) // wedged

    // a latest-read heals the wedge and answers as if nothing crashed
    val healed = ids(Curation.survivors(spark, state))
    assert(Versioned.latestVersion(spark, s"$state/pairs") == 1L)
    assert(healed == ids(Curation.fullCurate(docs)),
      "healed state diverged from the full recompute")

    // and the next batch proceeds normally on the repaired state
    val extra = Seq((900000L, "the of and to in is a " +
      (1 to 40).map(i => s"x$i").mkString(" "), 250L))
      .toDF("doc_id", "text", "n_chars")
    assert(Curation.curateBatch(extra, state) == 2L)
    assert(Versioned.latestVersion(spark, s"$state/pairs") == 2L)
  }

  test("ngramJaccardPairsAcross ≡ the self-join restricted to cross pairs") {
    val sample = docs.filter(col("doc_id") < 120)
    val left = sample.filter(col("doc_id") < 60)
    val right = sample.filter(col("doc_id") >= 60)
    val across = NearDup.ngramJaccardPairsAcross(
        left, right, col("doc_id"), col("text"))
      .select("doc_a", "doc_b", "n_shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    val self = NearDup.ngramJaccardPairs(sample, col("doc_id"), col("text"))
      .filter((col("doc_a") < 60 && col("doc_b") >= 60) ||
              (col("doc_a") >= 60 && col("doc_b") < 60))
      .select("doc_a", "doc_b", "n_shared", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(across == self,
      s"across-join pairs diverged: ${across.diff(self)} / ${self.diff(across)}")
  }
}
