package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import graft.sources.Versioned

/** S3 — versioned table format: ACID-ish commit log over plain parquet
  * (public Delta-protocol concepts). Covers append/overwrite, snapshot
  * isolation + time travel, schema-at-commit, optimistic-concurrency
  * retry, checkpoint-bounded replay, vacuum, and CDC merge.
  */
class VersionedSpec extends SparkSpec {

  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-versioned").toString + "/t"

  test("append/overwrite commit versions; reads are latest-by-default") {
    val t = tmpTable()
    assert(Versioned.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t) == 0L)
    assert(Versioned.append(Seq((3L, "c")).toDF("id", "s"), t) == 1L)
    assert(Versioned.read(spark, t).as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(Versioned.overwrite(Seq((9L, "z")).toDF("id", "s"), t) == 2L)
    assert(Versioned.read(spark, t).as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    assert(Versioned.history(spark, t).map(h => (h._1, h._2)) ==
      Seq((0L, "append"), (1L, "append"), (2L, "overwrite")))
  }

  test("time travel reads every historical version unchanged") {
    val t = tmpTable()
    Versioned.append(Seq((1L, "a")).toDF("id", "s"), t)
    Versioned.append(Seq((2L, "b")).toDF("id", "s"), t)
    Versioned.overwrite(Seq((3L, "c")).toDF("id", "s"), t)
    assert(Versioned.read(spark, t, asOf = Some(0L))
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    assert(Versioned.read(spark, t, asOf = Some(1L))
      .as[(Long, String)].collect().sortBy(_._1).toSeq == Seq((1L, "a"), (2L, "b")))
    assert(Versioned.read(spark, t, asOf = Some(2L))
      .as[(Long, String)].collect().toSeq == Seq((3L, "c")))
    // a reader's resolved snapshot is immune to later commits
    val pinned = Versioned.read(spark, t, asOf = Some(1L))
    Versioned.overwrite(Seq((4L, "d")).toDF("id", "s"), t)
    assert(pinned.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("schema comes from the log: evolved append surfaces nulls on old files") {
    val t = tmpTable()
    Versioned.append(Seq((1L, "a")).toDF("id", "s"), t)
    Versioned.append(Seq((2L, "b", 9.5)).toDF("id", "s", "score"), t)
    val r = Versioned.read(spark, t).select("id", "score")
      .as[(Long, Option[Double])].collect().toMap
    assert(r == Map(1L -> None, 2L -> Some(9.5)))
    // time travel to v0 serves the ORIGINAL two-column schema
    assert(Versioned.read(spark, t, asOf = Some(0L)).columns.toSeq == Seq("id", "s"))
  }

  test("optimistic concurrency: a lost commit race retries onto the next version") {
    val t = tmpTable()
    Versioned.append(Seq((1L, "a")).toDF("id", "s"), t)
    // another writer wins version 1 out from under this one
    val f = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val winner = Versioned.append(Seq((2L, "b")).toDF("id", "s"), t)
    assert(winner == 1L)
    // now pre-plant version 2's log entry to force one losing attempt
    val stolen = new Path(s"$t/_graft_log/${"%020d".format(2)}.json")
    val out = f.create(stolen, false)
    out.write(
      """{"version":2,"action":"append","add":[],"schema":""}""".getBytes("UTF-8"))
    out.close()
    val v = Versioned.append(Seq((3L, "c")).toDF("id", "s"), t)
    assert(v == 3L, s"loser must land on the NEXT free version, got $v")
    assert(Versioned.read(spark, t).as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("checkpoint bounds replay: old log entries are not needed past it") {
    val t = tmpTable()
    (0 to 12).foreach { i =>
      Versioned.append(Seq((i.toLong, s"r$i")).toDF("id", "s"), t)
    }
    val f = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.exists(new Path(s"$t/_graft_log/${"%020d".format(10)}.checkpoint.json")))
    // simulate log retention: drop entries 0..9 (consolidated into the
    // checkpoint) — latest read must still resolve completely
    (0 to 9).foreach(i =>
      f.delete(new Path(s"$t/_graft_log/${"%020d".format(i)}.json"), false))
    val ids = Versioned.read(spark, t).select("id").as[Long].collect().sorted
    assert(ids.toSeq == (0L to 12L))
  }

  test("vacuum drops files unreachable from retained versions; latest survives") {
    val t = tmpTable()
    Versioned.append(Seq((1L, "a")).toDF("id", "s"), t)
    Versioned.overwrite(Seq((2L, "b")).toDF("id", "s"), t)
    Versioned.overwrite(Seq((3L, "c")).toDF("id", "s"), t)
    val removed = Versioned.vacuum(spark, t, retainVersions = 1)
    assert(removed > 0, "v0/v1 data files should be reclaimable")
    assert(Versioned.read(spark, t).as[(Long, String)].collect().toSeq ==
      Seq((3L, "c")))
    // vacuuming again is a no-op (idempotent)
    assert(Versioned.vacuum(spark, t, retainVersions = 1) == 0)
  }

  test("compact merges many small append files into few; history intact") {
    val t = tmpTable()
    // the daily-append pattern: one small file set per batch
    (0 until 6).foreach { i =>
      Versioned.append(
        Seq((i.toLong, s"batch$i")).toDF("id", "s").repartition(4), t): Unit
    }
    val before = Versioned.read(spark, t).inputFiles.length
    assert(before >= 6, s"expected ≥6 files before compaction, got $before")
    val all = Versioned.read(spark, t).as[(Long, String)].collect().sortBy(_._1).toSeq

    val v = Versioned.compact(spark, t)
    assert(v == 6L)
    // identical content, far fewer files (6 rows → one 128 MB target file)
    assert(Versioned.read(spark, t).as[(Long, String)].collect().sortBy(_._1).toSeq == all)
    assert(Versioned.read(spark, t).inputFiles.length == 1)
    // compaction is a new version, not a rewrite of history: every
    // pre-compaction version still time-travels
    assert(Versioned.read(spark, t, asOf = Some(2L))
      .as[(Long, String)].collect().sortBy(_._1).toSeq == all.take(3))
    // vacuum reclaims the superseded small files; latest still reads
    assert(Versioned.vacuum(spark, t, retainVersions = 1) > 0)
    assert(Versioned.read(spark, t).as[(Long, String)].collect().sortBy(_._1).toSeq == all)
  }

  test("merge: CDC upserts produce new versions with Upsert semantics") {
    val t = tmpTable()
    Versioned.merge(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "seq"), t,
      Seq("k"), orderCol = Some("seq"))
    Versioned.merge(
      Seq((2L, "B", 2L), (2L, "B2", 3L), (9L, "z", 2L)).toDF("k", "v", "seq"), t,
      Seq("k"), orderCol = Some("seq"))
    val r = Versioned.read(spark, t).select("k", "v").as[(Long, String)]
      .collect().toMap
    assert(r == Map(1L -> "a", 2L -> "B2", 9L -> "z"))
    assert(Versioned.latestVersion(spark, t) == 1L)
    // the pre-merge state is still time-travel readable
    assert(Versioned.read(spark, t, asOf = Some(0L)).select("k", "v")
      .as[(Long, String)].collect().toMap == Map(1L -> "a", 2L -> "b"))
  }
}
