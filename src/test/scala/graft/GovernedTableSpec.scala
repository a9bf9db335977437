package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GovernedTable

/** S13 governed-table transactions (context.py:676-683): manifest
  * commit protocol — commit visibility, cancel invisibility, time
  * travel, snapshot isolation, and optimistic-concurrency conflicts.
  */
class GovernedTableSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-governed").toString

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Int] =
    df.select("id").collect().map(_.getInt(0)).toSet

  test("committed appends are visible; two txns compose") {
    val dir = tmpTable()
    val t1 = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, t1, Seq(1, 2).toDF("id"))
    assert(GovernedTable.commitTransaction(spark, t1))
    val t2 = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, t2, Seq(3).toDF("id"))
    assert(GovernedTable.commitTransaction(spark, t2))
    assert(ids(GovernedTable.read(spark, dir)) == Set(1, 2, 3))
  }

  test("cancelled txn leaves no trace; staged data deleted") {
    val dir = tmpTable()
    val t1 = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, t1, Seq(1).toDF("id"))
    assert(GovernedTable.commitTransaction(spark, t1))
    val bad = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, bad, Seq(99).toDF("id"))
    GovernedTable.cancelTransaction(spark, bad)
    assert(ids(GovernedTable.read(spark, dir)) == Set(1))
    // staging directory physically removed
    val dataDirs = new java.io.File(dir, "data").listFiles()
    assert(dataDirs != null && dataDirs.count(_.getName.startsWith(s"txn-${bad.id}")) == 0)
    // a committed txn cannot be cancelled afterwards
    intercept[IllegalArgumentException] {
      GovernedTable.cancelTransaction(spark, t1)
    }
  }

  test("time travel by version and by timestamp") {
    val dir = tmpTable()
    val t1 = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, t1, Seq(1).toDF("id"))
    assert(GovernedTable.commitTransaction(spark, t1))
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(5)
    val t2 = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, t2, Seq(2).toDF("id"))
    assert(GovernedTable.commitTransaction(spark, t2))
    assert(ids(GovernedTable.readVersion(spark, dir, 1)) == Set(1))
    assert(ids(GovernedTable.readVersion(spark, dir, 2)) == Set(1, 2))
    assert(ids(GovernedTable.readAsOf(spark, dir, afterV1)) == Set(1))
    assert(ids(GovernedTable.readAsOf(spark, dir,
      System.currentTimeMillis())) == Set(1, 2))
    intercept[IllegalArgumentException] {
      GovernedTable.readAsOf(spark, dir, 0L) // before any commit
    }
  }

  test("snapshot isolation: a txn sees its pinned version plus its own writes") {
    val dir = tmpTable()
    val t1 = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, t1, Seq(1).toDF("id"))
    assert(GovernedTable.commitTransaction(spark, t1))
    val reader = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, reader, Seq(10).toDF("id"))
    // another writer commits AFTER reader pinned its snapshot
    val other = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, other, Seq(2).toDF("id"))
    assert(GovernedTable.commitTransaction(spark, other))
    // reader sees base v1 + its own staged rows, not `other`'s commit
    assert(ids(GovernedTable.readWithTxn(spark, reader)) == Set(1, 10))
    // reader's append still commits (append/append commutes) on top
    assert(GovernedTable.commitTransaction(spark, reader))
    assert(ids(GovernedTable.read(spark, dir)) == Set(1, 2, 10))
  }

  test("overwrite conflicts abort when the head moved; clean overwrite wins") {
    val dir = tmpTable()
    val t1 = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, t1, Seq(1, 2).toDF("id"))
    assert(GovernedTable.commitTransaction(spark, t1))
    // conflicting pair: ow starts, app commits first, ow must abort
    val ow = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, ow, Seq(7).toDF("id"), mode = "overwrite")
    val app = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, app, Seq(3).toDF("id"))
    assert(GovernedTable.commitTransaction(spark, app))
    assert(!GovernedTable.commitTransaction(spark, ow))
    GovernedTable.cancelTransaction(spark, ow)
    assert(ids(GovernedTable.read(spark, dir)) == Set(1, 2, 3))
    // unconflicted overwrite replaces the snapshot
    val ow2 = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, ow2, Seq(9).toDF("id"), mode = "overwrite")
    assert(GovernedTable.commitTransaction(spark, ow2))
    assert(ids(GovernedTable.read(spark, dir)) == Set(9))
    // history intact under the overwrite
    assert(ids(GovernedTable.readVersion(spark, dir, 2)) == Set(1, 2, 3))
  }

  test("read-only txns cannot write; empty commit succeeds") {
    val dir = tmpTable()
    val ro = GovernedTable.startTransaction(spark, dir, readOnly = true)
    intercept[IllegalArgumentException] {
      GovernedTable.write(spark, ro, Seq(1).toDF("id"))
    }
    assert(GovernedTable.commitTransaction(spark, ro))
  }

  test("compact folds a multi-snapshot table into few files, history intact") {
    val dir = tmpTable()
    // three append commits, each deliberately fragmented
    for (lo <- Seq(0, 10, 20)) {
      val txn = GovernedTable.startTransaction(spark, dir)
      GovernedTable.write(spark, txn,
        (lo until lo + 10).toDF("id").repartition(5))
      assert(GovernedTable.commitTransaction(spark, txn))
    }
    val before = ids(GovernedTable.read(spark, dir))
    assert(before == (0 until 30).toSet)
    val r = GovernedTable.compact(spark, dir)
    // ~15 tiny files fold into one bin; a new OVERWRITE version exists
    assert(r.filesBefore >= 10 && r.filesAfter < r.filesBefore)
    assert(r.filesAfter == 1 && r.version == 4L)
    // content identical through the normal read
    assert(ids(GovernedTable.read(spark, dir)) == before)
    // time travel: pre-compaction snapshots still read the old files
    assert(ids(GovernedTable.readVersion(spark, dir, 1)) ==
      (0 until 10).toSet)
    assert(ids(GovernedTable.readVersion(spark, dir, 3)) == before)
    // appends continue normally on the compacted head
    val txn = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, txn, Seq(99).toDF("id"))
    assert(GovernedTable.commitTransaction(spark, txn))
    assert(ids(GovernedTable.read(spark, dir)) == before + 99)
  }

  test("vacuum deletes only files no retained version references") {
    val dir = tmpTable()
    for (lo <- Seq(0, 10)) {
      val txn = GovernedTable.startTransaction(spark, dir)
      GovernedTable.write(spark, txn,
        (lo until lo + 10).toDF("id").repartition(3))
      assert(GovernedTable.commitTransaction(spark, txn))
    }
    val r = GovernedTable.compact(spark, dir) // v3 overwrite
    assert(r.version == 3L)
    // keep only the compacted head: v1/v2 manifests drop, and the six
    // pre-compaction files (referenced by nothing retained) delete
    val v = GovernedTable.vacuum(spark, dir, keepVersions = 1,
      minAgeHours = 0) // quiesced opt-in: this test is the only writer
    assert(v.versionsDropped == 2L)
    assert(v.filesDeleted >= 6L && v.filesKept == r.filesAfter.toLong)
    // current read intact; dropped history now correctly unreadable
    assert(ids(GovernedTable.read(spark, dir)) == (0 until 20).toSet)
    intercept[IllegalArgumentException] {
      GovernedTable.readVersion(spark, dir, 1).collect()
    }
    // a second vacuum is a clean no-op
    val v2 = GovernedTable.vacuum(spark, dir, keepVersions = 1,
      minAgeHours = 0)
    assert(v2 == GovernedTable.VacuumResult(0L, 0L, r.filesAfter.toLong))
    // timestamp reads survive history trimming: dropped manifests are
    // skipped, the retained head resolves
    assert(ids(GovernedTable.readAsOf(spark, dir,
      System.currentTimeMillis())) == (0 until 20).toSet)
    // the DEFAULT minAgeHours (168h, Delta's retention window) shields
    // young unreferenced files (a live txn's staging): stage without
    // committing, vacuum with defaults — nothing deleted
    val live = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, live, Seq(42).toDF("id"))
    val v3 = GovernedTable.vacuum(spark, dir, keepVersions = 1)
    assert(v3.filesDeleted == 0L)
    assert(GovernedTable.commitTransaction(spark, live))
    assert(ids(GovernedTable.read(spark, dir)) == (0 until 20).toSet + 42)
  }

  test("schema evolution: added column merges with nulls; retype fails loudly") {
    val dir = tmpTable()
    val t1 = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, t1, Seq(1, 2).toDF("id"))
    assert(GovernedTable.commitTransaction(spark, t1))
    // v2 appends files that carry a NEW column
    val t2 = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, t2,
      Seq((3, "c")).toDF("id", "label"))
    assert(GovernedTable.commitTransaction(spark, t2))
    // v2 reads with the merged schema: old rows null-filled
    val v2 = GovernedTable.readVersion(spark, dir, 2)
    assert(v2.columns.toSet == Set("id", "label"))
    val byId = v2.collect().map(r => r.getInt(0) ->
      (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(byId == Map(1 -> null, 2 -> null, 3 -> "c"))
    // v1 is untouched by the later evolution
    assert(GovernedTable.readVersion(spark, dir, 1).columns.toSet == Set("id"))
    // an incompatible retype of an existing column fails the merged
    // read with Spark's merge error — never a silently-picked footer
    val t3 = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, t3, Seq(("x", "y")).toDF("id", "label"))
    assert(GovernedTable.commitTransaction(spark, t3))
    val err = intercept[Exception] {
      GovernedTable.read(spark, dir).collect()
    }
    assert(err.getMessage.toLowerCase.contains("merge"))
  }

  test("history lists retained versions with mode and file counts") {
    val dir = tmpTable()
    for (lo <- Seq(0, 10)) {
      val txn = GovernedTable.startTransaction(spark, dir)
      GovernedTable.write(spark, txn,
        (lo until lo + 10).toDF("id").repartition(2))
      assert(GovernedTable.commitTransaction(spark, txn))
    }
    val r = GovernedTable.compact(spark, dir) // v3 overwrite
    val h = GovernedTable.history(spark, dir)
    assert(h.map(_.version) == Seq(3L, 2L, 1L)) // newest first
    assert(h.map(_.mode) == Seq("overwrite", "append", "append"))
    assert(h.head.numFiles == r.filesAfter)
    assert(h.last.numFiles == 2) // v1: one txn's two repartitioned files
    assert(h(1).numFiles == 4)   // v2 append: v1's files + two more
    assert(h.forall(_.committedAtMillis > 0L))
    assert(h.map(_.txnId).distinct.size == 3) // three distinct txns
    // vacuum trims history to the retained head
    GovernedTable.vacuum(spark, dir, keepVersions = 1, minAgeHours = 0)
    assert(GovernedTable.history(spark, dir).map(_.version) == Seq(3L))
  }

  test("concurrent appenders: every commit wins exactly one version, no lost rows") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = tmpTable()
    val perThread = 6
    // two writers race append commits; the publish-with-
    // create(overwrite=false) point must serialize them — every
    // commit lands on a distinct version and no row is lost
    val threads = Seq(0, 1).map { tid =>
      Future {
        (0 until perThread).count { i =>
          val txn = GovernedTable.startTransaction(spark, dir)
          GovernedTable.write(spark, txn,
            Seq(tid * 1000 + i).toDF("id"))
          GovernedTable.commitTransaction(spark, txn)
        }
      }
    }
    val committed = Await.result(Future.sequence(threads), 120.seconds).sum
    assert(committed == 2 * perThread) // appends always retry through
    val h = GovernedTable.history(spark, dir)
    // one version per successful commit, contiguous, no duplicates
    assert(h.map(_.version) == (committed to 1 by -1).map(_.toLong))
    assert(h.map(_.txnId).distinct.size == committed)
    // all rows present exactly once
    val rows = GovernedTable.read(spark, dir).collect().map(_.getInt(0)).toSeq
    assert(rows.size == committed)
    assert(rows.toSet ==
      (0 until perThread).flatMap(i => Seq(i, 1000 + i)).toSet)
    // the commit-protocol invariant behind it: every snapshot is a
    // superset of its predecessor (appends never drop files)
    val filesByVersion = h.sortBy(_.version).map(_.numFiles)
    assert(filesByVersion == filesByVersion.sorted)
  }

  test("append racing an overwrite: overwrite aborts cleanly or wins atomically") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = tmpTable()
    val t0 = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, t0, Seq(1).toDF("id"))
    assert(GovernedTable.commitTransaction(spark, t0))
    // overwrite staged against v1; append commits first in most
    // interleavings — run several rounds to exercise both outcomes
    (0 until 3).foreach { round =>
      val ow = GovernedTable.startTransaction(spark, dir)
      GovernedTable.write(spark, ow, Seq(100 + round).toDF("id"),
        mode = "overwrite")
      val ap = Future {
        val txn = GovernedTable.startTransaction(spark, dir)
        GovernedTable.write(spark, txn, Seq(200 + round).toDF("id"))
        GovernedTable.commitTransaction(spark, txn)
      }
      val apOk = Await.result(ap, 60.seconds)
      assert(apOk)
      val owOk = GovernedTable.commitTransaction(spark, ow)
      if (!owOk) GovernedTable.cancelTransaction(spark, ow)
      val now = ids(GovernedTable.read(spark, dir))
      if (owOk) assert(now == Set(100 + round)) // clean overwrite state
      else assert(now.contains(200 + round))    // append preserved
      // never a torn state: cancel deleted only the loser's staging,
      // every retained manifest still resolves
      GovernedTable.history(spark, dir).foreach { v =>
        GovernedTable.readVersion(spark, dir, v.version).collect()
      }
    }
  }
}
