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
    val v = GovernedTable.vacuum(spark, dir, keepVersions = 1)
    assert(v.versionsDropped == 2L)
    assert(v.filesDeleted >= 6L && v.filesKept == r.filesAfter.toLong)
    // current read intact; dropped history now correctly unreadable
    assert(ids(GovernedTable.read(spark, dir)) == (0 until 20).toSet)
    intercept[IllegalArgumentException] {
      GovernedTable.readVersion(spark, dir, 1).collect()
    }
    // a second vacuum is a clean no-op
    val v2 = GovernedTable.vacuum(spark, dir, keepVersions = 1)
    assert(v2 == GovernedTable.VacuumResult(0L, 0L, r.filesAfter.toLong))
    // timestamp reads survive history trimming: dropped manifests are
    // skipped, the retained head resolves
    assert(ids(GovernedTable.readAsOf(spark, dir,
      System.currentTimeMillis())) == (0 until 20).toSet)
    // minAgeHours shields young unreferenced files (a live txn's
    // staging): stage without committing, vacuum with a 1h floor
    val live = GovernedTable.startTransaction(spark, dir)
    GovernedTable.write(spark, live, Seq(42).toDF("id"))
    val v3 = GovernedTable.vacuum(spark, dir,
      keepVersions = 1, minAgeHours = 1)
    assert(v3.filesDeleted == 0L)
    assert(GovernedTable.commitTransaction(spark, live))
    assert(ids(GovernedTable.read(spark, dir)) == (0 until 20).toSet + 42)
  }
}
