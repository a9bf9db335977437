package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Lifecycle

/** S12 storage lifecycle: retention-based purge over the Hadoop
  * FileSystem API (context.py:461-545), with the reference's
  * Success.csv/Failed.csv manifest and catalog-partition dropping.
  */
class LifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** Drop a managed test table AND its warehouse directory — an
    * interrupted earlier run can leave the dir behind with no catalog
    * entry, which fails the next CREATE with LOCATION_ALREADY_EXISTS.
    */
  private def dropManaged(tbl: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val wh = spark.sessionState.conf.warehousePath
    val p = new org.apache.hadoop.fs.Path(s"$wh/$tbl")
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }

  private def touch(dir: String, name: String, ageHours: Long): String = {
    val p = Paths.get(dir, name)
    Files.createDirectories(p.getParent)
    Files.write(p, "x".getBytes)
    Files.setLastModifiedTime(p,
      FileTime.fromMillis(System.currentTimeMillis() - ageHours * 3600000L))
    p.toString
  }

  test("purgePath deletes only files past retention; manifest written") {
    val dir = Files.createTempDirectory("graft-purge").toString
    touch(dir, "old/a.parquet", ageHours = 200)
    touch(dir, "old/b.parquet", ageHours = 300)
    val fresh = touch(dir, "new/c.parquet", ageHours = 1)
    val manifest = Files.createTempDirectory("graft-purge-man").toString
    val r = Lifecycle.purgePath(spark, dir, retentionHours = 168,
      manifestFilePath = Some(manifest))
    assert(r == Lifecycle.PurgeResult(deleted = 2, failed = 0, retained = 1))
    assert(Files.exists(Paths.get(fresh)))
    assert(!Files.exists(Paths.get(dir, "old/a.parquet")))
    val ok = new String(Files.readAllBytes(Paths.get(manifest, "Success.csv")))
    assert(ok.contains("a.parquet") && ok.contains("b.parquet"))
    assert(new String(Files.readAllBytes(
      Paths.get(manifest, "Failed.csv"))).trim.isEmpty)
    // retention 0 purges everything remaining
    val r2 = Lifecycle.purgePath(spark, dir, retentionHours = 0)
    assert(r2.deleted == 1 && r2.retained == 0)
  }

  test("purgePath on a missing path is a clean no-op") {
    val r = Lifecycle.purgePath(spark, "/tmp/graft-nonexistent-path-xyz")
    assert(r == Lifecycle.PurgeResult(0, 0, 0))
  }

  test("transitionPath tiers cold files, keeps them readable, honors retention") {
    val dir = Files.createTempDirectory("graft-tier").toString
    // a real parquet dataset: two cold files, one fresh
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(2)
      .write.parquet(s"$dir/data")
    val files = Files.list(Paths.get(dir, "data")).toArray.map(_.toString)
      .filter(f => f.endsWith(".parquet"))
    files.take(2).foreach { f =>
      Files.setLastModifiedTime(Paths.get(f), FileTime.fromMillis(
        System.currentTimeMillis() - 200L * 3600000L))
    }
    touch(dir, "data/fresh.txt", ageHours = 1)
    val manifest = Files.createTempDirectory("graft-tier-man").toString
    val r = Lifecycle.transitionPath(spark, s"$dir/data",
      storageClass = "cold", retentionHours = 168,
      manifestFilePath = Some(manifest))
    assert(r.transitioned == 2 && r.failed == 0)
    // fresh file retained in place; cold files gone from the hot view
    assert(Files.exists(Paths.get(dir, "data/fresh.txt")))
    // default Spark scans of the root no longer see tiered files
    // (dot-dir is hidden), but the tier root reads back the full data
    val tiered = spark.read.parquet(s"$dir/data/.tier=cold")
    assert(tiered.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    val ok = new String(Files.readAllBytes(Paths.get(manifest, "Success.csv")))
    assert(files.take(2).forall(f => ok.contains(Paths.get(f).getFileName.toString)))
    // idempotent: a second pass finds nothing left to tier
    val r2 = Lifecycle.transitionPath(spark, s"$dir/data",
      storageClass = "cold", retentionHours = 168)
    assert(r2.transitioned == 0 && r2.failed == 0)
    // a later transition to a DIFFERENT class must not re-tier the
    // cold files (nesting them under .tier=glacier/.tier=cold would
    // hide them from both tier roots)
    val r3 = Lifecycle.transitionPath(spark, s"$dir/data",
      storageClass = "glacier", retentionHours = 168)
    assert(r3.transitioned == 0 && r3.failed == 0)
    assert(spark.read.parquet(s"$dir/data/.tier=cold")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("transitionTable tiers selected partitions under one table tier root") {
    val tbl = "t_tier_part"
    dropManaged(tbl)
    Seq((1L, "2024"), (2L, "2024"), (3L, "2025"), (4L, "2026"))
      .toDF("id", "year")
      .write.partitionBy("year").saveAsTable(tbl)
    val loc = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser
        .parseTableIdentifier(tbl)).location.getPath
    for (y <- Seq("2024", "2025")) {
      Files.list(Paths.get(loc, s"year=$y")).forEach { f =>
        Files.setLastModifiedTime(f, FileTime.fromMillis(
          System.currentTimeMillis() - 200L * 3600000L))
      }
    }
    // predicate restricts to 2024; 2025 is old but excluded
    val manifest = Files.createTempDirectory("graft-ttier-man").toString
    val r = Lifecycle.transitionTable(spark, tbl, retentionHours = 168,
      partitionPredicate = "year = '2024'",
      manifestFilePath = Some(manifest))
    assert(r.transitioned >= 1 && r.failed == 0)
    // the manifest lists THIS run's moved SOURCE paths (purge
    // contract), so entries are year=2024 originals, not tier dests
    val ok = new String(Files.readAllBytes(
      Paths.get(manifest, "Success.csv"))).trim.split("\n").toSeq
    assert(ok.size == r.transitioned)
    assert(ok.forall(p => p.contains("year=2024") && !p.contains(".tier=")))
    // the hot table lost exactly the 2024 rows
    assert(spark.table(tbl).select("id").as[Long].collect().toSet ==
      Set(3L, 4L))
    // the tier root mirrors the partition layout and reads back
    val tiered = spark.read.parquet(s"$loc/.tier=cold")
    assert(tiered.select("id").as[Long].collect().toSet == Set(1L, 2L))
    spark.sql(s"DROP TABLE $tbl")
  }

  test("purgeTable honors the partition predicate and drops emptied partitions") {
    val tbl = "t_purge_part"
    dropManaged(tbl)
    Seq((1L, "2024"), (2L, "2024"), (3L, "2025"), (4L, "2026"))
      .toDF("id", "year")
      .write.partitionBy("year").saveAsTable(tbl)
    // age the 2024 and 2025 partition files beyond retention
    val loc = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser
        .parseTableIdentifier(tbl)).location.getPath
    for (y <- Seq("2024", "2025")) {
      Files.list(Paths.get(loc, s"year=$y")).forEach { f =>
        Files.setLastModifiedTime(f, FileTime.fromMillis(
          System.currentTimeMillis() - 200L * 3600000L))
      }
    }
    // predicate restricts the purge to 2024: 2025 is old but excluded
    val r = Lifecycle.purgeTable(spark, tbl, retentionHours = 168,
      partitionPredicate = "year = '2024'")
    assert(r.deleted >= 1 && r.failed == 0)
    val partsLeft = spark.sql(s"SHOW PARTITIONS $tbl")
      .as[String].collect().toSet
    assert(partsLeft == Set("year=2025", "year=2026"))
    assert(spark.table(tbl).count() == 2) // 2025 + 2026 rows remain
    spark.sql(s"DROP TABLE $tbl")
  }
}
