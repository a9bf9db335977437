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

  test("purgeTable honors the partition predicate and drops emptied partitions") {
    val tbl = "t_purge_part"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
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
