package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{GlueArgs, Job, StarLoad}
import graft.pipeline.StarLoad.{DimSpec, FactSpec, ParquetWarehouse}

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  // ------------------------------------------------------------- args/job

  test("getResolvedOptions parses --k v and --k=v, aliases TempDir") {
    val got = GlueArgs.getResolvedOptions(
      Array("--JOB_NAME", "j1", "--TempDir=s3://tmp", "--x", "1"),
      Seq("JOB_NAME", "x", "RedshiftTempDir"))
    assert(got("JOB_NAME") == "j1")
    assert(got("x") == "1")
    assert(got("RedshiftTempDir") == "s3://tmp")
    intercept[IllegalArgumentException] {
      GlueArgs.getResolvedOptions(Array("--a", "1"), Seq("missing"))
    }
  }

  test("job bookmarks persist only on commit, atomically") {
    val dir = Files.createTempDirectory("graft_job").toString
    val j1 = new Job(dir)
    j1.init("etl")
    j1.updateBookmark("src1", "file-42")
    assert(j1.bookmark("src1").isEmpty) // staged, not committed
    j1.commit()
    assert(j1.bookmark("src1").contains("file-42"))
    val j2 = new Job(dir)
    j2.init("etl") // fresh process sees committed state
    assert(j2.bookmark("src1").contains("file-42"))
    j2.updateBookmark("src1", "file-43")
    // no commit → next init still sees 42
    val j3 = new Job(dir); j3.init("etl")
    assert(j3.bookmark("src1").contains("file-42"))
  }

  // --------------------------------------------------------- dim replay

  private def writeTsv(rows: Seq[String]): String = {
    val f = Files.createTempFile("graft_dim", ".tsv")
    Files.write(f, rows.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("dim load is incremental and idempotent (run twice → 0 new)") {
    val tsv = writeTsv(Seq(
      "1\tBikes\t{AAA}\t2008-04-30 00:00:00",
      "2\tComponents\t{BBB}\t2008-04-30 00:00:00",
      "3\tClothing\t{CCC}\t2008-04-30 00:00:00"))
    val spec = DimSpec(
      table = "DimCategory",
      inputPath = tsv,
      columnNames = Seq("categoryKey", "name", "rowGuid", "modifiedDate"),
      projection = Seq("categoryKey", "rowGuid"),
      renames = Map("rowGuid" -> "categoryAlternateKey"),
      casts = Map("categoryKey" -> "int"),
      businessKeys = Seq("categoryKey"))
    val whDir = Files.createTempDirectory("graft_wh").toString
    val wh = new ParquetWarehouse(spark, whDir)
    assert(StarLoad.loadDim(spark, spec, wh) == 3L)
    assert(StarLoad.loadDim(spark, spec, wh) == 0L) // idempotent
    val stored = wh.read("DimCategory").get
    assert(stored.count() == 3)
    assert(stored.columns.toSeq == Seq("categoryKey", "categoryAlternateKey"))
    // incremental: a fourth row arrives, only it is appended
    val tsv2 = writeTsv(Seq(
      "1\tBikes\t{AAA}\t2008-04-30 00:00:00",
      "4\tAccessories\t{DDD}\t2008-04-30 00:00:00"))
    assert(StarLoad.loadDim(spark, spec.copy(inputPath = tsv2), wh) == 1L)
    assert(wh.read("DimCategory").get.count() == 4)
  }

  test("replays the reference's DimProductCategory extract when present") {
    val ref = "/root/reference/data/ProductCategory.csv"
    assume(new java.io.File(ref).exists())
    val spec = DimSpec(
      table = "DimProductCategory",
      inputPath = ref,
      columnNames = Seq("productCategorykey", "name", "rowGuid", "modifiedDate"),
      projection = Seq("productCategorykey", "rowGuid"),
      renames = Map("rowGuid" -> "productCategoryAlternateKey"),
      casts = Map("productCategorykey" -> "int"),
      businessKeys = Seq("productCategorykey"))
    val wh = new ParquetWarehouse(spark,
      Files.createTempDirectory("graft_ref_wh").toString)
    assert(StarLoad.loadDim(spark, spec, wh) == 4L) // 4 categories
    assert(StarLoad.loadDim(spark, spec, wh) == 0L)
    val names = wh.read("DimProductCategory").get.columns.toSeq
    assert(names == Seq("productCategorykey", "productCategoryAlternateKey"))
  }

  test("replays all six reference dimension loads, idempotently") {
    import graft.pipeline.ReferenceLoads
    assume(new java.io.File(ReferenceLoads.dataDir).exists())
    val wh = new ParquetWarehouse(spark,
      Files.createTempDirectory("graft_all_dims").toString)
    val first = ReferenceLoads.runAll(spark, wh)
    // cardinalities from the extracts (BASELINE.md)
    assert(first("DimProductCategory") == 4L)
    assert(first("DimProductSubCategory") == 37L)
    assert(first("DimProduct") == 504L)
    assert(first("DimCurrency") == 105L)
    assert(first("DimPromotion") == 538L) // junction-table quirk preserved
    assert(first("DimSalesTerritory") == 10L)
    assert(first("DimCustomer") == 19820L)
    val second = ReferenceLoads.runAll(spark, wh)
    assert(second.values.forall(_ == 0L)) // nothing new on re-run
    // the customer mislabeling quirk: alternate key carries AccountNumber
    val c = wh.read("DimCustomer").get
    assert(c.columns.toSeq ==
      Seq("customerKey", "salesTerritoryKey", "customerAlternateKey"))
    assert(c.filter($"customerAlternateKey".startsWith("AW")).count() == 19820L)
  }

  // -------------------------------------------------------- fact replay

  test("fact load joins detail+header and anti-joins on composite key") {
    val detail = writeTsv(Seq(
      "100\t1\t5\t2.5", // orderId, line, productKey, amount
      "100\t2\t6\t3.5",
      "101\t1\t5\t1.0"))
    val header = writeTsv(Seq(
      "100\t2008-01-01 00:00:00\t7", // orderId, date, customerKey
      "101\t2008-01-02 00:00:00\t8"))
    val spec = FactSpec(
      table = "FactSales",
      detailPath = detail,
      detailColumns = Seq("salesOrderId", "lineNumber", "productKey", "amount"),
      headerPath = header,
      headerColumns = Seq("salesOrderId", "orderDate", "customerKey"),
      joinKey = "salesOrderId",
      casts = Map("productKey" -> "int", "customerKey" -> "int",
        "amount" -> "float", "lineNumber" -> "int"),
      projection = Seq("salesOrderId", "lineNumber", "productKey",
        "customerKey", "amount"),
      businessKeys = Seq("salesOrderId", "lineNumber"))
    val wh = new ParquetWarehouse(spark,
      Files.createTempDirectory("graft_fact_wh").toString)
    assert(StarLoad.loadFact(spark, spec, wh) == 3L)
    assert(StarLoad.loadFact(spark, spec, wh) == 0L) // idempotent
    val stored = wh.read("FactSales").get
    assert(stored.count() == 3)
    assert(stored.filter($"salesOrderId" === "100").count() == 2)
  }
}
