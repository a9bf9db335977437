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

  /** FIXTURES.md §A synthesized SalesOrderDetail: 600 rows over 200
    * orders (3 lines each); rows where i % 60 == 0 carry an EMPTY
    * productId (→ null ProductKey after the int cast) to exercise the
    * reference's nullable-composite-key semantics (pipeline.py:975-989).
    */
  private def synthSalesOrderDetail(): (String, Int, Int) = {
    val rows = (0 until 600).map { i =>
      val orderId   = 43659 + i / 3
      val productId = if (i % 60 == 0) "" else (707 + i % 50).toString
      val qty       = 1 + i % 5
      val price     = f"${20.0 + (i % 7) * 1.25}%.4f"
      Seq(orderId, 1 + i, s"4911-403C-${i % 98}", qty, productId,
        1 + i % 5, price, "0.0000", f"${qty * (20.0 + (i % 7) * 1.25)}%.6f",
        s"{B207C96D-D9E6-402B-8470-${"%012d".format(i)}}",
        "2008-06-01 00:00:00").mkString("\t")
    }
    (writeTsv(rows), 600, (0 until 600).count(_ % 60 == 0))
  }

  /** FIXTURES.md §A synthesized SalesOrderHeader: 200 orders, 26
    * physical columns in the order pipeline.py:861-888 INTENDED (the
    * missing comma then mislabels the last three at rename time).
    */
  private def synthSalesOrderHeader(): String = {
    val rows = (0 until 200).map { h =>
      val orderId = 43659 + h
      Seq(
        orderId, 8,
        "2008-06-01 00:00:00", "2008-06-13 00:00:00", "2008-06-08 00:00:00",
        5, 1, s"SO$orderId", s"PO$orderId", s"10-4030-${"%06d".format(h)}",
        11000 + h % 120,                 // CustomerId
        100 + h,                         // ContactId
        275 + h % 17,                    // SalesPersonId
        1 + h % 10,                      // TerritoryId
        900 + h,                         // BillToAddressId
        5,                               // ShipMethodId
        s"105041Vi$h",                   // CreditCardApprovalCode
        "",                              // CurrencyRateId
        "100.0000", "8.0000", "2.5000", "110.5000",
        "",                              // Comment
        s"{79B65321-39CA-4115-9CBA-${"%012d".format(h)}}", // rowGuid
        "2008-06-08 00:00:00",           // ModifiedDate
        h % 19                           // CreditCardId
      ).mkString("\t")
    }
    writeTsv(rows)
  }

  test("replays FactInternetSales verbatim (EP2) incl. the rename quirk") {
    import graft.pipeline.ReferenceLoads
    import graft.operators.FieldOps
    import graft.sources.Sources
    val (detailPath, nDetail, nNullKey) = synthSalesOrderDetail()
    val headerPath = synthSalesOrderHeader()
    val spec = ReferenceLoads.factInternetSales(detailPath, headerPath)

    // the :885-886 literal-concat quirk, observable on the renamed header:
    // 24 effective names over 26 physical columns — the header's rowGuid
    // column is named rowGuidModifiedDate, its ModifiedDate column is
    // named CreditCardId, and the true CreditCardId column keeps _c25
    val namedHeader = FieldOps.renamePositional(
      Sources.readTsv(spark, headerPath), spec.headerColumns)
    assert(namedHeader.columns.length == 26)
    assert(namedHeader.columns.contains("rowGuidModifiedDate"))
    assert(namedHeader.columns.last == "_c25")
    assert(namedHeader.select($"rowGuidModifiedDate").as[String].head()
      .startsWith("{79B65321")) // rowGuid data under the concatenated name
    assert(namedHeader.select($"CreditCardId").as[String].head()
      == "2008-06-08 00:00:00") // ModifiedDate data under CreditCardId

    val wh = new ParquetWarehouse(spark,
      Files.createTempDirectory("graft_fact_replay").toString)
    assert(StarLoad.loadFact(spark, spec, wh) == nDetail.toLong)

    val stored = wh.read("FactInternetSales").get
    // 15-column fact schema, exact order and post-cast types
    // (pipeline.py:953; redshift/ddl.sql:78-93)
    assert(stored.columns.toSeq == Seq("ProductKey", "CustomerKey",
      "PromotionKey", "SalesTerritoryKey", "SalesOrderNumber",
      "RevisionNumber", "OrderQuantity", "UnitPrice", "UnitPriceDiscount",
      "TaxAmt", "Freight", "CarrierTrackingNumber", "OrderDate", "DueDate",
      "ShipDate"))
    import org.apache.spark.sql.types._
    val byName = stored.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("ProductKey") == IntegerType)
    assert(byName("RevisionNumber") == IntegerType)
    assert(byName("OrderQuantity") == FloatType)
    assert(byName("UnitPrice") == FloatType)
    assert(byName("OrderDate") == TimestampType)
    assert(byName("SalesOrderNumber") == StringType)
    assert(byName("CarrierTrackingNumber") == StringType)

    // re-run: rows with a null composite key NEVER match the anti-join,
    // so exactly the null-ProductKey rows are re-inserted — the
    // reference's preserved J4 semantics (pipeline.py:975-989)
    assert(StarLoad.loadFact(spark, spec, wh) == nNullKey.toLong)
    assert(wh.read("FactInternetSales").get.count() ==
      (nDetail + nNullKey).toLong)
    assert(stored.filter($"ProductKey".isNull).count() == nNullKey.toLong)
  }

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
