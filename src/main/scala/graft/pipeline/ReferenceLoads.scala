package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.pipeline.StarLoad.{DimSpec, FactSpec, Warehouse}

/** The reference pipeline's six dimension loads, spec'd verbatim from
  * pipeline.py (column lists, projections, renames, casts — cited per
  * dim). Run against the AdventureWorks extracts to replay the
  * reference's warehouse load end-to-end.
  *
  * Reference quirks preserved deliberately (SURVEY §7.3 policy —
  * reproduce observable outputs):
  * - DimPromotion loads SpecialOfferProduct (the junction table), so
  *   PromotionKey repeats on first load (pipeline.py:496-520);
  * - DimCustomer's positional names mislabel Customer.csv's 7 columns
  *   with 6 names (pipeline.py:696-703): salesTerritoryKey actually
  *   carries PersonID and customerAlternateKey carries AccountNumber;
  *   nulls in PersonID survive as null keys.
  */
object ReferenceLoads {

  def dataDir: String = "/root/reference/data"

  /** pipeline.py:64,84-98. */
  def productCategory(dir: String = dataDir): DimSpec = DimSpec(
    table = "DimProductCategory",
    inputPath = s"$dir/ProductCategory.csv",
    columnNames = Seq("productCategoryKey", "name", "rowGuid", "modifiedDate"),
    projection = Seq("productCategoryKey", "rowGuid"),
    renames = Map("rowGuid" -> "productCategoryAlternateKey"),
    casts = Map("productCategoryKey" -> "int"),
    businessKeys = Seq("productCategoryKey"))

  /** pipeline.py:174-200 (PRODUCT_SUB_CATEGORY_COLUMNS;
    * DIM_PRODUCT_SUB_CATEGORY_COLUMNS).
    */
  def productSubCategory(dir: String = dataDir): DimSpec = DimSpec(
    table = "DimProductSubCategory",
    inputPath = s"$dir/ProductSubcategory.csv",
    columnNames = Seq("productSubCategoryId", "productCategoryId", "name",
      "rowGuid", "modifiedDate"),
    projection = Seq("productSubCategoryId", "rowGuid", "productCategoryId"),
    renames = Map(
      "productSubCategoryId" -> "productSubCategoryKey",
      "productCategoryId"    -> "productCategoryKey",
      "rowGuid"              -> "productSubCategoryAlternateKey"),
    casts = Map("productSubCategoryKey" -> "int", "productCategoryKey" -> "int"),
    businessKeys = Seq("productSubCategoryKey"))

  /** pipeline.py:275-332 (PRODUCT_COLUMNS; DIM_PRODUCT_COLUMNS). */
  def product(dir: String = dataDir): DimSpec = DimSpec(
    table = "DimProduct",
    inputPath = s"$dir/Product.csv",
    columnNames = Seq("productId", "Name", "ProductNumber", "MakeFlag",
      "FinishedGoodsFlag", "Color", "SafetyStockLevel", "ReorderPoint",
      "StandardCost", "ListPrice", "Size", "SizeUnitMeasureCode",
      "WeightUnitMeasureCode", "Weight", "DaysToManufacture", "ProductLine",
      "Class", "Style", "ProductSubcategoryId", "ProductModelId",
      "SellStartDate", "SellEndDate", "DiscountinuedDate", "rowguid",
      "ModifiedDate"),
    projection = Seq("productId", "rowguid", "ProductSubcategoryId",
      "SellStartDate"),
    renames = Map(
      "productId"            -> "productKey",
      "ProductSubcategoryId" -> "productSubCategoryKey",
      "rowguid"              -> "productAlternateKey",
      "SellStartDate"        -> "startDate"),
    casts = Map("productKey" -> "int", "productSubCategoryKey" -> "int",
      "startDate" -> "timestamp"),
    businessKeys = Seq("productKey"))

  /** pipeline.py:398-440 (CURRENCY_COLUMNS; DIM_CURRENCY_COLUMNS). */
  def currency(dir: String = dataDir): DimSpec = DimSpec(
    table = "DimCurrency",
    inputPath = s"$dir/Currency.csv",
    columnNames = Seq("currencyCode", "name", "modifiedDate"),
    projection = Seq("currencyCode", "name"),
    renames = Map("currencyCode" -> "CurrencyKey",
      "name" -> "CurrencyAlternateKey"),
    casts = Map.empty,
    businessKeys = Seq("CurrencyKey"))

  /** pipeline.py:496-540 (PROMOTION_COLUMNS; DIM_PROMOTION_COLUMNS). */
  def promotion(dir: String = dataDir): DimSpec = DimSpec(
    table = "DimPromotion",
    inputPath = s"$dir/SpecialOfferProduct.csv",
    columnNames = Seq("SpecialOfferId", "ProductId", "rowGuid", "ModifiedDate"),
    projection = Seq("SpecialOfferId", "rowGuid"),
    renames = Map("SpecialOfferId" -> "PromotionKey",
      "rowGuid" -> "PromotionAlternateKey"),
    casts = Map("PromotionKey" -> "int"),
    businessKeys = Seq("PromotionKey"))

  /** pipeline.py:596-660 (SALES_TERRITORY_COLUMNS;
    * DIM_SALES_TERRITORY_COLUMNS).
    */
  def salesTerritory(dir: String = dataDir): DimSpec = DimSpec(
    table = "DimSalesTerritory",
    inputPath = s"$dir/SalesTerritory.csv",
    columnNames = Seq("TerritoryId", "Name", "CountryRegionCode", "Group",
      "SalesYTD", "SalesLastYear", "CostYTD", "CostLastYear", "rowguid",
      "ModifiedDate"),
    projection = Seq("TerritoryId", "rowguid"),
    renames = Map("TerritoryId" -> "SalesTerritoryKey",
      "rowguid" -> "SalesTerritoryAlternateKey"),
    casts = Map("SalesTerritoryKey" -> "int"),
    businessKeys = Seq("SalesTerritoryKey"))

  /** pipeline.py:692-768 (CUSTOMER_COLUMNS; DIM_CUSTOMER_COLUMN) —
    * mislabeling quirk preserved, see class doc.
    */
  def customer(dir: String = dataDir): DimSpec = DimSpec(
    table = "DimCustomer",
    inputPath = s"$dir/Customer.csv",
    columnNames = Seq("customerId", "territoryId", "accountNumber",
      "customerType", "rowGuid", "modifiedDate"),
    projection = Seq("customerId", "territoryId", "rowGuid"),
    renames = Map(
      "customerId"  -> "customerKey",
      "territoryId" -> "salesTerritoryKey",
      "rowGuid"     -> "customerAlternateKey"),
    casts = Map("customerKey" -> "int", "salesTerritoryKey" -> "int"),
    businessKeys = Seq("customerKey"))

  /** FactInternetSales (EP2, pipeline.py:834-1013) — verbatim column
    * lists. The source files are empty in the reference checkout
    * (.MISSING_LARGE_BLOBS:4-5), so callers pass synthesized fixture
    * paths with these exact shapes (FIXTURES.md §A).
    *
    * Quirk decisions (SURVEY §7.3 policy — reproduce observable
    * outputs, document divergences):
    * - pipeline.py:885-886 omits a comma, so `"rowGuid" "ModifiedDate"`
    *   concatenates into ONE positional name `rowGuidModifiedDate`,
    *   shifting every later name: the header's rowGuid column is named
    *   rowGuidModifiedDate, its ModifiedDate column is named
    *   CreditCardId, and the real CreditCardId column keeps `_c25`.
    *   PRESERVED here — all three mislabeled columns are dropped by the
    *   final 15-column select, so the fact output is unaffected.
    * - pipeline.py:896-912 renames productId→productKey (lower p), then
    *   the cast loop's withColumn("ProductKey", ...) re-cases it under
    *   case-insensitive resolution (same for the other keys). The
    *   renames below go straight to the final capitalization — the
    *   observable schema (pipeline.py:953 select) is identical.
    * - `.drop("soh.SalesOrderId")` (pipeline.py:938) is a no-op in the
    *   reference (qualified-name drop never matches); the join key is
    *   excluded by the final select either way.
    */
  def factInternetSales(detailPath: String, headerPath: String): FactSpec =
    FactSpec(
      table = "FactInternetSales",
      detailPath = detailPath,
      // SALES_ORDER_DETAIL_COLUMN, pipeline.py:839-850
      detailColumns = Seq("salesOrderId", "salesOrderDetailId",
        "carrierTrackingNumber", "orderQty", "productId", "specialOfferId",
        "unitPrice", "unitPriceDiscount", "lineTotal", "rowGuid",
        "modifiedDate"),
      headerPath = headerPath,
      // SALES_ORDER_HEADER_COLUMN, pipeline.py:861-888 — 24 effective
      // names (the :885-886 literal-concat quirk, see class doc)
      headerColumns = Seq("SalesOrderId", "RevisionNumber", "OrderDate",
        "DueDate", "ShipDate", "Status", "OnlineOrderFlag",
        "SalesOrderNumber", "PurchaseOrderNumber", "AccountNumber",
        "CustomerId", "ContactId", "SalesPersonId", "TerritoryId",
        "BillToAddressId", "ShipMethodId", "CreditCardApprovalCode",
        "CurrencyRateId", "SubTotal", "TaxAmt", "Freight", "TotalDue",
        "Comment", "rowGuidModifiedDate", "CreditCardId"),
      // pipeline.py:933-938 — inner join on SalesOrderId
      joinKey = "SalesOrderId",
      // mapping dict, pipeline.py:896-912 (final capitalization, see doc)
      renames = Map(
        "productId"             -> "ProductKey",
        "CustomerId"            -> "CustomerKey",
        "specialOfferId"        -> "PromotionKey",
        "TerritoryId"           -> "SalesTerritoryKey",
        "orderQty"              -> "OrderQuantity",
        "unitPrice"             -> "UnitPrice",
        "unitPriceDiscount"     -> "UnitPriceDiscount",
        "carrierTrackingNumber" -> "CarrierTrackingNumber"),
      // timestamp_columns / integer_columns / real_value_columns,
      // pipeline.py:807-827 + cast loops :943-950
      casts = Map(
        "OrderDate" -> "timestamp", "DueDate" -> "timestamp",
        "ShipDate" -> "timestamp",
        "ProductKey" -> "int", "CustomerKey" -> "int",
        "PromotionKey" -> "int", "SalesTerritoryKey" -> "int",
        "RevisionNumber" -> "int",
        "OrderQuantity" -> "float", "UnitPrice" -> "float",
        "UnitPriceDiscount" -> "float", "TaxAmt" -> "float",
        "Freight" -> "float"),
      // FACT_INTERNET_SALES_COLUMNS, pipeline.py:915-931/:953
      projection = Seq("ProductKey", "CustomerKey", "PromotionKey",
        "SalesTerritoryKey", "SalesOrderNumber", "RevisionNumber",
        "OrderQuantity", "UnitPrice", "UnitPriceDiscount", "TaxAmt",
        "Freight", "CarrierTrackingNumber", "OrderDate", "DueDate",
        "ShipDate"),
      // 4-way composite anti-join, pipeline.py:975-989
      businessKeys = Seq("ProductKey", "CustomerKey", "PromotionKey",
        "SalesTerritoryKey"))

  def allDims(dir: String = dataDir): Seq[DimSpec] = Seq(
    productCategory(dir), productSubCategory(dir), product(dir),
    currency(dir), promotion(dir), salesTerritory(dir), customer(dir))

  /** Replay every dimension load; returns table → rows appended. */
  def runAll(spark: SparkSession, wh: Warehouse,
      dir: String = dataDir): Map[String, Long] =
    allDims(dir).map(spec =>
      spec.table -> StarLoad.loadDim(spark, spec, wh)).toMap
}
