package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import graft.core.{GType, GlueTypes}
import graft.core.GType._

/** Choice inference at read time — the Glue-distinctive ingest path:
  * read raw JSON, DISCOVER per-path types across records, and surface
  * conflicting paths as struct-encoded ChoiceType columns ready for
  * [[graft.operators.ChoiceOps.resolveChoice]]. These are the
  * semantics of awsglue's schema computation (gluetypes.py:395-432
  * `mergeDataTypes` folding per-record schemas; context.py:149-150
  * schema fetch) rebuilt Spark-first.
  *
  * Mechanics: each record parses to a VARIANT, which preserves the
  * per-record JSON type (Spark's own JSON reader erases it by coercing
  * everything to one inferred schema — exactly the information choice
  * types exist to keep). Pass 1 collects the DISTINCT per-record
  * schema strings — bounded by schema VARIETY, never row count; the
  * only driver traffic — and folds them through the ported
  * mergeDataTypes. Pass 2 projects every path out of the variant:
  * unambiguous paths via try_variant_get at the merged type; choice
  * paths as one branch per observed type, each branch routed by the
  * value's OWN variant kind (try_variant_get alone coerces — a quoted
  * "5" satisfies a bigint get — so each branch is guarded with
  * schema_of_variant over the sub-variant).
  *
  * Two deliberate passes over the input, NO persist: at 100 TB,
  * caching the parsed corpus costs more than the second narrow scan.
  *
  * Inference normalizations (JSON-specific, documented): fractional
  * numbers widen to double (variant reports per-value DECIMAL(p,s),
  * which would flap precision into spurious choices); integer widths
  * widen to long — both matching what Spark's JSON reader infers for
  * the unambiguous case. Records that are not valid JSON objects are
  * skipped (the reference's reader drops unparseable records to the
  * error channel).
  */
object ChoiceInfer {

  /** Read newline-delimited JSON from `path`, inferring choices. */
  def readJson(spark: SparkSession, path: String): DataFrame = {
    val parsed = spark.read.text(path)
      .select(try_parse_json(col("value")).as("v"))
      .filter(col("v").isNotNull)
    project(parsed, inferSchema(parsed))
  }

  /** Infer the merged Glue type of a variant column (pass 1). */
  def inferSchema(parsed: DataFrame): GStruct = {
    // sorted so merge order — and with it output column order — is
    // deterministic across runs (collect order is not)
    val distinctSchemas = parsed
      .select(schema_of_variant(col("v")).as("s"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    require(distinctSchemas.nonEmpty, "no parseable JSON records")
    val gts = distinctSchemas
      .map(s => normalize(GlueTypes.fromSpark(parseVariantDdl(s))))
    GlueTypes.mergeAll(gts) match {
      case s: GStruct => s
      case other => throw new IllegalArgumentException(
        s"top-level JSON records must be objects, saw: $other")
    }
  }

  /** Project a variant column to the inferred schema (pass 2). */
  def project(parsed: DataFrame, schema: GStruct): DataFrame =
    parsed.select(schema.fields.map { f =>
      val (c, isChoice) = extract(col("v"), "$." + f.name, f.dataType)
      if (isChoice) c.as(f.name, GlueTypes.choiceMetadata) else c.as(f.name)
    }: _*)

  // schema_of_variant spells structs OBJECT<...>; Spark DDL wants STRUCT
  private def parseVariantDdl(s: String): DataType =
    DataType.fromDDL(s.replace("OBJECT<", "STRUCT<"))

  private def normalize(t: GType): GType = t match {
    case GDecimal(_, _) | GFloat    => GDouble
    case GByte | GShort | GInt      => GLong
    case GArray(e)                  => GArray(normalize(e))
    case GSet(e)                    => GSet(normalize(e))
    case GMap(v)                    => GMap(normalize(v))
    case GStruct(fs)                =>
      GStruct(fs.map(f => f.copy(dataType = normalize(f.dataType))))
    case other                      => other
  }

  private def containsChoice(t: GType): Boolean = t match {
    case _: GChoice  => true
    case GArray(e)   => containsChoice(e)
    case GSet(e)     => containsChoice(e)
    case GMap(v)     => containsChoice(v)
    case GStruct(fs) => fs.exists(f => containsChoice(f.dataType))
    case _           => false
  }

  /** Extraction column for one path; (column, isChoiceEncoded). */
  private def extract(
      v: Column, path: String, t: GType): (Column, Boolean) = t match {
    case GChoice(branches) =>
      val kind = schema_of_variant(try_variant_get(v, path, "variant"))
      (struct(branches.map { b =>
        when(kindMatches(kind, b), try_variant_get(v, path, ddl(b)))
          .as(GType.branchName(b))
      }: _*), true)
    case s: GStruct if containsChoice(s) =>
      // recurse so nested conflicting paths get their own encoding
      (struct(s.fields.map { f =>
        val (c, isChoice) = extract(v, s"$path.${f.name}", f.dataType)
        if (isChoice) c.as(f.name, GlueTypes.choiceMetadata)
        else c.as(f.name)
      }: _*), false)
    case other if containsChoice(other) =>
      throw new UnsupportedOperationException(
        s"choice under an array/map element is not supported (at $path)")
    case GNull | GUnknown =>
      // the path was null in every record
      (lit(null).cast("string"), false)
    case other =>
      (try_variant_get(v, path, ddl(other)), false)
  }

  private def ddl(t: GType): String = GlueTypes.toSpark(t).sql

  /** Does this variant-kind string (schema_of_variant output) belong
    * to branch type `t`? Post-normalization only long/double survive
    * among numerics, so the numeric kinds partition cleanly.
    */
  private def kindMatches(kind: Column, t: GType): Column = t match {
    case GLong      => kind.isin("BIGINT", "INT", "SMALLINT", "TINYINT")
    case GDouble    => kind.isin("DOUBLE", "FLOAT") ||
      kind.startsWith("DECIMAL")
    case GString    => kind === "STRING"
    case GBoolean   => kind === "BOOLEAN"
    case GBinary    => kind === "BINARY"
    case GDate      => kind === "DATE"
    case GTimestamp => kind.startsWith("TIMESTAMP")
    case _: GStruct => kind.startsWith("OBJECT")
    case _: GMap    => kind.startsWith("OBJECT")
    case _: GArray  => kind.startsWith("ARRAY")
    case _          => lit(false)
  }
}
