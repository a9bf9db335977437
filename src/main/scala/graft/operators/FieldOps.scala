package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.FieldPath

/** Projection / rename / cast / split transforms.
  *
  * Semantics re-expressed from the reference's field transforms
  * (awsglue/transforms/field_transforms.py:15-382 — SelectFields,
  * DropFields, RenameField, SplitFields, SplitRows; apply_mapping.py:15-72)
  * as declarative Column expressions so Catalyst keeps column pruning,
  * predicate pushdown and whole-stage codegen. No row-at-a-time work:
  * at 100 TB every one of these must stay a zero-shuffle Project/Filter.
  */
object FieldOps {

  // ---------------------------------------------------------------- select

  /** SelectFields (field_transforms.py:151-213): keep only the given
    * (possibly nested) paths, preserving nesting structure.
    */
  def selectFields(df: DataFrame, paths: Seq[String]): DataFrame = {
    val root = FieldPath.trie(paths.map(FieldPath.parse))
    val cols = root.children.toSeq.flatMap { case (name, node) =>
      buildSelected(col(FieldPath.quote(name)), name, node,
        fieldType(df.schema, Seq(name)))
    }
    df.select(cols: _*)
  }

  /** Rebuild a column keeping only selected sub-paths. */
  private def buildSelected(
      c: Column, name: String, node: FieldPath.Node,
      dt: Option[DataType]): Option[Column] = {
    if (node.leaf || node.children.isEmpty) Some(c.as(name))
    else dt match {
      case Some(st: StructType) =>
        val kids = node.children.toSeq.flatMap { case (k, n) =>
          st.fields.find(_.name == k).flatMap { f =>
            buildSelected(c.getField(k), k, n, Some(f.dataType))
          }
        }
        if (kids.isEmpty) None else Some(struct(kids: _*).as(name))
      case _ => Some(c.as(name)) // non-struct with sub-paths: keep whole
    }
  }

  private def fieldType(schema: StructType, path: Seq[String]): Option[DataType] =
    path.foldLeft(Option(schema: DataType)) {
      case (Some(st: StructType), seg) => st.fields.find(_.name == seg).map(_.dataType)
      case _                           => None
    }

  // ------------------------------------------------------------------ drop

  /** DropFields (field_transforms.py:86-148): remove the given paths;
    * nested paths use Column.dropFields (stays a single Project).
    */
  def dropFields(df: DataFrame, paths: Seq[String]): DataFrame = {
    val parsed             = paths.map(FieldPath.parse)
    val (top, nested)      = parsed.partition(_.lengthCompare(1) == 0)
    val afterTop           = if (top.isEmpty) df else df.drop(top.map(_.head): _*)
    nested.groupBy(_.head).foldLeft(afterTop) { case (acc, (parent, ps)) =>
      if (!acc.columns.contains(parent)) acc
      else {
        val inner = ps.map(p => FieldPath.render(p.tail))
        acc.withColumn(parent, col(FieldPath.quote(parent)).dropFields(inner: _*))
      }
    }
  }

  // ---------------------------------------------------------------- rename

  /** RenameField (field_transforms.py:15-83). Top-level renames map to
    * withColumnRenamed; a nested source is lifted with withField +
    * dropFields on its parent struct.
    */
  def renameField(df: DataFrame, from: String, to: String): DataFrame = {
    val fromP = FieldPath.parse(from)
    val toP   = FieldPath.parse(to)
    if (fromP.lengthCompare(1) == 0 && toP.lengthCompare(1) == 0)
      df.withColumnRenamed(fromP.head, toP.head)
    else if (fromP.init == toP.init) {
      // rename within the same parent struct
      val parent = FieldPath.render(fromP.init)
      df.withColumn(fromP.head,
        col(parent)
          .withField(toP.last, col(FieldPath.render(fromP)))
          .dropFields(fromP.last))
    } else {
      // general move: materialize at target top-level, drop source
      dropFields(df.withColumn(FieldPath.render(toP), col(FieldPath.render(fromP))),
        Seq(from))
    }
  }

  /** The pipeline's positional-rename idiom (pipeline.py:89-91): rename
    * the headerless `_c0.._cN` columns to the given names by position.
    */
  def renamePositional(df: DataFrame, names: Seq[String]): DataFrame =
    df.toDF(names ++ df.columns.drop(names.length): _*)

  // --------------------------------------------------------- apply_mapping

  /** One (sourcePath, sourceType, targetPath, targetType) mapping
    * (awsglue/dynamicframe.py:347-388 MappingSpec; 2/3/4-tuple forms).
    */
  final case class Mapping(
      sourcePath: String,
      sourceType: String,
      targetPath: String,
      targetType: String)

  object Mapping {
    def apply(source: String, target: String): Mapping =
      Mapping(source, "", target, "")
    def cast(source: String, target: String, targetType: String): Mapping =
      Mapping(source, "", target, targetType)
  }

  /** ApplyMapping (transforms/apply_mapping.py:15-72): bulk
    * project + rename + cast in one Project node. Nested target paths
    * are reassembled into structs.
    */
  def applyMapping(df: DataFrame, mappings: Seq[Mapping]): DataFrame = {
    // leaf expression per mapping
    val leaves: Seq[(Seq[String], Column)] = mappings.map { m =>
      val src  = col(FieldPath.render(FieldPath.parse(m.sourcePath)))
      val cast = if (m.targetType == null || m.targetType.isEmpty) src
                 else src.cast(glueTypeName(m.targetType))
      (FieldPath.parse(m.targetPath), cast)
    }
    val cols = assemble(leaves)
    df.select(cols: _*)
  }

  /** Reassemble dotted target paths into nested struct columns. */
  private def assemble(leaves: Seq[(Seq[String], Column)]): Seq[Column] = {
    val grouped = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[(Seq[String], Column)]]
    leaves.foreach { case (p, c) =>
      grouped.getOrElseUpdate(p.head, scala.collection.mutable.ArrayBuffer.empty) +=
        ((p, c))
    }
    grouped.toSeq.map { case (name, group) =>
      val direct = group.find(_._1.lengthCompare(1) == 0)
      direct match {
        case Some((_, c)) => c.as(name)
        case None =>
          val kids = assemble(group.map { case (p, c) => (p.tail, c) }.toSeq)
          struct(kids: _*).as(name)
      }
    }
  }

  /** Glue type names → Spark DDL type names (gluetypes.py:341-355). */
  def glueTypeName(t: String): String = t.trim.toLowerCase match {
    case "long"    => "bigint"
    case "integer" => "int"
    case "byte"    => "tinyint"
    case "short"   => "smallint"
    case other     => other // int, string, double, float, boolean, date,
                            // timestamp, decimal(p,s), binary, ...
  }

  // ------------------------------------------------------------ split_rows

  /** Comparator spec: column → (op → literal), ops in {"=", ">", "<",
    * ">=", "<="} (field_transforms.py:301-382; example
    * `{"age": {">": 10, "<": 20}}`).
    */
  def splitRowsPredicate(spec: Map[String, Map[String, Any]]): Column =
    spec.toSeq.sortBy(_._1).flatMap { case (c, ops) =>
      ops.toSeq.sortBy(_._1).map { case (op, v) =>
        val l = col(c)
        op match {
          case "="  => l === lit(v)
          case ">"  => l > lit(v)
          case "<"  => l < lit(v)
          case ">=" => l >= lit(v)
          case "<=" => l <= lit(v)
          case bad  => throw new IllegalArgumentException(s"bad comparator: $bad")
        }
      }
    }.reduce(_ && _)

  /** SplitRows: one cached-free pass, two filtered outputs. Rows where
    * the predicate is null (e.g. null column) land in the non-matching
    * frame, matching the reference's keep-everything contract.
    */
  def splitRows(df: DataFrame, spec: Map[String, Map[String, Any]])
      : (DataFrame, DataFrame) = {
    val p = splitRowsPredicate(spec)
    (df.filter(p), df.filter(!coalesce(p, lit(false))))
  }

  // ---------------------------------------------------------- split_fields

  /** SplitFields (field_transforms.py:216-299): (selected, remaining). */
  def splitFields(df: DataFrame, paths: Seq[String]): (DataFrame, DataFrame) =
    (selectFields(df, paths), dropFields(df, paths))

  // ------------------------------------------------------------ drop_nulls

  /** DropNullFields (transforms/drop_nulls.py:17-43): walk the schema,
    * collect every NullType leaf (recursing into structs and
    * arrays-of-structs, skipping maps), drop them all. Pure schema work,
    * zero execution cost.
    */
  def nullFieldPaths(schema: StructType, prefix: Seq[String] = Nil): Seq[Seq[String]] =
    schema.fields.toSeq.flatMap { f =>
      val p = prefix :+ f.name
      f.dataType match {
        case NullType                       => Seq(p)
        case st: StructType                 => nullFieldPaths(st, p)
        case ArrayType(st: StructType, _)   => nullFieldPaths(st, p)
        case _                              => Nil
      }
    }

  /** True iff a NullType leaf exists anywhere under `dt` (structs and
    * array elements recursed, maps skipped — drop_nulls.py:17-37).
    */
  private def containsNullType(dt: DataType): Boolean = dt match {
    case NullType           => true
    case st: StructType     => st.fields.exists(f => containsNullType(f.dataType))
    case ArrayType(et, _)   => containsNullType(et)
    case _                  => false
  }

  /** True iff pruning NullType leaves from `dt` leaves nothing at all
    * (the value is null-typed through and through).
    */
  private def prunesToNothing(dt: DataType): Boolean = dt match {
    case NullType         => true
    case st: StructType   => st.fields.forall(f => prunesToNothing(f.dataType))
    case ArrayType(et, _) => prunesToNothing(et)
    case _                => false
  }

  /** Rebuild `c` (of type `dt`) without its NullType leaves; None when
    * the whole value is null-typed. Struct members are reassembled with
    * struct(); array elements are rewritten through a transform()
    * lambda (Column.dropFields only works on struct columns — applying
    * a dotted path through an array is an AnalysisException).
    */
  private def pruneNullType(c: Column, dt: DataType): Option[Column] = dt match {
    case _ if prunesToNothing(dt) => None
    case st: StructType =>
      val kept = st.fields.toSeq.flatMap { f =>
        if (!containsNullType(f.dataType)) Some(c.getField(f.name).as(f.name))
        else pruneNullType(c.getField(f.name), f.dataType).map(_.as(f.name))
      }
      Some(struct(kept: _*))
    case ArrayType(et, _) =>
      if (!containsNullType(et)) Some(c)
      else Some(transform(c, x => pruneNullType(x, et).get))
    case _ => Some(c)
  }

  def dropNullFields(df: DataFrame): DataFrame = {
    if (!df.schema.fields.exists(f => containsNullType(f.dataType))) df
    else {
      val cols = df.schema.fields.toSeq.flatMap { f =>
        if (!containsNullType(f.dataType)) Some(col(FieldPath.quote(f.name)))
        else pruneNullType(col(FieldPath.quote(f.name)), f.dataType)
          .map(_.as(f.name))
      }
      df.select(cols: _*)
    }
  }

  // --------------------------------------------------------------- casting

  def castColumns(df: DataFrame, casts: Map[String, String]): DataFrame = {
    val cols = df.columns.map { c =>
      casts.get(c) match {
        case Some(t) => col(FieldPath.quote(c)).cast(glueTypeName(t)).as(c)
        case None    => col(FieldPath.quote(c))
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  // ----------------------------------------------------- ingestion columns

  /** add_ingestion_time_columns (awsglue/context.py:666-674): append
    * ingest_year/month/day/hour[/minute] partition columns. The clock is
    * a parameter so tests and oracles stay deterministic.
    */
  def addIngestionTimeColumns(
      df: DataFrame,
      granularity: String = "hour",
      now: Column = current_timestamp()): DataFrame = {
    val all = Seq(
      "ingest_year"   -> year(now),
      "ingest_month"  -> month(now),
      "ingest_day"    -> dayofmonth(now),
      "ingest_hour"   -> hour(now),
      "ingest_minute" -> minute(now))
    val n = granularity match {
      case "day" => 3; case "hour" => 4; case "minute" => 5
      case _     => throw new IllegalArgumentException(granularity)
    }
    all.take(n).foldLeft(df) { case (acc, (name, c)) => acc.withColumn(name, c) }
  }
}
