package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-data operators (SURVEY §2.3 R3/R4/R5).
  *
  * - unnest (dynamicframe.py:310-322; transforms/unnest_frame.py:15-75):
  *   flatten nested structs to dotted top-level names.
  * - relationalize (dynamicframe.py:324-345; transforms/
  *   relationalize.py:16-111): decompose a nested frame into a
  *   collection of flat tables — root + one table per array column,
  *   linked by generated join keys. The reference stages pivoted tables
  *   to a path and reads them back; Spark-first we keep them as lazy
  *   plans (caller persists/writes if it wants staging).
  * - unbox (dynamicframe.py:162-185; transforms/unbox.py:15-112):
  *   parse a string column as json/csv into a struct.
  *
  * Join-key determinism: the reference generates opaque ids. At 100 TB
  * `monotonically_increasing_id` is nondeterministic under retry, so the
  * default key is xxhash64 over the full row (content-deterministic,
  * recompute-stable); callers with a natural key pass `idCol` and get
  * oracle-stable output with zero extra columns (SURVEY §7.3).
  */
object NestedOps {

  // ----------------------------------------------------------- unnest

  /** Flatten all nested structs to top level with dotted names; arrays
    * and maps are kept in place.
    */
  def unnest(df: DataFrame): DataFrame = {
    def flatten(prefix: Seq[String], st: StructType): Seq[Column] =
      st.fields.toSeq.flatMap { f =>
        val path = prefix :+ f.name
        f.dataType match {
          case inner: StructType => flatten(path, inner)
          case _ =>
            val c = path.tail.foldLeft(col(graft.core.FieldPath.quote(path.head)))(
              (acc, seg) => acc.getField(seg))
            Seq(c.as(path.mkString(".")))
        }
      }
    df.select(flatten(Nil, df.schema): _*)
  }

  // ---------------------------------------------------- relationalize

  /** Result: `name` → root table; `name_<arrayPath>` → one child table
    * per array column with (id, index, <val or flattened struct>).
    *
    * `stagingPath` reproduces the reference's staging behavior
    * (relationalize.py:36-46: pivoted tables written out and read
    * back): every member table is written to
    * `stagingPath/<tableName>` as parquet and the returned frames scan
    * the staged copies — a materialization barrier, so downstream
    * consumers of several members never recompute the source per
    * member. Without it, members are lazy plans over the input.
    */
  def relationalize(
      df: DataFrame,
      name: String,
      idCol: Option[String] = None,
      stagingPath: Option[String] = None): Map[String, DataFrame] = {
    val tables = relationalizePlans(df, name, idCol)
    stagingPath match {
      case None => tables
      case Some(base) =>
        tables.map { case (tbl, frame) =>
          val path = s"$base/$tbl"
          frame.write.mode("overwrite").parquet(path)
          tbl -> df.sparkSession.read.parquet(path)
        }
    }
  }

  private def relationalizePlans(
      df: DataFrame,
      name: String,
      idCol: Option[String]): Map[String, DataFrame] = {
    val flat = unnest(df)
    val arrayCols = flat.schema.fields.toSeq.collect {
      case f if f.dataType.isInstanceOf[ArrayType] => f.name
    }
    if (arrayCols.isEmpty) return Map(name -> flat)

    val id: Column = idCol.map(c => col(graft.core.FieldPath.quote(c)).cast("long"))
      .getOrElse(xxhash64(flat.columns.toIndexedSeq
        .map(c => col(graft.core.FieldPath.quote(c)).cast("string")): _*))
    val withId = flat.withColumn("__rel_id", id)

    // root: replace each array column by the join key
    val rootCols = flat.columns.toIndexedSeq.map { c =>
      if (arrayCols.contains(c)) col("__rel_id").as(c)
      else col(graft.core.FieldPath.quote(c))
    }
    val root = withId.select(rootCols: _*)

    val children = arrayCols.map { ac =>
      val exploded = withId.select(
        col("__rel_id").as("id"),
        posexplode(col(graft.core.FieldPath.quote(ac))).as(Seq("index", "val")))
      val child = exploded.schema("val").dataType match {
        case st: StructType =>
          // flatten struct elements as <arrayPath>.val.<field>
          val cols = Seq(col("id"), col("index")) ++ st.fields.toSeq.map(f =>
            col("val").getField(f.name).as(s"$ac.val.${f.name}"))
          exploded.select(cols: _*)
        case _ => exploded.select(col("id"), col("index"),
          col("val").as(s"$ac.val"))
      }
      s"${name}_$ac" -> child
    }.toMap

    children + (name -> root)
  }

  // ------------------------------------------------------------ unbox

  /** Parse string column `field` as `format` into a struct, replacing
    * the column. Options mirror unbox.py:15-112 (withSchema — DDL or
    * JSON schema; separator / withHeader for csv). When no schema is
    * given for json, infer it distributedly from the column itself
    * (sample-bounded: the reference's choice-style inference is
    * schema-of-all; at scale pass withSchema or sampleRatio).
    */
  def unbox(
      df: DataFrame,
      field: String,
      format: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val c = col(graft.core.FieldPath.quote(field))
    format match {
      case "json" =>
        val schema: DataType = options.get("withSchema") match {
          case Some(ddl) => parseSchema(ddl)
          case None =>
            val sampleRatio = options.get("sampleRatio").map(_.toDouble)
            val src = df.select(c.cast("string").as("j"))
            val sampled = sampleRatio.fold(src)(r => src.sample(r, 42L))
            sampled.sparkSession.read
              .json(sampled.as(org.apache.spark.sql.Encoders.STRING)).schema
        }
        df.withColumn(field, from_json(c.cast("string"), schema,
          options - "withSchema" - "sampleRatio"))
      case "csv" =>
        val schema = parseSchema(options.getOrElse("withSchema",
          sys.error("unbox csv requires withSchema")))
        val sep = options.getOrElse("separator", ",")
        df.withColumn(field, from_csv(c.cast("string"),
          schema.asInstanceOf[StructType],
          Map("sep" -> sep) ++ (options - "withSchema" - "separator")))
      case "avro" =>
        // unbox.py:15-112 lists avro first; withSchema here is the Avro
        // JSON schema (Avro binaries are not self-describing). Decoded
        // with the Apache Avro library directly — see [[AvroUnbox]].
        val avroSchema = options.getOrElse("withSchema",
          sys.error("unbox avro requires withSchema (Avro JSON schema)"))
        AvroUnbox.unbox(df, field, avroSchema)
      case other => sys.error(s"unbox: unsupported format $other")
    }
  }

  private def parseSchema(ddl: String): DataType =
    try DataType.fromDDL(ddl)
    catch { case _: Exception => DataType.fromJson(ddl) }

  /** unnest_ddb_json (R6, dynamicframe.py:390-392): collapse the full
    * DynamoDB typed encoding into plain values, recursively —
    * scalars ({"S"}, {"N"}, {"B"}, {"BOOL"}, {"NULL"}), string sets
    * ({"SS"}, {"NS"}, {"BS"} → array<string>), lists ({"L"} → array of
    * collapsed elements) and maps ({"M"} → struct of collapsed fields).
    *
    * Scalar kinds coalesce to one string column (numbers stay the
    * strings DynamoDB exports them as; BOOL renders "true"/"false" —
    * follow with `cast`/`resolveChoice` for typed columns). An
    * attribute whose rows mix a scalar kind with a complex kind (L/M)
    * cannot collapse to a single type; its branches are collapsed in
    * place and the struct kept, mirroring the choice-struct encoding.
    * Pure schema recursion — the whole op stays one Project.
    */
  def unnestDdbJson(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toIndexedSeq.map { f =>
      collapseDdb(col(graft.core.FieldPath.quote(f.name)), f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }

  private val DdbScalarKeys = Set("S", "N", "B", "BOOL", "NULL")
  private val DdbSetKeys    = Set("SS", "NS", "BS")
  private val DdbKeys       = DdbScalarKeys ++ DdbSetKeys ++ Set("L", "M")

  private def isDdbTyped(st: StructType): Boolean =
    st.fieldNames.nonEmpty && st.fieldNames.toSet.subsetOf(DdbKeys)

  /** The collapsed value of one DDB-typed struct branch. */
  private def ddbBranch(c: Column, name: String, dt: DataType): Column =
    name match {
      case "S" | "N" | "B" => c
      case "BOOL"          => c.cast("string")
      case "NULL"          => lit(null).cast("string")
      case "SS" | "NS" | "BS" => c
      case "L" => dt match {
        case ArrayType(et, _) => transform(c, e => collapseDdb(e, et))
        case _                => c
      }
      case "M" => collapseDdb(c, dt)
      case _   => c
    }

  private def collapseDdb(c: Column, dt: DataType): Column = dt match {
    case st: StructType if isDdbTyped(st) =>
      val scalarFields  = st.fields.toSeq.filter(f => DdbScalarKeys(f.name))
      val complexFields = st.fields.toSeq.filterNot(f => DdbScalarKeys(f.name))
      (scalarFields, complexFields) match {
        case (ss, Nil) => // scalar kinds only → one string value
          coalesce(ss.map(f =>
            ddbBranch(c.getField(f.name), f.name, f.dataType)): _*)
        case (Nil, Seq(one)) => // exactly one complex kind → its collapse
          ddbBranch(c.getField(one.name), one.name, one.dataType)
        case _ => // mixed kinds: collapse branches in place, keep struct
          struct(st.fields.toSeq.map(f =>
            ddbBranch(c.getField(f.name), f.name, f.dataType).as(f.name)): _*)
      }
    case st: StructType => // plain struct (e.g. under M): recurse fields
      struct(st.fields.toSeq.map(f =>
        collapseDdb(c.getField(f.name), f.dataType).as(f.name)): _*)
    case ArrayType(et, _) if containsDdbTyped(et) =>
      transform(c, e => collapseDdb(e, et))
    case _ => c
  }

  private def containsDdbTyped(dt: DataType): Boolean = dt match {
    case st: StructType   =>
      isDdbTyped(st) || st.fields.exists(f => containsDdbTyped(f.dataType))
    case ArrayType(et, _) => containsDdbTyped(et)
    case _                => false
  }
}
