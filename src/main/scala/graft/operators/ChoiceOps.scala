package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.GlueTypes
import graft.core.GType
import graft.core.GType._

/** ChoiceType machinery (SURVEY §2.3 R1, §1.3).
  *
  * The reference resolves ambiguous column types via
  * resolveChoice(path, action) with actions cast:<type> / project:<type>
  * / make_struct / make_cols (awsglue/dynamicframe.py:394-434;
  * transforms/resolve_choice.py:15-85; ResolveOption
  * dynamicframe.py:31-44). Choices here are encoded as structs with one
  * field per branch (exactly one non-null) and metadata-tagged — which
  * is precisely what Glue's own `make_struct` resolution produces, so
  * the encoding round-trips.
  *
  * All actions are pure Column expressions over the struct (coalesce /
  * getField / flatten): a resolveChoice over 100 TB is a zero-shuffle
  * Project that stays inside whole-stage codegen.
  */
object ChoiceOps {

  /** Build a choice column from typed branch expressions. Exactly one
    * branch should be non-null per row (caller's contract, as in Glue).
    */
  def makeChoice(branches: Seq[Column]): Column = struct(branches: _*)

  /** Attach a choice column `name` built from (typeName → expr). */
  def withChoiceColumn(
      df: DataFrame, name: String,
      branches: Seq[(GType, Column)]): DataFrame = {
    val ordered = branches.sortBy { case (t, _) => GType.branchName(t) }
    val c = struct(ordered.map { case (t, e) => e.as(GType.branchName(t)) }: _*)
    df.withColumn(name, c.as(name, GlueTypes.choiceMetadata))
  }

  /** Choice-typed columns of a frame (by metadata tag). */
  def choiceColumns(df: DataFrame): Seq[String] =
    df.schema.fields.toIndexedSeq.collect {
      case f if GlueTypes.isChoiceField(f) => f.name
    }

  sealed trait Action
  object Action {
    final case class Cast(to: String)    extends Action
    final case class Project(to: String) extends Action
    case object MakeStruct               extends Action
    case object MakeCols                 extends Action

    /** Parse the reference's action strings (resolve_choice.py:15-85). */
    def parse(s: String): Action = s match {
      case "make_struct"                   => MakeStruct
      case "make_cols"                     => MakeCols
      case c if c.startsWith("cast:")      => Cast(c.stripPrefix("cast:"))
      case p if p.startsWith("project:")   => Project(p.stripPrefix("project:"))
      case other => throw new IllegalArgumentException(s"bad action: $other")
    }
  }

  /** resolveChoice with per-path specs; `choice` applies one action to
    * every choice column (the reference's global form, incl.
    * MATCH_CATALOG with database/tableName —
    * resolve_choice.py:15-85, dynamicframe.py:394-434).
    */
  def resolveChoice(
      df: DataFrame,
      specs: Seq[(String, String)] = Nil,
      choice: String = null,
      database: String = null,
      tableName: String = null): DataFrame = {
    if (choice == "MATCH_CATALOG")
      return resolveChoiceMatchCatalog(df, database, tableName)
    val resolved: Seq[(String, Action)] =
      if (specs.nonEmpty) specs.map { case (p, a) => (p, Action.parse(a)) }
      else choiceColumns(df).map(c => (c, Action.parse(choice)))
    resolved.foldLeft(df) { case (acc, (path, action)) =>
      resolveOne(acc, path, action)
    }
  }

  /** MATCH_CATALOG (resolve_choice.py:15-85): resolve every choice
    * column by casting to the type the catalog table declares for it.
    * The catalog is Spark's own (metastore tables and temp views both
    * resolve through spark.table). Choice columns the catalog does not
    * know stay unresolved — the caller can follow up with explicit
    * specs, mirroring Glue's partial-resolution behavior.
    */
  def resolveChoiceMatchCatalog(
      df: DataFrame, database: String, tableName: String): DataFrame = {
    require(tableName != null && tableName.nonEmpty,
      "MATCH_CATALOG requires a table name")
    val qualified =
      if (database == null || database.isEmpty) tableName
      else s"$database.$tableName"
    val catalogSchema = df.sparkSession.table(qualified).schema
    val specs = choiceColumns(df).flatMap { c =>
      catalogSchema.fields.find(_.name.equalsIgnoreCase(c))
        .map(f => c -> s"cast:${f.dataType.simpleString}")
    }
    if (specs.isEmpty) df else resolveChoice(df, specs)
  }

  private def branchFields(df: DataFrame, name: String): Seq[StructField] =
    df.schema.fields.find(_.name == name) match {
      case Some(f) => f.dataType match {
        case st: StructType => st.fields.toSeq
        case _              => Nil
      }
      case None => Nil
    }

  private def resolveOne(df: DataFrame, name: String, action: Action): DataFrame = {
    val branches = branchFields(df, name)
    if (branches.isEmpty) return df // non-choice column: no-op, like Glue
    val c = col(name)
    action match {
      case Action.Cast(to) =>
        val t = FieldOps.glueTypeName(to)
        // cast every branch, first non-null wins (branch order is
        // canonical so this is deterministic)
        df.withColumn(name,
          coalesce(branches.map(b => c.getField(b.name).cast(t)): _*))
      case Action.Project(to) =>
        val want = GType.branchName(GlueTypes.parseTypeName(
          FieldOps.glueTypeName(to) match {
            case "bigint"   => "long"
            case "tinyint"  => "byte"
            case "smallint" => "short"
            case other      => other
          }))
        val hit = branches.find(_.name == want).getOrElse(
          throw new IllegalArgumentException(
            s"project:$to — no branch $want in ${branches.map(_.name)}"))
        df.withColumn(name, c.getField(hit.name))
      case Action.MakeStruct =>
        // already the struct encoding; just strip the choice tag
        df.withColumn(name, c.as(name, Metadata.empty))
      case Action.MakeCols =>
        // col → col_<branch> top-level columns, in place of the choice
        val flat = branches.map(b =>
          c.getField(b.name).as(s"${name}_${typeSuffix(b.name)}"))
        val others = df.columns.toIndexedSeq.flatMap {
          case `name` => flat
          case o      => Seq(col(o))
        }
        df.select(others: _*)
    }
  }

  private def typeSuffix(branchName: String): String =
    branchName.takeWhile(ch => ch != '(') // decimal(10,2) → decimal

  // ------------------------------------------------------------ union

  /** Choice-aware bag union (SURVEY §2.5 A2; dynamicframe.py:463-475).
    * Schemas are merged with the ported mergeDataTypes; where the two
    * sides disagree on a column's type the merged column becomes a
    * choice and each side's values are lifted into their branch. Fields
    * missing on one side become nulls (allowMissingColumns semantics).
    */
  def union(a: DataFrame, b: DataFrame): DataFrame = {
    val ga = GlueTypes.fromSpark(a.schema).asInstanceOf[GStruct]
    val gb = GlueTypes.fromSpark(b.schema).asInstanceOf[GStruct]
    val merged = GlueTypes.merge(ga, gb).asInstanceOf[GStruct]
    coerceTo(a, ga, merged).unionByName(coerceTo(b, gb, merged))
  }

  /** Lift a frame onto the merged schema. */
  private def coerceTo(df: DataFrame, from: GStruct, to: GStruct): DataFrame = {
    val cols = to.fields.map { tf =>
      from.fieldMap.get(tf.name) match {
        case None => lit(null).cast(GlueTypes.toSpark(tf.dataType)).as(tf.name)
        case Some(ff) =>
          coerceValue(col(tf.name), ff.dataType, tf.dataType) match {
            case (c, true) => c.as(tf.name, GlueTypes.choiceMetadata)
            case (c, false) => c.as(tf.name)
          }
      }
    }
    df.select(cols: _*)
  }

  /** Returns (expr, isChoice). */
  private def coerceValue(c: Column, from: GType, to: GType): (Column, Boolean) =
    (from, to) match {
      case (f, t) if f == t => (c, false)
      case (f, ch @ GChoice(branches)) =>
        // lift value into its branch; other branches null
        val fromBranches: Seq[GType] = f match {
          case GChoice(fb) => fb
          case single      => Seq(single)
        }
        val cols = branches.map { b =>
          val bn = GType.branchName(b)
          if (fromBranches.contains(b)) {
            f match {
              case GChoice(_) => c.getField(bn).as(bn)
              case _          => c.as(bn)
            }
          } else lit(null).cast(GlueTypes.toSpark(b)).as(bn)
        }
        (struct(cols: _*), true)
      case (s1: GStruct, s2: GStruct) =>
        val inner = s2.fields.map { tf =>
          s1.fieldMap.get(tf.name) match {
            case None =>
              lit(null).cast(GlueTypes.toSpark(tf.dataType)).as(tf.name)
            case Some(ff) =>
              coerceValue(c.getField(tf.name), ff.dataType, tf.dataType)
                ._1.as(tf.name)
          }
        }
        (struct(inner: _*), false)
      case (GArray(_) | GSet(_), GArray(et)) =>
        (c.cast(ArrayType(GlueTypes.toSpark(et))), false)
      case (_, t) => (c.cast(GlueTypes.toSpark(t)), false)
    }
}
