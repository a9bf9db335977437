package graft.operators

/** Transform registry + describe metadata (SURVEY §2.9 C5).
  *
  * The reference registers its 22 transforms in
  * awsglue/transforms/__init__.py:30-47 (`ALL_TRANSFORMS`,
  * `get_transform`, `describe_transform`) with self-describing metadata
  * on each class (transform.py:13-91: name / describeArgs /
  * describeReturn / describeTransform). This is the same reflection
  * surface as a plain Scala value registry: name → metadata + the
  * implementing function's location in this library.
  */
object TransformRegistry {

  final case class ArgInfo(
      name: String,
      argType: String,
      description: String,
      optional: Boolean = false,
      defaultValue: Option[String] = None)

  final case class TransformInfo(
      name: String,
      description: String,
      args: Seq[ArgInfo],
      returns: String,
      location: String) {

    /** describe() (transform.py:76-83) as a stable JSON string. */
    def describe: String = {
      def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      val argJson = args.map { a =>
        s"""{"name": ${q(a.name)}, "type": ${q(a.argType)}, "description": ${q(a.description)}, """ +
        s""""optional": ${a.optional}, "defaultValue": ${a.defaultValue.fold("null")(q)}}"""
      }.mkString("[", ", ", "]")
      s"""{"transform": {"name": ${q(name)}, "args": $argJson, """ +
      s""""returns": ${q(returns)}, "description": ${q(description)}, """ +
      s""""location": ${q(location)}}}"""
    }
  }

  private def frameArg = ArgInfo("frame", "GraftFrame", "frame to transform")
  private def pathsArg = ArgInfo("paths", "Seq[String]", "field paths")

  /** The reference's ALL_TRANSFORMS set (transforms/__init__.py:30-33),
    * each pointing at its implementation in this library.
    */
  val all: Seq[TransformInfo] = Seq(
    TransformInfo("ApplyMapping",
      "project + rename + cast in one pass; nested targets reassembled",
      Seq(frameArg, ArgInfo("mappings", "Seq[Mapping]",
        "(sourcePath, sourceType, targetPath, targetType) tuples")),
      "GraftFrame", "graft.operators.FieldOps.applyMapping"),
    TransformInfo("Coalesce",
      "reduce partition count, optionally with a shuffle",
      Seq(frameArg, ArgInfo("numPartitions", "Int", "target partitions"),
        ArgInfo("shuffle", "Boolean", "repartition instead of narrow coalesce",
          optional = true, defaultValue = Some("false"))),
      "GraftFrame", "graft.operators.PhysicalOps.coalesce"),
    TransformInfo("DropFields",
      "drop the given (possibly nested) field paths",
      Seq(frameArg, pathsArg),
      "GraftFrame", "graft.operators.FieldOps.dropFields"),
    TransformInfo("DropNullFields",
      "drop every NullType leaf found by schema walk (arrays recursed)",
      Seq(frameArg),
      "GraftFrame", "graft.operators.FieldOps.dropNullFields"),
    TransformInfo("ErrorsAsDynamicFrame",
      "expose the frame's error channel as a frame",
      Seq(frameArg),
      "GraftFrame", "graft.core.GlueFrame.errorsAsFrame"),
    TransformInfo("Filter",
      "keep records matching a predicate; lookup failures drop the row, " +
        "other exceptions divert it to the error channel",
      Seq(frameArg, ArgInfo("f", "Row => Boolean", "predicate")),
      "GraftFrame", "graft.core.GlueFrame.filterRecords"),
    TransformInfo("FlatMap",
      "apply a transform to every member of a collection, flatten results",
      Seq(ArgInfo("dfc", "Map[String, GraftFrame]", "frame collection"),
        ArgInfo("f", "GraftFrame => Seq[GraftFrame]", "member transform")),
      "Map[String, GraftFrame]", "graft.core.GlueFrameCollection.flatMap"),
    TransformInfo("Join",
      "multi-key equality inner join of two frames",
      Seq(ArgInfo("frame1", "GraftFrame", "left frame"),
        ArgInfo("keys1", "Seq[String]", "left join keys"),
        ArgInfo("frame2", "GraftFrame", "right frame"),
        ArgInfo("keys2", "Seq[String]", "right join keys")),
      "GraftFrame", "graft.operators.Joins.equiJoin"),
    TransformInfo("Map",
      "apply a function to every record; exceptions divert the record " +
        "to the error channel with its message",
      Seq(frameArg, ArgInfo("f", "Row => Row", "record transform")),
      "GraftFrame", "graft.core.GlueFrame.mapRecords"),
    TransformInfo("MapToCollection",
      "apply a transform to every member of a collection",
      Seq(ArgInfo("dfc", "Map[String, GraftFrame]", "frame collection"),
        ArgInfo("f", "GraftFrame => GraftFrame", "member transform")),
      "Map[String, GraftFrame]", "graft.core.GlueFrameCollection.map"),
    TransformInfo("Relationalize",
      "decompose nested frame into flat root + per-array child tables " +
        "linked by generated keys",
      Seq(frameArg, ArgInfo("name", "String", "root table name"),
        ArgInfo("stagingPath", "String", "optional spill path",
          optional = true, defaultValue = Some("in-memory"))),
      "Map[String, GraftFrame]", "graft.operators.NestedOps.relationalize"),
    TransformInfo("RenameField",
      "rename a (possibly nested) field",
      Seq(frameArg, ArgInfo("oldName", "String", "source path"),
        ArgInfo("newName", "String", "target path")),
      "GraftFrame", "graft.operators.FieldOps.renameField"),
    TransformInfo("Repartition",
      "repartition to the given partition count",
      Seq(frameArg, ArgInfo("numPartitions", "Int", "target partitions")),
      "GraftFrame", "graft.operators.PhysicalOps.repartition"),
    TransformInfo("ResolveChoice",
      "resolve choice-typed columns: cast / project / make_struct / " +
        "make_cols per path, or one global action incl. MATCH_CATALOG",
      Seq(frameArg,
        ArgInfo("specs", "Seq[(String, String)]", "(path, action) pairs",
          optional = true),
        ArgInfo("choice", "String", "global action", optional = true),
        ArgInfo("database", "String", "MATCH_CATALOG database", optional = true),
        ArgInfo("tableName", "String", "MATCH_CATALOG table", optional = true)),
      "GraftFrame", "graft.operators.ChoiceOps.resolveChoice"),
    TransformInfo("SelectFields",
      "keep only the given (possibly nested) field paths",
      Seq(frameArg, pathsArg),
      "GraftFrame", "graft.operators.FieldOps.selectFields"),
    TransformInfo("SelectFromCollection",
      "pick one member frame by key; missing key yields an empty frame",
      Seq(ArgInfo("dfc", "Map[String, GraftFrame]", "frame collection"),
        ArgInfo("key", "String", "member name")),
      "GraftFrame", "graft.core.GlueFrameCollection.select"),
    TransformInfo("Spigot",
      "tee a bounded sample of records to a path without altering the flow",
      Seq(frameArg, ArgInfo("path", "String", "side-write path"),
        ArgInfo("topk", "Int", "max records", optional = true,
          defaultValue = Some("100")),
        ArgInfo("prob", "Double", "sampling probability", optional = true,
          defaultValue = Some("1.0"))),
      "GraftFrame", "graft.sources.Sinks.spigot"),
    TransformInfo("SplitFields",
      "split the column set into (selected, remaining) frames",
      Seq(frameArg, pathsArg),
      "Map[String, GraftFrame]", "graft.operators.FieldOps.splitFields"),
    TransformInfo("SplitRows",
      "split rows into (matching, non-matching) by a comparator spec",
      Seq(frameArg, ArgInfo("comparisonDict", "Map[String, Map[String, Any]]",
        "column → (op → literal), ops in {=, >, <, >=, <=}")),
      "Map[String, GraftFrame]", "graft.operators.FieldOps.splitRows"),
    TransformInfo("Unbox",
      "parse a string/binary column as json / csv / avro into a struct",
      Seq(frameArg, ArgInfo("path", "String", "column to parse"),
        ArgInfo("format", "String", "json | csv | avro"),
        ArgInfo("options", "Map[String, String]",
          "withSchema / separator / withHeader / sampleRatio",
          optional = true)),
      "GraftFrame", "graft.operators.NestedOps.unbox"),
    TransformInfo("UnnestFrame",
      "flatten nested structs to top level with dotted names",
      Seq(frameArg),
      "GraftFrame", "graft.operators.NestedOps.unnest"),
    TransformInfo("Union",
      "bag union of two frames; mismatched column types merge to choices",
      Seq(ArgInfo("frame1", "GraftFrame", "first frame"),
        ArgInfo("frame2", "GraftFrame", "second frame")),
      "GraftFrame", "graft.operators.ChoiceOps.union"))

  private val byName: Map[String, TransformInfo] =
    all.map(t => t.name.toLowerCase -> t).toMap

  /** get_transform (__init__.py:40-42): case-insensitive lookup. */
  def getTransform(name: String): Option[TransformInfo] =
    byName.get(name.toLowerCase)

  /** describe_transform (__init__.py:44-47): JSON description, empty
    * object for unknown names.
    */
  def describeTransform(name: String): String =
    getTransform(name).fold("{}")(_.describe)

  def names: Seq[String] = all.map(_.name)
}
