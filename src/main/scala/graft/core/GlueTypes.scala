package graft.core

import org.apache.spark.sql.types._

/** The reference's dynamic type system, re-expressed over Spark types.
  *
  * Ported semantics (not code) from awsglue/gluetypes.py: the atomic
  * registry (gluetypes.py:50-144, 341-355), collection types
  * (ArrayType 151-170, SetType 172-191, value-typed MapType 233-250,
  * StructType/Field 253-329), the tagged-union ChoiceType (194-230),
  * the schema-merge algebra `mergeDataTypes` (395-432 with
  * `_make_choice` 370-388), and the JSON wire format
  * (jsonValue/fromJsonValue, e.g. 37-38, 162-170).
  *
  * Spark mapping (SURVEY §1.3): atomics/collections 1:1;
  * ChoiceType → StructType with one field per branch (exactly one
  * non-null), marked with metadata key [[GlueTypes.ChoiceMeta]];
  * SetType → ArrayType + distinct-on-write; EnumType → StringType;
  * UnknownType → NullType.
  */
sealed trait GType {
  def typeName: String
}

object GType {
  case object GUnknown   extends GType { val typeName = "unknown" }
  case object GNull      extends GType { val typeName = "null" }
  case object GBoolean   extends GType { val typeName = "boolean" }
  case object GByte      extends GType { val typeName = "byte" }
  case object GShort     extends GType { val typeName = "short" }
  case object GInt       extends GType { val typeName = "int" }
  case object GLong      extends GType { val typeName = "long" }
  case object GFloat     extends GType { val typeName = "float" }
  case object GDouble    extends GType { val typeName = "double" }
  case object GString    extends GType { val typeName = "string" }
  case object GBinary    extends GType { val typeName = "binary" }
  case object GDate      extends GType { val typeName = "date" }
  case object GTimestamp extends GType { val typeName = "timestamp" }

  /** Decimal defaults mirror gluetypes.py:76-89. */
  final case class GDecimal(precision: Int = 10, scale: Int = 2) extends GType {
    val typeName = "decimal"
  }

  /** EnumType (gluetypes.py:96-110): string + option set. */
  final case class GEnum(options: Set[String]) extends GType {
    val typeName = "enum"
  }

  final case class GArray(element: GType) extends GType { val typeName = "array" }

  /** SetType (gluetypes.py:172-191): array with distinct elements. */
  final case class GSet(element: GType) extends GType { val typeName = "set" }

  /** MapType is value-typed only; keys are implicitly string
    * (gluetypes.py:233-250).
    */
  final case class GMap(value: GType) extends GType { val typeName = "map" }

  final case class GField(name: String, dataType: GType,
      properties: Map[String, String] = Map.empty)

  final case class GStruct(fields: Seq[GField]) extends GType {
    val typeName = "struct"
    def fieldMap: Map[String, GField] = fields.map(f => f.name -> f).toMap
  }

  /** ChoiceType (gluetypes.py:194-230): tagged union of the types seen
    * at one path. Branch order is canonicalized by typeName so merge is
    * commutative and the struct encoding is stable.
    */
  final case class GChoice private (choices: Seq[GType]) extends GType {
    val typeName = "choice"
  }
  object GChoice {
    def of(ts: Seq[GType]): GType = {
      val flat = ts.flatMap {
        case GChoice(cs) => cs
        case GUnknown | GNull => Nil // absorbed (gluetypes.py:399-404)
        case t => Seq(t)
      }.distinct
      // Same-kind branches merge structurally (struct⊕struct field-wise,
      // array⊕array element-wise, ...) so choice-building is associative
      // regardless of arrival order — only genuinely different kinds
      // stay separate branches.
      val merged = flat.groupBy(kind).values.toSeq
        .map(_.reduceLeft(GlueTypes.merge))
        .sortBy(branchName)
      merged match {
        case Nil      => GNull
        case Seq(one) => one
        case many     => new GChoice(many)
      }
    }

    private def kind(t: GType): String = t match {
      case _: GStruct => "struct"
      case _: GArray  => "array"
      case _: GSet    => "set"
      case _: GMap    => "map"
      case _: GEnum   => "enum"
      case other      => branchName(other) // atomics (incl. each decimal)
    }
  }

  /** Stable branch field name inside the struct encoding. */
  def branchName(t: GType): String = t match {
    case GDecimal(p, s) => s"decimal($p,$s)"
    case other          => other.typeName
  }
}

object GlueTypes {
  import GType._

  /** Metadata key marking a struct column as an encoded ChoiceType. */
  val ChoiceMeta = "glue.choice"

  // ----------------------------------------------------------- merge

  /** mergeDataTypes (gluetypes.py:395-432): Unknown/Null absorb,
    * differing atomics promote to choice, structs merge field-wise,
    * arrays/maps merge element-wise, enums union options, sets merge
    * like arrays. Commutative and associative by construction (choice
    * branches are canonicalized).
    */
  def merge(a: GType, b: GType): GType = (a, b) match {
    case (x, y) if x == y          => x
    case (GUnknown, y)             => y
    case (x, GUnknown)             => x
    case (GNull, y)                => y
    case (x, GNull)                => x
    case (GEnum(o1), GEnum(o2))    => GEnum(o1 ++ o2)
    case (GArray(e1), GArray(e2))  => GArray(merge(e1, e2))
    case (GSet(e1), GSet(e2))      => GSet(merge(e1, e2))
    case (GMap(v1), GMap(v2))      => GMap(merge(v1, v2))
    case (s1: GStruct, s2: GStruct) =>
      val names = (s1.fields.map(_.name) ++
        s2.fields.filterNot(f => s1.fieldMap.contains(f.name)).map(_.name))
      GStruct(names.map { n =>
        (s1.fieldMap.get(n), s2.fieldMap.get(n)) match {
          case (Some(f1), Some(f2)) =>
            GField(n, merge(f1.dataType, f2.dataType),
              f1.properties ++ f2.properties)
          case (Some(f1), None) => f1
          case (None, Some(f2)) => f2
          case _                => throw new IllegalStateException(n)
        }
      })
    case (x, y) => GChoice.of(Seq(x, y)) // _make_choice, gluetypes.py:370-388
  }

  def mergeAll(ts: Seq[GType]): GType = ts.reduceLeft(merge)

  // ---------------------------------------------------- spark mapping

  def toSpark(t: GType): DataType = t match {
    case GUnknown | GNull => NullType
    case GBoolean         => BooleanType
    case GByte            => ByteType
    case GShort           => ShortType
    case GInt             => IntegerType
    case GLong            => LongType
    case GFloat           => FloatType
    case GDouble          => DoubleType
    case GString          => StringType
    case GBinary          => BinaryType
    case GDate            => DateType
    case GTimestamp       => TimestampType
    case GDecimal(p, s)   => DecimalType(p, s)
    case GEnum(_)         => StringType
    case GArray(e)        => ArrayType(toSpark(e))
    case GSet(e)          => ArrayType(toSpark(e))
    case GMap(v)          => MapType(StringType, toSpark(v))
    case GStruct(fs) =>
      StructType(fs.map(f => StructField(f.name, toSpark(f.dataType))))
    case c @ GChoice(branches) =>
      StructType(branches.map(b =>
        StructField(GType.branchName(b), toSpark(b), nullable = true)))
  }

  /** Metadata used on a choice column so downstream ops can recognize
    * the encoding without out-of-band schema.
    */
  val choiceMetadata: Metadata =
    new MetadataBuilder().putBoolean(ChoiceMeta, true).build()

  def isChoiceField(f: StructField): Boolean =
    f.metadata.contains(ChoiceMeta) && f.metadata.getBoolean(ChoiceMeta)

  def fromSpark(dt: DataType): GType = dt match {
    case NullType            => GNull
    case BooleanType         => GBoolean
    case ByteType            => GByte
    case ShortType           => GShort
    case IntegerType         => GInt
    case LongType            => GLong
    case FloatType           => GFloat
    case DoubleType          => GDouble
    case StringType          => GString
    case BinaryType          => GBinary
    case DateType            => GDate
    case _: TimestampType    => GTimestamp
    case d: DecimalType      => GDecimal(d.precision, d.scale)
    case ArrayType(e, _)     => GArray(fromSpark(e))
    case MapType(_, v, _)    => GMap(fromSpark(v))
    case st: StructType      => GStruct(st.fields.toSeq.map(f =>
      GField(f.name, fromSparkField(f))))
    case other => throw new IllegalArgumentException(s"unsupported: $other")
  }

  private def fromSparkField(f: StructField): GType =
    if (isChoiceField(f)) f.dataType match {
      case st: StructType =>
        GChoice.of(st.fields.toSeq.map(b => parseTypeName(b.name)))
      case other => fromSpark(other)
    } else fromSpark(f.dataType)

  /** Parse a branch field name back to its type (inverse of
    * [[GType.branchName]]).
    */
  def parseTypeName(n: String): GType = n match {
    case "boolean"   => GBoolean
    case "byte"      => GByte
    case "short"     => GShort
    case "int"       => GInt
    case "long"      => GLong
    case "float"     => GFloat
    case "double"    => GDouble
    case "string"    => GString
    case "binary"    => GBinary
    case "date"      => GDate
    case "timestamp" => GTimestamp
    case "null"      => GNull
    case "unknown"   => GUnknown
    case dec if dec.startsWith("decimal") =>
      val m = "decimal\\((\\d+),(\\d+)\\)".r
      dec match {
        case m(p, s) => GDecimal(p.toInt, s.toInt)
        case _       => GDecimal()
      }
    case other => throw new IllegalArgumentException(s"unknown type name: $other")
  }

  // ------------------------------------------------------- json wire

  /** JSON wire format mirroring gluetypes.py jsonValue/fromJsonValue
    * ({"dataType": <name>, ...} with element/valueType/fields/choices
    * for the collection types).
    */
  def toJson(t: GType): String = t match {
    case GDecimal(p, s) =>
      s"""{"dataType":"decimal","precision":$p,"scale":$s}"""
    case GEnum(opts) =>
      s"""{"dataType":"enum","options":[${opts.toSeq.sorted
        .map(o => "\"" + o + "\"").mkString(",")}]}"""
    case GArray(e)  => s"""{"dataType":"array","element":${toJson(e)}}"""
    case GSet(e)    => s"""{"dataType":"set","element":${toJson(e)}}"""
    case GMap(v)    => s"""{"dataType":"map","valueType":${toJson(v)}}"""
    case GStruct(fs) =>
      s"""{"dataType":"struct","fields":[${fs.map(f =>
        s"""{"name":"${f.name}","dataType":${toJson(f.dataType)}}""")
        .mkString(",")}]}"""
    case GChoice(cs) =>
      s"""{"dataType":"choice","choices":[${cs.map(toJson).mkString(",")}]}"""
    case atomic => s"""{"dataType":"${atomic.typeName}"}"""
  }

  /** Minimal recursive-descent parse of the wire format; no deps. */
  def fromJson(json: String): GType = JsonTypeParser.parse(json)

  private object JsonTypeParser {
    // Hand-rolled tokenizer/parser for the closed wire grammar above.
    def parse(s: String): GType = new P(s).value()

    private final class P(s: String) {
      private var i = 0
      private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
      private def expect(c: Char): Unit = {
        ws(); require(i < s.length && s(i) == c, s"expected $c at $i in $s"); i += 1
      }
      private def str(): String = {
        ws(); expect('"'); val sb = new StringBuilder
        while (s(i) != '"') { sb += s(i); i += 1 }
        i += 1; sb.result()
      }
      private def num(): Int = {
        ws(); val st = i
        while (i < s.length && (s(i).isDigit || s(i) == '-')) i += 1
        s.substring(st, i).toInt
      }
      def value(): GType = obj()
      private def obj(): GType = {
        expect('{')
        var dataType: String = null
        var precision = 10; var scale = 2
        var element: GType = null; var valueType: GType = null
        var fields = Seq.empty[GField]; var choices = Seq.empty[GType]
        var options = Set.empty[String]
        var first = true
        ws()
        while ({ ws(); s(i) != '}' }) {
          if (!first) expect(','); first = false
          val k = str(); expect(':')
          k match {
            case "dataType"  => dataType = str()
            case "precision" => precision = num()
            case "scale"     => scale = num()
            case "element"   => element = obj()
            case "valueType" => valueType = obj()
            case "options" =>
              expect('['); ws()
              while (s(i) != ']') {
                options += str(); ws(); if (s(i) == ',') i += 1; ws()
              }
              i += 1
            case "choices" =>
              expect('['); ws()
              while (s(i) != ']') {
                choices :+= obj(); ws(); if (s(i) == ',') i += 1; ws()
              }
              i += 1
            case "fields" =>
              expect('['); ws()
              while (s(i) != ']') {
                expect('{')
                var fname: String = null; var ftype: GType = null
                var ffirst = true
                while ({ ws(); s(i) != '}' }) {
                  if (!ffirst) expect(','); ffirst = false
                  val fk = str(); expect(':')
                  fk match {
                    case "name"     => fname = str()
                    case "dataType" => ftype = obj()
                    case _          => sys.error(s"unknown field key $fk")
                  }
                }
                i += 1
                fields :+= GField(fname, ftype)
                ws(); if (s(i) == ',') i += 1; ws()
              }
              i += 1
            case other => sys.error(s"unknown key $other")
          }
        }
        i += 1
        dataType match {
          case "decimal" => GDecimal(precision, scale)
          case "enum"    => GEnum(options)
          case "array"   => GArray(element)
          case "set"     => GSet(element)
          case "map"     => GMap(valueType)
          case "struct"  => GStruct(fields)
          case "choice"  => GChoice.of(choices)
          case atomic    => parseTypeName(atomic)
        }
      }
    }
  }
}
