package graft.operators

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro unbox (R5, awsglue/transforms/unbox.py:15-112 lists avro
  * first): decode a binary column of Avro-encoded records into a
  * struct.
  *
  * Built directly on the Apache Avro library (GenericDatumReader over a
  * reused BinaryDecoder per partition) rather than the spark-avro
  * module, which is not part of the core Spark distribution. The
  * decoder is partition-local — schema parsing and reader construction
  * happen once per partition, the per-row work is a single decode with
  * no shuffle, so the operator scales like any other mapPartitions
  * projection.
  */
object AvroUnbox {

  /** Replace binary column `field` with the decoded struct. The schema
    * is the Avro JSON schema (writer schema) — Avro binaries are not
    * self-describing, matching from_avro's contract.
    */
  def unbox(df: DataFrame, field: String, avroSchemaJson: String): DataFrame = {
    val avroSchema = new Schema.Parser().parse(avroSchemaJson)
    val sparkType  = toSparkType(avroSchema)
    val fieldIdx   = df.schema.fieldIndex(field)
    val outSchema  = StructType(df.schema.fields.zipWithIndex.map {
      case (f, `fieldIdx`) => StructField(f.name, sparkType, nullable = true)
      case (f, _)          => f
    })
    df.mapPartitions { rows =>
      val schema  = new Schema.Parser().parse(avroSchemaJson)
      val reader  = new GenericDatumReader[GenericRecord](schema)
      var decoder: org.apache.avro.io.BinaryDecoder = null
      rows.map { row =>
        val vals = row.toSeq.toArray
        vals(fieldIdx) = row.get(fieldIdx) match {
          case null => null
          case b: Array[Byte] =>
            decoder = DecoderFactory.get().binaryDecoder(b, decoder)
            fromAvro(reader.read(null, decoder), schema)
          case other => sys.error(
            s"unbox avro expects a binary column, got ${other.getClass}")
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Avro schema → Spark type. Unions with null unwrap to the nullable
    * branch; multi-branch non-null unions are unsupported (use
    * resolveChoice on a json unbox for choice semantics).
    */
  def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.NULL    => NullType
    case Schema.Type.RECORD  =>
      StructType(s.getFields.asScala.toSeq.map(f =>
        StructField(f.name(), toSparkType(f.schema()), nullable = true)))
    case Schema.Type.ARRAY   => ArrayType(toSparkType(s.getElementType))
    case Schema.Type.MAP     => MapType(StringType, toSparkType(s.getValueType))
    case Schema.Type.UNION   =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      nonNull.toList match {
        case one :: Nil => toSparkType(one)
        case _ => sys.error(
          s"unbox avro: non-nullable union unsupported: $s")
      }
  }

  private def nonNullBranch(s: Schema): Schema = s.getType match {
    case Schema.Type.UNION =>
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    case _ => s
  }

  /** Avro runtime value → Spark external value. */
  def fromAvro(v: Any, schema: Schema): Any = {
    if (v == null) return null
    val s = nonNullBranch(schema)
    s.getType match {
      case Schema.Type.STRING | Schema.Type.ENUM => v.toString
      case Schema.Type.BYTES =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      case Schema.Type.FIXED =>
        v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes().clone()
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(s.getFields.asScala.toSeq.map(f =>
          fromAvro(rec.get(f.pos()), f.schema())))
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(fromAvro(_, s.getElementType))
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, x) => k.toString -> fromAvro(x, s.getValueType)
        }.toMap
      case _ => v // int / long / float / double / boolean
    }
  }
}
