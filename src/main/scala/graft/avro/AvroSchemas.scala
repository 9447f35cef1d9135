package graft.avro

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

/** AVRO schema subsystem: JSON parsing + the reference's validation rules +
  * the AVRO → Spark type matrix.
  *
  * Validation mirrors the reference loader
  * (reference: internal/pipeline/schema.go:153-194): a schema must have a
  * name and a type in {record, array, map}; record schemas need at least
  * one field; field names must be present and unique. The filename →
  * canonical key heuristic mirrors schema.go:197-216.
  *
  * The type matrix follows the reference's tested mapper
  * (reference: internal/generator/generator.go:527-589,
  * generator_types_test.go:6-46) re-targeted at Spark types — with the
  * documented improvements from SURVEY.md §1.2: nested records map to
  * native StructType and arrays keep their element type (the reference
  * degrades both to STRING because FlinkSQL DDL generation kept it
  * simple); unions pick the first non-null branch and mark the field
  * nullable; unknown primitive names degrade to string exactly like the
  * reference's default branch.
  */
object AvroSchemas {

  final case class AvroField(name: String, typeNode: JsonNode, doc: Option[String])
  final case class AvroSchema(name: String, namespace: Option[String], schemaType: String,
                              content: String, fields: Seq[AvroField]) {
    def structType: StructType = toStructType(this)
  }

  private val mapper = new ObjectMapper()

  /** Parse + validate a schema document (reference rules). */
  def parse(json: String): AvroSchema = {
    val node =
      try mapper.readTree(json)
      catch { case e: Exception => fail(s"invalid JSON syntax: ${e.getMessage}") }
    if (node == null || !node.isObject) fail("schema must be a JSON object")
    val name = text(node, "name").getOrElse(fail("schema must have a name"))
    val typ = text(node, "type").getOrElse(fail("schema must have a type"))
    if (!Set("record", "array", "map").contains(typ))
      fail(s"unsupported schema type: $typ")
    val fields =
      if (typ == "record") {
        val fs = Option(node.get("fields")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
        if (fs.isEmpty) fail("record schema must have fields")
        val out = fs.map { f =>
          val fn = text(f, "name").getOrElse(fail("field must have a name"))
          AvroField(fn, f.get("type"), text(f, "doc"))
        }
        val dups = out.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
        if (dups.nonEmpty) fail(s"duplicate field name: ${dups.head}")
        out
      } else Seq.empty
    AvroSchema(name, text(node, "namespace"), typ, json, fields)
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def text(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filter(_.isTextual).map(_.asText()).filter(_.nonEmpty)

  /** Record schema → StructType (top level must be a record). */
  def toStructType(s: AvroSchema): StructType = {
    if (s.schemaType != "record") fail(s"top-level schema must be a record, got ${s.schemaType}")
    StructType(s.fields.map { f =>
      val (dt, nullable, meta) = toDataType(f.typeNode)
      val md = new MetadataBuilder().withMetadata(meta)
      f.doc.foreach(d => md.putString("doc", d))
      StructField(f.name, dt, nullable, md.build())
    })
  }

  /** AVRO type term → (Spark type, nullable, metadata). The metadata keeps
    * the original logical type so wire-format encode can reverse the
    * mapping (millis vs micros). */
  def toDataType(t: JsonNode): (DataType, Boolean, Metadata) = t match {
    case null => (StringType, true, Metadata.empty)
    case n if n.isTextual => (primitive(n.asText()), false, Metadata.empty)
    case n if n.isArray => // union: first non-null branch, nullable
      val branches = n.elements().asScala.toSeq
      val nonNull = branches.find(b => !(b.isTextual && b.asText() == "null"))
      nonNull match {
        case Some(b) =>
          val (dt, _, meta) = toDataType(b)
          (dt, true, meta)
        case None => (StringType, true, Metadata.empty)
      }
    case n if n.isObject =>
      Option(n.get("logicalType")).filter(_.isTextual).map(_.asText()) match {
        case Some("date") => (DateType, false, Metadata.empty)
        case Some(lt @ ("timestamp-millis" | "timestamp-micros")) =>
          (TimestampType, false, logicalMeta(lt))
        case Some(lt @ ("time-millis" | "time-micros")) =>
          // no Spark TIME type: long + metadata (SURVEY.md §1.2)
          (LongType, false, logicalMeta(lt))
        case _ =>
          Option(n.get("type")).filter(_.isTextual).map(_.asText()) match {
            case Some("record") =>
              val fields = Option(n.get("fields")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
              val st = StructType(fields.map { f =>
                val fn = text(f, "name").getOrElse(fail("field must have a name"))
                val (dt, nl, meta) = toDataType(f.get("type"))
                StructField(fn, dt, nl, meta)
              })
              (st, false, Metadata.empty)
            case Some("array") =>
              val (et, en, _) = toDataType(n.get("items"))
              (ArrayType(et, containsNull = en), false, Metadata.empty)
            case Some("map") =>
              val (vt, vn, _) = toDataType(n.get("values"))
              (MapType(StringType, vt, valueContainsNull = vn), false, Metadata.empty)
            case Some("enum") => (StringType, false, Metadata.empty)
            case Some(other) => (primitive(other), false, Metadata.empty)
            case None => (StringType, false, Metadata.empty)
          }
      }
    case _ => (StringType, true, Metadata.empty)
  }

  private def logicalMeta(lt: String): Metadata =
    new MetadataBuilder().putString("avro.logicalType", lt).build()

  private def primitive(name: String): DataType = name match {
    case "string"  => StringType
    case "int"     => IntegerType
    case "long"    => LongType
    case "float"   => FloatType
    case "double"  => DoubleType
    case "boolean" => BooleanType
    case "bytes"   => BinaryType
    case _         => StringType // reference default branch (generator.go:545-546)
  }

  /** StructType → AVRO record schema JSON (registry round trip / sink DDL).
    * Nested record names derive from the FIELD PATH — a constant suffix
    * would emit duplicate record names for any schema with two nested
    * structs, which Schema.Parser rejects ("Can't redefine"). */
  def fromStructType(name: String, namespace: String, st: StructType): String = {
    def typeJson(dt: DataType, nullable: Boolean, path: String = ""): Any = {
      val base: Any = dt match {
        case StringType  => "string"
        case IntegerType => "int"
        case LongType    => "long"
        case FloatType   => "float"
        case DoubleType  => "double"
        case BooleanType => "boolean"
        case BinaryType  => "bytes"
        case DateType    => Map("type" -> "int", "logicalType" -> "date").asJava
        case TimestampType => Map("type" -> "long", "logicalType" -> "timestamp-micros").asJava
        case ArrayType(et, cn) =>
          Map("type" -> "array", "items" -> typeJson(et, cn, s"${path}_item")).asJava
        case MapType(StringType, vt, vn) =>
          Map("type" -> "map", "values" -> typeJson(vt, vn, s"${path}_value")).asJava
        case nested: StructType =>
          Map("type" -> "record", "name" -> s"${name}${path}_nested",
            "fields" -> nested.fields.map(f =>
              Map("name" -> f.name,
                "type" -> typeJson(f.dataType, f.nullable, s"${path}_${f.name}")).asJava)
              .toList.asJava).asJava
        case other => fail(s"unsupported Spark type for AVRO emission: ${other.catalogString}")
      }
      if (nullable) List("null", base).asJava else base
    }
    val doc = Map(
      "type" -> "record", "name" -> name, "namespace" -> namespace,
      "fields" -> st.fields.map(f =>
        Map("name" -> f.name, "type" -> typeJson(f.dataType, f.nullable, s"_${f.name}")).asJava)
        .toList.asJava
    ).asJava
    mapper.writeValueAsString(doc)
  }

  /** Filename → canonical schema key (reference schema.go:197-216). */
  def schemaKey(filename: String): String = {
    var key = filename
    key = key.stripSuffix(".avsc").stripSuffix(".json")
    key = key.toLowerCase.replace("_", "").replace("-", "")
    if (key.contains("input") || key.contains("event")) "input"
    else if (key.contains("output") || key.contains("result")) "output"
    else key
  }

  /** Load every .avsc/.json schema in a directory, keyed by the filename
    * heuristic (reference schema.go:41-87). */
  def loadDirectory(dir: java.nio.file.Path): Map[String, AvroSchema] = {
    if (!java.nio.file.Files.isDirectory(dir))
      fail(s"schemas directory not found: $dir")
    val listing = java.nio.file.Files.list(dir) // must be closed
    val files =
      try listing.iterator().asScala
        .filter(p => p.toString.endsWith(".avsc") || p.toString.endsWith(".json"))
        .toSeq.sortBy(_.getFileName.toString)
      finally listing.close()
    files.map { p =>
      val content = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      schemaKey(p.getFileName.toString) -> parse(content)
    }.toMap
  }
}

/** Minimal in-memory Schema Registry with Confluent get-or-create
  * semantics (reference: producer.go:49-82 get-or-create on
  * `<topic>-value`; consumer.go:302-321 fetch-latest; HTTP registration
  * docker/deployer.go:239-342). Offline stand-in: the id-assignment and
  * subject/version behavior match, the HTTP hop does not exist. */
final class InMemorySchemaRegistry extends SchemaRegistry {
  private val lock = new Object
  private var nextId = 1
  private var byId = Map.empty[Int, String]
  private var subjects = Map.empty[String, List[Int]] // newest first

  /** Get-or-create: identical schema under the same subject reuses its id. */
  def register(subject: String, schemaJson: String): Int = lock.synchronized {
    val versions = subjects.getOrElse(subject, Nil)
    versions.find(id => byId(id) == schemaJson) match {
      case Some(id) => id
      case None =>
        val id = nextId
        nextId += 1
        byId += id -> schemaJson
        subjects += subject -> (id :: versions)
        id
    }
  }

  def getById(id: Int): Option[String] = lock.synchronized(byId.get(id))

  def latest(subject: String): Option[(Int, String)] = lock.synchronized {
    subjects.get(subject).flatMap(_.headOption).map(id => id -> byId(id))
  }

  def subjectsList: Seq[String] = lock.synchronized(subjects.keys.toSeq.sorted)

  /** Number of registered versions under a subject (the REST facade's
    * `version` field for /versions/latest). */
  def versionCount(subject: String): Int =
    lock.synchronized(subjects.getOrElse(subject, Nil).size)
}
