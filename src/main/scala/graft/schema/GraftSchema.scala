package graft.schema

import org.apache.spark.sql.types._
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import scala.jdk.CollectionConverters._

/** A field with a stable integer id, mirroring Iceberg's id-based column
  * resolution (reference `Main.java:43-60`: every field declared with an
  * explicit id; schema evolution at `Main.java:440-443` resolves by id, not
  * name). Spark's Parquet reader resolves by name, so evolved reads go
  * through an explicit per-epoch projection (see `graft.read.MorReader`).
  */
final case class GraftField(id: Int, name: String, dataType: DataType,
                            initialDefault: Option[String] = None)

/** Versioned schema for a Graft table.
  *
  * All reference fields are `required` (`Main.java:43-60`), but the Spark
  * representation is all-nullable: schema evolution adds columns that are
  * null for pre-existing files, and Spark does not enforce nullability on
  * Parquet read anyway.
  */
final case class GraftSchema(fields: Seq[GraftField], lastColumnId: Int = 0) {

  def struct: StructType =
    StructType(fields.map(f => StructField(f.name, f.dataType, nullable = true)))

  def fieldId(name: String): Int =
    fields.find(_.name == name).getOrElse(sys.error(s"no field $name")).id

  def fieldById(id: Int): Option[GraftField] = fields.find(_.id == id)

  def names: Seq[String] = fields.map(_.name)

  private def maxId: Int = if (fields.isEmpty) 0 else fields.map(_.id).max

  /** Highest field id ever assigned — ids of dropped columns are NEVER
    * reused (Iceberg's lastColumnId invariant): a reused id would make the
    * by-id epoch projection resurrect the dropped column's old data under
    * the new column's name. */
  private def highWater: Int = math.max(lastColumnId, maxId)

  /** Add a column with a fresh field id (ref `UpdateSchema.addColumn`,
    * `Main.java:441`). `default` is an Iceberg-v3 INITIAL DEFAULT
    * (canonical string, cast to the column type at read): rows written
    * BEFORE the column existed read it instead of null — pure metadata,
    * no file is rewritten. Files written after the add carry real values,
    * so a later null is a real null (exactly Iceberg's initial-default /
    * write-default split with only the initial half needed here: the
    * writer always materializes the column on append). */
  def addColumn(name: String, dataType: DataType,
                default: Option[String] = None): GraftSchema = {
    require(!fields.exists(_.name == name), s"field $name already exists")
    GraftSchema(fields :+ GraftField(highWater + 1, name, dataType, default),
      highWater + 1)
  }

  /** Drop a column by name (ref `UpdateSchema.deleteColumn`, `Main.java:442`);
    * the id stays retired forever via `lastColumnId`. */
  def deleteColumn(name: String): GraftSchema = {
    require(fields.exists(_.name == name), s"no field $name")
    GraftSchema(fields.filterNot(_.name == name), highWater)
  }

  /** Rename a column IN PLACE — the field id is the identity (Iceberg
    * `UpdateSchema.renameColumn`): files written under the old name keep
    * resolving through the by-id epoch projection, so a rename is pure
    * metadata. */
  def renameColumn(oldName: String, newName: String): GraftSchema = {
    require(fields.exists(_.name == oldName), s"no field $oldName")
    require(!fields.exists(_.name == newName), s"field $newName already exists")
    GraftSchema(fields.map(f =>
      if (f.name == oldName) f.copy(name = newName) else f), highWater)
  }

  /** Projection of named fields, keeping ids (ref `Schema.select`, `Main.java:411`). */
  def select(names: String*): GraftSchema =
    GraftSchema(names.map(n => fields.find(_.name == n).getOrElse(sys.error(s"no field $n"))),
      highWater)

  def toJson: String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("lastColumnId", highWater)
    val arr = root.putArray("fields")
    fields.foreach { f =>
      val o = arr.addObject()
      o.put("id", f.id)
      o.put("name", f.name)
      o.put("type", f.dataType.json)
      f.initialDefault.foreach(o.put("default", _))
    }
    m.writeValueAsString(root)
  }
}

object GraftSchema {
  def fromJson(json: String): GraftSchema = {
    val m = new ObjectMapper()
    val root = m.readTree(json)
    val fields = root.get("fields").elements().asScala.map { n =>
      val o = n.asInstanceOf[ObjectNode]
      GraftField(o.get("id").asInt, o.get("name").asText,
        DataType.fromJson(o.get("type").asText),
        Option(o.get("default")).map(_.asText))
    }.toSeq
    val last = Option(root.get("lastColumnId")).map(_.asInt).getOrElse(0)
    GraftSchema(fields, last)
  }

  /** Convenience: build from (name, type) pairs with ids 1..n (reference style). */
  def of(fields: (String, DataType)*): GraftSchema =
    GraftSchema(fields.zipWithIndex.map { case ((n, t), i) => GraftField(i + 1, n, t) })
}
