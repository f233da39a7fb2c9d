package graft.model

import org.apache.spark.sql.types._

/** Config-driven schema construction (SURVEY.md §1.2).
  *
  * The reference's table layouts are not hard-coded: table names, canonical
  * column names, and the subject-attribute list come from a runtime config
  * (reference `conf/config.yaml`, loaded at `script/utils.py:42-51`, column
  * types eval'd at `w4h_db_utils.py:35`). The five supported attribute types
  * are exactly int/float/string/datetime/boolean (`conf/config.yaml:29`).
  *
  * Engine equivalents: [[AttrType]] enumerates the closed type set (no
  * `eval`); [[GeomtsConfig]] carries the canonical names; builders produce
  * `StructType`s for the subjects, series, and geo tables.
  */
object ConfigSchema {

  sealed abstract class AttrType(val name: String, val spark: DataType)
  case object IntAttr extends AttrType("int", LongType) // LongType: 100 TB-safe ids/counters
  case object FloatAttr extends AttrType("float", DoubleType)
  case object StringAttr extends AttrType("string", StringType)
  case object DatetimeAttr extends AttrType("datetime", TimestampType)
  case object BooleanAttr extends AttrType("boolean", BooleanType)

  val AllTypes: Seq[AttrType] = Seq(IntAttr, FloatAttr, StringAttr, DatetimeAttr, BooleanAttr)

  def attrType(name: String): AttrType =
    AllTypes.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"Unsupported attribute type '$name' (supported: ${AllTypes.map(_.name).mkString(", ")})"))

  final case class AttributeDef(name: String, tpe: AttrType, nullable: Boolean = true)

  /** Canonical-name configuration (reference `conf/config.yaml:2-5`). */
  final case class GeomtsConfig(
      userCol: String = "user_id",
      tsCol: String = "timestamp",
      valueCol: String = "value",
      subjectsTable: String = "geomts_users",
      featureTables: Seq[String] =
        Seq("heart_rates", "calories", "distances", "steps", "sleep", "weight"),
      geoTables: Seq[String] = Seq("locations"),
      subjectAttributes: Seq[AttributeDef] = Seq(
        AttributeDef("age", IntAttr),
        AttributeDef("height", FloatAttr),
        AttributeDef("state_of_residence", StringAttr),
        AttributeDef("data_collection_start_date", DatetimeAttr),
        AttributeDef("consent", BooleanAttr),
        AttributeDef("weight", FloatAttr))) {

    /** Subjects table: user_id PK + configured attributes. */
    def subjectsSchema: StructType =
      StructType(
        StructField(userCol, StringType, nullable = false) +:
          subjectAttributes.map(a => StructField(a.name, a.tpe.spark, a.nullable)))

    /** Long-format series table (`w4h_db_utils.py:40-45`). */
    def seriesSchema: StructType = StructType(Seq(
      StructField(userCol, StringType, nullable = false),
      StructField(tsCol, TimestampType, nullable = false),
      StructField(valueCol, DoubleType)))

    /** Geo trajectory table: value is struct(lon, lat) (SURVEY.md §2.9 G1). */
    def geoSchema: StructType = StructType(Seq(
      StructField(userCol, StringType, nullable = false),
      StructField(tsCol, TimestampType, nullable = false),
      StructField(valueCol, StructType(Seq(
        StructField("lon", DoubleType), StructField("lat", DoubleType))))))
  }
}
