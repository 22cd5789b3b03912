package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Result JSON formatting (A18): the reference renders Arrow results to JSON with
  * per-type formatting — bytes as hex, timestamps rendered in the session timezone,
  * floats as doubles — implemented by running a formatting SQL over the result
  * (`ibis-server/app/util.py:122-142`). Same idea here: one `select` of formatting
  * expressions (stays in codegen), then `toJSON`.
  */
object ResultFormatter {

  private def formatCol(f: StructField): Column = {
    val c = col(s"`${f.name}`")
    f.dataType match {
      case BinaryType => lower(hex(c)).alias(f.name)
      case TimestampType | TimestampNTZType =>
        date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(f.name)
      case DateType => date_format(c, "yyyy-MM-dd").alias(f.name)
      case _: DecimalType => c.cast(StringType).alias(f.name) // exact text, no float drift
      case FloatType => c.cast(DoubleType).alias(f.name)
      case CalendarIntervalType | _: DayTimeIntervalType | _: YearMonthIntervalType =>
        c.cast(StringType).alias(f.name)
      case _ => c
    }
  }

  /** The formatted DataFrame (each row JSON-ready). */
  def formatted(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map(formatCol).toSeq: _*)

  /** `{"columns": [...], "dtypes": {...}, "data": [[...], ...]}` like the reference's
    * query response (`ibis-server/app/routers/v3/connector.py:70-247` response shape).
    */
  def toJsonResponse(df: DataFrame, limit: Int = 1000): String = {
    val fdf = formatted(df.limit(limit))
    val cols = df.schema.fields.map(f => s""""${f.name}"""").mkString("[", ",", "]")
    val dtypes = df.schema.fields
      .map(f => s""""${f.name}":"${f.dataType.simpleString}"""").mkString("{", ",", "}")
    val rows = fdf.toJSON.collect().mkString("[", ",", "]")
    s"""{"columns":$cols,"dtypes":$dtypes,"data":$rows}"""
  }
}
