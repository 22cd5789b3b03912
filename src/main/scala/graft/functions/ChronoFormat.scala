package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ByteType, DayTimeIntervalType, IntegerType, LongType, ShortType, YearMonthIntervalType}
import org.apache.spark.unsafe.types.UTF8String

/** Native (plan-time) implementations of the reference's chrono-format functions.
  *
  * `strftime`/`to_char` in the reference accept a chrono format string
  * (`wren-core/core/src/mdl/function/scalar/to_char.rs:1-83`, delegated to
  * DataFusion's chrono-based formatter). Here the chrono pattern is translated ONCE at
  * analysis time into a Spark datetime pattern and the call collapses to a plain
  * `date_format` — fully codegen'd, zero per-row translation cost. Literal text is
  * single-quoted so arbitrary words in the format cannot be misread as pattern
  * letters (the weakness of the previous replace()-chain SQL gap-fill).
  *
  * `date_bin` matches DataFusion's signature (`date_bin(stride, source, origin)`,
  * chrono-interval strides including whole-month strides) plus the engine's historic
  * bigint-seconds stride. Month strides use calendar arithmetic anchored at the
  * origin's month (DuckDB `time_bucket` / DataFusion month-bin semantics: sub-month
  * origin components are ignored); sub-month strides bin exactly in epoch
  * microseconds with integer arithmetic (no double rounding).
  */
object ChronoFormat {

  /** Translate a chrono strftime pattern into a Spark/Java datetime pattern.
    * Unsupported tokens throw (week-of-year counters and epoch tokens have no Spark
    * datetime-pattern equivalent; computing them is a different function's job).
    */
  def toJavaPattern(fmt: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) {
      out.append('\'').append(lit.toString.replace("'", "''")).append('\'')
      lit.clear()
    }
    def pat(p: String): Unit = {
      flushLit()
      // adjacent tokens must not merge into one longer (invalid) field: chrono's
      // "%b%b" is two separate month names, but "MMM"+"MMM"="MMMMMM" is no field at
      // all — an empty optional section [] is a zero-width separator
      if (out.nonEmpty && out.last.isLetter && p.head.isLetter) out.append("[]")
      out.append(p)
    }

    val simple: Map[Char, String] = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd", 'e' -> "d",
      'a' -> "EEE", 'A' -> "EEEE", 'b' -> "MMM", 'B' -> "MMMM", 'h' -> "MMM",
      'j' -> "DDD", 'H' -> "HH", 'k' -> "H", 'I' -> "hh", 'l' -> "h",
      'p' -> "a", 'P' -> "a", 'M' -> "mm", 'S' -> "ss", 'f' -> "SSSSSSSSS",
      'z' -> "xx", 'Z' -> "zzz",
      'D' -> "MM/dd/yy", 'x' -> "MM/dd/yy", 'F' -> "yyyy-MM-dd",
      'T' -> "HH:mm:ss", 'X' -> "HH:mm:ss", 'R' -> "HH:mm", 'r' -> "hh:mm:ss a",
      'v' -> "d-MMM-yyyy", 'c' -> "EEE MMM d HH:mm:ss yyyy", 'q' -> "Q")
    // %-X / %_X / %0X padding modifiers: Java's single-letter fields are unpadded,
    // which matches the no-pad modifier and is the closest form for the others.
    val unpadded: Map[Char, String] = Map(
      'd' -> "d", 'm' -> "M", 'H' -> "H", 'I' -> "h", 'M' -> "m", 'S' -> "s",
      'j' -> "D", 'e' -> "d", 'k' -> "H", 'l' -> "h")

    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c != '%') { lit.append(c); i += 1 }
      else if (i + 1 >= fmt.length)
        throw new IllegalArgumentException("strftime: trailing '%' in format")
      else fmt.charAt(i + 1) match {
        case '%' => lit.append('%'); i += 2
        case 'n' => lit.append('\n'); i += 2
        case 't' => lit.append('\t'); i += 2
        case ':' if i + 2 < fmt.length && fmt.charAt(i + 2) == 'z' =>
          pat("xxx"); i += 3
        case '.' if i + 3 <= fmt.length && "369".contains(fmt.charAt(i + 2)) &&
            i + 3 < fmt.length && fmt.charAt(i + 3) == 'f' =>
          lit.append('.'); pat("S" * (fmt.charAt(i + 2) - '0')); i += 4
        case '.' if i + 2 < fmt.length && fmt.charAt(i + 2) == 'f' =>
          lit.append('.'); pat("SSSSSS"); i += 3
        case d @ ('3' | '6' | '9') if i + 2 < fmt.length && fmt.charAt(i + 2) == 'f' =>
          pat("S" * (d - '0')); i += 3
        // %-X / %_X drop padding (Java single-letter fields are unpadded; no
        // space-pad form exists, so %_X approximates with unpadded); %0X means
        // zero-padded, which IS the plain token's two-letter pattern.
        case '0' if i + 2 < fmt.length && simple.contains(fmt.charAt(i + 2)) &&
            unpadded.contains(fmt.charAt(i + 2)) =>
          pat(simple(fmt.charAt(i + 2))); i += 3
        case ('-' | '_') if i + 2 < fmt.length && unpadded.contains(fmt.charAt(i + 2)) =>
          pat(unpadded(fmt.charAt(i + 2))); i += 3
        case t if simple.contains(t) => pat(simple(t)); i += 2
        case t =>
          throw new IllegalArgumentException(
            s"strftime: unsupported chrono token %$t (week/epoch counters have no datetime-pattern form)")
      }
    }
    flushLit()
    out.toString
  }

  /** Per-row chrono → Java pattern translation, for non-constant format columns.
    * Interpreted eval (CodegenFallback): translation is string-length work and the
    * per-tenant-format use case is metadata-scale, not fact-table-scale.
    */
  case class ChronoPattern(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.StringType
    override def prettyName: String = "chrono_pattern"
    override def nullSafeEval(fmt: Any): Any =
      UTF8String.fromString(toJavaPattern(fmt.toString))
    override protected def withNewChildInternal(c: Expression): ChronoPattern = copy(c)
  }

  private def constString(e: Expression, what: String): String = {
    require(e.resolved && e.foldable, s"$what must be a constant string")
    e.eval() match {
      case null => null
      case s: UTF8String => s.toString
      case other => other.toString
    }
  }

  /** strftime(t, fmt) / to_char(t, fmt): constant formats translate ONCE at
    * analysis time; a column-valued format falls back to per-row translation
    * through [[ChronoPattern]] (the reference parses chrono formats per row too).
    */
  def strftimeBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2, "strftime(t, fmt) takes exactly 2 arguments")
    val col = Bridge.column(args.head)
    val res =
      if (args(1).resolved && args(1).foldable) {
        val fmt = constString(args(1), "strftime format")
        if (fmt == null) lit(null).cast("string")
        else date_format(col, toJavaPattern(fmt))
      } else Bridge.column(org.apache.spark.sql.catalyst.expressions.DateFormatClass(
        Bridge.toExpression(org.apache.spark.sql.SparkSession.active, col.cast("timestamp")),
        ChronoPattern(args(1))))
    Bridge.toExpression(org.apache.spark.sql.SparkSession.active, res)
  }

  /** date_bin(stride, source, origin). Strides: integral = seconds (engine-historic
    * form), day-time interval = exact micros binning, year-month interval = calendar
    * month binning anchored at `origin`'s month.
    */
  def dateBinBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 3, "date_bin(stride, source, origin) takes exactly 3 arguments")
    val stride = args.head
    val src = Bridge.column(args(1)).cast("timestamp")
    val origin = Bridge.column(args(2)).cast("timestamp")

    // Exact integer floor-to-grid in epoch micros: subtract the positive modulus of
    // the distance from origin (handles sources before the origin correctly).
    def binMicros(strideUs: Column): Column = {
      val s = unix_micros(src)
      val diff = s - unix_micros(origin)
      val off = ((diff % strideUs) + strideUs) % strideUs
      timestamp_micros(s - off)
    }

    def binMonths(m: Int): Column = {
      require(m > 0, "date_bin: month stride must be positive")
      val srcM = date_trunc("MONTH", src)
      val diff = (year(src) * 12 + month(src)) - (year(origin) * 12 + month(origin))
      val off = ((diff % m) + m) % m
      timestamp_add("MONTH", -off, srcM)
    }

    val res =
      if (!stride.resolved) binMicros(Bridge.column(stride).cast("bigint") * lit(1000000L))
      else stride.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          binMicros(Bridge.column(stride).cast("bigint") * lit(1000000L))
        case _: DayTimeIntervalType =>
          require(stride.foldable, "date_bin: interval stride must be a constant")
          val us = stride.eval().asInstanceOf[Long]
          require(us > 0, "date_bin: stride must be positive")
          binMicros(lit(us))
        case _: YearMonthIntervalType =>
          require(stride.foldable, "date_bin: interval stride must be a constant")
          binMonths(stride.eval().asInstanceOf[Int])
        case dt =>
          throw new IllegalArgumentException(
            s"date_bin: unsupported stride type $dt (use an interval or bigint seconds)")
      }
    Bridge.toExpression(org.apache.spark.sql.SparkSession.active, res)
  }
}
