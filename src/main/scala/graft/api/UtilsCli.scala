package graft.api

import java.nio.file.{Files, Paths}

import graft.mdl.TypeNormalize

/** `graft utils` CLI — the reference's utilities sub-app
  * (`wren/src/wren/utils_cli.py:1-62`):
  *
  * {{{
  * runMain graft.api.UtilsCli parse-type  --type <raw> --dialect <d>
  * runMain graft.api.UtilsCli parse-types --dialect <d> [--type-field f] [--input file.json]
  * }}}
  *
  * `parse-types` reads a JSON array of column objects (stdin or `--input`)
  * and writes the same array with a normalized `"type"` added per object.
  */
object UtilsCli {

  /** Testable core: returns what main prints; `stdin` supplies the batch
    * input when no `--input` file is given.
    */
  def run(argv: Seq[String], stdin: => String = ""): String = {
    require(argv.nonEmpty, "usage: UtilsCli <parse-type|parse-types> [options]")
    def opt(name: String): Option[String] = {
      val i = argv.indexOf(s"--$name")
      if (i >= 0 && i + 1 < argv.length) Some(argv(i + 1)) else None
    }
    val dialect = opt("dialect").getOrElse(
      throw new IllegalArgumentException("--dialect is required"))

    argv.head match {
      case "parse-type" =>
        val t = opt("type").getOrElse(
          throw new IllegalArgumentException("--type is required"))
        TypeNormalize.parseType(t, dialect)

      case "parse-types" =>
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        val text = opt("input") match {
          case Some(f) =>
            val p = Paths.get(f)
            require(Files.exists(p), s"Error: file not found: $f")
            new String(Files.readAllBytes(p), "UTF-8")
          case None => stdin
        }
        val parsed =
          try JsonMethods.parse(text)
          catch { case e: Exception =>
            throw new IllegalArgumentException(s"Error: invalid JSON input: ${e.getMessage}") }
        val cols = parsed match {
          case JArray(xs) => xs.map {
            case JObject(fields) => fields.toMap.map {
              case (k, JString(s)) => k -> (s: Any)
              case (k, JInt(i)) => k -> (i: Any)
              case (k, JBool(b)) => k -> (b: Any)
              case (k, v) => k -> (JsonMethods.compact(v): Any)
            }
            case _ => throw new IllegalArgumentException(
              "Error: invalid JSON input: expected an array of objects")
          }
          case _ => throw new IllegalArgumentException(
            "Error: invalid JSON input: expected an array of objects")
        }
        val results = TypeNormalize.parseTypes(
          cols, dialect, typeField = opt("type-field").getOrElse("raw_type"))
        JsonMethods.pretty(JsonMethods.render(JArray(results.toList.map(m =>
          JObject(m.toList.map { case (k, v) => k -> (v match {
            case s: String => JString(s): JValue
            case i: BigInt => JInt(i): JValue
            case b: Boolean => JBool(b): JValue
            case other => JString(other.toString): JValue
          })})))))

      case other => throw new IllegalArgumentException(s"unknown command: $other")
    }
  }

  def main(args: Array[String]): Unit =
    println(run(args.toSeq,
      new String(System.in.readAllBytes(), "UTF-8")))
}
