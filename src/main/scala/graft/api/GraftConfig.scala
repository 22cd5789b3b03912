package graft.api

import java.nio.file.{Files, Path}

/** CLI configuration from `<home>/config.json` — the reference's
  * `wren/src/wren/config.py:1-74`: `strict_mode` gates model-only table
  * references and `denied_functions` (lowercased, case-insensitive match)
  * forbids function names anywhere in a query; both feed
  * [[graft.GraftSession.validatePolicy]] exactly as the reference's engine
  * applies its WrenConfig before execution (`engine.py:175-187`).
  */
final case class GraftConfig(
    strictMode: Boolean = false,
    deniedFunctions: Set[String] = Set.empty) {
  def enforces: Boolean = strictMode || deniedFunctions.nonEmpty
}

object GraftConfig {

  /** Missing file → defaults; present-but-invalid → the reference's
    * deterministic per-field messages (config.py:36-74).
    */
  def load(home: Path): GraftConfig = {
    val path = home.resolve("config.json")
    if (!Files.exists(path)) return GraftConfig()
    import org.json4s._
    val raw =
      try org.json4s.jackson.JsonMethods.parse(
        new String(Files.readAllBytes(path), "UTF-8"))
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"Failed to read $path: ${e.getMessage}") }
    raw match {
      case _: JObject => ()
      case _ => throw new IllegalArgumentException(
        s"$path must contain a JSON object.")
    }
    val strict = raw \ "strict_mode" match {
      case JNothing => false
      case JBool(b) => b
      case _ => throw new IllegalArgumentException(
        s"$path: 'strict_mode' must be a JSON boolean.")
    }
    val denied = raw \ "denied_functions" match {
      case JNothing => Set.empty[String]
      case JArray(xs) =>
        xs.map {
          case JString(s) => s.toLowerCase
          case _ => throw new IllegalArgumentException(
            s"$path: 'denied_functions' must contain only strings.")
        }.toSet
      case _ => throw new IllegalArgumentException(
        s"$path: 'denied_functions' must be a JSON array.")
    }
    GraftConfig(strict, denied)
  }
}
