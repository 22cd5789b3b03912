package graft.api

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** `graft profile` CLI — the reference's Typer sub-app
  * (`wren/src/wren/profile_cli.py:12-475`) as one-shot subcommands over
  * [[Profiles]]:
  *
  * {{{
  * runMain graft.api.ProfileCli <cmd> [--home dir] [opts]
  *   list                                    all profiles, active starred
  *   add <name> [--datasource ds] [--from-file f.json|f.yml] [--activate]
  *   rm <name> --force
  *   switch <name>
  *   debug [name]                            masked config as JSON
  * }}}
  *
  * Live connection validation (`_validate_connection`) is a network probe the
  * reference runs post-add; this engine's deployments validate at deploy
  * (PathResolver / JDBC resolution), so add prints the next-step hint only.
  */
object ProfileCli {

  /** Accept the two shapes users/agents actually produce, flat or
    * `{datasource, properties:{…}}`; reject other nested envelopes with the
    * reference's message (profile_cli.py:173-214).
    */
  private[graft] def flattenEnvelope(raw: Map[String, Any]): Map[String, Any] = {
    val flat = raw.get("properties") match {
      case Some(m: Map[_, _]) =>
        m.asInstanceOf[Map[String, Any]] ++ (raw - "properties")
      case _ =>
        // kwargs/settings (driver options) and cloud (the documented
        // local_file object-store credential block) are the legitimate
        // nested shapes; anything else is a guessed envelope
        val unknownNested = raw.collect {
          case (k, _: Map[_, _]) if k != "kwargs" && k != "settings" &&
            k != "cloud" => k
        }.toList
        if (unknownNested.nonEmpty)
          throw new IllegalArgumentException(
            s"Unexpected nested key(s) $unknownNested. Connection fields must " +
              "be flat — see the profiles guide for the supported shapes.")
        raw
    }
    if (!flat.get("datasource").exists(v => v != null && v.toString.nonEmpty))
      throw new IllegalArgumentException("imported file must contain a 'datasource' key.")
    flat
  }

  private def parseFile(path: Path): Map[String, Any] = {
    val text = new String(Files.readAllBytes(path), "UTF-8")
    def fromYamlish(v: Any): Any = v match {
      case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
          .map { case (k, x) => k -> fromYamlish(x) }
      case l: java.util.List[_] => l.asScala.toList.map(fromYamlish)
      case other => other
    }
    fromYamlish(new org.yaml.snakeyaml.Yaml().load[Any](text)) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => throw new IllegalArgumentException(
        s"$path must contain an object/mapping.")
    }
  }

  /** Testable core: returns what main prints. */
  def run(argv: Seq[String]): String = {
    require(argv.nonEmpty, "usage: ProfileCli <list|add|rm|switch|debug> [options]")
    val cmd = argv.head
    val rest = argv.tail
    def opt(name: String): Option[String] = {
      val i = rest.indexOf(s"--$name")
      if (i >= 0 && i + 1 < rest.length) Some(rest(i + 1)) else None
    }
    def flag(name: String): Boolean = rest.contains(s"--$name")
    val valueOpts = Set("home", "datasource", "from-file")
    val positional = rest.zipWithIndex.collect {
      case (a, i) if !a.startsWith("--") &&
        !(i > 0 && rest(i - 1).startsWith("--") &&
          valueOpts(rest(i - 1).stripPrefix("--"))) => a
    }
    val home = opt("home").map(Paths.get(_)).getOrElse(Profiles.defaultHome)
    val store = new Profiles(home)

    cmd match {
      case "list" =>
        val profiles = store.listProfiles()
        if (profiles.isEmpty)
          "No profiles configured. Run `graft profile add` to create one."
        else {
          val active = store.activeName()
          profiles.map { case (name, conf) =>
            val marker = if (active.contains(name)) " *" else ""
            val ds = conf.getOrElse("datasource", "?")
            s"  $name$marker  ($ds)"
          }.mkString("\n")
        }

      case "add" =>
        val name = positional.headOption.getOrElse(
          throw new IllegalArgumentException("usage: add <name> [options]"))
        val (profile, minimal) = opt("from-file") match {
          case Some(f) =>
            val p = Paths.get(f)
            require(Files.exists(p), s"file not found: $p")
            (flattenEnvelope(parseFile(p)), false)
          case None =>
            val ds = opt("datasource").getOrElse(throw new IllegalArgumentException(
              "Error: --datasource is required (or use --from-file)."))
            (Map[String, Any]("datasource" -> ds), true)
        }
        store.add(name, profile, activate = flag("activate"))
        val hint = if (minimal)
          s"Created minimal profile '$name' with datasource=${profile("datasource")}. " +
            s"Edit $home/profiles.yml to add connection fields.\n"
        else ""
        hint + s"Profile '$name' added.\n\nNext: graft context init"

      case "rm" =>
        val name = positional.headOption.getOrElse(
          throw new IllegalArgumentException("usage: rm <name> --force"))
        require(flag("force"), "rm requires --force (non-interactive CLI)")
        if (store.remove(name)) s"Profile '$name' removed."
        else throw new IllegalArgumentException(s"Error: profile '$name' not found.")

      case "switch" =>
        val name = positional.headOption.getOrElse(
          throw new IllegalArgumentException("usage: switch <name>"))
        if (store.switch(name)) s"Active profile: $name"
        else throw new IllegalArgumentException(s"Error: profile '$name' not found.")

      case "debug" =>
        val info = store.debug(positional.headOption)
        info.get("error").foreach(e =>
          throw new IllegalArgumentException(s"Error: $e"))
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        def toJ(v: Any): JValue = v match {
          case null => JNull
          case s: String => JString(s)
          case b: Boolean => JBool(b)
          case i: Int => JInt(BigInt(i))
          case l: Long => JInt(BigInt(l))
          case d: Double => JDouble(d)
          case m: Map[_, _] => JObject(m.toList.map { case (k, x) =>
            k.toString -> toJ(x) })
          case s: Seq[_] => JArray(s.toList.map(toJ))
          case other => JString(other.toString)
        }
        JsonMethods.pretty(JsonMethods.render(toJ(info)))

      case other => throw new IllegalArgumentException(s"unknown command: $other")
    }
  }

  def main(args: Array[String]): Unit = println(run(args.toSeq))
}
