package graft.api

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.PosixFilePermissions

import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

/** Raised when a profile references an env var that isn't set
  * (`wren/src/wren/profile.py:36-38`).
  */
final class MissingSecretError(msg: String) extends IllegalArgumentException(msg)

/** Connection-profile store — the reference's profile management
  * (`wren/src/wren/profile.py:1-308`): named profiles in
  * `~/.graft/profiles.yml` (`{active: name, profiles: {name: {…}}}`), with
  * `${VAR}` secret references resolved at CONNECTION time only — the stored
  * YAML keeps the placeholders, so `profile debug` never prints a secret.
  *
  * Faithful behaviors:
  *  - `${VAR}` names are UPPER_SNAKE_CASE only; `$$` escapes to `$`, and ANY
  *    other `$`-sequence (lowercase `${foo}`, `$1`, a stray `$`) raises a
  *    malformed-reference error — string.Template's exact behavior, pinned
  *    by the reference's tests (a literal `$` in a password must be written
  *    `$$`);
  *  - `.env` discovery layers under the real environment, never over it:
  *    `$CWD/.env` → the project root's (`wren_project.yml` walk-up) → the
  *    home dir's, first match per key wins (profile.py:43-91);
  *  - writes are atomic (temp file + move) with owner-only permissions
  *    (profile.py:184-200);
  *  - malformed `profiles.yml` raises the reference's deterministic
  *    "Fix or remove …" messages instead of failing deep in a library
  *    (profile.py:145-180).
  */
final class Profiles(home: Path = Profiles.defaultHome) {

  private val file: Path = home.resolve("profiles.yml")

  private type Raw = Map[String, Any]

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(s"$msg\nFix or remove $file and try again.")

  private def loadRaw(): Raw = {
    if (!Files.exists(file)) return Map("active" -> null, "profiles" -> Map.empty)
    val text = new String(Files.readAllBytes(file), "UTF-8")
    val parsed =
      try new org.yaml.snakeyaml.Yaml().load[Any](text)
      catch { case e: org.yaml.snakeyaml.error.YAMLException =>
        bad(s"profiles.yml is not valid YAML: ${e.getMessage}") }
    parsed match {
      case null => Map("active" -> null, "profiles" -> Map.empty)
      case m: java.util.Map[_, _] =>
        val data = m.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
        data.getOrElse("profiles", new java.util.LinkedHashMap[String, Any]()) match {
          case _: java.util.Map[_, _] => ()
          case other => bad(
            s"profiles.yml: 'profiles' must be a mapping; got ${Profiles.typeName(other)}.")
        }
        data.getOrElse("active", null) match {
          case null | _: String => ()
          case other => bad(
            s"profiles.yml: 'active' must be a string or null; got ${Profiles.typeName(other)}.")
        }
        data
      case other =>
        bad(s"profiles.yml must contain a YAML mapping; got ${Profiles.typeName(other)}.")
    }
  }

  private def profilesOf(data: Raw): scala.collection.mutable.LinkedHashMap[String, Raw] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Raw]
    data.get("profiles").collect { case m: java.util.Map[_, _] =>
      m.asInstanceOf[java.util.Map[String, Any]].asScala.foreach {
        case (k, v: java.util.Map[_, _]) =>
          // DEEP conversion: snakeyaml yields nested java collections, and
          // everything downstream (expandSecrets' ${VAR} walk,
          // Connections.kwargs) pattern-matches on SCALA maps/seqs — a
          // shallow toMap left nested kwargs unexpanded and silently dropped
          out(k) = Profiles.fromJava(v).asInstanceOf[Raw]
        case (k, other) => bad(
          s"profiles.yml: profile '$k' must be a mapping; got ${Profiles.typeName(other)}.")
      }
    }
    out
  }

  /** Atomic write with owner-only permissions (0600 where POSIX applies). */
  private def saveRaw(active: Option[String],
      profiles: scala.collection.Map[String, Raw]): Unit = {
    Files.createDirectories(home)
    val doc = new java.util.LinkedHashMap[String, Any]()
    doc.put("active", active.orNull)
    val ps = new java.util.LinkedHashMap[String, Any]()
    profiles.foreach { case (k, v) => ps.put(k, Profiles.toJava(v)) }
    doc.put("profiles", ps)
    val opts = new org.yaml.snakeyaml.DumperOptions()
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    val payload = new org.yaml.snakeyaml.Yaml(opts).dump(doc)
    val tmp = Files.createTempFile(home, ".profiles", ".yml.tmp")
    try {
      try Files.setPosixFilePermissions(tmp, PosixFilePermissions.fromString("rw-------"))
      catch { case _: UnsupportedOperationException => () } // non-POSIX fs
      Files.write(tmp, payload.getBytes("UTF-8"))
      Files.move(tmp, file, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    } catch { case e: Throwable => Files.deleteIfExists(tmp); throw e }
    try Files.setPosixFilePermissions(file, PosixFilePermissions.fromString("rw-------"))
    catch { case _: UnsupportedOperationException => () }
  }

  def listProfiles(): Map[String, Map[String, Any]] = profilesOf(loadRaw()).toMap

  def activeName(): Option[String] =
    loadRaw().get("active").collect { case s: String => s }

  /** (name, profile) of the active profile; (None, empty) when none set. */
  def activeProfile(): (Option[String], Map[String, Any]) = {
    val data = loadRaw()
    val name = data.get("active").collect { case s: String => s }
    (name, name.flatMap(profilesOf(data).get).getOrElse(Map.empty))
  }

  /** Add or overwrite; activates when asked OR when nothing is active yet. */
  def add(name: String, profile: Map[String, Any], activate: Boolean = false): Unit = {
    val data = loadRaw()
    val ps = profilesOf(data)
    ps(name) = profile
    val active = data.get("active").collect { case s: String => s }
    saveRaw(if (activate || active.isEmpty) Some(name) else active, ps)
  }

  /** Remove; re-points active to the first remaining profile (or none).
    * False when the name wasn't present.
    */
  def remove(name: String): Boolean = {
    val data = loadRaw()
    val ps = profilesOf(data)
    if (!ps.contains(name)) return false
    ps.remove(name)
    val active = data.get("active").collect { case s: String => s } match {
      case Some(`name`) => ps.keys.headOption
      case other => other
    }
    saveRaw(active, ps)
    true
  }

  /** False when the name isn't present. */
  def switch(name: String): Boolean = {
    val data = loadRaw()
    val ps = profilesOf(data)
    if (!ps.contains(name)) false
    else { saveRaw(Some(name), ps); true }
  }

  /** Diagnostic view with sensitive fields masked (profile.py:270-308) —
    * safe to print; never resolves `${VAR}` references.
    */
  def debug(name: Option[String] = None): Map[String, Any] = {
    val target = name.orElse(activeName()) match {
      case None => return Map("error" -> "no active profile")
      case Some(n) => n
    }
    profilesOf(loadRaw()).get(target) match {
      case None => Map("error" -> s"profile '$target' not found")
      case Some(p) =>
        val masked = p.map { case (k, v) =>
          k -> (if (Profiles.Sensitive.exists(k.toLowerCase.contains)) "***" else v)
        }
        Map("name" -> target, "active" -> activeName().contains(target),
          "config" -> masked)
    }
  }

  /** Explicit flags beat the active profile (profile.py:247-267). */
  def resolveConnection(
      explicitDatasource: Option[String],
      explicitConnInfo: Option[String] = None,
      explicitConnFile: Option[String] = None): (Option[String], Map[String, Any]) =
    if (explicitDatasource.isDefined || explicitConnInfo.isDefined ||
      explicitConnFile.isDefined) (explicitDatasource, Map.empty)
    else {
      val (_, profile) = activeProfile()
      if (profile.isEmpty) (None, Map.empty)
      else (profile.get("datasource").map(_.toString), profile - "datasource")
    }

  /** Resolve `${VAR}` references at connection time, environment layered over
    * the discovered `.env` files (profile.py:122-142).
    */
  def expandSecrets(profile: Map[String, Any],
      cwd: Path = Paths.get(".").toAbsolutePath.normalize()): Map[String, Any] = {
    val env = Profiles.layeredEnv(cwd, home)
    Profiles.expandObj(profile, env).asInstanceOf[Map[String, Any]]
  }
}

object Profiles {

  /** `-Dgraft.home` (tests/embedding) > `GRAFT_HOME` > `~/.graft` — the
    * reference's WREN_HOME precedence (profile.py:20).
    */
  def defaultHome: Path = sys.props.get("graft.home").map(Paths.get(_))
    .orElse(sys.env.get("GRAFT_HOME").map(Paths.get(_)))
    .getOrElse(Paths.get(System.getProperty("user.home"), ".graft"))

  private[api] def typeName(v: Any): String = v match {
    case null => "NoneType"
    case _: String => "str"
    case _: java.lang.Boolean => "bool"
    case _: java.lang.Integer | _: java.lang.Long => "int"
    case _: java.util.List[_] => "list"
    case _: java.util.Map[_, _] => "dict"
    case other => other.getClass.getSimpleName
  }

  private[graft] def toJava(v: Any): Any = v match {
    case m: Map[_, _] =>
      val out = new java.util.LinkedHashMap[String, Any]()
      m.foreach { case (k, x) => out.put(k.toString, toJava(x)) }
      out
    case s: Seq[_] => s.map(toJava).asJava
    case other => other
  }

  /** Deep java→scala collection conversion (inverse of [[toJava]]) — what
    * every snakeyaml-loaded structure passes through before the scala-side
    * pattern matches see it.
    */
  private[graft] def fromJava(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
        .map { case (k, x) => k -> fromJava(x) }
    case l: java.util.List[_] => l.asScala.toList.map(fromJava)
    case other => other
  }

  /** Sensitive key substrings masked by [[Profiles.debug]] (profile.py:283-299). */
  val Sensitive: Set[String] = Set(
    "password", "credentials", "secret", "token", "private_key", "access_key",
    "key_id", "client_id", "bucket", "endpoint", "staging_dir", "hostname",
    "http_path", "role_arn")

  // ── ${VAR} expansion (profile.py:29-41, 99-141) ──────────────────────────

  /** `$$` → `$`; `${UPPER_SNAKE}` / `$UPPER_SNAKE` resolve from env; ANY
    * other `$`-sequence (lowercase name, digit, stray `$`) is MALFORMED and
    * raises — string.Template's exact behavior, pinned by the reference's
    * test_profile_env_expansion.py: `${foo}` raises a "malformed reference"
    * MissingSecretError, it is not left alone.
    */
  private val Ref: Regex =
    raw"\$$(\$$|\{[_A-Z][_A-Z0-9]*\}|[_A-Z][_A-Z0-9]*|)".r

  def expandString(value: String, env: Map[String, String]): String =
    Ref.replaceAllIn(value, m => m.group(1) match {
      case "$" => Regex.quoteReplacement("$")
      case "" => throw new MissingSecretError(
        s"Malformed reference in profile value ${value}: invalid placeholder " +
          s"at index ${m.start}")
      case body =>
        val name = if (body.startsWith("{")) body.substring(1, body.length - 1) else body
        env.get(name) match {
          case Some(v) => Regex.quoteReplacement(v)
          case None => throw new MissingSecretError(
            s"Profile references $${$name} but it is not set in the " +
              "environment or any discovered .env file.")
        }
    })

  private[api] def expandObj(obj: Any, env: Map[String, String]): Any = obj match {
    case s: String => expandString(s, env)
    case m: Map[_, _] => m.map { case (k, v) => k -> expandObj(v, env) }
    case s: Seq[_] => s.map(expandObj(_, env))
    case other => other
  }

  // ── .env discovery (profile.py:43-91) ────────────────────────────────────

  /** Minimal dotenv parser: `KEY=value` lines, `export ` prefix tolerated,
    * single/double quotes stripped, `#` comments and blanks skipped.
    */
  private[api] def parseDotenv(text: String): Map[String, String] =
    text.linesIterator.flatMap { line0 =>
      val line = line0.trim.stripPrefix("export ").trim
      if (line.isEmpty || line.startsWith("#") || !line.contains("=")) None
      else {
        val Array(k, v) = line.split("=", 2)
        val raw = v.trim
        val unq =
          if (raw.length >= 2 && ((raw.head == '"' && raw.last == '"') ||
            (raw.head == '\'' && raw.last == '\''))) raw.substring(1, raw.length - 1)
          else raw
        Some(k.trim -> unq)
      }
    }.toMap

  /** Real environment wins; then `cwd/.env`, the project root's `.env`
    * (walk up to the first `wren_project.yml` or `graft_project.yml`), the
    * home dir's — first file to define a key wins among the files.
    */
  def layeredEnv(cwd: Path, home: Path): Map[String, String] = {
    val candidates = scala.collection.mutable.ListBuffer.empty[Path]
    val local = cwd.resolve(".env")
    if (Files.exists(local)) candidates += local
    var p: Path = cwd
    var found = false
    while (p != null && !found) {
      if (Files.exists(p.resolve("wren_project.yml")) ||
        Files.exists(p.resolve("graft_project.yml"))) {
        found = true
        val pe = p.resolve(".env")
        if (Files.exists(pe) && !candidates.contains(pe)) candidates += pe
      } else p = p.getParent
    }
    val he = home.resolve(".env")
    if (Files.exists(he) && !candidates.contains(he)) candidates += he
    val fromFiles = candidates.foldLeft(Map.empty[String, String]) { (acc, f) =>
      // earlier files win per key (load_dotenv override=False semantics)
      parseDotenv(new String(Files.readAllBytes(f), "UTF-8")) ++ acc
    }
    fromFiles ++ sys.env // the real environment always wins
  }
}
