package graft.api

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The profile store, secret expansion, .env layering, config loader, and
  * profile CLI — reference parity with `wren/src/wren/profile.py`,
  * `config.py`, `profile_cli.py` and the pins in
  * `wren/tests/unit/test_profile_env_expansion.py` / `test_config.py`.
  */
class ProfilesSpec extends AnyFunSuite {

  private def newHome = Files.createTempDirectory("graft_profiles_")

  test("add/list/switch/remove lifecycle with active re-pointing") {
    val store = new Profiles(newHome)
    assert(store.listProfiles().isEmpty && store.activeName().isEmpty)
    // first add activates even without the flag (profile.py:219-220)
    store.add("dev", Map("datasource" -> "local_file", "url" -> "/data"))
    assert(store.activeName().contains("dev"))
    store.add("prod", Map("datasource" -> "trino", "host" -> "t.internal"))
    assert(store.activeName().contains("dev"), "second add must not steal active")
    store.add("prod2", Map("datasource" -> "trino"), activate = true)
    assert(store.activeName().contains("prod2"))
    assert(store.switch("prod") && store.activeName().contains("prod"))
    assert(!store.switch("nope"))
    // removing the active one re-points to the first remaining
    assert(store.remove("prod"))
    assert(store.activeName().contains("dev"))
    assert(!store.remove("prod"), "second removal reports not-found")
    assert(store.listProfiles().keySet == Set("dev", "prod2"))
    // round-trips through real YAML on disk
    val (name, conf) = store.activeProfile()
    assert(name.contains("dev") && conf("url") == "/data")
  }

  test("malformed profiles.yml raises the reference's deterministic messages") {
    val home = newHome
    Files.write(home.resolve("profiles.yml"), "- just\n- a list\n".getBytes("UTF-8"))
    val e1 = intercept[IllegalArgumentException] { new Profiles(home).listProfiles() }
    assert(e1.getMessage.contains("must contain a YAML mapping; got list"))
    Files.write(home.resolve("profiles.yml"), "active: 7\nprofiles: {}\n".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] { new Profiles(home).activeName() }
    assert(e2.getMessage.contains("'active' must be a string or null; got int"))
    Files.write(home.resolve("profiles.yml"), "profiles: nope\n".getBytes("UTF-8"))
    val e3 = intercept[IllegalArgumentException] { new Profiles(home).listProfiles() }
    assert(e3.getMessage.contains("'profiles' must be a mapping; got str"))
    // a non-mapping profile BODY raises too — it must not silently coerce to
    // an empty profile that fails later as a missing datasource
    Files.write(home.resolve("profiles.yml"),
      "active: dev\nprofiles:\n  dev: just-a-string\n".getBytes("UTF-8"))
    val e4 = intercept[IllegalArgumentException] { new Profiles(home).listProfiles() }
    assert(e4.getMessage.contains("profile 'dev' must be a mapping; got str"))
    assert(e4.getMessage.contains("Fix or remove"))
    Files.write(home.resolve("profiles.yml"),
      "profiles:\n  dev:\n    - a\n    - b\n".getBytes("UTF-8"))
    val e5 = intercept[IllegalArgumentException] { new Profiles(home).listProfiles() }
    assert(e5.getMessage.contains("profile 'dev' must be a mapping; got list"))
    // empty file → empty structure, not an error
    Files.write(home.resolve("profiles.yml"), "".getBytes("UTF-8"))
    assert(new Profiles(home).listProfiles().isEmpty)
  }

  test("secret expansion: the reference's parametrized pins") {
    val env = Map("PG_PASSWORD" -> "s3cr3t", "USER_NAME" -> "paul",
      "HOST_NAME" -> "db.local", "X" -> "v", "foo" -> "x")
    import Profiles.expandString
    assert(expandString("plain-text", env) == "plain-text")
    assert(expandString("${PG_PASSWORD}", env) == "s3cr3t")
    assert(expandString("postgres://${USER_NAME}@${HOST_NAME}/x", env)
      == "postgres://paul@db.local/x")
    assert(expandString("a$$b", env) == "a$b")
    assert(expandString("$${literal}-${X}", env) == "${literal}-v")
    val missing = intercept[MissingSecretError] { expandString("${NOT_SET}", env) }
    assert(missing.getMessage.contains("NOT_SET"))
    // lowercase/digit refs are MALFORMED, not left alone (string.Template)
    intercept[MissingSecretError] { expandString("pw${foo}x", env) }
    intercept[MissingSecretError] { expandString("pw$1x", env) }
    intercept[MissingSecretError] { expandString("lone$ end", env) }
  }

  test("expansion walks nested dicts and lists, preserving non-strings") {
    val home = newHome
    val store = new Profiles(home)
    Files.write(home.resolve(".env"), "PG_PW=hunter2\n".getBytes("UTF-8"))
    val profile = Map[String, Any](
      "datasource" -> "mysql", "port" -> 5432, "ssl" -> true,
      "kwargs" -> Map("password" -> "${PG_PW}", "ssl_disabled" -> "true"),
      "tags" -> Seq("${PG_PW}", "b"))
    val out = store.expandSecrets(profile, cwd = home)
    assert(out("kwargs").asInstanceOf[Map[String, Any]]("password") == "hunter2")
    assert(out("port") == 5432 && out("ssl") == true)
    assert(out("tags") == Seq("hunter2", "b"))
  }

  test(".env layering: cwd wins over project root wins over home; real env wins over all") {
    val home = newHome
    val proj = Files.createTempDirectory("graft_proj_")
    val sub = Files.createDirectories(proj.resolve("a/b"))
    Files.write(proj.resolve("wren_project.yml"), "catalog: g\n".getBytes("UTF-8"))
    Files.write(proj.resolve(".env"), "K1=proj\nK2=proj\n".getBytes("UTF-8"))
    Files.write(sub.resolve(".env"), "K1=cwd\n".getBytes("UTF-8"))
    Files.write(home.resolve(".env"),
      "K1=home\nK2=home\nK3=home\nPATH=stolen\n".getBytes("UTF-8"))
    val env = Profiles.layeredEnv(sub, home)
    assert(env("K1") == "cwd" && env("K2") == "proj" && env("K3") == "home")
    assert(env("PATH") == sys.env("PATH"), "the real environment always wins")
    // dotenv syntax: export prefix, quotes, comments
    val parsed = Profiles.parseDotenv(
      "# comment\nexport A=1\nB=\"two words\"\nC='x'\n\nnoequals\n")
    assert(parsed == Map("A" -> "1", "B" -> "two words", "C" -> "x"))
  }

  test("nested kwargs survive the DISK round-trip: loaded profiles expand and dispatch") {
    // regression: snakeyaml yields java collections; a shallow conversion
    // left nested kwargs unexpanded and Connections.kwargs dropped them
    val home = newHome
    val store = new Profiles(home)
    Files.write(home.resolve(".env"), "SF_PW=hunter2\n".getBytes("UTF-8"))
    store.add("sf", Map[String, Any](
      "datasource" -> "snowflake", "account" -> "a", "user" -> "u",
      "database" -> "d", "schema" -> "s", "password" -> "x",
      "kwargs" -> Map("sfRole" -> "${SF_PW}", "tags" -> Seq("t1", "t2"))))
    // a FRESH store re-reads from disk (java collections from snakeyaml)
    val loaded = new Profiles(home).listProfiles()("sf")
    val expanded = new Profiles(home).expandSecrets(loaded, cwd = home)
    val kw = expanded("kwargs").asInstanceOf[Map[String, Any]]
    assert(kw("sfRole") == "hunter2", "nested ${VAR} must expand after a disk load")
    assert(kw("tags") == List("t1", "t2"))
    val conn = graft.planner.Connections.connectionInfo(expanded)
    val graft.planner.Dsv2Shape(_, opts, _) = conn.shape: @unchecked
    assert(opts("sfRole") == "hunter2", "kwargs must reach the connector options")
  }

  test("debug masks sensitive fields and never resolves references") {
    val store = new Profiles(newHome)
    store.add("p", Map("datasource" -> "snowflake", "user" -> "analyst",
      "password" -> "${SF_PW}", "awsSecretAccessKey" -> "raw",
      "serverHostname" -> "h"))
    val info = store.debug(None)
    val cfg = info("config").asInstanceOf[Map[String, Any]]
    assert(cfg("password") == "***" && cfg("awsSecretAccessKey") == "***")
    assert(cfg("serverHostname") == "***", "hostname is in the sensitive set")
    assert(cfg("user") == "analyst" && cfg("datasource") == "snowflake")
    assert(info("active") == true)
    assert(store.debug(Some("nope")) == Map("error" -> "profile 'nope' not found"))
    assert(new Profiles(newHome).debug(None) == Map("error" -> "no active profile"))
  }

  test("resolveConnection: explicit flags beat the active profile") {
    val store = new Profiles(newHome)
    store.add("p", Map("datasource" -> "trino", "host" -> "t", "port" -> 8080))
    assert(store.resolveConnection(Some("duckdb")) == ((Some("duckdb"), Map.empty)))
    val (ds, conn) = store.resolveConnection(None)
    assert(ds.contains("trino") && conn == Map("host" -> "t", "port" -> 8080))
    assert(new Profiles(newHome).resolveConnection(None) == ((None, Map.empty)))
  }

  test("config.json loader: defaults, fields, and the reference's messages") {
    val home = newHome
    assert(GraftConfig.load(home) == GraftConfig() && !GraftConfig.load(home).enforces)
    Files.write(home.resolve("config.json"),
      """{"strict_mode": true, "denied_functions": ["Java_Method", "reflect"]}"""
        .getBytes("UTF-8"))
    val c = GraftConfig.load(home)
    assert(c.strictMode && c.deniedFunctions == Set("java_method", "reflect") && c.enforces)
    Files.write(home.resolve("config.json"), """{"strict_mode": "yes"}""".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException] { GraftConfig.load(home) }
      .getMessage.contains("'strict_mode' must be a JSON boolean"))
    Files.write(home.resolve("config.json"), """{"denied_functions": [1]}""".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException] { GraftConfig.load(home) }
      .getMessage.contains("must contain only strings"))
    Files.write(home.resolve("config.json"), """"nope"""".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException] { GraftConfig.load(home) }
      .getMessage.contains("must contain a JSON object"))
  }

  test("profile CLI: list/add/rm/switch/debug round-trip with reference messages") {
    val home = newHome.toString
    def cli(args: String*): String = ProfileCli.run(args.toSeq ++ Seq("--home", home))
    assert(cli("list").startsWith("No profiles configured."))
    val added = cli("add", "dev", "--datasource", "local_file")
    assert(added.contains("Created minimal profile 'dev' with datasource=local_file"))
    assert(added.contains("Profile 'dev' added.") && added.contains("Next: graft context init"))
    // --from-file with the legacy properties envelope flattens
    val f = Files.createTempFile("graft_prof_", ".json")
    Files.write(f, """{"datasource": "trino", "properties": {"host": "t", "port": 8080}}"""
      .getBytes("UTF-8"))
    assert(cli("add", "prod", "--from-file", f.toString, "--activate")
      .contains("Profile 'prod' added."))
    val listed = cli("list")
    assert(listed.contains("  dev  (local_file)") && listed.contains("  prod *  (trino)"))
    assert(cli("switch", "dev") == "Active profile: dev")
    assert(cli("debug", "prod").contains("\"host\" : \"t\""))
    assert(intercept[IllegalArgumentException] { cli("switch", "nope") }
      .getMessage.contains("profile 'nope' not found"))
    assert(cli("rm", "prod", "--force") == "Profile 'prod' removed.")
    assert(intercept[IllegalArgumentException] { cli("rm", "prod", "--force") }
      .getMessage.contains("not found"))
    // envelope rejection: unknown nested keys get the reference's message
    val bad = Files.createTempFile("graft_prof_", ".json")
    Files.write(bad, """{"datasource": "x", "connection": {"host": "h"}}""".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException] { cli("add", "b", "--from-file", bad.toString) }
      .getMessage.contains("Unexpected nested key(s)"))
    val noDs = Files.createTempFile("graft_prof_", ".json")
    Files.write(noDs, """{"host": "h"}""".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException] { cli("add", "c", "--from-file", noDs.toString) }
      .getMessage.contains("must contain a 'datasource' key"))
  }
}
