package graft.api

import java.nio.file.{Files, Path}

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz over the profile store's DISK round-trip (round-12 stretch
  * ask #8): random nested profiles — unicode names, nested kwargs/cloud
  * maps, lists, `$$`/`${VAR}`/bare-`$VAR` references, malformed refs — are
  * written through snakeyaml to profiles.yml, re-loaded by a FRESH store,
  * expanded against a generated `.env`, and (for file profiles) dispatched
  * through `Connections.fromProfile`.
  *
  * This holds shut exactly the regression class the round-12 review caught
  * by hand: snakeyaml loads yield NESTED java.util collections, and any
  * scala `case m: Map[_,_]` downstream silently misses them unless the load
  * deep-converts — a bug invisible to specs that only exercise in-memory
  * scala Maps. Every seed here goes through real YAML bytes on disk.
  *
  * 60 seeds: ~48 well-formed (deep equality + exact expansion + dispatch),
  * ~12 with an injected malformed reference (must raise MissingSecretError
  * with the reference's message, `wren/src/wren/profile.py:29-41`).
  */
class ProfilesFuzzSpec extends AnyFunSuite {

  private val literalPool = Vector(
    "data", "naïve", "東京", "Ωmega", "x-y_z", "42", "tail.", "π≈3",
    "under_score", "mid dle", "éclair", "züri")

  /** One generated string value: the raw stored text and its expected
    * expansion (None when a malformed segment was injected).
    */
  private final case class GenString(raw: String, expected: Option[String])

  private def genString(rnd: Random, env: Map[String, String],
      malformed: Boolean): GenString = {
    val segs = 1 + rnd.nextInt(4)
    val sb = new StringBuilder
    val exp = new StringBuilder
    for (_ <- 0 until segs) rnd.nextInt(4) match {
      case 0 => // literal
        val lit = literalPool(rnd.nextInt(literalPool.size))
        sb ++= lit; exp ++= lit
      case 1 => // escaped dollar
        sb ++= "$$"; exp += '$'
      case 2 => // braced reference
        val (k, v) = env.toSeq(rnd.nextInt(env.size))
        sb ++= s"$${$k}"; exp ++= v
      case 3 => // bare reference, followed by a non-name char so it can't glom
        val (k, v) = env.toSeq(rnd.nextInt(env.size))
        sb ++= s"$$$k."; exp ++= v; exp += '.'
    }
    if (malformed) {
      val bad = Seq("${foo}", "$1", "$", "$ x")(rnd.nextInt(4))
      sb ++= bad
      GenString(sb.toString, None)
    } else GenString(sb.toString, Some(exp.toString))
  }

  /** Random nested value; collects expected expansion alongside. Returns
    * (stored, expectedExpanded) — expectedExpanded None if any nested string
    * was malformed.
    */
  private def genValue(rnd: Random, env: Map[String, String], depth: Int,
      malformed: Boolean): (Any, Option[Any]) = rnd.nextInt(if (depth > 0) 6 else 4) match {
    case 0 =>
      val g = genString(rnd, env, malformed && rnd.nextBoolean())
      (g.raw, g.expected)
    case 1 => val n = rnd.nextInt(100000); (n, Some(n))
    case 2 => val b = rnd.nextBoolean(); (b, Some(b))
    case 3 =>
      val g = genString(rnd, env, malformed = false)
      (g.raw, g.expected)
    case 4 => // list
      val kids = (0 to rnd.nextInt(2)).map(_ => genValue(rnd, env, depth - 1, malformed))
      (kids.map(_._1).toList,
        if (kids.forall(_._2.isDefined)) Some(kids.map(_._2.get).toList) else None)
    case 5 => // nested map (kwargs/cloud shape)
      val keys = Seq("kwargs", "cloud", "opts", "innerø").distinct
        .take(1 + rnd.nextInt(2))
      val kids = keys.map(k => k -> genValue(rnd, env, depth - 1, malformed))
      (kids.map { case (k, (v, _)) => k -> v }.toMap,
        if (kids.forall(_._2._2.isDefined))
          Some(kids.map { case (k, (_, e)) => k -> e.get }.toMap)
        else None)
  }

  private def seedOnce(seed: Int): Unit = {
    val rnd = new Random(seed)
    val home: Path = Files.createTempDirectory(s"graft_pfuzz_$seed")
    // generated env vars land in home/.env (layeredEnv reads it); names are
    // namespaced so the real environment can never shadow them
    val env = (1 to 1 + rnd.nextInt(3)).map { i =>
      s"GRAFT_FUZZ_${seed}_V$i" -> literalPool(rnd.nextInt(literalPool.size))
    }.toMap
    Files.write(home.resolve(".env"),
      env.map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n").getBytes("UTF-8"))

    val malformedSeed = seed % 5 == 0
    val name = Seq("dev", "prod-2", "café", "北京_db", "p rofile")(rnd.nextInt(5)) +
      s"_$seed"
    val nKeys = 1 + rnd.nextInt(4)
    val body = (1 to nKeys).map { i =>
      val (v, e) = genValue(rnd, env, depth = 2,
        malformed = malformedSeed && i == 1)
      (s"k$i", v, e)
    }
    val stored: Map[String, Any] = body.map { case (k, v, _) => k -> v }.toMap
    val expected: Option[Map[String, Any]] =
      if (body.forall(_._3.isDefined))
        Some(body.map { case (k, _, e) => k -> e.get }.toMap)
      else None

    val store = new Profiles(home)
    store.add(name, stored, activate = true)

    // 1. disk round-trip: a FRESH store re-parses the YAML bytes — nested
    //    collections must deep-convert back to scala shapes equal to stored
    val fresh = new Profiles(home)
    assert(fresh.activeName().contains(name), s"seed $seed: active name drifted")
    val loaded = fresh.listProfiles()(name)
    assert(loaded == stored,
      s"seed $seed: disk round-trip drifted\n stored: $stored\n loaded: $loaded")

    // 2. expansion over the loaded (disk-shaped) profile
    expected match {
      case Some(exp) =>
        val got = fresh.expandSecrets(loaded, cwd = home)
        assert(got == exp,
          s"seed $seed: expansion drifted\n expected: $exp\n got: $got")
      case None =>
        val e = intercept[MissingSecretError] { fresh.expandSecrets(loaded, cwd = home) }
        assert(e.getMessage.contains("Malformed reference") ||
          e.getMessage.contains("not set in the environment"),
          s"seed $seed: wrong malformed-ref message: ${e.getMessage}")
    }

    // 3. dispatch envelope: a file profile with a nested cloud map built from
    //    the SAME disk round-trip must reach PathResolver/CloudConnection
    if (!malformedSeed) {
      val dataDir = Files.createTempDirectory(s"graft_pfuzz_data_$seed")
      val fileProfile = Map(
        "datasource" -> "local_file",
        "url" -> dataDir.toString,
        "format" -> "parquet",
        "cloud" -> Map(
          "accessKey" -> s"$${${env.keys.head}}",
          "pathStyleAccess" -> true),
        "kwargs" -> Map("nested" -> Map("deep" -> "v")))
      store.add(s"file_$name", fileProfile)
      val reloaded = new Profiles(home).listProfiles()(s"file_$name")
      assert(reloaded == fileProfile, s"seed $seed: file profile drifted on disk")
      val expanded = fresh.expandSecrets(reloaded, cwd = home)
      assert(expanded("cloud").asInstanceOf[Map[String, Any]]("accessKey") ==
        env(env.keys.head),
        s"seed $seed: cloud accessKey did not expand from the nested map")
      // must dispatch into a resolver without throwing — the nested cloud map
      // through real YAML is exactly the java-collection regression shape
      graft.planner.Connections.fromProfile(expanded)
    }
    graft.util.Fs.deleteTree(home.toString)
  }

  test("60-seed disk round-trip fuzz: nested YAML, unicode, refs, dispatch") {
    (1 to 60).foreach(seedOnce)
  }
}
