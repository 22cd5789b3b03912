package graft.semantics

import java.nio.file.{Files, Paths}

import org.scalatest.Assertions.fail

/** Pinned dialect goldens as resource files (`src/test/resources/goldens/
  * <dialect>/<name>.sql`), written by `graft.tools.GoldenGen` and compared
  * verbatim here — the reference's snapshot posture (insta snapshots,
  * `wren-core/core/src/mdl/mod.rs:648+`) with one-command regeneration
  * (`sbt "runMain graft.tools.GoldenGen"`) reviewed as a git diff.
  */
object Goldens {
  private val root = Paths.get(
    sys.props.getOrElse("graft.golden.dir", "src/test/resources/goldens"))

  def expected(dialect: String, name: String): String = {
    val p = root.resolve(dialect).resolve(s"$name.sql")
    if (!Files.exists(p))
      fail(s"missing golden $p — run `sbt \"runMain graft.tools.GoldenGen\"`")
    new String(Files.readAllBytes(p), "UTF-8").stripLineEnd
  }

  /** Assert `generated` matches the pinned file exactly; the failure message
    * carries both texts so the diff (and the regeneration command) is visible
    * in the test report.
    */
  def assertGolden(dialect: String, name: String, generated: String): String = {
    val pin = expected(dialect, name)
    assert(generated == pin,
      s"\n$dialect/$name drifted from its pinned golden — if the new text is " +
        s"intended, regenerate with `sbt \"runMain graft.tools.GoldenGen\"`\n" +
        s"generated:\n$generated\npinned:\n$pin")
    generated
  }
}
