package graft.tools

import graft.memory.{SchemaIndexer, SeedQueries}
import graft.queries.Semantic

/** Regenerates the literal VALUES pins in [[graft.queries.Memory]].
  *
  * The m29/m30 DuckDB oracles must not call [[SchemaIndexer]] /
  * [[SeedQueries]] at oracle-build time — the oracle would then be blind to
  * extraction bugs. Instead the extracted texts are pinned as Scala literals
  * in `queries/Memory.scala` (hand-audited truth), and `MemoryStoreSpec`
  * asserts pinned == extracted so drift surfaces as a test failure.
  *
  * Run `sbt "runMain graft.tools.MemoryPinGen"` after changing the fixture
  * manifest or the extractor, audit the diff, and paste the printed blocks
  * over the `pinnedSchemaItems` / `pinnedSeedPairs` literals.
  */
object MemoryPinGen {
  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def main(args: Array[String]): Unit = {
    val sb = new StringBuilder
    val items = SchemaIndexer.extractSchemaItems(Semantic.manifest)
    sb ++= s"  // ---- pinnedSchemaItems (${items.size}) ----\n"
    items.foreach { i =>
      sb ++= s"    (${q(i.itemType)}, ${q(i.modelName)}, ${q(i.itemName)},\n"
      sb ++= s"      ${q(i.text)}),\n"
    }
    val seeds = SeedQueries.generateSeedQueries(Semantic.manifest)
    sb ++= s"  // ---- pinnedSeedPairs (${seeds.size}) tag=${SeedQueries.SeedTag} ----\n"
    seeds.foreach { p =>
      sb ++= s"    (${q(p.nl)},\n"
      sb ++= s"      ${q(p.sql)}),\n"
    }
    val out = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "target/memory_pins.scala.txt")
    java.nio.file.Files.write(out, sb.toString.getBytes("UTF-8"))
    println(s"wrote ${out.toAbsolutePath}")
  }
}
