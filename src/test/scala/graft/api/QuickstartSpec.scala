package graft.api

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The networkless quickstart (`ContextCli quickstart`) — the reference's
  * bundled jaffle-shop demo flow (`docs/get_started/quickstart.md`) run
  * entirely in-process: seed → land → draft → deploy → first query.
  */
class QuickstartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("quickstart seeds, drafts, deploys and answers a first query — deterministically") {
    spark // materialize the shared session so the CLI's getOrCreate reuses it
    val dir = Files.createTempDirectory("graft_qs_")
    val out1 = ContextCli.run(Seq("quickstart", "--path", dir.toString, "--force"))
    assert(out1.contains("(3 models)"), out1)
    // both rails/dbt convention edges inferred (customer_id→customers.id,
    // order_id→orders.id — the reference skill's naming-convention fallback)
    assert(out1.contains("orders_customers"), out1)
    assert(out1.contains("payments_orders"), out1)
    // the first query answered with three ranked customers
    assert(out1.linesIterator.count(
      _.matches("""  [a-z]+ [a-z]+: \d+ cents""")) === 3, out1)
    // seeded data is deterministic: a re-run reproduces byte-identical output
    val out2 = ContextCli.run(Seq("quickstart", "--path", dir.toString, "--force"))
    assert(out2 === out1)
    // and the written project passes the structural gate
    assert(ContextCli.run(Seq("validate", "--path", dir.toString))
      .contains("Project is valid."), "drafted quickstart project invalid")
    graft.util.Fs.deleteTree(dir.toString)
  }
}
