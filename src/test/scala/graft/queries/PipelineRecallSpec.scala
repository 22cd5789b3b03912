package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dedup

/** Pins the recall assumption the d2/d9/p7 oracles rest on: the Spark side emits
  * MinHash-LSH candidate pairs (k=32, 16 bands × 2 rows) verified by exact Jaccard,
  * while the DuckDB oracles compute exact ALL-PAIRS Jaccard ≥ 0.7 — the two agree
  * only while no true pair misses every band. The fixture's true pairs are planted
  * near-copies (Jaccard ≈ 1 ⇒ per-band miss probability ≈ 0), but that is a property
  * of the DATA, not of the algorithm: this spec recomputes both sides on the test
  * fixture so a regenerated fixture that drifts toward the banding recall knee
  * (J ≈ 0.7, where expected recall is 1 − (1 − 0.7²)^16 ≈ 0.9999) fails HERE, loudly,
  * instead of as an inscrutable driver-gate hash mismatch.
  */
class PipelineRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fixture MinHash-LSH recall is exactly 1 at the 0.7 threshold") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(col("doc_id"), col("text"))

    val exact = Dedup.pairJaccard(
        Dedup.shingles(docs, "text", "doc_id", n = 3), maxDocFreq = 1000000)
      .filter(round(col("jaccard"), 6) >= 0.7)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val banded = Dedup.minHashNearDup(docs, "text", "doc_id",
        n = 3, k = 32, bands = 16, threshold = 0.7)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty, "fixture must contain true near-dup pairs for this pin to mean anything")
    assert(banded == exact,
      s"LSH banding missed true pairs (or emitted spurious ones): " +
        s"missed=${(exact -- banded).take(5)} extra=${(banded -- exact).take(5)} — " +
        "the d2/d9/p7 oracles assume recall 1 on this fixture")
  }
}
