package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB path: skew-salted joins and bucketed
  * table layouts. AQE's skew-join splitting handles moderate skew at runtime; these
  * are for the cases the optimizer can't fix — a known ultra-hot key set (salting
  * beats AQE when one key alone exceeds executor memory) and repeated co-located
  * joins over the same key (bucketing removes the shuffle from every downstream
  * join, not just one).
  */
object ScaleLayout {

  /** Salted inner equi-join for skewed fact→dim joins: the fact side's key is salted
    * into `saltFactor` virtual keys, the (small, but not broadcastable) dim side is
    * replicated once per salt, so one hot key spreads over `saltFactor` tasks instead
    * of one straggler.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String, saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only — the dim side is replicated per " +
        s"salt, so right/full outer would emit unmatched dim rows $saltFactor times")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = dim
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write `df` as a bucketed+sorted managed table: downstream equi-joins and
    * aggregations on the bucket keys read co-located data and skip the exchange
    * entirely (verified in ScaleLayoutSpec by asserting a shuffle-free join plan).
    * The 100 TB contract: pick `buckets` so a bucket of the biggest table fits an
    * executor's memory (~total/buckets ≤ a few GB).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Repartition-and-sort layout for downstream merge-friendly consumption without a
    * catalog table (e.g. before writing partitioned parquet): one shuffle now, zero
    * in every reader that needs the same distribution.
    */
  def clustered(df: DataFrame, partitions: Int, keys: Seq[String]): DataFrame =
    df.repartition(partitions, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
}
