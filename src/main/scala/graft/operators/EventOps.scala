package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events shape: ordered funnels and cohort
  * retention. Both are composed from joins/aggregations Catalyst plans natively
  * (no MATCH_RECOGNIZE engine needed): each funnel step is one aggregation of the
  * events table filtered to that step, shuffled by user — at scale, k steps cost k
  * passes over the (pre-filtered) event log, all map-side-prunable by event type.
  */
object EventOps {

  /** Ordered funnel: for each user, the earliest time of step i that is strictly
    * after their step i-1 time. Returns one row per user who completed step 1, with
    * nullable `t1..tk` timestamps (left joins keep partial funnels).
    */
  def funnel(
      events: DataFrame, steps: Seq[String],
      idCol: String = "user_id", tsCol: String = "t", typeCol: String = "event_type")
      : DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val s1 = events.filter(col(typeCol) === steps.head)
      .groupBy(col(idCol)).agg(min(col(tsCol)).alias("t1"))
    val (full, _) = steps.zipWithIndex.drop(1).foldLeft((s1, "t1")) {
      case ((acc, prevT), (step, i)) =>
        val tN = s"t${i + 1}"
        val sN = events.filter(col(typeCol) === step)
          .join(acc.select(col(idCol), col(prevT)), idCol)
          .filter(col(tsCol) > col(prevT))
          .groupBy(col(idCol)).agg(min(col(tsCol)).alias(tN))
        (acc.join(sN, Seq(idCol), "left_outer"), tN)
    }
    full
  }

  /** Step-completion counts for a funnel result: row per step with the number of
    * users whose funnel reached it.
    */
  def funnelCounts(funnelDF: DataFrame, k: Int): DataFrame = {
    val counts = (1 to k).map(i => count(col(s"t$i")).alias(s"step$i"))
    val wide = funnelDF.agg(counts.head, counts.tail: _*)
    val pairs = (1 to k).map(i =>
      struct(lit(i).alias("step"), col(s"step$i").alias("users")))
    wide.select(explode(array(pairs: _*)).alias("s"))
      .select(col("s.step").alias("step"), col("s.users").alias("users"))
  }

  /** Cohort retention: users grouped by first-activity period, counted per
    * subsequent period offset. One aggregation for cohorts (shuffle by user), one
    * for activity, one join — the standard layout whose output is tiny regardless
    * of input scale.
    */
  def retention(
      events: DataFrame, period: String = "week",
      idCol: String = "user_id", tsCol: String = "t"): DataFrame = {
    val cohorts = events.groupBy(col(idCol))
      .agg(date_trunc(period, min(col(tsCol))).alias("cohort"))
    val active = events
      .select(col(idCol), date_trunc(period, col(tsCol)).alias("p"))
      .distinct()
    active.join(cohorts, idCol)
      .groupBy(col("cohort"),
        datediff(col("p"), col("cohort")).alias("offset_days"))
      .agg(countDistinct(col(idCol)).alias("users"))
  }
}
