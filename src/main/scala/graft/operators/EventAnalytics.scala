package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream — the product-side
  * queries an events table exists for: ordered conversion funnels
  * and cohort retention.
  *
  * Scale shape: everything here is keyed by `user_id` — per-step
  * aggregates are map-side-combined before one user-keyed shuffle,
  * and the step join is co-partitioned on the same key (Spark reuses
  * the exchange). Nothing is windowed globally and nothing depends
  * on event order within a partition.
  */
object EventAnalytics {

  /** Ordered two-step conversion funnel: users whose first `stepA`
    * event is followed by a `stepB` event within `withinDays`.
    * Ordering is STRICT — a purchase before the first signup does
    * not convert — which a bare per-type count cannot express.
    * Output: one row `(n_step_a, n_converted)`.
    */
  def orderedFunnel(events: DataFrame, stepA: String = "signup",
      stepB: String = "purchase", withinDays: Int = 7): DataFrame = {
    val a = events.filter(col("event_type") === stepA)
      .groupBy("user_id").agg(min("ts").as("a_ts"))
    val b = events.filter(col("event_type") === stepB)
      .select(col("user_id"), col("ts").as("b_ts"))
    val conv = a.join(b, Seq("user_id"))
      .filter(col("b_ts") >= col("a_ts") &&
        unix_micros(col("b_ts")) - unix_micros(col("a_ts")) <= withinDays.toLong * 86400L * 1000000L)
      .select("user_id").distinct()
    a.agg(count(lit(1)).as("n_step_a"))
      .crossJoin(conv.agg(count(lit(1)).as("n_converted")))
  }

  /** DuckDB oracle for [[orderedFunnel]]. */
  def sqlOrderedFunnel(stepA: String = "signup", stepB: String = "purchase",
      withinDays: Int = 7): String =
    s"""WITH a AS (SELECT user_id, min(ts) AS a_ts FROM events
       |  WHERE event_type = '$stepA' GROUP BY user_id),
       |conv AS (SELECT DISTINCT a.user_id FROM a JOIN events b USING (user_id)
       |  WHERE b.event_type = '$stepB' AND b.ts >= a.a_ts
       |    AND epoch_us(b.ts) - epoch_us(a.a_ts) <= ${withinDays.toLong * 86400L * 1000000L})
       |SELECT (SELECT count(*) FROM a) AS n_step_a,
       |       (SELECT count(*) FROM conv) AS n_converted""".stripMargin

  /** Cohort retention matrix: users grouped by the week of their
    * FIRST event (the cohort), counted as retained in each weekly
    * offset they have any activity in. Output: `(cohort, week_offset,
    * n_users)`, offsets 0..`maxOffset`.
    */
  def cohortRetention(events: DataFrame, maxOffset: Int = 3): DataFrame = {
    val first = events.groupBy("user_id").agg(min("ts").as("first_ts"))
    events.select("user_id", "ts")
      .join(first, Seq("user_id"))
      .select(
        col("user_id"),
        date_format(date_trunc("week", col("first_ts")), "yyyy-MM-dd").as("cohort"),
        floor((unix_micros(col("ts")) - unix_micros(date_trunc("week", col("first_ts"))))
          / lit(7L * 86400L * 1000000L)).as("week_offset"))
      .filter(col("week_offset") <= maxOffset)
      .groupBy("cohort", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort", "week_offset")
  }

  /** DuckDB oracle for [[cohortRetention]]. */
  def sqlCohortRetention(maxOffset: Int = 3): String =
    s"""WITH first AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
       |x AS (
       |  SELECT e.user_id,
       |    strftime(date_trunc('week', first_ts), '%Y-%m-%d') AS cohort,
       |    (epoch_us(e.ts) - epoch_us(date_trunc('week', first_ts)))
       |      // ${7L * 86400L * 1000000L} AS week_offset
       |  FROM events e JOIN first USING (user_id))
       |SELECT cohort, week_offset, count(DISTINCT user_id) AS n_users
       |FROM x WHERE week_offset <= $maxOffset
       |GROUP BY cohort, week_offset ORDER BY cohort, week_offset""".stripMargin
}
