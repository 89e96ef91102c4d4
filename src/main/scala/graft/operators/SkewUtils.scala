package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salting.
  *
  * A shuffled equi-join collapses when one key dominates (one reducer
  * gets the whole key). Salting splits each fact key into
  * `saltFactor` sub-keys deterministically, and replicates the
  * (small-ish) build side once per salt, so the hot key spreads over
  * `saltFactor` reducers. AQE's skew-join handles the sort-merge case
  * adaptively at runtime; explicit salting remains the tool when the
  * skew is known and extreme (heavy-hitter keys at 100 TB), when the
  * join is not SMJ, or when deterministic partitioning matters.
  */
object SkewUtils {

  /** Inner equi-join of `fact` (skewed) with `dim` (replicable) on
    * `key`, salted `saltFactor` ways. Result rows are identical to
    * the plain join — only the shuffle distribution changes.
    *
    * The salt must be deterministic per fact row (stable under
    * retries/speculation), so it hashes the full fact row, not a
    * random number.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, saltFactor: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col): _*), lit(saltFactor)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top heavy-hitter keys by frequency — the detection half of a
    * targeted skew strategy (salt only the hot keys, leave the rest
    * on the normal path). One map-side-combined aggregation.
    */
  def heavyHitters(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n")).filter(col("n") >= minCount)

  /** Targeted skew join: salt ONLY the heavy-hitter keys.
    *
    * `saltedJoin` replicates the ENTIRE dim `saltFactor`-fold — fine
    * when the dim is genuinely small, a scale-killer when it is
    * fact-sized (×8 replication of a 10 TB dim is an 80 TB shuffle).
    * Here `heavyHitters` (a map-side-combined top-N, broadcastable by
    * construction: at most |fact|/minCount keys survive) finds the hot
    * keys; the fact splits hot/cold by a broadcast semi/anti join
    * (narrow — no shuffle); only the HOT dim rows — a handful — are
    * replicated and salted; the cold majority takes the plain
    * equi-join. Result rows are identical to the unsalted join:
    * hot ∪ cold partitions the fact exactly, and cold fact rows can
    * never match a hot dim row.
    *
    * The two broadcasts of `hotKeys` are the same subtree, so Spark
    * plans one BroadcastExchange and reuses it (ReusedExchange).
    */
  def saltedJoinTargeted(fact: DataFrame, dim: DataFrame, key: String,
                         saltFactor: Int, minCount: Long): DataFrame = {
    val hotKeys = broadcast(heavyHitters(fact, key, minCount).select(col(key)))
    val factHot  = fact.join(hotKeys, Seq(key), "left_semi")
    val factCold = fact.join(hotKeys, Seq(key), "left_anti")
    val dimHot   = dim.join(hotKeys, Seq(key), "left_semi")
    val hot  = saltedJoin(factHot, dimHot, key, saltFactor)
    val cold = factCold.join(dim, Seq(key))
    hot.unionByName(cold)
  }
}
