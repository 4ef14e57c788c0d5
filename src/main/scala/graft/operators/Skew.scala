package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation — salting for hot keys (SURVEY §4 / the 100 TB
  * design note: a boilerplate document duplicated millions of times, or
  * one whale account, turns a groupBy into a single straggler task).
  *
  * Two-phase: salt the key with a deterministic per-row shard, pre-agg on
  * (key, salt) — the hot key's rows spread over `shards` tasks — then
  * final-agg on the key alone over |keys|×shards small rows. AQE's skew
  * handling only splits JOIN partitions; aggregation skew needs this
  * shape. Restricted to algebraic aggregates (sum/count/min/max), which is
  * what the engine's aggregations are (SURVEY §2.4).
  */
object Skew {

  /** `groupBy(key).agg(sum(valueCol))`, salted. The salt is derived from a
    * uniformly-distributed row attribute, not RNG, so results are stable
    * under retries (speculative execution safe). */
  def saltedSum(df: DataFrame, key: Column, saltSource: Column, valueCol: Column,
                shards: Int = 16): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(hash(saltSource), lit(shards)))
      .groupBy(key.as("k"), col("_salt"))
      .agg(sum(valueCol).as("_partial"), count(lit(1)).as("_pn"))
    salted
      .groupBy(col("k"))
      .agg(sum(col("_partial")).as("sum_value"), sum(col("_pn")).as("n"))
  }
}
