package graft.operators

import graft.engine.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Joins — parity-plus over the reference (hillview has no general join,
  * SURVEY.md §2.4; its closest constructs are membership-set algebra and
  * the root-side geo-metadata join, TableTarget.java:146-154).
  *
  * Scale posture: dimension tables (region/nation/supplier/part at TPC-H
  * ratios) are broadcast — no shuffle of the fact table; fact-to-fact
  * joins (lineitem⋈orders) shuffle on the join key where AQE handles
  * skew. At 100 TB this is the difference between a 100 TB shuffle and
  * none, so every dim join below carries an explicit broadcast hint.
  */
object Joins {

  /** Fact ⋈ fact equi-join + group-aggregate (revenue by order priority).
    * Shuffles both sides on the key once; aggregation is partial+final.
    */
  def revenueByPriority(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        Num.sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("o_orderpriority"))

  /** Snowflake dim join: customer → nation → region, all dims broadcast.
    * The geo-metadata join of the reference is this exact shape.
    */
  def customersPerRegion(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
           Num.sumExact(col("c_acctbal")).as("total_bal"))
      .orderBy(col("r_name"))

  /** Heavy-hitter row filter (FreqKList.getFilter + RPC filterHeavy):
    * keep rows whose tuple is in a candidate list → broadcast semi-join.
    */
  def semiJoinFilter(df: DataFrame, candidates: DataFrame, keys: Seq[String]): DataFrame =
    df.join(broadcast(candidates), keys, "left_semi")

  /** Complement (RPC filterListHeavy exclude-mode): broadcast anti-join. */
  def antiJoinFilter(df: DataFrame, candidates: DataFrame, keys: Seq[String]): DataFrame =
    df.join(broadcast(candidates), keys, "left_anti")

  /** Salted equi-join for skewed keys. When a handful of join keys hold
    * most of the fact rows (zipf user ids, a dominant `source`), a plain
    * shuffle join sends every hot-key row to ONE reducer — a straggler
    * task holding the whole hot key's share of 100 TB. Salting splits
    * each key into `salts` sub-keys:
    *
    *   fact: __salt = pmod(hash(saltBy), salts)   (saltBy: any
    *         high-cardinality column, so rows spread uniformly)
    *   dim:  replicated once per salt value (explode of a literal range)
    *   join on (key, __salt)
    *
    * Hot keys now land on `salts` reducers instead of 1. The dim side
    * grows ×salts — use only when the dim is small relative to the fact
    * but too big (or forced) to broadcast; AQE's skew-join handles the
    * milder cases without replication.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBy: Column, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // shuffle_hash on both sides: the demonstration is the shuffled-join
    // skew shape — Spark would otherwise broadcast a small dim and hide it
    saltedFact.hint("shuffle_hash")
      .join(saltedDim.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
