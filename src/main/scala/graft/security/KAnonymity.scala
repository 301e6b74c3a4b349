package graft.security

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity audit — the release-readiness check BESIDE the DP
  * sketches (Sweeney 2002): group the table by its quasi-identifier
  * columns and flag every equivalence class smaller than k — the rows
  * a linkage attack can single out. DP bounds what an adversary can
  * LEARN from noisy aggregates; k-anonymity audits what a published
  * MICRODATA table exposes directly; a real release pipeline runs
  * both.
  *
  * Scale shape: one hash aggregation on the quasi-identifier tuple
  * (map-side partials), class-sized output — the same cost profile as
  * any groupBy count. The risk summary is a second aggregation over
  * the CLASS table (class-sized input, one row out).
  */
object KAnonymity {

  /** Per-equivalence-class audit: the quasi-identifier values, the
    * class size, and the k verdict. */
  def classes(df: DataFrame, quasiIds: Seq[Column], k: Long): DataFrame = {
    require(quasiIds.nonEmpty && k >= 2, "need quasi-ids and k >= 2")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("k_anonymous", col("class_size") >= k)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — the refinement
    * k-anonymity misses: a class can be large yet expose its members
    * when every row shares the SAME sensitive value (homogeneity
    * attack). Each quasi-identifier class must contain at least `l`
    * DISTINCT sensitive values. Same one-aggregation cost profile as
    * [[classes]] (count_distinct adds a per-class distinct state).
    */
  def lDiversity(df: DataFrame, quasiIds: Seq[Column], sensitive: Column,
      l: Long): DataFrame = {
    require(quasiIds.nonEmpty && l >= 2, "need quasi-ids and l >= 2")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(sensitive).as("n_sensitive"))
      .withColumn("l_diverse", col("n_sensitive") >= l)
  }

  /** One-row release-risk summary: class counts, the rows at risk
    * (members of sub-k classes), and the at-risk share on the exact
    * 1e-4 grid. */
  def riskSummary(df: DataFrame, quasiIds: Seq[Column], k: Long): DataFrame = {
    classes(df, quasiIds, k)
      .agg(count(lit(1)).as("n_classes"),
        count(when(!col("k_anonymous"), 1)).as("n_violating_classes"),
        sum(col("class_size")).as("n_rows"),
        coalesce(sum(when(!col("k_anonymous"), col("class_size"))), lit(0L))
          .as("n_rows_at_risk"))
      .select(col("n_classes"), col("n_violating_classes"),
        col("n_rows"), col("n_rows_at_risk"),
        graft.text.TextAnalysis.frac4(col("n_rows_at_risk"), col("n_rows"))
          .as("at_risk_share"))
  }
}
