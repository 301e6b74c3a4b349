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

  /** t-closeness audit (Li, Li, Venkatasubramanian 2007) — the
    * skewness-attack refinement of l-diversity: a class can be diverse
    * yet still leak when its sensitive-value DISTRIBUTION differs from
    * the table's (e.g. a class that is 90% one diagnosis in a 1%
    * population). For an ORDERED sensitive attribute the distance is
    * the Earth Mover's Distance over the value grid:
    * EMD = (1/(m−1)) Σ_j |cum_p(j) − cum_q(j)| with p the class and q
    * the global distribution over the m distinct values. Computed
    * EXACTLY in integers: both cumulatives scale to the common
    * denominator |C|·N, EMD lands on the 1e-4 grid by one integral
    * division — order-free, fully oracle-replayable.
    *
    * Scale shape: one (quasi, sensitive) aggregation over the data;
    * everything after runs on the bounded (classes × domain) grid —
    * the dense cross join and its windows never touch data rows.
    */
  def tCloseness(df: DataFrame, quasiIds: Seq[Column], sensitive: Column,
      t4: Long): DataFrame = {
    require(quasiIds.nonEmpty && t4 >= 0, "need quasi-ids and t4 >= 0")
    import graft.text.TextAnalysis.intDiv
    import org.apache.spark.sql.expressions.Window
    val base = df.select(quasiIds :+ sensitive.as("__sv"): _*)
    val qNames = base.columns.dropRight(1).toSeq
    val cells = base.groupBy((qNames :+ "__sv").map(col): _*)
      .agg(count(lit(1)).as("__cc"))
      .localCheckpoint(eager = false)
    val global = cells.groupBy(col("__sv")).agg(sum(col("__cc")).as("__gc"))
    val classes = cells.groupBy(qNames.map(col): _*)
      .agg(sum(col("__cc")).as("class_size"))
    val nTotal = global.select(sum(col("__gc")).as("__n"))
    // dense (class × domain) grid — bounded by #classes · #values
    val grid = classes.crossJoin(broadcast(global))
      .join(cells, qNames :+ "__sv", "left")
      .na.fill(0L, Seq("__cc"))
    val w = Window.partitionBy(qNames.map(col): _*).orderBy(col("__sv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = Window.partitionBy(qNames.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    grid
      .withColumn("__cumC", sum(col("__cc")).over(w))
      .withColumn("__cumG", sum(col("__gc")).over(w))
      .withColumn("__m", count(lit(1)).over(m))
      .crossJoin(broadcast(nTotal))
      // scaled |cum_p − cum_q| term: |N·cumC − |C|·cumG| (common
      // denominator |C|·N), summed over ALL m grid points (the last
      // point contributes 0 — both cumulatives reach 1)
      .groupBy((qNames :+ "class_size" :+ "__m" :+ "__n").map(col): _*)
      .agg(sum(abs(col("__n") * col("__cumC") -
        col("class_size") * col("__cumG"))).as("__emdS"))
      .select(
        qNames.map(col) ++
          Seq(col("class_size"),
            when(col("__m") > 1L,
              intDiv(col("__emdS") * lit(10000L),
                col("class_size") * col("__n") * (col("__m") - lit(1L))))
              .otherwise(lit(0L)).as("emd_e4")): _*)
      .withColumn("t_close", col("emd_e4") <= t4)
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
