package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-level link-graph centrality — the CommonCrawl-style domain
  * ranking signal (CCNet/RefinedWeb-class pipelines rank crawl
  * frontiers and weight sources by link centrality before any
  * text-level filter runs). Nodes are SITES (the `source` column) plus
  * every target domain their documents link to; edges are the DISTINCT
  * (site → domain) pairs from one URL-extraction pass over the corpus
  * (the same Java∩RE2 scheme+host regex as
  * [[graft.text.TextAnalysis.urlFilter]]).
  *
  * EXACT-INTEGER PageRank on the 1e-6 grid: ranks live in micro-units
  * and each iteration computes
  * `r'(v) = floor(0.15·scale) + Σ_{u→v} (85·r(u)) // (100·outdeg(u))`
  * with truncating integer division (Spark `IntegralDivide` == DuckDB
  * `//` on non-negative ranks), so K unrolled iterations are
  * bit-identical across engines and the whole fixed-point computation
  * is SQL-replayable — no float accumulation order anywhere. Dangling
  * nodes keep the teleport base each round (the simplified variant:
  * dangling mass is dropped, not redistributed — deterministic,
  * standard for ranking-only use, and documented).
  *
  * Scale shape: the URL-extraction scan runs ONCE (edges and the node
  * set are lazily checkpointed); per iteration there is exactly one
  * shuffle — contributions grouped by target — over the EDGE table,
  * which is distinct site→domain pairs (graph-sized, not corpus-sized;
  * web-scale domain graphs are millions of nodes where the corpus is
  * billions of pages). Plan depth stays bounded: each iteration's rank
  * table is checkpointed, so iteration K joins a flat table, not a
  * K-deep plan.
  */
object LinkGraph {

  private val urlPat = "https?://[a-z0-9.-]+"

  /** Distinct (site → target-domain) edges from in-text links. */
  def domainEdges(docs: DataFrame): DataFrame =
    docs.select(col("source").as("src"),
        explode(transform(
          regexp_extract_all(col("text"), lit(urlPat), lit(0)),
          u => substring_index(u, "//", -1))).as("dst"))
      .distinct()

  /** Integer-exact domain PageRank; returns (node, rank_micro). */
  def domainRank(docs: DataFrame, iterations: Int = 4,
      scale: Long = 1000000L): DataFrame = {
    val edges = domainEdges(docs).localCheckpoint(eager = false)
    val nodes = docs.select(col("source").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint(eager = false)
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint(eager = false)
    val base = 15L * scale / 100L
    var ranks = nodes.select(col("node"), lit(scale).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          graft.text.TextAnalysis.intDiv(
            lit(85L) * col("r"), lit(100L) * col("od")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cin"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("cin"), lit(0L))).as("r"))
        .localCheckpoint(eager = false)
    }
    ranks.select(col("node"), col("r").as("rank_micro"))
  }
}
