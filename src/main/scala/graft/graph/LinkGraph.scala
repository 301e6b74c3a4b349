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

  /** Integer-exact domain PageRank; returns (node, rank_micro).
    *
    * Iteration state is SPARSE: only nodes with in-contributions carry
    * a row (absent ⇒ cin 0 ⇒ rank = base, substituted by a left join
    * on the EDGE side), so each round is exactly one graph-sized
    * shuffle — the edges⋈contrib join + the per-dst sum. The previous
    * shape re-joined the full node list and checkpointed a dense rank
    * table every round: a second graph-sized shuffle per round that
    * only re-attached zeros (first round: `ranks = scale` for every
    * node — here round 1 contributes `scale` directly). The dense fill
    * happens ONCE at the end. Values are unchanged — zero/absent
    * contributions are additive identities in exact long arithmetic —
    * so the unrolled-CTE oracle replays bit-identically. */
  def domainRank(docs: DataFrame, iterations: Int = 4,
      scale: Long = 1000000L): DataFrame = {
    // the sparse round-1 inlining computes the first contribution
    // unconditionally, so iterations = 0 would silently return a
    // 1-iteration result (pre-r15 it returned the all-at-scale initial
    // state) — fail loudly instead of changing meaning (r15 advisor)
    require(iterations >= 1, "domainRank needs at least one iteration")
    val edges = domainEdges(docs).localCheckpoint(eager = false)
    val nodes = docs.select(col("source").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint(eager = false)
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint(eager = false)
    val base = 15L * scale / 100L
    // round 1 inlined: every node starts at `scale`, so the first
    // contribution needs no rank join at all
    var cin = edges
      .join(outdeg, Seq("src"))
      .select(col("dst").as("node"),
        graft.text.TextAnalysis.intDiv(
          lit(85L) * lit(scale), lit(100L) * col("od")).as("c"))
      .groupBy(col("node")).agg(sum(col("c")).as("cin"))
      .localCheckpoint(eager = false)
    for (_ <- 2 to iterations) {
      cin = edges
        .join(cin.withColumnRenamed("node", "src"), Seq("src"), "left")
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          graft.text.TextAnalysis.intDiv(
            lit(85L) * (lit(base) + coalesce(col("cin"), lit(0L))),
            lit(100L) * col("od")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cin"))
        .localCheckpoint(eager = false)
    }
    nodes.join(cin, Seq("node"), "left")
      .select(col("node"),
        (lit(base) + coalesce(col("cin"), lit(0L))).as("rank_micro"))
  }

  /** HITS hubs and authorities (Kleinberg 1999) — the link-graph twin
    * of [[domainRank]] for the two roles PageRank folds together: a
    * good HUB links to many good authorities (the directory/portal
    * signal crawl frontier schedulers use), a good AUTHORITY is linked
    * from many good hubs (the trust signal source weighting uses).
    *
    * EXACT-INTEGER iteration on the 1e-6 grid: the classic mutual
    * recursion a = Eᵀh, h = E·a with MAX-normalization replacing the
    * L2 norm — `x'(v) = (raw(v)·scale) // max_u raw(u)` with truncating
    * integer division, so K unrolled iterations replay bit-identically
    * in SQL (the [[domainRank]] discipline; an L2 norm would need a
    * cross-engine sqrt-of-sum per round and float division order).
    * Nodes without the role's edges score 0; the max hub/authority
    * each round sits exactly at `scale`. With ≥1 edge the round maxima
    * never fall below `scale`, so no division-by-zero path exists (a
    * `greatest(1, …)` guard still covers the edgeless-corpus case
    * identically on both engines).
    *
    * Scale shape: same as [[domainRank]] — the URL scan runs once,
    * each half-step is ONE shuffle over the graph-sized edge table,
    * the per-round max is a 1-row broadcast, per-round checkpoints
    * bound plan depth. Long bound: raw sums stay ≤ indeg·scale, so
    * `raw·scale` requires indeg < 2^63/scale² ≈ 9·10⁶ at the default
    * grid — pick a smaller scale for mega-hub graphs (ANSI mode throws
    * loudly rather than wrapping).
    */
  def hits(docs: DataFrame, iterations: Int = 3,
      scale: Long = 1000000L): DataFrame = {
    import graft.text.TextAnalysis.intDiv
    require(iterations >= 1, "HITS needs at least one mutual-update round")
    val edges = domainEdges(docs).localCheckpoint(eager = false)
    val nodes = docs.select(col("source").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().localCheckpoint(eager = false)
    // Iteration state is SPARSE (only nodes with the role's edges carry
    // a row — a zero score is an additive identity in the next
    // half-step's sum, and the round max is unaffected because with ≥1
    // edge it sits at ≥ scale ≥ any zero row): each half-step is ONE
    // graph-sized shuffle (edge join + per-node sum) with the round max
    // taken as a one-row collect over the same checkpointed sums. The
    // previous shape paid, per half-step, a second graph-sized shuffle
    // re-attaching every zero node plus a broadcast-exchange job for
    // the max; dense zeros are filled ONCE at the end. Truncating
    // integer arithmetic is unchanged — the unrolled-CTE oracle replays
    // bit-identically.
    var hubs: DataFrame = null // sparse (node, h); null ⇒ round 1 (all = scale)
    var auths: DataFrame = null
    def normalized(raw0: DataFrame, out: String): DataFrame = {
      val raw = raw0.localCheckpoint(eager = false)
      val m = raw.agg(greatest(lit(1L), coalesce(max(col("s")), lit(1L))))
        .collect()(0).getLong(0)
      raw.select(col("node"),
        intDiv(col("s") * lit(scale), lit(m)).as(out))
    }
    for (i <- 1 to iterations) {
      // round 1: every hub is `scale`, so the first authority sums need
      // no score join at all
      auths = normalized(
        (if (i == 1) edges.select(col("dst"), lit(scale).as("h"))
         else edges.join(hubs.withColumnRenamed("node", "src"), Seq("src")))
          .groupBy(col("dst").as("node")).agg(sum(col("h")).as("s")), "a")
      hubs = normalized(edges
        .join(auths.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node")).agg(sum(col("a")).as("s")), "h")
    }
    nodes.join(hubs, Seq("node"), "left").join(auths, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("h"), lit(0L)).as("hub_micro"),
        coalesce(col("a"), lit(0L)).as("auth_micro"))
  }
}
