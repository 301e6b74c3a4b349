package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Scale posture: the brute-force path broadcasts the (small) query set
  * and scans the corpus once — embarrassingly parallel, no shuffle of
  * the corpus; top-k per query is a windowed rank over per-query
  * candidate rows (bounded by corpus size per query; at real scale the
  * LSH-bucketed path cuts candidates first, same top-k tail).
  * All vector math is higher-order array expressions in double — no
  * UDFs, deterministic, oracle-reproducible.
  */
object Similarity {

  /** dot / norm / cosine over float arrays — native codegen expressions
    * (graft.functions.FloatVecDot/Norm): a primitive Java loop inside
    * whole-stage codegen, left-to-right double accumulation (same value
    * as a sequential SQL-engine loop, bit for bit).
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.vec_dot(a, b)

  def norm(a: Column): Column = graft.functions.VectorExpressions.vec_norm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** cosine with precomputed norms (see nearDupPairs): dot/(na*nb). */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Brute-force exact top-k cosine neighbors for a query-id set.
    * Queries are broadcast; per-query ranking via row_number window
    * (partitions = queries, so parallelism = #queries × corpus splits).
    */
  /** Embedding-space domain scoring (the embedding twin of the text
    * DSIR weights): cosine of every vector to the TARGET label group's
    * centroid — select/route data by how close it sits to a curated
    * domain in embedding space. Exactness: vectors snap to the GLOBAL
    * 2^16 grid ([[graft.functions.FloatVecQ16]]), so the centroid is
    * integer arithmetic end to end (per-dim exact sums, truncating
    * integer mean — Spark IntegralDivide == DuckDB `//`), every dot
    * product is an exact ≤2^53 integer (IntVecDot), and the single
    * cosine division uses IEEE-stable sqrt, rounded to 4 decimals (the
    * ANN-oracle precedent). Plan: one quantize pass feeds the target
    * centroid agg (dim-sized output), the 1-row centroid broadcasts
    * into the codegen scoring map — no data-sized shuffle at all.
    */
  def domainScore(emb: DataFrame, targetLabel: Int): DataFrame = {
    import graft.functions.VectorExpressions.{vec_q16, vec_dot_int}
    val q = emb.select(col("vec_id"), col("label"),
      vec_q16(col("embedding")).as("qe"))
    val cent = q.filter(col("label") === lit(targetLabel))
      .select(posexplode(col("qe")).as(Seq("d", "v")))
      .groupBy(col("d"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .select(col("d"),
        graft.text.TextAnalysis.intDiv(col("s"), col("n")).cast("int").as("c"))
      .agg(sort_array(collect_list(struct(col("d"), col("c")))).as("dc"))
      .select(transform(col("dc"), x => x.getField("c")).as("cent"))
    q.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"),
        vec_dot_int(col("qe"), col("cent")).as("__dot"),
        vec_dot_int(col("qe"), col("qe")).as("__qq"),
        vec_dot_int(col("cent"), col("cent")).as("__cc"))
      .select(col("vec_id"), col("label"),
        col("__dot").cast("long").as("dot_q"),
        when(col("__qq") > 0.0 && col("__cc") > 0.0,
          round(col("__dot") / (sqrt(col("__qq")) * sqrt(col("__cc"))), 4))
          .as("cos"))
  }

  /** Embedding-space decontamination — the SEMANTIC complement of the
    * n-gram overlap check ([[graft.text.TextAnalysis.contamination]]):
    * paraphrased benchmark leakage shares no 13-gram with the eval set
    * but still sits next to it in embedding space. Flags every train
    * vector whose cosine to ANY eval vector reaches `theta`, with its
    * hit count and strongest match. Cosines round to 4 decimals (the
    * ANN-oracle precedent; fixture cosines sit away from the grid).
    *
    * Plan: the eval set is benchmark-sized → `broadcast`; the train
    * side is touched ONCE (per-row cost ∝ |eval|, a narrow map over
    * the broadcast list), and the partial-aggregated groupBy ships at
    * most one tiny row per flagged vector — no pair materialization,
    * no data-sized shuffle at any corpus scale.
    */
  def semanticContamination(train: DataFrame, evalSet: DataFrame,
      theta: Double): DataFrame = {
    val q = evalSet.select(col("embedding").as("__e"))
    train.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("__e")), 4).as("__cos"))
      .filter(col("__cos") >= theta)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_hits"), max(col("__cos")).as("max_cos"))
  }

  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
    scored
      .withColumn("rank",
        row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** k-center coreset selection (farthest-point greedy — Gonzalez
    * 1985, applied to data selection as in Sener & Savarese 2018):
    * pick k vectors such that every corpus vector is close to some
    * pick — the DIVERSITY-sampling complement of score-based selection
    * (DSIR picks what matches a target; k-center picks what SPANS the
    * space, the finetuning-subset / annotation-budget selector).
    * Start = lowest vec_id (pinned); each round adds the vector
    * maximizing its distance to the nearest already-picked center
    * (ties → lowest vec_id).
    *
    * Exactness: vectors snap to the global 2^16 grid, squared
    * distances are exact ≤2^53 integers (‖v‖² − 2·v·s + ‖s‖² on
    * IntVecDot), so the entire greedy fixed point replays
    * bit-identically in SQL. Plan: the quantized corpus is
    * checkpointed once; each of the k−1 rounds is ONE narrow scan
    * (min-of-dots against ≤k literal centers inside codegen) + a
    * bounded TakeOrdered(1) — the greedy's intrinsic k-scan cost,
    * with driver state = k vectors (the trainer-state posture).
    */
  def kcenterCoreset(emb: DataFrame, k: Int): DataFrame = {
    import graft.functions.VectorExpressions.{vec_q16, vec_dot_int}
    val spark = emb.sparkSession
    import spark.implicits._
    val q = emb.select(col("vec_id"), vec_q16(col("embedding")).as("qe"))
      .withColumn("vv", vec_dot_int(col("qe"), col("qe")).cast("long"))
      .localCheckpoint(false)
    val first = q.orderBy(col("vec_id")).limit(1).head()
    var selected = List((first.getLong(0),
      first.getSeq[Int](1).toArray, first.getLong(2), Option.empty[Long]))
    var cand = q.filter(col("vec_id") =!= first.getLong(0))
    for (_ <- 2 to k) {
      val md = selected.map { case (_, arr, vvj, _) =>
        col("vv") - lit(2L) * vec_dot_int(col("qe"), lit(arr)).cast("long") +
          lit(vvj)
      }.reduce(least(_, _))
      val next = cand.select(col("vec_id"), col("qe"), col("vv"), md.as("md"))
        .orderBy(col("md").desc, col("vec_id")).limit(1).head()
      selected = selected :+ ((next.getLong(0),
        next.getSeq[Int](1).toArray, next.getLong(2), Some(next.getLong(3))))
      cand = cand.filter(col("vec_id") =!= next.getLong(0))
    }
    selected.zipWithIndex.map { case ((id, _, _, d), i) =>
      (i + 1L, id, d)
    }.toDF("rank", "vec_id", "min_dist")
  }

  /** In-context-pretraining document ordering (Shi et al. 2023,
    * arXiv:2310.10638): order documents so each one is followed by its
    * most-similar unvisited neighbor, turning the training stream into
    * topically-coherent windows instead of random concatenations. This
    * is the bit-pinned greedy k-prefix of that traversal: start at the
    * lowest vec_id, then repeatedly hop to the unvisited vector with
    * the highest exact-integer dot product to the CURRENT one (tie:
    * lowest vec_id). Distances live on the 2^16 quantization grid so
    * the whole selection sequence replays bit-identically in SQL.
    *
    * Scale posture: k bounded scans, each TakeOrdered(1) over a
    * column-pruned quantized frame (the kcenterCoreset shape) — no
    * pair materialization, no data-sized shuffle. The full-corpus form
    * runs the same hop over a precomputed ANN-kNN edge list
    * (graph-sized, not corpus²). */
  def icpOrder(emb: DataFrame, k: Int): DataFrame = {
    import graft.functions.VectorExpressions.{vec_q16, vec_dot_int}
    require(k >= 1, s"icpOrder needs k >= 1, got $k")
    val spark = emb.sparkSession
    import spark.implicits._
    val q = emb.select(col("vec_id"), vec_q16(col("embedding")).as("qe"))
      .localCheckpoint(false)
    val firstRows = q.orderBy(col("vec_id")).limit(1).collect()
    require(firstRows.nonEmpty, "icpOrder: empty embedding table")
    val first = firstRows.head
    var cur = (first.getLong(0), first.getSeq[Int](1).toArray)
    var out = List((1L, cur._1, Option.empty[Long]))
    var cand = q.filter(col("vec_id") =!= cur._1)
    var i = 2
    var exhausted = false
    // truncate the walk at the corpus size: fewer than k vectors
    // yields a shorter ordering, not an exception
    while (i <= k && !exhausted) {
      val d = vec_dot_int(col("qe"), lit(cur._2)).cast("long")
      val nextRows = cand.select(col("vec_id"), col("qe"), d.as("d"))
        .orderBy(col("d").desc, col("vec_id")).limit(1).collect()
      if (nextRows.isEmpty) exhausted = true
      else {
        val next = nextRows.head
        cur = (next.getLong(0), next.getSeq[Int](1).toArray)
        out = out :+ ((i.toLong, cur._1, Some(next.getLong(2))))
        cand = cand.filter(col("vec_id") =!= cur._1)
        i += 1
      }
    }
    out.map { case (p, id, dp) => (p, id, dp) }
      .toDF("position", "vec_id", "dot_prev")
  }

  /** Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009
    * — the fusion every BM25+dense RAG stack runs): fuse the lexical
    * BM25 ranking and the dense quantized-cosine ranking with
    * score = Σ_r 1_000_000 div (rrfK + rank_r), integer-exact so the
    * fused ordering replays bit-identically. Docs and vectors share
    * the id space by construction. Both candidate pools are bounded
    * (poolK) before fusion — the windows order ≤ poolK rows, never a
    * corpus; absent-from-one-ranker docs contribute 0 from that side.
    */
  def hybridRrf(docs: DataFrame, emb: DataFrame, terms: Seq[String],
      queryId: Long, k: Int = 10, poolK: Int = 50,
      rrfK: Long = 60L): DataFrame = {
    import graft.functions.VectorExpressions.{vec_q16, vec_dot_int}
    val lex = graft.text.TextAnalysis.bm25TopK(docs, terms, poolK)
      .select(col("doc_id"), col("rank").as("lex_rank"))
    val qv = emb.filter(col("vec_id") === queryId)
      .select(vec_q16(col("embedding")).as("qe"))
    val dense = emb.crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id").as("doc_id"),
        vec_dot_int(vec_q16(col("embedding")), col("qe")).cast("long")
          .as("__d"))
      .orderBy(col("__d").desc, col("doc_id")).limit(poolK)
    val denseR = dense.select(col("doc_id"),
      row_number().over(Window.orderBy(col("__d").desc, col("doc_id")))
        .cast("long").as("dense_rank"))
    val fused = lex.join(denseR, Seq("doc_id"), "full_outer")
      .withColumn("rrf_e6",
        coalesce(graft.text.TextAnalysis.intDiv(lit(1000000L),
          lit(rrfK) + col("lex_rank")), lit(0L)) +
          coalesce(graft.text.TextAnalysis.intDiv(lit(1000000L),
            lit(rrfK) + col("dense_rank")), lit(0L)))
      .orderBy(col("rrf_e6").desc, col("doc_id")).limit(k)
    fused.select(
      row_number().over(Window.orderBy(col("rrf_e6").desc, col("doc_id")))
        .cast("long").as("rank"),
      col("doc_id"), col("lex_rank"), col("dense_rank"), col("rrf_e6"))
  }

  /** Bitext mining — the parallel-corpus construction step (LASER /
    * CCMatrix): across two embedding populations (labels standing in
    * for the two languages), mine MUTUAL nearest-neighbor pairs — y is
    * x's best match AND x is y's best match — the reciprocal-best
    * criterion CCMatrix uses as its mining baseline. Dots are exact
    * 2^16-grid integers (ties: lowest id), so the mined pair set is
    * bit-stable across engines.
    *
    * Plan: the target side broadcasts into ONE scored bipartite join;
    * both directions' argmaxes are struct-max aggregates over the same
    * frame (map-side partial_max; Spark plans struct max sort-based —
    * partition-local sorts, no extra exchange, no window), then the
    * two elections join on equality (data-sized both sides: a
    * sort-merge join is the correct plan). At 100 TB the scored join
    * is fed by ANN candidate buckets (LSH/IVF cells) instead of the
    * full bipartite product — the election algebra is unchanged. */
  def bitextMine(emb: DataFrame, labelA: Int = 0, labelB: Int = 1): DataFrame = {
    import graft.functions.VectorExpressions.{vec_q16, vec_dot_int}
    val q = emb.select(col("vec_id"), col("label"),
      vec_q16(col("embedding")).as("qe"))
    val a = q.filter(col("label") === labelA)
      .select(col("vec_id").as("id_src"), col("qe").as("qa"))
    val b = q.filter(col("label") === labelB)
      .select(col("vec_id").as("id_tgt"), col("qe").as("qb"))
    val scored = a.join(broadcast(b))
      .select(col("id_src"), col("id_tgt"),
        vec_dot_int(col("qa"), col("qb")).cast("long").as("d"))
    val bestA = scored.groupBy(col("id_src"))
      .agg(max(struct(col("d"), (-col("id_tgt")).as("nid"))).as("m"))
      .select(col("id_src"), (-col("m.nid")).as("id_tgt"),
        col("m.d").as("dot_q"))
    val bestB = scored.groupBy(col("id_tgt"))
      .agg(max(struct(col("d"), (-col("id_src")).as("nid"))).as("m"))
      .select((-col("m.nid")).as("id_src"), col("id_tgt"))
    bestA.join(bestB, Seq("id_src", "id_tgt"))
      .select(col("id_src"), col("id_tgt"), col("dot_q"))
  }

  /** Hard-negative mining — the contrastive-training data-prep step
    * (DPR / SimCSE / Contriever): for each query vector, the top-k
    * MOST-similar vectors carrying a DIFFERENT label. Random negatives
    * are easy and teach nothing; the highest-cosine wrong-label
    * vectors are the ones that define the decision boundary, and
    * mining them is exactly ANN-top-k with a label-exclusion predicate
    * pushed into the broadcast join. Plan: queries broadcast, corpus
    * scanned once, bounded per-partition heaps ship ≤ k rows per
    * (partition, query) — no window sort, no data-sized shuffle.
    */
  def hardNegatives(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
    val scored = emb.join(broadcast(q), col("label") =!= col("q_label"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
    graft.functions.TopKByKey.topKPerKey(scored, "query_id", "cos",
        "neighbor_id", k)
      .select(col("key").as("query_id"), col("rank"),
        col("id").as("neighbor_id"), round(col("score"), 4).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Triplet mining — assemble (anchor, positive, negative) training
    * rows for metric learning: per anchor, the most-similar SAME-label
    * vector (excluding itself) and the most-similar DIFFERENT-label
    * vector (the hard negative), plus the margin between them (cos⁺ −
    * cos⁻ — triplets with small or negative margin are the ones worth
    * training on). One broadcast of the anchor set, ONE corpus scan
    * scoring both roles (the label predicate decides which side each
    * candidate competes on), bounded-heap top-1 per (anchor, role).
    */
  def triplets(emb: DataFrame, anchorIds: Seq[Long]): DataFrame = {
    val q = emb.filter(col("vec_id").isin(anchorIds: _*))
      .select(col("vec_id").as("anchor_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("anchor_id"))
      .select(col("anchor_id"),
        (col("label") === col("q_label")).as("is_pos"),
        col("vec_id").as("cand_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
    val best = scored.groupBy(col("anchor_id"), col("is_pos"))
      .agg(max(struct(col("cos"), (-col("cand_id")).as("ni"))).as("b"))
      .select(col("anchor_id"), col("is_pos"),
        (-col("b.ni")).as("cand_id"), col("b.cos").as("cos"))
    val pos = best.filter(col("is_pos"))
      .select(col("anchor_id"), col("cand_id").as("pos_id"),
        col("cos").as("pos_cos"))
    val neg = best.filter(!col("is_pos"))
      .select(col("anchor_id"), col("cand_id").as("neg_id"),
        col("cos").as("neg_cos"))
    pos.join(neg, Seq("anchor_id"))
      .select(col("anchor_id"), col("pos_id"),
        round(col("pos_cos"), 4).as("pos_cos"),
        col("neg_id"), round(col("neg_cos"), 4).as("neg_cos"),
        round(col("pos_cos") - col("neg_cos"), 4).as("margin"))
  }

  /** bruteForceTopK with the bounded-heap aggregator instead of a
    * window: identical output, but each partition ships at most k
    * candidates per query to the shuffle instead of sorting every
    * query's full candidate list (see functions.TopKByKey).
    */
  def bruteForceTopKAgg(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
    graft.functions.TopKByKey.topKPerKey(scored, "query_id", "cos", "neighbor_id", k)
      .select(col("key").as("query_id"), col("rank"),
        col("id").as("neighbor_id"), round(col("score"), 4).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** bruteForceTopK through the GroupTopK custom operator (graft.plans):
    * bounded per-partition heaps below the exchange — the plan the
    * reference's MonoidTopK dataflow corresponds to.
    */
  def bruteForceTopKPlan(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
    graft.plans.GroupTopK.groupTopK(scored, Seq("query_id"),
        Seq(("cos", false), ("neighbor_id", true)), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hyperplane count that holds expected bucket occupancy ~flat as the
    * corpus grows: planes = ceil(log₂(n / targetBucket)). The r3 20×
    * scale probe showed FIXED planes make buckets (and so candidate
    * volume) grow linearly with n — the 100 TB contract is planes ~
    * log₂(n), recovered recall via bands ([[autoBands]]). Clamped to
    * [4, 24]; n is a count() or any cheap estimate (row-count metadata).
    */
  def autoPlanes(n: Long, targetBucket: Long = 64L): Int = {
    val buckets = math.max(1.0, n.toDouble / math.max(1L, targetBucket).toDouble)
    math.min(24, math.max(4, math.ceil(math.log(buckets) / math.log(2.0)).toInt))
  }

  /** Band count that holds candidate recall at a target miss rate e⁻⁵
    * (≥0.993) for pairs at `threshold` cosine, given `planes`-bit
    * buckets: per-band collision p = (1 - θ/π)^planes, bands = ⌈5/p⌉.
    * Grows as planes grow — hash work trades against candidate volume
    * at fixed recall. Clamped to [16, 1024].
    */
  def autoBands(planes: Int, threshold: Double): Int = {
    val p = math.pow(1.0 - math.acos(threshold) / math.Pi, planes)
    math.min(1024, math.max(16, math.ceil(5.0 / p).toInt))
  }

  /** Deterministic random-hyperplane LSH bucket id: `planes` sign bits of
    * dot(v, h_i), hyperplane components derived from md5 of (plane, dim)
    * — reproducible without any RNG state. `seed` selects an independent
    * hyperplane family (banding over multiple LSH tables).
    */
  def lshBucket(v: Column, dim: Int, planes: Int, seed: Int = 0): Column = {
    def coef(p: Int, d: Int): Float = {
      val key = if (seed == 0) s"$p:$d" else s"$seed:$p:$d"
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      // first 4 bytes → uniform in [-1, 1]
      val x = java.nio.ByteBuffer.wrap(md).getInt(0)
      x.toFloat / Int.MaxValue.toFloat
    }
    // each hyperplane is a literal float array; projection = one codegen
    // dot loop (a per-element expression tree here would be 512 terms —
    // seconds of janino compile time for a one-off query)
    val bits = (0 until planes).map { p =>
      val plane = lit((0 until dim).map(d => coef(p, d)).toArray)
      when(dot(v, plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** ANN via LSH buckets: corpus pre-bucketed (this is the index build —
    * at scale, written once as a bucketed table); queries probe only
    * their own bucket. Approximate: recall depends on `planes`.
    * `planes <= 0` (the default) self-tunes via [[autoPlanes]] with a
    * bucket target of max(64, 8k) — the log₂(n) contract by default.
    */
  def lshTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
      dim: Int = 64, planes: Int = 0, nEstimate: Long = 0L): DataFrame = {
    // nEstimate > 0 sizes the auto-tuning without the eager count()
    // job (construction stays plan-only — callers that know the corpus
    // cardinality, or read it from table metadata, should pass it)
    val np = if (planes > 0) planes
      else autoPlanes(if (nEstimate > 0) nEstimate else emb.count(),
        math.max(64L, 8L * k))
    val bucketed = emb.withColumn("bucket", lshBucket(col("embedding"), dim, np))
    val q = bucketed.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("bucket").as("q_bucket"))
    val scored = bucketed
      .join(broadcast(q),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
    scored
      .withColumn("rank",
        row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ── product quantization (Jégou, Douze, Schmid 2011) ───────────────

  /** Per-subspace L2 k-means codebooks: dimension split into `m`
    * subspaces of dim/m, all trained TOGETHER — seeds come from ONE
    * hash-strided collect (sliced driver-side) and every Lloyd
    * iteration is ONE aggregation pass covering all m subspaces
    * (subspace/cell/dim keyed means), so training costs O(refineIters)
    * jobs, not O(m·refineIters). Squared-L2 objective (what PQ encodes
    * with); result is m×ksub×(dim/m) floats — sketch-sized driver
    * state, like IVF centroids. */
  def pqCodebooks(emb: DataFrame, m: Int, ksub: Int,
      refineIters: Int): Array[Array[Array[Float]]] = {
    // one seed collect, sliced per subspace on the driver; the seeds
    // also carry the dimensionality (no separate head job)
    val seeds = emb
      .select(col("embedding"), xxhash64(col("vec_id")).as("h"))
      .orderBy(col("h")).limit(ksub)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val d = dim / m
    var cbs = Array.tabulate(m)(j =>
      seeds.map(v => java.util.Arrays.copyOfRange(v, j * d, (j + 1) * d)))
    (0 until refineIters).foreach { _ =>
      // one pass for ALL subspaces: code per subspace (fused PqEncode
      // kernel — same argmin, same tie rules, one loop instead of
      // m·ksub struct branches), then (subspace, cell, dim) means
      val codesCol = slice(graft.functions.VectorExpressions
        .pq_encode(col("embedding"), None, cbs), 2, m)
      val stats = emb
        .select(posexplode(codesCol).as(Seq("sub", "cell")), col("embedding"))
        .select(col("sub"), col("cell"),
          posexplode(expr(s"slice(embedding, sub * $d + 1, $d)"))
            .as(Seq("dim", "v")))
        .groupBy(col("sub"), col("cell"), col("dim"))
        .agg(avg(col("v")).as("mean"))
        .collect()
      val bySub = stats.groupBy(r => (r.getInt(0), r.getInt(1)))
      cbs = Array.tabulate(m)(j => cbs(j).zipWithIndex.map { case (old, i) =>
        bySub.get((j, i)).map { rows =>
          val arr = old.clone()
          rows.foreach(r => arr(r.getInt(2)) = r.getDouble(3).toFloat)
          arr
        }.getOrElse(old) // empty cell keeps its seed
      })
    }
    cbs
  }

  /** L2-normalized copy of the embedding frame (inner product equals
    * cosine afterwards); zero vectors drop. */
  private[ann] def l2normalize(emb: DataFrame): DataFrame =
    emb.withColumn("__n", norm(col("embedding")))
      .filter(col("__n") > 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => (x / col("__n")).cast("float"))
          .as("embedding"))

  /** Product-quantization ANN: corpus vectors compress to `m` byte
    * codes (dim·4 bytes → m bytes — 32× at dim 64, m 8: the memory
    * posture that keeps a billion-vector index in RAM), queries score
    * candidates by ADC (asymmetric distance computation: per-query
    * lookup tables T[j][c] = ⟨q_j, codebook_j[c]⟩ built driver-side,
    * so the corpus-side score is m literal-array lookups + adds — fully
    * codegen'd, no per-row vector math), and the ADC top `refine·k`
    * re-rank by EXACT cosine. Deterministic end to end (hash-strided
    * seeds, lexicographic tie-breaks). Approximate ⇒ rows-only query;
    * recall vs brute force is property-gated. */
  def pqTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
      m: Int = 8, ksub: Int = 32, refineIters: Int = 1,
      refine: Int = 8): DataFrame = {
    // normalize once and keep it materialized: training (seeds +
    // iterations), encoding, and re-rank all read it (cleaner-managed
    // lifetime, same pattern as the LSH dedup candidates)
    val normed = l2normalize(emb).localCheckpoint(eager = false)
    val codebooks = pqCodebooks(normed, m, ksub, refineIters)
    // corpus → m-byte codes: ONE narrow pass, materialized because the
    // ADC stage scans it once; scoring is the shared single-pass
    // broadcast-batch path (plan size independent of #queries)
    val codes = PqIndex.encode(normed, None, codebooks)
      .localCheckpoint(eager = false)
    PqIndex.adcServe(codes, normed, queryIds, None, codebooks, k, 0, refine)
  }

  /** IVF-PQ: the composed production index (FAISS's workhorse shape).
    * A coarse k-means quantizer routes every vector to a cell; PQ codes
    * compress it to m bytes; a query probes only its `nprobe` nearest
    * cells and ADC-scores the codes THERE — so per-query work is
    * ~nprobe/nlist of the corpus on m-byte codes, the posture that
    * serves billion-vector indexes from RAM. ADC shortlist re-ranks by
    * exact cosine like [[pqTopK]]. Deterministic end to end.
    * Approximate ⇒ rows-only; recall and the probed-fraction bound are
    * property-gated. */
  def ivfPqTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
      nlist: Int = 16, nprobe: Int = 6, m: Int = 8, ksub: Int = 32,
      refineIters: Int = 1, refine: Int = 8): DataFrame = {
    val normed = l2normalize(emb).localCheckpoint(eager = false)
    val centroids = kmeansCentroids(normed, nlist, refineIters)
    val codebooks = pqCodebooks(normed, m, ksub, refineIters)
    // index build: ONE narrow pass emits (vec_id, cell, m-byte codes);
    // the original floats leave the scoring path entirely. Scoring is
    // the shared single-pass broadcast-batch ADC path — cells probed by
    // cosine (the assignment metric), plan size independent of #queries
    val indexed = PqIndex.encode(normed, Some(centroids), codebooks)
      .localCheckpoint(eager = false)
    PqIndex.adcServe(indexed, normed, queryIds, Some(centroids),
      codebooks, k, nprobe, refine)
  }

  /** Deterministic k-means centroids: seeds are the `nlist` rows with the
    * smallest xxhash64(vec_id) (a hash-strided "sample" — reproducible,
    * no RNG state), refined by `refineIters` Lloyd steps. Each step is
    * ONE aggregation pass (argmin assign → per-cell per-dim mean) whose
    * result is O(nlist×dim) driver rows — centroid refinement scales
    * like any other sketch, never like the corpus.
    */
  def kmeansCentroids(emb: DataFrame, nlist: Int,
      refineIters: Int): Array[(Array[Float], Int)] = {
    var centroids = emb
      .select(col("vec_id"), col("embedding"), xxhash64(col("vec_id")).as("h"))
      .orderBy(col("h")).limit(nlist)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray).zipWithIndex
    (0 until refineIters).foreach { _ =>
      val dims = emb
        .withColumn("cell",
          element_at(nearestCells(centroids, col("embedding"), 1), 1))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cell"), col("dim")).agg(avg(col("v")).as("m"))
        .collect()
      val byCell = dims.groupBy(_.getInt(0))
      centroids = centroids.map { case (old, i) =>
        byCell.get(i) match {
          case Some(rows) =>
            val arr = old.clone()
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2).toFloat)
            (arr, i)
          case None => (old, i) // empty cell keeps its seed centroid
        }
      }
    }
    centroids
  }

  /** Cell ids of the `n` nearest centroids (cosine distance), as one
    * codegen'd expression: distances to all centroids → array_sort →
    * slice. Centroids are literal float arrays (broadcast in the plan).
    */
  private[ann] def nearestCells(centroids: Array[(Array[Float], Int)],
      v: Column, n: Int): Column = {
    val dists = array(centroids.map { case (c, i) =>
      struct((lit(1.0) - cosine(v, lit(c))).as("d"), lit(i).as("cell"))
    }: _*)
    slice(transform(array_sort(dists), s => s.getField("cell")), 1, n)
  }

  /** K-means cluster assignment (vec_id, cluster, centroid_cos) — the
    * curation workhorse (cluster-balanced mixing, SemDeDup pruning,
    * topic discovery). Assignment is a narrow map over the corpus
    * against literal centroids; no shuffle beyond the Lloyd passes in
    * [[kmeansCentroids]].
    */
  def kmeansAssign(emb: DataFrame, nlist: Int = 16,
      refineIters: Int = 2): DataFrame = {
    val centroids = kmeansCentroids(emb, nlist, refineIters)
    val dists = array(centroids.map { case (c, i) =>
      struct((lit(1.0) - cosine(col("embedding"), lit(c))).as("d"), lit(i).as("cell"))
    }: _*)
    val best = element_at(array_sort(dists), 1)
    emb.select(col("vec_id"),
      best.getField("cell").as("cluster"),
      round(lit(1.0) - best.getField("d"), 4).as("centroid_cos"))
  }

  /** Integer-exact Lloyd k-means centroids on the global 2^16 grid —
    * the ORACLE-GRADE twin of [[kmeansCentroids]] (whose float means
    * and hash seeding are engine-local): seeds are the `k` smallest
    * vec_id rows, every assignment is an exact-integer argmin
    * (‖c‖²−2·x·c on IntVecDot, ties → smallest cell), and every
    * centroid update is an exact per-dim integer sum with a truncating
    * integer mean (Java `/` == Spark IntegralDivide == DuckDB `//`),
    * so K Lloyd steps replay bit-identically in unrolled SQL CTEs (the
    * link_domain_rank discipline applied to clustering).
    *
    * Plan per step: ONE partial-aggregated pass (argmin map →
    * groupBy(cell, dim) sum/count) whose result is O(k×dim) driver
    * rows; centroids re-enter the next pass as plan literals. Empty
    * cells keep their previous centroid on both engines.
    */
  def kmeansExactCentroids(emb: DataFrame, k: Int, iters: Int)
      : Array[Array[Int]] = {
    import graft.functions.VectorExpressions.vec_q16
    // quantize + decode the source ONCE: the seed scan plus every
    // Lloyd iteration re-reads this frame, so without the checkpoint
    // the parquet decode and vec_q16 run (iters + 1) times
    val q = emb.select(col("vec_id"), vec_q16(col("embedding")).as("qe"))
      .localCheckpoint(eager = false)
    kmeansExactCentroidsQ(q, k, iters)
  }

  /** [[kmeansExactCentroids]] over a pre-quantized (vec_id, qe) frame —
    * callers that also consume the quantized vectors downstream
    * (assignment, within-cluster joins) pass their own checkpointed
    * frame so the corpus is decoded exactly once end-to-end. */
  private[graft] def kmeansExactCentroidsQ(q: DataFrame, k: Int, iters: Int)
      : Array[Array[Int]] = {
    require(k > 0 && iters >= 0)
    var cents: Array[Array[Int]] = q.orderBy(col("vec_id")).limit(k)
      .select(col("qe")).collect().map(_.getSeq[Int](0).toArray)
    if (iters == 0) return cents
    // Lloyd iterations as single-stage RDD jobs: mapPartitions holds a
    // k×dim long accumulator (assignment = the argminCellInt arithmetic
    // verbatim: d = Σc² − 2·⟨qe,c⟩ with the long dot converted to
    // double once, strict < keeps the smallest cell on ties), one
    // partial per partition, merged on the driver. Replaces the
    // per-iteration posexplode→groupBy(cell,d)→collect Catalyst job
    // (which exploded n·dim rows through a hash aggregate and paid a
    // planning+AQE round per iteration — 0.35 s/iter at sf0.1 for a
    // ~10 ms compute); iterations are inherently sequential, so the
    // per-step latency is what bounds training depth at any corpus
    // size. Sums are exact long arithmetic in both shapes — centroids
    // are bit-identical and every kmeans CTE oracle is unchanged. The
    // scan reads the same localCheckpoint blocks the seed job
    // materialized; partition count stays the table's own (AQE-sized).
    val qRdd = q.select(col("qe")).rdd.map(_.getSeq[Int](0).toArray)
    (1 to iters).foreach { _ =>
      val cl = cents
      val partials = qRdd.mapPartitions { it =>
        val kk = cl.length
        val dim = if (kk > 0) cl(0).length else 0
        val cc = cl.map(c => c.map(v => v.toLong * v).sum.toDouble)
        val sums = Array.fill(kk)(new Array[Long](dim))
        val ns = new Array[Long](kk)
        it.foreach { qe =>
          var bi = 0
          var bd = Double.PositiveInfinity
          var i = 0
          while (i < kk) {
            val c = cl(i)
            var dot = 0L
            var t = 0
            val n = math.min(qe.length, c.length)
            while (t < n) { dot += qe(t).toLong * c(t).toLong; t += 1 }
            val d = cc(i) - 2.0 * dot.toDouble
            if (d < bd) { bd = d; bi = i }
            i += 1
          }
          val s = sums(bi)
          ns(bi) += 1L
          var j = 0
          val m = math.min(qe.length, dim)
          while (j < m) { s(j) += qe(j); j += 1 }
        }
        Iterator.single((sums, ns))
      }.collect()
      val totS = Array.fill(cl.length)(new Array[Long](
        if (cl.isEmpty) 0 else cl(0).length))
      val totN = new Array[Long](cl.length)
      partials.foreach { case (sums, ns) =>
        var i = 0
        while (i < cl.length) {
          totN(i) += ns(i)
          val s = totS(i); val p = sums(i)
          var j = 0
          while (j < s.length) { s(j) += p(j); j += 1 }
          i += 1
        }
      }
      cents = cents.zipWithIndex.map { case (old, ci) =>
        if (totN(ci) == 0L) old
        else {
          val arr = old.clone()
          var j = 0
          while (j < arr.length) {
            arr(j) = (totS(ci)(j) / totN(ci)).toInt; j += 1
          }
          arr
        }
      }
    }
    cents
  }

  /** Exact-integer argmin cell: ‖x−cᵢ‖² ordering without the per-row qq
    * term (constant per row, so argmin and ties are unchanged). Scores
    * are exact ≤2^53 integers in doubles; ties break to the smallest
    * cell id — the cross-engine-stable rule.
    */
  private def argminCellInt(cents: Array[Array[Int]], qe: Column): Column = {
    import graft.functions.VectorExpressions.vec_dot_int
    val scored = array(cents.zipWithIndex.map { case (c, i) =>
      val cc = c.map(v => v.toLong * v).sum
      struct((lit(cc.toDouble) - lit(2.0) * vec_dot_int(qe, lit(c))).as("d"),
        lit(i).as("cell"))
    }: _*)
    element_at(array_sort(scored), 1).getField("cell")
  }

  /** K-means assignment under [[kmeansExactCentroids]]: (vec_id,
    * cluster, d2) with d2 the EXACT integer squared distance on the
    * 2^16 grid — fully oracled clustering (the rows-only
    * [[kmeansAssign]] keeps the float/hash-seeded surface; this is the
    * cross-engine-reproducible one). Scoring is a narrow codegen map
    * against literal centroids — zero data shuffle.
    */
  def kmeansExact(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    import graft.functions.VectorExpressions.{vec_q16, vec_dot_int}
    val q = emb.select(col("vec_id"), vec_q16(col("embedding")).as("qe"))
      .localCheckpoint(eager = false)
    val cents = kmeansExactCentroidsQ(q, k, iters)
    val scored = array(cents.zipWithIndex.map { case (c, i) =>
      val cc = c.map(v => v.toLong * v).sum
      struct((vec_dot_int(col("qe"), col("qe"))
          - lit(2.0) * vec_dot_int(col("qe"), lit(c))
          + lit(cc.toDouble)).as("d"),
        lit(i).as("cell"))
    }: _*)
    val best = element_at(array_sort(scored), 1)
    q.select(col("vec_id"),
      best.getField("cell").as("cluster"),
      best.getField("d").cast("long").as("d2"))
  }

  /** Centroid silhouette on the exact-integer grid — the cluster-
    * QUALITY audit beside [[kmeansExact]] (the simplified/centroid
    * silhouette every clustering dashboard reports, on SQUARED L2):
    * per vector, a = distance² to the nearest centroid (its
    * assignment), b = distance² to the second-nearest; s = (b−a)/b on
    * the 1e-4 grid by one integral division. All distances are exact
    * ≤2^53 integers on the 2^16 grid (the kmeansExact arithmetic), so
    * the per-cluster means replay bit-identically in SQL. One narrow
    * scoring pass against literal centroids + a cluster-sized agg. */
  def silhouetteExact(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    import graft.functions.VectorExpressions.{vec_q16, vec_dot_int}
    import graft.text.TextAnalysis.intDiv
    val q = emb.select(col("vec_id"), vec_q16(col("embedding")).as("qe"))
      .localCheckpoint(eager = false)
    val cents = kmeansExactCentroidsQ(q, k, iters)
    val qq = vec_dot_int(col("qe"), col("qe")).cast("long")
    val dists = array(cents.zipWithIndex.map { case (c, i) =>
      val cc = c.map(v => v.toLong * v).sum
      struct((qq - lit(2L) * vec_dot_int(col("qe"), lit(c)).cast("long")
        + lit(cc)).as("d"), lit(i).as("cell"))
    }: _*)
    val sorted = array_sort(dists)
    val own = element_at(sorted, 1)
    val second = element_at(sorted, 2)
    q.select(own.getField("cell").as("cluster"),
        own.getField("d").as("__a"), second.getField("d").as("__b"))
      .select(col("cluster"),
        intDiv((col("__b") - col("__a")) * lit(10000L),
          greatest(col("__b"), lit(1L))).as("__s"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        intDiv(sum(col("__s")), count(lit(1))).as("mean_s_e4"))
      .withColumn("mean_silhouette", col("mean_s_e4") / lit(10000.0))
  }

  /** SemDeDup with an EXACT integer threshold verdict: within-cluster
    * pairs (clusters from [[kmeansExactCentroids]]) flagged when
    * cos ≥ θn/θd — decided WITHOUT floats as
    * `dot > 0 ∧ θd²·dot² ≥ θn²·qq·cc` in decimal(38,0) (DuckDB:
    * HUGEINT), so the pair set is bit-reproducible across engines; the
    * float path ([[semanticDedupPairs]]) keeps the rounded-cosine
    * surface. Pair space is Σ|cluster|² — the join shuffles on the
    * cluster id only.
    */
  def semanticDedupExact(emb0: DataFrame, thetaNum: Int, thetaDen: Int,
      k: Int, iters: Int): DataFrame = {
    import graft.functions.VectorExpressions.{vec_q16, vec_dot_int}
    require(thetaNum > 0 && thetaDen > 0)
    val emb = graft.engine.Layout.ensureParallelism(emb0)
    // one decode+quantize for the seed scan, both Lloyd iterations,
    // AND both sides of the within-cluster self-join
    val q = emb.select(col("vec_id"), vec_q16(col("embedding")).as("qe"))
      .localCheckpoint(eager = false)
    val cents = kmeansExactCentroidsQ(q, k, iters)
    val assigned = q
      .withColumn("cluster", argminCellInt(cents, col("qe")))
      .withColumn("qq", vec_dot_int(col("qe"), col("qe")).cast("long"))
    // r16: the threshold check θd²·dot² ≥ θn²·qqa·qqb runs once per
    // CANDIDATE PAIR; the decimal(38,0) form it replaces materialized
    // three java.math.BigDecimal products per pair (precision-38
    // decimals are BigDecimal-backed — the repo-measured hot-path
    // trap). Cos2ThresholdGe compares the same exact integers in
    // 128-bit arithmetic — bit-identical booleans, and the oracle's
    // HUGEINT replay is unchanged.
    assigned.hint("shuffle_merge").as("a")
      .join(assigned.hint("shuffle_merge").as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot_q", vec_dot_int(col("a.qe"), col("b.qe")).cast("long"))
      .filter(col("a.qq") > 0L && col("b.qq") > 0L && col("dot_q") > 0L &&
        graft.functions.VectorExpressions.cos2_threshold_ge(
          col("dot_q"), col("a.qq"), col("b.qq"),
          thetaNum.toLong, thetaDen.toLong))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("a.cluster").as("cluster"), col("dot_q"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    * corpus by k-means, then mine near-duplicate pairs only WITHIN each
    * cluster — the candidate join is keyed on the cluster id, so the
    * pair space is Σ|cluster|² instead of n². Precision is exact (every
    * emitted pair passes the true cosine threshold); recall misses only
    * pairs split across clusters, which shrinks as the threshold rises
    * (true near-dups land in the same cell). The hyperplane-LSH path
    * ([[nearDupPairsLsh]]) is the recall-guaranteed alternative; this is
    * the one that also yields the cluster structure for curation.
    */
  def semanticDedupPairs(emb0: DataFrame, threshold: Double,
      nlist: Int = 16, refineIters: Int = 2): DataFrame = {
    val emb = graft.engine.Layout.ensureParallelism(emb0)
    val centroids = kmeansCentroids(emb0, nlist, refineIters)
    val assigned = emb.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nm"),
      element_at(nearestCells(centroids, col("embedding"), 1), 1).as("cluster"))
    // within-cluster self-join: shuffle on the cluster id; both sides
    // hinted so the exchange is built once and reused
    assigned.hint("shuffle_merge").as("a")
      .join(assigned.hint("shuffle_merge").as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(cosinePre(col("a.embedding"), col("b.embedding"),
          col("a.nm"), col("b.nm")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** IVF (inverted-file) ANN: corpus is partitioned into `nlist` cells
    * by nearest centroid (the index build — at scale, a one-time
    * bucketed write); queries probe the `nprobe` nearest cells only.
    * Centroid build: [[kmeansCentroids]].
    */
  /** Coarse centroids of the most recent [[ivfTopK]] call in this JVM —
    * the dump-time oracle render reads them (the PqIndex.lastSide
    * pattern): training is trusted as pinned literals, the whole serve
    * (cell assignment, probing, cosine ranking) replays independently.
    */
  @volatile private[graft] var lastIvfCentroids
      : Option[Array[(Array[Float], Int)]] = None

  /** True once two DIFFERENT centroid sets were stashed in this JVM —
    * the dump-time render then declines the oracle and the property
    * gate takes over (the PqIndex.sideConflict rule). */
  @volatile private[graft] var ivfConflict: Boolean = false

  private def stashIvfCentroids(c: Array[(Array[Float], Int)]): Unit =
    this.synchronized {
      if (lastIvfCentroids.exists(old => old.length != c.length ||
          old.indices.exists(i => old(i)._2 != c(i)._2 ||
            !java.util.Arrays.equals(old(i)._1, c(i)._1))))
        ivfConflict = true
      lastIvfCentroids = Some(c)
    }

  def ivfTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
      nlist: Int = 16, nprobe: Int = 4, refineIters: Int = 1): DataFrame = {
    val centroids = kmeansCentroids(emb, nlist, refineIters)
    stashIvfCentroids(centroids)
    def nearestCells(v: Column, n: Int): Column =
      Similarity.nearestCells(centroids, v, n)
    val corpus = emb
      .withColumn("cell", element_at(nearestCells(col("embedding"), 1), 1))
      .select(col("vec_id"), col("embedding"), col("cell"))
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(nearestCells(col("embedding"), nprobe)).as("q_cell"))
    val scored = corpus
      .join(broadcast(queries),
        col("cell") === col("q_cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
    scored
      .withColumn("rank",
        row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold. Exact
    * (all-pairs) declaration for the oracle; the LSH variant above is the
    * scale path. The self-join is keyed a<b to halve the work.
    */
  def nearDupPairs(emb0: DataFrame, threshold: Double, dim: Int = 64): DataFrame = {
    // The streamed side of the pair loop must be split across cores: a
    // single-row-group parquet scans as one task, serializing the O(n²)
    // dot loop (ParallelizerMap; no-op on well-partitioned input).
    val emb = graft.engine.Layout.ensureParallelism(emb0)
    // Precompute each row's norm once (O(n)), so the O(n²) pair loop is
    // just a codegen'd dot loop + one divide per pair.
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
      norm(col("embedding")).as("na"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
      norm(col("embedding")).as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosinePre(col("ea"), col("eb"), col("na"), col("nb")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Bucketed embedding near-dup: hyperplane-LSH banding → candidate
    * pairs → exact cosine verify — the 100 TB path, mirroring
    * Dedup.minhashLshPairs (candidates only, never all pairs).
    *
    * Each of `bands` independent LSH tables hashes every vector to a
    * `planes`-bit bucket (one HyperplaneBandKeys expression: the whole
    * bands×planes projection is a single primitive loop per row);
    * vectors colliding in any table become candidates (hot-bucket
    * df-cut, then an equal-sided shuffle self-join on (band, bucket) —
    * the same `shuffle_merge` guard as text LSH, since the exploded
    * side must never be broadcast; see the inline note for the A/B
    * against bounded-postings pair generation). Exact verification
    * keeps precision at 1; candidate pairs DEDUP BEFORE the verify
    * joins — true pairs collide in ~every band, so the raw stream
    * carries each real pair O(bands) times and one distinct shuffle of
    * the id pairs costs less than verifying the multiplicity (see the
    * inline A/B note at the cand block).
    *
    * Candidate recall at angle θ is 1-(1-(1-θ/π)^planes)^bands: the
    * planes=7/bands=128 defaults give ≥0.994 at cos=0.4 (per band
    * p=0.631⁷≈0.040, miss e⁻⁵·²) while random pairs collide at only
    * 128/2⁷ ≈ 1 band on average — the planes/bands pair trades hash work against
    * candidate volume at a fixed recall.
    *
    * `planes <= 0` / `bands <= 0` (the defaults) self-tune: planes from
    * [[autoPlanes]] (one count(); ~log₂(n), so buckets stay small as the
    * corpus grows) and bands from [[autoBands]] (recall re-pinned at
    * ≥0.993 for pairs at `threshold`). Explicit values override both —
    * the sf0.01 auto choice (7/125) ≈ the old fixed defaults (7/128).
    *
    * `carryVectors` picks the physical shape of the verify stage.
    * Default (false): band on ids only, dedup candidate pairs, fetch
    * vectors with two joins — right when true near-dups dominate the
    * candidate stream (high θ), because each real pair collides in
    * O(bands) tables and the distinct collapses that multiplicity before
    * any vector bytes move. True: the band shuffle carries the vectors
    * and the exact cosine evaluates INSIDE the self-join projection, with
    * the distinct deferred to the (tiny) surviving pair set — right in
    * the low-θ/dense-candidate regime, where unique candidates approach
    * all-pairs (measured θ=0.4 multiplicity 2.1: the pair-distinct
    * shuffle plus two pair-sized fetch joins move far more bytes than
    * banding × dim ever does). Same pair set either way — only the plan
    * changes (A/B at sf0.1 θ=0.4: 2.7 s → 1.3–1.8 s).
    */
  def nearDupPairsLsh(emb0: DataFrame, threshold: Double, dim: Int = 64,
      planes: Int = 0, bands: Int = 0, nEstimate: Long = 0L,
      maxBucket: Int = 10000, targetBucket: Long = 64L,
      carryVectors: Boolean = false): DataFrame = {
    // nEstimate > 0 sizes the auto-tuning without the eager count() job
    val np = if (planes > 0) planes
      else autoPlanes(if (nEstimate > 0) nEstimate else emb0.count(), targetBucket)
    val nb = if (bands > 0) bands else autoBands(np, threshold)
    // only the banding side needs spread-out parallelism (65k mults/row);
    // the verify side feeds a hash-relation build, so it reads the scan
    // directly — two fewer round-robin exchanges
    val emb = graft.engine.Layout.ensureParallelism(emb0)
    if (carryVectors) {
      // dense-candidate shape: vectors ride the band shuffle, the exact
      // cosine runs inside the self-join's codegen projection (the 3.3M
      // candidate rows never materialize), and the only pair-keyed
      // shuffle left is the distinct over ACCEPTED pairs
      val banded = emb.select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nm"),
        posexplode(graft.functions.VectorExpressions.band_keys(
          col("embedding"), dim, np, nb)).as(Seq("band", "bucket")))
      val kept = if (maxBucket <= 0) banded else {
        val hot = banded.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("__c")).filter(col("__c") > maxBucket)
          .select(col("band"), col("bucket"))
        banded.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
      }
      return kept.hint("shuffle_merge").as("a")
        .join(kept.hint("shuffle_merge").as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          round(cosinePre(col("a.embedding"), col("b.embedding"),
            col("a.nm"), col("b.nm")), 4).as("cos"))
        .filter(col("cos") >= threshold)
        .distinct()
    }
    val withNorm = emb0.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nm"))
    // no checkpoint: the hot-list count and both self-join sides are
    // identical subplans over this narrow map, so ReuseExchange
    // materializes the banding exchange once at runtime (an explicit
    // localCheckpoint was A/B'd and only added a blocking job)
    val banded = emb.select(col("vec_id"),
      posexplode(graft.functions.VectorExpressions.band_keys(
        col("embedding"), dim, np, nb)).as(Seq("band", "bucket")))
    // Hot-bucket cut BEFORE the self-join: a hyperplane cell holding
    // >maxBucket vectors (degenerate region — mass-duplicate or zero-ish
    // embeddings at corpus scale) would contribute m² candidates per
    // band while discriminating nothing; any true near-dup pair it
    // witnesses is near-certainly witnessed again by the other band
    // tables (recall is per-band independent). One map-side-combined
    // count pass → tiny hot list → broadcast anti-join, the identical
    // df-cut shape as jaccardPairs' maxShingleDocs. (A bounded-postings
    // aggregation with row-local pair generation was A/B'd here: the
    // higher-order pair-gen evaluates interpreted and measured 2.5×
    // slower than the codegen'd sort-merge join at equal output.)
    // maxBucket <= 0 skips the hot-cut machinery (one agg + anti-join,
    // ~2 stages): for a corpus whose bucket sizes are already bounded
    // by construction (fine planes via targetBucket), the safety valve
    // costs more than it saves — callers at open-ended scale keep it
    val kept = if (maxBucket <= 0) banded else {
      val hot = banded.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("__c")).filter(col("__c") > maxBucket)
        .select(col("band"), col("bucket"))
      banded.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    }
    // the shuffle_merge hint sits on BOTH sides: one-sided hints make
    // the subplans canonically different and defeat ReusedExchange, so
    // the banding projection would run twice
    // candidate pairs DEDUP BEFORE the verify joins: a true near-dup
    // pair collides in ~every band (per-band p ≈ (1−θ/π)^planes is
    // large above the threshold), so in the dup-heavy corpora this
    // operator exists for, the raw candidate stream carries each real
    // pair O(bands) times — at the planted-fixture profile the stream
    // was 1.07 M rows for ~150 k unique pairs, and the two verify
    // joins dominated the query. One distinct shuffle of the (long,
    // long) id pairs costs less than verifying the multiplicity
    // (A/B'd: 2.0 s → 1.0 s on the θ=0.7 fixture; the old
    // distinct-after form only wins when multiplicity ≈ 1, i.e. when
    // there is nothing to deduplicate).
    val cand = kept.hint("shuffle_merge").as("a")
      .join(kept.hint("shuffle_merge").as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    // verify-join strategy left to AQE (broadcast when the vector table
    // fits, shuffle when it doesn't — forcing broadcast would OOM at
    // corpus scale, exactly as in Dedup.minhashLshPairs's verify)
    cand
      .join(withNorm.as("x"), col("id_a") === col("x.vec_id"))
      .join(withNorm.as("y"), col("id_b") === col("y.vec_id"))
      .select(col("id_a"), col("id_b"),
        round(cosinePre(col("x.embedding"), col("y.embedding"),
          col("x.nm"), col("y.nm")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Per-vector int8 scalar quantization: scale = max|x|/127, q_i =
    * floor(x_i/scale + 0.5) ∈ [-127, 127]. 4× smaller vector storage —
    * at corpus scale the difference between shuffling 100 TB and 25 TB of
    * embeddings — at ~0.1% cosine error (gated in PipelineSpec). Pure
    * array expressions (narrow, codegen'd); floor(x+0.5) instead of
    * round() because engines disagree on round-half of doubles, and the
    * quantizer must be bit-reproducible anywhere.
    */
  def quantizeInt8Scale(emb: Column): Column = {
    val mx = array_max(transform(emb, x => abs(x))).cast("double")
    when(mx === 0.0, lit(1.0)).otherwise(mx / lit(127.0))
  }

  def quantizeInt8(emb: Column, scale: Column): Column =
    transform(emb, x => floor(x.cast("double") / scale + lit(0.5)).cast("int"))

  /** Dequantized vector (array<double>) from (q, scale). */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Brute-force top-k over int8-quantized vectors. The per-vector
    * scale cancels in cosine (cos(s_a·qa, s_b·qb) = cos(qa, qb)), so
    * the quantized score is arithmetic on small integers — every sum is
    * exact in double regardless of accumulation order, making the score
    * bit-reproducible across engines (float cosines are not). At corpus
    * scale this is the bandwidth win: the ANN scan reads 1/4 the bytes
    * of the float32 corpus for ~1e-3 score error (recall gated vs the
    * exact ranking in PipelineSpec). Same bounded-heap GroupTopK plan
    * as the full-precision path.
    */
  def quantizedTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    // quantization is ONE codegen'd primitive loop per row
    // (functions.Int8Quantize — bit-identical to the higher-order
    // transform form, which evaluated interpreted and dominated the
    // whole scan); the codes stay array<int> end-to-end:
    // IntVecDot/IntVecNorm accumulate the ≤127-magnitude codes in an
    // exact long, so there is no per-row float-array rematerialization
    // and the score is still bit-reproducible
    val qcodes = graft.functions.VectorExpressions.vec_quantize_int8(col("embedding"))
    val quant = emb.select(col("vec_id"), qcodes.as("qe"))
    val q = quant.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("qe").as("q_emb"))
    import graft.functions.VectorExpressions.{vec_dot_int, vec_norm_int}
    val scored = quant.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (vec_dot_int(col("q_emb"), col("qe")) /
          (vec_norm_int(col("q_emb")) * vec_norm_int(col("qe")))).as("cos"))
    graft.plans.GroupTopK.groupTopK(scored, Seq("query_id"),
        Seq(("cos", false), ("neighbor_id", true)), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Quantization report per vector: the scale plus summary stats of the
    * quantized codes — scalar columns so any engine reproduces them
    * exactly (array-typed outputs don't hash stably across engines).
    */
  def quantizeReport(emb: DataFrame): DataFrame = {
    val scale = quantizeInt8Scale(col("embedding"))
    val q = quantizeInt8(col("embedding"), scale)
    emb.select(
      col("vec_id"),
      scale.as("scale"),
      aggregate(q, lit(0L), (a, x) => a + x).as("q_sum"),
      array_min(q).as("q_min"),
      array_max(q).as("q_max"))
  }
}
