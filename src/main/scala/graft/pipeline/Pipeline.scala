package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline staples beyond the reference's surface:
  * deterministic corpus shuffling, hash-based dataset splits, and
  * token-budget sequence packing. All engine-portable (md5-derived
  * hashes, no RNG) so every one is oracle-checkable.
  *
  * Scale posture: no operation here funnels the corpus through a single
  * partition. Global ranks and global prefix sums are decomposed into
  * hash/range buckets + per-bucket windows + a driver-sized offset table
  * (O(#buckets) rows collected, like the reference's root-side monoid
  * merge) — the distributed-rank shape that survives 100 TB.
  */
object Pipeline {

  /** 60-bit engine-portable hash of a key column (same md5-prefix trick
    * as SimHash token hashes: identical in Spark and DuckDB SQL).
    */
  private def keyHash(key: Column): Column =
    // one kernel call (thread-local digest, 60 bits straight off the
    // digest bytes) — bit-identical to the Column chain
    // conv(substring(md5(...),1,15),16,10) it replaces, which paid a
    // fresh MessageDigest + 32-char hex render + base-16 parse per row
    graft.functions.SimHashExpression.md5Long60(key.cast("string"))

  /** Deterministic global shuffle: rank every row by a hash of its key.
    * The standard "shuffle the corpus before training" pass.
    *
    * Distributed form: the 60-bit key hash is uniform, so equal-width
    * hash ranges make a deterministic range partitioning (no sampled
    * boundaries, no `Window.orderBy` single-partition funnel). Global
    * rank = per-bucket rank (window partitioned by bucket) + the bucket's
    * prefix-sum offset. The offsets come from one count-by-bucket pass
    * whose result is O(nBuckets) — driver-sized, broadcast back.
    * Two column-pruned scans total; every task handles ~N/nBuckets rows.
    */
  def deterministicShuffle(df: DataFrame, key: Column, nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      "nBuckets must be a power of two (exact 2^60 range split)")
    val spark = df.sparkSession
    import spark.implicits._
    val step = (1L << 60) / nBuckets
    val withB = df
      .withColumn("__h", keyHash(key))
      .withColumn("__k", key.cast("string"))
      .withColumn("__b", (col("__h") / lit(step)).cast("int"))
    // bucket sizes → prefix-sum offsets, computed at the driver over
    // O(nBuckets) rows (bounded like any sketch result)
    val counts = withB.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }
      .init.zip(counts).map { case ((_, off), (b, _)) => (b, off) }
    val offDf = broadcast(offsets.toSeq.toDF("__b", "__off"))
    val wLocal = Window.partitionBy(col("__b")).orderBy(col("__h"), col("__k"))
    withB
      .join(offDf, Seq("__b"))
      .withColumn("shuffle_rank",
        (col("__off") + row_number().over(wLocal)).cast("int"))
      .drop("__h", "__k", "__b", "__off")
  }

  /** Curriculum ordering (Bengio et al. 2009 as a corpus op): a global
    * training order that walks the curriculum stages in sequence —
    * every stage-0 row before every stage-1 row — and is a seeded
    * deterministic shuffle WITHIN each stage (hash order, so epoch
    * order is reproducible and engine-portable).
    *
    * Distributed form: the [[deterministicShuffle]] shape lifted to the
    * composite key (stage, hash-bucket) — per-(stage, bucket) window
    * ranks plus a driver-sized offset table ordered stage-major. No
    * global sort, no single-partition window; every task handles
    * ~N/(stages × nBuckets) rows at any corpus size.
    */
  def curriculumOrder(df: DataFrame, key: Column, stage: Column,
      nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      "nBuckets must be a power of two (exact 2^60 range split)")
    val spark = df.sparkSession
    import spark.implicits._
    val step = (1L << 60) / nBuckets
    val withB = df
      .withColumn("stage", stage.cast("int"))
      .withColumn("__h", keyHash(key))
      .withColumn("__k", key.cast("string"))
      .withColumn("__b", (col("__h") / lit(step)).cast("int"))
    val counts = withB.groupBy(col("stage"), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      .sortBy(_._1)
    val offsets = counts.scanLeft(((0, 0), 0L)) {
      case ((_, acc), (sb, n)) => (sb, acc + n)
    }.init.zip(counts).map { case ((_, off), ((st, b), _)) => (st, b, off) }
    val offDf = broadcast(offsets.toSeq.toDF("stage", "__b", "__off"))
    val wLocal = Window.partitionBy(col("stage"), col("__b"))
      .orderBy(col("__h"), col("__k"))
    withB
      .join(offDf, Seq("stage", "__b"))
      .withColumn("curriculum_rank",
        (col("__off") + row_number().over(wLocal)).cast("int"))
      .drop("__h", "__k", "__b", "__off")
  }

  /** Length-grouped batching (the dynamic-batching / "sorted batching"
    * trick every padded-training loader runs): sequences are grouped
    * into length BINS (`bin = n_tokens / binWidth`), sharded by key
    * hash, and cut into batches of `batchSize` in deterministic hash
    * order within each (bin, shard). One row per BATCH with its padding
    * economics: `pad_tokens = n_seqs × max_tokens − sum_tokens` is
    * exactly the compute wasted on pad positions if this batch is
    * padded to its longest member.
    *
    * Batches form within (bin, shard) — the semantics of a distributed
    * data loader, where each worker batches its own shard — so the
    * data-sized window runs at bins × shards parallelism and nothing
    * corpus-sized funnels through one task. The per-batch aggregate is
    * partial (map-side combine) on the same (bin, shard) keys.
    */
  def lengthBatches(df: DataFrame, key: Column, nTokens: Column,
      binWidth: Long, batchSize: Int, nShards: Int = 16): DataFrame = {
    require(binWidth > 0 && batchSize > 0 && nShards > 0)
    require((nShards & (nShards - 1)) == 0,
      "nShards must be a power of two (exact 2^60 range split)")
    val step = (1L << 60) / nShards
    val withB = df
      .withColumn("__n", nTokens.cast("long"))
      .withColumn("bin", graft.text.TextAnalysis.intDiv(col("__n"), lit(binWidth)))
      .withColumn("__h", keyHash(key))
      .withColumn("__k", key.cast("string"))
      .withColumn("shard", (col("__h") / lit(step)).cast("int"))
    val wLocal = Window.partitionBy(col("bin"), col("shard"))
      .orderBy(col("__h"), col("__k"))
    withB
      .withColumn("batch",
        graft.text.TextAnalysis.intDiv(
          (row_number().over(wLocal) - 1).cast("long"), lit(batchSize.toLong)))
      .groupBy(col("bin"), col("shard"), col("batch"))
      .agg(count(lit(1)).cast("long").as("n_seqs"),
        max(col("__n")).as("max_tokens"),
        sum(col("__n")).as("sum_tokens"))
      .withColumn("pad_tokens",
        col("n_seqs") * col("max_tokens") - col("sum_tokens"))
  }

  /** Deterministic Bernoulli sample: keep a row iff its key hash lands
    * in the first `basisPoints`/10000 of the hash range. Unlike seeded
    * RNG sampling this is reproducible across engines AND stable under
    * any partitioning or re-run — the oracled twin of the seeded
    * `sample()` surface, and the right default when a sample must be
    * consistent between pipeline stages (the same doc is in or out
    * everywhere its key appears).
    */
  def hashSample(df: DataFrame, key: Column, basisPoints: Int): DataFrame = {
    require(basisPoints >= 0 && basisPoints <= 10000, "basisPoints in [0,10000]")
    df.filter(pmod(keyHash(key), lit(10000L)) < basisPoints)
  }

  /** Hash split: assign each row to train/test by key hash — stable
    * under any partitioning, reproducible across engines and runs,
    * leak-free as long as the key identifies the leakage unit.
    */
  def hashSplit(df: DataFrame, key: Column, trainPct: Int): DataFrame =
    df.withColumn("split",
      when(pmod(keyHash(key), lit(100L)) < trainPct, lit("train"))
        .otherwise(lit("test")))

  /** Three-way train/val/test assignment from the same stable key hash
    * (the 80/10/10 convention): percentile bands over md5-60bit mod
    * 100 — adding data never moves an existing row's split. */
  def hashSplit3(df: DataFrame, key: Column, trainPct: Int,
      valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100)
    val h = pmod(keyHash(key), lit(100L))
    df.withColumn("split",
      when(h < trainPct, lit("train"))
        .when(h < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Token-budget sequence packing: within each group, documents are
    * laid out in `order` and cut into contiguous bins of ~`budget`
    * tokens (bin = floor(preceding-token-count / budget) — fixed-
    * boundary packing, the shuffle-free approximation of greedy
    * first-fit).
    *
    * Two-level distributed form (groups can be few — e.g. two splits —
    * so a per-group window would sort each group's whole corpus share in
    * one task): rows are sub-bucketed by an equal-width range over the
    * numeric `order` key (monotone in the order, so prefix sums
    * compose); the cumulative count = per-(group, sub) window + a
    * per-(group, sub) offset from one aggregate pass. The offset frame
    * is O(#groups × nSub) — driver-sized; the data-sized window runs at
    * #groups × nSub parallelism. Output is bit-identical to the
    * single-window form.
    */
  def packSequences(docs: DataFrame, group: Column, order: Column,
      nTokens: Column, budget: Long, nSub: Int = 32): DataFrame = {
    val outCols = docs.columns
    // the order-key extent rides in as a broadcast 1-row aggregate
    // (NOT an eager .head() at construction time — that serialized an
    // extra full pass before the real job and made the function
    // non-composable lazily); the filter on __lo keeps the old
    // empty-result semantics when the order column is entirely null
    val mm = docs.agg(min(order.cast("double")).as("__lo"),
      max(order.cast("double")).as("__hi"))
    val sub: Column =
      when(col("__hi") === col("__lo"), lit(0))
        .otherwise(least(
          floor((order.cast("double") - col("__lo")) /
            ((col("__hi") - col("__lo")) / nSub)),
          lit(nSub - 1)))
        .cast("int")
    val withS = docs
      .crossJoin(broadcast(mm))
      .filter(col("__lo").isNotNull)
      .withColumn("__g", group)
      .withColumn("__s", sub)
      .withColumn("__n", nTokens)
    // per-(group, sub-bucket) token totals → per-group running offsets;
    // the window here runs over the aggregate (≤ nSub rows per group),
    // not the data
    val offs = withS.groupBy(col("__g"), col("__s")).agg(sum(col("__n")).as("__t"))
      .withColumn("__off", coalesce(
        sum(col("__t")).over(Window.partitionBy(col("__g")).orderBy(col("__s"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__g").as("__g2"), col("__s").as("__s2"), col("__off"))
    val wLocal = Window.partitionBy(col("__g"), col("__s")).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withS
      .join(broadcast(offs),
        col("__g") === col("__g2") && col("__s") === col("__s2"))
      .withColumn("__cum", col("__off") + sum(col("__n")).over(wLocal))
      .withColumn("bin", floor((col("__cum") - col("__n")) / lit(budget)))
      .select((outCols.map(col) :+ col("bin")): _*)
  }

  /** Token-budget corpus mixing: from each source take documents in
    * deterministic hash order until that source's token budget is
    * exhausted — the "mix N tokens of web + M of code" step of training
    * prep, reproducible across runs and engines (md5 order, no RNG).
    * Sources without a budget are dropped. Greedy prefix: a document is
    * kept iff the running token total INCLUDING it stays ≤ budget.
    *
    * Scale shape: the naive form is one Window over each source's whole
    * corpus share. Here the hash order is sub-bucketed by its top bits
    * (uniform → equal-width ranges compose in order), per-(source,sub)
    * token subtotals aggregate first, a window over that O(sources×nSub)
    * aggregate yields running offsets, and the data-sized window runs at
    * sources×nSub parallelism — same two-level prefix-sum contract as
    * [[packSequences]], bit-identical to the single-window form.
    */
  def corpusMix(docs: DataFrame, key: Column, source: Column, nTokens: Column,
      budgets: Map[String, Long], nSub: Int = 32): DataFrame = {
    require(budgets.nonEmpty, "need at least one source budget")
    val outCols = docs.columns
    val step = (1L << 60) / nSub
    val budgetCol = element_at(
      map(budgets.toSeq.flatMap { case (s, b) => Seq(lit(s), lit(b)) }: _*),
      source)
    val withS = docs
      .withColumn("__bud", budgetCol)
      .filter(col("__bud").isNotNull)
      .withColumn("__h", keyHash(key))
      .withColumn("__k", key.cast("string"))
      .withColumn("__g", source)
      // double division of a 60-bit hash can be one ulp off near bucket
      // boundaries (see RangeJoin.binOf), but here only MONOTONICITY of
      // h -> bucket matters: every row uses the same expression, so the
      // (bucket, h) order equals the h order and the prefix sums are
      // exact regardless of which side of a boundary a hash rounds to
      .withColumn("__s", (col("__h") / lit(step)).cast("int"))
      .withColumn("__n", nTokens.cast("long"))
    val offs = withS.groupBy(col("__g"), col("__s")).agg(sum(col("__n")).as("__t"))
      .withColumn("__off", coalesce(
        sum(col("__t")).over(Window.partitionBy(col("__g")).orderBy(col("__s"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__g").as("__g2"), col("__s").as("__s2"), col("__off"))
    val wLocal = Window.partitionBy(col("__g"), col("__s"))
      .orderBy(col("__h"), col("__k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withS
      .join(broadcast(offs),
        col("__g") === col("__g2") && col("__s") === col("__s2"))
      .withColumn("__cum", col("__off") + sum(col("__n")).over(wLocal))
      .filter(col("__cum") <= col("__bud"))
      .select((outCols.map(col) :+ col("__cum").as("cum_tokens")): _*)
  }

  /** Temperature-based source mixing (the multilingual-corpus
    * rebalancing rule, p_s ∝ n_s^α at α = 1/2): big sources thin by
    * √(n_ref/n_s) (n_ref = the smallest source, whose keep-rate is 1),
    * so after mixing the source shares follow the α = 0.5 temperature
    * curve. Deterministic hash thinning (md5 key order — the same
    * engine-portable coin as [[hashSample]]), so the draw reproduces
    * anywhere and the oracle can replay it exactly.
    *
    * The exponent is computed as a plain `sqrt` — IEEE-correctly
    * rounded in every engine, unlike `pow(x, 0.5)` whose libm is not
    * guaranteed to match across platforms; an engine-unstable rate at
    * a floor boundary would silently keep different rows. (That is
    * also why a generic-α variant is not declared: pow is not
    * oracle-stable.)
    *
    * Scale shape: one count-by-source pass (driver-sized result, the
    * rate table broadcasts back), then a narrow filter — no shuffle of
    * the corpus. The rate-table window runs over O(#sources) rows.
    */
  def temperatureMix(docs: DataFrame, key: Column, source: Column,
      modulus: Int = 10000, weight: Option[Column] = None): DataFrame = {
    val outCols = docs.columns
    // weight = Some(tokenCount): rebalance on TOKEN MASS instead of doc
    // counts — the real temperature-sampling currency (a source of few
    // long docs and one of many short docs have the same training
    // weight only in tokens). Exact long sums keep the rate table
    // oracle-stable either way.
    val counts = (weight match {
      case Some(w) => docs.groupBy(source.as("__src"))
        .agg(sum(w.cast("long")).as("__n"))
      case None => docs.groupBy(source.as("__src")).agg(count(lit(1)).as("__n"))
    // a source with rows but ZERO total mass (possible only on the
    // weighted path) has nothing to sample AND would poison every
    // other source's rate (nref = 0 ⇒ all cuts 0; its own rate is
    // 0/0 = NaN). Dropped from the mix — the count path can't hit this
    }).filter(col("__n") > 0L)
    // keep-rate in exact integer thousandths of the modulus:
    // floor(sqrt(nRef/n) * modulus); nRef via a bounded window over the
    // O(#sources) aggregate
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val rates = counts
      .withColumn("__nref", min(col("__n")).over(wAll))
      .withColumn("__cut",
        floor(sqrt(col("__nref").cast("double") / col("__n")) * modulus)
          .cast("long"))
      .select(col("__src"), col("__cut"))
    docs
      // null-safe: a null source is its own group with its own rate —
      // an equi-join would silently DELETE every null-source row
      .join(broadcast(rates), source <=> col("__src"))
      .filter(pmod(keyHash(key), lit(modulus.toLong)) < col("__cut"))
      .select(outCols.map(col): _*)
  }

  /** Water-filling mixture allocation — the per-source EPOCH-CAP
    * sampling design of LLaMA/GPT-style training mixes: every source
    * samples at the same waterline λ (epochs, on the exact 1e-4 grid)
    * except where its per-source cap binds (a small curated source may
    * repeat up to cap epochs; a huge crawl source soaks up the rest of
    * the budget at λ < its cap). CLOSED FORM, no iteration: sort
    * sources by (cap, source); a source is capped iff the waterline
    * computed with every smaller-cap source already capped reaches its
    * cap — if source j is UNcapped (cap_j > λ_j) then
    * λ_{j+1} = (R − cap_j·T_j)/(S − T_j) < λ_j < cap_j ≤ cap_{j+1},
    * so every later source is uncapped too: the capped set is a
    * PREFIX, and the first uncapped row's λ is the global waterline
    * (the maximum λ among uncapped rows). All arithmetic is exact
    * integer (tokens, caps·tokens on the 1e-4 grid, IntegralDivide),
    * so both engines floor identically at every boundary.
    *
    * Scale: ONE token-count scan; every window runs over the
    * O(#sources) aggregate (the temperatureMix rate-table shape) —
    * nothing corpus-sized moves. Emits per source: tokens, cap,
    * allocated tokens, achieved epochs.
    */
  def waterfillMix(docs: DataFrame, budgetTokens: Long,
      capsE4: Map[String, Long], defaultCapE4: Long): DataFrame = {
    require(budgetTokens >= 0 && defaultCapE4 >= 0 &&
      capsE4.values.forall(_ >= 0))
    val t = docs
      .select(col("source"),
        size(filter(split(lower(col("text")), " "), w => w =!= ""))
          .cast("long").as("__nt"))
      .groupBy(col("source")).agg(sum(col("__nt")).as("tokens"))
      .filter(col("tokens") > 0L)
    val capCol = capsE4.toSeq.sortBy(_._1).foldLeft(lit(defaultCapE4)) {
      case (acc, (s, c)) => when(col("source") === s, lit(c)).otherwise(acc)
    }
    val w = Window.orderBy(col("cap_e4"), col("source"))
    def idiv(n: Column, d: Column): Column =
      org.apache.spark.sql.graftshim.exprToColumn(
        new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.graftshim.columnToExpr(n),
          org.apache.spark.sql.graftshim.columnToExpr(d)))
    val pre = t.select(col("source"), col("tokens"), capCol.as("cap_e4"))
      .withColumn("__cap_alloc", idiv(col("cap_e4") * col("tokens"), lit(10000L)))
      .withColumn("__cum_before", coalesce(
        sum(col("__cap_alloc")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__suffix_t",
        sum(col("tokens")).over(w.rowsBetween(0, Window.unboundedFollowing)))
      // λ assuming every smaller-cap source capped; past the crossover
      // the numerator can go negative — clamp (those rows are uncapped
      // and take the global waterline below)
      .withColumn("__lam", idiv(
        greatest(lit(budgetTokens) - col("__cum_before"), lit(0L)) * lit(10000L),
        col("__suffix_t")))
      .withColumn("__capped", col("__lam") >= col("cap_e4"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    pre
      .withColumn("__lam_fin",
        max(when(!col("__capped"), col("__lam"))).over(wAll))
      .select(col("source"), col("tokens"), col("cap_e4"),
        when(col("__capped"), col("__cap_alloc"))
          .otherwise(idiv(col("__lam_fin") * col("tokens"), lit(10000L)))
          .as("alloc_tokens"))
      .withColumn("epochs_e4", idiv(col("alloc_tokens") * lit(10000L),
        col("tokens")))
  }

  /** Distributed full-batch logistic-regression training — the
    * "train the fastText-style quality classifier inside the engine"
    * step (label = curated/uncurated, features = the cheap text
    * signals): every gradient iteration is ONE partial-aggregated pass
    * computing Σ(σ(w·x)−y)·x_i per feature plus the log-loss, with the
    * current weights as plan LITERALS (the k-means/Lloyd shape —
    * O(iters) jobs, O(#features) driver state, nothing corpus-sized
    * leaves the executors). Features are standardized by a first
    * moments pass so a unit learning rate is stable.
    *
    * Returns (weights with bias first in STANDARDIZED feature space,
    * per-iteration losses, feature means, feature stds) — enough to
    * both inspect convergence and score new rows via [[scoreLogistic]].
    */
  /** Integer batch-perceptron training, ORACLE-GRADE: the quality-
    * classifier trainer with zero floats. Epoch t computes the exact
    * gradient `g_i = Σ_{y·(w·x) ≤ 0} y·x_i` in ONE partial-aggregated
    * pass with the current weights as plan literals, then `w += g` on
    * the driver — all Long arithmetic, so `epochs` updates replay
    * bit-identically in unrolled SQL CTEs (the delta-trainer/Lloyd
    * shape: O(epochs) jobs, O(#features) driver state, nothing
    * corpus-sized leaves the executors). Serve is fused: the returned
    * frame scores every row under the final weights (score = w·x,
    * pred = sign) next to its true label — the train→serve loop in one
    * query. Feature 0 is an implicit bias (constant 1).
    *
    * Compared to [[trainLogisticProbe]] (float logistic, rows-only
    * gate): same distributed shape, but every number is an integer on
    * both engines — the trainer itself is value-oracled.
    */
  def perceptronTrainServe(df: DataFrame, key: Column, label: Column,
      features: Seq[Column], epochs: Int): DataFrame = {
    require(features.nonEmpty && epochs >= 1)
    val k = features.size + 1
    val base = df.select(key.as("doc_id") +: label.cast("long").as("__y") +:
      (lit(1L).as("__f0") +: features.zipWithIndex.map {
        case (f, i) => f.cast("long").as(s"__f${i + 1}")
      }): _*)
      .localCheckpoint(eager = false) // epochs + serve reuse one scan tree
    // epochs are sequential, so per-epoch latency bounds training depth:
    // each epoch is one single-stage mapPartitions job with a k-long
    // accumulator over the checkpointed rows (the delta-trainer shape —
    // replaces a per-epoch Catalyst agg whose planning+AQE round cost
    // more than the gradient compute). Long sums are order-independent
    // exact arithmetic — weights stay bit-identical to the unrolled-CTE
    // oracle; addExact/multiplyExact keep the ANSI throw-on-overflow
    // contract the agg expression had.
    val baseRdd = base
      .select((col("__y") +: (0 until k).map(i => col(s"__f$i"))): _*)
      .rdd.map(r => (r.getLong(0), Array.tabulate(k)(i => r.getLong(i + 1))))
    var w = Array.fill(k)(0L)
    (1 to epochs).foreach { _ =>
      val wl = w
      val partials = baseRdd.mapPartitions { it =>
        val g = new Array[Long](wl.length)
        it.foreach { case (y, f) =>
          var m = 0L
          var i = 0
          while (i < wl.length) {
            m = Math.addExact(m, Math.multiplyExact(wl(i), f(i))); i += 1
          }
          if (Math.multiplyExact(m, y) <= 0L) {
            var j = 0
            while (j < wl.length) {
              g(j) = Math.addExact(g(j), Math.multiplyExact(y, f(j))); j += 1
            }
          }
        }
        Iterator.single(g)
      }.collect()
      w = w.clone()
      partials.foreach { g =>
        var i = 0
        while (i < w.length) { w(i) = Math.addExact(w(i), g(i)); i += 1 }
      }
    }
    val score = (0 until k).map(i => lit(w(i)) * col(s"__f$i")).reduce(_ + _)
    base.select(col("doc_id"), score.as("score"),
      when(score > 0L, 1).otherwise(-1).as("pred"),
      col("__y").cast("int").as("label"))
  }

  def trainLogisticProbe(df: DataFrame, label: Column,
      features: Seq[Column], iters: Int = 25, lr: Double = 1.0)
      : (Array[Double], Array[Double], Array[Double], Array[Double]) = {
    val k = features.size
    require(k > 0, "need at least one feature")
    val base = df.select((label.cast("double").as("__y") +:
      features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"__f$i") }): _*)
      .localCheckpoint(eager = false)
    // moments pass: means + population stds (zero-variance features get
    // std 1 so they standardize to a constant instead of dividing by 0)
    val mrow = base.agg(
      count(lit(1)).as("n"),
      (0 until k).flatMap(i => Seq(
        avg(col(s"__f$i")).as(s"m$i"),
        coalesce(stddev_pop(col(s"__f$i")), lit(0.0)).as(s"s$i"))): _*).head()
    val n = mrow.getLong(0).toDouble
    val means = Array.tabulate(k)(i => mrow.getDouble(1 + 2 * i))
    val stds = Array.tabulate(k) { i =>
      val s = mrow.getDouble(2 + 2 * i); if (s == 0.0) 1.0 else s
    }
    val w = Array.fill(k + 1)(0.0) // bias first
    val losses = Array.newBuilder[Double]
    // same single-stage-RDD step shape as the perceptron trainer:
    // gradient iterations are sequential, so each is one mapPartitions
    // job with (k+2) double accumulators instead of a per-iteration
    // Catalyst agg (planning+AQE latency >> the gradient compute). The
    // sigmoid/log math is java.lang.Math — the same functions codegen
    // called. Float sums remain partial-order-dependent exactly as the
    // hash-agg was (per-partition row order, then a fixed merge order);
    // this trainer is rows-only with accuracy/convergence gates.
    val baseRdd = base.rdd
      .map(r => (r.getDouble(0), Array.tabulate(k)(i => r.getDouble(i + 1))))
    (0 until iters).foreach { _ =>
      val wl = w.clone()
      val partials = baseRdd.mapPartitions { it =>
        val g = new Array[Double](k + 1)
        var loss = 0.0
        it.foreach { case (y, f) =>
          var z = wl(0)
          var i = 0
          while (i < k) {
            z += wl(i + 1) * ((f(i) - means(i)) / stds(i)); i += 1
          }
          val p = 1.0 / (1.0 + math.exp(-z))
          val err = p - y
          g(0) += err
          var j = 0
          while (j < k) { g(j + 1) += err * ((f(j) - means(j)) / stds(j)); j += 1 }
          loss += -(y * math.log(math.max(p, 1e-12)) +
            (1.0 - y) * math.log(math.max(1.0 - p, 1e-12)))
        }
        Iterator.single((g, loss))
      }.collect()
      val gt = new Array[Double](k + 1)
      var lt = 0.0
      partials.foreach { case (g, l) =>
        var i = 0
        while (i <= k) { gt(i) += g(i); i += 1 }
        lt += l
      }
      (0 to k).foreach(i => w(i) -= lr * gt(i) / n)
      losses += lt / n
    }
    (w, losses.result(), means, stds)
  }

  /** Score rows with a trained probe: σ(w·standardized features) as a
    * narrow codegen'd expression — the inference half of the quality
    * filter. */
  def scoreLogistic(features: Seq[Column], w: Array[Double],
      means: Array[Double], stds: Array[Double]): Column = {
    val z = features.zipWithIndex.foldLeft(lit(w(0))) { case (acc, (f, i)) =>
      acc + lit(w(i + 1)) * ((f.cast("double") - lit(means(i))) / lit(stds(i)))
    }
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Deterministic fixed-size per-group sample: exactly min(k, |group|)
    * rows per group, chosen by md5-hash order of the key — the
    * "k examples per source/language" inspection or eval-set draw,
    * reproducible across engines. Ranked through the
    * [[graft.plans.GroupTopK]] custom physical operator: per-partition
    * bounded heaps below the exchange, so the shuffle carries
    * O(partitions·groups·k) rows, never the corpus.
    */
  def samplePerGroup(df: DataFrame, key: Column, group: String, k: Int): DataFrame = {
    val withH = df
      .withColumn("__h", keyHash(key))
      .withColumn("__k", key.cast("string"))
    graft.plans.GroupTopK.groupTopK(
        withH, Seq(group), Seq(("__h", true), ("__k", true)), k)
      .drop("__h", "__k")
  }

  /** Stratified sampling: per-stratum Bernoulli fractions (e.g. rebalance
    * sources or languages when mixing a training corpus). Thin wrapper
    * over `DataFrameStatFunctions.sampleBy` — a seeded narrow map, no
    * shuffle, each row kept iff its stratum's coin lands under the
    * stratum's fraction. Sampled output ⇒ rows-only gate + a property
    * spec on per-stratum proportions.
    */
  def stratifiedSample(df: DataFrame, stratum: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratum, fractions, seed)

  /** Weighted sample without replacement (Efraimidis–Spirakis A-Res):
    * each row draws u ∈ (0,1) and scores u^(1/w); the top-n scores are a
    * weighted sample. u is md5-derived from the key, so the sample is
    * deterministic and engine-portable (the "sample high-quality docs
    * more often" pass of a training-data mix, reproducible across runs).
    *
    * One narrow map + TakeOrderedAndProject: per-partition top-n heaps,
    * O(n) to the driver-side merge — no sort of the corpus, no shuffle of
    * anything but n·#partitions candidate rows.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column, n: Int): DataFrame = {
    // u in (0,1): 60-bit hash scaled; +0.5 keeps u strictly inside (0,1)
    val u = (keyHash(key).cast("double") + lit(0.5)) / lit((1L << 60).toDouble)
    // log-domain score: ln(u)/w is monotone in u^(1/w) and avoids
    // pow() underflow for tiny weights. A-Res is defined only for w > 0:
    // w <= 0 would score +Inf (ln(u)<0 / negative w) and silently win
    // every draw, so non-positive weights are excluded up front.
    df.filter(weight > lit(0.0))
      .withColumn("__score", log(u) / weight)
      .orderBy(col("__score").desc)
      .limit(n)
      .drop("__score")
  }

  /** Corpus snapshot DIFF — the dataset-versioning ops tool: given two
    * snapshots keyed by doc_id, classify every id as added / removed /
    * changed / unchanged by content hash. One full outer join on the
    * key; hashes are md5 so the report replays in SQL. At scale both
    * sides shuffle on doc_id once (or co-locate for free under
    * bucketed snapshot layouts). */
  def corpusDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), md5(col("text")).as("__h1"))
    val b = v2.select(col("doc_id"), md5(col("text")).as("__h2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__h2").isNull, "removed")
          .when(col("__h1").isNull, "added")
          .when(col("__h1") =!= col("__h2"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** DPO/RLHF preference-pair election — the "binarize preferences"
    * prep step (UltraFeedback / Zephyr): candidate completions are
    * grouped by their EXACT prompt (the tokens before `sep`), each
    * completion is scored on the exact 1e-4 lexical-diversity grid
    * (10000·distinct_tokens // n_tokens — engine-portable integers),
    * and every group with a real quality spread emits ONE
    * (chosen, rejected) training pair: chosen = highest score (tie:
    * lowest doc_id), rejected = lowest score (tie: highest doc_id).
    * Groups with <2 candidates or zero margin carry no preference
    * signal and are dropped.
    *
    * Scale posture: one hash aggregation keyed by prompt; the election
    * is a pair of struct min/max aggregates — map-side partials ship
    * two structs per (partition, prompt), no window, no sort, no
    * data-sized second pass. The doc_id rides NEGATED inside the
    * structs so lexicographic struct ordering encodes both tie rules.
    */
  def dpoPairs(docs: DataFrame, sep: String = "###"): DataFrame =
    dpoElect(dpoCandidates(docs, sep))

  /** The candidate-extraction half of [[dpoPairs]]: (doc_id, prompt,
    * score) for every separator-bearing doc with a non-empty
    * completion — shared by the batch election and the streaming
    * admission gate so both score identically. */
  def dpoCandidates(docs: DataFrame, sep: String = "###"): DataFrame = {
    val ws = filter(split(lower(col("text")), " "), w => w =!= "")
    docs.select(col("doc_id"), ws.as("__ws"))
      .withColumn("__sep",
        nullif(array_position(col("__ws"), sep), lit(0L)))
      .filter(col("__sep").isNotNull)
      .withColumn("prompt",
        array_join(slice(col("__ws"), lit(1),
          (col("__sep") - 1L).cast("int")), " "))
      .withColumn("__comp",
        slice(col("__ws"), (col("__sep") + 1L).cast("int"),
          greatest(size(col("__ws")).cast("long") - col("__sep"), lit(0L))
            .cast("int")))
      .withColumn("n_comp", size(col("__comp")).cast("long"))
      .filter(col("n_comp") > 0L)
      .withColumn("score", expr(
        "10000 * CAST(size(array_distinct(__comp)) AS BIGINT) div n_comp"))
      .select(col("doc_id"), col("prompt"), col("score"))
  }

  /** The election half of [[dpoPairs]] over (doc_id, prompt, score). */
  def dpoElect(cand: DataFrame): DataFrame = {
    cand.groupBy(col("prompt"))
      .agg(count(lit(1)).as("n_candidates"),
        max(struct(col("score"), (-col("doc_id")).as("nid"))).as("__ch"),
        min(struct(col("score"), (-col("doc_id")).as("nid"))).as("__rj"))
      .filter(col("n_candidates") >= 2L &&
        col("__ch.score") > col("__rj.score"))
      .select(col("prompt"), col("n_candidates"),
        (-col("__ch.nid")).as("chosen_id"),
        col("__ch.score").as("chosen_score"),
        (-col("__rj.nid")).as("rejected_id"),
        col("__rj.score").as("rejected_score"),
        (col("__ch.score") - col("__rj.score")).as("margin"))
  }

  /** Shard-balance report — the sink-skew audit: hash docs into
    * `nShards` output shards (the md5-60bit SQL-replayable key) and
    * report per-shard doc/token counts plus each shard's doc share on
    * the 1e-4 grid. A skewed report means the shard key is wrong
    * BEFORE the 100 TB write, not after. */
  def shardBalance(docs: DataFrame, nShards: Int = 16): DataFrame = {
    val shard = pmod(keyHash(col("doc_id")), lit(nShards.toLong))
    val nToks = size(filter(split(lower(col("text")), " "), w => w =!= ""))
      .cast("long")
    val per = docs.select(shard.as("shard"), nToks.as("__nt"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
    val tot = per.select(sum(col("n_docs")).as("__total"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        graft.text.TextAnalysis.frac4(col("n_docs"), col("__total"))
          .as("doc_share"))
  }

  /** DoReMi-shaped domain reweighting (Xie et al. 2023): upweight the
    * domains with the highest EXCESS loss under a proxy model, so the
    * mixture spends its token budget where the model has the most to
    * learn. This is the exact-integer surrogate of the paper's
    * Group-DRO loop: the proxy loss is the per-source mean bigram
    * surprisal (integer bit-length LM — the [[graft.text.TextAnalysis
    * .bigramSurprisal]] model) on the 1e-4 grid, excess = loss − the
    * best source's loss, and the exponentiated-gradient update is
    * linearized to integer multiplicative weights
    * `w ← w·(10⁴ + η₄·excess₄ ÷ 10⁴) ÷ 10⁴` for `iters` steps (exp →
    * 1+x at the grid's resolution; the paper's per-step proxy retrain
    * is frozen — one proxy, K weight steps). Every step is integer
    * division (Spark IntegralDivide == DuckDB `//`), so the whole
    * fixed point replays in unrolled SQL — the link_domain_rank
    * discipline applied to mixture design.
    *
    * Scale: the corpus is touched ONCE (the bigram scoring scan);
    * everything after runs on the SOURCE-sized table (windows over
    * #sources rows, bounded). Output: per source, the proxy loss,
    * excess, final integer weight, and the mixture share in ppm.
    */
  def doremiWeights(docs: DataFrame, iters: Int = 3,
      eta4: Long = 10000L): DataFrame = {
    require(iters >= 1 && eta4 > 0)
    import graft.text.TextAnalysis.intDiv
    val scored = graft.text.TextAnalysis.bigramSurprisal(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    val perSrc = scored.groupBy(col("source"))
      .agg(sum(col("surprisal_sum")).as("__ss"),
        sum(col("n_bigrams")).as("__nb"))
      .select(col("source"),
        intDiv(col("__ss") * lit(10000L), col("__nb")).as("loss_e4"))
    doremiSteps(perSrc, iters, eta4)
  }

  /** [[doremiWeights]] from ACCUMULATED per-(source, bigram) count
    * state ([[graft.text.TextAnalysis.sourceBigramCountState]]) — the
    * incremental/streaming path: per-source losses re-derive from the
    * state alone (Σ n2·(bl(n1)−bl(n2)) over distinct bigrams equals
    * the batch per-occurrence sum exactly), so the emitted weights are
    * bit-equal to batch [[doremiWeights]] on the union of everything
    * folded in. State is model-sized × sources (the lm_model_
    * incremental posture — shard it the same way at corpus scale). */
  def doremiWeightsFromState(state: DataFrame, iters: Int = 3,
      eta4: Long = 10000L): DataFrame = {
    import graft.text.TextAnalysis.intDiv
    def bl(c: Column): Column = length(bin(c)).cast("long")
    val c2 = state.groupBy(col("w1"), col("w2"))
      .agg(sum(col("n2")).as("n2g"))
      .localCheckpoint(eager = false)
    val c1 = c2.groupBy(col("w1")).agg(sum(col("n2g")).as("n1"))
    val perSrc = state
      .join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy(col("source"))
      .agg(sum(col("n2") * (bl(col("n1")) - bl(col("n2g")))).as("__ss"),
        sum(col("n2")).as("__nb"))
      .select(col("source"),
        intDiv(col("__ss") * lit(10000L), col("__nb")).as("loss_e4"))
    doremiSteps(perSrc, iters, eta4)
  }

  /** Exact ROC-AUC (the Mann-Whitney/rank-sum identity with midrank
    * tie handling — the threshold-free ranking-quality audit beside
    * the calibration curve): AUC = (Σ_pos midrank − nPos(nPos+1)/2) /
    * (nPos·nNeg), computed entirely in integers by carrying DOUBLED
    * midranks (2·midrank = 2·cum_before + n + 1 is always integral),
    * result on the 1e-4 grid by one integral division — fully
    * oracle-replayable. Plan: one aggregation to the SCORE-GRID table
    * (bounded by distinct scores — integer classifier outputs), one
    * window + one fold over that bounded grid; the unpartitioned
    * window orders grid rows, never data. */
  def aucExact(scored: DataFrame, label: Column, score: Column): DataFrame = {
    import graft.text.TextAnalysis.intDiv
    import org.apache.spark.sql.expressions.Window
    val grid = scored
      .select(score.as("__s"), (label === 1).cast("long").as("__p"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__p")).as("__np"))
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val term = grid
      .withColumn("__cum", sum(col("__n")).over(w))
      .withColumn("__mr2",
        lit(2L) * (col("__cum") - col("__n")) + col("__n") + lit(1L))
      .agg(sum(col("__np")).as("n_pos"),
        (sum(col("__n")) - sum(col("__np"))).as("n_neg"),
        sum(col("__np") * col("__mr2")).as("__s2"))
    term.select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          intDiv((col("__s2") - col("n_pos") * (col("n_pos") + lit(1L)))
            * lit(10000L),
            lit(2L) * col("n_pos") * col("n_neg")))
          .otherwise(lit(0L)).as("auc_e4"))
      .withColumn("auc", col("auc_e4") / lit(10000.0))
  }

  /** Shared multiplicative-weight iteration over the source-sized loss
    * frame (the unpartitioned windows order ≤ #sources rows, never
    * data). */
  private def doremiSteps(perSrc: DataFrame, iters: Int,
      eta4: Long): DataFrame = {
    // multiplicative weights grow by up to (1 + eta4·excess/1e8) PER
    // iteration — unbounded in Long for caller-supplied iters/eta4, and a
    // Long overflow is silent in Spark while DuckDB BIGINT errors (a
    // bit-parity break). Weights therefore live in decimal(38,0) (the
    // semdedup-verdict posture); past 10^38 the product nulls out and the
    // explicit guard below turns that into an error, never a wrong number.
    require(iters >= 1 && iters <= 64 && eta4 > 0 && eta4 <= 1000000000L,
      s"doremiSteps: iters=$iters eta4=$eta4 out of range")
    import graft.text.TextAnalysis.intDiv
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    // exact integral division for non-negative decimals: decimal `/`
    // rounds to a fixed scale (floor of the rounded quotient can be off
    // by one), but (a - a mod b) is exactly divisible so the quotient is
    // a representable integer — bit-exact at any magnitude ≤10^32
    def decDiv(a: Column, b: Column): Column =
      dec((a - pmod(a, b)) / b)
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val withExcess = perSrc
      .withColumn("excess_e4", col("loss_e4") - min(col("loss_e4")).over(w))
    val afterSteps = (1 to iters).foldLeft(
        withExcess.withColumn("weight", dec(lit(1000000L)))) { (acc, _) =>
      acc.withColumn("weight",
        decDiv(col("weight") *
          dec(lit(10000L) + intDiv(lit(eta4) * col("excess_e4"), lit(10000L))),
          dec(lit(10000L))))
    }
    afterSteps
      // inputs are never null, so a null weight is exactly the decimal
      // overflow — surface it instead of propagating nulls into shares
      .withColumn("weight",
        when(col("weight").isNull,
          raise_error(lit("doremiSteps: weight overflowed decimal(38,0)")))
          .otherwise(col("weight")))
      .withColumn("share_ppm",
        decDiv(col("weight") * dec(lit(1000000L)), sum(col("weight")).over(w))
          .cast("long"))
      .select(col("source"), col("loss_e4"), col("excess_e4"),
        // the emitted weight keeps its historical BIGINT shape (oracle
        // parity); values past Long range already errored above the
        // moment they exceeded decimal(38,0), and this cast re-checks
        // the Long boundary explicitly
        when(col("weight") > dec(lit(Long.MaxValue)),
          raise_error(lit("doremiSteps: weight exceeds BIGINT range")))
          .otherwise(col("weight")).cast("long").as("weight"),
        col("share_ppm"),
        (col("share_ppm") / lit(1000000.0)).as("mix_share"))
  }
}
