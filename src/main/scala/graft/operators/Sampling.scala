package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for dataset curation: reproducible downsampling
  * and train/val/test splits keyed on a hash of the row's id, NOT an RNG.
  *
  * `df.sample()` draws from a seeded RNG over the current partitioning —
  * re-partition the input and the sample changes, which makes pipeline
  * reruns unreproducible and train/eval splits unauditable. Hashing the
  * KEY instead gives the same decision for the same row everywhere: a
  * pure filter/projection (no shuffle, pushdown-friendly, codegen'd),
  * stable across partitionings, cluster sizes, and engines — the md5
  * prefix math reproduces bit-identically in the DuckDB oracle (same
  * digest of the same key string; cf. the q20 surrogate key).
  *
  * Rates are expressed in 256ths via the first two hex digits of
  * md5(key): digit-string comparison over lowercase hex is order-
  * isomorphic to the numeric value, so `prefix < "40"` keeps exactly the
  * 64/256 of key-space hashing below 0x40 — in expectation 25% of rows,
  * exact per key. */
object Sampling {

  private def prefix(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  private def hexThreshold(rate256: Int): String = f"$rate256%02x"

  /** Keep rows whose key hashes under `rate256`/256 — a reproducible
    * ~`rate256/256` sample (exact membership per key, binomial count).
    * NULL keys are always excluded, at every rate including 256/256 —
    * a null id cannot be given a stable decision, and silently flipping
    * between kept (full rate, where the hash is never consulted) and
    * dropped (any partial rate, where the null predicate filters) would
    * make the sample discontinuous in the rate. */
  def hashSample(df: DataFrame, keyCol: String, rate256: Int): DataFrame = {
    require(rate256 >= 0 && rate256 <= 256, "rate256 in [0, 256]")
    val nonNull = col(keyCol).isNotNull
    if (rate256 == 256) df.filter(nonNull)
    else df.filter(nonNull &&
      prefix(col(keyCol)) < lit(hexThreshold(rate256)))
  }

  /** Stratified sample with EXACT per-stratum quotas: within each
    * stratum, keep the `k` rows whose key hashes smallest — i.e.
    * min(k, |stratum|) rows, deterministically, the same rows on every
    * rerun, repartition, and engine. Quota sampling by RNG gives the
    * right COUNT but different MEMBERS each run; hash-order selection
    * gives both, and composes with the other hash-keyed curation ops
    * (the same doc is consistently in or out across pipeline stages).
    *
    * The single per-stratum window here is NOT the naive
    * one-reducer-per-stratum shuffle it looks like: a row_number filter
    * directly above a window triggers Catalyst's WindowGroupLimit rule
    * (Spark ≥ 3.5), which inserts a map-side partial top-k BEFORE the
    * exchange — each input task forwards at most k rows per stratum, so
    * the stratum reducer sorts ≤ k·P candidates, not the corpus. The
    * plan is audited in ScaleOpsSpec: a partial WindowGroupLimit must
    * sit below the exchange (a hand-rolled two-phase window gives the
    * same bound at the cost of a second shuffle — that formulation
    * predates the optimizer rule).
    *
    * Ordering is (md5(key), key): the hex digest is engine-agnostic and
    * the raw key breaks the (vanishingly unlikely) digest tie. NULL
    * keys are excluded as in [[hashSample]]; a NULL stratum is its own
    * stratum (SQL PARTITION BY semantics — a real pipeline wants the
    * "language unknown" bucket sampled too, not silently dropped). */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(keyCol).cast("string"))
    val w = Window.partitionBy(col(stratumCol)).orderBy(h.asc, col(keyCol).asc)
    df.filter(col(keyCol).isNotNull)
      .withColumn("rn__", row_number().over(w))
      .filter(col("rn__") <= k).drop("rn__")
  }

  /** Source-mix resampling: downsample each source/domain at its own
    * rate to hit a target corpus mixture — the "data mixing" step of a
    * training-data pipeline (per-domain sampling weights, cf. the
    * mixture tables in the LLaMA/Pile dataset cards), made reproducible
    * by keying every decision on md5(key) exactly like [[hashSample]].
    *
    * `rates` maps a source value to its keep-rate in 256ths; sources
    * not listed (and NULL sources) use `defaultRate256`. The decision
    * for a given key is the SAME at every rate that keeps it (key-space
    * prefixes nest), so raising a source's rate only ADDS documents —
    * mixtures can be retuned without churning the kept set. Pure
    * filter: no shuffle, pushdown-friendly, engine-reproducible.
    * NULL keys are always excluded, as in [[hashSample]]. */
  def mixBySource(df: DataFrame, sourceCol: String, keyCol: String,
      rates: Map[String, Int], defaultRate256: Int): DataFrame = {
    require((rates.values ++ Seq(defaultRate256)).forall(r => r >= 0 && r <= 256),
      "rates are 256ths in [0, 256]")
    val p = prefix(col(keyCol))
    def keepAt(r: Int): Column =
      if (r >= 256) lit(true)
      else if (r <= 0) lit(false)
      else p < lit(hexThreshold(r))
    // deterministic when-chain order (sorted keys) — rates is a Map
    val keep = rates.toSeq.sortBy(_._1).foldRight(keepAt(defaultRate256)) {
      case ((s, r), acc) => when(col(sourceCol) === s, keepAt(r)).otherwise(acc)
    }
    df.filter(col(keyCol).isNotNull && keep)
  }

  /** Assign each row a deterministic split label from consecutive
    * key-space bands: `weights` in 256ths (must sum to 256), one label
    * per weight. The same key always lands in the same split — across
    * reruns, repartitions, and engines — which is the property a
    * train/val/test separation must have to prevent leakage. A NULL key
    * gets a NULL split, never a silent default label: md5(null) is null,
    * so every band predicate would fall through to the last label and
    * quietly skew exactly the separation this operator exists to make
    * auditable. */
  def splitByHash(df: DataFrame, keyCol: String,
      weights: Seq[Int], labels: Seq[String],
      outCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.size == labels.size,
      "one label per weight")
    require(weights.forall(_ > 0) && weights.sum == 256,
      "weights are 256ths and must sum to 256")
    val cuts = weights.scanLeft(0)(_ + _).tail.init // cumulative, last open
    val p = prefix(col(keyCol))
    val banded = cuts.zip(labels.init).foldRight(lit(labels.last): Column) {
      case ((cut, label), acc) =>
        when(p < lit(hexThreshold(cut)), lit(label)).otherwise(acc)
    }
    df.withColumn(outCol,
      when(col(keyCol).isNotNull, banded).otherwise(lit(null).cast("string")))
  }

  /** EXACT-COUNT stratified split — [[splitByHash]] gives every key a
    * stable side but only EXPECTED proportions (a 256th-band hash is
    * binomial per stratum; a small language can land 70/30 when you
    * asked 80/20). Here each stratum is ranked by (md5(key), key) —
    * deterministic, unique order — and cut at the exact floor
    * boundaries rank ≤ (m·Σw_1..i) div Σw, so per-stratum counts are
    * exactly the floored quotas, membership is rerun/engine-stable,
    * and a document's side still never depends on partitioning.
    * NULL keys are excluded ([[hashSample]]'s contract).
    *
    * Shape at scale: the rank is
    * [[ScalableRank.groupRowNumber]] — one global range sort, no
    * per-stratum single-reducer window — plus the broadcast-joined
    * group sizes that same call computes. */
  def exactSplit(df: DataFrame, stratumCol: String, keyCol: String,
      weights: Seq[Int], labels: Seq[String],
      outCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.size == labels.size,
      "one label per weight")
    require(weights.forall(_ > 0), "weights must be positive")
    val tot = weights.map(_.toLong).sum
    val ranked = ScalableRank.groupRowNumber(
      df.filter(col(keyCol).isNotNull)
        .withColumn("graft_h__", md5(col(keyCol).cast("string"))),
      Seq(stratumCol), Seq(col("graft_h__"), col(keyCol)),
      rnCol = "graft_rn__", nCol = "graft_n__")
    val cum = weights.map(_.toLong).scanLeft(0L)(_ + _).tail
    val assign = cum.zip(labels).init
      .foldRight(lit(labels.last): Column) { case ((c, label), acc) =>
        when(col("graft_rn__") <=
          expr(s"(graft_n__ * $c) div $tot"), lit(label)).otherwise(acc)
      }
    ranked.withColumn(outCol, assign)
      .drop("graft_h__", "graft_rn__", "graft_n__")
  }

  /** LEAKAGE-FREE train/val/test split: assign splits by NEAR-DUP
    * CLUSTER, not by document. [[splitByHash]] guarantees a document
    * never straddles splits, but two near-copies with different ids
    * hash independently — and then the eval answer sits in the training
    * set under another id (exactly what
    * [[Decontaminate.splitLeakage]] detects). Here every node's split
    * is decided by the md5 of its connected-component REPRESENTATIVE
    * (min id; singletons represent themselves), so a whole near-dup
    * cluster lands on one side by construction — the split hygiene
    * rule corpus curation actually needs.
    *
    * Scale shape: the component labeling is [[Dedup.connectedComponents]]
    * (path-halving, O(log diameter) rounds); the assignment itself is
    * one left join + the same hash-CASE as splitByHash. Output:
    * (keyCol, rep_id, split). */
  def clusterAwareSplit(df: DataFrame, keyCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      weights: Seq[Int], labels: Seq[String]): DataFrame =
    clusterAwareSplitFromComponents(df, keyCol,
      Dedup.connectedComponents(pairs, aCol, bCol), weights, labels)

  /** [[clusterAwareSplit]] over an ALREADY-LABELED (node, component)
    * map — the consumer half of a staged component store
    * ([[Dedup.keepRepresentativesFromComponents]] has the staging
    * contract); labels are deterministic, so the staged path is
    * row-for-row identical to the inline one. */
  def clusterAwareSplitFromComponents(df: DataFrame, keyCol: String,
      components: DataFrame, weights: Seq[Int],
      labels: Seq[String]): DataFrame = {
    val comp = components.withColumnRenamed("node", keyCol)
    val withRep = df.select(col(keyCol))
      .join(comp, Seq(keyCol), "left")
      .withColumn("rep_id", coalesce(col("component"), col(keyCol)))
    splitByHash(withRep, "rep_id", weights, labels)
      .select(col(keyCol), col("rep_id"), col("split"))
  }

  /** Keep rows whose `valueCol` lies inside the per-group percentile
    * band (loPct, hiPct] — the outlier trim a curation pass applies
    * before computing statistics on length-like metrics (drop the
    * shortest 10% and longest 10% per source, keep the body).
    *
    * EXACT rank semantics, no interpolation: row_number over
    * (value, id) — the id tiebreak makes the cut deterministic under
    * ties — and the band test is integer cross-multiplication
    * (`100·rn > loPct·n AND 100·rn ≤ hiPct·n`), so the engine and any
    * oracle agree bit-for-bit. Two window functions, one frame, one
    * shuffle.
    *
    * Scale: partitions by the group column; a single pathological
    * group routes through one task's sort (same caveat as every
    * per-group rank — [[RankOps.bandByRankScalable]] shows the
    * range-partitioned rewrite if a group outgrows a task). Group
    * cardinality here is sources/languages, with per-group row counts
    * far below the 100M-rows-per-task sort ceiling at realistic SF. */
  def percentileBand(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, loPct: Int = 10, hiPct: Int = 90): DataFrame = {
    require(0 <= loPct && loPct < hiPct && hiPct <= 100,
      "need 0 <= loPct < hiPct <= 100")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol), col(idCol))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df.select(col(idCol), col(groupCol), col(valueCol))
      .withColumn("rn_", row_number().over(w).cast("long"))
      .withColumn("n_", count(lit(1)).over(wn))
      .filter(col("rn_") * 100L > lit(loPct.toLong) * col("n_") &&
        col("rn_") * 100L <= lit(hiPct.toLong) * col("n_"))
      .drop("rn_", "n_")
  }

  /** Per-group cap — keep at most `cap` rows per group, preferring
    * higher `orderCol`, ties broken by ascending id: the C4/RefinedWeb
    * per-domain cap that stops any single domain from dominating a
    * training mix, with "best first" rather than "arrival order" as
    * the survivor rule.
    *
    * Scale shape: one shuffle on the group key and a per-group window
    * sort. Group cardinality is unbounded (domains), which is exactly
    * what hash partitioning spreads; rows-per-group is the skew axis —
    * a single mega-domain sorts in one task here, and a corpus where
    * that dominates should rank via [[ScalableRank.groupRowNumber]]
    * (range-partitioned, no window) and filter its `rn` column — the
    * same window→scalable trade [[RankOps.bandByRankScalable]] makes.
    */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      idCol: String, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol).desc, col(idCol))
    df.select(col(idCol), col(groupCol), col(orderCol))
      .withColumn("rn_", row_number().over(w))
      .filter(col("rn_") <= cap)
      .drop("rn_")
  }

  /** Systematic weight-proportional sampling — exactly `n` picks (with
    * multiplicity) distributed over the corpus in proportion to an
    * integer weight, with zero RNG state: rows are laid out on the
    * cumulative-weight line in md5-hash order (the same key-hash
    * determinism as [[hashSample]]) and a pick lands at every crossing
    * of `total/n`; row r is picked `floor(cum·n/W) − floor(prev·n/W)`
    * times. Σ n_picks = n exactly, heavy rows can be picked more than
    * once (by design — that IS weight-proportional with replacement at
    * fixed stride), and zero/NULL-weight rows are never picked.
    *
    * This is the deterministic counterpart of weighted reservoir
    * sampling (Efraimidis-Spirtakis): same marginal inclusion rates,
    * but reproducible across engines, partitionings and reruns — the
    * property every split/sample operator in this file guarantees.
    *
    * Shape at scale: the cumulative line comes from
    * [[BudgetSelect.runningTotal]]'s range-partitioned prefix sum (no
    * single-task sort); everything after is a codegen'd filter.
    *
    * Contract: `keyCol` must be unique — (md5(key), key) is the total
    * order the cumulative line needs; duplicate keys would make the
    * per-row attribution of picks partitioning-dependent. Weights must
    * be NON-NEGATIVE: a negative weight would make the cumulative line
    * non-monotone and break the floor-division pick identity (n_picks
    * per row >= 0, exactly n picks total), so NULL and negative
    * weights are both clamped to 0 (r11 advice) — such rows can never
    * be picked but keep the line monotone. */
  /** Stratified K-FOLD assignment — per stratum, members take folds
    * round-robin along the (md5(key), key) permutation, so every
    * stratum's folds are balanced to within one row and the
    * assignment is reproducible across engines, reruns, and
    * partitionings (the repo's split discipline, extended to
    * cross-validation). fold ∈ [0, k).
    *
    * Shape at scale: the per-stratum rank runs through
    * [[ScalableRank.groupRowNumber]]'s range-partitioned sort — a
    * dominant stratum never lands in one window task. */
  def stratifiedKFold(df: DataFrame, stratumCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    val base = df.select(col(stratumCol), col(keyCol),
      md5(col(keyCol).cast("string")).as("h__"))
    ScalableRank.groupRowNumber(base, Seq(stratumCol),
        Seq(col("h__").asc, col(keyCol).asc),
        rnCol = "rn__", nCol = "n__")
      .select(col(keyCol), col(stratumCol),
        pmod(col("rn__") - 1L, lit(k.toLong)).as("fold"))
  }

  def systematicWeighted(df: DataFrame, keyCol: String,
      weightCol: String, n: Int): DataFrame = {
    require(n > 0, "sample size must be positive")
    val dec = "decimal(38,0)"
    val base = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol),
        greatest(coalesce(col(weightCol).cast("long"), lit(0L)), lit(0L))
          .as("weight"),
        md5(col(keyCol).cast("string")).as("h__"))
    val (cum, total) = BudgetSelect.runningTotal(base, col("weight"),
      Seq(col("h__"), col(keyCol)), "cum_w")
    // total == 0 (empty/all-zero input): no row can satisfy the filter,
    // and the div below never evaluates — safe to build unconditionally
    val stride = lit(math.max(total, 1L)).cast(dec)
    def picksAt(c: Column): Column =
      call_function("div", c.cast(dec) * lit(n.toLong), stride)
        .cast("long")
    cum
      .withColumn("pick__", picksAt(col("cum_w")))
      .withColumn("prev__", picksAt(col("cum_w") - col("weight")))
      .filter(col("pick__") > col("prev__"))
      .select(col(keyCol), col("weight"), col("cum_w"),
        (col("pick__") - col("prev__")).as("n_picks"))
  }

  /** Deterministic BOOTSTRAP replicate means — the error bar a corpus
    * metric ships with at scale: `reps` half-rate pseudo-resamples,
    * each defined by the same key-hash rule as [[hashSample]] (row k
    * joins replicate r iff the first hex digit of md5("k:r") is
    * below 8 — ~50% of key-space, exact per (key, rep), independent
    * of partitioning), each emitting its exact e6 mean. The spread
    * of the replicate means IS the metric's sampling uncertainty; no
    * RNG, so reruns and the oracle reproduce it bit for bit.
    *
    * Shape at scale: one explode (×reps) into a map-side-combinable
    * 2-long aggregate per replicate — the shuffle moves reps rows per
    * input partition, not the table; at 100 TB pick reps ≤ 64 and the
    * amplification stays cheaper than a second corpus scan. */
  def bootstrapMeans(df: DataFrame, keyCol: String, valueCol: String,
      reps: Int): DataFrame = {
    require(reps >= 1 && reps <= 256, "reps in [1, 256]")
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("k__"),
        col(valueCol).cast("long").as("v__"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
      .filter(substring(md5(concat(col("k__"), lit(":"),
        col("rep").cast("string"))), 1, 1) < "8")
      .groupBy(col("rep"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v__")).as("sum_v"))
      .select(col("rep"), col("n_rows"),
        graft.functions.ExactRound.ratioScaled(col("sum_v"),
          col("n_rows"), 6).as("mean_e6"))
  }

  /** Purged/embargoed TEMPORAL split (the de Prado 2018 discipline
    * for serially-correlated data): the last `testDays` days are
    * test, the `embargoDays` before them are an embargo buffer
    * excluded from training, everything earlier is train — so
    * trailing autocorrelation can't leak label information across
    * the boundary. Split edges are RELATIVE to the observed max day
    * (scale-factor-proof). Per split: event and distinct-entity
    * counts, the day span, and the entity overlap with TRAIN — the
    * leakage audit (an entity active in both train and test is the
    * residual risk an entity-level split would remove; cf. q110).
    *
    * Shape at scale: the max-day anchor is a 1-row broadcast
    * crossJoin (never a global window); then one distinct over
    * (split, entity), one map-side-combinable aggregate, and a
    * broadcast-sized overlap join on the ≤3-row frame. */
  def embargoSplit(events: DataFrame, tsNanosCol: String,
      entityCol: String, testDays: Long = 7L,
      embargoDays: Long = 3L): DataFrame = {
    require(testDays >= 1 && embargoDays >= 0, "testDays >= 1")
    val day = graft.functions.TimeFns.floorDiv(col(tsNanosCol),
      86400L * 1000000000L)
    val base = events.select(col(entityCol).as("ent__"),
      day.as("day__"))
    val mx = base.agg(max(col("day__")).as("mx__"))
    val tagged = graft.Caches.register(base
      .crossJoin(broadcast(mx))
      .withColumn("split",
        when(col("day__") > col("mx__") - testDays, "test")
          .when(col("day__") > col("mx__") - testDays - embargoDays,
            "embargo")
          .otherwise("train"))
      .persist())
    val per = tagged.groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        min(col("day__")).as("first_day"),
        max(col("day__")).as("last_day"))
    val ents = graft.Caches.register(tagged
      .select(col("split"), col("ent__")).distinct().persist())
    val users = ents.groupBy(col("split"))
      .agg(count(lit(1)).as("n_entities"))
    val trainEnts = ents.filter(col("split") === "train")
      .select(col("ent__"))
    val overlap = ents.join(trainEnts, Seq("ent__"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_train_overlap"))
    per.join(users, Seq("split"), "left")
      .join(overlap, Seq("split"), "left")
      .select(col("split"), col("n_events"),
        coalesce(col("n_entities"), lit(0L)).as("n_entities"),
        coalesce(col("n_train_overlap"), lit(0L)).as("n_train_overlap"),
        col("first_day"), col("last_day"))
  }

  /** CLASS-BALANCED OVERSAMPLING, materialized — every label is
    * brought up to exactly the majority class's count: each row gets
    * `rep = target div n_label` copies, and the `extra = target −
    * rep·n_label` smallest ids in the label get one more (the
    * deterministic remainder rule, [[exactSplit]]'s discipline). The
    * output is the per-copy row stream `(id, label, copy_idx)` — what
    * a training shuffle actually consumes; per-label counts of the
    * materialized frame equal the target EXACTLY, which is the
    * cross-check the gate hashes against the closed form.
    *
    * Shape at scale: one per-label tally + a 1-row target broadcast,
    * the remainder ranking via [[ScalableRank.groupRowNumber]] (range
    * partition + offsets, never a per-label window), one
    * `explode(sequence)` whose fan-out IS the oversampling itself. */
  def oversampleBalanced(df: DataFrame, idCol: String,
      labelCol: String): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id__"),
      col(labelCol).cast("long").as("label__"))
    val counts = base.groupBy(col("label__"))
      .agg(count(lit(1)).as("nl__"))
    val target = counts.agg(max(col("nl__")).as("target__"))
    val plan = counts.crossJoin(broadcast(target))
      .select(col("label__"),
        call_function("div", col("target__"), col("nl__")).as("rep__"),
        (col("target__") - call_function("div", col("target__"),
          col("nl__")) * col("nl__")).as("extra__"))
    val ranked = ScalableRank.groupRowNumber(base, Seq("label__"),
      Seq(col("id__")), rnCol = "rn__", nCol = "nn__")
    ranked.join(broadcast(plan), Seq("label__"))
      .select(col("id__"), col("label__"),
        (col("rep__") + when(col("rn__") <= col("extra__"), 1L)
          .otherwise(0L)).as("copies__"))
      .select(col("id__").as("id"), col("label__").as("label"),
        explode(sequence(lit(1L), col("copies__"))).as("copy_idx"))
  }
}
