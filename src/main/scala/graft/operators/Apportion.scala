package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact integer budget apportionment across groups — the "how many
  * tokens does each source contribute to this training run" allocator
  * (the proportional baseline of mixture schemes like UniMax; see
  * reference `main.py:27-40`'s symbol-loop quota pattern for the
  * per-group-budget spirit).
  *
  * Largest-remainder (Hamilton) method, entirely in integer
  * arithmetic:
  *
  *   base_g  = floor(T · c_g / C)        (C = Σ c_g)
  *   extra   = T − Σ base_g              (< number of groups)
  *   alloc_g = base_g + 1 for the `extra` groups with the largest
  *             remainders T·c_g mod C (ties broken by group name
  *             ascending), base_g otherwise.
  *
  * Σ alloc_g = min(T, …) exactly; no float appears anywhere, so the
  * allocation is bit-identical on any engine — gate-safe by
  * construction (the q71 discipline).
  *
  * Scale note: the windows here run over the GROUPED frame (one row
  * per source/domain — bounded, thousands at most), not the corpus;
  * the only corpus-scale stage is the initial count aggregate, which
  * is map-side combinable. The unpartitioned windows on the group
  * frame are deliberate and safe at that cardinality.
  */
object Apportion {

  /** Apportion `budget` units over the distinct values of `groupCol`
    * proportionally to `weightCol` (a non-negative integral measure —
    * token counts, byte sizes), largest-remainder rounding. Input is
    * corpus rows; output is one row per group:
    * (group, weight, base, rem, alloc). */
  def largestRemainder(df: DataFrame, groupCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val counts = df.groupBy(col(groupCol))
      .agg(sum(col(weightCol)).as("weight"))
    val all = Window.partitionBy()
    val wOrd = Window.partitionBy()
      .orderBy(col("rem").desc, col(groupCol).asc)
    // T·c in DECIMAL(38,0): budget ~1e12 times corpus-scale counts
    // overflows a long; 128-bit headroom is exact (ExactRound's
    // discipline). div/mod stay integral.
    val tc = lit(budget).cast("decimal(38,0)") *
      col("weight").cast("decimal(38,0)")
    counts
      .withColumn("total__", sum(col("weight")).over(all))
      // total 0 (all weights zero — nothing to apportion) must yield
      // zeros, not a NULL division (Spark) / an error (DuckDB); the
      // SQL mirror carries the same guard
      .withColumn("base",
        when(col("total__") > 0,
          call_function("div", tc, col("total__").cast("decimal(38,0)"))
            .cast("long")).otherwise(lit(0L)))
      .withColumn("rem",
        when(col("total__") > 0,
          (tc - col("base").cast("decimal(38,0)") *
            col("total__").cast("decimal(38,0)")).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("extra__",
        (lit(budget) - sum(col("base")).over(all)).cast("long"))
      .withColumn("rank__", row_number().over(wOrd))
      .select(col(groupCol), col("weight"), col("base"), col("rem"),
        (col("base") + when(col("total__") > 0 &&
          col("rank__") <= col("extra__"), 1L).otherwise(0L)).as("alloc"))
  }

  /** Epoch plan for UPSAMPLING mixtures (UniMax-style accounting):
    * when a group's allocation exceeds its volume, it repeats —
    * `full_epochs = alloc div weight` whole passes plus a
    * `partial_tokens = alloc mod weight` fractional pass (selected by
    * the same deterministic budget-cut machinery downstream). Pure
    * integer division over [[largestRemainder]]'s output; zero-weight
    * groups plan zero epochs. */
  def epochPlan(df: DataFrame, groupCol: String, weightCol: String,
      budget: Long): DataFrame =
    largestRemainder(df, groupCol, weightCol, budget)
      .select(col(groupCol), col("weight"), col("alloc"),
        when(col("weight") > 0,
          call_function("div", col("alloc"), col("weight")))
          .otherwise(lit(0L)).as("full_epochs"),
        when(col("weight") > 0, pmod(col("alloc"), col("weight")))
          .otherwise(lit(0L)).as("partial_tokens"))

  /** The DuckDB mirror of [[epochPlan]] for oracle SQL. */
  def epochPlanSql(table: String, group: String, weight: String,
      budget: Long): String =
    s"""SELECT $group, weight, alloc,
       |  CASE WHEN weight > 0 THEN alloc // weight
       |    ELSE CAST(0 AS BIGINT) END AS full_epochs,
       |  CASE WHEN weight > 0 THEN alloc % weight
       |    ELSE CAST(0 AS BIGINT) END AS partial_tokens
       |FROM (${largestRemainderSql(table, group, weight, budget)}) ap__""".stripMargin

  /** Materialize a target mixture: apportion `budget` across groups
    * with [[largestRemainder]], then keep each group's best rows —
    * ordered by `orderCols` (give a deterministic total order; an
    * integer key like quality_e4 + id keeps the whole lineage
    * float-free) — while the group's running `weightCol` stays within
    * its allocation. The selection window partitions BY GROUP (shuffle
    * on the group key, per-group sort — the scalable shape); the
    * allocation table is group-cardinality and joins back broadcast. */
  def selectToAllocation(df: DataFrame, groupCol: String,
      weightCol: String, orderCols: Seq[Column], budget: Long,
      runningOut: String = "cum_weight"): DataFrame = {
    // the input lineage is referenced twice (allocation count + the
    // selection join) — persist or an expensive upstream (q84 scores
    // every doc with four regexes) runs twice. Registered with
    // [[graft.Caches]]; callers release via unpersistAll()/a
    // mark()/releaseSince scope after materializing.
    val cached = graft.Caches.register(
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val alloc = largestRemainder(cached, groupCol, weightCol, budget)
      .select(col(groupCol), col("alloc"))
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cached.join(broadcast(alloc), Seq(groupCol))
      .withColumn(runningOut,
        sum(coalesce(col(weightCol), lit(0L))).over(w))
      .filter(col(runningOut) <= col("alloc"))
  }

  /** The DuckDB mirror of [[largestRemainder]] for oracle SQL: same
    * integer arithmetic over HUGEINT, same (rem desc, group asc)
    * tie-break. `table`/`group`/`weight` are SQL fragments (`table`
    * may be a parenthesized subquery with alias); the group column is
    * emitted back under its own name. */
  def largestRemainderSql(table: String, group: String, weight: String,
      budget: Long): String =
    s"""WITH c AS (SELECT $group AS g, sum($weight) AS weight
       |  FROM $table GROUP BY 1),
       |t AS (SELECT g, weight,
       |    CAST(CAST($budget AS HUGEINT) * weight AS HUGEINT) AS tc,
       |    sum(weight) OVER () AS total
       |  FROM c),
       |b AS (SELECT g, weight, total,
       |    CASE WHEN total > 0 THEN CAST(tc // total AS BIGINT)
       |      ELSE CAST(0 AS BIGINT) END AS base,
       |    CASE WHEN total > 0 THEN CAST(tc % total AS BIGINT)
       |      ELSE CAST(0 AS BIGINT) END AS rem
       |  FROM t),
       |r AS (SELECT *,
       |    row_number() OVER (ORDER BY rem DESC, g ASC) AS rk,
       |    $budget - sum(base) OVER () AS extra
       |  FROM b)
       |SELECT g AS $group, CAST(weight AS BIGINT) AS weight, base, rem,
       |  base + (CASE WHEN total > 0 AND rk <= extra THEN 1 ELSE 0 END) AS alloc
       |FROM r""".stripMargin

  /** EPOCH-CAPPED water-filling — UniMax proper (Chung et al. 2023):
    * split `budget` EQUALLY across groups, except no group may exceed
    * `maxEpochs` passes over its own volume (cap_g = E·w_g). Small
    * groups saturate at their cap; the freed budget re-splits equally
    * among the rest. Closed form instead of the paper's iterative
    * loop: order groups by cap ascending (group name tiebreak); group
    * i of G saturates iff even after granting every smaller cap the
    * equal split of what's left covers it —
    *
    *   cap_i·(G−i+1) + Σ_{j<i} cap_j ≤ B
    *
    * The left side is non-decreasing in i (caps ascend), so the
    * saturated set is a PREFIX of the order: k = #saturated falls out
    * of one window sum. Non-saturated groups take
    * base = ⌊(B−S_k)/(G−k)⌋, with the mod-(G−k) residual granted one
    * unit each to the first residual-many in cap order — every step
    * integer (DECIMAL(38,0): cap·G crosses long range once corpus
    * bytes reach ~1e14 at thousands of groups). `budget` is the
    * rational budgetNum/budgetDen OF the total volume, so the gate is
    * scale-free across SF dirs. If B ≥ Σcap every group saturates and
    * the surplus stays unallocated (the corpus simply can't absorb
    * the budget at ≤E epochs) — alloc still sums to min(B', Σcap)
    * exactly where B' is the grantable part.
    *
    * Shape at scale: identical to [[largestRemainder]] — one
    * map-side-combinable corpus aggregate, then windows over the
    * bounded group frame (thousands of rows at most). */
  def epochCappedWaterFill(df: DataFrame, groupCol: String,
      weightCol: String, budgetNum: Long, budgetDen: Long,
      maxEpochs: Long): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0 && maxEpochs >= 1,
      "budget fraction non-negative, maxEpochs >= 1")
    def d(c: Column) = c.cast("decimal(38,0)")
    val all = Window.partitionBy()
    val ord = Window.partitionBy()
      .orderBy(col("cap").asc, col(groupCol).asc)
    val run = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    df.groupBy(col(groupCol))
      .agg(sum(col(weightCol)).as("weight"))
      .withColumn("cap", col("weight") * lit(maxEpochs))
      .withColumn("budget__",
        call_function("div",
          d(sum(col("weight")).over(all)) * lit(budgetNum),
          lit(budgetDen).cast("decimal(38,0)")).cast("long"))
      .withColumn("g__", count(lit(1)).over(all))
      .withColumn("i__", row_number().over(ord))
      .withColumn("cum__", sum(col("cap")).over(run))
      .withColumn("saturated",
        d(col("cap")) * d(col("g__") - col("i__") + 1L) +
          d(col("cum__") - col("cap")) <= d(col("budget__")))
      .withColumn("k__",
        sum(when(col("saturated"), 1L).otherwise(0L)).over(all))
      .withColumn("rem__", col("budget__") -
        coalesce(sum(when(col("saturated"), col("cap"))).over(all),
          lit(0L)))
      .withColumn("m__", col("g__") - col("k__"))
      .withColumn("base__", when(col("m__") > 0,
        call_function("div", d(col("rem__")), d(col("m__")))
          .cast("long")).otherwise(lit(0L)))
      .withColumn("res__", when(col("m__") > 0,
        col("rem__") - col("base__") * col("m__")).otherwise(lit(0L)))
      .select(col(groupCol), col("weight"), col("cap"), col("saturated"),
        when(col("saturated"), col("cap"))
          .otherwise(col("base__") +
            when(col("i__") - col("k__") <= col("res__"), 1L)
              .otherwise(0L)).as("alloc"))
  }

  /** Proportional INTERLEAVE order — materialize the deterministic
    * global training order in which every source is spread evenly
    * across the run instead of concatenated ("don't front-load one
    * source", the schedule the mixing allocators above feed). Each
    * doc gets its within-source rank r (deterministic md5-then-id
    * order, the q52 sampling order) out of n_g, and the canonical
    * low-discrepancy position
    *
    *   pos = (2r − 1) / (2·n_g)
    *
    * — source g's docs sit at odd multiples of 1/(2n_g), so reading
    * in (pos, source, r) order interleaves sources proportionally to
    * their sizes (any prefix of the order holds ≈ the corpus mix).
    * pos is emitted as the exact e12-scaled integer `pos_e12`
    * (ExactRound; distinct ranks stay distinct up to n_g ≈ 5·10¹¹
    * docs per source — beyond any real corpus).
    *
    * Shape at scale: the rank is [[ScalableRank.groupRowNumber]]'s
    * range-partitioned global sort + offset arithmetic — NEVER a
    * per-source window partition (a 40% source would be one straggler
    * task); position math is a codegen'd projection. Consumers sort
    * by (pos_e12, source, rn) — a global range sort, which Spark
    * distributes. */
  def interleaveOrder(df: DataFrame, idCol: String,
      sourceCol: String): DataFrame = {
    import graft.functions.ExactRound
    val ranked = ScalableRank.groupRowNumber(
      df.select(col(idCol), col(sourceCol))
        .filter(col(idCol).isNotNull), Seq(sourceCol),
      Seq(md5(col(idCol).cast("string")), col(idCol)), "rn", "n")
    ranked.select(col(idCol), col(sourceCol),
      col("rn").cast("long").as("rn"), col("n").cast("long").as("n"),
      ExactRound.ratioScaled(lit(2L) * col("rn") - 1L,
        lit(2L) * col("n"), 12).as("pos_e12"))
  }

  /** The DuckDB mirror of [[interleaveOrder]]. */
  def interleaveOrderSql(table: String, id: String,
      source: String): String =
    s"""WITH r AS (SELECT $id, $source,
       |    row_number() OVER (PARTITION BY $source
       |      ORDER BY md5(CAST($id AS VARCHAR)), $id) AS rn,
       |    count(*) OVER (PARTITION BY $source) AS n
       |  FROM $table WHERE $id IS NOT NULL)
       |SELECT $id, $source, CAST(rn AS BIGINT) AS rn,
       |  CAST(n AS BIGINT) AS n,
       |  ${graft.functions.ExactRound.ratioScaledSql(
            "2 * rn - 1", "2 * n", 12)} AS pos_e12
       |FROM r""".stripMargin

  /** Epoch schedule of the water-fill allocation — [[epochPlan]]'s
    * decomposition applied to [[epochCappedWaterFill]]: per group the
    * repeat factor a dataloader actually consumes (full passes over
    * the group + the partial-pass remainder, both integer-exact, and
    * the partial fraction as exact e6). By construction
    * full_epochs ≤ maxEpochs, with equality exactly on saturated
    * groups (cap = E·w divides evenly). Same shape as the allocator:
    * aggregate + windows over the bounded group frame. */
  def waterFillEpochPlan(df: DataFrame, groupCol: String,
      weightCol: String, budgetNum: Long, budgetDen: Long,
      maxEpochs: Long): DataFrame = {
    import graft.functions.ExactRound
    epochCappedWaterFill(df, groupCol, weightCol, budgetNum,
        budgetDen, maxEpochs)
      .select(col(groupCol), col("weight"), col("alloc"),
        col("saturated"),
        when(col("weight") > 0,
          call_function("div", col("alloc"), col("weight")))
          .otherwise(lit(0L)).as("full_epochs"),
        when(col("weight") > 0, pmod(col("alloc"), col("weight")))
          .otherwise(lit(0L)).as("partial_units"),
        ExactRound.ratioScaled(
          when(col("weight") > 0, pmod(col("alloc"), col("weight")))
            .otherwise(lit(0L)),
          col("weight"), 6).as("frac_epoch_e6"))
  }

  /** The DuckDB mirror of [[waterFillEpochPlan]]. */
  def waterFillEpochPlanSql(table: String, group: String,
      weight: String, budgetNum: Long, budgetDen: Long,
      maxEpochs: Long): String = {
    val rs = graft.functions.ExactRound
    s"""SELECT $group, weight, alloc, saturated,
       |  CASE WHEN weight > 0 THEN alloc // weight
       |    ELSE CAST(0 AS BIGINT) END AS full_epochs,
       |  CASE WHEN weight > 0 THEN alloc % weight
       |    ELSE CAST(0 AS BIGINT) END AS partial_units,
       |  ${rs.ratioScaledSql(
           "CASE WHEN weight > 0 THEN alloc % weight ELSE 0 END",
           "weight", 6)} AS frac_epoch_e6
       |FROM (${epochCappedWaterFillSql(table, group, weight,
           budgetNum, budgetDen, maxEpochs)}) wf__""".stripMargin
  }

  /** Shard-mix audit of [[interleaveOrder]] — cut the interleaved
    * order into `shards` contiguous position ranges (shard =
    * ⌊pos·k⌋ clamped, i.e. equal slices of [0,1)) and report each
    * shard's source composition against the global mix: the
    * "any prefix/slice of the schedule holds ≈ the corpus mix" claim
    * as a gate, with the per-(shard, source) absolute deviation in
    * exact e6. A curation pipeline runs this before shipping a
    * schedule; a dataloader reading shard i gets dev_e6-bounded skew.
    *
    * Shape at scale: [[interleaveOrder]]'s rank pass, then one
    * map-side-combinable (shard, source) aggregate; shares re-derive
    * from broadcast shard/global totals over the |shards|·|sources|
    * frame. */
  def interleaveShardMix(df: DataFrame, idCol: String,
      sourceCol: String, shards: Int): DataFrame = {
    import graft.functions.ExactRound
    require(shards >= 1, "shards >= 1")
    val per = interleaveOrder(df, idCol, sourceCol)
      .withColumn("shard", least(
        call_function("div", col("pos_e12") * shards,
          lit(1000000000000L)),
        lit(shards - 1L)))
      .groupBy(col("shard"), col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
    val shardTot = per.groupBy(col("shard"))
      .agg(sum(col("n_docs")).as("shard_n"))
    val srcTot = per.groupBy(col(sourceCol))
      .agg(sum(col("n_docs")).as("src_n"))
    val all = srcTot.agg(sum(col("src_n")).as("total_n"))
    per.join(broadcast(shardTot), "shard")
      .join(broadcast(srcTot), sourceCol)
      .crossJoin(broadcast(all))
      .select(col("shard"), col(sourceCol), col("n_docs"),
        ExactRound.ratioScaled(col("n_docs"), col("shard_n"), 6)
          .as("share_e6"),
        ExactRound.ratioScaled(col("src_n"), col("total_n"), 6)
          .as("global_share_e6"))
      .withColumn("dev_e6",
        abs(col("share_e6") - col("global_share_e6")))
  }

  /** The DuckDB mirror of [[interleaveShardMix]]. */
  def interleaveShardMixSql(table: String, id: String, source: String,
      shards: Int): String = {
    val rs = graft.functions.ExactRound
    s"""WITH r AS (SELECT $id, $source,
       |    row_number() OVER (PARTITION BY $source
       |      ORDER BY md5(CAST($id AS VARCHAR)), $id) AS rn,
       |    count(*) OVER (PARTITION BY $source) AS n
       |  FROM $table WHERE $id IS NOT NULL),
       |p AS (SELECT $id, $source,
       |    ${rs.ratioScaledSql("2 * rn - 1", "2 * n", 12)} AS pos
       |  FROM r),
       |per AS (SELECT least(pos * $shards // 1000000000000,
       |      ${shards - 1}) AS shard, $source,
       |    count(*) AS n_docs
       |  FROM p GROUP BY 1, 2),
       |st AS (SELECT shard, CAST(sum(n_docs) AS BIGINT) AS shard_n
       |  FROM per GROUP BY 1),
       |sc AS (SELECT $source, CAST(sum(n_docs) AS BIGINT) AS src_n
       |  FROM per GROUP BY 1),
       |tt AS (SELECT CAST(sum(src_n) AS BIGINT) AS total_n FROM sc)
       |SELECT CAST(shard AS BIGINT) AS shard, $source,
       |  CAST(n_docs AS BIGINT) AS n_docs,
       |  ${rs.ratioScaledSql("n_docs", "shard_n", 6)} AS share_e6,
       |  ${rs.ratioScaledSql("src_n", "total_n", 6)}
       |    AS global_share_e6,
       |  abs(${rs.ratioScaledSql("n_docs", "shard_n", 6)}
       |    - ${rs.ratioScaledSql("src_n", "total_n", 6)}) AS dev_e6
       |FROM per JOIN st USING (shard) JOIN sc USING ($source)
       |CROSS JOIN tt""".stripMargin
  }

  /** The DuckDB mirror of [[epochCappedWaterFill]] for oracle SQL —
    * same order, same prefix-saturation predicate, same residual
    * hand-out, HUGEINT throughout. */
  /** Post-hoc REWEIGHTING to the capped water-fill allocation — the
    * sampling-free twin of [[epochCappedWaterFill]]: keep every doc
    * and give source g the loss weight alloc_g / n_g instead of
    * physically resampling (the standard move when the mixture is
    * applied at training time as example weights rather than at
    * materialization time as repeats). Per source: doc count, the
    * allocation, the e6 loss weight, and natural vs target corpus
    * shares — weights > 1e6 mark up-weighted (epoch-repeated)
    * sources, < 1e6 down-weighted ones.
    *
    * Shape at scale: everything after the allocator runs on the
    * |sources|-row frame (the Apportion bounded-window precedent). */
  def reweightToAllocation(df: DataFrame, groupCol: String,
      budgetNum: Long, budgetDen: Long, maxEpochs: Long): DataFrame = {
    import graft.functions.ExactRound
    val wf = epochCappedWaterFill(
      df.select(col(groupCol)).withColumn("one__", lit(1L)),
      groupCol, "one__", budgetNum, budgetDen, maxEpochs)
    val all = Window.partitionBy()
    wf.select(col(groupCol), col("weight").as("n_docs"), col("alloc"),
        sum(col("weight")).over(all).as("tot__"),
        sum(col("alloc")).over(all).as("tota__"))
      .select(col(groupCol), col("n_docs"), col("alloc"),
        ExactRound.ratioScaled(col("alloc"), col("n_docs"), 6)
          .as("loss_weight_e6"),
        ExactRound.ratioScaled(col("n_docs"), col("tot__"), 6)
          .as("share_nat_e6"),
        ExactRound.ratioScaled(col("alloc"), col("tota__"), 6)
          .as("share_target_e6"))
  }

  /** The DuckDB mirror of [[reweightToAllocation]] — wraps the
    * [[epochCappedWaterFillSql]] mirror and applies the same share
    * and weight rationals. */
  def reweightToAllocationSql(table: String, group: String,
      budgetNum: Long, budgetDen: Long, maxEpochs: Long): String = {
    import graft.functions.ExactRound.ratioScaledSql
    s"""WITH wf AS (
       |${epochCappedWaterFillSql(table, group, "1", budgetNum,
           budgetDen, maxEpochs)}),
       |rw AS (SELECT $group, weight, alloc,
       |    sum(weight) OVER () AS tot, sum(alloc) OVER () AS tota
       |  FROM wf)
       |SELECT $group, weight AS n_docs, alloc,
       |  ${ratioScaledSql("alloc", "weight", 6)} AS loss_weight_e6,
       |  ${ratioScaledSql("weight", "tot", 6)} AS share_nat_e6,
       |  ${ratioScaledSql("alloc", "tota", 6)} AS share_target_e6
       |FROM rw""".stripMargin
  }

  def epochCappedWaterFillSql(table: String, group: String,
      weight: String, budgetNum: Long, budgetDen: Long,
      maxEpochs: Long): String =
    s"""WITH wc AS (SELECT $group AS g,
       |    CAST(sum($weight) AS HUGEINT) AS weight
       |  FROM $table GROUP BY 1),
       |wp AS (SELECT g, weight, $maxEpochs * weight AS cap,
       |    (sum(weight) OVER () * $budgetNum) // $budgetDen AS budget,
       |    count(*) OVER () AS gn,
       |    row_number() OVER (ORDER BY $maxEpochs * weight ASC, g ASC)
       |      AS i,
       |    sum($maxEpochs * weight) OVER (
       |      ORDER BY $maxEpochs * weight ASC, g ASC
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM wc),
       |ws AS (SELECT *,
       |    (cap * (gn - i + 1) + (cum - cap) <= budget) AS saturated
       |  FROM wp),
       |wk AS (SELECT *,
       |    sum(CASE WHEN saturated THEN 1 ELSE 0 END) OVER () AS k,
       |    budget - coalesce(sum(CASE WHEN saturated THEN cap END)
       |      OVER (), 0) AS rem
       |  FROM ws),
       |wm AS (SELECT *, gn - k AS m,
       |    CASE WHEN gn > k THEN rem // (gn - k) ELSE 0 END AS base
       |  FROM wk)
       |SELECT g AS $group, CAST(weight AS BIGINT) AS weight,
       |  CAST(cap AS BIGINT) AS cap, saturated,
       |  CAST(CASE WHEN saturated THEN cap
       |    ELSE base + (CASE WHEN i - k <= rem - base * m
       |      THEN 1 ELSE 0 END) END AS BIGINT) AS alloc
       |FROM wm""".stripMargin
}
