package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and splitting for training
  * corpora.
  *
  * `df.sample()` / `randomSplit()` draw from per-partition XORShift
  * streams: the subset changes with partitioning, Spark version and
  * engine — unacceptable for a training corpus that must be reproducible
  * (and auditable) across reruns and across tools. The stable variants
  * here key every decision on `md5(id)` alone:
  *
  *  - same row → same decision, forever, on any engine with md5;
  *  - pure per-row map — no shuffle, no state, trivially scales to 100 TB
  *    (the filter pushes into the scan's data filters);
  *  - stratification is just a different id string (prepend the stratum).
  *
  * Bucket mechanics: the first 4 lowercase-hex chars of md5 are compared
  * lexicographically against a boundary string — fixed-length lowercase
  * hex orders identically to its numeric value, so `bucket < "cccc"`
  * IS `value < 0xcccc` and any SQL engine reproduces it with md5+substr
  * alone (no hex-to-int conversion needed).
  */
object Sampling {

  /** 4-hex-char bucket in [0, 0x10000) for a row id. */
  private def bucket(id: Column): Column =
    substring(md5(id.cast("string")), 1, 4)

  /** Hex boundary for a cumulative weight: floor(w * 0x10000) as 4-hex.
    * A floored value of 0x10000 (w == 1, or within 1 ulp below — the
    * product can round UP to exactly 65536.0) maps to "g", which sorts
    * after every 4-hex bucket ('g' > 'f') — the naive 5-char "10000"
    * would sort BEFORE "2000" and exclude nearly everything. */
  private[operators] def boundary(w: Double): String = {
    val v = math.floor(w * 0x10000).toLong
    if (v >= 0x10000L) "g" else f"$v%04x"
  }

  /** Keep ~`fraction` of rows, decided by id hash — stable under
    * repartitioning, reruns and engines. */
  def stableSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction out of [0,1]")
    df.filter(bucket(col(idCol)) < lit(boundary(fraction)))
  }

  /** Per-stratum stable sampling — the training-mix downsampler (cap the
    * over-represented language/domain, keep the rare one whole). Keeps
    * ~`fractions(stratum)` of each stratum's rows; strata absent from the
    * map keep `defaultFraction`.
    *
    * The decision is keyed on `md5(stratum || ':' || id)`, NOT on the id
    * alone: two strata draw independent buckets for the same id (no
    * correlated keep/drop across strata), and a stratum's subset is fixed
    * regardless of what other strata contain — adding a new language to
    * the corpus cannot change which English rows survive. Same contract
    * as [[stableSample]] otherwise: pure per-row map, no shuffle, stable
    * across reruns, partitionings and engines.
    *
    * Rows with a NULL stratum are DROPPED (null concat → null bucket →
    * three-valued filter false) — identical to what `md5(stratum || ':'
    * || id)` yields in any SQL engine, so the behavior is deliberately
    * left engine-portable rather than special-cased; filter nulls first
    * if they should be kept. */
  def stableStratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                             fractions: Map[String, Double],
                             defaultFraction: Double = 1.0): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0 && f <= 1, s"fraction $f out of [0,1]"))
    val b = bucket(concat(col(stratumCol).cast("string"), lit(":"),
      col(idCol).cast("string")))
    val bound = fractions.foldLeft(lit(boundary(defaultFraction)): Column) {
      case (acc, (s, f)) =>
        when(col(stratumCol) === lit(s), lit(boundary(f))).otherwise(acc)
    }
    df.filter(b < bound)
  }

  /** Cap every group at `n` rows, selected deterministically — the
    * per-domain/per-source quota of a training mix ("at most N documents
    * per domain"). Selection order is `md5(group || ':' || id)`, so the
    * kept subset is a stable pseudo-random draw per group (not "first N
    * by id", which would bias toward old documents), reproducible across
    * engines, reruns and partitionings; id is the tiebreak so the order
    * is total even on the astronomically-unlikely digest collision.
    *
    * Scale shape: this is a rank-then-filter window, which Catalyst
    * rewrites via InferWindowGroupLimit into a map-side partial
    * WindowGroupLimit BEFORE the shuffle plus a final one after — each
    * map task forwards at most `n` rows per group it sees, so the
    * exchange carries O(tasks × n) rows per group instead of the group's
    * full contents. A 10-billion-row hot domain ships ~tasks×n rows, not
    * 10 billion (SamplingSpec plan-asserts both nodes). Skew therefore
    * bounds itself: the reduce-side window sees at most tasks×n rows per
    * group. Requires `n` below spark.sql.window.group.limit.threshold
    * (default 1000); above it, fall back to [[stableStratifiedSample]]
    * with per-group fractions. */
  def quotaCap(df: DataFrame, idCol: String, groupCol: String, n: Int): DataFrame = {
    require(n >= 1, s"quota must be >= 1, got $n")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(col(groupCol).cast("string"), lit(":"),
      col(idCol).cast("string")))
    val w = Window.partitionBy(col(groupCol)).orderBy(key.asc, col(idCol).asc)
    df.withColumn("__qc_rn", row_number().over(w))
      .filter(col("__qc_rn") <= n)
      .drop("__qc_rn")
  }

  /** Assign every row a split label by id hash; `weights` must sum to 1
    * (e.g. train/val/test 0.8/0.1/0.1). Splits are disjoint, exhaustive
    * and stable. Returns df plus a `split` column. */
  def stableSplit(df: DataFrame, idCol: String,
                  weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1: $weights")
    // a negative weight passes the sum check but produces a negative
    // cumulative boundary whose 16-char two's-complement hex breaks the
    // fixed-width lexicographic compare (every bucket sorts below it)
    require(weights.forall(_._2 > 0), s"every weight must be > 0: $weights")
    val cum = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val b = bucket(col(idCol))
    // fold from the last split upward: else-chain of boundary compares
    val expr = weights.zip(cum).dropRight(1).foldRight(
      lit(weights.last._1): Column) { case (((name, _), c), rest) =>
      when(b < lit(boundary(c)), name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Temperature-weighted source mixing — the standard multi-source
    * training-mix reweighter (the `p_i^alpha / sum p_j^alpha` rule of
    * multilingual/multi-domain pretraining): draw `targetTotal` documents
    * across sources with per-source quotas proportional to `n_s^alpha`,
    * so `alpha` = 1 keeps natural proportions and `alpha` → 0 flattens
    * toward uniform, upsampling rare sources relative to their share.
    *
    * Per-source counts (one hash agg, k rows) come to the driver — k is
    * the number of SOURCES (domains/languages, tens), not corpus-sized,
    * the same bounded-collect discipline as the IVF centroid pulls. A
    * source's quota is capped at its population (alpha < 1 can ask a
    * rare source for more rows than it has; this operator samples
    * without replacement, so it keeps the source whole instead —
    * upsampling-with-repeats is a separate concern for the data loader).
    * Selection within a source is the same stable pseudo-random draw as
    * [[quotaCap]] (`md5(source || ':' || id)` rank), reproducible across
    * engines, reruns and partitionings. The rank filter is TWO stacked
    * predicates: `rn <= max(quota)` — a LITERAL bound, which is what
    * InferWindowGroupLimit requires to install the partial map-side
    * WindowGroupLimit (a per-source column bound does not qualify; this
    * was measured, not assumed) — then the exact per-source
    * `rn <= quota(source)` trim. The shuffle therefore ships
    * O(tasks x max-quota) rows per source, never a hot source's full
    * contents, and the residual filter only discards inside the already-
    * capped stream (SamplingSpec plan-asserts the partial+final pair). */
  def temperatureMix(df: DataFrame, idCol: String, srcCol: String,
                     alpha: Double, targetTotal: Long): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha $alpha out of [0,1]")
    require(targetTotal >= 1, s"targetTotal must be >= 1, got $targetTotal")
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.get(0), r.getLong(1)))
    val sumA = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val quota = counts.map { case (src, n) =>
      (src, math.min(n,
        math.max(1L, math.round(targetTotal * math.pow(n.toDouble, alpha) / sumA))))
    }.toMap
    val quotaCol = quota.foldLeft(lit(0L): Column) { case (acc, (src, q)) =>
      when(col(srcCol) === lit(src), lit(q)).otherwise(acc)
    }
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(col(srcCol).cast("string"), lit(":"),
      col(idCol).cast("string")))
    val w = Window.partitionBy(col(srcCol)).orderBy(key.asc, col(idCol).asc)
    val maxQuota = if (quota.isEmpty) 1L else quota.values.max
    df.withColumn("__tm_rn", row_number().over(w))
      .filter(col("__tm_rn") <= lit(maxQuota))
      .filter(col("__tm_rn") <= quotaCol)
      .drop("__tm_rn")
  }

  /** Deterministic global shuffle for training order: assign every row a
    * shard label (first 2 hex chars of `md5(seed || ':' || id)` — 256
    * shards) and a dense position within its shard (rank by the full
    * digest). The (shard, pos) order is a reproducible pseudo-random
    * permutation of the corpus — the "global shuffle before training"
    * step — computed WITHOUT a global sort: each shard sorts
    * independently under the window, so the plan is one hash exchange on
    * shard + per-partition sort, and shard count (not corpus size) bounds
    * what any single task must order. Readers stream shards in label
    * order, positions within each; changing `seed` gives an independent
    * permutation for the next epoch. Hex-string shard labels keep the
    * whole contract portable to any engine with md5+substr (same
    * reasoning as [[stableSample]]'s lexicographic buckets). */
  def shardShuffle(df: DataFrame, idCol: String, seed: String): DataFrame = {
    val h = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(substring(h, 1, 2)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("shard", substring(h, 1, 2))
      .withColumn("pos", row_number().over(w).cast("long"))
  }
}
