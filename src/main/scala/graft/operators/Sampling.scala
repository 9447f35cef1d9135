package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

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

  /** Above this many distinct keys, per-key constants are attached by a
    * broadcast join instead of a `when`-chain expression. A chain of k
    * branches is a k-deep expression tree: past a few hundred keys it
    * blows codegen method/constant-pool limits long before data size
    * matters (a per-DOMAIN mix has 100k+ groups). The threshold keeps
    * the common tens-of-sources case a pure codegen'd projection. */
  private[operators] val chainRouteMaxKeys = 256

  /** Attach per-key constant columns (`fields`, valued from `values`) to
    * rows, keyed on the STRING form of `keyCol`. Two routes, identical
    * results (asserted in SamplingSpec):
    *
    *  - chain (k <= `chainMaxKeys`): one nested when-chain per field —
    *    a pure projection, no join, fully codegen'd;
    *  - join (k > `chainMaxKeys`): broadcast hash join against a k-row
    *    literal frame — constant-pool-safe at 100k+ keys; the frame is
    *    quota metadata (bytes per key), never corpus-sized.
    *
    * Rows whose key is NULL or absent from `values` get `defaults`
    * (chain: the otherwise branch; join: left-join miss + coalesce). */
  private def attachPerKey(df: DataFrame, keyCol: Column,
                           values: Map[String, Seq[Any]],
                           fields: Seq[StructField],
                           defaults: Seq[Column],
                           chainMaxKeys: Int): DataFrame = {
    require(fields.length == defaults.length)
    if (values.size <= chainMaxKeys) {
      fields.zipWithIndex.foldLeft(df) { case (d, (f, i)) =>
        val c = values.foldLeft(defaults(i).cast(f.dataType)) {
          case (acc, (k, vs)) =>
            when(keyCol.cast("string") === lit(k),
              lit(vs(i)).cast(f.dataType)).otherwise(acc)
        }
        d.withColumn(f.name, c)
      }
    } else {
      val spark = df.sparkSession
      val schema = StructType(StructField("__pk_key", StringType) +: fields)
      val rows = values.toSeq.map { case (k, vs) => Row.fromSeq(k +: vs) }
      val lookup = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      val joined = df.join(broadcast(lookup),
        keyCol.cast("string") === col("__pk_key"), "left")
      fields.zipWithIndex.foldLeft(joined) { case (d, (f, i)) =>
        d.withColumn(f.name, coalesce(col(f.name), defaults(i).cast(f.dataType)))
      }.drop("__pk_key")
    }
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
    * if they should be kept.
    *
    * Per-stratum boundaries attach via [[attachPerKey]]: a when-chain up
    * to `chainMaxKeys` strata, a broadcast quota join beyond — both
    * routes keep the operator a shuffle-free per-row filter. */
  def stableStratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                             fractions: Map[String, Double],
                             defaultFraction: Double = 1.0,
                             chainMaxKeys: Int = chainRouteMaxKeys): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0 && f <= 1, s"fraction $f out of [0,1]"))
    val b = bucket(concat(col(stratumCol).cast("string"), lit(":"),
      col(idCol).cast("string")))
    val withBound = attachPerKey(df, col(stratumCol),
      fractions.map { case (s, f) => s -> Seq[Any](boundary(f)) },
      Seq(StructField("__ss_bound", StringType)),
      Seq(lit(boundary(defaultFraction))), chainMaxKeys)
    withBound.filter(b < col("__ss_bound")).drop("__ss_bound")
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

  /** Per-source md5-rank window shared by the mixing operators. */
  private def sourceRank(idCol: String, srcCol: String): Column = {
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(col(srcCol).cast("string"), lit(":"),
      col(idCol).cast("string")))
    row_number().over(
      Window.partitionBy(col(srcCol)).orderBy(key.asc, col(idCol).asc))
  }

  /** Temperature-weighted source mixing — the standard multi-source
    * training-mix reweighter (the `p_i^alpha / sum p_j^alpha` rule of
    * multilingual/multi-domain pretraining): draw ~`targetTotal`
    * documents across sources with per-source quotas proportional to
    * `n_s^alpha`, so `alpha` = 1 keeps natural proportions and `alpha`
    * → 0 flattens toward uniform, upsampling rare sources relative to
    * their share.
    *
    * CONTRACT NOTES (exact, engine-portable semantics):
    *  - The draw is APPROXIMATELY `targetTotal`: per-source quotas are
    *    rounded independently with a `max(1, …)` floor (every source
    *    contributes at least one row), so the total can land a few rows
    *    above or below the target — up to ±(#sources) in the worst
    *    case. Callers needing an exact count should trim the result.
    *  - A source's quota is capped at its population (alpha < 1 can ask
    *    a rare source for more rows than it has; this operator samples
    *    without replacement and keeps the source whole instead — see
    *    [[temperatureMixRepeats]] for the upsampling contract that
    *    emits per-row copy counts for the data loader).
    *  - Rows whose source is NULL are DROPPED (no quota can key them);
    *    a NULL source group still contributes its population to the
    *    Σ n^alpha normalizer, exactly as `SUM(POW(n, alpha))` over a
    *    SQL `GROUP BY source` would. Filter nulls first (or backfill a
    *    sentinel source) if they must participate.
    *
    * Per-source counts (one hash agg, k rows) come to the driver — k is
    * the number of SOURCES (domains/languages), not corpus-sized.
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
    * capped stream (SamplingSpec plan-asserts the partial+final pair).
    * The per-source quota attaches via [[attachPerKey]]: a when-chain at
    * tens of sources, a broadcast quota join past `chainMaxKeys` (a
    * per-domain mix with 100k+ groups must not build a 100k-deep
    * expression tree — both routes return identical rows, asserted in
    * SamplingSpec). */
  def temperatureMix(df: DataFrame, idCol: String, srcCol: String,
                     alpha: Double, targetTotal: Long,
                     chainMaxKeys: Int = chainRouteMaxKeys): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha $alpha out of [0,1]")
    require(targetTotal >= 1, s"targetTotal must be >= 1, got $targetTotal")
    val all = df.groupBy(col(srcCol).cast("string").as("__src"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0), r.getLong(1)))
    val sumA = all.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val quota = all.filter(_._1 != null).map { case (src, n) =>
      src -> math.min(n,
        math.max(1L, math.round(targetTotal * math.pow(n.toDouble, alpha) / sumA)))
    }.toMap
    val maxQuota = if (quota.isEmpty) 1L else quota.values.max
    val ranked = df.withColumn("__tm_rn", sourceRank(idCol, srcCol))
      .filter(col("__tm_rn") <= lit(maxQuota))
    attachPerKey(ranked, col(srcCol),
      quota.map { case (s, q) => s -> Seq[Any](q) },
      Seq(StructField("__tm_q", LongType)),
      Seq(lit(null)), chainMaxKeys)
      .filter(col("__tm_rn") <= col("__tm_q"))
      .drop("__tm_rn", "__tm_q")
  }

  /** [[temperatureMix]] with the UPSAMPLING side of the contract made
    * explicit: returns the mixed rows plus an `n_copies` LONG column
    * telling the data loader how many times to emit each row, so an
    * alpha → 0 mix can ask a rare source for MORE rows than it has and
    * get a deterministic repeat plan instead of a silently-capped draw.
    *
    * Per source s with population n_s, the uncapped quota is
    * q_s = max(1, round(targetTotal · n_s^alpha / Σ n^alpha)); every row
    * of s gets `n_copies = q_s div n_s`, and the first `q_s mod n_s`
    * rows in the stable md5 rank order get one extra — so
    * Σ n_copies == q_s EXACTLY, reproducibly, on any engine (the rank
    * is the same `md5(source || ':' || id)` draw as [[temperatureMix]]).
    * Rows with `n_copies` = 0 (the unchosen tail of a DOWNsampled
    * source) are not returned; when no source is upsampled the returned
    * row set is exactly [[temperatureMix]]'s with `n_copies` = 1.
    * NULL-source rows are dropped, same as [[temperatureMix]].
    *
    * The engine stays replacement-free — repeats are a COUNT, not
    * materialized rows (a 50× upsampled source costs its population,
    * not 50× it, in every downstream shuffle); the loader expands them
    * at iteration time. Scale shape matches [[temperatureMix]] except
    * the literal map-side group cap only installs when NO source is
    * upsampled (an upsampled source keeps every row, so there is no
    * literal bound to push; the window itself remains one hash exchange
    * on source). */
  def temperatureMixRepeats(df: DataFrame, idCol: String, srcCol: String,
                            alpha: Double, targetTotal: Long,
                            chainMaxKeys: Int = chainRouteMaxKeys): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha $alpha out of [0,1]")
    require(targetTotal >= 1, s"targetTotal must be >= 1, got $targetTotal")
    val all = df.groupBy(col(srcCol).cast("string").as("__src"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0), r.getLong(1)))
    val sumA = all.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val plan = all.filter(_._1 != null).map { case (src, n) =>
      val q = math.max(1L, math.round(targetTotal * math.pow(n.toDouble, alpha) / sumA))
      src -> (q / n, q % n) // (base copies for all rows, +1 for first rem)
    }.toMap
    val ranked = {
      val r = df.withColumn("__tm_rn", sourceRank(idCol, srcCol))
      // pure downsample (all bases 0): the rank filter has a literal
      // bound again — install the map-side group cap like temperatureMix
      if (plan.nonEmpty && plan.values.forall(_._1 == 0L))
        r.filter(col("__tm_rn") <= lit(plan.values.map(_._2).max))
      else r
    }
    attachPerKey(ranked, col(srcCol),
      plan.map { case (s, (b, rem)) => s -> Seq[Any](b, rem) },
      Seq(StructField("__tm_base", LongType), StructField("__tm_rem", LongType)),
      Seq(lit(null), lit(null)), chainMaxKeys)
      .withColumn("n_copies",
        col("__tm_base") + when(col("__tm_rn") <= col("__tm_rem"), 1L).otherwise(0L))
      .filter(col("n_copies") >= 1)
      .drop("__tm_rn", "__tm_base", "__tm_rem")
  }

  /** [[temperatureMix]] with the quota denominated in TOKENS — the
    * contract a trainer actually has (a data budget is so-many tokens,
    * not so-many documents; mixing by document count over-weights
    * short-document sources). Per source s with token population t_s,
    * the budget is q_s = min(t_s, max(1, round(targetTokens · t_s^alpha
    * / Σ t_j^alpha))); the source's documents are laid out in the stable
    * `md5(source || ':' || id)` order (the [[temperatureMix]] draw) and
    * every document whose preceding token count within its source is
    * below q_s is kept — document-granular, so the drawn total lands in
    * [q_s, q_s + last-doc) per source, deterministically.
    *
    * 100 TB shape: the per-source running token offsets do NOT sort any
    * source in one partition (the [[temperatureMix]] window would — fine
    * for ranks under a group limit, wrong for a 50 TB source's cumsum).
    * Same two-phase prefix sum as [[Packing.packSequences]]: the order
    * hash's first 2 hex chars shard each source 256 ways, a window
    * cumsum runs per (source, shard) slice, and the per-source shard
    * bases — a (#sources × 256)-row relation — prefix-sum under a
    * per-source window and broadcast back. One hash exchange on
    * (source, shard); ordering by (shard, hash) equals ordering by the
    * hash alone (the shard IS its prefix), which is what the DuckDB
    * oracle recomputes with a single window. Quotas attach via
    * [[attachPerKey]] (when-chain / broadcast-join routed).
    *
    * NULL-source rows are dropped ([[temperatureMix]] contract); rows
    * with a NULL token count are dropped (no defined position in the
    * token stream); zero-token rows ride along free wherever their
    * position lands inside the budget. */
  def temperatureMixTokens(df: DataFrame, idCol: String, srcCol: String,
                           nTokCol: String, alpha: Double, targetTokens: Long,
                           chainMaxKeys: Int = chainRouteMaxKeys): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha $alpha out of [0,1]")
    require(targetTokens >= 1, s"targetTokens must be >= 1, got $targetTokens")
    import org.apache.spark.sql.expressions.Window
    val n = col(nTokCol).cast("long")
    val all = df.filter(n.isNotNull)
      .groupBy(col(srcCol).cast("string").as("__src"))
      .agg(sum(n).as("__t"))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0), r.getLong(1)))
    val sumA = all.map { case (_, t) => math.pow(t.toDouble, alpha) }.sum
    val quota = all.filter(_._1 != null).map { case (src, t) =>
      src -> math.min(t,
        math.max(1L, math.round(targetTokens * math.pow(t.toDouble, alpha) / sumA)))
    }.toMap
    val h = md5(concat(col(srcCol).cast("string"), lit(":"), col(idCol).cast("string")))
    val tagged = df.filter(n.isNotNull && col(srcCol).isNotNull)
      .withColumn("__mt_h", h)
      .withColumn("__mt_shard", substring(col("__mt_h"), 1, 2))
    val wCum = Window
      .partitionBy(col(srcCol).cast("string"), col("__mt_shard"))
      .orderBy(col("__mt_h"), col(idCol))
    val withCum = tagged.withColumn("__mt_cum", sum(n).over(wCum))
    // bases from the PRE-window frame under fresh names: deriving them
    // from withCum would make the join a self-join whose shard equality
    // resolves to one attribute (trivially true — Spark warns) and
    // cross-matches every base of the source
    val wBase = Window.partitionBy(col("__src"))
      .orderBy(col("__b_shard")).rowsBetween(Window.unboundedPreceding, -1)
    val bases = tagged
      .groupBy(col(srcCol).cast("string").as("__src"),
        col("__mt_shard").as("__b_shard"))
      .agg(sum(n).as("__st"))
      .withColumn("__mt_base", coalesce(sum(col("__st")).over(wBase), lit(0L)))
      .select(col("__src"), col("__b_shard"), col("__mt_base"))
    val positioned = withCum.join(broadcast(bases),
        col(srcCol).cast("string") === col("__src") &&
          col("__mt_shard") === col("__b_shard"))
      .drop("__src", "__b_shard")
      .withColumn("__mt_before", col("__mt_base") + col("__mt_cum") - n)
    attachPerKey(positioned, col(srcCol),
      quota.map { case (s, q) => s -> Seq[Any](q) },
      Seq(StructField("__mt_q", LongType)),
      Seq(lit(null)), chainMaxKeys)
      .filter(col("__mt_before") < col("__mt_q"))
      .drop("__mt_h", "__mt_shard", "__mt_cum", "__mt_base", "__mt_before", "__mt_q")
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
  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * select raw-corpus documents whose hashed n-gram feature
    * distribution looks like a TARGET set (the domain the model should
    * learn), by importance weight under two bag-of-features LMs.
    *
    *  1. features = word unigrams ++ space-joined bigrams of the
    *     lowercased text (the paper's hashed n-gram features), hashed
    *     into `numBuckets` buckets via the ENGINE-PORTABLE
    *     md5-hex-prefix integer (conv(md5[0,8), 16) % B — DuckDB
    *     reproduces it as CAST('0x' || substr(md5, 1, 8) AS BIGINT));
    *  2. two bucket censuses (raw and target), Laplace-smoothed into
    *     log-ratios r_b = ln p_target(b) − ln p_raw(b), QUANTIZED to
    *     integer MICROS on the driver — integer sums are exact and
    *     order-free, so per-document scores are bit-identical across
    *     engines regardless of fold order (the DECIMAL-pre-sum policy,
    *     in Long form);
    *  3. per-document importance = Σ r_micro[bucket(f)] over the
    *     document's feature OCCURRENCES — a map-side fold over a
    *     once-bound feature array (the bigram lambda-binding lesson)
    *     with the B-entry micro table riding the plan as a literal
    *     (version-pinned metadata, the centroid-matrix discipline);
    *  4. selection to `targetCount`:
    *     - mode "topk": highest importance wins (ties → lower id) —
    *       the paper's no-noise heuristic arm, fully oracle-exact;
    *     - mode "gumbel": importance resampling proper — the
    *       Gumbel-top-k trick makes weighted sampling WITHOUT
    *       replacement a plain top-k on score + Gumbel noise, and the
    *       noise is seeded md5 (u = (md5-12-hex + 0.5)/16¹², g =
    *       −ln(−ln u), micro-quantized), so the draw is deterministic,
    *       engine-portable and auditable — no per-partition RNG.
    *
    * 100 TB shape: two feature censuses (partial+final agg on B keys),
    * ONE B-bounded driver collect, then a single map-side scoring scan
    * feeding TakeOrderedAndProject — the corpus never shuffles. B is
    * the paper's 10⁴-ish bucket count: require it driver-collectable.
    *
    * Output: the selected rows as (idCol, score_micro [, key_micro])
    * with score_micro the importance in micros (key_micro = score +
    * Gumbel noise for mode "gumbel" — the actual selection key).
    * Reference analog: none — training-data north-star surface. */
  def dsirSelect(raw: DataFrame, idCol: String, textCol: String,
                 target: DataFrame, targetTextCol: String,
                 numBuckets: Int, targetCount: Long,
                 alpha: Double = 1.0,
                 mode: String = "topk", seed: String = "dsir0"): DataFrame = {
    require(mode == "topk" || mode == "gumbel",
      s"mode must be 'topk' or 'gumbel', got '$mode'")
    require(numBuckets >= 2 && numBuckets <= (1 << 20),
      s"numBuckets $numBuckets outside [2, 2^20] (driver-collected table)")
    require(targetCount >= 1, s"targetCount must be >= 1, got $targetCount")
    // limit()/TakeOrdered take an Int: a larger target would silently
    // truncate (2^32+100 -> 100). A >2B-row SELECTION wants a fraction-
    // or threshold-based cut, not a global top-k.
    require(targetCount <= Int.MaxValue,
      s"targetCount must be <= ${Int.MaxValue} (limit/TakeOrdered bound); " +
        s"got $targetCount — select by score threshold instead at that scale")
    import graft.functions.tokens
    // r14: the feature-extraction + bucket passes are this operator's
    // whole cost and run per row — spread a narrow small-file scan
    // across the cores (no-op on real corpus scans; measured −2 s per
    // dsir query at sf0.1, graft.Storage.spread scaladoc)
    val rawS = graft.Storage.spread(raw, col(idCol))
    val targetS = graft.Storage.spread(target, col(targetTextCol))
    // all unigram + bigram OCCURRENCES (not wordShingles' distinct set —
    // DSIR's bag-of-features LMs count occurrences); the token array is
    // bound ONCE behind a projection and the bigrams are a zip_with over
    // two slices of the bound column (the bigramLogProb discipline)
    def withFeatures(df: DataFrame, textC: String, keep: Seq[Column]): DataFrame = {
      // greatest(…, 0): sub-2-token docs slice an EMPTY bigram list
      // instead of erroring on a negative slice length
      val n1 = greatest(size(col("__toks")) - 1, lit(0))
      df.select(keep :+ tokens(lower(col(textC))).as("__toks"): _*)
        .select(keep :+ concat(col("__toks"),
          zip_with(slice(col("__toks"), lit(1), n1),
            slice(col("__toks"), lit(2), n1),
            (a, b) => concat_ws(" ", a, b))).as("__fs"): _*)
    }
    // r14: bucket ids via the one-pass digest expression (value-identical
    // to the conv(substring(md5(f),1,8),16,10) % B contract the oracle
    // recomputes — Md5BucketsExpr scaladoc); the old form re-ran
    // md5 → hex → string-parse per feature occurrence, interpreted,
    // in the scoring fold and again in each census
    def bucketsOf(fs: Column): Column =
      graft.functions.md5Buckets(fs, numBuckets)
    def census(df: DataFrame, textC: String): Array[Long] = {
      val rows = withFeatures(df, textC, Nil)
        .select(explode(bucketsOf(col("__fs"))).as("__b"))
        .groupBy(col("__b"))
        .agg(count(lit(1)).as("__c"))
        .collect()
      val arr = new Array[Long](numBuckets)
      rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
      arr
    }
    val rawCounts = census(rawS, textCol)
    val tgtCounts = census(targetS, targetTextCol)
    val rawTotal = rawCounts.sum.toDouble
    val tgtTotal = tgtCounts.sum.toDouble
    // log-ratio per bucket in integer micros; Laplace smoothing keeps
    // unseen buckets finite on both sides
    val rMicro: Seq[Long] = (0 until numBuckets).map { b =>
      val lt = math.log((tgtCounts(b) + alpha) / (tgtTotal + alpha * numBuckets))
      val lr = math.log((rawCounts(b) + alpha) / (rawTotal + alpha * numBuckets))
      math.round((lt - lr) * 1e6)
    }
    val rArr = typedLit(rMicro)
    // buckets computed ONCE per row by the digest expression; the fold
    // adds Longs looked up in the literal micro table — exact, order-free
    val scored = withFeatures(rawS, textCol, Seq(col(idCol)))
      .select(col(idCol),
        aggregate(bucketsOf(col("__fs")), lit(0L),
          (acc, b) => acc + element_at(rArr, b.cast("int") + 1))
          .as("score_micro"))
    if (mode == "topk")
      scored.orderBy(col("score_micro").desc, col(idCol))
        .limit(targetCount.toInt)
    else {
      // Gumbel-top-k: u strictly inside (0,1) from 12 seeded md5 hex
      // chars; g = -ln(-ln u) in micros rides the integer key
      val u = (conv(substring(md5(concat(lit(seed), lit(":"),
          col(idCol).cast("string"))), 1, 12), 16, 10).cast("double") + 0.5) /
        lit(math.pow(16.0, 12))
      scored
        .withColumn("key_micro",
          col("score_micro") + round(-log(-log(u)) * 1e6).cast("long"))
        .orderBy(col("key_micro").desc, col(idCol))
        .limit(targetCount.toInt)
    }
  }

  def shardShuffle(df: DataFrame, idCol: String, seed: String): DataFrame = {
    val h = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(substring(h, 1, 2)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("shard", substring(h, 1, 2))
      .withColumn("pos", row_number().over(w).cast("long"))
  }
}
