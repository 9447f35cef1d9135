package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.functions.{tokens, wordShingles}
import graft.operators.Dedup

/** Text analysis + deduplication over the `documents` table — the
  * training-data-pipeline surface (SURVEY.md §2.B north-star extensions):
  * token counting, language ID heuristic, quality scoring, fingerprinting,
  * exact dedup, n-gram Jaccard near-dup.
  *
  * Everything here is built-in codegen'd expressions (split / explode /
  * higher-order functions) — no UDFs — so the scans stay in whole-stage
  * codegen and column pruning reaches parquet (only doc_id+text are read).
  *
  * Scale notes: the n-gram Jaccard pair join is shingle-partitioned
  * (explode → shuffle on shingle), which is the standard inverted-index
  * formulation; hot shingles are the skew risk at 100 TB, handled by AQE
  * skew-join plus the MinHash-LSH path in graft.operators.Dedup (banded
  * buckets bound candidate-pair fanout).
  */
object Text extends QueryPack {

  private val enStops = Seq("the", "a", "of", "and", "to", "in", "is")
  private val esStops = Seq("el", "la", "de", "que", "los", "las", "y")

  private def stopCount(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => t.isin(stops: _*))).cast("long")

  /** Whitespace-normalized lowercase body — the canonical form fingerprinted
    * and exact-dedup'd. */
  private def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Broadcast cap for the per-term document-frequency relation in the
    * ranking queries (VERDICT_r05 next-round #2). A real-text vocabulary
    * grows with the corpus (heaps' law) — at 100 TB the df relation is
    * NOT a dimension table, and an unconditional `broadcast(df)` hint
    * would ship a multi-GB map to every executor (or OOM the driver
    * building it). 2^20 terms ≈ tens of MB serialized — comfortably
    * broadcastable — while anything larger falls back to a shuffle join
    * keyed on `term`, which is the correct plan at scale. */
  private[graft] val MaxBroadcastVocab: Long = 1L << 20

  /** Measured vocab-gated term join — moved to
    * [[graft.operators.Curation.idfJoinVocabGated]] (shared with the
    * unigram-LM scorer); kept as a forwarder for the ranking queries and
    * their routing spec. */
  private[graft] def idfJoinVocabGated(tf: DataFrame, dfRel: DataFrame,
                                       maxBroadcastVocab: Long): DataFrame =
    graft.operators.Curation.idfJoinVocabGated(tf, dfRel, maxBroadcastVocab)

  /** TF-IDF top-20 (doc, term) scores — the `text_tfidf` query body,
    * parameterized on the broadcast gate so the routing spec can force
    * both plans. Scoring semantics documented at the map entry. */
  private[graft] def tfidf(docs: DataFrame,
                           maxBroadcastVocab: Long = MaxBroadcastVocab): DataFrame = {
    // corpus size as a 1-row scalar agg folded into the plan (broadcast
    // crossJoin); cast-to-double order matches the oracle's
    // CAST(n AS DOUBLE) + 1.0. The df-relation routing count below is the
    // one driver action (measure-then-route, as Dedup.jaccardPairs).
    val nDf = broadcast(docs.agg(count(lit(1)).cast("double").as("nd")))
    val terms = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    idfJoinVocabGated(tf, df, maxBroadcastVocab).crossJoin(nDf)
      .select(col("doc_id"), col("term"),
        (col("tf") * ((col("nd") + lit(1.0)) / (col("df") + lit(1.0))))
          .cast(DecimalType(18, 4)).cast("double").as("tfidf"))
      .orderBy(col("tfidf").desc, col("doc_id"), col("term"))
      .limit(20)
  }

  /** BM25 top-20 (doc, term) scores — the `text_bm25` query body,
    * parameterized on the broadcast gate so the routing spec can force
    * both plans. Scoring semantics documented at the map entry. */
  private[graft] def bm25(docs: DataFrame,
                          maxBroadcastVocab: Long = MaxBroadcastVocab): DataFrame = {
    val terms = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val dl = terms.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    // scalars: n (corpus count) and avgdl (= exact long token total cast
    // to double, divided by n-as-double) — same IEEE op sequence as the
    // oracle's `CAST(SUM(dl) AS DOUBLE) / n`.
    val scalars = broadcast(
      docs.agg(count(lit(1)).as("n"))
        .crossJoin(dl.agg(sum(col("dl")).cast("double").as("sum_dl")))
        .select(col("n").cast("double").as("nd"),
          (col("sum_dl") / col("n").cast("double")).as("avgdl")))
    idfJoinVocabGated(tf, df, maxBroadcastVocab).join(dl, "doc_id").crossJoin(scalars)
      .select(col("doc_id"), col("term"),
        ((col("tf") * lit(2.2) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
          * ((col("nd") + lit(1.0)) / (col("df") + lit(1.0))))
          .cast(DecimalType(18, 4)).cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"), col("term"))
      .limit(20)
  }

  val queries: Map[String, QFn] = Map(
    // -- Q24: token counting (split → explode → count), global top-20
    "q24_token_counts" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20)
    }),

    // -- language-ID heuristic: character-class + stopword evidence
    "text_langid" -> ((s, dir) => {
      val toks = tokens(lower(col("text")))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          when(col("text").rlike("[\\x{4E00}-\\x{9FFF}]"), "zh")
            .when(col("text").rlike("[\\x{0400}-\\x{04FF}]"), "ru")
            .when(stopCount(toks, enStops) >= stopCount(toks, esStops) &&
                  stopCount(toks, enStops) > 0, "en")
            .when(stopCount(toks, esStops) > 0, "es")
            .otherwise("und").as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // -- quality scoring: length / alpha ratio / stopword ratio
    "text_quality" -> ((s, dir) => {
      val toks = tokens(lower(col("text")))
      val nTok = size(toks).cast("long")
      val alphaRatio =
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
          length(col("text")).cast("double")
      val stopRatio = stopCount(toks, enStops).cast("double") / nTok.cast("double")
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          nTok.as("n_tokens"),
          round(alphaRatio, 4).as("alpha_ratio"),
          round(stopRatio, 4).as("stop_ratio"),
          round(alphaRatio * 0.5 + stopRatio * 0.5, 4).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // -- document fingerprint: digest of the whitespace-normalized body
    "text_fingerprint" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), md5(normText(col("text"))).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // -- Q40: sequence packing ("concat and chunk", the pretraining
    //    batch-assembly op): documents are concatenated in doc_id order
    //    within a shard and cut into 1000-token chunks by exclusive
    //    cumulative token count. The window is PARTITIONED by shard —
    //    shards pack independently and in parallel (pick shard count ≈
    //    cluster parallelism at 100 TB), avoiding the single-partition
    //    global-sort window this repo already once had to kill in the
    //    jaccard dictionary. Output: per-chunk doc and token totals.
    "q40_pack_chunks" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"),
          size(tokens(col("text"))).cast("long").as("toks"))
        .withColumn("start_tok", sum(col("toks")).over(w) - col("toks"))
        .withColumn("chunk", floor(col("start_tok") / lit(1000)).cast("long"))
        .groupBy(col("shard"), col("chunk"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("chunk_tokens"))
        .orderBy(col("shard"), col("chunk"))
    }),

    // -- PII detection + redaction fingerprint: regex counts of email /
    //    phone / URL shapes (the filtering step every training-data
    //    pipeline runs before release) plus the digest of the
    //    email-redacted body. Simple character-class regexes on purpose —
    //    they mean the same thing to Java regex and DuckDB's RE2.
    //    The synthetic corpus contains no PII, which would make this gate
    //    vacuous (a broken regex still passes on all-zero counts) — so
    //    every 7th document gets a deterministic PII suffix constructed
    //    identically in BOTH engines, and the gate genuinely verifies
    //    detection + redaction cross-engine.
    "text_pii" -> ((s, dir) => {
      val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
      val url = "https?://[^ ]+"
      val id = col("doc_id").cast("string")
      val seededText = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), id, lit("@example.com or 555-123-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" at https://ex.org/"), id))
          .otherwise(lit("")))
      Tables(s, dir, "documents")
        .select(col("doc_id"), seededText.as("text"))
        .select(col("doc_id"),
          regexp_count(col("text"), lit(email)).cast("long").as("n_email"),
          regexp_count(col("text"), lit(phone)).cast("long").as("n_phone"),
          regexp_count(col("text"), lit(url)).cast("long").as("n_url"),
          md5(regexp_replace(col("text"), email, "[EMAIL]")).as("redacted_fp"))
        .withColumn("has_pii", (col("n_email") + col("n_phone")) > 0)
        .orderBy(col("doc_id"))
    }),

    // -- end-to-end curation pipeline: quality filter → exact dedup →
    //    per-decile corpus stats. Composes the scoring, dedup, and
    //    counting operators in ONE lazy plan (filter pushes to the scan,
    //    dedup is a partitioned window, stats a partial+final agg) — the
    //    shape a real training-data curation job takes, hash-checked end
    //    to end. The base corpus has no duplicates and no low-quality
    //    docs at the correctness scale, which would leave both
    //    interesting stages unverified — so the query UNIONs in
    //    deterministic near-copies (trailing whitespace → same normalized
    //    body, must be dedup'd) and junk rows (no letters → q = 0, must
    //    be filtered), built identically in both engines.
    "pipeline_curate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val dups = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit("  ")).as("text"))
      val junk = base.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          lit("@@@@ 1234 %%%% 5678 $$$$").as("text"))
      val corpus = base.unionAll(dups).unionAll(junk)
      val toks = tokens(lower(col("text")))
      val nTok = size(toks).cast("long")
      val alphaRatio =
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
          length(col("text")).cast("double")
      val stopRatio = stopCount(toks, enStops).cast("double") / nTok.cast("double")
      val scored = corpus
        .select(col("doc_id"), col("text"), nTok.as("n_tokens"),
          (alphaRatio * 0.5 + stopRatio * 0.5).as("q"))
        .filter(col("q") >= 0.3)
      val w = Window.partitionBy(md5(normText(col("text")))).orderBy(col("doc_id"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(floor(col("q") * 10).cast("long").as("q_decile"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy(col("q_decile"))
    }),

    // -- the composed TRAINER TAIL (round-9): quality gate → exact
    //    keep-first dedup → per-doc token counts → token-budget
    //    temperature mix → 512-token sequence packing, every stage
    //    SQL-expressible so DuckDB re-derives the ENTIRE chain — the
    //    pipeline_curate head composed with the text_mix_tokens
    //    selection and the text_pack_sequences layout over the mixed
    //    draw. The one-job operator composition itself (including the
    //    non-SQL index-dedup and BPE-count stages) is spec-gated
    //    composed == hand-chained in CurationSpec.
    //    [[graft.operators.Curation.pipeline]] (tokenBudget/packSeqLen).
    "pipeline_pack" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.{Packing, Sampling}
      val base = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val toks = tokens(lower(col("text")))
      val nTok = size(toks).cast("long")
      val alphaRatio =
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
          length(col("text")).cast("double")
      val stopRatio = stopCount(toks, enStops).cast("double") / nTok.cast("double")
      val scored = base
        .select(col("doc_id"), col("lang"), col("text"), nTok.as("n_tokens"),
          (alphaRatio * 0.5 + stopRatio * 0.5).as("q"))
        .filter(col("q") >= 0.3)
      val w = Window.partitionBy(md5(normText(col("text")))).orderBy(col("doc_id"))
      val surv = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("n_tokens"))
      val drawn = Sampling.temperatureMixTokens(surv, "doc_id", "lang",
        "n_tokens", alpha = 0.5, targetTokens = 60000)
      Packing.packSequences(drawn, "doc_id", "n_tokens",
          seqLen = 512, seed = "ep0")
        .orderBy(col("seq_id"), col("seq_off"))
    }),

    // -- TF-IDF document-term scoring: per-(doc,term) tf, corpus df, score
    //    = tf * (N+1)/(df+1) — a SMOOTHED RATIONAL idf, not ln((N+1)/(df+1)).
    //    Deliberate: both engines evaluate rational arithmetic bit-exactly,
    //    while ln() goes through each engine's libm/JIT-intrinsic path
    //    (JVM interpreter and C2 share a log stub that matched glibc on
    //    2000 probed inputs, but the equality is empirical, not
    //    contractual — exactly the 1-ulp-flips-decimal-rounding class that
    //    made round 1's only red pair). The ln form is a one-line swap.
    //    Plan shape is the graded part: tf is one hash agg, df one more,
    //    df joins back broadcast under the measured vocab gate (shuffle
    //    join past it), top-20 is TakeOrderedAndProject.
    "text_tfidf" -> ((s, dir) => tfidf(Tables(s, dir, "documents"))),

    // -- BM25 document-term ranking (k1=1.2, b=0.75) with the SAME
    //    rational smoothed idf as text_tfidf ((N+1)/(df+1), log-free —
    //    see the tfidf note on why ln() is contractually unsafe across
    //    engines). All remaining arithmetic is plain IEEE double with an
    //    expression tree mirrored token-for-token in the oracle, so both
    //    engines execute the identical op sequence on identical inputs.
    //    avgdl is derived the same way on both sides (exact integer token
    //    total → double → one division). n and avgdl are 1-row scalar aggs
    //    folded into the plan via broadcast crossJoin — zero driver
    //    actions, so the query is one lazy plan (no extra full passes over
    //    the terms relation before the real job). Plan shape: tf + dl are
    //    hash aggs, df joins back broadcast under the measured vocab gate
    //    (shuffle join past it), doc-length joins on doc_id,
    //    top-20 is TakeOrderedAndProject.
    "text_bm25" -> ((s, dir) => bm25(Tables(s, dir, "documents"))),

    // -- within-document repetition scoring (the Gopher-class quality
    //    filter): fraction of NON-DISTINCT word 2-grams inside each doc —
    //    boilerplate and template spam repeat internally long before they
    //    collide across documents. Integer-exact ratio via the
    //    scaled-integer pattern ((n-d)*10^4 / n, truncating division on
    //    both engines), so the row hash-checks without float hazards.
    //    Shape: one explode + two-level agg, no joins, no shuffle beyond
    //    the per-doc groupBy.
    "text_repetition" -> ((s, dir) => {
      // NOT wordShingles: that expression dedupes (it feeds Jaccard SETS);
      // repetition needs every occurrence. The token array is materialized
      // in its own projection first so the higher-order transform refers
      // to an attribute — inlining tokens(text) into the lambda would
      // re-evaluate the split once per element (interpreted HOF).
      val sh = Tables(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t) - 2)," +
            " i -> concat(element_at(t, i + 1), ' ', element_at(t, i + 2)))"))
          .as("sh"))
      sh.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          count_distinct(col("sh")).as("n_distinct"))
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          // `div`, not `/`: Column./ is always DOUBLE division, and
          // floor()ing its result can flip on quotients that round up to
          // an exact integer — div is true integral division
          expr("(n_grams - n_distinct) * 10000 div n_grams").as("dup_ratio_e4"))
        .orderBy(col("doc_id"))
    }),

    // -- stable train/val/test split (graft.operators.Sampling): every
    //    assignment is a pure function of md5(doc_id) — reproducible
    //    across reruns, partitionings and engines, which df.randomSplit
    //    is not. The oracle recomputes the identical hex-prefix bucketing
    //    in DuckDB (fixed-length lowercase hex compares lexicographically
    //    as its numeric value), making the split itself — not just its
    //    sizes — cross-engine verified. Pure per-row map: no shuffle
    //    before the summary agg.
    "text_split_stable" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.stableSplit(Tables(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          // membership-sensitive checksum both engines can compute: a
          // single relabeled doc moves id_sum in two splits at once
          sum(col("doc_id")).as("id_sum"))
        .orderBy(col("split"))
    }),

    // -- per-stratum stable sampling: the training-mix downsampler (cap
    //    the dominant language, keep the rare one whole). Decision =
    //    md5(lang || ':' || doc_id) bucket vs a per-stratum boundary, so
    //    strata draw independent subsets and one stratum's sample cannot
    //    shift when another changes. Fully deterministic → the oracle
    //    recomputes the EXACT surviving row set (not just counts) with
    //    md5+substr alone; hash-checked row for row.
    "text_sample_stratified" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.stableStratifiedSample(Tables(s, dir, "documents"),
          "doc_id", "lang", Map("en" -> 0.5, "zh" -> 1.0),
          defaultFraction = 0.25)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // -- decontamination: flag training documents sharing any word 3-gram
    //    with a held-out eval set (every 50th doc) — the train-vs-eval
    //    overlap check run before any release. Shape at 100 TB: an eval-
    //    benchmark shingle set is bounded by the benchmark suite, not the
    //    corpus — but bounded-by-construction is still MEASURED before
    //    broadcasting (the same discipline as the vocab-gated term joins):
    //    the persisted eval set is counted once, broadcast under the
    //    MaxBroadcastVocab cap, shuffle-joined past it. Past broadcast
    //    scale entirely, text_decontaminate_bloom is the documented path
    //    (the sketch ships like a literal regardless of set size). The
    //    join ships (shingle, doc_id) only; per-doc counts are a
    //    partial+final agg. 3-grams on this corpus flag ~half the
    //    training docs (2-grams saturate — measured before choosing n).
    "text_decontaminate" -> ((s, dir) => {
      val sh = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(wordShingles(tokens(col("text")), 3)).as("s"))
      val evalSet = sh.filter(col("doc_id") % 50 === 0).select(col("s"))
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      val evalJoin =
        if (evalSet.count() <= MaxBroadcastVocab) broadcast(evalSet) else evalSet
      sh.filter(col("doc_id") % 50 =!= 0)
        .join(evalJoin, "s")
        .groupBy(col("doc_id"))
        .agg(count_distinct(col("s")).as("n_shared"))
        .orderBy(col("doc_id"))
    }),

    // -- decontamination at the scale past broadcast: when the eval-set
    //    shingle relation no longer fits a broadcast join as raw strings,
    //    its Bloom image (~1.2 B/item at 1% fpp) still ships like a
    //    literal. Shape: build the sketch from the (persisted, counted)
    //    eval set, prefilter the training scan row-locally with the
    //    codegen'd might_contain — no shuffle, false is definitive — then
    //    confirm the survivors with an exact shuffle semi-join keyed on
    //    the shingle. Result is EXACTLY the contaminated-doc set (false
    //    positives die in the confirm join), so the oracle is the plain
    //    exact SQL; only the plan differs from text_decontaminate.
    "text_decontaminate_bloom" -> ((s, dir) => {
      import graft.functions.bloomMightContain
      val sh = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(wordShingles(tokens(col("text")), 3)).as("s"))
      val evalSet = sh.filter(col("doc_id") % 50 === 0).select(col("s"))
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      // measured sizing, same discipline as the vocab-gated broadcasts:
      // the count is one pass over the (small) aggregate we need anyway
      val nEval = math.max(evalSet.count(), 1L)
      val bloom = evalSet.stat.bloomFilter("s", nEval, 0.01)
      sh.filter(col("doc_id") % 50 =!= 0)
        .filter(bloomMightContain(col("s"), bloom))
        .join(evalSet, Seq("s"), "left_semi")
        .select(col("doc_id")).distinct()
        .orderBy(col("doc_id"))
    }),

    // -- per-source quota cap: "at most 15 documents per source" — the
    //    domain-cap step of a training mix. Window rank-then-filter whose
    //    plan Catalyst rewrites to partial+final WindowGroupLimit (each
    //    map task forwards ≤ 15 rows per source — a hot domain cannot
    //    flood the exchange); selection is an md5-keyed stable draw, not
    //    first-N. See Sampling.quotaCap.
    "text_quota_cap" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.quotaCap(Tables(s, dir, "documents"), "doc_id", "source", 15)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // -- ordinal generator: posexplode (explode WITH ORDINALITY) — token
    //    position is load-bearing for sequence work (packing offsets,
    //    positional n-grams); q24 covers plain explode, this pins the
    //    position column's semantics (0-based, per-row dense) cross-engine
    //    against DuckDB's lockstep dual UNNEST.
    "q46_posexplode" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .filter(col("doc_id") % 25 === 0)
        .select(col("doc_id"), posexplode(tokens(col("text"))))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("tok"))
        .filter(col("pos") < 20)
        .orderBy(col("doc_id"), col("pos"))
    }),

    // -- exact dedup: hash-groupBy on the normalized body; keeper = min id
    "dedup_exact" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .groupBy(md5(normText(col("text"))).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
        .orderBy(col("fp"))
    }),

    // -- n-gram Jaccard near-dup, exact, with DATA-DRIVEN strategy choice
    //    (Dedup.jaccardPairs): the engine measures the shingle vocabulary
    //    (a byproduct of the sharded dense-id dictionary — no global sort,
    //    no extra action) and picks dictionary bitmaps + codegen'd
    //    popcount(AND) when V fits, or the inverted-index self-join when
    //    the vocabulary is unbounded. Both produce the identical exact
    //    result set, so the oracle keeps the plain SQL formulation.
    "dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.jaccardPairs(Tables(s, dir, "documents"), "doc_id", "text",
          shingleN = 2, threshold = 0.2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- the PREFIX-FILTERED exact path invoked directly (the strategy
    //    routes the full synthetic corpus to bitmaps — its tiny vocabulary
    //    is the degenerate regime, see Dedup.jaccardPairs scaladoc — so
    //    this query pins the prefix implementation itself under the
    //    driver's hash gate at every scale). Subset keeps the bench cost
    //    of running a token-indexed join over a 931-shingle vocabulary
    //    bounded; results are exact, so the oracle is the same plain
    //    brute-force SQL at t=0.8.
    "dedup_jaccard_prefix" -> ((s, dir) => {
      Dedup.jaccardPrefixPairs(
          Tables(s, dir, "documents").filter(col("doc_id") % 4 === 0),
          "doc_id", "text", shingleN = 2, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- the Gopher document-level quality rules (Rae et al. 2021,
    //    appendix A; the repetition tier is text_repetition),
    //    the standard pretraining document filter: word-count bounds, mean
    //    word length, symbol-to-word ratio (# / ellipsis), bullet- and
    //    ellipsis-line ratios, alpha-word ratio, required-stopword hits.
    //    Entirely per-row codegen'd higher-order functions — embarrassingly
    //    parallel, zero shuffle before the final order, so it runs at scan
    //    speed on any corpus size. `passes` is derived from the ROUNDED
    //    metrics so the rule outcomes are bit-identical cross-engine.
    "text_gopher_rules" -> ((s, dir) => {
      import graft.operators.Curation
      // spread (r14): single-pass per-row rule metrics over a small-file
      // scan — measured −1.4 s at sf0.1 (graft.Storage.spread scaladoc)
      Curation.withGopherMetrics(
          graft.Storage.spread(
            Tables(s, dir, "documents").select(col("doc_id"), col("text")),
            col("doc_id")), "text")
        .drop("text")
        .orderBy(col("doc_id"))
    }),

    // -- the C4 cleaning rules (Raffel et al. 2020 §2.2): keep only lines
    //    that end in terminal punctuation and have >= 5 words; drop pages
    //    containing "lorem ipsum" or a curly brace, or with < 3 surviving
    //    lines. Like the Gopher rules this is pure per-row expression work
    //    (nested higher-order functions over the line split) — scan-speed
    //    at any corpus size. The synthetic corpus is single-line with no
    //    punctuation (the rules would be vacuous), so the query first
    //    restructures every document deterministically — 8-token sentence
    //    lines with cycling terminators, one always-too-short line, policy
    //    violations on fixed id residues — with the identical seeding in
    //    the oracle (text_pii / text_line_dedup precedent). Cleaned text
    //    leaves as a fingerprint so the hash pins exact reassembled bytes.
    "text_c4_rules" -> ((s, dir) => {
      val toks = tokens(col("text"))
      val nch = floor((size(toks) + lit(7)) / lit(8)).cast("int")
      // empty-doc guard: sequence(0, -1) is a DESCENDING Spark sequence
      // (two elements!) while DuckDB's range(0) is empty — a zero-token
      // document must produce zero sentence lines on both engines
      val sent = when(nch > 0,
        transform(sequence(lit(0), greatest(nch - 1, lit(0))), i =>
          concat(array_join(slice(toks, i * 8 + 1, lit(8)), " "),
            when(i % 3 === 0, ".").when(i % 3 === 1, "!").otherwise("?"))))
        .otherwise(array().cast("array<string>"))
      val seeded = concat(array_join(sent, "\n"),
        lit("\nshort line."),
        when(col("doc_id") % 41 === 0, lit("\nlorem ipsum dolor sit amet."))
          .otherwise(lit("")),
        when(col("doc_id") % 37 === 0, lit("\nconfig { debug } done here now."))
          .otherwise(lit("")))
      import graft.operators.Curation
      // spread (r14): same single-pass shape as text_gopher_rules
      Curation.withC4Rules(
          graft.Storage.spread(
            Tables(s, dir, "documents").select(col("doc_id"), seeded.as("seeded")),
            col("doc_id")),
          "seeded")
        .select(col("doc_id"), col("n_lines"), col("n_kept_lines"),
          md5(col("clean_text")).as("clean_fp"),
          col("has_lorem"), col("has_brace"), col("keep_doc"))
        .orderBy(col("doc_id"))
    }),

    // -- corpus-level boilerplate-line removal (the CCNet/RefinedWeb pass):
    //    a line whose normalized form appears in >= 50 distinct documents
    //    is boilerplate (nav bars, footers, banners) and is deleted from
    //    every document. The synthetic corpus has no cross-document lines,
    //    so the query seeds the standard web furniture deterministically
    //    (same seeding in the oracle): a universal copyright footer, a nav
    //    bar on even ids, a newsletter banner on every third id. Plan
    //    shape + 100 TB notes in [[graft.operators.Curation]].
    "text_line_dedup" -> ((s, dir) => {
      import graft.operators.Curation
      val seeded = Tables(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit("\nCopyright Example Corp. All rights reserved."),
          when(col("doc_id") % 2 === 0, lit("\nHome | About | Contact"))
            .otherwise(lit("")),
          when(col("doc_id") % 3 === 0, lit("\nSubscribe to our newsletter today!"))
            .otherwise(lit(""))).as("text"))
      Curation.removeBoilerplateLines(seeded, "doc_id", "text", minDocs = 50)
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          md5(col("clean_text")).as("clean_fp"))
        .orderBy(col("doc_id"))
    }),

    // -- unigram-LM quality scoring (the CCNet perplexity-bucket proxy):
    //    score every document by the mean corpus log-probability of its
    //    tokens — boilerplate-ish, in-distribution text scores high, junk
    //    and rare-token soup score low. Two hash aggs (term counts, per-doc
    //    mean) plus the term join, which reuses the MEASURED vocab-gated
    //    broadcast route of tfidf/bm25 — a 100 TB vocabulary falls back to
    //    a term-keyed shuffle join (VERDICT_r05 #2 discipline). Per-token
    //    logp is rounded then summed in DECIMAL so the per-doc sum is
    //    order-independent and bit-identical cross-engine (QueryPack
    //    policy); the 1-row total joins via scalar broadcast fold.
    "text_unigram_lm" -> ((s, dir) => {
      import graft.operators.Curation
      Curation.unigramLogProb(Tables(s, dir, "documents"), "doc_id", "text",
          MaxBroadcastVocab)
        .orderBy(col("doc_id"))
    }),

    // -- CCNet perplexity filter one Markov order up: corpus-fit bigram
    //    LM with add-0.1 smoothing scores every document by mean
    //    ln p(w_i | w_{i-1}). Bigram extraction is a per-row HOF (no
    //    window, no shuffle); logp quantized to DECIMAL(12,6) pre-sum;
    //    the score join routes through the measured bigram-type gate.
    //    [[graft.operators.Curation.bigramLogProb]].
    "text_bigram_lm" -> ((s, dir) => {
      import graft.operators.Curation
      Curation.bigramLogProb(Tables(s, dir, "documents"), "doc_id", "text",
          alpha = 0.1, MaxBroadcastVocab)
        .orderBy(col("doc_id"))
    }),

    // -- winnowing fingerprints (Schleimer et al. 2003 / MOSS): window
    //    minima over md5 char-8-gram hashes with the rightmost-tie rule
    //    encoded in the `hash || lpad(10^12 - pos)` composite key, so the
    //    selection is pure MIN — no engine-specific arg-min. The oracle
    //    recomputes the whole selection in SQL.
    //    [[graft.operators.Winnow.winnowFingerprints]].
    "text_winnow" -> ((s, dir) => {
      import graft.operators.Winnow
      // materialize = true (r13): the operational form — the selection
      // lands on knob storage and the export sort reads the blocks,
      // instead of one giant lazy explode→window→distinct→sort job
      // (the session-history-sensitive shape; VERDICT r12 next #1)
      Winnow.winnowFingerprints(Tables(s, dir, "documents"), "doc_id", "text",
          k = 8, w = 6, materialize = true)
        .orderBy(col("doc_id"), col("pos"))
    }),

    // -- the fingerprints' CONSUMER (round-8 verdict "next round" #1):
    //    cross-document partial-overlap pairs — documents sharing >= 5
    //    distinct winnowed fingerprints, with the containment-style
    //    shared/min(n_a, n_b) estimate. The oracle re-derives the whole
    //    chain: selection (the text_winnow SQL), per-doc set sizes, the
    //    fp self-join, the HAVING gate, the 4dp ratio.
    //    [[graft.operators.Winnow.overlapPairs]].
    "text_winnow_pairs" -> ((s, dir) => {
      import graft.operators.Winnow
      // maxDf pinned UNCAPPED explicitly (round-10: the operator default
      // became the derived boilerplate cap) — this row is the exact
      // uncapped anchor; the auto route is gated below
      Winnow.overlapPairs(Tables(s, dir, "documents"), "doc_id", "text",
          k = 8, w = 6, minShared = 5, maxDf = Long.MaxValue)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- the SAFE-BY-DEFAULT route (round-10, VERDICT r9 "what's wrong"
    //    #3): maxDf derived from the corpus's own df distribution —
    //    cap = max(floor, exact discrete 0.999-quantile of df over
    //    distinct fingerprints). The oracle re-derives the WHOLE chain
    //    including the cap: df census, distinct-df histogram, cumulative
    //    quantile rule, GREATEST floor, capped sets, pair join, 4dp
    //    ratio. [[graft.operators.Winnow.overlapPairs]] (defaults).
    "text_winnow_pairs_auto" -> ((s, dir) => {
      import graft.operators.Winnow
      Winnow.overlapPairs(Tables(s, dir, "documents"), "doc_id", "text",
          k = 8, w = 6, minShared = 5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- incremental overlap: the doc_id % 3 == 0 batch probed against
    //    the standing fingerprint sets of the % 3 != 0 history (the
    //    dedup_minhash_incr split convention); overlap here is the
    //    intake-side shared/n_batch — the fraction of the ARRIVING
    //    document already present. The bucketed-table form of the same
    //    probe is plan-asserted in LayoutSpec.
    //    [[graft.operators.Winnow.overlapPairsAgainst]].
    "text_winnow_pairs_incr" -> ((s, dir) => {
      import graft.operators.Winnow
      val docs = Tables(s, dir, "documents")
      Winnow.overlapPairsAgainst(
          docs.filter(col("doc_id") % 3 === 0), "doc_id", "text",
          Winnow.fingerprintSets(
            docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", k = 8, w = 6),
          k = 8, w = 6, minShared = 5)
        .orderBy(col("batch_id"), col("corpus_id"))
    }),

    // -- temperature-weighted source mixing over the skewed `lang` column
    //    (en is 3x fr in the corpus; alpha = 0.5 flattens the draw toward
    //    uniform). Operator semantics + the bounded driver collect and
    //    WindowGroupLimit shuffle shape: [[graft.operators.Sampling
    //    .temperatureMix]].
    "text_mix_temperature" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.temperatureMix(Tables(s, dir, "documents"), "doc_id", "lang",
          alpha = 0.5, targetTotal = 150)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // -- temperature mixing WITH the upsampling contract made explicit:
    //    emits per-row n_copies so the data loader can repeat rare-source
    //    rows deterministically. alpha=0.25 at targetTotal=600 over the
    //    sf0.01 lang skew upsamples every non-en lang (quota > population
    //    → base >= 1) while en stays downsampled (base 0, rank-trimmed) —
    //    both branches of the copy-count formula are live and the per-
    //    source copy sums are exact. [[graft.operators.Sampling
    //    .temperatureMixRepeats]].
    "text_mix_repeats" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.temperatureMixRepeats(Tables(s, dir, "documents"), "doc_id",
          "lang", alpha = 0.25, targetTotal = 600)
        .select(col("doc_id"), col("lang"), col("n_copies"))
        .orderBy(col("doc_id"))
    }),

    // -- deterministic global shuffle for training order: 256 hex shards +
    //    dense in-shard positions, a reproducible pseudo-random permutation
    //    without a global sort. [[graft.operators.Sampling.shardShuffle]].
    "text_shard_shuffle" -> ((s, dir) => {
      import graft.operators.Sampling
      Sampling.shardShuffle(Tables(s, dir, "documents"), "doc_id", seed = "ep0")
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))
    }),

    // -- temperature mixing with the quota in TOKENS — the trainer's
    //    actual budget contract: per-source token totals reweighted by
    //    t^0.5, documents drawn in the stable md5 order until each
    //    source's token budget is covered (document-granular boundary).
    //    The distributed form's two-phase sharded cumsum is order-
    //    equivalent to the oracle's single window (the shard is the
    //    hash's own prefix). [[graft.operators.Sampling
    //    .temperatureMixTokens]].
    "text_mix_tokens" -> ((s, dir) => {
      import graft.operators.Sampling
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
      Sampling.temperatureMixTokens(docs, "doc_id", "lang", "n_tokens",
          alpha = 0.5, targetTokens = 120000)
        .select(col("doc_id"), col("lang"), col("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // -- sequence packing: the concat-then-chunk layout step — documents
    //    in the deterministic ep0 shard-shuffle order, token streams
    //    concatenated and cut into 512-token training sequences,
    //    boundary-straddling documents splitting into fragments. Fully
    //    deterministic in (ids, token counts, seed) → the oracle
    //    recomputes the entire layout (order, cumsums, shard bases,
    //    fragment arithmetic) in SQL. [[graft.operators.Packing
    //    .packSequences]].
    "text_pack_sequences" -> ((s, dir) => {
      import graft.operators.Packing
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"))
      Packing.packSequences(docs, "doc_id", "n_tokens",
          seqLen = 512, seed = "ep0")
        .orderBy(col("seq_id"), col("seq_off"))
    }),

    // -- DSIR importance selection (Xie et al. 2023), no-noise top-k arm:
    //    hashed unigram+bigram features (portable md5-prefix buckets),
    //    Laplace-smoothed target/raw log-ratios in integer MICROS (exact
    //    order-free sums), highest-importance 200 of the raw corpus
    //    against the doc_id % 50 == 0 target set. The oracle re-derives
    //    the WHOLE chain: features, buckets, censuses, micro ratios
    //    (floor(x+0.5) — the Math.round convention), per-doc sums with
    //    zero-feature docs at 0, the (score DESC, id) selection.
    //    [[graft.operators.Sampling.dsirSelect]].
    "text_dsir_topk" -> ((s, dir) => {
      import graft.operators.Sampling
      val docs = Tables(s, dir, "documents")
      Sampling.dsirSelect(docs.filter(col("doc_id") % 50 =!= 0), "doc_id",
          "text", docs.filter(col("doc_id") % 50 === 0), "text",
          numBuckets = 4096, targetCount = 200)
        .orderBy(col("doc_id"))
    }),

    // -- DSIR proper (importance RESAMPLING): the Gumbel-top-k draw —
    //    score + seeded-md5 Gumbel noise (u = (12-hex + 0.5)/16^12,
    //    g = -ln(-ln u) in micros) makes weighted sampling without
    //    replacement a deterministic top-k, recomputed whole by the
    //    oracle. [[graft.operators.Sampling.dsirSelect]] (mode=gumbel).
    "text_dsir_gumbel" -> ((s, dir) => {
      import graft.operators.Sampling
      val docs = Tables(s, dir, "documents")
      Sampling.dsirSelect(docs.filter(col("doc_id") % 50 =!= 0), "doc_id",
          "text", docs.filter(col("doc_id") % 50 === 0), "text",
          numBuckets = 4096, targetCount = 200, mode = "gumbel",
          seed = "ep0")
        .orderBy(col("doc_id"))
    }),

    // -- quality-aware canonical selection: within each connected near-dup
    //    group (the exact ngram-jaccard pairs), keep the member with the
    //    highest alpha-ratio quality score (min id tiebreak) — the
    //    keep-the-clean-copy semantic of a production dedup, vs the
    //    min-id keeper of dedup_exact/dedup_components. Oracle recomputes
    //    components via a recursive CTE and the keeper via a window.
    "dedup_keep_best" -> ((s, dir) => {
      val q4 = round(
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
          length(col("text")).cast("double"), 4)
      val docs = Tables(s, dir, "documents").select(col("doc_id"), q4.as("q"))
      val pairs = queries("dedup_ngram_jaccard")(s, dir)
        .select(col("id_a"), col("id_b"))
      Dedup.dedupCorpusByQuality(docs, "doc_id", "q", pairs)
        .orderBy(col("doc_id"))
    }),

    // -- edit-distance near-dup pairs (q-gram blocked + exact levenshtein
    //    verify — [[graft.operators.Dedup.editDistancePairs]]) over a
    //    derived title relation: one representative per distinct 5-token
    //    title prefix, plus a seeded first-char variant for every 4th
    //    representative (guaranteed distance-1 mass). The oracle is the
    //    NAIVE quadratic levenshtein join over the same seeded relation —
    //    the blocking must be invisible in the result, which makes this
    //    the recall proof for the q-gram candidate generator.
    "dedup_edit_distance" -> ((s, dir) => {
      // even ids only: the synthetic titles draw on a ~40-word vocabulary
      // (the operator's documented low-entropy adversarial regime — see
      // SCALE.md), so the GATE runs on a half-corpus to keep its cost
      // gate-sized; recall is regime-independent (pigeonhole)
      val reps = Tables(s, dir, "documents")
        .filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"),
          array_join(slice(tokens(col("text")), 1, 5), " ").as("t"))
        .groupBy(col("t")).agg(min(col("doc_id")).as("id"))
      val variants = reps.filter(col("id") % 4 === 0)
        .select((col("id") + 1000000L).as("id"),
          concat(lit("x"), expr("substring(t, 2)")).as("t"))
      val corpus = reps.select(col("id"), col("t")).union(variants)
      // d=1 (the planted variants' distance); q is MEASURED by the
      // operator (Dedup.measureEditQ, round-7): the titles draw on the
      // synthetic corpus' small word vocabulary, so 2-grams are hot and
      // the posting-density bound sizes q to the alphabet's entropy —
      // replacing the hand-picked q=3 this query carried (measured
      // 10.9 s at q=2/d=2 vs ~2 s at q=3 at sf0.1). The oracle is
      // q-invariant, so the auto route is exactly what this gate proves.
      Dedup.editDistancePairs(corpus, "id", "t", maxDist = 1)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- paragraph-granularity KEEP-FIRST dedup (the Dolma-style pass:
    //    one surviving copy of shared content, later copies deleted) —
    //    vs text_line_dedup's df-threshold delete-all. The single-line
    //    synthetic corpus gets deterministic paragraph structure seeded
    //    (same construction in the oracle): a shared intro on id%5, a
    //    shared disclaimer on id%3 — the global first occurrence of each
    //    survives, every later copy drops; naturally identical document
    //    bodies dedup the same way. Winner selection is ONE min(struct)
    //    hash agg (map-side combine; no window) — plan + 100 TB notes at
    //    [[graft.operators.Dedup.dedupParagraphs]].
    "text_paragraph_dedup" -> ((s, dir) => {
      val seeded = Tables(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 5 === 0,
            lit("Welcome to the example archive of shared documents.\n\n"))
            .otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 3 === 0,
            lit("\n\nAll documents are provided as-is without warranty."))
            .otherwise(lit(""))).as("text"))
      Dedup.dedupParagraphs(seeded, "doc_id", "text")
        .select(col("doc_id"), col("n_paras"), col("n_kept"),
          md5(col("clean_text")).as("clean_fp"))
        .orderBy(col("doc_id"))
    }),

    // -- INCREMENTAL paragraph keep-first: the daily-batch form — even
    //    ids play the accepted corpus (its 16-byte key set is all the
    //    operator reads — never history text), odd ids the arriving
    //    batch: batch paragraphs already in the corpus drop, keep-first
    //    applies within the batch, empties survive as structure. Same
    //    seeding as text_paragraph_dedup; standing-table variant
    //    (Layout.paragraphKeyIndex, corpus side read in place) is
    //    spec-asserted equivalent. [[graft.operators.Dedup
    //    .dedupParagraphsAgainst]].
    "text_paragraph_dedup_incr" -> ((s, dir) => {
      val seeded = Tables(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 5 === 0,
            lit("Welcome to the example archive of shared documents.\n\n"))
            .otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 3 === 0,
            lit("\n\nAll documents are provided as-is without warranty."))
            .otherwise(lit(""))).as("text"))
      val history = seeded.filter(col("doc_id") % 2 === 0)
      val batch = seeded.filter(col("doc_id") % 2 === 1)
      Dedup.dedupParagraphsAgainst(batch, "doc_id", "text",
          Dedup.paragraphKeys(history, "text"))
        .select(col("doc_id"), col("n_paras"), col("n_kept"),
          md5(col("clean_text")).as("clean_fp"))
        .orderBy(col("doc_id"))
    }),

    // -- exact repeated-substring (span) removal — the Lee et al. 2021
    //    suffix-array pass as a relational plan: every maximal character
    //    span whose length-20 windows all repeat somewhere in the corpus
    //    is cut from every document holding it. Seeded duplicated
    //    sentences on id%6 / id%11 guarantee exactly-computable spans;
    //    the low-entropy synthetic text also repeats naturally, which the
    //    oracle (an independent per-character window formulation — the
    //    operator itself never explodes characters) recomputes
    //    identically. Plan + 100 TB notes at
    //    [[graft.operators.Dedup.removeRepeatedSpans]].
    "text_span_dedup" -> ((s, dir) => {
      val seeded = Tables(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 6 === 0,
            lit(" Exactly repeated boilerplate sentence planted for span removal."))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit(" Another verbatim duplicated fragment appearing across documents."))
            .otherwise(lit(""))).as("text"))
      Dedup.removeRepeatedSpans(seeded, "doc_id", "text", gramLen = 20)
        .select(col("doc_id"), col("n_chars"), col("n_spans"), col("n_removed"),
          md5(col("clean_text")).as("clean_fp"))
        .orderBy(col("doc_id"))
    }),

    // -- INCREMENTAL span removal: even ids are the accepted corpus,
    //    participating only through its standing gram census (16-byte
    //    keys + counts — history text is never re-read); odd ids the
    //    arriving batch. A batch gram is duplicated iff its batch count
    //    plus the standing count exceeds 1 — exactly the symmetric rule
    //    restricted to batch rows, which is what the oracle recomputes.
    //    Same seeding as text_span_dedup; standing-table variant
    //    (Layout.spanGramCensus, corpus side read in place) is
    //    spec-asserted equivalent. [[graft.operators.Dedup
    //    .removeRepeatedSpansAgainst]].
    "text_span_dedup_incr" -> ((s, dir) => {
      // spread at the query level: gramCensus itself must not add an
      // exchange (its probe-join contract is one batch-side exchange),
      // but the history census's digest pass would otherwise run on the
      // small file's single scan task (graft.Storage.spread scaladoc)
      val seeded = graft.Storage.spread(
        Tables(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 6 === 0,
              lit(" Exactly repeated boilerplate sentence planted for span removal."))
              .otherwise(lit("")),
            when(col("doc_id") % 11 === 0,
              lit(" Another verbatim duplicated fragment appearing across documents."))
              .otherwise(lit(""))).as("text")),
        col("doc_id"))
      val history = seeded.filter(col("doc_id") % 2 === 0)
      val batch = seeded.filter(col("doc_id") % 2 === 1)
      Dedup.removeRepeatedSpansAgainst(batch, "doc_id", "text",
          Dedup.gramCensus(history, "text", gramLen = 20), gramLen = 20)
        .select(col("doc_id"), col("n_chars"), col("n_spans"), col("n_removed"),
          md5(col("clean_text")).as("clean_fp"))
        .orderBy(col("doc_id"))
    }),

    // -- NON-ASCII parity rows (round-11, VERDICT r10 "what's missing"
    //    #3): the synthetic corpus is ASCII, so the hash-gated
    //    sub-document operators had never pushed multi-byte code
    //    points, combining marks or astral-plane symbols through the
    //    DuckDB gate. Each row below seeds the documents table with the
    //    SHARED unicode fixtures ([[uniTail]]/[[uniBoiler]]/
    //    [[uniHeader]]/[[uniFooter]] — one Scala value interpolated
    //    into BOTH the Spark plan and the oracle SQL, so the bytes can
    //    never diverge) plus a code-point `translate` of the body, and
    //    runs the ASCII row's exact operator chain. Primitive-level
    //    parity (length/substr/md5/lower/split on NFC, NFD and astral
    //    text) is pinned in UnicodeParitySpec against independently
    //    computed constants.
    "text_span_dedup_unicode" -> ((s, dir) => {
      val seeded = Tables(s, dir, "documents").select(col("doc_id"),
        concat(
          translate(col("text"), "aeiou", UniVowels),
          when(col("doc_id") % 6 === 0, lit(UniBoiler)).otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit(UniTail)).otherwise(lit("")))
          .as("text"))
      Dedup.removeRepeatedSpans(seeded, "doc_id", "text", gramLen = 20)
        .select(col("doc_id"), col("n_chars"), col("n_spans"), col("n_removed"),
          md5(col("clean_text")).as("clean_fp"))
        .orderBy(col("doc_id"))
    }),

    "text_paragraph_dedup_unicode" -> ((s, dir) => {
      val seeded = Tables(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 5 === 0, lit(UniHeader + "\n\n"))
            .otherwise(lit("")),
          translate(col("text"), "aeiou", UniVowels),
          when(col("doc_id") % 3 === 0, lit("\n\n" + UniFooter))
            .otherwise(lit(""))).as("text"))
      Dedup.dedupParagraphs(seeded, "doc_id", "text")
        .select(col("doc_id"), col("n_paras"), col("n_kept"),
          md5(col("clean_text")).as("clean_fp"))
        .orderBy(col("doc_id"))
    }),

    "text_winnow_unicode" -> ((s, dir) => {
      import graft.operators.Winnow
      val seeded = Tables(s, dir, "documents").select(col("doc_id"),
        concat(
          translate(col("text"), "aeiou", UniVowels),
          when(col("doc_id") % 7 === 0, lit(UniTail)).otherwise(lit("")))
          .as("text"))
      Winnow.winnowFingerprints(seeded, "doc_id", "text", k = 8, w = 6,
          materialize = true) // the text_winnow operational form (r13)
        .orderBy(col("doc_id"), col("pos"))
    }),

    // -- the pair-join CONSUMER over the unicode corpus (the row above
    //    gates only fingerprint selection): distinct sets, df census,
    //    self-join, HAVING gate and 4dp containment all recomputed by
    //    DuckDB on multi-byte text. Uncapped pin, matching
    //    text_winnow_pairs' convention.
    "text_winnow_pairs_unicode" -> ((s, dir) => {
      import graft.operators.Winnow
      val seeded = Tables(s, dir, "documents").select(col("doc_id"),
        concat(
          translate(col("text"), "aeiou", UniVowels),
          when(col("doc_id") % 7 === 0, lit(UniTail)).otherwise(lit("")))
          .as("text"))
      Winnow.overlapPairs(seeded, "doc_id", "text",
          k = 8, w = 6, minShared = 5, maxDf = Long.MaxValue)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "text_bpe_encode_unicode" -> ((s, dir) => {
      import graft.operators.Bpe
      val uni = Tables(s, dir, "documents").select(col("doc_id"),
        translate(col("text"), "aeiou", UniVowels).as("text"))
      val wc = Bpe.wordCounts(uni, "text")
        .filter(col("word").rlike(s"^[a-z0-9$UniVowels]+$$"))
      val merges = Bpe.collectMerges(
        Bpe.train(wc, "word", "weight", numMerges = 12, minPairCount = 1L))
      wc.select(explode(Bpe.encode(col("word"), merges)).as("piece"),
          col("weight"))
        .groupBy(col("piece")).agg(sum(col("weight")).as("cnt"))
        .orderBy(col("cnt").desc, col("piece"))
        .limit(30)
    }),

    // -- opt-in Unicode CANONICAL normalization (round-12, VERDICT r11
    //    missing #1): consecutive doc pairs share a base text and append
    //    canonically-EQUIVALENT but byte-DIFFERENT tails ([[NfcTail]] =
    //    NFC, [[NfdTail]] = the same text as NFD combining sequences).
    //    With Dedup.fingerprints(unicodeForm = Some("NFC")) every pair
    //    collapses to ONE fingerprint (dup_cnt 2) — the oracle agrees
    //    via DuckDB nfc_normalize. UnicodeNormSpec pins the negative:
    //    the default (None) byte identity misses every NFD twin.
    "dedup_exact_nfc" -> ((s, dir) => {
      Dedup.fingerprints(nfcTwinCorpus(Tables(s, dir, "documents")),
          "doc_id", "text", unicodeForm = Some("NFC"))
        .groupBy(col("fp"))
        .agg(min(col("id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
        .orderBy(col("fp"))
    }),

    // -- the same canonical-equivalence gate on the NEAR-dup tier
    //    (round-12 family completion): with unicodeForm = Some("NFC")
    //    every NFC/NFD twin pair signature-collides EXACTLY (est 1.0 —
    //    normalized texts are byte-identical, so all minhash slots
    //    agree and LSH banding is certain, not probabilistic).
    //    Contract columns:
    //      n_twins      — pairs whose nfc_normalize'd texts are equal,
    //                     recomputed independently by DuckDB;
    //      n_byte_eq    — of those, the byte-identical pairs (also
    //                     DuckDB-recomputed);
    //      twins_covered — every twin pair appears among the NFC-on
    //                     LSH candidates with est_jaccard = 1.0;
    //      norm_does_work — n_byte_eq < n_twins: the corpus really
    //                     contains byte-DIFFERENT canonical twins, so
    //                     the coverage isn't vacuous (DuckDB computes
    //                     this inequality from its own counts).
    //    UnicodeNormSpec pins the negative: the default (byte)
    //    signatures never estimate 1.0 across the two encodings.
    "dedup_minhash_nfc" -> ((s, dir) => {
      val corpus = nfcTwinCorpus(Tables(s, dir, "documents"))
      val cand = Dedup.minHashNearDups(corpus, "doc_id", "text",
          shingleN = 2, numHashes = 32, bands = 8, estThreshold = 0.9,
          unicodeForm = Some("NFC"))
        .filter(col("est_jaccard") === 1.0)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint()
      val normed = corpus.select(col("doc_id"),
        graft.functions.unicodeNormalize(col("text"), "NFC").as("nt"),
        col("text"))
      val twins = normed.toDF("id_a", "nt", "ta")
        .join(normed.toDF("id_b", "ntb", "tb"),
          col("nt") === col("ntb") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), (col("ta") === col("tb")).as("byte_eq"))
        .localCheckpoint()
      twins.agg(count(lit(1)).as("n_twins"),
          coalesce(sum(when(col("byte_eq"), 1L).otherwise(0L)), lit(0L))
            .as("n_byte_eq"))
        .crossJoin(twins.select(col("id_a"), col("id_b")).except(cand)
          .agg(count(lit(1)).as("n_missed")))
        .select(col("n_twins"), col("n_byte_eq"),
          (col("n_missed") === 0).as("twins_covered"),
          (col("n_byte_eq") < col("n_twins")).as("norm_does_work"))
    }),

    // -- distributed BPE tokenizer training over the corpus vocabulary
    //    (Sennrich et al. 2016): 24 merges, deterministic (weight DESC,
    //    pair ASC tie rule). FULLY oracle-gated (round-8: was rows-only):
    //    the emitted merge table — rank, pair, AND the pair's census
    //    weight at selection — is recomputed merge-for-merge by DuckDB
    //    via chained materialized CTEs (see [[bpeTrainOracle]]); a
    //    census, argmax-tie, or merge-application regression turns this
    //    row red. Vocabulary restricted to clean [a-z0-9]+ tokens on both
    //    sides (removes tokenizer-vs-regex edge noise and guarantees the
    //    oracle's '||' symbol-delimiter encoding is unambiguous);
    //    minPairCount=1 so both engines run the fixed 24 iterations.
    //    Plan shape + the vocab-not-corpus scale argument:
    //    [[graft.operators.Bpe]].
    "text_bpe_train" -> ((s, dir) => {
      import graft.operators.Bpe
      Bpe.train(
          Bpe.wordCounts(Tables(s, dir, "documents"), "text")
            .filter(col("word").rlike("^[a-z0-9]+$")),
          "word", "weight", numMerges = 24, minPairCount = 1L)
        .orderBy(col("rank"))
    }),

    // -- BPE encoding with the trained merges: piece frequencies over the
    //    corpus. Encodes each DISTINCT word once (vocab-bounded fold
    //    work) and weighs by word frequency — never re-tokenizes corpus
    //    rows. Oracle-gated (round-8: was rows-only): DuckDB re-trains
    //    the 12 merges with the chained-CTE recurrence and reads the
    //    piece frequencies off its own final vocab state; the Spark side
    //    independently re-encodes each word with [[graft.operators.Bpe
    //    .encode]]'s rank-ordered fold, so the row also certifies
    //    encode ≡ train-time vocabulary state.
    "text_bpe_encode" -> ((s, dir) => {
      import graft.operators.Bpe
      val wc = Bpe.wordCounts(Tables(s, dir, "documents"), "text")
        .filter(col("word").rlike("^[a-z0-9]+$"))
      val merges = Bpe.collectMerges(
        Bpe.train(wc, "word", "weight", numMerges = 12, minPairCount = 1L))
      wc.select(explode(Bpe.encode(col("word"), merges)).as("piece"),
          col("weight"))
        .groupBy(col("piece")).agg(sum(col("weight")).as("cnt"))
        .orderBy(col("cnt").desc, col("piece"))
        .limit(30)
    })
  )

  /** DuckDB recomputation of [[graft.operators.Bpe.train]] as `numMerges`
    * chained MATERIALIZED CTE triplets (census → argmax → non-overlap
    * merge) — the contract-row pattern taken to its limit: the ORACLE
    * runs the whole training recurrence, so every emitted merge row is
    * under the hard cross-engine signal.
    *
    * Word state is encoded as a '||'-delimited symbol string
    * (`||t||h||e||`); applying merge (a,b) is then exactly SQL
    * `replace(s, '|a||b|', '|ab|')` — replace's left-to-right
    * non-overlapping scan IS the BPE merge rule, and the doubled
    * delimiter makes adjacent merge sites independent (each occurrence
    * consumes only the inner halves of its neighbors' delimiters, so
    * `||a||a||a||a||` correctly collapses to `||aa||aa||`). Symbols are
    * [a-z0-9]+ by the query's vocabulary filter, so '|' can never occur
    * inside one. MATERIALIZED is load-bearing: each state CTE is
    * referenced twice (next census + next state), and DuckDB's default
    * inlining would re-expand the chain exponentially. */
  /** Shared unicode fixtures for the round-11 non-ASCII parity rows —
    * ONE Scala value interpolated into both the Spark plan (`lit`) and
    * the oracle SQL literal, so the two sides are byte-identical by
    * construction regardless of normalization form. Contents (verified
    * at the code-point level): NFC accents (é = U+00E9), CJK, astral
    * symbols (U+1F600, U+10348, U+1D11E — surrogate pairs in source,
    * single code points on the wire), and the standalone `é` in
    * [[UniBoiler]]/[[UniFooter]] is a deliberate NFD combining
    * sequence (`e` + U+0301) so the gate exercises both forms. None
    * contain `'` (they ride inside SQL string literals) or `$`. */
  private val UniVowels = "àéîöü" // àéîöü
  private val UniTail =
    " café naïve 𐍈𝄞 tàïl"
  private val UniBoiler =
    " Éxàctly répéàtéd 😀中文" +
      " böïlérplàté sénténcé with" +
      " cömbining é plàntéd."
  private val UniHeader =
    "Wëlcome ünïcödé archive" +
      " 😀中文 of shared docs."
  private val UniFooter =
    "All ünïcödé documents 𐍈𝄞" +
      " provided as-is é."

  /** NFC/NFD twin tails for the `dedup_exact_nfc` row: byte-different,
    * canonically equivalent (NFC([[NfdTail]]) == [[NfcTail]], asserted
    * in UnicodeNormSpec). All-lowercase so `lower` cannot introduce a
    * cross-engine case-mapping wrinkle; both sides are written in
    * explicit backslash-u escapes so no editor/tool can silently re-normalize
    * the source file. */
  private val NfcTail = " r\u00E9p\u00E9t\u00E9 caf\u00E9 na\u00EFve \u00E9"
  private[graft] def nfcTail: String = NfcTail
  private val NfdTail =
    " re\u0301pe\u0301te\u0301 cafe\u0301 nai\u0308ve e\u0301"
  private[graft] def nfdTail: String = NfdTail

  /** Consecutive-doc twin corpus of the `dedup_*_nfc` rows: doc 2k and
    * doc 2k+1 share doc 2k's base text and append canonically-EQUIVALENT
    * but byte-DIFFERENT tails ([[NfcTail]]/[[NfdTail]]) \u2014 each pair is
    * invisible to byte identity and exact under NFC. The oracle builds
    * the identical corpus in SQL from the same interpolated literals. */
  private def nfcTwinCorpus(d: DataFrame): DataFrame = {
    val base = d.select(col("doc_id").as("bid"), col("text").as("btext"))
    d.select(col("doc_id"), (col("doc_id") - (col("doc_id") % 2)).as("bid"))
      .join(base, "bid")
      .select(col("doc_id"),
        concat(col("btext"),
          when(col("doc_id") % 2 === 0, lit(NfcTail)).otherwise(lit(NfdTail)))
          .as("text"))
  }

  private def bpeStateChain(numMerges: Int,
                            textExpr: String = "text",
                            wordRe: String = "^[a-z0-9]+$"): String = {
    val head =
      s"""WITH wc AS MATERIALIZED (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS weight FROM (
        |    SELECT UNNEST(list_filter(string_split_regex(lower($textExpr), '\\s+'), x -> x <> '')) AS word
        |    FROM documents)
        |  WHERE regexp_matches(word, '$wordRe')
        |  GROUP BY word),
        |s0 AS MATERIALIZED (SELECT '||' || array_to_string(list_transform(range(1, length(word) + 1), i -> word[i:i]), '||') || '||' AS s, weight FROM wc)""".stripMargin
    val steps = (1 to numMerges).map { i =>
      s""",
         |p$i AS MATERIALIZED (SELECT p.a AS a, p.b AS b, CAST(SUM(weight) AS BIGINT) AS w FROM (
         |    SELECT weight, UNNEST(list_transform(range(1, len(sy)), j -> {'a': sy[j], 'b': sy[j+1]})) AS p
         |    FROM (SELECT list_filter(string_split(s, '||'), x -> x <> '') AS sy, weight FROM s${i - 1}))
         |  GROUP BY 1, 2),
         |m$i AS MATERIALIZED (SELECT a, b, w FROM p$i ORDER BY w DESC, a, b LIMIT 1),
         |s$i AS MATERIALIZED (SELECT replace(s, '|' || m.a || '||' || m.b || '|', '|' || m.a || m.b || '|') AS s, weight FROM s${i - 1}, m$i m)""".stripMargin
    }.mkString
    head + steps
  }

  private def bpeTrainOracle(numMerges: Int): String = {
    val union = (1 to numMerges)
      .map(i => s"""SELECT $i AS "rank", a AS "left", b AS "right", w AS "weight" FROM m$i""")
      .mkString("\nUNION ALL ")
    bpeStateChain(numMerges) +
      s"""\nSELECT * FROM (\n$union\n) ORDER BY "rank""""
  }

  private def bpeEncodeOracle(numMerges: Int,
                              textExpr: String = "text",
                              wordRe: String = "^[a-z0-9]+$"): String =
    bpeStateChain(numMerges, textExpr, wordRe) +
      s"""
         |SELECT piece, CAST(SUM(weight) AS BIGINT) AS cnt FROM (
         |  SELECT UNNEST(list_filter(string_split(s, '||'), x -> x <> '')) AS piece, weight FROM s$numMerges)
         |GROUP BY piece ORDER BY cnt DESC, piece LIMIT 30""".stripMargin

  val oracles: Map[String, String] = Map(
    "q24_token_counts" ->
      """SELECT token, COUNT(*) AS cnt FROM (
        |  SELECT UNNEST(string_split_regex(text, '\s+')) AS token FROM documents) t
        |WHERE token <> '' GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin,

    "text_pii" ->
      """WITH seeded AS (SELECT doc_id,
        |  text || CASE WHEN doc_id % 7 = 0
        |    THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-123-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' at https://ex.org/' || CAST(doc_id AS VARCHAR)
        |    ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS BIGINT) AS n_url,
        |  md5(regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '[EMAIL]', 'g')) AS redacted_fp,
        |  (len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
        |   + len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))) > 0 AS has_pii
        |FROM seeded ORDER BY doc_id""".stripMargin,

    "pipeline_curate" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text || '  ' FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL SELECT doc_id + 2000000, '@@@@ 1234 %%%% 5678 $$$$' FROM documents WHERE doc_id % 25 = 0),
        |t AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM corpus),
        |s AS (SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  (CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / LENGTH(text)) * 0.5 +
        |  (CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(toks)) * 0.5 AS q
        |  FROM t),
        |f AS (SELECT * FROM s WHERE q >= 0.3),
        |d AS (SELECT q, n_tokens,
        |  row_number() OVER (PARTITION BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) ORDER BY doc_id) AS rn
        |  FROM f)
        |SELECT CAST(FLOOR(q * 10) AS BIGINT) AS q_decile,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM d WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

    // the trainer tail re-derived whole: the pipeline_curate quality/
    // dedup head, the text_mix_tokens budget selection over the
    // survivors, the text_pack_sequences layout over the drawn set
    "pipeline_pack" ->
      """WITH t AS (SELECT doc_id, lang, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, lang, text, CAST(len(toks) AS BIGINT) AS n,
        |    (CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / LENGTH(text)) * 0.5 +
        |    (CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(toks)) * 0.5 AS q
        |  FROM t),
        |f AS (SELECT doc_id, lang, text, n FROM s WHERE q >= 0.3),
        |d AS (SELECT doc_id, lang, n,
        |    row_number() OVER (PARTITION BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) ORDER BY doc_id) AS rn
        |  FROM f),
        |surv AS (SELECT doc_id, lang, n FROM d WHERE rn = 1),
        |c AS (SELECT lang, SUM(n) AS tt FROM surv GROUP BY 1),
        |wq AS (SELECT lang, tt, POW(tt, 0.5) AS a FROM c),
        |q2 AS (SELECT lang, LEAST(tt, GREATEST(1,
        |    CAST(ROUND(60000 * a / (SELECT SUM(a) FROM wq)) AS BIGINT))) AS qq FROM wq),
        |r AS (SELECT doc_id, lang, n,
        |    CAST(SUM(n) OVER (PARTITION BY lang
        |      ORDER BY md5(lang || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) - n AS bef
        |  FROM surv),
        |drawn AS (SELECT r.doc_id, r.n FROM r JOIN q2 USING (lang)
        |  WHERE r.bef < q2.qq),
        |h AS (SELECT doc_id, n,
        |    md5('ep0:' || CAST(doc_id AS VARCHAR)) AS hv FROM drawn),
        |sh AS (SELECT doc_id, n, substr(hv, 1, 2) AS shard,
        |  CAST(row_number() OVER (PARTITION BY substr(hv, 1, 2)
        |    ORDER BY hv, doc_id) AS BIGINT) AS pos,
        |  SUM(n) OVER (PARTITION BY substr(hv, 1, 2)
        |    ORDER BY hv, doc_id) AS cum FROM h),
        |tt2 AS (SELECT shard, SUM(n) AS t FROM sh GROUP BY shard),
        |b AS (SELECT shard, CAST(COALESCE(SUM(t) OVER (ORDER BY shard
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base
        |  FROM tt2),
        |g AS (SELECT sh.doc_id, sh.shard, sh.pos, sh.n,
        |    CAST(b.base + sh.cum - sh.n AS BIGINT) AS s
        |  FROM sh JOIN b USING (shard) WHERE sh.n > 0),
        |fr AS (SELECT doc_id, shard, pos, n, s,
        |    UNNEST(range(s // 512, (s + n - 1) // 512 + 1)) AS seq_id FROM g)
        |SELECT doc_id, shard, pos, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(GREATEST(s, seq_id * 512) - seq_id * 512 AS BIGINT) AS seq_off,
        |  CAST(GREATEST(s, seq_id * 512) - s AS BIGINT) AS frag_start,
        |  CAST(LEAST(s + n, (seq_id + 1) * 512) - GREATEST(s, seq_id * 512) AS BIGINT) AS frag_len
        |FROM fr ORDER BY seq_id, seq_off""".stripMargin,

    "text_decontaminate" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, UNNEST(
        |    CASE WHEN len(t) >= 3
        |         THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
        |         ELSE [] END) AS s
        |  FROM toks),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0)
        |SELECT sh.doc_id, CAST(count(DISTINCT sh.s) AS BIGINT) AS n_shared
        |FROM sh JOIN ev USING (s)
        |WHERE sh.doc_id % 50 <> 0
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,

    // identical result contract as the bloom-prefiltered plan: the sketch
    // only prunes the exact confirm join's input, never the answer
    "text_decontaminate_bloom" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, UNNEST(
        |    CASE WHEN len(t) >= 3
        |         THEN list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
        |         ELSE [] END) AS s
        |  FROM toks),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0)
        |SELECT DISTINCT sh.doc_id
        |FROM sh JOIN ev USING (s)
        |WHERE sh.doc_id % 50 <> 0
        |ORDER BY doc_id""".stripMargin,

    "q46_posexplode" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents WHERE doc_id % 25 = 0),
        |u AS (SELECT doc_id, UNNEST(range(len(t))) AS pos, UNNEST(t) AS tok FROM toks)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok
        |FROM u WHERE pos < 20 ORDER BY doc_id, pos""".stripMargin,

    "text_quota_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 15 ORDER BY doc_id""".stripMargin,

    "text_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, UNNEST(string_split_regex(text, '\s+')) AS term FROM documents),
        |t AS (SELECT doc_id, term FROM terms WHERE term <> ''),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY term)
        |SELECT tf.doc_id, tf.term,
        |  CAST(CAST(CAST(tf.tf AS DOUBLE) * ((CAST(n.n AS DOUBLE) + CAST(1.0 AS DOUBLE))
        |    / (CAST(df.df AS DOUBLE) + CAST(1.0 AS DOUBLE))) AS DECIMAL(18,4)) AS DOUBLE) AS tfidf
        |FROM tf JOIN df USING (term), n
        |ORDER BY tfidf DESC, tf.doc_id, tf.term LIMIT 20""".stripMargin,

    // same distinct-2-gram construction as the jaccard oracle; // is
    // DuckDB's integral division (floor; operands non-negative, so it
    // matches Spark's truncating div). Docs under 2 tokens have zero
    // 2-grams and drop out of the grouping on both engines.
    "text_repetition" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id, UNNEST(
        |    CASE WHEN len(t) >= 2
        |         THEN list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
        |         ELSE CAST([] AS VARCHAR[]) END) AS sh
        |  FROM toks)
        |SELECT doc_id, COUNT(*) AS n_grams,
        |  CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_distinct,
        |  (COUNT(*) - COUNT(DISTINCT sh)) * 10000 // COUNT(*) AS dup_ratio_e4
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // identical hex-prefix bucketing: boundaries cccc = floor(0.8*0x10000),
    // e666 = floor(0.9*0x10000); fixed-length lowercase hex compares
    // lexicographically as its numeric value. SUM(BIGINT) is HUGEINT in
    // DuckDB — cast back for the schema match.
    "text_split_stable" ->
      """WITH s AS (SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
        |       ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_id,
        |  MAX(doc_id) AS max_id, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY split ORDER BY split""".stripMargin,

    // boundaries = floor(fraction * 0x10000) as 4-hex (Sampling.boundary):
    // en 0.5 -> '8000', default 0.25 -> '4000'; zh 1.0 -> 'g', which sorts
    // after every 4-hex bucket ('g' > 'f') = keep all
    "text_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 4) <
        |  CASE lang WHEN 'en' THEN '8000' WHEN 'zh' THEN 'g' ELSE '4000' END
        |ORDER BY doc_id""".stripMargin,

    // expression tree mirrors the Spark side token for token (see query
    // note); avgdl derived identically: exact integer token total → DOUBLE
    // → one division by the BIGINT corpus count. EVERY operand is cast to
    // DOUBLE explicitly: DuckDB types bare numeric literals as DECIMAL and
    // would evaluate `tf * 2.2` in exact decimal arithmetic — a different
    // op sequence than Spark's IEEE doubles (measured: 18,924 of 116,231
    // raw scores differ at sf0.1), the 1-ulp-flips-decimal-rounding class
    // that made round 1's only red pair.
    "text_bm25" ->
      """WITH terms AS (
        |  SELECT doc_id, UNNEST(string_split_regex(text, '\s+')) AS term FROM documents),
        |t AS (SELECT doc_id, term FROM terms WHERE term <> ''),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY doc_id),
        |a AS (SELECT CAST(SUM(dl) AS DOUBLE) / (SELECT n FROM n) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY term)
        |SELECT tf.doc_id, tf.term,
        |  CAST(CAST((CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE) /
        |      (CAST(tf.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
        |        + CAST(0.75 AS DOUBLE) * (CAST(dl.dl AS DOUBLE) / a.avgdl))))
        |    * ((CAST(n.n AS DOUBLE) + CAST(1.0 AS DOUBLE)) / (CAST(df.df AS DOUBLE) + CAST(1.0 AS DOUBLE)))
        |    AS DECIMAL(18,4)) AS DOUBLE) AS bm25
        |FROM tf JOIN df USING (term) JOIN dl USING (doc_id), n, a
        |ORDER BY bm25 DESC, tf.doc_id, tf.term LIMIT 20""".stripMargin,

    "q40_pack_chunks" ->
      """WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS toks
        |  FROM documents),
        |c AS (SELECT shard, toks,
        |  CAST(SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) - toks AS start_tok
        |  FROM t)
        |SELECT shard, CAST(FLOOR(start_tok / 1000) AS BIGINT) AS chunk,
        |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS chunk_tokens
        |FROM c GROUP BY shard, chunk ORDER BY shard, chunk""".stripMargin,

    "text_langid" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CASE
        |    WHEN regexp_matches(text, '[\x{4E00}-\x{9FFF}]') THEN 'zh'
        |    WHEN regexp_matches(text, '[\x{0400}-\x{04FF}]') THEN 'ru'
        |    WHEN len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) >=
        |         len(list_filter(toks, x -> x IN ('el','la','de','que','los','las','y')))
        |     AND len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) > 0 THEN 'en'
        |    WHEN len(list_filter(toks, x -> x IN ('el','la','de','que','los','las','y'))) > 0 THEN 'es'
        |    ELSE 'und'
        |  END AS lang_pred
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / LENGTH(text) AS ar,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(toks) AS sr
        |  FROM t)
        |SELECT doc_id, n_tokens, ROUND(ar, 4) AS alpha_ratio, ROUND(sr, 4) AS stop_ratio,
        |  ROUND(ar * 0.5 + sr * 0.5, 4) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,

    // mirrors the Spark expression tree metric-for-metric: same tokenizer,
    // same rounding scale, same rule thresholds over the ROUNDED metrics.
    // DuckDB `/` on integers is float division (like Spark's Divide), so
    // the `.../3` ellipsis discount needs no cast on either side.
    "text_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
        |  string_split(text, chr(10)) AS lns
        |  FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_words,
        |  ROUND(CAST(list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
        |        / len(toks), 4) AS mean_word_len,
        |  ROUND(((length(text) - length(replace(text, '#', ''))) +
        |         (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))) / 3)
        |        / CAST(len(toks) AS DOUBLE), 4) AS symbol_ratio,
        |  ROUND(CAST(len(list_filter(lns, l -> substr(trim(l), 1, 1) IN ('-', '*'))) AS DOUBLE)
        |        / len(lns), 4) AS bullet_ratio,
        |  ROUND(CAST(len(list_filter(lns, l -> ends_with(rtrim(l), '...'))) AS DOUBLE)
        |        / len(lns), 4) AS ellipsis_ratio,
        |  ROUND(CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        |        / len(toks), 4) AS alpha_word_ratio,
        |  CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        |                       sw -> list_contains(toks, sw))) AS BIGINT) AS stop_hits
        |  FROM t)
        |SELECT *,
        |  n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
        |    AND symbol_ratio < 0.1 AND bullet_ratio < 0.9 AND ellipsis_ratio < 0.3
        |    AND alpha_word_ratio > 0.8 AND stop_hits >= 2 AS passes
        |FROM m ORDER BY doc_id""".stripMargin,

    // identical sentence-line seeding as the Spark side; substr with a
    // negative start counts from the end in BOTH engines (last char, ''
    // on ''); COALESCE because array_to_string of an EMPTY list is NULL
    // in DuckDB while Spark array_join gives ''
    "text_c4_rules" ->
      """WITH tk AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t FROM documents),
        |sd AS (SELECT doc_id,
        |  COALESCE(array_to_string(list_transform(range(CAST(FLOOR((len(t) + 7) / 8) AS BIGINT)),
        |    i -> array_to_string(t[i*8+1 : i*8+8], ' ') ||
        |      CASE i % 3 WHEN 0 THEN '.' WHEN 1 THEN '!' ELSE '?' END), chr(10)), '')
        |  || chr(10) || 'short line.'
        |  || CASE WHEN doc_id % 41 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
        |  || CASE WHEN doc_id % 37 = 0 THEN chr(10) || 'config { debug } done here now.' ELSE '' END
        |  AS seeded FROM tk),
        |k AS (SELECT doc_id, seeded, string_split(seeded, chr(10)) AS lns,
        |  list_filter(string_split(seeded, chr(10)),
        |    l -> substr(rtrim(l), -1, 1) IN ('.', '!', '?', '"')
        |      AND len(list_filter(string_split_regex(l, '\s+'), x -> x <> '')) >= 5) AS kept
        |  FROM sd)
        |SELECT doc_id,
        |  CAST(len(lns) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
        |  md5(COALESCE(array_to_string(kept, chr(10)), '')) AS clean_fp,
        |  contains(lower(seeded), 'lorem ipsum') AS has_lorem,
        |  contains(seeded, '{') AS has_brace,
        |  len(kept) >= 3 AND NOT contains(lower(seeded), 'lorem ipsum')
        |    AND NOT contains(seeded, '{') AS keep_doc
        |FROM k ORDER BY doc_id""".stripMargin,

    // identical seeding as the Spark side; lockstep dual UNNEST is the
    // posexplode analog (q46 precedent); string_agg(ORDER BY pos) is the
    // ordered reassembly
    "text_line_dedup" ->
      """WITH corpus AS (SELECT doc_id,
        |  text || chr(10) || 'Copyright Example Corp. All rights reserved.'
        |    || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'Home | About | Contact' ELSE '' END
        |    || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'Subscribe to our newsletter today!' ELSE '' END AS text
        |  FROM documents),
        |l AS (SELECT doc_id,
        |  UNNEST(string_split(text, chr(10))) AS line,
        |  UNNEST(range(len(string_split(text, chr(10))))) AS pos FROM corpus),
        |k AS (SELECT doc_id, pos, line,
        |  md5(lower(trim(regexp_replace(line, '\s+', ' ', 'g')))) AS lkey FROM l),
        |b AS (SELECT lkey FROM (
        |  SELECT lkey, COUNT(DISTINCT doc_id) AS line_df FROM k GROUP BY 1)
        |  WHERE line_df >= 50),
        |kept AS (SELECT k.* FROM k ANTI JOIN b USING (lkey)),
        |r AS (SELECT doc_id, COUNT(*) AS n_kept,
        |  string_agg(line, chr(10) ORDER BY pos) AS clean FROM kept GROUP BY doc_id)
        |SELECT c.doc_id,
        |  CAST(len(string_split(c.text, chr(10))) AS BIGINT) AS n_lines,
        |  CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
        |  md5(COALESCE(r.clean, '')) AS clean_fp
        |FROM corpus c LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin,

    // per-token logp quantized to DECIMAL(12,6) BEFORE the per-doc sum so
    // the aggregate is order-independent (QueryPack policy); the final
    // mean divides the exact decimal sum as a double on both engines
    "text_unigram_lm" ->
      """WITH t AS (SELECT doc_id,
        |  UNNEST(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |v AS (SELECT term, COUNT(*) AS c FROM t GROUP BY 1),
        |n AS (SELECT SUM(c) AS n_total FROM v),
        |lp AS (SELECT term, CAST(ROUND(ln(CAST(c AS DOUBLE) / n_total), 6) AS DECIMAL(12,6)) AS logp
        |  FROM v, n),
        |j AS (SELECT t.doc_id, lp.logp FROM t JOIN lp USING (term))
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  ROUND(CAST(SUM(logp) AS DOUBLE) / COUNT(*), 4) AS mean_logp
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // bigram LM: adjacent-token pairs from the 1-based token list, context
    // counts summed off the bigram census (CAST — SUM(BIGINT) is HUGEINT),
    // add-0.1 smoothing against the token-type count, logp quantized to
    // DECIMAL(12,6) before the per-doc sum (the text_unigram_lm policy)
    "text_bigram_lm" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |b AS (SELECT doc_id,
        |    UNNEST(list_transform(range(1, len(ws)),
        |      i -> struct_pack(w1 := ws[i], w2 := ws[i + 1]))) AS bg
        |  FROM t WHERE len(ws) >= 2),
        |b2 AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM b),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM b2 GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
        |v AS (SELECT COUNT(DISTINCT x) AS vs FROM (SELECT UNNEST(ws) AS x FROM t)),
        |lp AS (SELECT w1, w2,
        |    CAST(ROUND(ln((c2 + 0.1) / (CAST(c1 AS DOUBLE) + 0.1 * vs)), 6) AS DECIMAL(12,6)) AS logp
        |  FROM c2 JOIN c1 USING (w1), v),
        |j AS (SELECT b2.doc_id, lp.logp FROM b2 JOIN lp USING (w1, w2))
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  ROUND(CAST(SUM(logp) AS DOUBLE) / COUNT(*), 4) AS mean_logp
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // winnowing recomputed whole: k-gram md5 prefixes, the composite
    // (hash, 10^12 - pos) tiebreak key, a leading ROWS window min per
    // window start, distinct selections parsed back to (pos, fp)
    "text_winnow" ->
      """WITH d AS (SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |  FROM documents),
        |g AS (SELECT doc_id, t, CAST(len(t) - 8 + 1 AS BIGINT) AS m,
        |    UNNEST(range(1, len(t) - 8 + 2)) AS p
        |  FROM d WHERE len(t) >= 8),
        |h AS (SELECT doc_id, m, CAST(p AS BIGINT) AS p,
        |    concat(substr(md5(substr(t, CAST(p AS INT), 8)), 1, 16),
        |      lpad(CAST(999999999999 - p AS VARCHAR), 12, '0')) AS key
        |  FROM g),
        |w AS (SELECT doc_id, m, p,
        |    MIN(key) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS wk
        |  FROM h),
        |sel AS (SELECT DISTINCT doc_id, wk FROM w
        |  WHERE p <= GREATEST(m - 6 + 1, 1))
        |SELECT doc_id,
        |  CAST(999999999999 - CAST(substr(wk, 17, 12) AS BIGINT) AS BIGINT) AS pos,
        |  substr(wk, 1, 16) AS fp
        |FROM sel ORDER BY doc_id, pos""".stripMargin,

    // the full overlap chain re-derived: the text_winnow selection SQL
    // collapsed to distinct (doc, fp) sets (MATERIALIZED — three
    // references), per-doc set sizes, the fp self-join with id_a < id_b,
    // the >= 5 HAVING gate, the 4dp containment ratio
    "text_winnow_pairs" ->
      """WITH d AS (SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |  FROM documents),
        |g AS (SELECT doc_id, t, CAST(len(t) - 8 + 1 AS BIGINT) AS m,
        |    UNNEST(range(1, len(t) - 8 + 2)) AS p
        |  FROM d WHERE len(t) >= 8),
        |h AS (SELECT doc_id, m, CAST(p AS BIGINT) AS p,
        |    concat(substr(md5(substr(t, CAST(p AS INT), 8)), 1, 16),
        |      lpad(CAST(999999999999 - p AS VARCHAR), 12, '0')) AS key
        |  FROM g),
        |w AS (SELECT doc_id, m, p,
        |    MIN(key) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS wk
        |  FROM h),
        |f AS MATERIALIZED (SELECT DISTINCT doc_id, substr(wk, 1, 16) AS fp
        |  FROM w WHERE p <= GREATEST(m - 6 + 1, 1)),
        |n AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM f GROUP BY 1),
        |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    COUNT(*) AS shared_fps
        |  FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT id_a, id_b, shared_fps, na.n AS n_a, nb.n AS n_b,
        |  ROUND(shared_fps / LEAST(na.n, nb.n), 4) AS overlap
        |FROM pr JOIN n na ON pr.id_a = na.doc_id
        |  JOIN n nb ON pr.id_b = nb.doc_id
        |ORDER BY id_a, id_b""".stripMargin,

    // the auto-capped route re-derived whole, INCLUDING the cap: df
    // census over the fingerprint sets, distinct-df histogram, the
    // cumulative exact-quantile rule (min df with cum >= 0.999 * total),
    // the GREATEST(64, ...) floor, then the same pair chain over the
    // capped sets with capped n_a/n_b denominators
    "text_winnow_pairs_auto" ->
      """WITH d AS (SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |  FROM documents),
        |g AS (SELECT doc_id, t, CAST(len(t) - 8 + 1 AS BIGINT) AS m,
        |    UNNEST(range(1, len(t) - 8 + 2)) AS p
        |  FROM d WHERE len(t) >= 8),
        |h AS (SELECT doc_id, m, CAST(p AS BIGINT) AS p,
        |    concat(substr(md5(substr(t, CAST(p AS INT), 8)), 1, 16),
        |      lpad(CAST(999999999999 - p AS VARCHAR), 12, '0')) AS key
        |  FROM g),
        |w AS (SELECT doc_id, m, p,
        |    MIN(key) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS wk
        |  FROM h),
        |f AS MATERIALIZED (SELECT DISTINCT doc_id, substr(wk, 1, 16) AS fp
        |  FROM w WHERE p <= GREATEST(m - 6 + 1, 1)),
        |dfs AS MATERIALIZED (SELECT fp, COUNT(*) AS df FROM f GROUP BY 1),
        |hist AS (SELECT df, COUNT(*) AS nf FROM dfs GROUP BY 1),
        |cap AS (SELECT GREATEST(64, MIN(df)) AS cap FROM (
        |    SELECT df, SUM(nf) OVER (ORDER BY df) AS cum,
        |      SUM(nf) OVER () AS nn FROM hist)
        |  WHERE cum >= nn * 0.999),
        |fk AS MATERIALIZED (SELECT f.doc_id, f.fp
        |  FROM f JOIN dfs USING (fp), cap WHERE dfs.df <= cap.cap),
        |n AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM fk GROUP BY 1),
        |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    COUNT(*) AS shared_fps
        |  FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT id_a, id_b, shared_fps, na.n AS n_a, nb.n AS n_b,
        |  ROUND(shared_fps / LEAST(na.n, nb.n), 4) AS overlap
        |FROM pr JOIN n na ON pr.id_a = na.doc_id
        |  JOIN n nb ON pr.id_b = nb.doc_id
        |ORDER BY id_a, id_b""".stripMargin,

    // the incremental probe re-derived globally: same fingerprint sets,
    // batch (doc_id % 3 = 0) joined against history sets, shared counts
    // gated at >= 5, the intake-side shared/n_batch ratio
    "text_winnow_pairs_incr" ->
      """WITH d AS (SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |  FROM documents),
        |g AS (SELECT doc_id, t, CAST(len(t) - 8 + 1 AS BIGINT) AS m,
        |    UNNEST(range(1, len(t) - 8 + 2)) AS p
        |  FROM d WHERE len(t) >= 8),
        |h AS (SELECT doc_id, m, CAST(p AS BIGINT) AS p,
        |    concat(substr(md5(substr(t, CAST(p AS INT), 8)), 1, 16),
        |      lpad(CAST(999999999999 - p AS VARCHAR), 12, '0')) AS key
        |  FROM g),
        |w AS (SELECT doc_id, m, p,
        |    MIN(key) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS wk
        |  FROM h),
        |f AS MATERIALIZED (SELECT DISTINCT doc_id, substr(wk, 1, 16) AS fp
        |  FROM w WHERE p <= GREATEST(m - 6 + 1, 1)),
        |bf AS MATERIALIZED (SELECT * FROM f WHERE doc_id % 3 = 0),
        |n AS (SELECT doc_id, COUNT(*) AS n_batch FROM bf GROUP BY 1),
        |pr AS (SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
        |    COUNT(*) AS shared_fps
        |  FROM bf b JOIN (SELECT * FROM f WHERE doc_id % 3 <> 0) c
        |    ON b.fp = c.fp
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT batch_id, corpus_id, shared_fps, n.n_batch,
        |  ROUND(shared_fps / n.n_batch, 4) AS overlap
        |FROM pr JOIN n ON pr.batch_id = n.doc_id
        |ORDER BY batch_id, corpus_id""".stripMargin,

    // quota arithmetic mirrored exactly: LEAST(n, GREATEST(1,
    // ROUND(T * n^alpha / sum))) — positive-tie rounding agrees between
    // Math.round and DuckDB ROUND; selection is the stable md5 rank
    "text_mix_temperature" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang, n, POW(n, 0.5) AS a FROM c),
        |t AS (SELECT lang, LEAST(n, GREATEST(1,
        |    CAST(ROUND(150 * a / (SELECT SUM(a) FROM w)) AS BIGINT))) AS tgt FROM w),
        |r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(lang || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT r.doc_id, r.lang FROM r JOIN t USING (lang)
        |WHERE rn <= tgt ORDER BY doc_id""".stripMargin,

    // same quota arithmetic as text_mix_temperature but UNCAPPED: an
    // upsampled source's quota splits into q // n base copies for every
    // row plus one extra for the first q % n rows of the md5 rank order;
    // `//` is DuckDB integer division, matching Scala Long division
    "text_mix_repeats" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang, n, POW(n, 0.25) AS a FROM c),
        |t AS (SELECT lang, n, GREATEST(1,
        |    CAST(ROUND(600 * a / (SELECT SUM(a) FROM w)) AS BIGINT)) AS q FROM w),
        |b AS (SELECT lang, n, q, q // n AS base, q % n AS rem FROM t),
        |r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(lang || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT r.doc_id, r.lang,
        |  CAST(b.base + CASE WHEN r.rn <= b.rem THEN 1 ELSE 0 END AS BIGINT) AS n_copies
        |FROM r JOIN b USING (lang)
        |WHERE b.base >= 1 OR r.rn <= b.rem
        |ORDER BY doc_id""".stripMargin,

    // same pair derivation as the dedup_ngram_jaccard oracle, components
    // via recursive CTE (the dedup_components pattern), keeper = best
    // quality then min id within each component
    "dedup_keep_best" ->
      """WITH RECURSIVE toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, UNNEST(
        |    CASE WHEN len(t) >= 2
        |         THEN list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
        |         ELSE CAST([] AS VARCHAR[]) END) AS sh
        |  FROM toks),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |p AS (SELECT id_a, id_b
        |  FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |  WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.2),
        |ed AS (SELECT id_a AS src, id_b AS dst FROM p
        |       UNION SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM ed
        |  UNION
        |  SELECT ed.src, reach.r FROM ed JOIN reach ON ed.dst = reach.id),
        |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
        |q AS (SELECT doc_id,
        |  ROUND(CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
        |        / LENGTH(text), 4) AS q FROM documents),
        |drop AS (SELECT id FROM (
        |  SELECT c.id, row_number() OVER (PARTITION BY c.component
        |    ORDER BY q.q DESC, c.id ASC) AS rn
        |  FROM comp c JOIN q ON q.doc_id = c.id) WHERE rn > 1)
        |SELECT q.doc_id, q.q FROM q ANTI JOIN drop ON q.doc_id = drop.id
        |ORDER BY q.doc_id""".stripMargin,

    // the naive quadratic join IS the contract; the engine's q-gram
    // blocking must reproduce it exactly
    "dedup_edit_distance" ->
      """WITH tk AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents WHERE doc_id % 2 = 0),
        |base AS (SELECT doc_id, array_to_string(t[1:5], ' ') AS s FROM tk),
        |reps AS (SELECT MIN(doc_id) AS id, s FROM base GROUP BY s),
        |var AS (SELECT id + 1000000 AS id, 'x' || substr(s, 2) AS s
        |  FROM reps WHERE id % 4 = 0),
        |c AS (SELECT id, s FROM reps UNION ALL SELECT id, s FROM var)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM c a JOIN c b ON a.id < b.id
        |WHERE levenshtein(a.s, b.s) = 1
        |ORDER BY id_a, id_b""".stripMargin,

    "text_shard_shuffle" ->
      """WITH h AS (SELECT doc_id,
        |  md5('ep0:' || CAST(doc_id AS VARCHAR)) AS hv FROM documents)
        |SELECT doc_id, substr(hv, 1, 2) AS shard,
        |  CAST(row_number() OVER (PARTITION BY substr(hv, 1, 2)
        |    ORDER BY hv, doc_id) AS BIGINT) AS pos
        |FROM h ORDER BY shard, pos""".stripMargin,

    // token-budget temperature mix: POW quotas over per-source token
    // totals (the text_mix_temperature arithmetic, denominated in
    // tokens), then a per-source running token offset in the same md5
    // order — keep documents whose preceding tokens sit under the budget
    "text_mix_tokens" ->
      """WITH d AS (SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (SELECT lang, SUM(n) AS t FROM d GROUP BY 1),
        |w AS (SELECT lang, t, POW(t, 0.5) AS a FROM c),
        |q AS (SELECT lang, LEAST(t, GREATEST(1,
        |    CAST(ROUND(120000 * a / (SELECT SUM(a) FROM w)) AS BIGINT))) AS q FROM w),
        |r AS (SELECT doc_id, lang, n,
        |    CAST(SUM(n) OVER (PARTITION BY lang
        |      ORDER BY md5(lang || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) - n AS bef
        |  FROM d)
        |SELECT r.doc_id, r.lang, r.n AS n_tokens FROM r JOIN q USING (lang)
        |WHERE r.bef < q.q ORDER BY doc_id""".stripMargin,

    // the full packing layout recomputed in SQL: same md5 order as
    // text_shard_shuffle, per-shard cumsum, shard-base prefix sum,
    // fragment arithmetic in BIGINT floor division
    "text_pack_sequences" ->
      """WITH h AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n,
        |    md5('ep0:' || CAST(doc_id AS VARCHAR)) AS hv FROM documents),
        |sh AS (SELECT doc_id, n, substr(hv, 1, 2) AS shard,
        |  CAST(row_number() OVER (PARTITION BY substr(hv, 1, 2)
        |    ORDER BY hv, doc_id) AS BIGINT) AS pos,
        |  SUM(n) OVER (PARTITION BY substr(hv, 1, 2)
        |    ORDER BY hv, doc_id) AS cum FROM h),
        |t AS (SELECT shard, SUM(n) AS t FROM sh GROUP BY shard),
        |b AS (SELECT shard, CAST(COALESCE(SUM(t) OVER (ORDER BY shard
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base
        |  FROM t),
        |g AS (SELECT sh.doc_id, sh.shard, sh.pos, sh.n,
        |    CAST(b.base + sh.cum - sh.n AS BIGINT) AS s
        |  FROM sh JOIN b USING (shard) WHERE sh.n > 0),
        |f AS (SELECT doc_id, shard, pos, n, s,
        |    UNNEST(range(s // 512, (s + n - 1) // 512 + 1)) AS seq_id FROM g)
        |SELECT doc_id, shard, pos, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(GREATEST(s, seq_id * 512) - seq_id * 512 AS BIGINT) AS seq_off,
        |  CAST(GREATEST(s, seq_id * 512) - s AS BIGINT) AS frag_start,
        |  CAST(LEAST(s + n, (seq_id + 1) * 512) - GREATEST(s, seq_id * 512) AS BIGINT) AS frag_len
        |FROM f ORDER BY seq_id, seq_off""".stripMargin,

    // DSIR recomputed whole: unigram+bigram features, md5-prefix buckets,
    // both censuses, Laplace micro log-ratios under the floor(x+0.5)
    // Math.round convention, exact integer per-doc sums (zero-feature
    // docs score 0), the (score DESC, id) top-200
    "text_dsir_topk" ->
      """WITH tk AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |fe AS (SELECT doc_id, UNNEST(toks ||
        |    CASE WHEN len(toks) >= 2
        |         THEN list_transform(range(len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2])
        |         ELSE CAST([] AS VARCHAR[]) END) AS f
        |  FROM tk),
        |fb AS (SELECT doc_id, CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % 4096 AS b FROM fe),
        |rb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM fb WHERE doc_id % 50 <> 0 GROUP BY 1),
        |tb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM fb WHERE doc_id % 50 = 0 GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(COALESCE(SUM(c), 0) AS DOUBLE) FROM rb) AS rt,
        |               (SELECT CAST(COALESCE(SUM(c), 0) AS DOUBLE) FROM tb) AS tt),
        |bs AS (SELECT CAST(UNNEST(range(4096)) AS BIGINT) AS b),
        |r AS (SELECT bs.b, CAST(FLOOR(
        |    (ln((COALESCE(tb.c, 0) + 1.0) / (tot.tt + 4096.0)) -
        |     ln((COALESCE(rb.c, 0) + 1.0) / (tot.rt + 4096.0))) * 1e6 + 0.5) AS BIGINT) AS rm
        |  FROM bs LEFT JOIN rb ON bs.b = rb.b LEFT JOIN tb ON bs.b = tb.b, tot),
        |sc AS (SELECT fb.doc_id, CAST(SUM(r.rm) AS BIGINT) AS score_micro
        |  FROM fb JOIN r ON fb.b = r.b WHERE fb.doc_id % 50 <> 0 GROUP BY 1),
        |scall AS (SELECT d.doc_id, COALESCE(sc.score_micro, 0) AS score_micro
        |  FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
        |  LEFT JOIN sc ON d.doc_id = sc.doc_id),
        |sel AS (SELECT * FROM scall ORDER BY score_micro DESC, doc_id LIMIT 200)
        |SELECT doc_id, score_micro FROM sel ORDER BY doc_id""".stripMargin,

    // the Gumbel-top-k draw recomputed whole: same score chain, noise
    // key = score + floor-rounded micros of -ln(-ln u) with u from the
    // seeded md5 12-hex prefix (Spark round() and DuckDB ROUND share
    // half-away-from-zero here)
    "text_dsir_gumbel" ->
      """WITH tk AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |fe AS (SELECT doc_id, UNNEST(toks ||
        |    CASE WHEN len(toks) >= 2
        |         THEN list_transform(range(len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2])
        |         ELSE CAST([] AS VARCHAR[]) END) AS f
        |  FROM tk),
        |fb AS (SELECT doc_id, CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % 4096 AS b FROM fe),
        |rb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM fb WHERE doc_id % 50 <> 0 GROUP BY 1),
        |tb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM fb WHERE doc_id % 50 = 0 GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(COALESCE(SUM(c), 0) AS DOUBLE) FROM rb) AS rt,
        |               (SELECT CAST(COALESCE(SUM(c), 0) AS DOUBLE) FROM tb) AS tt),
        |bs AS (SELECT CAST(UNNEST(range(4096)) AS BIGINT) AS b),
        |r AS (SELECT bs.b, CAST(FLOOR(
        |    (ln((COALESCE(tb.c, 0) + 1.0) / (tot.tt + 4096.0)) -
        |     ln((COALESCE(rb.c, 0) + 1.0) / (tot.rt + 4096.0))) * 1e6 + 0.5) AS BIGINT) AS rm
        |  FROM bs LEFT JOIN rb ON bs.b = rb.b LEFT JOIN tb ON bs.b = tb.b, tot),
        |sc AS (SELECT fb.doc_id, CAST(SUM(r.rm) AS BIGINT) AS score_micro
        |  FROM fb JOIN r ON fb.b = r.b WHERE fb.doc_id % 50 <> 0 GROUP BY 1),
        |scall AS (SELECT d.doc_id, COALESCE(sc.score_micro, 0) AS score_micro
        |  FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
        |  LEFT JOIN sc ON d.doc_id = sc.doc_id),
        |keyed AS (SELECT doc_id, score_micro,
        |    score_micro + CAST(ROUND(-ln(-ln(
        |      (CAST(('0x' || substr(md5('ep0:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 0.5)
        |        / 281474976710656.0)) * 1e6) AS BIGINT) AS key_micro
        |  FROM scall),
        |sel AS (SELECT * FROM keyed ORDER BY key_micro DESC, doc_id LIMIT 200)
        |SELECT doc_id, score_micro, key_micro FROM sel ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, UNNEST(
        |    CASE WHEN len(t) >= 2
        |         THEN list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
        |         ELSE CAST([] AS VARCHAR[]) END) AS sh
        |  FROM toks),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard
        |FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_jaccard_prefix" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        |  FROM documents WHERE doc_id % 4 = 0),
        |sh AS (SELECT DISTINCT doc_id, UNNEST(
        |    CASE WHEN len(t) >= 2
        |         THEN list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
        |         ELSE CAST([] AS VARCHAR[]) END) AS sh
        |  FROM toks),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard
        |FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // identical seeding as the Spark side; keep-first winner via a
    // ROW_NUMBER window over the normalized paragraph identity (the
    // operator's min(struct) agg — same winner by construction);
    // empty-normalized paragraphs always kept
    "text_paragraph_dedup" ->
      """WITH corpus AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN 'Welcome to the example archive of shared documents.' || chr(10) || chr(10) ELSE '' END
        |  || text ||
        |  CASE WHEN doc_id % 3 = 0 THEN chr(10) || chr(10) || 'All documents are provided as-is without warranty.' ELSE '' END AS text
        |  FROM documents),
        |p AS (SELECT doc_id,
        |  UNNEST(string_split(text, chr(10) || chr(10))) AS para,
        |  UNNEST(range(len(string_split(text, chr(10) || chr(10))))) AS pos FROM corpus),
        |k AS (SELECT doc_id, pos, para,
        |  lower(trim(regexp_replace(para, '\s+', ' ', 'g'))) AS norm FROM p),
        |w AS (SELECT doc_id, pos, para,
        |  CASE WHEN norm = '' THEN 1
        |       WHEN ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id, pos) = 1 THEN 1
        |       ELSE 0 END AS keep FROM k),
        |r AS (SELECT doc_id, COUNT(*) AS n_kept,
        |  string_agg(para, chr(10) || chr(10) ORDER BY pos) AS clean
        |  FROM w WHERE keep = 1 GROUP BY doc_id)
        |SELECT c.doc_id,
        |  CAST(len(string_split(c.text, chr(10) || chr(10))) AS BIGINT) AS n_paras,
        |  CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
        |  md5(COALESCE(r.clean, '')) AS clean_fp
        |FROM corpus c LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin,

    // the incremental form: even ids are the accepted corpus (only its
    // normalized key set participates), odd ids the batch — anti-join
    // then keep-first within the batch, empties always kept
    "text_paragraph_dedup_incr" ->
      """WITH corpus AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN 'Welcome to the example archive of shared documents.' || chr(10) || chr(10) ELSE '' END
        |  || text ||
        |  CASE WHEN doc_id % 3 = 0 THEN chr(10) || chr(10) || 'All documents are provided as-is without warranty.' ELSE '' END AS text
        |  FROM documents),
        |hist AS (SELECT DISTINCT lower(trim(regexp_replace(para, '\s+', ' ', 'g'))) AS norm
        |  FROM (SELECT UNNEST(string_split(text, chr(10) || chr(10))) AS para
        |        FROM corpus WHERE doc_id % 2 = 0)
        |  WHERE lower(trim(regexp_replace(para, '\s+', ' ', 'g'))) <> ''),
        |b AS (SELECT doc_id, text FROM corpus WHERE doc_id % 2 = 1),
        |p AS (SELECT doc_id,
        |  UNNEST(string_split(text, chr(10) || chr(10))) AS para,
        |  UNNEST(range(len(string_split(text, chr(10) || chr(10))))) AS pos FROM b),
        |k AS (SELECT doc_id, pos, para,
        |  lower(trim(regexp_replace(para, '\s+', ' ', 'g'))) AS norm FROM p),
        |fresh AS (SELECT k.* FROM k WHERE norm <> '' AND norm NOT IN (SELECT norm FROM hist)),
        |w AS (SELECT doc_id, pos, para,
        |  CASE WHEN ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id, pos) = 1
        |       THEN 1 ELSE 0 END AS keep FROM fresh),
        |kept AS (SELECT doc_id, pos, para FROM w WHERE keep = 1
        |  UNION ALL SELECT doc_id, pos, para FROM k WHERE norm = ''),
        |r AS (SELECT doc_id, COUNT(*) AS n_kept,
        |  string_agg(para, chr(10) || chr(10) ORDER BY pos) AS clean
        |  FROM kept GROUP BY doc_id)
        |SELECT b.doc_id,
        |  CAST(len(string_split(b.text, chr(10) || chr(10))) AS BIGINT) AS n_paras,
        |  CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
        |  md5(COALESCE(r.clean, '')) AS clean_fp
        |FROM b LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin,

    // identical seeding as the Spark side, INDEPENDENT formulation: the
    // oracle marks duplicated 20-gram start positions, spreads coverage
    // per character with a 19-row trailing window max, counts span
    // starts via LAG, and reassembles kept characters with an ordered
    // string_agg — no interval merge, so it cross-checks the operator's
    // per-row span-fold surgery rather than restating it
    "text_span_dedup" ->
      """WITH corpus AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 6 = 0 THEN ' Exactly repeated boilerplate sentence planted for span removal.' ELSE '' END
        |  || CASE WHEN doc_id % 11 = 0 THEN ' Another verbatim duplicated fragment appearing across documents.' ELSE '' END AS text
        |  FROM documents),
        |p AS (SELECT doc_id, UNNEST(range(1, len(text) - 18)) AS pos, text
        |  FROM corpus WHERE len(text) >= 20),
        |g AS (SELECT doc_id, pos, substr(text, pos, 20) AS gram FROM p),
        |d AS (SELECT gram FROM (SELECT gram, COUNT(*) AS c FROM g GROUP BY 1) WHERE c > 1),
        |dp AS (SELECT g.doc_id, g.pos FROM g SEMI JOIN d USING (gram)),
        |ch AS (SELECT doc_id, UNNEST(range(1, len(text) + 1)) AS pos, text FROM corpus),
        |c2 AS (SELECT ch.doc_id, ch.pos, substr(ch.text, ch.pos, 1) AS ck,
        |  CASE WHEN dp.pos IS NULL THEN 0 ELSE 1 END AS f
        |  FROM ch LEFT JOIN dp ON ch.doc_id = dp.doc_id AND ch.pos = dp.pos),
        |w AS (SELECT doc_id, pos, ck,
        |  MAX(f) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS cov FROM c2),
        |w2 AS (SELECT doc_id, pos, ck, cov,
        |  CASE WHEN cov = 1 AND COALESCE(LAG(cov) OVER (PARTITION BY doc_id ORDER BY pos), 0) = 0
        |       THEN 1 ELSE 0 END AS st FROM w),
        |r AS (SELECT doc_id, SUM(st) AS n_spans, SUM(cov) AS n_removed,
        |  md5(COALESCE(string_agg(CASE WHEN cov = 0 THEN ck END, '' ORDER BY pos), '')) AS clean_fp
        |  FROM w2 GROUP BY doc_id)
        |SELECT c.doc_id, CAST(len(c.text) AS BIGINT) AS n_chars,
        |  CAST(COALESCE(r.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
        |  COALESCE(r.clean_fp, md5('')) AS clean_fp
        |FROM corpus c LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin,

    // the incremental form: the duplicate census spans the WHOLE corpus
    // (history grams participate through their counts — a batch gram
    // plus a history singleton is duplicated), but spans are marked and
    // cut only in the odd-id batch documents — the same independent
    // window/LAG formulation as text_span_dedup
    "text_span_dedup_incr" ->
      """WITH corpus AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 6 = 0 THEN ' Exactly repeated boilerplate sentence planted for span removal.' ELSE '' END
        |  || CASE WHEN doc_id % 11 = 0 THEN ' Another verbatim duplicated fragment appearing across documents.' ELSE '' END AS text
        |  FROM documents),
        |p AS (SELECT doc_id, UNNEST(range(1, len(text) - 18)) AS pos, text
        |  FROM corpus WHERE len(text) >= 20),
        |g AS (SELECT doc_id, pos, substr(text, pos, 20) AS gram FROM p),
        |d AS (SELECT gram FROM (SELECT gram, COUNT(*) AS c FROM g GROUP BY 1) WHERE c > 1),
        |dp AS (SELECT g.doc_id, g.pos FROM g SEMI JOIN d USING (gram) WHERE g.doc_id % 2 = 1),
        |ch AS (SELECT doc_id, UNNEST(range(1, len(text) + 1)) AS pos, text
        |  FROM corpus WHERE doc_id % 2 = 1),
        |c2 AS (SELECT ch.doc_id, ch.pos, substr(ch.text, ch.pos, 1) AS ck,
        |  CASE WHEN dp.pos IS NULL THEN 0 ELSE 1 END AS f
        |  FROM ch LEFT JOIN dp ON ch.doc_id = dp.doc_id AND ch.pos = dp.pos),
        |w AS (SELECT doc_id, pos, ck,
        |  MAX(f) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS cov FROM c2),
        |w2 AS (SELECT doc_id, pos, ck, cov,
        |  CASE WHEN cov = 1 AND COALESCE(LAG(cov) OVER (PARTITION BY doc_id ORDER BY pos), 0) = 0
        |       THEN 1 ELSE 0 END AS st FROM w),
        |r AS (SELECT doc_id, SUM(st) AS n_spans, SUM(cov) AS n_removed,
        |  md5(COALESCE(string_agg(CASE WHEN cov = 0 THEN ck END, '' ORDER BY pos), '')) AS clean_fp
        |  FROM w2 GROUP BY doc_id)
        |SELECT c.doc_id, CAST(len(c.text) AS BIGINT) AS n_chars,
        |  CAST(COALESCE(r.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
        |  COALESCE(r.clean_fp, md5('')) AS clean_fp
        |FROM corpus c LEFT JOIN r USING (doc_id)
        |WHERE c.doc_id % 2 = 1 ORDER BY doc_id""".stripMargin,

    // full cross-engine recomputation of the training recurrence — see
    // bpeStateChain for the '||'-encoding / replace-as-merge argument.
    // numMerges must match the query's (24 train / 12 encode).
    "text_bpe_train" -> bpeTrainOracle(24),
    "text_bpe_encode" -> bpeEncodeOracle(12),

    // ---- round-11 non-ASCII parity rows: the ASCII chains re-derived
    // over the unicode-seeded corpus (UniTail/UniBoiler/UniHeader/
    // UniFooter interpolated verbatim — the same Scala values the Spark
    // side lit()s, so the two engines see identical bytes) ----

    "text_span_dedup_unicode" ->
      s"""WITH corpus AS (SELECT doc_id, translate(text, 'aeiou', '$UniVowels')
        |  || CASE WHEN doc_id % 6 = 0 THEN '$UniBoiler' ELSE '' END
        |  || CASE WHEN doc_id % 7 = 0 THEN '$UniTail' ELSE '' END AS text
        |  FROM documents),
        |p AS (SELECT doc_id, UNNEST(range(1, len(text) - 18)) AS pos, text
        |  FROM corpus WHERE len(text) >= 20),
        |g AS (SELECT doc_id, pos, substr(text, pos, 20) AS gram FROM p),
        |d AS (SELECT gram FROM (SELECT gram, COUNT(*) AS c FROM g GROUP BY 1) WHERE c > 1),
        |dp AS (SELECT g.doc_id, g.pos FROM g SEMI JOIN d USING (gram)),
        |ch AS (SELECT doc_id, UNNEST(range(1, len(text) + 1)) AS pos, text FROM corpus),
        |c2 AS (SELECT ch.doc_id, ch.pos, substr(ch.text, ch.pos, 1) AS ck,
        |  CASE WHEN dp.pos IS NULL THEN 0 ELSE 1 END AS f
        |  FROM ch LEFT JOIN dp ON ch.doc_id = dp.doc_id AND ch.pos = dp.pos),
        |w AS (SELECT doc_id, pos, ck,
        |  MAX(f) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS cov FROM c2),
        |w2 AS (SELECT doc_id, pos, ck, cov,
        |  CASE WHEN cov = 1 AND COALESCE(LAG(cov) OVER (PARTITION BY doc_id ORDER BY pos), 0) = 0
        |       THEN 1 ELSE 0 END AS st FROM w),
        |r AS (SELECT doc_id, SUM(st) AS n_spans, SUM(cov) AS n_removed,
        |  md5(COALESCE(string_agg(CASE WHEN cov = 0 THEN ck END, '' ORDER BY pos), '')) AS clean_fp
        |  FROM w2 GROUP BY doc_id)
        |SELECT c.doc_id, CAST(len(c.text) AS BIGINT) AS n_chars,
        |  CAST(COALESCE(r.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
        |  COALESCE(r.clean_fp, md5('')) AS clean_fp
        |FROM corpus c LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin,

    "text_paragraph_dedup_unicode" ->
      s"""WITH corpus AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN '$UniHeader' || chr(10) || chr(10) ELSE '' END
        |  || translate(text, 'aeiou', '$UniVowels') ||
        |  CASE WHEN doc_id % 3 = 0 THEN chr(10) || chr(10) || '$UniFooter' ELSE '' END AS text
        |  FROM documents),
        |p AS (SELECT doc_id,
        |  UNNEST(string_split(text, chr(10) || chr(10))) AS para,
        |  UNNEST(range(len(string_split(text, chr(10) || chr(10))))) AS pos FROM corpus),
        |k AS (SELECT doc_id, pos, para,
        |  lower(trim(regexp_replace(para, '\\s+', ' ', 'g'))) AS norm FROM p),
        |w AS (SELECT doc_id, pos, para,
        |  CASE WHEN norm = '' THEN 1
        |       WHEN ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id, pos) = 1 THEN 1
        |       ELSE 0 END AS keep FROM k),
        |r AS (SELECT doc_id, COUNT(*) AS n_kept,
        |  string_agg(para, chr(10) || chr(10) ORDER BY pos) AS clean
        |  FROM w WHERE keep = 1 GROUP BY doc_id)
        |SELECT c.doc_id,
        |  CAST(len(string_split(c.text, chr(10) || chr(10))) AS BIGINT) AS n_paras,
        |  CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
        |  md5(COALESCE(r.clean, '')) AS clean_fp
        |FROM corpus c LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin,

    "text_winnow_unicode" ->
      s"""WITH d0 AS (SELECT doc_id, translate(text, 'aeiou', '$UniVowels')
        |  || CASE WHEN doc_id % 7 = 0 THEN '$UniTail' ELSE '' END AS text
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
        |  FROM d0),
        |g AS (SELECT doc_id, t, CAST(len(t) - 8 + 1 AS BIGINT) AS m,
        |    UNNEST(range(1, len(t) - 8 + 2)) AS p
        |  FROM d WHERE len(t) >= 8),
        |h AS (SELECT doc_id, m, CAST(p AS BIGINT) AS p,
        |    concat(substr(md5(substr(t, CAST(p AS INT), 8)), 1, 16),
        |      lpad(CAST(999999999999 - p AS VARCHAR), 12, '0')) AS key
        |  FROM g),
        |w AS (SELECT doc_id, m, p,
        |    MIN(key) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS wk
        |  FROM h),
        |sel AS (SELECT DISTINCT doc_id, wk FROM w
        |  WHERE p <= GREATEST(m - 6 + 1, 1))
        |SELECT doc_id,
        |  CAST(999999999999 - CAST(substr(wk, 17, 12) AS BIGINT) AS BIGINT) AS pos,
        |  substr(wk, 1, 16) AS fp
        |FROM sel ORDER BY doc_id, pos""".stripMargin,

    "text_bpe_encode_unicode" -> bpeEncodeOracle(12,
      textExpr = s"translate(text, 'aeiou', '$UniVowels')",
      wordRe = s"^[a-z0-9$UniVowels]+$$"),

    "dedup_exact_nfc" ->
      s"""WITH c AS (SELECT d.doc_id,
        |    b.text || (CASE WHEN d.doc_id % 2 = 0
        |               THEN '$NfcTail' ELSE '$NfdTail' END) AS text
        |  FROM documents d
        |  JOIN documents b ON b.doc_id = d.doc_id - (d.doc_id % 2))
        |SELECT md5(lower(trim(regexp_replace(nfc_normalize(text),
        |    '\\s+', ' ', 'g')))) AS fp,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt
        |FROM c GROUP BY 1 ORDER BY fp""".stripMargin,

    // Self-verifying contract (see the query): DuckDB rebuilds the twin
    // corpus from the same interpolated tail literals, recomputes the
    // nfc-equal and byte-equal pair counts independently, asserts the
    // norm_does_work inequality from its own counts, and expects the
    // coverage boolean the Spark side computed.
    "dedup_minhash_nfc" ->
      s"""WITH c AS (SELECT d.doc_id,
        |    b.text || (CASE WHEN d.doc_id % 2 = 0
        |               THEN '$NfcTail' ELSE '$NfdTail' END) AS text
        |  FROM documents d
        |  JOIN documents b ON b.doc_id = d.doc_id - (d.doc_id % 2)),
        |n AS (SELECT doc_id, nfc_normalize(text) AS nt, text FROM c),
        |tw AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    (a.text = b.text) AS byte_eq
        |  FROM n a JOIN n b ON a.nt = b.nt AND a.doc_id < b.doc_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_twins,
        |  CAST(COALESCE(SUM(CASE WHEN byte_eq THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_byte_eq,
        |  TRUE AS twins_covered,
        |  (COALESCE(SUM(CASE WHEN byte_eq THEN 1 ELSE 0 END), 0) < COUNT(*))
        |    AS norm_does_work
        |FROM tw""".stripMargin,

    "text_winnow_pairs_unicode" ->
      s"""WITH d0 AS (SELECT doc_id, translate(text, 'aeiou', '$UniVowels')
        |  || CASE WHEN doc_id % 7 = 0 THEN '$UniTail' ELSE '' END AS text
        |  FROM documents),
        |d AS (SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
        |  FROM d0),
        |g AS (SELECT doc_id, t, CAST(len(t) - 8 + 1 AS BIGINT) AS m,
        |    UNNEST(range(1, len(t) - 8 + 2)) AS p
        |  FROM d WHERE len(t) >= 8),
        |h AS (SELECT doc_id, m, CAST(p AS BIGINT) AS p,
        |    concat(substr(md5(substr(t, CAST(p AS INT), 8)), 1, 16),
        |      lpad(CAST(999999999999 - p AS VARCHAR), 12, '0')) AS key
        |  FROM g),
        |w AS (SELECT doc_id, m, p,
        |    MIN(key) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS wk
        |  FROM h),
        |f AS MATERIALIZED (SELECT DISTINCT doc_id, substr(wk, 1, 16) AS fp
        |  FROM w WHERE p <= GREATEST(m - 6 + 1, 1)),
        |n AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM f GROUP BY 1),
        |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    COUNT(*) AS shared_fps
        |  FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT id_a, id_b, shared_fps, na.n AS n_a, nb.n AS n_b,
        |  ROUND(shared_fps / LEAST(na.n, nb.n), 4) AS overlap
        |FROM pr JOIN n na ON pr.id_a = na.doc_id
        |  JOIN n nb ON pr.id_b = nb.doc_id
        |ORDER BY id_a, id_b""".stripMargin
  )
}
