package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private lazy val ids = {
    val sp = spark
    import sp.implicits._
    (0L until 10000L).toDF("id")
  }

  test("stableSample keeps ~fraction of rows and is invariant under repartitioning") {
    val n = Sampling.stableSample(ids, "id", 0.2).count()
    assert(math.abs(n - 2000.0) < 200, s"got $n of expected ~2000")
    val again = Sampling.stableSample(ids.repartition(13), "id", 0.2)
      .collect().map(_.getLong(0)).sorted.toSeq
    val first = Sampling.stableSample(ids, "id", 0.2)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(again == first, "sample must not depend on partitioning")
    // nested property: a 10% sample is a subset of the 20% sample
    val small = Sampling.stableSample(ids, "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(first.toSet), "smaller fraction must nest inside larger")
  }

  test("stableSplit is disjoint, exhaustive and close to the requested ratios") {
    val split = Sampling.stableSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L, "every row gets exactly one split")
    assert(math.abs(counts("train") - 8000.0) < 300, counts.toString)
    assert(math.abs(counts("val") - 1000.0) < 150, counts.toString)
    assert(math.abs(counts("test") - 1000.0) < 150, counts.toString)
    // boundary sanity: split decisions reproduce from the md5 prefix alone
    val manual = ids.select(col("id"),
      substring(md5(col("id").cast("string")), 1, 4).as("b"))
      .collect().map(r => r.getLong(0) ->
        (if (r.getString(1) < Sampling.boundary(0.8)) "train"
         else if (r.getString(1) < Sampling.boundary(0.9)) "val" else "test")).toMap
    val got = split.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == manual)
  }

  test("boundary encodes cumulative weights as 4-hex lexicographic cutoffs") {
    assert(Sampling.boundary(0.5) == "8000")
    assert(Sampling.boundary(0.8) == "cccc")
    // 1.0 boundary must sort after every 4-hex bucket so nothing is
    // excluded (the naive 5-char "10000" sorts before "2000")
    assert("ffff" < Sampling.boundary(1.0))
    // largest double below 1.0: ×0x10000 is an exact exponent shift (the
    // multiplier is a power of two), so the product stays below 65536 and
    // lands in the last bucket — the guard on the floored value keeps
    // this invariant explicit rather than relying on that exactness
    assert(Sampling.boundary(math.nextDown(1.0)) == "ffff")
    assert(Sampling.stableSample(ids, "id", 1.0).count() == 10000L)
    assert(Sampling.stableSample(ids, "id", 0.0).count() == 0L)
  }

  test("stableSplit rejects non-positive weights (sum check alone is not enough)") {
    intercept[IllegalArgumentException] {
      Sampling.stableSplit(ids, "id",
        Seq("train" -> -0.2, "val" -> 0.6, "test" -> 0.6))
    }
  }

  test("stableStratifiedSample: per-stratum rates, partition-invariant, other-strata-independent") {
    val sp = spark
    import sp.implicits._
    val rows = (0L until 6000L).map(i => (i, Seq("en", "de", "zh")(i.toInt % 3)))
      .toDF("id", "lang")
    val kept = Sampling.stableStratifiedSample(rows, "id", "lang",
      Map("en" -> 0.5, "zh" -> 1.0), defaultFraction = 0.25)
    val byLang = kept.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLang("en") - 1000.0) < 150, s"en ~50% of 2000: $byLang")
    assert(byLang("zh") == 2000L, s"zh fraction 1.0 keeps everything: $byLang")
    assert(math.abs(byLang("de") - 500.0) < 100, s"de default 25%: $byLang")

    // partition-invariant
    val a = kept.collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.stableStratifiedSample(rows.repartition(17), "id", "lang",
        Map("en" -> 0.5, "zh" -> 1.0), defaultFraction = 0.25)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)

    // one stratum's subset must not depend on what other strata contain:
    // drop every zh row from the input — the surviving en set is identical
    val enOnly = Sampling.stableStratifiedSample(
        rows.filter(col("lang") =!= "zh"), "id", "lang",
        Map("en" -> 0.5, "zh" -> 1.0), defaultFraction = 0.25)
      .filter(col("lang") === "en").collect().map(_.getLong(0)).toSet
    val enFull = kept.filter(col("lang") === "en")
      .collect().map(_.getLong(0)).toSet
    assert(enOnly == enFull, "en subset must be independent of zh rows")

    // strata draw INDEPENDENT buckets: the SAME id in two strata must not
    // share one keep/drop decision (an id-only hash would make the kept
    // sets identical at equal fractions)
    val dup = (0L until 2000L).flatMap(i => Seq((i, "en"), (i, "de")))
      .toDF("id", "lang")
    val dupKept = Sampling.stableStratifiedSample(dup, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.5))
    val enSet = dupKept.filter(col("lang") === "en").collect().map(_.getLong(0)).toSet
    val deSet = dupKept.filter(col("lang") === "de").collect().map(_.getLong(0)).toSet
    assert(enSet != deSet, "same ids in two strata must draw independent buckets")

    // NULL stratum drops (documented engine-portable three-valued filter)
    val withNull = Seq((1L, "en"), (2L, null.asInstanceOf[String]))
      .toDF("id", "lang")
    val keptNull = Sampling.stableStratifiedSample(withNull, "id", "lang",
      Map.empty[String, Double], defaultFraction = 1.0)
    assert(keptNull.collect().map(_.getLong(0)).toSeq == Seq(1L),
      "null stratum must drop, matching md5(stratum || ':' || id) SQL semantics")
  }

  test("quotaCap keeps exactly n rows per over-quota group, all of an under-quota one") {
    val sp = spark
    import sp.implicits._
    // skewed: group g0 has 5000 rows, g1 has 100, g2 has 3 (under quota)
    val rows = ((0L until 5000L).map((_, "g0")) ++
      (5000L until 5100L).map((_, "g1")) ++
      (5100L until 5103L).map((_, "g2"))).toDF("id", "grp")
    val capped = Sampling.quotaCap(rows, "id", "grp", 10)
    val counts = capped.groupBy(col("grp")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("g0" -> 10L, "g1" -> 10L, "g2" -> 3L), counts.toString)

    // deterministic under repartitioning: the md5-keyed draw is a function
    // of the row alone
    val again = Sampling.quotaCap(rows.repartition(17), "id", "grp", 10)
      .collect().map(_.getLong(0)).sorted.toSeq
    val first = capped.collect().map(_.getLong(0)).sorted.toSeq
    assert(again == first, "kept subset must not depend on partitioning")

    // stable draw, not first-N: the kept ids must not be the n smallest
    val g0 = capped.filter(col("grp") === "g0").collect().map(_.getLong(0)).toSet
    assert(g0 != (0L until 10L).toSet, "selection must be hash-keyed, not first-N")
  }

  test("quotaCap plans as partial+final WindowGroupLimit (map-side group cap before the shuffle)") {
    val sp = spark
    import sp.implicits._
    val rows = (0L until 1000L).map(i => (i, s"g${i % 7}")).toDF("id", "grp")
    val capped = Sampling.quotaCap(rows, "id", "grp", 5)
    val optimized = capped.queryExecution.optimizedPlan.toString
    assert(optimized.contains("WindowGroupLimit"),
      s"InferWindowGroupLimit did not fire — the rank filter would shuffle whole groups:\n$optimized")
    val physical = capped.queryExecution.executedPlan.toString
    val nodes = "WindowGroupLimit".r.findAllIn(physical).size
    assert(nodes >= 2,
      s"expected Partial AND Final WindowGroupLimitExec, found $nodes:\n$physical")
  }

  test("temperatureMix flattens skewed sources toward uniform and respects caps") {
    val sp = spark
    import sp.implicits._
    // 800 / 150 / 50: natural shares 80/15/5%
    val rows = (0L until 1000L).map { i =>
      (i, if (i < 800) "big" else if (i < 950) "mid" else "rare")
    }.toDF("id", "src")
    val mixed = Sampling.temperatureMix(rows, "id", "src", alpha = 0.5,
      targetTotal = 300)
    val counts = mixed.groupBy(col("src")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha=0.5 quotas: sqrt shares 28.3/12.2/7.1 of 47.6 → 178/77/45 —
    // rare goes from 5% of the corpus to ~15% of the draw
    assert(counts("big") > counts("mid") && counts("mid") > counts("rare"),
      s"order must still follow population: $counts")
    val rareShare = counts("rare").toDouble / counts.values.sum
    assert(rareShare > 0.10, s"alpha<1 must upsample the rare source: $counts")
    // quota never exceeds the population (sampling without replacement)
    val tiny = Sampling.temperatureMix(rows, "id", "src", alpha = 0.0,
      targetTotal = 900)
    val tinyCounts = tiny.groupBy(col("src")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tinyCounts("rare") == 50L,
      s"alpha=0 asks rare for 300 rows; it only has 50: $tinyCounts")
    // alpha=1 reproduces ~natural proportions
    val nat = Sampling.temperatureMix(rows, "id", "src", alpha = 1.0,
      targetTotal = 100)
    val natCounts = nat.groupBy(col("src")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(natCounts("big") == 80L && natCounts("mid") == 15L &&
      natCounts("rare") == 5L, natCounts.toString)
    // stable under repartitioning (md5-rank selection, same as quotaCap)
    val again = Sampling.temperatureMix(rows.repartition(13), "id", "src",
      alpha = 0.5, targetTotal = 300).collect().map(_.getLong(0)).sorted.toSeq
    assert(again == mixed.collect().map(_.getLong(0)).sorted.toSeq)
    // the literal max-quota pre-filter must install the partial+final
    // map-side group cap (a per-source column bound alone does NOT
    // qualify for InferWindowGroupLimit — measured, which is why the
    // operator stacks a literal bound under the exact trim)
    val physical = mixed.queryExecution.executedPlan.toString
    val nodes = "WindowGroupLimit".r.findAllIn(physical).size
    assert(nodes >= 2,
      s"expected partial AND final WindowGroupLimitExec, found $nodes:\n$physical")
  }

  test("quota attach routes: when-chain and broadcast-join return identical rows") {
    val sp = spark
    import sp.implicits._
    val rows = (0L until 3000L).map(i => (i, s"s${i % 23}")).toDF("id", "src")
    // temperatureMix: force the join route with chainMaxKeys = 0
    val chain = Sampling.temperatureMix(rows, "id", "src", 0.5, 500)
      .collect().map(_.getLong(0)).sorted.toSeq
    val joined = Sampling.temperatureMix(rows, "id", "src", 0.5, 500,
      chainMaxKeys = 0).collect().map(_.getLong(0)).sorted.toSeq
    assert(chain == joined, "temperatureMix join route must equal chain route")
    // the join route must broadcast the quota frame, not shuffle it
    val plan = Sampling.temperatureMix(rows, "id", "src", 0.5, 500,
      chainMaxKeys = 0).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"quota lookup must be a broadcast join:\n$plan")
    // stableStratifiedSample: same routing contract (incl. default fraction)
    val fr = (0 until 23).map(i => s"s$i" -> (if (i % 2 == 0) 0.5 else 0.1)).toMap
    val sChain = Sampling.stableStratifiedSample(rows, "id", "src", fr, 0.25)
      .collect().map(_.getLong(0)).sorted.toSeq
    val sJoin = Sampling.stableStratifiedSample(rows, "id", "src", fr, 0.25,
      chainMaxKeys = 0).collect().map(_.getLong(0)).sorted.toSeq
    assert(sChain == sJoin, "stratified-sample join route must equal chain route")
    // a stratum NOT in the map takes the default on both routes
    val partial = Sampling.stableStratifiedSample(rows, "id", "src",
      Map("s0" -> 0.0), 1.0, chainMaxKeys = 0)
    assert(partial.filter(col("src") === "s0").count() == 0L)
    assert(partial.filter(col("src") === "s1").count() ===
      rows.filter(col("src") === "s1").count())
  }

  test("temperatureMixRepeats emits exact per-source copy counts; downsample-only equals temperatureMix") {
    val sp = spark
    import sp.implicits._
    val rows = (0L until 1000L).map { i =>
      (i, if (i < 800) "big" else if (i < 950) "mid" else "rare")
    }.toDF("id", "src")
    // alpha=0 / target=3000: every source asked for 1000 rows — big is
    // upsampled 1000/800, mid 1000/150, rare 1000/50 = 20 copies each
    val up = Sampling.temperatureMixRepeats(rows, "id", "src", 0.0, 3000)
    val sums = up.groupBy(col("src")).agg(
        sum(col("n_copies")).as("s"), count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sums("rare") == (1000L, 50L), s"rare: 20 copies x 50 rows: $sums")
    assert(sums("mid") == (1000L, 150L), s"mid: base 6 + 100 extras: $sums")
    assert(sums("big") == (1000L, 800L), s"big: base 1 + 200 extras: $sums")
    // pure downsample: row set identical to temperatureMix, all n_copies=1
    val down = Sampling.temperatureMixRepeats(rows, "id", "src", 1.0, 100)
    assert(down.filter(col("n_copies") =!= 1L).count() == 0L)
    assert(down.select(col("id")).collect().map(_.getLong(0)).sorted.toSeq ==
      Sampling.temperatureMix(rows, "id", "src", 1.0, 100)
        .collect().map(_.getLong(0)).sorted.toSeq,
      "downsample-only repeats must select exactly temperatureMix's rows")
    // stable under repartitioning, and both routes agree
    val a = up.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    val b = Sampling.temperatureMixRepeats(rows.repartition(13), "id", "src",
        0.0, 3000, chainMaxKeys = 0)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(a == b, "copy plan must be partition-invariant and route-invariant")
    // NULL sources drop but still feed the normalizer (documented contract)
    val withNull = (0L until 100L).map(i =>
      (i, if (i % 2 == 0) "s" else null)).toDF("id", "src")
    assert(Sampling.temperatureMixRepeats(withNull, "id", "src", 1.0, 10)
      .filter(col("src").isNull).count() == 0L)
  }

  test("temperatureMixTokens draws each source's token budget in the stable order, exactly") {
    val sp = spark
    import sp.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // skewed sources with varied doc lengths; 'big' must be trimmed to
    // its token budget, 'tiny' is floor-1-protected and population-capped
    val docs = (1L to 400L).map(i => (i, "big", 5L + i % 9)) ++
      (1L to 40L).map(i => (i + 1000L, "mid", 3L + i % 5)) ++
      Seq((2000L, "tiny", 4L))
    val df = docs.toDF("doc_id", "lang", "n_tokens")
    val target = 600L
    val got = Sampling.temperatureMixTokens(df, "doc_id", "lang", "n_tokens",
        alpha = 0.5, targetTokens = target)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // naive reference: quotas from token totals, then a plain sorted
    // cumsum per source — the single-window form the two-phase sharded
    // prefix sum must reproduce exactly
    val totals = docs.groupBy(_._2).map { case (s, xs) => s -> xs.map(_._3).sum }
    val sumA = totals.values.map(math.pow(_, 0.5)).sum
    val quotas = totals.map { case (s, t) =>
      s -> math.min(t, math.max(1L, math.round(target * math.pow(t.toDouble, 0.5) / sumA)))
    }
    val expected = docs.groupBy(_._2).flatMap { case (src, xs) =>
      var before = 0L
      xs.sortBy { case (id, s, _) => (md5hex(s"$s:$id"), id) }.flatMap {
        case (id, s, n) =>
          val keep = before < quotas(src); before += n
          if (keep) Some((id, s, n)) else None
      }
    }.toSet
    assert(got === expected)
    // the budget boundary is document-granular: drawn tokens land in
    // [quota, quota + last-doc) for trimmed sources, == population for
    // capped ones
    // toSeq before summing: mapping a SET of rows to token counts would
    // collapse duplicate counts and undercount the draw
    val drawn = got.groupBy(_._2).map { case (s, xs) => s -> xs.toSeq.map(_._3).sum }
    assert(drawn("big") >= quotas("big") &&
      drawn("big") < quotas("big") + 14, s"big drew ${drawn("big")} vs ${quotas("big")}")
    assert(drawn("tiny") === 4L, "population-capped source keeps everything")
    assert(got.map(_._2).toSet === Set("big", "mid", "tiny"))
    // partition invariance (the two-phase prefix sum is order-free)
    val got13 = Sampling.temperatureMixTokens(df.repartition(13), "doc_id",
        "lang", "n_tokens", alpha = 0.5, targetTokens = target)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got13 === got)
    // quota-attach routes agree (when-chain vs broadcast join)
    val gotJoin = Sampling.temperatureMixTokens(df, "doc_id", "lang",
        "n_tokens", alpha = 0.5, targetTokens = target, chainMaxKeys = 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(gotJoin === got)
  }

  test("dsirSelect matches a naive reimplementation; target-like docs outrank; gumbel is the score+noise top-k") {
    val sp = spark
    import sp.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val B = 64
    // raw corpus: half "sports"-flavored (target-like), half "finance";
    // target set is pure sports vocabulary
    def sports(i: Long) = s"game score team win match goal play $i"
    def finance(i: Long) = s"stock bond yield market price rate fund $i"
    val raw = ((0L until 20L).map(i => i -> sports(i)) ++
      (100L until 120L).map(i => i -> finance(i))).toDF("doc_id", "text")
    val target = (0L until 10L).map(i => i -> s"team game win goal ${i + 500}")
      .toDF("doc_id", "text")

    // naive single-node recomputation
    def feats(t: String): Seq[String] = {
      val u = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      u ++ u.zip(u.drop(1)).map { case (a, b) => s"$a $b" }
    }
    def bucket(f: String): Int =
      (java.lang.Long.parseLong(md5hex(f).take(8), 16) % B).toInt
    val rawRows = raw.collect().map(r => r.getLong(0) -> r.getString(1))
    val tgtRows = target.collect().map(_.getString(1))
    val rc = new Array[Long](B); val tc = new Array[Long](B)
    rawRows.foreach(d => feats(d._2).foreach(f => rc(bucket(f)) += 1))
    tgtRows.foreach(t => feats(t).foreach(f => tc(bucket(f)) += 1))
    val (rt, tt) = (rc.sum.toDouble, tc.sum.toDouble)
    val rm = (0 until B).map(b => math.round((math.log((tc(b) + 1.0) / (tt + B)) -
      math.log((rc(b) + 1.0) / (rt + B))) * 1e6))
    val naiveScores = rawRows.map { case (id, t) =>
      id -> feats(t).map(f => rm(bucket(f))).sum }.toMap
    val naiveTop = naiveScores.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(15).toMap

    val got = Sampling.dsirSelect(raw, "doc_id", "text", target, "text",
        numBuckets = B, targetCount = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naiveTop, s"got $got\nexpect $naiveTop")
    // semantics: the draw is dominated by the target-like half
    assert(got.keySet.count(_ < 100L) >= 12,
      s"sports docs must dominate the selection: ${got.keySet}")
    // partition invariance
    val repart = Sampling.dsirSelect(raw.repartition(7), "doc_id", "text",
        target.repartition(3), "text", numBuckets = B, targetCount = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(repart == got)

    // gumbel: key = score + seeded noise, selection = top-k on the key,
    // deterministic, and every key's noise component matches the naive
    // seeded-md5 Gumbel in micros
    val g1 = Sampling.dsirSelect(raw, "doc_id", "text", target, "text",
        numBuckets = B, targetCount = 15, mode = "gumbel", seed = "s1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def gumbelMicro(seed: String, id: Long): Long = {
      val u = (java.lang.Long.parseLong(
        md5hex(s"$seed:$id").take(12), 16) + 0.5) / math.pow(16.0, 12)
      BigDecimal(-math.log(-math.log(u)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    g1.foreach { case (id, s, k) =>
      assert(s == naiveScores(id), s"doc $id score $s != naive ${naiveScores(id)}")
      assert(k == s + gumbelMicro("s1", id), s"doc $id noise key mismatch")
    }
    val naiveG1 = naiveScores.toSeq
      .map { case (id, s) => (id, s + gumbelMicro("s1", id)) }
      .sortBy { case (id, k) => (-k, id) }.take(15).map(_._1).toSet
    assert(g1.map(_._1).toSet == naiveG1)
    // a different seed draws a different set (same scores)
    val g2 = Sampling.dsirSelect(raw, "doc_id", "text", target, "text",
        numBuckets = B, targetCount = 15, mode = "gumbel", seed = "s2")
      .collect().map(_.getLong(0)).toSet
    assert(g2 != g1.map(_._1).toSet, "different seeds should draw different sets")
  }

  test("shardShuffle is a stable permutation: 256 shards, dense positions, seed-dependent") {
    val sp = spark
    import sp.implicits._
    val rows = (0L until 5000L).toDF("id")
    val shuffled = Sampling.shardShuffle(rows, "id", "ep0")
    val collected = shuffled.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(collected.length == 5000, "permutation keeps every row")
    // every (shard, pos) is unique and positions are dense per shard
    val byShard = collected.groupBy(_._2)
    byShard.foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq,
        s"positions in shard $shard must be dense 1..n")
    }
    assert(byShard.keys.forall(s => s.length == 2 && s.matches("[0-9a-f]{2}")))
    // stable under repartitioning
    val again = Sampling.shardShuffle(rows.repartition(11), "id", "ep0")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(again == collected.toSet, "order must not depend on partitioning")
    // a different seed gives a different permutation (new epoch)
    val ep1 = Sampling.shardShuffle(rows, "id", "ep1")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(ep1 != collected.toSet, "seed must drive the permutation")
    // no global sort in the plan: ordering work is per-shard under the
    // window, so the physical plan must not contain a range exchange
    val physical = shuffled.queryExecution.executedPlan.toString
    assert(!physical.contains("rangepartitioning"),
      s"shardShuffle must not global-sort:\n$physical")
  }
}
