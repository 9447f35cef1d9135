package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{bitAndCount, bitmapFromInts, minhashSig, simhash64, tokens, wordShingles}

/** Near-duplicate detection for text at scale (SURVEY.md §2.B north-star
  * extensions): MinHash+LSH banding, SimHash block banding, and exact
  * Jaccard via dictionary bitmaps.
  *
  * Round-2 shape (VERDICT.md round-1 fixes):
  *  - signatures/sketches are per-row custom expressions
  *    (graft.functions.SketchExpressions) — zero shuffle to compute them;
  *    round 1 paid an explode→groupBy shuffle per signature;
  *  - candidate joins carry only (bucket, id) — signatures are joined back
  *    once per surviving candidate, never shipped through the n²-prone
  *    shuffle;
  *  - band buckets are numeric xxhash64 values, not stringified arrays;
  *  - SimHash banding derives the block count from maxDist (pigeonhole:
  *    d+1 blocks guarantee recall for Hamming <= d) instead of silently
  *    under-banding.
  */
object Dedup {

  /** MinHash signatures, one row pass, no shuffle. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, numHashes: Int): DataFrame =
    df.select(col(idCol).as("id"),
        minhashSig(wordShingles(tokens(col(textCol)), shingleN), numHashes).as("sig"))
      .filter(col("sig").isNotNull)

  /** Candidate pairs from LSH banding: signatures agreeing on all rows of
    * any band collide. The banded join ships (bucketKey, id) only; the
    * estimated Jaccard (fraction of agreeing signature positions) is
    * computed after pair dedup by joining signatures back per side. */
  def minHashCandidatePairs(sigs: DataFrame, bands: Int, rows: Int): DataFrame = {
    // one numeric key per band: xxhash64(band, sig[band*rows+1..+rows])
    val bucketKeys = array((0 until bands).map { b =>
      xxhash64(lit(b) +: (1 to rows).map(r => element_at(col("sig"), b * rows + r)): _*)
    }: _*)
    val banded = sigs.select(col("id"), explode(bucketKeys).as("bucket"))
    val pairs = banded.toDF("id_a", "bucket")
      .join(banded.toDF("id_b", "bucket_b"),
        col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    pairs
      .join(sigs.toDF("id_a", "sig_a"), "id_a")
      .join(sigs.toDF("id_b", "sig_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / size(col("sig_a"))).as("est_jaccard"))
  }

  /** MinHash+LSH near-dup pairs with estimated Jaccard above threshold. */
  def minHashNearDups(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 2, numHashes: Int = 32,
                      bands: Int = 8, estThreshold: Double = 0.3): DataFrame = {
    require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
    val sigs = minHashSignatures(df, idCol, textCol, shingleN, numHashes)
    minHashCandidatePairs(sigs, bands, numHashes / bands)
      .filter(col("est_jaccard") >= estThreshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** 64-bit SimHash per document — one row pass, no shuffle. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), simhash64(tokens(col(textCol))).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** SimHash near-dup pairs with Hamming distance <= maxDist.
    *
    * Banding is EXACT by the pigeonhole principle: the 64 bits are split
    * into `maxDist + 1` blocks, so any pair within Hamming maxDist agrees
    * on at least one whole block — the equality join on (block, value)
    * has no false negatives, and the final bit_count filter removes false
    * positives. (Round 1 hardcoded 4 blocks but was invoked with
    * maxDist=16, silently missing most qualifying pairs.) Block values are
    * wide (>= 64/(d+1) bits), so bucket collisions stay rare for small d;
    * large d degrades toward all-pairs and callers should use MinHash
    * instead. */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist < 16, s"maxDist=$maxDist out of range (0..15)")
    val blocks = maxDist + 1
    val bits = 64 / blocks // last block gets the remainder
    val sh = simHash(df, idCol, textCol)
    val blockVals = array((0 until blocks).map { i =>
      val width = if (i == blocks - 1) 64 - i * bits else bits
      val mask = if (width >= 64) -1L else (1L << width) - 1
      // key packs (block index, block bits) into one long: block values are
      // < 2^(width) and width <= 60 for blocks >= 2... use struct instead
      struct(lit(i).as("blk"), shiftright(col("simhash"), i * bits).bitwiseAND(mask).as("v"))
    }: _*)
    val blocked = sh.select(col("id"), col("simhash"), explode(blockVals).as("bk"))
    val pairs = blocked.toDF("id_a", "sh_a", "bk")
      .join(blocked.toDF("id_b", "sh_b", "bk_b"),
        col("bk") === col("bk_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .distinct()
    pairs.filter(col("hamming") <= maxDist)
  }

  /** Exact Jaccard similarity pairs via dense-dictionary bitmaps.
    *
    * When the shingle dictionary fits comfortably in a bitmap (vocab
    * `V` up to a few hundred thousand → bitmap of V/8 bytes per doc), set
    * intersection for a candidate pair is popcount(AND) — a codegen'd
    * primitive loop (BitAndCountExpr), thousands of times cheaper than the
    * round-1 inverted-index self-join, whose hot-shingle groups exploded
    * to sum(df²) ≈ 73M rows at sf0.1. Exactly the same result set as
    * brute-force Jaccard, so the DuckDB oracle stays the plain formulation.
    *
    * Scale story (100 TB): this path is chosen when the dictionary is
    * small (the engine measures V first — one scalar count, not a
    * collect); with an unbounded vocabulary the inverted-index +
    * MinHash-LSH path applies instead. A global dictionary also shards
    * naturally (hash-partition shingles → per-shard dense ids + per-shard
    * bitmap segments) — not needed at test scale.
    */
  def jaccardBitmapPairs(df: DataFrame, idCol: String, textCol: String,
                         shingleN: Int, threshold: Double): DataFrame = {
    val spark = df.sparkSession
    val sh = df.select(col(idCol).as("id"),
        explode(wordShingles(tokens(col(textCol)), shingleN)).as("sh"))
    // dense ids: rank within the distinct-shingle dictionary (deterministic)
    val dict = sh.select(col("sh")).distinct()
      .select(col("sh"),
        (row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("sh"))) - 1).as("shid"))
    val v = dict.count().toInt // one scalar action to size the bitmap
    // persist: the self-join below references docSets on both sides, and
    // without it the whole shingle->dict->bitmap pipeline runs once per
    // reference (at cluster scale this table — n rows x V/8 bytes — is
    // the natural build-side cache of the operator)
    val docSets = sh.join(broadcast(dict), "sh")
      .groupBy(col("id"))
      .agg(collect_set(col("shid")).as("ids"))
      .select(col("id"), size(col("ids")).as("sz"),
        bitmapFromInts(col("ids"), v).as("bm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the broadcast-nested-loop stream side must be spread across cores:
    // docSets comes out of a (small, AQE-coalesced) aggregation, often a
    // single partition — which would serialize the O(n²) pair loop
    val par = spark.sparkContext.defaultParallelism
    val a = docSets.toDF("id_a", "sz_a", "bm_a").repartition(par)
    val b = docSets.toDF("id_b", "sz_b", "bm_b")
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bitAndCount(col("bm_a"), col("bm_b")).as("inter"),
        col("sz_a"), col("sz_b"))
      // any pair whose ROUNDED jaccard can reach t has true j >= t - 5e-5;
      // prefilter at t' = t - 1e-4 (slack for the rounding) — cheap integer
      // compare before the double division, removes ~all of the n² pairs
      .filter(col("inter").cast("double") * (1.0 + (threshold - 1e-4)) >=
        (col("sz_a") + col("sz_b")).cast("double") * (threshold - 1e-4))
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
