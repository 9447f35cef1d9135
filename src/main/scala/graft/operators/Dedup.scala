package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{tokens, wordShingles}

/** Near-duplicate detection for text at scale (SURVEY.md §2.B north-star
  * extensions): MinHash+LSH banding and SimHash. Both avoid the O(n²) pair
  * join — candidates come from equality joins on banded hash buckets, which
  * shuffle on the bucket key only. All hashing is xxhash64 (codegen'd
  * built-in), fully deterministic across runs and cluster layouts.
  */
object Dedup {

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * min over the document's shingle set. Computed as one explode +
    * hash-groupBy — partial min aggregation happens map-side, so the
    * shuffle carries only (doc, k mins) per document. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, numHashes: Int): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(wordShingles(tokens(col(textCol)), shingleN)).as("sh"))
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("sh"))).as(s"h$i"))
    sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Candidate pairs from LSH banding: signatures agreeing on all rows of
    * any band collide. Estimated Jaccard = fraction of agreeing signature
    * positions. */
  def minHashCandidatePairs(sigs: DataFrame, bands: Int, rows: Int): DataFrame = {
    require(bands * rows <= 1024, "band layout too large")
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(lit(0), slice(col("sig"), b * rows + 1, lit(rows)).cast("string"), b.cast("string")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.toDF("id_a", "sig_a", "band", "bucket")
    val b = banded.toDF("id_b", "sig_b", "band_b", "bucket_b")
    a.join(b, col("band") === col("band_b") && col("bucket") === col("bucket_b") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / size(col("sig_a"))).as("est_jaccard"))
      .distinct()
  }

  /** MinHash+LSH near-dup pairs with estimated Jaccard above threshold. */
  def minHashNearDups(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 2, numHashes: Int = 32,
                      bands: Int = 8, estThreshold: Double = 0.3): DataFrame = {
    val sigs = minHashSignatures(df, idCol, textCol, shingleN, numHashes)
    minHashCandidatePairs(sigs, bands, numHashes / bands)
      .filter(col("est_jaccard") >= estThreshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** 64-bit SimHash of the token multiset: per bit, sum +1/-1 votes of the
    * token hashes (weighted by occurrence), take the sign. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitVotes = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    tok.groupBy(col("id")).agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("id"),
        (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, using
    * 4x16-bit block banding (pigeonhole: any pair within distance 3 agrees
    * on at least one block) — equality join on (block, value), no cross
    * join. */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3): DataFrame = {
    val sh = simHash(df, idCol, textCol)
    val blocked = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "block").withColumnRenamed("col", "bval")
    val a = blocked.toDF("id_a", "sh_a", "block", "bval")
    val b = blocked.toDF("id_b", "sh_b", "block_b", "bval_b")
    a.join(b, col("block") === col("block_b") && col("bval") === col("bval_b") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
