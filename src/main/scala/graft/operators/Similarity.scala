package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{cosineSim, dotProduct, hyperplaneBits, l2NormSq}

/** Approximate similarity search — the 100 TB path for embedding
  * near-neighbor work (SURVEY.md §2.B north-star extensions).
  *
  * Random-hyperplane LSH with MULTI-BAND candidate union (round 1 shipped a
  * single 8-plane band ≈ 2% recall at sim 0.3 — VERDICT.md "what's wrong"
  * #4). Collision probability per plane is 1 - θ/π; a band of r planes
  * collides with p^r, and b bands give recall 1 - (1 - p^r)^b. Candidates
  * are verified with the exact codegen'd cosine, so precision is always
  * 1.0 and recall is the only approximation.
  *
  * Parameter guidance: pruning is strong for genuinely-near duplicates
  * (sim >= 0.8: r=8..12 bands prune >99% of pairs at recall >0.95). At low
  * thresholds on isotropic data (e.g. 0.3 on the synthetic test
  * embeddings, where random pairs sit at θ ≈ 90° and qualifying pairs at
  * θ ≈ 72°) the collision gap is provably thin and ANY LSH keeps most
  * pairs as candidates — the operator still bounds the join to colliding
  * buckets, but the honest scale answer in that regime is the exact
  * brute-force (or an IVF partitioning on clustered real-world data).
  */
object Similarity {

  /** Per-band numeric bucket keys from packed hyperplane sign bits:
    * band i covers bits [i*r, (i+1)*r); key packs (band, bits) so a single
    * equality join covers all bands after an explode. */
  private def bandKeys(bits: Column, bands: Int, rowsPerBand: Int): Column = {
    require(rowsPerBand >= 1 && rowsPerBand <= 32, "rowsPerBand out of range")
    val mask = (1L << rowsPerBand) - 1
    array((0 until bands).map { b =>
      val lo = b * rowsPerBand
      val word = element_at(bits, lo / 64 + 1)
      // bands never straddle a word boundary when 64 % rowsPerBand == 0;
      // for other r the straddling bits are fetched from the next word
      val hi = (b + 1) * rowsPerBand - 1
      val v =
        if (lo / 64 == hi / 64) shiftright(word, lo % 64).bitwiseAND(mask)
        else {
          val nxt = element_at(bits, hi / 64 + 1)
          shiftright(word, lo % 64)
            .bitwiseAND((1L << (64 - lo % 64)) - 1)
            .bitwiseOR(shiftleft(nxt, 64 - lo % 64)).bitwiseAND(mask)
        }
      (lit(b.toLong) * lit(4294967296L)) + v // (band << 32) | bucket
    }: _*)
  }

  /** Candidate near-dup pairs via multi-band LSH, verified by exact cosine.
    *
    * Output: (id_a, id_b, sim DECIMAL(9,4)) with id_a < id_b and
    * sim >= simThreshold, restricted to pairs colliding in >= 1 band.
    * The banded join ships only (bucketKey, id); embeddings and norms are
    * joined back per deduped candidate for exact verification (identical
    * decimal semantics to the brute-force query, so LSH output ⊆ exact
    * output and recall is measurable with two counts).
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                      dim: Int, rowsPerBand: Int, bands: Int, seed: Long,
                      simThreshold: Double): DataFrame = {
    val numPlanes = rowsPerBand * bands
    val base = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      l2NormSq(col(embCol)).as("nsq"),
      hyperplaneBits(col(embCol), dim, numPlanes, seed).as("bits"))
    val banded = base.select(col("id"),
      explode(bandKeys(col("bits"), bands, rowsPerBand)).as("bucket"))
    val pairs = banded.toDF("id_a", "bucket")
      .join(banded.toDF("id_b", "bucket_b"),
        col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val sides = base.select(col("id"), col("emb"), col("nsq"))
    pairs
      .join(sides.toDF("id_a", "emb_a", "nsq_a"), "id_a")
      .join(sides.toDF("id_b", "emb_b", "nsq_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (dotProduct(col("emb_a"), col("emb_b")) /
          (sqrt(col("nsq_a")) * sqrt(col("nsq_b")))).as("sim_d"))
      .filter(col("sim_d") >= simThreshold - 1e-4)
      .select(col("id_a"), col("id_b"),
        col("sim_d").cast(DecimalType(9, 4)).as("sim_q"))
      .filter(col("sim_q") >= simThreshold)
      // decimal gates the threshold exactly; emit double (decimal→double is
      // exact, and decimal physical representations hash differently across
      // engines in the driver's canonicalization)
      .select(col("id_a"), col("id_b"), col("sim_q").cast("double").as("sim"))
  }

  /** Brute-force top-k neighbors for one query vector (exact baseline).
    * Query side is a 1-row broadcast; result is TakeOrderedAndProject. */
  def topKForVector(df: DataFrame, idCol: String, embCol: String,
                    queryVec: Seq[Double], k: Int): DataFrame = {
    val qv = typedLit(queryVec)
    df.select(col(idCol), round(cosineSim(col(embCol), qv), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
