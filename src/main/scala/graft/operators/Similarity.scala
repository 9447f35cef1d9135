package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{cosineSim, dotProduct}

/** Approximate similarity search — the 100 TB path for embedding
  * near-neighbor work (SURVEY.md §2.B north-star extensions).
  *
  * Random-hyperplane LSH: h_i(v) = sign(v · r_i) for deterministic
  * pseudo-random hyperplanes r_i. Vectors sharing the full sign bucket are
  * candidate neighbors; exact cosine verifies candidates. Collision
  * probability per plane is 1 - θ/π, so `planes` trades recall vs
  * candidate-set size. At scale the bucket join shuffles on the bucket key
  * only — no cross join ever materializes.
  */
object Similarity {

  /** Deterministic unit-free hyperplanes from a seeded PRNG (no data dep). */
  private def hyperplanes(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Column: LSH signature (bit-packed Long) of an embedding column. */
  def lshSignature(emb: Column, dim: Int, planes: Int, seed: Long): Column = {
    val hp = hyperplanes(dim, planes, seed)
    (0 until planes).map { i =>
      val plane = typedLit(hp(i).toSeq)
      when(dotProduct(emb, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Candidate near-dup pairs via LSH bucketing, verified by exact cosine.
    *
    * Input columns: `idCol` (numeric id), `embCol` (array<float|double>).
    * Output: (id_a, id_b, sim) with id_a < id_b and sim >= simThreshold,
    * restricted to pairs that collide in the LSH bucket (approximate).
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                      dim: Int, planes: Int, seed: Long,
                      simThreshold: Double): DataFrame = {
    val sig = df.select(
      col(idCol).as("id"), col(embCol).as("emb"),
      lshSignature(col(embCol), dim, planes, seed).as("bucket"))
    val a = sig.toDF("id_a", "emb_a", "bucket")
    val b = sig.toDF("id_b", "emb_b", "bucket_b")
    a.join(b, col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineSim(col("emb_a"), col("emb_b"))
          .cast(org.apache.spark.sql.types.DecimalType(9, 4)).as("sim"))
      .filter(col("sim") >= simThreshold)
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
