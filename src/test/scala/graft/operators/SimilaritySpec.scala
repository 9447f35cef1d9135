package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  /** Synthetic embeddings with planted near-duplicate pairs: id and
    * 1000+id share a vector with small noise → cosine ≈ 0.99. */
  private lazy val embs: DataFrame = {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(17)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val base = (0 until 50).map(i => i.toLong -> unit(Array.fill(32)(rng.nextGaussian())))
    val dups = base.take(15).map { case (id, v) =>
      (1000L + id) -> unit(v.map(_ + rng.nextGaussian() * 0.02))
    }
    (base ++ dups).map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
  }

  private def brutePairs(threshold: Double): Set[(Long, Long)] = {
    val rows = embs.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    (for {
      (ia, va) <- rows; (ib, vb) <- rows if ia < ib
      dot = va.zip(vb).map { case (x, y) => x * y }.sum
      if dot >= threshold
    } yield (ia, ib)).toSet
  }

  test("lshNearDupPairs: high recall and exact precision at a near-dup threshold") {
    val truth = brutePairs(0.9)
    assert(truth.size >= 15, "planted pairs must qualify")
    val got = Similarity.lshNearDupPairs(embs, "vec_id", "embedding",
        dim = 32, rowsPerBand = 8, bands = 12, seed = 42, simThreshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision 1.0 by construction (exact verify), recall from banding
    assert(got.subsetOf(truth))
    assert(got.size.toDouble / truth.size >= 0.9,
      s"recall ${got.size}/${truth.size}")
  }

  test("lshNearDupPairs is deterministic across runs (seeded hyperplanes)") {
    def run() = Similarity.lshNearDupPairs(embs, "vec_id", "embedding",
        dim = 32, rowsPerBand = 8, bands = 12, seed = 42, simThreshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run() == run())
  }

  test("topKForVector returns exact top-k by cosine") {
    val rows = embs.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val q = rows.find(_._1 == 0L).get._2
    val expect = rows.map { case (id, v) =>
      val dot = v.zip(q).map { case (x, y) => x * y }.sum
      (id, BigDecimal(dot).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toList
    val got = Similarity.topKForVector(embs, "vec_id", "embedding", q.toSeq, 5)
      .collect().map(_.getLong(0)).toList
    assert(got == expect)
  }
}
