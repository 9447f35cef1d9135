package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {

  private lazy val vecs = {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(11)
    ((0 until 40).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian()))) :+
      (99L, Seq.fill(16)(0.0))) // zero vector must not NaN
      .toDF("id", "v")
  }

  test("int8 round trip: codes bounded, error bounded by scale/2") {
    val out = vecs
      .withColumn("scale", Quantize.int8Scale(col("v")))
      .withColumn("codes", Quantize.quantizeInt8(col("v"), col("scale")))
      .withColumn("deq", Quantize.dequantizeInt8(col("codes"), col("scale")))
      .select(col("id"), col("scale"),
        array_max(transform(col("codes"), c => abs(c))).as("max_code"),
        array_max(zip_with(col("v"), col("deq"), (a, b) => abs(a - b))).as("max_err"))
      .collect()
    assert(out.length == 41)
    out.foreach { r =>
      val scale = r.getDouble(1)
      assert(r.getByte(2) <= 127, s"code out of range for id ${r.getLong(0)}")
      assert(r.getDouble(3) <= scale / 2 + 1e-12,
        s"reconstruction error ${r.getDouble(3)} exceeds scale/2 ${scale / 2}")
    }
  }

  test("zero vector quantizes to all-zero codes with zero error") {
    val r = vecs.filter(col("id") === 99)
      .withColumn("scale", Quantize.int8Scale(col("v")))
      .withColumn("codes", Quantize.quantizeInt8(col("v"), col("scale")))
      .select(array_max(transform(col("codes"), c => abs(c))).as("mc"))
      .head()
    assert(r.getByte(0) == 0)
  }

  // ---- product quantization

  private lazy val embDf = {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(7)
    (0 until 300).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("pqEncode picks the L2-nearest codebook entry per subspace") {
    import graft.functions.pqEncode
    val sp = spark
    import sp.implicits._
    // hand-built 2-subspace codebook (dsub=2, ksub=2): entries far apart
    val books: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)),
      Seq(Seq(-5.0, 0.0), Seq(5.0, 0.0)))
    val got = Seq(
      (1L, Seq(0.4, -0.3, 4.0, 1.0)),   // near (0,0) then near (5,0)
      (2L, Seq(9.0, 11.0, -4.9, 0.1)),  // near (10,10) then near (-5,0)
      (3L, Seq(5.0, 5.0, 0.0, 0.0)))    // exact ties on BOTH subspaces -> lower j
      .toDF("id", "v")
      .select(col("id"), pqEncode(col("v"), books).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(got(1L) == Seq(0, 1))
    assert(got(2L) == Seq(1, 0))
    assert(got(3L) == Seq(0, 0), "ties must break to the lower code")
    // short vector -> null, not garbage
    val short = Seq((9L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
      .select(pqEncode(col("v"), books).as("codes")).head()
    assert(short.isNullAt(0))
  }

  test("ADC score equals the exact dot product for exactly-reconstructible vectors") {
    import graft.functions.{pqAdc, pqEncode}
    val sp = spark
    import sp.implicits._
    val books: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(1.0, 2.0), Seq(-1.0, 0.5)),
      Seq(Seq(0.0, 3.0), Seq(2.0, -2.0)))
    val query = Seq(0.5, -1.5, 2.0, 1.0)
    val lut = Quantize.adcLut(query, books)
    // vectors that ARE codebook reconstructions: ADC is exact on them
    val recon = Seq(
      (0L, books(0)(0) ++ books(1)(1)),
      (1L, books(0)(1) ++ books(1)(0)))
    val got = recon.toDF("id", "v")
      .select(col("id"),
        pqAdc(pqEncode(col("v"), books), lut, ksub = 2).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    recon.foreach { case (id, v) =>
      val exact = v.zip(query).map { case (a, b) => a * b }.sum
      assert(math.abs(got(id) - exact) < 1e-12,
        s"ADC ${got(id)} != exact $exact for id $id")
    }
  }

  test("PQ training is deterministic and the search equals brute force with a full shortlist") {
    val b1 = Quantize.trainPqCodebooks(embDf, "vec_id", "embedding",
      dim = 16, m = 4, ksub = 8, lloydIters = 2, seed = 42)
    val b2 = Quantize.trainPqCodebooks(embDf, "vec_id", "embedding",
      dim = 16, m = 4, ksub = 8, lloydIters = 2, seed = 42)
    assert(b1 == b2, "same data + seed must give identical codebooks")
    assert(b1.length == 4 && b1.forall(_.length == 8) &&
      b1.forall(_.forall(_.length == 4)))

    val query = embDf.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    // shortlist = corpus: the exact re-rank sees everything, so the
    // result must EQUAL the brute-force top-k regardless of ADC quality
    val pq = Quantize.pqTopKForVector(embDf, "vec_id", "embedding",
        query, k = 5, b1, shortlist = 300)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity.topKForVector(embDf, "vec_id", "embedding",
        query, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pq == brute, s"full-shortlist PQ $pq != brute $brute")

    // the ADC shortlist is a real ranking, not a constant: a modest
    // shortlist must still recover most of the true top-5
    val pqShort = Quantize.pqTopKForVector(embDf, "vec_id", "embedding",
        query, k = 5, b1, shortlist = 60)
      .collect().map(_.getLong(0)).toSet
    val overlap = pqShort.intersect(brute.map(_._1).toSet).size
    assert(overlap >= 3, s"shortlist-60 recall $overlap/5 too low")

    // IVF x PQ composite collapse: probing ALL cells makes the cell
    // filter a no-op, so the composite must EQUAL plain PQ search with
    // the same shortlist — the two approximation layers compose without
    // interference
    val cents = Similarity.trainIvfCentroids(embDf, "vec_id", "embedding",
      k = 4, lloydIters = 2, seed = 7)
    val ivfpqAll = Quantize.ivfPqTopKForVector(embDf, "vec_id", "embedding",
        query, k = 5, cents, nprobe = 4, b1, shortlist = 300)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivfpqAll == brute,
      s"all-cells composite $ivfpqAll != brute $brute")
    // pruned probe keeps the contract meaningful: results only from
    // probed cells, sims still the exact decimal cosine
    val ivfpq1 = Quantize.ivfPqTopKForVector(embDf, "vec_id", "embedding",
        query, k = 5, cents, nprobe = 1, b1, shortlist = 300)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val bruteMap = Similarity.topKForVector(embDf, "vec_id", "embedding",
        query, k = 300).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivfpq1.foreach { case (id, sim) =>
      assert(math.abs(bruteMap(id) - sim) < 1e-9,
        s"composite sim for $id is not the exact cosine")
    }
  }
}
