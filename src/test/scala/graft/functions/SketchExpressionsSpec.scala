package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchExpressionsSpec extends SparkSpec {

  test("wordShingles: distinct n-grams, first-occurrence order, short inputs empty") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      "a b c a b",  // "a b","b c","c a","a b"(dup)
      "one",        // shorter than n → empty
      "",           // tokens() drops empties → empty
      "x  y\tz"     // multi-whitespace
    ).toDF("text")
    val got = df.select(wordShingles(tokens(col("text")), 2).as("sh"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(
      List("a b", "b c", "c a"),
      Nil, Nil,
      List("x y", "y z")))
  }

  test("minhashSig: k elements; signature of a superset is <= elementwise; containment") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      Seq("a", "b", "c"),
      Seq("a", "b", "c", "d", "e")
    ).toDF("toks")
    val sigs = df.select(minhashSig(col("toks"), 16).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs.forall(_.length == 16))
    // min over a superset can only be <= the subset's min, per position
    sigs(0).zip(sigs(1)).foreach { case (sub, sup) => assert(sup <= sub) }
  }

  test("minhashSig: empty array -> null; deterministic across evaluations") {
    val sp = spark
    import sp.implicits._
    val r = Seq(Seq.empty[String]).toDF("toks")
      .select(minhashSig(col("toks"), 8)).head()
    assert(r.isNullAt(0))
    val twice = (1 to 2).map { _ =>
      Seq(Seq("x", "y")).toDF("toks")
        .select(minhashSig(col("toks"), 8)).head().getSeq[Long](0)
    }
    assert(twice(0) == twice(1))
  }

  test("minhash estimates jaccard within tolerance on a known pair") {
    val sp = spark
    import sp.implicits._
    // |A∩B|=50, |A∪B|=100 → J=0.5; 256 hashes → σ≈0.03
    val shared = (1 to 50).map(i => s"s$i")
    val a = shared ++ (1 to 50).map(i => s"a$i")
    val b = shared ++ (1 to 50).map(i => s"b$i")
    val sigs = Seq(a, b).toDF("toks")
      .select(minhashSig(col("toks"), 256).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - 0.5) < 0.12, s"est=$est")
  }

  test("simhash64: identical token multisets collide; small edits stay near") {
    val sp = spark
    import sp.implicits._
    val base = (1 to 40).map(i => s"w$i")
    val edited = base.updated(3, "CHANGED").updated(17, "ALSO")
    val unrelated = (1 to 40).map(i => s"z$i")
    val hs = Seq(base, base, edited, unrelated).toDF("toks")
      .select(simhash64(col("toks")).as("h"))
      .collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(2)) < ham(hs(0), hs(3)),
      s"edit ham=${ham(hs(0), hs(2))} unrelated ham=${ham(hs(0), hs(3))}")
  }

  test("bitmap round-trip: popcount(AND) equals exact set intersection size") {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(11)
    val nBits = 1000
    val sets = (1 to 20).map(_ => (1 to 80).map(_ => rng.nextInt(nBits)).distinct.toList)
    val bms = sets.toDF("ids")
      .select(bitmapFromInts(col("ids"), nBits).as("bm"))
      .collect().map(_.getSeq[Long](0))
    for (i <- sets.indices; j <- sets.indices if i < j) {
      val expect = sets(i).toSet.intersect(sets(j).toSet).size
      val dfCount = Seq((bms(i), bms(j))).toDF("a", "b")
        .select(bitAndCount(col("a"), col("b"))).head().getLong(0)
      assert(dfCount == expect, s"pair ($i,$j)")
    }
  }

  test("hyperplaneBits: deterministic; equal vectors collide on all planes") {
    val sp = spark
    import sp.implicits._
    val v = List.fill(16)(scala.util.Random.nextDouble())
    val rows = Seq(v, v, v.map(-_)).toDF("emb")
      .select(hyperplaneBits(col("emb"), 16, 64, seed = 5).as("bits"))
      .collect().map(_.getSeq[Long](0))
    assert(rows(0) == rows(1))
    // the negated vector flips every sign bit
    assert(rows(0).zip(rows(2)).forall { case (a, b) => (a ^ b) == -1L })
  }

  test("minhashSig/simhash64 declare nullable (empty input -> null survives the optimizer)") {
    import graft.functions.{MinHashSigExpr, SimHash64Expr}
    import org.apache.spark.sql.catalyst.expressions.Literal
    // the expressions return null for empty arrays even over a
    // non-nullable child — inheriting child.nullable would let the
    // optimizer remove isNotNull filters and unbox nulls in codegen
    val nonNullableChild = Literal.create(Seq.empty[String],
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false))
    assert(!nonNullableChild.nullable)
    assert(MinHashSigExpr(nonNullableChild, 8).nullable)
    assert(SimHash64Expr(nonNullableChild).nullable)
    // and the empty-array filter downstream actually keeps working
    val sp = spark
    import sp.implicits._
    val sigs = Seq("", "a b c").toDF("text")
      .select(minhashSig(wordShingles(tokens(col("text")), 2), 8).as("sig"))
      .filter(col("sig").isNotNull)
    assert(sigs.count() == 1)
  }

  test("null array elements hash as empty strings instead of crashing") {
    val sp = spark
    import sp.implicits._
    val df = Seq(Seq[String]("a", null, "b")).toDF("toks")
    // none of these should NPE; the null element behaves as ""
    val sig = df.select(minhashSig(col("toks"), 4)).head().getSeq[Long](0)
    val sigRef = Seq(Seq[String]("a", "", "b")).toDF("toks")
      .select(minhashSig(col("toks"), 4)).head().getSeq[Long](0)
    assert(sig == sigRef)
    val sh = df.select(wordShingles(col("toks"), 2)).head().getSeq[String](0)
    assert(sh == Seq("a ", " b"))
    df.select(simhash64(col("toks"))).head().getLong(0) // must not throw
  }

  test("bitmap_from_ints drops out-of-int-range longs instead of wrapping them") {
    val sp = spark
    import sp.implicits._
    // 2^32+5 wrapped to 5 under the old int-narrowing and set a spurious bit
    val bm = Seq(Seq(1L, (1L << 32) + 5L)).toDF("ids")
      .select(bitmapFromInts(col("ids"), 64).as("bm"),
        bitmapFromInts(typedLit(Seq(5L)), 64).as("probe"))
      .select(bitAndCount(col("bm"), col("probe")).as("overlap"),
        bitAndCount(col("bm"), col("bm")).as("card"))
      .head()
    assert(bm.getLong(0) == 0L, "wrapped id must not set bit 5")
    assert(bm.getLong(1) == 1L, "only the in-range id is set")
  }

  test("sorted_intersect_count equals exact set intersection on random sorted arrays") {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(17)
    // mixed-length tokens so the two-pointer compare crosses length
    // boundaries; includes empty strings and shared prefixes
    def randSet() = (1 to rng.nextInt(60))
      .map(_ => "tok" + rng.nextInt(40) + ("x" * rng.nextInt(3)))
      .distinct.sorted.toList
    val sets = (1 to 15).map(_ => randSet()) :+ List.empty[String] :+ List("", "a")
    for (i <- sets.indices; j <- sets.indices if i <= j) {
      val expect = sets(i).toSet.intersect(sets(j).toSet).size.toLong
      val got = Seq((sets(i), sets(j))).toDF("a", "b")
        .select(sortedIntersectCount(col("a"), col("b"))).head().getLong(0)
      assert(got == expect, s"pair ($i,$j): ${sets(i)} ∩ ${sets(j)}")
    }
  }
}
