package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.operators.Dedup

/** Multimodal + hash-based near-dup queries. Binary payloads are derived
  * deterministically from documents.text (no media libs in this
  * environment) — the binary-column plumbing is what's under test.
  */
object MultimodalPack extends QueryPack {

  val queries: Map[String, QFn] = Map(
    // -- binary column stats: byte length + content digest (oracle-checked)
    "mm_binary_stats" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          sha2(col("payload"), 256).as("digest"))
        .orderBy(col("doc_id"))
    }),

    // -- stub decode + feature extraction (mapPartitions path). The stub
    //    is integer-exact, so the oracle recomputes it in SQL and the row
    //    is hash-checked (round 1 left it rows-only).
    "mm_decode_features" -> ((s, dir) => {
      val bin = Tables(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.extractFeatures(bin, "doc_id", "payload")
        .toDF().orderBy(col("media_id"))
    }),

    // -- frame sampling stub over binary payloads (oracle-checked chunk
    //    geometry)
    "mm_frame_sample" -> ((s, dir) => {
      val bin = Tables(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.sampleFrames(bin, "doc_id", "payload", frameBytes = 64, stride = 2)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          octet_length(col("frame")).cast("long").as("frame_bytes"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // -- resize stub: nearest-neighbor downsample to 8x8 over the stub
    //    geometry — pure integer index math, so the oracle recomputes the
    //    resized byte sum exactly (the blob itself stays Spark-side; its
    //    integer summary is what crosses the engine boundary).
    "mm_resize" -> ((s, dir) => {
      val bin = Tables(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.resize(bin, "doc_id", "payload", tw = 8, th = 8)
        .toDF().select(col("media_id"), col("width"), col("height"), col("byte_sum"))
        .orderBy(col("media_id"))
    }),

    // -- MinHash+LSH near-dup candidates (approximate; rows-only).
    //    128 hashes / 32 bands of r=4 (round-3 tightening: estimator
    //    σ = sqrt(j(1-j)/k) halves twice vs 32 hashes, letting the gate
    //    below drop from ±0.25 to ±0.15 with measured margin; banding
    //    selectivity per band is unchanged at r=4)
    "dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minHashNearDups(Tables(s, dir, "documents"), "doc_id", "text",
          shingleN = 2, numHashes = 128, bands = 32, estThreshold = 0.1)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- SimHash near-dup pairs. maxDist=3 with 4-block banding is exact
    //    by pigeonhole (round 1 called maxDist=16 against 4 blocks and
    //    silently missed most pairs); rows-only here, exactness asserted
    //    by dedup_simhash_check below.
    "dedup_simhash" -> ((s, dir) => {
      Dedup.simHashNearDups(Tables(s, dir, "documents"), "doc_id", "text", maxDist = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- MinHash estimator-quality gate (oracle-checked): for every pair
    //    the LSH emitted, the 128-hash jaccard estimate must sit within
    //    ±0.15 (≈3.4σ at j=0.5) of the exact jaccard (computed via the
    //    shingle sets); measured max |err| is 0.10 at sf0.1 (630 pairs).
    //    Parameters MATCH dedup_minhash_lsh above — the gate certifies the
    //    production configuration. DuckDB cannot reproduce xxhash64
    //    minhashing, but it can assert the contract; a broken estimator
    //    turns this row red.
    "dedup_minhash_check" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val mh = Dedup.minHashNearDups(docs, "doc_id", "text",
        shingleN = 2, numHashes = 128, bands = 32, estThreshold = 0.1)
      val sets = docs.select(col("doc_id"),
        graft.functions.wordShingles(graft.functions.tokens(col("text")), 2).as("sh"))
      val withExact = mh
        .join(sets.toDF("id_a", "sh_a"), "id_a")
        .join(sets.toDF("id_b", "sh_b"), "id_b")
        .select(col("est_jaccard"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("exact_j"))
      withExact.agg(
        count(lit(1)).as("n_pairs"),
        (count(lit(1)) > 0 &&
          max(abs(col("est_jaccard") - col("exact_j"))) <= 0.15).as("estimator_ok"))
        .select(col("estimator_ok"))
    }),

    // -- SimHash banding exactness gate (oracle-checked): banded pairs must
    //    equal brute-force Hamming<=maxDist pairs exactly — missing or
    //    extra pairs turn this row red instead of hiding behind no_oracle.
    "dedup_simhash_check" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val banded = Dedup.simHashNearDups(docs, "doc_id", "text", maxDist = 3)
      val sh = Dedup.simHash(docs, "doc_id", "text")
      val brute = sh.toDF("id_a", "sh_a")
        .join(sh.toDF("id_b", "sh_b"), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
      banded.agg(count(lit(1)).as("n_banded"))
        .crossJoin(brute.agg(count(lit(1)).as("n_brute")))
        .select((col("n_banded") === col("n_brute")).as("banding_exact"))
    })
  )

  val oracles: Map[String, String] = Map(
    "mm_binary_stats" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,

    // DuckDB cannot reproduce the xxhash64-based simhash, but it CAN assert
    // the banding-vs-brute-force equivalence contract computed Spark-side.
    "dedup_simhash_check" -> "SELECT TRUE AS banding_exact",

    "dedup_minhash_check" -> "SELECT TRUE AS estimator_ok",

    // The decode stub is integer-exact byte math over ASCII payloads, so
    // the oracle recomputes it: width=floor(sqrt(n)), height=n/width
    // (truncating), mean_e4 = sum(bytes)*10^4 / n (truncating).
    "mm_decode_features" ->
      """WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |s AS (SELECT doc_id, n,
        |  list_sum(list_transform(range(1, n + 1), i -> ord(substr(text, CAST(i AS INT), 1)))) AS sb
        |  FROM b)
        |SELECT doc_id AS media_id, CAST(n AS BIGINT) AS n_bytes,
        |  CAST(greatest(1, floor(sqrt(n))) AS INT) AS width,
        |  CAST(greatest(1, n // CAST(greatest(1, floor(sqrt(n))) AS INT)) AS INT) AS height,
        |  CAST(sb * 10000 // n AS BIGINT) AS mean_intensity_e4
        |FROM s ORDER BY media_id""".stripMargin,

    // resize stub mirror: w/h from the decode geometry, nearest-neighbor
    // index (y*h//8)*w + (x*w//8), all integer division
    "mm_resize" ->
      """WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |g AS (SELECT doc_id, text, n,
        |  CAST(greatest(1, floor(sqrt(n))) AS BIGINT) AS w,
        |  greatest(1, n // CAST(greatest(1, floor(sqrt(n))) AS BIGINT)) AS h
        |  FROM b),
        |r AS (SELECT doc_id,
        |  CASE WHEN n = 0 THEN 0 ELSE
        |    list_sum(list_transform(range(0, 64),
        |      k -> ord(substr(text, CAST(((k // 8) * h // 8) * w + ((k % 8) * w // 8) + 1 AS INT), 1))))
        |  END AS byte_sum
        |  FROM g)
        |SELECT doc_id AS media_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |  CAST(byte_sum AS BIGINT) AS byte_sum
        |FROM r ORDER BY media_id""".stripMargin,

    "mm_frame_sample" ->
      """WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
        |f AS (SELECT doc_id, n, CAST(ceil(n / 64.0) AS INT) AS nf FROM b),
        |idx AS (SELECT doc_id, n, UNNEST(range(nf)) AS i FROM f)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  CAST(least(64, n - i * 64) AS BIGINT) AS frame_bytes
        |FROM idx WHERE i % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
