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

    // -- REAL codec roundtrip (round-5: the JDK ships actual PNG/WAV
    //    codecs — javax.imageio / javax.sound.sampled — so the decode
    //    path no longer needs to be a stub for these formats). Each doc's
    //    text bytes are packed into a genuine grayscale PNG (one byte =
    //    one pixel, zero-padded to the ceil(sqrt) rectangle), then decoded
    //    back with ImageIO and feature-extracted. PNG is lossless, so
    //    DuckDB recomputes geometry + pixel sum straight from the source
    //    characters while Spark proves them through the real
    //    encode→decode roundtrip — a codec, geometry, or padding bug
    //    turns the hash red.
    "mm_img_png_roundtrip" -> ((s, dir) => {
      // spread (r14): the PNG codec passes are the whole cost and run
      // per row on an otherwise single-task small-file scan (measured on
      // the resize sibling: −0.8 s; graft.Storage.spread scaladoc)
      val bin = graft.Storage.spread(
        Tables(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        col("doc_id"))
      val png = Multimodal.packGrayPng(bin, "doc_id", "payload")
      Multimodal.decodeImageFeatures(png, "media_id", "png")
        .toDF().orderBy(col("media_id"))
    }),

    // -- REAL resize through the codec: PNG decode → nearest-neighbor
    //    resample to 8×8 (integer index math over the decoded raster,
    //    padding included) → PNG re-encode → decode again. Two full codec
    //    roundtrips; the oracle mirrors the NN index formula on the
    //    padded geometry.
    "mm_img_resize_png" -> ((s, dir) => {
      // spread (r14): two full PNG codec roundtrips per row — measured
      // −0.8 s at sf0.1 under the spread
      val bin = graft.Storage.spread(
        Tables(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        col("doc_id"))
      val png = Multimodal.packGrayPng(bin, "doc_id", "payload")
      val resized = Multimodal.resizePng(png, "media_id", "png", tw = 8, th = 8)
      Multimodal.decodeImageFeatures(resized, "media_id", "png")
        .toDF()
        .select(col("media_id"), col("width"), col("height"), col("pixel_sum"))
        .orderBy(col("media_id"))
    }),

    // -- REAL audio roundtrip: text bytes as 8-bit unsigned PCM samples
    //    in a genuine RIFF/WAV container (AudioSystem.write), parsed back
    //    with the JDK sound stack. 8-bit PCM is lossless → header fields
    //    and sample sum are oracle-exact.
    "mm_audio_wav" -> ((s, dir) => {
      val bin = Tables(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val wav = Multimodal.packWavPcm8(bin, "doc_id", "payload", sampleRate = 8000f)
      Multimodal.decodeAudioFeatures(wav, "media_id", "wav")
        .toDF().orderBy(col("media_id"))
    }),

    // -- MinHash+LSH near-dup candidates, SELF-VERIFYING (round-4: was
    //    rows-only; now the query emits its own oracle-checkable contract,
    //    so a banding/signature regression turns THIS row red).
    //    128 hashes / 32 bands of r=4 (round-3 tightening: estimator
    //    σ = sqrt(j(1-j)/k) halves twice vs 32 hashes).
    //    Contract columns:
    //      n_exact_high  — exact count of pairs with 2-shingle Jaccard
    //                      >= 0.8, recomputed independently by DuckDB;
    //      high_sim_covered — every such pair appears among the LSH
    //                      candidates (per-pair miss prob at j=0.8 is
    //                      1-(1-(1-0.8^4)^32) ≈ 5e-8 — deterministic here
    //                      because the hash seeds are fixed);
    //      nonempty      — the banding produced candidates at all.
    "dedup_minhash_lsh" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      // materialize both pair sets once: each feeds two contract arms
      // (count + except), and the exact side's O(n²) bitmap loop must not
      // run twice. localCheckpoint (not persist): the blocks are
      // ContextCleaner-managed — released when the frames are GC'd, so
      // repeated calls in a long session don't accumulate CacheManager
      // entries that only clearCache() reclaims.
      val cand = Dedup.minHashNearDups(docs, "doc_id", "text",
          shingleN = 2, numHashes = 128, bands = 32, estThreshold = 0.1)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint()
      val exactHigh = Dedup.jaccardPairs(docs, "doc_id", "text",
          shingleN = 2, threshold = 0.8)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint()
      exactHigh.agg(count(lit(1)).as("n_exact_high"))
        .crossJoin(exactHigh.except(cand).agg(count(lit(1)).as("n_missed")))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .select(col("n_exact_high"),
          (col("n_missed") === 0).as("high_sim_covered"),
          (col("n_cand") > 0).as("nonempty"))
    }),

    // -- INCREMENTAL MinHash dedup, SELF-VERIFYING: the daily-increment
    //    shape — dedup a new batch (doc_id % 3 == 0) against a previously
    //    materialized signature index of the historical corpus (the other
    //    docs) WITHOUT re-shingling the history. Parameters match
    //    dedup_minhash_lsh. Contract columns:
    //      n_exact_high  — exact count of CROSS (batch×corpus) pairs with
    //                      2-shingle Jaccard >= 0.8, recomputed
    //                      independently by DuckDB;
    //      high_sim_covered — every such pair appears among the
    //                      incremental candidates (same 1-(1-0.8^4)^32
    //                      per-band coverage argument as the full gate,
    //                      deterministic under fixed seeds);
    //      nonempty      — the cross banding produced candidates at all;
    //      sides_ok      — every emitted pair is batch-on-the-left,
    //                      corpus-on-the-right (no history×history or
    //                      batch×batch leakage).
    "dedup_minhash_incr" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 3 =!= 0)
      val batch = docs.filter(col("doc_id") % 3 === 0)
      // the "previously computed" index premise: signatures materialized
      // once (ContextCleaner-managed localCheckpoint, see dedup_minhash_lsh)
      val index = Dedup.minHashSignatures(corpus, "doc_id", "text",
          shingleN = 2, numHashes = 128)
        .localCheckpoint()
      val cand = Dedup.minHashNearDupsAgainst(batch, index, "doc_id", "text",
          shingleN = 2, numHashes = 128, bands = 32, estThreshold = 0.1)
        .select(col("batch_id"), col("corpus_id"))
        .localCheckpoint()
      val exactHigh = Dedup.jaccardPairs(docs, "doc_id", "text",
          shingleN = 2, threshold = 0.8)
        .filter((col("id_a") % 3 === 0) =!= (col("id_b") % 3 === 0))
        .select(
          when(col("id_a") % 3 === 0, col("id_a")).otherwise(col("id_b")).as("batch_id"),
          when(col("id_a") % 3 === 0, col("id_b")).otherwise(col("id_a")).as("corpus_id"))
        .localCheckpoint()
      exactHigh.agg(count(lit(1)).as("n_exact_high"))
        .crossJoin(exactHigh.except(cand).agg(count(lit(1)).as("n_missed")))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .crossJoin(cand.filter(col("batch_id") % 3 =!= 0 || col("corpus_id") % 3 === 0)
          .agg(count(lit(1)).as("n_wrong_side")))
        .select(col("n_exact_high"),
          (col("n_missed") === 0).as("high_sim_covered"),
          (col("n_cand") > 0).as("nonempty"),
          (col("n_wrong_side") === 0).as("sides_ok"))
    }),

    // -- SimHash near-dup pairs, SELF-VERIFYING (round-4: was rows-only).
    //    maxDist=3 with 4-block banding is exact by pigeonhole (round 1
    //    called maxDist=16 against 4 blocks and silently missed most
    //    pairs). Contract columns:
    //      n_docs        — corpus size, recomputed by DuckDB (anchors the
    //                      row to the real input);
    //      pairs_eq_exact — banded candidate set equals the brute-force
    //                      Hamming<=3 pair set EXACTLY, asserted by
    //                      symmetric except-counts (stronger than the
    //                      count equality dedup_simhash_check keeps);
    //      nonempty      — the banding produced pairs at all (the corpus
    //                      seeds near-dups, so an empty set is a bug).
    "dedup_simhash" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      // materialize both pair sets once — each feeds two contract arms
      // (ContextCleaner-managed localCheckpoint, see dedup_minhash_lsh)
      val banded = Dedup.simHashNearDups(docs, "doc_id", "text", maxDist = 3)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint()
      val sh = Dedup.simHash(docs, "doc_id", "text")
      // barrier keeps the XOR/popcount above the join, after the id
      // compare halves the pairs (see graft.functions.evalBarrier)
      val brute = sh.toDF("id_a", "sh_a")
        .join(sh.toDF("id_b", "sh_b"), col("id_a") < col("id_b"))
        .filter(graft.functions.evalBarrier(
          bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 3))
        .select(col("id_a"), col("id_b"))
        .localCheckpoint()
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(brute.except(banded).agg(count(lit(1)).as("n_missing")))
        .crossJoin(banded.except(brute).agg(count(lit(1)).as("n_extra")))
        .crossJoin(banded.agg(count(lit(1)).as("n_banded")))
        .select(col("n_docs"),
          (col("n_missing") === 0 && col("n_extra") === 0).as("pairs_eq_exact"),
          (col("n_banded") > 0).as("nonempty"))
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
      // barrier keeps the XOR/popcount above the join, after the id
      // compare halves the pairs (see graft.functions.evalBarrier)
      val brute = sh.toDF("id_a", "sh_a")
        .join(sh.toDF("id_b", "sh_b"), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
        .filter(graft.functions.evalBarrier(col("hamming") <= 3))
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

    // Self-verifying contract (see the query): DuckDB recomputes the exact
    // count of Jaccard>=0.8 shingle pairs independently and asserts the
    // coverage/nonempty booleans the Spark side computed.
    "dedup_minhash_lsh" ->
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
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_high,
        |  TRUE AS high_sim_covered, TRUE AS nonempty
        |FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.8""".stripMargin,

    // Self-verifying contract (see the query): DuckDB recomputes the exact
    // count of CROSS (batch×corpus under the %3 split) Jaccard>=0.8 pairs
    // independently and asserts the coverage/nonempty/sides booleans.
    "dedup_minhash_incr" ->
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
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_high,
        |  TRUE AS high_sim_covered, TRUE AS nonempty, TRUE AS sides_ok
        |FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.8
        |  AND ((id_a % 3 = 0) <> (id_b % 3 = 0))""".stripMargin,

    // Self-verifying contract (see the query): DuckDB anchors the corpus
    // size and asserts the exactness/nonempty booleans.
    "dedup_simhash" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  TRUE AS pairs_eq_exact, TRUE AS nonempty
        |FROM documents""".stripMargin,

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
        |  CAST(CASE WHEN n = 0 THEN 0 ELSE sb * 10000 // n END AS BIGINT) AS mean_intensity_e4
        |FROM s ORDER BY media_id""".stripMargin,

    // resize stub mirror: w/h from the decode geometry, nearest-neighbor
    // index (y*h//8)*w + (x*w//8), all integer division.
    // ASCII contract: this SQL indexes CHARACTERS (substr/ord) while the
    // Spark side resizes UTF-8 BYTES — equivalent only because the
    // synthetic documents corpus is pure ASCII (as is mm_decode_features'
    // oracle above). A non-ASCII corpus would not silently pass: byte
    // sums diverge and the hash check turns red; a byte-indexing oracle
    // needs blob subscripting DuckDB does not expose through this SQL
    // surface.
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

    // Real-codec roundtrip oracles (ASCII contract as mm_resize above:
    // the SQL indexes characters, the Spark side packs UTF-8 bytes —
    // equivalent on this pure-ASCII corpus, enforced by MultimodalSpec's
    // ASCII guard). PNG packing geometry: w = max(1, ceil(sqrt(n))),
    // h = max(1, ceil(n/w)) via integer ceil-div; zero padding beyond n.
    "mm_img_png_roundtrip" ->
      """WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |g AS (SELECT doc_id, text, n,
        |  CAST(greatest(1, ceil(sqrt(n))) AS BIGINT) AS w FROM b),
        |g2 AS (SELECT doc_id, text, n, w, greatest(1, (n + w - 1) // w) AS h FROM g)
        |SELECT doc_id AS media_id, TRUE AS decode_ok, 'png' AS format,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  -- COALESCE: list_sum of an empty list (n = 0, an empty document)
        |  -- is NULL in DuckDB while the Spark side packs a 1x1 zero PNG
        |  -- whose pixel_sum is 0 (the geometry columns already agree:
        |  -- greatest(1, ...) pins both sides to 1x1)
        |  CAST(COALESCE(list_sum(list_transform(range(1, n + 1),
        |    i -> ord(substr(text, CAST(i AS INT), 1)))), 0) AS BIGINT) AS pixel_sum
        |FROM g2 ORDER BY media_id""".stripMargin,

    // NN resize mirror on the PADDED packed geometry: source index for
    // output pixel k (8×8 row-major) is (k//8 * h // 8) * w + (k%8 * w // 8),
    // 0-based; indices past n-1 read zero padding.
    "mm_img_resize_png" ->
      """WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |g AS (SELECT doc_id, text, n,
        |  CAST(greatest(1, ceil(sqrt(n))) AS BIGINT) AS w FROM b),
        |g2 AS (SELECT doc_id, text, n, w, greatest(1, (n + w - 1) // w) AS h FROM g),
        |r AS (SELECT doc_id,
        |  list_sum(list_transform(range(0, 64),
        |    k -> CASE WHEN ((k // 8) * h // 8) * w + ((k % 8) * w // 8) < n
        |         THEN ord(substr(text,
        |           CAST(((k // 8) * h // 8) * w + ((k % 8) * w // 8) + 1 AS INT), 1))
        |         ELSE 0 END)) AS pixel_sum
        |  FROM g2)
        |SELECT doc_id AS media_id, CAST(8 AS INT) AS width,
        |  CAST(8 AS INT) AS height, CAST(pixel_sum AS BIGINT) AS pixel_sum
        |FROM r ORDER BY media_id""".stripMargin,

    // WAV 8-bit PCM: one byte per sample frame, mono, 8 kHz.
    "mm_audio_wav" ->
      """WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents)
        |SELECT doc_id AS media_id, TRUE AS decode_ok,
        |  CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(n AS BIGINT) AS n_frames,
        |  CAST(COALESCE(list_sum(list_transform(range(1, n + 1),
        |    i -> ord(substr(text, CAST(i AS INT), 1)))), 0) AS BIGINT) AS sample_sum
        |FROM b ORDER BY media_id""".stripMargin,

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
