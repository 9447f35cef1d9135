package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-then-chunk step that turns a curated,
  * tokenized corpus into fixed-length training sequences (the GPT-style
  * data layout: document token streams concatenated in a deterministic
  * shuffled order, then chunked at `seqLen`; a document straddling a
  * chunk boundary SPLITS into fragments). This is the step between the
  * curation pipeline's shard shuffle and the trainer's data loader.
  *
  * The whole computation is a deterministic function of (ids, token
  * counts, seed), so it is DuckDB-oracle-checkable end to end, and it
  * needs no global sort at 100 TB:
  *
  *  1. order = [[Sampling.shardShuffle]] (256 md5 shards, dense in-shard
  *     positions — one hash exchange + per-shard window sort);
  *  2. intra-shard token offsets: one `sum().over(shard window)` cumsum
  *     — the same exchange, no extra shuffle;
  *  3. shard base offsets: a 256-row total relation prefix-summed under
  *     a single-partition window (256 rows — constant work regardless
  *     of corpus size) and broadcast-joined back;
  *  4. fragment expansion: a per-row `sequence()` explode bounded by
  *     ceil(n_tokens/seqLen)+1 fragments per document — no shuffle.
  *
  * Integer arithmetic stays in LongType throughout (floor division via
  * `(x - pmod(x, L)) / L`, exact in double because the quotient is an
  * integer well under 2^53 even at 10^13 tokens).
  */
object Packing {

  /** One row per (document, sequence) fragment, in the deterministic
    * `seed`-keyed training order:
    *
    *  - `shard`, `pos` — the [[Sampling.shardShuffle]] coordinates;
    *  - `seq_id`     — 0-based fixed-length sequence index;
    *  - `seq_off`    — where in the sequence this fragment starts;
    *  - `frag_start` — where in the DOCUMENT's token stream it starts;
    *  - `frag_len`   — fragment token count.
    *
    * Invariants (PackingSpec): fragments of a document are contiguous
    * and sum to its token count; every sequence except the last is
    * exactly `seqLen` tokens with fragments tiling [0, seqLen); the
    * assignment is partition-invariant. Zero-token documents produce no
    * fragments (nothing to train on; they still hold a (shard, pos)
    * slot upstream, which is fine — packing consumes token streams). */
  def packSequences(docs: DataFrame, idCol: String, nTokCol: String,
                    seqLen: Int, seed: String): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val L = lit(seqLen.toLong)
    val n = col(nTokCol).cast("long")
    val sharded = Sampling.shardShuffle(docs, idCol, seed)
      .select(col(idCol), col("shard"), col("pos"), n.as("__n"))
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
    val intra = sharded.withColumn("__cum", sum(col("__n")).over(w))
    // shard bases: 256 totals, exclusive-prefix-summed with a single-row
    // sorted fold (collect to ONE row, run the prefix sum as an array
    // HOF, explode back) instead of a global Window — the relation is
    // <= 256 rows, so the single aggregate is the same data movement the
    // Window's single partition was, minus the WindowExec
    // "moving all data to a single partition" warning that buried the
    // bench tail (round-11, VERDICT r10 next #5; the same restatement
    // as the winnow auto-cap quantile). Two rejected alternatives: a
    // constant partition key is folded away by the optimizer (warning
    // returns), and a theta self-join references the upstream pipeline
    // subtree a third time, which multiplies composed-chain plan TEXT
    // (Catalyst trees, not DAGs — explainString OOMed op_pipeline_pack).
    val bases = intra.groupBy(col("shard")).agg(sum(col("__n")).as("__t"))
      .agg(sort_array(collect_list(struct(col("shard"), col("__t")))).as("h"))
      .select(explode(aggregate(col("h"),
        struct(lit(0L).as("cum"),
          array().cast("array<struct<shard:string,base:bigint>>").as("out")),
        (acc, x) => struct(
          (acc("cum") + x("__t")).as("cum"),
          concat(acc("out"),
            array(struct(x("shard").as("shard"), acc("cum").as("base"))))
            .as("out")),
        acc => acc("out"))).as("e"))
      .select(col("e.shard").as("shard"), col("e.base").as("__base"))
    def fdiv(x: org.apache.spark.sql.Column) =
      ((x - pmod(x, L)) / L).cast("long")
    val g = intra.join(broadcast(bases), Seq("shard"))
      .withColumn("__s", col("__base") + col("__cum") - col("__n"))
      .filter(col("__n") > 0)
    g.withColumn("seq_id",
        explode(sequence(fdiv(col("__s")), fdiv(col("__s") + col("__n") - 1))))
      .withColumn("__fs", greatest(col("__s"), col("seq_id") * L))
      .select(col(idCol), col("shard"), col("pos"),
        col("seq_id"),
        (col("__fs") - col("seq_id") * L).as("seq_off"),
        (col("__fs") - col("__s")).as("frag_start"),
        (least(col("__s") + col("__n"), (col("seq_id") + 1) * L) - col("__fs"))
          .as("frag_len"))
  }
}
