package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * the MOSS local fingerprinting algorithm): hash every character
  * k-gram of the normalized text, slide a window of `w` consecutive
  * gram hashes, and select each window's minimum (rightmost position on
  * ties). The selected (position, hash) set is the document's
  * fingerprint: ~2/(w+1) of the grams, with the GUARANTEE that any
  * shared substring of length ≥ w + k − 1 between two documents yields
  * at least one shared fingerprint — the local-selection property that
  * makes fingerprints joinable for partial-overlap detection (the
  * between-documents complement of [[Dedup.removeRepeatedSpans]]'
  * within-corpus span surgery).
  *
  * Determinism and cross-engine exactness: the gram hash is the first
  * 16 hex chars of md5 (identical in any engine), and the window
  * minimum is taken over the STRING `hash ‖ lpad(10¹² − pos)` — its
  * lexicographic order is (hash ASC, pos DESC), which encodes the
  * paper's rightmost-tie rule with no engine-specific arg-min
  * semantics. This is plain winnowing (each window selects
  * independently), not the paper's stateful "robust" variant — same
  * guarantee, same density, order-free and hence relational.
  *
  * 100 TB shape: gram expansion is a per-row HOF over a ONCE-BOUND
  * normalized string (the lambda-binding discipline — an unbound
  * reference re-evaluates the normalization per gram); the window
  * min runs per document (doc-bounded partitions, the reassembly-agg
  * argument); output is ~2/(w+1) of corpus chars, each row 16 B + id +
  * pos. No corpus-wide shuffle beyond the per-doc window exchange. */
object Winnow {

  /** One row per selected fingerprint: (id, pos, fp) with `pos` the
    * 1-based gram offset in the normalized text and `fp` the 16-hex-char
    * gram hash. Documents shorter than k grams-wise are absent; documents
    * with fewer than `w` grams contribute their single global minimum
    * (the whole text is one window). */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    val normed = docs
      .select(col(idCol),
        lower(trim(regexp_replace(col(textCol), "\\s+", " "))).as("__t"))
      .filter(length(col("__t")) >= k)
      .withColumn("__m", (length(col("__t")) - k + 1).cast("long"))
    val grams = normed
      .select(col(idCol), col("__m"), explode(transform(
        sequence(lit(1), col("__m").cast("int")),
        p => struct(p.cast("long").as("p"),
          substr(col("__t"), p, lit(k)).as("g")))).as("e"))
      .select(col(idCol), col("__m"), col("e.p").as("p"),
        concat(substring(md5(col("e.g")), 1, 16),
          lpad((lit(999999999999L) - col("e.p")).cast("string"), 12, "0"))
          .as("key"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("p"))
      .rowsBetween(0, w - 1)
    grams
      .withColumn("__wk", min(col("key")).over(win))
      .filter(col("p") <= greatest(col("__m") - w + 1, lit(1L)))
      .select(col(idCol),
        (lit(999999999999L) - substring(col("__wk"), 17, 12).cast("long"))
          .as("pos"),
        substring(col("__wk"), 1, 16).as("fp"))
      .distinct()
  }
}
