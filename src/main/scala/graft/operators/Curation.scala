package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level document curation: the cleaning passes that need to see
  * MORE than one document at a time (unlike the per-row Gopher/C4 rule
  * evaluations in graft.queries.Text, which are pure scans).
  *
  * The flagship here is boilerplate-line removal — the CCNet/RefinedWeb
  * step that strips navigation bars, cookie banners and copyright footers
  * by deleting every line whose normalized form appears in at least
  * `minDocs` distinct documents. It is the line-granularity sibling of
  * exact document dedup, and at 100 TB it is one of the highest-volume
  * passes in a web pipeline (most HTML-derived text is boilerplate).
  */
object Curation {

  /** Normalized line identity: whitespace-collapsed, lowercased, hashed.
    * Hashing early means the corpus-wide aggregation and joins ship a
    * 32-byte key, never line text. */
  private def lineKey(line: Column): Column =
    md5(lower(trim(regexp_replace(line, "\\s+", " "))))

  /** Remove every line that occurs (in normalized form) in at least
    * `minDocs` distinct documents; returns one row per input document
    * with `n_lines`, `n_kept` and the cleaned text (original line order,
    * original line bytes — normalization is only the *identity*, not the
    * output).
    *
    * Plan shape, stage by stage, and why it survives 100 TB:
    *  1. posexplode lines — map-side, row count = total lines.
    *  2. distinct (doc, key) pairs then hash-agg count per key — both
    *     shuffle on the 32-byte key; partial aggregation collapses each
    *     map task's repeats before the exchange, so the shuffle carries
    *     per-task-distinct pairs, not raw lines.
    *  3. left_anti join lines against the boilerplate keys (count >=
    *     minDocs). The boilerplate relation is the FILTERED aggregate —
    *     orders of magnitude smaller than the line table, but still
    *     data-dependent in size, so no broadcast hint: AQE promotes it to
    *     a broadcast anti-join at runtime when it fits, and the shuffle
    *     anti-join on the key is the correct fallback when a pathological
    *     corpus makes it large.
    *  4. re-assemble per document: collect_list of (pos, line) structs
    *     under a doc-keyed hash agg, array_sort, join with newline. The
    *     collected list is bounded by a single document's line count —
    *     the same per-row bound the document itself already imposes on
    *     every scan — so this is NOT an unbounded collect.
    *  5. left join back to the input ids so documents whose every line
    *     was boilerplate survive with empty text (n_kept = 0) instead of
    *     vanishing.
    *
    * Reference analog: none — the reference pipes text through engine SQL
    * untouched; this is part of the training-data north star surface. */
  def removeBoilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                             minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val id = col(idCol)
    val lines = docs
      .select(id, posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("lkey", lineKey(col("line")))
    val boiler = lines.select(id, col("lkey")).distinct()
      .groupBy(col("lkey")).agg(count(lit(1)).as("line_df"))
      .filter(col("line_df") >= minDocs)
      .select(col("lkey"))
    val kept = lines.join(boiler, Seq("lkey"), "left_anti")
      .groupBy(id)
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          e => e.getField("line")), "\n").as("clean_text"))
    docs.select(id, size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(kept, Seq(idCol), "left")
      .select(id, col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
