package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.cosineSim
import graft.operators.Similarity

/** Similarity search over the `embeddings` table (`embedding:
  * array<float>`) — SURVEY.md §2.B north-star extensions.
  *
  * The oracle-checked queries are the exact brute-force formulations
  * (cosine per DuckDB's list_cosine_similarity: sequential double fold, so
  * results are bit-identical across engines). The approximate scale path
  * (random-hyperplane LSH bucketing, graft.operators.Similarity) ships as a
  * rows-only query: at 100 TB the brute-force pairwise join is infeasible
  * and LSH bounds the candidate set per bucket.
  */
object Embeddings extends QueryPack {

  val queries: Map[String, QFn] = Map(
    // -- Q23: brute-force cosine top-k against one query vector. The
    //    1-row query side is broadcast — no shuffle of the big side; top-k
    //    is TakeOrderedAndProject (per-partition heaps, driver merges k).
    "q23_cosine_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      emb.crossJoin(broadcast(q))
        .select(col("vec_id"),
          // DECIMAL(9,4), not round(double): double rounding differs by
          // 1 ulp across engines; decimal cast is exact on both
          cosineSim(col("embedding"), col("qv")).cast(DecimalType(9, 4)).as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // -- embedding-cosine near-dup pairs above a threshold. Brute-force
    //    O(n²) pair join is the exactness baseline; the LSH query below is
    //    the same semantics at scale (candidates only).
    "dedup_embedding_cosine" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val a = emb.toDF("id_a", "emb_a", "lbl_a")
      val b = emb.toDF("id_b", "emb_b", "lbl_b")
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          cosineSim(col("emb_a"), col("emb_b")).cast(DecimalType(9, 4)).as("sim"))
        .filter(col("sim") >= 0.3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // -- ANN via random-hyperplane LSH: bucket join instead of cross join.
    //    Approximate (bucketing may miss neighbors) → rows-only check.
    "sim_ann_lsh" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
          dim = 64, planes = 8, seed = 42, simThreshold = 0.3)
        .orderBy(col("id_a"), col("id_b"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q23_cosine_topk" ->
      """SELECT vec_id,
        |  CAST(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS DECIMAL(9,4)) AS sim
        |FROM embeddings ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,

    "dedup_embedding_cosine" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS DECIMAL(9,4)) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE CAST(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS DECIMAL(9,4)) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin
  )
}
