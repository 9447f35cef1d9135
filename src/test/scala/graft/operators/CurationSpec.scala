package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("id", "text")
  }

  test("removeBoilerplateLines deletes lines shared by >= minDocs docs, keeps order and bytes") {
    val d = docs(
      (1L, "unique alpha\nCOPYRIGHT FOOTER\nunique beta"),
      (2L, "copyright   footer\nonly in two"),
      (3L, "Copyright Footer\nanother line\nonly in two"),
      (4L, "nothing shared here"))
    // "copyright footer" normalizes identically in 3 docs; "only in two"
    // appears in 2 → below the minDocs=3 bar, survives
    val out = Curation.removeBoilerplateLines(d, "id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((3L, 2L, "unique alpha\nunique beta")))
    assert(out(2L) == ((2L, 1L, "only in two")))
    assert(out(3L) == ((3L, 2L, "another line\nonly in two")))
    assert(out(4L) == ((1L, 1L, "nothing shared here")))
  }

  test("a document whose every line is boilerplate survives as empty, not missing") {
    val d = docs(
      (1L, "spam line"), (2L, "spam line"), (3L, "spam line"),
      (4L, "spam line\nreal content survives"))
    val out = Curation.removeBoilerplateLines(d, "id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "no document may vanish")
    assert(out(1L) == ((0L, "")) && out(2L) == ((0L, "")) && out(3L) == ((0L, "")))
    assert(out(4L) == ((1L, "real content survives")))
  }

  test("within-document repeats count once toward the document frequency") {
    // the repeated line lives in ONLY 2 documents (many times each):
    // distinct-pair counting must see df=2, below minDocs=3
    val d = docs(
      (1L, "dup\ndup\ndup"), (2L, "dup\ndup"), (3L, "clean"))
    val out = Curation.removeBoilerplateLines(d, "id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 3L && out(2L) == 2L,
      "df must count distinct documents, not line instances")
  }

  test("boilerplate decision keys on the normalized form but output keeps original bytes") {
    val d = docs(
      (1L, "  Mixed   Case Line  \nkeep me one"),
      (2L, "mixed case line\nkeep me two"),
      (3L, "MIXED CASE LINE\nkeep me three"))
    val out = Curation.removeBoilerplateLines(d, "id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "keep me one", 2L -> "keep me two",
      3L -> "keep me three"))
  }
}
