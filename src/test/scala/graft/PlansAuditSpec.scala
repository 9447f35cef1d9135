package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Staleness tripwire for the committed plan-audit artifact (VERDICT_r05
  * next-round #3: PLANS.md silently went stale when dedup_jaccard_prefix
  * landed without a regeneration). No SparkSession needed — the contract
  * is purely "the artifact covers the current query surface".
  */
class PlansAuditSpec extends AnyFunSuite {

  private lazy val sections: Set[String] = {
    val path = Paths.get("PLANS.md")
    assert(Files.exists(path), "PLANS.md is missing — run `runMain graft.Plans`")
    Files.readString(path).linesIterator
      .filter(_.startsWith("## ")).map(_.drop(3).trim).toSet
  }

  test("PLANS.md has a section for every SparkEntry query") {
    val missing = SparkEntry.queries.keySet -- sections
    assert(missing.isEmpty,
      s"PLANS.md is stale — regenerate with `runMain graft.Plans`. Missing: ${missing.toSeq.sorted}")
  }

  test("PLANS.md has a section for every op_* operator bench") {
    val missing = Bench.operatorBenches.keySet -- sections
    assert(missing.isEmpty,
      s"PLANS.md is missing operator plans: ${missing.toSeq.sorted}")
  }

  test("committed plans/<round> evidence files are real plans, not error stubs") {
    // VERDICT r14 "what's wrong" #4: plans/r14/op_winnow_fps_after.txt was
    // committed as a "stopped SparkContext" error dump and cited as Change-1
    // evidence. A cited plan artifact must contain a physical plan; any
    // ERROR body (or a file with no plan at all) fails here.
    import scala.jdk.CollectionConverters._
    val root = Paths.get("plans")
    if (Files.isDirectory(root)) {
      val bad = Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".txt"))
        .filter { p =>
          val body = Files.readString(p)
          body.contains("ERROR:") || body.contains("stopped SparkContext") ||
            !body.contains("== Physical Plan ==")
        }.map(_.toString).toSeq.sorted
      assert(bad.isEmpty,
        s"plan evidence files are error stubs or contain no plan: $bad")
    }
  }

  test("PLANS.md has no leftover sections or failed explains") {
    val extra = sections -- SparkEntry.queries.keySet -- Bench.operatorBenches.keySet
    assert(extra.isEmpty, s"PLANS.md has stale sections: ${extra.toSeq.sorted}")
    val errors = Files.readString(Paths.get("PLANS.md")).linesIterator
      .filter(_.startsWith("ERROR:")).toSeq
    assert(errors.isEmpty, s"PLANS.md recorded failed explains: $errors")
  }
}
