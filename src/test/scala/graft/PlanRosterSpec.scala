package graft

import org.scalatest.funsuite.AnyFunSuite

/** PLANS.md roster lint (VERDICT r16 item 6): every registered query
  * must have a committed plan section, and no section may go stale.
  * This makes the "regenerate PLANS.md" step mechanical — a query
  * registered after the last `sbt "runMain graft.PlanDump"` fails the
  * build here until the dump is regenerated, so plan dumps can no
  * longer lag the registry round over round. Pure file parse — no
  * Spark session. */
class PlanRosterSpec extends AnyFunSuite {

  test("PLANS.md has a section for every registered query and no " +
       "stale sections") {
    val path = java.nio.file.Paths.get("PLANS.md")
    assert(java.nio.file.Files.isRegularFile(path),
      "PLANS.md missing — run `sbt \"runMain graft.PlanDump\"`")
    val sections = java.nio.file.Files.readString(path).linesIterator
      .filter(_.startsWith("## "))
      .map(_.stripPrefix("## ").split(" — ", 2)(0).trim)
      .toSet
    val registered = SparkEntry.queries.keySet + "entry"
    val missing = (registered -- sections).toSeq.sorted
    assert(missing.isEmpty,
      s"registered queries with no PLANS.md section: $missing — " +
      "regenerate with `sbt \"runMain graft.PlanDump\"`")
    val stale = (sections -- registered).toSeq.sorted
    assert(stale.isEmpty,
      s"PLANS.md sections for unregistered queries: $stale — " +
      "regenerate with `sbt \"runMain graft.PlanDump\"`")
  }
}
