package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps README.md's capability matrix in lockstep with the query
  * surface — the InventorySpec pattern applied to user-facing docs: a
  * query added (or a SURVEY row edited) without regenerating the README
  * turns the suite red with the regeneration command in the message. */
class CapabilityMatrixSpec extends AnyFunSuite {

  private def read(p: String): String = {
    val src = scala.io.Source.fromFile(p, "UTF-8")
    try src.mkString finally src.close()
  }

  test("README capability matrix equals a fresh render from SURVEY.md") {
    val readme = read("README.md")
    assert(readme.contains(CapabilityMatrix.Begin) &&
      readme.contains(CapabilityMatrix.End),
      "README.md has no capability-matrix section — run " +
        "`sbt \"runMain graft.CapabilityMatrix\"`")
    val current = readme.substring(
      readme.indexOf(CapabilityMatrix.Begin),
      readme.indexOf(CapabilityMatrix.End) + CapabilityMatrix.End.length)
    val fresh = CapabilityMatrix.render(read("SURVEY.md"))
    assert(current == fresh,
      "README capability matrix is stale — run " +
        "`sbt \"runMain graft.CapabilityMatrix\"` and commit the result")
  }

  test("every query key has a real matrix row with a check level") {
    val fresh = CapabilityMatrix.render(read("SURVEY.md"))
    val placeholder = SparkEntry.queries.keys.toSeq.sorted
      .filter(k => fresh.contains(s"| `$k` | (see SURVEY.md)"))
    assert(placeholder.isEmpty,
      s"queries with no parsable SURVEY §2.2.1 row: ${placeholder.mkString(", ")}")
  }
}
