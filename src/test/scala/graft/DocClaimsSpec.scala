package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/**
 * Lint for verification claims in main-source documentation. The repo's
 * discipline is "every claim has an oracle or a pinned plan" — round 5
 * shipped scaladoc citing a verify query and a plan spec that did not
 * exist, so this spec makes the claims machine-checked: every `q_*`
 * query name and every `*Spec` suite name mentioned anywhere in main
 * source must name a real artifact.
 */
class DocClaimsSpec extends AnyFunSuite {

  private def scalaFiles(dir: File): Seq[File] = {
    val entries = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    entries.filter(_.isDirectory).flatMap(scalaFiles) ++
      entries.filter(f => f.isFile && f.getName.endsWith(".scala"))
  }

  private lazy val mainText: Seq[(String, String)] =
    scalaFiles(new File("src/main/scala")).map(f =>
      f.getPath -> new String(Files.readAllBytes(f.toPath), "UTF-8"))

  test("every q_* name mentioned in main source is a real SparkEntry query") {
    val known = SparkEntry.queries.keySet
    val pattern = "\\bq_[a-z0-9_]+".r
    val unknown = for {
      (path, text) <- mainText
      name <- pattern.findAllIn(text).toSeq.distinct
      if !known.contains(name)
    } yield s"$path mentions '$name'"
    assert(unknown.isEmpty,
      s"main source cites nonexistent verify queries:\n${unknown.mkString("\n")}")
  }

  test("every *Spec suite named in main source exists under src/test") {
    val suites = scalaFiles(new File("src/test/scala"))
      .map(_.getName.stripSuffix(".scala")).toSet
    val pattern = "\\b[A-Z][A-Za-z0-9]*Spec\\b".r
    val unknown = for {
      (path, text) <- mainText
      name <- pattern.findAllIn(text).toSeq.distinct
      if !suites.contains(name)
    } yield s"$path mentions '$name'"
    assert(unknown.isEmpty,
      s"main source cites nonexistent test suites:\n${unknown.mkString("\n")}")
  }

  test("every oracleSql entry has a queries entry and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${(o -- q).mkString(", ")}")
    // queries without an oracle get only the weaker rows-only check —
    // keep the exception list explicit so new queries can't skip silently
    val oracleFree = q -- o
    assert(oracleFree.isEmpty,
      s"queries without a DuckDB oracle: ${oracleFree.mkString(", ")}")
  }
}
