package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import com.fasterxml.jackson.databind.ObjectMapper

import graft.queries.Registry

/** The driver keeps only the last 2000 chars of bench stdout and parses the
  * final line (round-2 and round-8 both lost the bench signal to this
  * window). Pin the guarantee against the LIVE register, in every regime —
  * all green, all failed, mixed — so adding queries can never silently
  * revive `parsed: null`.
  */
class BenchLineSpec extends AnyFunSuite with Matchers {

  private val names = Registry.all.map(_.name)
  private val mapper = new ObjectMapper()

  private def check(results: Seq[(String, Double, Double)]): Unit = {
    val line = Bench.finalLine(results, runs = 3, sfDir = "/root/testdata/sf0.1")
    withClue(s"line (${line.length} chars): ") {
      line.length should be <= 1900
    }
    val node = mapper.readTree(line) // throws on malformed JSON
    node.get("metric").asText() shouldBe "total"
    node.get("value").isNumber shouldBe true
  }

  test(s"all-green register (${names.size} queries) fits the 2000-char window") {
    names.size should be >= 150 // the register only grows
    check(names.map(n => (n, 123.456, 234.567)))
  }

  test("mass-failure regime (every query errored) fits the window") {
    check(names.map(n => (n, -1.0, -1.0)))
  }

  test("mixed regime (18 errors, round-8 shape) fits the window") {
    val res = names.zipWithIndex.map { case (n, i) =>
      if (i % 8 == 0) (n, -1.0, -1.0) else (n, 123.456, 234.567)
    }
    check(res)
  }

  test("errors array is capped at 8 names + a count") {
    val capped = Bench.cappedErrors((1 to 20).map(i => s"q${i}_long_query_name"))
    capped should include ("\"+12 more\"")
    mapper.readTree(capped).size() shouldBe 9
  }
}
