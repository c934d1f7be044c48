package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** S5 — config source parity with the reference's config.example.yaml
  * shape (two-level map, quoted values, comments).
  */
class ConfigSpec extends AnyFunSuite with Matchers {

  private val sample =
    """# engine configuration
      |database:
      |  host: localhost   # inline comment
      |  port: 5432
      |  user: "gis"
      |  password: 'secret#notcomment'
      |strava:
      |  cookie: "key=value; other=1"
      |""".stripMargin

  test("parses sections, scalars, quotes, and comments") {
    val c = EngineConfig.parse(sample)
    c("database")("host") shouldBe "localhost"
    c("database")("port") shouldBe "5432"
    c("database")("user") shouldBe "gis"
    c.get("strava", "cookie") shouldBe Some("key=value; other=1")
    c.get("missing", "x") shouldBe None
  }

  test("quoted hash is not a comment") {
    EngineConfig.parse(sample)("database")("password") shouldBe "secret#notcomment"
  }

  test("loads the reference example config when present") {
    val p = "/root/reference/config.example.yaml"
    assume(new java.io.File(p).exists())
    val c = EngineConfig.load(p)
    c("database").keySet should contain("host")
  }
}
