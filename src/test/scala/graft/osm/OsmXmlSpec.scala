package graft.osm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** S1 source contract against the reference's sample extract
  * (osm/example.osm: 6,223 nodes / 1,091 ways / 32 relations — README.md:13).
  * The sample is read in place from the read-only reference checkout.
  */
class OsmXmlSpec extends SparkSpec {

  private lazy val tables =
    OsmXml.parse(spark, TestSpark.ExampleOsm)

  private def haveSample = new java.io.File(TestSpark.ExampleOsm).exists()

  test("parses the full element counts of the sample extract") {
    assume(haveSample)
    tables.nodes.count() shouldBe 6223L
    tables.ways.count() shouldBe 1091L
    tables.relations.count() shouldBe 32L
  }

  test("node attributes and tags parse (typed lat/lon/ts, tag map)") {
    assume(haveSample)
    val tagged = tables.nodes.filter("size(tags) > 0")
    tagged.count() should be > 0L
    val r = tables.nodes.filter(col("id") === 20827733L).head()
    r.getAs[Double]("lat") shouldBe 34.14 +- 0.01
    r.getAs[Double]("lon") shouldBe -118.12 +- 0.01
    assert(r.getAs[java.sql.Timestamp]("ts") != null)
  }

  test("way nd refs stay ordered and resolve against nodes") {
    assume(haveSample)
    val way = tables.ways.filter("size(nds) >= 3").head()
    val nds = way.getAs[scala.collection.Seq[Long]]("nds")
    nds.distinct.size should be > 1
    // every nd of a random sample of ways resolves to a node in the extract
    val resolved = tables.ways.limit(50)
      .select(explode(col("nds")).as("nd"))
      .join(tables.nodes.select(col("id").as("nd")), Seq("nd"), "left_anti")
    resolved.count() shouldBe 0L
  }

  test("relations carry typed members with roles") {
    assume(haveSample)
    val withMembers = tables.relations.filter("size(members) > 0")
    withMembers.count() should be > 0L
    val restr = tables.relations
      .filter(element_at(col("tags"), "type") === "restriction")
    restr.count() should be > 0L
    val roles = restr.select(explode(col("members")).as("m"))
      .select(col("m.role")).distinct().collect().map(_.getString(0)).toSet
    roles should contain allOf ("from", "to")
  }

  test("multipolygon relations exist with outer members (sample contract)") {
    assume(haveSample)
    val mp = tables.relations
      .filter(element_at(col("tags"), "type") === "multipolygon")
    mp.count() should be > 0L
  }

  test("parses a directory of regional extracts in parallel (S1 sharding)") {
    val dir = java.nio.file.Files.createTempDirectory("osmshards")
    def shard(name: String, body: String): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        s"""<?xml version="1.0"?><osm version="0.6">$body</osm>""".getBytes)
    shard("region_a.osm",
      """<node id="1" lat="1.0" lon="2.0"/><way id="10"><nd ref="1"/></way>""")
    shard("region_b.osm",
      """<node id="2" lat="3.0" lon="4.0"/><relation id="20"><tag k="t" v="v"/></relation>""")
    val t = OsmXml.parse(spark, dir.toString)
    t.nodes.count() shouldBe 2L
    t.ways.count() shouldBe 1L
    t.relations.count() shouldBe 1L
  }

  test("parseElements handles a minimal synthetic document") {
    val xml =
      """<?xml version="1.0"?>
        |<osm version="0.6">
        | <node id="1" lat="1.5" lon="2.5" version="3" visible="true"
        |       timestamp="2020-01-02T03:04:05Z"><tag k="a" v="b"/></node>
        | <node id="2" lat="1.6" lon="2.6"/>
        | <way id="10"><nd ref="1"/><nd ref="2"/><nd ref="1"/>
        |   <tag k="highway" v="residential"/></way>
        | <relation id="20"><member type="way" ref="10" role="outer"/>
        |   <tag k="type" v="multipolygon"/></relation>
        |</osm>""".stripMargin
    val els = OsmXml.parseElements(xml).toVector
    els.count(_.kind == "node") shouldBe 2
    val n1 = els.find(e => e.kind == "node" && e.id == 1L).get
    n1.lat shouldBe 1.5
    n1.tags shouldBe Map("a" -> "b")
    n1.version shouldBe Some(3)
    val w = els.find(_.kind == "way").get
    w.nds shouldBe Seq(1L, 2L, 1L) // order + duplicates preserved
    val r = els.find(_.kind == "relation").get
    r.members shouldBe Seq(OsmMember("way", 10L, "outer"))
  }
}
