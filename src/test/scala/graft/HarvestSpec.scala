package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Archive, Pmh}
import graft.sources.Pmh.{Header, Harvested}

/** S7 harvester + S4 archive-loader fixtures. */
class HarvestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pages(ps: Seq[Header]*): Pmh.PageSource = new Pmh.PageSource {
    def fetch(token: Option[String]) = {
      val i = token.map(_.toInt).getOrElse(0)
      (ps(i), if (i + 1 < ps.size) Some((i + 1).toString) else None)
    }
  }

  test("a page stops yielding at the first old header, pagination continues") {
    // page 1 has an old header mid-page; page 2 still gets harvested
    // (harvester.py:76-90 return-in-generator + :97-108 token loop)
    val src = pages(
      Seq(Header("a", "2024-05"), Header("b", "2024-01"), Header("c", "2024-06")),
      Seq(Header("d", "2024-07")))
    assert(Pmh.crawl(src, "2024-03").map(_.ident) == Seq("a", "d"))
  }

  test("everything is an update; empty feed and all-old pages are fine") {
    val src = pages(Seq(Header("a", "2024-05")))
    assert(Pmh.crawl(src, "2024-01") ==
      Seq(Harvested("update", "a", "2024-05")))
    assert(Pmh.crawl(pages(Seq.empty[Header]), "2024-01").isEmpty)
    assert(Pmh.crawl(src, "2025-01").isEmpty)
  }

  test("archive loader: path idents, short-body skip, cache-through, parse") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_arch_spec").toFile
    def write(rel: String, body: String): Unit = {
      val f = new java.io.File(dir, rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.writeString(f.toPath, body)
    }
    write("person/ab/one.json", """{"id": 1, "pad": "xxxxxxxxxxxxxxxxxxx"}""")
    write("person/ab/two.json", """{"id": 2, "pad": "xxxxxxxxxxxxxxxxxxx"}""")
    write("person/cd/three.json", "{}") // deleted: short body
    write("person/cd/notes.txt", "not json, ignored")
    write("group/ef/four.json", """{"id": 4, "pad": "xxxxxxxxxxxxxxxxxxx"}""")
    val schema = StructType(Seq(StructField("id", LongType)))
    val cached = Seq("person/ab/two.json").toDF("ident")
    val out = Archive.loadDir(spark, dir.getAbsolutePath, schema, Some(cached))
      .select($"ident", $"data.id").as[(String, Long)].collect().toMap
    assert(out == Map("person/ab/one.json" -> 1L, "group/ef/four.json" -> 4L))
  }

  test("harvested headers become a Dataset for the downstream stages") {
    val ds = Pmh.toDataset(spark, Seq(Harvested("update", "x", "2024-01")))
    assert(ds.count() == 1)
  }
}
