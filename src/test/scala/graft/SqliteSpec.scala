package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sqlite

/** S5 WOF loader: the self-contained sqlite page reader/writer
  * (`wof/fetcher.py:34-57` keeps WOF in a geojson(id, body) sqlite). */
class SqliteSpec extends AnyFunSuite {

  private def roundtrip(rows: Seq[Seq[Any]]): Seq[Seq[Any]] = {
    val f = java.io.File.createTempFile("graft_sqlite", ".db")
    f.deleteOnExit()
    Sqlite.writeDb(f, "geojson", "CREATE TABLE geojson (id TEXT, body TEXT)",
      rows)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    Sqlite.scanTable(bytes, "geojson")
  }

  test("varint roundtrip") {
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, 16383L, 16384L, 1L << 30)) {
      val b = Sqlite.varintBytes(v)
      assert(Sqlite.varint(b, 0) === ((v, b.length)))
    }
  }

  test("single-page table roundtrip") {
    val rows = Seq(
      Seq[Any]("85633041", """{"wof:name": "x"}"""),
      Seq[Any]("890424287", """{"wof:name": "y"}"""))
    assert(roundtrip(rows) === rows)
  }

  test("multi-page table walks the interior b-tree") {
    // ~100 bytes per row over 4096-byte pages: several leaves + interior
    val rows = (0 until 500).map(i =>
      Seq[Any](s"id$i", s"""{"wof:name": "${"x" * 60}$i"}"""))
    val got = roundtrip(rows)
    assert(got.length === 500)
    assert(got.toSet === rows.toSet)
  }

  test("unknown table yields no rows; long values decode") {
    val f = java.io.File.createTempFile("graft_sqlite2", ".db")
    f.deleteOnExit()
    Sqlite.writeDb(f, "t", "CREATE TABLE t (k INTEGER, v TEXT)",
      Seq(Seq[Any](42L, "a"), Seq[Any](-7L, "b")))
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    assert(Sqlite.scanTable(bytes, "missing") === Nil)
    assert(Sqlite.scanTable(bytes, "t") ===
      Seq(Seq[Any](42L, "a"), Seq[Any](-7L, "b")))
  }
}
