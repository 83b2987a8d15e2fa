package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sqlite

/** Totality fuzz for the SQLite reader — the container twin of the
  * codec fuzz suites. The contract differs from the codecs: scanTable
  * MAY throw (the loader quarantines NonFatal per file), but on ANY
  * byte input it must terminate and every throw must be catchable —
  * no StackOverflowError (cyclic b-tree), no OutOfMemoryError (a
  * corrupt serial type claiming gigabytes), both VirtualMachineErrors
  * that sail past the quarantine and kill the executor. Deterministic
  * seeds so a failure replays. */
class SqliteFuzzSpec extends AnyFunSuite {

  private def mustBeCatchable(b: Array[Byte], label: => String): Unit =
    try { Sqlite.scanTable(b, "t"); () }
    catch {
      case _: VirtualMachineError =>
        fail(s"scanTable raised a VirtualMachineError on $label")
      case scala.util.control.NonFatal(_) => () // quarantine-able
    }

  // multi-page db: enough rows to force interior pages, plus two
  // overflow-chained bodies so truncation/mutation also hits the
  // chain-stitch path (visited set, plen bound, next-pointer walk)
  private lazy val validDb: Array[Byte] = {
    val f = java.nio.file.Files.createTempFile("graft_sqlite_fuzz", ".db")
    val rows = (0 until 2000).map {
      case i if i == 700 => Seq[Any](i.toLong, "o" * 9000)
      case i if i == 1400 => Seq[Any](i.toLong, "p" * 40000)
      case i => Seq[Any](i.toLong, s"body-$i-${"x" * 50}")
    }
    Sqlite.writeDb(f.toFile, "t", "CREATE TABLE t (id INTEGER, body TEXT)", rows)
    val b = java.nio.file.Files.readAllBytes(f)
    java.nio.file.Files.delete(f)
    b
  }

  test("a blob serial type claiming gigabytes errors instead of allocating") {
    // record header: hlen varint + one serial type; blob type 12 + 2n
    // for n = 800M claims ~0.8 GB from a 16-byte payload — the decode
    // must raise a bounds error BEFORE copyOfRange allocates (the copy
    // zero-pads past the source instead of throwing)
    val t = 12L + 2L * 800000000L
    val tb = Sqlite.varintBytes(t)
    val payload = Array[Byte]((1 + tb.length).toByte) ++ tb ++ new Array[Byte](8)
    val e = intercept[RuntimeException](Sqlite.parseRecord(payload, 0))
    assert(e.getMessage.contains("blob length"))
  }

  test("serial-type lengths past 2^32 error instead of truncating to Int") {
    // (t - 13) / 2 near 2^32 + 5 truncates to Int 5, which would PASS
    // the bounds check and silently misalign every following column —
    // the length math must stay Long until after the bound
    for ((base, kind) <- Seq((13L, "text"), (12L, "blob"))) {
      val t = base + 2L * ((1L << 32) + 5L)
      val tb = Sqlite.varintBytes(t)
      val payload = Array[Byte]((1 + tb.length).toByte) ++ tb ++
        new Array[Byte](16)
      val e = intercept[RuntimeException](Sqlite.parseRecord(payload, 0))
      assert(e.getMessage.contains(s"$kind length"), s"$kind: $e")
    }
  }

  test("random byte soup never kills the JVM") {
    val r = new scala.util.Random(0x5D17E)
    for (i <- 0 until 1000) {
      val b = new Array[Byte](r.nextInt(300))
      r.nextBytes(b)
      mustBeCatchable(b, s"soup#$i")
    }
  }

  test("every 512-step truncation of a valid multi-page db is catchable") {
    for (n <- 0 to validDb.length by 512)
      mustBeCatchable(validDb.take(n), s"truncated to $n/${validDb.length}")
  }

  test("single-byte mutations of a valid db are catchable") {
    // mutations hit page types, cell pointers, varints, serial types —
    // the paths where a wrong byte once meant recursion or a bad copy
    val r = new scala.util.Random(0xD15C)
    for (i <- 0 until 1500) {
      val m = validDb.clone()
      m(r.nextInt(m.length)) = r.nextInt(256).toByte
      mustBeCatchable(m, s"mutation#$i")
    }
  }

  test("mutated page-1 headers (root walk entry) are catchable") {
    // concentrate mutations in the first 200 bytes: file header, page-1
    // b-tree header, sqlite_master cell pointers — the read entry path
    val r = new scala.util.Random(0x0A11)
    for (i <- 0 until 1500) {
      val m = validDb.clone()
      m(r.nextInt(200)) = r.nextInt(256).toByte
      mustBeCatchable(m, s"hdr-mutation#$i")
    }
  }
}
