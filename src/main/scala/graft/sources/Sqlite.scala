package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** S5: the WOF dump-database loader — the reference keeps Who's-On-First
  * records in a sqlite file with a single `geojson(id, body)` table and
  * reads it cache-through (`pipeline/sources/general/wof/fetcher.py:
  * 34-57`; the chunked network fallback URL is `:17-31`, implemented as
  * `WdClaims.wofUrl`).
  *
  * No sqlite JDBC driver ships with Spark, so this is a self-contained
  * read-only parser of the public SQLite 3 file format (header + table
  * b-tree pages; www.sqlite.org/fileformat2.html): enough to scan a
  * whole table — which is exactly what a bulk loader wants; the
  * reference's per-id point reads exist because it processes records one
  * at a time. Overflow-page chains are supported on both sides (real WOF
  * geojson bodies routinely exceed one page). Limitations (documented):
  * no freeblock reuse, no WAL — dump files are written once and scanned.
  *
  * Scale shape: a sqlite dump is a single non-splittable file (the
  * reference's is one local file too), so the load is one task shipping
  * the bytes to an executor via `binaryFile`; the parsed table is
  * dim-scale and feeds broadcasts. Sharded dumps parallelize per file.
  */
object Sqlite {

  // ------------------------------------------------------------ varint

  /** SQLite big-endian 7-bit varint at `off` -> (value, bytesConsumed). */
  def varint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(off + i) & 0xff
      v = (v << 7) | (x & 0x7f)
      i += 1
      if ((x & 0x80) == 0) return (v, i)
    }
    ((v << 8) | (b(off + 8) & 0xff), 9)
  }

  def varintBytes(v: Long): Array[Byte] = {
    require(v >= 0 && v < (1L << 56), s"varint out of supported range: $v")
    if (v == 0) return Array(0)
    val parts = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var x = v
    while (x > 0) { parts.prepend((x & 0x7f).toByte); x >>= 7 }
    for (i <- 0 until parts.length - 1) parts(i) = (parts(i) | 0x80).toByte
    parts.toArray
  }

  // ------------------------------------------------------------ reader

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def u32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Decode one record payload at `off`: header varints (serial types),
    * then the values. Text -> String, ints -> Long, NULL -> null. */
  def parseRecord(b: Array[Byte], off: Int): Seq[Any] = {
    val (hlen, h0) = varint(b, off)
    var p = off + h0
    val types = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (p < off + hlen) {
      val (t, n) = varint(b, p); types += t; p += n
    }
    var d = off + hlen.toInt
    types.toSeq.map { t =>
      def intOf(n: Int): Long = {
        var v = if ((b(d) & 0x80) != 0) -1L else 0L // sign-extend
        for (i <- 0 until n) v = (v << 8) | (b(d + i) & 0xff)
        d += n; v
      }
      t match {
        case 0 => null
        case 1 => intOf(1)
        case 2 => intOf(2)
        case 3 => intOf(3)
        case 4 => intOf(4)
        case 5 => intOf(6)
        case 6 => intOf(8)
        case 8 => 0L
        case 9 => 1L
        case txt if txt >= 13 && txt % 2 == 1 =>
          // LONG length, bounds-checked BEFORE .toInt: a corrupt serial
          // type near 2^33 would otherwise truncate to a small positive
          // Int, pass every check, and silently misalign the decode
          val n = (txt - 13) / 2
          if (n > b.length - d) sys.error(
            s"text length $n exceeds remaining payload ${b.length - d}")
          val s = new String(b, d, n.toInt, UTF_8); d += n.toInt; s
        case blob if blob >= 12 && blob % 2 == 0 =>
          // same Long discipline; ALSO bounds BEFORE the copy:
          // copyOfRange does not throw on to > length — it zero-pads,
          // so a corrupt length claiming gigabytes would silently
          // ALLOCATE them, and the resulting OutOfMemoryError is not a
          // catchable quarantine error, it is JVM death
          val n = (blob - 12) / 2
          if (n > b.length - d) sys.error(
            s"blob length $n exceeds remaining payload ${b.length - d}")
          val arr = java.util.Arrays.copyOfRange(b, d, d + n.toInt)
          d += n.toInt; arr
        case other => sys.error(s"unsupported serial type $other")
      }
    }
  }

  /** Walk a table b-tree from `page`, yielding (rowid, values). */
  def walkTable(db: Array[Byte], pageSize: Int, page: Int): Seq[(Long, Seq[Any])] = {
    // explicit-stack pre-order DFS (first child lands on top of the
    // stack) = the natural b-tree row order. Not recursion: on a CORRUPT
    // db an
    // interior page can point into a cycle or an arbitrarily long
    // chain, and the resulting StackOverflowError is a
    // VirtualMachineError that would sail past the loader's NonFatal
    // quarantine — the visited guard turns it into a catchable error
    val visited = scala.collection.mutable.HashSet.empty[Int]
    val out = Seq.newBuilder[(Long, Seq[Any])]
    val nPagesTotal = db.length / pageSize
    var stack: List[Int] = List(page)
    while (stack.nonEmpty) {
      val p = stack.head
      stack = stack.tail
      // bound EVERY page before touching it (root included): a hostile
      // interior-page child pointer like 0x00100002 would wrap
      // (p-1)*pageSize past Int range back onto an in-range offset the
      // visited set (which stores the unwrapped number) does not
      // recognize — silently re-emitting that page's rows as duplicates
      if (p <= 0 || p > nPagesTotal) sys.error(
        s"b-tree page $p outside the $nPagesTotal-page file")
      if (!visited.add(p)) sys.error(s"b-tree page cycle at page $p")
      val base = (p - 1) * pageSize
      val hdr = base + (if (p == 1) 100 else 0)
      val ptype = db(hdr) & 0xff
      val ncells = u16(db, hdr + 3)
      ptype match {
        case 13 => // leaf table page
          // payload split per the file format (§B-tree Pages): up to
          // maxLocal = usable - 35 is inline; a longer payload keeps
          // local = minLocal + (P - minLocal) % (usable - 4) bytes
          // (clamped back to minLocal if that lands past maxLocal)
          // inline, then a 4-byte pointer to an overflow-page chain —
          // each chain page = 4-byte next pointer + payload bytes
          val usable = pageSize - (db(20) & 0xff) // minus reserved region
          val maxLocal = usable - 35
          val minLocal = (usable - 12) * 32 / 255 - 23
          out ++= (0 until ncells).map { i =>
            val off = base + u16(db, hdr + 8 + 2 * i)
            val (plen, c1) = varint(db, off)
            val (rowid, c2) = varint(db, off + c1)
            val start = off + c1 + c2
            if (plen <= maxLocal) (rowid, parseRecord(db, start))
            else {
              // a chain cannot hold more than the file does — bound the
              // assembly buffer BEFORE allocating (corrupt plen would
              // otherwise allocate unbounded, and OOM is JVM death)
              if (plen > db.length) sys.error(
                s"overflow payload $plen exceeds file size ${db.length}")
              val k = minLocal + ((plen - minLocal) % (usable - 4)).toInt
              val local = if (k <= maxLocal) k else minLocal
              val payload = new Array[Byte](plen.toInt)
              System.arraycopy(db, start, payload, 0, local)
              var filled = local
              var ovfl = u32(db, start + local)
              val chain = scala.collection.mutable.HashSet.empty[Int]
              val nPages = db.length / pageSize
              while (filled < plen) {
                // the page bound also keeps (ovfl-1)*pageSize from
                // wrapping Int back into range on a hostile pointer
                if (ovfl <= 0 || ovfl > nPages || !chain.add(ovfl)) sys.error(
                  s"bad overflow chain at page $ovfl (cycle, early end, " +
                    s"or past the $nPages-page file)")
                val pb = (ovfl - 1) * pageSize
                val take = math.min(usable - 4, plen.toInt - filled)
                System.arraycopy(db, pb + 4, payload, filled, take)
                filled += take
                ovfl = u32(db, pb)
              }
              (rowid, parseRecord(payload, 0))
            }
          }
        case 5 => // interior table page: children + rightmost pointer
          val children = (0 until ncells).map { i =>
            u32(db, base + u16(db, hdr + 12 + 2 * i))
          } :+ u32(db, hdr + 8)
          stack = children.toList ::: stack // first child on top
        case other => sys.error(s"unsupported b-tree page type $other")
      }
    }
    out.result()
  }

  /** Scan a whole table by name: sqlite_master (root page 1) gives the
    * root page; rows come back in b-tree order. */
  def scanTable(db: Array[Byte], table: String): Seq[Seq[Any]] = {
    require(new String(db, 0, 15, UTF_8) == "SQLite format 3", "not a sqlite db")
    // header value 1 is the sentinel for a 65536-byte page
    val pageSize = u16(db, 16) match { case 1 => 65536; case n => n }
    val master = walkTable(db, pageSize, 1)
    master.map(_._2)
      .find(r => r.head == "table" && r(1) == table)
      .map(r => walkTable(db, pageSize, r(3).asInstanceOf[Long].toInt).map(_._2))
      .getOrElse(Nil)
  }

  /** Distributed scan of `table` across every SQLite file `path`
    * matches — one file per task via binaryFile, parsed executor-side
    * by [[scanTable]]. A corrupt database (mangled header, truncated or
    * cyclic b-tree, a record `rowMapper` rejects) quarantines the whole
    * FILE — counted in [[Quarantine]] "sqlite_dbs", warned with the
    * path — instead of killing the task: one bad dump in a sharded
    * 100 TB load must cost its own rows, never the job. `rowMapper`
    * runs inside the quarantine boundary, so type/arity corruption in
    * decoded records is caught too. */
  def loadTable[T](spark: org.apache.spark.sql.SparkSession, path: String,
      table: String)(rowMapper: Seq[Any] => T)(
      implicit enc: org.apache.spark.sql.Encoder[T]): org.apache.spark.sql.Dataset[T] = {
    import spark.implicits._
    val corrupt = Quarantine.counter(spark, "sqlite_dbs")
    spark.read.format("binaryFile").load(path)
      .select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, db) =>
        try scanTable(db, table).map(rowMapper)
        catch {
          case scala.util.control.NonFatal(ex) =>
            corrupt.add(1L)
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"loadTable($table): corrupt sqlite db $p quarantined: $ex")
            Nil
        }
      }
  }

  // ------------------------------------------------------------ writer

  val PageSize = 4096

  private def record(values: Seq[Any]): Array[Byte] = {
    val enc = values.map {
      case s: String => val b = s.getBytes(UTF_8); (2L * b.length + 13, b)
      case l: Long =>
        (6L, java.nio.ByteBuffer.allocate(8).putLong(l).array())
      case null => (0L, Array.empty[Byte])
      case other => sys.error(s"unsupported fixture value $other")
    }
    val typeBytes = enc.flatMap(e => varintBytes(e._1)).toArray
    val hlen = typeBytes.length + 1
    require(hlen < 128, "record header too large for the fixture writer")
    varintBytes(hlen) ++ typeBytes ++ enc.flatMap(_._2)
  }

  private def leafCell(rowid: Long, payload: Array[Byte]): Array[Byte] = {
    require(payload.length <= PageSize - 35,
      s"payload ${payload.length} needs an overflow chain (use cellWithOverflow)")
    varintBytes(payload.length) ++ varintBytes(rowid) ++ payload
  }

  /** Leaf cell for `payload`, spilling past max-inline into an
    * overflow-page chain appended to `ovfl` (page numbers assigned from
    * `ovflBase + ovfl.size`; each page = 4-byte next pointer, 0 on the
    * last, then payload bytes). The split mirrors the reader: local =
    * minLocal + (P - minLocal) % (usable - 4), clamped to minLocal. */
  private def cellWithOverflow(rowid: Long, payload: Array[Byte],
      ovflBase: Int,
      ovfl: scala.collection.mutable.ArrayBuffer[Array[Byte]]): Array[Byte] = {
    val usable = PageSize
    val maxLocal = usable - 35
    if (payload.length <= maxLocal) leafCell(rowid, payload)
    else {
      val minLocal = (usable - 12) * 32 / 255 - 23
      val k = minLocal + (payload.length - minLocal) % (usable - 4)
      val local = if (k <= maxLocal) k else minLocal
      val first = ovflBase + ovfl.length
      var pos = local
      var pageNo = first
      while (pos < payload.length) {
        val page = new Array[Byte](PageSize)
        val take = math.min(usable - 4, payload.length - pos)
        val next = if (pos + take < payload.length) pageNo + 1 else 0
        page(0) = (next >> 24).toByte; page(1) = (next >> 16).toByte
        page(2) = (next >> 8).toByte; page(3) = next.toByte
        System.arraycopy(payload, pos, page, 4, take)
        ovfl += page
        pos += take
        pageNo += 1
      }
      varintBytes(payload.length) ++ varintBytes(rowid) ++
        payload.take(local) ++ Array[Byte]((first >> 24).toByte,
          (first >> 16).toByte, (first >> 8).toByte, first.toByte)
    }
  }

  /** Pack cells into leaf-table pages; returns pages + each page's max
    * rowid (for the interior index). `headerRoom` reserves the 100-byte
    * db header on page 1. */
  private def leafPages(cells: Seq[(Long, Array[Byte])],
      headerRoom: Int = 0): Seq[(Array[Byte], Long)] = {
    val pages = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Long)]
    var pending = cells
    var room = headerRoom // only the first page carries the db header
    while (pending.nonEmpty || pages.isEmpty) {
      val avail = PageSize - room - 8
      var used = 0
      val take = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
      while (pending.nonEmpty &&
        used + pending.head._2.length + 2 <= avail) {
        used += pending.head._2.length + 2
        take += pending.head
        pending = pending.tail
      }
      require(take.nonEmpty || pending.isEmpty, "cell larger than a page")
      val page = new Array[Byte](PageSize - room)
      page(0) = 13
      page(3) = (take.length >> 8).toByte; page(4) = (take.length & 0xff).toByte
      var content = PageSize - room
      for (((_, cell), i) <- take.zipWithIndex.reverse) {
        content -= cell.length
        System.arraycopy(cell, 0, page, content, cell.length)
        // the stored offset is relative to the page START in the file,
        // so add headerRoom back for page 1
        val off = content + room
        page(8 + 2 * i) = (off >> 8).toByte; page(8 + 2 * i + 1) = (off & 0xff).toByte
      }
      page(5) = ((content + room) >> 8).toByte; page(6) = ((content + room) & 0xff).toByte
      pages += ((page, take.lastOption.map(_._1).getOrElse(0L)))
      room = 0
    }
    pages.toSeq
  }

  /** Write a single-table database: sqlite_master on page 1, the table's
    * leaves from page 2, one interior root if more than one leaf. */
  /** One interior page over `children` = (childPageNo, maxRowid): the
    * last child becomes the rightmost pointer, the rest get key cells. */
  private def interiorPage(children: Seq[(Int, Long)]): Array[Byte] = {
    val page = new Array[Byte](PageSize)
    page(0) = 5
    val n = children.length - 1
    page(3) = (n >> 8).toByte; page(4) = (n & 0xff).toByte
    val right = children.last._1
    page(8) = (right >> 24).toByte; page(9) = (right >> 16).toByte
    page(10) = (right >> 8).toByte; page(11) = right.toByte
    var content = PageSize
    for (i <- (0 until n).reverse) {
      val (child, maxRow) = children(i)
      val cell = Array[Byte]((child >> 24).toByte, (child >> 16).toByte,
        (child >> 8).toByte, child.toByte) ++ varintBytes(maxRow)
      content -= cell.length
      System.arraycopy(cell, 0, page, content, cell.length)
      page(12 + 2 * i) = (content >> 8).toByte
      page(12 + 2 * i + 1) = (content & 0xff).toByte
    }
    page(5) = (content >> 8).toByte; page(6) = (content & 0xff).toByte
    page
  }

  /** Conservative interior fanout: 200 children = 199 cells × ≤13 bytes
    * + 398 pointer bytes + 12 header ≈ 3 KB, comfortably inside a page.
    * A single root tops out around ~300 leaves, which a 10× fixture
    * corpus exceeds — the reader has always recursed through interior
    * levels, only the writer was single-level. */
  private val InteriorFanout = 200

  def writeDb(file: java.io.File, table: String, createSql: String,
      rows: Seq[Seq[Any]]): Unit = {
    // overflow pages live AFTER the b-tree pages, but their page
    // numbers are needed inside leaf cells — two passes resolve the
    // circularity: cell SIZES (and so the page layout) do not depend on
    // pointer VALUES, so pass 1 with a dummy base yields the b-tree
    // page count, pass 2 builds the real pointers against it
    def build(ovflBase: Int): (Seq[(Array[Byte], Long)], Seq[Array[Byte]],
        Seq[Array[Byte]], Int) = {
      val ovfl = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      val cells = rows.zipWithIndex.map { case (r, i) =>
        (i + 1L, cellWithOverflow(i + 1L, record(r), ovflBase, ovfl))
      }
      val leaves = leafPages(cells)
      // interior levels bottom-up until one root remains; pages are
      // appended after the leaves in build order, so page numbers are
      // assigned level by level
      val interiors = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var level: Seq[(Int, Long)] =
        leaves.indices.map(i => (2 + i, leaves(i)._2))
      var next = 2 + leaves.length
      while (level.length > 1) {
        val raw = level.grouped(InteriorFanout).toSeq
        // a trailing group of 1 child would make an interior page with
        // zero cells (rightmost pointer only) — legal for our reader but
        // a degenerate b-tree shape external SQLite tooling may flag;
        // rebalance the final Fanout+1-child run into two halves (each
        // >= 2 children, so every interior page carries >= 1 cell)
        val groups =
          if (raw.length > 1 && raw.last.length < 2) {
            val merged = raw(raw.length - 2) ++ raw.last
            val firstHalf = (merged.length + 1) / 2
            raw.dropRight(2) :+ merged.take(firstHalf) :+ merged.drop(firstHalf)
          } else raw
        groups.foreach(g => interiors += interiorPage(g))
        level = groups.zipWithIndex.map { case (g, i) => (next + i, g.last._2) }
        next += groups.length
      }
      (leaves, interiors.toSeq, ovfl.toSeq, level.head._1)
    }
    val (l0, i0, _, _) = build(0)
    val (leaves, interiors, overflow, rootPage) =
      build(1 + l0.length + i0.length + 1) // first page past the b-tree

    val masterRow: Seq[Any] =
      Seq("table", table, table, rootPage.toLong, createSql)
    val masterPages = leafPages(Seq((1L, leafCell(1L, record(masterRow)))),
      headerRoom = 100)
    require(masterPages.length == 1, "sqlite_master must fit page 1")

    val nPages = 1 + leaves.length + interiors.length + overflow.length
    val header = new Array[Byte](100)
    System.arraycopy("SQLite format 3".getBytes(UTF_8), 0, header, 0, 15)
    header(16) = (PageSize >> 8).toByte; header(17) = (PageSize & 0xff).toByte
    header(18) = 1; header(19) = 1 // legacy file format versions
    header(21) = 64; header(22) = 32; header(23) = 32 // payload fractions
    header(27) = 1 // file change counter
    header(28) = (nPages >> 24).toByte; header(29) = (nPages >> 16).toByte
    header(30) = (nPages >> 8).toByte; header(31) = nPages.toByte
    header(43) = 1 // schema cookie
    header(47) = 4 // schema format
    header(59) = 1 // text encoding: utf8
    header(95) = 1 // version-valid-for

    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(file))
    try {
      out.write(header)
      out.write(masterPages.head._1)
      leaves.foreach(p => out.write(p._1))
      interiors.foreach(out.write)
      overflow.foreach(out.write)
    } finally out.close()
  }
}
