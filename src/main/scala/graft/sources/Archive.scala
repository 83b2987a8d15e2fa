package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4/S5: the archive-of-files loader — re-expression of the reference's
  * tar/directory loaders (`pipeline/sources/yale/ycba/loader.py:30-76`,
  * `load_from_disk` `:78-108`) against Spark's distributed file reader
  * instead of a sequential tarfile walk:
  *
  *   - identifiers are the last three path segments (`type/uu/uuid.json`,
  *     loader.py:55-56), derived from `input_file_name()`;
  *   - records under 30 bytes are prior deletions and skipped (`:49-51`);
  *   - records already in the output cache are skipped — here an
  *     anti-join against the cached-id table instead of a per-record
  *     dict probe (`:57-62`), i.e. the S9 cache-through shape;
  *   - bodies parse with an explicit schema (from_json), bad JSON → null
  *     body retained for the caller to route (`:66-69` logs and skips).
  *
  * At 100 TB this is exactly Spark's bread and butter: the file listing
  * shards across executors, `maxPartitionBytes` packs small files, and
  * the anti-join is a broadcast when the cache-id list is small.
  */
object Archive {

  /** Load a directory tree of JSON files. `cachedIds`: one-column
    * ("ident") table of already-loaded identifiers.
    *
    * NOT the SQL file source: a dump tree is tens of thousands of TINY
    * files, and `spark.read.text` pays a per-file reader setup
    * (~8 ms/file measured — 50 s for a 150k-file / 10 MB tree at the
    * sf1 stress scale, dwarfing the bytes), while RDD `wholeTextFiles`
    * is worse still (its FileInputFormat listing forks a process per
    * file for permissions — measured 1000 s+). Instead: ONE recursive
    * Hadoop-FS listing (listFiles iterator — no permission loads,
    * scheme-portable to HDFS/S3), the path list parallelized across
    * the cluster, and file bodies read in mapPartitions (~5 s for the
    * same tree). At 100 TB the driver-side listing is the residual
    * bottleneck — which is exactly why real dumps carry a manifest
    * (s22): pass its file list straight to [[readPaths]] instead. */
  def loadDir(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      cachedIds: Option[DataFrame] = None): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // manual listStatus recursion, NOT fs.listFiles: the listFiles
    // iterator wraps every entry in a LocatedFileStatus, whose
    // constructor touches permissions — and Hadoop's local FS loads
    // those by FORKING `ls` per file (measured 300 s+ on the 150k-file
    // tree). Plain FileStatus keeps permissions lazy; the walk is pure
    // listStatus calls.
    val files = {
      val b = Vector.newBuilder[String]
      var stack: List[org.apache.hadoop.fs.Path] = List(root)
      while (stack.nonEmpty) {
        val d = stack.head
        stack = stack.tail
        fs.listStatus(d).foreach { st =>
          if (st.isDirectory) stack ::= st.getPath
          else if (st.getPath.getName.endsWith(".json"))
            b += st.getPath.toString
        }
      }
      b.result()
    }
    readPaths(spark, files, schema, cachedIds)
  }

  /** Read an explicit file list (e.g. a manifest's, s22) as the same
    * (ident, body, data) table loadDir produces. */
  def readPaths(spark: SparkSession, files: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      cachedIds: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val par = math.max(1, spark.sparkContext.defaultParallelism * 2)
    // ship the SESSION'S Hadoop config to executors as plain entries
    // (Configuration itself is not serializable and Spark's wrapper is
    // private[spark]): a bare `new Configuration()` executor-side would
    // drop spark.hadoop.* settings — S3 credentials/endpoints, custom
    // FS impls — and the claimed HDFS/S3 portability with them
    val confEntries: Array[(String, String)] = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
      b.result()
    }
    val raw = spark.createDataset(files)
      .repartition(par)
      .mapPartitions { it =>
        // rebuilt once per PARTITION (not per file; FileSystem
        // instances are cached by scheme underneath)
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        it.map { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val in = hp.getFileSystem(conf).open(hp)
          try (p, new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8))
          finally in.close()
        }
      }.toDF("path", "body")
    val withId = raw.select(
      // type/uu/uuid.json: last three segments (loader.py:55-56)
      concat_ws("/", slice(split($"path", "/"), -3, 3)).as("ident"),
      $"body")
      .filter(length($"body") >= 30) // deleted-record skip (loader.py:49)
    val fresh = cachedIds match {
      case Some(c) => withId.join(broadcast(c), Seq("ident"), "left_anti")
      case None => withId
    }
    fresh.withColumn("data", from_json($"body", schema))
  }

  /** Drain `in` up to `cap` bytes; past the cap, throw (an IOException,
    * so the loadZips quarantine absorbs it). readAllBytes would let a
    * zip bomb — a deflate stream expanding 1000× — allocate unbounded
    * heap, and the resulting OutOfMemoryError is JVM death, not a
    * catchable per-archive error. */
  private def readCapped(in: java.io.InputStream, cap: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n > 0) {
      bos.write(buf, 0, n)
      if (bos.size > cap) throw new java.io.IOException(
        s"zip entry exceeds $cap decompressed bytes (zip-bomb guard)")
      n = in.read(buf)
    }
    bos.toByteArray
  }

  /** S2: zip-of-JSON loader — the dump-shaped cousin of loadDir
    * (reference: the zipfile walks in the per-source loaders). Each zip
    * is one task's unit of work: `binaryFile` ships the archive bytes to
    * an executor, a ZipInputStream walk yields (ident, body) per .json
    * entry, and the same skip/parse rules as loadDir apply. At 100 TB a
    * dump is thousands of zips — the parallelism is per-archive, which
    * is exactly how the reference shards its dump files — and a CORRUPT
    * archive is a certainty: the walk salvages every entry streamed
    * before the corruption point and quarantines the rest (counted in
    * [[Quarantine]] "zip_archives", warned executor-side) instead of
    * letting the ZipException kill the task and with it the load.
    * `maxEntryBytes` bounds one entry's decompressed size (zip-bomb
    * guard; an over-cap entry quarantines its archive the same way). */
  def loadZips(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      cachedIds: Option[DataFrame] = None,
      maxEntryBytes: Int = 1 << 28): DataFrame = {
    import spark.implicits._
    val corrupt = Quarantine.counter(spark, "zip_archives")
    val entries = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip").load(path)
      .select($"path", $"content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        // ZipInputStream treats a stream that does not OPEN with a
        // local-entry signature as "no more entries" and returns null —
        // a wholly-garbage archive would silently yield zero rows. Every
        // zip structure starts with "PK" (entry, or end-of-central-dir
        // for a legitimately empty archive); anything else is corrupt
        // and must be counted, not skipped.
        if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != 'K') {
          corrupt.add(1L)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"loadZips: $p is not a zip archive (no PK magic); quarantined")
          Seq.empty[(String, String)]
        } else {
          val zin = new java.util.zip.ZipInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val out = Seq.newBuilder[(String, String)]
          try {
            var e = zin.getNextEntry
            while (e != null) {
              if (e.getName.endsWith(".json") && e.getName.contains("/")) {
                val body = new String(readCapped(zin, maxEntryBytes),
                  java.nio.charset.StandardCharsets.UTF_8)
                val ident = e.getName.split("/").takeRight(3).mkString("/")
                out += ((ident, body))
              }
              e = zin.getNextEntry
            }
          } catch {
            // IOException covers ZipException/EOFException on mangled
            // structure; IllegalArgumentException is getNextEntry on a
            // malformed (non-UTF-8) entry name
            case ex @ (_: java.io.IOException | _: IllegalArgumentException) =>
              corrupt.add(1L)
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"loadZips: corrupt archive $p quarantined " +
                  s"(salvaged entries kept): $ex")
          } finally zin.close()
          out.result()
        }
      }.toDF("ident", "body")
      .filter(length($"body") >= 30) // deleted-record skip, as loadDir
    val fresh = cachedIds match {
      case Some(c) => entries.join(broadcast(c), Seq("ident"), "left_anti")
      case None => entries
    }
    fresh.withColumn("data", from_json($"body", schema))
  }
}
