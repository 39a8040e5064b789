package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch source/sink formats beyond parquet — CSV, JSON, ORC — with the
  * schema discipline a 100-TB pipeline needs: reads ALWAYS carry an
  * explicit schema (schema inference is a full extra pass over the data
  * and can silently widen/narrow types between runs), and writes go
  * through the same options the read uses so a round-trip is lossless.
  *
  * The reference's surface is Postgres-only (tokio-postgres sinks,
  * quick_stream `src/upsert.rs:209-269`); file formats are this engine's
  * extension for corpus interchange — training corpora arrive as
  * JSONL/CSV dumps and leave as columnar files at least as often as they
  * live in a database.
  *
  * Scale notes per format:
  *  - CSV/JSON are row-major and compress worse than parquet/ORC; they are
  *    interchange formats, not storage formats. Reads are splittable at
  *    newlines, so they parallelize — UNLESS `multiLine=true` (quoted
  *    newlines), which forces one task per file; keep records
  *    newline-free upstream if you can.
  *  - ORC/parquet are columnar: column pruning and predicate pushdown
  *    reach the scan, so `select`/`filter` cost is proportional to what
  *    is read, not what is stored.
  *  - Partitioned writes ([[writePartitioned]]) turn equality filters on
  *    the partition column into directory pruning — zero I/O for
  *    filtered-out partitions on ANY format. Choose low-cardinality
  *    columns (lang, date, source); a high-cardinality partition column
  *    produces millions of tiny files and kills the listing step.
  */
object Formats {

  private val supported = Set("csv", "json", "orc", "parquet", "xml")

  /** Write `df` to `path` as `format`, read it back with `df`'s own
    * schema. The returned frame is the round-tripped data — the gate shape
    * for "does this format preserve the corpus bit-for-bit". CSV keeps
    * Spark's default quoting (quote `"`, escape `\`), so embedded
    * delimiters survive; set `multiLine=true` in `options` only if values
    * embed newlines (see scale notes). */
  def roundTrip(
      spark: SparkSession, df: DataFrame, format: String, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    require(supported.contains(format),
      s"format must be one of ${supported.mkString(", ")}, got $format")
    df.write.format(format).options(options).mode("overwrite").save(path)
    spark.read.format(format).options(options).schema(df.schema).load(path)
  }

  /** FIXED-WIDTH record parse — the mainframe/EDI/legacy-extract text
    * shape Spark has no native reader for: each field is a (name,
    * 1-based start, length, type) slice of the line; strings are
    * right-trimmed (the format pads with spaces), other types go
    * through `try_cast` after a full trim so a malformed field yields
    * NULL instead of an ANSI cast failure (the quarantine posture —
    * route NULL-keyed rows to a dead-letter table downstream). Pure
    * column expressions (substring/trim/cast, all codegen'd);
    * row-local, no shuffle, columns prune as usual. */
  def parseFixedWidth(
      df: DataFrame, lineCol: String,
      specs: Seq[(String, Int, Int, String)]): DataFrame = {
    require(specs.nonEmpty, "at least one field spec")
    specs.foreach { case (n, st, len, _) =>
      require(st >= 1 && len >= 1, s"bad slice for $n: start=$st len=$len")
    }
    import org.apache.spark.sql.functions.{col, expr, rtrim, substring}
    df.select(specs.map { case (n, st, len, tp) =>
      (tp match {
        case "string" => rtrim(substring(col(lineCol), st, len))
        case t => expr(s"try_cast(trim(substring($lineCol, $st, $len)) AS $t)")
      }).as(n)
    }: _*)
  }

  /** Hive-style partitioned write: one directory per value of
    * `partitionCols` (in order). Readers filtering on those columns scan
    * only the matching directories. */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      format: String = "parquet"): Unit = {
    require(supported.contains(format),
      s"format must be one of ${supported.mkString(", ")}, got $format")
    require(partitionCols.nonEmpty, "partitionCols must not be empty")
    df.write.format(format).partitionBy(partitionCols: _*)
      .mode("overwrite").save(path)
  }

  /** Read a partitioned layout. Partition columns come back from directory
    * names (their type is whatever Spark infers from the path — pin
    * string-typed partition values upstream if that matters); pass the
    * DATA columns' schema via `dataSchema` to skip inference — mandatory
    * hygiene for CSV/JSON (inference is a full extra pass), harmless for
    * self-describing parquet/ORC. */
  def readPartitioned(
      spark: SparkSession, path: String, format: String = "parquet",
      dataSchema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    dataSchema.fold(r)(r.schema).load(path)
  }

  /** Dynamic partition overwrite — replace ONLY the partitions present
    * in `df`, leaving every other partition untouched: the idempotent
    * re-run primitive for date/lang-partitioned corpora ("recompute
    * yesterday" must not drop the rest of history). Spark's default
    * overwrite mode would truncate the WHOLE table first; the
    * `partitionOverwriteMode=dynamic` writer option scopes the delete to
    * the partitions the job actually wrote — set per-writer here, not as
    * a session conf, so concurrent jobs keep their own semantics.
    *
    * Scale: the write itself is the same partitioned write as
    * [[writePartitioned]]; the replace is a directory swap per touched
    * partition — O(touched), never O(table). */
  def overwritePartitions(
      df: DataFrame, path: String, partitionCols: Seq[String],
      format: String = "parquet"): Unit = {
    require(supported.contains(format),
      s"format must be one of ${supported.mkString(", ")}, got $format")
    require(partitionCols.nonEmpty, "partitionCols must not be empty")
    df.write.format(format).partitionBy(partitionCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").save(path)
  }

  /** Read a multi-shard layout whose shards were written with EVOLVING
    * schemas (columns added over time), reconciling them into one wide
    * schema: `mergeSchema=true` unions the footers' schemas (missing
    * columns surface as NULL — by-name resolution, the parquet/ORC
    * evolution contract). Off by default in Spark because footer-merging
    * every file costs a listing pass — turn it on exactly where drift is
    * expected (landing zones), not globally. */
  def readMergedSchema(
      spark: SparkSession, path: String,
      format: String = "parquet"): DataFrame = {
    require(format == "parquet" || format == "orc",
      s"mergeSchema needs a self-describing format, got $format")
    spark.read.format(format).option("mergeSchema", "true").load(path)
  }

  /** Bucketed (pre-shuffled) table write — the co-location layout for
    * repeated big joins and aggregations: rows are hash-partitioned into
    * `buckets` files per partition by `bucketCols` AT WRITE TIME, so a
    * join or groupBy on those columns against another table bucketed the
    * same way needs NO exchange at read time. At 100 TB the shuffle of
    * the fact table dominates every join; bucketing pays that shuffle
    * once, at write, for every later query. Optional `sortCols` keeps
    * each bucket file sorted (sort-merge joins skip the sort too).
    *
    * Registers `tableName` in the session catalog as an EXTERNAL table at
    * `path` (bucket metadata lives in the catalog — a plain
    * `spark.read.parquet` of the same files would not know the layout;
    * read back with `spark.table(tableName)`). */
  def writeBucketedTable(
      df: DataFrame, tableName: String, path: String,
      bucketCols: Seq[String], buckets: Int,
      sortCols: Seq[String] = Nil, format: String = "parquet"): Unit = {
    require(supported.contains(format),
      s"format must be one of ${supported.mkString(", ")}, got $format")
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val w = df.write.format(format).option("path", path).mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(tableName)
  }

  /** Training-shard export — the last mile of a corpus pipeline: one
    * directory per `splitCol` value (train/val/test), each file capped at
    * `maxRecordsPerShard` rows so downstream loaders stream uniform
    * shards. `maxRecordsPerFile` splits at the writer level — tasks stay
    * parallel and no extra shuffle is introduced; pair with
    * `df.repartition(n)` upstream if you also need a file-COUNT floor
    * (one task writes ≥ 1 file per partition value it holds). */
  def writeShards(
      df: DataFrame, path: String, splitCol: String,
      maxRecordsPerShard: Long, format: String = "parquet"): Unit = {
    require(supported.contains(format),
      s"format must be one of ${supported.mkString(", ")}, got $format")
    require(maxRecordsPerShard > 0,
      s"maxRecordsPerShard must be positive, got $maxRecordsPerShard")
    df.write.format(format)
      .partitionBy(splitCol)
      .option("maxRecordsPerFile", maxRecordsPerShard)
      .mode("overwrite").save(path)
  }

  /** One decompressed payload row; NULL body when the bytes are not a
    * valid gzip stream (or blow the size cap). */
  final case class GunzipRow(
      id: Long, n_gz: Long, n_bytes: Option[Long], text: Option[String])

  /** Parquet FOOTER introspection — the metadata scan planning trusts:
    * per requested INT64 column, the row-group statistics aggregated
    * across the file's groups (Σ value counts, Σ null counts, min of
    * minima, max of maxima). Read via parquet-mr's footer API — a
    * fully independent implementation from any query engine's reader —
    * so a cross-engine compare against plain data aggregates proves
    * the footers faithfully describe the data (the property every
    * min-max-pruning optimizer silently assumes). Driver-side O(file
    * metadata) — footers are KBs regardless of data volume; that IS
    * the point of reading them. */
  def parquetFooterStats(spark: org.apache.spark.sql.SparkSession,
      file: String, cols: Seq[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(file)
    val fs = path.getFileSystem(conf)
    // A sharded table (Spark-written directory) is the common layout
    // at scale: aggregate every part file's footer — sums of counts,
    // min of minima, max of maxima — which is exactly what a pruning
    // optimizer derives from a multi-file scan. Single files keep the
    // original behavior.
    val files: Seq[org.apache.hadoop.fs.Path] =
      if (fs.getFileStatus(path).isDirectory)
        fs.listStatus(path).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      else Seq(path)
    require(files.nonEmpty, s"no parquet files under $file")
    val perFile = files.map { p =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        cols.map { c =>
          val chunks = blocks.flatMap(_.getColumns.asScala
            .find(_.getPath.toDotString == c))
          require(chunks.nonEmpty, s"column $c not present in $p")
          val nValues = chunks.map(_.getValueCount).sum
          val nNulls = chunks.map(_.getStatistics.getNumNulls).sum
          val mins = chunks.map(_.getStatistics.genericGetMin
            .asInstanceOf[java.lang.Long].longValue)
          val maxs = chunks.map(_.getStatistics.genericGetMax
            .asInstanceOf[java.lang.Long].longValue)
          (c, nValues, nNulls, mins.min, maxs.max)
        }
      } finally reader.close()
    }
    val rows = cols.zipWithIndex.map { case (c, i) =>
      val fc = perFile.map(_(i))
      (c, fc.map(_._2).sum, fc.map(_._3).sum,
        fc.map(_._4).min, fc.map(_._5).max)
    }
    spark.createDataFrame(rows).toDF(
      "column_name", "num_values", "null_count", "min_value", "max_value")
  }

  /** Decompress a gzip BINARY column to UTF-8 text — the ingest step
    * for the web-crawl interchange shape (WARC bodies, .jsonl.gz dumps
    * land as per-record gzip members at least as often as whole files).
    * Row-local kernel (java.util.zip.GZIPInputStream — the public
    * DEFLATE/gzip format), no shuffle; corrupt streams and
    * decompression bombs past `maxBytes` surface as NULL rows, never a
    * task failure. Multi-member streams concatenate, per the gzip
    * spec. */
  def gunzipText(
      df: DataFrame, idCol: String, binCol: String,
      maxBytes: Long = 1L << 26, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, gz) =>
        val body: Option[Array[Byte]] =
          if (gz == null) None // NULL cell — quarantine row, not an NPE
          else try {
            val in = new java.util.zip.GZIPInputStream(
              new java.io.ByteArrayInputStream(gz))
            try {
              val bb = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](8192)
              var n = 0
              var total = 0L
              while (n >= 0 && total <= maxBytes) {
                n = in.read(buf)
                if (n > 0) { bb.write(buf, 0, n); total += n }
              }
              if (total > maxBytes) None else Some(bb.toByteArray)
            } finally in.close()
          } catch {
            // corrupt header/CRC/length or truncation — data, not a crash
            case scala.util.control.NonFatal(_) => None
          }
        body match {
          case None => GunzipRow(id,
            (if (gz == null) 0 else gz.length).toLong, None, None)
          case Some(b) => GunzipRow(id, gz.length.toLong,
            Some(b.length.toLong),
            Some(new String(b, java.nio.charset.StandardCharsets.UTF_8)))
        }
      }))
      .toDF()
  }

  /** One charset-decoded row; NULL text fields when the declared
    * charset is unknown or the bytes are malformed UNDER it. */
  final case class CharsetRow(
      id: Long, charset: String, n_bytes: Long, n_chars: Option[Long],
      text_md5: Option[String])

  /** Decode a binary column using a PER-ROW declared charset (the
    * Content-Type charset of a crawl record) — the step everyone
    * skips until ISO-8859-1 bodies read as UTF-8 turn into mojibake
    * that hashes "uniquely" and defeats every dedup stage downstream.
    * STRICT decode (malformed input and unmappable characters REPORT,
    * not replace): a misdeclared charset surfaces as a NULL row to
    * quarantine, never as silently corrupted text. Emits
    * (id, charset, n_bytes, n_chars, text_md5) with the md5 over the
    * UTF-8 bytes of the DECODED string — charset-independent, so one
    * oracle covers every encoding. Row-local kernel, no shuffle. */
  def decodeText(
      df: DataFrame, idCol: String, binCol: String, charsetCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.col(binCol).cast("binary"),
        org.apache.spark.sql.functions.col(charsetCol).cast("string"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.grouped(batchSize).flatMap { g =>
        val md = java.security.MessageDigest.getInstance("MD5")
        g.map { case (id, bytes, cs) =>
          val decoded: Option[String] =
            try {
              val dec = java.nio.charset.Charset.forName(cs).newDecoder()
                .onMalformedInput(
                  java.nio.charset.CodingErrorAction.REPORT)
                .onUnmappableCharacter(
                  java.nio.charset.CodingErrorAction.REPORT)
              Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
            } catch { case _: Exception => None }
          decoded match {
            case None => CharsetRow(id, cs, bytes.length.toLong, None, None)
            case Some(t) =>
              md.reset()
              CharsetRow(id, cs, bytes.length.toLong,
                Some(t.codePointCount(0, t.length).toLong),
                Some(md.digest(t.getBytes(
                  java.nio.charset.StandardCharsets.UTF_8))
                  .map("%02x".format(_)).mkString))
          }
        }
      })
      .toDF()
  }

  /** One ZIP entry row (1:N explode — corrupt archives emit nothing,
    * the exploder posture; 1:1 decoders emit NULL rows instead). */
  final case class ZipEntryRow(
      id: Long, entry_name: String, n_bytes: Long, entry_md5: String)

  /** Walk a ZIP archive column to per-entry rows (name, inflated size,
    * md5) — dataset bundles and model artifacts arrive zipped at least
    * as often as loose. JDK ZipInputStream (public PKZIP format:
    * local-file-header walk + DEFLATE), per-entry and per-archive size
    * caps against zip bombs; a corrupt archive contributes zero rows,
    * never a task failure. Row-local, no shuffle. */
  def zipEntries(
      df: DataFrame, idCol: String, binCol: String,
      maxBytesPerEntry: Long = 1L << 26, maxEntries: Int = 1024,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { g =>
        val md = java.security.MessageDigest.getInstance("MD5")
        g.flatMap { case (id, raw) =>
          if (raw == null) Nil // NULL cell — zero rows, not an NPE
          else try {
            val zin = new java.util.zip.ZipInputStream(
              new java.io.ByteArrayInputStream(raw))
            try {
              val out = scala.collection.mutable.ArrayBuffer
                .empty[ZipEntryRow]
              var entry = zin.getNextEntry
              var bomb = false
              while (entry != null && out.length < maxEntries && !bomb) {
                val bb = new java.io.ByteArrayOutputStream()
                val buf = new Array[Byte](8192)
                var n = 0
                var total = 0L
                while (n >= 0 && total <= maxBytesPerEntry) {
                  n = zin.read(buf)
                  if (n > 0) { bb.write(buf, 0, n); total += n }
                }
                if (total > maxBytesPerEntry) bomb = true
                else {
                  md.reset()
                  out += ZipEntryRow(id, entry.getName, total,
                    md.digest(bb.toByteArray).map("%02x".format(_)).mkString)
                }
                entry = zin.getNextEntry
              }
              // over-long archive (entries remain past maxEntries) is
              // quarantined whole like the bomb case — a truncated
              // listing must never masquerade as a complete one
              if (bomb || entry != null) Nil else out.toSeq
            } finally zin.close()
          } catch {
            case scala.util.control.NonFatal(_) => Nil // corrupt/bad names
          }
        }
      })
      .toDF()
  }

  /** Gate fixture: zip each row's text plus a small json sidecar into
    * a real two-entry archive. */
  def zipFixture(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bb = new java.io.ByteArrayOutputStream()
        val z = new java.util.zip.ZipOutputStream(bb)
        z.putNextEntry(new java.util.zip.ZipEntry("doc.txt"))
        z.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        z.closeEntry()
        z.putNextEntry(new java.util.zip.ZipEntry("meta.json"))
        z.write(s"""{"id":$id}""".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        z.closeEntry()
        z.close()
        (id, bb.toByteArray)
      })
      .toDF(idCol, "content")
  }

  /** One TAR entry row (exploder posture, like [[zipEntries]]). */
  final case class TarEntryRow(
      id: Long, entry_name: String, n_bytes: Long, entry_md5: String)

  /** Parse a POSIX ustar archive (the .tar.gz training-dump shape; the
    * JDK ships gzip but NO tar reader, so this is a real byte-format
    * walk): 512-byte header blocks — NUL-terminated name, size as
    * 11-digit octal, header CHECKSUM VERIFIED (sum of header bytes
    * with the checksum field read as spaces — a corrupted header
    * refuses instead of mis-framing every later entry), ustar magic,
    * typeflag — then ⌈size/512⌉ data blocks; two zero blocks end the
    * archive. Regular files ('0'/NUL) emit rows; other types are
    * skipped but still advance the block walk. Returns None for any
    * malformed structure. */
  private[graft] def tarEntries(
      b: Array[Byte], maxBytesPerEntry: Long = 1L << 26,
      maxEntries: Int = 1024): Option[Seq[(String, Long, Array[Byte])]] = {
    def octal(off: Int, len: Int): Option[Long] = {
      var v = 0L
      var i = off
      var seen = false
      while (i < off + len) {
        val c = b(i) & 0xff
        if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
        else if (c != ' ' && c != 0) return None
        else if (seen) i = off + len // terminator after digits: stop
        i += 1
      }
      if (seen) Some(v) else None
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Array[Byte])]
    var p = 0
    while (p + 512 <= b.length) {
      if (b.slice(p, p + 512).forall(_ == 0)) {
        // end marker: expect a second zero block (lenient if truncated)
        return Some(out.toSeq)
      }
      if (out.length >= maxEntries) return None
      // magic "ustar" at 257
      if (p + 263 > b.length || b(p + 257) != 'u' || b(p + 258) != 's' ||
        b(p + 259) != 't' || b(p + 260) != 'a' || b(p + 261) != 'r')
        return None
      val size = octal(p + 124, 12).getOrElse(return None)
      if (size < 0 || size > maxBytesPerEntry) return None
      val stored = octal(p + 148, 8).getOrElse(return None)
      var sum = 0L
      var i = 0
      while (i < 512) {
        sum += (if (i >= 148 && i < 156) ' '.toInt else b(p + i) & 0xff)
        i += 1
      }
      if (sum != stored) return None
      val nameEnd = {
        var e = p
        while (e < p + 100 && b(e) != 0) e += 1
        e
      }
      val name = new String(b, p, nameEnd - p,
        java.nio.charset.StandardCharsets.US_ASCII)
      val tf = b(p + 156)
      val dataStart = p + 512
      val dataBlocks = ((size + 511) / 512).toInt
      if (dataStart + dataBlocks.toLong * 512 > b.length) return None
      if (tf == '0' || tf == 0)
        out += ((name, size, java.util.Arrays.copyOfRange(
          b, dataStart, dataStart + size.toInt)))
      p = dataStart + dataBlocks * 512
    }
    Some(out.toSeq) // no end marker: lenient (common with truncated pads)
  }

  /** Per-entry rows from a gzip-compressed ustar column (.tar.gz):
    * gunzip, verified header walk, md5 per regular file. Corrupt
    * archives contribute zero rows. */
  def tarGzEntries(
      df: DataFrame, idCol: String, binCol: String,
      maxBytes: Long = 1L << 26, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap { g =>
        val md = java.security.MessageDigest.getInstance("MD5")
        g.flatMap { case (id, gz) =>
          gunzipBytes(gz, maxBytes).flatMap(tarEntries(_)) match {
            case None => Nil
            case Some(entries) => entries.map { case (name, size, body) =>
              md.reset()
              TarEntryRow(id, name, size,
                md.digest(body).map("%02x".format(_)).mkString)
            }
          }
        }
      })
      .toDF()
  }

  private def gunzipBytes(
      gz: Array[Byte], maxBytes: Long): Option[Array[Byte]] =
    if (gz == null) None // NULL cell — quarantine, not an NPE
    else try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gz))
      try {
        val bb = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = 0
        var total = 0L
        while (n >= 0 && total <= maxBytes) {
          n = in.read(buf)
          if (n > 0) { bb.write(buf, 0, n); total += n }
        }
        if (total > maxBytes) None else Some(bb.toByteArray)
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  /** Build a POSIX ustar archive with REAL octal sizes and valid
    * checksums — the byte twin the parser is tested against. */
  private[graft] def tarBytes(
      entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    def header(name: String, size: Int): Array[Byte] = {
      val h = new Array[Byte](512)
      val nb = name.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      System.arraycopy(nb, 0, h, 0, nb.length)
      def oct(v: Long, off: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        System.arraycopy(padded.getBytes, 0, h, off, len - 1)
        h(off + len - 1) = 0
      }
      oct(420, 100, 8) //                                      mode 0644
      oct(0, 108, 8); oct(0, 116, 8) //                         uid/gid
      oct(size.toLong, 124, 12) //                                  size
      oct(0, 136, 12) //                                          mtime
      h(156) = '0' //                                      regular file
      System.arraycopy("ustar".getBytes, 0, h, 257, 5)
      h(263) = '0'; h(264) = '0' //                        version "00"
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      for (i <- 0 until 512) sum += h(i) & 0xff
      val cs = java.lang.Long.toOctalString(sum)
      val csp = ("0" * (6 - cs.length)) + cs
      System.arraycopy(csp.getBytes, 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      h
    }
    val bb = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, body) =>
      bb.write(header(name, body.length))
      bb.write(body)
      bb.write(new Array[Byte]((512 - body.length % 512) % 512))
    }
    bb.write(new Array[Byte](1024)) // two zero end blocks
    bb.toByteArray
  }

  /** Kernel-built .tar.gz fixture: a two-file ustar (text + json
    * sidecar), gzipped. */
  def tarGzFixture(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val tar = tarBytes(Seq(
          "doc.txt" ->
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          "meta.json" -> s"""{"id":$id}""".getBytes(
            java.nio.charset.StandardCharsets.UTF_8)))
        val bb = new java.io.ByteArrayOutputStream()
        val out = new java.util.zip.GZIPOutputStream(bb)
        out.write(tar)
        out.close()
        (id, bb.toByteArray)
      })
      .toDF(idCol, "content")
  }

  /** Gate fixture: per-row text re-encoded in an id-alternating
    * charset (UTF-8 / ISO-8859-1), with a non-ASCII suffix so the two
    * encodings genuinely differ at the byte level. */
  def charsetFixture(
      df: DataFrame, idCol: String, textCol: String,
      suffix: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val cs = if (id % 2 == 0) "utf-8" else "iso-8859-1"
        (id, (text + suffix).getBytes(cs), cs)
      })
      .toDF(idCol, "content", "charset")
  }

  /** Gate fixture: gzip each row's text in the kernel — (id, content)
    * with content = gzip(UTF-8 bytes). One mapPartitions, no shuffle. */
  def gzipTextFixture(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bb = new java.io.ByteArrayOutputStream()
        val out = new java.util.zip.GZIPOutputStream(bb)
        out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
        (id, bb.toByteArray)
      })
      .toDF(idCol, "content")
  }
}
