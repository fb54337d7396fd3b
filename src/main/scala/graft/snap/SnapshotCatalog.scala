package graft.snap

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Iceberg-style snapshot catalog, from scratch (no Iceberg runtime exists
 * in this sandbox — SURVEY §7.1/§7.5): a table is a directory of immutable
 * parquet data files plus a chain of JSON manifests; the CURRENT pointer
 * is flipped by atomic rename, so readers never observe a torn commit.
 *
 * Layout:
 *   <root>/<table>/data/snap-<id>/…parquet      immutable data files
 *   <root>/<table>/manifest-<id>.json           snapshot metadata
 *   <root>/<table>/lineage-<id>.json            that commit's lineage rows
 *   <root>/<table>/CURRENT                      file containing <id>
 *
 * Manifest records: snapshot id, parent id, completed work units
 * ("waves" — the resume key), per-file row counts, and the list of
 * lineage SIDECAR files. Per-partition lineage rows (partition id,
 * input/output rows, wall ms — the north rule's "per-partition lineage +
 * metrics") live one immutable sidecar per commit: inlining them made
 * every manifest carry (and re-render) the FULL history —
 * O(waves² · partitions) JSON bytes at 64 waves × real partition counts
 * — where sidecars keep manifests O(waves) and each commit writes only
 * its own rows.
 *
 * Commit protocol (SURVEY §7.4-3): write data files → write manifest to a
 * temp name → fsync-equivalent move → atomic rename CURRENT.tmp→CURRENT.
 * Idempotent re-runs: committing an already-completed wave is a no-op
 * (the wave id is recorded in the manifest).
 */
object SnapshotCatalog {

  final case class LineageRow(
      wave: Int, partitionId: Int, inputRows: Long, outputRows: Long, wallMs: Long)

  final case class Manifest(
      table: String,
      snapshotId: Long,
      parentId: Long,
      completedWaves: Seq[Int],
      dataDirs: Seq[String],
      rowsPerWave: Map[Int, Long],
      lineageFiles: Seq[String])

  // ---- JSON (hand-rolled; no JSON dep in the offline sandbox) ------------
  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  } + "\""

  private def renderLineage(rows: Seq[LineageRow]): String =
    rows.map(l =>
      s"""{"wave":${l.wave},"partition_id":${l.partitionId},"input_rows":${l.inputRows},""" +
        s""""output_rows":${l.outputRows},"wall_ms":${l.wallMs}}""").mkString("[", ",", "]")

  private def parseLineage(s: String): Seq[LineageRow] =
    ("""\{"wave":(\d+),"partition_id":(\d+),"input_rows":(\d+),""" +
      """"output_rows":(\d+),"wall_ms":(\d+)\}""").r.findAllMatchIn(s)
      .map(m => LineageRow(m.group(1).toInt, m.group(2).toInt,
        m.group(3).toLong, m.group(4).toLong, m.group(5).toLong)).toSeq

  private def render(m: Manifest): String = {
    val rows = m.rowsPerWave.toSeq.sortBy(_._1)
      .map { case (w, n) => s"${q(w.toString)}: $n" }.mkString("{", ",", "}")
    s"""{"table":${q(m.table)},"snapshot_id":${m.snapshotId},"parent_id":${m.parentId},
       |"completed_waves":${m.completedWaves.sorted.mkString("[", ",", "]")},
       |"data_dirs":${m.dataDirs.map(q).mkString("[", ",", "]")},
       |"rows_per_wave":$rows,
       |"lineage_files":${m.lineageFiles.map(q).mkString("[", ",", "]")}}""".stripMargin
  }

  // minimal parser for the fields we wrote (flat, no nested strings with
  // brackets — safe for our own output)
  private def parse(s: String): Manifest = {
    def longField(name: String): Long =
      s""""$name":\\s*(-?\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(-1L)
    def strField(name: String): String =
      ("\"" + name + "\":\\s*\"([^\"]*)\"").r.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    def intList(name: String): Seq[Int] = {
      val body = ("\"" + name + "\":\\s*\\[([^\\]]*)\\]").r
        .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      body.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    }
    def strList(name: String): Seq[String] = {
      val body = ("\"" + name + "\":\\s*\\[([^\\]]*)\\]").r
        .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      "\"([^\"]*)\"".r.findAllMatchIn(body).map(_.group(1)).toSeq
    }
    def rowsMap: Map[Int, Long] = {
      val body = "\"rows_per_wave\":\\s*\\{([^}]*)\\}".r
        .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      "\"(\\d+)\":\\s*(\\d+)".r.findAllMatchIn(body)
        .map(m => m.group(1).toInt -> m.group(2).toLong).toMap
    }
    Manifest(strField("table"), longField("snapshot_id"), longField("parent_id"),
      intList("completed_waves"), strList("data_dirs"), rowsMap,
      strList("lineage_files"))
  }

  // ---- catalog ops --------------------------------------------------------

  private def tableDir(root: String, table: String): Path = Paths.get(root, table)

  /** Registered tables under a catalog root (reference: list_projects,
   * tools/registration.py:115-122) — any directory with a CURRENT pointer. */
  def listTables(root: String): Seq[String] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) Nil
    else {
      val stream = Files.list(r)
      try stream.iterator().asScala
        .filter(p => Files.exists(p.resolve("CURRENT")))
        .map(_.getFileName.toString).toSeq.sorted
      finally stream.close()
    }
  }

  /** Drop a table: delete its directory tree (reference: remove_project,
   * tools/registration.py:124-133). Idempotent. */
  def dropTable(root: String, table: String): Unit = {
    val dir = tableDir(root, table)
    if (Files.exists(dir)) deleteTree(dir)
  }

  private def deleteTree(p: Path): Unit = {
    val stream = Files.walk(p)
    try stream.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(Files.delete)
    finally stream.close()
  }

  def currentSnapshotId(root: String, table: String): Option[Long] = {
    val cur = tableDir(root, table).resolve("CURRENT")
    if (Files.exists(cur)) Some(new String(Files.readAllBytes(cur)).trim.toLong) else None
  }

  def currentManifest(root: String, table: String): Option[Manifest] =
    currentSnapshotId(root, table).map { id =>
      parse(new String(Files.readAllBytes(tableDir(root, table).resolve(s"manifest-$id.json"))))
    }

  /** Atomically commit a new manifest (data dirs must already be written). */
  def commitManifest(root: String, table: String, m: Manifest): Unit = {
    val dir = tableDir(root, table)
    Files.createDirectories(dir)
    Files.write(dir.resolve(s"manifest-${m.snapshotId}.json"),
      render(m).getBytes("UTF-8"))
    val tmp = dir.resolve("CURRENT.tmp")
    Files.write(tmp, m.snapshotId.toString.getBytes("UTF-8"))
    Files.move(tmp, dir.resolve("CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read the CURRENT snapshot of a table. */
  def read(spark: SparkSession, root: String, table: String): DataFrame = {
    val m = currentManifest(root, table)
      .getOrElse(throw new IllegalStateException(s"no CURRENT snapshot for $table"))
    readManifest(spark, root, m)
  }

  /** Time travel: read the table AS OF `snapshotId` (manifests are
   * immutable, so any historical snapshot stays readable — the
   * Iceberg-style property that makes resume + audit cheap). */
  def readAt(spark: SparkSession, root: String, table: String, snapshotId: Long): DataFrame = {
    val p = tableDir(root, table).resolve(s"manifest-$snapshotId.json")
    require(Files.exists(p), s"no snapshot $snapshotId for $table")
    readManifest(spark, root, parse(new String(Files.readAllBytes(p))))
  }

  private def readManifest(spark: SparkSession, root: String, m: Manifest): DataFrame = {
    val dirs = m.dataDirs.map(d => tableDir(root, m.table).resolve(d).toString)
    if (dirs.isEmpty) spark.emptyDataFrame else spark.read.parquet(dirs: _*)
  }

  /**
   * Snapshot diff (SURVEY §4: the reference's mtime-keyed parse cache →
   * content-hash diff): rows of `incoming` whose (key, content) pair is
   * NOT already in the CURRENT snapshot — an anti-join on
   * (key, xxhash64(content)), so unchanged rows are never re-processed
   * across runs. Returns all of `incoming` when the table doesn't exist.
   */
  def diffNew(spark: SparkSession, incoming: DataFrame, keyCol: String,
      contentCol: String, root: String, table: String): DataFrame = {
    if (currentManifest(root, table).isEmpty) return incoming
    val existing = read(spark, root, table)
      .select(col(keyCol).as("__k"), xxhash64(col(contentCol)).as("__h")).distinct()
    incoming.join(existing,
      incoming(keyCol) === col("__k") && xxhash64(incoming(contentCol)) === col("__h"),
      "left_anti")
  }

  /**
   * Snapshot-to-snapshot diff — the time-travel audit / CDC-lite read
   * (Iceberg's changelog-scan analogue): what changed between two
   * committed snapshots of the same table. Rows are identified by
   * (key, content hash): a key whose content changed between the
   * snapshots appears ONCE as `removed` (old hash) and ONCE as `added`
   * (new hash); pure inserts/deletes appear once. For the append-only
   * wave tables this catalog writes, a child-vs-parent diff is exactly
   * the child's new waves and `removed` is empty; `compact`'s rewrite
   * preserves content, so a pre-vs-post-compaction diff is EMPTY — both
   * invariants pinned in SnapshotCatalogSpec.
   *
   * Scale shape: each side is projected to (key, hash) AT THE SCAN
   * (column pruning keeps payload bytes out of the read and the
   * anti-join shuffles carry two 8-byte-ish columns per row — the same
   * digest discipline as [[diffNew]]); re-join payloads by key from
   * whichever snapshot you need them. The content hash is the PORTABLE
   * md5-52 ([[graft.operators.Sketches.portableHash52]]) so the q124
   * oracle replays the diff bit-for-bit — 52 bits means ~10^-9 pair
   * collision odds at a million changed rows per key-space, and a
   * collision only suppresses one changed row from the report, never
   * corrupts the table.
   *
   * @return (key, content_hash, change ∈ {'added','removed'}), distinct
   */
  def diffSnapshots(spark: SparkSession, root: String, table: String,
      fromId: Long, toId: Long, keyCol: String, contentCol: String): DataFrame = {
    // each side is referenced TWICE (the added and removed anti-joins) —
    // materialize the narrow (key, hash) frames once or both scans +
    // distinct shuffles run twice (the documented double-reference trap).
    // OWNERSHIP: the returned frame rides these blocks; release via
    // GraftBridge.releaseCheckpointBlocks after the last action.
    def keyed(id: Long): DataFrame =
      readAt(spark, root, table, id).select(col(keyCol).as("key"),
        graft.operators.Sketches.portableHash52(col(contentCol)).as("content_hash"))
        .distinct().localCheckpoint(true)
    val from = keyed(fromId)
    val to = keyed(toId)
    to.join(from, Seq("key", "content_hash"), "left_anti")
      .withColumn("change", lit("added"))
      .unionByName(
        from.join(to, Seq("key", "content_hash"), "left_anti")
          .withColumn("change", lit("removed")))
  }

  /** All lineage rows visible from a manifest (read from its sidecars —
   * immutable, so any historical snapshot's lineage stays readable). */
  def lineageRows(root: String, m: Manifest): Seq[LineageRow] =
    m.lineageFiles.flatMap { f =>
      parseLineage(new String(Files.readAllBytes(tableDir(root, m.table).resolve(f)), "UTF-8"))
    }

  /** Lineage rows of the CURRENT snapshot as a DataFrame. */
  def lineage(spark: SparkSession, root: String, table: String): DataFrame = {
    import spark.implicits._
    currentManifest(root, table).map(lineageRows(root, _)).getOrElse(Nil).toDF()
  }

  /** Write this commit's lineage sidecar; returns the manifest-relative
   * file name (no file is written for an empty row set). */
  private def writeLineageSidecar(root: String, table: String,
      snapId: Long, rows: Seq[LineageRow]): Option[String] = {
    if (rows.isEmpty) return None
    val name = s"lineage-$snapId.json"
    val dir = tableDir(root, table)
    Files.createDirectories(dir)
    Files.write(dir.resolve(name), renderLineage(rows).getBytes("UTF-8"))
    Some(name)
  }

  /** What [[vacuum]] removed. */
  final case class VacuumStats(manifests: Int, lineageFiles: Int, dataDirs: Int)

  /**
   * Storage hygiene (Iceberg expire-snapshots + remove-orphans analogue,
   * from scratch): keep the newest `keepLast` manifests (always including
   * CURRENT), delete older manifests and any lineage sidecar no kept
   * manifest references, and delete DATA directories no kept manifest
   * references. Because `dataDirs` accumulates down the manifest chain,
   * data referenced by a kept snapshot is never touched — what actually
   * gets reclaimed is ORPHANS: `data/snap-*` dirs written by a run that
   * crashed before its commit, and `data/run-*` single-pass staging from
   * a crashed pass (a full staged copy of every wave — the big leak at
   * 100 TB). Time travel to expired snapshot ids stops working; kept ids
   * (and their full lineage history) remain readable.
   *
   * Not safe concurrently with a writer on the SAME table (the writer may
   * have staged data not yet committed) — same caveat as Iceberg's
   * remove-orphans; run it between loads.
   */
  def vacuum(root: String, table: String, keepLast: Int = 2): VacuumStats = {
    require(keepLast >= 1)
    val dir = tableDir(root, table)
    val current = currentSnapshotId(root, table)
      .getOrElse(throw new IllegalStateException(s"no CURRENT snapshot for $table"))
    val allIds = {
      val stream = Files.list(dir)
      try stream.iterator().asScala.map(_.getFileName.toString)
        .collect { case n if n.startsWith("manifest-") && n.endsWith(".json") =>
          n.stripPrefix("manifest-").stripSuffix(".json").toLong }
        .toSeq.sorted
      finally stream.close()
    }
    val keptIds = (allIds.takeRight(keepLast) :+ current).distinct.toSet
    val kept = keptIds.toSeq.map(id =>
      parse(new String(Files.readAllBytes(dir.resolve(s"manifest-$id.json")), "UTF-8")))
    val keptData = kept.flatMap(_.dataDirs).toSet
    val keptLineage = kept.flatMap(_.lineageFiles).toSet

    var mDel = 0; var lDel = 0; var dDel = 0
    allIds.filterNot(keptIds).foreach { id =>
      Files.delete(dir.resolve(s"manifest-$id.json")); mDel += 1
    }
    // lineage sidecars no kept manifest references: since lineageFiles
    // accumulates down the chain, these can only be ORPHANS — a sidecar
    // written by a commit that crashed before its manifest rename
    val linOrphans = {
      val stream = Files.list(dir)
      try stream.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("lineage-") && n.endsWith(".json") &&
          !keptLineage.contains(n)).toSeq
      finally stream.close()
    }
    linOrphans.foreach { n => Files.delete(dir.resolve(n)); lDel += 1 }
    val dataRoot = dir.resolve("data")
    if (Files.isDirectory(dataRoot)) {
      val top = { val s = Files.list(dataRoot); try s.iterator().asScala.toSeq finally s.close() }
      top.foreach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("snap-")) {
          if (!keptData.contains(s"data/$name")) { deleteTree(p); dDel += 1 }
        } else if (name.startsWith("run-") && Files.isDirectory(p)) {
          val kids = { val s = Files.list(p); try s.iterator().asScala.toSeq finally s.close() }
          val waveKids = kids.filter(_.getFileName.toString.startsWith("__wave="))
          waveKids.foreach { k =>
            if (!keptData.contains(s"data/$name/${k.getFileName}")) { deleteTree(k); dDel += 1 }
          }
          val left = { val s = Files.list(p); try s.iterator().asScala.toSeq finally s.close() }
          // staging root with no referenced wave dirs left → fully orphaned;
          // count it as a reclaimed dir only if no wave child was counted
          if (!left.exists(_.getFileName.toString.startsWith("__wave="))) {
            deleteTree(p)
            if (waveKids.isEmpty) dDel += 1
          }
        }
      }
    }
    VacuumStats(mDel, lDel, dDel)
  }

  /** What [[compact]] did. */
  final case class CompactStats(dirsBefore: Int, filesBefore: Int, filesAfter: Int, rows: Long)

  /** Row count of one parquet file from its footer — a driver-side
   * metadata read (no Spark job, no data pages). */
  private def footerRows(conf: org.apache.hadoop.conf.Configuration, p: Path): Long = {
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(p.toUri), conf))
    try r.getRecordCount finally r.close()
  }

  /** Per-file (pid, rows) for a just-written data dir, zero-row files
   * skipped (lineage rows exist exactly for partitions that hold data —
   * the same contract the former shape had). Replaces the read-back
   * Spark job (full scan + shuffle + collect PER COMMIT — at 64 waves
   * that was one extra pass over every written byte) with driver-side
   * footer metadata reads. */
  private def fileRows(spark: SparkSession, dir: Path): Seq[(Int, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    parquetFiles(dir).sortBy(_.getFileName.toString)
      .map(f => footerRows(conf, f))
      .zipWithIndex.collect { case (n, i) if n > 0 => (i, n) }
  }

  private[snap] def parquetFiles(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Nil
    else {
      val stream = Files.walk(dir)
      try stream.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet")).toSeq
      finally stream.close()
    }

  /**
   * Small-file compaction — the Iceberg rewrite-data-files analogue, from
   * scratch. A wave-committed table accumulates one data dir per commit;
   * at 64 waves × shuffle-partition files each, every subsequent read
   * pays per-file open/footer cost and the driver pays per-file planning
   * — the canonical small-files problem at 100 TB. Compaction rewrites
   * the CURRENT row set into ONE new immutable dir of `targetFiles`
   * files and commits it as a new snapshot referencing only that dir,
   * while history is preserved verbatim: `completedWaves` (the resume
   * key — re-running a committed wave stays a no-op), `rowsPerWave`,
   * lineage sidecars, and every older manifest (time travel to
   * pre-compaction snapshots still reads the original files until a
   * later [[vacuum]] expires them — which is when the old dirs' storage
   * is actually reclaimed).
   *
   * With `sortBy`, rows are range-partitioned then sorted on those
   * columns (Iceberg's sort-order rewrite): files carry disjoint min/max
   * ranges, so predicate pushdown prunes whole files on read — the same
   * layout win `operators/SpatialLayout` builds for cell ids.
   *
   * Crash-safe: data is fully written before the atomic CURRENT flip; a
   * crash mid-write leaves an orphan `data/snap-*` dir that [[vacuum]]
   * removes. Before the flip, rows are recounted from the written files
   * (parquet footer metadata — no data scan) and must equal the
   * manifest's committed total; a lost-row rewrite aborts loudly with
   * CURRENT untouched. Not safe concurrently with a writer on the same
   * table (same contract as [[vacuum]]).
   */
  def compact(spark: SparkSession, root: String, table: String,
      targetFiles: Int, sortBy: Seq[String] = Nil): CompactStats = {
    require(targetFiles >= 1, s"targetFiles must be >= 1 (got $targetFiles)")
    val m = currentManifest(root, table)
      .getOrElse(throw new IllegalStateException(s"no CURRENT snapshot for $table"))
    if (m.dataDirs.isEmpty) return CompactStats(0, 0, 0, 0L)
    val dir = tableDir(root, table)
    val filesBefore = m.dataDirs.map(d => parquetFiles(dir.resolve(d)).size).sum
    val df = readManifest(spark, root, m)
    val rewritten =
      if (sortBy.nonEmpty) {
        val cols = sortBy.map(col)
        df.repartitionByRange(targetFiles, cols: _*).sortWithinPartitions(cols: _*)
      } else df.repartition(targetFiles)
    val snapId = m.snapshotId + 1
    val dataDir = s"data/snap-$snapId"
    val target = dir.resolve(dataDir)
    rewritten.write.mode("overwrite").parquet(target.toString)
    // row-total proof from the written footers (metadata only — the
    // former spark.read.count() launched a full read-back job)
    val rows = {
      val conf = spark.sessionState.newHadoopConf()
      parquetFiles(target).map(f => footerRows(conf, f)).sum
    }
    val expected = m.rowsPerWave.values.sum
    require(rows == expected,
      s"compaction rewrote $rows rows but the manifest committed $expected " +
        s"— aborting, CURRENT unchanged (is a concurrent writer active, or a data file missing?)")
    commitManifest(root, table,
      m.copy(snapshotId = snapId, parentId = m.snapshotId, dataDirs = Seq(dataDir)))
    CompactStats(m.dataDirs.size, filesBefore, parquetFiles(target).size, rows)
  }

  /**
   * Resumable wave-partitioned run — the north rule's checkpoint/resume.
   *
   * The input is split into `waves` deterministic buckets by
   * pmod(xxhash64(key), waves). Each wave: transform → write an immutable
   * data dir → commit a new snapshot whose manifest marks the wave
   * completed and carries per-partition lineage. A re-run (after a crash
   * or a kill) skips every wave already in the CURRENT manifest — the
   * anti-join of SURVEY §2.7 done on metadata, not data.
   *
   * @return the number of waves actually executed this run
   */
  /**
   * Transform + write + commit ONE wave idempotently; returns false (and
   * does nothing) when the wave is already in the CURRENT manifest.
   * Shared by [[resumableRun]] (wave = deterministic hash bucket) and the
   * streaming sink (`streaming/Ingest.snapshotSink`, wave = micro-batch
   * id — Structured Streaming replays a failed batch with the SAME id,
   * so this idempotence makes the sink commit exactly-once).
   */
  def commitWave(spark: SparkSession, waveIn: DataFrame, wave: Int,
      root: String, table: String)(transform: DataFrame => DataFrame): Boolean = {
    val prev = currentManifest(root, table)
    if (prev.exists(_.completedWaves.contains(wave))) return false
    val t0 = System.nanoTime()
    // observe(): the wave's input count rides the SAME job as the
    // write below — no separate count() pass over the input. (At 64
    // waves × 100 TB the old shape cost one extra full scan per wave.)
    // Name is time-suffixed: Observation names must not repeat across
    // the retries/streaming batches of one session.
    val obs = org.apache.spark.sql.Observation(s"${table}_wave_${wave}_$t0")
    val out = transform(waveIn.observe(obs, count(lit(1)).as("in_rows")))
    val snapId = prev.map(_.snapshotId + 1).getOrElse(0L)
    val dataDir = s"data/snap-$snapId"
    val target = tableDir(root, table).resolve(dataDir)
    out.write.mode("overwrite").parquet(target.toString)
    val wallMs = (System.nanoTime() - t0) / 1000000
    // per-partition lineage from the written files' parquet footers —
    // metadata only, no read-back job (guide §1: don't re-scan what you
    // just wrote to count it)
    val inRows = obs.get("in_rows").asInstanceOf[Long]
    val perPart = fileRows(spark, target)
      .map { case (pid, n) => LineageRow(wave, pid, inRows, n, wallMs) }
    val outRows = perPart.map(_.outputRows).sum
    val linFile = writeLineageSidecar(root, table, snapId, perPart.toSeq)
    val m = Manifest(
      table = table,
      snapshotId = snapId,
      parentId = prev.map(_.snapshotId).getOrElse(-1L),
      completedWaves = (prev.map(_.completedWaves).getOrElse(Nil) :+ wave).sorted,
      dataDirs = prev.map(_.dataDirs).getOrElse(Nil) :+ dataDir,
      rowsPerWave = prev.map(_.rowsPerWave).getOrElse(Map.empty) + (wave -> outRows),
      lineageFiles = prev.map(_.lineageFiles).getOrElse(Nil) ++ linFile)
    commitManifest(root, table, m)
    true
  }

  def resumableRun(
      spark: SparkSession,
      input: DataFrame,
      keyCol: String,
      waves: Int,
      root: String,
      table: String)(transform: DataFrame => DataFrame): Int =
    resumableRunBy(spark, input, pmod(xxhash64(col(keyCol)), lit(waves)), waves,
      root, table)(transform)

  /** [[resumableRun]] with a caller-supplied wave expression (values must
   * be deterministic in row content and in [0, waves) — the same
   * retry-safety contract as the default xxhash64 bucketing; e.g. an
   * md5-derived bucket when downstream tooling must recompute the split). */
  def resumableRunBy(
      spark: SparkSession,
      input: DataFrame,
      waveCol: org.apache.spark.sql.Column,
      waves: Int,
      root: String,
      table: String)(transform: DataFrame => DataFrame): Int = {
    var ran = 0
    // one materialization of the input feeds every wave's filter: the
    // former shape re-ran the full input scan (plus whatever upstream
    // plan produced it) once PER WAVE — waves× passes over the source.
    // MEMORY_AND_DISK spills rather than evicts at scale; for inputs too
    // large to spill once, [[resumableRunSinglePass]] is the one-scan
    // shape. Unpersisted before return: every wave is durable in storage,
    // so nothing downstream references these blocks.
    val cached = input.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      (0 until waves).foreach { w =>
        val waveIn = cached.where(waveCol === w)
        if (commitWave(spark, waveIn, w, root, table)(transform)) ran += 1
      }
    } finally cached.unpersist(false)
    ran
  }

  /**
   * Single-pass variant of [[resumableRun]] for ROW-LOCAL transforms: ONE
   * scan of the input writes every wave at once via
   * `partitionBy(__wave)`, then each wave's directory is committed as its
   * own snapshot (manifest chain identical to the per-wave path). At 64
   * waves over 100 TB the per-wave path scans the input 64×; this scans
   * once.
   *
   * Contract: `transform` receives the input WITH a `__wave` column and
   * must preserve it (it is consumed as the partition key and not written
   * into data files). Trade-off vs the per-wave path: commit granularity
   * here is the whole pass — a crash mid-write loses all in-flight waves
   * (rerun redoes the single pass); once ANY wave is committed, the method
   * falls back to the per-wave path for the remainder, so resume still
   * works at wave granularity across runs.
   *
   * @return number of waves committed this run
   */
  def resumableRunSinglePass(
      spark: SparkSession,
      input: DataFrame,
      keyCol: String,
      waves: Int,
      root: String,
      table: String)(transform: DataFrame => DataFrame): Int = {
    val done = currentManifest(root, table).map(_.completedWaves.toSet).getOrElse(Set.empty)
    if (done.nonEmpty)
      return resumableRun(spark, input, keyCol, waves, root, table)(
        df => transform(df.withColumn("__wave",
          pmod(xxhash64(col(keyCol)), lit(waves)).cast("int"))).drop("__wave"))
    val t0 = System.nanoTime()
    // per-wave input counts ride the one job (observe, no extra scans)
    val obs = org.apache.spark.sql.Observation(s"${table}_singlepass")
    val waveCounts = (0 until waves).map(w =>
      sum(when(col("__wave") === w, 1L).otherwise(0L)).as(s"in_$w"))
    val withWave = input
      .withColumn("__wave", pmod(xxhash64(col(keyCol)), lit(waves)).cast("int"))
      .observe(obs, waveCounts.head, waveCounts.tail: _*)
    val out = transform(withWave)
    require(out.columns.contains("__wave"),
      "single-pass transform must preserve the __wave column")
    val stage = s"data/run-${System.nanoTime()}"
    val stageDir = tableDir(root, table).resolve(stage)
    out.write.mode("overwrite").partitionBy("__wave").parquet(stageDir.toString)
    val wallMs = (System.nanoTime() - t0) / 1000000
    val inRows = obs.get
    // commit each wave's directory in wave order (same manifest chain
    // shape as the per-wave path; lineage from the written files)
    (0 until waves).foreach { w =>
      val dataDir = s"$stage/__wave=$w"
      val waveDirPath = stageDir.resolve(s"__wave=$w")
      val perPart =
        if (!Files.exists(waveDirPath)) Seq.empty[LineageRow] // empty wave
        else fileRows(spark, waveDirPath).map { case (pid, n) =>
          LineageRow(w, pid, inRows(s"in_$w").asInstanceOf[Long], n, wallMs) }
      val prev = currentManifest(root, table)
      val snapId = prev.map(_.snapshotId + 1).getOrElse(0L)
      val linFile = writeLineageSidecar(root, table, snapId, perPart.toSeq)
      val m = Manifest(
        table = table,
        snapshotId = snapId,
        parentId = prev.map(_.snapshotId).getOrElse(-1L),
        completedWaves = (prev.map(_.completedWaves).getOrElse(Nil) :+ w).sorted,
        dataDirs =
          if (Files.exists(waveDirPath)) prev.map(_.dataDirs).getOrElse(Nil) :+ dataDir
          else prev.map(_.dataDirs).getOrElse(Nil),
        rowsPerWave = prev.map(_.rowsPerWave).getOrElse(Map.empty) +
          (w -> perPart.map(_.outputRows).sum),
        lineageFiles = prev.map(_.lineageFiles).getOrElse(Nil) ++ linFile)
      commitManifest(root, table, m)
    }
    waves
  }
}
