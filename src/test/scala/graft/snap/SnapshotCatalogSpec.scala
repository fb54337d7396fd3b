package graft.snap

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

class SnapshotCatalogSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snap").toString

  private def input = (0L until 1000L).map(i => (i, s"u$i", i % 7)).toDF("id", "url", "v")

  test("commit + read round trip with atomic CURRENT pointer") {
    val root = freshRoot()
    val ran = SnapshotCatalog.resumableRun(spark, input, "url", waves = 4, root, "t1")(
      df => df.withColumn("out", col("v") * 2))
    assert(ran == 4)
    val back = SnapshotCatalog.read(spark, root, "t1")
    assert(back.count() == 1000)
    assert(back.where(col("out") =!= col("v") * 2).count() == 0)
    assert(SnapshotCatalog.currentSnapshotId(root, "t1").contains(3L))
    // time travel: snapshot 0 holds exactly wave 0's rows
    val asOf0 = SnapshotCatalog.readAt(spark, root, "t1", 0L)
    val wave0Rows = SnapshotCatalog.currentManifest(root, "t1").get.rowsPerWave(0)
    assert(asOf0.count() == wave0Rows && wave0Rows > 0)
  }

  test("diffSnapshots: child-vs-parent = the new wave; self-diff and compaction diffs are empty") {
    val root = freshRoot()
    SnapshotCatalog.resumableRun(spark, input, "url", waves = 3, root, "td")(
      df => df.select(col("url"), col("v").cast("string").as("content")))
    val cur = SnapshotCatalog.currentManifest(root, "td").get
    // append-only: diff(parent, current) = exactly the last wave's rows, all 'added'
    val d = SnapshotCatalog.diffSnapshots(spark, root, "td",
      cur.parentId, cur.snapshotId, "url", "content")
    val added = d.where(col("change") === "added").count()
    assert(added == cur.rowsPerWave(2) && added > 0)
    assert(d.where(col("change") === "removed").count() == 0)
    // the added key set IS the last wave's key set
    val lastWaveKeys = SnapshotCatalog.readAt(spark, root, "td", cur.snapshotId)
      .select("url").as[String].collect().toSet --
      SnapshotCatalog.readAt(spark, root, "td", cur.parentId)
        .select("url").as[String].collect().toSet
    assert(d.where(col("change") === "added").select("key").as[String].collect().toSet
      == lastWaveKeys)
    // self-diff is empty
    assert(SnapshotCatalog.diffSnapshots(spark, root, "td",
      cur.snapshotId, cur.snapshotId, "url", "content").count() == 0)
    // compaction rewrites files but preserves content: diff pre-vs-post is empty
    val preId = cur.snapshotId
    SnapshotCatalog.compact(spark, root, "td", targetFiles = 1)
    val postId = SnapshotCatalog.currentSnapshotId(root, "td").get
    assert(postId != preId)
    assert(SnapshotCatalog.diffSnapshots(spark, root, "td",
      preId, postId, "url", "content").count() == 0)
  }

  test("resume: a rerun skips completed waves; partial run completes to the same result") {
    val root = freshRoot()
    // simulate a crash after 2 of 6 waves: run a transform that THROWS on
    // wave 3's data the first time
    var crashed = false
    try {
      SnapshotCatalog.resumableRun(spark, input, "url", waves = 6, root, "t2") { df =>
        val m = SnapshotCatalog.currentManifest(root, "t2")
        if (m.exists(_.completedWaves.size == 2)) throw new RuntimeException("injected crash")
        df.withColumn("out", col("v") + 1)
      }
    } catch { case e: RuntimeException if e.getMessage == "injected crash" => crashed = true }
    assert(crashed)
    val doneAfterCrash = SnapshotCatalog.currentManifest(root, "t2").get.completedWaves
    assert(doneAfterCrash.size == 2)

    // rerun: only the remaining waves execute
    val ran = SnapshotCatalog.resumableRun(spark, input, "url", waves = 6, root, "t2")(
      df => df.withColumn("out", col("v") + 1))
    assert(ran == 4)
    val back = SnapshotCatalog.read(spark, root, "t2")
    assert(back.count() == 1000)
    assert(back.select("id").distinct().count() == 1000)
    // idempotent: another rerun is a no-op
    assert(SnapshotCatalog.resumableRun(spark, input, "url", waves = 6, root, "t2")(
      df => df.withColumn("out", col("v") + 1)) == 0)
  }

  test("single-pass run commits the same snapshot chain as the per-wave path") {
    val rootA = freshRoot(); val rootB = freshRoot()
    SnapshotCatalog.resumableRun(spark, input, "url", waves = 4, rootA, "t")(
      df => df.withColumn("out", col("v") * 2))
    val ran = SnapshotCatalog.resumableRunSinglePass(spark, input, "url", waves = 4, rootB, "t")(
      df => df.withColumn("out", col("v") * 2))
    assert(ran == 4)
    val a = SnapshotCatalog.read(spark, rootA, "t")
    val b = SnapshotCatalog.read(spark, rootB, "t")
    assert(b.count() == 1000)
    assert(a.select("id", "out").exceptAll(b.select("id", "out")).count() == 0)
    assert(b.select("id", "out").exceptAll(a.select("id", "out")).count() == 0)
    // same wave bucketing and per-wave rows + input counts
    val mA = SnapshotCatalog.currentManifest(rootA, "t").get
    val mB = SnapshotCatalog.currentManifest(rootB, "t").get
    assert(mA.rowsPerWave == mB.rowsPerWave)
    assert(mB.completedWaves == Seq(0, 1, 2, 3))
    def inByWave(root: String, m: SnapshotCatalog.Manifest) =
      SnapshotCatalog.lineageRows(root, m).map(l => l.wave -> l.inputRows).distinct.toMap
    assert(inByWave(rootA, mA) == inByWave(rootB, mB))
    // rerun is a no-op; partially-done tables fall back to per-wave
    assert(SnapshotCatalog.resumableRunSinglePass(spark, input, "url", 4, rootB, "t")(
      df => df.withColumn("out", col("v") * 2)) == 0)
  }

  test("diffNew: only changed/new rows survive the content-hash anti-join") {
    val root = freshRoot()
    SnapshotCatalog.resumableRun(spark, input, "url", waves = 2, root, "t4")(identity[org.apache.spark.sql.DataFrame])
    // same content → empty diff
    assert(SnapshotCatalog.diffNew(spark, input, "url", "v", root, "t4").count() == 0)
    // 10 changed rows + 5 new rows → 15
    val changed = input.withColumn("v", when(col("id") < 10, col("v") + 100).otherwise(col("v")))
    val newRows = (1000L until 1005L).map(i => (i, s"u$i", i % 7)).toDF("id", "url", "v")
    assert(SnapshotCatalog.diffNew(spark, changed.union(newRows), "url", "v", root, "t4").count() == 15)
    // nonexistent table → everything is new
    assert(SnapshotCatalog.diffNew(spark, input, "url", "v", root, "nope").count() == 1000)
  }

  test("lineage rows carry per-partition counters") {
    val root = freshRoot()
    SnapshotCatalog.resumableRun(spark, input, "url", waves = 2, root, "t3")(identity[org.apache.spark.sql.DataFrame])
    val lin = SnapshotCatalog.lineage(spark, root, "t3")
    assert(lin.columns.toSet == Set("wave", "partitionId", "inputRows", "outputRows", "wallMs"))
    val byWave = lin.groupBy("wave").agg(sum("outputRows").as("out")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byWave.values.sum == 1000)
    assert(byWave.keySet == Set(0, 1))
    // input rows recorded per wave match output for the identity transform
    val inByWave = lin.select("wave", "inputRows").distinct().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(inByWave == byWave)
  }

  test("vacuum keeps CURRENT + history depth, reclaims orphans, preserves data and lineage") {
    val root = freshRoot()
    SnapshotCatalog.resumableRun(spark, input, "url", waves = 4, root, "t6")(
      df => df.withColumn("out", col("v") + 1))
    val dir = java.nio.file.Paths.get(root, "t6")
    // plant orphans: an uncommitted snap dir and a crashed single-pass stage
    Files.createDirectories(dir.resolve("data/snap-99"))
    Files.write(dir.resolve("data/snap-99/part-0.parquet"), Array[Byte](1, 2))
    Files.createDirectories(dir.resolve("data/run-777/__wave=0"))
    Files.write(dir.resolve("data/run-777/__wave=0/p.parquet"), Array[Byte](3))
    Files.write(dir.resolve("data/run-777/_SUCCESS"), Array.empty[Byte])

    val before = SnapshotCatalog.read(spark, root, "t6").collect().toSet
    val stats = SnapshotCatalog.vacuum(root, "t6", keepLast = 2)
    // manifests 0,1 expired; snap-99 + run-777 stage reclaimed; committed
    // data dirs are all referenced by the kept manifests → untouched
    assert(stats.manifests == 2, stats)
    assert(stats.dataDirs == 2, stats)
    assert(!Files.exists(dir.resolve("data/snap-99")))
    assert(!Files.exists(dir.resolve("data/run-777")))
    assert(SnapshotCatalog.read(spark, root, "t6").collect().toSet == before)
    // time travel: kept ids readable, expired ids gone
    assert(SnapshotCatalog.readAt(spark, root, "t6", 3L).count() > 0)
    assert(SnapshotCatalog.readAt(spark, root, "t6", 2L).count() > 0)
    intercept[IllegalArgumentException](SnapshotCatalog.readAt(spark, root, "t6", 0L))
    // full lineage history still visible from CURRENT (sidecars retained)
    assert(SnapshotCatalog.lineage(spark, root, "t6")
      .select("wave").distinct().count() == 4)
    // resume bookkeeping unaffected: a rerun has nothing to do
    val rerun = SnapshotCatalog.resumableRun(spark, input, "url", waves = 4, root, "t6")(
      df => df.withColumn("out", col("v") + 1))
    assert(rerun == 0)
  }

  test("manifest bytes stay O(waves) at 64 waves; vacuum keeps deep time travel") {
    val root = freshRoot()
    val docs = (0L until 256L).map(i => (i, s"u$i", i)).toDF("id", "url", "v")
    SnapshotCatalog.resumableRun(spark, docs, "url", waves = 64, root, "t64")(
      identity[org.apache.spark.sql.DataFrame])
    val dir = java.nio.file.Paths.get(root, "t64")
    val sizes = (0 until 64).map(id => Files.size(dir.resolve(s"manifest-$id.json")))
    // growth per wave is the bookkeeping only (wave id in three lists/maps
    // + a sidecar filename ≈ tens of bytes) — the O(waves²) inline-lineage
    // shape this guards against grew by a full lineage copy per commit
    val perWave = (sizes.last - sizes.head).toDouble / 63
    assert(perWave < 120, s"manifest grows $perWave B/wave")
    assert(sizes.last < 16 * 1024, s"64-wave manifest is ${sizes.last} B")
    // hash-wave assignment can leave a few waves empty at 256 keys —
    // lineage rows exist exactly for waves that processed data
    val nonEmptyWaves = SnapshotCatalog.currentManifest(root, "t64").get
      .rowsPerWave.count(_._2 > 0)
    val stats = SnapshotCatalog.vacuum(root, "t64", keepLast = 8)
    assert(stats.manifests == 56, stats)
    // kept ids stay time-travelable; expired ids fail loudly; the FULL
    // 64-wave lineage history survives via sidecars
    assert(SnapshotCatalog.readAt(spark, root, "t64", 63L).count() == 256)
    assert(SnapshotCatalog.readAt(spark, root, "t64", 56L).count() > 0)
    intercept[IllegalArgumentException](SnapshotCatalog.readAt(spark, root, "t64", 55L))
    assert(SnapshotCatalog.lineage(spark, root, "t64")
      .select("wave").distinct().count() == nonEmptyWaves)
  }

  test("lineage lives in per-commit sidecars; manifests stay O(waves)") {
    val root = freshRoot()
    SnapshotCatalog.resumableRun(spark, input, "url", waves = 4, root, "t5")(identity[org.apache.spark.sql.DataFrame])
    val dir = java.nio.file.Paths.get(root, "t5")
    // one sidecar per commit, each holding ONLY its own wave's rows
    val m = SnapshotCatalog.currentManifest(root, "t5").get
    assert(m.lineageFiles == (0 to 3).map(i => s"lineage-$i.json"))
    val perFileWaves = m.lineageFiles.map { f =>
      val rows = SnapshotCatalog.lineageRows(root, m.copy(lineageFiles = Seq(f)))
      rows.map(_.wave).distinct
    }
    assert(perFileWaves.forall(_.size == 1))
    // no inline lineage rows in any manifest (the O(waves^2) shape)
    (0 to 3).foreach { id =>
      val txt = new String(Files.readAllBytes(dir.resolve(s"manifest-$id.json")), "UTF-8")
      assert(!txt.contains("input_rows"), s"manifest-$id carries inline lineage")
    }
    // historical snapshots still expose their lineage prefix
    val m1 = SnapshotCatalog.readAt(spark, root, "t5", 1L) // readable
    assert(m1.count() > 0)
    val hist = SnapshotCatalog.lineageRows(root,
      m.copy(lineageFiles = Seq("lineage-0.json", "lineage-1.json")))
    assert(hist.map(_.wave).distinct.sorted == Seq(0, 1))
  }

  // ----- compact (rewrite-data-files) -----

  test("compact merges wave dirs into few files; rows, history, resume and time travel survive") {
    val root = freshRoot()
    SnapshotCatalog.resumableRun(spark, input, "url", waves = 4, root, "tc")(
      df => df.repartition(8).withColumn("out", col("v") * 3))
    val rowsBefore = SnapshotCatalog.read(spark, root, "tc")
      .collect().map(_.toSeq).toSet
    val preId = SnapshotCatalog.currentSnapshotId(root, "tc").get
    val mBefore = SnapshotCatalog.currentManifest(root, "tc").get
    val stats = SnapshotCatalog.compact(spark, root, "tc", targetFiles = 2)
    assert(stats.dirsBefore == 4 && stats.filesBefore >= 8)
    assert(stats.filesAfter <= 2 && stats.rows == 1000)
    val mAfter = SnapshotCatalog.currentManifest(root, "tc").get
    assert(mAfter.snapshotId == preId + 1 && mAfter.parentId == preId)
    assert(mAfter.dataDirs == Seq(s"data/snap-${preId + 1}"))
    assert(mAfter.completedWaves == mBefore.completedWaves)
    assert(mAfter.rowsPerWave == mBefore.rowsPerWave)
    assert(mAfter.lineageFiles == mBefore.lineageFiles)
    assert(SnapshotCatalog.read(spark, root, "tc")
      .collect().map(_.toSeq).toSet == rowsBefore)
    // time travel to the pre-compaction snapshot still reads the old files
    assert(SnapshotCatalog.readAt(spark, root, "tc", preId).count() == 1000)
    // resume key intact: a full rerun is still a no-op...
    assert(SnapshotCatalog.resumableRun(spark, input, "url", waves = 4, root, "tc")(
      df => df.repartition(8).withColumn("out", col("v") * 3)) == 0)
    // ...and a genuinely new wave appends alongside the compacted dir
    assert(SnapshotCatalog.commitWave(spark, input.limit(5), 9, root, "tc")(
      df => df.withColumn("out", col("v") * 3)))
    assert(SnapshotCatalog.read(spark, root, "tc").count() == 1005)
    assert(SnapshotCatalog.currentManifest(root, "tc").get.dataDirs.size == 2)
  }

  test("sorted compaction writes range-disjoint files (file-pruning layout)") {
    val root = freshRoot()
    SnapshotCatalog.resumableRun(spark, input, "url", waves = 4, root, "tsort")(
      df => df)
    val stats = SnapshotCatalog.compact(spark, root, "tsort",
      targetFiles = 4, sortBy = Seq("id"))
    assert(stats.filesAfter == 4 && stats.rows == 1000)
    val m = SnapshotCatalog.currentManifest(root, "tsort").get
    val files = SnapshotCatalog.parquetFiles(
      java.nio.file.Paths.get(root, "tsort").resolve(m.dataDirs.head))
    assert(files.size == 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.toString).agg(min("id"), max("id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi < lo, s"overlapping file ranges: $ranges")
      case _ =>
    }
  }

  test("vacuum after compaction reclaims the pre-compaction wave dirs") {
    val root = freshRoot()
    SnapshotCatalog.resumableRun(spark, input, "url", waves = 4, root, "tvac")(
      df => df)
    SnapshotCatalog.compact(spark, root, "tvac", targetFiles = 2)
    val stats = SnapshotCatalog.vacuum(root, "tvac", keepLast = 1)
    assert(stats.dataDirs == 4) // the four pre-compaction wave dirs
    assert(SnapshotCatalog.read(spark, root, "tvac").count() == 1000)
  }

  test("compact aborts with CURRENT untouched when rows would be lost") {
    val root = freshRoot()
    SnapshotCatalog.resumableRun(spark, input, "url", waves = 2, root, "tbad")(
      df => df)
    val preId = SnapshotCatalog.currentSnapshotId(root, "tbad").get
    val m = SnapshotCatalog.currentManifest(root, "tbad").get
    // simulate storage damage: remove one committed data file
    val victim = SnapshotCatalog.parquetFiles(
      java.nio.file.Paths.get(root, "tbad").resolve(m.dataDirs.head)).head
    Files.delete(victim)
    val e = intercept[IllegalArgumentException](
      SnapshotCatalog.compact(spark, root, "tbad", targetFiles = 1))
    assert(e.getMessage.contains("aborting"))
    assert(SnapshotCatalog.currentSnapshotId(root, "tbad").contains(preId))
  }
}
