package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class SnapshotCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def fresh() =
    SnapshotCatalog(spark, Files.createTempDirectory("snap").toString)

  test("write creates versions; read resolves the current pointer") {
    val c = fresh()
    assert(c.versions("t") === Seq.empty)
    assert(c.currentVersion("t") === None)
    val v1 = c.write("t", Seq((1L, "a")).toDF("id", "s"))
    val v2 = c.write("t", Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    assert((v1, v2) === (1L, 2L))
    assert(c.versions("t") === Seq(1L, 2L))
    assert(c.currentVersion("t") === Some(2L))
    assert(c.read("t").count() === 2L)
  }

  test("time travel reads immutable history; rollback is a pointer move") {
    val c = fresh()
    c.write("t", Seq((1L, "a")).toDF("id", "s"))
    c.write("t", Seq((2L, "b"), (3L, "c")).toDF("id", "s"))
    assert(c.readAt("t", 1L).as[(Long, String)].collect().toSet ===
      Set((1L, "a")))
    c.rollback("t", 1L)
    assert(c.currentVersion("t") === Some(1L))
    assert(c.read("t").count() === 1L)
    // the newer version is still readable after rollback (until vacuum)
    assert(c.readAt("t", 2L).count() === 2L)
    intercept[IllegalArgumentException](c.rollback("t", 99L))
  }

  test("vacuum drops old versions but never the pointer target") {
    val c = fresh()
    (1 to 4).foreach(i => c.write("t", Seq((i.toLong, s"v$i")).toDF("id", "s")))
    c.rollback("t", 2L) // current = 2, newest = 4
    val dropped = c.vacuum("t", keep = 1)
    // keeps v4 (newest 1) AND v2 (pointer target); drops 1 and 3
    assert(dropped === Seq(1L, 3L))
    assert(c.versions("t") === Seq(2L, 4L))
    assert(c.read("t").as[(Long, String)].collect().toSet ===
      Set((2L, "v2")))
  }

  test("diff classifies inserted / deleted / updated between versions") {
    val c = fresh()
    c.write("t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    c.write("t", Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "s"))
    val d = c.diff("t", 1L, 2L, "id")
      .collect().map(r => (r.getString(2), r.getLong(0), r.getString(1))).toSet
    assert(d === Set(
      ("inserted", 4L, "d"),
      ("deleted", 3L, "c"),
      ("updated", 2L, "B"))) // updated carries the NEW value
  }

  test("mergeUpsert: update replaces, insert adds, tombstone removes — one new version") {
    val c = fresh()
    c.write("t", Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v"))
    val batch = Seq(
      (2L, "b2", 25.0, false), // update
      (4L, "d", 40.0, false),  // insert
      (3L, "c", 30.0, true),   // tombstone
      (9L, "x", 0.0, true))    // tombstone for absent key: no-op
      .toDF("k", "s", "v", "del")
    val v = c.mergeUpsert("t", batch, "k", Some("del"))
    assert(v === 2L)
    val got = c.read("t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "b2", 25.0), (4L, "d", 40.0)))
    // history intact: v1 still shows the pre-merge state
    assert(c.readAt("t", 1L).count() === 3)
  }

  test("mergeUpsert rejects a batch with duplicate keys") {
    val c = fresh()
    c.write("t", Seq((1L, "a", 1.0)).toDF("k", "s", "v"))
    val dup = Seq((2L, "x", 1.0, false), (2L, "y", 2.0, false))
      .toDF("k", "s", "v", "del")
    intercept[IllegalArgumentException] {
      c.mergeUpsert("t", dup, "k", Some("del"))
    }
  }

  test("mergeUpsert: a NULL delete flag means not-a-tombstone, never a phantom row") {
    val c = fresh()
    c.write("t", Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v"))
    // null del on a MATCHED key must still replace values; null del on
    // an UNMATCHED key must insert the real row (not all-null data)
    val batch = Seq(
      (1L, "a2", 11.0, None: Option[Boolean]),
      (5L, "e", 50.0, None: Option[Boolean]),
      (2L, "b", 20.0, Some(true)))
      .toDF("k", "s", "v", "del")
    c.mergeUpsert("t", batch, "k", Some("del"))
    val got = c.read("t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq((1L, "a2", 11.0), (5L, "e", 50.0)))
  }

  test("mergeUpsert without a delete column is pure upsert") {
    val c = fresh()
    c.write("t", Seq((1L, "a", 1.0)).toDF("k", "s", "v"))
    c.mergeUpsert("t", Seq((1L, "a2", 2.0), (5L, "e", 5.0))
      .toDF("k", "s", "v"), "k")
    val got = c.read("t").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got === Seq((1L, "a2"), (5L, "e")))
  }

  test("mergeUpsert evolveSchema: batch-only columns append (old rows NULL); omitted columns keep values") {
    val c = fresh()
    c.write("t", Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "v"))
    // batch adds `tag`, omits `v`
    val batch = Seq((2L, "b2", "hot"), (3L, "c", "new"))
      .toDF("k", "s", "tag")
    c.mergeUpsert("t", batch, "k", evolveSchema = true)
    val got = c.read("t").collect().map(r => (r.getLong(0),
      r.getString(1),
      if (r.isNullAt(2)) null else r.getDouble(2): Any,
      r.getString(3))).sortBy(_._1).toSeq
    assert(c.read("t").columns.toSeq === Seq("k", "s", "v", "tag"))
    assert(got === Seq(
      (1L, "a", 1.0, null), // untouched row: new column is NULL
      (2L, "b2", 2.0, "hot"), // matched: keeps omitted v, takes new tag
      (3L, "c", null, "new"))) // insert: omitted v is NULL
  }

  test("mergeUpsert without evolveSchema rejects a drifted batch schema") {
    val c = fresh()
    c.write("t", Seq((1L, "a", 1.0)).toDF("k", "s", "v"))
    val drifted = Seq((1L, "a2", "x")).toDF("k", "s", "tag")
    val e = intercept[IllegalArgumentException] {
      c.mergeUpsert("t", drifted, "k")
    }
    assert(e.getMessage.contains("evolveSchema"))
  }

  test("writeIf: CAS commits only at the expected version; conflicts clean their staging") {
    val c = fresh()
    val v1 = c.write("t", Seq((1L, "a")).toDF("k", "s"))
    // stale expectation → conflict, no new version, no staged garbage
    assert(c.writeIf("t", Seq((9L, "x")).toDF("k", "s"),
      Some(v1 - 1)) === None)
    assert(c.versions("t") === Seq(v1))
    val tdirList = java.nio.file.Files.list(
      java.nio.file.Paths.get(c.baseDir, "t"))
    try assert(!tdirList.anyMatch(
      p => p.getFileName.toString.startsWith(".stage-")))
    finally tdirList.close()
    // correct expectation commits
    val v2 = c.writeIf("t", Seq((2L, "b")).toDF("k", "s"), Some(v1))
    assert(v2 === Some(v1 + 1))
    assert(c.currentVersion("t") === v2)
    // create-if-absent: expected None conflicts once the table exists
    assert(c.writeIf("t", Seq((3L, "c")).toDF("k", "s"), None) === None)
  }

  test("transform: loses a CAS race, rebases on the interloper's rows, and wins the retry") {
    val c = fresh()
    c.write("t", Seq(("x", 1L)).toDF("k", "n"))
    var sneaked = false
    val v = c.transform("t") { base =>
      if (!sneaked) {
        sneaked = true
        // concurrent writer lands AFTER our read, BEFORE our commit
        c.write("t", Seq(("x", 1L), ("y", 10L)).toDF("k", "n"))
      }
      base.withColumn("n", col("n") + 1)
    }
    // retry must have seen the interloper's y row
    val got = c.read("t").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got === Seq(("x", 2L), ("y", 11L)))
    assert(v === c.currentVersion("t").get)
  }

  test("a new write after rollback branches forward from the newest id") {
    val c = fresh()
    c.write("t", Seq(1L).toDF("id"))
    c.write("t", Seq(2L).toDF("id"))
    c.rollback("t", 1L)
    val v3 = c.write("t", Seq(3L).toDF("id"))
    assert(v3 === 3L) // version ids never collide with history
    assert(c.read("t").as[Long].collect().toSeq === Seq(3L))
  }

  /** CommitStore that dies on the Nth pointer publish — simulates a
    * crash in the window between data-write and pointer-move. Wraps
    * either production store, so the crash contract is pinned under
    * BOTH commit protocols. */
  private final class DyingStore(dieOnPut: Int,
      base: CommitStore) extends CommitStore {
    private var puts = 0
    override def putPointer(p: java.nio.file.Path, c: String): Unit = {
      puts += 1
      if (puts == dieOnPut) sys.error("crash before pointer move")
      base.putPointer(p, c)
    }
    override def readPointer(p: java.nio.file.Path) = base.readPointer(p)
    override def swapDir(s: java.nio.file.Path, t: java.nio.file.Path) =
      base.swapDir(s, t)
    override def healSwap(t: java.nio.file.Path) = base.healSwap(t)
    override def healSwapsUnder(d: java.nio.file.Path) = base.healSwapsUnder(d)
    override def deleteRecursive(p: java.nio.file.Path) =
      base.deleteRecursive(p)
  }

  private val bothStores: Seq[(String, CommitStore)] =
    Seq("local" -> LocalCommitStore, "manifest" -> ManifestCommitStore)

  bothStores.foreach { case (storeName, st) =>
    test(s"[$storeName] crash between data-write and pointer-move leaves the old version serving") {
      val base = Files.createTempDirectory("snap").toString
      val good = SnapshotCatalog(spark, base, st)
      good.write("t", Seq(1L).toDF("id"))
      // second write dies after its data lands but before the pointer moves
      val dying = SnapshotCatalog(spark, base, new DyingStore(1, st))
      intercept[RuntimeException](dying.write("t", Seq(2L).toDF("id")))
      // restart: table still serves v1; the orphan v2 is invisible to read
      assert(good.currentVersion("t") === Some(1L))
      assert(good.read("t").as[Long].collect().toSeq === Seq(1L))
      // the orphan is listed as a directory and vacuumable
      assert(good.versions("t") === Seq(1L, 2L))
      val v3 = good.write("t", Seq(3L).toDF("id")) // next commit skips past it
      assert(v3 === 3L)
      assert(good.read("t").as[Long].collect().toSeq === Seq(3L))
    }

    test(s"[$storeName] tagged replay heals the crash window without double-writing data") {
      val base = Files.createTempDirectory("snap").toString
      val good = SnapshotCatalog(spark, base, st)
      good.write("t", Seq(1L).toDF("id"))
      // tagged commit dies between _TAG write and pointer move
      val dying = SnapshotCatalog(spark, base, new DyingStore(1, st))
      intercept[RuntimeException](
        dying.commitTagged("t", Seq(2L).toDF("id"), tag = "batch-7"))
      assert(good.currentVersion("t") === Some(1L)) // old version intact
      val dataFiles = Files.walk(java.nio.file.Paths.get(base, "t", "v=2"))
      val nFilesBefore =
        try dataFiles.filter(_.toString.endsWith(".parquet")).count()
        finally dataFiles.close()
      // replay (the streaming sink's retry) finds the tag and only
      // re-points — no data rewrite
      val healed = good.commitTagged("t", Seq(2L).toDF("id"), tag = "batch-7")
      assert(healed === 2L)
      assert(good.currentVersion("t") === Some(2L))
      assert(good.read("t").as[Long].collect().toSeq === Seq(2L))
      val dataFiles2 = Files.walk(java.nio.file.Paths.get(base, "t", "v=2"))
      val nFilesAfter =
        try dataFiles2.filter(_.toString.endsWith(".parquet")).count()
        finally dataFiles2.close()
      assert(nFilesAfter === nFilesBefore, "replay rewrote data files")
    }

    test(s"[$storeName] full snapshot flow: versions, rollback, vacuum") {
      val c = SnapshotCatalog(spark,
        Files.createTempDirectory("snap").toString, st)
      (1 to 3).foreach(i =>
        c.write("t", Seq((i.toLong, s"v$i")).toDF("id", "s")))
      assert(c.currentVersion("t") === Some(3L))
      c.rollback("t", 2L)
      assert(c.read("t").as[(Long, String)].collect().toSet ===
        Set((2L, "v2")))
      assert(c.vacuum("t", keep = 1) === Seq(1L))
      assert(c.versions("t") === Seq(2L, 3L))
    }
  }

  test("manifest putPointer is an append-only CAS log; last manifest wins") {
    val dir = Files.createTempDirectory("mlog")
    val ptr = dir.resolve("PTR")
    assert(ManifestCommitStore.readPointer(ptr) === None)
    ManifestCommitStore.putPointer(ptr, "a")
    ManifestCommitStore.putPointer(ptr, "b")
    ManifestCommitStore.putPointer(ptr, "c")
    assert(ManifestCommitStore.readPointer(ptr) === Some("c"))
    // the log is append-only: all three manifests exist
    val mlog = dir.resolve(".PTR.mlog")
    val n = Files.list(mlog)
    val manifests =
      try {
        val b = Seq.newBuilder[String]
        n.forEach(p => if (p.getFileName.toString.startsWith("m"))
          b += p.getFileName.toString)
        b.result().sorted
      } finally n.close()
    assert(manifests === Seq("m00000000", "m00000001", "m00000002"))
  }

  test("manifest swapDir: no live rename; a torn read view heals from the log") {
    import org.apache.spark.sql.SaveMode
    val root = Files.createTempDirectory("mswap")
    val target = root.resolve("table")
    // pre-store plain dir (adoption case)
    Seq(1L, 2L).toDF("id").write.parquet(target.toString)
    // staged replacement
    val staged = root.resolve("staged")
    Seq(3L, 4L, 5L).toDF("id").write.mode(SaveMode.Overwrite)
      .parquet(staged.toString)
    ManifestCommitStore.swapDir(staged, target)
    assert(Files.isSymbolicLink(target), "read view should be a symlink")
    assert(spark.read.parquet(target.toString).count() === 3)
    // committed state lives in the manifest, not the link: simulate the
    // crash window (commit landed, flip didn't) by destroying the link
    Files.delete(target)
    assert(ManifestCommitStore.healSwap(target))
    assert(spark.read.parquet(target.toString)
      .as[Long].collect().sorted === Seq(3L, 4L, 5L))
    assert(!ManifestCommitStore.healSwap(target)) // aligned: no-op now
  }

  test("swapDir crash window heals: target restored from trash") {
    val dir = Files.createTempDirectory("swap")
    val target = dir.resolve("table")
    Files.createDirectories(target)
    Files.write(target.resolve("data"), "old".getBytes)
    // simulate a crash between the two renames: target moved to trash,
    // staged never moved in
    Files.move(target, dir.resolve("table__old"))
    assert(!Files.exists(target))
    assert(LocalCommitStore.healSwap(target))
    assert(Files.exists(target.resolve("data")))
    assert(!LocalCommitStore.healSwap(target)) // idempotent no-op now
  }

  test("healSwapsUnder restores half-swapped children and clears leftover trash") {
    val root = Files.createTempDirectory("healunder")
    // child A: crash BETWEEN the renames — trash exists, twin missing
    Files.createDirectories(root.resolve("bucket=1__old"))
    Files.write(root.resolve("bucket=1__old").resolve("data"), "a".getBytes)
    // child B: crash AFTER the second rename — both twin and trash exist
    Files.createDirectories(root.resolve("bucket=2"))
    Files.createDirectories(root.resolve("bucket=2__old"))
    // child C: untouched
    Files.createDirectories(root.resolve("bucket=3"))
    assert(LocalCommitStore.healSwapsUnder(root) === 2)
    assert(Files.exists(root.resolve("bucket=1").resolve("data"))) // restored
    assert(!Files.exists(root.resolve("bucket=1__old")))
    assert(!Files.exists(root.resolve("bucket=2__old"))) // trash cleared
    assert(Files.exists(root.resolve("bucket=2")))
    assert(LocalCommitStore.healSwapsUnder(root) === 0) // idempotent
  }

  test("a read through Tables.loadPath self-heals an interrupted swap") {
    import spark.implicits._
    val root = Files.createTempDirectory("healread")
    val target = root.resolve("t")
    Seq(1L, 2L).toDF("id").write.parquet(target.toString)
    // crash between swapDir's renames: live dir gone, only trash left
    Files.move(target, root.resolve("t__old"))
    assert(!Files.exists(target))
    val got = graft.Tables.loadPath(spark, target.toString)
      .as[Long].collect().sorted
    assert(got === Seq(1L, 2L)) // healed, not FileNotFound
  }

  test("compact: fewer files, identical content, new version, loses " +
      "CAS races instead of dropping rows") {
    import spark.implicits._
    val base = Files.createTempDirectory("compactcat").toString
    val cat = SnapshotCatalog(spark, base)
    // many-small-files snapshot (the post-streaming state)
    val v1 = cat.write("t", (1L to 200L).toDF("id").repartition(32))
    val beforeFiles = new java.io.File(s"$base/t/v=$v1")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(beforeFiles >= 16, s"fixture must start fragmented: $beforeFiles")
    val v2 = cat.compact("t", targetFiles = 2)
    assert(v2.contains(v1 + 1))
    val afterFiles = new java.io.File(s"$base/t/v=${v2.get}")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(afterFiles <= 2, s"compaction must bin-pack: $afterFiles files")
    // content identical, old version still time-travels
    assert(cat.read("t").as[Long].collect().sorted
      === (1L to 200L).toArray)
    assert(cat.readAt("t", v1).count() === 200L)
    // CAS: a concurrent commit between read and commit wins
    val vNow = cat.currentVersion("t")
    cat.write("t", (1L to 201L).toDF("id")) // concurrent writer
    // replay a compaction that believed vNow was current
    val stale = cat.writeIf("t",
      cat.readAt("t", vNow.get).repartition(1), vNow)
    assert(stale.isEmpty, "stale compaction must lose, not clobber")
    assert(cat.read("t").count() === 201L)
  }

  test("listTables heals crash leftovers and hides staging dirs") {
    val base = Files.createTempDirectory("cat")
    val cat = ParquetCatalog(spark, base.toString)
    import spark.implicits._
    cat.insert("live", Seq(1L).toDF("id"))
    // a crashed deleteByIds: staged rewrite present, target mid-swap
    Files.createDirectories(base.resolve("live2__tmp_delete"))
    Files.createDirectories(base.resolve("gone__old"))
    assert(cat.listTables() === Seq("gone", "live")) // healed + filtered
    assert(Files.exists(base.resolve("gone")))
  }
}
