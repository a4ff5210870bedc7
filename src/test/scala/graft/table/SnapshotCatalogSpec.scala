package graft.table

import java.nio.file.Files

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

  test("a new write after rollback branches forward from the newest id") {
    val c = fresh()
    c.write("t", Seq(1L).toDF("id"))
    c.write("t", Seq(2L).toDF("id"))
    c.rollback("t", 1L)
    val v3 = c.write("t", Seq(3L).toDF("id"))
    assert(v3 === 3L) // version ids never collide with history
    assert(c.read("t").as[Long].collect().toSeq === Seq(3L))
  }
}
