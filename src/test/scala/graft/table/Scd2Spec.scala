package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("merge: changed rows close + reopen, new rows open, unchanged untouched") {
    val b1 = Seq((1L, "alice", "eng"), (2L, "bob", "sales"))
      .toDF("id", "name", "dept")
    val h1 = Scd2.init(b1, 100L)
    // batch 2: bob moves to eng, carol appears, alice unchanged
    val b2 = Seq((1L, "alice", "eng"), (2L, "bob", "eng"),
      (3L, "carol", "ops")).toDF("id", "name", "dept")
    val h2 = Scd2.merge(h1, b2, "id", 200L)

    val rows = h2.collect().map(r => (r.getLong(0), r.getString(2),
      r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
      r.getBoolean(5))).toSet
    assert(rows === Set(
      (1L, "eng",   100L, None,        true),  // untouched
      (2L, "sales", 100L, Some(200L),  false), // closed
      (2L, "eng",   200L, None,        true),  // reopened
      (3L, "ops",   200L, None,        true))) // new

    // time travel through the dimension
    val at150 = Scd2.asOf(h2, 150L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(at150 === Map(1L -> "eng", 2L -> "sales"))
    val at250 = Scd2.asOf(h2, 250L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(at250 === Map(1L -> "eng", 2L -> "eng", 3L -> "ops"))
  }

  test("merge is idempotent for an unchanged batch") {
    val b = Seq((1L, "x")).toDF("id", "v")
    val h1 = Scd2.init(b, 1L)
    val h2 = Scd2.merge(h1, b, "id", 2L)
    assert(h2.collect().toSet === h1.collect().toSet)
  }

  test("duplicate-key batch is rejected with an explicit policy error") {
    val h = Scd2.init(Seq((1L, "a")).toDF("id", "v"), 1L)
    // silently merging (2L, "x") twice would open TWO current rows for
    // key 2 — the library refuses instead of inventing an order
    val dup = Seq((2L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val e = intercept[IllegalArgumentException](
      Scd2.merge(h, dup, "id", 2L).collect())
    assert(e.getMessage.contains("duplicate keys"))
    assert(e.getMessage.contains("pre-dedup"))
    // init validates too when given the key
    val e2 = intercept[IllegalArgumentException](
      Scd2.init(dup, 1L, keyCol = Some("id")))
    assert(e2.getMessage.contains("duplicate keys"))
    // the caller's explicit last-wins pre-dedup then merges cleanly
    val deduped = dup.groupBy("id")
      .agg(max_by(col("v"), col("v")).as("v"))
    val h2 = Scd2.merge(h, deduped, "id", 2L)
    assert(h2.filter(col("is_current") && col("id") === 2L).count() === 1L)
  }

  test("composes with SnapshotCatalog for versioned dimension history") {
    val cat = SnapshotCatalog(spark,
      java.nio.file.Files.createTempDirectory("scd2").toString)
    cat.commitTagged("dim", Scd2.init(Seq((1L, "a")).toDF("id", "v")
      .withColumn("v", col("v")), 1L), "batch=0")
    val next = Scd2.merge(cat.read("dim"),
      Seq((1L, "b")).toDF("id", "v"), "id", 2L)
    cat.commitTagged("dim", next, "batch=1")
    assert(cat.read("dim").count() === 2L)     // closed + open row
    assert(cat.readAt("dim", 1L).count() === 1L) // snapshot of the past
  }
}
