package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

/** Pins the conditional-put semantics of [[ManifestCommitStore]]'s CAS
  * primitives. The load-bearing property: on POSIX, `rename(2)`
  * SILENTLY REPLACES an existing target, so a move-based "CAS" lets
  * two racing committers both claim one sequence number and lose a
  * manifest. The store must use genuinely conditional primitives
  * (`link(2)` / `open(O_CREAT|O_EXCL)`), which these tests exercise
  * directly and under real thread races.
  */
class CommitStoreSpec extends AnyFunSuite {

  private def dir(): Path = Files.createTempDirectory("cstore")

  private def read(p: Path): String =
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8)

  test("linkIfAbsent refuses an existing target and leaves it intact") {
    val d = dir()
    val dst = d.resolve("m00000000")
    Files.write(dst, "rival".getBytes(StandardCharsets.UTF_8))
    val src = d.resolve("stage")
    Files.write(src, "mine".getBytes(StandardCharsets.UTF_8))
    assert(!ManifestCommitStore.linkIfAbsent(dst, src))
    assert(read(dst) === "rival") // a rename here would have replaced it
    val dst2 = d.resolve("m00000001")
    assert(ManifestCommitStore.linkIfAbsent(dst2, src))
    assert(read(dst2) === "mine")
  }

  test("claimIfAbsent is exclusive") {
    val d = dir()
    val c = d.resolve(".v00000001.claim")
    assert(ManifestCommitStore.claimIfAbsent(c))
    assert(!ManifestCommitStore.claimIfAbsent(c))
  }

  test("racing putPointer committers never lose a manifest") {
    val d = dir()
    val ptr = d.resolve("tbl")
    val threads = 8
    val appendsEach = 4
    val pool = Executors.newFixedThreadPool(threads)
    val gate = new CountDownLatch(1)
    val contents =
      for (t <- 0 until threads; i <- 0 until appendsEach)
        yield s"writer-$t-commit-$i"
    val futures = contents.grouped(appendsEach).map { mine =>
      pool.submit(new Runnable {
        def run(): Unit = { gate.await(); mine.foreach(c =>
          ManifestCommitStore.putPointer(ptr, c)) }
      })
    }.toSeq
    gate.countDown()
    futures.foreach(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    val mlog = d.resolve(".tbl.mlog")
    val manifests = Files.list(mlog).iterator()
    var names = Vector.empty[String]
    var bodies = Vector.empty[String]
    manifests.forEachRemaining { p =>
      val n = p.getFileName.toString
      if (n.startsWith("m")) { names :+= n; bodies :+= read(p) }
    }
    // every append won a DISTINCT sequence number; nothing overwritten
    assert(names.size === contents.size)
    assert(names.distinct.size === names.size)
    assert(bodies.sorted === contents.sorted.toVector)
    // the committed pointer is the highest manifest's content
    assert(ManifestCommitStore.readPointer(ptr) ===
      Some(bodies(names.zipWithIndex.maxBy(_._1)._2)))
  }

  test("swapDir skips a sequence number claimed by a racing committer") {
    val d = dir()
    val target = d.resolve("t")
    val staged1 = Files.createDirectory(d.resolve("s1"))
    Files.write(staged1.resolve("f"), "one".getBytes(StandardCharsets.UTF_8))
    ManifestCommitStore.swapDir(staged1, target)
    assert(read(target.resolve("f")) === "one")
    // a rival claims v2 before our commit
    val versions = d.resolve(".t.versions")
    assert(ManifestCommitStore.claimIfAbsent(
      versions.resolve(".v00000002.claim")))
    val staged2 = Files.createDirectory(d.resolve("s2"))
    Files.write(staged2.resolve("f"), "two".getBytes(StandardCharsets.UTF_8))
    ManifestCommitStore.swapDir(staged2, target)
    // promoted PAST the claimed name, never onto it
    assert(Files.isDirectory(versions.resolve("v00000003")))
    assert(!Files.exists(versions.resolve("v00000002")))
    assert(read(target.resolve("f")) === "two")
  }

  test("a vacuumed version's sequence number is never reissued") {
    val d = dir()
    val target = d.resolve("t")
    def swap(body: String): Unit = {
      val s = Files.createTempDirectory(d, "stage")
      Files.write(s.resolve("f"), body.getBytes(StandardCharsets.UTF_8))
      ManifestCommitStore.swapDir(s, target)
    }
    swap("a"); swap("b"); swap("c") // v1 vacuumed by v2, v2 by v3
    val versions = d.resolve(".t.versions")
    assert(Files.isDirectory(versions.resolve("v00000003")))
    assert(!Files.exists(versions.resolve("v00000001")))
    // claim markers outlive their vacuumed versions, pinning the ratchet
    assert(Files.exists(versions.resolve(".v00000001.claim")))
    swap("d")
    assert(Files.isDirectory(versions.resolve("v00000004")))
    assert(read(target.resolve("f")) === "d")
  }
}
