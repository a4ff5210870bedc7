package graft.search

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.embed.DeterministicEmbedder

/** Absolute recall gates for the approximate-ANN paths (q25 LSH, q36
  * indexed-LSH, q46/q82 IVF, q66 SQ8-rerank). recallAtK monotonicity
  * alone lets a future probe/radius/candidate tweak silently trade
  * recall for speed; these floors make a recall collapse a build
  * failure.
  *
  * Calibration (sf0.01 fixture, the registry query vector). The fixture
  * embeddings come from [[DeterministicEmbedder]] (hash-based, near-
  * uniform on the sphere), which is the HARD case for bucketed ANN —
  * real text embeddings cluster, these don't, so tight probes scan too
  * little of a structureless space:
  *   annTopK radius:    1 → 0.0   2 → 0.2   4 → 1.0 (gate ≥ 0.9)
  *   indexed radius:    2 → 0.2   4 → 1.0 (gate ≥ 0.9)
  *   IVF nProbe (of 8): 2 → 0.6   4 → 0.8   6 → gate ≥ 0.9
  *   SQ8 rerank 50 candidates → 1.0 (gated at 0.9)
  * The gates pin the knob that DELIVERS ≥0.9 on this worst-case
  * distribution plus the exact measured floor at the registry's tight
  * production knobs, so both ends of the latency/recall curve are
  * protected. */
class RecallFloorSpec extends SparkSpec {

  private val Dim = 64
  private val qv = DeterministicEmbedder(Dim)
    .embed("spark join merge sort window")
  private lazy val embs = Tables.embeddings(spark, SfDir)
  private lazy val exact =
    VectorSearch.topK(embs, "vec_id", "embedding", qv, 10)

  private def recallOf(approx: org.apache.spark.sql.DataFrame): Double =
    VectorSearch.recallAtK(approx, exact)

  private lazy val lshIdx = {
    val d = Files.createTempDirectory("recall_idx").toString
    graft.index.SearchIndex.build(Tables.documents(spark, SfDir), embs, d)
    d
  }
  private lazy val ivfIdx = {
    val d = Files.createTempDirectory("recall_ivf").toString
    graft.index.IvfIndex.build(embs, d, nCells = 8)
    d
  }

  test("LSH probe recall curve: calibration print + floors") {
    val curve = (0 to 8 by 2).map { r =>
      r -> recallOf(VectorSearch.annTopK(embs, "vec_id", "embedding",
        qv, 10, Dim, nBits = 8, probeHammingRadius = r))
    }
    curve.foreach { case (r, rec) => info(f"annTopK radius $r: $rec%.3f") }
    // the curve must be monotone and reach 1.0 at the full probe
    assert(curve.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a })
    assert(curve.last._2 === 1.0)
    // gate the delivering knob
    val r4 = curve.toMap.apply(4)
    assert(r4 >= 0.9, f"annTopK radius-4 recall $r4%.3f below 0.9")
  }

  test("indexed LSH probe: radius 4 delivers >= 0.9; registry radius 2 floor pinned") {
    val r2 = recallOf(graft.index.SearchIndex.knn(spark, lshIdx, qv, 10,
      Dim, probeHammingRadius = 2))
    val r4 = recallOf(graft.index.SearchIndex.knn(spark, lshIdx, qv, 10,
      Dim, probeHammingRadius = 4))
    info(f"SearchIndex.knn radius 2: $r2%.3f, radius 4: $r4%.3f")
    assert(r4 >= 0.9, f"radius-4 recall $r4%.3f below 0.9")
    // the tight production knob's measured floor — a drop means the
    // LSH family or bucket layout regressed, not a tuning choice
    assert(r2 >= 0.2, f"radius-2 recall $r2%.3f regressed below 0.2")
  }

  test("IVF probe: nProbe 6 of 8 delivers >= 0.9; tighter-probe floors pinned") {
    // measured curve on the structureless fixture: 2 → 0.6, 4 → 0.8,
    // 6 → gate ≥ 0.9 (k-means cells carry little signal when the
    // vectors don't cluster; real embeddings reach 0.9 far earlier)
    val p2 = recallOf(graft.index.IvfIndex.knn(spark, ivfIdx, qv, 10,
      nProbe = 2))
    val p4 = recallOf(graft.index.IvfIndex.knn(spark, ivfIdx, qv, 10,
      nProbe = 4))
    val p6 = recallOf(graft.index.IvfIndex.knn(spark, ivfIdx, qv, 10,
      nProbe = 6))
    info(f"IvfIndex.knn nProbe 2: $p2%.3f, 4: $p4%.3f, 6: $p6%.3f")
    assert(p6 >= 0.9, f"nProbe-6 recall $p6%.3f below 0.9")
    assert(p4 >= 0.8, f"nProbe-4 recall $p4%.3f regressed below 0.8")
    assert(p2 >= 0.6, f"nProbe-2 recall $p2%.3f regressed below 0.6")
    // the quantized leg must not lose recall vs its unquantized twin
    val q6 = recallOf(graft.index.IvfIndex.knnQuantized(spark, ivfIdx,
      qv, 10, nProbe = 6, numCandidates = 50))
    info(f"IvfIndex.knnQuantized nProbe 6: $q6%.3f")
    assert(q6 >= 0.9, f"SQ8 nProbe-6 recall $q6%.3f below 0.9")
  }

  test("SQ8 quantize-then-rerank (q66 knobs: 50 candidates) holds recall@10 >= 0.9") {
    val r = recallOf(VectorSearch.quantizedTopK(embs, "vec_id",
      "embedding", qv, 10, Dim, numCandidates = 50))
    info(f"quantizedTopK 50 candidates: $r%.3f")
    assert(r >= 0.9, f"quantizedTopK recall $r%.3f below 0.9")
  }

  test("binary quantize-then-rerank (q132 knobs: 50 candidates): curve printed, floors pinned") {
    val r50 = recallOf(VectorSearch.binaryQuantizedTopK(embs, "vec_id",
      "embedding", qv, 10, Dim, numCandidates = 50))
    val r200 = recallOf(VectorSearch.binaryQuantizedTopK(embs, "vec_id",
      "embedding", qv, 10, Dim, numCandidates = 200))
    info(f"binaryQuantizedTopK 50 candidates: $r50%.3f, 200: $r200%.3f")
    // 1 bit/dim is the coarsest rung of the ladder and the fixture is
    // the structureless worst case; asymmetric (BBQ-style) scoring is
    // what makes these floors reachable at all — symmetric Hamming
    // measured 0.10/0.30 on the same fixture
    assert(r200 >= 0.9, f"binary 200-candidate recall $r200%.3f below 0.9")
    assert(r50 >= 0.5, f"binary 50-candidate recall $r50%.3f below floor")
  }

  test("PQ ADC-then-rerank (q99 knobs: 128 candidates) holds recall@10 >= 0.9") {
    val d = Files.createTempDirectory("recall_pq").toString
    graft.index.PqIndex.build(embs, d, m = 8, nCodes = 16)
    val r128 = recallOf(graft.index.PqIndex.knn(spark, d, qv, 10,
      numCandidates = 128))
    val r32 = recallOf(graft.index.PqIndex.knn(spark, d, qv, 10,
      numCandidates = 32))
    info(f"PqIndex.knn 128 candidates: $r128%.3f, 32: $r32%.3f")
    assert(r128 >= 0.9, f"PQ 128-candidate recall $r128%.3f below 0.9")
    // tighter-knob floor: 8-subspace/16-code ADC on the structureless
    // fixture — a drop means the codebook/encode pipeline regressed
    assert(r32 >= 0.5, f"PQ 32-candidate recall $r32%.3f regressed below 0.5")
  }

  test("PQ auto shortlist holds recall@10 >= 0.9 at BOTH corpus sizes (the fixed-128 decay gate)") {
    // the round-6 finding: numCandidates=128 was calibrated on the
    // 500-vector fixture (a 0.25·n fraction) and demonstrably drifted
    // on the 2000-vector corpus. scaledCandidates keeps the fraction,
    // so the SAME default must deliver the floor at both sizes — and
    // the derived shortlist must actually grow with the corpus.
    def gate(sfDir: String): (Long, Int, Double) = {
      val e = Tables.embeddings(spark, sfDir)
      val d = Files.createTempDirectory("recall_pq_auto").toString
      graft.index.PqIndex.build(e, d, m = 8, nCodes = 16)
      val n = graft.index.PqIndex.indexedCount(spark, d)
      val auto = graft.index.PqIndex.scaledCandidates(n, 10)
      val exactHere = VectorSearch.topK(e, "vec_id", "embedding", qv, 10)
      val r = VectorSearch.recallAtK(
        graft.index.PqIndex.knn(spark, d, qv, 10), exactHere)
      (n, auto, r)
    }
    val (nSmall, cSmall, rSmall) = gate(SfDir)
    val (nBig, cBig, rBig) = gate("/root/testdata/sf0.1")
    info(f"auto shortlist: n=$nSmall → $cSmall cands, recall $rSmall%.3f; " +
      f"n=$nBig → $cBig cands, recall $rBig%.3f")
    assert(nBig > nSmall, "fixture sizes no longer differ; gate is vacuous")
    assert(cBig > cSmall, "shortlist default did not scale with the corpus")
    assert(rSmall >= 0.9, f"auto recall $rSmall%.3f below 0.9 at n=$nSmall")
    assert(rBig >= 0.9, f"auto recall $rBig%.3f below 0.9 at n=$nBig")
  }
}
