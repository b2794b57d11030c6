package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins `Similarity.bandGeometry`/`expectedRecall` — the sizing math
 * the r6 sf1 sweep validated empirically (8×8 at 20k vectors: blocked
 * kNN 0.05× of exact, recall 1.0; test-SF 16×4 admits ~64% of all
 * pairs).
 */
class BandGeometrySpec extends AnyFunSuite {

  test("geometry tracks corpus size within the 64-bit code budget") {
    assert(Similarity.bandGeometry(2000) == (12, 5))
    assert(Similarity.bandGeometry(20000) == (7, 9))
    assert(Similarity.bandGeometry(1000000) == (4, 14))
    // budget always respected, planes monotone in n
    var lastP = 0
    for (exp <- 6 to 36) {
      val (b, p) = Similarity.bandGeometry(1L << exp)
      assert(b * p <= 64, s"n=2^$exp: $b×$p exceeds one long")
      assert(p >= lastP, "planesPerBand must not shrink as n grows")
      lastP = p
    }
  }

  test("expectedRecall matches the measured operating points") {
    // identical vectors: always recalled, any geometry
    assert(Similarity.expectedRecall(1.0, 8, 8) == 1.0)
    // the sf1 sweep's corpus-sized point: near-dups at cos 0.9 under
    // 8×8 — analytically ~0.94, observed 1.0 on the dup-dense corpus
    // (identical vectors dominate); must clear the registry floor
    assert(Similarity.expectedRecall(0.9, 8, 8) > 0.85)
    // the S-curve hazard the probe measured (recall 0.59 at τ=0.4,
    // 8×8): the analytical value must flag this geometry as unsafe
    assert(Similarity.expectedRecall(0.4, 8, 8) < 0.7)
    // and the wide-band registry geometry must clear it (observed 0.92)
    assert(Similarity.expectedRecall(0.4, 16, 4) > 0.85)
    // a random pair under the registry geometry — the reason 16×4
    // cannot beat brute force at corpus scale: ~64% candidate rate
    val rand = Similarity.expectedRecall(0.0, 16, 4)
    assert(rand > 0.6 && rand < 0.7, s"expected ~0.644, got $rand")
  }
}
