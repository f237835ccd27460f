package graft.pipeline

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Watcher

/** Property-based invariants (SURVEY §5 test strategy #2) over the pure
  * kernels — plain ScalaCheck driven from ScalaTest. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val absorptionGen = Gen.choose(1e-6, 1.0 - 1e-6)
  private val muGen = Gen.choose(1e-3, 1e4)

  test("thickness formula: positive and inverts to the absorption (K12)") {
    check("thickness", Prop.forAll(absorptionGen, muGen) { (a, mu) =>
      val t = -math.signum(a) * math.log(1 - math.abs(a)) / mu
      val aBack = 1.0 - math.exp(-t * mu)
      t > 0 && math.abs(aBack - a) < 1e-9
    })
  }

  test("transmission in (0,1] implies absorption in [0,1) (F8 guards)") {
    check("absorption", Prop.forAll(Gen.choose(1e-9, 1.0)) { trans =>
      val a = 1.0 - trans
      a >= 0.0 && a < 1.0
    })
  }

  private val imgGen: Gen[(Array[Float], Int, Int)] = for {
    h <- Gen.choose(4, 24)
    w <- Gen.choose(4, 24)
    vals <- Gen.listOfN(h * w, Gen.choose(0f, 1000f))
  } yield (vals.toArray, h, w)

  test("labelMainFeature: binary output, dominant component (K3)") {
    check("label", Prop.forAll(imgGen) { case (img, h, w) =>
      val labels = ImageKernels.labelMainFeature(img, h, w)
      labels.forall(l => l == 0 || l == 1)
    })
  }

  test("weightedCentroid lies inside the labeled bounding box (K4)") {
    check("centroid", Prop.forAll(imgGen) { case (img, h, w) =>
      val labels = ImageKernels.labelMainFeature(img, h, w)
      val (cy, cx) = ImageKernels.weightedCentroid(img, labels, h, w)
      if (labels.forall(_ == 0) || cy.isNaN) Prop.passed
      else {
        val ys = (0 until h * w).filter(labels(_) == 1).map(_ / w)
        val xs = (0 until h * w).filter(labels(_) == 1).map(_ % w)
        Prop(cy >= ys.min && cy <= ys.max && cx >= xs.min && cx <= xs.max)
      }
    })
  }

  test("dynamicBeamAnalysis: coverage/sigma/region invariants (K6)") {
    check("beam", Prop.forAll(imgGen) { case (img, h, w) =>
      val ba = ImageKernels.dynamicBeamAnalysis(img, h, w)
      val coverageOk = ba.achievedCoverage >= 0.0 && ba.achievedCoverage <= 1.0 + 1e-12
      val sigmaOk = ba.sigmaMajor.isNaN || ba.sigmaMajor >= ba.sigmaMinor
      val regionOk = ba.regionIntensity <= ba.totalIntensity + 1e-6
      coverageOk && sigmaOk && regionOk
    })
  }

  test("ArrayStats: any partition split merges to the same result (A3)") {
    val arraysGen = for {
      len <- Gen.choose(1, 8)
      n <- Gen.choose(2, 12)
      rows <- Gen.listOfN(n, Gen.listOfN(len, Gen.choose(-100f, 100f)))
    } yield rows.map(_.toArray)
    val agg = new ArrayStats.ArrayStatsAggregator()
    check("arraystats", Prop.forAll(arraysGen, Gen.choose(0, 100)) { (rows, splitSeed) =>
      val split = splitSeed % (rows.length + 1)
      val (l, r) = rows.splitAt(split)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      val onePass = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
      merged.n == onePass.n &&
        merged.mean.zip(onePass.mean).forall { case (a, b) => math.abs(a - b) < 1e-6 } &&
        merged.std.zip(onePass.std).forall { case (a, b) =>
          (a.isNaN && b.isNaN) || math.abs(a - b) < 1e-5 }
    })
  }

  test("watcher completeness is monotone: adding files never un-readies (F1)") {
    val fileGen = Gen.oneOf(
      "eiger_1_master.h5", "im_craw.nxs", "beam_profile/eiger_2_master.h5",
      "beam_profile/im_craw.nxs", "beam_profile_through_sample/eiger_3_master.h5",
      "beam_profile_through_sample/im_craw.nxs", "junk.txt", "other/asdf.nxs")
    check("monotone", Prop.forAll(Gen.listOf(fileGen), Gen.listOf(fileGen)) { (base, extra) =>
      !Watcher.isComplete(base.toSet) ||
        Watcher.isComplete(base.toSet ++ extra.toSet)
    })
  }
}
