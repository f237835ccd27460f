package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Kernel unit tests against analytic expectations on synthetic Gaussians
  * (SURVEY §5 test strategy #1). */
class ImageKernelsSpec extends AnyFunSuite {
  import Fixtures._

  test("prepareImage zeroes invalid pixels, keeps valid range") {
    val img = Array(-1f, 0f, 5f, 2.1e7f, 1.9e7f, Float.NaN)
    val out = ImageKernels.prepareImage(img)
    assert(out.toSeq == Seq(0f, 0f, 5f, 0f, 1.9e7f, 0f))
  }

  test("labelMainFeature keeps only the largest connected component") {
    // two blobs: a 3x3 block of 100s and a single 100 pixel far away,
    // on a zero background (threshold = max(1, mean) separates both)
    val h = 16; val w = 16
    val img = new Array[Float](h * w)
    for (y <- 2 to 4; x <- 2 to 4) img(y * w + x) = 100f
    img(12 * w + 12) = 100f
    val labels = ImageKernels.labelMainFeature(img, h, w)
    assert(labels.count(_ == 1) == 9)
    assert(labels(3 * w + 3) == 1)
    assert(labels(12 * w + 12) == 0)
  }

  test("weightedCentroid of a Gaussian beam is its center") {
    val img = gaussian()
    val labels = ImageKernels.labelMainFeature(img, H, W)
    val (cy, cx) = ImageKernels.weightedCentroid(img, labels, H, W)
    assert(math.abs(cy - CY) < 0.05, s"cy=$cy")
    assert(math.abs(cx - CX) < 0.05, s"cx=$cx")
  }

  test("circularMask area approximates pi r^2 and respects the center") {
    val r = 10.0
    val mask = ImageKernels.circularMask(64, 64, 32, 32, r)
    val area = mask.count(_ == 1f)
    assert(math.abs(area - math.Pi * r * r) / (math.Pi * r * r) < 0.05, s"area=$area")
    assert(mask(32 * 64 + 32) == 1f)
    assert(mask(0) == 0f)
  }

  test("dynamicBeamAnalysis recovers Gaussian geometry and coverage") {
    val img = gaussian()
    val ba = ImageKernels.dynamicBeamAnalysis(img, H, W)
    assert(math.abs(ba.comY - CY) < 0.05, s"comY=${ba.comY}")
    assert(math.abs(ba.comX - CX) < 0.05, s"comX=${ba.comX}")
    // both axes of an isotropic Gaussian: sigma within 10%
    assert(math.abs(ba.sigmaMajor - Sigma) / Sigma < 0.1, s"sigmaMajor=${ba.sigmaMajor}")
    assert(math.abs(ba.sigmaMinor - Sigma) / Sigma < 0.1, s"sigmaMinor=${ba.sigmaMinor}")
    // coverage is the kept fraction of the LABELED intensity (reference
    // regionprops semantics); the bisection returns the bracket midpoint,
    // so achieved lands near — not necessarily above — the 0.997 target,
    // and k is in units of the threshold-truncated sigma (slightly < 3)
    assert(ba.achievedCoverage > 0.98, s"coverage=${ba.achievedCoverage}")
    assert(ba.kSigma > 2.0 && ba.kSigma < 4.0, s"k=${ba.kSigma}")
    assert(ba.regionIntensity <= ba.totalIntensity)
    assert(ba.mask.count(_ == 1f) > 0)
  }

  test("dynamicBeamAnalysis on an anisotropic rotated Gaussian finds theta") {
    // sigma_x = 6, sigma_y = 2, no rotation: theta ~ 0, major axis = x
    val h = 64; val w = 64
    val img = new Array[Float](h * w)
    for (y <- 0 until h; x <- 0 until w) {
      val dy = (y - 32.0) / 2.0; val dx = (x - 32.0) / 6.0
      img(y * w + x) = (1000 * math.exp(-(dy * dy + dx * dx) / 2)).toFloat
    }
    val ba = ImageKernels.dynamicBeamAnalysis(img, h, w)
    assert(math.abs(ba.sigmaMajor - 6.0) / 6.0 < 0.1, s"major=${ba.sigmaMajor}")
    assert(math.abs(ba.sigmaMinor - 2.0) / 2.0 < 0.1, s"minor=${ba.sigmaMinor}")
    assert(math.abs(ba.theta) < 0.05, s"theta=${ba.theta}")
  }

  test("fluxImage and nan sums") {
    val img = Array(10f, 20f, Float.NaN)
    val flux = ImageKernels.fluxImage(img, 2.0, 1.0)
    assert(flux(0) == 4f && flux(1) == 9f)
    assert(ImageKernels.nanSum(flux) == 13.0)
    assert(ImageKernels.maskedNanSum(flux, Array(1f, 0f, 1f)) == 4.0)
  }
}
