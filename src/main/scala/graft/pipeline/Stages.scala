package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.AsOfJoin

/** The reference pipeline's process steps as a registry of composable
  * DataFrame transforms (SURVEY §2.10: step plugin contract ->
  * `Map[String, Stage]` + `Dataset.transform`).
  *
  * Execution model translation (SURVEY §3.1): the reference's ordered
  * step-name list becomes a fold over this registry; Catalyst pipelines all
  * pure-column stages into fused codegen stages, the per-image UDF kernels
  * are isolated in dedicated projections, and cross-row steps (joins,
  * windows, stacking) are the only shuffles. Each step's `can_run`
  * precondition is encoded as null-gating or a filter inside the stage.
  *
  * Scale posture: logbook and mask dims are broadcast (J1/J2); the
  * propagation step is a window (A7 — no re-grouping shuffle); stacking is a
  * single groupBy with a mergeable per-pixel aggregator (no collect_list of
  * images); everything else is row-local.
  */
object Stages {

  /** Tracks frames a stage persisted so the pipeline driver can release
    * them once the consuming action has run — stages are lazy transforms,
    * so they can never unpersist themselves without losing the cache before
    * it is read. Call `release()` after materializing the pipeline output;
    * a long-lived session that skips it accumulates cached partitions. */
  final class CacheRegistry {
    private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def track(df: DataFrame): DataFrame = synchronized { frames += df; df }
    def release(): Unit = synchronized {
      frames.foreach(_.unpersist(blocking = false)); frames.clear()
    }
  }

  /** Pipeline context: dimension tables + instrument constants
    * (`MOUSE_settings.yaml` equivalents). */
  case class Context(
      logbook: DataFrame,
      masks: DataFrame,
      refBeamDiameterPx: Double = 10.0,
      refDistanceM: Double = 1.0,
      hcKevAngstrom: Double = 12.398419843320026,
      // raw long-format tree table + translator mapping configs, for replays
      // that start from untranslated instrument files (K20 / S3-S6)
      tree: Option[DataFrame] = None,
      translatorRules1: Seq[TreeTable.MappingRule] = Nil,
      translatorRules2: Seq[TreeTable.MappingRule] = Nil,
      caches: CacheRegistry = new CacheRegistry)

  type Stage = (DataFrame, Context) => DataFrame

  // ---- UDF wrappers over the pure kernels (isolated from codegen stages) --

  private val prepareUdf = udf(ImageKernels.prepareImage _)
  private val mainFeatureCentroidUdf =
    udf { (img: Array[Float], h: Int, w: Int) =>
      val prepared = ImageKernels.prepareImage(img)
      val labels = ImageKernels.labelMainFeature(prepared, h, w)
      val (cy, cx) = ImageKernels.weightedCentroid(prepared, labels, h, w)
      // no beam found (reference raises ValueError, utilities.py:165-166):
      // a null beam_center routes the row to the canStack quarantine —
      // NaN coordinates would slip through the isNotNull gate and poison
      // the stacked statistics instead
      if (cy.isNaN || cx.isNaN) null else Array(cy, cx)
    }
  private val circularMaskUdf =
    udf { (h: Int, w: Int, cy: Double, cx: Double, r: Double) =>
      ImageKernels.circularMask(h, w, cy, cx, r)
    }
  private val beamAnalysisUdf =
    udf { (img: Array[Float], h: Int, w: Int) =>
      ImageKernels.dynamicBeamAnalysis(img, h, w)
    }
  private val fluxImageUdf =
    udf { (img: Array[Float], duration: Double, dark: Double) =>
      ImageKernels.fluxImage(img, duration, dark)
    }
  private val nanSumUdf = udf(ImageKernels.nanSum _)
  private val maskedNanSumUdf = udf(ImageKernels.maskedNanSum _)
  private val compositionUdf =
    udf { (formula: String) => Composition.parse(formula).map(_.toArray).orNull }

  /** §1.2 pint-equivalent: fixed conversions to meters. */
  def toMeters(value: Column, units: Column): Column =
    value * when(units === "m", 1.0)
      .when(units === "mm", 1e-3)
      .when(units === "cm", 1e-2)
      .when(units === "um", 1e-6)
      .otherwise(lit(Double.NaN))

  // ------------------------------------------------------------------ steps

  /** J1 + K11 + K17: logbook broadcast join, energy, identifiers
    * (`processstep_metadata_update.py`). 'None'/'' dispersant sentinel ->
    * null key (J4). */
  val metadataUpdate: Stage = (df, ctx) => {
    val lb = ctx.logbook.withColumnRenamed("ymd", "lb_ymd")
    df.join(broadcast(lb),
        df("ymd") === lb("lb_ymd") && df("batch") === lb("batchnum"), "left")
      .drop("lb_ymd", "batchnum")
      .withColumn("energy_kev",
        when(col("incidentWavelength.value") > 0,
          lit(ctx.hcKevAngstrom) / col("incidentWavelength.value")))
      .withColumn("collection_identifier",
        concat(col("ymd"), lit("_"), col("batch")))
      .withColumn("background_identifier",
        when(col("bgymd").isNotNull && col("bgymd") =!= "",
          concat(col("bgymd"), lit("_"), col("bgnumber"))))
      .withColumn("dispersant_background_identifier",
        when(col("dbgymd").isNotNull && col("dbgymd") =!= "" && col("dbgymd") =!= "None",
          concat(col("dbgymd"), lit("_"), col("dbgnumber"))))
      // typed sample components from the logbook's composition formula
      // (logbook2mouse sample modeling; null when blank/unparseable)
      .transform(d =>
        if (d.columns.contains("composition"))
          d.withColumn("composition_components", compositionUdf(col("composition")))
        else d)
  }

  /** J2 + J5: backward as-of mask selection per configuration, carrying the
    * mask payload (`processstep_add_mask_file.py:34-81,99-129`). */
  val addMaskFile: Stage = (df, ctx) => {
    val masks = ctx.masks.select(
      col("configuration"),
      to_date(col("maskYmd"), "yyyyMMdd").as("mask_date"),
      col("mask"), col("maskH"), col("maskW"), col("path").as("mask_path"))
    AsOfJoin.backward(
      df.withColumn("__meas_date", to_date(col("ymd"), "yyyyMMdd")),
      masks,
      keys = Seq("configuration"),
      leftTime = "__meas_date", rightTime = "mask_date",
      joinType = "left",
      tieBreak = Seq("mask_path")
    ).drop("__meas_date")
  }

  /** K2–K4: beam center of the direct-beam profile
    * (`processstep_determine_beam_center.py`). F2 gate: needs directBeam. */
  val determineBeamCenter: Stage = (df, _) =>
    df.withColumn("beam_center",
      when(col("directBeam").isNotNull,
        mainFeatureCentroidUdf(col("directBeam"), col("directH"), col("directW"))))

  /** K5: circular beam mask, radius scaled by distance
    * (`processstep_make_beam_mask.py:19-35,85-90`). */
  val makeBeamMask: Stage = (df, ctx) => {
    val distance = toMeters(col("detX.value"), col("detX.units")) -
      toMeters(col("sampleX.value"), col("sampleX.units"))
    df.withColumn("beam_center_distance_m", distance)
      .withColumn("beam_mask_radius",
        lit(ctx.refBeamDiameterPx / 2.0) * col("beam_center_distance_m") / lit(ctx.refDistanceM))
      .withColumn("beam_mask",
        when(col("beam_center").isNotNull && col("beam_center_distance_m") > 0,
          circularMaskUdf(col("directH"), col("directW"),
            col("beam_center")(0), col("beam_center")(1), col("beam_mask_radius"))))
  }

  /** K6–K10: flux images, dynamic beam analysis, transmissions, scattering
    * probability (`processstep_calc_beam_flux_and_transmissions.py:207-225`).
    *
    * Reference semantics, exactly: `DirectFlux`/`SampleFlux` are the sums
    * UNDER the circular distance-scaled `beam_mask` (K5, `BeamMaskPath`);
    * `*_flux_over_image` are the WHOLE-image sums; `Transmission` is the
    * masked ratio, `ImageTransmission` the whole-image ratio, and their
    * quotient is the correction factor (>= 1 for scattering samples). The
    * scattering-probability estimate compares the raw sample image's total
    * intensity with its intensity under the direct beam's TIGHT 0.997-
    * coverage dynamic-analysis mask. All image UDFs are null-gated (F2):
    * a repetition missing an image flows to the canStack quarantine
    * instead of NPE-ing the task. */
  val calcFluxAndTransmissions: Stage = (df, _) => {
    val withFlux = df
      .withColumn("direct_flux_img",
        when(col("directBeam").isNotNull && col("directFrameTime").isNotNull,
          fluxImageUdf(col("directBeam"), col("directFrameTime"), col("darkcurrent"))))
      .withColumn("sample_flux_img",
        when(col("sampleBeam").isNotNull && col("sampleFrameTime").isNotNull,
          fluxImageUdf(col("sampleBeam"), col("sampleFrameTime"), col("darkcurrent"))))
    val analyzed = withFlux
      // tight-mask analysis runs on the RAW direct image, as the reference's
      // dynamic_beam_analysis(DirectBeamData) does
      .withColumn("direct_analysis",
        when(col("directBeam").isNotNull,
          beamAnalysisUdf(col("directBeam"), col("directH"), col("directW"))))
    analyzed
      // whole-image flux sums (reference *FluxOverImage)
      .withColumn("direct_flux_over_image",
        when(col("direct_flux_img").isNotNull, nanSumUdf(col("direct_flux_img"))))
      .withColumn("sample_flux_over_image",
        when(col("sample_flux_img").isNotNull, nanSumUdf(col("sample_flux_img"))))
      // beam-masked flux sums (reference DirectFlux/SampleFlux) under the
      // circular mask built by makeBeamMask — NOT the tight ellipse
      .withColumn("direct_flux",
        when(col("direct_flux_img").isNotNull && col("beam_mask").isNotNull,
          maskedNanSumUdf(col("direct_flux_img"), col("beam_mask"))))
      .withColumn("sample_flux",
        when(col("sample_flux_img").isNotNull && col("beam_mask").isNotNull,
          maskedNanSumUdf(col("sample_flux_img"), col("beam_mask"))))
      // K9: transmissions + correction factor
      .withColumn("transmission_image",
        col("sample_flux_over_image") / col("direct_flux_over_image"))
      .withColumn("transmission", col("sample_flux") / col("direct_flux"))
      .withColumn("transmission_correction_factor",
        col("transmission_image") / col("transmission"))
      // K10: scattering probability — raw sample intensity outside the
      // tight direct-beam region, as a fraction of the total
      .withColumn("__sample_total",
        when(col("sampleBeam").isNotNull, nanSumUdf(col("sampleBeam"))))
      .withColumn("__sample_tight",
        when(col("sampleBeam").isNotNull && col("direct_analysis").isNotNull,
          maskedNanSumUdf(col("sampleBeam"), col("direct_analysis.mask"))))
      .withColumn("scattering_probability_estimate",
        (col("__sample_total") - col("__sample_tight")) / col("__sample_total"))
      .withColumn("sigma_minor", col("direct_analysis.sigmaMinor"))
      .withColumn("sigma_major", col("direct_analysis.sigmaMajor"))
      .withColumn("beam_theta", col("direct_analysis.theta"))
      .drop("direct_flux_img", "sample_flux_img", "__sample_total", "__sample_tight")
  }

  /** J3 + K12–K14: background link on (background_identifier, configuration)
    * against the per-collection aggregate, bg-corrected absorption,
    * thickness with guards and the logbook-wins selection
    * (`processstep_thickness_from_absorption.py:36-52,90-108,167-202`). */
  val thicknessFromAbsorption: Stage = (df, ctx) => {
    // bgStats branches off `df` itself — persist the frame so the upstream
    // plan (including the UDF image kernels) evaluates ONCE: the aggregate
    // stage fills the cache, the probe side of the join reads it back.
    // Tracked in ctx.caches: the driver calls ctx.caches.release() after
    // its action, so long-lived sessions don't accumulate cache entries.
    // No broadcast hint on bgStats: one row per (collection, configuration)
    // is unbounded, so AQE must stay free to pick a shuffle join at scale.
    val input = ctx.caches.track(df.persist(StorageLevel.MEMORY_AND_DISK))
    val bgStats = input.groupBy(
        col("collection_identifier").as("bg_id"),
        col("configuration").as("bg_config"))
      .agg(avg(col("transmission")).as("bg_transmission"))
    val joined = input.join(bgStats,
      col("background_identifier") === col("bg_id") &&
        col("configuration") === col("bg_config"), "left")
      .drop("bg_id", "bg_config")
    val sameBatch = col("background_identifier") === col("collection_identifier")
    val tSample = when(sameBatch || col("bg_transmission").isNull, col("transmission"))
      .otherwise(col("transmission") / col("bg_transmission"))
    val a = lit(1.0) - tSample
    // calculate_thickness (processstep_thickness_from_absorption.py:36-53):
    // -1 only for a == 0 or |a| > 1; NEGATIVE a in (-1, 0) — noise on very
    // high transmissions — deliberately yields a small NEGATIVE thickness
    // "so that the average for multiple repetitions is not biased". The
    // reference's step aborts without writing when mu <= 0 -> null here.
    val absA = abs(a)
    val derived = when(col("overallMu").isNull || col("overallMu") <= 0, lit(null))
      .when(absA === 0 || absA > 1, lit(-1.0))
      .otherwise(-signum(a) * log(lit(1.0) - absA) / col("overallMu"))
    joined
      .withColumn("transmission_sample", tSample)
      .withColumn("absorption_by_sample", a)
      .withColumn("absorption_derived_thickness", derived)
      .withColumn("thickness",
        when(col("samplethickness").isNotNull && col("samplethickness") >= 0,
          col("samplethickness")).otherwise(derived))
  }

  /** A7/A8/F4: per-batch max propagation of correction factor and scattering
    * probability (`processstep_transmission_correction_factor_propagator.py`).
    * Window, not groupBy — values land on every row without a re-join. */
  val propagateCorrectionFactors: Stage = (df, _) => {
    val w = Window.partitionBy(col("ymd"), col("batch"))
    df.withColumn("largest_transmission_correction_factor",
        max(when(col("transmission_correction_factor") =!= 0.0,
          col("transmission_correction_factor"))).over(w))
      .withColumn("largest_scattering_probability_estimate",
        max(col("scattering_probability_estimate")).over(w))
      .withColumn("is_lowest_repetition",
        col("repetition") === min(col("repetition")).over(w))
  }

  /** K16: apply the propagated factor only when > 1, keeping the original as
    * transmission_beam (`processstep_apply_transmission_correction_factor.py:46-76`). */
  val applyCorrectionFactor: Stage = (df, _) =>
    df.withColumn("transmission_beam", col("transmission"))
      .withColumn("transmission",
        when(col("largest_transmission_correction_factor") > 1,
          col("transmission") * col("largest_transmission_correction_factor"))
          .otherwise(col("transmission")))

  /** K15 + F6 + S12: rescale averaged frames back to counts, guarded on
    * n_frames != 0 (`processstep_average_to_counts.py:47-73`). Pure
    * higher-order function — stays in codegen. */
  val averageToCounts: Stage = (df, _) => {
    def rescale(c: Column): Column =
      when(col("averagedNumberOfFrames").isNull || col("averagedNumberOfFrames") === 0, c)
        .otherwise(transform(c, x => (x * col("averagedNumberOfFrames")).cast("float")))
    df.withColumn("sampleBeam", rescale(col("sampleBeam")))
      .withColumn("directBeam", rescale(col("directBeam")))
  }

  /** F7 + S15: stackability validation; rows failing the required-dataset
    * checklist split off to a quarantine frame
    * (`post_translation_operation_hdf5_stacker.py:26-78,100-110`). */
  def canStack: Column =
    col("sampleBeam").isNotNull && col("transmission").isNotNull &&
      col("beam_center").isNotNull && col("mask").isNotNull

  /** A1–A4: the stacker. One shuffle on (ymd, batch, configuration);
    * per-pixel stats via the mergeable ArrayStats aggregator; scalar stats
    * via built-ins (stddev_samp = ddof 1); non-stacked fields copied from the
    * lowest repetition (first-as-template)
    * (`post_translation_operation_hdf5_stacker.py:120-246`). */
  val stacker: Stage = (df, _) => {
    val stackUdaf = udaf(new ArrayStats.ArrayStatsAggregator())
    df.filter(canStack)
      .groupBy(col("ymd"), col("batch"), col("configuration"))
      .agg(
        count(lit(1)).as("n_repetitions"),
        sort_array(collect_list(col("repetition"))).as("repetitions"),
        stackUdaf(col("sampleBeam")).as("stacked_image_stats"),
        avg(col("transmission")).as("mean_transmission"),
        stddev_samp(col("transmission")).as("std_transmission"),
        (stddev_samp(col("transmission")) / sqrt(count(lit(1)))).as("sem_transmission"),
        avg(col("thickness")).as("mean_thickness"),
        stddev_samp(col("thickness")).as("std_thickness"),
        avg(col("direct_flux")).as("mean_direct_flux"),
        min_by(col("beam_center"), col("repetition")).as("template_beam_center"),
        min_by(col("mask_path"), col("repetition")).as("template_mask_path"))
  }

  /** K20 / S3–S6: first translator pass (`processstep_translator_step_1.py:
    * 24-45` — HDF5Translator with the instrument YAML config). When the
    * incoming frame is the raw long-format tree table, fold the configured
    * mapping into one wide row per file; an already-translated frame passes
    * through, mirroring the reference's already-processed skip (F3). */
  val translatorStep1: Stage = (df, ctx) =>
    if (ctx.translatorRules1.nonEmpty &&
        df.columns.contains("path") && df.columns.contains("valueF64"))
      TreeTable.translate(df, ctx.translatorRules1)
    else df

  /** Second translator pass (`processstep_translator_step_2.py` — refines
    * the step-1 file with a second mapping config): enriches the wide frame
    * with further tree-derived columns, keyed on `file`. */
  val translatorStep2: Stage = (df, ctx) => ctx.tree match {
    case Some(tree) if ctx.translatorRules2.nonEmpty && df.columns.contains("file") =>
      TreeTable.translateOnto(tree, df, ctx.translatorRules2)
    case _ => df
  }

  /** Background-file linkage (`processstep_add_background_files.py:66-78`):
    * resolve each background identifier to the stacked file's path relative
    * to the repetition directory `data_dir/<yyyy>/<ymd>/<ymd>_<batch>_<rep>`,
    * normalized the way `Path.relative_to(input_file.parent, walk_up=True)`
    * normalizes — shared year/date prefixes drop out:
    *   same date  -> `../MOUSE_<id>_<config>_stacked.nxs`
    *   same year  -> `../../<bgymd>/MOUSE_..._stacked.nxs`
    *   otherwise  -> `../../../<bgyyyy>/<bgymd>/MOUSE_..._stacked.nxs`
    * The 'None'/missing sentinel becomes '' exactly as the reference writes. */
  val addBackgroundFiles: Stage = (df, _) => {
    def stackedPath(id: Column): Column = {
      val bgYear = substring(id, 1, 4)
      val bgDate = substring(id, 1, 8)
      val fname = concat(lit("MOUSE_"), id, lit("_"), col("configuration"),
        lit("_stacked.nxs"))
      when(id.isNotNull && id =!= "" && id =!= "None",
        when(bgDate === col("ymd"), concat(lit("../"), fname))
          .when(bgYear === substring(col("ymd"), 1, 4),
            concat(lit("../../"), bgDate, lit("/"), fname))
          .otherwise(concat(lit("../../../"), bgYear, lit("/"), bgDate, lit("/"), fname)))
        .otherwise(lit(""))
    }
    df.withColumn("background_file", stackedPath(col("background_identifier")))
      .withColumn("dispersed_background_file",
        stackedPath(col("dispersant_background_identifier")))
  }

  /** Beam-shape info (`processstep_calc_beam_shape_info.py:31-56`): sigma
    * minor/major and theta of the direct-beam profile. The flux step already
    * emits these as a by-product of its beam analysis; run standalone, the
    * stage computes them from the direct beam without the flux machinery. */
  val calcBeamShapeInfo: Stage = (df, _) =>
    if (df.columns.contains("sigma_minor")) df
    else df
      .withColumn("__shape",
        when(col("directBeam").isNotNull,
          beamAnalysisUdf(col("directBeam"), col("directH"), col("directW"))))
      .withColumn("sigma_minor", col("__shape.sigmaMinor"))
      .withColumn("sigma_major", col("__shape.sigmaMajor"))
      .withColumn("beam_theta", col("__shape.theta"))
      .drop("__shape")

  /** S16 (`processstep_cleanup_files.py:20-40`): the reference deletes its
    * step-1 intermediate `.nxs`; this engine never materializes one (the
    * whole chain is one lazy plan), so the step is an explicit no-op kept
    * for step-list parity. */
  val cleanupFiles: Stage = (df, _) => df

  /** S13: the per-repetition summary row for the CSV append sink
    * (`processstep_transmission_thickness_flux_table.py:57-89`). */
  val fluxThicknessTable: Stage = (df, _) =>
    df.select(
      col("ymd"), col("batch"), col("repetition"), col("configuration"),
      col("collection_identifier"), col("sampleid"),
      col("direct_flux"), col("sample_flux"),
      col("transmission"), col("transmission_beam"),
      col("largest_transmission_correction_factor"),
      col("scattering_probability_estimate"),
      col("thickness"), col("energy_kev"))

  /** Step registry mirroring the reference's `--steps` names
    * (`directory_processor_multibatch_nostack.sh:18-33`). */
  val registry: Map[String, Stage] = Map(
    "translator_step_1" -> translatorStep1,
    "translator_step_2" -> translatorStep2,
    "add_background_files" -> addBackgroundFiles,
    "calc_beam_shape_info" -> calcBeamShapeInfo,
    "cleanup_files" -> cleanupFiles,
    "metadata_update" -> metadataUpdate,
    "add_mask_file" -> addMaskFile,
    "determine_beam_center" -> determineBeamCenter,
    "make_beam_mask" -> makeBeamMask,
    "calc_beam_flux_and_transmissions" -> calcFluxAndTransmissions,
    "thickness_from_absorption" -> thicknessFromAbsorption,
    "transmission_correction_factor_propagator" -> propagateCorrectionFactors,
    "apply_transmission_correction_factor" -> applyCorrectionFactor,
    "average_to_counts" -> averageToCounts,
    "stacker" -> stacker,
    "transmission_thickness_flux_table" -> fluxThicknessTable)

  /** Canonical full-processing order (minus sinks) — the reference's
    * relative order (`directory_processor_multibatch_nostack.sh:18-33`):
    * counts rescaling BEFORE flux math (dark subtraction is not invariant
    * under per-frame averaging), thickness AFTER the correction factor has
    * been applied to the transmission. */
  val defaultSteps: Seq[String] = Seq(
    "average_to_counts", "metadata_update", "add_mask_file",
    "determine_beam_center", "make_beam_mask",
    "calc_beam_flux_and_transmissions",
    "transmission_correction_factor_propagator",
    "apply_transmission_correction_factor", "thickness_from_absorption")

  /** The reference's verbatim 15-step production list
    * (`directory_processor_multibatch_nostack.sh:18-33`), accepted as-is. */
  val referenceSteps: Seq[String] = Seq(
    "processstep_translator_step_1",
    "processstep_translator_step_2",
    "processstep_average_to_counts",
    "processstep_cleanup_files",
    "processstep_add_mask_file",
    "processstep_metadata_update",
    "processstep_determine_beam_center",
    "processstep_make_beam_mask",
    "processstep_calc_beam_flux_and_transmissions",
    "processstep_calc_beam_shape_info",
    "processstep_add_background_files",
    "processstep_transmission_correction_factor_propagator",
    "processstep_apply_transmission_correction_factor",
    "processstep_thickness_from_absorption",
    "processstep_transmission_thickness_flux_table")

  /** Look up a step by either the short name or the reference's
    * `processstep_`-prefixed form, with a did-you-mean error. */
  def stage(name: String): Stage = {
    val key = name.stripPrefix("processstep_")
    registry.getOrElse(key, throw new NoSuchElementException(
      s"unknown step '$name'; known: ${registry.keys.toSeq.sorted.mkString(", ")}"))
  }

  /** Fold the ordered step list over the repetition frame — the reference's
    * `process_batch` loop as one lazy Catalyst plan (SURVEY §3.1). */
  def run(df: DataFrame, ctx: Context, steps: Seq[String] = defaultSteps): DataFrame =
    steps.foldLeft(df)((d, name) => stage(name)(d, ctx))
}
