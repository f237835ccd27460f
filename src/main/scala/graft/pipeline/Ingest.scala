package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TreeTable.MappingRule

/** From-bytes ingest: the long-format tree table of a measurement
  * directory scan ([[graft.sources.Hdf5Source.treeTable]]) assembled into
  * the typed repetition frame the 15-step pipeline consumes — the read
  * side the reference performs file-by-file through h5py
  * (`/root/reference/src/utilities.py:11-63,112-134`), expressed as one
  * relational translation (K20) so it distributes by file count.
  */
object Ingest {

  /** The reference's processed-file read paths, one `MappingRule` each:
    * configuration (`utilities.py:99-109`), frame times / darkcurrent /
    * frame count (`processstep_calc_beam_flux_and_transmissions.py:
    * 169-176`, `processstep_average_to_counts.py:47`), wavelength
    * (`processstep_metadata_update.py:57-58`), and the detector/sample
    * transformations (`processstep_make_beam_mask.py:66-68`). Units ride
    * along as stored; the consuming stages convert (§1.2). */
  val repetitionRules: Seq[MappingRule] = Seq(
    MappingRule("/entry1/instrument/configuration", "configuration_f", "f64"),
    MappingRule("/entry1/processing/direct_beam_profile/frame_time",
      "directFrameTime", "f64"),
    MappingRule("/entry1/processing/sample_beam_profile/frame_time",
      "sampleFrameTime", "f64"),
    MappingRule("/entry1/instrument/detector00/darkcurrent",
      "darkcurrent", "f64"),
    MappingRule("/entry1/instrument/detector00/averaged_number_of_frames",
      "averagedNumberOfFrames", "f64"),
    MappingRule("/entry1/sample/beam/incident_wavelength",
      "incidentWavelength", "quantity"),
    MappingRule("/entry1/instrument/detector00/transformations/det_x",
      "detX", "quantity"),
    MappingRule("/entry1/sample/transformations/sample_x",
      "sampleX", "quantity"))

  private val DirectBeamPath = "/entry1/processing/direct_beam_profile/data"
  private val SampleBeamPath = "/entry1/processing/sample_beam_profile/data"

  /** (ymd, batch, repetition) keys from the repetition DIRECTORY name —
    * `YMD_class.extract_metadata_from_path` (`src/YMD_class.py:33-44`)
    * relationally: the dir component `YYYYMMDD_batch_repetition` right
    * above the file. Files outside that naming are dropped (the scan may
    * see strays; the reference's walker never selects them). */
  def repetitionKeys(files: DataFrame): DataFrame = {
    val dirPat = "/(\\d{8})_(\\d+)_(\\d+)/[^/]+$"
    files
      .select(col("path").as("file"), col("modificationTime"),
        regexp_extract(col("path"), dirPat, 1).as("ymd"),
        regexp_extract(col("path"), dirPat, 2).as("b"),
        regexp_extract(col("path"), dirPat, 3).as("r"))
      .filter(col("ymd") =!= "")
      .withColumn("batch", col("b").cast("int"))
      .withColumn("repetition", col("r").cast("int"))
      .drop("b", "r")
  }

  /** Tree table -> typed repetition frame ([[Model.Repetition]] shape):
    * the translator pass (K20) for the scalar/quantity columns plus the
    * two beam-profile image reads (S6). One row per repetition file;
    * missing paths become the documented defaults (scalars) or null
    * images (the step gates skip those repetitions). */
  def repetitionsFromTree(tree: DataFrame, keys: DataFrame): DataFrame = {
    val wide = TreeTable.translateOnto(tree, keys, repetitionRules)
    val withDirect = TreeTable.readImage(tree, wide, DirectBeamPath,
      "directBeam", "directH", "directW")
    val withSample = TreeTable.readImage(tree, withDirect, SampleBeamPath,
      "sampleBeam", "sampleH", "sampleW")
    withSample
      .withColumn("configuration", col("configuration_f").cast("int"))
      .drop("configuration_f")
  }
}
