package graft.pipeline

/** S10: the pipeline settings file (`MOUSE_settings.yaml`), parsed into a
  * typed carrier with the reference's required-key contract and default-path
  * derivation chain (`defaults_carrier.py:29-39` for the YAML load,
  * `:65-80` for the defaults), so a deployment can point the engine at its
  * measurement tree with the exact same file it feeds the reference.
  *
  * The settings file is FLAT yaml — string keys to scalar values, comments,
  * quoted or bare strings (see `MOUSE_settings.yaml`) — so a dependency-free
  * ~40-line reader covers the real surface; nested YAML fails loudly rather
  * than misparse. Paths are kept as STRINGS, not java.nio Paths: on the
  * cluster they name Hadoop filesystem locations (`s3://…`, `hdfs://…`)
  * that the local Path type would mangle, and existence is checked by the
  * scan that first reads them, per-executor, not up front on the driver. */
object Settings {

  final case class Carrier(
      vsiRoot: String,
      postTranslationDir: String,
      translatorTemplateDir: String,
      saxsDir: String,
      dataDir: String,
      masksDir: String,
      projectsDir: String,
      logbookFile: String,
      stackerConfigFile: String,
      loggingLevel: String)

  /** Flat-YAML text -> key/value map. Handles comment lines and trailing
    * comments, single/double-quoted and bare scalars, and blank lines; a
    * nested block (a key with no scalar on its line, or an indented key)
    * is outside the settings-file contract and fails loudly. */
  def parse(text: String): Map[String, String] = {
    val entries = text.linesIterator.zipWithIndex.flatMap { case (line0, i) =>
      val line = line0.stripSuffix("\r") // CRLF settings files edited on Windows
      val noBom = if (i == 0) line.stripPrefix("﻿") else line
      if (noBom.trim.isEmpty || noBom.trim.startsWith("#")) None
      else {
        require(!noBom.head.isWhitespace,
          s"line ${i + 1}: nested YAML is not a flat settings file: $line")
        val colon = noBom.indexOf(':')
        require(colon > 0, s"line ${i + 1}: expected 'key: value': $line")
        val key = noBom.substring(0, colon).trim
        val raw = noBom.substring(colon + 1).trim
        val value =
          if (raw.startsWith("\"") || raw.startsWith("'")) {
            val q = raw.head
            val end = raw.indexOf(q, 1)
            require(end > 0, s"line ${i + 1}: unterminated quote: $line")
            raw.substring(1, end)
          } else {
            // YAML starts a trailing comment only at whitespace + '#' —
            // or at the very start of the value (`key: # note` is a null
            // value, not the string "# note"); a bare '#' INSIDE a scalar
            // (masks_dir: /data/run#12) is data
            val cut = raw.indices.find(j =>
              raw(j) == '#' && (j == 0 || raw(j - 1).isWhitespace))
            cut.fold(raw)(raw.substring(0, _)).trim
          }
        require(value.nonEmpty,
          s"line ${i + 1}: key '$key' has no scalar value (nested block?)")
        Some(key -> value)
      }
    }
    entries.toMap
  }

  /** `create_defaults_carrier_from_config` semantics: three required keys,
    * every other path derived from them when absent. */
  def fromYaml(text: String): Carrier = fromMap(parse(text))

  def fromMap(config: Map[String, String]): Carrier = {
    val required = Seq("vsi_root", "post_translation_dir", "translator_template_dir")
    val missing = required.filterNot(config.contains)
    require(missing.isEmpty,
      s"Missing required configuration keys: ${missing.mkString(", ")}")

    def join(base: String, segs: String*): String =
      (base.stripSuffix("/") +: segs).mkString("/")

    val vsiRoot = config("vsi_root")
    val saxsDir = config.getOrElse("saxs_dir", join(vsiRoot, "Measurements", "SAXS002"))
    val dataDir = config.getOrElse("data_dir", join(saxsDir, "data"))
    Carrier(
      vsiRoot = vsiRoot,
      postTranslationDir = config("post_translation_dir"),
      translatorTemplateDir = config("translator_template_dir"),
      saxsDir = saxsDir,
      dataDir = dataDir,
      masksDir = config.getOrElse("masks_dir", join(dataDir, "Masks")),
      projectsDir = config.getOrElse("projects_dir",
        join(vsiRoot, "Proposals", "SAXS002")),
      logbookFile = config.getOrElse("logbook_file",
        join(saxsDir, "logbooks", "logbook_MOUSE.xlsx")),
      stackerConfigFile = config.getOrElse("stacker_config_file",
        join(dataDir, "StackerConfigurations", "stacker_config.yaml")),
      loggingLevel = config.getOrElse("logging_level", "INFO"))
  }
}
