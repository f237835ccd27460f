package graft.pipeline

/** Chemical-formula parsing for the logbook's sample composition field —
  * the component modeling half of the reference's sample metadata
  * (`logbook2mouse`'s per-entry composition/components, consumed by
  * `processstep_metadata_update.py:177-186`). The reference's derived
  * `overall_mu` additionally needs elemental X-ray attenuation tables
  * (an external data dependency); this engine takes `overallMu` from the
  * logbook dimension and models the composition itself as typed
  * components.
  */
object Composition {

  /** One element of a parsed formula, e.g. Fe2(SO4)3 -> (Fe,2),(O,12),(S,3). */
  case class Component(element: String, count: Double)

  /** Parse a Hill-style formula with nested groups and decimal counts
    * ("SiO2", "Ca(OH)2", "Zr0.52Ti0.48O3"). Returns None for blank or
    * unparseable input — composition is optional metadata, so a malformed
    * cell must not kill the pipeline row. Components are merged and sorted
    * by element symbol for deterministic columnar output. */
  def parse(formula: String): Option[Seq[Component]] = {
    if (formula == null || formula.trim.isEmpty) return None
    val s = formula.trim
    var i = 0

    def number(): Double = {
      val st = i
      while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
      if (i == st) 1.0 else s.substring(st, i).toDouble
    }

    def group(): Map[String, Double] = {
      var acc = Map.empty[String, Double]
      def add(e: String, c: Double): Unit =
        acc = acc.updated(e, acc.getOrElse(e, 0.0) + c)
      while (i < s.length && s(i) != ')') {
        if (s(i) == '(') {
          i += 1
          val inner = group()
          require(i < s.length && s(i) == ')', "unbalanced parenthesis")
          i += 1
          val mult = number()
          inner.foreach { case (e, c) => add(e, c * mult) }
        } else if (s(i).isUpper) {
          val st = i
          i += 1
          while (i < s.length && s(i).isLower) i += 1
          add(s.substring(st, i), number())
        } else throw new IllegalArgumentException(s"unexpected '${s(i)}'")
      }
      acc
    }

    try {
      val m = group()
      require(i == s.length && m.nonEmpty, "trailing input or empty formula")
      Some(m.toSeq.sortBy(_._1).map { case (e, c) => Component(e, c) })
    } catch {
      case _: RuntimeException => None
    }
  }
}
