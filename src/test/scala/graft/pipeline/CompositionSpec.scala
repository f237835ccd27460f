package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import Composition._

/** Formula parsing for the logbook's sample composition field. */
class CompositionSpec extends AnyFunSuite {

  private def m(s: String): Map[String, Double] =
    parse(s).get.map(c => c.element -> c.count).toMap

  test("simple formulas") {
    assert(m("SiO2") == Map("Si" -> 1.0, "O" -> 2.0))
    assert(m("H2O") == Map("H" -> 2.0, "O" -> 1.0))
    assert(m("C") == Map("C" -> 1.0))
  }

  test("nested groups multiply out") {
    assert(m("Ca(OH)2") == Map("Ca" -> 1.0, "O" -> 2.0, "H" -> 2.0))
    assert(m("Fe2(SO4)3") == Map("Fe" -> 2.0, "S" -> 3.0, "O" -> 12.0))
    assert(m("Al2(Si2O5)(OH)4") ==
      Map("Al" -> 2.0, "Si" -> 2.0, "O" -> 9.0, "H" -> 4.0))
  }

  test("decimal stoichiometry (solid solutions)") {
    assert(m("Zr0.52Ti0.48O3") == Map("Zr" -> 0.52, "Ti" -> 0.48, "O" -> 3.0))
  }

  test("repeated elements merge; output is sorted by symbol") {
    assert(parse("CH3COOH").get ==
      Seq(Component("C", 2.0), Component("H", 4.0), Component("O", 2.0)))
  }

  test("parse inverts rendering for arbitrary component multisets") {
    val rnd = new scala.util.Random(7)
    val elems = Seq("H", "He", "Li", "C", "N", "O", "Na", "Si", "Cl", "Ca", "Fe", "Zr")
    for (_ <- 1 to 200) {
      val comps = rnd.shuffle(elems).take(1 + rnd.nextInt(5))
        .map(e => e -> (1 + rnd.nextInt(12)))
      val formula = comps.map { case (e, c) => if (c == 1) e else s"$e$c" }.mkString
      val expected = comps.map { case (e, c) => e -> c.toDouble }.toMap
      assert(m(formula) == expected, formula)
    }
  }

  test("blank or malformed input yields None, never an exception") {
    assert(parse(null).isEmpty)
    assert(parse("").isEmpty)
    assert(parse("   ").isEmpty)
    assert(parse("2SiO").isEmpty) // leading count
    assert(parse("Si(O2").isEmpty) // unbalanced
    assert(parse("siO2").isEmpty) // lowercase start
    assert(parse("Si-O").isEmpty) // stray symbol
  }
}
