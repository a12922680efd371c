package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class CifParserSpec extends AnyFunSuite {

  val cubic: String =
    """data_test
      |_cell_length_a 2.0
      |_cell_length_b 2.0
      |_cell_length_c 2.0
      |_cell_angle_alpha 90.0
      |_cell_angle_beta 90.0
      |_cell_angle_gamma 90.0
      |loop_
      |_atom_site_type_symbol
      |_atom_site_fract_x
      |_atom_site_fract_y
      |_atom_site_fract_z
      |Na 0.0 0.0 0.0
      |Cl 0.5 0.5 0.5
      |""".stripMargin

  private def assertMatrix(actual: Seq[Seq[Double]], expected: Seq[Seq[Double]], tol: Double = 1e-7): Unit =
    actual.zip(expected).foreach { case (ra, re) =>
      ra.zip(re).foreach { case (a, e) => assert(math.abs(a - e) < tol, s"$actual vs $expected") }
    }

  test("cubic cell: matrix diagonal, volume a^3, cart = frac * a") {
    val r = CifParser.parse("cubic1", cubic)
    assert(r.source_id === "cubic1")
    assert(r.species === Seq("Na", "Cl"))
    assertMatrix(r.lattice.matrix, Seq(Seq(2.0, 0.0, 0.0), Seq(0.0, 2.0, 0.0), Seq(0.0, 0.0, 2.0)))
    assert(math.abs(r.lattice.volume - 8.0) < 1e-9)
    assert(r.cart_coords(1).zip(Seq(1.0, 1.0, 1.0)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  val triclinic: String =
    """data_tri
      |_cell_length_a 3.1(2)
      |_cell_length_b 4.2
      |_cell_length_c 5.3
      |_cell_angle_alpha 80.0
      |_cell_angle_beta 95.0
      |_cell_angle_gamma 100.0
      |loop_
      |_atom_site_label
      |_atom_site_fract_x
      |_atom_site_fract_y
      |_atom_site_fract_z
      |Fe1 0.25 0.25 0.25
      |""".stripMargin

  test("triclinic cell: uncertainty parentheses stripped, label species, positive volume") {
    val r = CifParser.parse("tri1", triclinic)
    assert(r.lattice.a === 3.1)
    assert(r.species === Seq("Fe"))
    assert(r.lattice.volume > 0)
    // |det| equals a*b*c*sqrt(1 - cos²α - cos²β - cos²γ + 2cosαcosβcosγ)
    val (ca, cb, cg) = (math.cos(math.toRadians(80)), math.cos(math.toRadians(95)), math.cos(math.toRadians(100)))
    val expected = 3.1 * 4.2 * 5.3 * math.sqrt(1 - ca * ca - cb * cb - cg * cg + 2 * ca * cb * cg)
    assert(math.abs(r.lattice.volume - expected) < 1e-6)
    // value-level parity with pymatgen Lattice.from_parameters(3.1,4.2,5.3,80,95,100)
    // (matrix generated with numpy using pymatgen's construction)
    assertMatrix(r.lattice.matrix, Seq(
      Seq(3.08820356, 0.0, -0.2701828),
      Seq(-0.6683008, 4.08184553, 0.72932235),
      Seq(0.0, 0.0, 5.3)))
  }

  test("missing cell parameter raises with file id") {
    val bad = "loop_\n_atom_site_fract_x\n0.0\n"
    val e = intercept[IllegalArgumentException](CifParser.parse("bad1", bad))
    assert(e.getMessage.contains("bad1"))
  }
}
