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

  // ---- round-9 breadth: the general CIF surface pymatgen handles ----

  val decorated: String =
    """data_deco
      |# full-line comment
      |_cell_length_a 2.0  # trailing comment
      |_cell_length_b 2.0
      |_cell_length_c 2.0
      |_cell_angle_alpha 90.0
      |_cell_angle_beta 90.0
      |_cell_angle_gamma 90.0
      |_chemical_name_common 'sodium chloride # not a comment'
      |_publ_section_title
      |;
      |A multiline
      |title block
      |;
      |loop_
      |_atom_site_label
      |_atom_site_type_symbol
      |_atom_site_occupancy
      |_atom_site_fract_x
      |_atom_site_fract_y
      |_atom_site_fract_z
      |Na1 Na1+ 1.0 0.0 0.0 0.0
      |Cl1 Cl1- 1.0
      |  0.5 0.5 0.5
      |""".stripMargin

  test("quoted values, comments, multiline text fields, wrapped loop rows, charge decorations") {
    val r = CifParser.parse("deco1", decorated)
    assert(r.species === Seq("Na", "Cl")) // charges stripped; Cl row wraps two lines
    assert(r.frac_coords(1) === Seq(0.5, 0.5, 0.5))
    assert(math.abs(r.lattice.volume - 8.0) < 1e-9)
  }

  val symmetric: String =
    """data_sym
      |_cell_length_a 4.0
      |_cell_length_b 4.0
      |_cell_length_c 4.0
      |_cell_angle_alpha 90.0
      |_cell_angle_beta 90.0
      |_cell_angle_gamma 90.0
      |loop_
      |_symmetry_equiv_pos_site_id
      |_symmetry_equiv_pos_as_xyz
      |1 'x, y, z'
      |2 '-x, -y, -z'
      |3 'x+1/2, y+1/2, z'
      |4 '-x+1/2, -y+1/2, -z'
      |loop_
      |_atom_site_type_symbol
      |_atom_site_fract_x
      |_atom_site_fract_y
      |_atom_site_fract_z
      |Cu 0.1 0.2 0.3
      |O 0.0 0.0 0.0
      |""".stripMargin

  test("symmetry expansion: general position gets |ops| images, special position deduplicates") {
    val r = CifParser.parse("sym1", symmetric)
    // Cu at a general position → 4 images; O at the origin is fixed by the
    // inversion (op 2 maps it to itself) → 2 distinct images
    assert(r.species.count(_ == "Cu") === 4)
    assert(r.species.count(_ == "O") === 2)
    // first Cu image is the identity op on the asymmetric site
    assert(r.frac_coords.head === Seq(0.1, 0.2, 0.3))
    // inversion image wrapped into [0,1)
    assert(r.frac_coords(1).zip(Seq(0.9, 0.8, 0.7)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // translation op: x+1/2 applied to 0.1 → 0.6
    assert(r.frac_coords(2).zip(Seq(0.6, 0.7, 0.3)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // cartesian follows the expanded set (cubic a=4: cart = 4·frac)
    assert(r.cart_coords(2).zip(Seq(2.4, 2.8, 1.2)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("space_group_symop_operation_xyz tag is accepted too") {
    val alt = symmetric.replace("_symmetry_equiv_pos_site_id", "_space_group_symop_id")
      .replace("_symmetry_equiv_pos_as_xyz", "_space_group_symop_operation_xyz")
    assert(CifParser.parse("sym2", alt).species.count(_ == "Cu") === 4)
  }

  val multiBlock: String = cubic +
    """data_second
      |_cell_length_a 3.0
      |_cell_length_b 3.0
      |_cell_length_c 3.0
      |_cell_angle_alpha 90.0
      |_cell_angle_beta 90.0
      |_cell_angle_gamma 90.0
      |loop_
      |_atom_site_type_symbol
      |_atom_site_fract_x
      |_atom_site_fract_y
      |_atom_site_fract_z
      |Mg 0.0 0.0 0.0
      |""".stripMargin

  test("multi-block file: parse keeps the first structure, parseAll returns both with unique ids") {
    val first = CifParser.parse("mb1", multiBlock)
    assert(first.species === Seq("Na", "Cl"))
    val all = CifParser.parseAll("mb1", multiBlock)
    assert(all.map(_.source_id) === Seq("mb1", "mb1#second"))
    assert(all(1).species === Seq("Mg"))
    assert(math.abs(all(1).lattice.volume - 27.0) < 1e-9)
  }

  test("symmetry op parser handles fractions, decimals, and multi-term rows") {
    val (rot, tr) = CifParser.parseSymOp("x-y+2/3, -x, z+0.25")
    assert(rot(0).toSeq === Seq(1.0, -1.0, 0.0))
    assert(math.abs(tr(0) - 2.0 / 3.0) < 1e-12)
    assert(rot(1).toSeq === Seq(-1.0, 0.0, 0.0))
    assert(rot(2).toSeq === Seq(0.0, 0.0, 1.0))
    assert(math.abs(tr(2) - 0.25) < 1e-12)
  }

  test("unknown-coordinate markers parse as 0 (pymatgen str2float fallback)") {
    val q = cubic.replace("Cl 0.5 0.5 0.5", "Cl 0.5 ? .")
    val r = CifParser.parse("q1", q)
    assert(r.frac_coords(1) === Seq(0.5, 0.0, 0.0))
  }

  test("unknown-value markers on CELL parameters fail loudly, never a zero lattice") {
    val bad = cubic.replace("_cell_length_a 2.0", "_cell_length_a ?")
    intercept[NumberFormatException](CifParser.parse("badcell", bad))
  }

  test("variable coefficients in symmetry ops are rejected, not mis-parsed") {
    val e = intercept[IllegalArgumentException](CifParser.parseSymOp("-2y, x, z"))
    assert(e.getMessage.contains("coefficient"))
  }

  test("truncated loop rows fail loudly instead of shifting columns silently") {
    // drop Cl's z coordinate: 7 values against 4 tags — a misaligned loop
    val bad = cubic.replace("Cl 0.5 0.5 0.5", "Cl 0.5 0.5")
    val e = intercept[IllegalArgumentException](CifParser.parse("trunc1", bad))
    assert(e.getMessage.contains("not a multiple"))
  }

  test("loop-free CIF expands symmetry from the H-M symbol (rock salt, Fm-3m)") {
    val doc =
      """data_nacl
        |_symmetry_space_group_name_H-M 'F m -3 m'
        |_cell_length_a 5.64
        |_cell_length_b 5.64
        |_cell_length_c 5.64
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
    val r = CifParser.parse("nacl", doc)
    // Fm-3m on the special positions 4a/4b: 4 Na + 4 Cl
    assert(r.species.count(_ == "Na") === 4)
    assert(r.species.count(_ == "Cl") === 4)
    val naSites = r.frac_coords.zip(r.species).collect { case (f, "Na") => f }.toSet
    assert(naSites === Set(Seq(0.0, 0.0, 0.0), Seq(0.0, 0.5, 0.5), Seq(0.5, 0.0, 0.5), Seq(0.5, 0.5, 0.0)))
  }

  test("loop-free CIF expands from the IT number and matches the H-M route") {
    def base(symTag: String) =
      s"""data_x
         |$symTag
         |_cell_length_a 6.0
         |_cell_length_b 7.0
         |_cell_length_c 8.0
         |_cell_angle_alpha 90.0
         |_cell_angle_beta 101.0
         |_cell_angle_gamma 90.0
         |loop_
         |_atom_site_type_symbol
         |_atom_site_fract_x
         |_atom_site_fract_y
         |_atom_site_fract_z
         |C 0.11 0.22 0.33
         |""".stripMargin
    val viaHm = CifParser.parse("a", base("_symmetry_space_group_name_H-M 'P 21/c'"))
    val viaNum = CifParser.parse("b", base("_space_group_IT_number 14"))
    val viaHall = CifParser.parse("c", base("_space_group_name_Hall '-P 2ybc'"))
    assert(viaHm.species.length === 4) // P21/c general position multiplicity
    assert(viaHm.frac_coords.toSet === viaNum.frac_coords.toSet)
    assert(viaHm.frac_coords.toSet === viaHall.frac_coords.toSet)
    // the general-position images of (x, y, z) under P21/c
    val f = viaHm.frac_coords.map(_.map(v => math.rint(v * 100) / 100)).toSet
    assert(f === Set(Seq(0.11, 0.22, 0.33), Seq(0.89, 0.72, 0.17),
      Seq(0.89, 0.78, 0.67), Seq(0.11, 0.28, 0.83)))
  }

  test("an explicit symop loop wins over the space-group tags; unknown symbols fail loudly") {
    val withLoop =
      """data_y
        |_symmetry_space_group_name_H-M 'F m -3 m'
        |_cell_length_a 4.0
        |_cell_length_b 4.0
        |_cell_length_c 4.0
        |_cell_angle_alpha 90.0
        |_cell_angle_beta 90.0
        |_cell_angle_gamma 90.0
        |loop_
        |_symmetry_equiv_pos_as_xyz
        |'x, y, z'
        |loop_
        |_atom_site_type_symbol
        |_atom_site_fract_x
        |_atom_site_fract_y
        |_atom_site_fract_z
        |Cu 0.0 0.0 0.0
        |""".stripMargin
    assert(CifParser.parse("y", withLoop).species === Seq("Cu")) // loop (P1) wins
    val badSym = withLoop.replace("'F m -3 m'", "'Qq 9 9'")
      .replace("loop_\n_symmetry_equiv_pos_as_xyz\n'x, y, z'\n", "")
    intercept[IllegalArgumentException](CifParser.parse("z", badSym))
  }

  test("CIF 1.1 quoting: an embedded quote not followed by whitespace stays inside the value") {
    val doc =
      """data_q
        |_journal_name 'O'Brien's site'
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
        |""".stripMargin
    // the quoted journal value must tokenize as ONE value (closing quote is
    // the one at end-of-line), leaving the cell items and loop intact
    val r = CifParser.parse("quote1", doc)
    assert(r.species === Seq("Na"))
    assert(math.abs(r.lattice.volume - 8.0) < 1e-9)
  }
}
