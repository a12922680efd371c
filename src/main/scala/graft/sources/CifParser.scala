package graft.sources

/** Minimal CIF (Crystallographic Information File) parser — the subset the
  * reference obtains via pymatgen (`crystpqdb/loaders/mc3d.py:98-123`):
  * cell parameters → lattice matrix/volume, fractional coordinates, species
  * symbols, cartesian = frac · matrix. Full-CIF (symmetry ops, multi-block,
  * uncertainties beyond parentheses) is out of scope (SURVEY.md §7 hard
  * part 2).
  */
object CifParser {

  final case class Lattice(
      matrix: Seq[Seq[Double]],
      a: Double, b: Double, c: Double,
      alpha: Double, beta: Double, gamma: Double,
      pbc: Seq[Boolean], volume: Double)

  final case class CifRecord(
      source_id: String,
      species: Seq[String],
      frac_coords: Seq[Seq[Double]],
      cart_coords: Seq[Seq[Double]],
      lattice: Lattice)

  /** "1.234(5)" → 1.234 (strip standard-uncertainty parentheses). */
  private def num(s: String): Double = s.takeWhile(ch => ch != '(').toDouble

  /** Cell parameters → lattice matrix, using the c-along-z convention of
    * pymatgen's `Lattice.from_parameters` (the construction the reference's
    * MC3D path goes through, `crystpqdb/loaders/mc3d.py:98-123`):
    *
    *   a = [a·sinβ, 0, a·cosβ]
    *   b = [-b·sinα·cosγ*, b·sinα·sinγ*, b·cosα]   with
    *       cosγ* = (cosα·cosβ − cosγ) / (sinα·sinβ)
    *   c = [0, 0, c]
    *
    * Any valid convention gives the same frac coords / volume / cell params,
    * but value-level parity of `lattice.matrix` and `cart_coords` with
    * reference-produced data requires this orientation.
    */
  def latticeMatrix(a: Double, b: Double, c: Double,
                    alphaDeg: Double, betaDeg: Double, gammaDeg: Double): Seq[Seq[Double]] = {
    val alpha = math.toRadians(alphaDeg)
    val beta = math.toRadians(betaDeg)
    val gamma = math.toRadians(gammaDeg)
    val cosGammaStar = {
      val v = (math.cos(alpha) * math.cos(beta) - math.cos(gamma)) /
        (math.sin(alpha) * math.sin(beta))
      math.max(-1.0, math.min(1.0, v))
    }
    val sinGammaStar = math.sqrt(1.0 - cosGammaStar * cosGammaStar)
    Seq(
      Seq(a * math.sin(beta), 0.0, a * math.cos(beta)),
      Seq(-b * math.sin(alpha) * cosGammaStar,
        b * math.sin(alpha) * sinGammaStar,
        b * math.cos(alpha)),
      Seq(0.0, 0.0, c))
  }

  private def det3(m: Seq[Seq[Double]]): Double =
    m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
      m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
      m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))

  private def fracToCart(frac: Seq[Double], m: Seq[Seq[Double]]): Seq[Double] =
    (0 until 3).map(j => frac(0) * m(0)(j) + frac(1) * m(1)(j) + frac(2) * m(2)(j))

  /** Parse one CIF document. Reads `_cell_*` items and the first `loop_`
    * containing `_atom_site_fract_x`.
    */
  def parse(sourceId: String, content: String): CifRecord = {
    val lines = content.linesIterator.map(_.trim).filter(_.nonEmpty).toIndexedSeq

    def cell(name: String): Double =
      lines.collectFirst {
        case l if l.startsWith(name) && l.split("\\s+").length >= 2 =>
          num(l.split("\\s+")(1))
      }.getOrElse(throw new IllegalArgumentException(s"CIF $sourceId: missing $name"))

    val (a, b, c) = (cell("_cell_length_a"), cell("_cell_length_b"), cell("_cell_length_c"))
    val (al, be, ga) = (cell("_cell_angle_alpha"), cell("_cell_angle_beta"), cell("_cell_angle_gamma"))
    val matrix = latticeMatrix(a, b, c, al, be, ga)
    val volume = math.abs(det3(matrix))

    // find the atom_site loop: header tags then data rows
    val loopStarts = lines.zipWithIndex.filter(_._1 == "loop_").map(_._2)
    val siteLoop = loopStarts.map { start =>
      val tags = lines.drop(start + 1).takeWhile(_.startsWith("_")).toIndexedSeq
      (start, tags)
    }.find(_._2.exists(_.startsWith("_atom_site_fract_x")))
      .getOrElse(throw new IllegalArgumentException(s"CIF $sourceId: no atom_site loop"))

    val (start, tags) = siteLoop
    val rows = lines.drop(start + 1 + tags.size)
      .takeWhile(l => !l.startsWith("_") && l != "loop_" && !l.startsWith("#"))
      .map(_.split("\\s+").toIndexedSeq)
      .filter(_.size >= tags.size)

    def idx(tag: String): Int = tags.indexWhere(_.startsWith(tag))
    val symIdx = Seq("_atom_site_type_symbol", "_atom_site_label").map(idx).find(_ >= 0)
      .getOrElse(throw new IllegalArgumentException(s"CIF $sourceId: no species column"))
    val (xi, yi, zi) = (idx("_atom_site_fract_x"), idx("_atom_site_fract_y"), idx("_atom_site_fract_z"))

    val species = rows.map(r => r(symIdx).takeWhile(_.isLetter))
    val frac = rows.map(r => Seq(num(r(xi)), num(r(yi)), num(r(zi))))
    val cart = frac.map(f => fracToCart(f, matrix))

    CifRecord(sourceId, species, frac, cart,
      Lattice(matrix, a, b, c, al, be, ga, Seq(true, true, true), volume))
  }
}
