package graft.sources

/** Space-group symmetry operations from a bare Hermann–Mauguin symbol or
  * International Tables number — the data-table path pymatgen reaches
  * through its space-group database when a CIF omits the
  * `_symmetry_equiv_pos_as_xyz` loop (`crystpqdb/loaders/mc3d.py:98-123`
  * obtains fully-expanded structures whichever route the CIF forces).
  *
  * Rather than transcribing ~15 000 general-position strings, each of the
  * 230 standard settings is stored as its Hall symbol (S.R. Hall,
  * "Space-group notation with an explicit origin", Acta Cryst. A37 (1981)
  * 517–525 — the compact public encoding the CIF symmetry dictionary
  * standardises as `_space_group_name_hall`) and the operation set is
  * GENERATED: parse the Hall generators, then close the Seitz group over
  * composition. Translations live on the 1/12 grid (every Hall
  * translation — centering, glide, screw, origin shift — is a multiple of
  * 1/12), so closure is exact integer arithmetic, no float drift.
  *
  * Settings follow the conventional choices the reference's pymatgen path
  * produces: monoclinic unique axis b, rhombohedral groups on hexagonal
  * axes, origin choice 2 (inversion at the origin) where ITA offers two.
  * A `:1`/`:R` suffix requesting the other setting fails loudly rather
  * than silently expanding the wrong origin.
  *
  * Every entry is validated in SpaceGroupsSpec: |G| must equal
  * point-group order × centering multiplicity (a wrong rotation symbol,
  * screw subscript, or origin shift breaks closure onto a different
  * order), centrosymmetry must match the crystal class, and a panel of
  * well-known groups is checked against their published general-position
  * sets exactly.
  */
object SpaceGroups {

  /** One symmetry op: 3×3 rotation part (integer entries) and translation
    * in twelfths, both acting on column fractional coordinates.
    */
  final case class Op(r: Vector[Int], t: Vector[Int]) {
    def compose(o: Op): Op = {
      val rr = Vector.tabulate(9) { i =>
        val (row, colIdx) = (i / 3, i % 3)
        (0 until 3).map(k => r(row * 3 + k) * o.r(k * 3 + colIdx)).sum
      }
      val tt = Vector.tabulate(3) { row =>
        val v = (0 until 3).map(k => r(row * 3 + k) * o.t(k)).sum + t(row)
        ((v % 12) + 12) % 12
      }
      Op(rr, tt)
    }
    def asMatrices: (Array[Array[Double]], Array[Double]) =
      (Array.tabulate(3, 3)((i, j) => r(i * 3 + j).toDouble),
        Array.tabulate(3)(i => t(i) / 12.0))

    /** "x-y+1/2,-x,z+1/3"-style string (debug / CIF round-trip). */
    def xyz: String = (0 until 3).map { row =>
      val vars = Seq("x", "y", "z")
      val sb = new StringBuilder
      for (c <- 0 until 3) r(row * 3 + c) match {
        case 0 =>
        case 1 => if (sb.nonEmpty) sb.append('+'); sb.append(vars(c))
        case -1 => sb.append('-').append(vars(c))
        case k => if (k > 0 && sb.nonEmpty) sb.append('+'); sb.append(s"$k${vars(c)}")
      }
      val tw = t(row)
      if (tw != 0) {
        val g = gcd(tw, 12)
        sb.append('+').append(s"${tw / g}/${12 / g}")
      }
      sb.result()
    }.mkString(",")
  }

  private def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)

  private val identity = Op(Vector(1, 0, 0, 0, 1, 0, 0, 0, 1), Vector(0, 0, 0))
  private val inversion = Op(Vector(-1, 0, 0, 0, -1, 0, 0, 0, -1), Vector(0, 0, 0))

  // ---------------------------------------------------------- Hall parsing

  /** Principal / diagonal rotation matrices (Hall 1981 Table 3). Primed
    * axes (', ") are relative to the PRECEDING generator's axis.
    */
  private val rot: Map[(Int, Char), Vector[Int]] = Map(
    (1, 'z') -> Vector(1, 0, 0, 0, 1, 0, 0, 0, 1),
    (2, 'z') -> Vector(-1, 0, 0, 0, -1, 0, 0, 0, 1),
    (3, 'z') -> Vector(0, -1, 0, 1, -1, 0, 0, 0, 1),
    (4, 'z') -> Vector(0, -1, 0, 1, 0, 0, 0, 0, 1),
    (6, 'z') -> Vector(1, -1, 0, 1, 0, 0, 0, 0, 1),
    (2, 'x') -> Vector(1, 0, 0, 0, -1, 0, 0, 0, -1),
    (3, 'x') -> Vector(1, 0, 0, 0, 0, -1, 0, 1, -1),
    (4, 'x') -> Vector(1, 0, 0, 0, 0, -1, 0, 1, 0),
    (6, 'x') -> Vector(1, 0, 0, 0, 1, -1, 0, 1, 0),
    (2, 'y') -> Vector(-1, 0, 0, 0, 1, 0, 0, 0, -1),
    (3, 'y') -> Vector(-1, 0, 1, 0, 1, 0, -1, 0, 0),
    (4, 'y') -> Vector(0, 0, 1, 0, 1, 0, -1, 0, 0),
    (6, 'y') -> Vector(0, 0, 1, 0, 1, 0, -1, 0, 1),
    (3, '*') -> Vector(0, 0, 1, 1, 0, 0, 0, 1, 0))

  /** 2-fold about the face diagonals, keyed by the preceding axis. */
  private val rotPrime: Map[(Char, Char), Vector[Int]] = Map(
    ('z', '\'') -> Vector(0, -1, 0, -1, 0, 0, 0, 0, -1),
    ('z', '"') -> Vector(0, 1, 0, 1, 0, 0, 0, 0, -1),
    ('x', '\'') -> Vector(-1, 0, 0, 0, 0, -1, 0, -1, 0),
    ('x', '"') -> Vector(-1, 0, 0, 0, 0, 1, 0, 1, 0),
    ('y', '\'') -> Vector(0, 0, -1, 0, -1, 0, -1, 0, 0),
    ('y', '"') -> Vector(0, 0, 1, 0, -1, 0, 1, 0, 0))

  private val latticeTranslations: Map[Char, Seq[Vector[Int]]] = Map(
    'P' -> Seq(),
    'A' -> Seq(Vector(0, 6, 6)),
    'B' -> Seq(Vector(6, 0, 6)),
    'C' -> Seq(Vector(6, 6, 0)),
    'I' -> Seq(Vector(6, 6, 6)),
    'R' -> Seq(Vector(8, 4, 4), Vector(4, 8, 8)),
    'F' -> Seq(Vector(0, 6, 6), Vector(6, 0, 6), Vector(6, 6, 0)))

  private val glideTranslations: Map[Char, Vector[Int]] = Map(
    'a' -> Vector(6, 0, 0), 'b' -> Vector(0, 6, 0), 'c' -> Vector(0, 0, 6),
    'n' -> Vector(6, 6, 6), 'u' -> Vector(3, 0, 0), 'v' -> Vector(0, 3, 0),
    'w' -> Vector(0, 0, 3), 'd' -> Vector(3, 3, 3))

  private def axisUnit(axis: Char): Vector[Int] = axis match {
    case 'x' => Vector(1, 0, 0)
    case 'y' => Vector(0, 1, 0)
    case 'z' => Vector(0, 0, 1)
    case a => throw new IllegalArgumentException(s"screw subscript on non-principal axis '$a'")
  }

  // Op sets are immutable and there are ≤230 conventional settings (plus the
  // occasional shifted variant), so the closure is generated once per JVM per
  // symbol — a per-row CIF parse (q_ing6: one per document) must not re-run
  // the Seitz closure 50k times per executor.
  private val opsCache = new java.util.concurrent.ConcurrentHashMap[String, Seq[Op]]()

  /** Parse one Hall symbol into the full operation set (closed group). */
  def opsForHall(hall: String): Seq[Op] =
    opsCache.computeIfAbsent(hall, computeOpsForHall(_))

  private def computeOpsForHall(hall: String): Seq[Op] = {
    var s = hall.trim
    require(s.nonEmpty, "empty Hall symbol")
    // optional origin-shift suffix "(va vb vc)" in twelfths
    var shift: Option[Vector[Int]] = None
    val par = s.indexOf('(')
    if (par >= 0) {
      val close = s.indexOf(')', par)
      require(close > par, s"Hall '$hall': unclosed origin shift")
      val comps = s.substring(par + 1, close).trim.split("\\s+").map(_.toInt)
      require(comps.length == 3, s"Hall '$hall': origin shift needs 3 components")
      shift = Some(Vector(comps(0), comps(1), comps(2)))
      s = s.substring(0, par).trim
    }
    val fields = s.split("\\s+").toSeq
    var lat = fields.head
    val centro = lat.startsWith("-")
    if (centro) lat = lat.substring(1)
    require(lat.length == 1 && latticeTranslations.contains(lat(0)),
      s"Hall '$hall': unknown lattice '$lat'")
    val centering = latticeTranslations(lat(0))

    val gens = scala.collection.mutable.ListBuffer[Op]()
    var prevOrder = 0
    var prevAxis = 'z'
    fields.tail.zipWithIndex.foreach { case (fld, idx) =>
      var f = fld
      val improper = f.startsWith("-")
      if (improper) f = f.substring(1)
      require(f.nonEmpty && f(0).isDigit, s"Hall '$hall': bad matrix symbol '$fld'")
      val order = f(0) - '0'
      require(Set(1, 2, 3, 4, 6)(order), s"Hall '$hall': bad rotation order in '$fld'")
      var rest = f.substring(1)
      // explicit axis char, else Hall's default-axis rules
      var axis: Char =
        if (rest.nonEmpty && "xyz*'\"".contains(rest(0))) { val a = rest(0); rest = rest.substring(1); a }
        else if (idx == 0) 'z'
        else if (order == 2 && (prevOrder == 2 || prevOrder == 4)) 'x'
        else if (order == 2 && (prevOrder == 3 || prevOrder == 6)) '\''
        else if (order == 3) '*'
        else if (order == 1) 'z'
        else throw new IllegalArgumentException(s"Hall '$hall': cannot infer axis for '$fld'")
      val m =
        if (axis == '\'' || axis == '"') {
          require(order == 2, s"Hall '$hall': primed axis on order-$order rotation")
          rotPrime(prevAxis -> axis)
        } else rot.getOrElse(order -> axis,
          throw new IllegalArgumentException(s"Hall '$hall': no matrix for $order$axis"))
      var t = Vector(0, 0, 0)
      rest.foreach {
        case d if d.isDigit => // screw subscript N_q: (q/N)·axis, in twelfths
          val q = d - '0'
          require(q > 0 && q < order, s"Hall '$hall': screw $order$q out of range")
          val u = axisUnit(axis)
          t = t.lazyZip(u.map(_ * (12 * q / order))).map(_ + _)
        case g if glideTranslations.contains(g) =>
          t = t.lazyZip(glideTranslations(g)).map(_ + _)
        case other => throw new IllegalArgumentException(s"Hall '$hall': bad translation char '$other' in '$fld'")
      }
      val rm = if (improper) m.map(-_) else m
      gens += Op(rm, t.map(v => ((v % 12) + 12) % 12))
      prevOrder = order
      if (axis != '\'' && axis != '"') prevAxis = axis
    }
    if (centro) gens += inversion
    centering.foreach(ct => gens += Op(identity.r, ct))

    var group = closure(gens.toSeq)
    shift.foreach { v =>
      // conjugate by the origin shift: x' = R(x − v) + t + v, i.e.
      // t → t + v − R·v (all on the twelfths grid)
      group = group.map { op =>
        val rv = Vector.tabulate(3)(row => (0 until 3).map(k => op.r(row * 3 + k) * v(k)).sum)
        Op(op.r, Vector.tabulate(3)(i => (((op.t(i) + v(i) - rv(i)) % 12) + 12) % 12))
      }
    }
    // deterministic order: identity first, then sorted by matrix+translation
    group.sortBy(op => (if (op == identity) 0 else 1, op.r.mkString(","), op.t.mkString(",")))
  }

  private def closure(gens: Seq[Op]): Seq[Op] = {
    val seen = scala.collection.mutable.LinkedHashSet[Op](identity)
    var frontier = gens.filterNot(seen.contains)
    frontier.foreach(seen += _)
    while (frontier.nonEmpty) {
      val next = scala.collection.mutable.ListBuffer[Op]()
      for (f <- frontier; g <- seen) {
        val a = f.compose(g)
        if (!seen.contains(a)) { seen += a; next += a }
        val b = g.compose(f)
        if (!seen.contains(b)) { seen += b; next += b }
      }
      require(seen.size <= 1024,
        s"space-group closure exceeded 1024 ops — inconsistent generators")
      frontier = next.toSeq
    }
    seen.toSeq
  }

  // --------------------------------------------------- the 230 settings

  /** (IT number, short Hermann–Mauguin symbol, Hall symbol) for the
    * conventional setting of each space group (monoclinic unique axis b,
    * rhombohedral on hexagonal axes, origin choice 2 where applicable) —
    * Hall's published Table 6 / the CIF symmetry dictionary values.
    */
  val table: Vector[(Int, String, String)] = Vector(
    (1, "P1", "P 1"), (2, "P-1", "-P 1"),
    (3, "P2", "P 2y"), (4, "P21", "P 2yb"), (5, "C2", "C 2y"),
    (6, "Pm", "P -2y"), (7, "Pc", "P -2yc"), (8, "Cm", "C -2y"), (9, "Cc", "C -2yc"),
    (10, "P2/m", "-P 2y"), (11, "P21/m", "-P 2yb"), (12, "C2/m", "-C 2y"),
    (13, "P2/c", "-P 2yc"), (14, "P21/c", "-P 2ybc"), (15, "C2/c", "-C 2yc"),
    (16, "P222", "P 2 2"), (17, "P2221", "P 2c 2"), (18, "P21212", "P 2 2ab"),
    (19, "P212121", "P 2ac 2ab"), (20, "C2221", "C 2c 2"), (21, "C222", "C 2 2"),
    (22, "F222", "F 2 2"), (23, "I222", "I 2 2"), (24, "I212121", "I 2b 2c"),
    (25, "Pmm2", "P 2 -2"), (26, "Pmc21", "P 2c -2"), (27, "Pcc2", "P 2 -2c"),
    (28, "Pma2", "P 2 -2a"), (29, "Pca21", "P 2c -2ac"), (30, "Pnc2", "P 2 -2bc"),
    (31, "Pmn21", "P 2ac -2"), (32, "Pba2", "P 2 -2ab"), (33, "Pna21", "P 2c -2n"),
    (34, "Pnn2", "P 2 -2n"), (35, "Cmm2", "C 2 -2"), (36, "Cmc21", "C 2c -2"),
    (37, "Ccc2", "C 2 -2c"), (38, "Amm2", "A 2 -2"), (39, "Aem2", "A 2 -2b"),
    (40, "Ama2", "A 2 -2a"), (41, "Aea2", "A 2 -2ab"), (42, "Fmm2", "F 2 -2"),
    (43, "Fdd2", "F 2 -2d"), (44, "Imm2", "I 2 -2"), (45, "Iba2", "I 2 -2c"),
    (46, "Ima2", "I 2 -2a"),
    (47, "Pmmm", "-P 2 2"), (48, "Pnnn", "-P 2ab 2bc"), (49, "Pccm", "-P 2 2c"),
    (50, "Pban", "-P 2ab 2b"), (51, "Pmma", "-P 2a 2a"), (52, "Pnna", "-P 2a 2bc"),
    (53, "Pmna", "-P 2ac 2"), (54, "Pcca", "-P 2a 2ac"), (55, "Pbam", "-P 2 2ab"),
    (56, "Pccn", "-P 2ab 2ac"), (57, "Pbcm", "-P 2c 2b"), (58, "Pnnm", "-P 2 2n"),
    (59, "Pmmn", "-P 2ab 2a"), (60, "Pbcn", "-P 2n 2ab"), (61, "Pbca", "-P 2ac 2ab"),
    (62, "Pnma", "-P 2ac 2n"), (63, "Cmcm", "-C 2c 2"), (64, "Cmce", "-C 2bc 2"),
    (65, "Cmmm", "-C 2 2"), (66, "Cccm", "-C 2 2c"), (67, "Cmme", "-C 2b 2"),
    (68, "Ccce", "-C 2b 2bc"), (69, "Fmmm", "-F 2 2"), (70, "Fddd", "-F 2uv 2vw"),
    (71, "Immm", "-I 2 2"), (72, "Ibam", "-I 2 2c"), (73, "Ibca", "-I 2b 2c"),
    (74, "Imma", "-I 2b 2"),
    (75, "P4", "P 4"), (76, "P41", "P 4w"), (77, "P42", "P 4c"), (78, "P43", "P 4cw"),
    (79, "I4", "I 4"), (80, "I41", "I 4bw"), (81, "P-4", "P -4"), (82, "I-4", "I -4"),
    (83, "P4/m", "-P 4"), (84, "P42/m", "-P 4c"), (85, "P4/n", "-P 4a"),
    (86, "P42/n", "-P 4bc"), (87, "I4/m", "-I 4"), (88, "I41/a", "-I 4ad"),
    (89, "P422", "P 4 2"), (90, "P4212", "P 4ab 2ab"), (91, "P4122", "P 4w 2c"),
    (92, "P41212", "P 4abw 2nw"), (93, "P4222", "P 4c 2"), (94, "P42212", "P 4n 2n"),
    (95, "P4322", "P 4cw 2c"), (96, "P43212", "P 4nw 2abw"), (97, "I422", "I 4 2"),
    (98, "I4122", "I 4bw 2bw"),
    (99, "P4mm", "P 4 -2"), (100, "P4bm", "P 4 -2ab"), (101, "P42cm", "P 4c -2c"),
    (102, "P42nm", "P 4n -2n"), (103, "P4cc", "P 4 -2c"), (104, "P4nc", "P 4 -2n"),
    (105, "P42mc", "P 4c -2"), (106, "P42bc", "P 4c -2ab"), (107, "I4mm", "I 4 -2"),
    (108, "I4cm", "I 4 -2c"), (109, "I41md", "I 4bw -2"), (110, "I41cd", "I 4bw -2c"),
    (111, "P-42m", "P -4 2"), (112, "P-42c", "P -4 2c"), (113, "P-421m", "P -4 2ab"),
    (114, "P-421c", "P -4 2n"), (115, "P-4m2", "P -4 -2"), (116, "P-4c2", "P -4 -2c"),
    (117, "P-4b2", "P -4 -2ab"), (118, "P-4n2", "P -4 -2n"), (119, "I-4m2", "I -4 -2"),
    (120, "I-4c2", "I -4 -2c"), (121, "I-42m", "I -4 2"), (122, "I-42d", "I -4 2bw"),
    (123, "P4/mmm", "-P 4 2"), (124, "P4/mcc", "-P 4 2c"), (125, "P4/nbm", "-P 4a 2b"),
    (126, "P4/nnc", "-P 4a 2bc"), (127, "P4/mbm", "-P 4 2ab"), (128, "P4/mnc", "-P 4 2n"),
    (129, "P4/nmm", "-P 4a 2a"), (130, "P4/ncc", "-P 4a 2ac"), (131, "P42/mmc", "-P 4c 2"),
    (132, "P42/mcm", "-P 4c 2c"), (133, "P42/nbc", "-P 4ac 2b"), (134, "P42/nnm", "-P 4ac 2bc"),
    (135, "P42/mbc", "-P 4c 2ab"), (136, "P42/mnm", "-P 4n 2n"), (137, "P42/nmc", "-P 4ac 2a"),
    (138, "P42/ncm", "-P 4ac 2ac"), (139, "I4/mmm", "-I 4 2"), (140, "I4/mcm", "-I 4 2c"),
    (141, "I41/amd", "-I 4bd 2"), (142, "I41/acd", "-I 4bd 2c"),
    (143, "P3", "P 3"), (144, "P31", "P 31"), (145, "P32", "P 32"), (146, "R3", "R 3"),
    (147, "P-3", "-P 3"), (148, "R-3", "-R 3"),
    (149, "P312", "P 3 2"), (150, "P321", "P 3 2\""), (151, "P3112", "P 31 2 (0 0 4)"),
    (152, "P3121", "P 31 2\""), (153, "P3212", "P 32 2 (0 0 2)"), (154, "P3221", "P 32 2\""),
    (155, "R32", "R 3 2\""),
    (156, "P3m1", "P 3 -2\""), (157, "P31m", "P 3 -2"), (158, "P3c1", "P 3 -2\"c"),
    (159, "P31c", "P 3 -2c"), (160, "R3m", "R 3 -2\""), (161, "R3c", "R 3 -2\"c"),
    (162, "P-31m", "-P 3 2"), (163, "P-31c", "-P 3 2c"), (164, "P-3m1", "-P 3 2\""),
    (165, "P-3c1", "-P 3 2\"c"), (166, "R-3m", "-R 3 2\""), (167, "R-3c", "-R 3 2\"c"),
    (168, "P6", "P 6"), (169, "P61", "P 61"), (170, "P65", "P 65"), (171, "P62", "P 62"),
    (172, "P64", "P 64"), (173, "P63", "P 6c"), (174, "P-6", "P -6"),
    (175, "P6/m", "-P 6"), (176, "P63/m", "-P 6c"),
    (177, "P622", "P 6 2"), (178, "P6122", "P 61 2 (0 0 5)"), (179, "P6522", "P 65 2 (0 0 1)"),
    (180, "P6222", "P 62 2 (0 0 4)"), (181, "P6422", "P 64 2 (0 0 2)"), (182, "P6322", "P 6c 2c"),
    (183, "P6mm", "P 6 -2"), (184, "P6cc", "P 6 -2c"), (185, "P63cm", "P 6c -2"),
    (186, "P63mc", "P 6c -2c"), (187, "P-6m2", "P -6 2"), (188, "P-6c2", "P -6c 2"),
    (189, "P-62m", "P -6 -2"), (190, "P-62c", "P -6c -2c"),
    (191, "P6/mmm", "-P 6 2"), (192, "P6/mcc", "-P 6 2c"), (193, "P63/mcm", "-P 6c 2"),
    (194, "P63/mmc", "-P 6c 2c"),
    (195, "P23", "P 2 2 3"), (196, "F23", "F 2 2 3"), (197, "I23", "I 2 2 3"),
    (198, "P213", "P 2ac 2ab 3"), (199, "I213", "I 2b 2c 3"),
    (200, "Pm-3", "-P 2 2 3"), (201, "Pn-3", "-P 2ab 2bc 3"), (202, "Fm-3", "-F 2 2 3"),
    (203, "Fd-3", "-F 2uv 2vw 3"), (204, "Im-3", "-I 2 2 3"), (205, "Pa-3", "-P 2ac 2ab 3"),
    (206, "Ia-3", "-I 2b 2c 3"),
    (207, "P432", "P 4 2 3"), (208, "P4232", "P 4n 2 3"), (209, "F432", "F 4 2 3"),
    (210, "F4132", "F 4d 2 3"), (211, "I432", "I 4 2 3"), (212, "P4332", "P 4acd 2ab 3"),
    (213, "P4132", "P 4bd 2ab 3"), (214, "I4132", "I 4bd 2c 3"),
    (215, "P-43m", "P -4 2 3"), (216, "F-43m", "F -4 2 3"), (217, "I-43m", "I -4 2 3"),
    (218, "P-43n", "P -4n 2 3"), (219, "F-43c", "F -4c 2 3"), (220, "I-43d", "I -4bd 2c 3"),
    (221, "Pm-3m", "-P 4 2 3"), (222, "Pn-3n", "-P 4a 2bc 3"), (223, "Pm-3n", "-P 4n 2 3"),
    (224, "Pn-3m", "-P 4bc 2bc 3"), (225, "Fm-3m", "-F 4 2 3"), (226, "Fm-3c", "-F 4c 2 3"),
    (227, "Fd-3m", "-F 4vw 2vw 3"), (228, "Fd-3c", "-F 4cvw 2vw 3"), (229, "Im-3m", "-I 4 2 3"),
    (230, "Ia-3d", "-I 4bd 2c 3"))

  private val byNumber: Map[Int, (Int, String, String)] = table.map(e => e._1 -> e).toMap

  /** H-M lookup key: case-preserving but space/underscore-free, with the
    * full monoclinic "P 1 21/c 1" collapsed to its short form and legacy
    * glide letters (Abm2/Aba2/Cmca/Cmma/Ccca) mapped onto the current
    * e-glide symbols.
    */
  private def hmKey(hm: String): String = {
    var k = hm.trim.replace("_", " ")
    // strip a :H / :2 setting suffix (our table IS those settings);
    // :1 / :R (the other settings) are rejected in opsForHM
    k = k.replaceAll(":[Hh2]$", "")
    val fields = k.split("\\s+").toSeq
    // full monoclinic symbol "P 1 21/c 1" → "P 21/c"
    val collapsed =
      if (fields.length == 4 && fields(1) == "1" && fields(3) == "1") Seq(fields(0), fields(2))
      else fields
    val key = collapsed.mkString("")
    Map("Abm2" -> "Aem2", "Aba2" -> "Aea2", "Cmca" -> "Cmce",
      "Cmma" -> "Cmme", "Ccca" -> "Ccce").getOrElse(key, key)
  }

  private val byHm: Map[String, (Int, String, String)] =
    table.map(e => hmKey(e._2) -> e).toMap

  /** Ops for an International Tables number (1–230), conventional setting. */
  def opsForNumber(n: Int): Seq[Op] = {
    val e = byNumber.getOrElse(n,
      throw new IllegalArgumentException(s"space group number $n out of range 1-230"))
    opsForHall(e._3)
  }

  /** Ops for a Hermann–Mauguin symbol ("P21/c", "P 1 21/c 1", "Fd-3m:2",
    * "R-3c:H"…). Fails loudly on the non-default :1 / :R settings and on
    * unknown symbols — never a silent P1 fallback.
    */
  def opsForHM(hm: String): Seq[Op] = {
    val t = hm.trim
    require(!t.matches("(?i).*:[1R]$"),
      s"H-M symbol '$hm' requests a non-default setting (origin choice 1 / " +
        "rhombohedral axes) — only the conventional settings (origin choice 2, " +
        "hexagonal axes) are tabulated")
    val e = byHm.getOrElse(hmKey(t),
      throw new IllegalArgumentException(s"unknown Hermann-Mauguin symbol '$hm'"))
    opsForHall(e._3)
  }

  /** Short H-M symbol for an IT number (diagnostics). */
  def hmForNumber(n: Int): String = byNumber(n)._2
}
