package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class SpaceGroupsSpec extends AnyFunSuite {

  /** Point-group order by IT number — derived from the crystal-class
    * ranges of the International Tables (public structure of the 230
    * groups), NOT from the Hall data under test: |G| must equal
    * pointGroupOrder × centering multiplicity, so a mis-transcribed
    * rotation symbol, screw subscript, or inconsistent origin shift
    * (which blows closure up past the expected order) fails here.
    */
  private def pointGroupOrder(n: Int): Int = n match {
    case 1 => 1
    case 2 => 2
    case x if x <= 5 => 2 // 2
    case x if x <= 9 => 2 // m
    case x if x <= 15 => 4 // 2/m
    case x if x <= 24 => 4 // 222
    case x if x <= 46 => 4 // mm2
    case x if x <= 74 => 8 // mmm
    case x if x <= 80 => 4 // 4
    case x if x <= 82 => 4 // -4
    case x if x <= 88 => 8 // 4/m
    case x if x <= 98 => 8 // 422
    case x if x <= 110 => 8 // 4mm
    case x if x <= 122 => 8 // -42m
    case x if x <= 142 => 16 // 4/mmm
    case x if x <= 146 => 3 // 3
    case x if x <= 148 => 6 // -3
    case x if x <= 155 => 6 // 32
    case x if x <= 161 => 6 // 3m
    case x if x <= 167 => 12 // -3m
    case x if x <= 173 => 6 // 6
    case 174 => 6 // -6
    case x if x <= 176 => 12 // 6/m
    case x if x <= 182 => 12 // 622
    case x if x <= 186 => 12 // 6mm
    case x if x <= 190 => 12 // -6m2
    case x if x <= 194 => 24 // 6/mmm
    case x if x <= 199 => 12 // 23
    case x if x <= 206 => 24 // m-3
    case x if x <= 214 => 24 // 432
    case x if x <= 220 => 24 // -43m
    case _ => 48 // m-3m
  }

  private def centeringMult(hm: String): Int = hm(0) match {
    case 'P' => 1
    case 'A' | 'B' | 'C' | 'I' => 2
    case 'R' => 3
    case 'F' => 4
    case c => fail(s"unexpected lattice letter $c")
  }

  private val centrosymmetric: Set[Int] =
    (Set(2) ++ (10 to 15) ++ (47 to 74) ++ (83 to 88) ++ (123 to 142) ++
      (147 to 148) ++ (162 to 167) ++ (175 to 176) ++ (191 to 194) ++
      (200 to 206) ++ (221 to 230)).toSet

  test("all 230 settings close onto point-group order x centering multiplicity") {
    val bad = SpaceGroups.table.flatMap { case (n, hm, hall) =>
      val ops = SpaceGroups.opsForHall(hall)
      val expected = pointGroupOrder(n) * centeringMult(hm)
      if (ops.size != expected) Some(s"#$n $hm ($hall): ${ops.size} ops, expected $expected")
      else None
    }
    assert(bad.isEmpty, s"${bad.size} wrong group orders:\n${bad.mkString("\n")}")
  }

  test("ops are unique and rotation parts are valid crystallographic matrices (det +-1)") {
    SpaceGroups.table.foreach { case (n, hm, hall) =>
      val ops = SpaceGroups.opsForHall(hall)
      assert(ops.distinct.size == ops.size, s"#$n $hm: duplicate ops")
      ops.foreach { op =>
        val r = op.r
        val det =
          r(0) * (r(4) * r(8) - r(5) * r(7)) -
            r(1) * (r(3) * r(8) - r(5) * r(6)) +
            r(2) * (r(3) * r(7) - r(4) * r(6))
        assert(det == 1 || det == -1, s"#$n $hm: op ${op.xyz} has det $det")
      }
    }
  }

  test("centrosymmetric groups carry inversion AT THE ORIGIN (the origin-choice-2 contract); others carry none") {
    val inv = Vector(-1, 0, 0, 0, -1, 0, 0, 0, -1)
    SpaceGroups.table.foreach { case (n, hm, hall) =>
      val ops = SpaceGroups.opsForHall(hall)
      val atOrigin = ops.exists(op => op.r == inv && op.t == Vector(0, 0, 0))
      val anywhere = ops.exists(_.r == inv)
      if (centrosymmetric(n)) {
        assert(anywhere, s"#$n $hm: centrosymmetric class but no inversion")
        assert(atOrigin, s"#$n $hm: inversion exists but NOT at the origin — wrong origin choice")
      } else assert(!anywhere, s"#$n $hm: inversion in a non-centrosymmetric class")
    }
  }

  /** Published ITA general-position panels for well-known groups — exact
    * set equality of "x,y,z"-style strings (translations wrapped to
    * [0,1)). These pin the glide directions and screw placements that
    * order/centro checks alone cannot distinguish.
    */
  private val knownPositions: Map[Int, Set[String]] = Map(
    // P21/c — the most common molecular-crystal group
    14 -> Set("x,y,z", "-x,y+1/2,-z+1/2", "-x,-y,-z", "x,-y+1/2,z+1/2"),
    // P212121
    19 -> Set("x,y,z", "-x+1/2,-y,z+1/2", "-x,y+1/2,-z+1/2", "x+1/2,-y+1/2,-z"),
    // C2/c (without the centering copies)
    15 -> Set("x,y,z", "-x,y,-z+1/2", "-x,-y,-z", "x,-y,z+1/2",
      "x+1/2,y+1/2,z", "-x+1/2,y+1/2,-z+1/2", "-x+1/2,-y+1/2,-z", "x+1/2,-y+1/2,z+1/2"),
    // Pna21
    33 -> Set("x,y,z", "-x,-y,z+1/2", "x+1/2,-y+1/2,z", "-x+1/2,y+1/2,z+1/2"),
    // Pnma
    62 -> Set("x,y,z", "-x+1/2,-y,z+1/2", "-x,y+1/2,-z", "x+1/2,-y+1/2,-z+1/2",
      "-x,-y,-z", "x+1/2,y,-z+1/2", "x,-y+1/2,z", "-x+1/2,y+1/2,z+1/2"),
    // P3121 (quartz)
    152 -> Set("x,y,z", "-y,x-y,z+1/3", "-x+y,-x,z+2/3",
      "y,x,-z", "x-y,-y,-z+2/3", "-x,-x+y,-z+1/3"),
    // P3112 — pins the (0 0 4) origin shift of the 2-fold vs the screw
    151 -> Set("x,y,z", "-y,x-y,z+1/3", "-x+y,-x,z+2/3",
      "-y,-x,-z+2/3", "-x+y,y,-z+1/3", "x,x-y,-z"),
    // R-3c hexagonal (corundum), primitive third
    167 -> Set("x,y,z", "-y,x-y,z", "-x+y,-x,z",
      "y,x,-z+1/2", "x-y,-y,-z+1/2", "-x,-x+y,-z+1/2",
      "-x,-y,-z", "y,-x+y,-z", "x-y,x,-z",
      "-y,-x,z+1/2", "-x+y,y,z+1/2", "x,x-y,z+1/2",
      "x+2/3,y+1/3,z+1/3", "-y+2/3,x-y+1/3,z+1/3", "-x+y+2/3,-x+1/3,z+1/3",
      "y+2/3,x+1/3,-z+5/6", "x-y+2/3,-y+1/3,-z+5/6", "-x+2/3,-x+y+1/3,-z+5/6",
      "-x+2/3,-y+1/3,-z+1/3", "y+2/3,-x+y+1/3,-z+1/3", "x-y+2/3,x+1/3,-z+1/3",
      "-y+2/3,-x+1/3,z+5/6", "-x+y+2/3,y+1/3,z+5/6", "x+2/3,x-y+1/3,z+5/6",
      "x+1/3,y+2/3,z+2/3", "-y+1/3,x-y+2/3,z+2/3", "-x+y+1/3,-x+2/3,z+2/3",
      "y+1/3,x+2/3,-z+1/6", "x-y+1/3,-y+2/3,-z+1/6", "-x+1/3,-x+y+2/3,-z+1/6",
      "-x+1/3,-y+2/3,-z+2/3", "y+1/3,-x+y+2/3,-z+2/3", "x-y+1/3,x+2/3,-z+2/3",
      "-y+1/3,-x+2/3,z+1/6", "-x+y+1/3,y+2/3,z+1/6", "x+1/3,x-y+2/3,z+1/6"))

  test("known general-position panels match ITA exactly") {
    knownPositions.foreach { case (n, expect) =>
      val got = SpaceGroups.opsForNumber(n).map(_.xyz).toSet
      assert(got == expect,
        s"#$n ${SpaceGroups.hmForNumber(n)}:\n  missing: ${(expect -- got).mkString("; ")}" +
          s"\n  extra:   ${(got -- expect).mkString("; ")}")
    }
  }

  test("Pm-3m is exactly the 48 signed permutation matrices with zero translation") {
    val ops = SpaceGroups.opsForNumber(221)
    assert(ops.size == 48)
    assert(ops.forall(_.t == Vector(0, 0, 0)))
    val mats = ops.map(_.r).toSet
    assert(mats.size == 48)
    // every op permutes axes with signs: exactly one nonzero (+-1) per row/col
    assert(mats.forall { r =>
      (0 until 3).forall(i => (0 until 3).count(j => r(i * 3 + j) != 0) == 1) &&
        (0 until 3).forall(j => (0 until 3).count(i => r(i * 3 + j) != 0) == 1)
    })
  }

  test("H-M lookup normalizes spacing, full monoclinic symbols, setting suffixes, and legacy glides") {
    val c = SpaceGroups.opsForHM("P21/c")
    assert(SpaceGroups.opsForHM("P 21/c") == c)
    assert(SpaceGroups.opsForHM("P 1 21/c 1") == c)
    assert(SpaceGroups.opsForHM("P_21/c") == c)
    assert(SpaceGroups.opsForHM("R-3c:H") == SpaceGroups.opsForNumber(167))
    assert(SpaceGroups.opsForHM("Fd-3m:2") == SpaceGroups.opsForNumber(227))
    assert(SpaceGroups.opsForHM("Cmca") == SpaceGroups.opsForNumber(64))
    assert(SpaceGroups.opsForHM("Abm2") == SpaceGroups.opsForNumber(39))
    intercept[IllegalArgumentException](SpaceGroups.opsForHM("Fd-3m:1"))
    intercept[IllegalArgumentException](SpaceGroups.opsForHM("R-3c:R"))
    intercept[IllegalArgumentException](SpaceGroups.opsForHM("Xyzzy"))
  }

  test("ops round-trip through the CifParser symmetry-op string parser") {
    // the generated xyz strings must be consumable by the same affine-op
    // parser the explicit _symmetry_equiv_pos_as_xyz path uses
    Seq(14, 62, 152, 194, 227).foreach { n =>
      SpaceGroups.opsForNumber(n).foreach { op =>
        val (rot, tr) = CifParser.parseSymOp(op.xyz)
        val (er, et) = op.asMatrices
        assert(rot.flatten.toSeq == er.flatten.toSeq, s"#$n ${op.xyz}: rotation mismatch")
        assert(tr.toSeq.zip(et.toSeq).forall { case (a, b) => math.abs(a - b) < 1e-12 },
          s"#$n ${op.xyz}: translation mismatch")
      }
    }
  }
}
