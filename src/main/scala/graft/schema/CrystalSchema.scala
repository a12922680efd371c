package graft.schema

import org.apache.spark.sql.types._

/** Spark mirror of the reference's canonical Arrow schema.
  *
  * Field-for-field from `crystpqdb/db.py:112-124` (site struct `db.py:5-19`,
  * lattice `db.py:23-34`, symmetry `db.py:36-44`, has_props `db.py:47-69`,
  * data `db.py:71-101`, structure `db.py:103-109`). The misspelled
  * `energy_phase_seperation` is preserved deliberately (`db.py:81`), as are
  * the `@module`/`@class` names (backtick-quote them in SQL).
  */
object CrystalSchema {

  private def f(name: String, t: DataType): StructField = StructField(name, t, nullable = true)
  private val d = DoubleType
  private val s = StringType
  private val listD = ArrayType(DoubleType)
  private val listListD = ArrayType(ArrayType(DoubleType))

  val siteSpecies: StructType = StructType(Seq(f("element", s), f("occu", LongType)))

  val siteProperties: StructType = StructType(Seq(
    f("magmom", d), f("charge", d), f("forces", listD)))

  val site: StructType = StructType(Seq(
    f("species", ArrayType(siteSpecies)),
    f("abc", listD),
    f("xyz", listD),
    f("properties", siteProperties),
    f("label", s)))

  val lattice: StructType = StructType(Seq(
    f("matrix", listListD),
    f("a", d), f("b", d), f("c", d),
    f("alpha", d), f("beta", d), f("gamma", d),
    f("pbc", ArrayType(BooleanType)),
    f("volume", d)))

  val symmetry: StructType = StructType(Seq(
    f("crystal_system", s), f("symbol", s), f("number", IntegerType),
    f("point_group", s), f("symprec", d), f("angle_tolerance", d),
    f("version", s)))

  val hasProps: StructType = StructType(Seq(
    "materials", "thermo", "xas", "grain_boundaries", "chemenv",
    "electronic_structure", "absorption", "bandstructure", "dos",
    "magnetism", "elasticity", "dielectric", "piezoelectric",
    "surface_properties", "oxi_states", "provenance", "charge_density",
    "eos", "phonon", "insertion_electrodes", "substrates").map(f(_, BooleanType)))

  val data: StructType = StructType(
    Seq("band_gap", "band_gap_ind", "band_gap_dir", "dos_ef",
      "energy_total", "energy_corrected", "energy_uncorrected",
      "energy_formation", "energy_above_hull", "energy_phase_seperation",
      "n", "piezoelectric_modulus", "e_electronic", "e_ionic", "e_total",
      "g_reuss", "g_voigt", "g_vrh", "k_reuss", "k_voigt", "k_vrh",
      "poisson_ratio", "surface_energy_anisotropy",
      "weighted_work_function", "weighted_surface_energy",
      "total_magnetization").map(f(_, d)) ++
      Seq(f("magnetic_ordering", s), f("stress", listListD), f("is_stable", BooleanType)))

  val structure: StructType = StructType(Seq(
    f("@module", s), f("@class", s),
    f("lattice", lattice),
    f("sites", ArrayType(site)),
    f("charge", d)))

  val schema: StructType = StructType(Seq(
    f("source_database", s),
    f("source_dataset", s),
    f("source_id", s),
    f("species", ArrayType(s)),
    f("cart_coords", listListD),
    f("frac_coords", listListD),
    f("lattice", lattice),
    f("structure", structure),
    f("data", data),
    f("symmetry", symmetry),
    f("has_props", hasProps)))
}
