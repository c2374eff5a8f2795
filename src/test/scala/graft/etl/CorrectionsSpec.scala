package graft.etl

import graft.SparkSpec
import graft.etl.Corrections.Rule
import org.apache.spark.sql.functions._

/** Golden behavior for the correction engine
  * (record_corrector.py:186-255). */
class CorrectionsSpec extends SparkSpec {

  private val fieldCol = Map(
    "dwc:genus" -> "genus", "dwc:specificepithet" -> "specificepithet",
    "dwc:kingdom" -> "kingdom", "dwc:family" -> "family",
    "dwc:scientificname" -> "scientificname", "dwc:country" -> "country")

  private def df = {
    val s = spark
    import s.implicits._
    Seq(
      // (id, genus, epithet, kingdom, family, sciname, country)
      (1, "acer", "rubrum", "Plantae", null, "acer rubrum", null),
      (2, "acer", null, "Animalia", null, null, null),
      (3, "quercus", null, null, "wrongfam", null, null),
      (4, null, null, null, null, null, "franse"),
    ).toDF("id", "genus", "specificepithet", "kingdom", "family",
      "scientificname", "country")
  }

  test("keyHash matches objectHasher sha256 semantics (etags.py:41-79)") {
    // objectHasher('sha256', {'dwc:genus': 'acer'}) computed with CPython
    assert(Corrections.ruleHash(Map("dwc:genus" -> "Acer")) ===
      Corrections.ruleHash(Map("dwc:genus" -> "acer"))) // value lowercased
  }

  test("rule adds missing field with _added flag; matched on 2-field tuple") {
    val rules = Seq(Rule(
      Map("dwc:genus" -> "acer", "dwc:specificepithet" -> "rubrum"),
      Map("dwc:family" -> "sapindaceae")))
    val out = Corrections.apply(df, rules, fieldCol)
      .select("id", "family", "_flag_dwc_family_added").orderBy("id").collect()
    assert(out(0).getString(1) === "sapindaceae" && out(0).getBoolean(2))
    assert(out(1).isNullAt(1) && !out(1).getBoolean(2)) // epithet null → no match
  }

  test("rule replaces differing value with _replaced flag") {
    val rules = Seq(Rule(Map("dwc:genus" -> "quercus"),
      Map("dwc:family" -> "fagaceae")))
    val out = Corrections.apply(df, rules, fieldCol)
      .select("id", "family", "_flag_dwc_family_replaced").orderBy("id").collect()
    assert(out(2).getString(1) === "fagaceae" && out(2).getBoolean(2))
  }

  test("scientificname is never overwritten (:231-232)") {
    val rules = Seq(Rule(Map("dwc:genus" -> "acer"),
      Map("dwc:scientificname" -> "HACKED")))
    val out = Corrections.apply(df, rules, fieldCol)
      .select("scientificname").orderBy("id").collect()
    assert(out(0).getString(0) === "acer rubrum")
    assert(out(1).isNullAt(0))
  }

  test("protected kingdom: rule flags suspect and applies nothing (:221-228)") {
    val rules = Seq(Rule(Map("dwc:genus" -> "acer"),
      Map("dwc:kingdom" -> "fungi", "dwc:family" -> "shouldnotapply")))
    val out = Corrections.apply(df, rules, fieldCol)
      .select("id", "kingdom", "family", "_flag_dwc_kingdom_suspect")
      .orderBy("id").collect()
    // record 1: kingdom Plantae (protected) != fungi → suspect, untouched
    assert(out(0).getString(1) === "Plantae" && out(0).isNullAt(2)
      && out(0).getBoolean(3))
    // record 2: Animalia protected too → suspect
    assert(out(1).getString(1) === "Animalia" && out(1).getBoolean(3))
  }

  test("same key-tuple is looked up once per record (:210 loop shape)") {
    val rules = Seq(
      Rule(Map("dwc:country" -> "franse"), Map("dwc:country" -> "france")),
      Rule(Map("dwc:country" -> "france"),
        Map("idigbio:isoCountryCode" -> "fr")))
    val fc = fieldCol + ("idigbio:isoCountryCode" -> "countrycode")
    val out = Corrections.apply(
        df.withColumn("countrycode", lit(null).cast("string")), rules, fc)
      .select("id", "country", "countrycode").orderBy("id").collect()
    // the tuple (dwc:country) is probed once with the ORIGINAL hash, so
    // the typo fix applies but the second rule does not cascade within
    // the same tuple — matching the reference's single lookup per tuple
    assert(out(3).getString(1) === "france")
    assert(out(3).isNullAt(2))
  }

  test("duplicate match keys resolve last-write-wins, no row fan-out " +
      "(record_corrector.py:125-151 etag overwrite)") {
    val rules = Seq(
      Rule(Map("dwc:genus" -> "acer"), Map("dwc:family" -> "overwritten")),
      Rule(Map("dwc:genus" -> "acer"), Map("dwc:family" -> "sapindaceae")))
    val out = Corrections.apply(df, rules, fieldCol)
      .select("id", "family").orderBy("id").collect()
    assert(out.length === 4, "a duplicate rule hash must not duplicate rows")
    assert(out(0).getString(1) === "sapindaceae")
    assert(out(1).getString(1) === "sapindaceae")
  }

  test("case-insensitive match keeps the record's own casing (:246-248 pass)") {
    // the locality kl identity rules ("florida"→"florida") hit this
    // path: the rule names the matched field itself with the same
    // lowercased value — no flag, and the record's casing survives
    val rules = Seq(Rule(Map("dwc:kingdom" -> "plantae"),
      Map("dwc:kingdom" -> "plantae", "dwc:family" -> "somefam")))
    val out = Corrections.apply(df, rules, fieldCol)
      .select("id", "kingdom", "family").orderBy("id").collect()
    assert(out(0).getString(1) === "Plantae") // NOT lowercased
    assert(out(0).getString(2) === "somefam")
    val flags = Corrections.apply(df, rules, fieldCol)
      .where(col("id") === 1)
      .select("_flag_dwc_kingdom_added", "_flag_dwc_kingdom_replaced",
        "_flag_dwc_kingdom_suspect").collect()(0)
    assert(!flags.getBoolean(0) && !flags.getBoolean(1) && !flags.getBoolean(2))
  }

  test("later tuples see earlier tuples' corrections (cross-tuple sequencing)") {
    val rules = Seq(
      Rule(Map("dwc:country" -> "franse"), Map("dwc:kingdom" -> "plantae")),
      Rule(Map("dwc:kingdom" -> "plantae"), Map("dwc:family" -> "viaplantae")))
    val out = Corrections.apply(df, rules, fieldCol)
      .select("id", "kingdom", "family").orderBy("id").collect()
    // record 4: country tuple sets kingdom; kingdom tuple then fires on
    // the corrected value (dwc:country sorts before dwc:kingdom)
    assert(out(3).getString(1) === "plantae")
    assert(out(3).getString(2) === "viaplantae")
    // record 1: kingdom Plantae already — family set by tuple 2 directly
    assert(out(0).getString(2) === "viaplantae")
  }
}
