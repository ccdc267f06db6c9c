package graft

import org.apache.spark.sql.functions._

/** SURVEY §5.2 — menagerie golden tests: load the reference's seed data
  * exactly as menagerie-db/README.txt prescribes (TSV + \N nulls + ragged
  * rows + the Puffball insert) and assert literal outputs of the public
  * MySQL-tutorial queries the dataset exists for. */
class MenagerieSpec extends SparkSpecBase {

  private lazy val pets = Cdc.queries("a2_tsv_load")(spark, sfDir).cache()
  private lazy val events = Cdc.queries("a2b_tsv_ragged")(spark, sfDir).cache()

  test("9 pets after bulk load + puffball insert") {
    assert(pets.count() === 9)
  }

  test("Whistler's sex is NULL (\\N sentinel)") {
    val r = pets.filter(col("name") === "Whistler").select("sex").collect()
    assert(r.length === 1 && r(0).isNullAt(0))
  }

  test("4 distinct owners (tutorial SELECT DISTINCT owner)") {
    val owners = pets.select("owner").distinct()
      .collect().map(_.getString(0)).sorted
    assert(owners.toSeq === Seq("Benny", "Diane", "Gwen", "Harold"))
  }

  test("alive pets: death IS NULL excludes only Bowser") {
    val dead = pets.filter(col("death").isNotNull).select("name").collect().map(_.getString(0))
    assert(dead.toSeq === Seq("Bowser"))
  }

  test("ragged kennel rows load with NULL remark") {
    val kennel = events.filter(col("type") === "kennel")
    assert(kennel.count() === 2)
    assert(kennel.filter(col("remark").isNull).count() === 2)
  }

  test("tutorial join: age at litter events") {
    // pet ⋈ event on name for type='litter' (the tutorial's age-at-litter query)
    val litters = events.filter(col("type") === "litter")
      .join(pets, "name")
      .select(col("name"), floor(datediff(col("date"), col("birth")) / 365.25).as("age"))
      .orderBy("name", "age")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(litters.toSeq === Seq(("Buffy", 4L), ("Buffy", 5L), ("Fluffy", 2L)))
  }

  test("counting per species/sex (tutorial GROUP BY)") {
    val bySpecies = pets.groupBy("species").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bySpecies === Map("cat" -> 2L, "dog" -> 3L, "bird" -> 2L,
      "snake" -> 1L, "hamster" -> 1L))
  }

  test("pattern match: names of length 5 (LIKE '_____')") {
    val five = pets.filter(col("name").like("_____"))
      .select("name").orderBy("name").collect().map(_.getString(0))
    assert(five.toSeq === Seq("Buffy", "Claws"))
  }
}
