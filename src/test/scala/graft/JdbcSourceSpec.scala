package graft

import org.apache.spark.sql.functions._
import graft.sources.JdbcSnapshot
import java.sql.DriverManager

/** A1's real-source form against an embedded Derby (the only embeddable DB
  * in this container): full snapshot read, range-partitioned parallel
  * backfill, and predicate pushdown into the remote scan. In-memory Derby is
  * same-JVM only — valid under local[*]; a cluster points the same options at
  * a server URL. */
class JdbcSourceSpec extends SparkSpecBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE pet(
        name VARCHAR(20), owner VARCHAR(20), species VARCHAR(20),
        sex CHAR(1), birth DATE, death DATE)""")
      // the menagerie seed (reference pet.txt + ins_puff_rec.sql)
      val ins = conn.prepareStatement("INSERT INTO pet VALUES (?,?,?,?,?,?)")
      val rows = Seq(
        ("Fluffy", "Harold", "cat", "f", "1993-02-04", null),
        ("Claws", "Gwen", "cat", "m", "1994-03-17", null),
        ("Buffy", "Harold", "dog", "f", "1989-05-13", null),
        ("Fang", "Benny", "dog", "m", "1990-08-27", null),
        ("Bowser", "Diane", "dog", "m", "1979-08-31", "1995-07-29"),
        ("Chirpy", "Gwen", "bird", "f", "1998-09-11", null),
        ("Whistler", "Gwen", "bird", null, "1997-12-09", null),
        ("Slim", "Benny", "snake", "m", "1996-04-29", null),
        ("Puffball", "Diane", "hamster", "f", "1999-03-30", null))
      rows.foreach { case (n, o, sp, sx, b, d) =>
        ins.setString(1, n); ins.setString(2, o); ins.setString(3, sp)
        ins.setString(4, sx)
        ins.setDate(5, java.sql.Date.valueOf(b))
        ins.setDate(6, if (d == null) null else java.sql.Date.valueOf(d))
        ins.executeUpdate()
      }
      st.execute("CREATE TABLE evt(id INT NOT NULL, user_id INT, amount DOUBLE)")
      val ins2 = conn.prepareStatement("INSERT INTO evt VALUES (?,?,?)")
      (0 until 200).foreach { i =>
        ins2.setInt(1, i); ins2.setInt(2, i % 17); ins2.setDouble(3, i * 1.5)
        ins2.executeUpdate()
      }
    } finally conn.close()
  }

  test("A1: JDBC snapshot scan reads the menagerie source table") {
    seeded
    val pets = Tables.loadJdbc(spark, url, "pet", opts)
    assert(pets.count() === 9)
    assert(pets.columns.map(_.toLowerCase).toSeq ===
      Seq("name", "owner", "species", "sex", "birth", "death"))
    // NULL semantics survive the wire: Whistler's sex, Bowser's death date
    val whistler = pets.filter(col("NAME") === "Whistler").head()
    assert(whistler.isNullAt(3))
    assert(pets.filter(col("DEATH").isNotNull).count() === 1)
    // same owners the tutorial corpus expects
    assert(pets.select("OWNER").distinct().count() === 4)
  }

  test("partitioned backfill: range slices read in parallel tasks") {
    seeded
    val df = JdbcSnapshot.readPartitioned(spark, url, "evt",
      partitionColumn = "id", lowerBound = 0L, upperBound = 200L,
      numPartitions = 4, options = opts)
    assert(df.rdd.getNumPartitions === 4)
    // no slice empty, nothing lost or duplicated across slices
    val perPart = df.rdd.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(perPart.forall(_ > 0), perPart.mkString(","))
    assert(df.count() === 200)
    assert(df.agg(sum(col("ID"))).head().getLong(0) === (0L until 200L).sum)
  }

  test("filters and column pruning push into the JDBC scan") {
    seeded
    val q = Tables.loadJdbc(spark, url, "pet", opts)
      .filter(col("OWNER") === "Gwen")
      .select("NAME", "OWNER")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters"), scan)
    assert(scan.contains("OWNER"), scan)
    assert(q.count() === 3) // Claws, Chirpy, Whistler
    // pruned read schema: only the two selected columns reach the scan
    assert(scan.contains("ReadSchema") || !scan.contains("BIRTH"), scan)
  }
}
