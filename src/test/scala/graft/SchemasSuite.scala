package graft

import org.scalatest.funsuite.AnyFunSuite

/** Schema module (R25 analog): canonical DDL registration + corpus
  * schema fidelity against the actual parquet files.
  */
class SchemasSuite extends AnyFunSuite {
  import SparkFixture._

  test("canonical tables register idempotently (CREATE IF NOT EXISTS)") {
    Schemas.createTables(spark)
    Schemas.createTables(spark) // second call must be a no-op
    Schemas.canonicalTables.keys.foreach { name =>
      assert(spark.catalog.tableExists(name), s"missing $name")
      assert(spark.table(name).count() == 0)
    }
    // rad_table carries the 17 reference columns
    assert(spark.table("rad_table").columns.length == 17)
    // each category table = base ++ its block
    Schemas.partCategoryFields.foreach { case (name, fields) =>
      assert(spark.table(name).columns.length ==
        Schemas.partBase.size + fields.size, name)
    }
    Schemas.canonicalTables.keys.foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS $n"))
  }

  test("corpus schemas match the driver-generated parquet exactly") {
    Schemas.corpus.foreach { case (name, expected) =>
      // events is only readable through its loader (nanos conversion)
      val actual =
        if (name == "events") Tables.events(spark, sf).schema
        else Tables.load(spark, sf, name).schema
      val a = actual.fields.map(f => (f.name, f.dataType)).toSeq
      val e = expected.fields.map(f => (f.name, f.dataType)).toSeq
      assert(a == e, s"$name: parquet=$a declared=$e")
    }
  }
}
