package graft.operators

import graft.SparkSpec

class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("staleOutputs: present-before minus regenerated") {
    val existing = Seq("a.png", "b.png", "c.png").toDF("name")
    val produced = Seq("b.png", "d.png").toDF("name")
    Reconcile.staleOutputs(existing, produced, "name")
      .as[String].collect().sorted shouldBe Array("a.png", "c.png")
  }

  test("duplicateFormatDeletes: same basename in both formats -> older deleted") {
    val files = Seq(
      ("x.png", ts("2024-01-02 00:00:00")), // newer -> kept
      ("x.svg", ts("2024-01-01 00:00:00")), // older -> deleted
      ("y.svg", ts("2024-01-05 00:00:00")), // newer -> kept
      ("y.png", ts("2024-01-04 00:00:00")), // older -> deleted
      ("z.png", ts("2024-01-01 00:00:00")), // only one format -> untouched
      ("w.csv", ts("2024-01-01 00:00:00"))  // non-plot file -> untouched
    ).toDF("name", "mtime")
    Reconcile.duplicateFormatDeletes(files, "name", "mtime")
      .select("name").as[String].collect().sorted shouldBe Array("x.svg", "y.png")
  }

  test("duplicateFormatDeletes: mtime tie keeps the png") {
    val files = Seq(
      ("t.png", ts("2024-01-01 00:00:00")),
      ("t.svg", ts("2024-01-01 00:00:00"))
    ).toDF("name", "mtime")
    Reconcile.duplicateFormatDeletes(files, "name", "mtime")
      .select("name").as[String].collect() shouldBe Array("t.svg")
  }
}
