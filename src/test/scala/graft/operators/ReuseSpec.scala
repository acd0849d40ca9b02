package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the [[Reuse.pinned]] contract: one evaluation of the source
  * subtree, value-identical to the plain frame, and — the property the
  * r19 localCheckpoints traded away — a RECOMPUTE path that survives
  * block loss (lineage kept).
  */
class ReuseSpec extends SparkSpec {
  import spark.implicits._

  private def src = Seq((1L, "a b a"), (2L, "b c"), (3L, "c c c"))
    .toDF("id", "text")
    .select(col("id"), split(col("text"), " ").as("ws"))
    .select(col("id"), org.apache.spark.sql.functions.size(col("ws")).as("len"),
      filter(col("ws"), t => t === "c").as("hits"))

  test("pinned frame is value-identical to the unpinned plan") {
    val p = Reuse.pinned(src)
    p.orderBy("id").collect().toSeq shouldBe src.orderBy("id").collect().toSeq
  }

  test("pinned source evaluates once across two consumers") {
    val acc = spark.sparkContext.longAccumulator("evals")
    val counted = udf { (id: Long) => acc.add(1); id }
    val p = Reuse.pinned(src.withColumn("id", counted(col("id"))))
    p.agg(count(lit(1))).collect()
    p.select(explode(col("hits"))).agg(count(lit(1))).collect()
    acc.value shouldBe 3L // 3 rows, hashed once despite two consumers
  }

  test("pinned blocks recompute after loss — lineage is preserved") {
    val p = Reuse.pinned(src)
    val before = p.orderBy("id").collect().toSeq
    p.agg(count(lit(1))).collect() // materialize the blocks
    // simulate executor/block loss: drop every stored block, then consume
    // again — a localCheckpoint would die here (lineage truncated), the
    // pinned RDD recomputes from its retained dependency chain
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    p.orderBy("id").collect().toSeq shouldBe before
  }

  test("pinned rows are stable copies, not the codegen stage's reused buffer") {
    // 20 distinct rows must survive the pin (the no-copy serialized
    // spelling collapsed them to objectStreamReset-sized samples)
    val wide = spark.range(20).toDF("id")
      .select(col("id"), concat(lit("t"), col("id")).as("s"))
    Reuse.pinned(wide).distinct().count() shouldBe 20L
  }
}
