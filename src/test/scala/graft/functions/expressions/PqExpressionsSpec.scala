package graft.functions.expressions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** The native pq_encode / pq_adc codegen expressions: bit-equivalence with
  * the UDF spellings they replaced, null handling, tie-breaks, and the
  * plan-shape claim (no Scala UDF in the PQ scoring projection).
  */
class PqExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(7)
  private def vec(dim: Int): Array[Double] = Array.fill(dim)(rnd.nextDouble() * 2 - 1)

  // deterministic codebooks: m=2 subspaces, ksub=4, sub=3 (dim=6)
  private val books: Array[Array[Array[Double]]] =
    Array.tabulate(2, 4) { (s, c) => Array.tabulate(3)(i => s + c * 0.5 - i * 0.25) }
  private val flat = books.flatten.flatten

  test("pq_encode matches the nearestCentroid kernel on random vectors") {
    val rows = (0 until 64).map(i => (i.toLong, vec(6)))
    val df = rows.toDF("id", "v")
    val got = df.select(col("id"),
        call_function("pq_encode", col("v"), typedLit(flat), lit(2), lit(4)).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    rows.foreach { case (id, v) =>
      val expected = Array.tabulate(2) { s =>
        Similarity.nearestCentroid(v.slice(s * 3, (s + 1) * 3), books(s))
      }.toSeq
      got(id) shouldBe expected
    }
  }

  test("pq_encode first-min tie-break: duplicate centroids pick the lowest index") {
    val dup = Array(1.0, 1.0, 1.0, /* c1 == c0 */ 1.0, 1.0, 1.0,
      9.0, 9.0, 9.0, 9.0, 9.0, 9.0)
    val out = Seq((1L, Array(1.0, 1.0, 1.0))).toDF("id", "v")
      .select(call_function("pq_encode", col("v"), typedLit(dup), lit(1), lit(4)))
      .as[Seq[Int]].collect().head
    out shouldBe Seq(0)
  }

  test("pq_adc matches the manual table-lookup sum, empty and null included") {
    val table = Array.tabulate(8)(i => i * 1.5) // m=2, ksub=4
    val rows = Seq(
      (1L, Seq(0, 3), Some(-(table(0) + table(4 + 3)))),
      (2L, Seq(3, 0), Some(-(table(3) + table(4 + 0)))),
      (3L, Seq(2, 2), Some(-(table(2) + table(4 + 2)))))
    val df = rows.map { case (id, c, _) => (id, c) }.toDF("id", "codes")
    val got = df.select(col("id"),
        call_function("pq_adc", col("codes"), typedLit(table), lit(4)).as("s"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, _, Some(exp)) => got(id) shouldBe exp; case _ => }
    // null codes → null score; empty codes → -0.0 (the UDF's empty fold)
    val edge = Seq((1L, null: Seq[Int]), (2L, Seq.empty[Int])).toDF("id", "codes")
      .select(col("id"), call_function("pq_adc", col("codes"), typedLit(table), lit(4)).as("s"))
      .collect()
    edge.find(_.getLong(0) == 1L).get.isNullAt(1) shouldBe true
    java.lang.Double.doubleToRawLongBits(
      edge.find(_.getLong(0) == 2L).get.getDouble(1)) shouldBe
      java.lang.Double.doubleToRawLongBits(-0.0)
  }

  test("the SQL surface accepts constant-expression arguments") {
    // builders run at ANALYSIS time, before constant folding: array(...)
    // arrives as CreateArray and 1+1 as Add, not Literal — the builders
    // must eval foldable args, or every SQL spelling throws
    val enc = spark.sql(
      "SELECT pq_encode(array(1.0d, 1.0d), " +
        "array(1.0d, 1.0d, 9.0d, 9.0d), 1, 1 + 1) AS c")
      .selectExpr("c[0]").collect()(0).getInt(0)
    enc shouldBe 0
    val adc = spark.sql(
      "SELECT pq_adc(array(0, 1), array(1.5d, 2.5d, 3.5d, 4.5d), 2) AS s")
      .collect()(0).getDouble(0)
    adc shouldBe -(1.5 + 4.5)
    val dr = spark.sql("SELECT duck_round(2.5d, 2 - 2) AS r")
      .collect()(0).getDouble(0)
    dr shouldBe 3.0
    val top = spark.sql(
      "SELECT approx_top_items(t, 1, 4) AS a FROM VALUES ('x'), ('x'), ('y') AS v(t)")
      .selectExpr("a[0].token", "a[0].cnt").collect()(0)
    (top.getString(0), top.getLong(1)) shouldBe ("x", 2L)
  }

  test("pq_adc enforces the ksub contract instead of re-striding a bad table") {
    val table = Array.tabulate(8)(i => i * 1.5) // built for ksub=4, m=2
    val df = Seq((1L, Seq(0, 3))).toDF("id", "codes")
    // wrong ksub for this table length → descriptive error, not wrong scores
    val e1 = intercept[Exception] {
      df.select(call_function("pq_adc", col("codes"), typedLit(table), lit(2)))
        .collect()
    }
    (Option(e1.getMessage).getOrElse("") +
      Option(e1.getCause).map(_.getMessage).getOrElse("")) should
      include("table length")
    // out-of-contract code value → descriptive error
    val bad = Seq((1L, Seq(0, 7))).toDF("id", "codes")
    val e2 = intercept[Exception] {
      bad.select(call_function("pq_adc", col("codes"), typedLit(table), lit(4)))
        .collect()
    }
    (Option(e2.getMessage).getOrElse("") +
      Option(e2.getCause).map(_.getMessage).getOrElse("")) should
      include("outside [0, 4)")
  }

  test("pq_encode null vector → null codes") {
    val out = Seq((1L, null: Seq[Double])).toDF("id", "v")
      .select(call_function("pq_encode", col("v"), typedLit(flat), lit(2), lit(4)))
      .collect().head
    out.isNullAt(0) shouldBe true
  }

  test("pqTopK plans the native expressions — no Scala UDF in the scan projection") {
    // corpus via parquet so ConvertToLocalRelation can't constant-fold the
    // encode projection out of the plan
    val dir = java.nio.file.Files.createTempDirectory("pqplan").toString
    (0 until 32).map(i => (i.toLong, vec(6))).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    val queries = (0 until 2).map(i => (i.toLong, vec(6))).toDF("qid", "qv")
    val out = Similarity.pqTopK(corpus, "id", "v", queries, "qid", "qv", books, k = 3)
    val plan = out.queryExecution.executedPlan.toString
    plan should include("pq_encode")
    plan should include("pq_adc")
    plan should not include "UDF"
    // and the native path yields the full result set
    out.collect().length shouldBe 2 * 3
  }

  test("pqTopK scores are bit-identical to the UDF fallback spelling") {
    val corpus = (0 until 48).map(i => (i.toLong, vec(6)))
    val cdf = corpus.toDF("id", "v")
    val queries = (0 until 3).map(i => (100L + i, vec(6)))
    val qdf = queries.toDF("qid", "qv")
    val native = Similarity.pqTopK(cdf, "id", "v", qdf, "qid", "qv", books, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // expected: manual encode + table scoring through the same kernels
    val enc = corpus.map { case (id, v) =>
      id -> Array.tabulate(2)(s =>
        Similarity.nearestCentroid(v.slice(s * 3, (s + 1) * 3), books(s)))
    }
    val expected = queries.flatMap { case (qid, qv) =>
      val t = new Array[Double](8)
      for (s <- 0 until 2; c <- 0 until 4) {
        var d = 0.0
        for (i <- 0 until 3) { val x = qv(s * 3 + i) - books(s)(c)(i); d += x * x }
        t(s * 4 + c) = d
      }
      enc.map { case (id, codes) =>
        // topKReduce emits scores rounded through the oracle-exact 6-dp
        // rounding — mirror it here
        (qid, id, graft.functions.Rounding.droundDouble(
          -(t(codes(0)) + t(4 + codes(1))), 6))
      }.sortBy { case (_, id, sc) => (-sc, id) }.take(5)
    }.toSet
    native shouldBe expected
  }
}
