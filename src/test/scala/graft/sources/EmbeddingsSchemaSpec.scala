package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{Dedup, Similarity}

/** Pins the embeddings-schema contract, the same failure class
  * [[EventsSchemaSpec]] guards for events.ts: the generator currently
  * ships `embedding` as list<float>, but a regeneration could widen it to
  * list<double>. Every float widens to double exactly, so the engine's
  * vector operators must produce IDENTICAL results for both physical
  * dtypes — a silent regen must be a green no-op, not a 20-query outage.
  */
class EmbeddingsSchemaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def vec(i: Int): Array[Float] =
    Array.tabulate(dim)(j => ((i * 31 + j * 7) % 13 - 6).toFloat / 7f)

  private def writeFixture(toDouble: Boolean): String = {
    val dir = Files.createTempDirectory("graft_emb_schema").toFile
    dir.deleteOnExit()
    val base = (0 until 64).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val df = if (toDouble) base.withColumn("embedding",
      col("embedding").cast("array<double>")) else base
    df.coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/embeddings.parquet")
    dir.getAbsolutePath
  }

  private lazy val floatDir = writeFixture(toDouble = false)
  private lazy val doubleDir = writeFixture(toDouble = true)

  test("fixtures land as the two physical element dtypes") {
    def elem(d: String) = spark.read.parquet(s"$d/embeddings.parquet")
      .schema("embedding").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    elem(floatDir) shouldBe org.apache.spark.sql.types.FloatType
    elem(doubleDir) shouldBe org.apache.spark.sql.types.DoubleType
  }

  test("brute-force top-k is identical across element dtypes") {
    val out = Seq(floatDir, doubleDir).map { d =>
      val emb = Tables.embeddings(spark, d)
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          queries, "q_id", "q_vec", k = 5)
        .collect().map(_.toString).sorted.toSeq
    }
    out(0) shouldBe out(1)
  }

  test("embeddingDupPairs is identical across element dtypes") {
    val out = Seq(floatDir, doubleDir).map { d =>
      Dedup.embeddingDupPairs(Tables.embeddings(spark, d),
          "vec_id", "embedding", dim = dim, nBits = 4, minCosine = 0.8)
        .collect().map(_.toString).sorted.toSeq
    }
    out(0) shouldBe out(1)
  }

  test("IVF training + search is identical across element dtypes") {
    val out = Seq(floatDir, doubleDir).map { d =>
      val emb = Tables.embeddings(spark, d)
      val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
        k = 4, iters = 3)
      val queries = emb.filter(col("vec_id") < 2)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      (cents.map(_.toSeq).toSeq,
        Similarity.ivfTopKTrained(emb, "vec_id", "embedding",
          queries, "q_id", "q_vec", cents, k = 3, nProbe = 2)
          .collect().map(_.toString).sorted.toSeq)
    }
    out(0) shouldBe out(1)
  }
}
