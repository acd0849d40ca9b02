package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the synthetic benchmark tables (see /root/repo/TESTDATA.md).
  *
  * Mirrors the reference's scan layer (SURVEY §2.1): one columnar store per
  * table, schema discovered at runtime, filters/projections left to Catalyst
  * so predicate pushdown + column pruning reach the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Normalize an event-time column to µs-precision TimestampType,
    * whatever physical shape the parquet stored it in. The testdata
    * generator has shipped `ts` as INT64 TIMESTAMP(NANOS) (Spark reads it
    * as a raw long under nanosAsLong) in rounds 1-6 and as plain
    * timestamp[µs] (Spark reads TIMESTAMP_NTZ) since round 7's regen, so
    * the loader branches on the observed dtype instead of hard-coding one:
    *  - LongType        → epoch nanos, truncate to µs (DuckDB's CAST rule)
    *  - TimestampType   → already the target type, pass through
    *  - TimestampNTZType/other → cast; session tz is UTC everywhere, so the
    *    wall-clock value equals the epoch-based instant either way.
    * Works on batch and streaming DataFrames alike (pure column exprs).
    */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(colName, expr(s"timestamp_micros($colName div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn(colName, col(colName).cast("timestamp"))
    }

  /** Events scan with `ts` normalized to TimestampType (see [[normalizeTs]]). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "events"))
  }

  // memoized per (layout, table): the footers never change under a live
  // process (testdata is read-only; grown layouts are write-once)
  private val countCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), Long]

  /** Exact row count of a gate table from parquet FOOTER metadata — no
    * Spark job, no scan. The contract-parameterized queries (q38/q94)
    * derive their knobs from table sizes; an eager `df.count()` inside
    * the query definition re-scanned the table on every invocation
    * (round-12 VERDICT item 6 / ADVICE). Handles both layout shapes:
    * a single `<table>.parquet` file and a Spark output DIRECTORY of
    * part files (grown layouts). Row counts live in each footer's block
    * metadata, so this is O(#files) driver-side metadata reads.
    */
  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    countCache.getOrElseUpdate(
      (new java.io.File(dir).getAbsolutePath, name), {
        import org.apache.hadoop.fs.Path
        val conf = spark.sessionState.newHadoopConf()
        val root = new Path(s"$dir/$name.parquet")
        val fs = root.getFileSystem(conf)
        val files: Seq[Path] =
          if (fs.getFileStatus(root).isDirectory)
            fs.listStatus(root).toSeq.map(_.getPath)
              .filter(p => p.getName.endsWith(".parquet") &&
                !p.getName.startsWith("_") && !p.getName.startsWith("."))
          else Seq(root)
        files.map { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum
      })

  /** The planted cross-corpus benchmark every decontamination surface
    * shares — q92's miner, its invariants companion, and the q146
    * streaming gate: a perturbed copy (" eval item tag" appended) of
    * every `doc_id % 83 == 0` document. ONE definition so the miner, the
    * gate, and their invariant checks can never drift apart (their
    * DuckDB oracles re-spell the same rule in SQL). Columns:
    * `benchmark_id` (long), `text`.
    */
  def plantedBenchmark(s: SparkSession, d: String): DataFrame =
    documents(s, d).filter(col("doc_id") % 83 === 0)
      .select(col("doc_id").cast("long").as("benchmark_id"),
        concat(col("text"), lit(" eval item tag")).as("text"))
}
