package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Dashboard index builder (SURVEY §3.2, rca_data_tools/qaqc/index.py:
  * 20-66 `create_cloud_index`/`create_local_index`): list the artifact
  * keys under the plots and HITL directories, filter by suffix, dump each
  * list as `index.json` inside its directory. Listing goes through the
  * Hadoop FileSystem API, so the same code walks local dirs in tests and
  * object stores in production (the reference's fsspec mapper role).
  * Names are emitted relative to the listed root (mapper-keys semantics)
  * and sorted for determinism — fsspec key order is backend-dependent.
  */
object IndexBuilder {

  val IndexFile = "index.json"

  /** Relative keys under `dir` (recursive) with one of `suffixes`. */
  def listIndex(spark: SparkSession, dir: String, suffixes: Seq[String]): Seq[String] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Nil
    val root = fs.getFileStatus(path).getPath.toUri.getPath.stripSuffix("/")
    val out = Seq.newBuilder[String]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next().getPath.toUri.getPath
      if (suffixes.exists(f.endsWith)) out += f.stripPrefix(root + "/")
    }
    out.result().sorted
  }

  private def writeJson(spark: SparkSession, dir: String, names: Seq[String]): Unit = {
    val path = new Path(dir, IndexFile)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(path, true)
    try os.write(
      names.map(n => "\"" + n.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString("[", ", ", "]").getBytes("UTF-8"))
    finally os.close()
  }

  /** The reference's two-index contract: plot artifacts (.png/.svg) and
    * HITL tables (.csv), each indexed into its own `index.json`.
    */
  def createIndex(spark: SparkSession, plotsDir: String, hitlDir: String): (Seq[String], Seq[String]) = {
    val plots = listIndex(spark, plotsDir, Seq(".png", ".svg"))
    val hitl = listIndex(spark, hitlDir, Seq(".csv"))
    writeJson(spark, plotsDir, plots)
    writeJson(spark, hitlDir, hitl)
    (plots, hitl)
  }
}
