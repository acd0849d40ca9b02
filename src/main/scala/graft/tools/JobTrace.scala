package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Throwaway diagnostic (the r20 decomposition instrument): run named
  * queries once and print, per Spark JOB, its wall duration and the
  * stages it ran (name + task count + ms) — the per-job attribution
  * [[JobCount]]'s totals can't give. This is how "16 jobs" turns into
  * "which subtree costs what" without the UI.
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class JobRec(start: Long, var end: Long = -1L,
                            var stages: List[String] = Nil)
    val jobsRec = new TrieMap[Int, JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobsRec.put(j.jobId, JobRec(j.time))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobsRec.get(j.jobId).foreach(_.end = j.time)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val ms = (for {a <- info.completionTime; b <- info.submissionTime}
          yield a - b).getOrElse(-1L)
        val line = f"${info.name.takeWhile(_ != '\n').take(90)}%s tasks=${info.numTasks} ms=$ms"
        jobsRec.values.toSeq.sortBy(-_.start).headOption.foreach { rec =>
          rec.stages = rec.stages :+ line
        }
      }
    })
    spark.range(10).count() // warm, then drop the warm job from output
    names.foreach { n =>
      jobsRec.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .selectExpr("count(1)", "bit_xor(hash(*))").collect()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // listener bus drain
      println(f"JTRACE $n wall=$dt%.2f jobs=${jobsRec.size}")
      jobsRec.toSeq.sortBy(_._1).foreach { case (id, rec) =>
        val ms = if (rec.end > 0) rec.end - rec.start else -1L
        println(f"  job=$id ms=$ms")
        rec.stages.foreach(s => println(s"    $s"))
      }
      System.gc(); Thread.sleep(400)
    }
    spark.stop()
  }
}
