package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-key job-level profiler (optimization round 17, guide §1): runs a
  * registered query with the Bench warmup+noop discipline and prints
  * every Spark job's wall time and description — the local[N] stand-in
  * for the Spark UI's job table, for deciding WHERE a multi-job
  * operator (iterative graph loops, eager-checkpoint pipelines,
  * collect-sync k-means) actually spends its time. Dev tool, not a
  * driver entrypoint; timings are single-run (use Bench for medians).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... java -cp ... graft.Profile key [key...]
  */
object Profile {
  private def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val unknown = args.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query keys: ${unknown.mkString(", ")}")
    val spark = GraftSession.local()
    val sc = spark.sparkContext
    val starts = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double)]()
    sc.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(si =>
          si.name.take(60) + " tasks=" +
            j.stageInfos.map(_.numTasks).sum).getOrElse("")
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description"))
            .getOrElse(site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          jobs.add((j.jobId, d, (System.nanoTime() - t0) / 1e9)) }
    })
    args.foreach { name =>
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      try materialize(SparkEntry.queries(name)(spark, sfDir))
      catch { case e: Throwable =>
        println(s"[profile] $name warmup failed: ${e.getMessage}") }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      jobs.clear()
      val t0 = System.nanoTime()
      materialize(SparkEntry.queries(name)(spark, sfDir))
      val tot = (System.nanoTime() - t0) / 1e9
      // drain after the run completes; listener events are async but the
      // noop write blocks until its last job ends
      Thread.sleep(200)
      val js = jobs.toArray(Array.empty[(Int, String, Double)]).sortBy(_._1)
      println(f"[profile] $name%-28s total $tot%8.3f s  (${js.length} jobs, " +
        f"job-sum ${js.map(_._3).sum}%.3f s)")
      js.foreach { case (id, d, s) =>
        println(f"[profile]   job $id%4d $s%8.3f s  ${d.take(100)}") }
    }
    spark.stop()
  }
}
