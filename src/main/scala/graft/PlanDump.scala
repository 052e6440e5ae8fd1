package graft

import java.nio.file.{Files, Paths}

/** Physical-plan capture for the optimization-round evidence trail:
  * writes `.explain("formatted")` of each requested registered query to
  * <outDir>/<key>_<tag>.txt — the plans/r17/<key>_before.txt /
  * _after.txt artifacts the optimization brief requires. Construction
  * side effects (eager layer writes in the roundtrip faces) run as in
  * Bench; the plan captured is the final returned frame's.
  *
  * Usage: java -cp ... graft.PlanDump <outDir> <tag> key [key ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> key [key...]")
    val outDir = args(0)
    val tag = args(1)
    val keys = args.drop(2)
    val unknown = keys.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query keys: ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"[plandump] wrote $outDir/${name}_$tag.txt " +
        s"(${plan.count(_ == '\n')} lines)")
    }
    spark.stop()
  }
}
