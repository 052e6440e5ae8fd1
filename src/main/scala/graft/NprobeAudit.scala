package graft

/** Measured nprobe × recall@10 × scan-fraction operating table for the
  * IVF-PQ serving path (DEPLOY.md §6; verdict r16 #7) — run per round
  * by scripts/round_bench.sh at sf0.1 and sf1 so a deployment picks
  * nprobe for a recall target from measurements, not re-derivation.
  * Prints the markdown table plus ONE JSON line, and writes the JSON
  * to NPROBE.json (the Bench artifact convention). */
object NprobeAudit {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val vecs = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val rows = graft.operators.Similarity.nprobeOperatingTable(vecs)
      .collect()
    // sf dir on its own line: a trailing cell in the header would make
    // the header/separator column counts disagree and break rendering
    println(s"nprobe operating table ($sfDir)")
    println("| nprobe | queries | recall@10 | scan fraction |")
    println("| --- | --- | --- | --- |")
    rows.foreach(r => println(
      s"| ${r.getInt(0)} | ${r.getLong(1)} | ${r.getDouble(2)} " +
        s"| ${r.getDouble(3)} |"))
    val json = rows.map(r =>
      s"""{"nprobe":${r.getInt(0)},"queries":${r.getLong(1)},""" +
        s""""recall":${r.getDouble(2)},"scan":${r.getDouble(3)}}""")
      .mkString("[", ",", "]")
    val line = s"""{"nprobe_table":$json,"sf":"$sfDir"}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("NPROBE.json"), line + "\n")
    spark.stop()
  }
}
