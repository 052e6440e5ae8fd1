package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Physical-plan SHAPE regression harness: every registered query's
  * operator multiset is pinned to a committed fingerprint file.
  *
  * The lints in PlanLintSpec catch known-bad operators (cartesian
  * products, global windows); this spec catches the silent kind of
  * regression they can't — a join degrading to a different strategy, a
  * pushed filter un-pushing, an exchange appearing — after a Spark
  * upgrade, a testdata re-encode (round 8's TIMESTAMP_NTZ shift broke
  * loudly; the next environment shift may not), or an innocent-looking
  * refactor. Fingerprints are the sorted multiset of physical operator
  * CLASS names (no ids, paths, or stats), computed on the un-executed
  * plan at the fixture SF under the pinned local[4] test session —
  * deterministic by construction.
  *
  * On an INTENTIONAL plan change, regenerate and commit:
  *   GRAFT_REGEN_FINGERPRINTS=1 sbt "testOnly graft.PlanFingerprintSpec"
  * and review the diff of plan_fingerprints.tsv like code: each
  * changed line is a per-query plan-shape change the commit must
  * justify.
  */
class PlanFingerprintSpec extends GraftSpec {

  private val fpPath = Paths.get("src/test/resources/plan_fingerprints.tsv")

  private def physOps(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      physOps(a.executedPlan)
    case other => other +: other.children.flatMap(physOps)
  }

  private def fingerprint(key: String): String =
    physOps(SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan)
      .groupBy(_.getClass.getSimpleName)
      .map { case (c, xs) => s"$c=${xs.size}" }
      .toSeq.sorted.mkString(",")

  test("every registered query matches its committed plan fingerprint") {
    val current = SparkEntry.queries.keys.toSeq.sorted
      .map(k => k -> fingerprint(k))
    if (sys.env.contains("GRAFT_REGEN_FINGERPRINTS")) {
      Files.createDirectories(fpPath.getParent)
      Files.write(fpPath,
        current.map { case (k, fp) => s"$k\t$fp" }.asJava,
        StandardCharsets.UTF_8)
      info(s"regenerated ${fpPath} with ${current.size} fingerprints — " +
        "review and commit the diff")
    } else {
      assert(Files.exists(fpPath),
        s"$fpPath missing — run GRAFT_REGEN_FINGERPRINTS=1 " +
          "sbt 'testOnly graft.PlanFingerprintSpec' and commit it")
      val committed = Files.readAllLines(fpPath, StandardCharsets.UTF_8)
        .asScala.filter(_.nonEmpty)
        .map { l => val Array(k, fp) = l.split("\t", 2); k -> fp }.toMap
      val diffs = current.flatMap { case (k, fp) =>
        committed.get(k) match {
          case Some(`fp`) => None
          case Some(old) => Some(s"$k CHANGED:\n  committed: $old\n  current:   $fp")
          case None => Some(s"$k UNRECORDED (new key — regenerate)")
        }
      }
      val stale = (committed.keySet -- current.map(_._1).toSet).toSeq.sorted
      assert(diffs.isEmpty && stale.isEmpty,
        (diffs ++ stale.map(k => s"$k STALE (key no longer registered)"))
          .mkString(
            "plan fingerprints drifted — if intentional, regenerate with " +
              "GRAFT_REGEN_FINGERPRINTS=1 and commit the reviewed diff:\n",
            "\n", ""))
    }
  }
}
