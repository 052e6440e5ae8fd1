package graft

import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables}

/** The SQL surface: every table addressable by name via spark.sql, and
  * partitioned writes prune at read time. */
class SqlSurfaceSpec extends GraftSpec {

  test("registerAll exposes every table to spark.sql with DataFrame parity") {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaDf = Tables.load(spark, sf, "customer")
      .join(Tables.load(spark, sf, "orders"),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql == viaDf)
    assert(viaSql.nonEmpty)
  }

  test("partitioned parquet writes prune partitions at read time") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "part")
      .toString
    val df = graft.operators.Etl.queries("etl_clean")(spark, sf)
    Sinks.writeParquet(df, s"$dir/seg", partitionBy = Seq("segmento"))
    val back = spark.read.parquet(s"$dir/seg")
      .filter(col("segmento") === "PRIMARIO")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(segmento"),
      s"partition filter not pushed:\n${plan.take(800)}")
    assert(back.count() == df.filter(col("segmento") === "PRIMARIO").count())
  }

  test("etl_partitioned_write prunes the day-partitioned lake at read time") {
    val df = graft.operators.Etl.queries("etl_partitioned_write")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"day partition filter not pushed:\n${plan.take(800)}")
    assert(df.count() > 0)
  }

  test("registry parity: every concrete Expression class in " +
      "graft.functions is SQL-callable through the extension — zero " +
      "unregistered natives") {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    import java.lang.reflect.Modifier
    // enumerate the compiled expression package straight off the
    // classpath, so an expression added without a registration line
    // fails HERE, not in a deployment's spark.sql
    val pkgDir = new java.io.File(
      classOf[graft.functions.GraftExtensions].getProtectionDomain
        .getCodeSource.getLocation.toURI).toPath
      .resolve("graft/functions")
    val classes = java.nio.file.Files.list(pkgDir).iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (classes.hasNext) {
      val f = classes.next().getFileName.toString
      if (f.endsWith(".class") && !f.contains("$"))
        names += f.stripSuffix(".class")
    }
    val exprClasses = names.sorted.map(n =>
        Class.forName(s"graft.functions.$n"))
      .filter(c => classOf[Expression].isAssignableFrom(c) &&
        !Modifier.isAbstract(c.getModifiers) &&
        !Modifier.isInterface(c.getModifiers))
    assert(exprClasses.size >= 30,
      s"package scan looks broken: ${exprClasses.size} classes")
    // instantiate each with dummy args to read its registered name
    // (prettyName); constructor params are Expressions and bounded Ints
    def instantiate(c: Class[_]): Expression = {
      val ctor = c.getConstructors.minBy(_.getParameterCount)
      val args = ctor.getParameterTypes.map {
        case t if classOf[Expression].isAssignableFrom(t) => Literal(1L)
        case t if t == classOf[Int] => Int.box(4)
        case t => fail(s"${c.getName}: unexpected ctor param $t")
      }
      ctor.newInstance(args.toIndexedSeq: _*).asInstanceOf[Expression]
    }
    val reg = spark.sessionState.functionRegistry
    val extClass = classOf[graft.functions.GraftExtensions].getName
    val graftNames = reg.listFunction()
      .filter(f => reg.lookupFunction(f)
        .exists(i => i.getClassName == extClass))
      .map(_.funcName).toSet
    assert(graftNames.nonEmpty, "no graft-injected registry entries")
    val missing = exprClasses.flatMap { c =>
      val pn = instantiate(c).prettyName
      if (graftNames.contains(pn)) None else Some(s"${c.getSimpleName} ($pn)")
    }
    assert(missing.isEmpty,
      s"expressions not reachable from spark.sql: ${missing.mkString(", ")}")
    // and the registered builders construct the SAME classes the Scala
    // API uses — one smoke call per distinctive family through SQL
    Tables.registerAll(spark, sf)
    val smoke = spark.sql(
      """SELECT ascii_normalize(text) AS nm,
        |  size(minhash_gram_sig(split(text, ' '), 3, 128)) AS wide,
        |  size(word_shingles(split(text, ' '), 3)) AS ws,
        |  entropy_nats(text) AS ent
        |FROM documents LIMIT 3""".stripMargin).collect()
    assert(smoke.length == 3 && smoke.forall(_.getInt(1) == 128))
  }
}
