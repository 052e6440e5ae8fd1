package graft

import java.nio.charset.Charset
import java.nio.file.{Files, Paths}

import graft.sources.Landing

class LandingSpec extends GraftSpec {

  test("binary landing decodes iso-8859-1 content distributed") {
    val dir = Files.createTempDirectory(Paths.get("target"), "landing")
    val legacy = "4711;Produção de çafé" // accented, iso-8859-1 bytes
    Files.write(dir.resolve("cnae.csv"),
      legacy.getBytes(Charset.forName("ISO-8859-1")))
    val decoded = Landing.decodeText(
      Landing.readBinary(spark, s"$dir/*.csv"))
    val got = decoded.select("text").collect().head.getString(0)
    assert(got == legacy)
    val lines = Landing.toLines(decoded).collect()
    assert(lines.length == 1 && lines.head.getString(1) == legacy)
  }
}
