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

  test("distributed unzip explodes archive entries to decoded rows") {
    val dir = Files.createTempDirectory(Paths.get("target"), "zipland")
    val iso = Charset.forName("ISO-8859-1")
    val zipPath = dir.resolve("cnaes.zip")
    val zos = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("Cnaes.csv"))
    zos.write("01;Cultivo de café\n02;Produção".getBytes(iso))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("meta/")) // dir: skipped
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("meta/readme.txt"))
    zos.write("índice".getBytes(iso))
    zos.closeEntry()
    zos.close()
    val entries = Landing.unzipEntries(
      Landing.readBinary(spark, s"$dir/*.zip"))
    val decoded = Landing.decodeText(entries)
      .select("entry", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(decoded.keySet == Set("Cnaes.csv", "meta/readme.txt"))
    assert(decoded("Cnaes.csv") == "01;Cultivo de café\n02;Produção")
    assert(decoded("meta/readme.txt") == "índice")
    // CSV lines parse out of the decoded entry
    val lines = Landing.toLines(
      Landing.decodeText(entries.filter(entries("entry") === "Cnaes.csv")))
      .collect()
    assert(lines.length == 2)
  }
}
