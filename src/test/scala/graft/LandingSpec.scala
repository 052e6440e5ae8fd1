package graft

import java.nio.charset.Charset
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.operators.Etl
import graft.pipeline.Medallion
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

  test("acquire seam: index discovery over file:// lands the archive " +
    "and drives raw→trusted→refined") {
    val dir = Files.createTempDirectory(Paths.get("target"), "acquire")
      .toAbsolutePath
    val iso = Charset.forName("ISO-8859-1")
    // a machine-generated directory index: a decoy anchor plus the
    // target, single-quoted/attribute-noise variants included
    Files.write(dir.resolve("index.html"),
      ("<html><body><a href=\"Empresas.zip\">Empresas.zip</a>\n" +
        "<a class='x' href='Cnaes.zip'>Cnaes.zip</a></body></html>")
        .getBytes("UTF-8"))
    val zos = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(dir.resolve("Cnaes.zip")))
    zos.putNextEntry(new java.util.zip.ZipEntry("F.K03200$Z.CNAE.CSV"))
    zos.write("1;Cultivo de café\n2;Produção".getBytes(iso))
    zos.closeEntry()
    zos.close()
    val indexUrl = s"file://$dir/index.html"
    // discovery + fetch through the pluggable transport
    val landed = Landing.acquireArchive(Landing.urlFetch, indexUrl,
      "Cnaes.zip", s"$dir/landing")
    assert(landed.exists(p => p.getFileName.toString == "Cnaes.zip" &&
      Files.size(p) > 0))
    // absent target → None, nothing landed (the reference's
    // log-and-return-False branch)
    assert(Landing.acquireArchive(Landing.urlFetch, indexUrl,
      "Socios.zip", s"$dir/landing2").isEmpty)
    assert(!Files.exists(dir.resolve("landing2/Socios.zip")))
    // distributed continuation: unzip → decode → raw utf-8 CSV →
    // trusted → refined, the reference's full chain on the landed file
    val rawText = Landing.decodeText(Landing.unzipEntries(
        Landing.readBinary(spark, s"$dir/landing/*.zip")))
      .filter(col("entry").endsWith(".CSV"))
      .select("text").collect().head.getString(0)
    Files.createDirectories(dir.resolve("raw"))
    Files.write(dir.resolve("raw/Cnaes.csv"), rawText.getBytes("UTF-8"))
    Medallion.rawToTrusted(spark, s"$dir/raw", s"$dir/trusted",
      Etl.rawSchema, "codigo")
    Medallion.trustedToRefined(spark, s"$dir/trusted", s"$dir/refined",
      Medallion.trustedSchemaOf(Etl.rawSchema))
    val refined = spark.read.parquet(s"$dir/refined")
      .orderBy("codigo").collect()
    assert(refined.length == 2)
    assert(refined.head.getLong(0) == 1L &&
      refined.head.getString(1) == "Cultivo de café")
  }

  test("unzipFirstEntry lands ONLY the first entry, renamed — the " +
    "reference's namelist()[0] contract") {
    val dir = Files.createTempDirectory(Paths.get("target"), "firstentry")
    val iso = Charset.forName("ISO-8859-1")
    val zos = new java.util.zip.ZipOutputStream(
      Files.newOutputStream(dir.resolve("multi.zip")))
    zos.putNextEntry(new java.util.zip.ZipEntry("F.K03200$Z.CNAE.CSV"))
    zos.write("1;Cultivo de café".getBytes(iso))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("LEIAME.txt"))
    zos.write("segundo arquivo".getBytes(iso))
    zos.closeEntry()
    zos.close()
    val files = Landing.readBinary(spark, s"$dir/*.zip")
    val got = Landing.unzipFirstEntry(files, "Cnaes.csv").collect()
    assert(got.length == 1, s"must land exactly one row: ${got.length}")
    assert(got.head.getString(1) == "Cnaes.csv",
      s"entry must be renamed: ${got.head.getString(1)}")
    assert(new String(got.head.getAs[Array[Byte]](2), iso)
      == "1;Cultivo de café", "first entry's bytes must land")
    // the general face still fans out BOTH entries (superset behavior)
    assert(Landing.unzipEntries(files).count() == 2L)
  }

  test("unzipFirstEntry follows CENTRAL-DIRECTORY order, not stream " +
    "order — the namelist()[0] contract on reordered archives") {
    // build a two-entry zip, then swap its two central-directory
    // records in place: local-file-header (stream) order stays
    // [first.csv, second.txt] while namelist() order becomes
    // [second.txt, first.csv] — a valid archive (appended/reordered
    // zips look like this) where the two orders disagree
    val dir = Files.createTempDirectory(Paths.get("target"), "cdorder")
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("first.csv"))
    zos.write("stream-first".getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("second.txt"))
    zos.write("cd-first".getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    val zip = bos.toByteArray
    def u16(off: Int) = (zip(off) & 0xff) | ((zip(off + 1) & 0xff) << 8)
    def u32(off: Int) = u16(off) | (u16(off + 2) << 16)
    var eocd = zip.length - 22 // EOCD sig PK\5\6, no archive comment
    assert(zip(eocd) == 0x50 && zip(eocd + 1) == 0x4b &&
      zip(eocd + 2) == 0x05 && zip(eocd + 3) == 0x06, "EOCD not found")
    val cdOff = u32(eocd + 16)
    def recLen(off: Int) = // 46 fixed + name + extra + comment
      46 + u16(off + 28) + u16(off + 30) + u16(off + 32)
    val lenA = recLen(cdOff)
    val lenB = recLen(cdOff + lenA)
    val swapped = zip.clone()
    System.arraycopy(zip, cdOff + lenA, swapped, cdOff, lenB)
    System.arraycopy(zip, cdOff, swapped, cdOff + lenB, lenA)
    Files.write(dir.resolve("reordered.zip"), swapped)
    // sanity: a central-directory reader now lists second.txt first
    val zf = new java.util.zip.ZipFile(dir.resolve("reordered.zip").toFile)
    try assert(zf.entries().nextElement().getName == "second.txt")
    finally zf.close()
    val files = Landing.readBinary(spark, s"$dir/*.zip")
    val got = Landing.unzipFirstEntry(files, "Cnaes.csv").collect()
    assert(got.length == 1)
    assert(new String(got.head.getAs[Array[Byte]](2), "UTF-8")
      == "cd-first",
      "must land the central-directory-first entry (what namelist()[0] " +
        "reads), not the stream-first one")
  }

  test("acquire seam: the same transport walks a real HTTP index on " +
    "loopback") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val iso = Charset.forName("ISO-8859-1")
    val zipBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      zos.putNextEntry(new java.util.zip.ZipEntry("F.K03200$Z.CNAE.CSV"))
      zos.write("7;Comércio de café\n8;Extração".getBytes(iso))
      zos.closeEntry()
      zos.close()
      bos.toByteArray
    }
    val indexBytes =
      ("<html><body><a href=\"Empresas.zip\">Empresas.zip</a>\n" +
        "<a href='Cnaes.zip'>Cnaes.zip</a></body></html>").getBytes("UTF-8")
    // loopback-only server, OS-assigned port — no fixed-port flake
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def serve(path: String, body: Array[Byte], status: Int = 200): Unit =
      server.createContext(path, new HttpHandler {
        def handle(ex: HttpExchange): Unit = {
          ex.sendResponseHeaders(status, body.length.toLong)
          ex.getResponseBody.write(body)
          ex.close()
        }
      })
    serve("/data/index.html", indexBytes)
    serve("/data/Cnaes.zip", zipBytes)
    server.start()
    try {
      val port = server.getAddress.getPort
      val indexUrl = s"http://127.0.0.1:$port/data/index.html"
      val dir = Files.createTempDirectory(Paths.get("target"), "httpacq")
        .toAbsolutePath
      // identical call as the file:// face — only the URL scheme moves
      val landed = Landing.acquireArchive(Landing.urlFetch, indexUrl,
        "Cnaes.zip", s"$dir/landing")
      assert(landed.exists(p => p.getFileName.toString == "Cnaes.zip"))
      assert(landed.exists(p =>
        java.util.Arrays.equals(Files.readAllBytes(p), zipBytes)),
        "landed bytes differ from what the server sent")
      // target absent from the index → None, no spurious GET lands
      assert(Landing.acquireArchive(Landing.urlFetch, indexUrl,
        "Socios.zip", s"$dir/landing2").isEmpty)
      // distributed continuation off the HTTP-landed archive
      val decoded = Landing.decodeText(Landing.unzipEntries(
          Landing.readBinary(spark, s"$dir/landing/*.zip")))
        .filter(col("entry").endsWith(".CSV"))
        .select("text").collect().head.getString(0)
      assert(decoded == "7;Comércio de café\n8;Extração")
    } finally server.stop(0)
  }

  test("httpFetch transport: 5xx retry with exponential backoff, " +
    "mid-body resume via Range/206, range-ignored restart, permanent " +
    "4xx fails fast, retries exhaust") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val payload = (0 until 1000).map(i => s"line$i").mkString("\n")
      .getBytes("UTF-8")
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    // /flaky: 503 twice, then the full body
    val flakyHits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/flaky", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        if (flakyHits.incrementAndGet() <= 2) {
          ex.sendResponseHeaders(503, -1); ex.close()
        } else {
          ex.sendResponseHeaders(200, payload.length.toLong)
          ex.getResponseBody.write(payload); ex.close()
        }
      }
    })
    // /cut: first request declares the full length but sends half and
    // drops (with an ETag); later requests honor Range+If-Range with a
    // 206 of the remainder
    val cutRanges = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val cutIfRanges = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val cutHits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/cut", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val range = Option(ex.getRequestHeaders.getFirst("Range"))
        range.foreach(cutRanges.add)
        Option(ex.getRequestHeaders.getFirst("If-Range"))
          .foreach(cutIfRanges.add)
        ex.getResponseHeaders.add("ETag", "\"cut-v1\"")
        if (cutHits.incrementAndGet() == 1) {
          ex.sendResponseHeaders(200, payload.length.toLong)
          ex.getResponseBody.write(payload, 0, payload.length / 2)
          ex.close() // premature EOF on the client
        } else range match {
          case Some(r) =>
            val from = r.stripPrefix("bytes=").stripSuffix("-").toInt
            ex.getResponseHeaders.add("Content-Range",
              s"bytes $from-${payload.length - 1}/${payload.length}")
            ex.sendResponseHeaders(206, (payload.length - from).toLong)
            ex.getResponseBody.write(payload, from, payload.length - from)
            ex.close()
          case None =>
            ex.sendResponseHeaders(200, payload.length.toLong)
            ex.getResponseBody.write(payload); ex.close()
        }
      }
    })
    // /noval: cuts mid-body like /cut but exposes NO validator — the
    // client must NOT resume unversioned bytes (no Range header ever)
    val novalRanges = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val novalHits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/noval", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        Option(ex.getRequestHeaders.getFirst("Range")).foreach(novalRanges.add)
        if (novalHits.incrementAndGet() == 1) {
          ex.sendResponseHeaders(200, payload.length.toLong)
          ex.getResponseBody.write(payload, 0, payload.length / 2)
          ex.close()
        } else {
          ex.sendResponseHeaders(200, payload.length.toLong)
          ex.getResponseBody.write(payload); ex.close()
        }
      }
    })
    // /mutate: the archive CHANGES between the cut first response (v1)
    // and the resume — an If-Range-honoring server answers 200 with the
    // full NEW body; the client must land v2 intact, never a v1/v2
    // splice (same-length bodies, so the length check alone can't tell)
    val payload2 = (0 until 1000).map(i => s"LINE$i").mkString("\n")
      .getBytes("UTF-8")
    val mutateIfRanges =
      new java.util.concurrent.CopyOnWriteArrayList[String]()
    val mutateHits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/mutate", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        Option(ex.getRequestHeaders.getFirst("If-Range"))
          .foreach(mutateIfRanges.add)
        if (mutateHits.incrementAndGet() == 1) {
          ex.getResponseHeaders.add("ETag", "\"mut-v1\"")
          ex.sendResponseHeaders(200, payload.length.toLong)
          ex.getResponseBody.write(payload, 0, payload.length / 2)
          ex.close()
        } else {
          // validator mismatch → full new body, new validator
          ex.getResponseHeaders.add("ETag", "\"mut-v2\"")
          ex.sendResponseHeaders(200, payload2.length.toLong)
          ex.getResponseBody.write(payload2); ex.close()
        }
      }
    })
    // /weak: cuts mid-body like /cut but exposes only a WEAK ETag
    // (W/"...") — RFC 7233 §3.2 forbids weak validators in If-Range
    // (a weakly-comparing server could 206 across a changed body and
    // splice two versions), so the client must treat it as NO
    // validator: restart from zero, never send Range/If-Range
    val weakRanges = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val weakHits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/weak", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        Option(ex.getRequestHeaders.getFirst("Range")).foreach(weakRanges.add)
        Option(ex.getRequestHeaders.getFirst("If-Range")).foreach(weakRanges.add)
        ex.getResponseHeaders.add("ETag", "W/\"weak-v1\"")
        if (weakHits.incrementAndGet() == 1) {
          ex.sendResponseHeaders(200, payload.length.toLong)
          ex.getResponseBody.write(payload, 0, payload.length / 2)
          ex.close()
        } else {
          ex.sendResponseHeaders(200, payload.length.toLong)
          ex.getResponseBody.write(payload); ex.close()
        }
      }
    })
    // /lastmod: cut with ONLY a Last-Modified — its strength (RFC 7232
    // §2.2.2) cannot be established from one response, so same deal:
    // no resume, restart from zero
    val lmRanges = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val lmHits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/lastmod", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        Option(ex.getRequestHeaders.getFirst("Range")).foreach(lmRanges.add)
        ex.getResponseHeaders.add("Last-Modified",
          "Wed, 01 Jan 2025 00:00:00 GMT")
        if (lmHits.incrementAndGet() == 1) {
          ex.sendResponseHeaders(200, payload.length.toLong)
          ex.getResponseBody.write(payload, 0, payload.length / 2)
          ex.close()
        } else {
          ex.sendResponseHeaders(200, payload.length.toLong)
          ex.getResponseBody.write(payload); ex.close()
        }
      }
    })
    // /stubborn: cut first, then IGNORES the Range and replays 200 full
    val stubbornHits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/stubborn", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        if (stubbornHits.incrementAndGet() == 1) {
          ex.sendResponseHeaders(200, payload.length.toLong)
          ex.getResponseBody.write(payload, 0, payload.length / 2)
          ex.close()
        } else {
          ex.sendResponseHeaders(200, payload.length.toLong)
          ex.getResponseBody.write(payload); ex.close()
        }
      }
    })
    server.createContext("/gone", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(404, -1); ex.close()
      }
    })
    server.createContext("/dead", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(503, -1); ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      def fetcher(sleeps: collection.mutable.Buffer[Long]) =
        Landing.httpFetch(maxAttempts = 4, backoffMs = 100,
          sleep = sleeps.append(_))
      // 5xx retry + backoff schedule
      val s1 = collection.mutable.Buffer[Long]()
      assert(java.util.Arrays.equals(fetcher(s1)(s"$base/flaky"), payload))
      assert(s1.toSeq == Seq(100L, 200L), s"backoff schedule: $s1")
      // mid-body cut → Range resume guarded by If-Range → 206 appends
      val s2 = collection.mutable.Buffer[Long]()
      assert(java.util.Arrays.equals(fetcher(s2)(s"$base/cut"), payload))
      assert(cutRanges.size() == 1 &&
        cutRanges.get(0) == s"bytes=${payload.length / 2}-",
        s"resume ranges: $cutRanges")
      assert(cutIfRanges.size() == 1 && cutIfRanges.get(0) == "\"cut-v1\"",
        s"resume must carry the captured validator: $cutIfRanges")
      // no validator on the first response → NO resume attempt: the
      // retry restarts from byte zero and still lands the full body
      val s6 = collection.mutable.Buffer[Long]()
      assert(java.util.Arrays.equals(fetcher(s6)(s"$base/noval"), payload))
      assert(novalRanges.isEmpty,
        s"unversioned bytes must not be resumed: $novalRanges")
      // archive changed between attempts (same length!) → the 200 on
      // the If-Range resume replaces the buffer with the NEW body
      val s7 = collection.mutable.Buffer[Long]()
      assert(java.util.Arrays.equals(fetcher(s7)(s"$base/mutate"), payload2),
        "client must land the new version intact, not a two-version splice")
      assert(mutateIfRanges.size() == 1 &&
        mutateIfRanges.get(0) == "\"mut-v1\"", s"if-range: $mutateIfRanges")
      // weak ETag → NOT a resume validator: retry restarts from zero,
      // no Range/If-Range ever sent, full body still lands
      val s8 = collection.mutable.Buffer[Long]()
      assert(java.util.Arrays.equals(fetcher(s8)(s"$base/weak"), payload))
      assert(weakRanges.isEmpty,
        s"weak validator must not be used for resume: $weakRanges")
      // Last-Modified alone → strength unknown → same restart behavior
      val s9 = collection.mutable.Buffer[Long]()
      assert(java.util.Arrays.equals(fetcher(s9)(s"$base/lastmod"), payload))
      assert(lmRanges.isEmpty,
        s"Last-Modified of unknown strength must not resume: $lmRanges")
      // server ignores the Range → 200 restarts the buffer, no dup bytes
      val s3 = collection.mutable.Buffer[Long]()
      assert(java.util.Arrays.equals(
        fetcher(s3)(s"$base/stubborn"), payload))
      // permanent 4xx: immediate failure, zero retries, zero sleeps
      val s4 = collection.mutable.Buffer[Long]()
      val notFound = intercept[IllegalStateException] {
        fetcher(s4)(s"$base/gone")
      }
      assert(notFound.getMessage.contains("404") && s4.isEmpty)
      // exhausted retries surface the I/O failure after maxAttempts
      val s5 = collection.mutable.Buffer[Long]()
      intercept[java.io.IOException] { fetcher(s5)(s"$base/dead") }
      assert(s5.toSeq == Seq(100L, 200L, 400L), s"exhaust schedule: $s5")
    } finally server.stop(0)
  }

  test("profiles: the reference's ENV-sectioned config resolves with " +
    "defaults, overrides, typed access, and loud failures") {
    import graft.sources.Profiles
    val cfg =
      """# deployment config (dag.py:17-35 shape)
        |retries = 3
        |[default]
        |raw_dir = /data/raw
        |bom = true
        |[GCP-dev]
        |gcp_nm_project = "graft-dev"
        |gcp_bucket_name = dev-bucket
        |gcp_table_id = cnae
        |[GCP-prod]
        |gcp_nm_project = 'graft-prod'
        |gcp_bucket_name = prod-bucket
        |raw_dir = /mnt/prod/raw
        |""".stripMargin
    val dev = Profiles.load(cfg, "dev", sectionPrefix = "GCP-")
    // section + defaults + sectionless head compose
    assert(dev.required("gcp_nm_project") == "graft-dev") // dequoted
    assert(dev.required("gcp_bucket_name") == "dev-bucket")
    assert(dev.required("raw_dir") == "/data/raw")
    assert(dev.long("retries") == 3L && dev.bool("bom"))
    // the env's own section wins over defaults
    val prod = Profiles.load(cfg, "prod", sectionPrefix = "GCP-")
    assert(prod.required("raw_dir") == "/mnt/prod/raw")
    assert(prod.required("gcp_nm_project") == "graft-prod")
    // caller overrides win over everything (the hotfix path)
    val fixed = Profiles.load(cfg, "prod", sectionPrefix = "GCP-",
      overrides = Profiles.envOverrides(
        Map("GRAFT_RAW_DIR" -> "/tmp/replay", "UNRELATED" -> "x")))
    assert(fixed.required("raw_dir") == "/tmp/replay")
    assert(fixed.get("unrelated").isEmpty)
    // loud failures: unknown env, missing key, bad types, bad syntax
    intercept[NoSuchElementException] {
      Profiles.load(cfg, "staging", sectionPrefix = "GCP-")
    }
    intercept[NoSuchElementException] { dev.required("nope") }
    intercept[IllegalArgumentException] { dev.long("raw_dir") }
    intercept[IllegalArgumentException] { dev.bool("retries") }
    intercept[IllegalArgumentException] {
      Profiles.parse("not a config line at all!")
    }
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
