package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

/** JVM-global fetch counter: Spark local mode deserializes task
  * closures into fresh copies, so a CAPTURED counter would count
  * nothing — a singleton object's field is resolved per-JVM at
  * deserialization and sees every executor-side invocation. */
object FetchCounter {
  val n = new java.util.concurrent.atomic.AtomicInteger(0)
}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("xml scan reads row tags through the native datasource") {
    val dir = Files.createTempDirectory("graft-xml")
    val f = dir.resolve("data.xml")
    Files.writeString(f,
      """<records>
        |  <rec><name>Alpha</name><code>1</code></rec>
        |  <rec><name>Beta</name><code>2</code></rec>
        |</records>""".stripMargin)
    val df = Sources.xml(spark, f.toString, rowTag = "rec")
    val rows = df.select($"name".cast("string"), $"code".cast("string"))
      .as[(String, String)].collect().toSet
    assert(rows == Set(("Alpha", "1"), ("Beta", "2")))
  }

  test("html table columns extract via xpath") {
    val html =
      "<html><body><table>" +
        "<tr><td>John</td><td>DE</td></tr>" +
        "<tr><td>Jane</td><td>FR</td></tr>" +
        "</table></body></html>"
    val out = Seq(html).toDF("html")
      .select(Sources.htmlTableColumn($"html", 1).as("names"),
        Sources.htmlTableColumn($"html", 2).as("codes"))
      .as[(Seq[String], Seq[String])].collect()(0)
    assert(out._1 == Seq("John", "Jane") && out._2 == Seq("DE", "FR"))
  }

  test("xlsx rows parse from the zip container (shared + inline strings)") {
    val dir = Files.createTempDirectory("graft-xlsx")
    val f = dir.resolve("book.xlsx")
    val zip = new ZipOutputStream(Files.newOutputStream(f))
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    put("xl/sharedStrings.xml",
      """<sst><si><t>name</t></si><si><t>Alpha</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><t>serial</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>44876</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zip.close()
    val rows = Sources.xlsxRows(spark, f.toString)
      .as[(String, String)].collect().toSeq
    assert(rows == Seq(("name", "serial"), ("Alpha", "44876")))
    // excel serial flows into the date kit
    val iso = Seq("44876").toDF("v")
      .select(graft.functions.Dates.excelSerialDate($"v"))
      .as[String].collect()(0)
    assert(iso == "2022-11-11T00:00:00")
  }

  test("xlsx sparse rows place cells by their r reference, not position") {
    val dir = Files.createTempDirectory("graft-xlsx-sparse")
    val f = dir.resolve("book.xlsx")
    val zip = new ZipOutputStream(Files.newOutputStream(f))
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    // row 1 is full; row 2 has ONLY column C — a positional reader would
    // shift "solo" into column A
    put("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c><c r="B1" t="inlineStr"><is><t>b</t></is></c><c r="C1" t="inlineStr"><is><t>c</t></is></c></row>
        |<row r="2"><c r="C2" t="inlineStr"><is><t>solo</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zip.close()
    val rows = Sources.xlsxRows(spark, f.toString)
      .as[(String, String, String)].collect().toSeq
    assert(rows == Seq(("a", "b", "c"), (null, null, "solo")))
  }

  test("pdf text extraction reads Tj/TJ from plain and Flate streams") {
    val dir = Files.createTempDirectory("graft-pdf")
    val f = dir.resolve("doc.pdf")
    // content stream 1: plain; stream 2: FlateDecode-compressed
    val cs1 = "BT /F1 12 Tf 72 720 Td (Alpha  One) Tj 0 -14 Td (Beta  Two) Tj ET"
    val cs2raw = "BT 72 720 Td [(Gam) (ma)] TJ T* (Delta  Three) Tj ET"
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(cs2raw.getBytes("ISO-8859-1")); deflater.finish()
    val buf = new Array[Byte](1024)
    val n = deflater.deflate(buf)
    val cs2 = new String(buf.take(n), "ISO-8859-1")
    val pdf = "%PDF-1.4\n" +
      s"1 0 obj\n<< /Length ${cs1.length} >>\nstream\n$cs1\nendstream\nendobj\n" +
      s"2 0 obj\n<< /Length ${cs2.length} /Filter /FlateDecode >>\nstream\n$cs2\nendstream\nendobj\n" +
      "%%EOF\n"
    Files.write(f, pdf.getBytes("ISO-8859-1"))
    val lines = Sources.pdfTextLines(spark, f.toString)
    assert(lines == Seq("Alpha  One", "Beta  Two", "Gamma", "Delta  Three"))
    val rows = Sources.pdfTableRows(spark, f.toString)
      .as[(String, String)].collect().toSeq
    assert(rows == Seq(("Alpha", "One"), ("Beta", "Two"),
      ("Gamma", null), ("Delta", "Three")))
  }

  test("fetch cache: fresh hits are reused, misses hit the fetcher once") {
    val now = java.sql.Timestamp.valueOf("2026-01-10 00:00:00")
    val cache = Seq(
      ("fp1", "http://x/fresh", "cached-body", java.sql.Timestamp.valueOf("2026-01-05 00:00:00")),
      ("fp2", "http://x/stale", "old-body", java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))
    ).toDF("fingerprint", "url", "body", "fetched_at")
    var calls = 0
    val fetcher: Sources.Fetcher = url => { calls += 1; s"fetched:$url" }
    val (bodies, newRows) = Sources.fetchCached(spark,
      Seq("http://x/fresh", "http://x/stale", "http://x/new"),
      cache, now, maxAgeDays = 30, fetcher = fetcher)
    val got = bodies.as[(String, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("http://x/fresh") == (("cached-body", true)))
    assert(got("http://x/stale") == (("fetched:http://x/stale", false)))
    assert(got("http://x/new") == (("fetched:http://x/new", false)))
    assert(calls == 2)
    assert(newRows.count() == 2) // stale + new get appended to the cache
  }

  test("executor-side fetch: parity with the driver path, same cache contract") {
    val now = java.sql.Timestamp.valueOf("2026-01-10 00:00:00")
    val cache = Seq(
      ("fp1", "http://x/fresh", "cached-body", java.sql.Timestamp.valueOf("2026-01-05 00:00:00")),
      ("fp2", "http://x/stale", "old-body", java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))
    ).toDF("fingerprint", "url", "body", "fetched_at")
    val urls = Seq("http://x/fresh", "http://x/stale", "http://x/new")
    // the executor-side fetcher must be a serializable pure function of
    // the url (closure ships to tasks) — same seam, no driver loop
    val fetcher: Sources.Fetcher = url => s"fetched:$url"
    val (dBodies, dRows) = Sources.fetchCached(spark, urls, cache, now,
      maxAgeDays = 30, fetcher = fetcher)
    val (eBodies, eRows) = Sources.fetchCachedDistributed(
      urls.toDF("url"), cache, now, maxAgeDays = 30, fetcher = fetcher,
      minIntervalMs = 1L, partitions = 2)
    assert(eBodies.as[(String, String, Boolean)].collect().toSet ===
      dBodies.as[(String, String, Boolean)].collect().toSet)
    assert(eRows.as[(String, String, String, java.sql.Timestamp)].collect().toSet ===
      dRows.as[(String, String, String, java.sql.Timestamp)].collect().toSet)
    // a frontier far beyond the driver bound flows through untouched
    val big = (1 to 200).map(i => s"http://y/$i")
    val (bBodies, bRows) = Sources.fetchCachedDistributed(
      big.toDF("url"), cache, now, maxAgeDays = 30, fetcher = fetcher)
    assert(bBodies.count() === 200L)
    assert(bBodies.where(col("from_cache")).count() === 0L)
    assert(bRows.count() === 200L)
  }

  test("distributed fetch runs the fetcher EXACTLY once per miss") {
    // the round-10 advisory: both returned frames share the fetch
    // lineage, so without the eager materialization every action on
    // either frame re-invoked the fetcher (double fetch + double
    // politeness wait; non-idempotent sources could cache a body
    // different from the returned one)
    val now = java.sql.Timestamp.valueOf("2026-01-10 00:00:00")
    val cache = (1 to 5).map(i =>
        ("fp", s"http://z/$i", s"cached:$i",
          java.sql.Timestamp.valueOf("2026-01-09 00:00:00")))
      .toDF("fingerprint", "url", "body", "fetched_at")
    FetchCounter.n.set(0)
    val counting: Sources.Fetcher = url => {
      FetchCounter.n.incrementAndGet(); s"fetched:$url"
    }
    val (bodies, rows) = Sources.fetchCachedDistributed(
      (1 to 20).map(i => s"http://z/$i").toDF("url"), cache, now,
      maxAgeDays = 30, fetcher = counting, partitions = 3)
    // drive BOTH frames, twice each — the cached body count must stay
    // at the 15 misses
    assert(bodies.count() === 20L)
    assert(rows.count() === 15L)
    assert(bodies.where(!col("from_cache")).count() === 15L)
    assert(rows.select("url").distinct().count() === 15L)
    assert(FetchCounter.n.get() === 15)
  }

  test("fetch cache: a frontier beyond the driver-side bound fails loudly") {
    val now = java.sql.Timestamp.valueOf("2026-01-10 00:00:00")
    val cache = Seq.empty[(String, String, String, java.sql.Timestamp)]
      .toDF("fingerprint", "url", "body", "fetched_at")
    val ex = intercept[IllegalArgumentException] {
      Sources.fetchCached(spark,
        (1 to 10).map(i => s"http://x/$i"), cache, now, maxAgeDays = 30,
        fetcher = url => s"fetched:$url", maxFrontier = 5)
    }
    assert(ex.getMessage.contains("frontier bound"))
    // raising the bound explicitly lets the same crawl proceed
    val (bodies, _) = Sources.fetchCached(spark,
      (1 to 10).map(i => s"http://x/$i"), cache, now, maxAgeDays = 30,
      fetcher = url => s"fetched:$url", maxFrontier = 10)
    assert(bodies.count() == 10)
  }

  test("wikidata deref: redirects remapped, invalids nulled, failures kept, cache reused") {
    val now = java.sql.Timestamp.valueOf("2026-01-10 00:00:00")
    val api = "https://wd.test/api"
    // Q2 redirects to Q1; Q3 is canonical; Q4's fetch fails; Q5 is a
    // fresh cache hit (fetcher must not be called for it)
    val cache = Seq(
      ("fp", Sources.wikidataQidUrl(api, "Q5"),
        """{"entities":{"Q5":{"redirects":{"to":"Q50"}}}}""",
        java.sql.Timestamp.valueOf("2026-01-08 00:00:00"))
    ).toDF("fingerprint", "url", "body", "fetched_at")
    var fetchedUrls = List.empty[String]
    val fetcher: Sources.Fetcher = url => {
      fetchedUrls ::= url
      if (url.endsWith("ids=Q2")) """{"entities":{"Q2":{"redirects":{"to":"Q1"}}}}"""
      else if (url.endsWith("ids=Q3")) """{"entities":{"Q3":{"id":"Q3"}}}"""
      else throw new RuntimeException("boom")
    }
    val df = Seq("Q2", "Q3", "Q4", "Q5", "bogus", null)
      .toDF("qid").withColumn("tag", lit("x"))
    val (out, newRows) = Sources.derefWikidataQids(
      df, "qid", cache, now, maxAgeDays = 30, fetcher = fetcher, apiBase = api)
    val got = out.select("qid").as[String].collect().toSeq
    assert(got.count(_ == "Q1") == 1)   // Q2 → redirect target
    assert(got.count(_ == "Q3") == 1)   // canonical keeps itself
    assert(got.count(_ == "Q4") == 1)   // failed fetch keeps original
    assert(got.count(_ == "Q50") == 1)  // cache-served redirect
    assert(got.count(_ == null) == 2)   // bogus + null → null
    assert(!fetchedUrls.exists(_.endsWith("ids=Q5"))) // cache hit
    // failed fetch (Q4) must NOT be appended to the cache
    val cachedUrls = newRows.select("url").as[String].collect().toSeq
    assert(cachedUrls.toSet ==
      Set(Sources.wikidataQidUrl(api, "Q2"), Sources.wikidataQidUrl(api, "Q3")))
  }

  test("llm extraction runs the injected extractor with stable cache keys") {
    val fake: Sources.Extractor = (prompt, payload) =>
      s"""{"entities":["${payload.toUpperCase}"],"prompt_len":${prompt.length}}"""
    val out = Sources.llmExtract(Seq("alpha", "beta").toDF("text"), "text",
      "extract the names", fake)
      .as[(String, String, String)].collect().toSeq.sortBy(_._2)
    assert(out.map(_._2) == Seq("alpha", "beta"))
    assert(out.head._3.contains("ALPHA"))
    assert(out.map(_._1).distinct.size == 2) // distinct cache keys
  }

}
