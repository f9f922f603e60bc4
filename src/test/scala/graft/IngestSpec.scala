package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest._

/** Ingest client tests against a fake in-memory transport (no network in
  * this environment; the transport seam is the point). */
class IngestSpec extends AnyFunSuite {

  /** The ODS root document a healthy 3.3 API advertises (version gate). */
  private val RootDoc =
    """{"version": "5.3", "dataModels": [
      |  {"name": "Ed-Fi", "version": "3.3.1-b", "informationalVersion": "latest"},
      |  {"name": "TPDM", "version": "1.1.0"}]}""".stripMargin

  private class FakeTransport(pages: Map[Int, String]) extends HttpTransport {
    var requests: List[String] = Nil
    def get(url: String, headers: Map[String, String]): (Int, String) = {
      requests ::= url
      if (!url.contains("offset=")) return (200, RootDoc) // root: version gate
      assert(headers("Authorization") == "Bearer tok-123")
      val offset = "offset=(\\d+)".r.findFirstMatchIn(url).get.group(1).toInt
      (200, pages.getOrElse(offset, "[]"))
    }
    def post(url: String, headers: Map[String, String], form: Map[String, String]): (Int, String) = {
      assert(form("grant_type") == "client_credentials")
      assert(headers("Authorization").startsWith("Basic "))
      (200, """{"access_token": "tok-123", "token_type": "bearer"}""")
    }
  }

  test("token + pagination until empty page") {
    val t = new FakeTransport(Map(
      0 -> """[{"id": 1}, {"id": 2}]""",
      2 -> """[{"id": 3}]"""))
    val client = new EdFiClient(t, "http://api", "k", "s", pageLimit = 2)
    val bearer = client.token()
    val pages = client.fetchPages("http://api/data/v3/ed-fi/students", bearer)
    assert(pages.size == 2)
    assert(t.requests.exists(_.contains("offset=4"))) // stopped on empty page 3
  }

  test("change-version window appended to requests") {
    val t = new FakeTransport(Map(0 -> """[{"id": 1}]"""))
    val client = new EdFiClient(t, "http://api", "k", "s", pageLimit = 2)
    client.fetchPages("http://api/x", "tok-123",
      Some(ChangeVersionWindow("10", "20")))
    assert(t.requests.exists(u =>
      u.contains("minChangeVersion=10") && u.contains("maxChangeVersion=20")))
  }

  test("extractAll writes silver layout plus /deletes twins") {
    // base endpoints return one page; only students has a deletes stream
    val t = new FakeTransport(Map(0 -> """[{"id": 1}]""")) {
      override def get(url: String, headers: Map[String, String]): (Int, String) = {
        requests ::= url
        if (url.contains("/deletes"))
          if (url.contains("students") && url.contains("offset=0"))
            (200, """[{"id": 1, "changeVersion": 9}]""")
          else (200, "[]")
        else super.get(url, headers)
      }
    }
    val client = new EdFiClient(t, "http://api", "k", "s", pageLimit = 2)
    val root = Files.createTempDirectory("silver")
    client.extractAll(Seq("students", "schools", "tpdm/candidates"), root, "2022",
      parallelism = 2)
    assert(Files.exists(root.resolve("2022/students/students_0.json")))
    assert(Files.exists(root.resolve("2022/schools/schools_0.json")))
    // namespaced endpoint: URL keeps tpdm/, silver dir uses the bare name
    assert(Files.exists(root.resolve("2022/candidates/candidates_0.json")))
    assert(t.requests.exists(_.contains("data/v3/tpdm/candidates?")))
    // deletes twin captured in its own directory (S1 surface, api.py:133-136)
    assert(Files.exists(root.resolve("2022/students_deletes/students_deletes_0.json")))
    // empty deletes stream → no directory at all
    assert(!Files.exists(root.resolve("2022/schools_deletes")))
    assert(t.requests.exists(_.contains("ed-fi/schools/deletes")))
  }

  test("transient 5xx/429 pages retry with backoff, then succeed") {
    var failures = 2
    val sleeps = scala.collection.mutable.ListBuffer.empty[Long]
    val t = new FakeTransport(Map(0 -> """[{"id": 1}]""")) {
      override def get(url: String, headers: Map[String, String]): (Int, String) =
        if (failures > 0) { failures -= 1; (503, "busy") }
        else super.get(url, headers)
    }
    val client = new EdFiClient(t, "http://api", "k", "s", pageLimit = 2,
      maxRetries = 3, sleep = sleeps.append(_))
    val pages = client.fetchPages("http://api/x", "tok-123")
    assert(pages == Seq("""[{"id": 1}]"""))
    assert(sleeps.toList == List(500L, 1000L)) // exponential backoff
  }

  test("persistent 5xx gives up after maxRetries and ends the page loop") {
    var calls = 0
    val t = new FakeTransport(Map.empty) {
      override def get(url: String, headers: Map[String, String]): (Int, String) = {
        calls += 1; (500, "down")
      }
    }
    val client = new EdFiClient(t, "http://api", "k", "s",
      maxRetries = 2, sleep = _ => ())
    assert(client.fetchPages("http://api/x", "tok-123").isEmpty)
    assert(calls == 3) // initial + 2 retries, then takeWhile stops
  }

  test("expired token mid-extraction: probe detects 401, re-auths, retries") {
    var issued = 0
    val t = new HttpTransport {
      var requests: List[String] = Nil
      def get(url: String, headers: Map[String, String]): (Int, String) = {
        requests ::= url
        if (!url.contains("offset=")) return (200, RootDoc)
        if (headers("Authorization") == "Bearer tok-2")
          if (url.contains("offset=0") && !url.contains("deletes")) (200, """[{"id": 1}]""")
          else (200, "[]")
        else (401, "expired")
      }
      def post(url: String, headers: Map[String, String], form: Map[String, String]): (Int, String) = {
        issued += 1
        (200, s"""{"access_token": "tok-$issued"}""")
      }
    }
    val client = new EdFiClient(t, "http://api", "k", "s", pageLimit = 2)
    val root = Files.createTempDirectory("silver")
    client.extractAll(Seq("students"), root, "2022", parallelism = 1)
    // first token rejected (401 pages read as empty), probe sees 401,
    // second token succeeds
    assert(issued == 2)
    assert(Files.exists(root.resolve("2022/students/students_0.json")))
  }

  test("version gate: supported data standard passes, 5.x ODS refuses extraction") {
    // supported: RootDoc advertises Ed-Fi 3.3.1-b
    val ok = new EdFiClient(new FakeTransport(Map.empty), "http://api", "k", "s")
    assert(ok.validateSupportedApi() == "3.3.1-b")
    // unsupported: a future ODS advertising Ed-Fi 5.2.0 must fail BEFORE
    // any endpoint extraction (reference api/api.py:26,72-78)
    val t5 = new FakeTransport(Map(0 -> """[{"id": 1}]""")) {
      override def get(url: String, headers: Map[String, String]): (Int, String) = {
        requests ::= url
        if (!url.contains("offset="))
          (200, """{"dataModels": [{"name": "Ed-Fi", "version": "5.2.0"}]}""")
        else super.get(url, headers)
      }
    }
    val bad = new EdFiClient(t5, "http://api", "k", "s")
    val e = intercept[IllegalArgumentException] {
      bad.extractAll(Seq("students"), Files.createTempDirectory("silver"), "2022")
    }
    assert(e.getMessage.contains("5.2.0"))
    assert(!t5.requests.exists(_.contains("data/v3")), "no endpoint GET after refusal")
    // no Ed-Fi model advertised at all → clear failure too
    val tNone = new FakeTransport(Map.empty) {
      override def get(url: String, headers: Map[String, String]): (Int, String) =
        (200, """{"dataModels": [{"name": "TPDM", "version": "1.1.0"}]}""")
    }
    intercept[RuntimeException] {
      new EdFiClient(tNone, "http://api", "k", "s").validateSupportedApi()
    }
    // opt-out for test rigs without a root document
    val tOff = new FakeTransport(Map(0 -> """[{"id": 1}]"""))
    new EdFiClient(tOff, "http://api", "k", "s").extractAll(
      Seq("students"), Files.createTempDirectory("silver"), "2022",
      validateVersion = false)
  }

  test("the full 80-endpoint census resolves a silver schema for every entry") {
    val eps = graft.core.EndpointCatalog.extractionEndpoints
    assert(eps.size == 80) // reference endpoint.json census
    eps.foreach { ep =>
      val name = ep.substring(ep.lastIndexOf('/') + 1)
      assert(graft.core.EndpointCatalog.schema(name).fields.nonEmpty, s"no schema: $ep")
    }
  }

  test("change-version incremental ingest end-to-end: full day, delta day, no-op day") {
    // Stub ODS whose /data/v3 honors min/maxChangeVersion the way the real
    // API does: only rows whose changeVersion falls inside the requested
    // window are served (reference api/changeVersion.py:57-94 drives the
    // window; api/api.py appends it to every page URL).
    val rows = scala.collection.mutable.ArrayBuffer((1, 1L), (2, 2L), (3, 3L))
    val t = new HttpTransport {
      def get(url: String, headers: Map[String, String]): (Int, String) = {
        if (!url.contains("offset=")) return (200, RootDoc)
        if (url.contains("/deletes")) return (200, "[]")
        def param(p: String) =
          s"$p=(\\d+)".r.findFirstMatchIn(url).map(_.group(1).toLong)
        val (min, max) = (param("minChangeVersion"), param("maxChangeVersion"))
        val offset = param("offset").get.toInt
        val inWindow = rows.filter(r =>
          min.forall(r._2 >= _) && max.forall(r._2 <= _)).sortBy(_._2)
        val page = inWindow.slice(offset, offset + 500)
        (200, page.map { case (id, cv) =>
          s"""{"id": $id, "changeVersion": $cv}"""
        }.mkString("[", ", ", "]"))
      }
      def post(url: String, headers: Map[String, String], form: Map[String, String]): (Int, String) =
        (200, """{"access_token": "tok-123"}""")
    }
    val client = new EdFiClient(t, "http://api", "k", "s")
    val store = new ChangeVersionStore(Files.createTempDirectory("cv"))
    val silver = Files.createTempDirectory("silver")
    def extractDay(day: String, apiWindow: ChangeVersionWindow): Boolean =
      store.advance("2022", apiWindow) match {
        case Some(w) =>
          client.extractAll(Seq("students"), silver.resolve(day), "2022",
            window = Some(w), parallelism = 1)
          true
        case None => false
      }
    def idsIn(day: String): Seq[Int] = {
      val f = silver.resolve(day).resolve("2022/students/students_0.json")
      if (!Files.exists(f)) Seq.empty
      else """"id": (\d+)""".r.findAllMatchIn(Files.readString(f))
        .map(_.group(1).toInt).toSeq
    }
    // day 1: first run → full API range, all three rows land in silver
    assert(extractDay("day1", ChangeVersionWindow("1", "3")))
    assert(idsIn("day1") == Seq(1, 2, 3))
    // day 2: rows 4 (new) and 2 (updated, cv bumped) → window (3, 7];
    // the delta batch carries ONLY changed rows (+ the inclusive boundary
    // row, the reference's overlap semantics) — not the whole corpus
    rows += ((4, 5L)); rows(1) = (2, 7L)
    assert(extractDay("day2", ChangeVersionWindow("1", "7")))
    assert(idsIn("day2") == Seq(3, 4, 2)) // cv order: 3, 5, 7 — no full reload
    assert(store.read("2022") == ChangeVersionWindow("3", "7"))
    // day 3: API newest unchanged → no extraction at all, watermark holds
    assert(!extractDay("day3", ChangeVersionWindow("1", "7")))
    assert(idsIn("day3").isEmpty)
    assert(store.read("2022") == ChangeVersionWindow("3", "7"))
  }

  test("ChangeVersionStore: first run, no-op run, incremental run") {
    val store = new ChangeVersionStore(Files.createTempDirectory("cv"))
    // first run: full API range
    assert(store.advance("2022", ChangeVersionWindow("5", "100"))
      .contains(ChangeVersionWindow("5", "100")))
    // unchanged newest: skip
    assert(store.advance("2022", ChangeVersionWindow("5", "100")).isEmpty)
    // newer data: window starts at last newest
    assert(store.advance("2022", ChangeVersionWindow("5", "140"))
      .contains(ChangeVersionWindow("100", "140")))
    assert(store.read("2022") == ChangeVersionWindow("100", "140"))
  }
}
