package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest._

/** Ingest client tests against a fake in-memory transport (no network in
  * this environment; the transport seam is the point). */
class IngestSpec extends AnyFunSuite {

  private class FakeTransport(pages: Map[Int, String]) extends HttpTransport {
    var requests: List[String] = Nil
    def get(url: String, headers: Map[String, String]): (Int, String) = {
      requests ::= url
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

  test("the full 80-endpoint census resolves a silver schema for every entry") {
    val eps = graft.core.EndpointCatalog.extractionEndpoints
    assert(eps.size == 80) // reference endpoint.json census
    eps.foreach { ep =>
      val name = ep.substring(ep.lastIndexOf('/') + 1)
      assert(graft.core.EndpointCatalog.schema(name).fields.nonEmpty, s"no schema: $ep")
    }
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
