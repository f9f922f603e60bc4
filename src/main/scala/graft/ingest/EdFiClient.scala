package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.Base64

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-side Ed-Fi ODS ingest: OAuth2 client-credentials token, offset
  * pagination, per-endpoint fan-out, and the change-version incremental
  * window (SURVEY §2.1 S1/S2; reference api/api.py:88-137,
  * helper/token.py:13-31, api/changeVersion.py:57-94).
  *
  * Deliberately NOT a Spark concern: extraction is driver-side I/O writing
  * silver JSON files that SilverReader then scans (the reference does the
  * same with a process pool). [[HttpTransport]] is pluggable so the client
  * is testable without a network (and this build environment has none).
  *
  * Scale: per-endpoint parallelism via Futures (reference uses
  * Pool(OS_CPU)); within an endpoint pagination is sequential because
  * offset paging is inherently serial per resource.
  */
trait HttpTransport {
  /** GET with headers → (status, body). */
  def get(url: String, headers: Map[String, String]): (Int, String)

  /** POST form body with headers → (status, body). */
  def post(url: String, headers: Map[String, String], form: Map[String, String]): (Int, String)
}

/** java.net.http-backed default transport. */
final class JdkHttpTransport extends HttpTransport {
  private val client = java.net.http.HttpClient.newHttpClient()

  private def build(url: String, headers: Map[String, String]) = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
    headers.foreach { case (k, v) => b.header(k, v) }
    b
  }

  def get(url: String, headers: Map[String, String]): (Int, String) = {
    val resp = client.send(build(url, headers).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  def post(url: String, headers: Map[String, String], form: Map[String, String]): (Int, String) = {
    val body = form.map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val resp = client.send(
      build(url, headers ++ Map("Content-Type" -> "application/x-www-form-urlencoded"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }
}

final case class ChangeVersionWindow(oldest: String, newest: String)

/** Two-line changeVersion.txt state file (reference changeVersion.py:51-54),
  * with the reference's three update scenarios (:57-94). */
final class ChangeVersionStore(root: Path) {

  private def fileFor(schoolYear: String): Path =
    if (schoolYear.isEmpty) root.resolve("changeVersion.txt")
    else root.resolve(schoolYear).resolve("changeVersion.txt")

  def read(schoolYear: String): ChangeVersionWindow = {
    val f = fileFor(schoolYear)
    if (Files.exists(f)) {
      val lines = Files.readAllLines(f)
      if (lines.size == 2) return ChangeVersionWindow(lines.get(0).trim, lines.get(1).trim)
    }
    ChangeVersionWindow("0", "0")
  }

  def write(schoolYear: String, w: ChangeVersionWindow): Unit = {
    val f = fileFor(schoolYear)
    Files.createDirectories(f.getParent)
    Files.writeString(f, s"${w.oldest}\n${w.newest}")
  }

  /** Next extraction window given the API's newest version: first run uses
    * the API's full range; unchanged newest → None (skip extraction);
    * otherwise window = (last newest, api newest]. */
  def advance(schoolYear: String, api: ChangeVersionWindow): Option[ChangeVersionWindow] = {
    val prev = read(schoolYear)
    val next =
      if (prev.newest == "0") Some(api)
      else if (prev.newest == api.newest) None
      else Some(ChangeVersionWindow(prev.newest, api.newest))
    next.foreach(write(schoolYear, _))
    next
  }
}

final class EdFiClient(
    transport: HttpTransport,
    apiUrl: String,
    apiKey: String,
    apiSecret: String,
    pageLimit: Int = 500,
    tokenPath: String = "oauth/token",
    maxRetries: Int = 3,
    sleep: Long => Unit = Thread.sleep
) {

  /** GET with bounded exponential backoff on 429/5xx (beyond the
    * reference, which lets any transient API hiccup kill the page loop —
    * api.py:100-116 just logs and returns a short result). `sleep` is
    * injectable so tests don't wait. */
  private def getWithRetry(url: String, headers: Map[String, String]): (Int, String) = {
    var attempt = 0
    var result = transport.get(url, headers)
    while (attempt < maxRetries &&
      (result._1 == 429 || result._1 >= 500)) {
      sleep(500L << attempt)
      attempt += 1
      result = transport.get(url, headers)
    }
    result
  }

  /** Data-standard version gate (reference api/api.py:26,72-78
    * `validate_supported_api`): the ODS root document advertises its
    * `dataModels`; the Ed-Fi model's version must start with a supported
    * major.minor (3.3 / 4.0) or extraction refuses to start — endpoint
    * paths and schemas are version-specific, and extracting from e.g. a
    * 5.x ODS would produce silently-wrong silver. Returns the advertised
    * version on success; throws with the advertised-vs-supported detail
    * otherwise. Call order matches the reference job: validate, then
    * extract ([[extractAll]] invokes it unless told not to). */
  def validateSupportedApi(): String = {
    val (status, body) = getWithRetry(apiUrl, Map.empty)
    require(status == 200, s"ODS root document request failed: $status")
    val version = edFiVersionFrom(body).getOrElse(
      sys.error(s"no Ed-Fi dataModel advertised by $apiUrl"))
    require(
      EdFiClient.SupportedVersions.exists(version.startsWith),
      s"unsupported Ed-Fi data standard $version (supported: " +
        s"${EdFiClient.SupportedVersions.mkString(", ")})")
    version
  }

  /** The `version` of the dataModels entry named Ed-Fi (case-insensitive),
    * from the ODS root JSON. */
  private[ingest] def edFiVersionFrom(json: String): Option[String] =
    """(?i)\{[^{}]*"name"\s*:\s*"ed-fi"[^{}]*\}""".r
      .findFirstIn(json)
      .flatMap(entry =>
        """"version"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(entry)
          .map(_.group(1)))

  /** OAuth2 client-credentials token (reference helper/token.py:13-31). */
  def token(): String = {
    val cred = Base64.getEncoder.encodeToString(
      s"$apiKey:$apiSecret".getBytes(StandardCharsets.UTF_8))
    val (status, body) = transport.post(
      s"$apiUrl/$tokenPath",
      Map("Authorization" -> s"Basic $cred"),
      Map("grant_type" -> "client_credentials"))
    require(status == 200, s"token request failed: $status")
    accessTokenFrom(body)
  }

  private[ingest] def accessTokenFrom(json: String): String = {
    val m = """"access_token"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(json)
    m.map(_.group(1)).getOrElse(sys.error("no access_token in token response"))
  }

  /** Offset-paginated extraction of one endpoint: pages of JSON arrays
    * until an empty page (reference api/api.py:88-116). Returns the raw
    * page bodies (silver stays byte-faithful; parsing happens in Spark). */
  def fetchPages(
      endpointUrl: String,
      bearer: String,
      window: Option[ChangeVersionWindow] = None
  ): Seq[String] = {
    val versionParams = window
      .map(w => s"&minChangeVersion=${w.oldest}&maxChangeVersion=${w.newest}")
      .getOrElse("")
    val headers = Map("Authorization" -> s"Bearer $bearer")
    Iterator.from(0)
      .map { page =>
        val url = s"$endpointUrl?limit=$pageLimit&offset=${page * pageLimit}$versionParams"
        getWithRetry(url, headers)
      }
      .takeWhile { case (status, body) =>
        status == 200 && body.trim.nonEmpty && body.trim != "[]"
      }
      .map(_._2)
      .toSeq
  }

  /** Fan out endpoints concurrently (reference api/api.py:120-137 uses a
    * process pool; JVM threads suffice for I/O-bound paging), writing one
    * silver JSON file per endpoint page under
    * `silverRoot/<schoolYear>/<endpoint>/`.
    *
    * Each endpoint also gets its `/deletes` twin (reference api/api.py:
    * 133-136) — the change-data stream of removed resources. The reference
    * drops delete pages into the SAME directory with a `deletes_` suffix
    * and then reads back only the first file the OS lists
    * (functions.py:14-17), so deletes can silently shadow base data there;
    * here they land in a sibling `<endpoint>_deletes/` directory so
    * [[graft.core.SilverReader]] scans stay clean while the stream is
    * still captured. Empty delete streams write nothing, matching
    * save_file's no-data short-circuit (helper.py:37). */
  def extractAll(
      endpoints: Seq[String],
      silverRoot: Path,
      schoolYear: String,
      window: Option[ChangeVersionWindow] = None,
      parallelism: Int = 4,
      validateVersion: Boolean = true
  ): Unit = {
    if (validateVersion) validateSupportedApi()
    // One shared token, refreshed (once per expiry) when the API starts
    // rejecting it mid-extraction — long pulls outlive token TTLs, and the
    // reference would silently truncate every remaining endpoint. An empty
    // page result is ambiguous (no data vs 401), so one probe request
    // disambiguates before re-authing.
    val bearerRef = new java.util.concurrent.atomic.AtomicReference(token())
    def fetchAuthed(url: String): Seq[String] = {
      val pages = fetchPages(url, bearerRef.get(), window)
      if (pages.nonEmpty) pages
      else {
        val (status, _) = transport.get(s"$url?limit=1&offset=0",
          Map("Authorization" -> s"Bearer ${bearerRef.get()}"))
        if (status == 401) {
          bearerRef.set(token())
          fetchPages(url, bearerRef.get(), window)
        } else pages
      }
    }
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(parallelism))
    def save(pages: Seq[String], dirName: String, prefix: String): Unit =
      if (pages.nonEmpty) {
        val dir = silverRoot.resolve(schoolYear).resolve(dirName)
        Files.createDirectories(dir)
        pages.zipWithIndex.foreach { case (body, i) =>
          Files.writeString(dir.resolve(s"${prefix}_$i.json"), body)
        }
      }
    val work = endpoints.flatMap { ep =>
      // accept namespace-qualified paths ("tpdm/candidates") or bare names
      // (default ed-fi namespace); silver dirs use the bare name, like the
      // reference's url-last-segment file naming (helper.py:128-131)
      val path = if (ep.contains("/")) ep else s"ed-fi/$ep"
      val name = path.substring(path.lastIndexOf('/') + 1)
      Seq(
        Future {
          save(fetchAuthed(s"$apiUrl/data/v3/$path"), name, name)
        },
        Future {
          save(fetchAuthed(s"$apiUrl/data/v3/$path/deletes"),
            s"${name}_deletes", s"${name}_deletes")
        })
    }
    Await.result(Future.sequence(work), Duration.Inf)
  }
}

object EdFiClient {
  /** Ed-Fi data-standard versions the endpoint census targets
    * (reference api/api.py:26 SUPPORTED_VERSION). */
  val SupportedVersions: Seq[String] = Seq("3.3", "4.0")
}
