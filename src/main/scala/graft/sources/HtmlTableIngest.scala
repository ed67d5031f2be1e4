package graft.sources

import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Scrape-shaped ingest (reference operators S1–S8, main.py:7-115):
  * fetch-with-retry, HTML table scan with header inference, malformed-
  * row filter, literal source-name injection, union-all accumulation,
  * per-source error isolation, pacing.
  *
  * The fetcher is pluggable (`() => String`): production would plug an
  * HTTP client here (retry/backoff/pacing are connector concerns, not
  * plan concerns — SURVEY §2A S1/S8); this environment has no egress,
  * so tests feed local HTML strings through the identical path.
  *
  * Scale note: fetching N sources is driver-side work only for source
  * *listing*; row payloads go straight into a DataFrame and all
  * downstream transforms are distributed. For large N, the source list
  * itself becomes a DataFrame and fetches run in tasks.
  */
object HtmlTableIngest {

  /** One scrape target: a name to inject (S5) and a fetcher (S1). */
  final case class ScrapeSource(name: String, fetch: () => String)

  /** One root-page link-table row (S2): display name + resolved URL. */
  final case class StockLink(stockName: String, link: String)

  private val tableRe: Regex =
    "(?s)<table[^>]*class=\"[^\"]*freeze-column[^\"]*\"[^>]*>(.*?)</table>".r
  private val tbodyRe: Regex =
    "(?s)<tbody[^>]*class=\"[^\"]*datatable[^\"]*\"[^>]*>(.*?)</tbody>".r
  private val rowRe: Regex = "(?s)<tr[^>]*>(.*?)</tr>".r
  private val thRe: Regex = "(?s)<th[^>]*>(.*?)</th>".r
  private val tdRe: Regex = "(?s)<td[^>]*>(.*?)</td>".r
  // bs4 accepts either quoting style for attributes; so does this.
  private val anchorRe: Regex =
    "(?s)<a[^>]*href=[\"']([^\"']*)[\"'][^>]*>(.*?)</a>".r

  /** Tag-strip + decode of the entities the scraped tables actually
    * carry (bs4's `.text` decodes all entities; the named/numeric
    * handful below covers the reference pages). */
  private def strip(s: String): String =
    s.replaceAll("<[^>]*>", "")
      .replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&apos;", "'")
      .replace("&amp;", "&")
      .trim

  /** S3: locate the freeze-column table, infer headers from the first
    * row bearing <th> cells, emit each <td> row. S4: rows whose cell
    * count differs from the header count are dropped. */
  def parseTable(html: String): (Seq[String], Seq[Seq[String]]) = {
    val body = tableRe.findFirstMatchIn(html)
      .getOrElse(throw new IllegalArgumentException("no freeze-column table"))
      .group(1)
    val rows = rowRe.findAllMatchIn(body).map(_.group(1)).toSeq
    val headers = rows.iterator
      .map(r => thRe.findAllMatchIn(r).map(m => strip(m.group(1))).toSeq)
      .find(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException("no header row"))
    val data = rows
      .map(r => tdRe.findAllMatchIn(r).map(m => strip(m.group(1))).toSeq)
      .filter(_.size == headers.size) // S4 malformed-row filter
    (headers, data)
  }

  /** S2: derive the {stock_name, link} source list from the root page's
    * `datatable` tbody (main.py:26-46). Each row's first anchor yields
    * the display name and an href resolved against `baseUrl` — full
    * URLs pass through, `/rel` and `rel` forms are prefixed — with the
    * reference's `-historical-data` suffix appended in every branch.
    * Rows without a hyperlinked cell are dropped (the link-layer
    * analogue of the S4 malformed-row filter; the reference would crash
    * the whole run on such a row, which is strictly worse). */
  def linkTable(rootHtml: String, baseUrl: String): Seq[StockLink] = {
    val body = tbodyRe.findFirstMatchIn(rootHtml)
      .getOrElse(throw new IllegalArgumentException("no datatable tbody"))
      .group(1)
    rowRe.findAllMatchIn(body).map(_.group(1)).flatMap { row =>
      anchorRe.findFirstMatchIn(row).map { m =>
        val href = m.group(1)
        val link =
          if (href.startsWith("http")) s"$href-historical-data"
          else if (href.startsWith("/")) s"$baseUrl$href-historical-data"
          else s"$baseUrl/$href-historical-data"
        StockLink(strip(m.group(2)), link)
      }
    }.toSeq
  }

  /** S2→S1 glue: the root page becomes the source list `ingest` runs —
    * the reference's first pipeline stage (main.py:49-66). `fetcherFor`
    * maps each resolved link to its fetch thunk (an HTTP client in
    * production; local fixtures in tests). */
  def sourcesFromRoot(rootHtml: String, baseUrl: String,
      fetcherFor: String => () => String): Seq[ScrapeSource] =
    linkTable(rootHtml, baseUrl)
      .map(l => ScrapeSource(l.stockName, fetcherFor(l.link)))

  /** S1 PRODUCTION fetcher: a JDK HttpClient GET with timeout and
    * redirect-following. Non-2xx statuses throw, so
    * [[fetchWithRetry]] retries them and [[ingest]]'s S7 isolation
    * catches terminal failures — the full live path is the same code
    * the fixture-fed tests run, with only this thunk swapped in
    * (LiveIngestSpec drives it against a loopback HTTP server, so the
    * socket path is exercised even in an egress-less environment).
    * The client is built once per fetcher and reused across retries. */
  def httpFetcher(url: String, timeoutMs: Long = 10000L): () => String = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    () => {
      val req = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("User-Agent", "graft-ingest/1.0")
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"HTTP ${resp.statusCode()} for $url")
      resp.body()
    }
  }

  /** S1: retry with linear backoff. */
  def fetchWithRetry(fetch: () => String, maxRetries: Int = 3,
      backoffMs: Long = 0L): String = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxRetries) {
      try return fetch()
      catch {
        case e: Throwable =>
          last = e; attempt += 1
          if (attempt < maxRetries && backoffMs > 0) Thread.sleep(backoffMs)
      }
    }
    throw last
  }

  /** The full E-stage: per-source fetch→parse→tag, header schema from
    * the FIRST successful source (S3 semantics), union-all
    * accumulation (S6), per-source isolation (S7), pacing (S8).
    * Returns all-string columns + `stock_name`, like the reference's
    * raw CSV layer. */
  def ingest(spark: SparkSession, sources: Seq[ScrapeSource],
      paceMs: Long = 0L, backoffMs: Long = 0L): DataFrame = {
    var schema: Option[Seq[String]] = None
    val frames = sources.flatMap { src =>
      val out =
        try {
          val (headers, rows) = parseTable(fetchWithRetry(src.fetch, backoffMs = backoffMs))
          val useHeaders = schema.getOrElse { schema = Some(headers); headers }
          // S4 again under the pinned schema: row arity must match the
          // inferred header of the first source
          val good = rows.filter(_.size == useHeaders.size)
          val st = StructType(useHeaders.map(StructField(_, StringType)) :+
            StructField("stock_name", StringType))
          Some(spark.createDataFrame(
            spark.sparkContext.parallelize(
              good.map(r => Row.fromSeq(r :+ src.name))),
            st))
        } catch {
          case e: Throwable => // S7: isolate, continue
            System.err.println(s"[ingest] source '${src.name}' skipped: ${e.getMessage}")
            None
        }
      if (paceMs > 0) Thread.sleep(paceMs) // S8
      out
    }
    frames.reduceOption(_ unionByName _)
      .getOrElse(spark.emptyDataFrame)
  }
}
