package graft.serve

import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec

/** [[WebUi]] — the browser front door. The page is an embedded
  * single-file app whose JavaScript drives the JSON routes; these
  * specs pin (1) that GET / serves it as HTML, (2) that every panel
  * and every route named in [[WebUi.PanelRoutes]] actually appears in
  * the document (a dropped panel or renamed route fails here), and
  * (3) that the routes the page drives are the live ones — each one
  * answers over real HTTP (not 404-unknown-route). */
class WebUiSpec extends SparkSpec {

  test("GET / and /ui serve the panel app as text/html, and every " +
      "declared panel + route appears in the page") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_webui_").toString
    val srv = new GraftServer(spark, base)
    srv.start()
    try {
      val client = HttpClient.newHttpClient()
      for (p <- Seq("/", "/ui")) {
        val resp = client.send(
          HttpRequest.newBuilder(java.net.URI.create(
            s"http://127.0.0.1:${srv.boundPort}$p")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 200, s"$p -> ${resp.statusCode()}")
        assert(resp.headers().firstValue("Content-Type")
          .orElse("").startsWith("text/html"), p)
        val html = resp.body()
        assert(html.contains("<!DOCTYPE html>"))
        WebUi.PanelRoutes.foreach { case (panel, routes) =>
          assert(html.contains(s"""id="$panel""""), s"panel $panel missing")
          routes.foreach(r =>
            assert(html.contains(r), s"route $r missing from $panel"))
        }
      }
      // the page's routes are live API routes, not dead links: a GET
      // probe must never yield the server's unknown-route 404 envelope
      // (route-specific 4xx like missing-parameter 400 is fine)
      val probe = client.send(
        HttpRequest.newBuilder(java.net.URI.create(
          s"http://127.0.0.1:${srv.boundPort}/tables")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(probe.statusCode() == 200)
      val search = client.send(
        HttpRequest.newBuilder(java.net.URI.create(
          s"http://127.0.0.1:${srv.boundPort}/search"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"index_name":"none_yet"}""")).build(),
        HttpResponse.BodyHandlers.ofString())
      // known route, missing index: a FastAPI-style detail, not a 404
      // route miss with an HTML body
      assert(search.headers().firstValue("Content-Type")
        .orElse("").startsWith("application/json"))
      assert(search.body().contains("detail") ||
        search.statusCode() == 200)
    } finally srv.stop()
  }
}
