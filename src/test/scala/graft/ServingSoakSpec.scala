package graft

import graft.service.RestServer
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}

/** Concurrency soak on the serving edge (r12 verdict item 6): ONE
  * engine instance with a deliberately tiny dataset LRU (maxCached=2)
  * over five datasets, driven by 32 concurrent threads of mixed
  * requests (viewport clusters / metadata summary / BM25 search / ANN
  * search) through a live RestServer. What this pins:
  *
  *  - **Correct under eviction-while-serving**: with 5 datasets and a
  *    2-slot LRU, almost every request forces an eviction that
  *    `unpersist()`s a DataFrame some OTHER in-flight request may be
  *    consuming. Spark's contract is that unpersist never corrupts a
  *    running action (missing blocks recompute), and `Catalog.load`'s
  *    synchronized block must keep the LRU map itself consistent —
  *    every response body is checked against per-dataset expectations
  *    and single-threaded baselines.
  *  - **The HTTP edge actually overlaps requests** — the server runs a
  *    pool executor (a bare JDK HttpServer serializes every handler on
  *    the dispatcher thread, making "concurrent serving" fictional).
  *  - **No leaked LRU state**: after the storm the cache honors
  *    maxCached and every dataset still serves correctly.
  */
class ServingSoakSpec extends SparkSpec {
  import spark.implicits._

  private val viewport = "zoom=3&west=-180&south=-85&east=180&north=85"

  test("32 concurrent mixed requests stay correct under LRU eviction churn") {
    val engine = new ClusterEngine(spark,
      Files.createTempDirectory("graft-soak").toString, maxCached = 2)
    val sizes = Seq("soak-a" -> 400L, "soak-b" -> 500L, "soak-c" -> 600L,
      "soak-d" -> 700L, "soak-e" -> 800L)
    sizes.foreach { case (id, n) => engine.createDataset(id, n, seed = n) }

    // serving indexes for the search/ann request kinds
    val tix = Files.createTempDirectory("graft-soak-tix").toString
    graft.sources.TextIndex.save(Seq(
      (1L, "spark shuffle join aggregation"),
      (2L, "spark spark spark streaming"),
      (3L, "entirely unrelated gardening prose")).toDF("doc_id", "text"), tix)
    val dims = 8
    def vec(seed: Int): Array[Float] =
      Array.tabulate(dims)(j => (((seed * 31 + j * 7) % 19) - 9) / 10.0f)
    val corpus = (0L until 40L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val vix = Files.createTempDirectory("graft-soak-vix").toString
    graft.sources.VectorIndex.save(corpus, vix, k = 4, dims = dims)

    val srv = new RestServer(engine,
      ann = Some((spark, vix, dims)), text = Some((spark, tix)))
    srv.start()
    val http = HttpClient.newHttpClient()
    def get(path: String): HttpResponse[String] =
      http.send(HttpRequest.newBuilder(
        URI.create(s"http://localhost:${srv.boundPort}$path")).GET().build(),
        HttpResponse.BodyHandlers.ofString())

    val pool = Executors.newFixedThreadPool(32)
    try {
      // single-threaded baselines first — deterministic routes must
      // return byte-identical bodies under the storm
      val searchBaseline = get("/api/search?q=spark&k=3")
      assert(searchBaseline.statusCode() == 200, searchBaseline.body())
      val annBaseline = get("/api/ann/search?id=0&k=5&probes=2")
      assert(annBaseline.statusCode() == 200, annBaseline.body())

      val ids = sizes.map(_._1).toVector
      val bySize = sizes.toMap
      val errors = new ConcurrentLinkedQueue[String]()
      def checked(tag: String)(body: => Unit): Unit =
        try body catch {
          case e: Throwable => errors.add(s"$tag: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
      val futures = (0 until 32).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = (0 until 4).foreach { i =>
            val id = ids((t + i) % ids.size)
            (t + i) % 4 match {
              case 0 => checked(s"metadata $id") {
                val r = get(s"/api/clusters/$id/metadata?$viewport")
                assert(r.statusCode() == 200, r.body().take(200))
                assert(r.body().contains(s""""totalPoints":${bySize(id)}"""),
                  s"wrong totalPoints for $id: ${r.body().take(200)}")
              }
              case 1 => checked(s"clusters $id") {
                val r = get(s"/api/clusters/$id?$viewport")
                assert(r.statusCode() == 200, r.body().take(200))
                assert(r.body().startsWith("""{"type":"FeatureCollection","features":["""),
                  r.body().take(120))
                assert(r.body().contains(""""cluster":true"""), r.body().take(300))
              }
              case 2 => checked("search") {
                val r = get("/api/search?q=spark&k=3")
                assert(r.statusCode() == 200 && r.body() == searchBaseline.body(),
                  s"search drifted under load: ${r.body().take(200)}")
              }
              case 3 => checked("ann") {
                val r = get("/api/ann/search?id=0&k=5&probes=2")
                assert(r.statusCode() == 200 && r.body() == annBaseline.body(),
                  s"ann drifted under load: ${r.body().take(200)}")
              }
            }
          }
        })
      }
      futures.foreach(_.get(600, TimeUnit.SECONDS))
      assert(errors.isEmpty, s"${errors.size} soak failures:\n${
        errors.toArray.take(8).mkString("\n")}")

      // LRU invariants survived the churn, and every dataset — cached
      // or long since evicted — still serves the right answer
      val cached = engine.catalog.cachedIds
      assert(cached.size <= 2, s"LRU overflowed maxCached: $cached")
      sizes.foreach { case (id, n) =>
        val r = get(s"/api/clusters/$id/metadata?$viewport")
        assert(r.statusCode() == 200 && r.body().contains(s""""totalPoints":$n"""),
          s"post-soak serve wrong for $id: ${r.body().take(200)}")
      }
    } finally { srv.stop(); pool.shutdownNow() }
  }
}
