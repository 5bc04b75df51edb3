package graft

import graft.service.{ClusterProto, GrpcServer}
import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}
import org.sparkproject.connect.grpc.CallOptions
import org.sparkproject.connect.grpc.netty.NettyChannelBuilder
import org.sparkproject.connect.grpc.stub.ClientCalls
import org.sparkproject.connect.protobuf.DynamicMessage
import scala.jdk.CollectionConverters._

/** Concurrency soak on the gRPC edge (r13 verdict item 6): the REST
  * soak found two real defects (serialized handlers, eviction-vs-
  * in-flight unpersist) that single-request tests could not see — the
  * five reference RPCs (proto/cluster_service.proto:7-16) get the same
  * 32-thread mixed storm here. ONE engine with a 2-slot dataset LRU
  * over five datasets, one shared HTTP/2 channel (multiplexed streams,
  * the production client shape). What this pins:
  *
  *  - **Correct under eviction-while-serving**: every GetClusters /
  *    GetMetadata forces LRU churn that unpersists frames other
  *    in-flight RPCs are consuming — responses are checked against
  *    per-dataset invariants (point conservation, totals).
  *  - **Mutation under storm**: CreateCluster runs concurrently with
  *    serving traffic — the catalog's invalidate() discipline and the
  *    meta-file writes must stay consistent while 31 other threads
  *    churn the same LRU (the created datasets must then list and
  *    serve exactly).
  *  - **Status mapping under load**: a NOT_FOUND probe inside the
  *    storm must keep returning NOT_FOUND, never INTERNAL from a race.
  */
class GrpcSoakSpec extends SparkSpec {

  private def t(name: String) = ClusterProto.messageType(name)
  private def fld(m: DynamicMessage, name: String): AnyRef =
    m.getField(m.getDescriptorForType.findFieldByName(name))

  test("32 concurrent mixed RPCs stay correct under LRU churn and live mutation") {
    val engine = new ClusterEngine(spark,
      Files.createTempDirectory("graft-grpc-soak").toString, maxCached = 2)
    val sizes = Seq("gsoak-a" -> 400L, "gsoak-b" -> 500L, "gsoak-c" -> 600L,
      "gsoak-d" -> 700L, "gsoak-e" -> 800L)
    sizes.foreach { case (id, n) => engine.createDataset(id, n, seed = n) }

    val srv = new GrpcServer(engine)
    srv.start()
    val channel = NettyChannelBuilder
      .forAddress("localhost", srv.boundPort).usePlaintext().build()
    def call(rpc: String, req: DynamicMessage): DynamicMessage =
      ClientCalls.blockingUnaryCall(channel, ClusterProto.method(rpc), CallOptions.DEFAULT, req)

    def worldReq(rpcReq: String, id: String, zoom: Int): DynamicMessage = {
      val bT = t("Bounds")
      val bounds = DynamicMessage.newBuilder(bT)
        .setField(bT.findFieldByName("min_x"), Float.box(-180f))
        .setField(bT.findFieldByName("min_y"), Float.box(-85f))
        .setField(bT.findFieldByName("max_x"), Float.box(180f))
        .setField(bT.findFieldByName("max_y"), Float.box(85f))
        .build()
      val rT = t(rpcReq)
      DynamicMessage.newBuilder(rT)
        .setField(rT.findFieldByName("cluster_id"), id)
        .setField(rT.findFieldByName("zoom"), Int.box(zoom))
        .setField(rT.findFieldByName("bounds"), bounds)
        .build()
    }

    val pool = Executors.newFixedThreadPool(32)
    try {
      val ids = sizes.map(_._1).toVector
      val bySize = sizes.toMap
      val errors = new ConcurrentLinkedQueue[String]()
      def checked(tag: String)(body: => Unit): Unit =
        try body catch {
          case e: Throwable => errors.add(s"$tag: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
      val futures = (0 until 32).map { thread =>
        pool.submit(new Runnable {
          def run(): Unit = (0 until 4).foreach { i =>
            val id = ids((thread + i) % ids.size)
            (thread + i) % 5 match {
              case 0 => checked(s"GetClusters $id") {
                val resp = call("GetClusters", worldReq("GetClustersRequest", id, 3))
                val feats = fld(resp, "features").asInstanceOf[java.util.List[_]].asScala
                  .map(_.asInstanceOf[DynamicMessage])
                val counts = feats.map(f => fld(f, "count").asInstanceOf[java.lang.Integer].toLong)
                assert(counts.sum == bySize(id),
                  s"conservation broke under storm: ${counts.sum} != ${bySize(id)}")
              }
              case 1 => checked(s"GetMetadata $id") {
                val resp = call("GetMetadata", worldReq("GetMetadataRequest", id, 3))
                assert(fld(resp, "total_points") == bySize(id).toInt,
                  s"wrong total_points for $id: ${fld(resp, "total_points")}")
              }
              case 2 => checked(s"LoadCluster $id") {
                val rT = t("LoadClusterRequest")
                val resp = call("LoadCluster", DynamicMessage.newBuilder(rT)
                  .setField(rT.findFieldByName("cluster_id"), id).build())
                val info = fld(resp, "cluster").asInstanceOf[DynamicMessage]
                assert(fld(info, "num_points") == bySize(id).toInt)
              }
              case 3 => checked("ListClusters") {
                val resp = call("ListClusters",
                  DynamicMessage.newBuilder(t("ListClustersRequest")).build())
                val infos = fld(resp, "clusters").asInstanceOf[java.util.List[_]].asScala
                  .map(_.asInstanceOf[DynamicMessage])
                // the five seeds are always present; creates may add more
                assert(sizes.forall { case (_, n) =>
                  infos.exists(inf => fld(inf, "num_points") == n.toInt) },
                  s"catalog lost a dataset under storm: ${infos.size} entries")
              }
              case 4 =>
                if (thread % 8 == 2 && i == 0) checked(s"CreateCluster $thread") {
                  // a live mutation inside the storm: save + meta write +
                  // LRU invalidation racing 31 serving threads
                  val rT = t("CreateClusterRequest")
                  val resp = call("CreateCluster", DynamicMessage.newBuilder(rT)
                    .setField(rT.findFieldByName("num_points"), Int.box(100 + thread)).build())
                  val info = fld(resp, "cluster").asInstanceOf[DynamicMessage]
                  assert(fld(info, "num_points") == 100 + thread)
                } else checked("NotFound probe") {
                  val rT = t("LoadClusterRequest")
                  val e = intercept[org.sparkproject.connect.grpc.StatusRuntimeException] {
                    call("LoadCluster", DynamicMessage.newBuilder(rT)
                      .setField(rT.findFieldByName("cluster_id"), "gsoak-never").build())
                  }
                  assert(e.getStatus.getCode ==
                    org.sparkproject.connect.grpc.Status.Code.NOT_FOUND,
                    s"status drifted under load: ${e.getStatus}")
                }
            }
          }
        })
      }
      futures.foreach(_.get(600, TimeUnit.SECONDS))
      assert(errors.isEmpty, s"${errors.size} gRPC soak failures:\n${
        errors.toArray.take(8).mkString("\n")}")

      // LRU invariants survived; every dataset (cached or evicted, plus
      // any storm-created ones) still answers exactly
      assert(engine.catalog.cachedIds.size <= 2,
        s"LRU overflowed maxCached: ${engine.catalog.cachedIds}")
      sizes.foreach { case (id, n) =>
        val resp = call("GetMetadata", worldReq("GetMetadataRequest", id, 3))
        assert(fld(resp, "total_points") == n.toInt,
          s"post-soak serve wrong for $id")
      }
    } finally {
      channel.shutdownNow()
      srv.stop()
      pool.shutdownNow()
    }
  }
}
