package graft.service

import org.sparkproject.connect.protobuf.DescriptorProtos._
import org.sparkproject.connect.protobuf.Descriptors.{Descriptor, FileDescriptor}
import org.sparkproject.connect.protobuf.DynamicMessage
import org.sparkproject.connect.grpc.MethodDescriptor

/** The reference's protobuf wire schema, built programmatically — a
  * faithful mirror of `proto/cluster_service.proto` (reference:
  * proto/cluster_service.proto:7-16 service, :18-107 messages) using
  * the protobuf/grpc runtime Spark already ships for Spark Connect
  * (shaded under org.sparkproject.connect); zero new dependencies, and
  * the bytes on the wire are real proto3.
  *
  * `DynamicMessage` + a hand-assembled `FileDescriptor` replace
  * protoc codegen: same descriptor graph protoc would emit, including
  * the implicit `map<…>` entry messages (a nested `*Entry` message
  * with `map_entry = true`, key = 1, value = 2 — the proto3 spec's
  * defined lowering).
  */
object ClusterProto {

  import FieldDescriptorProto.{Label, Type}

  private def field(name: String, num: Int, t: Type,
                    typeName: String = null,
                    label: Label = Label.LABEL_OPTIONAL): FieldDescriptorProto = {
    val b = FieldDescriptorProto.newBuilder()
      .setName(name).setNumber(num).setType(t).setLabel(label)
    if (typeName != null) b.setTypeName(typeName)
    b.build()
  }

  private def msg(name: String, fields: Seq[FieldDescriptorProto],
                  nested: Seq[DescriptorProto] = Nil): DescriptorProto = {
    val b = DescriptorProto.newBuilder().setName(name)
    fields.foreach(b.addField)
    nested.foreach(b.addNestedType)
    b.build()
  }

  /** The implicit map-entry message `map<string, V>` lowers to. */
  private def mapEntry(name: String, vt: Type, vTypeName: String = null): DescriptorProto =
    DescriptorProto.newBuilder().setName(name)
      .addField(field("key", 1, Type.TYPE_STRING))
      .addField(field("value", 2, vt, vTypeName))
      .setOptions(MessageOptions.newBuilder().setMapEntry(true))
      .build()

  val fileDescriptor: FileDescriptor = {
    val infoFields = Seq(
      field("id", 1, Type.TYPE_STRING),
      field("num_points", 2, Type.TYPE_INT32),
      field("timestamp", 3, Type.TYPE_STRING),
      field("file_size", 4, Type.TYPE_INT64))
    val zoomReqFields = Seq(
      field("cluster_id", 1, Type.TYPE_STRING),
      field("zoom", 2, Type.TYPE_INT32),
      field("bounds", 3, Type.TYPE_MESSAGE, ".cluster.Bounds"))
    val statsFields = Seq(
      field("min", 1, Type.TYPE_DOUBLE),
      field("max", 2, Type.TYPE_DOUBLE),
      field("average", 3, Type.TYPE_DOUBLE))

    val proto = FileDescriptorProto.newBuilder()
      .setName("cluster_service.proto")
      .setPackage("cluster")
      .setSyntax("proto3")
      .addMessageType(msg("ListClustersRequest", Nil))
      .addMessageType(msg("ClusterInfo", infoFields))
      .addMessageType(msg("ListClustersResponse", Seq(
        field("clusters", 1, Type.TYPE_MESSAGE, ".cluster.ClusterInfo", Label.LABEL_REPEATED))))
      .addMessageType(msg("LoadClusterRequest", Seq(field("cluster_id", 1, Type.TYPE_STRING))))
      .addMessageType(msg("LoadClusterResponse", Seq(
        field("cluster", 1, Type.TYPE_MESSAGE, ".cluster.ClusterInfo"))))
      .addMessageType(msg("CreateClusterRequest", Seq(field("num_points", 1, Type.TYPE_INT32))))
      .addMessageType(msg("CreateClusterResponse", Seq(
        field("cluster", 1, Type.TYPE_MESSAGE, ".cluster.ClusterInfo"))))
      .addMessageType(msg("Bounds", Seq(
        field("min_x", 1, Type.TYPE_FLOAT), field("min_y", 2, Type.TYPE_FLOAT),
        field("max_x", 3, Type.TYPE_FLOAT), field("max_y", 4, Type.TYPE_FLOAT))))
      .addMessageType(msg("GetClustersRequest", zoomReqFields))
      .addMessageType(msg("ClusterFeature", Seq(
        field("x", 1, Type.TYPE_FLOAT), field("y", 2, Type.TYPE_FLOAT),
        field("count", 3, Type.TYPE_UINT32), field("id", 4, Type.TYPE_UINT32),
        field("metrics", 5, Type.TYPE_MESSAGE, ".cluster.ClusterFeature.MetricsEntry",
          Label.LABEL_REPEATED),
        field("is_cluster", 6, Type.TYPE_BOOL)),
        nested = Seq(mapEntry("MetricsEntry", Type.TYPE_FLOAT))))
      .addMessageType(msg("GetClustersResponse", Seq(
        field("features", 1, Type.TYPE_MESSAGE, ".cluster.ClusterFeature", Label.LABEL_REPEATED))))
      .addMessageType(msg("GetMetadataRequest", zoomReqFields))
      .addMessageType(msg("MetricStats", statsFields))
      .addMessageType(msg("TimeRange", Seq(
        field("earliest", 1, Type.TYPE_STRING), field("latest", 2, Type.TYPE_STRING))))
      .addMessageType(msg("Range", statsFields))
      .addMessageType(msg("Distribution", Seq(
        field("values", 1, Type.TYPE_MESSAGE, ".cluster.Distribution.ValuesEntry",
          Label.LABEL_REPEATED)),
        nested = Seq(mapEntry("ValuesEntry", Type.TYPE_DOUBLE))))
      .addMessageType(msg("MetadataValue", Seq(
        field("time_range", 1, Type.TYPE_MESSAGE, ".cluster.TimeRange"),
        field("range", 2, Type.TYPE_MESSAGE, ".cluster.Range"),
        field("distribution", 3, Type.TYPE_MESSAGE, ".cluster.Distribution"),
        field("single_value", 4, Type.TYPE_STRING))))
      .addMessageType(msg("GetMetadataResponse", Seq(
        field("total_points", 1, Type.TYPE_INT32),
        field("num_clusters", 2, Type.TYPE_INT32),
        field("num_single_points", 3, Type.TYPE_INT32),
        field("metrics_summary", 4, Type.TYPE_MESSAGE,
          ".cluster.GetMetadataResponse.MetricsSummaryEntry", Label.LABEL_REPEATED),
        field("metadata_summary", 5, Type.TYPE_MESSAGE,
          ".cluster.GetMetadataResponse.MetadataSummaryEntry", Label.LABEL_REPEATED)),
        nested = Seq(
          mapEntry("MetricsSummaryEntry", Type.TYPE_MESSAGE, ".cluster.MetricStats"),
          mapEntry("MetadataSummaryEntry", Type.TYPE_MESSAGE, ".cluster.MetadataValue"))))
      .addService(ServiceDescriptorProto.newBuilder()
        .setName("ClusterService")
        .addMethod(rpc("ListClusters"))
        .addMethod(rpc("LoadCluster"))
        .addMethod(rpc("CreateCluster"))
        .addMethod(rpc("GetClusters"))
        .addMethod(rpc("GetMetadata"))
        .build())
      .build()
    FileDescriptor.buildFrom(proto, Array.empty[FileDescriptor])
  }

  private def rpc(name: String): MethodDescriptorProto =
    MethodDescriptorProto.newBuilder().setName(name)
      .setInputType(s".cluster.${name}Request")
      .setOutputType(s".cluster.${name}Response")
      .build()

  def messageType(name: String): Descriptor = fileDescriptor.findMessageTypeByName(name)

  /** grpc marshaller pair for a message type: real proto3 bytes on the
    * wire, `DynamicMessage` in memory.
    */
  private def marshaller(d: Descriptor): MethodDescriptor.Marshaller[DynamicMessage] =
    new MethodDescriptor.Marshaller[DynamicMessage] {
      override def stream(m: DynamicMessage): java.io.InputStream =
        new java.io.ByteArrayInputStream(m.toByteArray)
      override def parse(in: java.io.InputStream): DynamicMessage =
        DynamicMessage.parseFrom(d, in)
    }

  def method(name: String): MethodDescriptor[DynamicMessage, DynamicMessage] =
    MethodDescriptor.newBuilder[DynamicMessage, DynamicMessage]()
      .setType(MethodDescriptor.MethodType.UNARY)
      .setFullMethodName(MethodDescriptor.generateFullMethodName("cluster.ClusterService", name))
      .setRequestMarshaller(marshaller(messageType(s"${name}Request")))
      .setResponseMarshaller(marshaller(messageType(s"${name}Response")))
      .build()
}
