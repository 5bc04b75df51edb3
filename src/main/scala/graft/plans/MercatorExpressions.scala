package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst expressions for the Web-Mercator projection — the
  * optional codegen path of SURVEY §7.3 ("codegen mercator Expression").
  *
  * Semantically identical (bit-for-bit) to the builtin-function
  * composition in [[graft.functions.Mercator]]: the generated Java uses
  * the same `java.lang.Math` calls in the same order as the builtin
  * sin/log/greatest/least expressions. The win is fusion: one fused
  * expression instead of a 10-node subtree, staying inside
  * WholeStageCodegen with no intermediate boxing.
  *
  * Registered for SQL via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or
  * [[MercatorExpressions.register]] on an existing session:
  * `SELECT graft_mercator_x(lon, 16384.0) ...`.
  */
abstract class MercatorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (DOUBLE, DOUBLE), got " +
        children.map(_.dataType.simpleString).mkString(", "))
}

/** x = (lon+180)/360 · se (reference: cluster/cluster.go:1193). */
case class MercatorX(left: Expression, right: Expression) extends MercatorBinary {
  override def prettyName: String = "graft_mercator_x"
  override protected def nullSafeEval(lon: Any, se: Any): Any =
    (lon.asInstanceOf[Double] + 180.0) / 360.0 * se.asInstanceOf[Double]
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, se) => s"${ev.value} = ($lon + 180.0) / 360.0 * $se;")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** y = (0.5 − 0.25·ln((1+sin φ)/(1−sin φ))/π) · se, lat clamped
  * ±85.0511 (reference: cluster/cluster.go:1178-1195).
  */
case class MercatorY(left: Expression, right: Expression) extends MercatorBinary {
  override def prettyName: String = "graft_mercator_y"
  override protected def nullSafeEval(lat: Any, se: Any): Any = {
    val c = Math.max(-85.0511, Math.min(85.0511, lat.asInstanceOf[Double]))
    val s = Math.sin(c * Math.PI / 180.0)
    (0.5 - 0.25 * Math.log((1.0 + s) / (1.0 - s)) / Math.PI) * se.asInstanceOf[Double]
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lat, se) => {
      val c = ctx.freshName("clamped")
      val s = ctx.freshName("sinLat")
      s"""double $c = java.lang.Math.max(-85.0511, java.lang.Math.min(85.0511, $lat));
         |double $s = java.lang.Math.sin($c * java.lang.Math.PI / 180.0);
         |${ev.value} = (0.5 - 0.25 * java.lang.Math.log((1.0 + $s) / (1.0 - $s)) / java.lang.Math.PI) * $se;
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** lon = x/se·360 − 180 (reference: cluster/cluster.go:1215). */
case class MercatorInvX(left: Expression, right: Expression) extends MercatorBinary {
  override def prettyName: String = "graft_mercator_inv_x"
  override protected def nullSafeEval(px: Any, se: Any): Any =
    px.asInstanceOf[Double] / se.asInstanceOf[Double] * 360.0 - 180.0
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, se) => s"${ev.value} = $px / $se * 360.0 - 180.0;")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** lat = (2·atan(e^((1−2y/se)·π)) − π/2)·180/π (reference:
  * cluster/cluster.go:1219-1222).
  */
case class MercatorInvY(left: Expression, right: Expression) extends MercatorBinary {
  override def prettyName: String = "graft_mercator_inv_y"
  override protected def nullSafeEval(py: Any, se: Any): Any = {
    val y2 = (1.0 - py.asInstanceOf[Double] / se.asInstanceOf[Double] * 2.0) * Math.PI
    (Math.atan(Math.exp(y2)) * 2.0 - Math.PI / 2) * 180.0 / Math.PI
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (py, se) => {
      val y2 = ctx.freshName("y2")
      s"""double $y2 = (1.0 - $py / $se * 2.0) * java.lang.Math.PI;
         |${ev.value} = (java.lang.Math.atan(java.lang.Math.exp($y2)) * 2.0 - java.lang.Math.PI / 2) * 180.0 / java.lang.Math.PI;
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object MercatorExpressions {
  // SQL literals arrive as decimals/ints; cast every argument to double
  // at build time (dataType cannot be inspected pre-resolution; the
  // optimizer folds the no-op double→double cast away).
  private def dbl(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e, DoubleType)

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_mercator_x" -> (es => MercatorX(dbl(es(0)), dbl(es(1)))),
    "graft_mercator_y" -> (es => MercatorY(dbl(es(0)), dbl(es(1)))),
    "graft_mercator_inv_x" -> (es => MercatorInvX(dbl(es(0)), dbl(es(1)))),
    "graft_mercator_inv_y" -> (es => MercatorInvY(dbl(es(0)), dbl(es(1)))))

  /** Register on an existing session (temp functions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** Session extension wiring (`--conf
  * spark.sql.extensions=graft.plans.GraftExtensions`): permanent SQL
  * registration of the projection expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    (MercatorExpressions.all ++ SimilarityExpressions.all ++ TextExpressions.all).foreach {
      case (name, builder) =>
        e.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo(classOf[MercatorX].getName, name),
          builder))
    }
}
