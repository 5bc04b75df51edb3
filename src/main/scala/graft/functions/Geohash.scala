package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geohash base-32 encoding as pure builtin column expressions
  * (public-knowledge algorithm: alternating lon/lat binary
  * subdivision, MSB-first, lon first; base-32 alphabet without
  * a/i/l/o). Everything is exactly-rounded IEEE arithmetic + integer
  * bit shuffling — no libm — so the encoding is bit-identical across
  * engines, and [[encodeSql]] emits the same expression shapes for
  * the DuckDB oracle from the SAME unrolled loop (single source of
  * truth; the [[graft.operators.ZOrder]] playbook).
  *
  * The geohash prefix doubles as a spatial partition key at scale:
  * `partitionBy(geohash_prefix)` gives Catalyst partition pruning for
  * box queries, same role as the engine's `tile_z5` column.
  */
object Geohash {
  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  private def bitsFor(precision: Int): (Int, Int, Int) = {
    require(precision >= 1 && precision <= 12, s"bad geohash precision $precision")
    val bits = 5 * precision
    (bits, (bits + 1) / 2, bits / 2) // (total, lon bits, lat bits)
  }

  /** Geohash string of (lon, lat) at `precision` characters. */
  def encode(lon: Column, lat: Column, precision: Int): Column = {
    val (bits, lonBits, latBits) = bitsFor(precision)
    val x = least(
      floor((lon + lit(180.0)) / lit(360.0) * lit((1L << lonBits).toDouble)).cast("long"),
      lit((1L << lonBits) - 1))
    val y = least(
      floor((lat + lit(90.0)) / lit(180.0) * lit((1L << latBits).toDouble)).cast("long"),
      lit((1L << latBits) - 1))
    val lonPart = (0 until lonBits).map(j =>
      shiftleft(shiftright(x, lonBits - 1 - j).bitwiseAND(lit(1L)), bits - 1 - 2 * j))
      .reduce(_ + _)
    val latPart = (0 until latBits).map(j =>
      shiftleft(shiftright(y, latBits - 1 - j).bitwiseAND(lit(1L)), bits - 2 - 2 * j))
      .reduce(_ + _)
    val code = lonPart + latPart
    concat((0 until precision).map { k =>
      lit(Alphabet).substr(
        (shiftright(code, 5 * (precision - 1 - k)).bitwiseAND(lit(31L)) + lit(1)).cast("int"),
        lit(1))
    }: _*)
  }

  /** The DuckDB mirror of [[encode]], generated from the same unrolled
    * loop. `lonExpr` / `latExpr` are SQL expressions for the inputs.
    */
  def encodeSql(lonExpr: String, latExpr: String, precision: Int): String = {
    val (bits, lonBits, latBits) = bitsFor(precision)
    val x = s"least(CAST(floor(($lonExpr + 180.0) / 360.0 * ${(1L << lonBits).toDouble}) AS BIGINT), ${(1L << lonBits) - 1})"
    val y = s"least(CAST(floor(($latExpr + 90.0) / 180.0 * ${(1L << latBits).toDouble}) AS BIGINT), ${(1L << latBits) - 1})"
    // every shift term fully parenthesized: SQL gives `+` a TIGHTER
    // precedence than `<<` (C-style), so unwrapped `a << k + b << m`
    // chains the shifts and overflows
    val lonPart = (0 until lonBits)
      .map(j => s"(((($x) >> ${lonBits - 1 - j}) & 1) << ${bits - 1 - 2 * j})")
      .mkString(" + ")
    val latPart = (0 until latBits)
      .map(j => s"(((($y) >> ${latBits - 1 - j}) & 1) << ${bits - 2 - 2 * j})")
      .mkString(" + ")
    val code = s"(($lonPart) + ($latPart))"
    (0 until precision)
      .map(k => s"substr('$Alphabet', CAST((($code >> ${5 * (precision - 1 - k)}) & 31) + 1 AS INT), 1)")
      .mkString(" || ")
  }
}
