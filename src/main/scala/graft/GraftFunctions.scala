package graft

import org.apache.spark.sql.SparkSession

import graft.functions.Sbe

/** SQL-surface registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT sbe_decode_trade(frame) ...")` works alongside the
  * Column API — the reference's pybind11 boundary (`sbe_decoder.cpp:561-578`)
  * re-expressed as session function registration.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "sbe_decode_trade", exprs => Sbe.SbeTradeDecode(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "sbe_decode_bba", exprs => Sbe.SbeBbaDecode(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "sbe_decode_depth", exprs => Sbe.SbeDepthDecode(exprs.head), "built-in")
  }
}
