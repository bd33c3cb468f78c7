package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Session-extension entry point: registers graft's native functions.
  *
  * Use either
  *   `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * or programmatically `GraftFunctions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("bounded_distinct"), BoundedDistinct.info,
        BoundedDistinct.builder))
    ext.injectFunction(
      (FunctionIdentifier("dot_double"), DotProduct.info,
        DotProduct.builder))
    ext.injectFunction(
      (FunctionIdentifier("bounded_top_k"), BoundedTopK.info,
        BoundedTopK.builder))
    ext.injectFunction(
      (FunctionIdentifier("minhash_sigs"), MinHashSig.info,
        MinHashSig.builder))
    ext.injectFunction(
      (FunctionIdentifier("array_top_count"), ArrayCounts.topInfo,
        ArrayCounts.topBuilder))
    ext.injectFunction(
      (FunctionIdentifier("array_distinct_count"),
        ArrayCounts.distinctInfo, ArrayCounts.distinctBuilder))
    ext.injectOptimizerRule(_ => LowerQuadraticArrayOps)
  }
}

object GraftFunctions {
  /** Imperative registration on an existing session (tests, harness). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bounded_distinct"), BoundedDistinct.info,
      BoundedDistinct.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_double"), DotProduct.info,
      DotProduct.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bounded_top_k"), BoundedTopK.info,
      BoundedTopK.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sigs"), MinHashSig.info,
      MinHashSig.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("array_top_count"), ArrayCounts.topInfo,
      ArrayCounts.topBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("array_distinct_count"), ArrayCounts.distinctInfo,
      ArrayCounts.distinctBuilder)
  }
}
