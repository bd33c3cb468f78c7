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
      (FunctionIdentifier("bounded_min_k"), BoundedMinK.info,
        BoundedMinK.builder))
    ext.injectFunction(
      (FunctionIdentifier("minhash_sigs"), MinHashSig.info,
        MinHashSig.builder))
    ext.injectFunction(
      (FunctionIdentifier("array_top_count"), ArrayCounts.topInfo,
        ArrayCounts.topBuilder))
    ext.injectFunction(
      (FunctionIdentifier("array_distinct_count"),
        ArrayCounts.distinctInfo, ArrayCounts.distinctBuilder))
    ext.injectFunction(
      (FunctionIdentifier("array_entropy"), ArrayCounts.entropyInfo,
        ArrayCounts.entropyBuilder))
    ext.injectFunction(
      (FunctionIdentifier("jaccard_long"), JaccardLong.info,
        JaccardLong.builder))
    ext.injectFunction(
      (FunctionIdentifier("containment_long"), ContainmentLong.info,
        ContainmentLong.builder))
    ext.injectFunction(
      (FunctionIdentifier("latest_by"), LatestBy.info, LatestBy.builder))
    ext.injectOptimizerRule(_ => LowerQuadraticArrayOps)
  }
}

object GraftFunctions {
  /** Imperative registration on an existing session (tests, harness).
    * Registers the native functions AND activates
    * [[LowerQuadraticArrayOps]]: `sessionState.optimizer` is frozen
    * once built, but `experimental.extraOptimizations` is the supported
    * post-hoc hook and runs in the optimizer's user-rules batch — so
    * both registration paths (this and the `spark.sql.extensions`
    * conf) yield the same session behavior. The rule self-gates on
    * `spark.graft.lowerArrayOps` (see its scaladoc) for parity/debug
    * sessions that need the un-lowered HOF plan.
    */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations
        .contains(LowerQuadraticArrayOps)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LowerQuadraticArrayOps
    }
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
      FunctionIdentifier("bounded_min_k"), BoundedMinK.info,
      BoundedMinK.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sigs"), MinHashSig.info,
      MinHashSig.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("array_top_count"), ArrayCounts.topInfo,
      ArrayCounts.topBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("array_distinct_count"), ArrayCounts.distinctInfo,
      ArrayCounts.distinctBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("array_entropy"), ArrayCounts.entropyInfo,
      ArrayCounts.entropyBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("jaccard_long"), JaccardLong.info,
      JaccardLong.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("containment_long"), ContainmentLong.info,
      ContainmentLong.builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("latest_by"), LatestBy.info, LatestBy.builder)
  }
}
