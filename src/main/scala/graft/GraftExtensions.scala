package graft

import graft.expressions.{BloomBuildAgg, BloomContains, BpeEncode, BpeEncodeBytes, BytePreTok, CmsBuildAgg, CmsQuery, FnvNgrams, HammingDist, NearestCentroid, NearestCentroidDbl, PqAdc, PqEncode, QuantizedDot, TopKBy, UnigramEncode, UnigramEncodeBytes, WhtHash, WordPieceEncode}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: registers graft's native expressions.
  *
  * Declarative route (production):
  *   `spark.sql.extensions=graft.GraftExtensions`
  * Imperative route (defensive, idempotent — for sessions the harness
  * does not build, e.g. a driver-owned session): `GraftFunctions.ensure`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.quantizedDot)
    ext.injectFunction(GraftFunctions.hammingDist)
    ext.injectFunction(GraftFunctions.topKBy)
    ext.injectFunction(GraftFunctions.bloomBuild)
    ext.injectFunction(GraftFunctions.bloomContains)
    ext.injectFunction(GraftFunctions.cmsBuild)
    ext.injectFunction(GraftFunctions.cmsQuery)
    ext.injectFunction(GraftFunctions.pqEncode)
    ext.injectFunction(GraftFunctions.pqAdc)
    ext.injectFunction(GraftFunctions.nearestCentroid)
    ext.injectFunction(GraftFunctions.nearestCentroidDbl)
    ext.injectFunction(GraftFunctions.bpeEncode)
    ext.injectFunction(GraftFunctions.bpeEncodeBytes)
    ext.injectFunction(GraftFunctions.bytePreTok)
    ext.injectFunction(GraftFunctions.unigramEncode)
    ext.injectFunction(GraftFunctions.unigramEncodeBytes)
    ext.injectFunction(GraftFunctions.wordpieceEncode)
    ext.injectFunction(GraftFunctions.whtHash)
    ext.injectFunction(GraftFunctions.fnvNgrams)
    // auto-vectorization: the built-in aggregate(zip_with(...)) dot
    // spelling becomes the native codegen'd expression
    ext.injectOptimizerRule(_ => graft.rules.DotProductRewrite)
  }
}

object GraftFunctions {
  val quantizedDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("quantized_dot"),
    new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"quantized_dot expects 2 arguments, got ${children.size}")
      QuantizedDot(children.head, children(1))
    })

  val hammingDist: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hamming_dist"),
    new ExpressionInfo(classOf[HammingDist].getName, "hamming_dist"),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"hamming_dist expects 2 arguments, got ${children.size}")
      HammingDist(children.head, children(1))
    })

  val topKBy: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("top_k_by"),
    new ExpressionInfo(classOf[TopKBy].getName, "top_k_by"),
    (children: Seq[Expression]) => {
      require(children.size == 3, s"top_k_by expects 3 arguments, got ${children.size}")
      TopKBy(children.head, children(1), children(2))
    })

  val bloomBuild: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_build"),
    new ExpressionInfo(classOf[BloomBuildAgg].getName, "bloom_build"),
    (children: Seq[Expression]) => {
      require(children.size == 3, s"bloom_build expects 3 arguments, got ${children.size}")
      BloomBuildAgg(children.head, children(1), children(2))
    })

  val bloomContains: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_contains"),
    new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"bloom_contains expects 2 arguments, got ${children.size}")
      BloomContains(children.head, children(1))
    })

  val cmsBuild: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cms_build"),
    new ExpressionInfo(classOf[CmsBuildAgg].getName, "cms_build"),
    (children: Seq[Expression]) => {
      require(children.size == 3, s"cms_build expects 3 arguments, got ${children.size}")
      CmsBuildAgg(children.head, children(1), children(2))
    })

  val cmsQuery: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cms_query"),
    new ExpressionInfo(classOf[CmsQuery].getName, "cms_query"),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"cms_query expects 2 arguments, got ${children.size}")
      CmsQuery(children.head, children(1))
    })

  val pqEncode: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_encode"),
    new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
    (children: Seq[Expression]) => {
      require(children.size == 3, s"pq_encode expects 3 arguments, got ${children.size}")
      PqEncode(children.head, children(1), children(2))
    })

  val pqAdc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_adc"),
    new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"pq_adc expects 2 arguments, got ${children.size}")
      PqAdc(children.head, children(1))
    })

  val nearestCentroid: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nearest_centroid"),
    new ExpressionInfo(classOf[NearestCentroid].getName, "nearest_centroid"),
    (children: Seq[Expression]) => {
      require(children.size == 4, s"nearest_centroid expects 4 arguments, got ${children.size}")
      NearestCentroid(children.head, children(1), children(2), children(3))
    })

  val nearestCentroidDbl: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nearest_centroid_dbl"),
    new ExpressionInfo(classOf[NearestCentroidDbl].getName, "nearest_centroid_dbl"),
    (children: Seq[Expression]) => {
      require(children.size == 4, s"nearest_centroid_dbl expects 4 arguments, got ${children.size}")
      NearestCentroidDbl(children.head, children(1), children(2), children(3))
    })

  val bpeEncode: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bpe_encode"),
    new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"bpe_encode expects 2 arguments, got ${children.size}")
      BpeEncode(children.head, children(1))
    })

  val bpeEncodeBytes: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bpe_encode_bytes"),
    new ExpressionInfo(classOf[BpeEncodeBytes].getName, "bpe_encode_bytes"),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"bpe_encode_bytes expects 2 arguments, got ${children.size}")
      BpeEncodeBytes(children.head, children(1))
    })

  val bytePreTok: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("byte_pretok"),
    new ExpressionInfo(classOf[BytePreTok].getName, "byte_pretok"),
    (children: Seq[Expression]) => {
      require(children.size == 1, s"byte_pretok expects 1 argument, got ${children.size}")
      BytePreTok(children.head)
    })

  val unigramEncode: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("unigram_encode"),
    new ExpressionInfo(classOf[UnigramEncode].getName, "unigram_encode"),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"unigram_encode expects 2 arguments, got ${children.size}")
      UnigramEncode(children.head, children(1))
    })

  val unigramEncodeBytes: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("unigram_encode_bytes"),
    new ExpressionInfo(classOf[UnigramEncodeBytes].getName, "unigram_encode_bytes"),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"unigram_encode_bytes expects 2 arguments, got ${children.size}")
      UnigramEncodeBytes(children.head, children(1))
    })

  val wordpieceEncode: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("wordpiece_encode"),
    new ExpressionInfo(classOf[WordPieceEncode].getName, "wordpiece_encode"),
    (children: Seq[Expression]) => {
      require(children.size == 2, s"wordpiece_encode expects 2 arguments, got ${children.size}")
      WordPieceEncode(children.head, children(1))
    })

  val whtHash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("wht_hash"),
    new ExpressionInfo(classOf[WhtHash].getName, "wht_hash"),
    (children: Seq[Expression]) => {
      require(children.size == 1, s"wht_hash expects 1 argument, got ${children.size}")
      WhtHash(children.head)
    })

  val fnvNgrams: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("fnv_ngrams"),
    new ExpressionInfo(classOf[FnvNgrams].getName, "fnv_ngrams"),
    (children: Seq[Expression]) => {
      require(children.size == 3, s"fnv_ngrams expects 3 arguments, got ${children.size}")
      FnvNgrams(children.head, children(1), children(2))
    })

  /** Register on an existing session (no-op if already present). */
  def ensure(spark: SparkSession): Unit =
    Seq(quantizedDot, hammingDist, topKBy, bloomBuild, bloomContains, cmsBuild, cmsQuery,
        pqEncode, pqAdc, nearestCentroid, nearestCentroidDbl, bpeEncode,
        bpeEncodeBytes, bytePreTok, unigramEncode, unigramEncodeBytes,
        wordpieceEncode, whtHash, fnvNgrams).foreach { case (ident, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(ident))
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
