package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the LLM-pipeline operators (SURVEY.md
 * §7.5). Each generates a single static call into [[TextHash]], so they
 * stay inside whole-stage codegen — no UDF/serialization overhead in the
 * 100 TB hot path.
 */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 needs a string column, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    TextHash.fingerprint64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.TextHash.fingerprint64($c)")
  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 needs array<string>, got ${other.sql}")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.TextHash.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  private def isLong: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _ if numHashes < 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash needs numHashes >= 1, got $numHashes")
      case ArrayType(_: StringType, _) | ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash needs array<string> or array<long> (pre-hashed), got ${other.sql}")
    }
  override protected def nullSafeEval(input: Any): Any =
    if (isLong) TextHash.minhashLongs(input.asInstanceOf[ArrayData], numHashes, seed)
    else TextHash.minhash(input.asInstanceOf[ArrayData], numHashes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isLong) "minhashLongs" else "minhash"
    defineCodeGen(ctx, ev, c => s"graft.ext.TextHash.$fn($c, $numHashes, ${seed}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Sorted distinct hashed word n-gram shingles of a string column —
 *  see [[TextHash.hashedShingles]]. */
case class HashedShingles(child: Expression, n: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (n < 1) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles needs n >= 1, got $n") // n=0 would hash every doc to [seed]
    else if (child.dataType.isInstanceOf[StringType]) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles needs a string column, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    TextHash.hashedShingles(input.asInstanceOf[UTF8String], n, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.TextHash.hashedShingles($c, $n, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

/** One hash per n-token window in document order (no dedup) — the
 *  occurrence-mining sibling of [[HashedShingles]]; see
 *  [[TextHash.positionalGramHashes]]. */
case class PositionalGramHashes(child: Expression, n: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (n < 1) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"positional_gram_hashes needs n >= 1, got $n")
    else if (child.dataType.isInstanceOf[StringType]) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"positional_gram_hashes needs a string column, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    TextHash.positionalGramHashes(input.asInstanceOf[UTF8String], n, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.TextHash.positionalGramHashes($c, $n, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): PositionalGramHashes =
    copy(child = newChild)
}

/** Count of code points matching `[^\p{L}\p{N}\s]` — the punctuation
 *  numerator of [[TextAnalysis.punctRatio]]; see [[TextHash.punctCount]].
 *  Counting kernel, never rewrites the string. */
case class PunctCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"punct_count needs a string column, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    TextHash.punctCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.TextHash.punctCount($c)")
  override protected def withNewChildInternal(newChild: Expression): PunctCount =
    copy(child = newChild)
}

/** `size(split(s, " "))` as a zero-allocation byte scan — the token
 *  count of the single-space tokenizer (empty tokens included). */
case class SpaceTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"space_token_count needs a string column, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    TextHash.spaceTokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.TextHash.spaceTokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): SpaceTokenCount =
    copy(child = newChild)
}

/** Number of single-space tokens equal to one of `stopwords` — the
 *  numerator of [[TextAnalysis.stopwordRatio]]. The stopword table rides
 *  the expression as a codegen reference object (byte[][]); comparison
 *  is exact (length-first, then bytes). */
case class StopwordHits(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  @transient private lazy val table: Array[Array[Byte]] =
    stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (stopwords.isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "stopword_hits needs a non-empty stopword list")
    else if (child.dataType.isInstanceOf[StringType]) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"stopword_hits needs a string column, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    TextHash.stopwordHits(input.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwords", table, "byte[][]")
    defineCodeGen(ctx, ev, c => s"graft.ext.TextHash.stopwordHits($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

/** Cosine similarity over array<float> or array<double>, computed in
 *  double precision. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
          (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity needs two array<float> or two array<double>, got ${l.sql} / ${r.sql}")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isFloat) TextHash.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else TextHash.cosineD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "cosineF" else "cosineD"
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.TextHash.$fn($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Symmetric int8 scalar quantization codes (binary) for an
 *  array<float> / array<double> embedding — [[TextHash.int8CodesF]]. */
case class Int8Codes(child: Expression) extends UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"int8_codes needs array<float> or array<double>, got ${t.sql}")
    }
  override protected def nullSafeEval(v: Any): Any =
    if (isFloat) TextHash.int8CodesF(v.asInstanceOf[ArrayData])
    else TextHash.int8CodesD(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "int8CodesF" else "int8CodesD"
    defineCodeGen(ctx, ev, v => s"graft.ext.TextHash.$fn($v)")
  }
  override protected def withNewChildInternal(c: Expression): Int8Codes = copy(child = c)
}

/** Cosine similarity of two int8 code columns (binary) — the pure
 *  integer kernel of quantized ANN ([[TextHash.int8Cosine]]; the
 *  per-vector scales cancel, so no scale column travels with the
 *  codes). */
case class Int8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"int8_cosine needs two binary code columns, got ${l.sql} / ${r.sql}")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.int8Cosine(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.TextHash.int8Cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int8Cosine =
    copy(left = l, right = r)
}

/** Intersection size of two ASC-sorted array<string> or array<long>
 *  columns (merge scan, set semantics) — the codegen-friendly
 *  similarity-join verifier. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StringType, _), ArrayType(_: StringType, _)) |
          (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs two array<string> or two array<long>, got ${l.sql} / ${r.sql}")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isLong) TextHash.sortedIntersectCountLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else TextHash.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isLong) "sortedIntersectCountLong" else "sortedIntersectCount"
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.TextHash.$fn($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** The `nProbe` nearest IVF centroid indices (descending dot product) of
 *  an array<float> embedding — the coarse-quantizer assignment for IVF
 *  ANN ([[graft.ext.Similarity.ivfTopK]]). The centroid matrix rides the
 *  expression as a codegen reference object: one static kernel call per
 *  row, no UDF, no per-row broadcast lookup. */
case class NearestLists(child: Expression, centroids: Array[Array[Float]], nProbe: Int)
    extends UnaryExpression {
  // case-class equality on Array fields is REFERENCE equality, which
  // breaks canonicalization/subexpression elimination for equal-but-
  // distinct centroid matrices — compare content instead
  override def equals(other: Any): Boolean = other match {
    case o: NearestLists =>
      child == o.child && nProbe == o.nProbe &&
        java.util.Arrays.deepEquals(
          centroids.asInstanceOf[Array[AnyRef]], o.centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(nProbe),
      Integer.valueOf(java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_lists needs array<float>, got ${other.sql}")
    }
  override protected def nullSafeEval(input: Any): Any =
    VecKernels.nearestLists(input.asInstanceOf[ArrayData], centroids, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "float[][]")
    defineCodeGen(ctx, ev, c => s"graft.ext.VecKernels.nearestLists($c, $ref, $nProbe)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestLists =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket id for an array<float> embedding. */
case class HyperplaneBucket(child: Expression, planes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _ if planes < 1 || planes > 64 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bucket needs planes in 1..64, got $planes")
      case ArrayType(FloatType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bucket needs array<float>, got ${other.sql}")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.hyperplaneBucketF(input.asInstanceOf[ArrayData], planes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.TextHash.hyperplaneBucketF($c, $planes, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** Shared deep content equality/hash for the PQ expressions' embedded
 *  quantizer state (case-class equality on nested Arrays is reference
 *  equality, which breaks canonicalization — compare content). */
private[ext] object PqState {
  def eq2(a: Array[Array[Float]], b: Array[Array[Float]]): Boolean =
    java.util.Arrays.deepEquals(a.asInstanceOf[Array[AnyRef]], b.asInstanceOf[Array[AnyRef]])
  def eq3(a: Array[Array[Array[Float]]], b: Array[Array[Array[Float]]]): Boolean =
    java.util.Arrays.deepEquals(a.asInstanceOf[Array[AnyRef]], b.asInstanceOf[Array[AnyRef]])
  def hash2(a: Array[Array[Float]]): Int =
    java.util.Arrays.deepHashCode(a.asInstanceOf[Array[AnyRef]])
  def hash3(a: Array[Array[Array[Float]]]): Int =
    java.util.Arrays.deepHashCode(a.asInstanceOf[Array[AnyRef]])
}

/** Residual product-quantization codes (binary, one unsigned byte per
 *  subspace) for an array<float> embedding already assigned to coarse
 *  list `list` — [[VecKernels.pqEncode]], the IVF-PQ storage kernel. */
case class PqEncode(
    left: Expression,
    right: Expression,
    cents: Array[Array[Float]],
    books: Array[Array[Array[Float]]]) extends BinaryExpression {
  override def equals(other: Any): Boolean = other match {
    case o: PqEncode =>
      left == o.left && right == o.right &&
        PqState.eq2(cents, o.cents) && PqState.eq3(books, o.books)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(left, right,
    Integer.valueOf(PqState.hash2(cents)), Integer.valueOf(PqState.hash3(books)))
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode needs (array<float>, int), got ${l.sql} / ${r.sql}")
    }
  override protected def nullSafeEval(v: Any, list: Any): Any =
    VecKernels.pqEncode(v.asInstanceOf[ArrayData], list.asInstanceOf[Int], cents, books)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCents", cents, "float[][]")
    val bRef = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    defineCodeGen(ctx, ev, (v, l) => s"graft.ext.VecKernels.pqEncode($v, $l, $cRef, $bRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(left = l, right = r)
}

/** Per-(query, probed list) ADC lookup table (array<double>, M·ksub
 *  entries + one coarse-centroid bias slot) — [[VecKernels.pqLut]]. */
case class PqLut(
    left: Expression,
    right: Expression,
    cents: Array[Array[Float]],
    books: Array[Array[Array[Float]]]) extends BinaryExpression {
  override def equals(other: Any): Boolean = other match {
    case o: PqLut =>
      left == o.left && right == o.right &&
        PqState.eq2(cents, o.cents) && PqState.eq3(books, o.books)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(left, right,
    Integer.valueOf(PqState.hash2(cents)), Integer.valueOf(PqState.hash3(books)))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_lut needs (array<float>, int), got ${l.sql} / ${r.sql}")
    }
  override protected def nullSafeEval(v: Any, list: Any): Any =
    VecKernels.pqLut(v.asInstanceOf[ArrayData], list.asInstanceOf[Int], cents, books)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCents", cents, "float[][]")
    val bRef = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    defineCodeGen(ctx, ev, (v, l) => s"graft.ext.VecKernels.pqLut($v, $l, $cRef, $bRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqLut =
    copy(left = l, right = r)
}

/** Approximate inner product of a [[PqLut]] table against a [[PqEncode]]
 *  code column: bias + M table lookups, O(M) per candidate — the ADC
 *  scoring kernel of IVF-PQ ([[VecKernels.pqAdc]]). */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs (array<double> lut, binary codes), got ${l.sql} / ${r.sql}")
    }
  override protected def nullSafeEval(lut: Any, codes: Any): Any =
    VecKernels.pqAdc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.VecKernels.pqAdc($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

/** Byte-level BPE tokenization of a document against a compiled merges
 *  table ([[Bpe]]): array of piece ids, one map-side pass per document
 *  inside whole-stage codegen — no tokenizer service, no join, no
 *  shuffle. The table ships as one referenced object; expressions
 *  compare by the merges list so plan dedup still works. */
case class BpeEncode(
    child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {
  @transient private lazy val table: Bpe.Table = Bpe.compile(merges)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs a string column, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    Bpe.encodeDocData(input.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeTable", table, classOf[Bpe.Table].getName)
    defineCodeGen(ctx, ev, c => s"graft.ext.Bpe.encodeDocData($c, $tRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** A string column's UTF-8 bytes as base BPE piece ids 0–255
 *  ([[Bpe.utf8Ids]]) — the byte-level starting state of both BPE
 *  inference and training. */
case class Utf8Bytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"utf8_bytes needs a string column, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    Bpe.utf8Ids(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.Bpe.utf8Ids($c)")
  override protected def withNewChildInternal(newChild: Expression): Utf8Bytes =
    copy(child = newChild)
}

/** One BPE training round's merge application over an `array<int>`
 *  piece-id column ([[Bpe.applyMerge]]): every left-to-right
 *  non-overlapping `(left, right)` adjacency becomes `mergedId`. Runs
 *  map-side in whole-stage codegen over [[BpeTrain]]'s word-type
 *  table — the per-round corpus rewrite is a projection, not a join. */
case class BpeApplyMerge(
    child: Expression,
    left: Int,
    right: Int,
    mergedId: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_apply_merge needs an array<int> column, got ${t.sql}")
    }
  override protected def nullSafeEval(input: Any): Any =
    Bpe.applyMergeData(input.asInstanceOf[ArrayData], left, right, mergedId)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ext.Bpe.applyMergeData($c, $left, $right, $mergedId)")
  override protected def withNewChildInternal(newChild: Expression): BpeApplyMerge =
    copy(child = newChild)
}

/** [[BpeEncode]] with the merges given directly as piece-ID pairs (the
 *  lossless form [[BpeTrain.train]] produces — [[Bpe.compileIds]]);
 *  byte-exact for vocabularies whose pieces are not valid UTF-8. */
case class BpeEncodeIds(
    child: Expression,
    merges: Seq[(Int, Int)]) extends UnaryExpression {
  @transient private lazy val table: Bpe.Table = Bpe.compileIds(merges)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_ids needs a string column, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    Bpe.encodeDocData(input.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeTable", table, classOf[Bpe.Table].getName)
    defineCodeGen(ctx, ev, c => s"graft.ext.Bpe.encodeDocData($c, $tRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}

/** Σ weight(token) of a document against a hashed vocabulary shipped as
 *  sorted parallel arrays — the linear-classifier inference kernel
 *  ([[TextHash.tokenWeightSum]]): one binary search per token, zero
 *  allocation, whole-stage codegen. */
case class TokenWeightSum(
    child: Expression,
    hashes: Array[Long],
    weights: Array[Double],
    seed: Long) extends UnaryExpression {
  override def equals(other: Any): Boolean = other match {
    case o: TokenWeightSum =>
      child == o.child && seed == o.seed &&
        java.util.Arrays.equals(hashes, o.hashes) &&
        java.util.Arrays.equals(weights, o.weights)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    java.lang.Long.valueOf(seed),
    Integer.valueOf(java.util.Arrays.hashCode(hashes)),
    Integer.valueOf(java.util.Arrays.hashCode(weights)))
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"token_weight_sum needs a string column, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    TextHash.tokenWeightSum(input.asInstanceOf[UTF8String], hashes, weights, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hRef = ctx.addReferenceObj("vocabHashes", hashes, "long[]")
    val wRef = ctx.addReferenceObj("vocabWeights", weights, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.ext.TextHash.tokenWeightSum($c, $hRef, $wRef, ${seed}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): TokenWeightSum =
    copy(child = newChild)
}

/** Johnson–Lindenstrauss random projection to `outDim` dimensions with
 *  the derived Rademacher sign matrix ([[TextHash.randomProjectF]] —
 *  the kernel of [[Similarity.randomProjection]]): one static call per
 *  row inside whole-stage codegen. The equivalent higher-order-function
 *  form (`transform`/`zip_with`/`aggregate`) pays an interpreted lambda
 *  invocation per sign-matrix ENTRY — outDim·dim boxed calls per row in
 *  the 100 TB hot path. Arithmetic is bit-identical to the HOF form
 *  (and to the q74 oracle's replay): portable BIGINT sign derivation,
 *  left-to-right double accumulation, 1/√outDim scale. */
case class RandomProject(child: Expression, outDim: Int, salt: Long, stride: Long)
    extends UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _ if outDim < 1 || outDim > 4096 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"random_projection: outDim $outDim not in [1, 4096]")
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"random_projection needs array<float> or array<double>, got ${t.sql}")
    }
  override protected def nullSafeEval(v: Any): Any =
    if (isFloat) TextHash.randomProjectF(v.asInstanceOf[ArrayData], outDim, salt, stride)
    else TextHash.randomProjectD(v.asInstanceOf[ArrayData], outDim, salt, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "randomProjectF" else "randomProjectD"
    defineCodeGen(ctx, ev, v => s"graft.ext.TextHash.$fn($v, $outDim, ${salt}L, ${stride}L)")
  }
  override protected def withNewChildInternal(c: Expression): RandomProject =
    copy(child = c)
}
