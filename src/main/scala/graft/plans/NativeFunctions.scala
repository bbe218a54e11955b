package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.RuText

/** Static JVM entry points the generated code calls (SURVEY.md §4.1's
  * optional codegen upgrade for F1/F2/E4): keeping the logic in one
  * compiled method and the codegen a thin call keeps bytecode small while
  * staying inside whole-stage codegen (the same pattern Spark's own regexp
  * expressions use).
  */
object NativeFns {
  def standardize(s: UTF8String): UTF8String = {
    val r = RuText.standardizeText(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  def cleanNumber(s: UTF8String): Integer = RuText.cleanNumber(s.toString)
  def canonicalName(s: UTF8String): UTF8String = {
    val r = RuText.canonicalInspectorName(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** Unicode NFC canonical composition (java.text.Normalizer) — the
    * ftfy-class cleanup pass a corpus pipeline runs before hashing or
    * deduping text: byte-different encodings of the SAME characters
    * (e + combining acute vs precomposed é) would otherwise defeat
    * every exact-hash operator (d01/d95/d98, the indexes). DuckDB's
    * nfc_normalize (utf8proc) implements the same canonical
    * composition, which is what lets d99 hash-gate this path. The
    * already-normalized fast path (the overwhelmingly common case)
    * returns the input UTF8String without allocating. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Sequential (index-order) double dot product over two array<double>
    * columns — bit-identical to DuckDB's list_dot_product fold and to a
    * hand-written while-loop, but callable from codegen'd expressions. */
  def vecDot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var i = 0
    var acc = 0.0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Count of positions where two equal-length array<bigint> columns
    * agree — the minhash Jaccard-estimate comparator (x components). */
  def arrayAgree(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    var i = 0
    var eq = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) eq += 1; i += 1 }
    eq
  }

  /** Intersection size of two SORTED-ascending distinct array<bigint>
    * columns via one merge scan — O(|a|+|b|) with zero allocation, vs
    * array_intersect's per-row hash-set build. The exact-verification hot
    * path of the near-dup family (d06/d19 verify ~1e5 candidate pairs x
    * ~300-element gram sets per partition). Precondition (sorted, distinct)
    * is established once per document by the gram-extraction UDFs. */
  /** ADC numerator for one (query, coded-candidate) pair: per subspace
    * s, the sequential dot of the query's subspace-s slice with the
    * codebook centroid the candidate's code selects, the subspace
    * partials folded in s order — bit-identical to the subspace-
    * decomposed oracle fold (graft.ops.Pq's d73/d74 convention).
    * `flat` is the codebook flattened at (s * kmax + code) * subDim;
    * m = |codes|, subDim = |v| / m, kmax = |flat| / (m * subDim) all
    * derive from the argument shapes, so the expression needs no
    * scalar children. The per-pair hot path of PQ retrieval: the HOF
    * formulation (aggregate over slice + element_at) is
    * CodegenFallback and allocates a slice per (pair, subspace) —
    * measured 8x slower at 4M pairs. */
  def pqAdcNum(v: ArrayData, codes: ArrayData, flat: ArrayData): Double = {
    val m = codes.numElements()
    val w = v.numElements() / m
    val kmax = flat.numElements() / (m * w)
    var acc = 0.0
    var s = 0
    while (s < m) {
      val base = (s * kmax + codes.getInt(s)) * w
      var d = 0.0
      var i = 0
      while (i < w) { d += v.getDouble(s * w + i) * flat.getDouble(base + i); i += 1 }
      acc += d
      s += 1
    }
    acc
  }

  def sortedInterCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** `vec_dot(array<double>, array<double>) -> double` as a native codegen'd
  * expression: the hot arithmetic of the similarity-search family (d07/
  * d08/d15/d17) without a Scala-UDF boundary (no per-row Seq boxing) —
  * every pairwise cosine stays inside whole-stage codegen. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects two array<double> arguments, got ${left.dataType} / ${right.dataType}")
    }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    NativeFns.vecDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.NativeFns.vecDot($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** `array_agree(array<bigint>, array<bigint>) -> int` as a native
  * codegen'd expression: position-wise agreement count, the minhash
  * estimate comparator of the similarity family (d06's candidate
  * prefilter runs it per pair — a UDF here pays two Seq boxings per
  * candidate). */
case class ArrayAgree(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"array_agree expects two array<bigint> arguments, got ${left.dataType} / ${right.dataType}")
    }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    NativeFns.arrayAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.NativeFns.arrayAgree($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayAgree =
    copy(left = l, right = r)
  override def prettyName: String = "array_agree"
}

/** `sorted_inter_count(array<bigint>, array<bigint>) -> int` as a native
  * codegen'd expression: merge-scan intersection size of two sorted
  * distinct arrays (see NativeFns.sortedInterCount). */
case class SortedInterCount(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_inter_count expects two array<bigint> arguments, got ${left.dataType} / ${right.dataType}")
    }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    NativeFns.sortedInterCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.NativeFns.sortedInterCount($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedInterCount =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_inter_count"
}

/** `pq_adc_num(array<double>, array<int>, array<double>) -> double` as a
  * native codegen'd expression: the per-pair ADC numerator of PQ
  * retrieval (see NativeFns.pqAdcNum — subspace-ordered fold, shapes
  * derived from the arguments; the third argument is the flattened
  * codebook, in practice a literal the plan carries once). */
case class PqAdcNumExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "pq_adc_num expects (array<double>, array<int>, array<double>), got " +
          s"${first.dataType} / ${second.dataType} / ${third.dataType}")
    }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    NativeFns.pqAdcNum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.plans.NativeFns.pqAdcNum($a, $b, $c);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): PqAdcNumExpr = copy(first = f, second = s, third = t)
  override def prettyName: String = "pq_adc_num"
}

/** Base for the three native text expressions: null-in → null-out, and a
  * possibly-null result for non-null input (handled in both eval paths).
  */
abstract class RuTextExpression extends UnaryExpression {
  override def nullable: Boolean = true
  protected def staticCall: String
  protected def resultJavaType: String
  protected def unbox(v: String): String

  protected def call(input: Any): Any

  override def nullSafeEval(input: Any): Any = call(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
         |$resultJavaType $r = $staticCall($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ${unbox(r)}; }
       """.stripMargin
    })
}

/** F1 `standardize_text` as a native expression (codegen'd). */
case class StandardizeText(child: Expression) extends RuTextExpression {
  override def dataType: DataType = StringType
  override protected def staticCall = "graft.plans.NativeFns.standardize"
  override protected def resultJavaType = "UTF8String"
  override protected def unbox(v: String): String = v
  override protected def call(input: Any): Any =
    NativeFns.standardize(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): StandardizeText =
    copy(child = newChild)
  override def prettyName: String = "standardize_text"
}

/** `nfc_normalize` as a native codegen'd expression (see
  * [[NativeFns.nfcNormalize]]). */
case class NfcNormalize(child: Expression) extends RuTextExpression {
  override def dataType: DataType = StringType
  override protected def staticCall = "graft.plans.NativeFns.nfcNormalize"
  override protected def resultJavaType = "UTF8String"
  override protected def unbox(v: String): String = v
  override protected def call(input: Any): Any =
    NativeFns.nfcNormalize(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

/** F2 `clean_number` as a native expression. */
case class CleanNumber(child: Expression) extends RuTextExpression {
  override def dataType: DataType = IntegerType
  override protected def staticCall = "graft.plans.NativeFns.cleanNumber"
  override protected def resultJavaType = "java.lang.Integer"
  override protected def unbox(v: String): String = s"$v.intValue()"
  override protected def call(input: Any): Any =
    NativeFns.cleanNumber(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): CleanNumber =
    copy(child = newChild)
  override def prettyName: String = "clean_number"
}

/** E4 `canonical_inspector_name` as a native expression. */
case class CanonicalInspectorName(child: Expression) extends RuTextExpression {
  override def dataType: DataType = StringType
  override protected def staticCall = "graft.plans.NativeFns.canonicalName"
  override protected def resultJavaType = "UTF8String"
  override protected def unbox(v: String): String = v
  override protected def call(input: Any): Any =
    NativeFns.canonicalName(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): CanonicalInspectorName =
    copy(child = newChild)
  override def prettyName: String = "canonical_inspector_name"
}

/** Session extension registering the native expressions under the same
  * SQL names the engine's UDF surface exposes — queries keep working, but
  * the hot path stays inside whole-stage codegen instead of crossing a
  * Scala-UDF boundary per row.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[StandardizeText].getName, null, name, usage,
        "", "", "", "misc_funcs", "1.0.0", "", "built-in")
    ext.injectFunction((FunctionIdentifier("standardize_text"),
      info("standardize_text", "pre-reform Cyrillic text normalization (reference F1)"),
      (es: Seq[Expression]) => StandardizeText(es.head)))
    ext.injectFunction((FunctionIdentifier("clean_number"),
      info("clean_number", "dash/thousands-separator tolerant int parse (reference F2)"),
      (es: Seq[Expression]) => CleanNumber(es.head)))
    ext.injectFunction((FunctionIdentifier("canonical_inspector_name"),
      info("canonical_inspector_name", "inspector-name canonicalization (reference E4)"),
      (es: Seq[Expression]) => CanonicalInspectorName(es.head)))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "sequential double dot product of two array<double> vectors"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("array_agree"),
      info("array_agree", "position-wise agreement count of two array<bigint> columns"),
      (es: Seq[Expression]) => ArrayAgree(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("sorted_inter_count"),
      info("sorted_inter_count", "merge-scan intersection size of two sorted distinct array<bigint> columns"),
      (es: Seq[Expression]) => SortedInterCount(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("pq_adc_num"),
      info("pq_adc_num", "per-pair ADC numerator against a flattened PQ codebook"),
      (es: Seq[Expression]) => PqAdcNumExpr(es(0), es(1), es(2))))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "Unicode NFC canonical composition (pre-hash text cleanup)"),
      (es: Seq[Expression]) => NfcNormalize(es.head)))
  }
}
