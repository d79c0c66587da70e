package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingling: distinct k-shingles of lowercase [a-z] word
  * runs, in one pass over the string.
  *
  * Semantics are EXACTLY `array_distinct(k-grams of
  * regexp_extract_all(lower(text), '[a-z]+'))` — lowercasing uses the
  * same UTF8String.toLowerCase as the `lower` function, and "word" is
  * a maximal run of post-lowercase 'a'..'z' bytes, which is precisely
  * what the regex extracts. The composed form walks the interpreted
  * higher-order-function machinery (split + 2×zip_with + compact +
  * distinct, each allocating); this is one JVM loop. CodegenFallback:
  * the surrounding stage still whole-stage-codegens and calls into
  * eval — the win is the fused loop, not codegen of the loop itself.
  *
  * k must be a foldable positive int.
  */
case class WordShingles(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = WordShingles.name

  override def checkInputDataTypes(): TypeCheckResult =
    if (!(left.dataType == StringType && right.dataType == IntegerType && right.foldable))
      TypeCheckResult.TypeCheckFailure(
        s"${WordShingles.name} expects (string, foldable int)")
    else right.eval(null) match {
      // resolve-time rejection: a null k would unbox to 0 and k <= 0 would
      // silently yield a single empty shingle per row instead of failing.
      case kk: Int if kk > 0 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"${WordShingles.name} expects k to be a non-null int > 0, got $other")
    }

  @transient private lazy val k: Int =
    right.eval(null).asInstanceOf[Int]

  override def nullSafeEval(text: Any, kAny: Any): Any = {
    val lowered = text.asInstanceOf[UTF8String].toLowerCase.toString
    // tokenize: maximal runs of 'a'..'z'
    val words = mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = lowered.length
    while (i < n) {
      val c = lowered.charAt(i)
      if (c >= 'a' && c <= 'z') {
        var j = i + 1
        while (j < n && lowered.charAt(j) >= 'a' && lowered.charAt(j) <= 'z') j += 1
        words += lowered.substring(i, j)
        i = j
      } else i += 1
    }
    if (words.length < k) new GenericArrayData(Array.empty[Any])
    else {
      val seen = mutable.LinkedHashSet.empty[String] // first-occurrence order
      val sb = new java.lang.StringBuilder
      var s = 0
      while (s <= words.length - k) {
        sb.setLength(0)
        var t = 0
        while (t < k) {
          if (t > 0) sb.append(' ')
          sb.append(words(s + t))
          t += 1
        }
        seen += sb.toString
        s += 1
      }
      new GenericArrayData(seen.iterator.map(x => UTF8String.fromString(x): Any).toArray)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}

object WordShingles {
  val name = "word_shingles"

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(classOf[WordShingles].getName, name),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, s"$name takes 2 arguments, got ${exprs.length}")
      WordShingles(exprs.head, exprs(1))
    })
}

object TextExpressions {
  /** Distinct k-shingles of [a-z] word runs, fused native loop. */
  def wordShingles(text: Column, k: Int): Column =
    call_function(WordShingles.name, text, org.apache.spark.sql.functions.lit(k))
}
