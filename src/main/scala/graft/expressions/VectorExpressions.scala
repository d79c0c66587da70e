package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path: float-array
  * dot product in double precision.
  *
  * The composed form (`aggregate(zip_with(a, b, (x, y) => x*y), …)`)
  * is correct but interpreted — higher-order functions don't codegen,
  * and each evaluation allocates an intermediate product array. This
  * expression emits a tight fused loop via doGenCode (inside the
  * whole-stage-codegen span), reading both arrays' primitive storage
  * directly: no allocation, no boxing. Accumulation order is index
  * 0..n-1 with floats widened to double — bit-identical to the
  * composed form, INCLUDING null semantics: unequal lengths yield NULL
  * (zip_with pads with null, null products nullify the sum) and a null
  * element on either side yields NULL (null propagates through the
  * aggregate's `+`).
  *
  * Registered through the PUBLIC extension point
  * ([[graft.GraftExtensions]] → `SparkSessionExtensions.injectFunction`)
  * and invoked via `call_function`, so no `private[sql]` API is used.
  */
case class DotProductFloat(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null even on non-null inputs (length mismatch / null elements)
  override def nullable: Boolean = true
  override def prettyName: String = DotProductFloat.name

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${DotProductFloat.name} expects (array<float>, array<float>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

object DotProductFloat {
  val name = "dot_product_float"

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(classOf[DotProductFloat].getName, name),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, s"$name takes 2 arguments, got ${exprs.length}")
      DotProductFloat(exprs.head, exprs(1))
    })
}

/** All `tables`×`planes` LSH sign-bucket keys of a vector in ONE fused
  * pass — the multi-probe bucketing's per-row hot path.
  *
  * The composed form builds 16·tables `when(dot_product_float(v, h)>=0)`
  * branches, each over a 64-literal array — an expression tree of ~8k
  * nodes whose per-row interpreted evaluation dominated the 10×-scale
  * bench (~1.3 ms/row). Here the ±1 hyperplane matrix (md5-parity
  * constants, identical values to [[graft.operators.Similarity
  * .hyperplane]]) is materialized ONCE per operator instance and each
  * row does tables·planes·dims fused multiply-adds.
  *
  * Key format matches the composed form: "table:bitstring" with
  * bit '1' iff dot >= 0. Parity details: a vector whose length differs
  * from `dims`, or with a null element, gets bit '0' (the composed
  * form's NULL dot falls into `otherwise("0")`); a NULL vector yields
  * NULL (the row leaves the pipeline at the explode — a null vector
  * can never be a near-duplicate of anything).
  */
case class SignBucketKeys(vec: Expression, tables: Expression,
                          planes: Expression, dims: Expression)
  extends Expression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(vec, tables, planes, dims)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = SignBucketKeys.name

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    def lit(e: Expression, what: String): Either[String, Int] =
      if (e.dataType != org.apache.spark.sql.types.IntegerType || !e.foldable)
        Left(s"$what must be a foldable int")
      else e.eval(null) match {
        case i: Int if i > 0 => Right(i)
        case other => Left(s"$what must be a non-null int > 0, got $other")
      }
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"${SignBucketKeys.name} expects array<float> vector, got ${vec.dataType.simpleString}")
    else (for {
      t <- lit(tables, "tables")
      p <- lit(planes, "planes")
      _ <- lit(dims, "dims")
      _ <- if (t.toLong * p <= 4096L) Right(())
           else Left(s"tables*planes too large: ${t.toLong * p}")
    } yield ()) match {
      case Right(_) => TypeCheckResult.TypeCheckSuccess
      case Left(msg) => TypeCheckResult.TypeCheckFailure(s"${SignBucketKeys.name}: $msg")
    }
  }

  @transient private lazy val nTables: Int = tables.eval(null).asInstanceOf[Int]
  @transient private lazy val nPlanes: Int = planes.eval(null).asInstanceOf[Int]
  @transient private lazy val nDims: Int = dims.eval(null).asInstanceOf[Int]

  /** ±1 hyperplane matrix, from the ONE canonical derivation
    * ([[SignBucketKeys.hyperplane]] — `Similarity.hyperplane`
    * delegates to the same function). */
  @transient private lazy val matrix: Array[Array[Float]] =
    Array.tabulate(nTables * nPlanes)(plane =>
      SignBucketKeys.hyperplane(plane, nDims).map(_.toFloat).toArray)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    // length mismatch or null element → NULL dot → bit '0' (composed-form parity)
    var hasNull = false
    val doubles = new Array[Double](n)
    var i = 0
    while (i < n && !hasNull) {
      if (x.isNullAt(i)) hasNull = true else doubles(i) = x.getFloat(i).toDouble
      i += 1
    }
    val degenerate = hasNull || n != nDims
    val keys = new Array[Any](nTables)
    var l = 0
    while (l < nTables) {
      val sb = new java.lang.StringBuilder(nPlanes + 4)
      sb.append(l).append(':')
      var p = 0
      while (p < nPlanes) {
        if (degenerate) sb.append('0')
        else {
          val h = matrix(l * nPlanes + p)
          var sum = 0.0
          var j = 0
          while (j < nDims) { sum += doubles(j) * h(j); j += 1 }
          sb.append(if (sum >= 0) '1' else '0')
        }
        p += 1
      }
      keys(l) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      l += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SignBucketKeys =
    copy(vec = newChildren(0), tables = newChildren(1),
      planes = newChildren(2), dims = newChildren(3))
}

object SignBucketKeys {
  val name = "sign_bucket_keys"

  /** Canonical fixed ±1 hyperplane: sign from md5 parity of
    * "plane:dim". THE single source of the constant recipe — the
    * operator layer (`Similarity.hyperplane`) and this expression's
    * matrix must agree bit-for-bit for the LSH oracles to hold. */
  def hyperplane(plane: Int, dims: Int): Seq[Double] =
    (0 until dims).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$plane:$i".getBytes("UTF-8"))
      if ((md(0) & 1) == 0) 1.0 else -1.0
    }

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(classOf[SignBucketKeys].getName, name),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 4, s"$name takes 4 arguments, got ${exprs.length}")
      SignBucketKeys(exprs(0), exprs(1), exprs(2), exprs(3))
    })
}

object VectorExpressions {
  /** Column wrapper: dot(a, b) in double, fused-loop codegen. Requires
    * [[graft.GraftExtensions]] on the session (all engine entry points
    * install it). */
  def dotF(a: Column, b: Column): Column =
    call_function(DotProductFloat.name, a, b)

  /** Column wrapper: all multi-probe sign-bucket keys of a vector
    * ("l:bits" strings), one fused pass. */
  def signBucketKeysF(vec: Column, tables: Int, planes: Int, dims: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(SignBucketKeys.name, vec, lit(tables), lit(planes), lit(dims))
  }
}
