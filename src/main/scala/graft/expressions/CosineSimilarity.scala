package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Native Catalyst cosine-similarity over two array columns, with
  * `doGenCode` so it runs inside whole-stage codegen — the higher-order
  * `aggregate`/`zip_with` composition it replaces allocates a lambda frame
  * per element and stays interpreted, which dominates the similarity ops'
  * hot loop at dimension 64–3072 (SURVEY §2.9: reference dims 1536/3072,
  * `includes/class-embeddings.php:17-24`).
  *
  * Double-precision sequential accumulation in index order — bitwise
  * identical to the DuckDB oracle's list_transform/list_sum mirror.
  *
  * Zero-norm guard (round-11 review): a zero vector (a failed encode)
  * has no direction, and the raw formula returns 0/0 = NaN — which
  * Spark orders ABOVE every real number, so one bad row would rank as
  * the #1 neighbor in every cos-desc path and satisfy every
  * `cos >= threshold` dup test. Degenerate inputs return 0.0 instead:
  * a real value that never wins a ranking and never passes a positive
  * threshold. (The oracle mirror never sees zero vectors — the gates
  * run on generated embeddings — so oracle parity is unaffected.)
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs are coerced to array<double> by the function builder
  // ([[GraftFunctions]]) — AbstractDataType is private[sql], so the
  // ImplicitCastInputTypes route isn't open to external expressions.
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, dot, na, nb, i) = (ctx.freshName("n"), ctx.freshName("dot"),
        ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("i"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.getDouble($i);
         |  double y = $b.getDouble($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration surface for graft's native expressions: an injectable
  * [[SparkSessionExtensions]] hook (`spark.sql.extensions=graft.expressions.
  * GraftExtensions`) plus a runtime registrar for sessions built without it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    // materialized-view rewrite (no-op until a view is registered via
    // [[graft.plans.ViewRewrite.register]])
    ext.injectOptimizerRule(s => graft.plans.GraftViewRewrite(s))
  }
}

object GraftFunctions {

  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private val cosineSimDescriptor: Descriptor =
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(
        Cast(children(0), ArrayType(DoubleType)),
        Cast(children(1), ArrayType(DoubleType))))

  private val chunkGenDescriptor: Descriptor =
    (FunctionIdentifier("chunk_gen"),
      new ExpressionInfo(classOf[ChunkGenerator].getName, "chunk_gen"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "chunk_gen(text, size, overlap)")
        // chunking config is per-job: bind from foldable arguments
        def intOf(e: Expression): Int = e.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"chunk_gen size/overlap must be literal ints, got $other")
        }
        ChunkGenerator(children(0), intOf(children(1)), intOf(children(2)))
      })

  // Spark's own runtime-filter probe expression, exposed as a callable
  // function: bloom_might_contain(<serialized sketch: binary literal>,
  // <xxhash64'd key: long>). This is the codegen'd upgrade over a
  // boxed mightContainLong UDF — BloomFilterMightContain carries
  // doGenCode, deserializes the sketch once per task, and stays inside
  // whole-stage codegen (the same plan shape InjectRuntimeFilter
  // produces after its subquery executes). Used by
  // [[graft.operators.BloomJoin.prunedCodegen]].
  private val bloomMightContainDescriptor: Descriptor =
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "bloom_might_contain(sketch, value)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))
      })

  private[expressions] val descriptors: Seq[Descriptor] =
    Seq(cosineSimDescriptor, chunkGenDescriptor, bloomMightContainDescriptor)

  /** Idempotently register graft's functions into an existing session. */
  def ensureRegistered(spark: SparkSession): Unit =
    descriptors.foreach { case (id, _, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id)) {
        spark.sessionState.functionRegistry
          .createOrReplaceTempFunction(id.funcName, builder, "built-in")
      }
    }

  /** cosine_sim as a Column (requires [[ensureRegistered]] on the session). */
  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)
}
