package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** The native vec_dot expression: correctness, parity with the
  * higher-order formulation (bit-identical — same summation order),
  * null handling, codegen + interpreted paths, and SQL registration.
  */
class VectorExpressionSpec extends SparkTestBase {
  import spark.implicits._

  private def hofDot = (a: String, b: String) =>
    aggregate(zip_with(col(a), col(b), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("vec_dot matches the higher-order formulation bit-for-bit") {
    val df = Seq.tabulate(50) { i =>
      (Array.tabulate(64)(j => (math.sin(i * 64 + j) * 10).toFloat),
       Array.tabulate(64)(j => (math.cos(i * 64 + j) * 10).toFloat))
    }.toDF("a", "b")
    val diffs = df.select(
        (VectorFunctions.vecDot(col("a"), col("b")) - hofDot("a", "b")).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diffs === 0.0)
  }

  test("known value and empty/null handling") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(4.0f, 5.0f, 6.0f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float])),
      (None, Some(Array(1.0f)))
    ).toDF("a", "b")
    val r = df.select(VectorFunctions.vecDot(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) === 32.0)
    assert(r(1).getDouble(0) === 0.0)
    assert(r(2).isNullAt(0))
  }

  test("interpreted path (eval) agrees with codegen") {
    val e = graft.functions.FloatVecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0f, 4.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null) === 11.0)
  }

  test("registered as a SQL function") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(2 AS FLOAT), CAST(3 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    assert(r === 9.0)
  }

  test("simhash32 and simhash32_bits registered in SQL; bits match the string form") {
    VectorFunctions.register(spark)
    val row = spark.sql(
      "SELECT simhash32(array('alpha','beta')) AS sig, simhash32_bits(array('alpha','beta')) AS sb")
      .collect()(0)
    val sig = row.getString(0)
    val sb = row.getLong(1)
    assert(sig.length == 32 && sig.forall(c => c == '0' || c == '1'))
    assert(sb == java.lang.Long.parseLong(sig, 2),
      "packed bits must equal the binary string read MSB-first")
  }

  test("all native kernels callable from SQL") {
    VectorFunctions.register(spark)
    val row = spark.sql("""
      SELECT minhash_sigs(array('alpha','beta'), 2) AS mh,
             word_shingles(array('a','b','c'), 2) AS sh,
             int8_quant_fidelity(array(CAST(1 AS FLOAT), CAST(3 AS FLOAT))) AS qf,
             kmv_jaccard(array(1L, 2L, 3L), array(2L, 3L, 9L), 4) AS kj""")
      .collect()(0)
    assert(row.getSeq[String](0).length == 2)
    assert(row.getSeq[String](1) == Seq("a b", "b c"))
    assert(row.getStruct(2).getLong(0) == 255L) // codes 0 + 255
    assert(row.getDouble(3) == 0.5) // |{2,3}| / |{1,2,3,9}|
  }

  test("kmv_jaccard stays in whole-stage codegen; malformed input fails loudly") {
    // (a) a broken doGenCode would silently fall back to interpreted
    // eval with every parity test still green — pin the codegen path
    // the way the vec_dot lock does
    val df = spark.range(100)
      .select(expr("array(id, id + 2L, id + 5L)").as("a"),
        expr("array(id + 2L, id + 5L, id + 9L)").as("b"))
      .select(graft.functions.KmvJaccard(col("a"), col("b"), 4).as("j"))
    val stages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.nonEmpty && stages.exists(_.toString.contains("kmv_jaccard")),
      "kmv_jaccard must run inside a WholeStageCodegen stage")
    assert(df.agg(sum("j")).collect()(0).getDouble(0) === 100 * 0.5,
      "u = {id, id+2, id+5, id+9}, both = {id+2, id+5} → 0.5 per row")
    // (b) the merge walk validates its sorted-distinct no-null contract
    // as it walks: ad-hoc SQL with an unsorted array must error, not
    // return a silently wrong similarity
    graft.functions.VectorFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT kmv_jaccard(array(3L, 1L, 2L), array(1L, 2L, 3L), 4)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("kmv_jaccard") && m.contains("sorted")),
      s"unsorted input must raise the contract error, got $e")
  }

  test("vec_sqdist ≡ higher-order formulation bit-for-bit, for float AND double arrays") {
    val hofSq = (a: String, b: String) =>
      aggregate(zip_with(col(a), col(b), (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }), lit(0.0), (acc, v) => acc + v)
    val f = Seq.tabulate(50) { i =>
      (Array.tabulate(64)(j => (math.sin(i * 64 + j) * 10).toFloat),
       Array.tabulate(64)(j => (math.cos(i * 64 + j) * 10).toFloat))
    }.toDF("a", "b")
    assert(f.select((VectorFunctions.vecSqDist(col("a"), col("b"))
        - hofSq("a", "b")).as("d"))
      .agg(max(abs(col("d")))).head.getDouble(0) === 0.0)
    // mixed float/double sides (the IVF-PQ residual shape)
    val m = f.select(col("a"),
      expr("transform(b, x -> cast(x as double))").as("b"))
    assert(m.select((VectorFunctions.vecSqDist(col("a"), col("b"))
        - hofSq("a", "b")).as("d"))
      .agg(max(abs(col("d")))).head.getDouble(0) === 0.0)
    // known value, null propagation, SQL registration
    val k = Seq((Some(Array(1.0f, 2.0f)), Some(Array(4.0f, 6.0f))),
      (None, Some(Array(1.0f)))).toDF("a", "b")
    val r = k.select(VectorFunctions.vecSqDist(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) === 25.0 && r(1).isNullAt(0))
    graft.functions.VectorFunctions.register(spark)
    assert(spark.sql(
      "SELECT vec_sqdist(array(cast(1 as float)), array(cast(3 as float)))")
      .head.getDouble(0) === 4.0)
  }

  test("vec_sqdist stays inside whole-stage codegen") {
    val df = spark.range(100)
      .select(expr("array(cast(id as float), cast(id+1 as float))").as("a"),
        expr("array(cast(2 as float), cast(3 as float))").as("b"))
      .select(VectorFunctions.vecSqDist(col("a"), col("b")).as("d"))
    val stages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.exists(_.toString.contains("vec_sqdist")))
  }

  test("whole-stage codegen keeps the fused dot loop (no fallback)") {
    // the plan must NOT fall back: vec_dot supports codegen, so the
    // projection stays inside a WholeStageCodegen stage (a zip_with/
    // aggregate formulation is CodegenFallback and would not)
    val df = spark.range(100)
      .select(expr("array(cast(id as float), cast(id+1 as float))").as("a"),
        expr("array(cast(2 as float), cast(3 as float))").as("b"))
      .select(VectorFunctions.vecDot(col("a"), col("b")).as("d"))
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty)
    assert(codegenStages.exists(_.toString.contains("vec_dot")))
    assert(df.agg(sum("d")).collect()(0).getDouble(0) ===
      (0 until 100).map(i => 2.0 * i + 3.0 * (i + 1)).sum)
  }
}
