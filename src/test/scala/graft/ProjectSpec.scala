package graft

import graft.ann.{Knn, Project}
import org.apache.spark.sql.functions._

class ProjectSpec extends SparkTestBase {
  import spark.implicits._

  test("planes are deterministic ±1 and disjoint from the SRP seed space") {
    val a = Project.planes(4, 8)
    val b = Project.planes(4, 8)
    assert(a.map(_.toSeq) === b.map(_.toSeq))
    assert(a.flatten.forall(v => v == 1.0f || v == -1.0f))
    // seed "p:j:i" vs SRP's "j:i": same shape, different matrix
    val srp = Knn.srpPlanes(4, 8)
    assert(a.map(_.toSeq) !== srp.map(_.toSeq))
  }

  test("projection is the signed sum: basis vectors read the plane column") {
    val ps = Project.planes(3, 4)
    val basis = (0 until 4).map { i =>
      (i.toLong, Array.tabulate(4)(d => if (d == i) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val got = Project.project(basis, "vec_id", "embedding", 4, 3)
      .select(col("vec_id"), col("proj")).as[(Long, Seq[Double])]
      .collect().sortBy(_._1)
    for (i <- 0 until 4; j <- 0 until 3)
      assert(got(i)._2(j) === ps(j)(i).toDouble,
        s"proj of basis $i, plane $j must equal the plane entry")
  }

  test("projection is linear and zero maps to zero") {
    val v = Array.tabulate(8)(i => 0.25f * (i - 3))
    val df = Seq((1L, v), (2L, v.map(_ * 2f)), (3L, Array.fill(8)(0.0f)))
      .toDF("vec_id", "embedding")
    val p = Project.project(df, "vec_id", "embedding", 8, 4)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2)
    for (j <- 0 until 4) {
      assert(math.abs(p(1)(j) - 2 * p(0)(j)) < 2e-6, "project(2x) = 2 project(x)")
      assert(p(2)(j) === 0.0)
    }
  }

  test("JL distortion: projected cosine tracks true cosine on a seeded corpus") {
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 60).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val proj = Project.project(df, "vec_id", "embedding", 64, 16)
      .as[(Long, Seq[Double])].collect().toMap
    def cosF(a: Array[Float], b: Array[Float]): Double = {
      val d = a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    def cosD(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val errs = for {
      i <- vecs.indices; j <- vecs.indices if i < j
    } yield math.abs(cosF(vecs(i)._2, vecs(j)._2) - cosD(proj(i.toLong), proj(j.toLong)))
    // 16-dim ±1 JL: sd of a cosine estimate ~ 1/sqrt(16) = 0.25. The
    // mean absolute error sits well under one sd, the bulk under two;
    // over 1770 pairs the single worst pair can reach ~4 sd (measured
    // 1.05 on this seed), so the max bound is the 5-sd safety rail.
    val sorted = errs.sorted
    assert(errs.sum / errs.size < 0.25, f"mean |cos err| ${errs.sum / errs.size}%.3f")
    assert(sorted((errs.size * 95) / 100) < 0.55,
      f"p95 |cos err| ${sorted((errs.size * 95) / 100)}%.3f")
    assert(errs.max < 1.25, f"max |cos err| ${errs.max}%.3f")
  }

  test("prefilter+rerank recovers planted near-neighbors") {
    val rnd = new scala.util.Random(7)
    // 10 well-separated centers, 8 members each: a member's true top-7
    // are its cluster mates (intra cos >> inter cos for random centers)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextFloat() - 0.5f))
    val vecs = for {
      c <- 0 until 10; m <- 0 until 8
    } yield ((c * 8 + m).toLong,
      centers(c).map(x => x + 0.05f * (rnd.nextFloat() - 0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Project.projectedRerankKnn(df, "vec_id", "embedding",
        dims = 64, outDims = 16, queryPred = col("vec_id") % 8 === 0,
        prefilterK = 21, k = 7)
      .as[(Long, Int, Long, Double)].collect()
    assert(got.length === 10 * 7)
    val hits = got.count { case (q, _, cand, _) => cand / 8 === q / 8 }
    // planted structure survives the 64->16 projection: near-perfect
    // recall of cluster mates through a 3k prefilter
    assert(hits >= 66, s"cluster-mate hits $hits / 70")
  }

  test("prefilterK below k is refused") {
    val df = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Project.projectedRerankKnn(df, "vec_id", "embedding", 2, 2,
        col("vec_id") === 1L, prefilterK = 3, k = 5)
    }
  }
}
