package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (SURVEY.md §5.3) over scalacheck-generated
  * inputs. Samples are drawn with FIXED seeds (SURVEY §7.4.5) so runs
  * are reproducible; each property is checked on Spark DataFrames, not
  * on local collections — the distributed path is the thing under test.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = Spec.spark
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int, seed0: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed0 + i)))

  private val vocab = Vector("the", "fast", "slow", "key", "order", "sort",
    "table", "scan", "merge", "part", "window", "small", "hash", "join",
    "data", "column", "value", "row", "agg", "filter")
  private val textGen: Gen[String] =
    Gen.chooseNum(3, 30).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
      .map(_.mkString(" "))

  /** Same SELECTION as the dedup_exact key, via the rank-window
    * reference formulation (the key itself ships the map-side-folding
    * min aggregate since round 10 — this window form is the
    * independent definition the property pins against). */
  private def dedupExact(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("h").orderBy("doc_id")
    df.select(col("doc_id"), md5(lower(trim(col("text")))).as("h"),
        col("text"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "h")
  }

  test("bigramPairs equals the sliding-window reference on generated corpora") {
    // bigramPairs (zip-with-own-tail, map-side) now backs five declared
    // keys; pin it against the obvious local sliding-window definition
    // on scalacheck corpora, including whitespace-edge inputs the
    // vocab generator can't produce.
    val texts = sample(textGen, 50, 7000L) ++
      Seq("", " ", "one", "a  b", "  x y  z ")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = operators.TextOps.bigramPairs(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    val want = texts.zipWithIndex.flatMap { case (t, i) =>
      val tk = t.split(" ").filter(_.nonEmpty)
      tk.zip(tk.drop(1)).map { case (a, b) => (i.toLong, a, b) }
    }.sorted
    assert(got === want)
  }

  test("dedup_exact is idempotent and total on generated corpora") {
    val texts = sample(textGen, 60, 1000L)
    // force duplicates: every third doc repeats an earlier text
    val docs = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, if (i % 3 == 2) texts(i - 2) else t)
    }.toDF("doc_id", "text")
    val once = dedupExact(docs)
    val twice = dedupExact(once)
    assert(once.count() === twice.count())
    assert(once.except(twice).count() === 0 && twice.except(once).count() === 0)
    // every surviving text is unique, and every input text survives
    assert(once.select("text").distinct().count() === once.count())
    assert(once.count() === docs.select("text").distinct().count())
    // the shipped aggregate formulation picks the same survivors as
    // this window reference on every generated corpus
    val agg = docs
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("h"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
    assert(agg.select("doc_id").except(once.select("doc_id")).count() === 0)
    assert(once.select("doc_id").except(agg.select("doc_id")).count() === 0)
  }

  test("fixed-point dot product is symmetric and self-normalizes to 1") {
    val vecGen: Gen[Array[Float]] =
      Gen.listOfN(16, Gen.chooseNum(-1000, 1000).map(_ / 1000.0f)).map(_.toArray)
    val vecs = sample(vecGen, 30, 2000L).filter(_.exists(_ != 0.0f))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val e = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos"), col("v").cast("double").as("v"))
    val dots = e.select(col("vec_id").as("a"), col("pos"), col("v").as("va"))
      .join(e.select(col("vec_id").as("b"), col("pos"), col("v").as("vb")), "pos")
      .groupBy("a", "b").agg(Det.sumFixed(col("va") * col("vb")).as("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // symmetry is EXACT: floor(va*vb·2^40) == floor(vb*va·2^40) per dim
    dots.foreach { case ((a, b), d) => assert(d === dots((b, a))) }
    // self-cosine ≈ 1 after norm division (fixed-point error ≤ 6e-11·16)
    vecs.foreach { case (id, _) =>
      val selfDot = dots((id, id))
      assert(math.abs(selfDot / (math.sqrt(selfDot) * math.sqrt(selfDot)) - 1.0) < 1e-9)
    }
  }

  test("set algebra holds on generated key sets") {
    val keyGen = Gen.chooseNum(0L, 200L)
    val as = sample(keyGen, 150, 3000L).toDF("k")
    val bs = sample(keyGen, 150, 4000L).toDF("k")
    val lhs = as.except(bs).union(as.intersect(bs)).distinct()
    assert(lhs.except(as.distinct()).count() === 0)
    assert(as.distinct().except(lhs).count() === 0)
  }

  test("surrogate keys are invariant under repartitioning") {
    // The whole point of the hash-based assignment vs
    // monotonically_increasing_id: identical (natural → surrogate)
    // mapping whatever the physical layout.
    val sk = expr(graft.operators.StatOps.SurrogateKeySql)
    def mapping(parts: Int) =
      Tables.customer(spark, Spec.sf001).repartition(parts)
        .select(col("c_custkey"), sk.as("sk"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = mapping(1); val b = mapping(13)
    assert(a === b)
    assert(a.values.toSeq.distinct.size === a.size, "collision at fixture scale")
  }

  test("window running sum equals aggregate total on generated measures") {
    val rows = sample(Gen.chooseNum(1, 99999).map(_ / 100.0), 500, 5000L)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    val last = rows.withColumn("run", sum(Det.dec(col("v"))).over(w))
      .orderBy(col("id").desc).limit(1)
      .select(Det.money(col("run"))).head().getDouble(0)
    val total = rows.agg(Det.sumMoney(col("v"))).head().getDouble(0)
    assert(last === total)
  }
}
