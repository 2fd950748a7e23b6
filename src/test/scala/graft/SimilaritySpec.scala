package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** k-means IVF build quality: convergence, determinism of the search
  * surface, and recall of the pruned search vs brute force. */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private lazy val e = spark.read.parquet(s"$sf/embeddings.parquet")

  private def inertia(cents: Seq[Seq[Double]]): Double =
    Similarity.ivfAssign(e, "embedding", cents)
      .select(sum(
        aggregate(zip_with(transform(col("embedding"), x => x.cast("double")),
          element_at(array(cents.map(c => array(c.map(lit): _*)): _*),
            col("ivf_cell") + 1),
          (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x)).as("j"))
      .head().getDouble(0)

  test("random projection: deterministic components, JL distance preservation") {
    // determinism + formula: component j = dot(v, plane_j)/√k
    val k = 32
    val planes = Similarity.hyperplanes(64, k)
    val out = Similarity.projectRandom(e, "embedding", dim = 64, k = k)
      .select(col("vec_id"), col("reduced"), col("embedding")).collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getSeq[Double](1).toArray, r.getSeq[Float](2).map(_.toDouble).toArray)).toMap
    val (red0, v0) = byId(out.head.getLong(0))
    for (j <- 0 until k) {
      val want = v0.zip(planes(j)).map { case (a, b) => a * b }.sum / math.sqrt(k / 3.0)
      assert(math.abs(red0(j) - want) < 1e-9, s"component $j")
    }
    // JL property: pairwise euclidean distances survive within ~1/√k
    // distortion on average (deterministic given fixed planes + data)
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = byId.keys.toSeq.sorted.take(30)
    val distortions = for {
      i <- ids.indices; l <- i + 1 until ids.length
      (ra, va) = byId(ids(i)); (rb, vb) = byId(ids(l))
      orig = math.sqrt(d2(va, vb)) if orig > 0
    } yield math.abs(math.sqrt(d2(ra, rb)) - orig) / orig
    val mean = distortions.sum / distortions.size
    assert(mean < 0.25, f"mean JL distortion $mean%.3f too large for k=$k")
  }

  test("exact cosine pairs: known geometry, every pair found exactly once") {
    import spark.implicits._
    // unit vectors at known angles: (1,0), (cos60,sin60), (0,1), (-1,0)
    val c60 = math.cos(math.Pi / 3).toFloat; val s60 = math.sin(math.Pi / 3).toFloat
    val df = Seq(
      (0L, Array(1f, 0f)), (1L, Array(c60, s60)), (2L, Array(0f, 1f)), (3L, Array(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.exactCosinePairs(df, "embedding", "vec_id", 0.4, blocks = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    // cos(0,1)=0.5, cos(1,2)=sin60≈0.866; all other pairs < 0.4
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L), (1L, 2L)))
    assert(math.abs(pairs(0)._3 - 0.5) < 1e-6)
    assert(math.abs(pairs(1)._3 - s60) < 1e-6)
  }

  test("exact cosine pairs superset: finds everything the LSH variant finds") {
    val exact = Similarity.exactCosinePairs(e, "embedding", "vec_id", 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosineNearDupPairs(e, "embedding", "vec_id",
        dim = e.head().getSeq[Float](1).length, threshold = 0.4, nBits = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), (lsh -- exact).take(5).toString)
    assert(exact.nonEmpty)
  }

  test("kmeans: inertia decreases vs the first-k init and assigns all cells") {
    val init = e.orderBy(col("vec_id")).limit(4)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val built = Similarity.kmeansCentroids(e, "embedding", "vec_id", k = 4, iters = 5)
    assert(built.size == 4 && built.forall(_.size == init.head.size))
    val j0 = inertia(init)
    val j5 = inertia(built)
    assert(j5 < j0 * 0.95, s"kmeans did not reduce inertia: $j0 -> $j5")
    // every cell non-empty on this corpus
    val cells = Similarity.ivfAssign(e, "embedding", built)
      .select(countDistinct(col("ivf_cell"))).head().getLong(0)
    assert(cells == 4)
  }

  test("ivf pruned search: query's own cell probed, recall@10 >= 0.5 with nprobe=2") {
    val out = SparkEntry.queries("ann_ivf_kmeans_topk")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(out.head == 2L) // the query vector itself (cos=1.0) always found
    val q = e.filter(col("vec_id") === 2).select(col("embedding")).head()
      .getSeq[Float](0).map(_.toDouble)
    val bf = Similarity.bruteForceTopK(e, "embedding", "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = out.count(bf.contains).toDouble / 10
    assert(recall >= 0.5, s"recall too low: $recall (got $out vs $bf)")
  }

  test("knn label vote: known geometry, majority and tie-breaks") {
    import spark.implicits._
    // three tight cluster-0 vectors near (1,0), two cluster-1 near (0,1)
    val df = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.99f, 0.14f), 0), (2L, Array(0.97f, 0.24f), 0),
      (3L, Array(0f, 1f), 1), (4L, Array(0.14f, 0.99f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelVote(df, "embedding", "vec_id", "label", k = 2, blocks = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3))).toMap
    // each cluster-0 vector's 2 nearest are the other cluster-0 vectors
    for (id <- Seq(0L, 1L, 2L)) assert(out(id)._2 == 0, s"id $id voted ${out(id)}")
    // cluster-1 vectors: nearest is the other cluster-1 member, second is
    // a cluster-0 vector → 1-1 tie resolves to the smaller label (0)
    assert(out(3L)._2 == 0 && out(3L)._3 == 1L)
    assert(out(4L)._2 == 0 && out(4L)._3 == 1L)
  }

  test("lsh knn vote: near-linear variant agrees with the exact vote on most vectors") {
    val exact = Similarity.knnLabelVote(e, "embedding", "vec_id", "label", k = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val lsh = Similarity.knnLabelVoteLsh(e, "embedding", "vec_id", "label",
        k = 5, dim = 64, nBits = 2, tables = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // deterministic on the fixed corpus: buckets cover most true top-5s
    val agree = exact.count { case (id, p) => lsh.get(id).contains(p) }
    assert(lsh.size >= exact.size * 9 / 10, s"lsh vote covered ${lsh.size}/${exact.size}")
    assert(agree >= exact.size * 6 / 10, s"agreement $agree/${exact.size}")
  }

  test("semantic dup pairs: k-means cell blocking is exact (== brute-force pairs)") {
    val cellBlocked = Similarity.semanticDupPairs(e, "embedding", "vec_id",
        k = 4, iters = 2, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = Similarity.exactCosinePairs(e, "embedding", "vec_id", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the all-cells probe makes exactness independent of the centroids
    assert(cellBlocked == brute,
      s"missing=${(brute -- cellBlocked).take(3)} extra=${(cellBlocked -- brute).take(3)}")
    assert(brute.nonEmpty)
  }

  test("deterministic kmeans: bit-identical centroids at any partitioning") {
    // the property the nprobe oracle rests on: fixed-point integer sums
    // make the learned centroids independent of partition count and
    // aggregation order — double-avg k-means cannot promise this
    val c2 = Similarity.kmeansCentroidsDet(e.repartition(2), "embedding", "vec_id",
      k = 8, iters = 2)
    val c13 = Similarity.kmeansCentroidsDet(e.repartition(13), "embedding", "vec_id",
      k = 8, iters = 2)
    val c1 = Similarity.kmeansCentroidsDet(e.coalesce(1), "embedding", "vec_id",
      k = 8, iters = 2)
    assert(c2 == c13 && c2 == c1, "centroids drifted with partitioning")
    // and the centroids are real: every cell lands at least one vector
    val cells = Similarity.ivfAssign(e, "embedding", c2)
      .select(countDistinct(col("ivf_cell"))).head().getLong(0)
    assert(cells >= 6, s"degenerate clustering: $cells distinct cells of 8")
  }

  test("nprobe semantic dedup: subset of exact pairs, recall from home-cell floor") {
    val np = Similarity.semanticDupPairsNprobe(e, "embedding", "vec_id",
        k = 8, iters = 2, threshold = 0.4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ex = Similarity.exactCosinePairs(e, "embedding", "vec_id", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every nprobe pair is a true pair (the cosine verify is exact)
    assert(np.subsetOf(ex), s"false positives: ${(np -- ex).take(3)}")
    // home-cell pairs are always found (both endpoints probe their own
    // cell), so recall can't be zero on a clustered corpus
    assert(ex.isEmpty || np.nonEmpty)
  }

  test("lsh candidate predicate: matches lshTopK's scan set, includes probe buckets") {
    val q = e.filter(col("vec_id") === 0).select(col("embedding")).head()
      .getSeq[Float](0).map(_.toDouble)
    val cond = Similarity.lshCandidateCond(col("embedding"), q, dim = q.length,
      nBits = 6, probes = 2, tables = 2)
    val scanned = e.filter(cond).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    // the query vector's own bucket always collides with itself
    assert(scanned.contains(0L))
    // top-k over the predicate's scan set == lshTopK with the same params
    val viaCond = Similarity.bruteForceTopK(e.filter(cond), "embedding", "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSeq
    val viaTopK = Similarity.lshTopK(e, "embedding", "vec_id", q, 10,
        dim = q.length, nBits = 6, probes = 2, tables = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(viaCond == viaTopK)
    // probes widen (or keep) the scan set
    val noProbes = e.filter(Similarity.lshCandidateCond(col("embedding"), q,
        dim = q.length, nBits = 6, probes = 0, tables = 2))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(noProbes.subsetOf(scanned))
  }

  test("pq encode: codes in range, exact duplicates share codes, clustered data has low distortion") {
    import spark.implicits._
    // two tight clusters in each of two subspaces (dim 8, m=2, k=2):
    // every vector should quantize to its cluster's codeword nearly
    // losslessly; ids 0/1 are exact duplicates and must share codes
    val rows = (0 until 20).map { i =>
      val hi = if (i % 2 == 0 || i == 1) 1.0f else -1.0f
      val v = Array.fill(8)(hi * (if (i <= 1) 1.0f else 1.0f + (i % 3) * 0.001f))
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.pqEncode(df, "embedding", "vec_id", dim = 8,
      m = 2, k = 2, iters = 2).collect()
    assert(out.length == 20)
    for (r <- out) {
      assert(Seq(0, 1).contains(r.getAs[Int]("code_0")))
      assert(Seq(0, 1).contains(r.getAs[Int]("code_1")))
      assert(r.getAs[Double]("distortion") >= -1e-9)
      assert(r.getAs[Double]("distortion") < 0.1, r.toString) // tight clusters
    }
    val byId = out.map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[Int]("code_0"), r.getAs[Int]("code_1"))).toMap
    assert(byId(0L) == byId(1L), "exact duplicates must share PQ codes")
  }

  test("pq codebooks are deterministic across partitionings") {
    val a = Similarity.pqCodebooks(e, "embedding", "vec_id", dim = 64,
      m = 4, k = 8, iters = 2)
    val b = Similarity.pqCodebooks(e.repartition(7), "embedding", "vec_id",
      dim = 64, m = 4, k = 8, iters = 2)
    assert(a == b, "fixed-point subspace k-means must be partition-invariant")
  }

  test("ivf-pq search: ranked ascending ADC, bounded top-k, self-query findable") {
    val res = Similarity.annIvfPqTopK(e, "embedding", "vec_id", dim = 64,
      coarseK = 4, coarseIters = 2, m = 4, k = 8, iters = 2,
      nprobe = 2, topK = 5, queryPred = col("vec_id") % 97 === 0)
      .collect()
    val byQ = res.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    for ((_, rows) <- byQ) {
      val sorted = rows.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.length <= 5)
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to sorted.length))
      val dists = sorted.map(_.getAs[Double]("adc_dist2"))
      assert(dists.zip(dists.tail).forall { case (x, y) => x <= y })
      assert(dists.forall(_ >= -1e-9))
    }
    // a query vector always probes its own home cell (nprobe >= 1), so
    // it must appear among its own candidates
    for ((q, rows) <- byQ)
      assert(rows.exists(_.getAs[Long]("vec_id") == q),
        s"query $q missing from its own candidate set")
  }
}
