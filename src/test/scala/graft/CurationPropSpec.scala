package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.SparkSession
import graft.operators.{Clustering, Packing}

/** Property tests for the graph/packing curation operators against
  * brute-force sequential references: the distributed min-label
  * propagation must equal union-find on arbitrary graphs (chains,
  * cliques, stars, disconnected mixes — shapes the corpus-derived
  * tests never produce), and the distributed pack scan must equal the
  * obvious single-threaded greedy simulation. */
object CurationPropSpec extends Properties("curation-ops") {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    nNodes <- Gen.choose(2, 30)
    nEdges <- Gen.choose(1, 60)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes - 1L)
      b <- Gen.choose(0L, nNodes - 1L) if a != b
    } yield (a min b, a max b))
  } yield edges

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    // canonical = min member of each set: with min-root union above the
    // root IS the minimum of its component
    parent.keys.map(k => k -> find(k)).toMap
  }

  property("connected components == union-find on random graphs") =
    Prop.forAll(edgesGen) { edges =>
      import spark.implicits._
      val df = edges.toDF("id_a", "id_b")
      val got = Clustering.connectedComponents(df, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(edges)
    }

  property("large-star/small-star components == union-find on random graphs") =
    Prop.forAll(edgesGen) { edges =>
      import spark.implicits._
      val df = edges.toDF("id_a", "id_b")
      val got = Clustering.connectedComponentsStar(df, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(edges)
    }

  private val packGen: Gen[(List[Long], Long, Int)] = for {
    n <- Gen.choose(1, 40)
    sizes <- Gen.listOfN(n, Gen.choose(1L, 30L))
    budget <- Gen.choose(5L, 40L)
    shards <- Gen.choose(1, 3)
  } yield (sizes, budget, shards)

  private val chunkGen: Gen[(List[Int], Int, Int)] = for {
    nDocs <- Gen.choose(1, 10)
    lens <- Gen.listOfN(nDocs, Gen.choose(0, 30))
    size <- Gen.choose(1, 8)
    stride <- Gen.choose(1, 8)
  } yield (lens, size, stride)

  property("token chunking == sequential window simulation") =
    Prop.forAll(chunkGen) { case (lens, size, stride) =>
      import spark.implicits._
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, (0 until n).map(j => s"t${i}_$j").mkString(" "))
      }
      val got = graft.operators.TextAnalysis
        .chunkTokens(docs.toDF("doc_id", "text"), "text", "doc_id", size, stride)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
        .toSet
      val expect = (for {
        (n, i) <- lens.zipWithIndex if n > 0
        toks = (0 until n).map(j => s"t${i}_$j")
        (s0, ci) <- (0 until n by stride).zipWithIndex
      } yield (i.toLong, ci, s0, math.min(size, n - s0),
        toks.slice(s0, s0 + size).mkString(" "))).toSet
      got == expect
    }

  property("distributed packing == sequential greedy simulation") =
    Prop.forAll(packGen) { case (sizes, budget, shards) =>
      import spark.implicits._
      val rows = sizes.zipWithIndex.map { case (s, i) => (i.toLong, "g", s) }
      val got = Packing.packGreedy(rows.toDF("id", "grp", "n"),
          "id", "grp", "n", budget, shards)
        .collect().map(r => (r.getLong(0), (r.getLong(4), r.getLong(5)))).toMap
      // reference: per shard in id order, greedy fill; offset = fill
      // before the doc joined its bin
      val expect = rows.groupBy(_._1 % shards).flatMap { case (_, cell) =>
        var bin = 0L; var fill = 0L; var first = true
        cell.sortBy(_._1).map { case (id, _, s) =>
          var off = 0L
          if (first) { first = false; fill = s }
          else if (fill + s > budget) { bin += 1; fill = s }
          else { off = fill; fill += s }
          id -> ((bin, off))
        }
      }.toMap
      got == expect
    }
}
