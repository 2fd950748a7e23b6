package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.HllSketch.hll_distinct
import graft.operators.{Retrieval, Sampling}

/** Round-8 session-6 operators: HLL cardinality sketch, UniMax
  * epoch-capped mixture, leakage-safe cluster split, MaxSim
  * late-interaction retrieval. Hand-checkable inputs here; the DuckDB
  * oracles re-verify each on the real corpus. */
class R8dOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- HLL sketch ----

  test("hll_distinct: estimate within 10% at 5000 distinct keys") {
    import spark.implicits._
    val df = (1 to 5000).map(i => s"key_$i").toDF("k")
    val row = df.agg(hll_distinct(col("k"), 9).as("h"))
      .select(col("h.est"), col("h.nonzero")).head()
    val est = row.getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.10, s"est=$est")
  }

  test("hll_distinct: partition-invariant (merge == single-pass)") {
    import spark.implicits._
    val df = (1 to 3000).map(i => s"k${i % 1100}").toDF("k")
    def run(parts: Int) =
      df.repartition(parts).agg(hll_distinct(col("k"), 9)).head().getStruct(0)
    assert(run(1) == run(7))
  }

  test("hll_distinct: duplicate keys do not move the registers") {
    import spark.implicits._
    val once = (1 to 400).map(i => s"u$i").toDF("k")
    val many = (1 to 400).flatMap(i => Seq.fill(5)(s"u$i")).toDF("k")
    assert(once.agg(hll_distinct(col("k"), 9)).head().getStruct(0) ==
      many.agg(hll_distinct(col("k"), 9)).head().getStruct(0))
  }

  test("hll_distinct: small sets take the linear-counting branch exactly") {
    import spark.implicits._
    val df = Seq("a", "b", "c").toDF("k")
    val r = df.agg(hll_distinct(col("k"), 9).as("h"))
      .select(col("h.est"), col("h.nonzero")).head()
    // 3 distinct keys with no register collision: nonzero = 3 and the
    // linear-counting estimate 512·ln(512/509) computed literally
    assert(r.getInt(1) == 3)
    assert(math.abs(r.getDouble(0) - 512.0 * math.log(512.0 / 509.0)) < 1e-9)
  }

  // ---- UniMax allocation ----

  private def unimaxOf(budget: Long): Map[String, (Boolean, Double, Double)] = {
    import spark.implicits._
    val d = Seq(("a", 10L), ("b", 20L), ("c", 100L))
      .flatMap { case (dom, n) => Seq((dom, n)) }.toDF("domain0", "n")
    Sampling.unimaxAllocation(d, "domain0", col("n"), budget, epochCap = 2)
      .select(col("domain"), col("capped"), col("alloc_tokens"), col("epochs"))
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getDouble(2), r.getDouble(3)))).toMap
  }

  test("unimaxAllocation: mixed regime — small domains cap, the big one splits the rest") {
    // caps 2·n = (20, 40, 200), budget 150: a and b cap, c gets 90
    val m = unimaxOf(150L)
    assert(m("a") == ((true, 20.0, 2.0)))
    assert(m("b") == ((true, 40.0, 2.0)))
    assert(m("c") == ((false, 90.0, 0.9)))
  }

  test("unimaxAllocation: budget above every cap leaves it unfilled") {
    val m = unimaxOf(1000L)
    assert(m.values.forall(_._1) && m.values.map(_._2).sum == 260.0)
  }

  test("unimaxAllocation: tight budget splits uniformly, nobody capped") {
    val m = unimaxOf(30L)
    assert(m.values.forall(!_._1) && m.values.forall(_._2 == 10.0))
  }

  test("mixSchedule: every prefix carries domains in weight proportion") {
    import spark.implicits._
    // 300/200/100 docs at weights 0.5/0.3/0.2 — supply outlasts the
    // checked prefixes, so the stride bound |count − L·w| ≤ 2 holds
    val docs = ((1L to 300L).map((_, "a")) ++ (301L to 500L).map((_, "b")) ++
      (501L to 600L).map((_, "c"))).toDF("id", "dom")
    val sched = Sampling.mixSchedule(docs, "dom", "id",
        Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2), nShards = 1)
      .orderBy(col("pos")).select("domain").collect().map(_.getString(0))
    assert(sched.length == 600)
    val counts = collection.mutable.Map("a" -> 0, "b" -> 0, "c" -> 0)
    val w = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    for ((d, i) <- sched.zipWithIndex.take(400)) {
      counts(d) += 1
      val l = i + 1
      for ((dom, q) <- w)
        assert(math.abs(counts(dom) - l * q) <= 2.0,
          s"prefix $l: $dom=${counts(dom)} expected ~${l * q}")
    }
  }

  // ---- leakage-safe split ----

  test("clusterSafeSplit: cluster members never straddle; singletons covered") {
    import spark.implicits._
    val docs = (1L to 40L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = graft.operators.Clustering.dupClusters(pairs, "id_a", "id_b")
    val out = Sampling.clusterSafeSplit(docs, "doc_id",
        clusters, "doc_id", "cluster_id", evalRate = 0.5)
      .select(col("doc_id"), col("cluster_id"), col("split"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 40)
    val byDoc = out.map(r => r._1 -> r._3).toMap
    assert(byDoc(1L) == byDoc(2L) && byDoc(2L) == byDoc(3L))
    assert(byDoc(10L) == byDoc(11L))
    // at evalRate 0.5 over 37 clusters both sides must appear
    assert(out.map(_._3).toSet == Set("train", "eval"))
    // deterministic: a rerun draws identical sides
    val rerun = Sampling.clusterSafeSplit(docs, "doc_id",
        clusters, "doc_id", "cluster_id", evalRate = 0.5)
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rerun == byDoc)
  }

  // ---- MaxSim retrieval ----

  test("maxSimTopK: per-query max then sum, hand-checked") {
    import spark.implicits._
    val chunks = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))).toDF("g", "v")
    val qs = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val got = Retrieval.maxSimTopK(chunks, "g", "v", qs, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    // g2: 1 + 1 = 2; g1: 1 + 0 = 1; g3: −1 + 0 = −1
    assert(got == List((2L, 2.0), (1L, 1.0), (3L, -1.0)))
  }

  // ---- image dHash ----

  test("media_dhash: hand-checked gradient image; shift invariance; audio null") {
    import graft.operators.Multimodal
    // 9×8 horizontal gradient: every right sample strictly brighter ⇒
    // all 64 bits set (pixel = x*3 grows left→right within a row and
    // the +7·y row offset never reverses the x ordering at these dims)
    val grad = Multimodal.synthBmp(0L, 9, 8)
    assert(graft.functions.MediaDHash.dhashOf(grad) == -1L) // all 64 bits
    // dHash is a DIFFERENCE hash: a constant luma shift that never
    // wraps mod 256 leaves every bit unchanged (seeds 0 and 1 shift
    // all pixels by 31; dims 5×5 keeps base+22 < 256 wrap-free)
    val a = graft.functions.MediaDHash.dhashOf(Multimodal.synthBmp(0L, 5, 5))
    val b = graft.functions.MediaDHash.dhashOf(Multimodal.synthBmp(1L, 5, 5))
    assert(a == b)
    // w=1 degrades to the all-zero hash (grid collapses), not null
    assert(graft.functions.MediaDHash.dhashOf(Multimodal.synthBmp(3L, 1, 4)) == 0L)
    // audio has no RGB planes ⇒ null
    assert(graft.functions.MediaDHash.dhashOf(
      Multimodal.synthWav(1L, 1, 16)) == null)
  }

  test("imageDHashPairs: identical and shift-twin images all pair at hamming 0") {
    import spark.implicits._
    import graft.operators.Multimodal
    // two identical 6×6 images (same seed) plus a +31-luma shifted twin
    // (both seeds wrap mod 256 exactly once across the 6×6 ramp, so the
    // shift is uniform and the difference hash is identical)
    val rows = Seq(
      (1L, Multimodal.synthBmp(10L, 6, 6)),
      (2L, Multimodal.synthBmp(10L, 6, 6)),
      (3L, Multimodal.synthBmp(11L, 6, 6)))
    val df = rows.toDF("img_id", "media")
    val got = Multimodal.imageDHashPairs(df, "media", "img_id", maxDist = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    assert(got == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)), s"got=$got")
  }

  test("media_audio_fp: waveform-shape hash — level-invariant, image null") {
    import graft.operators.Multimodal
    import graft.functions.MediaAudioFp.afpOf
    // same waveform at two DC levels: seeds 0 and 1 shift every sample
    // by 131 (no mod-2048 wrap over 65 frames: max 64·17+131 < 2048)
    // ⇒ sample ordering — and the hash — is identical
    val a = afpOf(Multimodal.synthWav(0L, 1, 65))
    val b = afpOf(Multimodal.synthWav(1L, 1, 65))
    assert(a == b && a != null)
    // 65 frames ⇒ anchors t_k = k exactly; the strictly rising ramp
    // (+17 per frame, wrap-free) sets every one of the 64 bits
    assert(a == -1L)
    // images and nulls fall through
    assert(afpOf(Multimodal.synthBmp(1L, 4, 4)) == null)
  }

  test("media_video_fp: sample-sum shape hash — deterministic, wav/image null") {
    import graft.operators.Multimodal
    import graft.functions.MediaVideoFp.vfpOf
    val v = vfpOf(Multimodal.synthMp4(5L, 40, 64, 48))
    assert(v != null)
    // byte-identical re-encode hashes identically
    assert(v == vfpOf(Multimodal.synthMp4(5L, 40, 64, 48)))
    // a different stream does not (40 samples ⇒ plenty of live bits)
    assert(v != vfpOf(Multimodal.synthMp4(6L, 40, 64, 48)))
    // non-mp4 media fall through
    assert(vfpOf(Multimodal.synthWav(1L, 1, 30)) == null)
    assert(vfpOf(Multimodal.synthBmp(1L, 5, 5)) == null)
  }

  test("maxSimTopK: single aggregation — no join or cartesian in the plan") {
    import spark.implicits._
    val chunks = (1 to 50).map(i => ((i % 5).toLong,
      Array(i.toFloat, (i * 2).toFloat))).toDF("g", "v")
    val plan = Retrieval.maxSimTopK(chunks, "g", "v",
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"))
  }
}
