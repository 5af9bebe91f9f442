package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Property-based invariants against INDEPENDENT sequential reference
  * implementations (deterministic ScalaCheck seeds; every generated
  * scenario batched into ONE DataFrame so the whole property costs one
  * Spark job). These are the randomized cousins of the example-based
  * specs: the reference computations share no code or arithmetic path
  * with the operators.
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Session.local(4)

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("packCounts matches a sequential reference on random shard layouts") {
    import spark.implicits._
    val scenario = for {
      nShards <- Gen.choose(1, 3)
      budget <- Gen.oneOf(1, 16, 512)
      docs <- Gen.listOfN(40, for {
        shard <- Gen.choose(0, nShards - 1)
        nToks <- Gen.choose(0L, 700L)
      } yield (shard, nToks))
    } yield (budget, docs)
    samples(scenario, 8).zipWithIndex.foreach { case ((budget, docs), si) =>
      val rows = docs.zipWithIndex.map { case ((shard, n), i) =>
        (i.toLong, s"s${si}_$shard", n)
      }
      val got = TextOps.packCounts(
          rows.toDF("doc_id", "shard", "n_tokens"), budget)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
      // reference: plain sequential accumulation per shard in id order
      val expected = rows.groupBy(_._2).flatMap { case (_, ds) =>
        var pos = 0L
        ds.sortBy(_._1).map { case (id, _, n) =>
          val placement = (pos / budget, pos % budget, (pos + n - 1) / budget)
          pos += n
          id -> placement
        }
      }
      assert(got === expected, s"scenario $si (budget $budget)")
    }
  }

  test("kmeansCentroids matches a sequential Lloyd reference on random corpora") {
    import spark.implicits._
    def r3(x: Double) = math.floor(x * 1000.0 + 0.5001) / 1000.0
    // components are multiples of 0.25: every sum is exact in binary,
    // so the reference's sequential summation and Spark's partition-
    // order summation produce IDENTICAL doubles — the property tests
    // the algorithm (assignment, ties, empty cells, rounding), not FP
    // associativity. Values coarse enough to make cosine ties common.
    val scenario = for {
      k <- Gen.choose(2, 3)
      nIter <- Gen.choose(0, 2)
      n <- Gen.choose(4, 12)
      vecs <- Gen.listOfN(n, Gen.listOfN(4, Gen.oneOf(0.25f, 0.5f, 0.75f, 1.0f)))
    } yield (k, nIter, vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) })
    def reference(vecs: Seq[(Long, Array[Float])], k: Int,
                  nIter: Int): Seq[(Long, Seq[Double])] = {
      var cents: Seq[(Long, Array[Double])] =
        vecs.filter(_._1 < k).sortBy(_._1).map { case (id, v) => (id, v.map(_.toDouble)) }
      for (_ <- 0 until nIter) {
        val assigned = vecs.map { case (_, v) =>
          val vd = v.map(_.toDouble)
          val vn = math.sqrt(vd.foldLeft(0.0)((a, x) => a + x * x))
          var best = Double.NegativeInfinity
          var bc = -1L
          for ((cid, cv) <- cents) {
            val cn = math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x))
            var dot = 0.0
            for (i <- vd.indices) dot += vd(i) * cv(i)
            val cc = r3(dot / (vn * cn))
            if (cc > best) { best = cc; bc = cid } // strict > = smallest-cid tie rule
          }
          (bc, vd)
        }
        cents = assigned.groupBy(_._1).toSeq.sortBy(_._1).map { case (cid, vs) =>
          (cid, Array.tabulate(4)(d => r3(vs.map(_._2(d)).sum / vs.size)))
        }
      }
      cents.map { case (cid, cv) => (cid, cv.toSeq) }
    }
    samples(scenario, 25).foreach { case (k, nIter, vecs) =>
      val df = vecs.toSeq.toDF("vec_id", "embedding")
      val got = graft.operators.Similarity.kmeansCentroids(df, k, nIter)
        .map { case (cid, cv) => (cid, cv.toSeq) }.toSeq
      assert(got === reference(vecs, k, nIter),
        s"kmeans mismatch: k=$k nIter=$nIter vecs=${vecs.map(_._2.mkString("[", ",", "]"))}")
    }
  }

  test("graft_winnow matches a sequential reference on random strings") {
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val M = 1000000007L
    val scenario = for {
      k <- Gen.choose(1, 8)
      w <- Gen.choose(1, 10)
      // small alphabet → frequent hash ties, stressing the
      // rightmost-min rule; include length < k edge cases
      s <- Gen.choose(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    } yield (k, w, s)
    val cases = samples(scenario, 60)
    def reference(text: String, k: Int, w: Int): Seq[(Int, Long)] = {
      val nH = text.length - k + 1
      if (nH <= 0) return Seq.empty
      val hs = (0 until nH).map { p =>
        text.substring(p, p + k).foldLeft(0L)((h, c) => (h * 31 + c) % M)
      }
      val out = scala.collection.mutable.LinkedHashSet.empty[(Int, Long)]
      for (j <- 0 until math.max(1, nH - w + 1)) {
        val win = hs.zipWithIndex.slice(j, math.min(j + w, nH))
        val minH = win.map(_._1).min
        val (h, p) = win.filter(_._1 == minH).last // rightmost min
        out += ((p + 1, h))
      }
      out.toSeq
    }
    val df = cases.zipWithIndex.map { case ((k, w, s), i) => (i.toLong, k, w, s) }
      .toDF("id", "k", "w", "text")
    // one job per (k, w) group keeps each expression's literals static
    cases.map { case (k, w, _) => (k, w) }.distinct.foreach { case (k, w) =>
      val got = df.where(col("k") === k && col("w") === w)
        .selectExpr("id", s"graft_winnow(text, $k, $w) AS fps")
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getInt(0), x.getLong(1))))
        .toMap
      got.foreach { case (id, fps) =>
        val (kk, ww, s) = cases(id.toInt)
        assert(fps.toSeq === reference(s, kk, ww).sortBy(_._1),
          s"winnow mismatch: k=$kk w=$ww text='$s'")
      }
    }
  }

  test("sessionizeSplitMerge equals a sequential sessionize reference at random gaps/widths") {
    import spark.implicits._
    val scenario = for {
      gap <- Gen.choose(50L, 400L)
      width <- Gen.choose(25L, 2000L) // below AND above the gap
      nUsers <- Gen.choose(1, 4)
      evs <- Gen.listOfN(120, for {
        u <- Gen.choose(0, nUsers - 1)
        t <- Gen.choose(0L, 5000L)
        v <- Gen.choose(0, 50)
      } yield (u.toLong, t, v / 7.0))
    } yield (gap, width, evs)
    samples(scenario, 6).zipWithIndex.foreach { case ((gap, width, evs), si) =>
      // independent sequential reference: per user, sort by (ts, id),
      // split on gap >= g, aggregate
      val rows = evs.zipWithIndex.map { case ((u, t, v), i) => (u, i.toLong, t, v) }
      val ref = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
        val ordered = rs.sortBy(r => (r._3, r._2))
        val sessions = ordered.foldLeft(Vector.empty[Vector[(Long, Long, Long, Double)]]) {
          case (acc, r) =>
            if (acc.nonEmpty && r._3 - acc.last.last._3 < gap) acc.init :+ (acc.last :+ r)
            else acc :+ Vector(r)
        }
        sessions.zipWithIndex.map { case (ses, i) =>
          (u, (i + 1).toLong, ses.head._3, ses.last._3, ses.size.toLong,
            math.floor(ses.map(_._4).sum * 1000.0 + 0.5001) / 1000.0)
        }
      }.sorted
      val df = rows.toDF("user_id", "event_id", "us", "value")
        .select(col("user_id"), col("event_id"),
          timestamp_micros(col("us")).as("ts"), col("value"))
      val got = graft.operators.Relational.sessionizeSplitMerge(df, gap, width)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))).sorted.toSeq
      assert(got === ref, s"scenario $si: gap=$gap width=$width")
    }
  }
}
