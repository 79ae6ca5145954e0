package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties (SURVEY.md §5.3). Few-but-real Spark jobs per
  * property: minSuccessfulTests is capped since every case is a full
  * local job.
  */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withMaxDiscardRatio(10)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val genRows: Gen[List[(Long, String)]] =
    Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 1000L),
      Gen.oneOf("alpha", "beta", "gamma", "delta")))

  property("dedupExact is idempotent and conserves row count") =
    Prop.forAll(genRows) { rows =>
      val df = rows.zipWithIndex
        .map { case ((k, v), i) => (i.toLong, s"$k $v") }
        .toDF("doc_id", "text")
      val d1 = graft.text.Dedup.exact(df, "text", "doc_id").cache()
      val total = d1.agg(sum("n_dups")).as[Long].head()
      val d2 = graft.ops.Relational.dedupExact(
        d1.select("content_hash", "keep_id"), Seq("content_hash"),
        "keep_id")
      (total == rows.length: Prop) && (d2.filter($"n_dups" =!= 1)
        .count() == 0: Prop)
    }

  property("unionAll cardinality = |a| + |b|") =
    Prop.forAll(genRows, genRows) { (a, b) =>
      val da = a.toDF("k", "v")
      val db = b.toDF("k", "v")
      da.unionAll(db).count() == (a.length + b.length).toLong
    }

  property("topKPerGroup rank is within [1, min(k, group size)]") =
    Prop.forAll(genRows, Gen.chooseNum(1, 5)) { (rows, k) =>
      val df = rows.zipWithIndex
        .map { case ((n, g), i) => (g, n, i.toLong) }
        .toDF("g", "score", "id")
      val sizes = df.groupBy("g").count().as[(String, Long)]
        .collect().toMap
      val out = graft.ops.Relational.topKPerGroup(df, Seq($"g"),
          Seq($"score".desc, $"id"), k)
        .groupBy("g").agg(count(lit(1)).as("n"), max("rn").as("maxrn"))
        .as[(String, Long, Int)].collect()
      out.forall { case (g, n, maxrn) =>
        n == math.min(k.toLong, sizes(g)) && maxrn >= 1 && maxrn <= k
      }
    }

  private val genEvents: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(50, Gen.zip(Gen.chooseNum(0L, 5L),
      Gen.chooseNum(0L, 100000L), Gen.chooseNum(-10.0, 10.0)))

  property("asofJoin attaches only past-or-present feature values") =
    Prop.forAll(genEvents, genEvents) { (qs, fs) =>
      val queries = qs.zipWithIndex.map { case ((u, t, _), i) =>
        (i.toLong, u, new java.sql.Timestamp(t * 1000)) }
        .toDF("qid", "uid", "qts")
      val feats = fs.map { case (u, t, v) =>
        (u, new java.sql.Timestamp(t * 1000),
          new java.sql.Timestamp(t * 1000), v) }
        .toDF("uid", "fts", "seen_ts", "value")
      val out = graft.ops.Relational.asofJoin(queries, feats, "uid",
        "qts", "fts", Seq("seen_ts", "value"))
      out.filter($"asof_seen_ts".isNotNull && $"asof_seen_ts" > $"qts")
        .count() == 0 && out.count() == qs.length.toLong
    }

  property("sessionize session_idx starts at 1 and is non-decreasing " +
      "in time order per key") =
    Prop.forAll(genEvents) { evs =>
      val df = evs.zipWithIndex.map { case ((u, t, _), i) =>
        (u, new java.sql.Timestamp(t * 1000), i.toLong) }
        .toDF("user_id", "ts", "event_id")
      val out = graft.ops.Relational
        .sessionize(df, "user_id", "ts", "event_id", gapSeconds = 600L)
        .select($"user_id", $"ts", $"event_id", $"session_idx")
        .as[(Long, java.sql.Timestamp, Long, Long)].collect()
        .groupBy(_._1)
      out.values.forall { rows =>
        val sorted = rows.sortBy(r => (r._2.getTime, r._3)).toList
        sorted.head._4 == 1L &&
          sorted.zip(sorted.tail).forall { case (a, b) =>
            b._4 == a._4 || b._4 == a._4 + 1
          }
      }
    }

  property("chunkDocs reconstructs every doc from its chunks") =
    Prop.forAll(
      Gen.listOfN(5, Gen.chooseNum(1, 90)),
      Gen.chooseNum(2, 12).flatMap(sz =>
        Gen.chooseNum(1, sz).map(st => (sz, st)))) {
      case (lens, (size, stride)) =>
        val docs = lens.zipWithIndex.map { case (n, i) =>
          (i.toLong, (0 until n).map(j => s"t$j").mkString(" "))
        }
        val out = graft.text.TextOps
          .chunkDocs(docs.toDF("doc_id", "text"), "text", "doc_id",
            size, stride)
          .select("doc_id", "chunk_idx", "chunk")
          .as[(Long, Long, String)].collect()
          .groupBy(_._1)
        docs.forall { case (id, text) =>
          val chunks = out(id).sortBy(_._2).map(_._3.split(" ").toList)
          // every chunk but the last is full-size and starts `stride`
          // tokens after its predecessor, so taking the stride-prefix
          // of each plus the whole last chunk rebuilds the doc exactly
          val rebuilt =
            chunks.init.flatMap(_.take(stride)) ++ chunks.last
          rebuilt.mkString(" ") == text
        }
    }

  property("intervalJoin equals the quadratic overlap join") =
    Prop.forAll(
      Gen.listOfN(15, Gen.zip(Gen.chooseNum(0L, 7200L),
        Gen.chooseNum(0L, 1800L))),
      Gen.listOfN(15, Gen.zip(Gen.chooseNum(0L, 7200L),
        Gen.chooseNum(0L, 1800L)))) { (as, bs) =>
      def mk(rows: List[(Long, Long)], id: String, s: String,
             e: String) =
        rows.zipWithIndex.map { case ((st, len), i) =>
          (i.toLong, new java.sql.Timestamp(1700000000000L + st * 1000),
            new java.sql.Timestamp(1700000000000L + (st + len) * 1000))
        }.toDF(id, s, e)
      val a = mk(as, "aid", "st_a", "en_a")
      val b = mk(bs, "bid", "st_b", "en_b")
      val banded = graft.ops.Relational.intervalJoin(a, b,
          "st_a", "en_a", "st_b", "en_b", bucketSeconds = 600L)
        .select("aid", "bid").as[(Long, Long)].collect().toSet
      val quadratic = a.crossJoin(b)
        .filter($"st_a" <= $"en_b" && $"st_b" <= $"en_a")
        .select("aid", "bid").as[(Long, Long)].collect().toSet
      banded == quadratic
    }

  property("bitsFor holds LSH bucket occupancy in [target, 2*target)") =
    Prop.forAll(Gen.chooseNum(512L, 1000000000000L)) { n =>
      val bits = graft.text.Similarity.bitsFor(n)
      val occ = n.toDouble / (1L << bits)
      bits >= 1 && bits <= 62 &&
        (bits == 62 || (occ >= 256.0 && occ < 512.0))
    }

  property("quantized cosine is in [-1, 1] and symmetric") =
    Prop.forAll(Gen.listOfN(6,
      Gen.listOfN(8, Gen.chooseNum(-1.0, 1.0)))) { vecs =>
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
        .toDF("vec_id", "embedding")
      val pairs = graft.text.Similarity
        .cosinePairs(df, "vec_id", "embedding", minCosine = -2.0, dim = 8)
        .select("id_a", "id_b", "cosine")
        .as[(Long, Long, Double)].collect()
      pairs.forall { case (a, b, c) =>
        a < b && (c.isNaN || (c >= -1.0000001 && c <= 1.0000001))
      }
    }
}
