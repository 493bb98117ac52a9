package graft

import graft.operators.DataPrep
import org.apache.spark.sql.functions._

/** Invariants for the dataset-prep operators (values are oracle-gated). */
class DataPrepSpec extends GraftSpec {

  test("BPE training replays an independent reference (counts, ties, greedy non-overlap rewrite)") {
    import graft.operators.DataPrep
    // independent reference over the same corpus
    val words = graft.Tables.documents(spark, sf0001)
      .select("text").collect()
      .flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    var vocab: Map[String, List[String]] = words.keys.map(w => w -> w.map(_.toString).toList).toMap
    val expect = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    for (step <- 1 to DataPrep.BpeMerges) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, syms) <- vocab; j <- 0 until syms.length - 1)
        pc((syms(j), syms(j + 1))) = pc.getOrElse((syms(j), syms(j + 1)), 0L) + words(w)
      val ((l, r), cnt) = pc.minBy { case ((l, r), c) => (-c, l, r) }
      expect += ((step.toLong, l, r, cnt))
      vocab = vocab.map { case (w, syms) =>
        val out = scala.collection.mutable.ListBuffer[String]()
        for (c <- syms)
          if (out.nonEmpty && out.last == l && c == r) out(out.length - 1) = l + r
          else out += c
        w -> out.toList
      }
    }
    val got = DataPrep.bpeTrain(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == expect.toSeq,
      s"merge table diverged (first diff: ${got.zip(expect).find(p => p._1 != p._2)})")
    // the reference's greedy non-overlap rule on a repeated-symbol word:
    // pair (a,a) over "aaaa" merges to [aa, aa], never [aa, a, a] or [aaa, a]
    val fold = List("a", "a", "a", "a").foldLeft(List.empty[String]) { (acc, c) =>
      if (acc.nonEmpty && acc.last == "a" && c == "a") acc.init :+ "aa" else acc :+ c
    }
    assert(fold == List("aa", "aa"), fold.toString)
  }

  test("BPE encode replays the merge table like an independent encoder (md5 per doc)") {
    val merges = DataPrep.bpeTrain(spark, sf0001)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def encodeWord(w: String): List[String] =
      merges.foldLeft(w.map(_.toString).toList) { case (syms, (l, r)) =>
        syms.foldLeft(List.empty[String]) { (acc, c) =>
          if (acc.nonEmpty && acc.last == l && c == r) acc.init :+ (l + r) else acc :+ c
        }
      }
    val expect = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect().map { r =>
        val ws = r.getString(1).split(" ").filter(_.nonEmpty).map(encodeWord)
        (r.getLong(0),
         r.getString(1).count(_ != ' ').toLong,
         ws.map(_.length.toLong).sum,
         md5hex(ws.map(_.mkString(" ")).mkString("|")))
      }.sortBy(_._1)
    val got = DataPrep.bpeEncode(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == expect.toSeq,
      s"encode diverged (first diff: ${got.zip(expect).find(p => p._1 != p._2)})")
    // merging only ever shrinks: n_sym_after <= n_sym_before, strict for
    // any doc containing at least one trained pair
    got.foreach { case (id, before, after, _) =>
      assert(after <= before, s"doc $id grew under merges")
    }
    assert(got.exists { case (_, b, a, _) => a < b }, "no merge ever applied")
  }

  test("FFD packing equals an independent first-fit-decreasing replay; bins within budget") {
    val got = DataPrep.packFfd(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(7)))
    assert(got.nonEmpty)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val bySource = graft.Tables.documents(spark, sf0001)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).split(" ", -1).length.toLong))
      .groupBy(_._1)
    got.foreach { case (src, nDocs, total, nBins, lb, gap, loadsMd5) =>
      val docs = bySource(src)
      assert(nDocs == docs.length && total == docs.map(_._3).sum)
      // independent FFD: sort desc by size (ties asc doc_id), first fit
      val loads = scala.collection.mutable.ArrayBuffer[Long]()
      docs.sortBy(d => (-d._3, d._2)).foreach { case (_, _, n) =>
        loads.indexWhere(_ + n <= 512) match {
          case -1 => loads += n
          case i  => loads(i) += n
        }
      }
      assert(loads.forall(_ <= 512), "every bin within budget")
      assert(loads.sum == total, "token conservation")
      assert(nBins == loads.length, s"$src: bin count diverges")
      assert(lb == math.ceil(total / 512.0).toLong && gap == nBins - lb && gap >= 0)
      assert(loadsMd5 == md5hex(loads.mkString(",")), s"$src: load vector diverges")
    }
  }

  test("shard manifest: conservation vs seq pack and driver-side checksum replay") {
    val seqs = DataPrep.seqPack(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val manifest = DataPrep.shardManifest(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(manifest.map(_._2).sum == seqs.length, "every sequence lands in exactly one shard")
    assert(manifest.map(_._4).sum == seqs.map(_._4).sum, "token-mass conservation")
    // independent replay of the shard assignment + commutative checksum
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expect = seqs.map { case (src, seq, nd, st, fd, ld) =>
      val skey = s"$src:$seq"
      val shard = java.lang.Long.parseLong(md5hex(skey).take(4), 16) % DataPrep.ShardCount
      val sig = java.lang.Long.parseLong(md5hex(s"$skey|$nd|$st|$fd|$ld").take(8), 16)
      shard -> sig
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    manifest.foreach { case (shard, _, _, _, checksum) =>
      assert(expect(shard) == checksum, s"checksum mismatch on shard $shard")
    }
  }

  test("vocab encode: id sequence length matches token count; ids bounded") {
    val rows = DataPrep.vocabEncode(spark, sf0001)
      .select("ids", "n_tokens", "n_oov").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ids = r.getString(0).split(",").map(_.toInt)
      assert(ids.length == r.getLong(1), "one id per token, in order")
      assert(ids.count(_ == -1) == r.getLong(2), "OOV marker count = n_oov")
      assert(ids.forall(i => i == -1 || (i >= 0 && i < 16)), "ids within vocab")
    }
  }

  test("seq pack: packing preserves every token and never reorders a shard") {
    val sized = graft.Tables.documents(spark, sf0001)
      .select(sum(size(split(col("text"), " ")).cast("long"))).collect()(0).getLong(0)
    val packs = DataPrep.seqPack(spark, sf0001)
      .orderBy("source", "seq_id").collect()
    assert(packs.map(_.getLong(3)).sum == sized, "token-mass conservation")
    // within a source, doc spans advance strictly with seq_id
    packs.groupBy(_.getString(0)).foreach { case (_, ps) =>
      val spans = ps.sortBy(_.getLong(1)).map(r => (r.getLong(4), r.getLong(5)))
      spans.sliding(2).foreach {
        case Array((_, lastA), (firstB, _)) => assert(lastA < firstB)
        case _ =>
      }
    }
  }

  test("Ranks.releaseAll returns storage to baseline after repeat global-rank runs") {
    // the rank sorts persist MEMORY_AND_DISK blocks (one per call); a
    // long-lived session running the rank consumers repeatedly must be able
    // to reclaim them deterministically — the release registry is the fix
    // for exactly that leak, so pin it: double-run two rank-using queries,
    // release, and assert the persistent-RDD registry is back to baseline
    graft.operators.Ranks.releaseAll()  // clear residue from earlier tests
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    (1 to 2).foreach { _ =>
      DataPrep.vocabEncode(spark, sf0001).collect()
      graft.operators.QualityFilters.qualitySignalAgreement(spark, sf0001).collect()
    }
    val during = spark.sparkContext.getPersistentRDDs.keySet
    assert((during -- baseline).nonEmpty,
      "expected the rank sorts to persist blocks while live")
    graft.operators.Ranks.releaseAll()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after == baseline,
      s"leaked persistent RDDs after releaseAll: ${after -- baseline}")
  }

  test("split assign: buckets are content-stable (subset never reassigns)") {
    // the same doc_id must land in the same split regardless of corpus
    // size — recompute on a half corpus and compare per document
    val docs = graft.Tables.documents(spark, sf0001)
    val full = DataPrep.splitOf(docs)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val half = DataPrep.splitOf(docs.filter(col("doc_id") < 250))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(half.nonEmpty && half.size < full.size)
    half.foreach { case (id, s) =>
      assert(full(id) == s, s"doc $id reassigned: ${full(id)} -> $s")
    }
    val counts = DataPrep.splitAssign(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "valid", "test"))
    assert(counts("train") > counts("valid") && counts("train") > counts("test"),
      "90/5/5 skew must favor train")
  }

  test("weighted mixing: copies bracket the weight, both up- and down-sampling realized") {
    val rows = DataPrep.mixWeightedSample(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20, "one row per source")
    rows.foreach { case (src, n, w, sampled) =>
      // every doc contributes floor(w/1000) or floor(w/1000)+1 copies
      val lo = n * (w / 1000); val hi = n * (w / 1000 + 1)
      assert(sampled >= lo && sampled <= hi, s"$src: $sampled outside [$lo,$hi]")
      // realized permille within a loose binomial band of the target
      val achieved = sampled * 1000.0 / n
      assert(math.abs(achieved - w) <= 220, s"$src: achieved $achieved vs target $w")
    }
    // 2000-permille sources replicate EVERY doc exactly twice (frac = 0)
    rows.filter(_._3 == 2000).foreach { case (src, n, _, sampled) =>
      assert(sampled == 2 * n, s"$src: integral weight must be exact")
    }
    assert(rows.exists(_._3 < 1000) && rows.exists(_._3 > 1000),
      "fixture must exercise down- AND up-sampling")
  }

  test("chunk windows: full token coverage, 8-token overlap, exact reconstruction") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val chunks = DataPrep.chunkWindows(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(chunks.map(_._1).toSet == docs.keySet, "every doc chunks")
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val tk = docs(id).split(" ", -1)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq, "contiguous chunk ids")
      // windows start every 24 tokens; last window reaches the doc end
      sorted.foreach { case (_, idx, n, digest) =>
        val w = tk.slice(idx * 24, idx * 24 + 32)
        assert(n == w.length && digest == md5hex(w.mkString(" ")),
          s"doc $id chunk $idx: window mismatch")
      }
      val last = sorted.last
      assert(last._2 * 24 + last._3 == tk.length, s"doc $id: tail tokens uncovered")
    }
    assert(chunks.exists(_._2 > 0), "fixture must contain multi-chunk docs")
  }

  test("epoch shuffle: distinct content-stable orders per epoch, checksums replay") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = DataPrep.epochShuffle(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(0, 1, 2))
    val ids = Tables.documents(spark, sf0001).select("doc_id").collect()
      .map(_.getLong(0))
    // independent replay: the full permutation + checksum per epoch
    (0 until 3).foreach { e =>
      val perm = ids.map { id =>
        (java.lang.Long.parseLong(md5hex(s"$id#$e").take(15), 16), id)
      }.sortBy(identity).map(_._2)
      val head = rows.filter(_._1 == e).sortBy(_._2).map(_._3).toSeq
      assert(head == perm.take(10).toSeq, s"epoch $e head order diverges")
      val checksum = perm.zipWithIndex.map { case (id, i) =>
        (i + 1).toLong * (java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 1000000L)
      }.sum
      assert(rows.find(_._1 == e).get._5 == checksum, s"epoch $e checksum diverges")
    }
    // epochs must actually produce different orders
    val heads = (0 until 3).map(e => rows.filter(_._1 == e).sortBy(_._2).map(_._3).toSeq)
    assert(heads.distinct.length == 3, "epoch permutations collide")
  }
}
