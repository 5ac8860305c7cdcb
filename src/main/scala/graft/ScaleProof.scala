package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One-off 10× scale proof for the heavy pipeline families (VERDICT r7
  * next-round #8): replicate sf0.1's documents/embeddings/events 10×
  * with shifted ids into /tmp, then run the ANN / dedup / PCA / BPE /
  * sketch families there with AQE on, recording wall times and whether
  * each plan keeps its shape (no new sort-merge joins where a broadcast
  * was the design point). Results land in BASELINE.md by hand — this is
  * evidence, not a driver gate.
  *
  * Replication note: shifting doc_id/vec_id by k·N keeps every
  * derived-key distribution (md5 buckets, shingles, quantized dots)
  * realistic, while the 10 copies of each TEXT create 10-way exact-dup
  * clusters — a harder dedup/clustering input than the original, which
  * is the interesting direction for a scale test.
  */
object ScaleProof {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- build the scaled tables (idempotent per (src, copies)) --------
    // SPARK_GRAFT_SCALE_TABLES narrows which tables replicate (comma
    // list) — a 100× documents-only proof must not pay for a 1B-row
    // events rewrite it never reads
    val tables = sys.env.get("SPARK_GRAFT_SCALE_TABLES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set("documents", "embeddings", "events"))
    val marker = new java.io.File(dst,
      s"_built_${copies}x_${tables.toSeq.sorted.mkString("_")}")
    if (!marker.exists()) {
      def replicate(table: String, idCols: Seq[String]): Unit = if (tables(table)) {
        val base = spark.read.parquet(s"$src/$table.parquet")
        val n = base.count()
        val copiesDf = (0 until copies).map { k =>
          idCols.foldLeft(base)((d, c) =>
            d.withColumn(c, col(c) + lit(k * n)))
        }.reduce(_ unionByName _)
        copiesDf.write.mode(SaveMode.Overwrite)
          .parquet(s"$dst/$table.parquet")
        System.err.println(s"[scale] $table: $n -> ${n * copies}")
      }
      replicate("documents", Seq("doc_id"))
      replicate("embeddings", Seq("vec_id"))
      replicate("events", Seq("event_id"))
      marker.getParentFile.mkdirs()
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
    }

    // ---- the heavy families ------------------------------------------
    val families = Seq(
      "q20_dedup_exact", "q21_near_dup_jaccard", "q22_minhash_lsh",
      "q23_simhash", "q127_dedup_components", "q138_segment_dedup",
      "q24_ann_cosine_topk", "q103_ann_ivf", "q122_ann_ivf_kmeans",
      "q140_kmeans_train", "q309_cluster_topics",
      "q304_bpe_merges", "q308_bpe_encode",
      "q317_pca_top_component", "q321_pca_second_component",
      "q318_jl_projection", "q316_cms_heavy_hitters",
      "q320_epoch_shuffle",
      // web-corpus curation family (r8 cont): URL canonicalization +
      // PSL rollup ride the 10× events; PageRank's per-round join and
      // the robots broadcast are the shapes under test; q339 must stay
      // exchange-free at any size
      "q332_url_canonicalize", "q333_registered_domain_rollup",
      "q336_boilerplate_lines", "q337_anchor_text_agg",
      "q338_pagerank_hosts", "q339_main_content_extract",
      "q340_robots_filter",
      // round-9 additions: the quantile sketch rides 10× events (its
      // state through the shuffle must stay 8 KB per group); ExactSubstr
      // spans ride the 10-way exact-dup cliques of the replicated text
      // (the duplicated-window mass explodes BY DESIGN — work must stay
      // proportional to it); dHash near-dup's band join fan-out is the
      // shape under test; the GIF family is per-row decode, scan-bound
      "q341_sketch_quantile", "q342_exact_substr_spans",
      "q343_gif_anim_stats", "q344_image_dhash_neardup",
      // round-10 additions: the stored-media path exercises the
      // write-once materialization + binary-column scan at 10× volume;
      // WARC decode is the per-row container-framing walk (scan-bound
      // by design — the shape a 100 TB crawl archive scan takes)
      "q345_stored_media_dims", "q346_warc_extract", "q347_warc_gzip",
      // the end-to-end crawl pipeline: its one shuffle is the
      // capture-dedup hash agg — the shape under test at 10×
      "q349_crawl_to_training",
      // round-10 continued: arithmetic JPEG + PDF extraction are
      // per-row decode (scan-bound); the audio fingerprint's exact-band
      // LSH join fan-out under replicated groups is the shape under
      // test (same class as q344's dHash banding)
      "q350_jpeg_arith", "q351_audio_fingerprint_neardup",
      "q352_pdf_text_extract",
      // CDC chunk dedup: the md5 hash agg + join-back is THE dedup
      // shuffle shape; 10× replicas multiply duplicate chunk mass.
      // Lossless JPEG is per-row codec work, scan-bound
      "q353_cdc_chunk_dedup", "q354_jpeg_lossless",
      // container family: TAR/ZIP/zstd framing walks are per-row
      // encode+decode round trips — scan-bound like WARC (q346)
      "q355_tar_members", "q356_zip_extract", "q357_zstd_frames",
      // FLAC codec round trip: per-row encode+decode, scan-bound
      "q358_flac_roundtrip",
      // dataloader exports: the shard packing's prefix-sum + one hash
      // shuffle on shard_id is the shape under test; TFRecord is
      // per-row serialize+parse, scan-bound
      "q359_webdataset_shards", "q360_tfrecord_export",
      // APNG inter-frame composition + MPEG-1 motion compensation:
      // per-row codec round trips, scan-bound
      "q361_apng_anim_stats", "q362_mpeg1_motion", "q363_tiff_decode",
      // zstd-dict storage: the n-gram hash agg + broadcast dict is the
      // shape under test (heavy-hitter class, q316's CMS at 100 TB)
      "q364_zstd_dict_storage",
      // wiki-dump ingest: per-row bzip2 + XML walk, scan-bound
      "q365_wiki_dump_ingest",
      // G.711 is per-row expansion (scan-bound); Gorilla's block-key
      // hash shuffle + per-block codec is the metrics-storage shape —
      // 10x multiplies points per (type, day) block
      "q366_g711_decode", "q367_gorilla_metrics",
      // Avro OCF / MP3 census: per-row walks, scan-bound
      "q368_avro_ocf_ingest", "q369_mp3_census",
      // round-11: incremental delta-vs-corpus dedup — the shapes under
      // test are the exact-hash anti join and the delta↔corpus shingle
      // candidate joins (delta side broadcast-able at test scale, SMJ
      // on shingle keys at corpus scale — q21's documented path);
      // base×base work must NEVER appear at any size
      "q370_dedup_delta",
      // audio near-dup CLUSTERS: where q351's pair list grows ~54× at
      // 10× (quadratic within dup cliques), the cluster output must
      // stay ~linear in inputs — that containment is the shape under
      // test
      "q371_audio_dup_clusters",
      // stored raw-corpus censuses: the write-once materialization +
      // pruned binary-column scan at 10× volume (the q345 shape for the
      // round-10 codec families); decode work rides the stored bytes
      "q372_stored_flac_census", "q373_stored_avro_census",
      "q374_stored_mp3_census", "q375_stored_tar_census",
      "q376_stored_wiki_census", "q377_stored_flac_fingerprint",
      // bucketed-index delta probe: the write-time clustering must keep
      // the corpus index scan exchange-free at 10× probe volume
      "q379_dedup_delta_indexed",
      // stream-built Gorilla blocks: the cogroup fold's (series, day)
      // shuffle + per-block codec at 10× points per block
      "q378_gorilla_stream",
      // incremental ANN index: the frozen-centroid delta append +
      // probed union must keep the broadcast/DPP probe shape at 10×
      "q380_ann_index_delta",
      // incremental BM25 index: stats/df merge by addition; the
      // IN-list probe must stay pruned at 10× postings volume
      "q381_bm25_index_delta",
      // jsonl.gz shard ingest: per-row gunzip + declarative from_json —
      // scan-bound like the other container walks
      "q382_jsonl_shard_ingest",
      // stream-built indexes: the streaming maintainers + compaction at
      // 10× ingest volume, probed through the same batch shapes
      "q383_bm25_index_stream", "q384_ann_index_stream",
      // round-12: retention-delete index lifecycle — the tombstone
      // anti-join and negative-stats fold at 10× index volume; the
      // postings compact must stay a fold, never corpus-sized probe work
      "q385_bm25_retention_delete",
      // centroid refresh: retrain + full re-assignment is the one
      // O(index) maintenance job by design — the shape under test is
      // the broadcast assignment (no SMJ, no cartesian) at 10×
      "q386_ann_centroid_refresh",
      // stored jsonl.gz shards: per-row gunzip over the stored binary
      // column, scan-bound like the other container walks
      "q387_jsonl_stored_shards",
      // the end-to-end corpus-drop pipeline: its build-side shuffles
      // must stay delta-sized (the bucketed-index probe shape); the
      // probe itself is an index scan + broadcast joins
      "q388_corpus_drop_pipeline",
      // retention-masked bucketed indexes: the dead-key anti-joins must
      // stay co-located (no corpus-side exchange) at 10×
      "q389_dedup_index_retention",
      // video near-dup clusters: the q371 containment law for the
      // fourth modality — cluster output must stay ~linear in inputs
      // while the band-join fan-out rides the replica cliques; decode
      // work is per-row over the stored binary column
      "q390_video_dup_clusters",
      // ANN retention deletes: the tombstone anti-join + compacted
      // purge at 10× index volume; probe shape must stay q380's
      // broadcast/DPP with delta-sized shuffles only
      "q391_ann_retention_delete",
      // incremental video dedup: the corpus band index must scan
      // exchange-free (bucketed) at 10× drop volume — the corpus is
      // decoded at index build only, never per drop
      "q392_video_dedup_delta",
      // the composed retention sweep: every delete path (BM25/ANN
      // tombstones, bucketed masks) at 10× index volume; the probe's
      // counters stay broadcast 1-row totals
      "q393_retention_sweep",
      // video index lifecycle: the maintained band index (append +
      // retention mask) must keep the corpus side exchange-free —
      // the dead-key anti-join and the probe joins are co-located on
      // the bucketed band key; corpus decoded at build only
      "q394_video_index_lifecycle",
      // the stream-built twin: maintained store probes must stay
      // broadcast-shaped and flat in index volume, like q394's
      "q397_video_index_stream",
      // coded-residual MPEG-1 round trip: per-row codec work,
      // scan-bound like the other container/codec walks
      "q395_mpeg1_residual_roundtrip",
      // H.264 intra round trip + near-dup pairs: per-row codec work
      // off the stored kind-pruned scan; the pair join must stay a
      // band-key equi-join (never all-pairs)
      "q398_h264_intra_roundtrip",
      "q399_h264_dedup_pairs",
      // cross-codec dedup: MPEG-1 and H.264 decode into one band join
      "q400_crosscodec_dedup",
      // the codec migration: retire the MPEG originals from the
      // maintained index, probes must still dedup via the H.264 twins
      "q401_crosscodec_index_migrate",
      // stream-built exact-dedup ledger: probe = one hash equi-join
      "q402_dedup_ledger_stream",
      // fully stream-maintained delta dedup: both corpus indexes are
      // stream twins; classification must stay shingle-join-bounded
      "q403_dedup_delta_stream_indexed",
      // grown-k refresh: train + atomic full re-assignment at 10×
      // volume — the one O(index) maintenance job; probe must keep the
      // broadcast shape (no SMJ, no cartesian)
      "q396_ann_refresh_grown_k")
    // SPARK_GRAFT_SCALE_ONLY=q341,q342 narrows to matching families —
    // same contract as Verify's SPARK_GRAFT_ONLY (substring match)
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val run = only match {
      case Some(subs) => families.filter(f => subs.exists(f.contains))
      case None => families
    }
    // a filter that matches NOTHING is a typo, not a clean run — fail
    // loudly instead of printing a successful-looking zero-query proof
    require(run.nonEmpty, s"SPARK_GRAFT_SCALE_ONLY=${only.get.mkString(",")} " +
      "matched no scale-proof family")
    val sel = SparkEntry.queries.filter(q => families.exists(q._1.startsWith))
    // SPARK_GRAFT_SCALE_REPEAT=2 runs each family a second time in the
    // SAME process: the first pass pays any write-once fixture/index
    // build (the LocalCache is per-process), the repeat isolates the
    // steady-state probe cost — the number a build-once/probe-many
    // index family is actually judged on
    val repeat = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPEAT", "1").toInt
    val results = scala.collection.mutable.ArrayBuffer
      .empty[(String, Double, Double, Long, String)]
    for (name <- run; fn <- sel.get(name)) {
      var cnt = -1L; var shape = "failed"
      // per-iteration success tracking: a repeat that FAILS after a
      // green first pass must mark the family failed and keep its
      // (typically short) elapsed time out of the warm minimum —
      // otherwise a steady-state regression masquerades as a fast warm
      // time under a stale success shape
      val iters = (0 until repeat).map { _ =>
        val t0 = System.nanoTime()
        var ok = false
        try {
          val df = fn(spark, dst)
          cnt = df.count()
          // plan-SHAPE record: the join strategies the scaled plan
          // picked — a regression to a cartesian product (or an
          // unexpected SMJ where a broadcast is the design point) shows
          // up here, not just as a slow wall time
          val plan = df.queryExecution.executedPlan.toString
          def c(op: String) = plan.sliding(op.length).count(_ == op)
          shape = s"bhj=${c("BroadcastHashJoin")},smj=${c("SortMergeJoin")}," +
            s"bnlj=${c("BroadcastNestedLoopJoin")},cart=${c("CartesianProduct")}"
          require(!plan.contains("CartesianProduct"),
            s"$name regressed to a cartesian product at ${copies}x")
          ok = true
        } catch { case e: Throwable =>
          System.err.println(s"[scale] $name FAILED: ${e.getMessage}")
        }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      if (iters.exists(!_._2)) { shape = "failed"; cnt = -1L }
      val secs = iters.map(_._1)
      val warmOk = iters.tail.filter(_._2).map(_._1)
      // repeat mode with NO successful warm iteration has no warm
      // measurement — report -1 rather than echoing the cold first pass
      // (itself possibly a failure) as a number a BENCH comparison could
      // mistake for a converged floor
      val warm = if (iters.length > 1) { if (warmOk.nonEmpty) warmOk.min else -1.0 }
                 else secs.head
      results += ((name, secs.head, warm, cnt, shape))
      System.err.println(f"[scale] $name%-28s ${secs.head}%8.2fs " +
        f"(warm $warm%.2fs) rows=$cnt  $shape")
    }
    val json = results.map { case (n, s, w, c, sh) =>
      s""""$n":{"sec":${f"$s%.2f"},"warm_sec":${f"$w%.2f"},"rows":$c,"plan":"$sh"}""" }
      .mkString(",")
    println(s"""{"scale":"${copies}x-sf0.1","dir":"$dst","queries":{$json}}""")
    spark.stop()
  }
}
