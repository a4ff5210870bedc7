package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch same-JVM A/B timer (not part of the driver contract):
  * alternates two plan shapes in ONE session so JIT warmth, page
  * cache, and steal bursts hit both sides symmetrically; prints
  * per-rep seconds + steal brackets and the per-side best-of. The
  * honest way to claim "shape B beats shape A" on this noisy VM. */
object AbProbe {
  def stealTicks(): Long = try {
    val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).get.trim.split("\\s+")
    cpu(8).toLong
  } catch { case _: Throwable => -1L }

  def time(label: String, df: => DataFrame): Double = {
    val s0 = stealTicks(); val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[ab] $label%-10s $dt%7.3f s  steal ${stealTicks() - s0}")
    dt
  }

  /** args: reps (default 3). Edit the shapes below per experiment. */
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.operators.Graph
    def edges = Graph.basketEdges(
      graft.Tables.lineitem(spark, dir).filter(col("l_orderkey") % 4 === 0),
      "l_orderkey", "l_partkey")

    // per-round step-plan dump for the bc-path iterative operators
    // (their terminal frame is an IterState literal, so the full-query
    // explain is just a LocalTableScan — the round plan is the
    // evidence; "old"/"new" = with/without the identity nodes-join)
    if (args.length > 1 && args(1) == "prstep") {
      import org.apache.spark.sql.types.DecimalType
      import graft.operators.Ckpt
      import Ckpt.CkptOps
      def fmt(df: DataFrame): String = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val e0 = Ckpt(edges, eager = false)
      val sym = e0.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(e0.select(col("b").as("src"), col("a").as("dst")))
        .graftCheckpoint(false)
      val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
        .graftCheckpoint(false)
      val n = deg.count()
      val ew = sym.join(broadcast(deg), "src")
        .repartition(col("dst")).persist()
      ew.count()
      val nodes = deg.select(col("src").as("node"))
      val r = nodes.select(col("node"),
        round(lit(1.0) / n, 12).cast(DecimalType(28, 12)).as("rank"))
        .localCheckpoint(true)
      val contrib = ew
        .join(broadcast(r.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node"),
          round(col("rank").cast("double") / col("deg").cast("double"), 12)
            .cast(DecimalType(28, 12)).as("c"))
      val agg = contrib.groupBy("node").agg(sum("c").as("s"))
      def finish(df: DataFrame) = df.select(col("node"),
        round(lit(0.15) / n +
          lit(0.85) * coalesce(col("s").cast("double"), lit(0.0)), 12)
          .cast(DecimalType(28, 12)).as("rank"))
      println("===== PageRank round plan, OLD (nodes left-join) =====")
      println(fmt(finish(nodes.join(agg, Seq("node"), "left"))))
      println("===== PageRank round plan, NEW (inEdgeClosed=true) =====")
      println(fmt(finish(agg)))
      ew.unpersist(blocking = false)
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "pr") {
      import org.apache.spark.sql.types.DecimalType
      import graft.operators.{IterState, Ckpt}
      import Ckpt.CkptOps
      def sym = {
        val e0 = Ckpt(edges, eager = false)
        e0.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(e0.select(col("b").as("src"), col("a").as("dst")))
      }
      // B/C: no nodes-join variant (inner identity on symmetric input)
      def prNoJoin(edgesIn: DataFrame, iters: Int, damping: Double,
          stepsPerJob: Int): DataFrame = {
        val e0 = edgesIn.select(col("src"), col("dst")).graftCheckpoint(false)
        val deg = e0.groupBy("src").agg(count(lit(1)).as("deg"))
          .graftCheckpoint(false)
        val n = deg.count()
        val ew = e0.join(broadcast(deg), "src")
          .repartition(col("dst")).persist()
        val nodes = deg.select(col("src").as("node"))
        val init = nodes.select(col("node"),
          round(lit(1.0) / n, 12).cast(DecimalType(28, 12)).as("rank"))
        def step(r: DataFrame): DataFrame = {
          val contrib = ew
            .join(broadcast(r.withColumnRenamed("node", "src")), "src")
            .select(col("dst").as("node"),
              round(col("rank").cast("double") / col("deg").cast("double"), 12)
                .cast(DecimalType(28, 12)).as("c"))
          contrib.groupBy("node").agg(sum("c").as("s"))
            .select(col("node"),
              round(lit(1.0 - damping) / n +
                lit(damping) * coalesce(col("s").cast("double"), lit(0.0)), 12)
                .cast(DecimalType(28, 12)).as("rank"))
        }
        val ranks = IterState.iterate(init, iters, stepsPerJob)(step)
        ew.unpersist(blocking = false)
        ranks.select(col("node"),
          round(col("rank").cast("double"), 9).as("rank"))
      }
      def q(df: DataFrame) =
        df.orderBy(col("rank").desc, col("node")).limit(50)
      for (_ <- 1 to reps) {
        time("A:cur", q(graft.operators.PageRank.run(sym, 5, 0.85)))
        time("B:nojoin2", q(prNoJoin(sym, 5, 0.85, 2)))
        time("C:nojoin5", q(prNoJoin(sym, 5, 0.85, 5)))
        time("D:cur", q(graft.operators.PageRank.run(sym, 5, 0.85)))
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // q229 anti-join strategy A/B: SortMergeJoin (planner default —
    // sorts the 9M-row scored side) vs SHUFFLE_HASH hint on the edge
    // side (no sorts; build = per-partition edge hash table)
    if (args.length > 1 && args(1) == "aahint") {
      import graft.operators.Ckpt.CkptOps
      def variant(hint: Boolean): DataFrame = {
        val e = edges.select(col("a"), col("b")).graftCheckpoint(true)
        val nbrs = e.select(col("a").as("w"), col("b").as("n"))
          .unionAll(e.select(col("b").as("w"), col("a").as("n")))
        val wedges = nbrs.groupBy("w")
          .agg(sort_array(org.apache.spark.sql.graftext.BoundedCollectAgg
            .boundedCollectSet(col("n"), 10000)).as("ns"))
          .filter(col("ns").isNotNull && size(col("ns")) >= 2)
          .select((lit(1.0) / log(size(col("ns")).cast("double"))).as("wt"),
            explode(org.apache.spark.sql.graftext.PairsAscExpr
              .pairsAsc(col("ns"))).as("p"))
          .select(col("wt"), col("p._1").as("u"), col("p._2").as("v"))
        val scored = wedges.groupBy("u", "v")
          .agg(round(sum(col("wt")), 6).as("aa_score"))
        val eUV = e.withColumnRenamed("a", "u").withColumnRenamed("b", "v")
        scored
          .join(if (hint) eUV.hint("shuffle_hash") else eUV,
            Seq("u", "v"), "left_anti")
          .orderBy(col("aa_score").desc, col("u"), col("v"))
          .limit(20)
      }
      locally {
        val a = variant(false).collect().map(_.toString).toSeq
        val b = variant(true).collect().map(_.toString).toSeq
        println(s"[aahint] parity=${a == b} n=${a.size}")
      }
      for (i <- 1 to reps) {
        if (i % 2 == 1) { time("A:smj", variant(false)); time("B:shj", variant(true)) }
        else { time("B:shj", variant(true)); time("A:smj", variant(false)) }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // q344 Jonckheere–Terpstra stage decomposition
    if (args.length > 1 && args(1) == "jt") {
      import graft.operators.Ckpt.CkptOps
      import org.apache.spark.sql.expressions.Window
      val src = graft.Tables.lineitem(spark, dir)
        .withColumn("qbucket", floor(col("l_quantity") / 10).cast("long"))
        .select(col("qbucket").as("g"),
          col("l_extendedprice").cast("double").as("v"))
      def cells = src.groupBy("g", "v").agg(count(lit(1)).as("c"))
        .graftCheckpoint(false)
      locally {
        val c = cells
        println(s"[jt] cells=${c.count()} pooled=${c.select("v").distinct().count()}")
      }
      for (_ <- 1 to reps) {
        val c = cells
        time("cells", c)
        val gIdx = broadcast(c.groupBy("g").agg(sum(col("c")).as("ng"))
          .withColumn("gi", row_number().over(Window.orderBy("g"))))
        val pooled = c.select("v").distinct()
        val grid = pooled.crossJoin(gIdx.select("g", "gi"))
          .join(c, Seq("g", "v"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
        time("grid", grid)
        time("full", graft.operators.Ranks.jonckheereTerpstra(
          graft.Tables.lineitem(spark, dir)
            .withColumn("qbucket", floor(col("l_quantity") / 10)
              .cast("long")),
          "qbucket", "l_extendedprice"))
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // q229 key-packing A/B: the (u,v) 9M-distinct-key wedge aggregate
    // with the two long key columns packed into ONE long (u<<32 | v) —
    // half the shuffle key bytes, single-column hash. Valid only while
    // ids < 2^32 (true at every test SF; a production guard would need
    // a max-id check), so this is a MEASUREMENT, not a shipped shape,
    // unless the win is large.
    if (args.length > 1 && args(1) == "aapack") {
      import graft.operators.Ckpt.CkptOps
      def packed: DataFrame = {
        val e = edges.select(col("a"), col("b")).graftCheckpoint(true)
        val nbrs = e.select(col("a").as("w"), col("b").as("n"))
          .unionAll(e.select(col("b").as("w"), col("a").as("n")))
        val wedges = nbrs.groupBy("w")
          .agg(sort_array(org.apache.spark.sql.graftext.BoundedCollectAgg
            .boundedCollectSet(col("n"), 10000)).as("ns"))
          .filter(col("ns").isNotNull && size(col("ns")) >= 2)
          .select((lit(1.0) / log(size(col("ns")).cast("double"))).as("wt"),
            explode(org.apache.spark.sql.graftext.PairsAscExpr
              .pairsAsc(col("ns"))).as("p"))
          .select(col("wt"),
            shiftleft(col("p._1"), 32).bitwiseOR(col("p._2")).as("uv"))
        val scored = wedges.groupBy("uv")
          .agg(round(sum(col("wt")), 6).as("aa_score"))
          .select(shiftright(col("uv"), 32).as("u"),
            col("uv").bitwiseAND(lit((1L << 32) - 1)).as("v"),
            col("aa_score"))
        scored
          .join(e.withColumnRenamed("a", "u").withColumnRenamed("b", "v"),
            Seq("u", "v"), "left_anti")
          .orderBy(col("aa_score").desc, col("u"), col("v"))
          .limit(20)
      }
      def current: DataFrame =
        Graph.adamicAdar(edges, topK = 20, edgesCanonical = true)
      locally {
        val a = current.collect().map(_.toString).sorted.toSeq
        val b = packed.collect().map(_.toString).sorted.toSeq
        println(s"[aapack] parity=${a == b} n=${a.size}")
      }
      for (i <- 1 to reps) {
        if (i % 2 == 1) { time("A:cur", current); time("B:pack", packed) }
        else { time("B:pack", packed); time("A:cur", current) }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // q199 SetSimJoin stage decomposition: where do the 5.8 s go —
    // shingle pass, df rank, prefix build, candidate join, or verify?
    if (args.length > 1 && args(1) == "ppjoin") {
      import graft.operators.Ckpt.CkptOps
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions
      val tau = 0.6
      def docs = graft.Tables.documents(spark, dir)
      def arrs = docs.select(col("doc_id"),
        array_distinct(TextFunctions.shingles(
          TextFunctions.tokens(col("text")), 3)).as("els0"))
        .graftCheckpoint(false)
      def stagesOf(a: DataFrame) = {
        val elems = a.select(col("doc_id"), size(col("els0")).as("len"),
          explode(col("els0")).as("el"))
        val dfr = elems.groupBy("el").agg(count(lit(1)).as("df"))
        val ranked = elems.join(dfr, "el")
          .withColumn("r", row_number().over(Window.partitionBy("doc_id")
            .orderBy(col("df").asc, col("el").asc)))
        val prefix = ranked.filter(
          col("r") <= col("len") - ceil(lit(tau) * col("len")) + 1)
        val cands = prefix.as("l").join(prefix.as("r"),
            col("l.el") === col("r.el") &&
              col("l.doc_id") < col("r.doc_id") &&
              ceil(lit(tau) * greatest(col("l.len"), col("r.len")))
                <= least(col("l.len"), col("r.len")))
          .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
          .distinct()
        (elems, dfr, prefix, cands)
      }
      // one-time row counts
      locally {
        val (elems, dfr, prefix, cands) = stagesOf(arrs)
        println(s"[ppjoin] elems=${elems.count()} df=${dfr.count()} " +
          s"prefix=${prefix.count()} cands=${cands.count()} " +
          s"out=${graft.operators.SetSimJoin.jaccardJoin(
            docs, "doc_id", "text", tau, 3).count()}")
      }
      for (_ <- 1 to reps) {
        val a = arrs
        val (elems, dfr, prefix, cands) = stagesOf(a)
        time("arrs", a)
        time("elems", elems)
        time("df", dfr)
        time("prefix", prefix)
        time("cands", cands)
        time("full", graft.operators.SetSimJoin.jaccardJoin(
          docs, "doc_id", "text", tau, 3))
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // q199 candidate-stage A/B: prefix self-join (current) vs
    // groupBy(el) + in-group pairsAsc (the repo's LSH-band pattern,
    // exact here because postings are uncapped)
    if (args.length > 1 && args(1) == "ppjoin2") {
      import graft.operators.Ckpt.CkptOps
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions
      val tau = 0.6
      def docs = graft.Tables.documents(spark, dir)
      def joinVariant = graft.operators.SetSimJoin.jaccardJoin(
        docs, "doc_id", "text", tau, 3)
      def groupVariant: DataFrame = {
        val arrs = docs.select(col("doc_id"),
          array_distinct(TextFunctions.shingles(
            TextFunctions.tokens(col("text")), 3)).as("els0"))
          .graftCheckpoint(false)
        val elems = arrs.select(col("doc_id"), size(col("els0")).as("len"),
          explode(col("els0")).as("el"))
        val dfr = elems.groupBy("el").agg(count(lit(1)).as("df"))
        val ranked = elems.join(dfr, "el")
          .withColumn("r", row_number().over(Window.partitionBy("doc_id")
            .orderBy(col("df").asc, col("el").asc)))
        val prefix = ranked.filter(
          col("r") <= col("len") - ceil(lit(tau) * col("len")) + 1)
        val cands = prefix
          .groupBy("el")
          .agg(sort_array(collect_list(
            struct(col("doc_id"), col("len")))).as("ps"))
          .filter(size(col("ps")) >= 2)
          .select(explode(org.apache.spark.sql.graftext.PairsAscExpr
            .pairsAsc(col("ps"))).as("p"))
          .select(col("p._1.doc_id").as("a"), col("p._1.len").as("la"),
            col("p._2.doc_id").as("b"), col("p._2.len").as("lb"))
          .filter(ceil(lit(tau) * greatest(col("la"), col("lb")))
            <= least(col("la"), col("lb")))
          .select("a", "b").distinct()
          .graftCheckpoint(false)
        val candIds = cands
          .select(explode(array(col("a"), col("b"))).as("doc_id"))
          .distinct()
        val sets = arrs.join(candIds, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), sort_array(col("els0")).as("els"),
            size(col("els0")).cast("long").as("n"))
          .graftCheckpoint(false)
        cands
          .join(sets.select(col("doc_id").as("a"), col("els").as("ea"),
            col("n").as("na")), "a")
          .join(sets.select(col("doc_id").as("b"), col("els").as("eb"),
            col("n").as("nb")), "b")
          .withColumn("inter",
            size(array_intersect(col("ea"), col("eb"))).cast("double"))
          .withColumn("jaccard",
            round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
          .filter(col("inter") / (col("na") + col("nb") - col("inter"))
            >= tau)
          .select(col("a"), col("b"), col("jaccard"))
      }
      // parity first (cheap sanity; the oracle is the real gate)
      locally {
        val a = joinVariant.collect().map(_.toString).sorted.toSeq
        val c = groupVariant.collect().map(_.toString).sorted.toSeq
        println(s"[ppjoin2] parity=${a == c} n=${a.size}")
      }
      for (i <- 1 to reps) {
        if (i % 2 == 1) { time("A:join", joinVariant); time("C:group", groupVariant) }
        else { time("C:group", groupVariant); time("A:join", joinVariant) }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      spark.stop(); return
    }

    // driver-heap audit for Dedup.nearDupClusters' union-find fast
    // path: how much heap do the collected Row[] + the boxed HashMaps
    // actually hold at N string pairs? (Sizes the NearDupStateUpTo
    // bound honestly instead of inheriting PageRank's 4M.)
    if (args.length > 1 && args(1) == "ufheap") {
      def used(): Long = {
        System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(300)
        val r = Runtime.getRuntime; r.totalMemory - r.freeMemory
      }
      for (n <- Seq(1000000L, 4000000L)) {
        val base = used()
        // realistic ids: 14-char doc keys, chain pairs (worst-case one
        // giant component for the parent map)
        var rows = spark.range(n).select(
          concat(lit("doc_"), lpad(col("id").cast("string"), 10, "0"))
            .as("a"),
          concat(lit("doc_"),
            lpad(((col("id") + 1) % n).cast("string"), 10, "0")).as("b"))
          .collect()
        val mRows = used() - base
        val parent = new java.util.HashMap[Any, Any]()
        def find(x: Any): Any = {
          var r0 = x
          while ({ val p = parent.get(r0); p != null && p != r0 })
            r0 = parent.get(r0)
          var c = x
          while ({ val p = parent.get(c); p != null && p != c }) {
            val nx = parent.get(c); parent.put(c, r0); c = nx
          }
          if (parent.get(r0) == null) parent.put(r0, r0)
          r0
        }
        rows.foreach { row =>
          val ra = find(row.get(0)); val rb = find(row.get(1))
          if (ra != rb) parent.put(ra, rb)
        }
        val mPeak = used() - base // rows AND parent live together here
        rows = null
        val minOf = new java.util.HashMap[Any, Any]()
        parent.keySet().forEach { k =>
          val r0 = find(k)
          val cur = minOf.get(r0)
          if (cur == null
              || k.asInstanceOf[Comparable[Any]].compareTo(cur) < 0)
            minOf.put(r0, k)
        }
        val lrows = new java.util.ArrayList[org.apache.spark.sql.Row]()
        parent.keySet().forEach { k =>
          lrows.add(org.apache.spark.sql.Row(k, minOf.get(find(k))))
        }
        val mMaps = used() - base
        println(f"[ufheap] n=$n%,d  collect=${mRows / 1e6}%.0f MB  " +
          f"peak(rows+parent)=${mPeak / 1e6}%.0f MB  " +
          f"maps+label-rows=${mMaps / 1e6}%.0f MB  (${lrows.size}%,d labels)")
      }
      spark.stop(); return
    }

    if (args.length > 1 && args(1) == "counts") {
      val e = edges.localCheckpoint(true)
      println("edges=" + e.count())
      val nbrs = e.select(col("a").as("w"), col("b").as("n"))
        .unionAll(e.select(col("b").as("w"), col("a").as("n")))
      val grp = nbrs.groupBy("w")
        .agg(sort_array(org.apache.spark.sql.graftext.BoundedCollectAgg
          .boundedCollectSet(col("n"), 10000)).as("ns"))
        .filter(col("ns").isNotNull && size(col("ns")) >= 2)
      println("middles=" + grp.count())
      val wedges = grp.select(explode(org.apache.spark.sql.graftext
        .PairsAscExpr.pairsAsc(col("ns"))).as("p"))
      println("wedges=" + wedges.count())
      println("distinct_uv=" +
        wedges.select(col("p._1"), col("p._2")).distinct().count())
      spark.stop(); return
    }

    // stage decomposition when args(1) == "stages"
    if (args.length > 1 && args(1) == "stages") {
      import graft.operators.Ckpt.CkptOps
      for (_ <- 1 to reps) {
        time("edges", edges)
        val e = edges.graftCheckpoint(true)
        time("grp", {
          val nbrs = e.select(col("a").as("w"), col("b").as("n"))
            .unionAll(e.select(col("b").as("w"), col("a").as("n")))
          nbrs.groupBy("w")
            .agg(sort_array(org.apache.spark.sql.graftext.BoundedCollectAgg
              .boundedCollectSet(col("n"), 10000)).as("ns"))
            .filter(col("ns").isNotNull && size(col("ns")) >= 2)
        })
        time("explode", {
          val nbrs = e.select(col("a").as("w"), col("b").as("n"))
            .unionAll(e.select(col("b").as("w"), col("a").as("n")))
          nbrs.groupBy("w")
            .agg(sort_array(org.apache.spark.sql.graftext.BoundedCollectAgg
              .boundedCollectSet(col("n"), 10000)).as("ns"))
            .filter(col("ns").isNotNull && size(col("ns")) >= 2)
            .select((lit(1.0) / log(size(col("ns")).cast("double"))).as("wt"),
              explode(org.apache.spark.sql.graftext.PairsAscExpr
                .pairsAsc(col("ns"))).as("p"))
        })
        time("full", Graph.adamicAdar(e, topK = 20, edgesCanonical = true))
      }
      spark.stop(); return
    }

    // A: pre-round-13 adamicAdar shape (canon + separate deg + join)
    def shapeA: DataFrame = {
      import graft.operators.Ckpt.CkptOps
      val e = edges.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct().graftCheckpoint(true)
      val nbrs = e.select(col("a").as("w"), col("b").as("n"))
        .unionAll(e.select(col("b").as("w"), col("a").as("n")))
      val deg = nbrs.groupBy("w").agg(count(lit(1)).as("deg"))
      val wedges = nbrs.groupBy("w")
        .agg(sort_array(org.apache.spark.sql.graftext.BoundedCollectAgg
          .boundedCollectSet(col("n"), 10000)).as("ns"))
        .filter(col("ns").isNotNull && size(col("ns")) >= 2)
        .select(col("w"), explode(org.apache.spark.sql.graftext.PairsAscExpr
          .pairsAsc(col("ns"))).as("p"))
        .select(col("w"), col("p._1").as("u"), col("p._2").as("v"))
      val scored = wedges.join(deg, "w").groupBy("u", "v")
        .agg(round(sum(lit(1.0) / log(col("deg").cast("double"))), 6)
          .as("aa_score"))
      scored.join(e.withColumnRenamed("a", "u").withColumnRenamed("b", "v"),
          Seq("u", "v"), "left_anti")
        .orderBy(col("aa_score").desc, col("u"), col("v")).limit(20)
    }
    // B: current adamicAdar (fused deg, canon skipped)
    def shapeB: DataFrame =
      Graph.adamicAdar(edges, topK = 20, edgesCanonical = true)

    val as = (1 to reps).map { i =>
      if (i % 2 == 1) {
        val a = time("A:old", shapeA); val b = time("B:new", shapeB); (a, b)
      } else {
        val b = time("B:new", shapeB); val a = time("A:old", shapeA); (a, b)
      }
    }
    println(f"[ab] best A ${as.map(_._1).min}%.3f  best B ${as.map(_._2).min}%.3f")
    spark.stop()
  }
}
