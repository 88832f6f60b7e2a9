package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[4,8,8192] runs the whole gate on
    // REAL multi-JVM executors (tools/cluster_smoke.sh) — the cheapest
    // way to catch accidental driver-JVM-state assumptions (codec
    // statics, scratch-dir file moves, per-partition digest reuse)
    // before a real cluster would. Executors are fresh JVMs that know
    // nothing of sbt: they need the forked run's classpath and the same
    // JDK17 --add-opens the driver gets from build.sbt.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder0 = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same per-query split sizing as Bench (graft.ScanPolicy, applied
      // before each query below): text family 512 KB, scan-light set the
      // wider r9 value — the gate runs under the same confs it benches
      .config("spark.sql.files.maxPartitionBytes", ScanPolicy.textSplit)
    val builder = if (master.startsWith("local-cluster")) {
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar")
        .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
      builder0
        .config("spark.executor.extraClassPath",
          System.getProperty("java.class.path"))
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "4g"))
    } else builder0
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration escape hatch: SPARK_GRAFT_ONLY=q_a,q_b runs a subset
    // (the driver never sets it, so the gate always runs everything)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    // SPARK_GRAFT_STREAMS=N runs the gate as N CONCURRENT query streams
    // (real pipelines share one cluster): each stream gets its own
    // spark.newSession() so per-query session confs (ScanPolicy splits,
    // the iteration AQE toggle) stay isolated, while executors, caches
    // and scratch dirs are shared — exactly the surface where cross-query
    // interference would corrupt results, which the DuckDB hash compare
    // then catches. Default 1 = the serial gate, byte-for-byte as before.
    val streams = math.max(1, sys.env.getOrElse("SPARK_GRAFT_STREAMS", "1").toInt)
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]()
    selected.foreach(kv => queue.add(kv))
    def drain(s: SparkSession): Unit = {
      var kv = queue.poll()
      while (kv != null) {
        val (name, fn) = kv
        ScanPolicy.applyFor(s, name)
        // inter-query storage release (serial mode only): persisted/
        // checkpointed blocks from earlier queries must not squeeze this
        // one's execution memory. Under concurrent streams OTHER queries
        // are still running — releasing their blocks mid-flight is the
        // kind of interference this mode exists to catch, not cause.
        if (streams == 1)
          s.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
        try fn(s, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        kv = queue.poll()
      }
    }
    if (streams == 1) drain(spark)
    else {
      val threads = (1 to streams).map { i =>
        val t = new Thread(() => {
          val s = spark.newSession()
          // the stream's session must be this thread's ACTIVE session:
          // the kernel Column helpers register graft_* functions into the
          // active session, and a newSession has its own function
          // registry (first caught here: 13 queries failed with
          // UNRESOLVED_ROUTINE graft_shingle_hash under 4 streams). A
          // production multi-session deployment gets the same effect from
          // spark.sql.extensions=graft.functions.GraftExtensions.
          SparkSession.setActiveSession(s)
          graft.functions.GraftFunctions.register(s)
          drain(s)
        }, s"verify-stream-$i")
        t.start(); t
      }
      threads.foreach(_.join())
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // scale-oracle recipes (model-pinned SQL / iterative closure) for the
    // queries whose committed oracle is infeasible at 100x/zipf — see
    // SparkEntry.pinnedOracle and tools/pinned_check.py
    val pinnedJson = SparkEntry.pinnedOracle.map { case (k, m) =>
      s"${q(k)}: ${m.map { case (mk, mv) => s"${q(mk)}: ${q(mv)}" }
        .mkString("{", ",", "}")}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/pinned_oracle.json"), pinnedJson)
    // SPARK_GRAFT_EXPORT_MODELS=1: export the trained ANN models the
    // pinned oracles read (`__m_*` views over _models/<name>). Training
    // is deterministic (6-decimal per-iteration quantization, lowest-id
    // seeds, lowest-cell ties), so these parquet files are hash-stable
    // and EQUAL the models the gated queries train internally — the
    // unrolled oracle proves that equality wherever it is feasible.
    if (sys.env.get("SPARK_GRAFT_EXPORT_MODELS").contains("1")) {
      import spark.implicits._
      import graft.operators.SimilarityOps
      val emb = Tables.embeddings(spark, sfDir)
      val cents = SimilarityOps.trainIvfCentroids(emb, "vec_id",
        "embedding", nlist = 8, iterations = 2, roundDecimals = Some(6))
      val pqBooks = SimilarityOps.trainPqCodebooks(emb, "vec_id",
        "embedding", m = 2, cells = 4, iterations = 2)
      val ivfpqBooks = SimilarityOps.trainPqResidualCodebooks(emb, "vec_id",
        "embedding", cents, m = 2, cells = 4, iterations = 2)
      def write(name: String, rows: Seq[(Long, Seq[Double])]): Unit =
        rows.toDF("cell", "cv").coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/_models/$name")
      write("ivf_cents", cents.toSeq.map { case (c, cv, _) => (c, cv.toSeq) })
      for ((books, nm) <- Seq((pqBooks, "pq_book"), (ivfpqBooks, "ivfpq_book"));
           (book, j) <- books.zipWithIndex)
        write(s"$nm$j",
          book.toSeq.zipWithIndex.map { case ((cv, _), c) => (c.toLong, cv.toSeq) })
    }
    spark.stop()
  }
}
