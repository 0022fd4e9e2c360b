package graft.util

import org.apache.spark.sql.SparkSession

/** E6 — session configuration (SURVEY.md §2.7). The reference pins its
  * session conf in the loader (Delta extension, hive catalog,
  * `spark.sql.shuffle.partitions=200` — /root/reference/FInal/
  * load_script.py:58-69); our equivalent is a builder that encodes the
  * engine's recommended conf for Spark 4:
  *
  *  - AQE on (default, made explicit): runtime join re-selection,
  *    shuffle coalescing, and skew-join splitting replace the
  *    reference's fixed shuffle width at scale;
  *  - shuffle partitions sized to the deployment (cores locally; on a
  *    cluster set `spark.sql.adaptive.coalescePartitions.initialPartitionNum`
  *    high and let AQE coalesce);
  *  - UTC session TZ + nanos handling for deterministic timestamp
  *    semantics (see [[Tables.ensureSessionConf]]);
  *  - partition-column type inference off: `dt=2024-06-28` directory
  *    values stay strings on read-back (the loader's contract);
  *  - [[graft.plans.GraftExtensions]] installed, so the native codegen
  *    functions (`float_dot`, `hyperplane_sigs`) resolve from SQL text.
  */
object GraftSession {

  def builder(appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val cores = Runtime.getRuntime.availableProcessors()
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // SPARK_GRAFT_SHUFFLE_PARTITIONS overrides the =cores local
      // default without a code change — the knob the heap/partition
      // scaling rule turns at high data volume (SCALE_NOTES round 11:
      // partition COUNT, not heap, is what must scale with volume;
      // =cores partitions at sf10 puts ~2M rows in every join/agg
      // task and OOMs an 8g driver that 512 partitions run fine in)
      .config("spark.sql.shuffle.partitions",
        shufflePartitions
          .orElse(sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
            .map(v => try v.trim.toInt catch {
              case _: NumberFormatException => throw new
                  IllegalArgumentException(
                "SPARK_GRAFT_SHUFFLE_PARTITIONS must be an integer, " +
                  s"got '$v'")
            }))
          .getOrElse(cores).toString)
      // r16: file-listing strategy. The default threshold (32 paths)
      // launches a DISTRIBUTED listing job whenever a scan names more
      // than 32 files — the media/video stores and the streaming
      // file sources routinely name a few hundred, and each such job
      // costs a full scheduler round-trip with one task per path
      // (profiled: 0.9 s per micro-batch at sf0.1 just to re-list
      // ~500 asset paths). Driver-side listing of a few thousand
      // paths is cheaper on any filesystem (it is one RPC per path,
      // pooled); the distributed job only pays off at tens of
      // thousands of paths. Parameterized for deployments whose
      // stores really are that wide (SPARK_GRAFT_LISTING_THRESHOLD).
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LISTING_THRESHOLD", "4096"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    master.orElse(
      if (sys.props.contains("spark.master")) None
      else Some(s"local[$cores]")).fold(b)(b.master)
  }

  def local(appName: String = "graft-local", cpus: Int = 0): SparkSession = {
    val n = if (cpus > 0) cpus else Runtime.getRuntime.availableProcessors()
    builder(appName, Some(s"local[$n]"), Some(n)).getOrCreate()
  }
}
