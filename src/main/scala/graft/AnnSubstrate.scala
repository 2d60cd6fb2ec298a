package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for shared, eagerly-checkpointed index substrates —
  * the IVF coarse quantizer (centroids + assigned lists) and PQ tier
  * (codebooks + codes) the ANN query family reads, and the dedup family's
  * capped simhash pair table + its connected-component labeling
  * (Dedup.nearDupPairsShared / nearDupComponentsShared).
  *
  * Why this exists: the registered batch queries
  * q49/q112/q138/q139/q142/q150/q155/q165/q174/q175–q177 all consume the
  * SAME index built from the SAME corpus with the SAME parameters, and each
  * used to rebuild the identical Lloyd chain per run — the exact shape the
  * shingle-array substrate (Dedup) removed for the inverted-index family.
  * At production scale nobody retrains a coarse quantizer per query: the
  * index is built once and every read is served from it (the streaming
  * twin of this memo is [[graft.streaming.IvfStateStream]], which maintains
  * the same frames as on-disk state). This object is the in-session batch
  * counterpart: one build per (corpus, params) key, every later query reads
  * the checkpointed result.
  *
  * Contract with [[Bench]]: Bench unpersists all persistent RDDs between
  * queries (leftover per-query localCheckpoint blocks otherwise squeeze
  * execution memory), which would destroy a cross-query checkpoint — so
  * every RDD persisted while a protected build runs is registered in
  * [[protectedRddIds]] and Bench skips exactly those. The protected set is
  * deliberately BOUNDED: substrate frames are corpus-row-sized at most
  * (the embeddings table, not the documents' text), there are only a
  * handful of (corpus, params) keys per session, and nothing else may
  * register blocks here. Builds that persist only to DISK (e.g. the
  * IvfStateStream state dir) pass protectNew = false and have their
  * transient blocks unpersisted instead.
  *
  * Keys are EXPLICIT caller-supplied corpus identities (the testdata
  * parquet path) — never derived from DataFrame plan equality, because two
  * in-memory test fixtures with identical schemas must never collide.
  * Callers that cannot name their corpus (tests, ad-hoc frames) simply
  * don't use the memo and get a fresh build: the operators stay pure
  * functions unless a key is passed.
  */
object AnnSubstrate {

  private val cache = mutable.HashMap.empty[(String, String), Any]
  // (applicationId, rddId): RDD ids restart from 0 in a fresh
  // SparkContext, so a process-global Set[Int] would let stale ids
  // from a stopped context shield unrelated new blocks from Bench's
  // sweep (review catch, r12)
  private val protectedIds = mutable.HashSet.empty[(String, Int)]

  /** Persistent-RDD ids of THIS application that must survive Bench's
    * between-query unpersist sweep. */
  def protectedRddIds(spark: SparkSession): Set[Int] = synchronized {
    val app = spark.sparkContext.applicationId
    protectedIds.collect { case (`app`, id) => id }.toSet
  }

  private val exitDirs = mutable.ArrayBuffer.empty[String]
  private lazy val exitHook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => exitDirs.foreach { d =>
      scala.util.Try {
        val root = java.nio.file.Paths.get(d)
        if (java.nio.file.Files.exists(root)) {
          val walk = java.nio.file.Files.walk(root)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
          finally walk.close()
        }
      }
    }))

  /** Register a session-scoped temp directory (the served-state
    * builders' on-disk products) for recursive deletion at JVM exit —
    * without this every bench/test JVM left a corpus-sized
    * graft_*_state directory under /tmp forever (review catch, r12). */
  def deleteOnExit(dir: String): String = synchronized {
    exitHook; exitDirs += dir; dir
  }

  /** Read-only peek at a memoized value (specs use it to prove a
    * registered query's plan reads the SAME checkpointed frame the
    * capped builder produced — an identity check no plan-string
    * fingerprint can fake). Never builds. */
  def cached[T](spark: SparkSession, key: String): Option[T] = synchronized {
    cache.get((spark.sparkContext.applicationId, key)).map(_.asInstanceOf[T])
  }

  /** Memoized build: returns the cached value for (session, key) or runs
    * `build` once. New persistent RDDs created by the build are protected
    * (protectNew = true — checkpoint-backed frames the cache hands out) or
    * unpersisted (protectNew = false — builds whose durable product is on
    * disk, so their transient checkpoint blocks are pure leak). The JVM
    * monitor is reentrant, so a build may itself call getOrBuild. */
  def getOrBuild[T](spark: SparkSession, key: String,
      protectNew: Boolean = true)(build: => T): T = synchronized {
    val sc = spark.sparkContext
    val app = sc.applicationId
    cache.getOrElseUpdate((app, key), {
      val before = sc.getPersistentRDDs.keySet
      val built = build
      val fresh = sc.getPersistentRDDs.keySet -- before
      if (protectNew) protectedIds ++= fresh.map((app, _))
      // a protectNew = false build may nest a protected getOrBuild (the
      // monitor is reentrant) — never unpersist blocks the nested build
      // just registered
      else fresh.filterNot(id => protectedIds((app, id))).foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      built
    }).asInstanceOf[T]
  }

  /** [[getOrBuild]] for checkpoint-backed frame substrates: protects
    * ONLY the blocks the returned frames can still read — every
    * LogicalRDD leaf reachable from their analyzed plans — and frees
    * all other RDDs the build persisted along the way (signature
    * checkpoints, component-iteration labels, Lloyd intermediates).
    * The blanket protectNew = true form pinned those dead
    * intermediates against Bench's between-query sweep for the whole
    * session — the exact memory squeeze the sweep exists to prevent.
    * Safe by construction: anything the final frames still reference
    * appears as a LogicalRDD leaf in their plans and is kept; an
    * eagerly-checkpointed final frame references only its own blocks,
    * so its build inputs free immediately. */
  def getOrBuildFrames[T](spark: SparkSession, key: String)(build: => T)(
      frames: T => Seq[org.apache.spark.sql.DataFrame]): T = synchronized {
    val sc = spark.sparkContext
    val app = sc.applicationId
    cache.getOrElseUpdate((app, key), {
      val before = sc.getPersistentRDDs.keySet
      val built = build
      val keep = frames(built).flatMap(df =>
        df.queryExecution.analyzed.collect {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
        }).toSet
      val fresh = sc.getPersistentRDDs.keySet -- before
      protectedIds ++= (fresh & keep).map((app, _))
      fresh.filterNot(id => protectedIds((app, id))).foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      built
    }).asInstanceOf[T]
  }
}
