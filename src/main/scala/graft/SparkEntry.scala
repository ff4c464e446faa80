package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private val modules: Seq[QueryDef] =
    // flat Seq-of-Seqs (not a ++ chain): 140+ chained ++ applications
    // nest deep enough to overflow scalac's default thread stack
    Seq(
      Relational.all, EventOps.all, GraphOps.all, TextOps.all,
      Dedup.all, Similarity.all, Multimodal.all, SchedulerQueries.all,
      Analytics.all, Joins.all, Reshape.all, Subqueries.all,
      Pipelines.all, CorpusOps.all, ReportingOps.all, TrainingOps.all,
      CurationOps.all, ScoringOps.all, GraphAnalytics.all, ScaleOps.all,
      ProductAnalytics.all, SketchOps.all, SignalOps.all, AttributionOps.all,
      AuditOps.all, RecsysOps.all, SegmentOps.all, LifecycleOps.all,
      StatOps.all, IntegrityOps.all, InsightOps.all, DriftOps.all,
      GrowthOps.all, EvalOps.all, TemporalOps.all, TokenizerOps.all,
      ProfileOps.all, DiversityOps.all, RevenueOps.all, StructureOps.all,
      PruneOps.all, AssuranceOps.all, IntakeOps.all, FitnessOps.all,
      RefineOps.all, RerankOps.all, AllocOps.all, RobustOps.all,
      PolicyOps.all, NetworkOps.all, QuantizeOps.all, TrendOps.all,
      ValidationOps.all, LinkOps.all, PretrainOps.all, DiscoveryOps.all,
      FeatureOps.all, CausalOps.all, TuneOps.all, GenOps.all,
      SreOps.all, ControlOps.all, ReleaseOps.all, StorageOps.all,
      CboOps.all, CompeteOps.all, JourneyOps.all, IrOps.all,
      OpsResearchOps.all, PrivacyOps.all, PrefOps.all, SeriesOps.all,
      MineOps.all, SeedOps.all, GovernOps.all, DecideOps.all,
      TrialOps.all, IterOps.all, DetectOps.all, MeasureOps.all,
      OfflineEvalOps.all, LabelQualityOps.all, AcquireOps.all, RepresentOps.all,
      ValuationOps.all, CalibrateOps.all, SelectOps.all, ScalingOps.all,
      SafetyOps.all, TrussOps.all, CohortStatOps.all, DesignOps.all,
      BpeOps.all, EntropyOps.all, MergeAuditOps.all, MonitorOps.all,
      SkylineOps.all, MultiTestOps.all, DecompOps.all, TransportOps.all,
      HeavyOps.all, PhraseScanOps.all, TemporalGraphOps.all, ConformalOps.all,
      FacilityOps.all, AnfOps.all, QuantRegOps.all, CompactOps.all,
      QueueOps.all, HistogramOps.all, LDiversityOps.all, FoldOps.all,
      MedianOps.all, QteOps.all, PpsOps.all, BreakpointOps.all,
      BottleneckOps.all, NeymanOps.all, ForecastOps.all, RankCorrOps.all,
      GmmOps.all, RichnessOps.all, GridClusterOps.all, CaptureOps.all,
      TheilOps.all, HuberOps.all, BoxCoxOps.all, ReliabilityOps.all,
      KruskalOps.all, PettittOps.all, ExtremeOps.all, DispersionOps.all,
      CycleOps.all, PeriodOps.all, MatchingOps.all, PartitionPlanOps.all,
      AnovaOps.all, WilcoxonOps.all, ShrinkOps.all, BetweennessOps.all,
      SaxOps.all, FriedmanOps.all, PairedBinaryOps.all, FisherOps.all,
      SeriesDiagOps.all, RegressionOps.all, LongMemoryOps.all, MstOps.all, SpectralOps.all,
      HoltWintersOps.all, StationarityOps.all, CoxOps.all, OrderedAltOps.all,
      RansacOps.all, BayesAbOps.all, JoinPlanOps.all, AssocOps.all, StratifiedAssocOps.all, RecordsOps.all,
      SeasonalCatalogOps.all, StoreDashboardQueries.all,
      SccOps.all, KmvSetOps.all, TopKOps.all, MerkleOps.all,
      PlannerOps.all, ShardOps.all, LayoutAdvisorOps.all,
      FreqMomentOps.all, WaveletOps.all, DtwOps.all,
      CacheSimOps.all, SpatialOps.all, PrioritySampleOps.all,
      CslsOps.all, QuantileSelOps.all, ReservoirAuditOps.all,
      SuffixDupOps.all, JoinSizeOps.all,
      SeqPatOps.all, PermTestOps.all, MarkovChainOps.all,
      ImputeOps.all, UniverseSampleOps.all,
      SlidingDistinctOps.all, CurationFunnelOps.all, DatalogOps.all,
      BitemporalOps.all, FunnelWindowOps.all, CdcOps.all, ResampleOps.all,
      MatrixProfileOps.all, HmmOps.all,
      SpatialStatOps.all, CointegOps.all, NaiveBayesOps.all,
      LinkageOps.all, PprOps.all, KalmanOps.all, CcfOps.all, BleuOps.all,
      MmrOps.all, SetCoverOps.all, DawidSkeneOps.all,
      CdcChunkOps.all, NetStructOps.all,
      RidgeOps.all, ChowOps.all, QlmOps.all, RankAggOps.all,
      FeatureEngOps.all, CountModelOps.all, AucOps.all,
      SeriesCleanOps.all, UpliftOps.all, RandResponseOps.all,
      AdstockOps.all, BowtieOps.all, ErrMetricOps.all,
      AgreementOps.all, RboOps.all, OnlineStoreOps.all,
      LinkageStringOps.all, RatingOps.all, VolatilityOps.all,
      MembershipOps.all, RougeOps.all, HbosOps.all, MrrEvalOps.all,
      VideoOps.all, JsonlSourceOps.all, SsspOps.all, NbFitOps.all,
      HomogeneityOps.all,
      GoodTuringOps.all, ConcentrationOps.all, ZipfFitOps.all, HeapsOps.all,
      KeynessG2Ops.all, LmJmOps.all, PageHinkleyOps.all, ViterbiOps.all,
      DgimOps.all, LcsOps.all, DsirOps.all, SemDedupOps.all
    ).flatten

  /** Flagship: a full engine pass on sf0.001 — build a 4-stage job DAG
    * (ingest → {enrich, corpus} → report), schedule it through the
    * store's FSM (reserve → run → finish via the readiness anti-join).
    * The enrich branch is the analytic path (joins + decimal agg); the
    * corpus branch runs the training-data path (exact dedup over the
    * documents table); report consumes enrich. Driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir   = "/root/testdata/sf0.001"
    val store = new InMemoryJobStore
    store.install()
    store.transactGraph(JobGraph.jobGraph(Map(
      "enrich" -> Seq("ingest"),
      "corpus" -> Seq("ingest"),
      "report" -> Seq("enrich", "corpus"))))

    import org.apache.spark.sql.functions._
    var enriched: Option[DataFrame] = None
    var corpusKept: Long            = -1L
    var report: Option[DataFrame]   = None
    val t = Tables(spark, dir)
    val handlers = Map(
      "ingest" -> Handler { _ => t.lineitem.count() },
      "enrich" -> Handler { _ =>
        enriched = Some(
          t.lineitem
            .join(t.orders, col("l_orderkey") === col("o_orderkey"))
            .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
            .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey")))
      },
      "corpus" -> Handler { _ =>
        // the training-data branch: exact dedup keepers over documents
        corpusKept = ops.Dedup.q26ExactDedup.fn(spark, dir).count()
      },
      "report" -> Handler { _ =>
        // consumes the enrich stage's output — data flows along the DAG
        report = Some(enriched.get
          .groupBy(col("n_name"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                 .cast(org.apache.spark.sql.types.DecimalType(22, 8)))
               .cast("double").as("revenue"),
               count(lit(1)).as("n_items")))
      })

    new Worker(store, handlers, WorkerConfig(seed = Some(42L))).runUntilIdle()
    require(store.snapshotJobs.forall(_.status == JobStatus.Finished),
      s"pipeline did not finish: ${store.snapshotJobs}")
    require(corpusKept > 0, "corpus branch produced no keepers")
    report.get
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (engine-specific hashes/sketches) → driver records rows-only. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
