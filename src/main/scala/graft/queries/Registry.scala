package graft.queries

/** Aggregates every registered query group. SparkEntry derives its
  * `queries`/`oracleSql` maps from here; ScalaTest and Bench iterate it. */
object Registry {
  lazy val all: Seq[Q] =
    ParityQueries.all ++ AnalyticsQueries.all ++ TextQueries.all ++
      VectorQueries.all ++ StreamingQueries.all ++ FormatQueries.all ++
      BreadthQueries.all ++ ExtraQueries.all ++ PredicateQueries.all ++
      CurationQueries.all ++ InsightQueries.all ++ DepthQueries.all ++
      ScaleQueries.all ++ ServeQueries.all ++ WideQueries.all ++
      PipelineQueries.all ++ AuditQueries.all ++ StatQueries.all ++
      QualityQueries.all ++ CausalQueries.all ++ FeatureQueries.all ++
      GraphMetricQueries.all ++ CorpusMetricQueries.all ++
      SeasonalQueries.all ++ GraphDepthQueries.all ++ EvalQueries.all ++
      InferQueries.all ++ FitQueries.all ++ ChainQueries.all ++
      SignalQueries.all ++ EngageQueries.all ++ TrendQueries.all ++
      EncodeQueries.all ++ GrowthQueries.all ++ OverlapQueries.all ++
      RecoQueries.all ++ ForecastQueries.all ++ CommunityQueries.all ++
      OpsMetricsQueries.all ++ CycleQueries.all ++ SupplyQueries.all ++
      UpliftQueries.all ++ DriftQueries.all ++ PlanningQueries.all ++
      TemporalQueries.all ++ NonparamQueries.all ++ ValidityQueries.all ++
      MarkovQueries.all ++ SurvivalQueries.all ++
      ReliabilityQueries.all ++ CompletionQueries.all ++
      AuditDepthQueries.all ++ StratifiedQueries.all ++
      ExtremeQueries.all ++ DiagQueries.all ++ StructQueries.all ++
      FabricQueries.all ++ ShiftQueries.all ++ SpectralQueries.all ++
      RobustQueries.all ++ AssuranceQueries.all ++ FrontierQueries.all ++
      LinkageQueries.all ++ IndexQueries.all ++ CurveQueries.all ++
      TimerQueries.all ++ LexiconQueries.all ++
      EstimatorQueries.all ++ GeometryQueries.all ++
      FairnessQueries.all ++ HorizonQueries.all ++
      ClassifyQueries.all ++ ConvergeQueries.all ++
      InfluenceQueries.all ++ AgreementQueries.all ++
      SequenceQueries.all ++ DensityQueries.all ++
      TendencyQueries.all ++ ClockQueries.all ++ SpreadQueries.all ++
      PosthocQueries.all ++ CalibrationQueries.all ++
      RichnessQueries.all ++ CapacityQueries.all ++
      ScorecardQueries.all ++ MetaQueries.all ++
      ContingencyQueries.all ++ RankDistQueries.all ++
      RandomnessQueries.all ++ SpatialQueries.all ++
      ForensicsQueries.all ++ LadderQueries.all ++
      CapstoneQueries.all ++ ProvenanceQueries.all

  lazy val byName: Map[String, Q] = {
    val names = all.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct)}")
    all.map(q => q.name -> q).toMap
  }
}
