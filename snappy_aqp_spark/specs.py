"""Declarative specs shared by the Spark engine and the DuckDB oracle emitter.

A spec captures user intent (reference surface:
``SELECT ... WITH ERROR e [CONFIDENCE c] [BEHAVIOR 'b']`` over a sample table,
reference parser src/main/scala/org/apache/spark/sql/snappyAQPParsers.scala:48-71).
From one spec we derive both the executable PySpark program and the ANSI-SQL
replay used for exact validation. Fragments inside specs are portable SQL
expressions (valid under Spark SQL and DuckDB).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# hidden sample-table columns (reference stores one packed LONG,
# stratifiedSampling.scala:749-760; we store the decoded parts)
WEIGHT_COL = "snappy_sampler_weightage"     # double: stratum_total / stratum_sampled
STRATA_SAMPLED_COL = "sampler_strata_sampled"  # bigint: n_s
STRATA_TOTAL_COL = "sampler_strata_total"      # bigint: N_s

HIDDEN_COLS = (WEIGHT_COL, STRATA_SAMPLED_COL, STRATA_TOTAL_COL)

ERROR_FUNCTIONS = ("absolute_error", "relative_error", "lower_bound", "upper_bound")

BEHAVIORS = ("do_nothing", "local_omit", "strict", "run_on_full_table",
             "partial_run_on_base_table")


@dataclass(frozen=True)
class SampleSpec:
    """Stratified sample definition (reference: CREATE SAMPLE TABLE OPTIONS
    qcs/fraction/strataReservoirSize, snappyAQPParsers.scala:77-103)."""
    base_table: str
    key_cols: tuple[str, ...]          # integer exprs uniquely identifying a row
    qcs: tuple[str, ...]               # stratification exprs (portable SQL)
    method: str = "hash"               # hash | reservoir | fraction | error_limit
    fraction: float = 0.01
    reservoir_size: int = 50           # per-stratum rows (reservoir / floor for fraction)
    seed: int = 42
    # error_limit method only (StratifiedSamplerErrorLimit.scala:31-42):
    # grow each stratum until the closed-form relative error of
    # error_limit_col stays under error_limit_pct at error_limit_conf
    error_limit_col: str | None = None
    error_limit_pct: float = 0.1
    error_limit_conf: float = 0.95
    error_limit_max_abs: float = 2.0 ** 20
    # ``CREATE SAMPLE TABLE ... AS SELECT * FROM base WHERE ...`` populate
    # form (snappyAQPParsers.scala:77-103, CreateSampleTableCommand.scala:
    # 27-46): the sample is built over the filtered base population
    base_filter: str | None = None
    # time-aging options (SampleOptions timeSeriesColumn/timeInterval,
    # stratifiedSampling.scala:270,342-357): streaming maintenance
    # stratifies additionally by the time slot floor(t/interval) and ages
    # old slots out of the maintained sample (StratifiedSamplerCached
    # per-slot reservoir reset)
    time_series_col: str | None = None
    time_interval_us: int = 0

    def __post_init__(self):
        # hash_rand = fraction-threshold universe sample over the QUADRATIC
        # scrambled stream (detrng.rand_hash_sql): unlike the affine "hash"
        # stream, different seeds give independent inclusion — required by
        # e.g. the two-sample join estimator when both sides sample the
        # same key values
        assert self.method in ("hash", "hash_rand", "reservoir",
                               "reservoir_rand", "fraction",
                               "error_limit"), self.method
        assert self.key_cols and self.qcs
        if self.method == "error_limit":
            assert self.error_limit_col
        if self.time_series_col and self.time_interval_us <= 0:
            # reference parity: stratifiedSampling.scala:422-424
            raise ValueError(
                f"StratifiedSampler: no timeInterval for "
                f"timeSeriesColumn={self.time_series_col}")


@dataclass(frozen=True)
class ApproxAgg:
    """One approximate aggregate (reference supports Sum/Avg/Count,
    common/QueryRoutingRules.scala:55-92)."""
    func: str                           # sum | avg | count | count_star | min | max
    measure: str | None                 # portable SQL expr; None only for count_star
    alias: str
    max_abs: float = 2.0 ** 20          # |measure| bound -> quantization scale
    errors: tuple[str, ...] = ()        # subset of ERROR_FUNCTIONS to emit
    # DecimalType(p, s) measures (reference widens Decimal in AQP aggregation,
    # common/QueryProcessingRules.scala:1461-1466, bypassErrorCalculations
    # .scala:45-49): when set, SUM/AVG estimates run on exact DECIMAL(38, s)
    # per-stratum sums (order-independent integer arithmetic — no per-row
    # double floor, no precision loss past 2^53); doubles enter only at the
    # per-stratum weighting term. The variance/error path stays double, as in
    # the reference (StatCounterWithFullCount buffers are Double). Set
    # automatically by the SQL front-end for CAST(expr AS DECIMAL(p,s))
    # measures; DataFrame-API callers pass it for native decimal columns.
    dec_scale: int | None = None

    # min/max are BYPASS aggregates (reference ByPassErrorCalc,
    # common/QueryRoutingRules.scala:55-92): computed directly on sample rows
    # (weights cannot change an extremum), error functions constant — allowed
    # alongside approximated SUM/AVG/COUNT when their arg is in the QCS.
    def __post_init__(self):
        assert self.func in ("sum", "avg", "count", "count_star",
                             "min", "max"), self.func
        if self.func == "count_star":
            assert self.measure is None
        else:
            assert self.measure
        for e in self.errors:
            assert e in ERROR_FUNCTIONS, e


@dataclass(frozen=True)
class CompositeSpec:
    """Arithmetic over several aggregates in ONE select item — the
    reference's AQP-283 query shape (``SELECT sum(fare_amount) /
    sum(trip_time_in_secs) ... WITH ERROR``, CommonBugTest.scala:2666-2712).

    ``template`` is portable SQL text with ``{0}``, ``{1}``, ... holes for
    the component aggregate VALUES (the front-end pre-guards every division
    with a CASE so a zero denominator yields NULL on both engines);
    ``components`` names the component agg aliases in hole order.

    Error functions on a composite are BOOTSTRAP-only: each trial's
    composite value is the arithmetic over the components' per-trial
    Horvitz-Thompson estimates, so the quantile CI machinery applies
    unchanged (the statistically sound CI for a ratio, which closed-form
    variance propagation does not cover). Composites without error
    functions are plain post-aggregation derived items on any estimator.
    """
    alias: str
    template: str
    components: tuple[str, ...]
    errors: tuple[str, ...] = ()

    def __post_init__(self):
        assert self.components, "composite needs at least one component"
        for i in range(len(self.components)):
            assert f"{{{i}}}" in self.template, (i, self.template)
        for e in self.errors:
            assert e in ERROR_FUNCTIONS, e


@dataclass(frozen=True)
class JoinSpec:
    table: str
    on: str | None                      # portable SQL join condition;
                                        # None only for how="cross" (comma-
                                        # style FROM list: the join predicate
                                        # stays in WHERE and Catalyst/DuckDB
                                        # fold it back into an equi-join)
    how: str = "inner"
    # SQL alias from the query text (``FROM FlightData fd``): relations are
    # planned under their aliases so WHERE/ON can keep qualified column
    # references — required when joined relations share column names (the
    # reference's perfJoinQueries corpus: uniqueCarrier on both fact tables)
    alias: str | None = None


@dataclass(frozen=True)
class SubqueryPred:
    """One WHERE-clause subquery predicate of the outer (sampled) query.

    Rebuild of the reference's subquery routing (PlaceHolderPlan hide/show,
    common/QueryProcessingRules.scala:119-148, :2522-2597; tests
    SubQueryRoutingTestSuite.scala): the outer query routes through its
    sample while each subquery tree is planned independently — here the
    subquery runs exactly and feeds the outer plan as a semi/anti join
    (``in`` / ``not_in``) or an inlined literal (``scalar``).

    NULL caveat: ``not_in`` is executed as an anti-join, which matches SQL
    ``NOT IN`` only when neither side of the comparison is NULL (the usual
    key-column case); NULL-producing subqueries should route exact.
    """
    kind: str                           # in | not_in | scalar
    expr: str                           # lhs expr; for scalar: template with __SUBQ__
    sub_sql: str                        # single-block SELECT (portable SQL)
    tables: tuple[str, ...] = ()        # tables the subquery reads
    # decomposed single-block shape (IN/NOT IN only): the selected expr and
    # WHERE text, so a sampled subquery tree can be rebuilt over its sample
    sub_select: str | None = None
    sub_where: str | None = None
    # one sample query per subquery tree (reference PlaceHolderPlan +
    # ReplaceWithSampleTable on the subquery child,
    # QueryProcessingRules.scala:119-148): when set, the subquery's relation
    # is replaced by this sample (row semantics — membership over sample
    # rows, exactly the reference's relation replacement; weights don't
    # apply to a key-membership scan)
    sample: "SampleSpec | None" = None
    # scalar subqueries with an approximable aggregate run as their own
    # approx query (the reference wraps the subquery child with the outer
    # AQP clause — subqueryChildHandler, QueryProcessingRules.scala:119-148);
    # the weighted estimate inlines as the comparison literal
    sub_spec: "ApproxQuerySpec | None" = None

    def __post_init__(self):
        assert self.kind in ("in", "not_in", "scalar"), self.kind
        if self.kind == "scalar":
            assert "__SUBQ__" in self.expr
        if self.sample is not None:
            assert self.kind == "in" and self.sub_select is not None
        if self.sub_spec is not None:
            assert self.kind == "scalar"


@dataclass(frozen=True)
class ApproxQuerySpec:
    sample: SampleSpec
    aggs: tuple[ApproxAgg, ...]
    # when the sampled relation is a JOINed table rather than the outer FROM
    # table (reference: ReplaceWithSampleTable picks the single sampled
    # relation anywhere in the join tree, QueryProcessingRules.scala:504-515),
    # from_relation holds the outer FROM table; sample.base_table then names
    # the joined relation replaced by its sample. None -> FROM table sampled.
    from_relation: str | None = None
    # SQL alias of the outer FROM relation (see JoinSpec.alias)
    from_alias: str | None = None
    group_by: tuple[str, ...] = ()          # portable SQL exprs
    group_aliases: tuple[str, ...] = ()     # output names; default = expr text
    joins: tuple[JoinSpec, ...] = ()
    where: str | None = None                # over base/join columns (pre-agg)
    where_subs: tuple[SubqueryPred, ...] = ()   # subquery predicates (ANDed)
    having: str | None = None               # over output aliases (post-finalize)
    order_by: tuple[str, ...] = ()          # over output aliases
    limit: int | None = None
    # select items that are EXPRESSIONS OVER the group keys rather than the
    # group text itself (reference AQP-229 protocol: SELECT CASE WHEN
    # month(t)=1 THEN 'Jan' ... END AS mnt ... GROUP BY month(t)):
    # (expr_over_output_aliases, output_name), computed post-aggregation
    derived_items: tuple = ()
    # error columns computed ONLY because HAVING/ORDER BY calls an error
    # function directly (reference GetErrorBounds/ErrorEstimateAttribute
    # resolution, QueryProcessingRules.scala:1525-1566): evaluated through
    # the tail clauses, then dropped from the visible output
    hidden_cols: tuple[str, ...] = ()
    # aggregate-arithmetic select items WITH error functions (AQP-283
    # shape); their components are hidden aggs in ``aggs``. Bootstrap-only:
    # per-trial composition is the CI model (see CompositeSpec)
    composites: tuple = ()
    error: float = 0.2
    confidence: float = 0.95
    behavior: str = "do_nothing"
    estimator: str = "closed_form"          # closed_form | bootstrap | bypass
    trials: int = 100                       # bootstrap resamples (reference default 100)
    # rows_hint tunes the reproducible-mode lattice around the expected data
    # scale; exceeding it only costs lattice headroom (never correctness, and
    # overflow needs ~2^19x the hint). Default covers a few million rows; set
    # to the real row count for very large deployments.
    rows_hint: float = 2.0 ** 20

    def __post_init__(self):
        assert self.estimator in ("closed_form", "bootstrap", "bypass")
        assert self.behavior in BEHAVIORS
        if self.group_aliases:
            assert len(self.group_aliases) == len(self.group_by)
        if self.composites:
            assert self.estimator == "bootstrap", \
                "composites with error functions are bootstrap-only"
            aliases = {a.alias for a in self.aggs}
            for comp in self.composites:
                missing = [c for c in comp.components if c not in aliases]
                assert not missing, f"composite components not in aggs: {missing}"

    @property
    def group_out(self) -> tuple[str, ...]:
        return self.group_aliases if self.group_aliases else self.group_by
