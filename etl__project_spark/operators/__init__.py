from etl__project_spark.operators.transform import (  # noqa: F401
    filter_videostart,
    filter_videostart_like,
    filter_well_formed_title,
    parse_raw,
)
from etl__project_spark.operators.dims import (  # noqa: F401
    derive_dim,
    derive_dim_time,
    scd1_upsert,
    scd2_upsert,
    scd2_upsert_multi,
    with_dense_ids,
)
from etl__project_spark.operators.fact import build_fact  # noqa: F401
from etl__project_spark.operators.merge import (  # noqa: F401
    cdc_apply,
    merge_insert_new,
)
from etl__project_spark.operators.audit import max_lengths, record_count  # noqa: F401
from etl__project_spark.operators.rollup import (  # noqa: F401
    exact_quantile_2pass,
    finalize_distinct,
    finalize_rollup,
    finalize_variance,
    hist_quantiles,
    merge_distinct_signed,
    merge_hist_signed,
    merge_moments_signed,
    merge_rollups,
    merge_rollups_minmax_cdc,
    merge_rollups_signed,
    partial_distinct_signed,
    partial_hist_signed,
    partial_moments_signed,
    partial_rollup,
    partial_rollup_signed,
)
from etl__project_spark.operators.ivm import (  # noqa: F401
    cdc_to_signed_delta,
    consolidate,
    delta_join,
    delta_join_signed,
    fulljoin_delta_signed_bothsides,
    maintain_agg_over_join_cdc,
    maintain_fulljoin_view_cdc,
    maintain_fulljoin_view_cdc_bothsides,
    maintain_join_view,
    maintain_join_view_cdc,
    maintain_leftjoin_view_cdc,
    maintain_semijoin_support_cdc,
)
from etl__project_spark.operators.retention import (  # noqa: F401
    maintain_retention_cdc,
    retention_cells,
    retention_from_membership,
)
from etl__project_spark.operators.sessions import (  # noqa: F401
    maintain_sessions_cdc,
    session_count_delta,
    sessionize_counts,
)
