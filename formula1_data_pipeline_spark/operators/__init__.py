from formula1_data_pipeline_spark.operators.asof import (  # noqa: F401
    asof_join,
    asof_join_directional,
    asof_join_reference,
    asof_join_sorted,
)
from formula1_data_pipeline_spark.operators.cluster import (  # noqa: F401
    connected_components,
    neardup_clusters,
)
from formula1_data_pipeline_spark.operators.dedup_priority import (  # noqa: F401
    dedup_by_priority,
)
from formula1_data_pipeline_spark.operators.rangejoin import (  # noqa: F401
    point_in_interval_join,
)
from formula1_data_pipeline_spark.operators.sampling import (  # noqa: F401
    assign_split,
    hash_bucket,
    stratified_keep,
)
from formula1_data_pipeline_spark.operators.topk import (  # noqa: F401
    top1_by_priority,
)
from formula1_data_pipeline_spark.operators.windows import (  # noqa: F401
    count_distinct_over,
)
from formula1_data_pipeline_spark.operators.packing import (  # noqa: F401
    pack_sequences,
)
from formula1_data_pipeline_spark.operators.scd2 import (  # noqa: F401
    scd2_history,
)
