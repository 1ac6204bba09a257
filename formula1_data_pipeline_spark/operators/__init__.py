from formula1_data_pipeline_spark.operators.asof import (  # noqa: F401
    asof_join,
    asof_join_reference,
    asof_join_sorted,
)
from formula1_data_pipeline_spark.operators.dedup_priority import (  # noqa: F401
    dedup_by_priority,
)
from formula1_data_pipeline_spark.operators.windows import (  # noqa: F401
    count_distinct_over,
)
from formula1_data_pipeline_spark.operators.topk import top1_by_priority  # noqa: F401
