from formula1_data_pipeline_spark.plans.registry import (  # noqa: F401
    Model,
    ModelRegistry,
)
