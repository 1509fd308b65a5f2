from data_engineering_capstone_project_spark.pipeline.star_schema import (
    PipelineResult,
    run_pipeline,
)

__all__ = ["run_pipeline", "PipelineResult"]
