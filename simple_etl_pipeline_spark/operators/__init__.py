from simple_etl_pipeline_spark.operators.transform import remove_dirty_data, transform_data

__all__ = ["remove_dirty_data", "transform_data"]
