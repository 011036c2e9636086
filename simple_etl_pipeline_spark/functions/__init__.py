from simple_etl_pipeline_spark.functions.cleaning import (
    clean_colors_col,
    clean_gender_col,
    clean_price_col,
    clean_rating_col,
    clean_size_col,
)

__all__ = [
    "clean_price_col",
    "clean_rating_col",
    "clean_colors_col",
    "clean_size_col",
    "clean_gender_col",
]
