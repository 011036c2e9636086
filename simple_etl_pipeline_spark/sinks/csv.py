"""CSV sink (reference K1, utils/load.py:37-73).

The reference writes a single named CSV with pandas. Spark writes a
directory of part files — correct at scale (parallel writers, no driver
bottleneck). For single-file parity we coalesce(1) and rename the part
file; use single_file=False (the default) on real data, where one file
is an anti-pattern.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame

import simple_etl_pipeline_spark.sinks as sinks


def save_to_csv(
    df: DataFrame,
    output_path: str,
    filename: str = "products.csv",
    single_file: bool = True,
) -> str:
    """Write df as CSV; returns the written path. Empty df -> LoadError
    (reference utils/load.py:52-54)."""
    if df.isEmpty():
        raise sinks.LoadError("cannot save empty DataFrame to CSV")
    try:
        os.makedirs(output_path, exist_ok=True)
        if not single_file:
            target = os.path.join(output_path, filename.removesuffix(".csv"))
            df.write.mode("overwrite").option("header", True).csv(target)
            return target
        tmp_dir = os.path.join(output_path, f"_{filename}.spark-tmp")
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp_dir)
        parts = glob.glob(os.path.join(tmp_dir, "part-*.csv"))
        if len(parts) != 1:
            raise sinks.LoadError(f"expected 1 part file, found {len(parts)}")
        final = os.path.join(output_path, filename)
        shutil.move(parts[0], final)
        shutil.rmtree(tmp_dir, ignore_errors=True)
        return final
    except sinks.LoadError:
        raise
    except Exception as exc:  # PermissionError etc. -> LoadError (K1)
        raise sinks.LoadError(f"failed to save CSV: {exc}") from exc
