"""The UDF surface — for the rare case built-in Columns can't express
the logic. Rules of the road (SURVEY.md §2f): native Column first;
Arrow-batched pandas_udf when Python is unavoidable; row-at-a-time
Python UDFs never (10-100x slower, breaks codegen).

quality_score_udf deliberately duplicates the native-Column quality
score from plans/text.txt_doc_features, and tests assert equality —
demonstrating the vectorized escape hatch is semantically safe while
keeping the hot path JVM-side.
"""

from __future__ import annotations

from functools import cache


@cache
def quality_score_udf():
    """Vectorized (Arrow-batched) twin of the Column-expression quality
    score: 0.5*min(tokens/100,1) + 0.3*(1-stop_ratio) + 0.2*min(atl/8,1).
    Built lazily — pandas_udf registration needs an active session.
    """
    from pyspark.sql.functions import pandas_udf

    # No type hints: with `from __future__ import annotations` they
    # become unresolvable strings for pandas_udf's signature inference;
    # the explicit returnType carries the contract.
    @pandas_udf("double")
    def _score(n_tokens, stop_ratio, avg_token_len):
        return (
            (n_tokens / 100.0).clip(upper=1.0) * 0.5
            + (1.0 - stop_ratio) * 0.3
            + (avg_token_len / 8.0).clip(upper=1.0) * 0.2
        )

    return _score
