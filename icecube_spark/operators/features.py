"""MLlib feature engineering over the document corpus (SURVEY north
star: "DataFrame ops + MLlib for feature engineering").

TF-IDF pipeline: tokenize → hashed term frequencies → IDF weighting.
HashingTF seeds are engine-internal, so this is a rows-only operator
(no SQL oracle); tests assert shape/sparsity invariants instead.
At scale the pipeline is two scans (IDF needs a doc-frequency pass)
and zero driver-side data movement.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tfidf_features(
    df: DataFrame, id_col: str, text_col: str, num_features: int = 1 << 12
) -> DataFrame:
    """doc → sparse TF-IDF vector + basic stats columns."""
    pipeline = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="toks", pattern="\\s+", toLowercase=True
            ),
            HashingTF(inputCol="toks", outputCol="tf", numFeatures=num_features),
            IDF(inputCol="tf", outputCol="tfidf"),
        ]
    )
    model = pipeline.fit(df)
    out = model.transform(df)
    return out.select(
        F.col(id_col),
        F.size("toks").alias("n_tokens"),
        F.col("toks"),
        F.col("tfidf"),
    )
