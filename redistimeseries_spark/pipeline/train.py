"""Quality-classifier TRAINING — the offline half of the model-based
quality filter.

`pipeline/text.hashed_classifier_scores` runs the forward pass of a
fastText-shaped linear classifier over the corpus (broadcast weights,
expression-only); this module trains those weights from a labeled set
(reference text = 1, junk = 0 — the CCNet/LLaMA recipe labels Wikipedia
vs random crawl) with Spark MLlib's LogisticRegression, over EXACTLY
the inference feature map (`text._doc_feature_slots`: lowercased word
unigrams, optional bigrams, md5 slot hash, mean-of-features form), so
the fitted coefficients drop straight into the scorer:

    score(doc) = intercept + coef . x,   x = (1/n) sum of e_slot(f)
               = bias + (1/n) sum of w[slot(f)]      — the scorer's form.

Scale position: training is the SMALL side (thousands to low millions
of labeled docs; the corpus being scored is the 100-TB side, and it
only ever sees the broadcast weights).  Vector assembly: for
num_buckets <= 2^14 the per-doc feature vector is built as a DENSE
expression — map_from_entries lookup over sequence(0, nb-1) into
pyspark.ml.functions.array_to_vector — keeping the whole path
JVM-side (no Python row UDF anywhere in the package's default-config
paths); above that a dense array stops paying (nb doubles per doc),
so a plain Python UDF assembles SparseVector instead (Arrow cannot
carry VectorUDT) — acceptable on the labeled set by design, never on
the corpus; everything after is MLlib's distributed L-BFGS.
`standardization=False` keeps the coefficients in raw feature units so
they transfer verbatim.  Round-trip exactness (MLlib's probability ==
the expression scorer's sigmoid at 1e-9) is pinned in
tests/test_train.py, on both assembly arms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# widest num_buckets assembled as a dense expression vector; above it
# the sparse Python-UDF fallback engages (dense cost: nb doubles/doc)
DENSE_ASSEMBLY_MAX = 1 << 14


def train_quality_classifier(
    labeled: DataFrame,
    num_buckets: int = 1 << 18,
    bigrams: bool = False,
    max_iter: int = 100,
    reg_param: float = 0.0,
    elastic_net: float = 0.0,
):
    """labeled: (doc_id, text, label) with label in {0.0, 1.0}.
    Returns (weights DataFrame (slot long, weight double) — the NONZERO
    coefficients only, so L1 (`elastic_net` > 0) shrinks the broadcast
    model —, bias float, stats dict with areaUnderROC/n_docs/n_slots).
    Feed the first two straight into `hashed_classifier_scores` with
    the SAME num_buckets/bigrams."""
    from pyspark.ml.classification import LogisticRegression

    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    from redistimeseries_spark.pipeline.text import _doc_feature_slots

    rows = _doc_feature_slots(
        labeled.select("doc_id", "text"), num_buckets, bigrams
    )
    per = (
        rows.groupBy("doc_id", "slot")
        .agg(
            (F.count(F.lit(1)) / F.first("__n")).alias("x"),
        )
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("slot", "x")).alias("__sx"),
        )
    )
    nb = num_buckets

    if nb <= DENSE_ASSEMBLY_MAX:
        # dense expression assembly — no Python row path: slot->x map
        # per doc, materialized over the full bucket range, then the
        # JVM-side array_to_vector (a doc with NO features gets the
        # all-zero vector and still trains the intercept)
        from pyspark.ml.functions import array_to_vector

        m = F.map_from_entries(
            F.coalesce(
                F.col("__sx"),
                F.array().cast("array<struct<slot:long,x:double>>"),
            )
        )
        dense = F.transform(
            F.sequence(F.lit(0), F.lit(nb - 1)),
            lambda i: F.coalesce(
                F.element_at(m, i.cast("long")), F.lit(0.0)
            ),
        )
        to_vec = array_to_vector(dense)
    else:
        from pyspark.ml.linalg import SparseVector, VectorUDT

        def assemble(pairs):
            if not pairs:
                return SparseVector(nb, {})
            return SparseVector(
                nb, {int(p["slot"]): float(p["x"]) for p in pairs}
            )

        to_vec = F.udf(assemble, VectorUDT())(F.col("__sx"))
    # left join from the labeled spine: a doc with NO features still
    # trains the intercept with an all-zero vector
    train_df = (
        labeled.select("doc_id", F.col("label").cast("double").alias("label"))
        .join(per, "doc_id", "left")
        .select("doc_id", "label", to_vec.alias("features"))
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        elasticNetParam=elastic_net,
        standardization=False,
        fitIntercept=True,
    )
    model = lr.fit(train_df)
    coef = model.coefficients
    spark = labeled.sparkSession
    if hasattr(coef, "indices"):  # sparse under L1
        pairs = [
            (int(i), float(v)) for i, v in zip(coef.indices, coef.values) if v
        ]
    else:
        pairs = [(int(i), float(v)) for i, v in enumerate(coef) if v]
    weights = spark.createDataFrame(
        pairs or [(0, 0.0)], "slot long, weight double"
    )
    if not pairs:
        weights = weights.limit(0)
    stats = {
        "n_docs": train_df.count(),
        "n_slots": len(pairs),
        "areaUnderROC": float(model.summary.areaUnderROC),
    }
    return weights, float(model.intercept), stats
