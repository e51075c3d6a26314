"""train_quality_classifier (round 10): MLlib logistic regression over
the inference feature map — the trained weights drop into the
expression-only scorer and the two sides agree to float precision."""

from __future__ import annotations

import random

import pytest

from redistimeseries_spark.pipeline.text import hashed_classifier_scores
from redistimeseries_spark.pipeline.train import train_quality_classifier

GOOD = ("theorem proof analysis careful rigorous study method result "
        "observation experiment data evidence conclusion").split()
BAD = ("click buy cheap free winner casino pills xxx offer deal "
       "subscribe lottery jackpot").split()


def _docs(rng, vocab, n, start_id):
    return [
        (start_id + i, " ".join(rng.choices(vocab, k=rng.randint(8, 20))))
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def trained(spark):
    rng = random.Random(0x7A41)
    train_rows = [
        (d, t, 1.0) for d, t in _docs(rng, GOOD, 120, 0)
    ] + [(d, t, 0.0) for d, t in _docs(rng, BAD, 120, 1000)]
    labeled = spark.createDataFrame(
        train_rows, "doc_id long, text string, label double"
    )
    weights, bias, stats = train_quality_classifier(
        labeled, num_buckets=1 << 14, max_iter=50, reg_param=0.01
    )
    return rng, labeled, weights, bias, stats


def test_training_separates_heldout(spark, trained):
    rng, _labeled, weights, bias, stats = trained
    assert stats["areaUnderROC"] > 0.99 and stats["n_slots"] > 0
    held = _docs(rng, GOOD, 30, 5000) + _docs(rng, BAD, 30, 6000)
    docs = spark.createDataFrame(held, "doc_id long, text string")
    probs = {
        r.doc_id: r.prob
        for r in hashed_classifier_scores(
            docs, weights, bias=bias, num_buckets=1 << 14
        ).collect()
    }
    good_p = [p for d, p in probs.items() if d < 6000]
    bad_p = [p for d, p in probs.items() if d >= 6000]
    assert min(good_p) > max(bad_p)  # clean vocab split -> full margin


def test_roundtrip_matches_mllib_probability(spark, trained):
    """The expression scorer IS the trained model: MLlib's forward pass
    and hashed_classifier_scores agree at 1e-9 on the training docs."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import SparseVector, VectorUDT
    from pyspark.sql import functions as F

    from redistimeseries_spark.pipeline.text import _doc_feature_slots

    rng, labeled, weights, bias, _stats = trained
    nb = 1 << 14
    # rebuild the exact training vectors and model (deterministic fit)
    rows = _doc_feature_slots(labeled.select("doc_id", "text"), nb, False)
    per = (
        rows.groupBy("doc_id", "slot")
        .agg((F.count(F.lit(1)) / F.first("__n")).alias("x"))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("slot", "x")).alias("__sx"))
    )
    to_vec = F.udf(
        lambda ps: SparseVector(
            nb, {int(p["slot"]): float(p["x"]) for p in (ps or [])}
        ),
        VectorUDT(),
    )
    tdf = labeled.join(per, "doc_id", "left").select(
        "doc_id", "label", to_vec("__sx").alias("features")
    )
    model = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=50,
        regParam=0.01, standardization=False, fitIntercept=True,
    ).fit(tdf)
    ml_prob = {
        r.doc_id: float(r.probability[1])
        for r in model.transform(tdf).collect()
    }
    got = {
        r.doc_id: r.prob
        for r in hashed_classifier_scores(
            labeled.select("doc_id", "text"), weights, bias=bias,
            num_buckets=nb,
        ).collect()
    }
    assert got.keys() == ml_prob.keys()
    for d in got:
        assert got[d] == pytest.approx(ml_prob[d], abs=1e-9), d


def test_dense_assembly_matches_udf_arm(spark, trained, monkeypatch):
    """Round-11: the default-config vector assembly is a pure
    expression (map_from_entries -> sequence lookup -> array_to_vector,
    no Python row UDF); forcing the SparseVector-UDF fallback arm
    yields the same fitted model to float precision."""
    import redistimeseries_spark.pipeline.train as T

    rng, labeled, _w, _b, _stats = trained
    w_dense, b_dense, s_dense = train_quality_classifier(
        labeled, num_buckets=1 << 10, max_iter=50, reg_param=0.01
    )
    monkeypatch.setattr(T, "DENSE_ASSEMBLY_MAX", 0)  # force UDF arm
    w_udf, b_udf, s_udf = train_quality_classifier(
        labeled, num_buckets=1 << 10, max_iter=50, reg_param=0.01
    )
    assert b_dense == pytest.approx(b_udf, abs=1e-9)
    dd = {r.slot: r.weight for r in w_dense.collect()}
    du = {r.slot: r.weight for r in w_udf.collect()}
    assert dd.keys() == du.keys()
    for s in dd:
        assert dd[s] == pytest.approx(du[s], abs=1e-9), s


def test_no_python_udf_in_package_default_paths(spark, trained):
    """VERDICT r10 #4 done-criterion: no F.udf on the package's default
    path — the only remaining F.udf site is train.py's EXPLICIT sparse
    fallback for num_buckets > DENSE_ASSEMBLY_MAX."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).parents[1] / "redistimeseries_spark"
    hits = [
        f"{f.name}:{i}"
        for f in pkg.rglob("*.py")
        for i, line in enumerate(f.read_text().splitlines(), 1)
        if re.search(r"\bF\.udf\(", line)
    ]
    assert all(h.startswith("train.py:") for h in hits), hits


def test_l1_shrinks_model_and_validation(spark, trained):
    rng, labeled, _w, _b, stats = trained
    # the mean-of-features values are small (~1/doc_len), so the L1
    # knob bites at far lower reg_param than L2 would
    w1, b1, s1 = train_quality_classifier(
        labeled, num_buckets=1 << 14, max_iter=50, reg_param=0.002,
        elastic_net=1.0,
    )
    assert 0 < s1["n_slots"] < stats["n_slots"]  # L1 zeroed some slots
    assert s1["areaUnderROC"] > 0.95
    with pytest.raises(ValueError, match="num_buckets"):
        train_quality_classifier(labeled, num_buckets=0)
