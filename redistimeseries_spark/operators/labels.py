"""Label secondary index: predicate parsing + key matching.

Reference: src/indexer.h:29-51 predicate forms, src/indexer.c:507-565
QueryIndex (inverted-index postings intersection).  Spark replaces the
hand-built inverted index with filters + semi/anti-joins on the `labels`
dimension table; Catalyst + AQE order the predicates.  The labels table is
tiny relative to samples (one row per series per label), so every join
against it is broadcast-able — `matched_keys` results get broadcast into
the samples semi-join by the callers.

Predicate forms (same surface as the reference FILTER syntax):
  l=v       series whose label l equals v
  l!=v      series whose label l differs from v (absent label passes)
  l=        series that do NOT have label l
  l!=       series that DO have label l
  l=(a,b)   l in (a, b)
  l!=(a,b)  l not in (a, b) (absent label passes)

At least one inclusive predicate (=v, =(...), !=) is required, as in the
reference (src/indexer.c:521-528).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class LabelPredicate:
    label: str
    op: str  # eq | ne | in | notin | exists | notexists
    values: list[str]

    @property
    def inclusive(self) -> bool:
        return self.op in ("eq", "in", "exists")


def parse_filter(expr: str) -> LabelPredicate:
    """Parse one FILTER expression string (reference query_language syntax)."""
    if "!=" in expr:
        label, _, rhs = expr.partition("!=")
        neg = True
    elif "=" in expr:
        label, _, rhs = expr.partition("=")
        neg = False
    else:
        raise ValueError(f"bad label filter {expr!r}")
    label = label.strip()
    rhs = rhs.strip()
    if rhs == "":
        return LabelPredicate(label, "exists" if neg else "notexists", [])
    if rhs.startswith("(") and rhs.endswith(")"):
        vals = [v.strip() for v in rhs[1:-1].split(",") if v.strip() != ""]
        return LabelPredicate(label, "notin" if neg else "in", vals)
    return LabelPredicate(label, "ne" if neg else "eq", [rhs])


def matched_keys(labels: DataFrame, filters: list[str | LabelPredicate]) -> DataFrame:
    """TS.QUERYINDEX: distinct keys matching every predicate."""
    preds = [p if isinstance(p, LabelPredicate) else parse_filter(p) for p in filters]
    if not any(p.inclusive for p in preds):
        raise ValueError("label filter needs at least one inclusive predicate")
    keys = labels.select("key").distinct()
    for p in preds:
        lbl = labels.filter(F.col("label") == p.label)
        if p.op == "eq" or p.op == "in":
            keys = keys.join(lbl.filter(F.col("value").isin(p.values)), "key", "left_semi")
        elif p.op == "ne" or p.op == "notin":
            keys = keys.join(lbl.filter(F.col("value").isin(p.values)), "key", "left_anti")
        elif p.op == "exists":
            keys = keys.join(lbl, "key", "left_semi")
        elif p.op == "notexists":
            keys = keys.join(lbl, "key", "left_anti")
    return keys


def query_labels(
    labels: DataFrame,
    mode: str = "labels",
    label: str | None = None,
    filters: list[str] | None = None,
) -> DataFrame:
    """TS.QUERYLABELS LABELS|VALUES lbl [FILTER ...]
    (src/module.c:407-465): distinct label names, or distinct values of one
    label, over matching (or all) series."""
    df = labels
    if filters:
        df = df.join(F.broadcast(matched_keys(labels, filters)), "key", "left_semi")
    if mode == "labels":
        return df.select("label").distinct()
    if mode == "values":
        if label is None:
            raise ValueError("VALUES mode needs a label")
        return df.filter(F.col("label") == label).select("value").distinct()
    raise ValueError(f"bad mode {mode!r}")


def with_labels(
    df: DataFrame, labels: DataFrame, selected: list[str] | None = None
) -> DataFrame:
    """Attach label columns (WITHLABELS / SELECTED_LABELS) to a keyed result.
    Missing labels surface as NULL, as the reference replies nil."""
    lbl = labels
    if selected is not None:
        lbl = lbl.filter(F.col("label").isin(selected))
    wide = lbl.groupBy("key").pivot("label", selected).agg(F.first("value"))
    return df.join(F.broadcast(wide), "key", "left")
