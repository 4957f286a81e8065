"""Model-inference seam for document quality scoring.

Production curation scores documents with a trained model (fasttext in
CCNet/LLaMA-style pipelines; a transformer in newer stacks).  This
container ships no model runtime, so the engine applies the same probed
capability-seam pattern as the media decoders
(:mod:`readability_spark.spark.multimodal`): a lazy, cached probe for the
real capability (the ``fasttext`` package plus a model file named by
``$SPARK_GRAFT_QUALITY_MODEL``), a deterministic JVM-side stand-in
otherwise, and a module-level cache a test can inject a fake into to
prove the real branch end-to-end.

The stand-in is the hashed-linear classifier (fasttext's hashing-trick
architecture with a deterministic weight permutation — weights are exact
multiples of 1/64 so double sums are order-independent and oracle-
replayable); it runs as a pure narrow column expression, never entering
Python.  The real branch runs the model over Arrow batches via
``mapInPandas`` — per-batch, vectorized, never per-row — and labels its
rows ``scorer='model'`` so downstream consumers can tell which tier
scored a document.

Scale: the stub path is map-only whole-stage codegen riding the scan
partitioning; the model path is one Arrow-batched Python stage with the
model loaded once per worker process (worker-reuse keeps it resident),
which is the shape a GPU/ONNX scorer takes on a real cluster too.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: env var naming a trained fasttext supervised model file; the real
#: branch activates only when BOTH the package and the file exist
MODEL_PATH_ENV = "SPARK_GRAFT_QUALITY_MODEL"

#: fasttext-style hashed linear stand-in: 64 weight buckets, weights
#: EXACT multiples of 1/64 (binary fractions, magnitude << 2^53) so sums
#: are order-independent and DuckDB's list replay hash-matches
#: bit-for-bit; 37 is coprime to 64 so the table is a permutation of
#: (-32..31)/64 — a deterministic stand-in for trained weights
QC_WEIGHTS = [((b * 37 + 11) % 64 - 32) / 64 for b in range(64)]
QC_BIAS = 1 / 64  # exact in double on both engines

# ------------------------------------------------------- capability probe
# Lazy, cached per process; module-level so tests can inject a fake
# module to prove the real branch is taken (the decode_auto pattern).
_UNPROBED = object()
_FASTTEXT_CACHE = _UNPROBED
_MODEL_CACHE: dict = {}


def _fasttext():
    """The fasttext module when importable in this interpreter, else None."""
    global _FASTTEXT_CACHE
    if _FASTTEXT_CACHE is _UNPROBED:
        try:
            import fasttext as _ft

            _FASTTEXT_CACHE = _ft
        except ImportError:
            _FASTTEXT_CACHE = None
    return _FASTTEXT_CACHE


def load_scorer(model_path: str | None = None):
    """A ``texts -> scores`` callable when the real capability exists,
    else None.

    Real branch: ``fasttext`` importable AND a model file present (the
    ``model_path`` argument, falling back to ``$SPARK_GRAFT_QUALITY_MODEL``).
    The returned callable maps each text to a signed logit:
    P(__label__keep) - 0.5, so keep == (score >= 0) in both tiers.  The
    loaded model is cached per (process, path) — with Spark's worker
    reuse that is once per executor worker, the shape a production
    scorer needs."""
    ft = _fasttext()
    path = model_path or os.environ.get(MODEL_PATH_ENV)
    if ft is None or not path or not os.path.exists(path):
        return None
    if path not in _MODEL_CACHE:
        _MODEL_CACHE[path] = ft.load_model(path)
    model = _MODEL_CACHE[path]

    def score(texts):
        labels, probs = model.predict(list(texts), k=1)
        out = []
        for lab, p in zip(labels, probs):
            p_keep = float(p[0]) if lab[0] == "__label__keep" else 1.0 - float(p[0])
            out.append(p_keep - 0.5)
        return out

    return score


# ------------------------------------------------------------ stub scorer
def hashed_logit(text_col):
    """The stand-in's logit as a pure column expression: token -> md5 ->
    64-bucket feature id -> weight, folded over the token array with one
    F.aggregate (no explode, no join, no shuffle)."""
    arr = F.split(F.trim(text_col), " ")
    wlit = F.lit(QC_WEIGHTS)

    def bucket(t):
        return F.pmod(
            F.conv(F.substring(F.md5(t), 1, 2), 16, 10).cast("int"), F.lit(64)
        )

    sw = F.aggregate(
        arr, F.lit(0.0), lambda acc, t: acc + F.element_at(wlit, bucket(t) + 1)
    )
    return sw / F.size(arr) + F.lit(QC_BIAS)


def score_auto(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scorer=None,
) -> DataFrame:
    """Quality-score every document with the best available tier.

    ``scorer`` overrides the probe (tests inject a picklable fake here to
    drive the model branch through a real mapInPandas stage; production
    passes None and lets :func:`load_scorer` find the deployed model).
    Returns (id_col, n_tokens, quality_logit, keep, scorer) — identical
    schema from both tiers, ``scorer`` in {'model', 'hashed'}."""
    scorer = scorer if scorer is not None else load_scorer()
    arr = F.split(F.trim(F.col(text_col)), " ")
    base = docs.filter(F.trim(F.col(text_col)) != "")
    if scorer is None:
        logit = hashed_logit(F.col(text_col))
        return base.select(
            id_col,
            F.size(arr).cast("long").alias("n_tokens"),
            F.round(logit, 4).alias("quality_logit"),
            (logit >= 0).alias("keep"),
            F.lit("hashed").alias("scorer"),
        )

    import pandas as pd

    def run_model(batches):
        for pdf in batches:
            texts = pdf[text_col].tolist()
            scores = scorer(texts)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": [len(t.strip().split(" ")) for t in texts],
                    "quality_logit": [round(s, 4) for s in scores],
                    "keep": [s >= 0 for s in scores],
                    "scorer": "model",
                }
            )

    return base.select(id_col, text_col).mapInPandas(
        run_model,
        f"{id_col} long, n_tokens long, quality_logit double, "
        "keep boolean, scorer string",
    )
