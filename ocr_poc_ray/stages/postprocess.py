"""Optional LLM post-processing stage — the M4 slot.

The reference documents (but does not ship) a Qwen-0.6B post-processor
that cleans the heuristic extractor's fields (``config.yaml:2-11``,
``README.md:74-105``; ``llm_post_processor.py`` absent from the
snapshot).  This stage reserves that seat in the dataflow: an
actor-pool ``map_batches`` class whose ``__init__`` is where a model
would load once per actor (GPU-capable via ``num_gpus`` in
``map_batches``).  No LLM runtime ships in this container; the default
is a DETERMINISTIC rule-based cleaner (whitespace/case
canonicalization of extracted fields), and ``use_real_model=True``
loads a GENUINE numpy weight file into the seat (a hashed-unigram
logistic plausibility scorer from ``ocr_poc_ray.models``) — np.load
once per actor, vectorized batched scoring, a ``post_conf`` column —
so the load-once amortization and actor-pool batch sizing are
exercised with real on-disk weights (BASELINE.md model-seat note).
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

from ocr_poc_ray.extractors.fields import ALL_FIELDS

#: fields the cleaner title-cases (names/places); dates, codes and
#: measures pass through untouched.
_TITLECASE_FIELDS = ("nom", "prenom", "lieu_naissance", "profession")


class LLMPostProcessor:
    """Actor-pool field cleaner (model slot).

    ``ds.map_batches(LLMPostProcessor, batch_format="pyarrow",
    concurrency=N, num_gpus=g)`` — construction is once per actor.
    """

    def __init__(self, *, use_real_model: bool = False):
        self._clean = _rule_clean
        self._W = None
        if use_real_model:
            # A genuine weight file in the LLM seat: a hashed-unigram
            # logistic plausibility scorer, np.load-ed once per actor
            # (the load-once slot a Qwen checkpoint would occupy); the
            # rule cleaner still cleans, the model adds a per-row
            # ``post_conf`` confidence column.
            import numpy as np

            from ocr_poc_ray.models import ngram_logistic_path

            arrs = np.load(ngram_logistic_path())
            self._W, self._b = arrs["W"].astype(np.float64), float(arrs["b"])

    def _confidence(self, texts: list[str]):
        import numpy as np
        import pandas as pd

        from ocr_poc_ray.functions.dedup import _batch_token_hashes

        th, offsets = _batch_token_hashes(pd.Series(texts, dtype=object))
        scores = np.full(len(texts), self._b, dtype=np.float64)
        if len(th):
            w = self._W[(th % np.uint64(len(self._W))).astype(np.int64)]
            starts = offsets[:-1]
            nonempty = offsets[1:] > starts
            if nonempty.any():
                scores[nonempty] += np.add.reduceat(w, starts[nonempty])
        return 1.0 / (1.0 + np.exp(-scores))

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {name: batch[name] for name in batch.column_names}
        for fname in _TITLECASE_FIELDS:
            if fname in cols:
                cleaned = [self._clean(v) for v in cols[fname].to_pylist()]
                cols[fname] = pa.array(cleaned, pa.string())
        out = pa.table(cols)
        out = out.append_column(
            "postprocessed", pa.array([True] * len(batch), pa.bool_())
        )
        if self._W is not None:
            joined = [
                " ".join(str(cols[f][i]) for f in _TITLECASE_FIELDS if f in cols)
                for i in range(len(batch))
            ]
            out = out.append_column(
                "post_conf", pa.array(self._confidence(joined), pa.float64())
            )
        return out


def _rule_clean(value: str | None) -> str | None:
    if value is None:
        return None
    v = " ".join(value.split())
    return v.title() if v.isupper() else v


def postprocess_fields(
    ds: Dataset,
    *,
    concurrency: int | tuple[int, int] = (1, 4),
    use_real_model: bool = False,
) -> Dataset:
    return ds.map_batches(
        LLMPostProcessor,
        fn_constructor_kwargs={"use_real_model": use_real_model},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


__all__ = ["LLMPostProcessor", "postprocess_fields", "ALL_FIELDS"]
