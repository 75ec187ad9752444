"""Optional LLM post-processing stage — the M4 slot.

The reference documents (but does not ship) a Qwen-0.6B post-processor
that cleans the heuristic extractor's fields (``config.yaml:2-11``,
``README.md:74-105``; ``llm_post_processor.py`` absent from the
snapshot).  This stage reserves that seat in the dataflow: an
actor-pool ``map_batches`` class whose ``__init__`` is where a model
would load once per actor (GPU-capable via ``num_gpus`` in
``map_batches``).  The model libraries are not in this container, so
``use_real_model=True`` raises; the default is a DETERMINISTIC
rule-based cleaner (whitespace/case canonicalization of extracted
fields) so the plumbing is real and testable.
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
        if use_real_model:
            raise NotImplementedError(
                "no LLM runtime in this environment; load the model here "
                "(once per actor) and replace _clean with a batched generate"
            )
        self._clean = _rule_clean

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {name: batch[name] for name in batch.column_names}
        for fname in _TITLECASE_FIELDS:
            if fname in cols:
                cleaned = [self._clean(v) for v in cols[fname].to_pylist()]
                cols[fname] = pa.array(cleaned, pa.string())
        out = pa.table(cols)
        return out.append_column(
            "postprocessed", pa.array([True] * len(batch), pa.bool_())
        )


def _rule_clean(value: str | None) -> str | None:
    if value is None:
        return None
    v = " ".join(value.split())
    return v.title() if v.isupper() else v


def postprocess_fields(
    ds: Dataset, *, concurrency: int | tuple[int, int] = (1, 4)
) -> Dataset:
    return ds.map_batches(
        LLMPostProcessor, batch_format="pyarrow", concurrency=concurrency
    )


__all__ = ["LLMPostProcessor", "postprocess_fields", "ALL_FIELDS"]
