"""Engine configuration — the analog of the reference's ``config.yaml``
(model/server/ocr/logging keys, ``config.yaml:2-21``) plus the
constructor thresholds its extractors take (``cni_extractor_18_f.py:
12-23``), as one frozen dataclass with JSON round-trip (no YAML
dependency in this environment; a yaml loader drops in trivially).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field

from ocr_poc_ray.extractors.fields import FieldExtractorConfig


@dataclass(frozen=True)
class EngineConfig:
    # extraction stage
    batch_size: int | None = None  # None = one zero-copy batch per block
    extract_actors: int = 0  # 0 = stateless tasks; >0 = actor pool (1, n)
    # resumable runs
    num_partitions: int = 16
    shard_rows: int = 250_000
    # wide ops
    sort_target_block_bytes: int = 64 << 20
    # multimodal
    media_batch_size: int = 32
    # heuristic extractor thresholds
    fields: FieldExtractorConfig = field(default_factory=FieldExtractorConfig)

    @property
    def extract_concurrency(self) -> tuple[int, int] | None:
        return (1, self.extract_actors) if self.extract_actors else None

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, path_or_str: str) -> "EngineConfig":
        text = path_or_str
        if not path_or_str.lstrip().startswith("{"):
            with open(path_or_str) as f:
                text = f.read()
        d = json.loads(text)
        fields_cfg = d.pop("fields", None)
        cfg = cls(
            **{k: v for k, v in d.items() if k in {f.name for f in dataclasses.fields(cls)} - {"fields"}},
        )
        if fields_cfg:
            object.__setattr__(cfg, "fields", FieldExtractorConfig(**fields_cfg))
        return cfg
