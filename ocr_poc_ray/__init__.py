"""ocr_poc_ray — a Ray-Data-native main-content extraction engine.

Re-expresses the capability surface of the reference (PacomeKFP/ocr-poc,
a single-node OCR + heuristic field-extraction service — see SURVEY.md)
as `ray.data.Dataset` pipelines of `map_batches` over zero-copy Arrow
batches of a Parquet transcript table, per `BASELINE.json`'s
``north_rule`` / ``input_hint``:

    (conv_id:string, turn_idx:int32, role:string, text:string,
     tool:string, ts:timestamp[us])

Layout
------
- ``schemas``     Arrow schema constants validated at stage boundaries
                  (analog of the reference's data_dictionary.json).
- ``synth``       deterministic seeded transcript/expected generator
                  (FIXTURES.md §1–2); no external data.
- ``extractors``  pure per-row extraction programs keyed by the `tool`
                  column (plain / html / pdf) plus the layout-driven
                  typed-field pipeline — the analog of the reference's
                  2x2 extractor registry
                  (ocr/id_card_data_extractor.py:25-35).
- ``stages``      Ray Data stages: validation + turn-key dedup, the
                  actor-pool extraction stages, the conversation-
                  ordering shuffle + assembly, batched embedding, the
                  LLM post-processor slot.
- ``sources``     row-group-granular parquet shard planner (checkpoint
                  unit) + JSONL/CSV transcript sources.
- ``pipelines``   end-to-end pipelines (read → extract → order → write),
                  one-shot and checkpointed/resumable.
- ``state``       checkpoint manifest + resumable partitioned writer.
- ``functions``   large-scale training-data ops: dedup (exact, MinHash-
                  LSH, SimHash, n-gram Jaccard, components), ANN
                  (brute/LSH/IVF), windowed operators (sessionize,
                  as-of, range join, rolling), HLL sketches, text
                  analysis, multimodal stubs.
- ``queries``     the public correctness surface: every operator as a
                  named pipeline with, where SQL-expressible, a DuckDB
                  oracle (driver gate).
- ``config``      EngineConfig (config.yaml analog, JSON round-trip).

None of this module's import-time code calls ``ray.init`` — sessions are
owned by the caller (driver / bench.py / test fixture).
"""

__version__ = "0.1.0"
