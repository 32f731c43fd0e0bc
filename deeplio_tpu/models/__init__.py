"""Model zoo (reference: ``deeplio/models/nets/`` — SURVEY.md §2.3)."""

from deeplio_tpu.models.zoo import (
    DeepIO,
    DeepLIO,
    DeepLO,
    build_model,
    example_batch,
    factorize_stem_variables,
    init_model,
    init_model_fast,
)
