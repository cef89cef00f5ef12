from recmodels_tpu.data.schema import FeatureSpec, Schema, criteo_schema
from recmodels_tpu.data.hashing import hash_tokens, splitmix64
from recmodels_tpu.data.criteo import (
    Batch,
    CriteoTSVSource,
    SyntheticSource,
    make_batch_iterator,
)

__all__ = [
    "FeatureSpec",
    "Schema",
    "criteo_schema",
    "hash_tokens",
    "splitmix64",
    "Batch",
    "CriteoTSVSource",
    "SyntheticSource",
    "make_batch_iterator",
]
