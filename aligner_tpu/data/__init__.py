from .batching import BucketSpec, bucket_batches, pad_batch, round_up
from .synthetic import SyntheticConfig, duration_accuracy, make_corpus

__all__ = ["BucketSpec", "SyntheticConfig", "bucket_batches",
           "duration_accuracy", "make_corpus", "pad_batch", "round_up"]
