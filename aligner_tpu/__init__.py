"""aligner_tpu — a TPU-native text-to-speech alignment framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
monotonic-alignment project (xiaozhah/Aligner): the drop-in
`maximum_path(value, mask)` MAS API (bit-identical paths to the reference
Cython kernel, fully on device), the OTA-style alignment-learning stack
(mel extraction, soft attention lattice, beta-binomial prior, forward-sum
loss, hard-path binarisation), and the MoBoAligner boundary-search variant.
"""
from .ops.mas import mas_lax, maximum_path
from .ops.mas_pallas import mas_pallas
from .serving import BatchAligner, SkipBatchAligner

__version__ = "0.1.0"
__all__ = ["BatchAligner", "SkipBatchAligner", "mas_lax", "mas_pallas",
           "maximum_path", "__version__"]
