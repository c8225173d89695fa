"""tapclip_tpu — TPU-native rebuild of TAP-CLIP (attribution-guided prompt
tuning for CLIP) on JAX / Pallas / pjit.

Reference: 3300786/TAP-CLIP (PyTorch, single GPU). This package is a
from-scratch TPU-first framework with the same capabilities: from-scratch
CLIP towers, fused attention kernels that materialize attribution slices,
class-batched prompt tuning, sharded multi-chip train/eval, OfficeHome /
DomainNet cross-domain transfer drivers, checkpointing with legacy ``.pt``
migration, and output-compatible metrics/CSV/plots.
"""

__version__ = "0.1.0"

from tapclip_tpu import config  # noqa: F401
