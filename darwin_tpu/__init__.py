"""darwin-tpu: a TPU-native long-read overlapper/aligner (D-SOFT + GACT).

A from-scratch reimplementation of the Darwin seed-and-extend aligner
(D-SOFT diagonal-band seed filtration + GACT constant-memory tiled
alignment) designed for TPU hardware: the tile dynamic program runs as a
batched Pallas wavefront kernel on the VPU, candidate filtration is a
segmented-scan formulation, and scaling is expressed with
``jax.sharding`` meshes rather than threads/streams.

Behavioral reference: Tongdongq/darwin-gpu (C++/CUDA). This package is a
re-design, not a port: see SURVEY.md at the repo root for the layer map
and the parity contract.
"""

__version__ = "0.1.0"

from darwin_tpu.config import Params

__all__ = ["Params", "__version__"]
